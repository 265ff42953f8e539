"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget training sequences (the step between dedup/filter
and the trainer's data loader — unpacked batches waste the budget's
tail as padding).

Exact global bin packing is NP-hard and inherently sequential, so the
scale design is the one real systems use: documents are hash-routed to
P independent packing groups (ONE shuffle keyed on a deterministic
doc hash — no skew, the key is uniform by construction), and each
group packs its own documents with best-fit-decreasing, which carries
the classic 11/9·OPT + 1 guarantee within the group. Fill loss from
partitioning is bounded: each group wastes at most one open bin's
tail per remaining-capacity class, and groups are large (corpus/P),
so the aggregate fill ratio stays within a fraction of a percent of
single-machine packing while the packing itself is embarrassingly
parallel.

Documents longer than the budget get a sequence of their own and a
``truncated`` flag — the policy decision (truncate vs split into
multiple sequences) belongs to the caller.

Output is one row per document: (doc_id, n_tokens, seq_id, seq_bin,
part, truncated) where seq_id = "<part>-<bin>" is globally unique and
stable across runs (same corpus, same budget, same P -> same packing:
ordering inside a group is (n_tokens desc, doc_id), nothing random).
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    parts: int | None = None,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Pack documents into training sequences of at most ``budget``
    whitespace tokens (token counts from ``textstats.token_count``).

    One shuffle (hash-repartition on xxhash64(doc_id) % parts), then a
    map-only ``applyInPandas`` packs each group with best-fit
    decreasing: docs sorted by (tokens desc, doc_id), each placed into
    the open sequence with the SMALLEST remaining capacity that still
    fits (bisect over a sorted capacity list — O(n log n) sort +
    C-speed list ops), else a new sequence opens.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from modelardb_spark.operators.textstats import token_count

    spark = docs.sparkSession
    parts = parts or spark.sparkContext.defaultParallelism
    counted = (
        token_count(docs)
        .select(F.col("doc_id").alias(doc_col), "n_tokens")
        .withColumn(
            "part",
            F.pmod(F.xxhash64(F.col(doc_col)), F.lit(parts)).cast("int"),
        )
    )

    def _pack(pdf):
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", doc_col], ascending=[False, True]
        ).reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        rem: list[int] = []  # sorted remaining capacities of open bins
        rem_bin: list[int] = []  # bin id parallel to `rem`
        n_bins = 0
        out_bin = np.empty(len(pdf), dtype=np.int64)
        out_trunc = np.empty(len(pdf), dtype=bool)
        for i, t in enumerate(toks):
            t_eff = int(min(t, budget))
            out_trunc[i] = t > budget
            j = bisect.bisect_left(rem, t_eff)  # best fit
            if j < len(rem):
                b = rem_bin[j]
                r = rem[j] - t_eff
                del rem[j]
                del rem_bin[j]
            else:
                b = n_bins
                n_bins += 1
                r = budget - t_eff
            k = bisect.bisect_left(rem, r)
            rem.insert(k, r)
            rem_bin.insert(k, b)
            out_bin[i] = b
        return pdf.assign(seq_bin=out_bin, truncated=out_trunc)

    # the id column's type follows the input corpus (string/UUID doc
    # ids are common); hard-coding `long` here broke any non-integer
    # corpus at the Arrow conversion
    id_type = docs.schema["doc_id"].dataType.simpleString()
    packed = counted.groupBy("part").applyInPandas(
        _pack,
        schema=(
            f"{doc_col} {id_type}, n_tokens long, part int, "
            "seq_bin long, truncated boolean"
        ),
    )
    return packed.select(
        doc_col,
        "n_tokens",
        F.concat_ws("-", "part", "seq_bin").alias("seq_id"),
        "seq_bin",
        "part",
        "truncated",
    )
