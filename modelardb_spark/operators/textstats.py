"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID, and document
fingerprinting over the `documents` table.

Every operator is a pure column-expression plan (no Python UDFs) built
from engine-portable primitives (md5, regexp, string arithmetic) so the
same computation is expressible in ANSI SQL for the DuckDB oracle. At
100 TB these run entirely inside whole-stage codegen with full column
pruning — the scan reads only (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tiny per-language marker vocabularies for the n-gram/stopword
#: language-ID heuristic (deterministic, dependency-free)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
    "zh": ["的", "是", "了", "在", "我"],
}

_STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _marker_hits(text_col, words: list[str]):
    """Occurrences of any marker word (space-padded match, portable)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    expr = None
    for w in words:
        # count non-overlapping occurrences of " w " via length delta
        token = f" {w} "
        c = (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(token), F.lit("")))
        ) / len(token)
        expr = c if expr is None else expr + c
    return expr.cast("long")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish sub-word proxy (4-char chunks of
    non-space text), both as exact integer string arithmetic."""
    spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    ws_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        spaces + 1
    )
    nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("n_tokens"),
        F.ceil(nonspace / 4).cast("long").alias("n_subword_est"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics; score
    in [0,1] as a deterministic arithmetic blend."""
    text = F.col("text")
    n_chars = F.length(text).cast("double")
    spaces = F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_tokens = (spaces + 1).cast("double")
    punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    ).cast("double")
    stop_hits = _marker_hits(text, _STOPWORDS).cast("double")
    avg_word_len = (n_chars - spaces) / n_tokens
    punct_ratio = punct / n_chars
    stop_ratio = stop_hits / n_tokens
    length_factor = F.least(n_tokens / 100.0, F.lit(1.0))
    wordlen_factor = F.when(
        (avg_word_len >= 2.0) & (avg_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score = F.round(
        0.4 * length_factor
        + 0.3 * wordlen_factor
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))),
        6,
    )
    return docs.select(
        "doc_id",
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language scoring with a deterministic argmax
    (ties break by language code order) — the classic dependency-free
    stopword heuristic."""
    scores = [
        _marker_hits(F.col("text"), ws).alias(f"score_{lang}")
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = None
    for l in reversed(langs):  # earlier langs win ties -> build from the back
        cond = F.col(f"score_{l}") == best
        pred = F.when(cond, F.lit(l)) if pred is None else F.when(cond, F.lit(l)).otherwise(pred)
    # all-zero scores -> unknown
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace-collapsed) — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


#: PII patterns, applied IN ORDER (more-specific first: an SSN or an
#: IPv4 is also a valid match for the looser phone pattern, so each
#: must be replaced before phone runs). Patterns are RE2-safe (no
#: backreferences / lookaround) so the identical regex runs in Spark
#: (java.util.regex) and DuckDB (RE2) — oracle-portable by
#: construction.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # digits joined by at most TWO separator chars each (covers
    # ") 1" / " (" in "+1 (555) 123-4567"), 7-14 digits total, and no
    # \s class so a match can never span lines or swallow an unbounded
    # whitespace-separated numeric run. Still errs toward redaction on
    # dense numeric text (e.g. year lists) — the right direction for a
    # scrubber, documented rather than hidden.
    ("phone", r"\+?\d(?:[ ().\-]{0,2}\d){6,13}", "<PHONE>"),
]


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Redact emails / SSNs / IPv4s / phone-shaped digit runs, keeping
    per-category match counts.

    A 100 TB-scale scrub must be a map-only, JVM-side pass: every
    replacement here is a built-in `regexp_replace` chained on the
    `text` column (one projection, whole-stage codegen, zero shuffle,
    zero Python), and the counts are `regexp_extract_all` sizes
    computed on the SAME pre-scrub text so they are independent of
    replacement order. Counts count matches of each pattern on the
    ORIGINAL text; because the patterns overlap (an SSN also looks
    like a phone), `pii_total` is the number of replacements actually
    made in the ordered chain, not the sum of the per-category counts.
    """
    text = F.col("text")
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = text
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    # replacements actually made = marker-token occurrences in the
    # scrubbed text; exact unless the ORIGINAL text already contained
    # a literal marker token (counted as if redacted — harmless for a
    # drop/review threshold, and the per-category counts stay exact)
    n_markers = sum(
        (
            F.length(scrubbed)
            - F.length(F.replace(scrubbed, F.lit(token), F.lit("")))
        )
        / len(token)
        for _, _, token in PII_PATTERNS
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("text"),
        *counts,
        n_markers.cast("long").alias("pii_total"),
    )


def _repetition_exprs(text):
    """(n_lines, dup_line_frac, n_words, top_word_frac) expressions —
    shared by the stats view and the curation-time gate so both ways
    of asking the question are the same computation."""
    # NULL text must behave like empty text (0.0 fractions), not
    # propagate NULL through the fractions — a NULL fraction would
    # silently drop the doc at any active gate
    text = F.coalesce(text, F.lit(""))
    lines = F.filter(
        F.split(text, "\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double")
    )
    words = F.filter(
        F.split(F.lower(text), r"\s+"), lambda x: F.length(x) > 0
    )
    n_words = F.size(words)
    # most-common-word count = longest run of equals in the SORTED
    # array — O(n log n) per row instead of the O(n^2)
    # distinct x filter scan (which measurably dominated the curation
    # gate: the filter expression re-evaluates in every consumer scan)
    run = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    top_count = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_word_frac = F.when(n_words <= 0, F.lit(0.0)).otherwise(
        top_count / n_words.cast("double")
    )
    return n_lines, dup_line_frac, n_words, top_word_frac


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals: duplicate-line fraction and
    most-common-word fraction, per document.

    Both are pure higher-order array expressions over a per-row split
    — no explode (which would shuffle doc-sized arrays), no Python.
    The top-word scan is O(unique_words x words) per row inside
    codegen; documents are KB-scale so this stays CPU-trivial next to
    the parquet scan it shares. Rows with no lines / no words report
    0.0 fractions (defined, not null) so downstream threshold filters
    never need null guards.
    """
    n_lines, dup_line_frac, n_words, top_word_frac = _repetition_exprs(
        F.col("text")
    )
    return docs.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        n_words.cast("long").alias("n_words"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_line_frac: float | None = None,
    max_top_word_frac: float | None = None,
) -> DataFrame:
    """Drop documents whose repetition signals exceed the thresholds
    (None = that signal is not gated). A pure map-side filter on the
    full `docs` schema — at 100 TB this fuses into the scan stage of
    whatever consumes the survivors, adding no pass of its own."""
    _, dup_line_frac, _, top_word_frac = _repetition_exprs(F.col("text"))
    cond = F.lit(True)
    if max_dup_line_frac is not None:
        cond = cond & (dup_line_frac <= max_dup_line_frac)
    if max_top_word_frac is not None:
        cond = cond & (top_word_frac <= max_top_word_frac)
    return docs.where(cond)


def synthetic_documents(
    spark: SparkSession,
    n_docs: int = 100_000,
    words_per_doc: int = 60,
    vocab: int = 50_000,
    seed: int = 42,
) -> DataFrame:
    """Seeded synthetic `documents` table at arbitrary scale, generated
    distributedly (spark.range -> column expressions only — no Python,
    no driver materialization), with planted duplicate structure:

      doc_id % 100 == 7 -> DEGENERATE (its own first word repeated) —
                           top_word_frac 1.0, the quality gate's prey
      doc_id % 10 == 8  -> EXACT copy of the family base (id - id%100)
      doc_id % 10 == 9  -> NEAR duplicate of the base (two words appended)
      everything else   -> unique (word stream seeded by own id)

    so ~10% of docs are exact dups and ~10% near dups of ~1% family
    bases, and ~1% are repetition-degenerate — the shape a curation
    robustness rung needs: the gate drops real rows, LSH bands get
    real collisions, clusters get multi-member families, and the
    expected kept-fraction is checkable in closed form. (Degenerate
    docs repeat their OWN seeded word, so they are unique texts —
    they perturb no duplicate-family count.) Word k of doc `src` is
    `w<pmod(hash(seed, src, k), vocab)>`: murmur3 per word, cheap and
    deterministic across partitionings.
    """
    base = F.col("id") - F.col("id") % 100
    src = F.when(F.col("id") % 10 >= 8, base).otherwise(F.col("id"))
    word = lambda k: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.hash(F.lit(seed), src, k), F.lit(vocab))
    )
    text = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), F.lit(words_per_doc)), word)
    )
    text = F.when(
        F.col("id") % 100 == 7,
        F.concat_ws(" ", F.array_repeat(word(F.lit(1)), words_per_doc)),
    ).when(
        F.col("id") % 10 == 9,
        F.concat(text, F.lit(" near"), F.col("id") % 100),
    ).otherwise(text)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
