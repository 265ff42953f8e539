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
