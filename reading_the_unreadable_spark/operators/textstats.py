"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, n-gram-heuristic language ID, document
fingerprinting.  All native ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen — zero Python), designed to stream over a
100 TB documents table with no shuffle at all (pure map stage)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic marker-word lists shared with the DuckDB oracle SQL
LANG_MARKERS = {
    "en": ("the", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "los", "y"),
    "fr": ("le", "les", "et", "des", "un"),
    "de": ("der", "die", "und", "das", "ein"),
}
EN_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "for", "on", "with")


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def _marker_count(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts + char stats (whitespace tokenizer)."""
    w = tokens_col(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.round(
            F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / F.size(w),
            6,
        ).alias("avg_token_len"),
        F.size(F.array_distinct(w)).cast("long").alias("n_unique_tokens"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Deterministic quality heuristic: length saturation + stopword ratio
    + alpha ratio (the three signals used by classic corpus filters)."""
    w = tokens_col(F.col("text"))
    n = F.size(w).cast("double")
    stop_ratio = _marker_count(w, EN_STOPWORDS).cast("double") / n
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double")
    alpha_ratio = alpha / F.length("text").cast("double")
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * stop_ratio
        + F.lit(0.2) * alpha_ratio
    )
    return documents.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language ID (n-gram heuristic, deterministic argmax
    with fixed tie order en > es > fr > de)."""
    w = tokens_col(F.col("text"))
    c = {lang: _marker_count(w, m) for lang, m in LANG_MARKERS.items()}
    pred = (
        F.when(
            (c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["de"]), "en"
        )
        .when((c["es"] >= c["fr"]) & (c["es"] >= c["de"]), "es")
        .when(c["fr"] >= c["de"], "fr")
        .otherwise("de")
    )
    return documents.select(
        "doc_id",
        c["en"].cast("long").alias("c_en"),
        c["es"].cast("long").alias("c_es"),
        c["fr"].cast("long").alias("c_fr"),
        c["de"].cast("long").alias("c_de"),
        pred.alias("lang_pred"),
        "lang",
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased letters-only) —
    the exact-dedup key; md5 gives cross-engine-identical hex."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )
