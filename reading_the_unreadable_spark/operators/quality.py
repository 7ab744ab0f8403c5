"""Corpus-quality operators for LLM training-data pipelines — the
C4 / Gopher(MassiveText) filter families, Spark-first.

Built from the published rule sets (Raffel et al. 2020 §2.2 "C4";
Rae et al. 2021 appendix A "MassiveText quality/repetition filters"),
re-expressed as native Spark SQL expressions:

- :func:`c4_line_filters` — line-grain cleaning: keep lines that end in
  terminal punctuation, have enough words, and carry no boilerplate
  marker ("javascript", "cookie", …); re-join survivors, flag documents
  that keep enough lines.  Pure map stage — zero shuffle, streams over
  100 TB.
- :func:`gopher_repetition_signals` — per-doc repetition/shape metrics
  (duplicate-line fraction, duplicate-paragraph fraction, duplicate-word
  fraction, mean word length, bullet-line fraction, ellipsis-line
  fraction).  Pure map stage.
- :func:`dedup_paragraphs` — corpus-WIDE exact paragraph dedup (the C4
  "repeated spans appear once in the corpus" rule at paragraph grain):
  explode → fingerprint → keep the globally-first occurrence (one
  shuffle on the 16-byte fingerprint) → reassemble documents.

Everything is deterministic and DuckDB-replicable (md5 fingerprints,
lexicographic first-occurrence order), so each operator carries a full
value-hash oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# markers from the C4 blocklist family (lowercase substring match)
C4_BOILERPLATE_MARKERS = ("javascript", "cookie", "lorem ipsum", "privacy policy")
C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES_PER_DOC = 3


def _line_ok(line: Column) -> Column:
    lower = F.lower(line)
    ends_ok = F.substring(line, -1, 1).isin(*C4_TERMINAL_PUNCT)
    enough_words = F.size(F.split(line, " ")) >= C4_MIN_WORDS_PER_LINE
    no_marker = ~F.exists(
        F.array(*[F.lit(m) for m in C4_BOILERPLATE_MARKERS]),
        lambda m: F.contains(lower, m),
    )
    return ends_ok & enough_words & no_marker


def c4_line_filters(
    documents: DataFrame,
    text_col: str = "text",
    min_lines: int = C4_MIN_LINES_PER_DOC,
) -> DataFrame:
    """C4 §2.2 line rules: lines must end in terminal punctuation, have
    ≥5 words, and contain no boilerplate marker; documents keep their
    surviving lines joined and are flagged `kept` when enough lines
    survive.  Higher-order array functions only — no explode, no
    shuffle: the whole operator is one projection."""
    lines = F.split(F.col(text_col), "\n")
    kept_lines = F.filter(lines, _line_ok)
    return documents.select(
        "doc_id",
        F.array_join(kept_lines, "\n").alias("text"),
        F.size(kept_lines).alias("n_lines_kept"),
        F.size(lines).alias("n_lines_total"),
        (F.size(kept_lines) >= min_lines).cast("int").alias("kept"),
    )


def gopher_repetition_signals(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher/MassiveText repetition + shape signals, one row per doc:

    - dup_line_frac / dup_para_frac: 1 − distinct/total (lines on \\n,
      paragraphs on \\n\\n)
    - dup_word_frac: 1 − unique words / words
    - mean_word_len
    - bullet_line_frac: lines starting with '-' or '•'
    - ellipsis_line_frac: lines ending with '...' or '…'

    All native expressions; ratios 6dp-rounded for cross-engine hashes."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    paras = F.split(text, "\n\n")
    words = F.split(text, " ")
    n_lines = F.size(lines).cast("double")
    n_paras = F.size(paras).cast("double")
    n_words = F.size(words).cast("double")
    dup = lambda arr, n: F.round(  # noqa: E731
        F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / n, 6
    )
    bullet = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("• "))
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    mean_wl = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n_words,
        6,
    )
    return documents.select(
        "doc_id",
        dup(lines, n_lines).alias("dup_line_frac"),
        dup(paras, n_paras).alias("dup_para_frac"),
        dup(words, n_words).alias("dup_word_frac"),
        mean_wl.alias("mean_word_len"),
        F.round(bullet.cast("double") / n_lines, 6).alias("bullet_line_frac"),
        F.round(ellipsis.cast("double") / n_lines, 6).alias("ellipsis_line_frac"),
    )


def dedup_paragraphs(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide exact paragraph dedup: every distinct paragraph
    (md5 of its lowercased letters-only normalization) survives only at
    its globally-first occurrence, ordered by (doc_id, para_idx)
    lexicographically — deterministic and engine-independent.

    Scale shape: posexplode → ONE hash shuffle on the 16-byte
    fingerprint (the window needs no second exchange: the re-assembly
    groupBy on doc_id is the only other shuffle).  Never an n² join;
    a boilerplate paragraph shared by millions of docs costs one
    window partition, sorted, O(k log k)."""
    paras = F.split(F.col(text_col), "\n\n")
    flat = documents.select(
        "doc_id", F.posexplode(paras).alias("para_idx", "para")
    )
    fp = F.md5(F.regexp_replace(F.lower(F.col("para")), "[^a-z]", ""))
    flat = flat.withColumn("_fp", fp)
    w = Window.partitionBy("_fp").orderBy("doc_id", "para_idx")
    flat = flat.withColumn("_rank", F.row_number().over(w))
    kept = F.when(F.col("_rank") == 1, F.struct("para_idx", "para"))
    rebuilt = flat.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list(kept)), lambda s: s["para"]),
            "\n\n",
        ).alias("text"),
        F.sum(F.when(F.col("_rank") == 1, 1).otherwise(0))
        .cast("int")
        .alias("n_paras_kept"),
        F.count("*").cast("int").alias("n_paras_total"),
    )
    return rebuilt
