"""Stage 3 — OCR post-correction, paragraph split, title merge, article /
span-sequence construction.  100% native expressions + window functions
(zero Python): the reference implements this stage as pandas loops +
ProcessPool batches (``function_modules/analysis_functions.py:229-476``);
here it is regexp chains, ``posexplode``, and gaps-and-islands windows
over the same single doc_id partitioning the layout stage produced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import is_title_col, normalize_text_col, strip_fences_col, strip_ws_col


def post_correct(ordered: DataFrame) -> DataFrame:
    """T1: fence-strip tables, normalize everything else (figures pass
    through untouched — their text is empty)."""
    return ordered.withColumn(
        "text",
        F.when(F.col("kind") == "table", strip_fences_col(F.col("text")))
        .when(F.col("kind") == "figure", F.col("text"))
        .otherwise(normalize_text_col(F.col("text"))),
    )


def split_paragraphs(df: DataFrame) -> DataFrame:
    """T2 + T3: paragraph split for text/title spans (posexplode gives
    sub_order directly), ALL-CAPS title reclassification."""
    splittable = F.col("kind").isin("text", "title")
    df = df.withColumn(
        "_parts",
        F.when(splittable, F.split(F.col("text"), "\n\n")).otherwise(
            F.array(F.col("text"))
        ),
    )
    df = df.select("*", F.posexplode("_parts").alias("sub_order", "_part")).drop(
        "_parts", "text"
    )
    df = df.withColumn(
        "text", F.when(splittable, strip_ws_col(F.col("_part"))).otherwise(F.col("_part"))
    ).drop("_part")
    df = df.filter(~splittable | (F.length("text") > 0))
    return df.withColumn(
        "kind",
        F.when((F.col("kind") == "text") & is_title_col(F.col("text")), "title").otherwise(
            F.col("kind")
        ),
    )


def merge_adjacent_titles(df: DataFrame) -> DataFrame:
    """T4: runs of consecutive title rows collapse to one newline-joined
    row (gaps-and-islands: lag → run id → windowed collect)."""
    w = Window.partitionBy("doc_id").orderBy("reading_order", "sub_order")
    df = df.withColumn(
        "_new_run",
        F.when(
            F.lag("kind").over(w).isNull() | (F.col("kind") != F.lag("kind").over(w)), 1
        ).otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    w_run = Window.partitionBy("doc_id", "_run").orderBy("reading_order", "sub_order")
    w_run_all = w_run.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    df = (
        df.withColumn(
            "_joined", F.array_join(F.collect_list("text").over(w_run_all), "\n")
        )
        .withColumn("_rn", F.row_number().over(w_run))
        .withColumn(
            "text",
            F.when(F.col("kind") == "title", F.col("_joined")).otherwise(F.col("text")),
        )
        .filter((F.col("kind") != "title") | (F.col("_rn") == 1))
        .drop("_new_run", "_run", "_joined", "_rn")
    )
    return df


def finalize_spans(df: DataFrame) -> DataFrame:
    """T5: final 1-based span order per document."""
    w = Window.partitionBy("doc_id").orderBy("reading_order", "sub_order")
    return df.withColumn("order", F.row_number().over(w)).select(
        "doc_id", "kind", "text", "media_ref", "order"
    )


def extract_spans(ordered: DataFrame) -> DataFrame:
    """ordered boxes → flat extracted spans (the equality-check grain)."""
    df = post_correct(ordered)
    df = split_paragraphs(df)
    df = merge_adjacent_titles(df)
    return finalize_spans(df)


def nest_spans(flat: DataFrame) -> DataFrame:
    """Re-nest to extracted(doc_id, spans array<struct<kind,text,
    media_ref,order>>) ordered by span order."""
    sortable = F.sort_array(
        F.collect_list(F.struct("order", "kind", "text", "media_ref"))
    )
    spans = F.transform(
        sortable,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["order"].alias("order"),
        ),
    )
    return flat.groupBy("doc_id").agg(spans.alias("spans"))


def build_articles(flat: DataFrame) -> DataFrame:
    """Secondary output: title + following spans grouped into articles
    (reference contract: ``analysis_functions.py:369-476``)."""
    w = Window.partitionBy("doc_id").orderBy("order")
    df = flat.withColumn(
        "article_id",
        F.sum(F.when(F.col("kind") == "title", 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    body = F.when(F.col("kind").isin("text", "table"), F.struct("order", "text"))
    return (
        df.groupBy("doc_id", "article_id")
        .agg(
            F.max(F.when(F.col("kind") == "title", F.col("text"))).alias("title"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(body)), lambda s: s["text"]
                ),
                "\n\n",
            ).alias("content"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("media_ref").isNotNull(),
                            F.struct("order", "media_ref"),
                        )
                    )
                ),
                lambda s: s["media_ref"],
            ).alias("media_refs"),
            F.count("*").cast("int").alias("n_spans"),
        )
    )
