"""Stage 2 — layout analysis + reading-order reconstruction (Spark-first).

Every step that the reference implements as a per-page Python loop
(``function_modules/bbox_functions.py:789-896``) is re-expressed here as
window functions and native column expressions over a **single** hash
exchange on ``doc_id``; only the inherently sequential accumulate-or-flush
box merge (reference ``bbox_functions.py:508-583``) drops to a grouped-map
Arrow UDF (``applyInPandas`` per doc — groups are single pages, tiny).

Shuffle plan (verified with .explain): one Exchange(hashpartitioning
(doc_id)) — every subsequent Window / applyInPandas requires only
ClusteredDistribution(doc_id, …), which the existing partitioning already
satisfies, so Catalyst inserts sorts, not shuffles.

Semantics match :mod:`..oracle` step-for-step (L1–L10 in its docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERGE_WIDTH_MULTIPLIER = 1.5
ABANDON_TOP_FRACTION = 0.1
MIN_OVERLAP_FRACTION = 0.1
BIN_EPSILON = 0.001

ORDERED_BOX_SCHEMA = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "x1 double, y1 double, x2 double, y2 double, confidence double, "
    "column_number int, column_width double, page_block int, reading_order int"
)


def _abandon_and_print_area(boxes: DataFrame) -> DataFrame:
    """L1–L2: print-area bounds, top-zone abandon reclassification, filter."""
    w = Window.partitionBy("doc_id")
    df = (
        boxes.withColumn("center_y", (F.col("y1") + F.col("y2")) / F.lit(2.0))
        .withColumn("_py1", F.min("y1").over(w))
        .withColumn("_py2", F.max("y2").over(w))
    )
    thr = F.col("_py1") + F.lit(ABANDON_TOP_FRACTION) * (F.col("_py2") - F.col("_py1"))
    df = df.withColumn(
        "_abandon_line",
        F.max(
            F.when((F.col("kind") == "abandon") & (F.col("center_y") <= thr), F.col("y2"))
        ).over(w),
    )
    df = df.filter(
        (F.col("_abandon_line").isNull() | (F.col("center_y") > F.col("_abandon_line")))
        & (F.col("kind") != "abandon")
    )
    return df.drop("_py1", "_py2", "_abandon_line")


def _columns_native(df: DataFrame) -> DataFrame:
    """L3–L4: column count inference + bin assignment, all JVM-side.

    The reference's ``assign_columns`` is an O(boxes×bins) Python loop
    (``bbox_functions.py:240-320``); here it is a ``sequence`` +
    higher-order ``filter`` over bin indices — no UDF, no extra shuffle.
    """
    w = Window.partitionBy("doc_id")
    df = (
        df.withColumn("_px1", F.min("x1").over(w))
        .withColumn("_px2", F.max("x2").over(w))
        .withColumn("_pw", F.col("_px2") - F.col("_px1"))
        .withColumn(
            "_med_w",
            F.median(
                F.when(F.col("kind") == "text", F.col("x2") - F.col("x1"))
            ).over(w),
        )
    )
    k = F.greatest(
        F.coalesce(F.floor(F.col("_pw") / F.col("_med_w")), F.lit(1)).cast("int"),
        F.lit(1),
    )
    df = df.withColumn("_k", k).withColumn(
        "column_width", F.col("_pw") / F.col("_k")
    )
    bw = F.col("x2") - F.col("x1")
    edge = lambda i: F.col("_px1") + i.cast("double") * (  # noqa: E731
        F.col("_pw") + F.lit(BIN_EPSILON)
    ) / F.col("_k").cast("double")
    hits = F.filter(
        F.sequence(F.lit(0), F.col("_k") - F.lit(1)),
        lambda i: (
            F.least(F.col("x2"), edge(i + F.lit(1)))
            - F.greatest(F.col("x1"), edge(i))
        )
        >= F.lit(MIN_OVERLAP_FRACTION) * bw,
    )
    df = df.withColumn(
        "column_number",
        F.when(F.size(hits) > 1, F.lit(0))
        .when(F.size(hits) == 1, F.element_at(hits, 1) + F.lit(1))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return df.drop("_px1", "_px2", "_pw", "_med_w", "_k")


def _blocks_dedup_order(df: DataFrame) -> DataFrame:
    """L5–L8: page blocks (gaps-and-islands window instead of the
    reference's O(n·k) loop, ``bbox_functions.py:323-372``), duplicate-box
    removal keeping max confidence (``:383-409``), reading-order numbering
    (``:412-419``), and y2 adjustment (``:586-611``)."""
    w_scan = (
        Window.partitionBy("doc_id")
        .orderBy("y1", "offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "page_block",
        F.sum(F.when(F.col("column_number") == 0, 1).otherwise(0)).over(w_scan).cast("int"),
    )
    w_dup = Window.partitionBy(
        "doc_id",
        F.round("x1", 6),
        F.round("y1", 6),
        F.round("x2", 6),
        F.round("y2", 6),
    ).orderBy(F.desc("confidence"), F.asc("offset"))
    df = (
        df.withColumn("_dup_rank", F.row_number().over(w_dup))
        .filter(F.col("_dup_rank") == 1)
        .drop("_dup_rank")
    )
    w_ro = Window.partitionBy("doc_id").orderBy(
        "page_block", "column_number", "y1", "offset"
    )
    df = df.withColumn("reading_order", F.row_number().over(w_ro))
    w_col = Window.partitionBy("doc_id", "page_block", "column_number").orderBy(
        "y1", "offset"
    )
    df = df.withColumn("y2", F.coalesce(F.lead("y1").over(w_col), F.col("y2")))
    return df


def _merge_boxes_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """L9 grouped-map UDF: accumulate-or-flush merge of consecutive text
    boxes within (page_block, column>0) while the merged span height stays
    ≤ 1.5 × column_width.  One page per group; Arrow-batched transfer."""
    out = []
    for (_, col), grp in pdf.groupby(["page_block", "column_number"], sort=True):
        grp = grp.sort_values("reading_order")
        recs = grp.to_dict("records")
        acc = None
        for r in recs:
            if col == 0 or r["kind"] != "text":
                if acc is not None:
                    out.append(acc)
                    acc = None
                out.append(r)
            elif acc is None:
                acc = r
            elif (r["y2"] - acc["y1"]) <= MERGE_WIDTH_MULTIPLIER * r["column_width"]:
                acc["y2"] = r["y2"]
                acc["x1"] = min(acc["x1"], r["x1"])
                acc["x2"] = max(acc["x2"], r["x2"])
                acc["text"] = acc["text"] + "\n\n" + r["text"]
                acc["confidence"] = max(acc["confidence"], r["confidence"])
            else:
                out.append(acc)
                acc = r
        if acc is not None:
            out.append(acc)
    res = pd.DataFrame.from_records(out)
    return res[list(pdf.columns)]


def layout(boxes: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Full stage 2: boxes → ordered boxes with reading_order.

    ``num_partitions`` forces the single doc_id exchange width (skew knob;
    AQE may coalesce).
    """
    if num_partitions:
        boxes = boxes.repartition(num_partitions, "doc_id")
    df = _abandon_and_print_area(boxes)
    df = _columns_native(df)
    df = _blocks_dedup_order(df)
    df = df.select(
        "doc_id",
        "offset",
        "kind",
        "text",
        "media_ref",
        "x1",
        "y1",
        "x2",
        "y2",
        "confidence",
        "column_number",
        "column_width",
        "page_block",
        "reading_order",
    )
    merged = df.groupBy("doc_id").applyInPandas(
        lambda pdf: _merge_boxes_pdf(pdf), schema=ORDERED_BOX_SCHEMA
    )
    w_final = Window.partitionBy("doc_id").orderBy("reading_order")
    merged = merged.withColumn("reading_order", F.row_number().over(w_final))
    return merged.withColumn(
        "box_page_id",
        F.format_string(
            "B%dC%dR%d", F.col("page_block"), F.col("column_number"), F.col("reading_order")
        ),
    )
