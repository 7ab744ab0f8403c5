"""Stage 2 — layout analysis + reading-order reconstruction (Spark-first).

Every step that the reference implements as a per-page Python loop
(``function_modules/bbox_functions.py:789-896``) is re-expressed here as
window functions and native column expressions over a **single** hash
exchange on ``doc_id``; only the inherently sequential accumulate-or-flush
box merge (reference ``bbox_functions.py:508-583``) drops to an Arrow
iterator UDF — a ``mapInPandas`` over the already doc-partitioned,
(doc, block, column, order)-sorted stream with doc-boundary-safe
rebatching, so Python is entered once per Arrow batch, not once per page.

Shuffle plan (verified with .explain): one Exchange(hashpartitioning
(doc_id)) — every subsequent Window requires only
ClusteredDistribution(doc_id, …), which the existing partitioning already
satisfies, so Catalyst inserts sorts, not shuffles.

Semantics match :mod:`..oracle` step-for-step (L1–L10 in its docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERGE_WIDTH_MULTIPLIER = 1.5
ABANDON_TOP_FRACTION = 0.1
MIN_OVERLAP_FRACTION = 0.1
BIN_EPSILON = 0.001
MIN_BOX_HEIGHT = 10.0  # reference postprocess_bbox(min_height=10)
CANONICAL_KINDS = ("figure", "table", "text")

ORDERED_BOX_SCHEMA = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "x1 double, y1 double, x2 double, y2 double, confidence double, "
    "column_number int, column_width double, page_block int, reading_order int"
)


def _abandon_and_print_area(boxes: DataFrame) -> DataFrame:
    """L0–L2: DocLayout-YOLO's 'plain text' class normalizes to 'text'
    BEFORE any layout math (reference ``pipeline_stages.py:193-195`` —
    without this, the L4a relabel would wrongly title-ize body text and
    L3's median text width would skip it); then print-area bounds,
    top-zone abandon reclassification, filter."""
    w = Window.partitionBy("doc_id")
    boxes = boxes.withColumn(
        "kind",
        F.when(F.col("kind") == "plain text", F.lit("text")).otherwise(F.col("kind")),
    )
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
    # column edges (reference assign_columns' c1/c2,
    # ``bbox_functions.py:296-319``): the owning bin's edges for
    # single-column boxes, the print-area edges for column-0 boxes —
    # consumed by the L8a x-widening step.
    single = F.col("column_number") >= 1
    df = df.withColumn(
        "c1",
        F.when(single, edge((F.col("column_number") - 1).cast("int"))).otherwise(
            F.col("_px1")
        ),
    ).withColumn(
        "c2",
        F.when(single, edge(F.col("column_number").cast("int"))).otherwise(
            F.col("_px2")
        ),
    )
    return df.drop("_px1", "_px2", "_pw", "_med_w", "_k")


def _blocks_dedup_order(df: DataFrame) -> DataFrame:
    """L4a + L5–L8b: non-canonical-class→title relabel
    (``bbox_functions.py:852-856``), page blocks (gaps-and-islands window
    instead of the reference's O(n·k) loop, ``bbox_functions.py:323-372``),
    duplicate-box removal keeping max confidence (``:383-409``),
    reading-order numbering (``:412-419``), y2 adjustment (``:586-611``),
    x widening to column edges (``:614-646``), and the min-height sliver
    filter (``:870-871``)."""
    # L4a: a real layout model emits classes beyond the canonical set
    # (isolate_formula, figure_caption, …) — everything not figure/table/
    # text becomes title (abandon rows are already gone after L2).
    df = df.withColumn(
        "kind",
        F.when(F.col("kind").isin(*CANONICAL_KINDS), F.col("kind")).otherwise(
            F.lit("title")
        ),
    )
    w_scan = (
        Window.partitionBy("doc_id")
        .orderBy("y1", "offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn(
        "page_block",
        F.sum(F.when(F.col("column_number") == 0, 1).otherwise(0)).over(w_scan).cast("int"),
    )
    # duplicate-box removal keeping max confidence (tie: lowest offset).
    # A row_number window over the rounded coordinates shares the doc_id
    # clustering (no exchange); measured faster than a max_by(struct)
    # hash-agg, whose whole-row struct copies cost more than the sort.
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
    # L8a: widen non-figure boxes to their column edges (x1 := min(x1, c1),
    # x2 := max(x2, c2)) — reference adjust_x_coordinates.
    nonfig = F.col("kind") != "figure"
    df = df.withColumn(
        "x1", F.when(nonfig & (F.col("x1") > F.col("c1")), F.col("c1")).otherwise(F.col("x1"))
    ).withColumn(
        "x2", F.when(nonfig & (F.col("x2") < F.col("c2")), F.col("c2")).otherwise(F.col("x2"))
    )
    return df


def _fill_gaps_inline(df: DataFrame) -> DataFrame:
    """L8a.5 (reference ``bbox_functions.py:682-786``, chain position per
    ``postprocess_bbox`` — between the x widening and the min-height
    filter): on eligible pages (>1 column, exactly one block), synthesize
    an empty text box above the first / below the last box of every
    column that doesn't reach the page's content bounds.  Sub-10px gaps
    are dropped by the L8b filter right after, reproducing the
    reference's implicit threshold.

    Plan shape: windows on the existing doc_id clustering + ONE
    ``inline`` explode of a per-row [self, head?, tail?] struct array —
    no self-union, so the upstream window chain is computed once, not
    three times.  ``doc_id`` is deliberately kept OUT of the exploded
    struct and passed through the Generate as the original column: a
    struct-extracted doc_id would be a NEW attribute, Catalyst would
    lose the hashpartitioning(doc_id) property, and the whole box frame
    would re-shuffle before the payload join (measured: the extra
    exchange cost ~24% wall at local[8] and dragged N→4N scaling
    efficiency from ~0.90 to ~0.76)."""
    cols = [c for c in df.columns if c != "doc_id"]
    w_doc = Window.partitionBy("doc_id")
    # Column-grain min/max deliberately reuse the EXACT window spec of
    # the upstream lead-y2 window ((doc, page_block, column) ordered by
    # (y1, offset)) with an unbounded frame: CollapseWindow then fuses
    # them into that WindowExec — zero extra pass.  (doc, page_block,
    # column) ≡ (doc, column) exactly on the single-block pages the
    # eligibility gate admits; on multi-block pages the values are
    # unused (gated by _elig).
    w_col = (
        Window.partitionBy("doc_id", "page_block", "column_number")
        .orderBy("y1", "offset")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # single-block eligibility as min==max (one distinct value) — a
    # collect_set window materializes a per-row set for the same answer;
    # first/last-in-column as reading_order == min/max over the column
    # (reading_order is unique within a doc) — two ordered row_number
    # windows would add two differently-ordered sort passes
    eligible = (F.max("column_number").over(w_doc) > 1) & (
        F.min("page_block").over(w_doc) == F.max("page_block").over(w_doc)
    )
    # w_doc columns grouped together so CollapseWindow merges them into
    # ONE doc-grain WindowExec pass
    df = (
        df.withColumn("_elig", eligible & (F.col("column_number") > 0))
        .withColumn("_dy1", F.min("y1").over(w_doc))
        .withColumn("_dy2", F.max("y2").over(w_doc))
        .withColumn(
            "_first", F.col("reading_order") == F.min("reading_order").over(w_col)
        )
        .withColumn(
            "_last", F.col("reading_order") == F.max("reading_order").over(w_col)
        )
    )

    def gap_struct(y1c, y2c):
        overrides = {
            "offset": F.lit(-1),
            "kind": F.lit("text"),
            "confidence": F.lit(0.0),
            "y1": y1c,
            "y2": y2c,
            "center_y": (y1c + y2c) / F.lit(2.0),
            "reading_order": F.lit(-1),
        }
        return F.struct(
            *[overrides.get(c, F.col(c)).alias(c) for c in cols]
        )

    self_struct = F.struct(*[F.col(c).alias(c) for c in cols])
    head = F.when(
        F.col("_elig") & F.col("_first") & (F.col("y1") > F.col("_dy1")),
        gap_struct(F.col("_dy1"), F.col("y1")),
    )
    tail = F.when(
        F.col("_elig") & F.col("_last") & (F.col("y2") < F.col("_dy2")),
        gap_struct(F.col("y2"), F.col("_dy2")),
    )
    arr = F.filter(F.array(self_struct, head, tail), lambda x: x.isNotNull())
    return df.select("doc_id", F.inline(arr))


def _min_height_filter(df: DataFrame) -> DataFrame:
    # L8b: drop sliver boxes the y2 adjustment collapsed below min_height.
    df = df.filter(F.col("y2") - F.col("y1") >= F.lit(MIN_BOX_HEIGHT))
    return df.drop("c1", "c2")


def _merge_frame(pdf: pd.DataFrame, post_correct: bool = False) -> pd.DataFrame:
    """L9 fold over a frame sorted by (doc_id, page_block, column_number,
    reading_order): accumulate-or-flush merge of consecutive text boxes
    within (doc, block, column>0) while the merged span height stays
    ≤ 1.5 × column_width.

    Implemented as a numpy index walk (no per-row dict materialization —
    the fold only reads scalar geometry; texts are touched once per merged
    run at assembly time)."""
    n = len(pdf)
    doc = pd.factorize(pdf["doc_id"])[0]
    block = pdf["page_block"].to_numpy()
    col = pdf["column_number"].to_numpy()
    is_text = (pdf["kind"] == "text").to_numpy()
    y1 = pdf["y1"].to_numpy()
    y2 = pdf["y2"].to_numpy()
    colw = pdf["column_width"].to_numpy()

    # runs[i] = (head_idx, [member indices])
    heads: list[int] = []
    members: list[list[int]] = []
    acc = -1  # index into heads/members of the open run, -1 = none
    acc_head = -1
    for i in range(n):
        mergeable = is_text[i] and col[i] != 0
        if not mergeable:
            acc = -1
            heads.append(i)
            members.append([i])
            continue
        same_group = (
            acc != -1
            and doc[i] == doc[acc_head]
            and block[i] == block[acc_head]
            and col[i] == col[acc_head]
        )
        if same_group and (y2[i] - y1[acc_head]) <= MERGE_WIDTH_MULTIPLIER * colw[i]:
            members[acc].append(i)
            # extend the open run's bounds for subsequent cap checks
        else:
            heads.append(i)
            members.append([i])
            acc = len(heads) - 1
            acc_head = i
    out = pdf.iloc[heads].copy()
    multi = [(j, m) for j, m in enumerate(members) if len(m) > 1]
    if multi:
        texts = pdf["text"].to_numpy()
        x1a = pdf["x1"].to_numpy()
        x2a = pdf["x2"].to_numpy()
        conf = pdf["confidence"].to_numpy()
        oc = {c: out.columns.get_loc(c) for c in ("text", "x1", "x2", "y2", "confidence")}
        for j, m in multi:
            out.iat[j, oc["text"]] = "\n\n".join(texts[m])
            out.iat[j, oc["x1"]] = x1a[m].min()
            out.iat[j, oc["x2"]] = x2a[m].max()
            out.iat[j, oc["y2"]] = y2[m[-1]]
            out.iat[j, oc["confidence"]] = conf[m].max()
    # L9b second y2 adjustment (reference postprocess_bbox re-runs
    # adjust_y2_coordinates after the merge/deletion pass): rows within
    # (doc, block, column) are already in ascending-y1 emit order, so
    # "next row's y1 where the (doc, block, column) key is unchanged"
    # re-closes the gaps the min-height deletions opened.  Pure numpy
    # shift-compare — a pandas groupby here cost ~8% of the whole merge
    # pass per Arrow batch.
    if len(out) > 1:
        doc_o = pd.factorize(out["doc_id"])[0]
        blk_o = out["page_block"].to_numpy()
        col_o = out["column_number"].to_numpy()
        same = (
            (doc_o[:-1] == doc_o[1:])
            & (blk_o[:-1] == blk_o[1:])
            & (col_o[:-1] == col_o[1:])
        )
        y1_o = out["y1"].to_numpy()
        y2_o = out["y2"].to_numpy().copy()
        y2_o[:-1] = np.where(same, y1_o[1:], y2_o[:-1])
        out["y2"] = y2_o
    # L10 renumber in-UDF: head emit order within a doc IS ascending old
    # reading_order (both follow (block, column, y1, offset)), so the
    # renumber is a per-doc cumcount — saves a whole post-merge window
    # sort over wide rows.
    out["reading_order"] = out.groupby("doc_id", sort=False).cumcount() + 1
    if post_correct:
        # T1 folded into the merge's pandas pass: the text is already in
        # Python here, so normalizing now saves a second full Arrow
        # round-trip of every byte of text through ArrowEvalPython.
        from .articles import _post_correct_pd

        out["text"] = _post_correct_pd(out["kind"], out["text"])
    return out


def _doc_complete_stream(batches, frame_fn):
    """mapInPandas wrapper: one Python call per Arrow batch (not per doc).
    Batches may split a document, so a tail buffer holds the last doc_id's
    rows until the next batch proves it complete — the classic
    partition-iterator re-chunking pattern."""
    buf: pd.DataFrame | None = None
    for pdf in batches:
        if buf is not None and len(buf):
            pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
        if not len(pdf):
            continue
        last = pdf["doc_id"].iloc[-1]
        first_of_last = int((pdf["doc_id"].to_numpy() == last).argmax())
        if first_of_last == 0:
            buf = pdf
            continue
        yield frame_fn(pdf.iloc[:first_of_last])
        buf = pdf.iloc[first_of_last:].reset_index(drop=True)
    if buf is not None and len(buf):
        yield frame_fn(buf)


def _merge_stream(batches, post_correct: bool = False):
    yield from _doc_complete_stream(
        batches, lambda pdf: _merge_frame(pdf, post_correct)
    )


def _merge_extract_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    from .articles import spans_frame_pd

    return spans_frame_pd(_merge_frame(pdf, post_correct=True))


def _merge_extract_stream(batches):
    yield from _doc_complete_stream(batches, _merge_extract_frame)


def vertical_overlap_pct(y1a, y2a, y1b, y2b):
    """F21 — vertical overlap percentage of two boxes, relative to the
    SMALLER box's height (reference ``bbox_functions.py:424-439``).
    Column-expression helper, usable in joins/filters/windows."""
    overlap = F.least(y2a, y2b) - F.greatest(y1a, y1b)
    min_h = F.least(y2a - y1a, y2b - y1b)
    return F.when(overlap <= 0, F.lit(0.0)).otherwise(overlap / min_h * 100.0)


def merge_overlapping_boxes(
    boxes: DataFrame, min_overlap_percent: float = 50.0
) -> DataFrame:
    """G4 — merge consecutive-in-reading-order boxes within (doc, column)
    whose vertical overlap is ≥ ``min_overlap_percent`` of the smaller
    box (reference ``bbox_functions.py:459-505``, legacy pre-text merge).

    The reference's greedy pop-and-scan loop only ever merges PAIRS: a
    merged box keeps min(reading_order), so the next candidate is ≥2
    away and never joins — greedy-from-the-left pairing inside maximal
    runs of consecutively-overlapping boxes.  That is exactly
    gaps-and-islands + position parity, so this is pure window SQL: edge
    = (Δreading_order == 1 ∧ overlap ≥ p) vs the previous row; island =
    cumsum(¬edge); pair = floor(position_in_island / 2); one groupBy
    merges each pair.  No UDF, no extra exchange beyond doc_id
    clustering.  Output matches the reference's merged dict: geometry +
    centers + column + min reading_order (the legacy op drops text)."""
    w = Window.partitionBy("doc_id", "column_number").orderBy("reading_order")
    edge = (
        (F.col("reading_order") - F.lag("reading_order").over(w) == 1)
        & (
            vertical_overlap_pct(
                F.lag("y1").over(w),
                F.lag("y2").over(w),
                F.col("y1"),
                F.col("y2"),
            )
            >= F.lit(min_overlap_percent)
        )
    )
    df = boxes.withColumn("_edge", F.coalesce(edge, F.lit(False)))
    df = df.withColumn(
        "_island",
        F.sum(F.when(F.col("_edge"), 0).otherwise(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_isl = Window.partitionBy("doc_id", "column_number", "_island").orderBy(
        "reading_order"
    )
    df = df.withColumn("_pair", F.floor((F.row_number().over(w_isl) - 1) / 2))
    merged = (
        df.groupBy("doc_id", "column_number", "_island", "_pair")
        .agg(
            F.min("x1").alias("x1"),
            F.min("y1").alias("y1"),
            F.max("x2").alias("x2"),
            F.max("y2").alias("y2"),
            F.min("reading_order").alias("reading_order"),
        )
        .drop("_island", "_pair")
    )
    return merged.select(
        "doc_id",
        "column_number",
        "reading_order",
        "x1",
        "y1",
        "x2",
        "y2",
        ((F.col("x1") + F.col("x2")) / 2).alias("center_x"),
        ((F.col("y1") + F.col("y2")) / 2).alias("center_y"),
    )


def apply_predictions(ordered: DataFrame, preds: DataFrame) -> DataFrame:
    """J6 — join classifier predictions on the box id and conditionally
    overwrite ``kind`` (reference behavior:
    ``classification_data_and_analysis.py:497-499`` merges model
    predictions back onto boxes by bbox_uid).  Left join: boxes without a
    prediction keep their original class."""
    p = preds.select(
        "doc_id", "box_page_id", F.col("predicted_kind").alias("_pred_kind")
    )
    return (
        ordered.join(p, ["doc_id", "box_page_id"], "left")
        .withColumn("kind", F.coalesce("_pred_kind", "kind"))
        .drop("_pred_kind")
    )


def fill_column_gaps(df: DataFrame, min_gap: float = 10.0) -> DataFrame:
    """G6 — synthesize empty boxes at column heads/tails so every column
    spans the page's content area (reference behavioral contract:
    ``bbox_functions.py:682-786``, eligibility per ``:696-698``: pages
    with >1 column and exactly one block).

    Pure-SQL: per-(doc, column) min/max windows + a union of synthesized
    rows — no UDF, no extra shuffle beyond the existing doc_id clustering.
    Synthesized boxes carry kind='text', empty text; they only affect
    geometry consumers (coverage), not extracted span text.  Not part of
    the default chain (mirrors the reference's per-periodical
    fill_columns flag).

    Relationship to :func:`_fill_gaps_inline` (the ``fill_columns=True``
    chain step): this standalone operator runs AFTER layout on ordered
    boxes and spans columns to their box extents; the inline step runs at
    the reference's chain position (pre-merge) where gap boxes can still
    merge into column text.  Both use the same ``>= min_gap``/min-height
    10px boundary."""
    w_doc = Window.partitionBy("doc_id")
    w_col = Window.partitionBy("doc_id", "column_number")
    eligible = (F.max("column_number").over(w_doc) > 1) & (
        F.size(F.collect_set("page_block").over(w_doc)) == 1
    )
    df = (
        df.withColumn("_doc_y1", F.min("y1").over(w_doc))
        .withColumn("_doc_y2", F.max("y2").over(w_doc))
        .withColumn("_col_y1", F.min("y1").over(w_col))
        .withColumn("_col_y2", F.max("y2").over(w_col))
        .withColumn("_col_x1", F.min("x1").over(w_col))
        .withColumn("_col_x2", F.max("x2").over(w_col))
        .withColumn("_first_in_col", F.row_number().over(w_col.orderBy("y1", "offset")) == 1)
        .withColumn("_eligible", eligible)
    )
    base = lambda y1c, y2c: [  # noqa: E731
        F.col("doc_id"),
        F.lit(-1).alias("offset"),
        F.lit("text").alias("kind"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.col("_col_x1").alias("x1"),
        y1c.alias("y1"),
        F.col("_col_x2").alias("x2"),
        y2c.alias("y2"),
        F.lit(0.0).alias("confidence"),
        F.col("column_number"),
        F.col("column_width"),
        F.col("page_block"),
        F.col("reading_order"),
        F.format_string(
            "B%dC%dR%dG", F.col("page_block"), F.col("column_number"), F.col("reading_order")
        ).alias("box_page_id"),
    ]
    head_rows = df.filter(
        F.col("_eligible")
        & F.col("_first_in_col")
        & (F.col("column_number") > 0)
        & (F.col("_col_y1") - F.col("_doc_y1") >= min_gap)
    ).select(*base(F.col("_doc_y1"), F.col("_col_y1")))
    tail_rows = df.filter(
        F.col("_eligible")
        & F.col("_first_in_col")
        & (F.col("column_number") > 0)
        & (F.col("_doc_y2") - F.col("_col_y2") >= min_gap)
    ).select(*base(F.col("_col_y2"), F.col("_doc_y2")))
    keep = [c for c in df.columns if not c.startswith("_")]
    return df.select(*keep).unionByName(head_rows).unionByName(tail_rows)


def _sorted_frame(
    boxes: DataFrame,
    num_partitions: int | None = None,
    payload: DataFrame | None = None,
    fill_columns: bool = False,
) -> DataFrame:
    """Shared stage-2 prefix: doc_id exchange → narrow geometry windows →
    payload re-attach → merge-order sort.

    Narrow-row discipline (the 100 TB shuffle-sort lever): the window
    chain sorts its input 4–5 times with different orderings, so the text
    payload (10–50× the geometry bytes) is projected OUT before the first
    window and re-attached ONCE afterwards via a per-doc offset→payload
    map — the windows sort ~100-byte geometry rows, and text bytes cross
    the wire exactly once (the map join's exchange).

    ``payload``: optional pre-built (doc_id, _payload map<offset,
    (text, media_ref)>) frame (see :func:`..geometry.docs_payload`) —
    the production path, where boxes are the narrow GEO_BOX_SCHEMA and
    text never flowed through the geometry UDF at all.  When omitted,
    the payload map is derived from the boxes frame itself (one
    doc_id-clustered groupBy, no extra exchange)."""
    n = num_partitions or boxes.sparkSession.sparkContext.defaultParallelism
    boxes = boxes.repartition(n, "doc_id")
    if payload is None:
        payload_map = (
            boxes.select("doc_id", "offset", "text", "media_ref")
            .groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("offset", F.struct("text", "media_ref")))
                ).alias("_payload")
            )
        )
        geo = boxes.drop("text", "media_ref")
    else:
        payload_map = payload
        geo = boxes
    geo = _abandon_and_print_area(geo)
    geo = _columns_native(geo)
    geo = _blocks_dedup_order(geo)
    if fill_columns:
        geo = _fill_gaps_inline(geo)
    geo = _min_height_filter(geo)
    entry = F.element_at(F.col("_payload"), F.col("offset"))
    df = (
        geo.join(payload_map, "doc_id")
        # synthesized gap boxes (offset -1) have no payload entry → empty text
        .withColumn("text", F.coalesce(entry["text"], F.lit("")))
        .withColumn("media_ref", entry["media_ref"])
    )
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
    # sort keys match the preceding window's physical order exactly
    # ((doc, block, column, y1, offset) ≡ reading_order order within the
    # group), so Catalyst elides most of this sort
    return df.sortWithinPartitions(
        "doc_id", "page_block", "column_number", "y1", "offset"
    )


def layout(
    boxes: DataFrame,
    num_partitions: int | None = None,
    payload: DataFrame | None = None,
    post_correct: bool = False,
    fill_columns: bool = False,
) -> DataFrame:
    """Full stage 2: boxes → ordered boxes with reading_order.

    ``num_partitions`` forces the single doc_id exchange width (skew knob;
    AQE may coalesce).  See :func:`_sorted_frame` for the narrow-row
    window design; ``post_correct=True`` folds the T1 OCR normalization
    into the merge UDF\'s pandas pass (one Arrow text round-trip).
    ``fill_columns=True`` runs the reference's default in-chain column
    gap fill (``postprocess_bbox(fill_columns=True)``) — the pipeline
    entry points in :mod:`..plans.pipeline` default it ON to match the
    reference; this operator-level default stays False so callers
    composing stages opt in explicitly (the per-periodical shape of
    ``result_section.py:89-92``).  Gap boxes carry empty text, so
    extracted SPANS are identical either way (T2 drops empty parts),
    only box geometry consumers differ."""
    import functools

    merged = _sorted_frame(boxes, num_partitions, payload, fill_columns).mapInPandas(
        functools.partial(_merge_stream, post_correct=post_correct),
        schema=ORDERED_BOX_SCHEMA,
    )
    return merged.withColumn(
        "box_page_id",
        F.format_string(
            "B%dC%dR%d", F.col("page_block"), F.col("column_number"), F.col("reading_order")
        ),
    )


SPAN_SCHEMA = "doc_id string, kind string, text string, media_ref string, order int"


def layout_extract_spans(
    boxes: DataFrame,
    num_partitions: int | None = None,
    payload: DataFrame | None = None,
    fill_columns: bool = False,
) -> DataFrame:
    """Fused production plan: the SAME sorted stream the box merge uses,
    with merge → OCR post-correct → paragraph split → title reclass/merge
    → final ordering all inside ONE per-doc vectorized pandas pass
    (articles.spans_frame_pd).  Versus the declarative chain this saves
    two full-frame text sorts, an explode, and a second Arrow round-trip
    — and its semantics are pinned byte-equal to the declarative
    operators by tests/test_e2e_extraction.py."""
    return _sorted_frame(boxes, num_partitions, payload, fill_columns).mapInPandas(
        _merge_extract_stream, schema=SPAN_SCHEMA
    )
