"""End-to-end extraction plan: docs → ordered boxes → extracted spans.

One logical plan, lazily composed; Catalyst sees the whole chain, so
column pruning / filter pushdown / exchange reuse apply across stages.
The only exchanges in the physical plan are (1) the explicit salt-aware
repartition on doc_id feeding the layout windows and (2) the final
re-nest groupBy — everything in between reuses partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.articles import build_articles, extract_spans, nest_spans
from ..operators.geometry import docs_to_boxes
from ..operators.layout import layout


def extract(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """docs(doc_id, spans) → flat extracted spans (doc_id, kind, text,
    media_ref, order).

    The input is round-robin repartitioned first: a docs table of many
    small files would otherwise be packed into a handful of scan splits,
    serializing the per-doc geometry/explode stage."""
    if num_partitions:
        docs = docs.repartition(num_partitions)
    boxes = docs_to_boxes(docs)
    ordered = layout(boxes, num_partitions=num_partitions)
    return extract_spans(ordered)


def extract_from_boxes(boxes: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Extraction over a boxes frame that already carries geometry
    (production shape: layout-model output lands next to the spans;
    also the deterministic documents-table adapter).  Skips only the
    geometry-attach stage — layout analysis, reading order, OCR
    post-correction, and span construction are the same operators."""
    ordered = layout(boxes, num_partitions=num_partitions)
    return extract_spans(ordered)


def extract_nested(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """docs → extracted(doc_id, spans<kind,text,media_ref,order>)."""
    return nest_spans(extract(docs, num_partitions=num_partitions))


def extract_articles(docs: DataFrame, num_partitions: int | None = None) -> DataFrame:
    return build_articles(extract(docs, num_partitions=num_partitions))


def default_parallelism(spark: SparkSession) -> int:
    return spark.sparkContext.defaultParallelism
