"""S10 — NDJSON nested-annotation scan (Labelbox-style export).

The reference flattens a nested annotation export with a Python loop over
``projects → labels → annotations → objects``
(``/root/reference/send_to_pixel_streaming.py:196-262``); here the same
flattening is a schema-first ``spark.read.json`` plus a chain of
``explode`` — fully distributed, no Python, and the explicit schema means
no sampling-based inference pass over a 100 TB export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BBOX = T.StructType(
    [
        T.StructField("top", T.DoubleType()),
        T.StructField("left", T.DoubleType()),
        T.StructField("height", T.DoubleType()),
        T.StructField("width", T.DoubleType()),
    ]
)

ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField(
            "data_row",
            T.StructType([T.StructField("external_id", T.StringType())]),
        ),
        T.StructField(
            "projects",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField(
                            "labels",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("performed_by", T.StringType()),
                                        T.StructField(
                                            "annotations",
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "objects",
                                                        T.ArrayType(
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "name",
                                                                        T.StringType(),
                                                                    ),
                                                                    T.StructField(
                                                                        "bounding_box",
                                                                        _BBOX,
                                                                    ),
                                                                ]
                                                            )
                                                        ),
                                                    )
                                                ]
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        )
                    ]
                ),
            ),
        ),
    ]
)


def read_annotations_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON annotation export → one row per annotated object:
    (doc_id, annotator, label, x1, y1, x2, y2)."""
    raw = spark.read.schema(ANNOTATION_SCHEMA).json(path)
    bb = F.col("obj.bounding_box")
    return (
        raw.select(
            F.col("data_row.external_id").alias("doc_id"),
            F.explode(F.map_values("projects")).alias("proj"),
        )
        .select("doc_id", F.explode("proj.labels").alias("lab"))
        .select(
            "doc_id",
            F.col("lab.performed_by").alias("annotator"),
            F.explode("lab.annotations.objects").alias("obj"),
        )
        .select(
            "doc_id",
            "annotator",
            F.col("obj.name").alias("label"),
            bb["left"].alias("x1"),
            bb["top"].alias("y1"),
            (bb["left"] + bb["width"]).alias("x2"),
            (bb["top"] + bb["height"]).alias("y2"),
        )
    )
