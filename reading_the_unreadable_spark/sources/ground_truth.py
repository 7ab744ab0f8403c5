"""S9 — folder-of-txt ground-truth scan.

The reference evaluates OCR quality against a directory of per-page
``.txt`` transcriptions loaded with a Python file loop
(``/root/reference/function_modules/analysis_functions.py:17-56``); here
it is a distributed ``spark.read.text(wholetext=True)`` scan where the
document id is recovered from ``input_file_name()`` — one task per file
split, no driver-side listing beyond what the data source already does.

The output shape (doc_id, text) plugs straight into
:func:`..operators.metrics.cer`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ground_truth_txt(spark: SparkSession, dir_path: str) -> DataFrame:
    """Scan a folder of ``<doc_id>.txt`` ground-truth transcriptions into
    (doc_id, text) — one row per file."""
    df = spark.read.text(dir_path, wholetext=True)
    doc_id = F.regexp_extract(F.input_file_name(), r"([^/]+)\.txt$", 1)
    return df.select(doc_id.alias("doc_id"), F.col("value").alias("text"))
