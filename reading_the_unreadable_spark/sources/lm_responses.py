"""S6/S7 — JSONL LM-response scan with nested usage extraction.

The reference parses OpenAI-batch-style response JSONL line-by-line in
Python (``/root/reference/function_modules/send_to_lm_functions.py`` and
the knit path's ``process_jsonl_file``); here it is a schema-first
``spark.read.json`` in PERMISSIVE mode: well-formed lines project the
nested ``response.body.choices[0].message.content`` and
``response.body.usage`` token counts natively, malformed lines surface in
a ``_corrupt`` column instead of failing the job (F18's permissive-parse
contract at the source level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LM_RESPONSE_SCHEMA = (
    "custom_id STRING, "
    "response STRUCT<body: STRUCT<"
    "choices: ARRAY<STRUCT<message: STRUCT<content: STRING>>>, "
    "usage: STRUCT<prompt_tokens: BIGINT, completion_tokens: BIGINT>>>, "
    "_corrupt STRING"
)


def read_lm_responses(spark: SparkSession, path: str) -> DataFrame:
    """JSONL responses → (custom_id, content, prompt_tokens,
    completion_tokens, is_corrupt); malformed lines yield
    is_corrupt=true with every other field null."""
    raw = (
        spark.read.schema(LM_RESPONSE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    first_choice = F.element_at(F.col("response.body.choices"), 1)
    return raw.select(
        "custom_id",
        first_choice["message"]["content"].alias("content"),
        F.col("response.body.usage.prompt_tokens").alias("prompt_tokens"),
        F.col("response.body.usage.completion_tokens").alias("completion_tokens"),
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
    )
