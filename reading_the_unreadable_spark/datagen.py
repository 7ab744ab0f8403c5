"""Distributed deterministic corpus generation.

``make_corpus_df`` builds the same docs table as :func:`synth.make_corpus`
but generates spans on the executors (mapInPandas over a ``spark.range``
of doc indices) — the driver never holds the corpus, so the same code
generates a 10^12-row table on a real cluster.  Determinism: content is a
pure function of doc_id (see synth.py), doc_ids a pure function of index.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .synth import synth_page

PERIODICALS = ["NS", "LDR", "MRT", "CLD", "EWJ", "SNSBL"]

DOCS_GEN_SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def doc_id_for(i: int, seed_tag: str) -> str:
    per = PERIODICALS[i % len(PERIODICALS)]
    tag = "XL-" if (i % 40 == 39) else ""
    return f"{per}-{tag}{seed_tag}-1850-{(i % 12) + 1:02d}-01_page_{i}"


def _gen(seed_tag: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                doc_id = doc_id_for(int(i), seed_tag)
                spans = [
                    {
                        "kind": b.kind,
                        "text": b.text,
                        "media_ref": b.media_ref,
                        "offset": b.offset,
                    }
                    for b in sorted(synth_page(doc_id), key=lambda b: b.offset)
                ]
                rows.append({"doc_id": doc_id, "spans": spans})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return fn


def make_corpus_df(
    spark: SparkSession, n_docs: int, seed_tag: str = "bench", partitions: int | None = None
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        _gen(seed_tag), schema=DOCS_GEN_SCHEMA
    )
