"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-periodical ingest totals across micro-batches — the kind of
arbitrary user state (counters, dedup sets, session buffers) that
watermarked aggregations can't express.  State is a small fixed-width
tuple per key, persisted in the streaming checkpoint, so a restarted
query continues the totals exactly where the previous run stopped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "periodical string, total_docs long, total_spans long"
STATE_SCHEMA = "total_docs long, total_spans long"


def _update(key, pdfs, state):
    (periodical,) = key
    docs0, spans0 = state.get if state.exists else (0, 0)
    n_docs, n_spans = 0, 0
    for pdf in pdfs:
        n_docs += len(pdf)
        n_spans += int(pdf["n_spans"].sum())
    state.update((docs0 + n_docs, spans0 + n_spans))
    yield pd.DataFrame(
        {
            "periodical": [periodical],
            "total_docs": [docs0 + n_docs],
            "total_spans": [spans0 + n_spans],
        }
    )


def running_totals(docs_stream: DataFrame) -> DataFrame:
    """Streaming docs → one updated (periodical, total_docs, total_spans)
    row per key per micro-batch, state carried across batches AND
    restarts (checkpointed)."""
    src = docs_stream.select(
        F.split(F.col("doc_id"), "-").getItem(0).alias("periodical"),
        F.size("spans").alias("n_spans"),
    )
    return src.groupBy("periodical").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
