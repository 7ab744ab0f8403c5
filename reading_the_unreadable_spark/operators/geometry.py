"""Stage 1 — span→box frame: explode docs.spans + attach derived geometry.

Implemented as a single ``mapInPandas`` (Arrow-batched iterator UDF): each
doc row already holds all of its spans, so the explode+geometry attach is
embarrassingly parallel and needs **zero shuffle**.  Geometry is re-derived
deterministically from ``doc_id`` (see :mod:`..synth`) — in a production
deployment these columns would arrive from the upstream layout model
(reference behavior: ``function_modules/pipeline_stages.py:127-137``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..synth import page_arrays

BOX_SCHEMA = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "x1 double, y1 double, x2 double, y2 double, confidence double"
)


def _attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # column accumulators across ALL docs in a batch: one DataFrame build
    # per Arrow batch, not per doc (the per-doc constructor cost dominated)
    for pdf in batches:
        doc_ids: list[str] = []
        offsets: list[int] = []
        kinds: list[str] = []
        texts: list[str] = []
        medias: list[str | None] = []
        geo_cols: dict[str, list[np.ndarray]] = {
            c: [] for c in ("x1", "y1", "x2", "y2", "confidence")
        }
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            geo = page_arrays(doc_id)
            span_offsets = np.fromiter(
                (s["offset"] for s in spans), dtype=np.int32, count=len(spans)
            )
            idx = np.searchsorted(geo["offset"], span_offsets)
            doc_ids.extend([doc_id] * len(spans))
            offsets.extend(span_offsets.tolist())
            kinds.extend(s["kind"] for s in spans)
            texts.extend(s["text"] if s["text"] is not None else "" for s in spans)
            medias.extend(s["media_ref"] for s in spans)
            for c in geo_cols:
                geo_cols[c].append(geo[c][idx])
        if doc_ids:
            out = {
                "doc_id": doc_ids,
                "offset": np.array(offsets, dtype=np.int32),
                "kind": kinds,
                "text": texts,
                "media_ref": medias,
            }
            for c, chunks in geo_cols.items():
                out[c] = np.concatenate(chunks)
            yield pd.DataFrame(out)


def docs_to_boxes(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → one row per span with bbox geometry."""
    return docs.mapInPandas(_attach, schema=BOX_SCHEMA)
