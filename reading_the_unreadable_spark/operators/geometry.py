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
    for pdf in batches:
        frames = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            geo = page_arrays(doc_id)
            sp = pd.DataFrame([dict(s) for s in spans])
            sp["doc_id"] = doc_id
            sp["text"] = sp["text"].fillna("")
            sp["offset"] = sp["offset"].astype(np.int32)
            # vectorized geometry lookup by offset
            idx = np.searchsorted(geo["offset"], sp["offset"].to_numpy())
            for c in ("x1", "y1", "x2", "y2", "confidence"):
                sp[c] = geo[c][idx]
            frames.append(
                sp[
                    [
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
                    ]
                ]
            )
        if frames:
            yield pd.concat(frames, ignore_index=True)


def docs_to_boxes(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → one row per span with bbox geometry."""
    return docs.mapInPandas(_attach, schema=BOX_SCHEMA)
