"""Multimodal column plumbing: images/audio/video as opaque binary +
typed metadata.

The decode/feature kernels are STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder exercises the
identical Spark plumbing — schema, batch shape, mapInPandas signature —
so the distribution path is real and tested even though the pixel math
is not.  Swapping in PIL/soundfile later changes only ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = (
    "media_ref string, kind string, n_bytes long, sha1 string, "
    "feat array<float>"
)


def synth_media_table(spark: SparkSession, refs: list[str]) -> DataFrame:
    """Deterministic fake media rows for the given media_refs."""
    rows = []
    for r in refs:
        payload = hashlib.sha256(r.encode()).digest() * 8  # 256 fake bytes
        rows.append((r, "image", bytearray(payload), 64, 64, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_one(payload: bytes, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/cv2 (not in this container); "
            "run with fake=True for the deterministic stub"
        )
    # deterministic fake: bytes -> normalized float grid
    arr = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: one Arrow batch of (media_ref, payload) in, one batch of
    fixed-width float features out — the exact plumbing a real
    decode/embed UDF needs (per-executor model caching would hang off the
    iterator scope here)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task init scope (model load would go here, once per worker)
        for pdf in batches:
            feats = [
                _decode_one(bytes(p), fake) if p is not None else np.zeros(256, np.float32)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "sha1": [
                        hashlib.sha1(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def join_media_to_spans(spans: DataFrame, media_feats: DataFrame) -> DataFrame:
    """Attach media features to figure spans (broadcast if small)."""
    return spans.join(
        F.broadcast(media_feats.select("media_ref", "feat", "sha1")),
        "media_ref",
        "left",
    )
