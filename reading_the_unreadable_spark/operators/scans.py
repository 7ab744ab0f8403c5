"""Scanned-page preprocessing: binarization + deskew, pure numpy.

The reference's domain is scanned newspaper pages; the standard
pipeline ahead of any layout analysis is (1) binarize the scan (Otsu's
global threshold — the classic histogram-valley split) and (2) estimate
and correct the page skew a flatbed/microfilm scan always carries
(projection-profile method: the rotation angle that maximizes the
variance of row ink counts is the angle at which text lines align with
the raster).  Both are classical published algorithms; both compose
with the rest of this repo — the binarized page is exactly what the
Group-4 TIFF writer (:mod:`tiff`/:mod:`g4`) consumes.

Scale shape: per-page numpy inside ``mapInPandas`` (same contract as
every media operator here — Arrow batches, no per-row Python UDF, no
collect)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SCAN_FEATURE_SCHEMA = (
    "media_ref string, otsu_threshold int, ink_ratio double, "
    "skew_deg double, decode_err string"
)


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method on a 256-bin histogram: the threshold maximizing
    between-class variance.  Returns t in [0, 255]; pixels >= t are
    background (white) for a dark-on-light scan."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 128
    p = hist / total
    omega = np.cumsum(p)  # class-0 probability up to t
    mu = np.cumsum(p * np.arange(256))  # class-0 mean mass
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega))
    sigma_b[~np.isfinite(sigma_b)] = 0.0
    return int(np.argmax(sigma_b))


def binarize_otsu(arr: np.ndarray) -> tuple[np.ndarray, int]:
    """HxWx3 (or HxW) uint8 → (bool page with True = WHITE — the
    convention the TIFF writer consumes — , threshold)."""
    gray = arr.mean(axis=2).astype(np.uint8) if arr.ndim == 3 else arr
    t = otsu_threshold(gray)
    # Otsu splits classes at <= t vs > t: class 0 (dark, <= t) is ink
    return gray > t, t


def estimate_skew(
    page: np.ndarray, max_deg: float = 5.0, step: float = 0.25
) -> float:
    """Projection-profile skew estimate on a bilevel page (True=white).
    For each candidate angle the columns are sheared by integer-pixel offsets
    (tan θ per row — exact enough under ±5°) and the variance of row
    INK counts is scored; text lines aligned with the raster concentrate
    ink into few rows → maximal variance.  Returns degrees with the
    sign such that ``deskew(arr, estimate_skew(page))`` straightens the
    page."""
    ink = ~page
    h, w = ink.shape
    if h < 4 or w < 4 or not ink.any():
        return 0.0
    # column-index grid reused across angles
    cols = np.arange(w)
    best_angle, best_score = 0.0, -1.0
    angles = np.arange(-max_deg, max_deg + 1e-9, step)
    col_ink = ink.astype(np.int32)
    for a in angles:
        shift = np.round(np.tan(np.radians(a)) * cols).astype(np.int64)
        # shear: row of each ink pixel moves by shift[col]; histogram
        # the shifted row indices weighted by per-(row,col) ink
        rows = np.add.outer(np.arange(h), shift)  # (h, w) target rows
        counts = np.bincount(
            (rows - rows.min()).ravel(), weights=col_ink.ravel()
        )
        score = float(np.var(counts))
        if score > best_score:
            best_score, best_angle = score, float(a)
    return -best_angle if best_angle != 0.0 else 0.0  # never -0.0


def deskew(arr: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate an HxWx3 image by ``-angle_deg`` (nearest neighbor,
    same-size canvas, white fill) — undoes :func:`estimate_skew`."""
    h, w = arr.shape[:2]
    theta = np.radians(-angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    sy = c * (yy - cy) - s * (xx - cx) + cy
    sx = s * (yy - cy) + c * (xx - cx) + cx
    syi = np.clip(np.round(sy).astype(np.int64), 0, h - 1)
    sxi = np.clip(np.round(sx).astype(np.int64), 0, w - 1)
    out = arr[syi, sxi]
    oob = (sy < 0) | (sy > h - 1) | (sx < 0) | (sx > w - 1)
    out[oob] = 255
    return out


def scan_preprocess_features(
    media: DataFrame, payload_col: str = "payload", max_deg: float = 5.0
) -> DataFrame:
    """(media_ref, payload binary, …) → per-page scan diagnostics:
    Otsu threshold, ink ratio, estimated skew.  Quarantines corrupt
    payloads via ``decode_err`` like every media extractor here."""
    from .multimodal import decode_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_ref", "otsu_threshold", "ink_ratio",
                    "skew_deg", "decode_err",
                )
            }
            for ref, p in zip(pdf["media_ref"], pdf[payload_col]):
                if p is None:
                    continue
                rows["media_ref"].append(ref)
                try:
                    arr = decode_image(bytes(p))
                except (ValueError, NotImplementedError) as e:
                    rows["otsu_threshold"].append(0)
                    rows["ink_ratio"].append(0.0)
                    rows["skew_deg"].append(0.0)
                    rows["decode_err"].append(f"{type(e).__name__}: {e}"[:200])
                    continue
                page, t = binarize_otsu(arr)
                rows["otsu_threshold"].append(int(t))
                rows["ink_ratio"].append(round(float((~page).mean()), 6))
                rows["skew_deg"].append(
                    round(estimate_skew(page, max_deg=max_deg), 3)
                )
                rows["decode_err"].append(None)
            if not rows["media_ref"]:
                continue
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema=SCAN_FEATURE_SCHEMA)
