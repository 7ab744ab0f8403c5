"""Audio columns: WAV/PCM decode + feature extraction, pure numpy/stdlib.

Same codec policy as :mod:`multimodal` (images) and :mod:`pdf`: the
container formats that need no codec library — RIFF/WAVE with integer
PCM (8/16/24/32-bit, any channel count), IEEE float (32/64-bit),
G.711 mu-law/A-law (the telephone-era companded formats, ITU-T G.711
LUT expansion), and WAVE_FORMAT_EXTENSIBLE wrapping any of them — are
decoded for real, so the full pipeline (binary column → decode →
feature-extract) runs end-to-end over Arrow batches.  Compressed
formats (MP3/AAC/ADPCM) raise ``NotImplementedError`` loudly; swapping
in soundfile/ffmpeg later changes only :func:`decode_wav`.

Features are the classic cheap descriptors a corpus-curation pass
filters on (silence/clipping/tone detection): duration, RMS level,
zero-crossing rate, spectral centroid, and an 8-band octave energy
profile from a numpy rFFT — no external DSP library.

Scale shape: identical to the image path — ``mapInPandas`` over binary
payloads (one Python entry per Arrow batch), payloads never collected,
never in a row-wise UDF.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

N_BANDS = 8
AUDIO_FEATURE_SCHEMA = (
    "media_ref string, kind string, n_bytes long, sha1 string, "
    "sample_rate int, n_channels int, duration_ms int, feat array<float>, "
    "decode_err string"
)


# ------------------------------------------------------ G.711 companding
def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry mu-law / A-law → linear int16 tables from the ITU-T
    G.711 expansion formulas (the classic segment/mantissa decode every
    telephony stack ships).  Built once at import; decode is then a
    single vectorized table lookup."""
    ulaw = np.empty(256, np.int16)
    for byte in range(256):
        u = ~byte & 0xFF
        exponent = (u >> 4) & 7
        mantissa = u & 0x0F
        sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
        ulaw[byte] = -sample if u & 0x80 else sample
    alaw = np.empty(256, np.int16)
    for byte in range(256):
        a = byte ^ 0x55
        exponent = (a >> 4) & 7
        mantissa = a & 0x0F
        if exponent == 0:
            sample = (mantissa << 4) + 8
        else:
            sample = ((mantissa << 4) + 0x108) << (exponent - 1)
        alaw[byte] = -sample if a & 0x80 else sample
    return ulaw, alaw


_ULAW_TO_LINEAR, _ALAW_TO_LINEAR = _g711_luts()


def encode_g711(samples: np.ndarray, law: str) -> np.ndarray:
    """int16 linear → companded uint8 (``law`` = 'ulaw' | 'alaw'),
    via nearest-match against the expansion table — exact inverse of
    the LUT decode for every representable level, used to build test
    fixtures and synthetic telephone-band corpora."""
    lut = _ULAW_TO_LINEAR if law == "ulaw" else _ALAW_TO_LINEAR
    order = np.argsort(lut, kind="stable")
    pos = np.searchsorted(lut[order], samples.astype(np.int32), side="left")
    pos = np.clip(pos, 0, 255)
    lo = np.clip(pos - 1, 0, 255)
    pick = np.where(
        np.abs(lut[order[lo]].astype(np.int32) - samples)
        <= np.abs(lut[order[pos]].astype(np.int32) - samples),
        lo,
        pos,
    )
    return order[pick].astype(np.uint8)


# ----------------------------------------------------------------- codec
def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 (n,) or multi-channel (n, ch) → RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    companded: np.ndarray, rate: int = 8000, law: str = "ulaw", ch: int = 1
) -> bytes:
    """Companded uint8 samples → RIFF/WAVE with format code 7 (mu-law)
    or 6 (A-law), 8 bits/sample — the telephone-era WAV layout."""
    if companded.dtype != np.uint8:
        raise ValueError("encode_wav_g711 expects companded uint8 samples")
    code = 7 if law == "ulaw" else 6
    data = companded.tobytes()
    fmt = struct.pack("<HHIIHHH", code, ch, rate, rate * ch, ch, 8, 0)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, float64 samples in [-1, 1],
    shape (n, ch)).  Integer PCM (8/16/24/32-bit), IEEE float (32/64),
    G.711 mu-law/A-law, and WAVE_FORMAT_EXTENSIBLE wrapping any;
    ADPCM/compressed formats raise loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {payload[:4]!r}")
    pos = 12
    fmt = None
    fmt_chunk = b""
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"{len(chunk)} present"
            )
        if cid == b"fmt ":
            if len(chunk) < 16:  # an honest size < 16 is still malformed
                raise ValueError(
                    f"malformed WAV: fmt chunk is {len(chunk)} bytes, need 16"
                )
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
            fmt_chunk = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if ch < 1 or rate < 1:
        raise ValueError(f"malformed WAV fmt chunk: channels={ch} rate={rate}")
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes
        # of the 16-byte SubFormat GUID in the extension block
        # (cbSize at offset 16, extension from 18; validSamples+mask
        # precede the GUID) — the layout every >2-channel or >16-bit
        # writer emits
        if len(fmt_chunk) < 40:
            raise ValueError(
                f"malformed extensible WAV: fmt chunk is {len(fmt_chunk)} bytes, need 40"
            )
        audio_format = struct.unpack_from("<H", fmt_chunk, 24)[0]
    if audio_format == 3:  # IEEE float PCM
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"float WAV must be 32- or 64-bit, got {bits}")
        arr = np.clip(arr, -1.0, 1.0)
    elif audio_format == 1:
        if bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit WAV is unsigned
            arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            n3 = (len(raw) // 3) * 3
            b = raw[:n3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / 8388608.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit PCM not supported")
    elif audio_format in (6, 7):  # G.711 A-law / mu-law (8-bit companded)
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        lut = _ULAW_TO_LINEAR if audio_format == 7 else _ALAW_TO_LINEAR
        arr = lut[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(
            f"unsupported WAV format {audio_format} "
            "(ADPCM/MP3/compressed need a codec lib)"
        )
    n = len(arr) // ch
    return rate, arr[: n * ch].reshape(n, ch)


# -------------------------------------------------------------- features
def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """(n, ch) float samples → [rms, zcr, spectral_centroid_hz,
    clip_frac, band_energy*8] (float32).  Mixed down to mono first."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if len(mono) == 0:
        return np.zeros(4 + N_BANDS, np.float32)
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    clip = float(np.mean(np.abs(mono) >= 0.999))
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
    power = spec**2
    total = power.sum()
    centroid = float((freqs * power).sum() / total) if total > 0 else 0.0
    # octave bands up to Nyquist: [0, ny/128), [ny/128, ny/64) … [ny/2, ny]
    edges = rate / 2.0 / (2.0 ** np.arange(N_BANDS, -1, -1))
    edges[0] = 0.0
    bands = np.zeros(N_BANDS)
    for i in range(N_BANDS):
        m = (freqs >= edges[i]) & (freqs < edges[i + 1] if i < N_BANDS - 1 else freqs <= edges[i + 1])
        bands[i] = power[m].sum()
    if total > 0:
        bands = bands / total
    return np.concatenate([[rms, zcr, centroid, clip], bands]).astype(np.float32)


def extract_audio_features(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(media_ref, kind, payload binary, …) → one row per clip with
    decoded audio metadata + feature vector — Arrow-batched mapInPandas,
    payloads never leave the executors (same contract as the image
    path)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_ref", "kind", "n_bytes", "sha1",
                    "sample_rate", "n_channels", "duration_ms", "feat",
                    "decode_err",
                )
            }
            for ref, kind, p in zip(pdf["media_ref"], pdf["kind"], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
                rows["media_ref"].append(ref)
                rows["kind"].append(kind)
                rows["n_bytes"].append(len(b))
                rows["sha1"].append(hashlib.sha1(b).hexdigest())
                try:
                    rate, samples = decode_wav(b)
                except (ValueError, NotImplementedError) as e:
                    # quarantine, don't kill the task (see image path)
                    rows["sample_rate"].append(0)
                    rows["n_channels"].append(0)
                    rows["duration_ms"].append(0)
                    rows["feat"].append([0.0] * (4 + N_BANDS))
                    rows["decode_err"].append(f"{type(e).__name__}: {e}"[:200])
                    continue
                rows["sample_rate"].append(int(rate))
                rows["n_channels"].append(int(samples.shape[1]))
                rows["duration_ms"].append(int(round(1000 * samples.shape[0] / rate)))
                rows["feat"].append(audio_features(samples, rate).tolist())
                rows["decode_err"].append(None)
            if not rows["media_ref"]:
                continue  # empty frame would dtype-confuse Arrow (list cols)
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


# ------------------------------------------------------------------ synth
def synth_wav_bytes(ref: str, rate: int = 8000, dur_s: float = 0.25) -> bytes:
    """Deterministic REAL WAV for a media_ref: a ref-seeded tone + noise
    mix, so the decode path exercises an actual codec round-trip."""
    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    n = int(rate * dur_s)
    t = np.arange(n) / rate
    freq = 200 + (seed % 1800)
    wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
    return encode_wav((np.clip(wave, -1, 1) * 32767).astype(np.int16), rate)
