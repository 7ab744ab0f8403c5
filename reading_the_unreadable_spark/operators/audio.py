"""Audio columns: WAV/PCM decode + feature extraction, pure numpy/stdlib.

Same codec policy as :mod:`multimodal` (images) and :mod:`pdf`: the
container formats that need no codec library — RIFF/WAVE with integer
PCM (8/16/24/32-bit, any channel count), IEEE float (32/64-bit),
G.711 mu-law/A-law (the telephone-era companded formats, ITU-T G.711
LUT expansion), and WAVE_FORMAT_EXTENSIBLE wrapping any of them — are
decoded for real, so the full pipeline (binary column → decode →
feature-extract) runs end-to-end over Arrow batches.  Both RIFF ADPCM
families decode too — IMA/DVI (format 0x11) and MS-ADPCM (format
0x02, the 7-pair second-order predictor) — block-vectorized numpy,
every block's header restarting predictor and delta.  Truly
compressed formats (MP3/AAC) raise ``NotImplementedError`` loudly;
swapping in soundfile/ffmpeg later changes only :func:`decode_wav`.

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


# --------------------------------------------------------- IMA ADPCM
# Step-size and index-adjust tables from the IMA ADPCM reference
# algorithm (the DVI/IMA spec every RIFF format-0x11 writer follows).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_decode_blocks(
    nibbles: np.ndarray, pred0: np.ndarray, idx0: np.ndarray
) -> np.ndarray:
    """Vectorized-across-blocks IMA ADPCM expansion: ``nibbles`` is
    (n_blocks, samples_per_block-1) uint8, ``pred0``/``idx0`` the
    per-block header predictor/step-index.  The predictor recurrence is
    sequential WITHIN a block, but every RIFF ADPCM block is
    self-contained (its header restarts the predictor), so the loop
    runs over positions-in-block (~505 iterations) while numpy works
    all blocks per step — the same trick as the G4 row painter."""
    n_blocks, n_nib = nibbles.shape
    out = np.empty((n_blocks, n_nib + 1), np.int32)
    pred = pred0.astype(np.int32).copy()
    idx = np.clip(idx0.astype(np.int32), 0, 88)
    out[:, 0] = pred
    for j in range(n_nib):
        n = nibbles[:, j].astype(np.int32)
        step = _IMA_STEPS[idx]
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        pred = np.clip(
            pred + np.where(n & 8, -diff, diff), -32768, 32767
        )
        idx = np.clip(idx + _IMA_INDEX_ADJ[n & 7], 0, 88)
        out[:, j + 1] = pred
    return out


def _decode_ima_adpcm(
    data: bytes, ch: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """RIFF format-0x11 data chunk → float64 (n, ch).  Layout per
    block: a 4-byte header per channel (int16 predictor, uint8 step
    index, reserved), then nibble data interleaved in 4-byte words per
    channel; two samples per byte, low nibble first."""
    if ch < 1 or block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError(f"malformed ADPCM fmt: ch={ch} align={block_align}")
    want = (block_align - 4 * ch) * 2 // ch + 1
    if samples_per_block not in (0, want):
        raise ValueError(
            f"ADPCM samples_per_block {samples_per_block} inconsistent "
            f"with block_align {block_align} ({want} expected)"
        )
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.zeros((0, ch), np.float64)
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8).reshape(
        n_blocks, block_align
    )
    header = raw[:, : 4 * ch].reshape(n_blocks, ch, 4)
    pred0 = (
        header[:, :, 0].astype(np.int32)
        | (header[:, :, 1].astype(np.int32) << 8)
    )
    pred0 = np.where(pred0 >= 32768, pred0 - 65536, pred0)
    idx0 = header[:, :, 2].astype(np.int32)
    if np.any(idx0 > 88):
        raise ValueError("ADPCM step index out of range")
    # data area: 4-byte words round-robin per channel
    body = raw[:, 4 * ch :].reshape(n_blocks, -1, ch, 4)
    per_ch = body.transpose(2, 0, 1, 3).reshape(ch, n_blocks, -1)
    chans = []
    for c in range(ch):
        bytes_c = per_ch[c]
        nib = np.empty((n_blocks, bytes_c.shape[1] * 2), np.uint8)
        nib[:, 0::2] = bytes_c & 0x0F
        nib[:, 1::2] = bytes_c >> 4
        chans.append(_ima_decode_blocks(nib, pred0[:, c], idx0[:, c]))
    stacked = np.stack(chans, axis=2)  # (blocks, samples, ch)
    return stacked.reshape(-1, ch).astype(np.float64) / 32768.0


# MS-ADPCM (RIFF format 0x02) — the Microsoft WAVE ADPCM spec: 7 fixed
# predictor pairs, a 16-entry delta adaptation table, two full samples
# per block header seeding the second-order predictor.
_MS_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], np.int64)
_MS_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], np.int64)
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307,
     230, 230, 230],
    np.int64,
)


def _ms_decode_blocks(
    nibbles: np.ndarray,
    coef1: np.ndarray,
    coef2: np.ndarray,
    delta0: np.ndarray,
    s1: np.ndarray,
    s2: np.ndarray,
) -> np.ndarray:
    """Vectorized-across-blocks MS-ADPCM expansion (same trick as
    :func:`_ima_decode_blocks`): the recurrence is sequential within a
    block but every block header restarts predictor AND delta, so the
    loop runs over positions while numpy works all blocks per step.
    Output includes the two header samples (sample2 first — they ARE
    the block's first two output samples per spec)."""
    n_blocks, n_nib = nibbles.shape
    out = np.empty((n_blocks, n_nib + 2), np.int64)
    s1 = s1.astype(np.int64).copy()
    s2 = s2.astype(np.int64).copy()
    delta = delta0.astype(np.int64).copy()
    out[:, 0] = s2
    out[:, 1] = s1
    for j in range(n_nib):
        code = nibbles[:, j].astype(np.int64)
        signed = np.where(code >= 8, code - 16, code)
        pred = ((s1 * coef1 + s2 * coef2) >> 8) + signed * delta
        pred = np.clip(pred, -32768, 32767)
        s2 = s1
        s1 = pred
        # ceiling at int16 range: delta originates as an int16 header
        # field and honest encoders keep it there; without the cap an
        # adversarial all-8 nibble run grows it 3x per sample and
        # overflows int64 (the scalar-reference test pins this clamp)
        delta = np.clip((_MS_ADAPT[code] * delta) >> 8, 16, 32767)
        out[:, j + 2] = pred
    return out


def _decode_ms_adpcm(
    data: bytes, ch: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """RIFF format-0x02 data chunk → float64 (n, ch).  Block layout
    (fields channel-interleaved): uint8 predictor index per channel,
    int16 initial delta per channel, int16 sample1 per channel, int16
    sample2 per channel, then 4-bit codes high-nibble-first with
    channels alternating per nibble."""
    if ch < 1 or block_align < 7 * ch + 1:
        raise ValueError(f"malformed MS-ADPCM fmt: ch={ch} align={block_align}")
    want = (block_align - 7 * ch) * 2 // ch + 2
    if samples_per_block not in (0, want):
        raise ValueError(
            f"MS-ADPCM samples_per_block {samples_per_block} inconsistent "
            f"with block_align {block_align} ({want} expected)"
        )
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.zeros((0, ch), np.float64)
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8).reshape(
        n_blocks, block_align
    )
    pred_idx = raw[:, :ch].astype(np.int64)
    if np.any(pred_idx > 6):
        raise ValueError("MS-ADPCM predictor index out of range")

    def _i16(col: int) -> np.ndarray:
        v = raw[:, col].astype(np.int64) | (raw[:, col + 1].astype(np.int64) << 8)
        return np.where(v >= 32768, v - 65536, v)

    delta0 = np.stack([_i16(ch + 2 * c) for c in range(ch)], axis=1)
    s1 = np.stack([_i16(3 * ch + 2 * c) for c in range(ch)], axis=1)
    s2 = np.stack([_i16(5 * ch + 2 * c) for c in range(ch)], axis=1)
    body = raw[:, 7 * ch :]
    nib = np.empty((n_blocks, body.shape[1] * 2), np.uint8)
    nib[:, 0::2] = body >> 4  # high nibble first (opposite of IMA)
    nib[:, 1::2] = body & 0x0F
    chans = []
    for c in range(ch):
        chans.append(
            _ms_decode_blocks(
                nib[:, c::ch],
                _MS_COEF1[pred_idx[:, c]],
                _MS_COEF2[pred_idx[:, c]],
                np.maximum(delta0[:, c], 16),
                s1[:, c],
                s2[:, c],
            )
        )
    stacked = np.stack(chans, axis=2)  # (blocks, samples, ch)
    return stacked.reshape(-1, ch).astype(np.float64) / 32768.0


def encode_wav_ms_adpcm(
    samples: np.ndarray, rate: int = 8000, block_align: int = 256
) -> bytes:
    """mono int16 → RIFF/WAVE format 0x02 (MS-ADPCM).  Per-block the
    encoder tries all 7 predictor pairs and keeps the one with the
    lowest squared nibble-quantization error — the spec's recommended
    strategy; the bitstream it emits is decodable by any MS-ADPCM
    reader."""
    x = np.asarray(samples, np.int64).ravel()
    spb = (block_align - 7) * 2 + 2
    n_blocks = max(1, -(-len(x) // spb))
    x = np.pad(x, (0, n_blocks * spb - len(x)))
    out = bytearray()
    for b in range(n_blocks):
        blk = x[b * spb : (b + 1) * spb]
        best = None
        for p in range(7):
            c1, c2 = int(_MS_COEF1[p]), int(_MS_COEF2[p])
            s2i, s1i = int(blk[0]), int(blk[1])
            # spec's initial delta estimate from the first few errors
            errs = [
                abs(int(blk[k]) - ((s1i * c1 + s2i * c2) >> 8))
                for k in range(2, min(10, spb))
            ]
            delta = max(16, (sum(errs) // max(1, len(errs))) >> 2)
            s1v, s2v, dv = s1i, s2i, delta
            nibs = []
            err_sum = 0
            for k in range(2, spb):
                predicted = (s1v * c1 + s2v * c2) >> 8
                diff = int(blk[k]) - predicted
                code = max(-8, min(7, int(diff / dv)))  # truncate toward 0
                rec = max(-32768, min(32767, predicted + code * dv))
                err_sum += (int(blk[k]) - rec) ** 2
                nibs.append(code & 0xF)
                s2v, s1v = s1v, rec
                # same int16 ceiling as the decoder (bit-exact parity)
                dv = min(max((int(_MS_ADAPT[code & 0xF]) * dv) >> 8, 16), 32767)
            if best is None or err_sum < best[0]:
                best = (err_sum, p, delta, s1i, s2i, nibs)
        _, p, delta, s1i, s2i, nibs = best
        out.append(p)
        out += struct.pack("<hhh", delta, s1i, s2i)
        for i in range(0, len(nibs), 2):
            out.append((nibs[i] << 4) | nibs[i + 1])
    n_data = len(out)
    # canonical extended fmt: cbSize=32 → wSamplesPerBlock, wNumCoef=7,
    # the 7 published coefficient pairs
    ext = struct.pack("<HH", spb, 7) + b"".join(
        struct.pack("<hh", int(a), int(b_))
        for a, b_ in zip(_MS_COEF1, _MS_COEF2)
    )
    fmt = struct.pack(
        "<HHIIHHH",
        0x02, 1, rate, rate * block_align // spb, block_align, 4, len(ext),
    ) + ext
    hdr = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + n_data, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", n_data)
    )
    return hdr + bytes(out)


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


def encode_wav_ima_adpcm(
    samples: np.ndarray, rate: int = 8000, samples_per_block: int = 505
) -> bytes:
    """mono int16 → RIFF/WAVE format 0x11 (IMA ADPCM) bytes — the
    forward compander matching :func:`_decode_ima_adpcm`, for fixtures
    and synthetic archival corpora.  Vectorized across blocks the same
    way the decoder is; the last partial block is zero-padded (the
    usual writer behavior)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_ima_adpcm expects mono int16")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k+1")
    spb = samples_per_block
    n = len(samples)
    n_blocks = max(1, -(-n // spb))
    padded = np.zeros(n_blocks * spb, np.int32)
    padded[:n] = samples
    blocks = padded.reshape(n_blocks, spb)
    pred = blocks[:, 0].copy()
    # per-block initial step index from the block's mean slope (the
    # standard writer heuristic; index 0 would ramp for dozens of
    # samples after every block boundary) — stays block-parallel
    slope = np.abs(np.diff(blocks, axis=1)).mean(axis=1)
    idx = np.clip(
        np.searchsorted(_IMA_STEPS, slope).astype(np.int32), 0, 88
    )
    idx0 = idx.copy()
    nibbles = np.empty((n_blocks, spb - 1), np.uint8)
    for j in range(spb - 1):
        step = _IMA_STEPS[idx]
        diff = blocks[:, j + 1] - pred
        code = np.where(diff < 0, 8, 0).astype(np.int32)
        mag = np.abs(diff)
        hit4 = mag >= step
        code |= np.where(hit4, 4, 0)
        mag = mag - np.where(hit4, step, 0)
        hit2 = mag >= step >> 1
        code |= np.where(hit2, 2, 0)
        mag = mag - np.where(hit2, step >> 1, 0)
        code |= np.where(mag >= step >> 2, 1, 0)
        nibbles[:, j] = code.astype(np.uint8)
        # reconstruct the decoder's predictor so both sides track
        dq = step >> 3
        dq += np.where(code & 1, step >> 2, 0)
        dq += np.where(code & 2, step >> 1, 0)
        dq += np.where(code & 4, step, 0)
        pred = np.clip(pred + np.where(code & 8, -dq, dq), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX_ADJ[code & 7], 0, 88)
    block_align = 4 + (spb - 1) // 2
    first = blocks[:, 0].astype(np.int32) & 0xFFFF
    header = np.zeros((n_blocks, 4), np.uint8)
    header[:, 0] = first & 0xFF
    header[:, 1] = first >> 8
    header[:, 2] = idx0.astype(np.uint8)
    packed = (nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)).astype(np.uint8)
    data = np.concatenate([header, packed], axis=1).tobytes()
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate,
        rate * block_align // spb, block_align, 4, 2, spb,
    )
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
    G.711 mu-law/A-law, IMA ADPCM, and WAVE_FORMAT_EXTENSIBLE
    wrapping any; MS-ADPCM/compressed formats raise loudly."""
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
    elif audio_format == 0x11:  # IMA/DVI ADPCM (4-bit, block-restarted)
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        spb = (
            struct.unpack_from("<H", fmt_chunk, 18)[0]
            if len(fmt_chunk) >= 20
            else 0
        )
        return rate, _decode_ima_adpcm(data, ch, fmt[4], spb)
    elif audio_format == 0x02:  # MS-ADPCM (4-bit, 7 predictor pairs)
        if bits != 4:
            raise ValueError(f"MS-ADPCM WAV must be 4-bit, got {bits}")
        spb = (
            struct.unpack_from("<H", fmt_chunk, 18)[0]
            if len(fmt_chunk) >= 20
            else 0
        )
        return rate, _decode_ms_adpcm(data, ch, fmt[4], spb)
    else:
        raise NotImplementedError(
            f"unsupported WAV format {audio_format} "
            "(MP3/AAC/compressed need a codec lib)"
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
                    rate, samples = decode_audio(b)
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
def synth_wav_bytes(
    ref: str, rate: int = 8000, dur_s: float = 0.25, codec: str = "pcm"
) -> bytes:
    """Deterministic REAL WAV for a media_ref: a ref-seeded tone + noise
    mix, so the decode path exercises an actual codec round-trip.
    ``codec`` picks the container encoding — ``pcm`` (int16), ``ima``
    (format 0x11), ``ms`` (MS-ADPCM 0x02), ``ulaw``/``alaw`` (G.711)."""
    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    n = int(rate * dur_s)
    t = np.arange(n) / rate
    freq = 200 + (seed % 1800)
    wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
    pcm16 = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    if codec == "pcm":
        return encode_wav(pcm16, rate)
    if codec == "ima":
        return encode_wav_ima_adpcm(pcm16, rate)
    if codec == "ms":
        return encode_wav_ms_adpcm(pcm16, rate)
    if codec in ("ulaw", "alaw"):
        return encode_wav_g711(encode_g711(pcm16, codec), rate, codec)
    raise ValueError(f"unknown synth codec {codec!r}")


# ------------------------------------------------------------------- AIFF
def _f80_to_float(b: bytes) -> float:
    """IEEE 754 80-bit extended (big-endian) → float: AIFF's sample-rate
    field, the format's one exotic corner (explicit integer bit, 15-bit
    exponent biased 16383)."""
    if len(b) != 10:
        raise ValueError(f"extended float needs 10 bytes, got {len(b)}")
    se = int.from_bytes(b[:2], "big")
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    mant = int.from_bytes(b[2:], "big")
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    import math

    try:
        val = sign * math.ldexp(mant, exp - 16383 - 63)
    except OverflowError:
        raise ValueError("AIFF sample rate overflows float range") from None
    if not math.isfinite(val):
        raise ValueError("non-finite AIFF sample rate")
    return val


def _float_to_f80(x: float) -> bytes:
    import math

    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    m, e = math.frexp(abs(x))  # x = m * 2^e, m in [0.5, 1)
    mant = int(m * (1 << 64))
    return (sign | (e - 1 + 16383)).to_bytes(2, "big") + mant.to_bytes(8, "big")


def encode_aiff(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, ch) → big-endian AIFF (COMM + SSND)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_aiff expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    comm = (
        struct.pack(">hLh", ch, n, 16) + _float_to_f80(float(rate))
    )
    data = samples.astype(">i2").tobytes()
    ssnd = struct.pack(">LL", 0, 0) + data

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack(">I", len(body)) + body + pad

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, np.ndarray]:
    """FORM/AIFF bytes → (sample_rate, float64 samples in [-1, 1],
    shape (n, ch)).  Big-endian signed PCM at 8/16/24/32 bits (AIFF's
    8-bit is SIGNED, unlike WAV's unsigned).  AIFC compressed variants
    raise NotImplementedError; truncation raises ValueError."""
    if payload[:4] != b"FORM" or len(payload) < 12:
        raise ValueError(f"not an AIFF file: {payload[:4]!r}")
    form = payload[8:12]
    if form == b"AIFC":
        raise NotImplementedError("AIFC (compressed AIFF) needs a codec table")
    if form != b"AIFF":
        raise ValueError(f"not an AIFF form: {form!r}")
    comm = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"AIFF chunk {cid!r} truncated")
        if cid == b"COMM":
            if size < 18:
                raise ValueError(f"AIFF COMM chunk is {size} bytes, need 18")
            ch, frames, bits = struct.unpack_from(">hLh", body, 0)
            rate = _f80_to_float(body[8:18])
            comm = (ch, frames, bits, rate)
        elif cid == b"SSND":
            if size < 8:
                raise ValueError("AIFF SSND chunk too short")
            offset = struct.unpack_from(">L", body, 0)[0]
            data = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if comm is None or data is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    ch, frames, bits, rate = comm
    # upper bound: no real container carries a rate beyond the MHz
    # range; a finite-but-absurd f80 is malformed, not a sample rate
    if ch < 1 or not (0 < rate < 2**31):
        raise ValueError(f"malformed AIFF COMM: ch={ch} rate={rate}")
    if bits == 16:
        arr = np.frombuffer(data, dtype=">i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    elif bits == 32:
        arr = (
            np.frombuffer(data, dtype=">i4").astype(np.float64) / 2147483648.0
        )
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int64)
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]  # big-endian
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float64) / 8388608.0
    else:
        raise NotImplementedError(f"{bits}-bit AIFF PCM")
    n = (len(arr) // ch) * ch
    return int(round(rate)), arr[:n].reshape(-1, ch)


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Container sniff: RIFF/WAVE → :func:`decode_wav` (all its codec
    families), FORM/AIFF → :func:`decode_aiff`.  One entry point for
    the feature pipeline."""
    if payload[:4] == b"FORM":
        return decode_aiff(payload)
    return decode_wav(payload)
