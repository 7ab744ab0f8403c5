"""TIFF container + CCITT Group 4 (T.6) codec tests: round-trips per
compression, strip splits, predictor-2 LZW, photometric polarities,
known-answer T.6 mode/code sequences, and the error contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from reading_the_unreadable_spark.operators.g4 import (
    g4_decode,
    g4_encode,
)
from reading_the_unreadable_spark.operators.tiff import (
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    encode_tiff,
)


def _unpack(raw, w, h):
    rb = (w + 7) // 8
    return np.unpackbits(
        np.frombuffer(raw, np.uint8).reshape(h, rb), axis=1
    )[:, :w].astype(bool)


def test_tiff_roundtrip_all_compressions():
    rng = np.random.Generator(np.random.PCG64(21))
    img = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (9, 21)).astype(np.uint8)
    bil = rng.random((11, 30)) > 0.5
    for comp in ("none", "packbits", "lzw"):
        for rps in (None, 4):
            assert np.array_equal(
                decode_tiff(encode_tiff(img, comp, rps)), img
            )
            assert np.array_equal(
                decode_tiff(encode_tiff(gray, comp, rps))[:, :, 0], gray
            )
            assert np.array_equal(
                decode_tiff(encode_tiff(bil, comp, rps))[:, :, 0] > 0, bil
            )
    for rps in (None, 4):
        assert np.array_equal(
            decode_tiff(encode_tiff(bil, "g4", rps))[:, :, 0] > 0, bil
        )


def test_tiff_lzw_dictionary_boundaries():
    """Early-change code-width growth and the 4094-entry reset must
    agree between encoder and decoder (random data crosses every
    boundary)."""
    rng = np.random.Generator(np.random.PCG64(5))
    big = rng.integers(0, 256, 120 * 600).astype(np.uint8).tobytes()
    assert _tiff_lzw_decode(_tiff_lzw_encode(big), len(big)) == big
    runs = bytes(np.repeat(np.arange(100, dtype=np.uint8), 700))
    enc = _tiff_lzw_encode(runs)
    assert _tiff_lzw_decode(enc, len(runs)) == runs
    assert len(enc) < len(runs) // 10  # really compresses runs


def test_tiff_lzw_predictor2():
    """Horizontal-differencing predictor (tag 317 = 2): hand-built
    fixture — diff the rows, LZW them, patch an 11-tag IFD."""
    rng = np.random.Generator(np.random.PCG64(31))
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:] -= img.astype(np.int16)[:, :-1]
    raw = (diff % 256).astype(np.uint8).tobytes()
    strip = _tiff_lzw_encode(raw)
    tags = [
        (256, 4, 1, 7), (257, 4, 1, 5), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 2), (273, 4, 1, 0), (277, 3, 1, 3), (278, 4, 1, 5),
        (279, 4, 1, len(strip)), (284, 3, 1, 1), (317, 3, 1, 2),
    ]
    ifd = struct.pack("<H", len(tags))
    data_off = 8 + 2 + len(tags) * 12 + 4
    for tid, typ, cnt, val in tags:
        if tid == 273:
            val = data_off
        ifd += struct.pack("<HHII", tid, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    payload = struct.pack("<2sHI", b"II", 42, 8) + ifd + strip
    assert np.array_equal(decode_tiff(payload), img)


def test_g4_roundtrip_shapes():
    rng = np.random.Generator(np.random.PCG64(17))
    page = np.zeros((40, 100), bool)
    for y in range(5, 35, 3):
        for x0 in range(10, 90, 17):
            page[y, x0 : x0 + 9] = True
    cases = [
        page,
        np.zeros((10, 64), bool),
        np.ones((10, 64), bool),
        rng.random((25, 83)) > 0.5,
        rng.random((30, 200)) > 0.95,
        np.tile(np.arange(77) % 2 == 0, (15, 1)),
        np.repeat(rng.random((8, 5)) > 0.5, 600, axis=1),  # >2560 runs
        np.pad(np.ones((5, 5), bool), ((0, 3), (0, 40))),  # black at x=0
    ]
    for p in cases:
        h, w = p.shape
        assert np.array_equal(_unpack(g4_decode(g4_encode(p), w, h), w, h), p)


def test_g4_known_answer_modes():
    """Structural known answers from the T.6 coding rules: an all-white
    row against the imaginary white reference is one V0 (b1 = width);
    a row identical to its reference is all-V0; a pure-white 2-row page
    is exactly two V0 bits + EOFB padding."""
    enc = g4_encode(np.zeros((2, 64), bool))
    # bits: "1" "1" + EOFB (000000000001 x2) -> 26 bits -> 4 bytes:
    # 11000000 | 00000100 | 00000000 | 01 + 6 pad zeros
    assert enc == bytes([0b11000000, 0b00000100, 0b00000000, 0b01000000])
    # one black run [8, 16) on row 0 of width 64, row 1 identical:
    # row 0: H mode (001) + white 8 (10011) + black 8 (000101),
    #        then V0 at b1=64 edge... encoded stream starts:
    page = np.zeros((1, 64), bool)
    page[0, 8:16] = True
    bits = "001" + "10011" + "000101" + "1"  # H w8 b8, then V0 closes row
    enc = g4_encode(page)
    got_prefix = "".join(f"{b:08b}" for b in enc)[: len(bits)]
    assert got_prefix == bits


def test_tiff_and_g4_error_contract():
    rng = np.random.Generator(np.random.PCG64(3))
    bil = rng.random((11, 30)) > 0.5
    enc = encode_tiff(bil, "g4")
    for cut in (3, 10, 60, len(enc) - 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_tiff(enc[:cut])
    with pytest.raises(ValueError):
        decode_tiff(b"XX\x2a\x00" + b"\x00" * 20)
    # tiled layout raises loudly
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    payload = bytearray(encode_tiff(img))
    # patch first tag id (256 width) to 322 (TileWidth) to fake a tiled file
    struct.pack_into("<H", payload, 10, 322)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_tiff(bytes(payload))


def test_tiff_via_decode_image_dispatch():
    from reading_the_unreadable_spark.operators.multimodal import decode_image

    rng = np.random.Generator(np.random.PCG64(41))
    img = rng.integers(0, 256, (6, 11, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img, "lzw")), img)
    page = rng.random((20, 50)) > 0.7
    got = decode_image(encode_tiff(page, "g4"))
    assert np.array_equal(got[:, :, 0] > 0, page)
