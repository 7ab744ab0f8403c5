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


def test_g3_mh_roundtrip_and_known_answer():
    """CCITT RLE (comp 2) and Group 3 (comp 3, 1-D and 2-D rows):
    round-trips through the TIFF container across strip splits, plus a
    spec known-answer — an all-white 8 px MH row is the white run-8
    code '10011' byte-padded to 0x98 (T.4 table 2)."""
    from reading_the_unreadable_spark.operators.g4 import (
        g3_decode,
        g3_encode,
        mh_decode,
        mh_encode,
    )

    enc = mh_encode(np.zeros((1, 8), dtype=bool))
    assert enc == b"\x98", enc.hex()
    assert not _unpack(mh_decode(enc, 8, 1), 8, 1).any()

    rng = np.random.Generator(np.random.PCG64(31))
    pages = [
        rng.random((23, 100)) < 0.3,
        np.zeros((5, 64), bool),          # all white
        np.ones((5, 64), bool),           # all black: zero-length white run
        rng.random((40, 17)) < 0.8,       # dense black, odd width
    ]
    for p in pages:
        h, w = p.shape
        assert np.array_equal(_unpack(mh_decode(mh_encode(p), w, h), w, h), p)
        assert np.array_equal(
            _unpack(g3_decode(g3_encode(p), w, h), w, h), p
        )
        assert np.array_equal(
            _unpack(g3_decode(g3_encode(p, two_d=True), w, h, two_d=True), w, h),
            p,
        )
    # TIFF integration: all CCITT compressions agree with uncompressed,
    # including multi-strip layouts (T4Options tag drives 2-D decode)
    page = pages[0]
    ref = decode_tiff(encode_tiff(page, "none"))
    for comp in ("mh", "g3", "g3-2d"):
        for rps in (None, 7):
            assert np.array_equal(
                decode_tiff(encode_tiff(page, comp, rps)), ref
            ), (comp, rps)


def test_g3_error_contract():
    """Truncated / corrupt G3 streams raise ValueError, never raw
    IndexError; a stream without EOLs is rejected as G3."""
    from reading_the_unreadable_spark.operators.g4 import (
        g3_decode,
        g3_encode,
        mh_decode,
        mh_encode,
    )

    page = (np.arange(40 * 64).reshape(40, 64) % 9) < 3
    enc = g3_encode(page, two_d=True)
    # (RTC is ~10 trailing bytes of ignorable EOLs — cut past it)
    for cut in (1, len(enc) // 3, len(enc) - 16):
        with pytest.raises(ValueError):
            g3_decode(enc[:cut], 64, 40, two_d=True)
    # MH data fed to the G3 decoder has no EOLs -> loud rejection
    with pytest.raises(ValueError, match="EOL"):
        g3_decode(mh_encode(page), 64, 40)
    with pytest.raises(ValueError):
        mh_decode(mh_encode(page)[: 10], 64, 40)


def test_ccitt_zero_run_loop_bound():
    """A crafted stream of alternating ZERO-length runs never advances
    the row position — both row decoders must bound the transition
    count and raise instead of looping forever (DoS contract)."""
    from reading_the_unreadable_spark.operators.g4 import (
        _BLACK_CODES,
        _MODE_HORIZ,
        _WHITE_CODES,
        _bits_to_bytes,
        g4_decode,
        mh_decode,
    )

    evil_mh = _bits_to_bytes((_WHITE_CODES[0] + _BLACK_CODES[0]) * 200)
    with pytest.raises(ValueError, match="more transitions"):
        mh_decode(evil_mh, 16, 1)
    evil_g4 = _bits_to_bytes(
        (_MODE_HORIZ + _WHITE_CODES[0] + _BLACK_CODES[0]) * 200
    )
    with pytest.raises(ValueError, match="more transitions"):
        g4_decode(evil_g4, 16, 1)


def test_tiff_tiled_layout():
    """Tiled TIFF (spec §15): round-trips across tile sizes and every
    compression, edge tiles padded/cropped correctly, truncated tiles
    raise, and predictor-2 applies WITHIN each tile."""
    from reading_the_unreadable_spark.operators.tiff import _tiff_lzw_encode

    rng = np.random.Generator(np.random.PCG64(47))
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    bil = rng.random((50, 70)) < 0.3
    for t in ((16, 16), (32, 16)):
        for c in ("none", "packbits", "lzw"):
            assert np.array_equal(
                decode_tiff(encode_tiff(img, c, tile=t)), img
            ), (t, c)
        for c in ("g4", "mh", "g3", "g3-2d"):
            assert np.array_equal(
                decode_tiff(encode_tiff(bil, c, tile=t))[:, :, 0] > 0, bil
            ), (t, c)
    # truncated tile data -> ValueError
    enc = encode_tiff(img, "lzw", tile=(16, 16))
    with pytest.raises((ValueError, NotImplementedError)):
        decode_tiff(enc[: len(enc) - 40])

    # predictor-2 resets per TILE row segment, not per image row:
    # hand-build a 2-tile-wide fixture with per-tile differencing
    img2 = rng.integers(0, 256, (8, 32, 3)).astype(np.uint8)
    tiles = []
    for tx in range(2):
        block = img2[:, tx * 16 : (tx + 1) * 16].astype(np.int16)
        diff = block.copy()
        diff[:, 1:] -= block[:, :-1]
        tiles.append(_tiff_lzw_encode((diff % 256).astype(np.uint8).tobytes()))
    tags = [
        (256, 4, 1, 32), (257, 4, 1, 8), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 2), (277, 3, 1, 3), (284, 3, 1, 1), (317, 3, 1, 2),
        (322, 4, 1, 16), (323, 4, 1, 8), (324, 4, 2, 0), (325, 4, 2, 0),
    ]
    data_off = 8 + 2 + len(tags) * 12 + 4
    offs = [data_off + 16, data_off + 16 + len(tiles[0])]
    ifd = struct.pack("<H", len(tags))
    for tid, typ, cnt, val in tags:
        if tid == 324:
            val = data_off
        elif tid == 325:
            val = data_off + 8
        ifd += struct.pack("<HHII", tid, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    arrays = struct.pack("<2I", *offs) + struct.pack(
        "<2I", len(tiles[0]), len(tiles[1])
    )
    payload = (
        struct.pack("<2sHI", b"II", 42, 8) + ifd + arrays + b"".join(tiles)
    )
    assert np.array_equal(decode_tiff(payload), img2)


def _build_planar_tiff(img, comp_id, encode_block, pred=1, rps=4):
    """Hand-built PlanarConfiguration=2 fixture: all R strips, then G,
    then B, each strip one plane's row block."""
    h, w = img.shape[:2]
    spl = -(-h // rps)
    strips = []
    for c in range(3):
        plane = img[:, :, c]
        if pred == 2:
            d = plane.astype(np.int16).copy()
            d[:, 1:] -= plane.astype(np.int16)[:, :-1]
            plane = (d % 256).astype(np.uint8)
        for si in range(spl):
            strips.append(encode_block(plane[si * rps : (si + 1) * rps]))
    tags = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, 0),
        (259, 3, 1, comp_id), (262, 3, 1, 2),
        (273, 4, len(strips), 0), (277, 3, 1, 3), (278, 4, 1, rps),
        (279, 4, len(strips), 0), (284, 3, 1, 2),
    ]
    if pred == 2:
        tags.append((317, 3, 1, 2))
    n = len(tags)
    data_off = 8 + 2 + n * 12 + 4
    bits_off = data_off
    so_off = bits_off + 6
    sc_off = so_off + 4 * len(strips)
    cur = sc_off + 4 * len(strips)
    offs = []
    for s in strips:
        offs.append(cur)
        cur += len(s)
    ifd = struct.pack("<H", n)
    for tid, typ, cnt, val in tags:
        if tid == 258:
            val = bits_off
        elif tid == 273:
            val = so_off
        elif tid == 279:
            val = sc_off
        ifd += struct.pack("<HHII", tid, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    arrays = (
        struct.pack("<3H", 8, 8, 8)
        + struct.pack(f"<{len(strips)}I", *offs)
        + struct.pack(f"<{len(strips)}I", *[len(s) for s in strips])
    )
    return struct.pack("<2sHI", b"II", 42, 8) + ifd + arrays + b"".join(strips)


def test_tiff_planar_configuration_2():
    """PlanarConfiguration=2 (separate component planes): decode across
    none / LZW / LZW+predictor-2 / PackBits matches the chunky pixels;
    per-plane row differencing commutes with the interleave.  Strip
    count mismatches raise; planar tiles stay a loud boundary."""
    from reading_the_unreadable_spark.operators.tiff import (
        _packbits_encode,
        _tiff_lzw_encode,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    cases = [
        (1, lambda b: b.tobytes(), 1),
        (5, lambda b: _tiff_lzw_encode(b.tobytes()), 1),
        (5, lambda b: _tiff_lzw_encode(b.tobytes()), 2),
        (32773, lambda b: b"".join(_packbits_encode(bytes(r)) for r in b), 1),
    ]
    for comp_id, enc, pred in cases:
        got = decode_tiff(_build_planar_tiff(img, comp_id, enc, pred=pred))
        assert np.array_equal(got, img), (comp_id, pred)
    # wrong strip count for the declared geometry raises
    bad = bytearray(_build_planar_tiff(img, 1, lambda b: b.tobytes()))
    struct.pack_into("<I", bad, 10 + 7 * 12 + 2 + 8, 2)  # RowsPerStrip=2
    with pytest.raises(ValueError, match="strips"):
        decode_tiff(bytes(bad))


def test_tiff_4bit_gray_and_palette():
    """4-bit TIFF (old 16-level scans): packed nibbles decode to the
    x17 gray ramp in both photometric polarities, and 16-color palette
    files map through ColorMap; LZW-compressed nibbles round-trip."""
    from reading_the_unreadable_spark.operators.tiff import _tiff_lzw_encode

    rng = np.random.Generator(np.random.PCG64(13))
    h, w = 6, 9
    v = rng.integers(0, 16, (h, w)).astype(np.uint8)
    row_bytes = (w + 1) // 2
    packed = np.zeros((h, row_bytes), np.uint8)
    pad = np.pad(v, ((0, 0), (0, w % 2)))
    packed = ((pad[:, 0::2] << 4) | pad[:, 1::2]).astype(np.uint8)

    def build(strip, comp, photo, cmap=None):
        tags = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 4),
            (259, 3, 1, comp), (262, 3, 1, photo), (273, 4, 1, 0),
            (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, len(strip)),
            (284, 3, 1, 1),
        ]
        if cmap is not None:
            tags.append((320, 3, len(cmap), 0))
        n = len(tags)
        data_off = 8 + 2 + n * 12 + 4
        cmap_off = data_off
        strip_off = data_off + (2 * len(cmap) if cmap is not None else 0)
        ifd = struct.pack("<H", n)
        for tid, typ, cnt, val in tags:
            if tid == 273:
                val = strip_off
            elif tid == 320:
                val = cmap_off
            ifd += struct.pack("<HHII", tid, typ, cnt, val)
        ifd += struct.pack("<I", 0)
        arrays = (
            struct.pack(f"<{len(cmap)}H", *cmap) if cmap is not None else b""
        )
        return struct.pack("<2sHI", b"II", 42, 8) + ifd + arrays + strip

    raw = packed.tobytes()
    got = decode_tiff(build(raw, 1, 1))
    assert np.array_equal(got[:, :, 0], v * 17)
    got0 = decode_tiff(build(raw, 1, 0))  # WhiteIsZero inverts
    assert np.array_equal(got0[:, :, 0], 255 - v * 17)
    # LZW-compressed 4-bit strip
    gotl = decode_tiff(build(_tiff_lzw_encode(raw), 5, 1))
    assert np.array_equal(gotl[:, :, 0], v * 17)
    # 16-color palette: ColorMap is 16-bit per channel, R then G then B
    pal8 = rng.integers(0, 256, (16, 3)).astype(np.uint16)
    cmap = list((pal8[:, 0] * 257)) + list(pal8[:, 1] * 257) + list(pal8[:, 2] * 257)
    gotp = decode_tiff(build(raw, 1, 3, cmap=[int(x) for x in cmap]))
    assert np.array_equal(gotp, pal8.astype(np.uint8)[v])


def test_tiff_16bit_tiled():
    """16-bit grayscale TILED layout: byte-identical decode vs the
    strip layout of the same raster across compressions and tile
    geometries (incl. edge tiles), and tile-local predictor-2 over
    16-bit samples via a hand-built two-tile fixture."""
    from reading_the_unreadable_spark.operators.tiff import _tiff_lzw_encode

    rng = np.random.Generator(np.random.PCG64(59))
    img16 = rng.integers(0, 65536, (37, 53)).astype(np.uint16)
    want = decode_tiff(encode_tiff(img16))  # strip path, already pinned
    # the 8-bit feature-space rescale is the documented contract
    assert np.array_equal(want[:, :, 0], np.round(img16 / 257.0).astype(np.uint8))
    for t in ((16, 16), (32, 16), (53, 37)):
        for c in ("none", "packbits", "lzw"):
            got = decode_tiff(encode_tiff(img16, c, tile=t))
            assert np.array_equal(got, want), (t, c)
    # truncation stays loud
    enc = encode_tiff(img16, "lzw", tile=(16, 16))
    with pytest.raises((ValueError, NotImplementedError)):
        decode_tiff(enc[: len(enc) - 40])

    # tile-local predictor-2 over 16-bit samples (mod 65536), hand-built
    img2 = rng.integers(0, 65536, (8, 32)).astype(np.uint16)
    tiles = []
    for tx in range(2):
        block = img2[:, tx * 16 : (tx + 1) * 16].astype(np.int64)
        diff = block.copy()
        diff[:, 1:] -= block[:, :-1]
        tiles.append(
            _tiff_lzw_encode((diff % 65536).astype("<u2").tobytes())
        )
    tags = [
        (256, 4, 1, 32), (257, 4, 1, 8), (258, 3, 1, 16), (259, 3, 1, 5),
        (262, 3, 1, 1), (277, 3, 1, 1), (284, 3, 1, 1), (317, 3, 1, 2),
        (322, 4, 1, 16), (323, 4, 1, 8), (324, 4, 2, 0), (325, 4, 2, 0),
    ]
    data_off = 8 + 2 + len(tags) * 12 + 4
    offs = [data_off + 16, data_off + 16 + len(tiles[0])]
    ifd = struct.pack("<H", len(tags))
    for tid, typ, cnt, val in tags:
        if tid == 324:
            val = data_off
        elif tid == 325:
            val = data_off + 8
        ifd += struct.pack("<HHII", tid, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    arrays = struct.pack("<2I", *offs) + struct.pack(
        "<2I", len(tiles[0]), len(tiles[1])
    )
    payload = (
        struct.pack("<2sHI", b"II", 42, 8) + ifd + arrays
        + tiles[0] + tiles[1]
    )
    got = decode_tiff(payload)
    assert np.array_equal(
        got[:, :, 0], np.round(img2 / 257.0).astype(np.uint8)
    )
    # 16-bit COLOR tiles stay a loud boundary
    rgb16 = rng.integers(0, 65536, (8, 8, 3)).astype(np.uint16)
    with pytest.raises(ValueError, match="grayscale"):
        encode_tiff(rgb16, tile=(8, 8))


def test_tiff_16bit_rgb_strips():
    """16-bit RGB strips (microscopy/archival masters): decode across
    compressions with the per-channel rescale, and predictor-2 running
    per sample CHANNEL (spec §14) via a hand-built LZW fixture."""
    from reading_the_unreadable_spark.operators.tiff import _tiff_lzw_encode

    rng = np.random.Generator(np.random.PCG64(71))
    img16 = rng.integers(0, 65536, (9, 11, 3)).astype(np.uint16)
    want = np.round(img16 / 257.0).astype(np.uint8)
    for c in ("none", "packbits", "lzw"):
        got = decode_tiff(encode_tiff(img16, c, rows_per_strip=4))
        assert np.array_equal(got, want), c

    # predictor-2: per-channel differencing mod 65536
    diff = img16.astype(np.int64).copy()
    diff[:, 1:] -= img16.astype(np.int64)[:, :-1]
    strip = _tiff_lzw_encode((diff % 65536).astype("<u2").tobytes())
    tags = [
        (256, 4, 1, 11), (257, 4, 1, 9), (258, 3, 1, 16), (259, 3, 1, 5),
        (262, 3, 1, 2), (273, 4, 1, 0), (277, 3, 1, 3), (278, 4, 1, 9),
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
    assert np.array_equal(decode_tiff(payload), want)

    # tiled 16-bit color stays a loud boundary (writer refuses too)
    with pytest.raises(ValueError, match="grayscale"):
        encode_tiff(img16, "none", tile=(8, 8))
