"""Baseline TIFF codec — pure numpy + stdlib, from the public TIFF 6.0
specification.

Scanned-newspaper archives (the reference's NCSE domain) ship TIFF:
bilevel Group-4 faxes, grayscale and RGB scans, LZW- or
PackBits-compressed.  Same policy as the other codecs in this repo
(:mod:`jpeg`, :mod:`multimodal`, :mod:`audio`): the profiles real
archives use are decoded for real — strip-based baseline TIFF, 1-bit
bilevel (both photometric polarities) and 8-bit gray/RGB/palette, with
Compression = none (1), CCITT RLE / Modified Huffman (2), CCITT Group
3 / T.4 (3, 1-D and 2-D rows per T4Options), CCITT Group 4 / T.6 (4),
LZW (5, incl. the spec's early-change convention and
horizontal-differencing predictor), and PackBits (32773) — in BOTH
the strip-based and the tiled layout (spec §15; large-plate scans are
routinely tiled), plus 16-bit grayscale in BOTH layouts (tile-local
predictor-2 over 16-bit samples included) and PlanarConfiguration=2
separate-plane strips.  Depths/layouts beyond those (planar tiles,
16-bit color, sub-byte gray) raise
``NotImplementedError`` loudly; truncation and malformed structures
raise ``ValueError`` (the quarantining-caller contract shared by every
codec here).

The writer emits uncompressed / PackBits / LZW strips for round-trip
tests; the CCITT family is exercised against the from-scratch T.4/T.6
coders in :mod:`g4`.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 spec §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_T4OPTIONS = 292
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_PLANAR = 284
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes → HxWx3 uint8 RGB (first IFD).  ValueError on
    malformed/truncated input, NotImplementedError on out-of-profile
    layouts — nothing else escapes."""
    try:
        return _decode_tiff_impl(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed TIFF: {e}") from e
    except KeyError as e:  # a required tag is absent
        raise ValueError(f"TIFF missing required tag {e}") from e


def _read_ifd(payload: bytes, off: int, bo: str) -> dict[int, list]:
    (n,) = struct.unpack_from(bo + "H", payload, off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        # a corrupt count can claim gigabytes: it can never exceed the
        # payload itself (guards the fmt-string build below, too)
        if total > len(payload):
            raise ValueError(f"TIFF tag {tag} claims {total} value bytes")
        voff = base + 8 if total <= 4 else struct.unpack_from(bo + "I", payload, base + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt is None:
            continue  # rationals/ascii: not needed for decode
        vals = list(struct.unpack_from(bo + fmt * count, payload, voff))
        tags[tag] = vals
    return tags


def _decode_tiff_impl(payload: bytes) -> np.ndarray:
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: {payload[:4]!r}")
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    tags = _read_ifd(payload, ifd_off, bo)
    planar = tags.get(_T_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"invalid PlanarConfiguration {planar}")
    w = tags[_T_WIDTH][0]
    h = tags[_T_LENGTH][0]
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20) or w * h > 1 << 28:
        # corrupt headers claiming absurd rasters must not allocate
        raise ValueError(f"implausible TIFF dimensions {w}x{h}")
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits_l = tags.get(_T_BITS, [1])
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    bits = bits_l[0]
    if any(b != bits for b in bits_l):
        raise NotImplementedError(f"mixed bits-per-sample {bits_l}")
    if bits not in (1, 4, 8, 16):
        raise NotImplementedError(f"{bits}-bit samples")
    if bits == 1 and spp != 1:
        raise NotImplementedError("multi-sample bilevel")
    if bits == 16 and spp not in (1, 3):
        raise NotImplementedError(f"16-bit TIFF with {spp} samples")
    if bits == 4 and (
        spp != 1 or _T_TILE_WIDTH in tags or tags.get(_T_PREDICTOR, [1])[0] == 2
    ):
        raise NotImplementedError(
            "4-bit TIFF decodes single-sample strip layouts without predictor"
        )

    if planar == 2 and spp > 1:
        # separate component planes (all R strips, then G, then B);
        # meaningless for spp == 1, where some writers set it anyway
        if _T_TILE_WIDTH in tags or bits != 8:
            raise NotImplementedError(
                "planar configuration 2 decodes 8-bit strip layouts"
            )
        grid = _decode_strips_planar(payload, tags, w, h, spp, comp)
    elif _T_TILE_WIDTH in tags:
        grid = _decode_tiles(payload, tags, w, h, spp, bits, comp, bo)
    else:
        grid = _decode_strips(payload, tags, w, h, spp, bits, comp)

    if bits == 16:
        # archival/microscopy masters: decode honestly at 16 bit, then
        # rescale to the pipeline's 8-bit feature space (65535 → 255);
        # predictor-2 differencing runs per SAMPLE CHANNEL (spec §14:
        # "each component of each pixel")
        g16 = np.frombuffer(grid.tobytes(), dtype=bo + "u2").reshape(
            h, w, spp
        )
        if tags.get(_T_PREDICTOR, [1])[0] == 2:
            g16 = (np.cumsum(g16.astype(np.int64), axis=1) % 65536).astype(
                np.uint16
            )
        g8 = np.round(g16 / 257.0).astype(np.uint8)
        if spp == 1:
            g8 = g8[:, :, 0]
            if photo == 0:
                g8 = 255 - g8
            return np.stack([g8, g8, g8], axis=-1)
        return g8

    if bits == 4:
        # old-scan 16-level layouts: two samples per byte, high nibble
        # first (spec §Image File Directory / BitsPerSample)
        nibbles = np.empty((h, grid.shape[1] * 2), np.uint8)
        nibbles[:, 0::2] = grid >> 4
        nibbles[:, 1::2] = grid & 0x0F
        v = nibbles[:, :w]
        if photo == 3:  # 16-color palette
            cmap = tags.get(_T_COLORMAP)
            if cmap is None:
                raise ValueError("palette TIFF missing ColorMap")
            n = len(cmap) // 3
            pal = (
                np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
            ).astype(np.uint8)
            if int(v.max()) >= n:
                raise ValueError("TIFF palette index out of range")
            return pal[v]
        g8 = (v * 17).astype(np.uint8)  # 0..15 → 0..255
        if photo == 0:
            g8 = 255 - g8
        return np.stack([g8, g8, g8], axis=-1)

    if bits == 1:
        px = np.unpackbits(grid, axis=1)[:, :w]  # MSB-first, row byte-aligned
        if photo == 0:  # WhiteIsZero: 0 = white
            px = 1 - px
        g8 = (px * 255).astype(np.uint8)
        return np.stack([g8, g8, g8], axis=-1)

    if tags.get(_T_PREDICTOR, [1])[0] == 2:  # horizontal differencing
        grid = np.cumsum(
            grid.reshape(h, w, spp).astype(np.int64), axis=1
        ).astype(np.uint8).reshape(h, -1)

    if photo == 3:  # palette
        cmap = tags.get(_T_COLORMAP)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        # ColorMap is 16-bit per channel, all reds then greens then blues
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
        ).astype(np.uint8)
        idx = grid.reshape(h, w)
        if int(idx.max()) >= n:
            raise ValueError("TIFF palette index out of range")
        return pal[idx]
    if spp == 1:  # grayscale
        g8 = grid.reshape(h, w)
        if photo == 0:
            g8 = 255 - g8
        return np.stack([g8, g8, g8], axis=-1)
    if spp >= 3:
        return grid.reshape(h, w, spp)[:, :, :3].copy()
    raise NotImplementedError(f"samples-per-pixel {spp}")


def _decompress_chunk(
    chunk: bytes,
    comp: int,
    tags: dict,
    width: int,
    n_rows: int,
    expected: int,
    label: str,
) -> bytes:
    """One strip or tile → raw row-padded bytes (``expected`` of them;
    CCITT chunks decode against their own ``width``/``n_rows``)."""
    if comp == 1:
        raw = chunk
    elif comp == 32773:
        raw = _packbits_decode(chunk, expected)
    elif comp == 5:
        raw = _tiff_lzw_decode(chunk, expected)
    elif comp == 4:
        from .g4 import g4_decode

        raw = g4_decode(chunk, width, n_rows)
    elif comp == 2:  # CCITT RLE: MH rows, byte-aligned, no EOLs
        from .g4 import mh_decode

        raw = mh_decode(chunk, width, n_rows)
    elif comp == 3:  # T.4 Group 3; T4Options bit 0 = 2-D rows
        from .g4 import g3_decode

        t4 = tags.get(_T_T4OPTIONS, [0])[0]
        raw = g3_decode(chunk, width, n_rows, two_d=bool(t4 & 1))
    else:
        raise NotImplementedError(f"TIFF compression {comp}")
    if len(raw) < expected:
        raise ValueError(f"TIFF {label} decodes short")
    return raw


def _decode_strips(
    payload: bytes, tags: dict, w: int, h: int, spp: int, bits: int, comp: int
) -> np.ndarray:
    """Strip-based layout → (h, row_bytes) uint8 grid."""
    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags.get(_T_STRIP_COUNTS)
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF strip offsets/counts mismatch")
    row_bytes = (w * spp * bits + 7) // 8
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError(f"TIFF strip {si} truncated")
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            continue
        raw = _decompress_chunk(
            strip, comp, tags, w, n_rows, n_rows * row_bytes, f"strip {si}"
        )
        rows.append(
            np.frombuffer(raw, np.uint8, n_rows * row_bytes).reshape(
                n_rows, row_bytes
            )
        )
    if not rows:
        raise ValueError("TIFF has no strip data")
    grid = np.vstack(rows)
    if grid.shape[0] < h:
        raise ValueError("TIFF rows short of ImageLength")
    return grid[:h]


def _decode_strips_planar(
    payload: bytes, tags: dict, w: int, h: int, spp: int, comp: int
) -> np.ndarray:
    """PlanarConfiguration=2 strips (TIFF 6.0): each strip holds ONE
    component's rows, all component-0 strips first, then component-1,
    …  Planes are decoded like grayscale and re-interleaved to the
    same (h, w*spp) chunky grid the caller expects — per-row predictor
    differencing commutes with the interleave, so the generic
    predictor-2 path downstream applies unchanged."""
    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags.get(_T_STRIP_COUNTS)
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    spl = -(-h // rps)  # strips per plane
    if counts is None or len(counts) != len(offsets) or len(offsets) != spl * spp:
        raise ValueError(
            f"planar TIFF expects {spl}x{spp} strips, got {len(offsets)}"
        )
    row_bytes = w  # 8-bit single component
    planes = []
    for c in range(spp):
        rows = []
        for si in range(spl):
            off, cnt = offsets[c * spl + si], counts[c * spl + si]
            strip = payload[off : off + cnt]
            if len(strip) < cnt:
                raise ValueError(f"TIFF strip {c}:{si} truncated")
            n_rows = min(rps, h - si * rps)
            raw = _decompress_chunk(
                strip, comp, tags, w, n_rows, n_rows * row_bytes,
                f"strip {c}:{si}",
            )
            rows.append(
                np.frombuffer(raw, np.uint8, n_rows * row_bytes).reshape(
                    n_rows, row_bytes
                )
            )
        planes.append(np.vstack(rows)[:h])
    return np.stack(planes, axis=-1).reshape(h, w * spp)


def _decode_tiles(
    payload: bytes,
    tags: dict,
    w: int,
    h: int,
    spp: int,
    bits: int,
    comp: int,
    bo: str = "<",
) -> np.ndarray:
    """Tiled layout (TIFF 6.0 §15) → (h, row_bytes) uint8 grid, same
    shape the strip path yields.  Every tile decompresses to a full
    TileWidth×TileLength block (edge tiles are padded in the file);
    the canvas is assembled in pixel space, cropped, and repacked.
    Predictor-2 applies WITHIN each tile — and for 16-bit samples the
    differencing is per 16-bit SAMPLE in file byte order, resetting at
    every tile row — so both are handled here and the tag neutralized
    for the caller."""
    tw = tags[_T_TILE_WIDTH][0]
    tl = tags[_T_TILE_LENGTH][0]
    if not (0 < tw <= 1 << 16 and 0 < tl <= 1 << 16) or tw * tl > 1 << 26:
        raise ValueError(f"implausible TIFF tile {tw}x{tl}")
    offsets = tags[_T_TILE_OFFSETS]
    counts = tags.get(_T_TILE_COUNTS)
    across = -(-w // tw)
    down = -(-h // tl)
    if (
        counts is None
        or len(counts) != len(offsets)
        or len(offsets) != across * down
    ):
        raise ValueError("TIFF tile offsets/counts mismatch")
    tile_row_bytes = (tw * spp * bits + 7) // 8
    expected = tl * tile_row_bytes
    pred = tags.get(_T_PREDICTOR, [1])[0] == 2
    if bits == 16 and spp != 1:
        raise NotImplementedError("16-bit tiled TIFF decodes grayscale only")
    if bits == 1:
        canvas = np.zeros((down * tl, across * tw), np.uint8)
    elif bits == 16:
        canvas = np.zeros((down * tl, across * tw), np.dtype(bo + "u2"))
    else:
        canvas = np.zeros((down * tl, across * tw, spp), np.uint8)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[off : off + cnt]
        if len(chunk) < cnt:
            raise ValueError(f"TIFF tile {ti} truncated")
        raw = _decompress_chunk(
            chunk, comp, tags, tw, tl, expected, f"tile {ti}"
        )
        block = np.frombuffer(raw, np.uint8, expected).reshape(
            tl, tile_row_bytes
        )
        ty, tx = divmod(ti, across)
        if bits == 1:
            canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = (
                np.unpackbits(block, axis=1)[:, :tw]
            )
        elif bits == 16:
            px16 = np.frombuffer(raw, np.dtype(bo + "u2"), tl * tw).reshape(
                tl, tw
            )
            if pred:
                px16 = (
                    np.cumsum(px16.astype(np.int64), axis=1) % 65536
                ).astype(np.dtype(bo + "u2"))
            canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = px16
        else:
            px = block.reshape(tl, tw, spp)
            if pred:
                px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
            canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = px
    if pred:
        tags[_T_PREDICTOR] = [1]  # already applied per tile
    if bits == 1:
        return np.packbits(canvas[:h, :w], axis=1)
    if bits == 16:
        crop = np.ascontiguousarray(canvas[:h, :w])
        return np.frombuffer(crop.tobytes(), np.uint8).reshape(h, 2 * w)
    return canvas[:h, :w].reshape(h, -1)


# ----------------------------------------------------------- compressions
def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the spec recommends restarting per row)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            # literal: extend until a 3-byte run starts or 128 cap
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and row[j] == row[j + 1] == row[j - 1])
            ):
                j += 1
            # back off if the last byte begins a run
            lit = row[i:j]
            out += bytes([len(lit) - 1]) + lit
            i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9→12-bit codes,
    Clear=256/EOI=257, and the spec's EARLY-CHANGE convention (the code
    width grows one entry before the table is actually full)."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_size = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                if len(out) >= expected:
                    return bytes(out)
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_size = 9
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad TIFF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
        # early change: grow width when ONE entry short of full
        if len(table) + 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
        if len(out) >= expected:
            break
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor (early change, MSB-first)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << code_size) | code
        nbits += code_size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # early change mirrors the decoder: width grows when the NEXT
        # code to be assigned reaches the width limit minus one
        if next_code + 1 == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4094:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- writer
def _compress_block(block: np.ndarray, compression: str, bilevel: bool) -> bytes:
    """One strip/tile pixel block → compressed bytes."""
    if bilevel:
        rows = [
            np.packbits(block[y].astype(np.uint8)).tobytes()
            for y in range(block.shape[0])
        ]
    else:
        rows = [block[y].tobytes() for y in range(block.shape[0])]
    raw = b"".join(rows)
    if compression == "none":
        return raw
    if compression == "packbits":
        return b"".join(_packbits_encode(r) for r in rows)
    if compression == "lzw":
        return _tiff_lzw_encode(raw)
    if compression in ("g4", "mh", "g3", "g3-2d"):
        if not bilevel:
            raise ValueError(f"{compression} compression needs bool bilevel input")
        from .g4 import g3_encode, g4_encode, mh_encode

        # bool convention is True = white; the CCITT coders code black
        # runs and CCITT-in-TIFF uses Photometric=0 (WhiteIsZero)
        page = ~block
        if compression == "g4":
            return g4_encode(page)
        if compression == "mh":
            return mh_encode(page)
        return g3_encode(page, two_d=compression == "g3-2d")
    raise ValueError(f"unknown compression {compression!r}")


def _encode_tiff_tiled(
    arr: np.ndarray, compression: str, tw: int, tl: int
) -> bytes:
    """Tiled-layout writer (TIFF 6.0 §15): edge tiles padded to the
    full tile size, one compressed chunk per tile, TileOffsets/Counts
    arrays after the IFD."""
    bilevel = arr.dtype == bool
    gray = arr.ndim == 2 and not bilevel
    if arr.dtype == np.uint16:
        if not gray:
            raise ValueError("16-bit TIFF write is grayscale only")
        arr = arr.astype("<u2")  # match the little-endian header
    h, w = arr.shape[:2]
    spp = 1 if (gray or bilevel) else 3
    bits = 1 if bilevel else (16 if arr.dtype == np.dtype("<u2") else 8)
    across, down = -(-w // tw), -(-h // tl)
    tiles: list[bytes] = []
    for ty in range(down):
        for tx in range(across):
            block = arr[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
            pad_h, pad_w = tl - block.shape[0], tw - block.shape[1]
            if pad_h or pad_w:
                pad = ((0, pad_h), (0, pad_w)) + (
                    ((0, 0),) if arr.ndim == 3 else ()
                )
                block = np.pad(block, pad)
            tiles.append(_compress_block(block, compression, bilevel))
    comp_id = {
        "none": 1, "packbits": 32773, "lzw": 5,
        "g4": 4, "mh": 2, "g3": 3, "g3-2d": 3,
    }[compression]
    ccitt = compression in ("g4", "mh", "g3", "g3-2d")
    photo = 0 if ccitt else (1 if (gray or bilevel) else 2)

    n_tags = 11 + (1 if compression == "g3-2d" else 0)
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + n_tags * 12 + 4
    data_off = 8 + ifd_size
    n_tiles = len(tiles)
    arrays = b""
    if n_tiles > 1:
        tile_data_off = data_off + 8 * n_tiles
    else:
        tile_data_off = data_off
    offs = []
    cur = tile_data_off
    for t in tiles:
        offs.append(cur)
        cur += len(t)
    if n_tiles > 1:
        arrays = struct.pack(f"<{n_tiles}I", *offs) + struct.pack(
            f"<{n_tiles}I", *[len(t) for t in tiles]
        )

    def tag(tid: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, typ, count, value)

    tags = [
        tag(_T_WIDTH, 4, 1, w),
        tag(_T_LENGTH, 4, 1, h),
        tag(_T_BITS, 3, 1, bits),
        tag(_T_COMPRESSION, 3, 1, comp_id),
        tag(_T_PHOTOMETRIC, 3, 1, photo),
        tag(_T_SAMPLES, 3, 1, spp),
        tag(_T_PLANAR, 3, 1, 1),
    ]
    if compression == "g3-2d":
        tags.append(tag(_T_T4OPTIONS, 4, 1, 1))
    tags += [
        tag(_T_TILE_WIDTH, 4, 1, tw),
        tag(_T_TILE_LENGTH, 4, 1, tl),
        tag(
            _T_TILE_OFFSETS, 4, n_tiles,
            offs[0] if n_tiles == 1 else data_off,
        ),
        tag(
            _T_TILE_COUNTS, 4, n_tiles,
            len(tiles[0]) if n_tiles == 1 else data_off + 4 * n_tiles,
        ),
    ]
    ifd = struct.pack("<H", n_tags) + b"".join(tags) + struct.pack("<I", 0)
    return header + ifd + arrays + b"".join(tiles)


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale, or HxW bool bilevel) →
    little-endian baseline TIFF.  ``compression``: ``"none"``,
    ``"packbits"``, ``"lzw"``, or (bilevel input only) ``"g4"``,
    ``"mh"`` (CCITT RLE), ``"g3"`` (T.4 1-D), ``"g3-2d"`` (T.4 2-D,
    T4Options=1).  ``tile=(tw, tl)`` emits the tiled layout instead
    of strips."""
    if tile is not None:
        return _encode_tiff_tiled(arr, compression, *tile)
    bilevel = arr.dtype == bool
    gray = arr.ndim == 2 and not bilevel
    if arr.dtype == np.uint16:
        arr = arr.astype("<u2")  # match the little-endian header
    h, w = arr.shape[:2]
    spp = 1 if (gray or bilevel) else 3
    bits = 1 if bilevel else (16 if arr.dtype == np.dtype("<u2") else 8)
    rps = rows_per_strip or h
    if bilevel:
        raw_rows = [
            np.packbits(arr[y].astype(np.uint8)).tobytes() for y in range(h)
        ]
    else:
        raw_rows = [arr[y].tobytes() for y in range(h)]

    strips = []
    for s0 in range(0, h, rps):
        block_rows = raw_rows[s0 : s0 + rps]
        raw = b"".join(block_rows)
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(b"".join(_packbits_encode(r) for r in block_rows))
        elif compression == "lzw":
            strips.append(_tiff_lzw_encode(raw))
        elif compression in ("g4", "mh", "g3", "g3-2d"):
            if not bilevel:
                raise ValueError(
                    f"{compression} compression needs bool bilevel input"
                )
            from .g4 import g3_encode, g4_encode, mh_encode

            # bool convention is True = white; the CCITT coders code
            # black runs and CCITT-in-TIFF uses Photometric=0
            # (WhiteIsZero)
            page = ~arr[s0 : s0 + rps]
            if compression == "g4":
                strips.append(g4_encode(page))
            elif compression == "mh":
                strips.append(mh_encode(page))
            else:
                strips.append(g3_encode(page, two_d=compression == "g3-2d"))
        else:
            raise ValueError(f"unknown compression {compression!r}")
    comp_id = {
        "none": 1, "packbits": 32773, "lzw": 5,
        "g4": 4, "mh": 2, "g3": 3, "g3-2d": 3,
    }[compression]
    ccitt = compression in ("g4", "mh", "g3", "g3-2d")
    # BlackIsZero for gray/bilevel (bit 1 = white), except the CCITT
    # family which is conventionally WhiteIsZero (decoded bit 1 =
    # black); RGB otherwise
    photo = 0 if ccitt else (1 if (gray or bilevel) else 2)

    n_tags = 10 + (1 if compression == "g3-2d" else 0)
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + n_tags * 12 + 4
    data_off = 8 + ifd_size
    # strip offset/count arrays (if >1 strip they live after the IFD)
    n_strips = len(strips)
    arrays = b""
    if n_strips > 1:
        so_off = data_off
        arrays_counts_off = so_off + 4 * n_strips
        strip_data_off = arrays_counts_off + 4 * n_strips
    else:
        strip_data_off = data_off
    offs = []
    cur = strip_data_off
    for s in strips:
        offs.append(cur)
        cur += len(s)
    if n_strips > 1:
        arrays = struct.pack(f"<{n_strips}I", *offs) + struct.pack(
            f"<{n_strips}I", *[len(s) for s in strips]
        )

    def tag(tid: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, typ, count, value)

    tags = [
        tag(_T_WIDTH, 4, 1, w),
        tag(_T_LENGTH, 4, 1, h),
        tag(_T_BITS, 3, 1, bits),
        tag(_T_COMPRESSION, 3, 1, comp_id),
        tag(_T_PHOTOMETRIC, 3, 1, photo),
        tag(
            _T_STRIP_OFFSETS, 4, n_strips,
            offs[0] if n_strips == 1 else data_off,
        ),
        tag(_T_SAMPLES, 3, 1, spp),
        tag(_T_ROWS_PER_STRIP, 4, 1, rps),
        tag(
            _T_STRIP_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else data_off + 4 * n_strips,
        ),
        tag(_T_PLANAR, 3, 1, 1),
    ]
    if compression == "g3-2d":
        # tag ids must stay ascending: 292 sorts after 284
        tags.append(tag(_T_T4OPTIONS, 4, 1, 1))
    ifd = struct.pack("<H", n_tags) + b"".join(tags) + struct.pack("<I", 0)
    return header + ifd + arrays + b"".join(strips)
