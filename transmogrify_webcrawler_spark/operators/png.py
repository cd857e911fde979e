"""Pixel-true PNG codec — stdlib only (zlib + struct), no imaging library.

This retires the PNG half of the resize stub: `decode_png` inflates the
IDAT stream, unfilters every scanline (all five PNG filter types), and
returns raw pixel rows; `encode_png` writes a spec-correct file back out
(filter-0 scanlines, one IDAT, CRC-correct chunks — including the IHDR CRC
the old header-rewrite stub intentionally left stale); `resize_png` is a
nearest-neighbor resample between them. JPEG/GIF remain header rewrites in
`multimodal.resize_image_bytes` — their entropy coders genuinely need a
codec library this environment doesn't have, and that limit is documented
there.

Scope, deliberately pinned: bit depth 8, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), no interlace. That covers what an encoder under
our control emits plus the overwhelming share of web PNGs; anything else
raises ValueError so callers can fall back loudly rather than corrupt
pixels silently.

Determinism note (oracle relies on it): `zlib.compress(data, 6)` is
deterministic for a given input, and the nearest-neighbor index map is the
pinned floor formula src_i = out_i * src_len // out_len — the same
arithmetic a SQL oracle can reconstruct.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """(width, height, color_type, rows) — rows are unfiltered scanlines of
    width*channels bytes each. Raises ValueError on anything outside the
    pinned scope (wrong signature, no IDAT, interlace, palette, bit depth
    != 8, truncated/corrupt stream)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG")
    i, w = 8, None
    idat = bytearray()
    while i + 8 <= len(payload):
        clen = int.from_bytes(payload[i:i + 4], "big")
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + clen]
        if len(data) < clen:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported depth/color {depth}/{color}")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color]
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("pixel data size mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 1:    # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        rows.append(line)
        prev = line
    return w, h, color, rows


def encode_png(w: int, h: int, color_type: int,
               rows: list[bytearray] | list[bytes]) -> bytes:
    """Spec-correct PNG: IHDR + one IDAT (filter-0 scanlines, deterministic
    zlib level 6) + IEND, every chunk CRC genuine."""
    ch = _CHANNELS[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        if len(rows[y]) != w * ch:
            raise ValueError("row length mismatch")
        raw.append(0)
        raw += rows[y]
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample: out[y][x] = src[y*src_h//out_h]
    [x*src_w//out_w] per channel — decode, resample, re-encode. Raises
    ValueError when the payload is outside decode_png's pinned scope (the
    caller falls back to the documented header rewrite)."""
    w, h, color, rows = decode_png(payload)
    ch = _CHANNELS[color]
    out_rows: list[bytearray] = []
    # precompute the column byte-spans once; rows reuse it
    col_src = [(x * w // out_w) * ch for x in range(out_w)]
    for y in range(out_h):
        src = rows[y * h // out_h]
        line = bytearray(out_w * ch)
        for x, sx in enumerate(col_src):
            line[x * ch:(x + 1) * ch] = src[sx:sx + ch]
        out_rows.append(line)
    return encode_png(out_w, out_h, color, out_rows)
