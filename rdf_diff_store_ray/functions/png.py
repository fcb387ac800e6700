"""Minimal vendored PNG codec (pure numpy + stdlib zlib).

Pillow is absent from this environment, so the real-codec branch of
the multimodal decode stage (``multimodal.decode_payload``) routes
``codec='png'`` through this module — the branch is *tested*, not
trusted. Scope is the overwhelmingly common web shapes:

- decoder: bit depth 8, color types 0 (grayscale), 2 (RGB),
  4 (gray+alpha), 6 (RGBA), interlace 0 (non-Adam7), all five
  scanline filters, CRC-verified chunks;
- encoder: the same array shapes, with any single scanline filter
  0–4 (the non-zero types exist so tests can exercise every decoder
  unfilter path, not just the trivial one).

Reference behavior: the W3C PNG specification (chunk layout, filter
algorithms, Paeth predictor) and PIL's ITU-R 601-2 luma constants for
the grayscale conversion, so installing Pillow later changes nothing
observable. Palette (color type 3), 16-bit depth and Adam7 interlace
raise ``NotImplementedError`` with the reason.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 6.6) over uint8 operands."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """u8 array → PNG bytes. ``(h, w)`` encodes grayscale; ``(h, w, c)``
    with c in {2, 3, 4} encodes gray+alpha / RGB / RGBA. Every scanline
    carries ``filter_type`` (0 none, 1 sub, 2 up, 3 average, 4 Paeth)."""
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(
            "expected (h, w) or (h, w, c in {2,3,4}) u8 array, got shape "
            f"{arr.shape}"
        )
    h, w, bpp = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    flat = arr.reshape(h, w * bpp)
    out = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        left = np.zeros_like(row)
        left[bpp:] = row[:-bpp]
        if filter_type == 0:
            raw = row
        elif filter_type == 1:
            raw = row - left
        elif filter_type == 2:
            raw = row - prev
        elif filter_type == 3:
            raw = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        else:
            upleft = np.zeros_like(prev)
            upleft[bpp:] = prev[:-bpp]
            raw = row - _paeth(left, prev, upleft)
        out.append(filter_type)
        out += raw.tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[bpp], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_row(
    ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    if ftype == 0:
        return raw.copy()
    if ftype == 1:  # Sub: per-channel prefix sum, mod 256 via u8 dtype
        rec = np.empty_like(raw)
        for c in range(bpp):
            rec[c::bpp] = np.cumsum(raw[c::bpp], dtype=np.uint8)
        return rec
    if ftype == 2:  # Up
        return raw + prev
    # Average / Paeth depend on the reconstructed left neighbor —
    # sequential in x, vectorized across the bpp channel lanes
    rec = np.empty_like(raw)
    w = len(raw) // bpp
    left = np.zeros(bpp, dtype=np.uint8)
    upleft = np.zeros(bpp, dtype=np.uint8)
    for x in range(w):
        sl = slice(x * bpp, (x + 1) * bpp)
        up = prev[sl]
        if ftype == 3:
            pred = (
                (left.astype(np.uint16) + up.astype(np.uint16)) >> 1
            ).astype(np.uint8)
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"invalid scanline filter type {ftype}")
        rec[sl] = raw[sl] + pred
        left = rec[sl]
        upleft = up
    return rec


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → u8 array: ``(h, w)`` for grayscale, ``(h, w, c)``
    for gray+alpha / RGB / RGBA. CRC failures and truncation raise
    ``ValueError``; out-of-scope shapes raise ``NotImplementedError``."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    saw_end = False
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + body) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"PLTE" or (ihdr and ihdr[3] == 3):
            raise NotImplementedError(
                "palette (color type 3) PNGs are out of scope for the "
                "vendored codec"
            )
        elif typ == b"IEND":
            saw_end = True
            break
        pos += 12 + ln
    if ihdr is None or not saw_end:
        raise ValueError("PNG missing IHDR/IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(
            f"bit depth {depth} is out of scope (8 only)"
        )
    if color not in _CHANNELS:
        raise NotImplementedError(f"color type {color} is out of scope")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace is out of scope")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    bpp = _CHANNELS[color]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(raw[y, 0]), raw[y, 1:], prev, bpp)
        out[y] = prev
    if bpp == 1:
        return out
    return out.reshape(h, w, bpp)


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """Luma conversion with PIL's ITU-R 601-2 fixed-point constants
    (``L = (19595 R + 38470 G + 7471 B + 2^15) >> 16``) so a later
    Pillow install produces the same bytes. Alpha is ignored (PIL
    ``convert('L')`` semantics)."""
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 2:  # gray + alpha
        return np.ascontiguousarray(arr[:, :, 0])
    px = arr.astype(np.uint32)
    l24 = (
        19595 * px[:, :, 0] + 38470 * px[:, :, 1] + 7471 * px[:, :, 2]
        + 0x8000
    )
    return (l24 >> 16).astype(np.uint8)
