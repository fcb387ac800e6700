"""Vendored uncompressed BMP codec (functions/bmp.py): lossless
round-trips across widths (row-padding shapes), top-down and paletted
decode, corruption/out-of-scope rejection, and decode_payload routing
with cross-codec parity against the PNG decoder."""

import struct

import numpy as np
import pytest

from rdf_diff_store_ray.functions.bmp import decode_bmp, encode_bmp


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [yy * 2 + xx, yy + xx * 2, yy * 3 + xx]
    return np.stack([
        (c * 220 // max(int(c.max()), 1)).astype(np.uint8) for c in chans
    ], axis=-1)


# ------------------------------------------------------------ round-trips --
@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 16, 33])
def test_rgb_roundtrip_every_padding_shape(w):
    """Row stride pads to 4 bytes; every w mod 4 class round-trips."""
    img = _gradient_rgb(7, w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_gray_roundtrip_expands_channels():
    g = (np.mgrid[0:9, 0:11][0] * 23).astype(np.uint8)
    dec = decode_bmp(encode_bmp(g))
    assert dec.shape == (9, 11, 3)
    assert np.array_equal(dec[..., 0], g)
    assert np.array_equal(dec[..., 1], g)
    assert np.array_equal(dec[..., 2], g)


def test_encode_deterministic():
    img = _gradient_rgb(12, 10)
    assert encode_bmp(img) == encode_bmp(img)


def test_top_down_negative_height_decodes():
    img = _gradient_rgb(6, 5)
    data = bytearray(encode_bmp(img))
    h = struct.unpack_from("<i", data, 22)[0]
    # flip to top-down: negate height, reverse the stored row order
    struct.pack_into("<i", data, 22, -h)
    stride = ((5 * 3 + 3) // 4) * 4
    off = 54
    rows = [bytes(data[off + i * stride: off + (i + 1) * stride])
            for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_8bit_grayscale_palette_decodes_2d():
    """Hand-built 8-bit DIB with an identity grayscale palette decodes
    to (h, w); a colored palette decodes to (h, w, 3)."""
    h, w = 4, 6
    idx = (np.arange(h * w, dtype=np.uint8).reshape(h, w) * 9)
    stride = ((w + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]

    def build(palette_rgb):
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette_rgb)
        off = 14 + 40 + len(pal)
        body = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                           stride * h, 0, 0, 256, 0) + pal + rows.tobytes()
        return b"BM" + struct.pack("<IHHI", 14 + len(body), 0, 0, off) \
            + body

    gray = build([(i, i, i) for i in range(256)])
    out = decode_bmp(gray)
    assert out.shape == (h, w) and np.array_equal(out, idx)
    color = build([(i, (i * 3) % 256, 255 - i) for i in range(256)])
    out3 = decode_bmp(color)
    assert out3.shape == (h, w, 3)
    assert np.array_equal(out3[..., 0], idx)  # R channel = index


# -------------------------------------------------------------- rejection --
def test_rejects_non_bmp_and_truncation():
    with pytest.raises(ValueError, match="magic|truncated"):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 60)
    data = encode_bmp(_gradient_rgb(8, 8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(data[: len(data) // 2])


def test_rejects_out_of_scope_shapes():
    data = bytearray(encode_bmp(_gradient_rgb(8, 8)))
    rle = bytearray(data)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(rle))
    b16 = bytearray(data)
    struct.pack_into("<H", b16, 28, 16)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_bmp(bytes(b16))
    core = bytearray(data)
    struct.pack_into("<I", core, 14, 12)  # BITMAPCOREHEADER
    with pytest.raises(NotImplementedError, match="OS/2"):
        decode_bmp(bytes(core))


# ------------------------------------------------------------ integration --
def test_decode_payload_routes_bmp_and_matches_png():
    """The multimodal router decodes vendored BMP, and the SAME pixels
    shipped as BMP and PNG produce identical grayscale output (the
    cross-codec property perceptual dedup relies on)."""
    from rdf_diff_store_ray.functions.multimodal import decode_payload
    from rdf_diff_store_ray.functions.png import encode_png

    img = _gradient_rgb(24, 17)
    via_bmp = decode_payload("bmp", encode_bmp(img))
    via_png = decode_payload("png", encode_png(img))
    assert np.array_equal(via_bmp, via_png)
    with pytest.raises(NotImplementedError, match="webp"):
        decode_payload("webp", b"RIFF....WEBP")
