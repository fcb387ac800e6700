"""Vendored baseline JPEG codec (functions/jpeg.py): round-trips across
every stream shape the encoder can emit, corruption rejection, and the
actor-pool decode + cross-codec perceptual dedup integration."""

import numpy as np
import pytest

from rdf_diff_store_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    """Smooth, wrap-free ramp (modulo wraps are sharp edges that ring)."""
    yy, xx = np.mgrid[0:h, 0:w]
    v = yy * 3 + xx * 2
    return (v * 220 // max(int(v.max()), 1)).astype(np.uint8)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [yy * 2 + xx, yy + xx * 2, yy * 3 + xx]
    return np.stack([
        (c * 220 // max(int(c.max()), 1)).astype(np.uint8) for c in chans
    ], axis=-1)


# ------------------------------------------------------------ round-trips --
def test_gray_roundtrip_smooth_is_tight():
    img = _gradient(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_roundtrip():
    img = _gradient_rgb(45, 61)  # non-multiple-of-8 on both axes
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_rgb_420_subsampled_roundtrip():
    img = _gradient_rgb(45, 61)
    data = encode_jpeg(img, quality=92, subsampling="420")
    dec = decode_jpeg(data)
    assert dec.shape == img.shape
    # chroma is 2x2 box-averaged: looser bound, and the stream must be
    # genuinely smaller than 4:4:4
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0
    assert len(data) < len(encode_jpeg(img, quality=92, subsampling="444"))


def test_restart_markers_roundtrip_and_appear():
    img = _gradient(48, 48)
    data = encode_jpeg(img, quality=95, restart_interval=2)
    # RST0..RST7 cycle through the stream
    assert b"\xff\xd0" in data and b"\xff\xd1" in data
    dec = decode_jpeg(data)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.array_equal(dec, base)


def test_rgb_420_with_restarts():
    img = _gradient_rgb(32, 48)
    dec = decode_jpeg(
        encode_jpeg(img, quality=92, subsampling="420", restart_interval=1))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0


def test_tiny_and_odd_sizes():
    for h, w in [(1, 1), (7, 9), (8, 8), (9, 17)]:
        img = _gradient(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_flat_image_is_exact():
    img = np.full((16, 24), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=75)), img)


def test_noise_quality_ladder_monotone():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    errs = []
    for q in (30, 60, 95):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(float(np.abs(dec.astype(int) - img.astype(int)).mean()))
    assert errs[0] > errs[1] > errs[2]


def test_encode_decode_deterministic():
    img = _gradient_rgb(24, 24)
    a = encode_jpeg(img, quality=80)
    assert a == encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(a), decode_jpeg(a))


# -------------------------------------------------------------- rejection --
def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    data = encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


def test_rejects_progressive_sof2():
    data = bytearray(encode_jpeg(_gradient(16, 16)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_rejects_multiscan_noninterleaved_sos():
    """A legal baseline stream may carry one scan PER COMPONENT
    (non-interleaved); decoding only the first would silently yield a
    Y-only image. The contract is ValueError, never a wrong image."""
    data = bytearray(encode_jpeg(_gradient_rgb(16, 16), subsampling="444"))
    i = data.find(b"\xff\xda")
    assert i > 0
    # rewrite the SOS header to reference only the first component
    # (ns=1): seglen 6+2*1=8, keep component 1's tables, Ss/Se/Ah-Al
    old_len = int.from_bytes(data[i + 2:i + 4], "big")
    comp1 = bytes(data[i + 5:i + 7])  # (cs1, td/ta)
    tail = bytes(data[i + 2 + old_len:])
    new_sos = b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" + comp1 \
        + b"\x00\x3f\x00"
    with pytest.raises(ValueError, match="multi-scan|non-interleaved"):
        decode_jpeg(bytes(data[:i]) + new_sos + tail)


def test_rejects_marker_after_first_scan():
    data = bytearray(encode_jpeg(_gradient(16, 16)))
    assert data[-2:] == b"\xff\xd9"
    # a second SOS where EOI should be = more scans follow
    forged = bytes(data[:-2]) + b"\xff\xda" + b"\x00\x08" + b"\x01\x01\x00" \
        + b"\x00\x3f\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="after the first scan"):
        decode_jpeg(forged)


def test_accepts_fill_bytes_before_eoi():
    """T.81 B.1.1.2: any run of 0xFF fill bytes may pad before a marker
    — a padded single-scan stream is legal and must decode identically
    (regression: the first multi-scan guard rejected it)."""
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, quality=95))
    assert data[-2:] == b"\xff\xd9"
    padded = bytes(data[:-2]) + b"\xff\xff\xff" + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(bytes(data)))


def test_rejects_corrupt_entropy_stream():
    data = bytearray(encode_jpeg(_gradient(32, 32), quality=95))
    # truncate the scan right after SOS: decodable header, dead stream
    i = data.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data[: i + 14]))


# ------------------------------------------------------------ integration --
def test_decode_payload_routes_jpeg():
    from rdf_diff_store_ray.functions.multimodal import decode_payload
    from rdf_diff_store_ray.functions.png import to_grayscale

    g = _gradient(32, 32)
    out = decode_payload("jpeg", encode_jpeg(g, quality=95))
    assert out.shape == (32, 32) and out.dtype == np.uint8
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2
    rgb = _gradient_rgb(16, 16)
    out2 = decode_payload("jpeg", encode_jpeg(rgb, quality=95))
    want = to_grayscale(rgb)
    assert np.abs(out2.astype(int) - want.astype(int)).mean() < 3.0


def test_multimodal_jpeg_entry_cross_codec_dedup(ray_session):
    """The registry entry end-to-end: every jpeg twin (4:4:4 / 4:2:0 /
    gray / restart variants) perceptually pairs with its fake-v1
    original and never with another id."""
    from rdf_diff_store_ray.pipelines.queries import multimodal_jpeg

    df = multimodal_jpeg("/root/testdata/sf0.001").to_pandas()
    jp = df[df["media_id"] >= 1000]
    fk = df[df["media_id"] < 1000]
    assert len(jp) == len(fk) == 36
    assert fk["keep"].all()
    assert (jp["dup_of"].to_numpy() == jp["media_id"].to_numpy() - 1000).all()
    assert (df["height"] == 32).all() and (df["width"] == 32).all()


def test_fuzz_corruption_never_crashes_unstructured():
    """Random single-byte corruptions of a valid stream either decode
    (DC/AC noise is legal) or raise ValueError — never any other
    exception. Deterministic corruption schedule."""
    import numpy as np

    from rdf_diff_store_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb(24, 40)
    data = bytearray(encode_jpeg(img, quality=85, subsampling="420",
                                 restart_interval=2))
    rng = np.random.default_rng(77)
    for _ in range(120):
        i = int(rng.integers(2, len(data)))  # keep SOI intact
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8
        except ValueError:
            pass
        finally:
            data[i] = old
