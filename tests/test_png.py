"""Vendored PNG codec: spec-level round-trips (every scanline filter),
corruption detection, grayscale parity, and the real-codec route through
the multimodal actor-pool stages (the branch VERDICT r3 flagged as
"tested, not trusted" — now executed without Pillow)."""

import numpy as np
import pytest

from rdf_diff_store_ray.functions.png import (
    decode_png,
    encode_png,
    to_grayscale,
)


def _img(h, w, c=None, seed=5):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_gray_every_filter(filter_type):
    arr = _img(23, 17)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("channels,seed", [(2, 7), (3, 8), (4, 9)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_multichannel_every_filter(channels, seed, filter_type):
    arr = _img(11, 13, channels, seed)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_gradients_stress_filters():
    # smooth gradients are where average/Paeth predictions actually bite
    y, x = np.mgrid[0:64, 0:48]
    arr = ((y * 3 + x * 5) % 256).astype(np.uint8)
    for f in range(5):
        np.testing.assert_array_equal(
            decode_png(encode_png(arr, filter_type=f)), arr
        )


def test_single_pixel_and_single_row():
    np.testing.assert_array_equal(
        decode_png(encode_png(np.array([[42]], np.uint8), filter_type=4)),
        [[42]],
    )
    row = _img(1, 200)
    np.testing.assert_array_equal(
        decode_png(encode_png(row, filter_type=3)), row
    )


def test_bad_signature_and_crc_and_truncation():
    data = encode_png(_img(8, 8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + data)
    corrupt = bytearray(data)
    corrupt[40] ^= 0xFF  # inside IDAT body -> CRC breaks
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(data[: len(data) // 2])


def test_out_of_scope_shapes_raise_not_implemented():
    import struct
    import zlib

    from rdf_diff_store_ray.functions.png import _SIG, _chunk

    def ihdr(depth=8, color=0, interlace=0):
        return _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0,
                                 interlace)
        )

    idat = _chunk(b"IDAT", zlib.compress(b"\x00" * 20))
    iend = _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_SIG + ihdr(depth=16) + idat + iend)
    with pytest.raises(NotImplementedError, match="palette|color type"):
        decode_png(_SIG + ihdr(color=3) + idat + iend)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(_SIG + ihdr(interlace=1) + idat + iend)
    with pytest.raises(ValueError, match="filter_type"):
        encode_png(_img(4, 4), filter_type=5)


def test_grayscale_conversion_pil_constants():
    rgb = np.zeros((1, 3, 3), np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (0, 255, 0)
    rgb[0, 2] = (0, 0, 255)
    gray = to_grayscale(rgb)
    # ITU-R 601-2 with PIL's fixed-point constants and rounding
    assert gray[0].tolist() == [76, 150, 29]
    # gray+alpha drops alpha; 2-D passes through
    ga = _img(4, 4, 2)
    np.testing.assert_array_equal(to_grayscale(ga), ga[:, :, 0])
    g = _img(4, 4)
    assert to_grayscale(g) is g


def test_decode_payload_routes_png_without_pil():
    from rdf_diff_store_ray.functions.multimodal import (
        decode_payload,
        pil_available,
    )

    arr = _img(16, 12)
    out = decode_payload("png", encode_png(arr, filter_type=2))
    np.testing.assert_array_equal(out, arr)
    # RGB payload comes back as luma, same shape contract as PIL's
    # convert("L")
    rgb = _img(10, 10, 3)
    out = decode_payload("png", encode_png(rgb))
    np.testing.assert_array_equal(out, to_grayscale(rgb))
    if not pil_available():
        # jpeg is now a vendored real codec; webp stays the PIL stub
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_payload("webp", b"RIFF....WEBP")
        with pytest.raises(ValueError, match="truncated|SOS"):
            decode_payload("jpeg", b"\xff\xd8\xff\xd9")


def test_real_png_payloads_through_actor_stages(ray_session):
    """The full Ray-side chain — decode features + perceptual dedup —
    over REAL PNG payloads, mixed with fake-v1 rows carrying the same
    pixels: aHash must agree across codecs, so the mixed-codec pairs
    collapse as perceptual duplicates."""
    import pyarrow as pa
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import (
        decode_features,
        encode_fake_image,
        media_dedup,
        synthetic_media_table,
    )

    fake = synthetic_media_table(n=6, h=32, w=32)
    pixels = [
        np.frombuffer(encode_fake_image(i, 32, 32)[13:], np.uint8).reshape(
            32, 32
        )
        for i in range(6)
    ]
    png = pa.table(
        {
            "media_id": pa.array(range(100, 106), pa.int64()),
            "media_type": pa.array(["image"] * 6, pa.string()),
            "codec": pa.array(["png"] * 6, pa.string()),
            "payload": pa.array(
                [encode_png(p, filter_type=i % 5)
                 for i, p in enumerate(pixels)],
                pa.binary(),
            ),
        }
    ).cast(fake.schema)
    media = pa.concat_tables([fake, png])

    feats = decode_features(rd.from_arrow(media)).to_pandas()
    assert len(feats) == 12
    assert set(feats["height"]) == {32} and set(feats["width"]) == {32}

    out = (
        media_dedup(rd.from_arrow(media))
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    # every png row is a perceptual duplicate of its fake-v1 twin
    dup = out[out["media_id"] >= 100]
    assert not dup["keep"].any()
    assert dup["dup_of"].tolist() == list(range(6))
    assert out[out["media_id"] < 100]["keep"].all()
