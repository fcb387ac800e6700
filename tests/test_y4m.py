"""YUV4MPEG2 codec: spec-bytes parity, roundtrips, malformed streams,
and the real-container video path through the Ray media stages."""

import numpy as np
import pyarrow as pa
import pytest

from rdf_diff_store_ray.functions.multimodal import (
    AHashStage,
    FrameSampleStage,
    decode_video_payload,
    fake_video_frames,
    synthetic_video_table,
)
from rdf_diff_store_ray.functions.y4m import decode_y4m, encode_y4m


def test_decode_spec_bytes_mono():
    """Hand-written stream straight from the yuv4mpeg(5) layout."""
    payload = (
        b"YUV4MPEG2 W3 H2 F30:1 Ip A1:1 Cmono\n"
        b"FRAME\n" + bytes([1, 2, 3, 4, 5, 6]) +
        b"FRAME\n" + bytes([7, 8, 9, 10, 11, 12])
    )
    frames, meta = decode_y4m(payload)
    assert frames.shape == (2, 2, 3)
    assert frames[0].tolist() == [[1, 2, 3], [4, 5, 6]]
    assert frames[1].tolist() == [[7, 8, 9], [10, 11, 12]]
    assert meta["fps"] == (30, 1) and meta["colorspace"] == "mono"
    assert meta["n_frames"] == 2 and meta["interlace"] == "p"


def test_decode_spec_bytes_420_with_frame_params():
    """C420jpeg plane sizes (Y=w*h, Cb=Cr=w/2*h/2) and a FRAME header
    carrying parameters, both per spec."""
    y = bytes(range(8))               # 4x2 luma
    cbcr = b"\x80" * 4                # Cb and Cr, 2x1 each
    payload = (
        b"YUV4MPEG2 W4 H2 F25:1 C420jpeg Xcomment\n"
        b"FRAME Xinterlaced_bottom_first\n" + y + cbcr
    )
    frames, meta = decode_y4m(payload)
    assert frames.shape == (1, 2, 4)
    assert frames[0].reshape(-1).tolist() == list(range(8))
    assert meta["width"] == 4 and meta["height"] == 2


@pytest.mark.parametrize("colorspace", ["420jpeg", "420mpeg2", "422",
                                        "444", "mono"])
def test_roundtrip(colorspace):
    frames = fake_video_frames(5, n_frames=3, h=8, w=6)
    payload = encode_y4m(frames, fps=(24, 1), colorspace=colorspace)
    got, meta = decode_y4m(payload)
    assert np.array_equal(got, frames)
    assert meta["fps"] == (24, 1)
    assert meta["colorspace"] == colorspace
    assert meta["n_frames"] == 3


def test_odd_dimensions_rejected_for_subsampled():
    frames = np.zeros((1, 3, 4), np.uint8)
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(frames, colorspace="420jpeg")
    encode_y4m(frames, colorspace="mono")  # mono is fine
    # 422 subsamples x only: odd height OK, odd width not
    encode_y4m(frames, colorspace="422")
    with pytest.raises(ValueError, match="divisible"):
        encode_y4m(np.zeros((1, 2, 5), np.uint8), colorspace="422")


def test_malformed_streams():
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="unterminated"):
        decode_y4m(b"YUV4MPEG2 W2 H2")
    with pytest.raises(ValueError, match="missing W or H"):
        decode_y4m(b"YUV4MPEG2 F25:1\n")
    good = encode_y4m(np.zeros((2, 2, 2), np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-1])
    with pytest.raises(ValueError, match="FRAME marker"):
        # replace the second frame's FRAME marker with junk
        decode_y4m(good[:-(2 * 2 + 6)] + b"JUNK!\n" + good[-(2 * 2):])
    with pytest.raises(NotImplementedError, match="C411"):
        decode_y4m(b"YUV4MPEG2 W4 H2 C411\n")


def test_zero_frames_stream():
    frames, meta = decode_y4m(b"YUV4MPEG2 W4 H2 Cmono\n")
    assert frames.shape == (0, 2, 4) and meta["n_frames"] == 0


def test_decode_video_payload_routes_y4m():
    frames = fake_video_frames(1, 4, 8, 8)
    got = decode_video_payload("y4m", encode_y4m(frames))
    assert np.array_equal(got, frames)
    with pytest.raises(NotImplementedError, match="mp4"):
        decode_video_payload("mp4", b"....")


def test_cross_codec_frame_sample_parity():
    """The SAME frames encoded as fake-video-v1 and as Y4M must sample
    to identical image payloads — the container is transparent."""
    fake = synthetic_video_table(4, n_frames=8, h=16, w=16)
    y4m = synthetic_video_table(4, n_frames=8, h=16, w=16, codec="y4m")
    stage = FrameSampleStage(stride=3)
    a, b = stage(fake), stage(y4m)
    assert a.equals(b)
    assert a["frame_id"].to_pylist() == [0, 3, 6] * 4


def test_video_dedup_pairs_across_codecs(ray_session):
    """Perceptual dedup over a mixed-codec video table: Y4M twins of
    the fake-codec rows must land in the same hash group."""
    import ray.data as rd

    from rdf_diff_store_ray.functions.multimodal import media_dedup

    fake = synthetic_video_table(6, n_frames=4, h=16, w=16)
    twins = synthetic_video_table(6, n_frames=4, h=16, w=16,
                                  codec="y4m", id_base=100)
    out = media_dedup(
        rd.from_arrow(pa.concat_tables([fake, twins])),
        hash_stage=AHashStage,
    ).to_pandas().sort_values("media_id", ignore_index=True)
    assert len(out) == 12
    low = out[out["media_id"] < 100]
    high = out[out["media_id"] >= 100]
    assert low["keep"].all()
    assert not high["keep"].any()
    assert (high["dup_of"].to_numpy() == high["media_id"].to_numpy() - 100).all()
