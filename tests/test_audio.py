"""Audio family: REAL WAV codec round-trips (stdlib RIFF parser — the
audio analog of the vendored PNG path), integer acoustic features on
known signals, Haitsma-Kalker fingerprint robustness, cross-codec
dedup, and the Ray actor-pool plumbing end-to-end."""

import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from rdf_diff_store_ray.functions.audio import (
    AudioFeatureStage,
    AudioFingerprintStage,
    decode_audio_payload,
    decode_wav,
    encode_fake_audio,
    encode_wav,
    synth_tone,
    synthetic_audio_table,
)


def _one(codec: str, payload: bytes, media_id: int = 0) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array([media_id], pa.int64()),
            "codec": pa.array([codec], pa.string()),
            "payload": pa.array([payload], pa.binary()),
        }
    )


def _fhash(codec: str, payload: bytes) -> int:
    return AudioFingerprintStage()(_one(codec, payload))["ahash"][0].as_py()


# ------------------------------------------------------------- codec --------
def test_wav_roundtrip_int16_exact():
    s = synth_tone(3)
    x, sr = decode_wav(encode_wav(s, 16000))
    assert sr == 16000 and x.dtype == np.float32
    np.testing.assert_array_equal((x * 32768.0).astype(np.int16), s)


def test_wav_8bit_and_stereo_decode():
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)  # 8-bit PCM is unsigned by spec
        w.setframerate(8000)
        w.writeframes(rng.integers(0, 256, 400, dtype=np.uint8).tobytes())
    x, sr = decode_wav(buf.getvalue())
    assert sr == 8000 and x.shape == (200,)  # stereo downmixed
    assert float(np.abs(x).max()) <= 1.0


def test_stereo_wav_encode_roundtrip():
    s = np.stack([synth_tone(1, 256), synth_tone(2, 256)], axis=1)
    x, sr = decode_wav(encode_wav(s, 22050))
    assert sr == 22050 and x.shape == (256,)
    np.testing.assert_allclose(
        x, s.astype(np.float32).mean(axis=1) / 32768.0, atol=1e-6
    )


def test_fake_codec_matches_wav_samples():
    s = synth_tone(7)
    xw, _ = decode_audio_payload("wav", encode_wav(s))
    xf, _ = decode_audio_payload("fake-audio-v1", encode_fake_audio(s))
    np.testing.assert_array_equal(xw, xf)


def test_compressed_codecs_are_marked_stubs():
    with pytest.raises(NotImplementedError, match="native libraries"):
        decode_audio_payload("mp3", b"\xff\xfb")


# ---------------------------------------------------------- features --------
def test_features_of_pure_sine():
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    sine = (0.5 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    f = AudioFeatureStage()(_one("wav", encode_wav(sine, sr))).to_pydict()
    assert f["n_samples"] == [sr] and f["sample_rate"] == [sr]
    assert f["duration_ms"] == [1000]
    # ZCR of a 1 kHz sine at 16 kHz = 2·f/sr = 125 crossings per 1000
    assert abs(f["zcr_milli"][0] - 125) <= 2
    # spectral centroid of a pure tone is the tone
    assert abs(f["centroid_hz"][0] - 1000) <= 30
    # RMS of a 0.5-amplitude sine = 0.5/√2 ≈ 0.354
    assert abs(f["rms_milli"][0] - 354) <= 5


def test_features_empty_clip_is_defined():
    f = AudioFeatureStage()(
        _one("wav", encode_wav(np.zeros(0, np.int16)))
    ).to_pydict()
    assert f["n_samples"] == [0] and f["rms_milli"] == [0]
    assert f["zcr_milli"] == [0] and f["centroid_hz"] == [0]


# ------------------------------------------------------- fingerprint --------
def test_fingerprint_cross_codec_identical():
    s = synth_tone(5)
    assert _fhash("wav", encode_wav(s)) == _fhash(
        "fake-audio-v1", encode_fake_audio(s)
    )


def test_fingerprint_noise_robust_and_discriminative():
    """Hamming matching contract (ISMIR 2002): low-level noise moves a
    fingerprint at most a few bits; distinct content moves it far."""
    worst = 0
    for mid in range(12):
        s = synth_tone(mid)
        h = _fhash("wav", encode_wav(s))
        rng = np.random.default_rng(100 + mid)
        noisy = np.clip(
            s.astype(np.int32) + rng.integers(-20, 21, s.shape[0]),
            -32768, 32767,
        ).astype(np.int16)
        worst = max(worst, bin(h ^ _fhash("wav", encode_wav(noisy))).count("1"))
    assert worst <= 3
    h0 = _fhash("wav", encode_wav(synth_tone(0)))
    h9 = _fhash("wav", encode_wav(synth_tone(9)))
    assert bin(h0 ^ h9).count("1") > 8


# ------------------------------------------------------ Ray plumbing --------
def test_audio_pipeline_end_to_end(ray_session):
    import ray.data as rd

    from rdf_diff_store_ray.functions.audio import (
        audio_dedup,
        audio_features,
        audio_near_pairs,
    )

    n = 12
    wav = synthetic_audio_table(n, codec="wav")
    fake = synthetic_audio_table(n, codec="fake-audio-v1", id_base=1000)
    s = synth_tone(5)
    rng = np.random.default_rng(99)
    noisy = np.clip(
        s.astype(np.int32) + rng.integers(-20, 21, s.shape[0]),
        -32768, 32767,
    ).astype(np.int16)
    extra = pa.table(
        {
            "media_id": pa.array([2000], pa.int64()),
            "media_type": pa.array(["audio"], pa.string()),
            "codec": pa.array(["wav"], pa.string()),
            "payload": pa.array([encode_wav(noisy)], pa.binary()),
        }
    ).cast(wav.schema)
    media = pa.concat_tables([wav, fake, extra])

    feats = audio_features(rd.from_arrow(media)).to_pandas()
    assert len(feats) == 2 * n + 1
    assert set(feats.columns) == {
        "media_id", "n_samples", "sample_rate", "duration_ms",
        "rms_milli", "zcr_milli", "centroid_hz",
    }
    # wav row i and fake twin 1000+i carry identical samples → identical
    # integer features
    f = feats.set_index("media_id")
    for i in range(n):
        assert (f.loc[i] == f.loc[1000 + i]).all()

    # exact dedup pairs the twins ACROSS codecs: keeper = low media_id
    dd = audio_dedup(rd.from_arrow(media)).to_pandas().set_index("media_id")
    for i in range(n):
        assert bool(dd.loc[i, "keep"])
        assert not bool(dd.loc[1000 + i, "keep"])
        assert dd.loc[1000 + i, "dup_of"] == i

    # the noisy re-record is NOT an exact dup but IS a Hamming near-pair
    pairs = audio_near_pairs(rd.from_arrow(media), max_hamming=3).to_pandas()
    near = pairs[(pairs["media_id_a"].isin([5, 1005]))
                 & (pairs["media_id_b"] == 2000)]
    assert len(near) >= 1
    if bool(dd.loc[2000, "keep"]):  # exact dedup missed it (expected
        # unless the seeded noise flipped zero bits)
        assert near["hamming"].min() >= 0


def test_multimodal_audio_query_entry(ray_session):
    from rdf_diff_store_ray.pipelines.queries import multimodal_audio

    out = multimodal_audio("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 81  # 40 wav + 40 fake twins + 1 noisy re-record
    assert out["keep"].sum() == 40 + int(out.loc[out["media_id"] == 2000,
                                                 "keep"].iloc[0])
    # every twin pair is also a Hamming-0 near pair → near_deg ≥ 1
    assert (out.loc[out["media_id"] < 2000, "near_deg"] >= 1).all()
