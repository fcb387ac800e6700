"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The image/audio codec libraries are not available in this environment, so
the *decode kernels* come in three tiers:

- REAL vendored codecs so the real-codec branch executes and is
  tested, not trusted: PNG (:mod:`.png`, pure numpy + stdlib zlib; PIL
  takes over transparently when installed), baseline JPEG
  (:mod:`.jpeg`, T.81 SOF0 incl. 4:2:0 and restart markers), WAV
  (:mod:`.audio`, stdlib RIFF), and the YUV4MPEG2 video container
  (:mod:`.y4m`);
- a clearly-marked :class:`NotImplementedError` branch for the codecs
  that genuinely need native libraries (``webp``/``bmp``, compressed
  video/audio containers); and
- a deterministic ``fake-v1`` codec (self-describing header) used by
  benchmarks so the **Ray-side plumbing is real**: schemas, actor-pool
  signatures, per-batch memory behavior (small batches for large binary
  rows), and output layout are all exercised for real.

Stage shapes mirror a production media pipeline:
``decode → resize/frame-sample → feature-extract``, each an actor-pool
``map_batches`` class with setup in ``__init__``. Batches stay in
``pyarrow`` format end-to-end (binary/list columns don't round-trip
pandas cleanly).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("codec", pa.string()),  # "fake-v1" | "jpeg" | ...
        ("payload", pa.binary()),
    ]
)

_FAKE_MAGIC = b"FAKE1"

try:  # route real image codecs through PIL when the library exists
    from PIL import Image as _PIL_Image  # pragma: no cover (absent here)
except ImportError:  # pragma: no cover
    _PIL_Image = None


def pil_available() -> bool:
    return _PIL_Image is not None


def encode_fake_image(media_id: int, h: int, w: int, seed: int = 3) -> bytes:
    """Deterministic synthetic payload: header (h, w) + u8 pixel bytes."""
    rng = np.random.default_rng(seed * 1_000_003 + media_id)
    pixels = rng.integers(0, 256, size=h * w, dtype=np.uint8)
    return _FAKE_MAGIC + struct.pack("<II", h, w) + pixels.tobytes()


_FAKE_VIDEO_MAGIC = b"FAKEV"


def fake_video_frames(media_id: int, n_frames: int, h: int, w: int,
                      seed: int = 3) -> np.ndarray:
    """The deterministic synthetic frame stack ``(n, h, w)`` u8 shared
    by every video codec's synthetic table — encoding the SAME frames
    under different containers is what lets the cross-codec dedup
    parity tests exist."""
    rng = np.random.default_rng(seed * 2_000_003 + media_id)
    return rng.integers(0, 256, size=(n_frames, h, w), dtype=np.uint8)


def encode_fake_video(media_id: int, n_frames: int, h: int, w: int,
                      seed: int = 3) -> bytes:
    """Deterministic synthetic video: header (n, h, w) + n grayscale
    frames of u8 pixels."""
    frames = fake_video_frames(media_id, n_frames, h, w, seed)
    return (_FAKE_VIDEO_MAGIC + struct.pack("<III", n_frames, h, w)
            + frames.tobytes())


def decode_video_payload(codec: str, payload: bytes) -> np.ndarray:
    """(n_frames, h, w) u8 luma array. ``y4m`` is a REAL container
    (YUV4MPEG2, :mod:`.y4m` — pure-numpy parser); ``fake-video-v1`` is
    the deterministic test codec; compressed containers (mp4/webm) need
    ffmpeg-class libraries absent here."""
    if codec == "fake-video-v1":
        if payload[:5] != _FAKE_VIDEO_MAGIC:
            raise ValueError("corrupt fake-video-v1 payload (bad magic)")
        n, h, w = struct.unpack("<III", payload[5:17])
        return np.frombuffer(payload[17:], dtype=np.uint8).reshape(n, h, w)
    if codec == "y4m":
        from .y4m import decode_y4m

        return decode_y4m(payload)[0]
    raise NotImplementedError(
        f"video codec {codec!r} requires ffmpeg-class libraries not "
        "present in this environment; use codec='y4m' (vendored "
        "YUV4MPEG2 parser) or 'fake-video-v1' (deterministic test codec)"
    )


def decode_payload(codec: str, payload: bytes) -> np.ndarray:
    if codec in ("fake-video-v1", "y4m"):  # (n, h, w) luma stack
        return decode_video_payload(codec, payload)
    if codec == "fake-v1":
        if payload[:5] != _FAKE_MAGIC:
            raise ValueError("corrupt fake-v1 payload (bad magic)")
        h, w = struct.unpack("<II", payload[5:13])
        return np.frombuffer(payload[13:], dtype=np.uint8).reshape(h, w)
    if codec in ("jpeg", "png", "bmp", "webp"):
        if _PIL_Image is not None:
            import io

            img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.uint8)
        if codec == "png":
            # real codec, vendored: pure-numpy PNG decode + the same
            # ITU-R 601-2 luma constants PIL uses, so a later Pillow
            # install changes nothing observable (functions/png.py)
            from .png import decode_png, to_grayscale

            return to_grayscale(decode_png(payload))
        if codec == "jpeg":
            # real codec, vendored: baseline T.81 decode
            # (functions/jpeg.py). JPEG is lossy, so unlike PNG a later
            # Pillow install may differ sub-LSB (IDCT/upsampling
            # rounding); perceptual consumers tolerate that by design.
            from .jpeg import decode_jpeg
            from .png import to_grayscale

            arr = decode_jpeg(payload)
            return arr if arr.ndim == 2 else to_grayscale(arr)
        if codec == "bmp":
            # real codec, vendored: uncompressed Windows DIB decode
            # (functions/bmp.py — lossless, PIL-parity by layout)
            from .bmp import decode_bmp
            from .png import to_grayscale

            arr = decode_bmp(payload)
            return arr if arr.ndim == 2 else to_grayscale(arr)
        # STUB: webp decode needs a VP8 entropy decoder (PIL/libwebp),
        # not present in this environment. The call signature and batch
        # plumbing are final; installing Pillow lights this path up
        # with no code change (detected at import).
        raise NotImplementedError(
            f"codec {codec!r} requires Pillow, which is not installed; "
            "use codec='png'/'jpeg'/'bmp' (vendored decoders) or "
            "'fake-v1' (deterministic test codec)"
        )
    raise NotImplementedError(
        f"codec {codec!r} is not supported (audio/video decode requires "
        "ffmpeg-class libraries not present in this environment)"
    )


class DecodeStage:
    """payload → decoded dims + grayscale histogram feature (16 bins).

    Large-binary guidance: callers should use a small ``batch_size``
    (e.g. 64) so batch × concurrency fits worker heap; payload columns
    stream zero-copy from the object store.
    """

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights, widths, hists = [], [], []
        for codec, payload in zip(
            batch["codec"].to_pylist(), batch["payload"].to_pylist()
        ):
            arr = decode_payload(codec, payload)
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            hist, _ = np.histogram(arr, bins=self.edges)
            hists.append((hist / max(1, arr.size)).astype(np.float32))
        cols = {"media_id": batch["media_id"]}
        if "frame_id" in batch.column_names:  # chained after frame sampling
            cols["frame_id"] = batch["frame_id"]
        cols.update(
            {
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "features": pa.array(
                    [h.tolist() for h in hists], pa.list_(pa.float32())
                ),
            }
        )
        return pa.table(cols)


class ResizeStage:
    """Nearest-neighbor resize on decoded fake payloads → re-encoded
    payload (demonstrates transform-in-place layout)."""

    def __init__(self, out_h: int = 16, out_w: int = 16):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for codec, payload in zip(
            batch["codec"].to_pylist(), batch["payload"].to_pylist()
        ):
            arr = decode_payload(codec, payload)
            ys = (np.arange(self.out_h) * arr.shape[0] // self.out_h).clip(
                0, arr.shape[0] - 1
            )
            xs = (np.arange(self.out_w) * arr.shape[1] // self.out_w).clip(
                0, arr.shape[1] - 1
            )
            small = arr[np.ix_(ys, xs)]
            payloads.append(
                _FAKE_MAGIC
                + struct.pack("<II", self.out_h, self.out_w)
                + small.tobytes()
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "codec": batch["codec"],
                "payload": pa.array(payloads, pa.binary()),
            }
        ).cast(MEDIA_SCHEMA)


class FrameSampleStage:
    """Video → every k-th frame re-encoded as an image payload row (one
    input row explodes into ``ceil(n_frames / stride)`` output rows — a
    flat-map-shaped actor stage). ``frame_id`` keys the output so a
    downstream :class:`DecodeStage` can feature-extract per frame.

    Large-binary guidance as for :class:`DecodeStage`: small
    ``batch_size``, payload columns stream zero-copy."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_ids, payloads = [], [], []
        for mid, codec, payload in zip(
            batch["media_id"].to_pylist(),
            batch["codec"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            frames = decode_video_payload(codec, payload)
            for fi in range(0, frames.shape[0], self.stride):
                f = frames[fi]
                media_ids.append(mid)
                frame_ids.append(fi)
                payloads.append(
                    _FAKE_MAGIC
                    + struct.pack("<II", f.shape[0], f.shape[1])
                    + f.tobytes()
                )
        n = len(media_ids)
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "frame_id": pa.array(frame_ids, pa.int32()),
                "media_type": pa.array(["image"] * n, pa.string()),
                "codec": pa.array(["fake-v1"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def sample_frames(video_ds, stride: int = 4, batch_size: int = 16,
                  concurrency=(1, 4)):
    """Actor-pool frame sampling over a video table (``MEDIA_SCHEMA``
    with ``media_type='video'``); output is image-typed rows chainable
    into :func:`decode_features`."""
    return video_ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,  # video rows are the largest payloads
        concurrency=concurrency,
    )


def synthetic_video_table(n: int, n_frames: int = 16, h: int = 16,
                          w: int = 16, seed: int = 3,
                          codec: str = "fake-video-v1",
                          id_base: int = 0) -> pa.Table:
    """Synthetic video rows under any supported container. The frames
    for a given ``(media_id - id_base, seed)`` are identical across
    codecs (:func:`fake_video_frames`), so tables produced with
    different ``codec`` values are perceptual twins."""
    if codec == "y4m":
        from .y4m import encode_y4m

        payloads = [
            encode_y4m(fake_video_frames(i, n_frames, h, w, seed))
            for i in range(n)
        ]
    elif codec == "fake-video-v1":
        payloads = [encode_fake_video(i, n_frames, h, w, seed)
                    for i in range(n)]
    else:
        raise NotImplementedError(f"no synthetic encoder for {codec!r}")
    return pa.table(
        {
            "media_id": pa.array(range(id_base, id_base + n), pa.int64()),
            "media_type": pa.array(["video"] * n, pa.string()),
            "codec": pa.array([codec] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    ).cast(MEDIA_SCHEMA)


def synthetic_media_table(n: int, h: int = 32, w: int = 32, seed: int = 3) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "codec": pa.array(["fake-v1"] * n, pa.string()),
            "payload": pa.array(
                [encode_fake_image(i, h, w, seed) for i in range(n)], pa.binary()
            ),
        }
    ).cast(MEDIA_SCHEMA)


def decode_features(media_ds, batch_size: int = 64, concurrency=(1, 4)):
    return media_ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,  # small on purpose: large binary rows
        concurrency=concurrency,
    )


class AHashStage:
    """payload → 64-bit average-hash (aHash): mean-pool the decoded
    frame to 8×8, threshold at the mean, pack to one uint64 — the
    classic perceptual fingerprint (robust to small pixel noise,
    re-encoding, minor crops). Same actor-pool contract as
    :class:`DecodeStage`; small batches for large binary rows."""

    def __init__(self, grid: int = 8):
        self.grid = grid
        self.weights = np.left_shift(
            np.uint64(1), np.arange(grid * grid, dtype=np.uint64)
        )

    def _pool(self, arr: np.ndarray) -> np.ndarray:
        g = self.grid
        h, w = arr.shape[:2]
        # crop to a multiple of the grid, then block-mean — deterministic
        # for any input size ≥ g×g
        hh, ww = max(h // g, 1) * g, max(w // g, 1) * g
        a = arr[:hh, :ww].astype(np.float64)
        return a.reshape(g, hh // g, g, ww // g).mean(axis=(1, 3))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for codec, payload in zip(
            batch["codec"].to_pylist(), batch["payload"].to_pylist()
        ):
            arr = decode_payload(codec, payload)
            if arr.ndim == 3:  # video: hash the first frame
                arr = arr[0]
            pooled = self._pool(arr)
            bits = (pooled > pooled.mean()).reshape(-1)
            hashes.append(int((self.weights * bits).sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "ahash": pa.array(hashes, pa.uint64()),
            }
        )


def media_dedup(media_ds, batch_size: int = 64, concurrency=(1, 4),
                hash_stage=AHashStage):
    """Perceptual dedup over a media Dataset: fingerprint each payload
    (``hash_stage``: image aHash by default, the audio Haitsma-Kalker
    hash via :func:`.audio.audio_dedup`), then one bounded
    ``groupby(ahash)`` — colliding hashes form a duplicate group whose
    lowest ``media_id`` is the keeper. Returns
    ``(media_id, ahash, keep, dup_of)`` with ``dup_of = -1`` on kept
    rows. The shuffle carries (media_id, ahash) pairs only — payloads
    never move after the hash stage — and the hash key is folded into a
    BOUNDED partition count (one vectorized group pass per partition;
    never one Ray group per distinct hash)."""
    import pandas as pd

    hashed = media_ds.map_batches(
        hash_stage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    num_partitions = 64

    def add_pid(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pid = pc.cast(
            pc.bit_wise_and(batch["ahash"],
                            pa.scalar(num_partitions - 1, pa.uint64())),
            pa.int32(),
        )
        return batch.append_column("md_pid", pid)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ahash", "media_id"], kind="stable")
        keeper = g.groupby("ahash", sort=False)["media_id"].transform("min")
        g = g.assign(
            keep=g["media_id"] == keeper,
            dup_of=np.where(g["media_id"] == keeper, -1, keeper),
        )
        return g[["media_id", "ahash", "keep", "dup_of"]]

    return (
        hashed.map_batches(add_pid, batch_format="pyarrow")
        .groupby("md_pid")
        .map_groups(resolve, batch_format="pandas")
    )
