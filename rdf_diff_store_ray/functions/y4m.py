"""YUV4MPEG2 (``.y4m``) codec — a real video *container* in pure numpy.

Y4M is the uncompressed interchange format of the mjpegtools suite and
ffmpeg's ``yuv4mpegpipe`` muxer (public spec: ``yuv4mpeg(5)`` man page;
``ffmpeg -f yuv4mpegpipe`` emits exactly these bytes). Its layout:

- stream header: ``YUV4MPEG2`` then space-separated tagged parameters
  (``W<width> H<height> F<num>:<den> I<p|t|b|m> A<num>:<den>
  C<colorspace> X<comment>``) terminated by ``\\n``;
- each frame: ``FRAME`` plus optional space-separated parameters,
  ``\\n``, then raw planar YCbCr data.

Plane sizes per colorspace: ``C420*`` (jpeg/mpeg2/paldv differ only in
chroma siting metadata) = Y ``w*h`` + Cb,Cr ``(w/2)*(h/2)`` each;
``C422`` = Y + two ``(w/2)*h``; ``C444`` = three ``w*h``; ``Cmono`` =
Y only.

The decode side returns the **luma plane stack** — this engine's media
pipeline (frame sampling, perceptual aHash, histogram features) is
luma-based, exactly like the PNG path's ITU-R 601-2 grayscale
(:mod:`.png`). Chroma is validated and skipped, not lost silently: the
returned metadata records the colorspace so a chroma-aware stage knows
what it is discarding.

No ffmpeg-class *compressed* codecs (H.264/VP9) exist in this
environment — those remain the documented :class:`NotImplementedError`
branch in :func:`.multimodal.decode_video_payload`. Y4M makes the
real-container branch itself executable and tested.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"
_FRAME = b"FRAME"

# colorspace tag → (chroma_x_div, chroma_y_div); None = no chroma
_COLORSPACES = {
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _plane_sizes(w: int, h: int, colorspace: str) -> list[int]:
    sub = _COLORSPACES[colorspace]
    if sub is None:
        return [w * h]
    cx, cy = sub
    if w % cx or h % cy:
        raise ValueError(
            f"C{colorspace} requires dimensions divisible by "
            f"({cx},{cy}); got {w}x{h}"
        )
    return [w * h, (w // cx) * (h // cy), (w // cx) * (h // cy)]


def encode_y4m(
    frames: np.ndarray,
    *,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420jpeg",
) -> bytes:
    """Grayscale frames ``(n, h, w)`` u8 → Y4M bytes. The luma plane is
    the frame; chroma planes (when the colorspace has them) are written
    as neutral 128, the standard encoding of a grayscale signal in
    YCbCr. ``colorspace='mono'`` omits chroma entirely."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"frames must be (n, h, w); got {frames.shape}")
    n, h, w = frames.shape
    sizes = _plane_sizes(w, h, colorspace)  # validates dims early
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n".encode()
    )
    chroma = b"\x80" * sum(sizes[1:])
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, dict]:
    """Y4M bytes → ``(luma_frames (n, h, w) u8, meta)``. ``meta`` holds
    ``width height fps interlace aspect colorspace n_frames``. Raises
    ``ValueError`` on bad magic / malformed or truncated frames and
    ``NotImplementedError`` on colorspaces outside the table above."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated YUV4MPEG2 stream header")
    meta: dict = {"fps": (25, 1), "interlace": "?", "aspect": (0, 0),
                  "colorspace": "420jpeg"}
    for tok in payload[len(_MAGIC):nl].decode("ascii", "replace").split():
        tag, val = tok[0], tok[1:]
        if tag == "W":
            meta["width"] = int(val)
        elif tag == "H":
            meta["height"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            meta["fps"] = (int(num), int(den))
        elif tag == "I":
            meta["interlace"] = val
        elif tag == "A":
            num, den = val.split(":")
            meta["aspect"] = (int(num), int(den))
        elif tag == "C":
            meta["colorspace"] = val
        # X<comment> and unknown tags are skipped per spec
    if "width" not in meta or "height" not in meta:
        raise ValueError("YUV4MPEG2 header missing W or H")
    cs = meta["colorspace"]
    if cs not in _COLORSPACES:
        raise NotImplementedError(
            f"Y4M colorspace C{cs} not supported (have "
            f"{sorted('C' + c for c in _COLORSPACES)})"
        )
    w, h = meta["width"], meta["height"]
    sizes = _plane_sizes(w, h, cs)
    frame_bytes = sum(sizes)
    buf = memoryview(payload)
    pos = nl + 1
    lumas = []
    while pos < len(buf):
        if bytes(buf[pos:pos + len(_FRAME)]) != _FRAME:
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1  # frame params (if any) carry no layout changes
        if pos + frame_bytes > len(buf):
            raise ValueError(
                f"truncated frame: need {frame_bytes} bytes at {pos}, "
                f"have {len(buf) - pos}"
            )
        lumas.append(
            np.frombuffer(buf[pos:pos + sizes[0]], np.uint8).reshape(h, w)
        )
        pos += frame_bytes
    if not lumas:
        return np.zeros((0, h, w), np.uint8), {**meta, "n_frames": 0}
    return np.stack(lumas), {**meta, "n_frames": len(lumas)}
