"""Vendored baseline JPEG codec (ITU-T T.81 / JFIF), pure numpy.

The last real-codec gap in the multimodal family (PNG landed in
:mod:`.png`, WAV in :mod:`.audio`, YUV4MPEG2 in :mod:`.y4m`): the
environment has no Pillow, so the ``codec='jpeg'`` branch of
:func:`.multimodal.decode_payload` had never executed. This module
implements the baseline subset from the public spec:

- **decoder**: baseline sequential DCT (SOF0), 8-bit precision,
  grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart
  markers (DRI/RSTn), 0xFF00 byte stuffing. Progressive (SOF2),
  arithmetic coding (SOF9+), hierarchical and 12-bit streams are out
  of scope and raise ``ValueError`` — never a wrong image.
- **encoder**: baseline grayscale / YCbCr 4:4:4 with the Annex K
  example quantization tables (quality-scaled the libjpeg way) and
  Annex K typical Huffman tables, so decode(encode(x)) round-trips
  within the quantization error bound tested in ``tests/test_jpeg.py``.

JPEG is lossy: unlike the PNG path, bit-exact parity with a later
Pillow install is NOT promised (IDCT/upsampling rounding differs per
implementation); downstream consumers (perceptual ahash dedup,
histogram features) tolerate sub-LSB differences by construction.

Reference behavior parity target: the reference engine treats media
payloads as opaque bytes (rdf-diff-store stores no media); this codec
exists for the multimodal operator family mandated by the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables ---
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# T.81 Annex K.1 example quantization tables
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
     0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
     0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
     0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
     0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
     0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
     0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa],
)

# 8x8 DCT-II orthonormal basis (separable transform as two matmuls)
_k = np.arange(8)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_C[0, :] *= 1 / np.sqrt(2)


# ------------------------------------------------------- canonical Huffman --
class _HuffTable:
    """Canonical Huffman decode per T.81 F.2.2.3 (MINCODE/MAXCODE/VALPTR)."""

    def __init__(self, bits, vals):
        if sum(bits) != len(vals):
            raise ValueError("corrupt Huffman table (BITS/HUFFVAL mismatch)")
        self.vals = np.asarray(vals, dtype=np.int64)
        self.mincode = np.zeros(17, dtype=np.int64)
        self.maxcode = np.full(17, -1, dtype=np.int64)
        self.valptr = np.zeros(17, dtype=np.int64)
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1

    def encode_map(self):
        """symbol -> (code, length) for the encoder."""
        out = {}
        for length in range(1, 17):
            n = self.maxcode[length] - self.mincode[length] + 1 \
                if self.maxcode[length] >= 0 else 0
            for i in range(n):
                out[int(self.vals[self.valptr[length] + i])] = (
                    int(self.mincode[length] + i), length)
        return out


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment whose 0xFF00
    stuffing has already been removed."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0
        self.n = len(self.bits)

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("truncated JPEG entropy-coded segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise ValueError("truncated JPEG entropy-coded segment")
        chunk = self.bits[self.pos:self.pos + k]
        self.pos += k
        return int(chunk @ (1 << np.arange(k - 1, -1, -1, dtype=np.int64)))

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.maxcode[length] >= 0 and code <= table.maxcode[length] \
                    and code >= table.mincode[length]:
                return int(table.vals[
                    table.valptr[length] + code - table.mincode[length]])
        raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_2d(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples
    (level-shifted back by +128), via the separable orthonormal basis."""
    s = np.einsum("ij,njk,kl->nil", _DCT_C.T, blocks.astype(np.float64),
                  _DCT_C)
    return np.clip(np.round(s + 128.0), 0, 255).astype(np.uint8)


def _fdct_2d(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial u8 -> (n, 8, 8) float DCT coefficients."""
    x = blocks.astype(np.float64) - 128.0
    return np.einsum("ij,njk,kl->nil", _DCT_C, x, _DCT_C.T)


# ----------------------------------------------------------------- decoder --
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) u8 grayscale or (h, w, 3) u8 RGB.
    Raises ``ValueError`` on anything outside the baseline subset or on
    structural corruption."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                if i + 65 > len(seg):
                    raise ValueError("truncated DQT")
                tbl = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[0:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} (progressive/extended/"
                "arithmetic) is outside the baseline subset")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame["comps"]):
                # baseline-sequential with ns < nf is a legal multi-scan
                # (non-interleaved) stream; decoding only the first scan
                # would silently yield a partial (e.g. Y-only) image
                raise ValueError(
                    "multi-scan (non-interleaved) baseline JPEG is "
                    "outside the supported subset")
            ecs_start = pos + seglen
            return _decode_scan(data, ecs_start, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _split_ecs(data: bytes, start: int):
    """Entropy-coded data from ``start``: split on RSTn, strip stuffing.
    Returns (segments, end_pos)."""
    segs, cur = [], bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break  # EOI or next marker
    segs.append(bytes(cur))
    return segs, i


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError("unsupported JPEG subsampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    n_mcus = mcus_x * mcus_y

    segs, ecs_end = _split_ecs(data, start)
    # the single interleaved scan must be the LAST scan: anything but EOI
    # after the entropy-coded data means more scans/markers follow and a
    # first-scan-only decode would be a wrong image, not a decoded one.
    # T.81 B.1.1.2 fill bytes (any run of 0xFF before the marker code)
    # are legal padding and skip first.
    j = ecs_end
    while j + 1 < len(data) and data[j] == 0xFF and data[j + 1] == 0xFF:
        j += 1
    if j + 1 < len(data) and data[j] == 0xFF \
            and data[j + 1] not in (0xD9,):
        raise ValueError(
            f"JPEG marker 0x{data[j + 1]:02X} after the first scan "
            "(multi-scan stream) is outside the supported subset")
    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes.append(np.zeros((bh * bw, 8, 8), dtype=np.int64))

    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = [0] * len(comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segs[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (c, td, ta) in enumerate(scan):
            dct = huff_dc.get(td)
            act = huff_ac.get(ta)
            if dct is None or act is None:
                raise ValueError("SOS references missing Huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    t = reader.decode_symbol(dct)
                    if t > 11:
                        raise ValueError("invalid DC category")
                    diff = _extend(reader.read_bits(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    bw = mcus_x * c["h"]
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    # stored in zigzag order; unzigzagged in the
                    # vectorized dequant pass below
                    planes[ci][row * bw + col] = coef.reshape(8, 8)

    # dequantize + inverse zigzag + IDCT per component, assemble planes
    out_planes = []
    for ci, (c, _, _) in enumerate(scan):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("SOF references missing quant table")
        flat = planes[ci].reshape(-1, 64)[:, _UNZIGZAG]
        deq = (flat.reshape(-1, 8, 8) * q[None, :, :])
        pix = _idct_2d(deq)
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        plane = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return out_planes[0]
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count "
                         f"{len(out_planes)}")
    y = out_planes[0].astype(np.float64)
    cb = out_planes[1].astype(np.float64) - 128.0
    cr = out_planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encoder --
def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scaling rule (jcparam.c semantics)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255)


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int,
                  dc_map: dict, ac_map: dict) -> int:
    zz = coef.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _csize(diff)
    code, length = dc_map[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0 and k <= last_nz:
            run += 1
            continue
        if k > last_nz:
            break
        while run > 15:
            code, length = ac_map[0xF0]
            bw.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = ac_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]  # EOB
        bw.write(code, length)
    return dc


def _blocks_grid(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """u8 (H, W) edge-padded to exactly (bh*8, bw_*8) -> (bh*bw_, 8, 8)
    blocks in raster order."""
    h, w = plane.shape
    pad = np.pad(plane, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    return pad.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) u8 grayscale or (h, w, 3) u8 RGB -> baseline JFIF bytes
    (Annex K tables quality-scaled). ``subsampling`` is ``'444'`` or
    ``'420'`` (chroma box-averaged 2x2); ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (what lets the decoder's
    restart path be exercised without external fixtures)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects u8 (h,w) or (h,w,3)")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = (not gray) and subsampling == "420"

    qy = _quality_scale(_QUANT_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(_QUANT_CHROMA, quality).reshape(8, 8)
    if gray:
        planes = [img]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
                  for p in (y, cb, cr)]
        if sub420:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            ds = []
            for p in planes[1:]:
                pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                d = pad.reshape(ph // 2, 2, pw // 2, 2).mean(
                    axis=(1, 3))
                ds.append(np.clip(np.round(d), 0, 255).astype(np.uint8))
            planes = [planes[0]] + ds

    # component geometry: (sampling h, v, quant table id)
    nc = 1 if gray else 3
    if gray:
        factors = [(1, 1, 0)]
    elif sub420:
        factors = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
    else:
        factors = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_tabs = [_HuffTable(*_HUFF_DC_LUMA), _HuffTable(*_HUFF_DC_CHROMA)]
    ac_tabs = [_HuffTable(*_HUFF_AC_LUMA), _HuffTable(*_HUFF_AC_CHROMA)]
    dc_maps = [t.encode_map() for t in dc_tabs]
    ac_maps = [t.encode_map() for t in ac_tabs]

    comp_blocks, comp_bw = [], []
    for p, (fh, fv, tq) in zip(planes, factors):
        bh, bw_ = mcus_y * fv, mcus_x * fh
        q = qy if tq == 0 else qc
        coefs = _fdct_2d(_blocks_grid(p, bh, bw_))
        comp_blocks.append(np.round(coefs / q[None, :, :]).astype(np.int64))
        comp_bw.append(bw_)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in enumerate([qy] if gray else [qy, qc]):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz.tobytes()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (fh, fv, tq) in enumerate(factors):
        out += bytes([ci + 1, (fh << 4) | fv, tq])
    tabs = [(0, _HUFF_DC_LUMA), (16, _HUFF_AC_LUMA)] if gray else [
        (0, _HUFF_DC_LUMA), (16, _HUFF_AC_LUMA),
        (1, _HUFF_DC_CHROMA), (17, _HUFF_AC_CHROMA)]
    for tid, (bits, vals) in tabs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tid) \
            + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += b"\xff" + bytes([0xD0 + rst % 8])
            rst += 1
            preds = [0] * nc
        my, mx = divmod(m, mcus_x)
        for ci, (fh, fv, _) in enumerate(factors):
            ti = 0 if ci == 0 else 1
            for by in range(fv):
                for bx in range(fh):
                    idx = (my * fv + by) * comp_bw[ci] + (mx * fh + bx)
                    preds[ci] = _encode_block(
                        bw, comp_blocks[ci][idx], preds[ci],
                        dc_maps[ti], ac_maps[ti])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
