"""Baseline + progressive JPEG codec (public spec: ITU-T T.81 /
ISO 10918-1).

Pure stdlib + numpy implementation of Huffman-coded DCT JPEG:

- ``jpeg_decode``: SOI / APPn / COM / DQT / DHT / SOF0-2 / SOS / EOI
  marker walk, entropy-coded segment with 0xFF00 byte unstuffing,
  canonical Huffman decode (tables read FROM THE STREAM, so any
  encoder's tables work), DC prediction, AC run-length / ZRL / EOB,
  dequantization, inverse zigzag, float64 IDCT (exact 8×8 DCT-III
  matrix), level shift + clip, and BT.601 YCbCr→RGB with
  nearest-neighbor chroma upsampling for subsampled scans (h,v ≤ 2 —
  covers 4:4:4, 4:2:2, 4:2:0). Restart markers (DRI/RSTn) are
  honored. PROGRESSIVE (SOF2) streams decode fully: multi-scan
  spectral selection and successive approximation per spec Annex G —
  DC first/refinement scans (interleaved or not), per-component AC
  band scans with EOB-run accumulation, and the AC refinement
  correction-bit walk — coefficients accumulate across scans and
  reconstruct once at EOI. Arithmetic coding (SOF9/10) still raises.
- ``jpeg_encode``: grayscale or YCbCr 4:4:4 / 4:2:0 fixture writer —
  standard Annex-K quantization tables scaled by ``quality``,
  standard Huffman tables, interleaved single scan.
- ``jpeg_encode_progressive``: the progressive fixture twin — a
  libjpeg-style scan script (DC first at Al=1, per-component AC bands
  1-5 / 6-63 at Al=1, AC refinements to Al=0, DC refinement), or
  spectral-selection-only with ``spectral_only=True``. Because both
  encoders quantize identically, a progressive stream must decode to
  the EXACT same pixels as the baseline stream of the same image —
  the cross-check the tests pin (no matched encode/decode bug can
  fake it, since the baseline decoder is oracle-verified by llm44).

JPEG is lossy: tests pin closed-form-computable cases exactly (a
uniform block decodes to its quantized DC value), bound round-trip
error on smooth content, and check determinism — the same strategy the
PNG path uses, adapted to a lossy codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public spec tables)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99]).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix C: forward = C @ B @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m

_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """(code, length) per symbol, canonical order (spec C.2)."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """(length, code) -> symbol lookup for the decoder."""
    table, code, i = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)       # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (0xFF followed by nonzero)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1                  # stuffed 0xFF data byte
            else:
                raise ValueError("marker inside entropy-coded segment")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """Spec F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category t, t-bit code) for encoding."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder (gray or YCbCr 4:4:4)

def _scale_q(q: np.ndarray, quality: int) -> np.ndarray:
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_component(blocks, q, dc_codes, ac_codes, w: _BitWriter,
                      pred: int) -> int:
    for block in blocks:
        d = _DCT @ (block - 128.0) @ _DCT.T
        coef = np.round(d / q).astype(np.int64).flatten()[_ZIGZAG]
        diff = int(coef[0]) - pred
        pred = int(coef[0])
        t, mag = _magnitude(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(mag, t)
        run = 0
        last_nz = max((i for i in range(1, 64) if coef[i]), default=0)
        for i in range(1, last_nz + 1):
            if coef[i] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]      # ZRL
                w.write(code, ln)
                run -= 16
            t, mag = _magnitude(int(coef[i]))
            code, ln = ac_codes[(run << 4) | t]
            w.write(code, ln)
            w.write(mag, t)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]          # EOB
            w.write(code, ln)
    return pred


def _block_grid(plane: np.ndarray, mult: int = 8) -> np.ndarray:
    """Pad a (H, W) plane to ``mult``-multiples by edge replication and
    return the (rows, cols, 8, 8) block grid."""
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.pad(plane.astype(np.float64),
                    ((0, ph - h), (0, pw - w)), mode="edge")
    rows, cols = ph // 8, pw // 8
    return padded.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)


def jpeg_encode(pixels: bytes, width: int, height: int, channels: int,
                quality: int = 90, subsample: bool = False) -> bytes:
    """Baseline JPEG writer: ``channels`` 1 (gray) or 3 (RGB, encoded
    as YCbCr — 4:4:4, or 4:2:0 with ``subsample=True``: box-averaged
    chroma, 4 luma blocks per MCU). Annex-K tables scaled by
    ``quality``; all tables embedded in the stream."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode supports 1 or 3 channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width, channels)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [img[..., 0]]

    qs = [_scale_q(_Q_LUMA, quality)]
    if channels == 3:
        qs.append(_scale_q(_Q_CHROMA, quality))
    out = bytearray(b"\xff\xd8")                                # SOI
    for tid, q in enumerate(qs):                                # DQT
        body = bytes([tid]) + bytes(int(v) for v in q.flatten()[_ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    # SOF0
    ncomp = channels
    sub = subsample and ncomp == 3
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for cid in range(ncomp):
        hv = 0x22 if (sub and cid == 0) else 0x11
        sof += bytes([cid + 1, hv, 0 if cid == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # SOS
    sos = bytes([ncomp])
    for cid in range(ncomp):
        sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_canonical_codes(*_DC_LUMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA)]
    if ncomp == 3:
        dc_codes += [_canonical_codes(*_DC_CHROMA)] * 2
        ac_codes += [_canonical_codes(*_AC_CHROMA)] * 2
    qsel = [qs[0]] + [qs[-1]] * (ncomp - 1)

    w = _BitWriter()
    preds = [0] * ncomp
    if not sub:
        # interleaved 4:4:4 MCUs: one block per component per MCU
        grids = [_block_grid(p) for p in planes]
        rows, cols = grids[0].shape[:2]
        for my in range(rows):
            for mx in range(cols):
                for c in range(ncomp):
                    preds[c] = _encode_component(
                        [grids[c][my, mx]], qsel[c], dc_codes[c],
                        ac_codes[c], w, preds[c])
    else:
        # 4:2:0 MCUs: 4 luma blocks + 1 of each box-averaged chroma
        luma = _block_grid(planes[0], mult=16)
        chroma = [
            _block_grid(p.reshape(p.shape[0] // 2, 2,
                                  p.shape[1] // 2, 2).mean(axis=(1, 3))
                        if p.shape[0] % 2 == 0 and p.shape[1] % 2 == 0
                        else np.pad(p, ((0, p.shape[0] % 2),
                                        (0, p.shape[1] % 2)), mode="edge")
                        .reshape((p.shape[0] + p.shape[0] % 2) // 2, 2,
                                 (p.shape[1] + p.shape[1] % 2) // 2, 2)
                        .mean(axis=(1, 3)))
            for p in planes[1:]]
        mcus_y, mcus_x = luma.shape[0] // 2, luma.shape[1] // 2
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_component(
                            [luma[my * 2 + by, mx * 2 + bx]], qsel[0],
                            dc_codes[0], ac_codes[0], w, preds[0])
                for c in (1, 2):
                    preds[c] = _encode_component(
                        [chroma[c - 1][my, mx]], qsel[c], dc_codes[c],
                        ac_codes[c], w, preds[c])
    out += w.flush()
    out += b"\xff\xd9"                                          # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (general baseline)

def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline JPEG → (width, height, channels, pixels).
    channels is 1 (grayscale scan) or 3 (RGB after YCbCr conversion);
    subsampled chroma (factors ≤ 2) is nearest-neighbor upsampled.

    Malformed input ALWAYS surfaces as ValueError (struct/index/lookup
    failures on truncated or inconsistent streams are wrapped), so the
    skip_invalid / dead-letter paths in decode_image and the video
    sampler catch everything a poison-pill blob can throw."""
    try:
        return _jpeg_decode_impl(data)
    except (ValueError, struct.error):
        raise
    except (IndexError, KeyError, RuntimeError,
            OverflowError) as e:
        # RuntimeError covers PEP-479-converted StopIteration from
        # generator contexts; all mean the same thing here
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") \
            from None


def _jpeg_decode_impl(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    comps = None
    width = height = None
    restart_interval = 0
    progressive = False
    coefs = None                    # progressive: per-comp (r, c, 64)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                     # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                           # standalone markers
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:                     # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    vals = np.frombuffer(body[i:i + 128],
                                         dtype=">u2").astype(np.int64)
                    i += 128
                q = np.zeros(64, dtype=np.int64)
                q[_ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:                   # DHT
            i = 0
            while i < len(body):
                tc = body[i]
                bits = list(body[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("truncated DHT bits")
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT values")
                htables[tc] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            precision, height, width, nc = struct.unpack(
                ">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if any(c["h"] > 2 or c["v"] > 2 or c["h"] < 1 or c["v"] < 1
                   for c in comps):
                raise ValueError("sampling factors beyond 2 unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/progressive Huffman JPEG supported")
        elif marker == 0xDD:                   # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                   # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("empty SOS segment")
            ns = body[0]
            scan = []
            for c in range(ns):
                seg = body[1 + c * 2:3 + c * 2]
                if len(seg) != 2:
                    raise ValueError("truncated SOS component spec")
                cs, tt = seg
                matches = [i for i, x in enumerate(comps)
                           if x["id"] == cs]
                if not matches:
                    raise ValueError(f"SOS names unknown component {cs}")
                scan.append({**comps[matches[0]], "ci": matches[0],
                             "dc": tt >> 4, "ac": tt & 0xF})
            pos += seglen
            if not progressive:
                return _decode_scan(data, pos, scan, qtables, htables,
                                    width, height, restart_interval)
            spec = body[1 + 2 * ns:4 + 2 * ns]
            if len(spec) != 3:
                raise ValueError("truncated SOS spectral spec")
            ss, se, ahal = spec
            hmax = max(x["h"] for x in comps)
            vmax = max(x["v"] for x in comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            if coefs is None:
                coefs = [np.zeros((mcus_y * x["v"], mcus_x * x["h"], 64),
                                  dtype=np.int32) for x in comps]
            pos = _decode_progressive_scan(
                data, pos, scan, coefs, htables, width, height,
                hmax, vmax, mcus_x, mcus_y, restart_interval,
                ss, se, ahal >> 4, ahal & 0xF)
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _progressive_reconstruct(comps, coefs, qtables,
                                        width, height)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, scan, qtables, htables, width, height,
                 restart_interval):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in scan:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align()
                if (reader.pos + 1 < len(data)
                        and data[reader.pos] == 0xFF
                        and 0xD0 <= data[reader.pos + 1] <= 0xD7):
                    reader.pos += 2
                    preds = [0] * len(scan)
            for ci, c in enumerate(scan):
                try:
                    dq = qtables[c["tq"]]
                    dct = htables[c["dc"]]          # tc=0 class
                    act = htables[0x10 | c["ac"]]
                except KeyError as e:
                    raise ValueError(f"missing table {e}") from None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dct)
                        if t > 16:
                            raise ValueError(
                                f"DC magnitude category {t} invalid")
                        diff = _extend(reader.bits(t), t) if t else 0
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        i = 1
                        while i < 64:
                            rs = _huff_decode(reader, act)
                            r, t = rs >> 4, rs & 0xF
                            if rs == 0x00:          # EOB
                                break
                            if rs == 0xF0:          # ZRL
                                i += 16
                                continue
                            i += r
                            if i > 63:
                                raise ValueError("AC run past block end")
                            coef[i] = _extend(reader.bits(t), t)
                            i += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef
                        b8 = (block.reshape(8, 8) * dq)
                        px = _DCT.T @ b8 @ _DCT + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    return _assemble(scan, planes, width, height, hmax, vmax)


def _assemble(comps, planes, width, height, hmax, vmax):
    """Upsample each component plane to full resolution, crop to the
    frame, and convert (shared by the baseline and progressive
    reconstruction paths)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# ---------------------------------------------------------------------------
# progressive decoding (spec Annex G: spectral selection + successive
# approximation; coefficient state accumulates across scans)

def _nonil_blocks(c, width, height, hmax, vmax) -> tuple[int, int]:
    """Block-grid dims of a NON-INTERLEAVED scan over one component:
    ceil(ceil(dim·f/fmax) / 8) per axis (spec A.1.1 component dims +
    A.2.2 non-interleaved data unit count)."""
    cw = -(-width * c["h"] // hmax)
    ch = -(-height * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_progressive_scan(data, pos, scan, coefs, htables,
                             width, height, hmax, vmax, mcus_x, mcus_y,
                             restart_interval, ss, se, ah, al):
    if ss == 0 and se == 0:
        dc = True
    elif 1 <= ss <= se <= 63:
        dc = False
        if len(scan) != 1:
            raise ValueError("progressive AC scan must name exactly "
                             "one component")
    else:
        raise ValueError(f"bad spectral selection {ss}..{se}")
    reader = _BitReader(data, pos)
    preds = {c["ci"]: 0 for c in scan}
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)

    def table(c, ac: bool):
        key = (0x10 | c["ac"]) if ac else c["dc"]
        t = htables.get(key)
        if t is None:
            raise ValueError(f"missing Huffman table {key:#x}")
        return t

    def refine_bit(cf, k):
        """Correction bit for an already-nonzero coefficient
        (G.1.2.3): move it one step away from zero iff the bit is set
        and this approximation pass hasn't touched it yet."""
        if reader.bit() and not (int(cf[k]) & p1):
            cf[k] += p1 if cf[k] >= 0 else m1

    def dc_first(c, cf):
        t = _huff_decode(reader, table(c, False))
        if t > 16:
            raise ValueError(f"DC magnitude category {t} invalid")
        diff = _extend(reader.bits(t), t) if t else 0
        preds[c["ci"]] += diff
        cf[0] = preds[c["ci"]] << al

    def dc_refine(cf):
        if reader.bit():
            cf[0] = int(cf[0]) | p1     # two's complement: works for <0

    def ac_first(c, cf):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        act = table(c, True)
        k = ss
        while k <= se:
            rs = _huff_decode(reader, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:                      # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1            # this block is one of
                if r:                            # the (1<<r)+bits run
                    eobrun += reader.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            cf[k] = _extend(reader.bits(s), s) << al
            k += 1

    def ac_refine(c, cf):
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            act = table(c, True)
            while k <= se:
                rs = _huff_decode(reader, act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    val = 0                      # ZRL: 16 still-zero taps
                elif s == 1:
                    # newly-significant: sign bit right after the code
                    val = p1 if reader.bit() else m1
                else:
                    raise ValueError(
                        "AC refinement magnitude must be 1")
                # walk: correction bits over already-nonzero taps, run
                # countdown over still-zero taps, place val at the end
                while k <= se:
                    if cf[k] != 0:
                        refine_bit(cf, k)
                        k += 1
                        continue
                    if r == 0:
                        if val:
                            cf[k] = val
                        k += 1
                        break
                    r -= 1
                    k += 1
        if eobrun:
            # inside an EOB run every remaining nonzero tap of the band
            # still carries its correction bit
            while k <= se:
                if cf[k] != 0:
                    refine_bit(cf, k)
                k += 1
            eobrun -= 1

    def do_block(c, cf):
        if dc:
            dc_first(c, cf) if ah == 0 else dc_refine(cf)
        else:
            ac_first(c, cf) if ah == 0 else ac_refine(c, cf)

    mcu = 0

    def maybe_restart():
        nonlocal mcu, eobrun
        mcu += 1
        if restart_interval and mcu % restart_interval == 0:
            reader.align()
            if (reader.pos + 1 < len(data) and data[reader.pos] == 0xFF
                    and 0xD0 <= data[reader.pos + 1] <= 0xD7):
                reader.pos += 2
                for ci in preds:
                    preds[ci] = 0
                eobrun = 0

    if len(scan) > 1:
        # interleaved (DC scans only): MCU walk over every component's
        # h×v blocks, exactly the sequential MCU geometry
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in scan:
                    cf = coefs[c["ci"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(c, cf[my * c["v"] + by,
                                           mx * c["h"] + bx])
                maybe_restart()
    else:
        # non-interleaved: the component's own block raster; one block
        # is one restart-counted unit
        c = scan[0]
        bw, bh = _nonil_blocks(c, width, height, hmax, vmax)
        cf = coefs[c["ci"]]
        for by in range(bh):
            for bx in range(bw):
                do_block(c, cf[by, bx])
                maybe_restart()
    return reader.pos


def _progressive_reconstruct(comps, coefs, qtables, width, height):
    """All scans consumed: dequantize + IDCT every component's
    coefficient grid in one vectorized pass, then the shared
    upsample/crop/convert tail."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError(f"missing quantization table {c['tq']}")
        cf = coefs[ci]
        rows, cols = cf.shape[:2]
        nat = np.zeros((rows, cols, 64), dtype=np.float64)
        nat[..., _ZIGZAG] = cf
        b8 = nat.reshape(rows, cols, 8, 8) * q
        # broadcasted matmul, NOT einsum: same per-block summation
        # order as the baseline path, so a progressive stream decodes
        # BIT-identically to its baseline twin (einsum's reassociated
        # sums can land the other side of a .5 rounding boundary)
        px = _DCT.T @ b8 @ _DCT + 128.0
        planes.append(px.transpose(0, 2, 1, 3)
                      .reshape(rows * 8, cols * 8))
    return _assemble(comps, planes, width, height, hmax, vmax)


# ---------------------------------------------------------------------------
# progressive encoder (fixture twin): libjpeg-style scan script, or
# spectral-selection-only. Tables are FLAT canonical Huffman tables
# covering every symbol a progressive scan can emit (incl. EOBn runs,
# which the Annex-K sequential tables lack) — valid, deliberately
# unoptimized, and embedded in the stream like everything else.

_DC_PROG = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
_AC_PROG = ([0] * 7 + [176] + [0] * 8,
            [(r << 4) | s for r in range(16) for s in range(11)])


def _coef_grids(pixels, width, height, channels, quality, subsample):
    """Per-component quantized zigzag coefficient grids + frame
    geometry, shared quantization with jpeg_encode (identical
    coefficients => progressive and baseline decode to identical
    pixels)."""
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width, channels)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [img[..., 0]]
    sub = subsample and channels == 3
    qs = [_scale_q(_Q_LUMA, quality)]
    if channels == 3:
        qs.append(_scale_q(_Q_CHROMA, quality))
    qsel = [qs[0]] + [qs[-1]] * (channels - 1)

    def grid(blocks, q):
        # broadcasted matmul (same summation order as jpeg_encode's
        # per-block form) so np.round(d/q) quantizes IDENTICALLY —
        # einsum's reassociated sums can flip a coefficient sitting on
        # a .5 boundary and break the progressive==baseline pixel pin
        d = _DCT @ (blocks - 128.0) @ _DCT.T
        coef = np.round(d / q).astype(np.int64)
        return coef.reshape(coef.shape[0], coef.shape[1], 64)[..., _ZIGZAG]

    if not sub:
        grids = [grid(_block_grid(p), qsel[ci])
                 for ci, p in enumerate(planes)]
        factors = [(1, 1)] * channels
    else:
        def half(p):
            if p.shape[0] % 2 or p.shape[1] % 2:
                p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                           mode="edge")
            return p.reshape(p.shape[0] // 2, 2,
                             p.shape[1] // 2, 2).mean(axis=(1, 3))
        grids = [grid(_block_grid(planes[0], mult=16), qsel[0])]
        grids += [grid(_block_grid(half(p), mult=8), qsel[ci + 1])
                  for ci, p in enumerate(planes[1:])]
        factors = [(2, 2)] + [(1, 1)] * (channels - 1)
    return grids, factors, qs


def _enc_dc_scan(w, grids, factors, al, refine: bool):
    """Interleaved DC scan over every component (first pass codes the
    point-transformed diffs; refinement emits one raw bit per block)."""
    dc_codes = _canonical_codes(*_DC_PROG)
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    rows0, cols0 = grids[0].shape[:2]
    mcus_y, mcus_x = rows0 // factors[0][1], cols0 // factors[0][0]
    preds = [0] * len(grids)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, g in enumerate(grids):
                h, v = factors[ci]
                for by in range(v):
                    for bx in range(h):
                        c0 = int(g[my * v + by, mx * h + bx, 0])
                        if refine:
                            w.write((c0 >> al) & 1, 1)
                            continue
                        vpt = c0 >> al          # arithmetic shift (spec)
                        diff = vpt - preds[ci]
                        preds[ci] = vpt
                        t, mag = _magnitude(diff)
                        code, ln = dc_codes[t]
                        w.write(code, ln)
                        if t:
                            w.write(mag, t)


def _enc_ac_first_scan(w, grid, bw, bh, ss, se, al):
    ac_codes = _canonical_codes(*_AC_PROG)
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            w.write(code, ln)
            if r:
                w.write(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(bh):
        for bx in range(bw):
            band = grid[by, bx, ss:se + 1]
            # AC point transform is sign-magnitude (spec G.1.2.1)
            vals = [int(v) >> al if v >= 0 else -((-int(v)) >> al)
                    for v in band]
            nz = [i for i, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(nz[-1] + 1):
                if vals[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    run -= 16
                t, mag = _magnitude(vals[i])
                code, ln = ac_codes[(run << 4) | t]
                w.write(code, ln)
                w.write(mag, t)
                run = 0
            if nz[-1] < se - ss:
                eobrun = 1
    flush_eob()


def _enc_ac_refine_scan(w, grid, bw, bh, ss, se, al):
    """AC successive-approximation refinement (spec G.1.2.3): newly
    significant taps code as (run, 1)+sign; already-significant taps
    ride as correction bits in position order; blocks with nothing new
    join an EOB run whose buffered correction bits follow the EOBn
    code."""
    ac_codes = _canonical_codes(*_AC_PROG)
    eobrun = 0
    pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            w.write(code, ln)
            if r:
                w.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            w.write(b, 1)
        pending = []

    for by in range(bh):
        for bx in range(bw):
            band = grid[by, bx, ss:se + 1]
            a = [abs(int(v)) >> al for v in band]
            sgn = [int(v) > 0 for v in band]
            new = [i for i, x in enumerate(a) if x == 1]
            if not new:
                pending.extend(x & 1 for x in a if x > 1)
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            k = 0
            for kn in new:
                r = sum(1 for i in range(k, kn) if a[i] == 0)
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    z = 0
                    while z < 16:           # 16 still-zero taps, with
                        if a[k] == 0:       # corrections interleaved in
                            z += 1          # position order (the walk
                        elif a[k] > 1:      # the decoder replays)
                            w.write(a[k] & 1, 1)
                        k += 1
                    r -= 16
                code, ln = ac_codes[(r << 4) | 1]
                w.write(code, ln)
                w.write(1 if sgn[kn] else 0, 1)
                while k < kn:
                    if a[k] > 1:
                        w.write(a[k] & 1, 1)
                    k += 1
                k = kn + 1
            if k <= se - ss:
                pending.extend(a[i] & 1
                               for i in range(k, se - ss + 1) if a[i] > 1)
                eobrun = 1
    flush_eob()


def jpeg_encode_progressive(pixels: bytes, width: int, height: int,
                            channels: int, quality: int = 90,
                            subsample: bool = False,
                            spectral_only: bool = False) -> bytes:
    """Progressive JPEG fixture writer (gray or YCbCr, 4:4:4 / 4:2:0).
    Default scan script exercises the full Annex-G surface: DC first at
    Al=1, per-component AC bands 1-5 and 6-63 at Al=1, AC refinements
    to Al=0, then DC refinement. ``spectral_only=True`` emits the
    simpler spectral-selection-only script (every scan at Ah=Al=0).
    Quantization is IDENTICAL to jpeg_encode, so both streams decode
    to the same pixels."""
    if channels not in (1, 3):
        raise ValueError("jpeg_encode_progressive supports 1 or 3 "
                         "channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    grids, factors, qs = _coef_grids(pixels, width, height, channels,
                                     quality, subsample)
    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)

    out = bytearray(b"\xff\xd8")                                # SOI
    for tid, q in enumerate(qs):                                # DQT
        body = bytes([tid]) + bytes(int(v) for v in q.flatten()[_ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, height, width, channels)      # SOF2
    for cid in range(channels):
        h, v = factors[cid]
        sof += bytes([cid + 1, (h << 4) | v, 0 if cid == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0x00, _DC_PROG), (0x10, _AC_PROG)):
        body = bytes([tc]) + bytes(bits) + bytes(vals)          # DHT
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    def sos(comp_ids, ss, se, ah, al, emit):
        nonlocal out
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid + 1, 0x00])       # DC table 0 / AC table 0
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr
        w = _BitWriter()
        emit(w)
        out += w.flush()

    all_ids = list(range(channels))
    comp_geom = []
    for ci in range(channels):
        c = {"h": factors[ci][0], "v": factors[ci][1]}
        comp_geom.append(_nonil_blocks(c, width, height, hmax, vmax))

    if spectral_only:
        sos(all_ids, 0, 0, 0, 0,
            lambda w: _enc_dc_scan(w, grids, factors, 0, False))
        for ci in range(channels):
            bw, bh = comp_geom[ci]
            sos([ci], 1, 63, 0, 0,
                lambda w, ci=ci, bw=bw, bh=bh: _enc_ac_first_scan(
                    w, grids[ci], bw, bh, 1, 63, 0))
    else:
        sos(all_ids, 0, 0, 0, 1,
            lambda w: _enc_dc_scan(w, grids, factors, 1, False))
        for ci in range(channels):
            bw, bh = comp_geom[ci]
            for lo, hi in ((1, 5), (6, 63)):
                sos([ci], lo, hi, 0, 1,
                    lambda w, ci=ci, bw=bw, bh=bh, lo=lo, hi=hi:
                    _enc_ac_first_scan(w, grids[ci], bw, bh, lo, hi, 1))
        for ci in range(channels):
            bw, bh = comp_geom[ci]
            for lo, hi in ((1, 5), (6, 63)):
                sos([ci], lo, hi, 1, 0,
                    lambda w, ci=ci, bw=bw, bh=bh, lo=lo, hi=hi:
                    _enc_ac_refine_scan(w, grids[ci], bw, bh, lo, hi, 0))
        sos(all_ids, 0, 0, 1, 0,
            lambda w: _enc_dc_scan(w, grids, factors, 0, True))
    out += b"\xff\xd9"                                          # EOI
    return bytes(out)
