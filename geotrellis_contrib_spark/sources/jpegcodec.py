"""Baseline JPEG codec (ITU-T T.81 / ISO 10918-1) for TIFF compression 7
— the "new-style JPEG" real-world aerial/satellite GeoTiff archives use,
and the last codec named in the reference's GDAL-delegated read matrix
(GDALRasterSource reads JPEG-in-TIFF through GDAL;
gdal/src/main/scala/geotrellis/contrib/vlm/gdal/GDALRasterSource.scala:35-46).

From scratch on numpy + stdlib, both directions:

* **Grayscale** (one 8-bit component per segment — the band-separate
  ``PlanarConfig=2`` tile model) AND **interleaved YCbCr color** (3
  components, 4:4:4 or 4:2:0 chroma subsampling — the libtiff/GDAL
  default wire format for real aerial JPEG-in-TIFF archives;
  PhotometricInterpretation=6, chunky). Progressive (SOF2),
  extended/12-bit, arithmetic coding and other sampling layouts FAIL
  LOUD — never a silent wrong decode. Chroma upsampling on decode is
  nearest-neighbor replication (deterministic; constant regions —
  the gate fixture — are upsampler-independent).
* **Abbreviated streams** (TIFF TechNote 2): tables may live in the
  TIFF ``JPEGTables`` tag (347) and each segment carries only
  SOI/SOF0/SOS/entropy/EOI, or each segment may be fully
  self-contained — both directions support both layouts.
* **Restart markers**: DRI/RSTn handled on decode (common in libtiff
  strips), emitted on encode when ``restart_interval`` is set.

Determinism contract (what the oracle gate leans on): encode is
quantize ``floor(F/Q + 0.5)`` after an orthonormal float64 DCT-II;
decode is the transposed IDCT, ``floor(x + 128 + 0.5)`` clipped to
[0, 255]. For an image that is CONSTANT within every aligned 8x8 block
and a DC quantization step of 1, the only nonzero coefficient is
DC = 8*(v-128) (ACs are mathematically zero; float64 residue ~1e-13 is
absorbed by the rounds), so the decode is BIT-EXACT — the property the
``geotiff_read_jpeg`` gate pins end-to-end. General images roundtrip
within a small bounded error (lossy by nature; pytest bounds it).
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (T.81 Figure A.6 zigzag; Annex K.1/K.3 typical tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K Table K.1 (luminance) — row-major natural order
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

# Annex K.3.1 typical luminance Huffman tables (BITS = counts of codes
# of length 1..16; HUFFVAL in code order)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# Annex K.3.2 typical chrominance Huffman tables
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# Annex K Table K.2 (chrominance quant), natural order
STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# orthonormal 8-point DCT-II basis: F = C @ X @ C.T, X = C.T @ F @ C
_k = np.arange(8, dtype=np.float64)
_DCT_C = 0.5 * np.cos((2.0 * _k[None, :] + 1.0) * _k[:, None]
                      * np.pi / 16.0)
_DCT_C[0, :] *= 1.0 / np.sqrt(2.0)

# markers
_SOI, _EOI, _SOS, _DQT, _DHT, _DRI = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD
_SOF0 = 0xC0


# ---------------------------------------------------------------------------
# Huffman (Annex C canonical code assignment)
# ---------------------------------------------------------------------------

def _huff_encode_table(bits, vals) -> dict:
    """value -> (code, length), canonical assignment per Annex C."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals):
    """(mincode, maxcode, valptr) per length 1..16 (T.81 F.2.2.3);
    maxcode = -1 marks an empty length."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first reader over entropy-coded bytes: unstuffs 0xFF00, stops
    at markers, and exposes restart-marker alignment."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG entropy stream truncated")
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(
                    self.buf) else None
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: feed pad bits, do not consume
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> int:
        """Byte-align and consume an RSTn marker; returns n in 0..7."""
        self.acc = 0
        self.nbits = 0
        while (self.pos + 1 < len(self.buf)
               and not (self.buf[self.pos] == 0xFF
                        and self.buf[self.pos + 1] != 0x00)):
            self.pos += 1
        if self.pos + 1 >= len(self.buf):
            raise ValueError("expected RST marker, hit end of stream")
        m = self.buf[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
        self.pos += 2
        return m - 0xD0

    def huff(self, mincode, maxcode, valptr, vals) -> int:
        code = self.bits(1)
        length = 1
        while code > maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code in JPEG stream")
            code = (code << 1) | self.bits(1)
        return vals[valptr[length] + code - mincode[length]]


def _category(v: int) -> int:
    a = -v if v < 0 else v
    n = 0
    while a:
        n += 1
        a >>= 1
    return n


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n received bits back to a signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _dqt_segment(quant: np.ndarray, tq: int = 0) -> bytes:
    q = np.asarray(quant, dtype=np.int64).reshape(64)
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant table entries must be in [1, 255] "
                         "(8-bit DQT)")
    return _seg(_DQT, bytes([tq]) + bytes(int(v) for v in q[ZIGZAG]))


def _dht_segments(chroma: bool = False) -> bytes:
    specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
             (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if chroma:
        specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    out = b""
    for tc_th, bits, vals in specs:
        out += _seg(_DHT, bytes([tc_th]) + bytes(bits) + bytes(vals))
    return out


def jpeg_tables_stream(quant: np.ndarray,
                       quant_chroma: np.ndarray | None = None) -> bytes:
    """The TIFF ``JPEGTables`` tag payload (TechNote 2): an abbreviated
    table-specification stream — SOI, DQT(s), DHTs, EOI. Pass
    ``quant_chroma`` for the color (YCbCr) surface."""
    out = bytes([0xFF, _SOI]) + _dqt_segment(quant, 0)
    if quant_chroma is not None:
        out += _dqt_segment(quant_chroma, 1)
    out += _dht_segments(chroma=quant_chroma is not None)
    return out + bytes([0xFF, _EOI])


def _quantized_blocks(plane: np.ndarray, quant: np.ndarray,
                      ph: int, pw: int) -> np.ndarray:
    """uint8 plane -> (bh, bw, 64) quantized int64 coefficient blocks
    (natural order), edge-padded to (ph, pw)."""
    h, w = plane.shape
    q = np.asarray(quant, dtype=np.float64).reshape(8, 8)
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quant table entries must be in [1, 255] "
                         "(8-bit DQT)")
    x = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)),
               mode="edge") - 128.0
    bh, bw = ph // 8, pw // 8
    blocks = x.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,xyjk,lk->xyil", _DCT_C, blocks, _DCT_C,
                     optimize=True)
    qc = np.floor(coef / q + 0.5).astype(np.int64)
    # baseline coefficient range guards (Annex K tables stop at
    # category 11 DC / 10 AC); reachable only with adversarial inputs
    # under tiny quant steps — clamp is the documented lossy fallback
    qc[:, :, 0, 0] = np.clip(qc[:, :, 0, 0], -2047, 2047)
    flat = qc.reshape(bh, bw, 64)
    ac_view = flat[:, :, 1:]
    np.clip(ac_view, -1023, 1023, out=ac_view)
    return flat


def _encode_block(bwrt: "_BitWriter", zz, pred: int, dc_tab, ac_tab
                  ) -> int:
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _category(diff)
    code, ln = dc_tab[s]
    bwrt.put(code, ln)
    if s:
        bwrt.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            code, ln = ac_tab[0x00]  # EOB
            bwrt.put(code, ln)
            break
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bwrt.put(code, ln)
            run -= 16
        v = int(zz[k])
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bwrt.put(code, ln)
        bwrt.put(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    return pred


def _entropy_scan(mcus, tabs, restart_interval: int) -> bytes:
    """Encode MCUs = iterables of (comp_idx, zz64) with per-component
    DC prediction and restart markers."""
    preds = [0] * len(tabs)
    bwrt = _BitWriter()
    body = bytearray()
    rst = 0
    for mi, mcu in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            bwrt.flush()
            body += bwrt.out
            bwrt = _BitWriter()
            body += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(tabs)
        for ci, zz in mcu:
            preds[ci] = _encode_block(bwrt, zz, preds[ci],
                                      tabs[ci][0], tabs[ci][1])
    bwrt.flush()
    body += bwrt.out
    return bytes(body)


def jpeg_encode_gray(arr: np.ndarray, quant: np.ndarray,
                     inline_tables: bool = True,
                     restart_interval: int = 0) -> bytes:
    """Encode one grayscale 8-bit plane as a baseline JPEG stream. With
    ``inline_tables=False`` the stream is abbreviated (tables expected
    from the ``JPEGTables`` tag at decode)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"JPEG baseline needs uint8 samples, "
                         f"got {arr.dtype}")
    if arr.ndim != 2:
        raise ValueError("jpeg_encode_gray expects a single 2-D plane")
    h, w = arr.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"image dims {h}x{w} out of JPEG range")
    flat = _quantized_blocks(arr, quant, (h + 7) // 8 * 8,
                             (w + 7) // 8 * 8)
    bh, bw = flat.shape[:2]
    tabs = [(_huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
             _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS))]
    mcus = ([(0, flat[r, c][ZIGZAG])]
            for r in range(bh) for c in range(bw))
    body = _entropy_scan(mcus, tabs, restart_interval)

    out = bytearray([0xFF, _SOI])
    if inline_tables:
        out += _dqt_segment(np.asarray(quant, dtype=np.int64))
        out += _dht_segments()
    # SOF0: precision 8, one component (id 1, sampling 1x1, quant 0)
    out += _seg(_SOF0, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))
    if restart_interval:
        out += _seg(_DRI, struct.pack(">H", restart_interval))
    out += _seg(_SOS, bytes([1, 1, 0x00, 0, 63, 0]))
    out += body
    out += bytes([0xFF, _EOI])
    return bytes(out)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF RGB -> YCbCr, floor(x + 0.5) rounding, clipped uint8.
    Grayscale inputs (R == G == B) map to (Y == v, Cb == Cr == 128)
    EXACTLY — the property the value gate's fixture leans on."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0.0, 255.0).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr -> RGB, floor(x + 0.5) rounding, clipped uint8.
    (Y, 128, 128) maps back to (Y, Y, Y) exactly."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0.0, 255.0).astype(np.uint8)


def jpeg_encode_color(rgb: np.ndarray, quant_luma: np.ndarray,
                      quant_chroma: np.ndarray,
                      subsampling: tuple[int, int] = (2, 2),
                      inline_tables: bool = True,
                      restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as interleaved baseline
    YCbCr JPEG — 4:4:4 (``subsampling=(1, 1)``) or the libtiff/GDAL
    default 4:2:0 (``(2, 2)``, chroma = 2x2 block means, floor(x+0.5)).
    MCU = sh*sv luma blocks (raster order) + Cb + Cr; luma uses the
    Annex K.3.1 tables (ids 0), chroma K.3.2 (ids 1)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("jpeg_encode_color expects (h, w, 3) uint8")
    sh, sv = int(subsampling[0]), int(subsampling[1])
    if (sh, sv) not in ((1, 1), (2, 2)):
        raise ValueError(f"unsupported subsampling {subsampling} "
                         "(4:4:4 (1,1) or 4:2:0 (2,2))")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"image dims {h}x{w} out of JPEG range")
    ycc = rgb_to_ycbcr(rgb)
    # luma padded to MCU multiples; chroma planes subsampled then padded
    mcu_h, mcu_w = 8 * sv, 8 * sh
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    ypl = np.pad(ycc[..., 0], ((0, ph - h), (0, pw - w)), mode="edge")
    planes = [ypl]
    for c in (1, 2):
        p = np.pad(ycc[..., c], ((0, ph - h), (0, pw - w)), mode="edge")
        if (sh, sv) == (2, 2):
            blocks = p.astype(np.float64).reshape(ph // 2, 2,
                                                  pw // 2, 2)
            p = np.clip(np.floor(blocks.mean(axis=(1, 3)) + 0.5),
                        0.0, 255.0).astype(np.uint8)
        planes.append(p)
    qs = [quant_luma, quant_chroma, quant_chroma]
    flats = [
        _quantized_blocks(planes[0], qs[0], ph, pw),
        _quantized_blocks(planes[1], qs[1], ph // sv, pw // sh),
        _quantized_blocks(planes[2], qs[2], ph // sv, pw // sh)]
    tab_l = (_huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
             _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS))
    tab_c = (_huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
             _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS))
    tabs = [tab_l, tab_c, tab_c]
    mh, mw = ph // mcu_h, pw // mcu_w

    def mcus():
        for mr in range(mh):
            for mc in range(mw):
                parts = []
                for br in range(sv):
                    for bc in range(sh):
                        parts.append((0, flats[0][mr * sv + br,
                                                  mc * sh + bc][ZIGZAG]))
                parts.append((1, flats[1][mr, mc][ZIGZAG]))
                parts.append((2, flats[2][mr, mc][ZIGZAG]))
                yield parts

    body = _entropy_scan(mcus(), tabs, restart_interval)
    out = bytearray([0xFF, _SOI])
    if inline_tables:
        out += _dqt_segment(np.asarray(quant_luma, dtype=np.int64), 0)
        out += _dqt_segment(np.asarray(quant_chroma, dtype=np.int64), 1)
        out += _dht_segments(chroma=True)
    samp_y = (sh << 4) | sv
    out += _seg(_SOF0, struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]))
    if restart_interval:
        out += _seg(_DRI, struct.pack(">H", restart_interval))
    out += _seg(_SOS, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += body
    out += bytes([0xFF, _EOI])
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class _JpegState:
    def __init__(self) -> None:
        self.quant: dict[int, np.ndarray] = {}
        self.huff: dict[tuple[int, int], tuple] = {}
        self.dri = 0


def _parse_tables(buf: bytes, pos: int, st: _JpegState) -> int:
    """Consume marker segments, filling tables, until SOF/SOS/EOI or end
    of buffer. Returns the position of the terminating marker's 0xFF."""
    n = len(buf)
    while pos + 1 < n:
        if buf[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}, "
                             f"got 0x{buf[pos]:02X}")
        m = buf[pos + 1]
        if m == 0xFF:       # fill byte
            pos += 1
            continue
        if m in (_SOI,):
            pos += 2
            continue
        if m == _EOI:
            return pos
        if 0xC0 <= m <= 0xCF and m not in (_DHT, 0xC8, 0xCC):
            return pos      # any SOF — caller decides
        if m == _SOS:
            return pos
        (ln,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        body = buf[pos + 4:pos + 2 + ln]
        if m == _DQT:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                tab = np.empty(64, dtype=np.int64)
                if pq == 0:
                    vals = body[i:i + 64]
                    i += 64
                    tab[ZIGZAG] = np.frombuffer(bytes(vals), np.uint8)
                elif pq == 1:
                    vals = struct.unpack(">64H", body[i:i + 128])
                    i += 128
                    tab[ZIGZAG] = np.array(vals, dtype=np.int64)
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                st.quant[tq] = tab.reshape(8, 8)
        elif m == _DHT:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                i += 17 + nv
                st.huff[(tc, th)] = _huff_decode_table(bits, vals)
        elif m == _DRI:
            (st.dri,) = struct.unpack(">H", body)
        # APPn / COM / anything else with a length: skip
        pos += 2 + ln
    return pos


def _decode_block(rd: _BitReader, dc_t, ac_t, pred: int):
    s = rd.huff(*dc_t)
    diff = _extend(rd.bits(s), s)
    pred += diff
    zz = np.zeros(64, dtype=np.float64)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = rd.huff(*ac_t)
        if sym == 0x00:     # EOB
            break
        if sym == 0xF0:     # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0x0F
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(rd.bits(size), size)
        k += 1
    return zz, pred


def _idct_plane(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    bh, bw = coef.shape[:2]
    blocks = coef.reshape(bh, bw, 8, 8) * q[None, None, :, :]
    pix = np.einsum("ji,xyjk,kl->xyil", _DCT_C, blocks, _DCT_C,
                    optimize=True)
    out = np.floor(pix + 128.0 + 0.5)
    np.clip(out, 0.0, 255.0, out=out)
    return out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) \
        .astype(np.uint8)


def _decode_planes(stream: bytes, tables: bytes | None):
    """General baseline decoder: returns (h, w, [(plane, sh, sv)]) with
    per-component uint8 planes at their SUBSAMPLED resolution. Fails
    loud on non-SOF0 frames, precision != 8, sampling layouts other
    than 1x1-per-component or the 2x2-luma 4:2:0 shape."""
    st = _JpegState()
    if tables:
        _parse_tables(tables, 0, st)
    pos = _parse_tables(stream, 0, st)
    if pos + 1 >= len(stream):
        raise ValueError("JPEG stream ended before SOF")
    m = stream[pos + 1]
    if m != _SOF0:
        if 0xC0 <= m <= 0xCF and m not in (_DHT, 0xC8, 0xCC):
            raise ValueError(
                f"unsupported JPEG frame type SOF{m - 0xC0} "
                "(baseline sequential SOF0 only)")
        raise ValueError(f"expected SOF0, got marker 0xFF{m:02X}")
    (ln,) = struct.unpack(">H", stream[pos + 2:pos + 4])
    body = stream[pos + 4:pos + 2 + ln]
    prec, h, w, nc = struct.unpack(">BHHB", body[:6])
    if prec != 8:
        raise ValueError(f"unsupported JPEG precision {prec} (8 only)")
    if nc not in (1, 3):
        raise ValueError(f"unsupported component count {nc} (1 or 3)")
    comps = []  # (id, sh, sv, tq)
    for i in range(nc):
        cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
        comps.append((cid, samp >> 4, samp & 0x0F, tq))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    samps = tuple((c[1], c[2]) for c in comps)
    ok = (samps == ((1, 1),) * nc
          or (nc == 3 and samps == ((2, 2), (1, 1), (1, 1))))
    if not ok:
        raise ValueError(f"unsupported sampling layout {samps} "
                         "(1x1 per component, or 4:2:0)")
    pos += 2 + ln
    pos = _parse_tables(stream, pos, st)
    if pos + 1 >= len(stream) or stream[pos + 1] != _SOS:
        raise ValueError("expected SOS after SOF0")
    (ln,) = struct.unpack(">H", stream[pos + 2:pos + 4])
    sos = stream[pos + 4:pos + 2 + ln]
    if sos[0] != nc or [sos[1 + 2 * i] for i in range(nc)] \
            != [c[0] for c in comps]:
        raise ValueError("SOS component list does not match the frame")
    tabs = []
    for i in range(nc):
        td, ta = sos[2 + 2 * i] >> 4, sos[2 + 2 * i] & 0x0F
        if (0, td) not in st.huff or (1, ta) not in st.huff:
            raise ValueError("SOS references missing Huffman tables "
                             "(abbreviated stream without JPEGTables?)")
        if comps[i][3] not in st.quant:
            raise ValueError("frame references a missing quant table")
        tabs.append((st.huff[(0, td)], st.huff[(1, ta)]))

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mw = (w + mcu_w - 1) // mcu_w
    mh = (h + mcu_h - 1) // mcu_h
    coefs = [np.zeros((mh * c[2], mw * c[1], 64), dtype=np.float64)
             for c in comps]
    rd = _BitReader(stream, pos + 2 + ln)
    preds = [0] * nc
    mcu = 0
    expect_rst = 0
    for mr in range(mh):
        for mc in range(mw):
            if st.dri and mcu and mcu % st.dri == 0:
                got = rd.restart()
                if got != expect_rst:
                    raise ValueError(
                        f"restart marker out of order: RST{got} "
                        f"(expected RST{expect_rst})")
                expect_rst = (expect_rst + 1) % 8
                preds = [0] * nc
            for i, (_, csh, csv, _) in enumerate(comps):
                for br in range(csv):
                    for bc in range(csh):
                        zz, preds[i] = _decode_block(
                            rd, tabs[i][0], tabs[i][1], preds[i])
                        coefs[i][mr * csv + br, mc * csh + bc,
                                 ZIGZAG] = zz
            mcu += 1
    planes = []
    for i, (_, csh, csv, tq) in enumerate(comps):
        pl = _idct_plane(coefs[i], st.quant[tq].astype(np.float64))
        ch = (h * csv + vmax - 1) // vmax
        cw = (w * csh + hmax - 1) // hmax
        planes.append((pl[:ch, :cw], csh, csv))
    return h, w, planes


def jpeg_decode_gray(stream: bytes, tables: bytes | None = None
                     ) -> np.ndarray:
    """Decode a baseline grayscale JPEG stream (optionally abbreviated,
    with tables supplied from the TIFF ``JPEGTables`` tag) to a uint8
    (h, w) array. Fails loud on progressive/extended/multi-component
    streams (color segments go through :func:`jpeg_decode_color`)."""
    h, w, planes = _decode_planes(stream, tables)
    if len(planes) != 1:
        raise ValueError(f"expected a grayscale stream, got "
                         f"{len(planes)} components (grayscale "
                         "one-plane segments only — the PlanarConfig=2 "
                         "tile model)")
    return planes[0][0][:h, :w]


def jpeg_decode_color(stream: bytes, tables: bytes | None = None
                      ) -> np.ndarray:
    """Decode a baseline interleaved YCbCr JPEG stream (4:4:4 or 4:2:0)
    to an (h, w, 3) uint8 RGB array. Chroma upsampling is
    nearest-neighbor replication (deterministic; constant regions are
    upsampler-independent)."""
    h, w, planes = _decode_planes(stream, tables)
    if len(planes) != 3:
        raise ValueError(f"expected a 3-component YCbCr stream, got "
                         f"{len(planes)}")
    hmax = max(sh for _, sh, _ in planes)
    vmax = max(sv for _, _, sv in planes)
    full = []
    for pl, csh, csv in planes:
        if (csh, csv) != (hmax, vmax):
            pl = np.repeat(np.repeat(pl, vmax // csv, axis=0),
                           hmax // csh, axis=1)
        full.append(pl[:h, :w])
    return ycbcr_to_rgb(np.stack(full, axis=-1))
