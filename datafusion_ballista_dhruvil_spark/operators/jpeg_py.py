"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec) — no codec
library (VERDICT r9 #6; completes the jar-less codec family: BMP/PPM/PNG
images, WAV audio, Avro containers).

Scope — baseline sequential DCT, 8-bit samples:

* **Decoder** (`decode_jpeg`): full marker walk (APPn/COM skip, DQT, DHT,
  SOF0, DRI, SOS, RSTn), canonical Huffman decode with byte-unstuffing,
  DC prediction + AC run-length/ZRL/EOB, dezigzag, dequantize, 8x8
  IDCT (orthonormal DCT-III via one vectorized tensordot over ALL blocks),
  general MCU interleaving with per-component sampling factors (4:4:4,
  4:2:2, 4:2:0 — chroma upsampled by sample replication), JFIF
  YCbCr->RGB. Progressive (SOF2), arithmetic coding, 12-bit precision,
  and hierarchical modes raise the loud NotImplementedError gate.
* **Encoder** (`encode_jpeg`): grayscale or YCbCr (4:4:4 or 4:2:0),
  forward DCT + quantization + zigzag + DC-diff/AC run-length + canonical
  Huffman with the spec's Annex K example tables, byte stuffing, edge
  blocks padded by edge replication.

Exactness contract the driver queries rely on: an image whose every 8x8
block is a CONSTANT value v has DCT coefficients DC = 8*(v-128), AC = 0;
with the all-8s quant table the quantized DC is exactly v-128 (integer),
so decode(encode(img)) reproduces the input BIT-EXACTLY — a lossy codec
with a losslessly-predictable subdomain, which is what lets a DuckDB
oracle recompute decoded pixels arithmetically (mm_jpeg_features).

Reference parity note: the reference engine has no media codecs at all —
this extends the multimodal family beyond it (SURVEY.md north-star
extensions; reference binary-column handling is limited to opaque bytes,
/root/reference/ballista/core/src/serde/scheduler/mod.rs round-trips
them untyped).
"""

from __future__ import annotations

import struct

import numpy as np

# Zig-zag scan order (T.81 Figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in scan order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

#: all-8s quant table: the exactness table (see module docstring). Legal
#: per spec (entries 1..255); used by the driver query's encode stage.
QTABLE_FLAT8 = np.full(64, 8, np.uint16)

# T.81 Annex K.1 example luminance/chrominance quantization tables
# (raster order).
QTABLE_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.uint16,
)
QTABLE_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.uint16,
)

# T.81 Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: forward F = C @ b @ C.T,
    inverse b = C.T @ F @ C (the scaling JPEG's quantized integers
    assume)."""
    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    c[0] /= np.sqrt(2)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_tables(bits: list[int], values: list[int]):
    """(BITS, HUFFVAL) -> per-length (mincode, maxcode, valptr) arrays for
    the canonical sequential decode of T.81 Annex F.2.2.3."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            valptr[length] = k
            mincode[length] = code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    return mincode, maxcode, valptr, list(values)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            # pad with 1-bits per spec
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs FF00, stops AT markers
    (FFxx, x != 0) so the scan loop can handle RSTn / EOI."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached: spec says pad bits; feed 1-bits without
                # consuming the marker
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def at_marker(self) -> int | None:
        """If positioned at a marker (after align), return its second
        byte without consuming."""
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                return nxt
        return None


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(reader: _BitReader, table) -> int:
    mincode, maxcode, valptr, values = table
    code = reader.bit()
    length = 1
    while code > maxcode[length]:
        code = (code << 1) | reader.bit()
        length += 1
        if length > 16:
            raise ValueError("JPEG: invalid Huffman code (corrupt stream)")
    return values[valptr[length] + code - mincode[length]]


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _forward_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Plane (h, w) uint8 -> quantized zigzag coefficients
    (nby, nbx, 64) int32. Edge blocks padded by edge replication."""
    h, w = plane.shape
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        plane.astype(np.float64) - 128.0,
        ((0, nby * 8 - h), (0, nbx * 8 - w)),
        mode="edge",
    )
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ux,byxz,vz->byuv", _DCT, blocks, _DCT)
    q = np.round(coeffs / qtable.reshape(8, 8)).astype(np.int32)
    return q.reshape(nby, nbx, 64)[:, :, ZIGZAG]


def _encode_block(zz, prev_dc: int, dc_codes, ac_codes, bw: _BitWriter) -> int:
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform; (h, w, 3) uint8 -> float64."""
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(
    width: int,
    height: int,
    pixel_bytes: bytes,
    gray: bool = False,
    qtable: np.ndarray | None = None,
    qtable_chrom: np.ndarray | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode pixels as a baseline sequential JPEG (Annex K example
    Huffman tables). ``pixel_bytes``: ``w*h`` gray bytes when ``gray``
    else ``w*h*3`` RGB. ``qtable`` defaults to the Annex K luminance
    table; pass :data:`QTABLE_FLAT8` for the block-constant exactness
    contract. ``subsampling``: "444" or "420" (3-component only)."""
    qt0 = (qtable if qtable is not None else QTABLE_LUM).astype(np.uint16)
    qt1 = (qtable_chrom if qtable_chrom is not None else QTABLE_CHROM).astype(np.uint16)
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT (zigzag order on the wire)
    segment(0xDB, bytes([0]) + bytes(qt0[ZIGZAG].astype(np.uint8)))
    if not gray:
        segment(0xDB, bytes([1]) + bytes(qt1[ZIGZAG].astype(np.uint8)))

    if gray:
        comps = [(1, 1, 1, 0)]  # id, h, v, qtable
    elif subsampling == "420":
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, hs, vs, tq in comps:
        sof += struct.pack(">BBB", cid, (hs << 4) | vs, tq)
    segment(0xC0, sof)  # SOF0

    def dht(tc_th: int, table) -> None:
        bits, values = table
        segment(0xC4, bytes([tc_th] + bits + values))

    dht(0x00, HUFF_DC_LUM)
    dht(0x10, HUFF_AC_LUM)
    if not gray:
        dht(0x01, HUFF_DC_CHROM)
        dht(0x11, HUFF_AC_CHROM)

    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    # component planes
    if gray:
        planes = [np.frombuffer(pixel_bytes, np.uint8).reshape(height, width).astype(np.float64) + 0.0]
    else:
        rgb = np.frombuffer(pixel_bytes, np.uint8).reshape(height, width, 3)
        ycc = rgb_to_ycbcr(rgb)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if subsampling == "420":
            ph = (height + 1) // 2 * 2
            pw = (width + 1) // 2 * 2
            for i in (1, 2):
                p = np.pad(planes[i], ((0, ph - height), (0, pw - width)), mode="edge")
                planes[i] = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in planes]

    qz = [
        _forward_blocks(planes[i], qt0 if comps[i][3] == 0 else qt1)
        for i in range(len(comps))
    ]
    dc_lum = _canonical_codes(*HUFF_DC_LUM)
    ac_lum = _canonical_codes(*HUFF_AC_LUM)
    dc_chr = _canonical_codes(*HUFF_DC_CHROM)
    ac_chr = _canonical_codes(*HUFF_AC_CHROM)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    prev_dc = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for i, (_cid, hs, vs, _tq) in enumerate(comps):
                dc_c = dc_lum if i == 0 else dc_chr
                ac_c = ac_lum if i == 0 else ac_chr
                nby, nbx = qz[i].shape[:2]
                for by in range(vs):
                    for bx in range(hs):
                        # edge MCUs re-encode the clamped edge block, the
                        # standard dummy-block convention
                        yy = min(my * vs + by, nby - 1)
                        xx = min(mx * hs + bx, nbx - 1)
                        prev_dc[i] = _encode_block(
                            qz[i][yy, xx], prev_dc[i], dc_c, ac_c, bw
                        )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def decode_jpeg_coefficients(payload: bytes):
    """Parse + entropy-decode a baseline JPEG; returns
    ``(width, height, comps, coeff, qts)`` where ``comps`` is
    ``[(cid, h, v, tq)]``, ``coeff[i]`` is the (nby, nbx, 64) DEquantized
    raster-order coefficient array for component i. Split from
    :func:`decode_jpeg` so tests can pin the entropy layer exactly
    (Huffman/DC-pred/run-length are lossless; only IDCT rounding is
    numeric)."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, tuple] = {}
    ac_tabs: dict[int, tuple] = {}
    comps: list[tuple[int, int, int, int]] = []
    width = height = None
    restart_interval = 0
    scan_comps: list[tuple[int, int, int]] = []

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("JPEG 16-bit quant tables")
                zz = np.frombuffer(data, np.uint8, 64, dpos + 1).astype(np.uint16)
                qts[tq] = zz[UNZIGZAG]  # store raster order
                dpos += 65
        elif marker == 0xC4:  # DHT
            dpos = 0
            while dpos < len(data):
                tc, th = data[dpos] >> 4, data[dpos] & 0x0F
                bits = list(data[dpos + 1 : dpos + 17])
                n = sum(bits)
                values = list(data[dpos + 17 : dpos + 17 + n])
                tab = _decode_tables(bits, values)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                dpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(-ext)
            precision = data[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            height, width = struct.unpack_from(">HH", data, 1)
            nc = data[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = data[0]
            scan_comps = []
            for i in range(ns):
                cs, td_ta = data[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, td_ta >> 4, td_ta & 0x0F))
            break
        # APPn / COM / others: skipped

    if width is None or not scan_comps:
        raise ValueError("JPEG: missing SOF/SOS")
    if [c[0] for c in scan_comps] != [c[0] for c in comps]:
        raise NotImplementedError("JPEG non-interleaved / partial scans")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    coeff = []
    for _cid, hs, vs, _tq in comps:
        coeff.append(np.zeros((mcuy * vs, mcux * hs, 64), np.int32))

    reader = _BitReader(payload, pos)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                m = reader.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                    prev_dc = [0] * len(comps)
            for i, (_cid, hs, vs, _tq) in enumerate(comps):
                dct = dc_tabs[scan_comps[i][1]]
                act = ac_tabs[scan_comps[i][2]]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.int32)
                        s = _huff_decode(reader, dct)
                        diff = _extend(reader.receive(s), s) if s else 0
                        prev_dc[i] += diff
                        zz[0] = prev_dc[i]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coeff[i][my * vs + by, mx * hs + bx] = zz[UNZIGZAG]
            mcu_count += 1

    # dequantize
    for i, (_cid, _hs, _vs, tq) in enumerate(comps):
        coeff[i] = coeff[i] * qts[tq].astype(np.int32)[None, None, :]
    return width, height, comps, coeff, qts


def decode_jpeg(payload: bytes):
    """Decode a baseline JPEG to ``(width, height, pixels)`` with
    ``pixels`` a (h, w*3) uint8 RGB array — the decode_image contract.
    Gray replicates to 3 channels; subsampled chroma upsampled by sample
    replication; JFIF YCbCr->RGB with round-half-up-free np.round."""
    width, height, comps, coeff, _qts = decode_jpeg_coefficients(payload)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for i, (_cid, hs, vs, _tq) in enumerate(comps):
        nby, nbx = coeff[i].shape[:2]
        blocks = coeff[i].reshape(nby, nbx, 8, 8).astype(np.float64)
        # IDCT over all blocks at once: b = C.T @ F @ C
        px = np.einsum("xu,byuv,vz->byxz", _DCT.T, blocks, _DCT)
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        # upsample to full resolution by replication, then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        rgb = np.repeat(gray.reshape(height, width, 1), 3, axis=2)
    elif len(planes) == 3:
        rgb = ycbcr_to_rgb(np.stack(planes, axis=-1))
    else:
        raise NotImplementedError(f"JPEG with {len(planes)} components")
    return width, height, np.ascontiguousarray(rgb.reshape(height, width * 3))
