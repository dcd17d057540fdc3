"""Baseline JPEG (ITU T.81) grayscale codec in pure python + numpy.

A real JPEG implementation — 8x8 DCT-II, quantization, zigzag, DC
difference coding, AC run-length coding, canonical Huffman entropy coding
with byte stuffing — small enough to audit, with the encoder and decoder
sharing nothing but the FILE FORMAT: the decoder reconstructs the
quantization and Huffman tables from the DQT/DHT segments it parses, so a
round-trip proves the bitstream is genuinely self-describing.

Scope (honest): baseline sequential DCT, 8-bit, single grayscale
component, no subsampling, no restart markers. Progressive/chroma/
arithmetic coding raise NotImplementedError — that is PIL territory.

JPEG is lossy: decode(encode(x)) is x up to quantization error. For a
constant-gray image the only nonzero coefficient is DC, so the error is
bounded by half the DC quantization step scaled back (±1 gray level here)
— which is what the oracle-checked media query asserts.
"""

from __future__ import annotations

import struct

import numpy as np

# Standard-style luminance quantization table (written to DQT; the decoder
# reads it back from the file, so only internal consistency matters).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Canonical Huffman table specs: (counts per code length 1..16, symbols).
# Luminance DC: categories 0..11, one per code.
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))
# Luminance AC (run << 4 | size symbols; 0x00 = EOB, 0xF0 = ZRL).
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

assert sum(AC_COUNTS) == len(AC_SYMBOLS) == 162


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: coef = C @ block @ C.T."""
    n = np.arange(8)
    c = np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / 16)
    c *= np.sqrt(2 / 8)
    c[0] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


def _zigzag_order() -> list[tuple[int, int]]:
    """The standard zigzag traversal of an 8x8 block, generated (diagonals
    alternate direction) rather than hard-coded."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        order += diag if s % 2 else diag[::-1]
    return order


_ZIGZAG = _zigzag_order()


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, bit_length) via the canonical JPEG construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


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
            if byte == 0xFF:  # byte stuffing: 0xFF in entropy data -> FF 00
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81
        return bytes(self.out)


def _category(v: int) -> tuple[int, int]:
    """(size, bits) for a DC diff / AC value: size = bit length of |v|,
    bits = v for positive, v + 2^size - 1 for negative (one's complement)."""
    if v == 0:
        return (0, 0)
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return (size, bits)


# Chroma quantization table (coarser than luma, standard-style).
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _pad_plane(px: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = px.shape
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[-1:, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    return padded - 128.0


def _encode_block(block, qtbl, prev_dc, dc_codes, ac_codes, bits) -> int:
    coef = _C @ block @ _C.T
    q = np.rint(coef / qtbl).astype(np.int64)
    zz = [int(q[i, j]) for i, j in _ZIGZAG]
    size, vb = _category(zz[0] - prev_dc)
    c, ln = dc_codes[size]
    bits.write(c, ln)
    if size:
        bits.write(vb, size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            bits.write(c, ln)
            run -= 16
        size, vb = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        bits.write(c, ln)
        bits.write(vb, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bits.write(c, ln)
    return zz[0]


def _rgb_to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    """BT.601 full-range RGB -> [Y, Cb, Cr] float planes."""
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [y, cb, cr]


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode a uint8 image as a baseline JPEG: (h, w) grayscale -> single
    component; (h, w, 3) RGB -> 4:4:4 YCbCr with a separate chroma
    quantization table and chroma Huffman tables."""
    px = np.asarray(pixels, dtype=np.uint8)
    color = px.ndim == 3
    h, w = px.shape[:2]
    if not h or not w or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("bad image dimensions")
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if color:
        planes = [
            _pad_plane(np.clip(np.rint(p), 0, 255), bh, bw)
            for p in _rgb_to_ycbcr(px)
        ]
        qtbls = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    else:
        planes = [_pad_plane(px.astype(np.float64), bh, bw)]
        qtbls = [QUANT_LUMA]

    dc_codes = _canonical_codes(DC_COUNTS, DC_SYMBOLS)
    ac_codes = _canonical_codes(AC_COUNTS, AC_SYMBOLS)
    bits = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            # MCU at 4:4:4 = one 8x8 block per component, interleaved
            for ci, plane in enumerate(planes):
                prev_dc[ci] = _encode_block(
                    plane[by : by + 8, bx : bx + 8],
                    qtbls[ci], prev_dc[ci], dc_codes, ac_codes, bits,
                )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_bytes = lambda t: bytes(int(t[i, j]) for i, j in _ZIGZAG)  # noqa: E731
    if color:
        dqt = seg(
            0xFFDB,
            b"\x00" + zz_bytes(QUANT_LUMA) + b"\x01" + zz_bytes(QUANT_CHROMA),
        )
        comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + comps)
        # chroma reuses the same canonical table spec under ids (0,1)/(1,1)
        dht = seg(
            0xFFC4,
            b"\x00" + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
            + b"\x10" + bytes(AC_COUNTS) + bytes(AC_SYMBOLS)
            + b"\x01" + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
            + b"\x11" + bytes(AC_COUNTS) + bytes(AC_SYMBOLS),
        )
        sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    else:
        dqt = seg(0xFFDB, b"\x00" + zz_bytes(QUANT_LUMA))
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        dht = seg(
            0xFFC4,
            b"\x00" + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
            + b"\x10" + bytes(AC_COUNTS) + bytes(AC_SYMBOLS),
        )
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bits.flush() + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing."""

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
                self.pos += 2  # stuffed FF
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_table(codes: dict[int, tuple[int, int]]) -> dict[tuple[int, int], int]:
    return {(ln, code): sym for sym, (code, ln) in codes.items()}


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, size: int) -> int:
    """Inverse of _category: sign-extend a magnitude-coded value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_pixels(content: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to its (h, w) uint8 pixels.

    All tables come from the file's own DQT/DHT segments. ValueError for
    corrupt bytes; NotImplementedError for progressive / multi-component /
    12-bit / arithmetic-coded streams (PIL territory)."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_qs: list[int] = []
    scan_tabs: list[tuple[int, int]] = []
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = (content[pos] << 8) | content[pos + 1]
        if marker == 0xFFD9:
            raise ValueError("EOI before scan data")
        (size,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xFFDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (i, j) in enumerate(_ZIGZAG):
                    tbl[i, j] = body[o + 1 + k]
                quant[tq] = tbl
                o += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables per segment)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                counts = list(body[o + 1 : o + 17])
                n = sum(counts)
                symbols = list(body[o + 17 : o + 17 + n])
                huff[(tc, th)] = _decode_table(_canonical_codes(counts, symbols))
                o += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError("unsupported component count")
            # per-component spec after the 6-byte frame header:
            # id, sampling, quant-table id
            for ci in range(ncomp):
                if body[6 + 3 * ci + 1] != 0x11:
                    raise NotImplementedError("subsampled JPEG requires PIL")
                comp_qs.append(body[6 + 3 * ci + 2])
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError("non-baseline JPEG requires PIL")
        elif marker == 0xFFDA:  # SOS — entropy data follows
            ns = body[0]
            for ci in range(ns):
                tb = body[2 + 2 * ci]
                scan_tabs.append((tb >> 4, tb & 0xF))
            break
    else:
        raise ValueError("no SOS marker")
    if h is None or not comp_qs or len(scan_tabs) != len(comp_qs):
        raise ValueError("JPEG missing SOF/DQT/SOS")
    ncomp = len(comp_qs)
    tabs = []
    for ci in range(ncomp):
        if comp_qs[ci] not in quant:
            raise ValueError("JPEG missing DQT")
        dc_tab = huff.get((0, scan_tabs[ci][0]))
        ac_tab = huff.get((1, scan_tabs[ci][1]))
        if dc_tab is None or ac_tab is None:
            raise ValueError("JPEG missing DHT")
        tabs.append((quant[comp_qs[ci]].astype(np.float64), dc_tab, ac_tab))

    br = _BitReader(content, pos)
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.empty((bh, bw), dtype=np.float64) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for ci in range(ncomp):  # MCU at 4:4:4: one block per component
                qtbl, dc_tab, ac_tab = tabs[ci]
                zz = [0] * 64
                size = _read_symbol(br, dc_tab)
                prev_dc[ci] += _extend(br.bits(size), size)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k >= 64:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = np.zeros((8, 8), dtype=np.float64)
                for idx, (i, j) in enumerate(_ZIGZAG):
                    coef[i, j] = zz[idx]
                block = _C.T @ (coef * qtbl) @ _C
                planes[ci][by : by + 8, bx : bx + 8] = block
    if ncomp == 1:
        out = planes[0] + 128.0
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)[:h, :w]
    y, cb, cr = (p + 128.0 for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)[:h, :w]


def decode_jpeg(content: bytes) -> tuple[int, int, float]:
    """Decode a baseline JPEG: (width, height, mean over all samples)."""
    px = decode_jpeg_pixels(content)
    hh, ww = px.shape[:2]
    return (ww, hh, float(px.astype(np.float64).mean()) if px.size else 0.0)
