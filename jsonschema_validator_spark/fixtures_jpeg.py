"""Baseline JPEG ENCODER for planted-payload oracles and tests.

This is fixture SYNTHESIS, deliberately disjoint from the decoder in
``operators/jpegdec.py`` (the same discipline as the PNG/WAV planting
in __spark_entry__: the writer shares no code with the parser, so the
round trip genuinely checks the decoder). Emits ITU-T T.81 baseline
sequential JPEGs: SOI, DQT, SOF0, DHT (the Annex K.3 typical tables),
optional DRI, SOS, Huffman-coded entropy data with 0xFF00 stuffing and
RSTn restart markers, EOI. Grayscale (1 component) or YCbCr with per-
component sampling factors.

Determinism: pure integer/float arithmetic on the input planes; no
randomness, no wall clock — the same planes always serialize to the
same bytes, which is what lets contract queries pin pixel sums.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS list, HUFFVAL bytes)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = bytes([
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
])
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_LUMA = (_AC_LUMA_BITS, _AC_LUMA_VALS)
_AC_CHROMA = (_AC_CHROMA_BITS, _AC_CHROMA_VALS)


def _huff_codes(bits, vals):
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


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
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    M = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    M[0, :] *= 1 / np.sqrt(2)
    return M


_DCT_M = _dct_matrix()


def _fdct_block(block8: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT (T.81 A.3.3) of one level-shifted 8x8 block."""
    return _DCT_M @ block8 @ _DCT_M.T


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (ssss category, magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(writer, coeffs, pred, dc_codes, ac_codes):
    s, bits = _magnitude(int(coeffs[0]) - pred)
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(bits, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coeffs[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coeffs[0])


def encode_baseline_jpeg(
    planes: list[np.ndarray],
    sampling: list[tuple[int, int]] | None = None,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Serialize component planes (uint8 2-D arrays, full-resolution
    dims for plane 0; chroma planes pre-subsampled by the caller to
    ceil(dim * h_c / h_max)) to a baseline JPEG. ``planes`` of length 1
    -> grayscale, 3 -> YCbCr. ``sampling`` gives (h, v) per component
    (default all (1, 1) = 4:4:4). Quant tables are flat-64 arrays in
    ZIGZAG order (default: all ones — near-lossless)."""
    ncomp = len(planes)
    if sampling is None:
        sampling = [(1, 1)] * ncomp
    q_l = np.ones(64) if quant_luma is None else np.asarray(quant_luma, dtype=np.float64)
    q_c = np.ones(64) if quant_chroma is None else np.asarray(quant_chroma, dtype=np.float64)
    height, width = planes[0].shape
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    # DQT (8-bit precision), table 0 = luma, table 1 = chroma
    seg(0xDB, bytes([0x00]) + bytes(int(q_l[z]) for z in range(64)))
    if ncomp == 3:
        seg(0xDB, bytes([0x01]) + bytes(int(q_c[z]) for z in range(64)))
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        h, v = sampling[c]
        sof += bytes([c + 1, (h << 4) | v, 0 if c == 0 else 1])
    seg(0xC0, sof)
    # DHT
    def dht(tc, th, table):
        bits, vals = table
        seg(0xC4, bytes([(tc << 4) | th] + bits) + vals)

    dht(0, 0, _DC_LUMA)
    dht(1, 0, _AC_LUMA)
    if ncomp == 3:
        dht(0, 1, _DC_CHROMA)
        dht(1, 1, _AC_CHROMA)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_codes = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_codes = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    qts = [q_l, q_c]

    # pad each plane to its own MCU-grid size by edge replication
    padded = []
    for c in range(ncomp):
        h, v = sampling[c]
        ph, pw = mcuy * v * 8, mcux * h * 8
        pl = np.asarray(planes[c], dtype=np.float64)
        pl = np.pad(
            pl, ((0, ph - pl.shape[0]), (0, pw - pl.shape[1])), mode="edge"
        )
        padded.append(pl)

    writer = _BitWriter()
    preds = [0] * ncomp
    mcus_in_seg = 0
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcus_in_seg == restart_interval:
            writer.flush()
            out.extend(writer.out)
            writer = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            preds = [0] * ncomp
            mcus_in_seg = 0
        my, mx = divmod(mcu, mcux)
        for c in range(ncomp):
            h, v = sampling[c]
            t = 0 if c == 0 else 1
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    blk = padded[c][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    S = _fdct_block(blk)
                    flat = S.reshape(64)
                    zz = np.array(
                        [flat[_ZIGZAG[z]] for z in range(64)]
                    )
                    coeffs = np.round(zz / qts[t]).astype(np.int64)
                    preds[c] = _encode_block(
                        writer, coeffs, preds[c], dc_codes[t], ac_codes[t]
                    )
        mcus_in_seg += 1
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
