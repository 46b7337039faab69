"""Baseline JPEG (SOF0) codec — stdlib + numpy only.

The last piece of the multimodal "real decode" story: PPM (uncompressed)
and PNG (zlib DEFLATE) are exact round-trips; JPEG is the one format
whose ENTROPY CODING layer (Huffman over DCT coefficients) has no
stdlib codec, so this module implements it directly — a complete
baseline-sequential encoder/decoder pair:

encode: RGB → JFIF YCbCr → 8×8 block DCT-II (exact matrix form) →
        quantization (caller-supplied tables; default ALL-ONES, i.e.
        near-lossless — error is float-rounding only) → zigzag →
        DC-differential + Annex-K standard Huffman tables → bitstream
        with 0xFF00 stuffing → SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers.
decode: marker walk (DQT/SOF0/DHT/DRI/SOS), Huffman decode with
        receive/extend magnitude coding, dequantize, inverse zigzag,
        IDCT, level shift, YCbCr → RGB, crop to the SOF dimensions.

Scope is the 4:4:4 baseline subset the engine's own encoder emits
(1×1 sampling factors, 8-bit, interleaved single scan, restart
intervals accepted and resynced); anything else — progressive,
subsampled, arithmetic-coded — raises ``ValueError`` rather than
guessing, the same contract as ``png_parse``.

JPEG is LOSSY, so unlike PPM/PNG there is no byte-exact oracle; the
registry query (queries/llm.py multimodal_jpeg_roundtrip) instead
hash-checks the QUANTIZATION-ERROR CONTRACT — decoded dimensions and
per-image error bounds computed Spark-side, predicted exactly by the
DuckDB twin — and tests/test_llm_ops.py pins the error laws.

Reference parity note: the reference DSL (dpp.py) has no media stage at
all; this is part of the §2.2.10 multimodal surface SURVEY.md declares.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_encode", "jpeg_parse"]

# ---------------------------------------------------------------------- #
# constants                                                              #
# ---------------------------------------------------------------------- #

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# JPEG Annex K standard Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
        0xF9, 0xFA,
    ],
)

# 8×8 DCT-II orthonormal matrix: DCT = C @ block @ C.T
_C = np.array([
    [
        (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])

_UNIT_Q = np.ones(64, dtype=np.int64)


def _huff_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decoder(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # marker-byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = (
                    self.data[self.pos] if self.pos < len(self.data)
                    else 0
                )
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: byte-align + reset handled by
                    # caller via sync(); don't consume here
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map an n-bit magnitude to its signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value → (category n, n-bit code) per JPEG CSIZE."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    return n, (v if v > 0 else v + (1 << n) - 1)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _blocks(comp: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to 8-multiples and return (n, 8, 8)."""
    h, w = comp.shape
    ph, pw = (-h) % 8, (-w) % 8
    comp = np.pad(comp, ((0, ph), (0, pw)), mode="edge")
    bh, bw = comp.shape[0] // 8, comp.shape[1] // 8
    return (
        comp.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        .reshape(bh * bw, 8, 8)
    ), bh, bw


def jpeg_encode(
    width: int,
    height: int,
    rgb: bytes,
    *,
    luma_q: np.ndarray | None = None,
    chroma_q: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential 4:4:4 JPEG for a width×height RGB buffer.

    Quant tables default to ALL ONES (near-lossless: the only loss is
    DCT/IDCT float rounding + color-space rounding, a few units per
    channel) — the setting that makes the decode contract testable with
    tight bounds.  Pass real tables for lossy behavior."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb buffer is {len(rgb)} bytes, want {width * height * 3}"
        )
    lq = _UNIT_Q if luma_q is None else np.asarray(luma_q, np.int64)
    cq = _UNIT_Q if chroma_q is None else np.asarray(chroma_q, np.int64)
    if lq.shape != (64,) or cq.shape != (64,):
        raise ValueError("quant tables must be 64 zigzag-order entries")

    arr = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(arr)

    dc_codes = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_codes = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    qtabs = [lq, cq]

    # per-component block DCT + quantize (zigzag order)
    comp_coeffs = []
    for ci in range(3):
        blocks, bh, bw = _blocks(ycc[..., ci] - 128.0)
        dct = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        tid = 0 if ci == 0 else 1
        zz = dct.reshape(-1, 64)[:, _ZIGZAG]
        comp_coeffs.append(
            np.rint(zz / qtabs[tid]).astype(np.int64)
        )
    n_blocks = comp_coeffs[0].shape[0]

    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for b in range(n_blocks):
        if restart_interval and b and b % restart_interval == 0:
            # byte-align (1-fill), emit RSTn, reset DC prediction
            w.buf = bytearray(w.flush())
            w.acc = 0
            w.nbits = 0
            w.buf += bytes(
                [0xFF, 0xD0 + ((b // restart_interval - 1) % 8)]
            )
            prev_dc = [0, 0, 0]
        for ci in range(3):
            tid = 0 if ci == 0 else 1
            coef = comp_coeffs[ci][b]
            diff = int(coef[0]) - prev_dc[ci]
            prev_dc[ci] = int(coef[0])
            n, code = _magnitude(diff)
            hc, hl = dc_codes[tid][n]
            w.write(hc, hl)
            if n:
                w.write(code, n)
            run = 0
            last_nz = 0
            for k in range(63, 0, -1):
                if coef[k]:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = int(coef[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    hc, hl = ac_codes[tid][0xF0]  # ZRL
                    w.write(hc, hl)
                    run -= 16
                n, code = _magnitude(v)
                hc, hl = ac_codes[tid][(run << 4) | n]
                w.write(hc, hl)
                w.write(code, n)
                run = 0
            if last_nz < 63:
                hc, hl = ac_codes[tid][0x00]  # EOB
                w.write(hc, hl)
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) & 0xFF for x in q))

    def dht(cls: int, tid: int, table) -> bytes:
        bits, vals = table
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + app0 + dqt(0, lq) + dqt(1, cq) + sof
        + dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
        + dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
        + dri + sos + scan + b"\xff\xd9"
    )


def jpeg_parse(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential 4:4:4 JPEG → (width, height, rgb).

    Supports the subset ``jpeg_encode`` emits plus restart intervals;
    progressive (SOF2), subsampled, 12-bit, and arithmetic-coded
    streams raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG SOI marker")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comps = []  # (id, qtab_id)
    scan_comps = []  # (id, dc_tid, ac_tid)
    restart = 0
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tid = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tid] = np.frombuffer(
                    body[o + 1 : o + 65], np.uint8
                ).astype(np.int64)
                o += 65
        elif marker in (0xFFC0, 0xFFC1):
            depth, height, width, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8 or nc != 3:
                raise ValueError("unsupported JPEG precision/components")
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, qid))
        elif marker in (0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise ValueError("progressive/arithmetic JPEG unsupported")
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                o += 17 + n
        elif marker == 0xFFDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            ns = body[0]
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if width is None or data_start is None:
        raise ValueError("JPEG missing SOF/SOS")

    # locate EOI (scan data may contain stuffed FF00 and RSTn)
    end = len(payload)
    i = data_start
    while i + 1 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] == 0xD9:
            end = i
            break
        i += 1
    reader = _BitReader(payload[data_start:end])

    bh, bw = (height + 7) // 8, (width + 7) // 8
    n_blocks = bh * bw
    comp_out = [
        np.zeros((n_blocks, 64), np.int64) for _ in range(3)
    ]
    qid_by_cid = dict(comps)

    def decode_huff(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    prev_dc = [0, 0, 0]
    for b in range(n_blocks):
        if restart and b and b % restart == 0:
            reader.sync_restart()
            prev_dc = [0, 0, 0]
        for ci, (cid, dct_id, act_id) in enumerate(scan_comps):
            dc_tab = huff[(0, dct_id)]
            ac_tab = huff[(1, act_id)]
            n = decode_huff(dc_tab)
            diff = _extend(reader.receive(n), n)
            prev_dc[ci] += diff
            coef = comp_out[ci][b]
            coef[0] = prev_dc[ci]
            k = 1
            while k <= 63:
                rs = decode_huff(ac_tab)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("JPEG AC index overflow")
                coef[k] = _extend(reader.receive(size), size)
                k += 1

    planes = []
    for ci, (cid, dct_id, act_id) in enumerate(scan_comps):
        q = qtabs[qid_by_cid[cid]]
        deq = comp_out[ci] * q
        blocks = np.zeros((n_blocks, 8, 8))
        flat = np.zeros((n_blocks, 64))
        flat[:, _ZIGZAG] = deq
        blocks = flat.reshape(n_blocks, 8, 8)
        spat = np.einsum("xu,nuv,yv->nxy", _C.T, blocks, _C.T)
        full = (
            spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        planes.append(full[:height, :width] + 128.0)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return width, height, rgb.tobytes()
