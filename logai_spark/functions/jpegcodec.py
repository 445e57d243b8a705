"""Baseline JPEG codec — pure Python/numpy, zero dependencies.

Decoder: baseline sequential DCT JPEG (SOF0) — marker parse, DQT/DHT
tables, per-MCU Huffman entropy decode with byte unstuffing and DC
prediction, dequantize, float 8x8 IDCT (exact basis matrix, no integer
approximation), JFIF YCbCr -> RGB. Component layouts: single-component
grayscale, 4:4:4, and 4:2:0 (2x2 chroma replication upsample). Progressive
(SOF2), arithmetic coding, 12-bit precision and restart markers are
rejected loudly — this is the web-corpus ingest seam, and anything it
cannot parse must dead-letter, not silently garble.

Encoder: the matching baseline writer (4:4:4, standard Annex K Huffman
tables, caller-supplied or flat quantization) used by the test fixtures
and the oracle row.

Exactness contract (what makes an oracle row possible for a LOSSY codec):
for images built from flat 8x8 gray blocks (r=g=b=v, block-aligned), the
full pipeline is bit-exact — Y=v and Cb=Cr=128 exactly, every AC
coefficient is 0, and with the DC quant step set to 8 the quantized DC is
the integer v-128, whose DC-only IDCT is exactly v-128 in float64. So
encode -> decode reproduces the pixels EXACTLY while still exercising the
marker parser, Huffman coder, DC prediction chain, byte stuffing, IDCT and
color conversion. Arbitrary images round-trip within normal lossy bounds
(tests pin a mean-abs-error ceiling).

Public-knowledge sources: ITU-T T.81 (the JPEG spec; Annex K tables),
JFIF 1.02 color conversion. No reference-repo analog (salesforce/logai has
no media surface).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# exact float64 DCT-II basis: _DCT_M[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (float64): f = M^T F M."""
    return _DCT_M.T @ block @ _DCT_M


def _fdct2(block: np.ndarray) -> np.ndarray:
    """8x8 forward DCT (float64): F = M f M^T."""
    return _DCT_M @ block @ _DCT_M.T


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _huff_encode_table(bits, values):
    """symbol -> (code, length) from a (bits, values) DHT spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> tuple[int, int]:
    """JPEG magnitude category + the category-coded bits for value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw, plane, by, bx, h, w, qmat, dct, act, pred, ci):
    """DCT + quantize + Huffman-code one 8x8 block (edge-replicated pad)."""
    ys = np.clip(np.arange(by, by + 8), 0, h - 1)
    xs = np.clip(np.arange(bx, bx + 8), 0, w - 1)
    block = plane[np.ix_(ys, xs)] - 128.0
    coef = np.round(_fdct2(block) / qmat).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    n, bits = _category(diff)
    code, ln = dct[n]
    bw.write(code, ln)
    bw.write(bits, n)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = act[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        n, bits = _category(v)
        code, ln = act[(run << 4) | n]
        bw.write(code, ln)
        bw.write(bits, n)
        run = 0
    if last_nz < 63:
        code, ln = act[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(
    img: np.ndarray,
    dc_q: int = 8,
    ac_q: int = 16,
    subsample: bool = False,
    gray: bool = False,
) -> bytes:
    """Encode HxWx3 uint8 RGB as baseline JFIF JPEG with Annex K Huffman
    tables and flat quantization (``dc_q`` for DC, ``ac_q`` for all AC).
    ``subsample=True`` writes 4:2:0 (2x2-averaged chroma) instead of 4:4:4;
    ``gray=True`` writes a single-component grayscale scan from the Y
    plane. Dimensions pad to the MCU grid by edge replication (the decoder
    crops back via SOF dims). dc_q=8 makes flat gray blocks bit-exact
    (module docstring)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

    qt = np.full(64, ac_q, np.int64)
    qt[0] = dc_q
    qmat = qt[np.argsort(ZIGZAG)].reshape(8, 8).astype(np.float64)

    dc_lum = _huff_encode_table(*_DC_LUM)
    ac_lum = _huff_encode_table(*_AC_LUM)
    dc_chr = _huff_encode_table(*_DC_CHR)
    ac_chr = _huff_encode_table(*_AC_CHR)

    bw = _BitWriter()
    pred = [0, 0, 0]
    if gray:
        for by in range(0, -(-h // 8) * 8, 8):
            for bx in range(0, -(-w // 8) * 8, 8):
                _encode_block(bw, y, by, bx, h, w, qmat, dc_lum, ac_lum, pred, 0)
        sof_comps = bytes([1, 0x11, 0])
        sos_comps = bytes([1, 1, 0x00])
        n_comp = 1
    elif subsample:
        # 2x2 box-average chroma at even grid (pad odd dims by edge rep)
        ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
        def _pad(p):
            return np.pad(p, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
        cbs = _pad(cb).reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        crs = _pad(cr).reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        ch, cw = cbs.shape
        for my in range(0, -(-h // 16)):
            for mx in range(0, -(-w // 16)):
                for vy in range(2):
                    for vx in range(2):
                        _encode_block(
                            bw, y, my * 16 + vy * 8, mx * 16 + vx * 8,
                            h, w, qmat, dc_lum, ac_lum, pred, 0,
                        )
                _encode_block(bw, cbs, my * 8, mx * 8, ch, cw, qmat, dc_chr, ac_chr, pred, 1)
                _encode_block(bw, crs, my * 8, mx * 8, ch, cw, qmat, dc_chr, ac_chr, pred, 2)
        sof_comps = bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos_comps = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
        n_comp = 3
    else:
        for by in range(0, -(-h // 8) * 8, 8):
            for bx in range(0, -(-w // 8) * 8, 8):
                for ci, (plane, dt, at) in enumerate(
                    ((y, dc_lum, ac_lum), (cb, dc_chr, ac_chr), (cr, dc_chr, ac_chr))
                ):
                    _encode_block(bw, plane, by, bx, h, w, qmat, dt, at, pred, ci)
        sof_comps = bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos_comps = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
        n_comp = 3
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                                   # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(int(v) for v in qt))        # DQT id 0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, n_comp) + sof_comps)
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if n_comp == 3:
        tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc_th, (bits, values) in tables:
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(values))
    out += seg(0xFFDA, sos_comps + bytes([0, 63, 0]))
    out += entropy
    out += b"\xFF\xD9"                                              # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    """MSB-first bit reader over the entropy segment with 0xFF00
    unstuffing; any other 0xFFxx marker mid-scan is a loud error."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("restart markers not supported")
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_tree(bits, values):
    """code-string prefix dict: (code_int, length) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(code, length)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(bits: int, n: int) -> int:
    if n == 0:
        return 0
    return bits if bits >= (1 << (n - 1)) else bits - (1 << n) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG (SOF0) to HxWx3 uint8 RGB. Grayscale,
    4:4:4 and 4:2:0 layouts; everything else rejects loudly (module
    docstring)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[int, dict] = {}
    frame = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) supported, got SOF{marker - 0xC0}"
            )
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_tq = body[i]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables not supported")
                qts[pq_tq & 0xF] = np.frombuffer(
                    body, np.uint8, 64, i + 1
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                values = list(body[i + 17 : i + 17 + nv])
                hts[tc_th] = _huff_decode_tree(bits, values)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for ci in range(ns):
                cs, tables = body[1 + ci * 2 : 3 + ci * 2]
                sel[cs] = (tables >> 4, tables & 0xF)
            scan = sel
            pos = pos + 2 + ln
            break
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        pos = pos + 2 + ln
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    layouts = sorted((c["h"], c["v"]) for c in comps)
    if len(comps) == 1:
        pass  # grayscale, any single sampling factor
    elif layouts == [(1, 1), (1, 1), (1, 1)] or layouts == [(1, 1), (1, 1), (2, 2)]:
        pass  # 4:4:4 / 4:2:0
    else:
        raise NotImplementedError(f"unsupported sampling layout {layouts}")

    h, w = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)
    br = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    plane = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    }
    inv_zig = np.argsort(ZIGZAG)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                dc_t, ac_t = scan[c["id"]]
                dct = hts[0x00 | dc_t]
                act = hts[0x10 | ac_t]
                q = qts[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        n = _read_symbol(br, dct)
                        diff = _extend(br.bits(n), n)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC coefficient run overflow")
                            size = rs & 0xF
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = (zz * q)[inv_zig].reshape(8, 8).astype(np.float64)
                        px = _idct2(coef) + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        plane[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
    if len(comps) == 1:
        g = np.clip(np.round(plane[comps[0]["id"]][:h, :w]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    # chroma replication upsample to full resolution, then JFIF -> RGB
    full = []
    for c in comps:
        p = plane[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
