"""Pure-Python GIF87a/89a codec (single-frame) for the multimodal ingest.

Closes the third real web image format (after BMP/PNG in multimodal.py and
baseline JPEG in jpegcodec.py) with zero extra dependencies: GIF is
palette-indexed + LZW, both implementable exactly in stdlib Python, and the
format is LOSSLESS for any image of <=256 distinct colors — so the oracle
row checks value-exact stats on arbitrary palette-limited fixtures.

Decoder coverage (the web-ingest contract is decode-or-dead-letter, never
silently garble):
- GIF87a and GIF89a signatures;
- global and local color tables;
- variable-width LSB-first LZW with code-size growth to 12 bits, CLEAR
  code resets, and the deferred-clear corner (code width stays at 12 until
  the encoder emits CLEAR — GIF spec appendix F);
- interlaced images (the 4-pass 8/8-4/8-2/4-1/2 row order);
- extension blocks (graphic control / comment / application) are skipped;
  only the FIRST image descriptor is decoded (animation frames beyond it
  are ignored by design — the ingest wants a thumbnail-grade still);
- anything structurally out of contract (missing trailer mid-stream,
  LZW code beyond the dictionary, index beyond the palette) raises.

Reference behavioral contract: the reference pipeline has no image path at
all (logai/dataloader/data_loader.py handles text only); this module is
part of the multimodal extension surface described in SURVEY.md §2.13.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first, CLEAR/EOI codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode GIF LZW ``data`` (concatenated sub-block payload) into exactly
    ``n_expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as parent-pointer arrays: prefix code + appended byte.
    # 4096 max codes per spec; rebuilt on CLEAR.
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)  # first byte of each code's string
    for i in range(clear):
        suffix[i] = i
        first[i] = i

    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    code_size = min_code_size + 1
    next_code = eoi + 1
    prev = -1

    bitbuf = 0
    nbits = 0
    pos = 0
    ndata = len(data)
    stack = bytearray()

    while n_out < n_expected:
        while nbits < code_size:
            if pos >= ndata:
                raise ValueError("GIF LZW stream truncated")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size

        if code == clear:
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break

        if prev < 0:  # first code after (implicit) clear: must be literal
            if code >= clear:
                raise ValueError("GIF LZW: non-literal first code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue

        if code < next_code:
            cur = code
        elif code == next_code:  # KwKwK case: string = string(prev) + first(prev)
            cur = prev
            stack.append(first[prev])
        else:
            raise ValueError("GIF LZW: code beyond dictionary")

        # emit string(cur) by walking parent pointers (reversed), plus the
        # KwKwK extra byte already on the stack
        c = cur
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        take = min(len(stack), n_expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            bytes(stack[::-1][:take]), dtype=np.uint8
        )
        n_out += take
        stack.clear()

        if next_code < 4096:
            # new entry = string(prev) + first byte of string(code); in the
            # KwKwK case cur == prev so first[cur] is that byte either way
            prefix[next_code] = prev
            suffix[next_code] = first[cur]
            first[next_code] = first[prev]
            next_code += 1
            # decoder grows one entry later than the encoder (its dictionary
            # lags one assignment) — post-increment test pairs with the
            # encoder's pre-increment test, verified by round-trip tests
            if next_code >= (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    if n_out < n_expected:
        raise ValueError("GIF LZW: stream ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encoder (emits CLEAR first, EOI last, resets on full dict)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)

    buf = b""
    for v in indices.tobytes():
        cand = buf + bytes([v])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # dict full: reset (keeps decoder dictionaries bounded)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = bytes([v])
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) per pass


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode HxWx3 uint8 RGB (<=256 distinct colors) as single-frame
    GIF89a with a global color table. Lossless by construction."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF needs <=256 distinct colors")
    # color-table size: power of two >= len(palette), min 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_n = 1 << bits
    pal_bytes = palette.astype(np.uint8).tobytes() + b"\x00" * (
        3 * (table_n - len(palette))
    )
    idx = indices.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
        idx = idx[rows]

    min_code = max(2, bits)
    lzw = _lzw_encode(idx.reshape(-1), min_code)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub.append(len(chunk))
        sub.extend(chunk)
    sub.append(0)

    header = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    img_desc = b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
    )
    return header + pal_bytes + img_desc + bytes([min_code]) + bytes(sub) + b"\x3b"


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a payload to HxWx3 uint8 RGB.

    Structurally malformed payloads (truncated blocks, short headers)
    always raise ValueError so the ingest's dead-letter routing catches
    one exception type."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF: truncated or malformed payload ({e})") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    pos = 6
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        global_pal = global_pal.reshape(n, 3)
        pos += 3 * n

    while True:
        if pos >= len(payload):
            raise ValueError("GIF: no image descriptor before end of data")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF: trailer before any image descriptor")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image has no color table")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError("GIF: bad LZW min code size")
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1

        idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            order = [
                r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
            ]
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: palette index out of range")
        return pal[idx]
