"""AVI (RIFF) container parse + Motion-JPEG frame extraction, pure stdlib.

This closes the last multimodal stub class: with jpegcodec.py providing a
real baseline-JPEG decoder, an AVI whose video stream is MJPG ('00dc'
chunks, each a complete JFIF image) decodes to REAL pixels end-to-end with
zero native dependencies — container walk here, entropy decode there. A
crawl pipeline meets MJPEG primarily as digitized archive footage and
IP-camera captures; for every other codec (H.264 etc.) the container
metadata below is still the bucketing/budgeting surface and frame decode
stays a declared stub (multimodal.decode_image raises NotImplementedError).

Coverage:
- RIFF chunk walk: little-endian sizes (unlike ISO-BMFF's big-endian),
  WORD alignment (odd-sized chunks padded with one byte), LIST recursion;
- 'avih' main header (frame period, total frames, dimensions);
- 'strl' per-stream headers: 'strh' (fccType/fccHandler, rate/scale ->
  exact fps as a rational) + 'strf' (BITMAPINFOHEADER for video);
- 'movi' frame chunks: '00dc'/'00db' compressed/uncompressed video for
  stream 0; non-video chunks ('01wb' audio etc.) are skipped;
- 'idx1' is tolerated but not required (the movi walk is authoritative —
  OpenDML AVIs routinely carry stale idx1 tables);
- structurally broken payloads (bad magic, truncated chunk, child
  overrunning parent) raise ValueError for dead-letter routing.

Reference behavioral contract: the reference pipeline is text-only
(logai/dataloader/data_loader.py); this extends the multimodal surface in
SURVEY.md §2.13 alongside mp4meta.py (container) and jpegcodec.py (frames).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class AviMeta:
    codec: str          # fccHandler of the first video stream, e.g. "MJPG"
    width: int
    height: int
    n_frames: int       # count of stream-0 video chunks in movi
    fps: float          # strh rate/scale (exact rational in float64)
    duration_ms: int    # n_frames * 1000 * scale / rate, floored


def _chunks(buf: bytes, start: int, end: int):
    """Yield (ckid, body_start, body_end) over the RIFF chunks in
    buf[start:end], honoring WORD alignment between chunks."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError("AVI: truncated chunk header")
        ckid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + size > end:
            raise ValueError("AVI: chunk overruns parent")
        yield ckid, body, body + size
        pos = body + size + (size & 1)  # pad byte after odd-sized chunks


def _list_body(buf: bytes, body: int, bend: int, want: bytes):
    """For a LIST chunk body, check its 4-byte list type and return the
    (start, end) of the contained chunks."""
    if bend - body < 4 or buf[body : body + 4] != want:
        return None
    return body + 4, bend


def parse_avi(payload: bytes) -> AviMeta:
    """Parse container metadata from a RIFF/AVI payload. Exact — every
    field is a fixed-layout struct; no codec work."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("AVI: bad RIFF/AVI magic")
    riff_end = min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))

    width = height = total_frames = 0
    us_per_frame = 0
    codec = ""
    rate = scale = 0
    n_video_chunks = 0
    saw_hdrl = False

    for ckid, body, bend in _chunks(payload, 12, riff_end):
        if ckid != b"LIST":
            continue
        hdrl = _list_body(payload, body, bend, b"hdrl")
        if hdrl:
            saw_hdrl = True
            for cid, b2, e2 in _chunks(payload, *hdrl):
                if cid == b"avih":
                    if e2 - b2 < 40:
                        raise ValueError("AVI: short avih")
                    us_per_frame, _, _, _, total_frames = struct.unpack(
                        "<5I", payload[b2 : b2 + 20]
                    )
                    width, height = struct.unpack("<2I", payload[b2 + 32 : b2 + 40])
                elif cid == b"LIST":
                    strl = _list_body(payload, b2, e2, b"strl")
                    if not strl or codec:
                        continue  # only the FIRST video stream is reported
                    fcc_type = fcc_handler = b""
                    s_rate = s_scale = 0
                    for sid, b3, e3 in _chunks(payload, *strl):
                        if sid == b"strh":
                            if e3 - b3 < 32:
                                raise ValueError("AVI: short strh")
                            fcc_type = payload[b3 : b3 + 4]
                            fcc_handler = payload[b3 + 4 : b3 + 8]
                            s_scale, s_rate = struct.unpack(
                                "<2I", payload[b3 + 20 : b3 + 28]
                            )
                    if fcc_type == b"vids":
                        codec = fcc_handler.decode("latin1").strip("\x00 ")
                        rate, scale = s_rate, s_scale
            continue
        movi = _list_body(payload, body, bend, b"movi")
        if movi:
            for cid, _b2, _e2 in _chunks(payload, *movi):
                if cid in (b"00dc", b"00db"):
                    n_video_chunks += 1

    if not saw_hdrl:
        raise ValueError("AVI: missing hdrl")
    if rate and scale:
        fps = rate / scale
    elif us_per_frame:
        fps = 1_000_000.0 / us_per_frame
    else:
        fps = 0.0
    n = n_video_chunks or total_frames
    duration_ms = int(n * 1000 * scale // rate) if rate and scale else 0
    return AviMeta(codec, width, height, n, fps, duration_ms)


def avi_frames(payload: bytes) -> list[bytes]:
    """Extract the stream-0 video chunk payloads ('00dc'/'00db') in movi
    order — for MJPG each element is a complete JFIF JPEG image."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("AVI: bad RIFF/AVI magic")
    riff_end = min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))
    frames: list[bytes] = []
    for ckid, body, bend in _chunks(payload, 12, riff_end):
        if ckid != b"LIST":
            continue
        movi = _list_body(payload, body, bend, b"movi")
        if movi:
            for cid, b2, e2 in _chunks(payload, *movi):
                if cid in (b"00dc", b"00db"):
                    frames.append(payload[b2:e2])
    return frames


# --- encoder (fixture/synthesis side) ---------------------------------------


def _chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    rate: int = 30,
    scale: int = 1,
    handler: bytes = b"MJPG",
    with_idx1: bool = True,
) -> bytes:
    """Assemble a spec-shaped single-video-stream AVI from pre-encoded
    frame payloads (JPEGs for MJPG). Writes avih + strl(strh, strf
    BITMAPINFOHEADER) + movi + idx1."""
    avih = _chunk(
        b"avih",
        struct.pack(
            "<10I",
            1_000_000 * scale // rate,        # dwMicroSecPerFrame
            0, 0, 0x10,                       # maxbytes, padding, HASINDEX
            len(frames), 0, 1,                # totalframes, initial, streams
            max((len(f) for f in frames), default=0),
            width, height,
        )
        + bytes(16),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + handler.ljust(4, b"\x00")
        + struct.pack("<3I", 0, 0, 0)          # flags, prio+lang, initial
        + struct.pack("<2I", scale, rate)
        + struct.pack("<3I", 0, len(frames),   # start, length
                      max((len(f) for f in frames), default=0))
        + struct.pack("<iI", -1, 0)            # quality, samplesize
        + struct.pack("<4H", 0, 0, width, height),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<I2i2H2I2i2I",
            40, width, height, 1, 24,
            int.from_bytes(handler.ljust(4, b"\x00"), "little"),
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    idx1 = b""
    if with_idx1:
        entries, off = [], 4  # offsets are relative to the 'movi' fourcc
        for f in frames:
            entries.append(b"00dc" + struct.pack("<3I", 0x10, off, len(f)))
            off += 8 + len(f) + (len(f) & 1)
        idx1 = _chunk(b"idx1", b"".join(entries))
    body = (
        b"AVI "
        + _list(b"hdrl", avih + _list(b"strl", strh + strf))
        + _list(b"movi", movi_body)
        + idx1
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_avi_params(media_id: int) -> tuple[int, int, int, int, int]:
    """(n_frames, width, height, rate, scale) for the deterministic
    fixture — rate/scale cycles through NTSC-style rationals so fps is a
    non-trivial float, frame count varies 2..4."""
    n_frames = 2 + media_id % 3
    rate, scale = ((30, 1), (30000, 1001), (24, 1), (15, 1))[media_id % 4]
    return n_frames, 32, 16, rate, scale


def synth_avi_frame_pixels(media_id: int, frame_idx: int, seed: int = 7):
    """Pixels for one fixture frame: the flat 8x8 gray-block class the
    baseline JPEG codec round-trips BIT-EXACTLY (jpegcodec docstring), so
    AVI frame stats get a value-hash oracle despite a lossy codec. The
    per-frame id keys the block pattern to (video, frame)."""
    from logai_spark.functions.multimodal import synth_block_gray_pixels

    return synth_block_gray_pixels(media_id * 1009 + frame_idx, seed)


def synth_avi(media_id: int, seed: int = 7) -> bytes:
    """Deterministic per-id MJPEG AVI. Component layout cycles 4:4:4 /
    4:2:0 / grayscale by (id + frame) so a corpus decode exercises every
    JPEG path; frame counts and fps rationals cycle by id."""
    from logai_spark.functions.jpegcodec import encode_jpeg

    n_frames, w, h, rate, scale = synth_avi_params(media_id)
    frames = []
    for fi in range(n_frames):
        variant = (media_id + fi) % 3
        frames.append(
            encode_jpeg(
                synth_avi_frame_pixels(media_id, fi, seed),
                subsample=(variant == 1),
                gray=(variant == 2),
            )
        )
    return encode_avi(frames, w, h, rate=rate, scale=scale)
