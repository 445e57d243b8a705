"""MP4 / ISO-BMFF container metadata extraction, pure stdlib.

Same rationale as mp3meta.py: a crawl pipeline buckets and budgets video
assets on CONTAINER metadata (duration, track layout, dimensions, brand)
— the ffprobe surface — which lives entirely in the `moov` box tree as
fixed-layout structs. No codec work is required, so this is exact with
zero dependencies; decoding actual frames (H.264 etc.) stays a declared
stub in multimodal.py (sample_video_frames keeps its fake path).

Coverage:
- box walk with 32-bit sizes, 64-bit `largesize` (size==1) and
  size==0 = "extends to EOF";
- `ftyp` major brand;
- `mvhd` version 0 (32-bit fields) and 1 (64-bit): movie timescale +
  duration;
- per-trak `tkhd` (16.16 fixed-point width/height), `mdhd` (track
  timescale/duration) and `hdlr` (handler: vide/soun/...) so the op
  reports has_video/has_audio and the video dimensions;
- structurally broken payloads (short boxes, child overrunning parent,
  missing moov/mvhd) raise ValueError for dead-letter routing.

Reference behavioral contract: the reference pipeline is text-only
(logai/dataloader/data_loader.py); this extends the multimodal surface
in SURVEY.md §2.13.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class Mp4Meta:
    brand: str
    duration_ms: int
    n_tracks: int
    has_video: bool
    has_audio: bool
    width: int  # 0 when no video track
    height: int


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in buf[start:end]."""
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError("MP4: truncated box header")
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if end - pos < 16:
                raise ValueError("MP4: truncated largesize")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4: box {typ!r} overruns its parent")
        yield typ, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, b, e in _boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


def parse_mp4_meta(payload: bytes) -> Mp4Meta:
    """Parse the moov tree of an ISO-BMFF payload into stream metadata."""
    n = len(payload)
    brand = ""
    moov = None
    for typ, b, e in _boxes(payload, 0, n):
        if typ == b"ftyp" and e - b >= 4:
            brand = payload[b : b + 4].decode("latin1").strip()
        elif typ == b"moov":
            moov = (b, e)
    if moov is None:
        raise ValueError("MP4: no moov box")

    mvhd = _find(payload, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("MP4: moov has no mvhd")
    b, e = mvhd
    ver = payload[b]
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, b + 20)
    else:
        timescale, duration = struct.unpack_from(">II", payload, b + 12)
    if timescale == 0:
        raise ValueError("MP4: zero mvhd timescale")

    n_tracks = 0
    has_video = has_audio = False
    width = height = 0
    for typ, tb, te in _boxes(payload, *moov):
        if typ != b"trak":
            continue
        n_tracks += 1
        tkhd = _find(payload, tb, te, b"tkhd")
        mdia = _find(payload, tb, te, b"mdia")
        handler = b""
        if mdia is not None:
            hdlr = _find(payload, *mdia, b"hdlr")
            if hdlr is not None:
                hb, _he = hdlr
                handler = payload[hb + 8 : hb + 12]
        if handler == b"vide":
            has_video = True
            if tkhd is not None:
                kb, ke = tkhd
                kver = payload[kb]
                # width/height are the LAST two u32 (16.16) of tkhd
                w16, h16 = struct.unpack_from(">II", payload, ke - 8)
                width, height = w16 >> 16, h16 >> 16
        elif handler == b"soun":
            has_audio = True
    return Mp4Meta(
        brand=brand,
        duration_ms=int(duration * 1000 // timescale),
        n_tracks=n_tracks,
        has_video=has_video,
        has_audio=has_audio,
        width=width,
        height=height,
    )


# ---------------------------------------------------------------------------
# deterministic fixture encoder (real box structure; mdat is seeded filler)
# ---------------------------------------------------------------------------


def _box(typ: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(typ, bytes([ver]) + flags.to_bytes(3, "big") + body)


def synth_mp4(media_id: int, seed: int = 7) -> bytes:
    """Deterministic per-id MP4 with REAL box structure. Cycles by id:
    mvhd version 0/1, video-only / audio-only / av track layouts, a
    64-bit `largesize` mdat every 3rd id."""
    import hashlib

    p = synth_mp4_meta_tuple(media_id, seed)
    brand, duration_ms, n_tracks, has_video, has_audio, width, height = p
    # multiples of 1000 so duration_ms -> ticks -> duration_ms is exact
    # (an arbitrary timescale floors twice and can lose a millisecond)
    timescale = 1000 * (1 + media_id % 5)
    duration = duration_ms * timescale // 1000
    ver = media_id % 2

    if ver == 1:
        mvhd_body = (
            struct.pack(">QQ", 0, 0)
            + struct.pack(">IQ", timescale, duration)
            + bytes(80)
        )
    else:
        mvhd_body = (
            struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + bytes(80)
        )

    traks = b""
    handlers = ([b"vide"] if has_video else []) + ([b"soun"] if has_audio else [])
    for ti, handler in enumerate(handlers):
        tkhd_body = bytes(72) + struct.pack(
            ">II",
            (width << 16) if handler == b"vide" else 0,
            (height << 16) if handler == b"vide" else 0,
        )
        hdlr = _full(b"hdlr", 0, 0, bytes(4) + handler + bytes(12))
        mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration) + bytes(4))
        mdia = _box(b"mdia", mdhd + hdlr)
        traks += _box(b"trak", _full(b"tkhd", 0, 7, tkhd_body) + mdia)

    moov = _box(b"moov", _full(b"mvhd", ver, 0, mvhd_body) + traks)
    ftyp = _box(b"ftyp", brand.encode("latin1").ljust(4) + struct.pack(">I", 0) + b"isom")
    filler = hashlib.md5(f"{seed}:mp4:{media_id}".encode()).digest() * 4
    mdat = _box(b"mdat", filler, large=(media_id % 3 == 0))
    # free box between moov and mdat exercises skip-unknown
    return ftyp + moov + _box(b"free", b"\x00" * (media_id % 9)) + mdat


def synth_mp4_meta_tuple(media_id: int, seed: int = 7):
    """Oracle-side expected metadata from the same deterministic params."""
    brand = ("isom", "mp42", "dash")[media_id % 3]
    duration_ms = 1000 + (media_id * 731) % 90000
    layout = media_id % 4  # 0/1 av, 2 video-only, 3 audio-only
    has_video = layout != 3
    has_audio = layout in (0, 1, 3)
    width = 160 + (media_id % 6) * 80 if has_video else 0
    height = 120 + (media_id % 6) * 60 if has_video else 0
    n_tracks = int(has_video) + int(has_audio)
    return brand, duration_ms, n_tracks, has_video, has_audio, width, height
