"""MP3 frame-header metadata extraction, pure stdlib.

A 100-TB crawl pipeline rarely needs MP3 *samples* — it needs per-asset
metadata (duration, bitrate, sample rate, channel count, CBR/VBR) to
filter, bucket and budget audio corpora, i.e. what ffprobe reports. That
requires only the frame HEADERS (4 bytes each, positions derived from the
bitrate/samplerate fields), not the Huffman-coded audio payload — so this
is implementable exactly with zero dependencies, and `decode_audio`'s MP3
PCM path stays a declared stub (multimodal.py).

Coverage:
- MPEG-1 / MPEG-2 / MPEG-2.5, Layer III (the "MP3" contract; Layer I/II
  headers are recognized and rejected loudly);
- ID3v2 prefix tag (syncsafe size) and ID3v1 128-byte tail tag skipped;
- CRC-protected frames (protection bit adds 2 bytes before side info);
- free-format bitrate (index 0) rejected loudly — frame length is
  undefined without scanning for the next sync, out of contract;
- VBR flagged when frames disagree on bitrate OR a Xing/Info tag is
  present in the first frame's side-info position;
- duration = sum over walked frames of samples_per_frame / sample_rate
  (exact for CBR and VBR — never the first-frame-extrapolation shortcut);
- anything structurally broken (lost sync mid-stream, truncated final
  frame) raises ValueError for dead-letter routing.

Reference behavioral contract: the reference pipeline is text-only
(logai/dataloader/data_loader.py); this module extends the multimodal
surface described in SURVEY.md §2.13.
"""

from __future__ import annotations

from dataclasses import dataclass

# kbps tables, Layer III; index 0 = free format (rejected), 15 = invalid
_BITRATE_V1_L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
_BITRATE_V2_L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None
)
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}


@dataclass
class Mp3Meta:
    n_frames: int
    duration_ms: int
    sample_rate: int
    channels: int
    bitrate_kbps: float  # average over frames
    vbr: bool


def _id3v2_size(payload: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 if absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):  # syncsafe bytes must have bit 7 clear
        raise ValueError("MP3: corrupt ID3v2 syncsafe size")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    footer = 10 if (payload[5] & 0x10) else 0
    return 10 + size + footer


def parse_mp3_meta(payload: bytes) -> Mp3Meta:
    """Walk every frame of an MP3 payload and return exact stream metadata."""
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":  # ID3v1 tail
        end -= 128
    pos = _id3v2_size(payload)
    if pos >= end:
        raise ValueError("MP3: no audio frames (tags only)")

    n_frames = 0
    duration_s = 0.0
    kbps_sum = 0.0
    sample_rate = channels = None
    bitrates = set()
    vbr_tag = False

    while pos < end:
        if end - pos < 4:
            raise ValueError("MP3: truncated frame header")
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) != 0x7FF:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h >> 17) & 0x3  # 1=Layer III
        protected = not ((h >> 16) & 0x1)  # bit clear -> 16-bit CRC present
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        chan_mode = (h >> 6) & 0x3  # 3 = mono

        if version == 1 or layer == 0 or sr_idx == 3:
            raise ValueError("MP3: reserved version/layer/samplerate bits")
        if layer != 1:
            raise ValueError("MP3: only Layer III supported (got Layer "
                             f"{'I' if layer == 3 else 'II'})")
        table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
        kbps = table[br_idx]
        if kbps is None:
            raise ValueError("MP3: free-format/invalid bitrate index")
        sr = _SAMPLE_RATES[version][sr_idx]
        per_frame = 1152 if version == 3 else 576  # Layer III samples/frame
        coeff = per_frame // 8  # 144 (MPEG-1) / 72 (MPEG-2/2.5)
        frame_len = (coeff * kbps * 1000) // sr + padding
        if pos + frame_len > end:
            raise ValueError("MP3: truncated final frame")

        if sample_rate is None:
            sample_rate = sr
            channels = 1 if chan_mode == 3 else 2
            # Xing/Info tag sits after header(+CRC)+side info in frame 0
            side = (
                (17 if chan_mode == 3 else 32)
                if version == 3
                else (9 if chan_mode == 3 else 17)
            )
            tag_at = pos + 4 + (2 if protected else 0) + side
            if payload[tag_at : tag_at + 4] in (b"Xing", b"Info"):
                vbr_tag = payload[tag_at : tag_at + 4] == b"Xing"
        elif sr != sample_rate:
            raise ValueError("MP3: sample rate changed mid-stream")

        n_frames += 1
        duration_s += per_frame / sr
        kbps_sum += kbps
        bitrates.add(kbps)
        pos += frame_len

    if n_frames == 0:
        raise ValueError("MP3: no frames")
    return Mp3Meta(
        n_frames=n_frames,
        duration_ms=int(round(duration_s * 1000)),
        sample_rate=sample_rate,
        channels=channels,
        bitrate_kbps=round(kbps_sum / n_frames, 3),
        vbr=vbr_tag or len(bitrates) > 1,
    )


# ---------------------------------------------------------------------------
# deterministic fixture encoder (headers are REAL; audio payload is seeded
# filler — we never decode samples, so the fixture exercises exactly the
# surface the parser reads)
# ---------------------------------------------------------------------------


def synth_mp3(
    media_id: int,
    seed: int = 7,
    n_frames: int = 24,
) -> bytes:
    """Deterministic per-id MP3 byte stream with REAL frame headers.

    Cycles structure by id: MPEG version (1 / 2 / 2.5), mono/stereo,
    CBR/VBR (VBR cycles the bitrate index per frame), CRC bit, an ID3v2
    prefix every 2nd id and an ID3v1 tail every 3rd — so a corpus of
    fixtures exercises every branch the parser has."""
    import hashlib

    version = (3, 2, 0)[media_id % 3]
    mono = media_id % 2 == 1
    vbr = media_id % 4 >= 2
    protected = media_id % 5 == 0
    sr_idx = media_id % 3
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3

    out = bytearray()
    if media_id % 2 == 0:  # ID3v2 prefix: 10-byte header + body
        body = hashlib.md5(f"{seed}:id3:{media_id}".encode()).digest()
        n = len(body)
        out += b"ID3\x03\x00\x00" + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += body

    for f in range(n_frames):
        br_idx = (3 + ((media_id + f) % 7 if vbr else media_id % 7)) % 14 + 1
        kbps = table[br_idx]
        sr = _SAMPLE_RATES[version][sr_idx]
        padding = f % 2 if media_id % 7 == 0 else 0
        h = (
            (0x7FF << 21)
            | (version << 19)
            | (1 << 17)  # Layer III
            | ((0 if protected else 1) << 16)
            | (br_idx << 12)
            | (sr_idx << 10)
            | (padding << 9)
            | ((3 if mono else 0) << 6)
        )
        coeff = (1152 if version == 3 else 576) // 8
        frame_len = (coeff * kbps * 1000) // sr + padding
        frame = bytearray(int(h).to_bytes(4, "big"))
        filler = hashlib.md5(f"{seed}:mp3:{media_id}:{f}".encode()).digest()
        while len(frame) < frame_len:
            frame += filler
        out += frame[:frame_len]

    if media_id % 3 == 0:  # ID3v1 tail
        out += b"TAG" + bytes(125)
    return bytes(out)


def synth_mp3_meta_tuple(media_id: int, seed: int = 7, n_frames: int = 24):
    """Oracle-side expected metadata, computed from the SAME deterministic
    parameters synth_mp3 uses — but independently of the parser."""
    version = (3, 2, 0)[media_id % 3]
    mono = media_id % 2 == 1
    vbr = media_id % 4 >= 2
    sr_idx = media_id % 3
    table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
    sr = _SAMPLE_RATES[version][sr_idx]
    per_frame = 1152 if version == 3 else 576
    kbps = [
        table[(3 + ((media_id + f) % 7 if vbr else media_id % 7)) % 14 + 1]
        for f in range(n_frames)
    ]
    return (
        n_frames,
        int(round(n_frames * per_frame / sr * 1000)),
        sr,
        1 if mono else 2,
        round(sum(kbps) / n_frames, 3),
        len(set(kbps)) > 1,
    )
