"""AVI/MJPEG: container round-trip, real frame decode, Spark ops.

The fixture frames are the flat 8x8 gray-block class jpegcodec round-trips
bit-exactly, so every equality below is exact — no tolerances."""

import numpy as np
import pytest

from logai_spark.functions.avicodec import (
    avi_frames,
    encode_avi,
    parse_avi,
    synth_avi,
    synth_avi_frame_pixels,
    synth_avi_params,
)


def test_roundtrip_meta_and_frames_bit_exact():
    from logai_spark.functions.jpegcodec import decode_jpeg

    for mid in range(10):
        payload = synth_avi(mid)
        nf, w, h, rate, scale = synth_avi_params(mid)
        meta = parse_avi(payload)
        assert meta.codec == "MJPG"
        assert (meta.width, meta.height, meta.n_frames) == (w, h, nf)
        assert meta.fps == pytest.approx(rate / scale, abs=0)
        assert meta.duration_ms == nf * 1000 * scale // rate
        frames = avi_frames(payload)
        assert len(frames) == nf
        for fi, f in enumerate(frames):
            assert np.array_equal(
                decode_jpeg(f), synth_avi_frame_pixels(mid, fi)
            )


def test_word_alignment_odd_chunk():
    # an odd-sized frame payload forces the RIFF pad byte between chunks
    frames = [b"\xff\xd8odd", b"\xff\xd8even"]  # 5 and 6 bytes
    payload = encode_avi(frames, 4, 4, rate=10, scale=1)
    assert avi_frames(payload) == frames
    assert parse_avi(payload).n_frames == 2


def test_no_idx1_still_parses():
    payload = encode_avi([b"\xff\xd8x"], 4, 4, with_idx1=False)
    assert parse_avi(payload).n_frames == 1
    assert avi_frames(payload) == [b"\xff\xd8x"]


def test_dead_letter_raises():
    good = synth_avi(0)
    for bad in (b"", b"RIFF\x04\x00\x00\x00WAVE", good[:40], good[:12]):
        with pytest.raises(ValueError):
            parse_avi(bad)
    with pytest.raises(ValueError):
        avi_frames(b"not a riff")


def test_sample_video_frames_real_path(spark):
    from logai_spark.functions.multimodal import (
        sample_video_frames,
        synth_real_media,
    )

    media = synth_real_media(spark, 6, seed=7, kind="video", video_codec="avi")
    out = sample_video_frames(media, n_frames=2).toPandas()
    for mid in range(6):
        nf, w, h, _, _ = synth_avi_params(mid)
        sub = out[out.media_id == mid].sort_values("frame_idx")
        # evenly spaced true stream positions, capped at the stream length
        assert list(sub.frame_idx) == sorted({i * nf // min(2, nf) for i in range(min(2, nf))})
        for _, row in sub.iterrows():
            got = np.frombuffer(row.frame, dtype=np.uint8).reshape(h, w, 3)
            assert np.array_equal(
                got, synth_avi_frame_pixels(mid, int(row.frame_idx), 7)
            )


def test_sample_video_frames_stub_path_unchanged(spark):
    from logai_spark.functions.multimodal import (
        sample_video_frames,
        synth_media,
    )

    media = synth_media(spark, 3, kind="video")
    out = sample_video_frames(media, n_frames=4, fake_decode=True).toPandas()
    assert len(out) == 12  # fake path keeps its n_frames-segments contract


def test_extract_video_frame_stats(spark):
    from logai_spark.functions.multimodal import (
        extract_video_frame_stats,
        image_stat_tuple,
        synth_real_media,
    )

    media = synth_real_media(spark, 8, seed=7, kind="video", video_codec="avi")
    out = extract_video_frame_stats(media).toPandas()
    assert len(out) == sum(synth_avi_params(i)[0] for i in range(8))
    for _, row in out.iterrows():
        exp = image_stat_tuple(
            synth_avi_frame_pixels(int(row.media_id), int(row.frame_idx), 7)
        )
        assert (row.width, row.height) == exp[:2]
        assert (row.mean_r, row.mean_g, row.mean_b) == exp[2:]
        nf, _, _, rate, scale = synth_avi_params(int(row.media_id))
        assert row.n_frames == nf and row.fps == rate / scale
