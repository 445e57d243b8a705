"""Multimodal plumbing (stubbed decode, real Spark shapes) + HDFS/BGL prep."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.functions.multimodal import (
    decode_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synth_media,
)
from logai_spark.preprocess_opensets import bgl_preprocess, hdfs_preprocess


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_fake_decode_never_attempts_real_parse():
    """fake=True is documented to accept ARBITRARY bytes; a payload that
    merely starts with the BMP/WAV magic (e.g. text 'BMW...') must yield
    the md5-seeded double, not crash in the real struct parser."""
    from logai_spark.functions.multimodal import decode_audio

    img = decode_image(b"BMW is not a bitmap", fake=True)
    assert img.shape == (16, 16, 3)
    aud = decode_audio(b"RIFFxxxxWAVEgarbage", fake=True)
    assert aud.dtype.name == "float32" and aud.ndim == 1
    # deterministic per payload
    assert (decode_image(b"BMW is not a bitmap", fake=True) == img).all()


def test_image_features_shape_and_determinism(spark):
    media = synth_media(spark, 20)
    feats = extract_image_features(media, fake_decode=True).toPandas()
    assert len(feats) == 20
    widths = feats["features"].map(len).unique()
    assert list(widths) == [24]  # 3 channels x 8 bins
    # l1-normalized
    assert all(abs(sum(v) - 1.0) < 1e-9 for v in feats["features"])
    # deterministic across partitionings
    again = extract_image_features(synth_media(spark, 20), fake_decode=True).toPandas()
    a = dict(zip(feats["media_id"], feats["features"].map(tuple)))
    b = dict(zip(again["media_id"], again["features"].map(tuple)))
    assert a == b


def test_resize_images(spark):
    media = synth_media(spark, 5)
    out = resize_images(media, 8, 4, fake_decode=True).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    assert out["resized"].map(len).unique().tolist() == [8 * 4 * 3]


def test_sample_video_frames(spark):
    media = synth_media(spark, 3, kind="video")
    out = sample_video_frames(media, n_frames=4, fake_decode=True).toPandas()
    assert len(out) == 12
    assert set(out["frame_idx"]) == {0, 1, 2, 3}


def test_bgl_preprocess(spark):
    pdf = pd.DataFrame(
        {
            "Id": [1117838570, 1117838580, 1117838700, 1117838760],
            "Label": ["-", "KERNDTLB", "-", "-"],
            "logline": ["a", "b", "c", "d"],
        }
    )
    out = bgl_preprocess(spark.createDataFrame(pdf)).toPandas()
    assert out["span_id"].tolist() == ["0", "0", "2", "3"]
    assert out["labels"].tolist() == [0, 1, 0, 0]


def test_hdfs_preprocess_with_labels(spark):
    pdf = pd.DataFrame(
        {
            "logline": [
                "Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6",
                "PacketResponder 1 for block blk_-99 terminating",
                "no block here",
            ]
        }
    )
    labels = spark.createDataFrame(
        pd.DataFrame({"BlockId": ["blk_-99"], "Label": ["Anomaly"]})
    )
    out = hdfs_preprocess(spark.createDataFrame(pdf), labels).toPandas()
    byline = out.set_index("logline")
    assert byline.loc["Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6", "span_id"] == "blk_123"
    assert byline.loc["PacketResponder 1 for block blk_-99 terminating", "labels"] == 1
    assert byline.loc["Receiving block blk_123 src: /1.2.3.4:5 dest: /1.2.3.4:6", "labels"] == 0


# --- real BMP/WAV decode path (round-4) -----------------------------------


def test_bmp_roundtrip_with_padding():
    from logai_spark.functions.multimodal import decode_bmp, encode_bmp
    import numpy as np

    # w=17 -> 51-byte rows padded to 52
    img = np.arange(12 * 17 * 3, dtype=np.uint64).reshape(12, 17, 3) % 256
    img = img.astype(np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_topdown_and_bad_formats():
    from logai_spark.functions.multimodal import decode_bmp, encode_bmp
    import numpy as np
    import struct

    img = np.zeros((4, 5, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left red
    enc = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reverse row order in the body
    (h,) = struct.unpack_from("<i", enc, 22)
    struct.pack_into("<i", enc, 22, -h)
    stride = (5 * 3 + 3) // 4 * 4
    body = enc[54:]
    rows = [bytes(body[i * stride:(i + 1) * stride]) for i in range(4)]
    enc[54:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(enc)) == img).all()

    with pytest.raises(ValueError):
        decode_bmp(b"PNG whatever")
    gray = bytearray(encode_bmp(img))
    struct.pack_into("<H", gray, 28, 8)  # claim 8bpp
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(gray))


def test_wav_roundtrip_mono_stereo_8bit():
    import io
    import wave

    import numpy as np

    from logai_spark.functions.multimodal import decode_wav, encode_wav

    mono = np.array([0, 16384, -16384, 32767, -32768], dtype=np.int16)
    x, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and x.dtype == np.float32
    assert np.allclose(x, mono.astype(np.float64) / 32768.0)

    sym = np.array([0, 16384, -16384, 32767, -32767], dtype=np.int16)
    stereo = np.stack([sym, -sym], axis=1)  # (-32768 would overflow negation)
    xs, _ = decode_wav(encode_wav(stereo, 8000))
    assert np.allclose(xs, 0.0)  # L/R cancel

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(1); wf.setframerate(8000)
        wf.writeframes(bytes([0, 128, 255]))
    x8, _ = decode_wav(buf.getvalue())
    assert np.allclose(x8, [(0 - 128) / 128, 0.0, (255 - 128) / 128])


def test_decode_sniffing_routes_real_formats():
    import numpy as np

    from logai_spark.functions.multimodal import (
        decode_audio,
        decode_image,
        encode_bmp,
        encode_wav,
    )

    img = np.full((2, 2, 3), 7, dtype=np.uint8)
    assert (decode_image(encode_bmp(img)) == img).all()  # no fake= needed
    wav = encode_wav(np.array([100, -100], dtype=np.int16))
    assert decode_audio(wav).shape == (2,)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 mp3 payload")


def test_real_media_stats_match_raw_arrays(spark):
    """End-to-end: synth pixels/samples -> encode -> Spark mapInPandas
    decode+features == features computed directly from the raw arrays
    (independent of the encode/decode round-trip)."""
    import numpy as np

    from logai_spark.functions.multimodal import (
        audio_feature_tuple,
        extract_audio_features,
        extract_image_stats,
        image_stat_tuple,
        synth_audio_samples,
        synth_image_pixels,
        synth_real_media,
    )

    imgs = synth_real_media(spark, 10, seed=7, kind="image")
    got = {r["media_id"]: r for r in extract_image_stats(imgs).collect()}
    for i in range(10):
        w, h, mr, mg, mb = image_stat_tuple(synth_image_pixels(i, 7))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)

    auds = synth_real_media(spark, 10, seed=7, kind="audio")
    got_a = {r["media_id"]: r for r in extract_audio_features(auds).collect()}
    for i in range(10):
        s = synth_audio_samples(i, 7)
        x = (s.astype(np.float64) / 32768.0).astype(np.float32).astype(np.float64)
        n, rms, zcr, peak = audio_feature_tuple(x)
        r = got_a[i]
        assert (r["n_samples"], r["zcr"]) == (n, zcr)
        assert (r["rms"], r["peak"]) == (rms, peak)


# ----------------------------------------------------------------- PNG codec


def test_png_roundtrip_every_filter():
    """encode_png/decode_png round-trip bit-exact for each scanline filter
    (None/Sub/Up/Average/Paeth) and for per-row filter cycling."""
    import numpy as np

    from logai_spark.functions.multimodal import (
        decode_image,
        decode_png,
        encode_png,
        synth_image_pixels,
    )

    for i in range(4):
        px = synth_image_pixels(i, seed=7)
        for ft in range(5):
            assert (decode_png(encode_png(px, ft)) == px).all(), ft
        cyc = [(i + y) % 5 for y in range(px.shape[0])]
        assert (decode_png(encode_png(px, cyc)) == px).all()
        # magic sniff routes PNG through decode_image's real path
        assert (decode_image(encode_png(px, 4)) == px).all()


def test_png_gray_palette_rgba_color_types():
    import struct
    import zlib

    import numpy as np

    from logai_spark.functions.multimodal import PNG_MAGIC, _png_chunk, decode_png

    h, w = 5, 7

    def png(ctype, raw_rows, extra=b""):
        ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        body = b"".join(b"\x00" + r.tobytes() for r in raw_rows)
        return PNG_MAGIC + ihdr + extra + _png_chunk(b"IDAT", zlib.compress(body)) + _png_chunk(b"IEND", b"")

    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    assert (decode_png(png(0, gray)) == np.repeat(gray[:, :, None], 3, axis=2)).all()

    rgba = np.random.default_rng(0).integers(0, 256, (h, w, 4), dtype=np.uint8)
    assert (decode_png(png(6, rgba.reshape(h, -1))) == rgba[:, :, :3]).all()

    plte = np.random.default_rng(1).integers(0, 256, (16, 3), dtype=np.uint8)
    idx = np.random.default_rng(2).integers(0, 16, (h, w), dtype=np.uint8)
    out = decode_png(png(3, idx, extra=_png_chunk(b"PLTE", plte.tobytes())))
    assert (out == plte[idx]).all()


def test_png_rejects_bad_inputs():
    import struct
    import zlib

    import numpy as np
    import pytest

    from logai_spark.functions.multimodal import (
        PNG_MAGIC,
        _png_chunk,
        decode_png,
        encode_png,
        synth_image_pixels,
    )

    px = synth_image_pixels(0, seed=7)
    good = encode_png(px, 2)
    # corrupt one IDAT byte -> CRC failure, loud
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 6
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth and interlace rejected loudly
    for depth, inter in ((16, 0), (8, 1)):
        ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, inter))
        body = zlib.compress(b"\x00" * (4 * (4 * 3 + 1)))
        p = PNG_MAGIC + ihdr + _png_chunk(b"IDAT", body) + _png_chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError):
            decode_png(p)
    with pytest.raises(ValueError):
        decode_png(b"nonsense bytes")


def test_png_stats_spark_path_matches_raw_pixels(spark):
    """Distributed decode over real PNG payloads (per-row filter cycling)
    reproduces stats computed from the raw pixel arrays."""
    from logai_spark.functions.multimodal import (
        extract_image_stats,
        image_stat_tuple,
        synth_image_pixels,
        synth_real_media,
    )

    media = synth_real_media(spark, 6, seed=7, kind="image", image_codec="png")
    got = {r["media_id"]: r for r in extract_image_stats(media).collect()}
    for i in range(6):
        w, h, mr, mg, mb = image_stat_tuple(synth_image_pixels(i, 7))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)


# ---------------------------------------------------------------- JPEG codec


def test_jpeg_flat_gray_blocks_bit_exact_all_layouts():
    """The codec's exactness class: flat 8x8 gray blocks survive the full
    lossy pipeline bit-for-bit in 4:4:4, 4:2:0 AND grayscale layouts —
    exercising marker parse, Huffman, DC prediction, stuffing, IDCT and
    color conversion with a value-equality check."""
    from logai_spark.functions.jpegcodec import decode_jpeg, encode_jpeg
    from logai_spark.functions.multimodal import decode_image, synth_block_gray_pixels

    for i in range(4):
        px = synth_block_gray_pixels(i)
        assert (decode_jpeg(encode_jpeg(px)) == px).all()
        assert (decode_jpeg(encode_jpeg(px, subsample=True)) == px).all()
        assert (decode_jpeg(encode_jpeg(px, gray=True)) == px).all()
        assert (decode_image(encode_jpeg(px)) == px).all()  # magic sniff


def test_jpeg_lossy_bounds_and_odd_dims():
    import numpy as np

    from logai_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)  # pads to MCU grid
    out = decode_jpeg(encode_jpeg(img, dc_q=8, ac_q=4))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4.0
    # smooth gradient at q=1 is near-lossless
    sm = np.stack([np.tile(np.arange(32), (24, 1)) * 4 % 256] * 3, axis=2).astype(np.uint8)
    assert np.abs(
        decode_jpeg(encode_jpeg(sm, dc_q=1, ac_q=1)).astype(int) - sm.astype(int)
    ).mean() < 0.1
    # 4:2:0 keeps luma faithful even on noise (chroma loss is by design)
    def lum(a):
        a = a.astype(float)
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    out = decode_jpeg(encode_jpeg(img, dc_q=8, ac_q=4, subsample=True))
    assert np.abs(lum(out) - lum(img)).mean() < 3.0


def test_jpeg_rejects_unsupported_loudly():
    import struct

    import numpy as np
    import pytest

    from logai_spark.functions.jpegcodec import decode_jpeg, encode_jpeg
    from logai_spark.functions.multimodal import synth_block_gray_pixels

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 -> SOF2 (progressive) in a real stream
    px = synth_block_gray_pixels(0)
    buf = bytearray(encode_jpeg(px))
    at = buf.index(b"\xff\xc0")
    buf[at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(buf))


def test_jpeg_stats_spark_path_matches_raw_pixels(spark):
    from logai_spark.functions.multimodal import (
        extract_image_stats,
        image_stat_tuple,
        synth_block_gray_pixels,
        synth_real_media,
    )

    media = synth_real_media(spark, 6, seed=7, kind="image", image_codec="jpeg")
    got = {r["media_id"]: r for r in extract_image_stats(media).collect()}
    for i in range(6):
        w, h, mr, mg, mb = image_stat_tuple(synth_block_gray_pixels(i, 7))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)


def test_gif_roundtrip_lossless_and_interlace():
    import numpy as np

    from logai_spark.functions.gifcodec import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    for trial in range(8):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        ncol = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, size=(h, w))]
        for interlace in (False, True):
            assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)
    # dict-full CLEAR/reset path: 256-color noise big enough to exhaust 4096 codes
    big = rng.integers(0, 256, size=(120, 200), dtype=np.uint8)
    imgb = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)[big]
    assert np.array_equal(decode_gif(encode_gif(imgb)), imgb)


def test_gif_hand_assembled_bytes_decode_exactly():
    """Decoder validated against bytes bit-packed BY HAND from the GIF89a
    spec layout (not via our encoder) — pins the width-growth convention."""
    import struct

    import numpy as np

    from logai_spark.functions.gifcodec import decode_gif

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    codes = [4, 0, 1, 2, 3, 0, 1, 5]  # clear, literals, eoi
    widths = [3, 3, 3, 3, 4, 4, 4, 4]  # decoder grows after entry 7 lands
    bitbuf = nbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        bitbuf |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8
    if nbits:
        out.append(bitbuf & 0xFF)
    lzw = bytes(out)
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", 3, 2, 0x80 | (1 << 4) | 1, 0, 0) + pal
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic-control ext: skipped
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 2, 0)
        + bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    )
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[255, 255, 255], [255, 0, 0], [0, 255, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_gif(payload), exp)


def test_gif_rejects_bad_inputs():
    import numpy as np

    from logai_spark.functions.gifcodec import decode_gif, encode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):  # >256 distinct colors can't palette
        rng = np.random.default_rng(0)
        encode_gif(rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8))
    ok = encode_gif(np.full((4, 4, 3), 9, dtype=np.uint8))
    with pytest.raises(ValueError):  # truncated LZW stream
        decode_gif(ok[:-6] + b"\x00\x3b")


def test_gif_stats_spark_path_matches_raw_pixels(spark):
    from logai_spark.functions.multimodal import (
        extract_image_stats,
        image_stat_tuple,
        synth_palette_pixels,
        synth_real_media,
    )

    media = synth_real_media(spark, 6, seed=7, kind="image", image_codec="gif")
    got = {r["media_id"]: r for r in extract_image_stats(media).collect()}
    for i in range(6):
        w, h, mr, mg, mb = image_stat_tuple(synth_palette_pixels(i, 7))
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (mr, mg, mb)


def test_mp3_meta_parse_matches_fixture_params():
    from logai_spark.functions.mp3meta import (
        parse_mp3_meta,
        synth_mp3,
        synth_mp3_meta_tuple,
    )

    for i in range(24):  # cycles MPEG version, channels, CBR/VBR, CRC, tags
        m = parse_mp3_meta(synth_mp3(i))
        assert (
            m.n_frames, m.duration_ms, m.sample_rate, m.channels,
            m.bitrate_kbps, m.vbr,
        ) == synth_mp3_meta_tuple(i)


def test_mp3_meta_rejects_malformed_loudly():
    from logai_spark.functions.mp3meta import parse_mp3_meta, synth_mp3

    ok = synth_mp3(1)
    with pytest.raises(ValueError):
        parse_mp3_meta(ok[:-3])  # truncated final frame
    with pytest.raises(ValueError):
        parse_mp3_meta(b"\x00\x01" + ok)  # lost sync
    with pytest.raises(ValueError):
        parse_mp3_meta(b"ID3\x03\x00\x00\x00\x00\x00\x05hello")  # tags only
    # Layer II header must be named, not garbled
    h = bytearray(ok if ok[:3] != b"ID3" else synth_mp3(3))
    frame0 = h.index(b"\xff", 0)
    h[frame0 + 1] = (h[frame0 + 1] & ~0x06) | 0x04  # layer bits -> II
    with pytest.raises(ValueError, match="Layer"):
        parse_mp3_meta(bytes(h))


def test_mp3_meta_spark_path(spark):
    from logai_spark.functions.multimodal import (
        extract_audio_meta,
        synth_real_media,
    )
    from logai_spark.functions.mp3meta import synth_mp3_meta_tuple

    media = synth_real_media(spark, 8, seed=7, kind="audio", audio_codec="mp3")
    got = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    for i in range(8):
        nf, dur, sr, ch, kbps, vbr = synth_mp3_meta_tuple(i, 7)
        r = got[i]
        assert (r["n_frames"], r["duration_ms"], r["sample_rate"]) == (nf, dur, sr)
        assert (r["channels"], r["bitrate_kbps"], r["vbr"]) == (ch, kbps, vbr)


def test_mp4_meta_parse_matches_fixture_params():
    from logai_spark.functions.mp4meta import (
        parse_mp4_meta,
        synth_mp4,
        synth_mp4_meta_tuple,
    )

    for i in range(24):  # cycles mvhd v0/v1, track layouts, largesize mdat
        m = parse_mp4_meta(synth_mp4(i))
        assert (
            m.brand, m.duration_ms, m.n_tracks, m.has_video, m.has_audio,
            m.width, m.height,
        ) == synth_mp4_meta_tuple(i)


def test_mp4_meta_rejects_malformed_loudly():
    import struct

    from logai_spark.functions.mp4meta import parse_mp4_meta, synth_mp4

    with pytest.raises(ValueError):
        parse_mp4_meta(synth_mp4(2)[:30])  # truncated mid-box
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00\x00\x00\x08mdat")  # no moov
    with pytest.raises(ValueError):  # child overruns parent
        parse_mp4_meta(
            struct.pack(">I", 16) + b"moov" + struct.pack(">I", 200)
            + b"mvhd" + bytes(4)
        )


def test_mp4_meta_spark_path(spark):
    from logai_spark.functions.multimodal import (
        extract_video_meta,
        synth_real_media,
    )
    from logai_spark.functions.mp4meta import synth_mp4_meta_tuple

    media = synth_real_media(spark, 8, seed=7, kind="video")
    got = {r["media_id"]: r for r in extract_video_meta(media).collect()}
    for i in range(8):
        brand, dur, nt, hv, ha, w, h = synth_mp4_meta_tuple(i, 7)
        r = got[i]
        assert (r["brand"], r["duration_ms"], r["n_tracks"]) == (brand, dur, nt)
        assert (r["has_video"], r["has_audio"], r["width"], r["height"]) == (hv, ha, w, h)
