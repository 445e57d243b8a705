"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries in this container —
see brief): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, which substitutes a deterministic md5-seeded payload
with the same shape contract. Everything AROUND the decode — schemas,
Arrow batch shapes, mapInPandas plumbing, partitioning — is real and tested,
so dropping in PIL/librosa later only changes the inner function.

Design: media rows are (id, media:binary, meta:struct). Feature extraction
is mapInPandas over (id, media) so one Python stage handles a whole Arrow
batch; outputs are fixed-width array<float> features ready for the
similarity/dedup operators in functions.similarity / functions.textops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),   # image|audio|video
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image to HxWx3 uint8. STUB: real decode needs PIL/opencv
    (not in this container)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not installed); pass fake=True "
            "for the deterministic test double"
        )
    h = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def decode_audio(payload: bytes, sample_rate: int = 16000, fake: bool = False) -> np.ndarray:
    """Decode audio to float32 mono PCM. STUB (librosa/soundfile absent)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires librosa/soundfile (not installed); pass "
            "fake=True for the deterministic test double"
        )
    h = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.normal(0, 0.1, size=sample_rate).astype(np.float32)


def _image_features(img: np.ndarray, bins: int = 8) -> np.ndarray:
    """Channel-histogram feature: 3*bins floats, l1-normalized. Pure numpy —
    this part is REAL (it runs on whatever decode produces)."""
    feats = []
    for c in range(3):
        hist, _ = np.histogram(img[:, :, c], bins=bins, range=(0, 256))
        feats.append(hist)
    v = np.concatenate(feats).astype(np.float64)
    s = v.sum()
    return v / s if s else v


def extract_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    bins: int = 8,
    fake_decode: bool = False,
) -> DataFrame:
    """mapInPandas: decode -> histogram features. Output
    (media_id, features: array<double>) with width 3*bins."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it):
        for pdf in it:
            feats = [
                _image_features(decode_image(m, fake=fake_decode), bins).tolist()
                for m in pdf[media_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.select(id_col, media_col).mapInPandas(batches, schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "media_id",
    fake_decode: bool = False,
) -> DataFrame:
    """mapInPandas resize: decode -> nearest-neighbor resample (pure numpy,
    real) -> raw RGB bytes out. Output (media_id, resized: binary, width,
    height)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def batches(it):
        for pdf in it:
            out = []
            for m in pdf[media_col]:
                img = decode_image(m, fake=fake_decode)
                yi = (np.linspace(0, img.shape[0] - 1, height)).astype(int)
                xi = (np.linspace(0, img.shape[1] - 1, width)).astype(int)
                out.append(img[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema)


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    media_col: str = "media",
    id_col: str = "media_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Frame sampling: emits n_frames rows per video (media_id, frame_idx,
    frame: binary). The decode stub treats the payload as n_frames segments;
    a real decoder would seek keyframes."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, m in zip(pdf[id_col], pdf[media_col]):
                for i in range(n_frames):
                    seg = m[i::n_frames] if m else b""
                    img = decode_image(bytes(seg), fake=fake_decode)
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(img.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema)


def synth_media(spark, n: int, seed: int = 42, kind: str = "image") -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (test input)."""
    def batches(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                payload = hashlib.md5(f"{seed}:media:{i}".encode()).digest() * 8
                rows.append(
                    (
                        int(i),
                        payload,
                        {
                            "kind": kind,
                            "width": 16,
                            "height": 16,
                            "duration_ms": 1000,
                            "codec": "fake",
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "meta"])

    return spark.range(n).mapInPandas(batches, MEDIA_SCHEMA)
