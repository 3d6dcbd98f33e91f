"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The image/audio codec libraries are not in this container, so the
actual byte decoding is pluggable: ``fake_decoder`` derives
deterministic pseudo-pixels from the payload hash (making every
downstream contract — schema, batch shape, partitioning — real and
testable); ``library_decoder`` is the marked integration point that
raises until PIL/av are provided.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feat", T.ArrayType(T.FloatType()), False),
])


def library_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Integration point for real codecs (PIL / soundfile / av).
    STUB: the libraries are not available in this environment."""
    raise NotImplementedError(
        "media decoding requires PIL/soundfile/av; plug a decoder into "
        "extract_features(decoder=...) — fake_decoder provides the "
        "deterministic test path")


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decode: expand the payload digest into a
    16×16 pseudo-raster (image/video) or 256-sample wave (audio)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float32)
    return raw.reshape(16, 16) if kind in ("image", "video") else raw


def attach_payloads(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Demo adapter: wrap a text table's bytes as opaque media
    payloads so the plumbing runs against the provided tables."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.col(id_col) % 3 + 1).cast("int"))
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))


def extract_features(media: DataFrame, n_features: int = 16,
                     decoder: Callable = fake_decoder) -> DataFrame:
    """Decode + pooled feature extraction per Arrow batch. The
    per-row work is pure Python/numpy inside mapInPandas — at scale
    this is one narrow pass, no shuffle."""
    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = decoder(bytes(row.payload), row.kind).ravel()
                pooled = arr[:len(arr) - len(arr) % n_features].reshape(
                    n_features, -1).mean(axis=1)
                out.append({
                    "media_id": row.media_id, "kind": row.kind,
                    "n_bytes": len(row.payload),
                    "feat": pooled.astype(np.float32).tolist(),
                })
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES.fields])

    return media.mapInPandas(run, schema=FEATURES)


def resize_images(media: DataFrame, out_h: int = 8, out_w: int = 8,
                  decoder: Callable = fake_decoder) -> DataFrame:
    """Resize plumbing for image/video rasters: decode → area
    (block-mean) downsample to (out_h, out_w) → row-major pixel
    array. Pure numpy inside mapInPandas (no codec dependency), so
    the real resize swaps in with the real decoder. Non-raster rows
    (audio) are dropped."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ])

    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind not in ("image", "video"):
                    continue
                img = decoder(bytes(row.payload), row.kind)
                ih, iw = img.shape
                # area resize: split into out_h×out_w blocks and mean
                ys = np.linspace(0, ih, out_h + 1).astype(int)
                xs = np.linspace(0, iw, out_w + 1).astype(int)
                small = np.array([
                    [img[ys[r]:max(ys[r + 1], ys[r] + 1),
                         xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
                     for c in range(out_w)] for r in range(out_h)])
                out.append({"media_id": row.media_id, "kind": row.kind,
                            "h": out_h, "w": out_w,
                            "pixels": small.ravel().astype(np.float32)
                            .tolist()})
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "h", "w", "pixels"])

    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 decoder: Callable = fake_decoder) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    frame (media_id, frame_idx, feat). Frame count derives from
    duration metadata (fake: payload-size based)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ])

    from ..session import ensure_worker_imports
    ensure_worker_imports(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                n_frames = max(1, len(row.payload) // 100)
                for i in range(n_frames):
                    frame = decoder(bytes(row.payload) + i.to_bytes(4, "big"),
                                    "video")
                    out.append({"media_id": row.media_id, "frame_idx": i,
                                "feat": frame.mean(axis=0)
                                .astype(np.float32).tolist()})
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "feat"])

    return media.mapInPandas(run, schema=schema)
