"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The sandbox has no image/audio codecs, so the *decode* step is stubbed
behind ``DecodeBackend`` (the deterministic fake computes byte-level
features; the real backend raises NotImplementedError until Pillow/ffmpeg
are wired in). Everything Spark-side is real and tested: schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partitioning.

Pattern for 100 TB: binary payloads stay in parquet/Iceberg blobs; feature
extraction streams Arrow batches through a Pandas iterator UDF so each task
holds one batch of blobs, never the whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StructType([]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_entropy", DoubleType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


try:  # optional dependency — never required at import time
    import PIL.Image as _PILImage  # type: ignore

    PIL_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised when Pillow is absent
    _PILImage = None
    PIL_AVAILABLE = False


class DecodeBackend:
    """Real decoder — requires codec libraries not present in this
    container. The Spark plumbing around it is fully functional; swap in
    :class:`PillowDecodeBackend` when Pillow is available (audio/video
    would take soundfile / pyav the same way)."""

    def decode(self, kind: str, blob: bytes) -> np.ndarray:
        raise NotImplementedError(
            "media decoding requires codec libraries (Pillow/soundfile/pyav) "
            "not installed in this environment; use FakeDecodeBackend"
        )


class PillowDecodeBackend(DecodeBackend):
    """Real image decode via Pillow (optional dependency): blob -> 8x8
    grayscale thumbnail -> 64-dim L1-normalized feature vector. Instantiable
    only when Pillow is importable; the Arrow/mapInPandas plumbing is
    identical to the fake backend, so swapping backends changes zero Spark
    plan shape."""

    def __init__(self) -> None:
        if not PIL_AVAILABLE:
            raise NotImplementedError(
                "Pillow is not installed; PillowDecodeBackend unavailable"
            )

    def decode(self, kind: str, blob: bytes) -> np.ndarray:
        if kind not in ("", "image"):
            raise NotImplementedError(f"PillowDecodeBackend: kind={kind!r}")
        import io

        with _PILImage.open(io.BytesIO(blob)) as im:
            g = im.convert("L").resize((8, 8))
            arr = np.asarray(g, dtype=np.float64).ravel()
        s = arr.sum()
        return arr / s if s else arr


class FakeDecodeBackend(DecodeBackend):
    """Deterministic stand-in: 'decodes' a blob to its 16-bin byte
    histogram (normalized). Lets every downstream stage — batching,
    schema, partitioning, feature joins — run for real in tests."""

    def decode(self, kind: str, blob: bytes) -> np.ndarray:
        arr = np.frombuffer(blob, dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(16, dtype=np.float64)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        return hist / hist.sum()


def extract_media_features(
    media: DataFrame,
    backend: DecodeBackend | None = None,
    id_col: str = "media_id",
    kind_col: str = "kind",
    blob_col: str = "blob",
) -> DataFrame:
    """binary blobs -> per-item features via Arrow-batched mapInPandas."""
    be = backend or FakeDecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            ent = []
            nb = []
            for blob in pdf[blob_col]:
                data = bytes(blob) if blob is not None else b""
                f = be.decode("", data)
                feats.append(f.tolist())
                nb.append(len(data))
                p = f[f > 0]
                ent.append(float(-(p * np.log2(p)).sum()) if p.size else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": pdf[kind_col],
                    "n_bytes": nb,
                    "byte_entropy": ent,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_idx) to
    decode. Decode itself is the stubbed backend; the explode/partition
    plumbing (what actually matters for the cluster) is real."""
    return media.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.lit(every_n - 1))
        ).alias("frame_idx"),
    ).repartition("media_id")
