"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque BINARY columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions over `mapInPandas` so each executor core processes
whole record batches. The decode kernels themselves are STUBBED —
image/audio libraries are not in this container — behind
`deterministic_fake_decode`, which produces a reproducible fake feature
vector from the bytes so the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is fully real and testable.

At scale the pattern is: keep binaries in parquet (or pointer columns to
object storage), repartition to bound batch memory, and run the decode
stage as a narrow mapInPandas — no shuffle, linear scan, Arrow transfer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .partitioning import fan_out

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def real_decode(content: bytes, kind: str):  # pragma: no cover - stub
    """Placeholder for a real decoder (PIL / torchaudio / pyav).

    Not available in this container; the pipeline defaults to
    `deterministic_fake_decode` semantics. To wire a real decoder, pass
    it as the ``kernel=`` argument of ``extract_features`` /
    ``frame_sample`` — no operator edit required.
    """
    raise NotImplementedError("media codecs not installed in this environment")


def deterministic_fake_decode(content: bytes) -> list[float]:
    """Reproducible fake feature vector: md5 bytes → FEATURE_DIM floats
    in [0, 1). Stands in for the decode+embed kernel."""
    digest = hashlib.md5(content or b"").digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame,
    batch_hint: int | None = None,
    kernel=None,
) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas over binary content.

    Arrow-batched; each input batch yields one output batch — constant
    memory per core regardless of table size.

    ``kernel``: optional ``Callable[[bytes | None], list[float]]`` that
    replaces the deterministic fake decode — this is where a real
    decoder (PIL / torchaudio / pyav + an embedding model) plugs in
    without editing the operator. The callable is serialized into the
    mapInPandas closure, so it must be picklable and self-contained on
    executors (import its libraries inside the function body) and must
    tolerate ``None`` content. Default ``None`` → the md5-based
    ``deterministic_fake_decode`` semantics (redefined inside the
    closure so executors don't need this package on PYTHONPATH).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        if kernel is None:
            def _k(content: bytes) -> list[float]:
                digest = _hl.md5(content or b"").digest()
                return [digest[i] / 255.0 for i in range(FEATURE_DIM)]
        else:
            _k = kernel

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": pdf["content"].map(_k),
                }
            )

    # fan_out: a small media file arrives as 1-2 partitions → 1-2 Python
    # workers; decode is per-row CPU-bound, so spread it first
    cols = fan_out(media.select("media_id", "kind", "content"))
    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, kernel=None
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp. Demonstrates the explode-then-decode shape.

    ``kernel``: optional ``Callable[[bytes], list[float]]`` applied to
    the pseudo-frame bytes ``content + frame_ms.to_bytes(8,'little')``
    (a real pyav decoder would seek to frame_ms instead — inject it
    here). Same serialization contract as ``extract_features``.
    Default → deterministic fake."""
    frames = fan_out(media.where(F.col("kind") == "video")).select(
        "media_id",
        "content",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        if kernel is None:
            def _k(content: bytes) -> list[float]:
                digest = _hl.md5(content or b"").digest()
                return [digest[i] / 255.0 for i in range(FEATURE_DIM)]
        else:
            _k = kernel

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "features": [
                        _k((c or b"") + int(ms).to_bytes(8, "little"))
                        for c, ms in zip(pdf["content"], pdf["frame_ms"])
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    return frames.mapInPandas(run, schema=schema)
