"""[EXT] Multimodal columns (SURVEY.md §2.11 X4).

Design: image/audio/video payloads are opaque ``binary`` columns with
a typed metadata struct alongside — the engine plans around SIZE and
METADATA, never decoding in the relational path. Decode / feature
extraction runs in Arrow-batched ``mapInPandas`` so the 100 TB story
is: binary stays columnar in parquet, decode parallelizes per
partition, and the expensive step sees whole batches.

The decode kernels themselves are STUBBED in this environment (no
image/audio libs in the container): ``decoder="fake"`` produces a
deterministic feature vector from the bytes (real plumbing, fake
math); ``decoder="pil"``/"librosa" raise NotImplementedError at call
time with the dependency named. The Spark-side contract — schemas,
batch shapes, UDF signatures, partition behavior — is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), True),       # opaque payload
    StructField("meta", StructType([
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]), True),
])

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Populate size metadata from the binary payload (pure JVM —
    length() works on binary)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: sha256-seeded floats
    in [0,1). Stable across runs/processes — testable plumbing."""
    digest = hashlib.sha256(payload or b"").digest()
    return [digest[i % 32] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    ``decoder='fake'`` → deterministic bytes-derived vector (this
    container has no media libs). ``decoder='pil'|'librosa'`` →
    NotImplementedError naming the missing dependency, raised on the
    EXECUTOR at first batch — the plan itself always builds.
    """
    import pandas as pd

    dim = FEATURE_DIM

    # NB: the closure must be fully self-contained (no references to
    # module-level symbols) — cloudpickle ships it by value, and the
    # driver's Python workers may not have this package on their path.
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as pd

        if decoder == "pil":
            raise NotImplementedError("image decode requires Pillow; not in this image")
        if decoder == "librosa":
            raise NotImplementedError("audio decode requires librosa; not in this image")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

        def fake(payload: bytes | None) -> list[float]:
            digest = _hashlib.sha256(payload or b"").digest()
            return [digest[i % 32] / 255.0 for i in range(dim)]

        for batch in batches:
            yield pd.DataFrame({
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": batch["content"].map(lambda b: len(b) if b is not None else 0),
                "features": batch["content"].map(fake),
            })

    return df.mapInPandas(_decode, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("content", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing for image rows via Arrow-batched mapInPandas:
    filter to images JVM-side (partition pruning can use `kind`), ship
    only (id, kind, content), emit resized payload + new dimensions.

    ``decoder='fake'`` → deterministic stand-in payload (sha256 of the
    input bytes tiled to width*height/64 bytes — stable, size-scaled,
    no media lib needed). ``decoder='pil'`` → NotImplementedError
    naming the dependency, raised on the executor; the plan builds.
    """
    import pandas as pd

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as pd

        if decoder == "pil":
            raise NotImplementedError("image resize requires Pillow; not in this image")
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

        n_out = max(1, width * height // 64)

        def fake(payload: bytes | None) -> bytes:
            digest = _hashlib.sha256(payload or b"").digest()
            return (digest * (n_out // len(digest) + 1))[:n_out]

        for batch in batches:
            yield pd.DataFrame({
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "content": batch["content"].map(fake),
                "width": width,
                "height": height,
            })

    images = df.filter(F.col("kind") == "image").select("media_id", "kind", "content")
    return images.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled frame offset (metadata math only — the decode itself is
    the stubbed step above). Built-in explode over a JVM sequence, no
    Python."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "frame_ms", "content", "meta")
    )
