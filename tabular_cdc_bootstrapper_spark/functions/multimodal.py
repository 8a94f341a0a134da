"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly layout, Arrow
batch shape through ``mapInPandas`` — while the codec step is stubbed
(image/audio libraries are not in this container): ``decode_image_stub``
produces a deterministic fake decode from the byte content, and
``decode_image_real`` raises ``NotImplementedError`` with the intended
dependency. Swapping the stub for a real decoder (PIL/torchvision/ffmpeg)
changes only the inner function body — the distributed plan is identical.

Batch shape matters at scale: ``mapInPandas`` receives Arrow record
batches; media bytes never round-trip through Python row objects, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory per
task (set it low for video blobs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_real(content: bytes) -> tuple[int, int, str]:
    """Real image decode → (width, height, mode), via PIL when installed.

    This container ships no image libraries, so the import is optional:
    environments with PIL get the real codec, others get a clear
    NotImplementedError pointing at the stub. The distributed plan
    (Arrow-batched mapInPandas over binary columns) is identical either
    way — the codec is a dependency-injection point, exercised in both
    modes by tests/test_north_star.py (the PIL case skip-marked)."""
    try:
        import io

        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision (not installed in "
            "this container); use decode_image_stub — the distributed plan "
            "is the same"
        ) from exc
    with PIL.Image.open(io.BytesIO(content)) as img:
        return img.width, img.height, img.mode


def decode_image_stub(content: bytes, feature_dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature extract': sha256-seeded vector.

    Stands in for decode→resize→embed so the pipeline shape (binary in,
    float vector out, Arrow-batched) is fully exercised and testable."""
    digest = hashlib.sha256(content or b"").digest()
    return [digest[i] / 255.0 for i in range(feature_dim)]


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Binary media → per-item features via Arrow-batched mapInPandas.

    The closure is deliberately self-contained (imports + codec logic all
    inside): cloudpickle then serializes it by value, so Python workers
    need not import this package. Pipelines that do want module-level UDFs
    call shipping.ensure_self_on_workers(spark) instead.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _stub(b: bytes) -> list[float]:
            digest = _hashlib.sha256(b or b"").digest()
            return [digest[i] / 255.0 for i in range(feature_dim)]

        for pdf in it:
            content = pdf["content"]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_digest": content.map(
                        lambda b: _hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b: _stub(b or b"")),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling (plumbing): one output row per sampled frame
    timestamp, derived from meta.duration_ms — the decode of the actual
    frame is the same stubbed codec boundary as extract_features."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull(),
        F.sequence(
            F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
        ),
    ).otherwise(F.array(F.lit(0)))
    return (
        df.withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "kind", "frame_ts_ms", "mime")
    )


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a synthetic media table from the documents fixture: text bytes
    as content (deterministic), so multimodal plumbing is testable against
    the driver's tables without binary fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )
