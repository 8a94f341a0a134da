"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly layout, Arrow
batch shape through ``mapInPandas`` — and the codec has three tiers:

1. ``parse_image_header``: dependency-free container-header parse
   (PNG/JPEG/GIF → width/height/mode, stdlib ``struct``) — always
   available, runs inline in ``extract_features``'s Arrow batches to
   populate dimension metadata without a pixel decode.
2. PIL full pixel decode, when installed (the Dockerfile ships Pillow);
   ``decode_image_real`` prefers it and falls back to tier 1.
3. ``decode_image_stub``: deterministic fake feature vector from the byte
   content — the embed/resize stand-in until a pixel library is present.

Swapping the stub for a real embedder (PIL/torchvision/ffmpeg) changes
only the inner function body — the distributed plan is identical.

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
        # populated by the header-parse codec tier when the bytes are a
        # recognized image (PNG/JPEG/GIF); NULL for other payloads
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_JPEG_SOF_MODES = {1: "L", 3: "RGB", 4: "CMYK"}
_PNG_COLOR_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def parse_image_header(content: bytes) -> tuple[int, int, str] | None:
    """Dependency-free (width, height, mode) from the container header of
    a PNG / JPEG / GIF byte stream; None when the bytes are not a
    recognized image. Pure stdlib ``struct`` over the first KB — never a
    pixel decode, so it is safe on truncated payloads and cheap enough to
    run inline in the Arrow batch loop (a header parse is how warehouse
    media pipelines populate dimension metadata without paying a decode).
    """
    import struct

    if content is None or len(content) < 10:
        return None
    # PNG: 8-byte signature, then the IHDR chunk (length+type+w+h+depth+ct)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        if len(content) < 26 or content[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", content[16:24])
        # PNG dims are unsigned 32-bit; the feature schema stores int32 —
        # a corrupt header past 2^31-1 (or zero) must yield None, not an
        # Arrow cast failure inside the task (ADVICE r7)
        if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
            return None
        mode = _PNG_COLOR_MODES.get(content[25], "RGB")
        return w, h, mode
    # GIF87a / GIF89a: logical screen descriptor, little-endian
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        if w == 0 or h == 0:
            return None
        return w, h, "P"
    # JPEG: walk the marker segments to the first SOFn frame header
    if content[:2] == b"\xff\xd8":
        i = 2
        n = len(content)
        while i + 4 <= n:
            if content[i] != 0xFF:
                return None
            # spec-legal 0xFF fill bytes may pad before the marker byte
            # (ITU T.81 §B.1.1.2) — skip them or a fill byte is read as
            # marker 0xFF and the bogus segment length desyncs (ADVICE r7)
            while i + 1 < n and content[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                return None
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            # SOF0-3, 5-7, 9-11, 13-15 all carry the frame dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 >= n:
                    return None
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                if w == 0 or h == 0:  # h=0 = DNL-deferred; treat as unknown
                    return None
                ncomp = content[i + 9]
                return w, h, _JPEG_SOF_MODES.get(ncomp, "RGB")
            i += 2 + seg_len
    return None


def decode_image_real(content: bytes) -> tuple[int, int, str]:
    """Real image decode → (width, height, mode). Two tiers:

    1. PIL, when installed (the Dockerfile ships Pillow): a full pixel
       decode — authoritative for every format PIL supports.
    2. Without PIL (this test container): the dependency-free container
       header parse (``parse_image_header``, PNG/JPEG/GIF) — dimensions
       and mode come from the format header, which is exactly what this
       function returns; only pixel-level work (resize/embed) needs the
       real library, and that path stays behind ``decode_image_stub``'s
       deterministic fake until PIL is present.

    Raises NotImplementedError only for byte streams neither tier
    recognizes. The distributed plan (Arrow-batched mapInPandas over
    binary columns) is identical in every mode — the codec is a
    dependency-injection point, exercised PIL-free and (when available)
    with PIL by tests/test_north_star.py."""
    try:
        import io

        import PIL.Image
    except ImportError:
        parsed = parse_image_header(content)
        if parsed is not None:
            return parsed
        raise NotImplementedError(
            "unrecognized image bytes: the stdlib header parser covers "
            "PNG/JPEG/GIF, and full-decode for other formats requires "
            "PIL (shipped in the Dockerfile, not this test container); "
            "use decode_image_stub for plumbing tests — the distributed "
            "plan is the same"
        ) from None
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
        import struct as _struct

        import pandas as _pd

        def _stub(b: bytes) -> list[float]:
            digest = _hashlib.sha256(b or b"").digest()
            return [digest[i] / 255.0 for i in range(feature_dim)]

        # inline copy of parse_image_header (the closure must stay
        # stdlib-self-contained — see docstring above; agreement with the
        # canonical module-level parser is pinned by
        # tests/test_north_star.py::test_extract_features_header_tier)
        def _hdr(b):
            if b is None or len(b) < 10:
                return (None, None, None)
            png_modes = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
            if b[:8] == b"\x89PNG\r\n\x1a\n":
                if len(b) < 26 or b[12:16] != b"IHDR":
                    return (None, None, None)
                w, h = _struct.unpack(">II", b[16:24])
                if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
                    return (None, None, None)
                return (w, h, png_modes.get(b[25], "RGB"))
            if b[:6] in (b"GIF87a", b"GIF89a"):
                w, h = _struct.unpack("<HH", b[6:10])
                if w == 0 or h == 0:
                    return (None, None, None)
                return (w, h, "P")
            if b[:2] == b"\xff\xd8":
                i, n = 2, len(b)
                while i + 4 <= n:
                    if b[i] != 0xFF:
                        return (None, None, None)
                    while i + 1 < n and b[i + 1] == 0xFF:  # FF fill bytes
                        i += 1
                    if i + 4 > n:
                        return (None, None, None)
                    m = b[i + 1]
                    if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                        i += 2
                        continue
                    seg = _struct.unpack(">H", b[i + 2 : i + 4])[0]
                    if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                        if i + 9 >= n:
                            return (None, None, None)
                        h, w = _struct.unpack(">HH", b[i + 5 : i + 9])
                        if w == 0 or h == 0:
                            return (None, None, None)
                        return (w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(b[i + 9], "RGB"))
                    i += 2 + seg
            return (None, None, None)

        for pdf in it:
            content = pdf["content"]
            dims = content.map(_hdr)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_digest": content.map(
                        lambda b: _hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b: _stub(b or b"")),
                    "width": dims.map(lambda t: t[0]).astype("object"),
                    "height": dims.map(lambda t: t[1]).astype("object"),
                    "mode": dims.map(lambda t: t[2]),
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
