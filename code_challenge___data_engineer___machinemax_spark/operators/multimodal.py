"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as first-class columns: `data: binary` plus a typed
``meta`` struct, processed by Arrow-batched mapInPandas operators. The
actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so decoding is
split into:

- real Spark plumbing (tested): schema, partitioning, UDF signatures, batch
  iteration, frame-sampling arithmetic, byte-level feature extraction;
- the codec call itself, behind ``decoder=`` — ``"fake"`` is a deterministic
  byte-level stand-in; ``"real"`` raises NotImplementedError until the
  library is present (import-gated), without touching the surrounding plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
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
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        # populated only by decoder="real" on image rows (true pixel
        # dimensions from the codec); NULL on the byte-level "fake" path
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from `documents`: text bytes as payload,
    kind + meta derived from doc_id. Gives the multimodal operators a real
    distributed input without shipping binaries in testdata."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("doc_id") % 640 + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("doc_id") % 480 + 16).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
        F.when(kind == "video", (F.col("doc_id") % 240 + 1).cast("int")).alias("n_frames"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        meta.alias("meta"),
    )


def decode_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-item feature extraction over binary payloads via mapInPandas.

    ``decoder="fake"``: deterministic byte statistics (length, mean,
    empirical entropy) — exercises the full Arrow round-trip with binary
    columns. ``decoder="real"``: image rows are decoded with PIL (true pixel
    dimensions in ``decoded_width``/``decoded_height``; undecodable payloads
    keep NULLs); raises NotImplementedError when PIL is absent, and audio/
    video stay byte-level (librosa/ffmpeg are gated the same way the day
    they exist).
    """
    import math

    import pandas as pd

    if decoder == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real media decoding needs PIL/librosa/ffmpeg, not present in "
                "this environment; use decoder='fake' for the plumbing path"
            ) from exc

    def _image_dims(data: bytes) -> tuple[int | None, int | None]:
        try:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(data)) as img:
                return int(img.width), int(img.height)
        except Exception:
            return None, None  # not a decodable image — keep the row

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = r["data"] or b""
                n = len(data)
                if n:
                    counts: dict[int, int] = {}
                    for b in data:
                        counts[b] = counts.get(b, 0) + 1
                    mean = sum(data) / n
                    entropy = -sum(
                        (c / n) * math.log2(c / n) for c in counts.values()
                    )
                else:
                    mean, entropy = None, None
                width = height = None
                if decoder == "real" and r["kind"] == "image" and n:
                    width, height = _image_dims(bytes(data))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": n,
                        "byte_mean": round(mean, 6) if mean is not None else None,
                        "byte_entropy": round(entropy, 6) if entropy is not None else None,
                        "decoded_width": width,
                        "decoded_height": height,
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling for video rows: one output row per kept frame index —
    pure Spark (sequence + explode); the decode of each frame is the
    stubbed step downstream."""
    video = df.filter(F.col("kind") == "video")
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return video.select(
        "media_id",
        F.explode(frames).alias("frame_index"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: real pixel work needs PIL (absent). The Spark-side
    contract (schema in == schema out, meta rewritten) is real."""
    raise NotImplementedError(
        "resize requires an image codec (PIL), not present in this "
        "environment; the operator contract is meta.width/height rewritten "
        f"to ({width}, {height}) with re-encoded data"
    )
