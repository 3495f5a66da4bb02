"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

(SURVEY-mandated addition for training-data pipelines.) The container has
no image/audio codecs, so the DECODE step is a deterministic stub behind
``DECODERS`` — clearly marked; swapping in PIL/torchaudio on a real cluster
changes ONE function. Everything Spark-side is real and tested: the schema,
Arrow batch shape (``mapInPandas`` over record-batch iterators), partition
behavior, and the feature-extraction contract.

Scale design: media bytes stay in one ``binary`` column; decode/feature
kernels are per-partition Arrow batch iterators (no row-at-a-time Python,
no driver collect); metadata-only plans never touch the bytes (column
pruning drops the binary column when unreferenced).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, "
    "width int, height int, duration_ms int"
)


def _stub_decode_image(buf: bytes) -> dict:
    """STUB (no codec libs in this container): deterministic fake decode.
    Real deployment: PIL.Image.open(io.BytesIO(buf)) here."""
    return {"width": 1 + buf[0] % 64 if buf else 0, "height": 1 + buf[-1] % 64 if buf else 0, "duration_ms": 0}


def _stub_decode_av(buf: bytes) -> dict:
    """STUB: real deployment decodes headers via av/torchaudio."""
    return {"width": 0, "height": 0, "duration_ms": len(buf) * 10}


DECODERS = {"image": _stub_decode_image, "audio": _stub_decode_av, "video": _stub_decode_av}


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                buf = bytes(content) if content is not None else b""
                d = DECODERS.get(kind, _stub_decode_av)(buf)
                checksum = sum(buf[:: max(1, len(buf) // 64)]) if buf else 0
                rows.append(
                    (media_id, kind, len(buf), checksum, d["width"], d["height"], d["duration_ms"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "checksum", "width", "height", "duration_ms",
                ],
            )

    return df.select("media_id", "kind", "content").mapInPandas(kernel, FEATURE_SCHEMA)


def synth_media(spark, n_rows: int = 200) -> DataFrame:
    """Deterministic fake media table (binary payload derived from the id)."""
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("media-payload-"), F.sha2(F.col("id").cast("string"), 256)),
            "utf-8",
        ).cast("binary").alias("content"),
        F.create_map(F.lit("origin"), F.lit("synth")).alias("meta"),
    )


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize contract: binary in -> binary out + updated typed meta.
    The PIXEL transform is a STUB (deterministic byte fold — no codec libs
    in this container; real deployment: PIL resize here); the Spark-side
    plumbing is real: Arrow batch iterators over the binary column, output
    schema (content + width/height meta), column pruning of untouched
    metadata, one narrow pass."""
    target = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_w, out_h = [], [], []
            for content in pdf["content"]:
                buf = bytes(content) if content is not None else b""
                # STUB resample: fold/stretch bytes to the target size
                # deterministically (real impl: decode -> resize -> encode)
                if buf:
                    reps = (target // len(buf)) + 1
                    out = (buf * reps)[:target]
                else:
                    out = b"\x00" * target
                out_content.append(out)
                out_w.append(width)
                out_h.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "kind", "content"
    ).mapInPandas(kernel, "media_id long, kind string, content binary, width int, height int")


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling contract: one row per sampled frame offset.
    Decode is stubbed; the explode/plumbing (the Spark-side work) is real."""
    feats = extract_features(df.filter(F.col("kind") == "video"))
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return feats.select(
        "media_id", F.explode(offsets).alias("frame_offset_ms")
    )
