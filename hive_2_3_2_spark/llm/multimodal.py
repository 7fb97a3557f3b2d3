"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model: a media column is ``binary`` payload + a ``struct`` of typed
metadata (mime, width/height or sample_rate/duration, byte length). All
Spark-side plumbing — schema, partition sizing, Arrow batch shape — is
real and tested; the *decoders* are stubbed behind import-guards because
the image/audio libraries are not in this container (clearly marked below;
swap ``_decode_image_batch`` internals for PIL/torchvision in production).

Scale notes: media rows are large — the operators below keep payloads in
Arrow batches end-to-end (mapInPandas), never collect, and re-partition by
byte budget (``target_partition_mb``) instead of row count so executors
don't OOM on skewed media sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", LongType()),
        StructField("feat_head", StringType()),
    ]
)


def attach_media(df: DataFrame, payload_col: str, id_col: str, mime: str) -> DataFrame:
    """Wrap a binary column into the media schema with derived metadata.

    width/height are decoded lazily downstream (decode stub); here we only
    record payload byte length — metadata that's free at ingest.
    """
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
        ).alias("meta"),
    )


def repartition_by_bytes(
    df: DataFrame, total_bytes: int, target_partition_mb: int = 128
) -> DataFrame:
    """Partition media rows by byte budget, not row count — media sizes are
    heavy-tailed and row-count partitioning OOMs on the tail."""
    n = max(1, total_bytes // (target_partition_mb * 1024 * 1024))
    return df.repartition(n)


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB DECODER — container has no image libraries.

    Production: replace the body with PIL.Image.open over io.BytesIO.
    The deterministic fake below preserves the real contract (bytes in →
    (width, height, mean) out) so the Spark plumbing is fully exercised.
    """
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real decoder wiring is intentionally stubbed in this container"
        )
    except ImportError:
        pass
    # Deterministic fake: derive pseudo-dimensions from payload bytes.
    widths = payloads.map(lambda b: 64 + (len(b) % 577))
    heights = payloads.map(lambda b: 64 + ((len(b) * 31) % 421))
    means = payloads.map(lambda b: sum(b[:64]) // max(1, len(b[:64])))
    return pd.DataFrame({"width": widths, "height": heights, "mean": means})


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Each batch arrives as a pandas DataFrame; the decoder is vectorized
    over the batch — the shape a real CV/audio pipeline uses (GPU decode
    would consume the same iterator)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = _decode_image_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat_mean": dec["mean"].astype("int64"),
                    "feat_head": dec["width"].astype(str)
                    + "x"
                    + dec["height"].astype(str),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo: slice payload into fixed windows
    (for video this is the frame step; here byte windows) — pure JVM
    (no decode needed for the sampling plan itself)."""
    n_frames = F.greatest(
        F.floor(F.col("meta.n_bytes") / every_n_bytes), F.lit(1)
    ).cast("int")
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_"),
    ).select("media_id", F.col("frame_no").cast("long").alias("frame_no"))


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """STUB RESIZE — container has no image libraries; production swaps
    the body for PIL ``Image.resize`` over the decoded pixels.

    The deterministic stand-in keeps the real bytes→bytes contract and
    all the Spark plumbing (mapInPandas Arrow batches, MEDIA_SCHEMA in
    and out): 'resample' the payload to exactly ``target_bytes`` by
    integer stride — output byte i is input byte ``(i*n)//target_bytes``
    (upsampling repeats bytes, downsampling skips; empty payloads stay
    empty). Pure integer arithmetic, so any engine reproduces the output
    bit-for-bit — the suite oracle recomputes it from hex in SQL.
    Metadata is rewritten to the resized contract (8×8 when
    target_bytes=64)."""
    import math

    side = max(1, int(math.isqrt(target_bytes)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf["payload"]:
                b = bytes(b)
                n = len(b)
                if n == 0:
                    outs.append(b"")
                else:
                    outs.append(
                        bytes(
                            b[(i * n) // target_bytes]
                            for i in range(target_bytes)
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "meta": [
                        {
                            "mime": m["mime"],
                            "n_bytes": len(o),
                            "width": side,
                            "height": side,
                        }
                        for m, o in zip(pdf["meta"], outs)
                    ],
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)
