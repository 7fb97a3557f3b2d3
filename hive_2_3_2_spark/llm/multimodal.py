"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model: a media column is ``binary`` payload + a ``struct`` of typed
metadata (mime, width/height or sample_rate/duration, byte length). All
Spark-side plumbing — schema, partition sizing, Arrow batch shape — is
real and tested. Decoding is best-real-first: uncompressed formats
(PPM P6, 24-bit BMP) decode for REAL with pure numpy (exact pixels, no
image library needed — decode_ppm/decode_bmp below); compressed formats
use PIL when importable (not in this container) and otherwise fall to a
deterministic fake that preserves the bytes-in→features-out contract
(the documented stub path).

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


def decode_ppm(b: bytes):
    """Pure-numpy decoder for binary PPM (P6) — no image library needed.

    Strict parse (magic, three whitespace-separated header ints, exact
    payload length = w*h*3) so arbitrary binary/text payloads can never
    false-positive. Returns an (h, w, 3) uint8 array or None."""
    import numpy as np

    if not b.startswith(b"P6"):
        return None
    # header tokens: P6 <width> <height> <maxval>, then ONE whitespace
    # byte, then raw RGB. Comments (#...) allowed per spec.
    i, vals = 2, []
    while len(vals) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        vals.append(int(b[i:j]))
        i = j
    if len(vals) < 3 or i >= len(b) or not b[i : i + 1].isspace():
        return None
    i += 1
    w, h, maxval = vals
    if maxval != 255 or len(b) - i != w * h * 3:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def decode_bmp(b: bytes):
    """Pure-numpy decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding). Returns (h, w, 3) RGB uint8 or
    None for anything else (compressed/paletted/other depths)."""
    import struct

    import numpy as np

    if len(b) < 54 or not b.startswith(b"BM"):
        return None
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0 or h <= 0:
        return None
    stride = (w * 3 + 3) & ~3
    if data_off + stride * h > len(b):
        return None
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)[::-1]  # bottom-up → top-down
    return bgr[..., ::-1]  # BGR → RGB


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """Image decode, best-real-first:

    1. uncompressed formats (PPM P6, 24-bit BMP) decode for REAL with
       pure numpy — no image library required, exact pixels;
    2. anything else uses PIL when importable (not in this container);
    3. otherwise a deterministic fake preserving the bytes-in →
       (width, height, mean)-out contract, so the Spark plumbing stays
       fully exercised for arbitrary payloads (documented stub path).
    """
    try:
        from PIL import Image as _PILImage  # noqa: N813
    except ImportError:
        _PILImage = None

    def one(b) -> tuple[int, int, int]:
        b = bytes(b)
        arr = decode_ppm(b)
        if arr is None:
            arr = decode_bmp(b)
        if arr is not None:
            return arr.shape[1], arr.shape[0], int(arr.mean())
        if _PILImage is not None:
            import io

            import numpy as np

            img = np.asarray(_PILImage.open(io.BytesIO(b)).convert("RGB"))
            return img.shape[1], img.shape[0], int(img.mean())
        # deterministic fake (documented stub path)
        return (
            64 + (len(b) % 577),
            64 + ((len(b) * 31) % 421),
            sum(b[:64]) // max(1, len(b[:64])),
        )

    decoded = [one(b) for b in payloads]
    return pd.DataFrame(
        {
            "width": [d[0] for d in decoded],
            "height": [d[1] for d in decoded],
            "mean": [d[2] for d in decoded],
        }
    )


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
    """Resize: REAL nearest-neighbor over decoded pixels for payloads the
    pure-numpy decoders understand (PPM/BMP → re-encoded as P6);
    stride-resample stand-in for everything else (no image libraries in
    this container for compressed formats).

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
        import numpy as np

        for pdf in batches:
            outs = []
            for b in pdf["payload"]:
                b = bytes(b)
                n = len(b)
                arr = decode_ppm(b)
                if arr is None:
                    arr = decode_bmp(b)
                if arr is not None:
                    # REAL nearest-neighbor resize to side×side for
                    # decodable payloads, re-encoded as PPM P6.
                    h, w = arr.shape[:2]
                    ys = (np.arange(side) * h) // side
                    xs = (np.arange(side) * w) // side
                    small = arr[ys][:, xs]
                    outs.append(
                        f"P6\n{side} {side}\n255\n".encode()
                        + small.tobytes()
                    )
                elif n == 0:
                    outs.append(b"")
                else:
                    # stride resample for undecodable payloads (the
                    # deterministic bytes→bytes stand-in contract)
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
