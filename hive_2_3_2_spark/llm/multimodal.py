"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model: a media column is ``binary`` payload + a ``struct`` of typed
metadata (mime, width/height or sample_rate/duration, byte length). All
Spark-side plumbing — schema, partition sizing, Arrow batch shape — is
real and tested. Decoding is best-real-first: PPM P6, 24-bit BMP, PNG
(8-bit gray/RGB/RGBA, all five scanline filters — pure numpy + stdlib
zlib), and GIF87a/89a (LZW from the public spec, interlace + local
color tables) all decode for REAL with no image library — decode_ppm/
decode_bmp/decode_png/decode_gif below; other formats use PIL when
importable (not in this container) and otherwise fall to a
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


def decode_png(b: bytes):
    """Pure numpy + stdlib-zlib decoder for PNG (no image library).

    Supports the mainstream subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), interlace 0, all five scanline
    filters (None/Sub/Up/Average/Paeth). Strict validation — signature,
    IHDR-first, per-chunk CRC32, exact decompressed size — so arbitrary
    bytes can never false-positive. Returns (h, w, 3) RGB uint8
    (gray replicated, alpha dropped) or None.

    PNG spec: https://www.w3.org/TR/png-3/ (public W3C/ISO standard).
    """
    import struct
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"
    if not b.startswith(SIG):
        return None
    i = len(SIG)
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if len(data) != length or i + 12 + length > len(b):
            return None
        (crc,) = struct.unpack_from(">I", b, i + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ihdr is None:
            if ctype != b"IHDR" or length != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if (
        channels is None
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or w == 0
        or h == 0
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (1 + stride):
        return None
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes, data = lines[:, 0], lines[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = int(ftypes[y])
        line = data[y].copy()
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            rec = line.reshape(w, bpp).cumsum(axis=0, dtype=np.int64)
            rec = (rec % 256).astype(np.int16).reshape(stride)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (line[x] + pred) % 256
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int16)
    px = out.reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA → RGB


def decode_gif(b: bytes):
    """Pure-Python/numpy decoder for GIF87a/89a (first frame) — LZW
    decompression implemented from the public GIF89a specification
    (variable code width, clear/end codes, 4095-entry dictionary),
    global/local color tables, interlace supported. Strict block walk
    (header, logical screen descriptor, sub-block chaining, trailer
    semantics) so arbitrary bytes can't false-positive. Returns
    (h, w, 3) RGB uint8 or None."""
    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = b[10]
    gct = None
    i = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, 13).reshape(n, 3)
        i = 13 + n * 3

    def lzw(min_code: int, data: bytes, n_px: int):
        clear, end = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        dict_init = [(c,) for c in range(clear)] + [None, None]
        table = list(dict_init)
        out: list[int] = []
        acc = bits = 0
        prev = None
        for byte in data:
            acc |= byte << bits
            bits += 8
            while bits >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                bits -= width
                if code == clear:
                    table = list(dict_init)
                    width = min_code + 1
                    prev = None
                    continue
                if code == end:
                    return out if len(out) == n_px else None
                if code < len(table) and table[code] is not None:
                    entry = table[code]
                elif code == len(table) and prev is not None:
                    entry = prev + (prev[0],)
                else:
                    return None
                out.extend(entry)
                if prev is not None and len(table) < 4096:
                    table.append(prev + (entry[0],))
                    if len(table) == (1 << width) and width < 12:
                        width += 1
                prev = entry
                if len(out) >= n_px:
                    # frame full; consume to END or just stop
                    return out[:n_px]
        return out if len(out) == n_px else None

    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(b):
                return None
            w = int.from_bytes(b[i + 5 : i + 7], "little")
            h = int.from_bytes(b[i + 7 : i + 9], "little")
            iflags = b[i + 9]
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if i + n * 3 > len(b):
                    return None
                ct = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if ct is None or w == 0 or h == 0 or i >= len(b):
                return None
            min_code = b[i]
            if not (2 <= min_code <= 8):
                return None
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                ln = b[i]
                data += b[i + 1 : i + 1 + ln]
                i += 1 + ln
            idx = lzw(min_code, bytes(data), w * h)
            if idx is None or max(idx) >= len(ct):
                return None
            px = np.asarray(idx, dtype=np.int32).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deinter = np.empty_like(px)
                deinter[order] = px
                px = deinter
            return ct[px].astype(np.uint8)
        elif block == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


def encode_png(arr) -> bytes:
    """Minimal PNG encoder (8-bit RGB, filter 0, one IDAT) — the
    round-trip partner decode_png's tests and resize outputs use."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


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
        if arr is None:
            arr = decode_png(b)
        if arr is None:
            arr = decode_gif(b)
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
                if arr is None:
                    arr = decode_png(b)
                if arr is None:
                    arr = decode_gif(b)
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


# --- Audio (WAV/PCM) — real decode, no audio library ----------------------


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", LongType()),
    ]
)


def decode_wav(b: bytes):
    """Pure numpy decoder for RIFF/WAVE PCM (8-bit unsigned or 16-bit
    signed little-endian, any channel count). Strict chunk walk (RIFF
    magic, WAVE form, fmt before data, exact sizes) so arbitrary bytes
    can't false-positive. Returns (sample_rate, samples[n, channels]
    int32) or None. WAV format: the public Microsoft/IBM RIFF spec."""
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + size]
        if len(body) != size:
            return None
        if cid == b"fmt ":
            if size < 16:
                return None
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if fmt is not None:
                break
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, n_ch, rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or n_ch == 0 or rate == 0:
        return None  # PCM only
    if bits == 16:
        if len(data) % (2 * n_ch):
            return None
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 8:
        if len(data) % n_ch:
            return None
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        return None
    return rate, samples.reshape(-1, n_ch)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Real audio features over mapInPandas Arrow batches: sample rate,
    channels, per-channel sample count, duration, integer RMS (mean over
    channels). Payloads decode_wav rejects yield NULL feature columns
    (the row is kept — a pipeline wants to SEE undecodable media)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                dec = decode_wav(bytes(b))
                if dec is None:
                    rows.append((int(mid), None, None, None, None, None))
                    continue
                rate, s = dec
                n = s.shape[0]
                rms = int(np.sqrt((s.astype(np.float64) ** 2).mean()))
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        int(s.shape[1]),
                        int(n),
                        int(n * 1000 // rate),
                        rms,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "rms",
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


# --- Video (YUV4MPEG2 / Y4M) — real frame access, no video library -------


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_luma", LongType()),
    ]
)


def decode_y4m(b: bytes):
    """Pure-numpy decoder for YUV4MPEG2 (Y4M) — the uncompressed video
    interchange format of the ffmpeg/x264 toolchain (public format).
    Parses the stream header (W/H/C colorspace), walks FRAME markers,
    and returns (width, height, [luma_plane per frame]) — the Y planes
    as (h, w) uint8 arrays. Supports C420*/C422/C444/Cmono (chroma is
    skipped; luma carries the features). Strict: magic, parameter
    syntax, exact frame sizes. Returns None for anything else."""
    import numpy as np

    if not b.startswith(b"YUV4MPEG2"):
        return None
    nl = b.find(b"\x0a")
    if nl < 0:
        return None
    w = h = None
    chroma = "420"
    for tok in b[9:nl].split(b" "):
        if not tok:
            continue
        k, v = tok[:1], tok[1:]
        try:
            if k == b"W":
                w = int(v)
            elif k == b"H":
                h = int(v)
            elif k == b"C":
                chroma = v.decode("ascii", "replace")
        except ValueError:
            return None
    if not w or not h:
        return None
    if chroma.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        frame_bytes = w * h + 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        frame_bytes = w * h * 3
    elif chroma.startswith("mono"):
        frame_bytes = w * h
    else:
        return None
    i = nl + 1
    frames = []
    while i < len(b):
        fnl = b.find(b"\x0a", i)
        if fnl < 0 or not b[i:fnl].startswith(b"FRAME"):
            return None
        i = fnl + 1
        if i + frame_bytes > len(b):
            return None
        frames.append(
            np.frombuffer(b, np.uint8, w * h, i).reshape(h, w)
        )
        i += frame_bytes
    if not frames:
        return None
    return w, h, frames


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling for Y4M payloads: decode the stream, keep
    every ``every_n``-th frame, emit (frame_no, width, height, integer
    mean luma) per kept frame via mapInPandas Arrow batches — the
    video twin of extract_features. Undecodable payloads contribute no
    rows (a video pipeline samples what it can read; pair with
    extract_features/attach_media metadata to audit the rest)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                dec = decode_y4m(bytes(b))
                if dec is None:
                    continue
                w, h, frames = dec
                for fno in range(0, len(frames), every_n):
                    rows.append(
                        (
                            int(mid),
                            fno,
                            w,
                            h,
                            int(frames[fno].mean()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_no",
                    "width",
                    "height",
                    "mean_luma",
                ],
            )

    return media.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def sniff_mime(payload) -> "F.Column":
    """JVM-side magic-byte mime sniff over a binary column — the router
    a mixed-media table needs BEFORE paying any Python decode cost.
    Pure whole-stage-codegen binary/string ops (substring + hex against
    literal signatures); the per-format Arrow decode paths above run
    only on the rows routed to them. Covers this module's real decoders
    (PNG/GIF/BMP/PPM/WAV/Y4M) plus JPEG (detectable; decoding needs
    PIL). Unknown payloads → application/octet-stream."""

    def pre(n: int, off: int = 1):
        return F.hex(F.substring(payload, off, n))

    return (
        F.when(pre(8) == "89504E470D0A1A0A", F.lit("image/png"))
        .when(pre(6).isin("474946383761", "474946383961"), F.lit("image/gif"))
        .when(pre(3) == "FFD8FF", F.lit("image/jpeg"))
        .when(pre(2) == "424D", F.lit("image/bmp"))
        .when(pre(2) == "5036", F.lit("image/x-portable-pixmap"))
        .when(
            (pre(4) == "52494646") & (pre(4, 9) == "57415645"),
            F.lit("audio/wav"),
        )
        .when(pre(9) == "595556344D50454732", F.lit("video/x-y4m"))
        .otherwise(F.lit("application/octet-stream"))
    )
