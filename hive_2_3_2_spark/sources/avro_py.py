"""Avro Object Container Files without the spark-avro datasource.

The sandbox ships Spark without the optional ``spark-avro`` module (and
has no network to fetch it), but Hive's AvroSerDe surface
(reference: serde/src/java/org/apache/hadoop/hive/serde2/avro/
AvroSerDe.java:50, AvroDeserializer.java, AvroSerializer.java) is
in-scope — so this module implements the PUBLIC Avro 1.x specification
(container file + binary encoding, avro.apache.org/docs/current/
specification/) directly, the same approach as the PNG/GIF/WAV decoders
in llm/multimodal.py.

Execution model (100 TB story):
- READ: ``spark.read.format("binaryFile")`` lists the ``.avro`` files,
  then each file is decoded INSIDE an executor by a mapInPandas batch —
  parallelism is per-file (Avro is sync-marker-splittable, but whole-file
  decode matches how Hive's CombineHiveInputFormat packs small Avro files
  anyway). Only the first file's HEADER bytes reach the driver, for
  schema inference.
- WRITE: one container file per partition, written from the executors
  via foreachPartition to the (shared) filesystem — the FileSinkOperator
  pattern, no driver collect.
- Python-side decode is the slow path by construction; the intended
  pipeline is Avro → (this reader) → parquet once, then parquet
  thereafter — which is also Hive-at-scale practice for Avro landing
  zones.

Supported schema surface (the AvroSerDe-typical subset): null, boolean,
int, long, float, double, bytes, string, flat records, array<T>,
map<string,T>, 2-branch nullable unions ["null", T] / [T, "null"], enum
(read as string), fixed (read as bytes), logical types date
(int/days) and timestamp-micros / timestamp-millis (long). Codecs:
null and deflate (zlib, as the spec defines).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- decode


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: primitive long encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _read_value(buf: io.BytesIO, schema) -> object:
    """Decode one datum for ``schema`` (parsed Avro JSON)."""
    if isinstance(schema, list):  # union: long branch index, then value
        idx = _read_long(buf)
        return _read_value(buf, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _read_value(buf, f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(_read_value(buf, schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _read_value(buf, schema["values"])
            return out
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _read_value(buf, t)  # {"type": "long", "logicalType": ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def read_header(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    """(parsed schema, codec, sync marker) from a container header."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = buf.read(16)
    return schema, codec, sync


def decode_container(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file → (schema, rows-as-dicts)."""
    buf = io.BytesIO(data)
    schema, codec, sync = read_header(buf)
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":  # raw deflate, no zlib header (spec)
            block = zlib.decompress(block, -15)
        bb = io.BytesIO(block)
        for _ in range(count):
            rows.append(_read_value(bb, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows


# ---------------------------------------------------------------- encode


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write_value(out: io.BytesIO, schema, v) -> None:
    if isinstance(schema, list):  # union — pick the matching branch
        if v is None and "null" in schema:
            _write_long(out, schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        _write_long(out, idx)
        _write_value(out, schema[idx], v)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _write_value(out, f["type"], v.get(f["name"]))
            return
        if t == "array":
            items = list(v or [])
            if items:
                _write_long(out, len(items))
                for item in items:
                    _write_value(out, schema["items"], item)
            _write_long(out, 0)
            return
        if t == "map":
            entries = dict(v or {})
            if entries:
                _write_long(out, len(entries))
                for k, item in entries.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _write_value(out, schema["values"], item)
            _write_long(out, 0)
            return
        _write_value(out, t, v)  # logical-type wrapper
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif schema in ("int", "long"):
        _write_long(out, int(v))
    elif schema == "float":
        out.write(struct.pack("<f", float(v)))
    elif schema == "double":
        out.write(struct.pack("<d", float(v)))
    elif schema == "bytes":
        _write_bytes(out, bytes(v))
    elif schema == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    else:
        raise ValueError(f"unsupported Avro schema node: {schema!r}")


def encode_container(
    schema: dict, rows: list[dict], codec: str = "deflate",
    sync: bytes = b"hive232sparkSYNC",
) -> bytes:
    """Encode rows into one container file (header + one block)."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if rows:
        body = io.BytesIO()
        for r in rows:
            _write_value(body, schema, r)
        block = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            block = co.compress(block) + co.flush()
        _write_long(out, len(rows))
        _write_long(out, len(block))
        out.write(block)
        out.write(sync)
    return out.getvalue()


# ------------------------------------------------- Spark schema bridge

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
    "null": "void",
}
_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "binary": "bytes",
    "string": "string",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}


def _avro_type_to_ddl(schema) -> str:
    """Avro schema node → Spark DDL type string."""
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported non-nullable union: {schema!r}")
        return _avro_type_to_ddl(branches[0])
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return "date"
        if lt in ("timestamp-micros", "timestamp-millis"):
            return "timestamp"
        t = schema["type"]
        if t == "array":
            return f"array<{_avro_type_to_ddl(schema['items'])}>"
        if t == "map":
            return f"map<string,{_avro_type_to_ddl(schema['values'])}>"
        if t == "enum":
            return "string"
        if t == "fixed":
            return "binary"
        if t == "record":
            inner = ",".join(
                f"{f['name']}:{_avro_type_to_ddl(f['type'])}"
                for f in schema["fields"]
            )
            return f"struct<{inner}>"
        return _avro_type_to_ddl(t)
    if schema in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[schema]
    raise ValueError(f"unsupported Avro type: {schema!r}")


def spark_schema_ddl(avro_schema: dict) -> str:
    """Top-level record schema → Spark DDL column list."""
    if avro_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    return ", ".join(
        f"{f['name']} {_avro_type_to_ddl(f['type'])}"
        for f in avro_schema["fields"]
    )


def avro_schema_from_spark(schema, name: str = "spark_row") -> dict:
    """Spark StructType → Avro record schema (every field nullable,
    AvroSerDe's convention)."""
    from pyspark.sql.types import (
        ArrayType,
        DateType,
        MapType,
        StructType,
        TimestampType,
    )

    def conv(dt):
        if isinstance(dt, StructType):
            return {
                "type": "record",
                "name": f"{name}_struct{id(dt)}",
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType)]}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, ArrayType):
            return {"type": "array", "items": ["null", conv(dt.elementType)]}
        if isinstance(dt, MapType):
            return {"type": "map", "values": ["null", conv(dt.valueType)]}
        if isinstance(dt, DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        s = dt.typeName()
        if s in _SPARK_TO_AVRO:
            out = _SPARK_TO_AVRO[s]
            return out if isinstance(out, str) else dict(out)
        raise ValueError(f"no Avro mapping for Spark type {s!r}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType)]}
            for f in schema.fields
        ],
    }


def _logical_columns(avro_schema: dict) -> dict[str, str]:
    """field name → logical type, for post-decode conversion."""

    def logical(node):
        if isinstance(node, list):
            branches = [s for s in node if s != "null"]
            return logical(branches[0]) if len(branches) == 1 else None
        if isinstance(node, dict):
            return node.get("logicalType")
        return None

    return {
        f["name"]: lt
        for f in avro_schema["fields"]
        if (lt := logical(f["type"])) is not None
    }


# ---------------------------------------------------------------- Spark IO


def read_avro_py(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: binaryFile scan → per-file mapInPandas
    decode. Schema comes from the FIRST file's header (driver reads
    header bytes only); every file must carry a compatible schema, like
    Hive's one-schema-per-table AvroSerDe contract.

    Timestamps: the file stores true epoch micros/millis (UTC). Arrow
    interprets a NAIVE pandas timestamp returned from mapInPandas in the
    Spark session timezone, so the decode converts epoch → session-tz
    wall clock before handing the batch back — round-trips correctly on
    any host timezone, and matches what native spark-avro produces."""
    import pandas as pd

    session_tz = spark.conf.get("spark.sql.session.timeZone")

    def _epoch_to_session(series: pd.Series, unit: str) -> pd.Series:
        s = pd.to_datetime(series, unit=unit, utc=True)
        try:
            return s.dt.tz_convert(session_tz).dt.tz_localize(None)
        except Exception:  # unknown tz string — keep UTC wall clock
            return s.dt.tz_localize(None)

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro") if os.path.isdir(path) else path
    )
    first = files.select("path").limit(1).collect()
    if not first:
        raise ValueError(f"no .avro files under {path!r}")
    local = first[0].path.removeprefix("file:")
    with open(local, "rb") as f:
        avro_schema, _codec, _sync = read_header(
            io.BytesIO(f.read(1 << 20))
        )
    ddl = spark_schema_ddl(avro_schema)
    logical = _logical_columns(avro_schema)
    field_names = [f["name"] for f in avro_schema["fields"]]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _s, rows = decode_container(bytes(content))
                out = pd.DataFrame(
                    [[r.get(n) for n in field_names] for r in rows],
                    columns=field_names,
                )
                for col, lt in logical.items():
                    if lt == "date":
                        out[col] = pd.to_datetime(
                            out[col], unit="D", errors="coerce"
                        ).dt.date
                    elif lt == "timestamp-micros":
                        out[col] = _epoch_to_session(out[col], "us")
                    elif lt == "timestamp-millis":
                        out[col] = _epoch_to_session(out[col], "ms")
                yield out

    return files.select("content").mapInPandas(decode, schema=ddl)


def write_avro_py(
    df: DataFrame, path: str, codec: str = "deflate"
) -> int:
    """Distributed Avro write: one container file per partition, written
    from the executors (FileSinkOperator pattern — assumes ``path`` is on
    a filesystem all executors share, true for local mode and HDFS/NFS).

    Overwrite semantics match the native datasource's ``mode('overwrite')``:
    pre-existing ``part-*.avro`` files are removed first, so rewriting with
    fewer partitions never leaves stale parts behind.

    Timestamps: PySpark's RDD row conversion yields naive OS-local
    datetimes (TimestampType.fromInternal uses ``fromtimestamp``), so
    ``.timestamp()`` recovers the true UTC epoch on any host timezone —
    the file stores standard epoch micros, interoperable with native
    spark-avro. (The annual DST fold hour is inherently ambiguous in the
    naive wall clock; everything else round-trips exactly.)"""
    import glob as _glob

    avro_schema = avro_schema_from_spark(df.schema)
    names = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)
    for stale in _glob.glob(
        os.path.join(path, "part-*.avro")
    ) + _glob.glob(os.path.join(path, ".part-*.avro.tmp")):
        os.remove(stale)
    schema_json = json.dumps(avro_schema)

    import datetime

    def to_datum(row) -> dict:
        d = {}
        for n in names:
            v = row[n]
            if isinstance(v, datetime.datetime):
                v = int(v.timestamp() * 1_000_000)
            elif isinstance(v, datetime.date):
                v = (v - datetime.date(1970, 1, 1)).days
            d[n] = v
        return d

    def sink(idx: int, rows) -> Iterator[int]:
        data = [to_datum(r) for r in rows]
        if not data and idx != 0:
            return iter(())  # skip empty part files (keep part-00000)
        blob = encode_container(json.loads(schema_json), data, codec)
        tmp = os.path.join(path, f".part-{idx:05d}.avro.tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, f"part-{idx:05d}.avro"))
        return iter((len(data),))

    return df.rdd.mapPartitionsWithIndex(sink).sum()
