"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming surface (HiveEndPoint ingest, SURVEY §2.10) has
no user-programmable stateful operator; Structured Streaming's
``applyInPandasWithState`` is the Spark-native extension point for one —
arbitrary per-key state carried across micro-batches, Arrow-batched, with
event-time timeouts driven by the watermark.

Scale design: state lives in the state store partitioned by grouping key
(one shard per shuffle partition); each micro-batch shuffles only that
batch's rows to their key's shard. Keys never co-reside in Python — the
UDF sees one key (plus its state) at a time, so memory per task is
O(batch rows for that key), not O(keys).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd  # noqa: F401  (needed at module top for pandas UDF type hints)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-key (count, sum) maintained in explicit group state and
    re-emitted (update mode) every micro-batch the key appears in.

    The GroupState tuple is the Hive-UDAF-style partial aggregation
    buffer (GenericUDAFEvaluator merge semantics,
    ql/udf/generic/GenericUDAFEvaluator.java:46) — but carried *across
    micro-batches* instead of across mappers.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += int(len(vals))
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Event-time sessionizer with explicit state + EventTimeTimeout:
    emits one row per *closed* session (append semantics).

    A session closes when the watermark passes last_seen + gap. Unlike
    ``F.session_window`` this keeps arbitrary per-session state (here
    count + value sum; in a real pipeline, e.g. a token budget or a
    dedup sketch) — the "custom stateful operator" case built-ins can't
    express.
    """
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).tolist()
        vals = rows["value"].fillna(0.0).tolist() if "value" in rows else [0.0] * len(ts_us)
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us, end_us, n, total = ts_us[0], ts_us[0], 0, 0.0
        closed = []
        for t, v in zip(ts_us, vals):
            if t - end_us > gap_us:
                closed.append((start_us, end_us, n, total))
                start_us, n, total = t, 0, 0.0
            end_us = max(end_us, t)
            n += 1
            total += float(v)
        state.update((start_us, end_us, n, total))
        # timeout timestamps are epoch *milliseconds*
        state.setTimeoutTimestamp((end_us + gap_us) // 1000)
        for s, e2, cnt, tot in closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [pd.Timestamp(s, unit="us")],
                    "session_end": [pd.Timestamp(e2, unit="us")],
                    "n_events": [cnt],
                    "sum_value": [tot],
                }
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                f"{key_col} bigint, session_start timestamp, "
                "session_end timestamp, n_events bigint, sum_value double"
            ),
            stateStructType="start_us bigint, end_us bigint, n bigint, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: right events that occur
    within ``within`` AFTER a matching left event (attribution shape —
    e.g. purchases within an hour of a click).

    Both sides carry a watermark and the join condition bounds the
    event-time range, so Spark can size the join state store and evict
    rows once the watermark passes their match window — without the
    range bound, stream-stream join state grows forever. State is keyed
    by (key, time bucket): the shuffle is the same equi-join exchange a
    batch join would use, executed incrementally.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    return l.join(
        r,
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") > F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}")),
        "inner",
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a
    (small) static dimension table.

    Spark plans this as a per-micro-batch broadcast hash join — no state
    store at all (the static side is re-broadcast per batch, so a
    dimension refresh between batches is picked up automatically; that
    per-batch re-read is the semantic difference from caching it once).
    This is the streaming twin of MapJoinOperator (MapJoinOperator.java:78):
    the standard "attach user/product attributes to a clickstream" shape.
    At 100 TB-of-stream scale the stream side never shuffles — only the
    broadcast of the dim moves.
    """
    return stream.join(F.broadcast(dim), keys, how)
