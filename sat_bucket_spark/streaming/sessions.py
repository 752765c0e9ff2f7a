"""Structured Streaming counterparts of the batch analysis operators.

The reference is purely batch (SURVEY.md §2.9) — its gap sessionization
(analysis.py:41-110) is the natural streaming operator, so we expose it as a
first-class Structured Streaming pipeline: ``session_window`` + watermark.
This is the scale path for continuous ingest: late data is bounded by the
watermark instead of requiring a full re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "streaming_dedup_exact",
    "streaming_overpass_counts",
    "streaming_sessionize_stateful",
    "streaming_time_partition_counts",
]


def streaming_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    time: str = "time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous exact dedup — streaming counterpart of operators.dedup_exact.

    ``dropDuplicatesWithinWatermark`` keeps the FIRST row seen per key and
    bounds state by the watermark: a duplicate arriving within the watermark
    window is dropped even when its event time differs (the fingerprint-dedup
    contract for continuous document ingest); state for keys older than the
    watermark is evicted, so memory is O(keys per window), not O(all keys).
    """
    return stream.withWatermark(time, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_overpass_counts(
    stream: DataFrame,
    time: str = "time",
    gap: str = "2 minutes",
    watermark: str = "10 minutes",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Per-overpass row counts over a stream (gap-based session windows).

    Batch equivalent: analysis.add_overpass_count (reference analysis.py:283-288).
    ``session_window(time, gap)`` implements exactly the reference's
    "new session when gap exceeded" rule; the watermark bounds state retention
    for late data.
    """
    keys = list(partition_by) if partition_by else []
    src = stream
    drop_key = None
    if not keys:
        # Spark rejects *global* session-window aggregation; a constant
        # grouping key gives the same semantics (single global session stream).
        drop_key = "__global"
        src = stream.withColumn(drop_key, F.lit(0))
        keys = [drop_key]
    out = (
        src.withWatermark(time, watermark)
        .groupBy(*keys, F.session_window(F.col(time), gap).alias("overpass_window"))
        .agg(F.count(F.lit(1)).alias("count_overpass_occurence"))
        .select(
            *keys,
            F.col("overpass_window.start").alias("start_time"),
            F.col("overpass_window.end").alias("end_time"),
            "count_overpass_occurence",
        )
    )
    if drop_key:
        out = out.drop(drop_key)
    return out


def streaming_sessionize_stateful(
    stream: DataFrame,
    key_cols: list[str],
    time: str = "time",
    gap=None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionizer: emits FINISHED sessions as they close.

    ``session_window`` (streaming_overpass_counts) covers windowed counts;
    this operator is the ``applyInPandasWithState`` form for when session
    payloads go beyond what a grouped agg can express. Per key it keeps one
    open session in state ``(start_us, last_us, n_rows)``; each micro-batch
    sorts its rows, splits on gaps (> gap splits, == gap does not — same rule
    as analysis.add_overpass_id, reference analysis.py:258-280), emits the
    closed sessions downstream (append semantics), and re-arms an event-time
    timeout at ``last + gap`` so the trailing session closes when the
    watermark passes it with no new data.

    Scale: state is O(1) per live key (three longs), batch work is O(rows in
    batch) per key, Arrow-batched. Rows older than the watermark are dropped
    by Spark before the function runs, so state never grows backwards.

    ``gap`` accepts seconds or a ``datetime.timedelta`` (default 2 minutes).
    """
    from sat_bucket_spark.analysis import _interval_seconds

    gap_s = _interval_seconds(gap) if gap is not None else 120.0
    gap_us = int(gap_s * 1_000_000)

    key_fields = [stream.schema[k] for k in key_cols]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_rows", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n_rows", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        def _emit(sessions):
            if not sessions:
                return iter([])
            out = {k: [] for k in key_cols}
            out.update({"session_start": [], "session_end": [], "n_rows": []})
            for start_us, last_us, n in sessions:
                for kc, kv in zip(key_cols, key):
                    out[kc].append(kv)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                out["n_rows"].append(n)
            return iter([pd.DataFrame(out)])

        if state.hasTimedOut:
            closed = []
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
            return _emit(closed)

        chunks = [pdf[time] for pdf in pdfs]
        if not chunks:
            return _emit([])
        times = pd.concat(chunks)
        # int64 epoch-µs regardless of pandas ns/µs datetime unit
        unit_div = 1000 if times.dtype == "datetime64[ns]" else 1
        ts_us = sorted(times.astype("int64") // unit_div)

        # Interval merge over (batch rows + the open session from state),
        # ordered by interval start — late-but-within-watermark rows (allowed
        # through by Spark when the watermark delay exceeds the gap) correctly
        # extend the open session BACKWARDS (min start) or form their own
        # earlier session, instead of being folded forward into the current
        # one with an inflated count. Caveat (inherent to emit-on-close
        # streaming): a late row bridging a session that already closed in a
        # prior batch cannot retract it; the row starts a fresh session.
        intervals = [(t, t, 1) for t in ts_us]
        if state.exists:
            intervals.append(tuple(state.get))
        intervals.sort(key=lambda s: (s[0], s[1]))
        closed = []
        open_session = None
        for start, last, n in intervals:
            if open_session is None:
                open_session = (start, last, n)
            elif start - open_session[1] <= gap_us:
                open_session = (
                    open_session[0],
                    max(open_session[1], last),
                    open_session[2] + n,
                )
            else:
                closed.append(open_session)
                open_session = (start, last, n)
        if open_session is not None:
            state.update(open_session)
            state.setTimeoutTimestamp(open_session[1] // 1000 + int(gap_s * 1000))
        return _emit(closed)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark(time, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_time_partition_counts(
    stream: DataFrame,
    partitioning,
    x: str = "lon",
    y: str = "lat",
    time: str = "time",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-spatial-partition counts — streaming bucket monitoring.

    Continuous analogue of the bucket gridding contract (labels + groupBy,
    reference partitioning.py:737-740): tumbling window x partition labels.
    """
    labeled = partitioning.add_labels(stream, x=x, y=y, remove_invalid_rows=True)
    return (
        labeled.withWatermark(time, watermark)
        .groupBy(*partitioning.levels, F.window(F.col(time), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *partitioning.levels,
            F.col("w.start").alias("window_start"),
            "n",
        )
    )
