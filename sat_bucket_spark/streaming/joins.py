"""Stream-stream joins with bounded state (watermark + time-range).

The batch engine's interval join (`joins.interval_join_binned`,
`filters.interval_overlap_expr`) has a streaming counterpart: matching two
LIVE feeds — e.g. an event stream against a calibration/annotation stream —
within a time tolerance. Spark's stream-stream join keeps both sides in
state; UNBOUNDED state is the failure mode, so this helper enforces the two
things that bound it (Structured Streaming's documented requirements):
watermarks on BOTH sides and a time-range join condition, which together
let the engine evict state older than ``watermark + tolerance``.

Reference scope: beyond sat-bucket (no streaming there); built on the
public Structured Streaming stream-stream join support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    left_time: str = "time",
    right_time: str = "time",
    tolerance_seconds: float = 60.0,
    watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streams on keys + event-time proximity, with bounded state.

    A right row matches a left row when the equality keys ``on`` agree and
    ``|left_time - right_time| <= tolerance_seconds``. Both inputs get a
    ``watermark`` on their event-time column (required — without it the
    join's state grows forever); the time-range predicate lets Spark compute
    the state-eviction bound. Right-side columns are prefixed with
    ``right_prefix`` (the time column always; others only on name clash) so
    the output schema is unambiguous.

    100 TB/continuous design: state per key is bounded by
    ``watermark + tolerance`` of data; the join itself is the engine's
    stateful symmetric hash join — no collect, no batch materialization.
    Outer modes emit the unmatched row only once the watermark passes (the
    engine must know no future match can arrive) — expect that latency.
    """
    on = on or []
    lt, rt = left_time, right_time
    r_time = right_prefix + rt
    r = right.withColumnRenamed(rt, r_time)
    for c in r.columns:
        if c != r_time and c in left.columns and c not in on:
            r = r.withColumnRenamed(c, right_prefix + c)

    lw = left.withWatermark(lt, watermark)
    rw = r.withWatermark(r_time, watermark)

    cond = (
        (F.col(lt) >= F.col(r_time) - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
        & (F.col(lt) <= F.col(r_time) + F.expr(f"INTERVAL {tolerance_seconds} SECONDS"))
    )
    for k in on:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond, how)
    # equality keys appear on both sides after the theta-join: collapse to
    # one column. COALESCE, not a bare drop of the right side — in
    # right/full outer mode an unmatched right row has NULL left columns,
    # and dropping its key would leave the emitted row unattributable.
    out_cols = [
        F.coalesce(lw[c], rw[c]).alias(c) if c in on else lw[c]
        for c in left.columns
    ] + [rw[c] for c in r.columns if c not in on]
    return joined.select(*out_cols)
