"""Temporal join operators: as-of join and scalable interval-overlap join.

The reference engine has no as-of join; its closest operation is the
interval-overlap join used for temporal grouping (reference
satbucket/routines.py:474-504, re-expressed here in filters.py /
routines.py). A training-data pipeline needs both:

- **as-of join** — "for each left row, the latest right row at-or-before its
  timestamp" (quotes->trades, config-snapshots->events, label-points->sensor
  readings). Spark has no built-in; the scalable formulation is a tagged
  union + one window pass, NOT a range join: a single shuffle on the `by`
  keys, no candidate blow-up, no driver involvement.
- **binned interval join** — the broadcast range join in
  routines.merge_granule_buckets assumes one side is small. When BOTH sides
  are large (events x maintenance-windows at 100 TB), the scale path bins
  intervals onto a fixed time grid and turns the theta-join into an
  equi-join on the bin id, deduplicating the fan-out afterwards.

Both are pure Column-expression plans (whole-stage codegen, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: list[str] | str | None = None,
    right_on: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: attach to each left row the nearest preceding right row.

    ``direction='backward'`` (default) matches the latest right row with
    ``right.time <= left.time`` per ``by`` group; ``'forward'`` matches the
    earliest right row with ``right.time >= left.time``. Exact timestamp ties
    match (<=/>= semantics, same as DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof(allow_exact_matches=True)``). ``tolerance`` (seconds) nulls
    out matches farther than the bound, like pandas ``merge_asof(tolerance)``.

    Scale design: tag each side, union, and run ONE window pass per ``by``
    group ordered by (time, side) taking ``last(right_struct, ignorenulls)``.
    Cost is a single hash shuffle on ``by`` — no range join, no per-row probe,
    no candidate pairs. With ``by`` keys the window parallelizes across
    groups; without keys it degrades to a single-reducer global window (same
    caveat as global sessionization — supply ``by`` at scale).

    All right columns except ``by``/``right_on`` are attached, suffixed on
    name collisions. Rows with no match keep nulls (left join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    r_on = right_on or on
    reserved = {"__asof_t", "__asof_side", "__asof_payload", "__asof_match"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"columns {sorted(clash)} collide with asof_join internals")
    # Null-time right rows can never be a valid match; null-time left rows
    # must get a null match (enforced by nulls-first ordering below).
    right = right.where(F.col(r_on).isNotNull())

    payload_cols = [c for c in right.columns if c not in set(by) | {r_on}]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    rt = "__asof_rt"

    # Tagged union: right rows carry the payload struct, left rows carry null.
    # Sorting by (time, side) puts right rows first on exact-tie timestamps,
    # so last(...) sees them — the <=/>= tie rule falls out of the sort order.
    right_struct = F.struct(
        *[F.col(c).alias(c) for c in payload_cols], F.col(r_on).alias(rt)
    )
    right_tag = right.select(
        *by,
        F.col(r_on).alias("__asof_t"),
        F.lit(0).alias("__asof_side"),
        right_struct.alias("__asof_payload"),
    )
    left_cols = [c for c in left.columns]
    left_tag = left.select(
        *left_cols,
        F.col(on).alias("__asof_t"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(right_tag.schema["__asof_payload"].dataType).alias(
            "__asof_payload"
        ),
    )
    # Align right side to the union schema (missing left columns -> nulls).
    for c in left_cols:
        if c not in right_tag.columns:
            right_tag = right_tag.withColumn(
                c, F.lit(None).cast(left_tag.schema[c].dataType)
            )
    right_tag = right_tag.select(
        *left_cols, "__asof_t", "__asof_side", "__asof_payload"
    )

    unioned = left_tag.unionByName(right_tag)

    # Null-time LEFT rows must sort before every right row in BOTH directions
    # (nulls-first), so the running last(payload) is still null there — a
    # desc default (nulls last) would hand them the final right row as a
    # spurious "match".
    if direction == "backward":
        order = [F.col("__asof_t").asc_nulls_first(), F.col("__asof_side").asc()]
    else:
        # Forward: scan time descending so "last non-null" is the EARLIEST
        # right row at-or-after; side stays ascending so right rows (side 0)
        # still precede left rows within an exact-tie timestamp.
        order = [F.col("__asof_t").desc_nulls_first(), F.col("__asof_side").asc()]
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    matched = unioned.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    ).where(F.col("__asof_side") == 1)

    if tolerance is not None:
        gap = F.abs(
            F.col("__asof_t").cast("double") - F.col(f"__asof_match.{rt}").cast("double")
        )
        matched = matched.withColumn(
            "__asof_match",
            F.when(gap <= F.lit(float(tolerance)), F.col("__asof_match")),
        )

    out = matched.select(
        *left_cols,
        *[F.col(f"__asof_match.{c}").alias(out_names[c]) for c in payload_cols],
    )
    return out


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Large-large interval-overlap join via fixed-grid binning.

    Overlap rule matches :func:`filters.interval_overlap_expr`
    (``ls <= re AND le >= rs``, closed intervals; reference
    filters.py:91-110). The broadcast path (routines.merge_granule_buckets)
    is right for a small side; THIS is the 100-TB path when both sides are
    big: explode each interval onto ``floor(t / bin_width)`` grid cells
    (``sequence`` + ``explode`` — fan-out is interval_length/bin_width per
    row), equi-join on the cell id so Spark uses a plain shuffled hash join,
    then keep each matched pair once by crediting it to the first overlapping
    cell. Choose ``bin_width`` near the typical interval length: fan-out
    stays O(1) per row and the join never materializes cross products beyond
    genuine candidates.

    Timestamps/numerics both work — bounds are cast to double seconds.
    """
    if how not in ("inner",):
        raise ValueError("interval_join_binned supports how='inner'")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    reserved = {"__bin", "__ls", "__le", "__rs", "__re"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"columns {sorted(clash)} collide with interval join internals")
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            f"left/right share column names {sorted(shared)}; rename one side "
            "(the joined output would be ambiguous)"
        )

    def _bins(s: Column, e: Column) -> Column:
        lo = F.floor(s / F.lit(bin_width))
        hi = F.floor(e / F.lit(bin_width))
        return F.sequence(lo, hi)

    ls = F.col(left_start).cast("double")
    le = F.col(left_end).cast("double")
    rs = F.col(right_start).cast("double")
    re_ = F.col(right_end).cast("double")

    lb = left.withColumn("__ls", ls).withColumn("__le", le).withColumn(
        "__bin", F.explode(_bins(F.col("__ls"), F.col("__le")))
    )
    rb = right.withColumn("__rs", rs).withColumn("__re", re_).withColumn(
        "__bin", F.explode(_bins(F.col("__rs"), F.col("__re")))
    )

    overlap = (F.col("__ls") <= F.col("__re")) & (F.col("__le") >= F.col("__rs"))
    # Dedup without a distinct: a pair is emitted once, by the first grid cell
    # where both intervals are present = cell containing max(start_l, start_r).
    first_common = F.floor(F.greatest(F.col("__ls"), F.col("__rs")) / F.lit(bin_width))
    joined = (
        lb.join(rb, on="__bin", how="inner")
        .where(overlap & (F.col("__bin") == first_common))
        .drop("__bin", "__ls", "__le", "__rs", "__re")
    )
    return joined
