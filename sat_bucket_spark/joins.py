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

__all__ = [
    "asof_join",
    "interval_join_binned",
    "point_in_polygon_array_expr",
    "salted_join",
    "points_in_polygons_join",
]


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


def point_in_polygon_array_expr(
    px: Column, py: Column, xs: Column, ys: Column, max_vertices: int = 64
) -> Column:
    """Even-odd ray cast where the polygon lives in ARRAY COLUMNS.

    The literal-vertex variant (filters.point_in_polygon_expr) unrolls one
    fixed polygon into the plan; this one evaluates per-row vertex arrays
    so a JOIN can test each point against a DIFFERENT polygon. It unrolls
    to ``max_vertices`` guarded edge tests (``when(i < n, crossing_i)``)
    instead of a ``aggregate``-over-``sequence`` lambda fold: a
    higher-order function in a post-join predicate mis-computes its
    attribute references under AQE filter re-pushing (the lambda body's
    stream-side columns get bound against the broadcast build side —
    ``[INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]``, reproduced flakily on Spark
    4.x), while plain ``element_at``/``when`` chains track references
    correctly everywhere. Polygons longer than ``max_vertices`` are
    detected at runtime: the expression returns NULL for them (filter
    semantics drop the row), so callers must pre-simplify or raise
    ``max_vertices``. Division at horizontal edges is straddle-guarded
    like the literal variant.
    """
    n = F.size(xs)
    crossings = F.lit(0)
    for i in range(1, max_vertices + 1):
        # edge i: vertex i -> vertex (i % n) + 1 (1-based, closing edge).
        # Indices are clamped with least(i, n): under ANSI mode an
        # out-of-bounds element_at raises, and boolean AND does not
        # short-circuit — the (i <= n) guard only zeroes the TERM.
        si = F.least(F.lit(i), n)
        j = (si % n) + F.lit(1)
        x1, y1 = F.element_at(xs, si), F.element_at(ys, si)
        x2, y2 = F.element_at(xs, j), F.element_at(ys, j)
        straddles = (y1 > py) != (y2 > py)
        x_at = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        crossings = crossings + F.when(
            (F.lit(i) <= n) & straddles & (px < x_at), 1
        ).otherwise(0)
    return F.when(n <= F.lit(max_vertices), crossings % F.lit(2) == F.lit(1))


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    partitioning,
    x: str = "lon",
    y: str = "lat",
    polygon_id_col: str = "polygon_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
    max_vertices: int = 512,
    large_ring_strategy: str = "error",
) -> DataFrame:
    """Tag each point with every polygon containing it (spatial semi-join).

    ``polygons`` is a DIMENSION-sized table — ``(polygon_id, xs, ys)`` with
    vertex arrays (admin regions, basins, coverage footprints: thousands to
    ~10^5 rows) — while ``points`` is the 100 TB side. The plan:

    1. driver-side, each polygon's intersecting grid cells are computed
       cell-exactly (`partitioning._cells_by_polygon` — the same
       vertex/center/edge-clip test the polygon read path uses) and
       flattened into a ``(cell_xi, cell_yi, polygon_id, xs, ys)``
       candidate table, bounded by total cell coverage;
    2. points compute their cell index (two Column expressions) and
       **broadcast-join** the candidate table on the cell — no shuffle of
       the points side, no P-fold cross product: each point meets only the
       polygons whose cells it lands in;
    3. the exact ray cast (:func:`point_in_polygon_array_expr`) filters
       the candidates.

    Output: the point columns plus ``polygon_id`` (one row per containing
    polygon; points in no polygon are dropped — left-join on the result to
    keep them).

    The ray cast unrolls to one guarded edge test per vertex of the LARGEST
    polygon (see :func:`point_in_polygon_array_expr` for why a HOF fold is
    not usable), so plan analysis/compile time grows with the longest vertex
    ring. ``max_vertices`` caps that, and ``large_ring_strategy`` decides
    what happens past the cap:

    - ``"error"`` (default): raise a ``ValueError`` naming the offending
      ids — pre-simplify those rings (Douglas-Peucker etc.), raise the cap
      deliberately, or opt into the explode route. Oversized polygons are
      never silently dropped.
    - ``"explode"``: oversized rings take a scale-safe EDGE-AGGREGATE
      route whose plan size is constant in ring length: the ring's edges
      become a broadcast table ``(polygon_id, x1, y1, x2, y2)``, each
      candidate (point, polygon) pair fans out to its polygon's edges
      MAP-SIDE, and one hash aggregation sums ray crossings per pair
      (odd = inside). Map-side partial aggregation collapses the edge
      fan-out before the exchange, so the single shuffle carries only the
      surviving pair rows — the 100 TB shape for admin boundaries with
      10^3..10^5 vertices. Small rings keep the cheaper shuffle-free
      unrolled path; the two routes union.
    """
    if large_ring_strategy not in ("error", "explode"):
        raise ValueError("large_ring_strategy must be 'error' or 'explode'")
    rows = polygons.select(polygon_id_col, xs_col, ys_col).collect()
    cand = []
    unroll = 3
    oversized = []
    for r in rows:
        xs_v = [float(v) for v in r[xs_col]]
        ys_v = [float(v) for v in r[ys_col]]
        if len(xs_v) > max_vertices:
            oversized.append((r, xs_v, ys_v))
            continue
        unroll = max(unroll, len(xs_v))
        xi, yi = partitioning._cells_by_polygon(list(zip(xs_v, ys_v)))
        for i, j in zip(xi.tolist(), yi.tolist()):
            cand.append((i, j, r[polygon_id_col], xs_v, ys_v))
    if oversized and large_ring_strategy == "error":
        shown = ", ".join(
            f"{r[polygon_id_col]}({len(xs_v)} vertices)" for r, xs_v, _ in oversized[:10]
        )
        raise ValueError(
            f"{len(oversized)} polygon(s) exceed max_vertices={max_vertices}: "
            f"{shown}{'...' if len(oversized) > 10 else ''}. The ray cast "
            "unrolls one edge test per vertex, so oversized rings explode "
            "plan compile time. Pre-simplify the rings, raise max_vertices, "
            "or pass large_ring_strategy='explode' for the edge-aggregate "
            "route."
        )
    spark = points.sparkSession
    id_type = polygons.schema[polygon_id_col].dataType.simpleString()
    point_cols = list(points.columns)
    staged = points.withColumn("__pxi", partitioning.x_index_expr(x).cast("int")) \
        .withColumn("__pyi", partitioning.y_index_expr(y).cast("int"))
    out = None
    if cand:
        cand_df = spark.createDataFrame(
            cand,
            schema=(
                "__cxi int, __cyi int, "
                f"{polygon_id_col} {id_type}, __xs array<double>, __ys array<double>"
            ),
        )
        joined = staged.join(
            F.broadcast(cand_df),
            (F.col("__pxi") == F.col("__cxi")) & (F.col("__pyi") == F.col("__cyi")),
        )
        # unroll exactly to the largest polygon seen (they were just
        # collected, so the bound is known — no silent NULL-drop path)
        inside = point_in_polygon_array_expr(
            F.col(x), F.col(y), F.col("__xs"), F.col("__ys"),
            max_vertices=unroll,
        )
        out = joined.where(inside).select(*point_cols, polygon_id_col)
    if oversized:
        big = _points_in_large_rings(
            staged, oversized, partitioning, x, y,
            polygon_id_col, id_type, point_cols,
        )
        out = big if out is None else out.unionByName(big)
    if out is None:  # no polygons at all
        out = staged.where(F.lit(False)).select(*point_cols).withColumn(
            polygon_id_col, F.lit(None).cast(id_type)
        )
    return out


def _points_in_large_rings(
    staged: DataFrame,
    oversized: list,
    partitioning,
    x: str,
    y: str,
    polygon_id_col: str,
    id_type: str,
    point_cols: list[str],
) -> DataFrame:
    """Edge-aggregate ray cast for rings too long to unroll.

    Plan shape: broadcast candidate cells -> broadcast edge table ->
    map-side crossing terms -> ONE hash aggregation keyed by (point row,
    polygon). ``first()`` carries the point columns through the same
    aggregation, so the exchange moves each surviving pair exactly once
    (partial aggregation collapses the per-edge fan-out map-side).
    """
    spark = staged.sparkSession
    cells, edges = [], []
    for r, xs_v, ys_v in oversized:
        pid = r[polygon_id_col]
        xi, yi = partitioning._cells_by_polygon(list(zip(xs_v, ys_v)))
        for i, j in zip(xi.tolist(), yi.tolist()):
            cells.append((i, j, pid))
        n = len(xs_v)
        for k in range(n):
            k2 = (k + 1) % n
            edges.append((pid, xs_v[k], ys_v[k], xs_v[k2], ys_v[k2]))
    cell_df = spark.createDataFrame(
        cells, schema=f"__cxi int, __cyi int, {polygon_id_col} {id_type}"
    )
    edge_df = spark.createDataFrame(
        edges,
        schema=(
            f"{polygon_id_col} {id_type}, "
            "__x1 double, __y1 double, __x2 double, __y2 double"
        ),
    )
    keyed = staged.withColumn("__rowid", F.monotonically_increasing_id())
    pairs = keyed.join(
        F.broadcast(cell_df),
        (F.col("__pxi") == F.col("__cxi")) & (F.col("__pyi") == F.col("__cyi")),
    )
    fan = pairs.join(F.broadcast(edge_df), polygon_id_col)
    px, py = F.col(x), F.col(y)
    straddles = (F.col("__y1") > py) != (F.col("__y2") > py)
    x_at = (F.col("__x2") - F.col("__x1")) * (py - F.col("__y1")) / (
        F.col("__y2") - F.col("__y1")
    ) + F.col("__x1")
    crossing = F.when(straddles & (px < x_at), 1).otherwise(0)
    return (
        fan.withColumn("__c", crossing)
        .groupBy("__rowid", polygon_id_col)
        .agg(
            *[F.first(c).alias(c) for c in point_cols],
            F.sum("__c").alias("__crossings"),
        )
        .where(F.col("__crossings") % 2 == 1)
        .select(*point_cols, polygon_id_col)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot LEFT key over ``salt``
    sub-keys, replicating the matching RIGHT rows.

    AQE's skew-join handles most skew by splitting oversized sort-merge
    partitions, but it cannot help when a single KEY's rows exceed one
    task's memory budget in a shuffled-hash build, when the join runs
    inside a cached/reused exchange AQE will not re-plan, or when the
    engine must guarantee a worst-case task size up front (SLA jobs over
    100 TB with adversarial key distributions — exactly the "one domain is
    half the crawl" shape of web corpora). The classic remedy is explicit
    salting:

    - LEFT rows get a deterministic pseudo-random salt in ``[0, salt)``
      (xxhash64 of the whole row — no RNG, so retried/recomputed tasks
      produce identical output and the plan stays deterministic);
    - RIGHT rows are replicated ``salt`` times via an exploded literal
      sequence (constant fan-out, map-side);
    - the join key becomes ``(keys..., salt_bucket)``, so each formerly-hot
      reducer key splits into ``salt`` independent keys.

    Shuffle cost: |left| + salt * |right| rows. Correct when RIGHT is the
    dimension side of a skewed fact-dim join that is too big to broadcast
    but small enough to replicate; for two skewed FACT tables prefer
    AQE skew-join or pre-bucketing. Row multiplicity is exactly that of
    the plain join for every ``how`` that keeps left rows (``inner``,
    ``left``); right/full outer would see replicated unmatched right rows
    and is rejected.

    Reference scope: beyond sat-bucket (single-node engines don't shuffle);
    the standard distributed-joins recipe, e.g. Spark AQE docs' manual
    alternative.
    """
    if isinstance(on, str):
        on = [on]
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r}"
        )
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")

    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))),
    )
    out = l_salted.join(r_salted, [*on, "__salt"], how)
    return out.drop("__salt")
