"""Greedy sequence packing — filling fixed-size training contexts.

Training consumes fixed-capacity token windows; feeding one short document
per window wastes most of it. The standard fix packs documents greedily
into bins of ``capacity`` tokens. Packing is ORDER-DEPENDENT sequential
state (a running fill that resets at bin boundaries) — not expressible as
a window function (the reset makes it a recurrence, not a prefix
aggregate) — so this is the engine's showcase of tier (b) custom
operators: ``applyInPandas`` with Arrow-batched per-group execution.

Scale shape: documents are hash-assigned to ``n_groups`` independent
packing groups; each group packs locally (one shuffle keyed on group, then
O(group) sequential work in a vectorized pandas kernel). Groups make the
operator embarrassingly parallel AND deterministic: the pack assignment
depends only on (id, size, capacity, n_groups), never on input
partitioning — a re-run, a different cluster size, or another engine
reproduces bins bit-for-bit. Choose n_groups >> executor count; per-group
state is O(docs/group).

The greedy rule: take documents in ascending id order within the group;
start a new bin when the current document no longer fits. A document
larger than ``capacity`` occupies its own bin (it would be truncated or
split downstream — flagged, not dropped).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from sat_bucket_spark.operators.hashing import h31_expr

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    capacity: int = 2048,
    n_groups: int = 64,
    salt: str = "",
) -> DataFrame:
    """Assign each document a ``(group, bin)`` packing slot.

    Returns ``(id, size, group, bin)``: ``group`` is the hash-assigned
    packing group in [0, n_groups), ``bin`` the 0-based greedy bin within
    the group (ascending-id order, running fill, new bin when the document
    would overflow ``capacity``).

    Downstream, ``groupBy(group, bin)`` + ``collect_list`` materializes the
    physical training sequences; the bin assignment here is the shuffle-
    and engine-stable part.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField(size_col, LongType(), False),
            StructField("group", LongType(), False),
            StructField("bin", LongType(), False),
        ]
    )
    cap = capacity

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins = []
        fill = 0
        b = 0
        first = True
        for size in pdf[size_col].astype("int64"):
            if not first and fill + size > cap:
                b += 1
                fill = 0
            bins.append(b)
            fill += size
            first = False
        out = pdf[[id_col, size_col, "group"]].copy()
        out[size_col] = out[size_col].astype("int64")
        out["bin"] = pd.Series(bins, dtype="int64")
        return out[[id_col, size_col, "group", "bin"]]

    grouped = df.select(
        F.col(id_col),
        F.col(size_col).cast("long").alias(size_col),
        F.pmod(
            h31_expr(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(n_groups),
        ).alias("group"),
    )
    return grouped.groupBy("group").applyInPandas(_pack, schema=schema)
