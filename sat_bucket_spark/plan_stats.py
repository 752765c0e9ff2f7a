"""Driver-side Catalyst plan statistics and scale guards.

A handful of operators intentionally use an UNPARTITIONED window (global
sessionization, linear interpolation of a single series, the swath
running-offset) — correct and cheap on the bounded, post-aggregation
series they were designed for, but a single-reducer sort if pointed at a
raw 100 TB table. The guard here keys off Catalyst's driver-side size
estimate (no job, no action) and either routes to a scalable variant
(where one exists — see ``add_overpass_id``) or emits a loud
:class:`SingleReducerWindowWarning` so the cliff is visible at plan time,
not as a mystery straggler task three hours into a run.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

__all__ = [
    "SingleReducerWindowWarning",
    "estimated_size_bytes",
    "warn_if_unpartitioned_window",
    "UNPARTITIONED_WINDOW_MAX_BYTES",
]

# Above this Catalyst-estimated input size, an un-partitioned window is
# assumed to be a mistake worth flagging (or auto-rerouting where a
# scalable variant exists). 256 MB of input in ONE reducer's sort is
# already seconds of skew; at cluster scale it is the whole job.
UNPARTITIONED_WINDOW_MAX_BYTES = 256 * 1024 * 1024


class SingleReducerWindowWarning(RuntimeWarning):
    """An unpartitioned window is about to sort a large input in one task."""


def estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's driver-side size estimate (no job); None when unavailable.

    Catalyst reports UNKNOWN sizes as Long.MaxValue (e.g. above an
    aggregate with no file statistics) — treated as None here so callers
    never key a routing decision off a sentinel.
    """
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None
    if est >= (1 << 60):  # Long.MaxValue-ish sentinel: statistics unknown
        return None
    return est


def warn_if_unpartitioned_window(
    df: DataFrame,
    op: str,
    partition_by: list[str] | None,
    max_bytes: int = UNPARTITIONED_WINDOW_MAX_BYTES,
    detail: str = "",
) -> None:
    """Emit :class:`SingleReducerWindowWarning` when ``op`` is about to run
    an unpartitioned window over a Catalyst-estimated input > ``max_bytes``.

    No-op when ``partition_by`` is non-empty (the window parallelizes over
    keys) or when statistics are unavailable (post-aggregation inputs are
    typically bounded by construction — documented per call site).
    """
    if partition_by:
        return
    est = estimated_size_bytes(df)
    if est is not None and est > max_bytes:
        warnings.warn(
            f"{op}: unpartitioned window over ~{est / 1e6:.0f} MB of input "
            f"runs in a SINGLE task. Pass partition_by to parallelize"
            f"{', ' + detail if detail else ''}.",
            SingleReducerWindowWarning,
            stacklevel=3,
        )
