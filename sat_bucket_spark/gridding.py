"""Dense-grid materialization of aggregated partitions.

Reference: ``Base2DPartitioning.to_xarray`` (partitioning.py:734-813) — after
the user groups and aggregates by partition labels, the result is pivoted to a
dense (y, x) grid with NaN holes for empty partitions and the *complete*
centroid axes.

Spark-first split (SURVEY.md §7 hard part 6): Spark computes the grouped
aggregate (big data -> tiny result); the dense pivot is a driver-side reindex
of that small result. xarray is optional (not in this container) — the
dependency-free path returns numpy arrays / a pandas pivot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["to_grid_arrays", "to_pandas_grid", "to_xarray"]


def _axes_labels(partitioning):
    return list(partitioning.x_labels), list(partitioning.y_labels)


def to_grid_arrays(
    df_agg: DataFrame | pd.DataFrame,
    partitioning,
    variables: list[str] | None = None,
) -> dict[str, np.ndarray]:
    """Aggregated labels DataFrame -> dict of dense (n_y, n_x) float arrays.

    ``df_agg`` must carry the partition label columns (``partitioning.levels``)
    plus aggregated variable columns — the documented contract of the
    reference's ``to_xarray`` ("assumes that you have grouped and aggregated
    the dataframe over the partition labels", partitioning.py:737-740).
    Missing partitions become NaN cells (partitioning.py:794-808).
    """
    if isinstance(df_agg, DataFrame):
        pdf = df_agg.toPandas()
    else:
        pdf = df_agg.copy()
    x_level, y_level = partitioning.levels[0], partitioning.levels[1]
    if variables is None:
        variables = [c for c in pdf.columns if c not in (x_level, y_level)]
    x_labels, y_labels = _axes_labels(partitioning)
    # Dense cross product of the complete axes (reference: partitioning.py:800-808
    # via pd.MultiIndex.from_product), left-joined with the aggregate.
    full = pd.MultiIndex.from_product([y_labels, x_labels], names=[y_level, x_level])
    pdf = pdf.astype({x_level: str, y_level: str})
    indexed = pdf.set_index([y_level, x_level]).reindex(full)
    out = {}
    for var in variables:
        out[var] = indexed[var].to_numpy(dtype="float64").reshape(partitioning.shape)
    return out


def to_pandas_grid(
    df_agg: DataFrame | pd.DataFrame,
    partitioning,
    variable: str,
) -> pd.DataFrame:
    """One variable as a dense pandas pivot (rows=y labels, cols=x labels)."""
    arrays = to_grid_arrays(df_agg, partitioning, variables=[variable])
    x_labels, y_labels = _axes_labels(partitioning)
    return pd.DataFrame(arrays[variable], index=y_labels, columns=x_labels)


def to_xarray(
    df_agg: DataFrame | pd.DataFrame,
    partitioning,
    variables: list[str] | None = None,
):
    """Dense xarray Dataset with float centroid coordinate axes.

    Reference: partitioning.py:734-813. Requires xarray (optional dependency —
    not installed in this container; see to_grid_arrays for the array path).
    """
    try:
        import xarray as xr  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - xarray absent in container
        raise ImportError(
            "xarray is required for to_xarray(); use to_grid_arrays() instead"
        ) from e
    arrays = to_grid_arrays(df_agg, partitioning, variables=variables)
    coords = {
        "x": partitioning.x_centroids.astype(float),
        "y": partitioning.y_centroids.astype(float),
    }
    data_vars = {var: (("y", "x"), arr) for var, arr in arrays.items()}
    return xr.Dataset(data_vars=data_vars, coords=coords)
