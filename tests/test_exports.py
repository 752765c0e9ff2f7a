"""Every public module's star-import surface must resolve.

Regression guard for the r7 defect where ``graph.py`` shipped an
``__all__`` naming a function that did not exist, so
``from sat_bucket_spark.operators.graph import *`` raised AttributeError
(VERDICT.md r7, "What's wrong" #1). Walk every module in the package and
execute a real star import; also assert each declared ``__all__`` name is
an attribute (star import alone would mask a missing name when a module
has no ``__all__``).
"""

from __future__ import annotations

import importlib
import pkgutil

import pytest

import sat_bucket_spark


def _all_modules():
    mods = ["sat_bucket_spark"]
    for info in pkgutil.walk_packages(
        sat_bucket_spark.__path__, prefix="sat_bucket_spark."
    ):
        mods.append(info.name)
    return sorted(mods)


@pytest.mark.parametrize("modname", _all_modules())
def test_star_import_and_all_resolve(modname):
    mod = importlib.import_module(modname)
    declared = getattr(mod, "__all__", None)
    if declared is not None:
        missing = [n for n in declared if not hasattr(mod, n)]
        assert not missing, f"{modname}.__all__ names missing attrs: {missing}"
    ns: dict = {}
    exec(f"from {modname} import *", ns)  # the actual user-facing path
    if declared is not None:
        assert set(declared) <= set(ns)
