"""Deterministic, engine-portable hashing primitives.

The dedup/similarity operators need hash functions that (a) run JVM-side in
whole-stage codegen (no Python UDFs in the hot path) and (b) are *bit-for-bit
reproducible in ANSI SQL* so the DuckDB correctness oracle can replay them.
Spark's builtin ``hash``/``xxhash64`` are murmur-based and engine-specific, so
we derive integers from ``md5`` (identical everywhere):

    h64(s)  = int(hex(md5(s))[0:15], 16)        # 60-bit positive
    h31(s)  = h64(s) % (2^31 - 1)               # fits multiplication in int64

MinHash permutations use the classic universal-hash family
``(a * h31(s) + b) mod p`` with ``p = 2^31 - 1`` and fixed (a, b) parameters
drawn once from a seeded generator (printed into both the Spark expression and
the oracle SQL).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["MERSENNE_P", "h31_expr", "h64_expr", "minhash_params"]

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def h64_expr(col: Column | str) -> Column:
    """60-bit integer hash of a string column via md5 (portable to DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h31_expr(col: Column | str) -> Column:
    """31-bit integer hash (safe for int64 multiplication)."""
    return h64_expr(col) % F.lit(MERSENNE_P)


def minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Fixed (a, b) parameter pairs for the universal hash family.

    ``a`` is odd and < 2^15 so ``a * h31 + b`` stays well inside int64.
    """
    rng = np.random.default_rng(seed)
    params = []
    for _ in range(n_hashes):
        a = int(rng.integers(1, 2**15)) | 1
        b = int(rng.integers(0, 2**15))
        params.append((a, b))
    return params


def perm_hash_expr(h: Column, a: int, b: int) -> Column:
    """One member of the universal hash family, as a Column expression."""
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)


def perm_hash_sql(h_sql: str, a: int, b: int) -> str:
    """Same hash family member as an ANSI-SQL fragment (for the DuckDB oracle)."""
    return f"(({a} * {h_sql} + {b}) % {MERSENNE_P})"


H64_SQL = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"
H31_SQL = f"({H64_SQL} % {MERSENNE_P})"


def h64_sql(col: str) -> str:
    """DuckDB SQL fragment equal to :func:`h64_expr`."""
    return H64_SQL.format(col=col)


def h31_sql(col: str) -> str:
    """DuckDB SQL fragment equal to :func:`h31_expr`."""
    return H31_SQL.format(col=col)
