"""Portable (cross-engine deterministic) hashing.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` (xxhash) disagree, so
every oracle-checked operator that needs a hash (MinHash, SimHash, splits,
fingerprints) derives it from md5 — identical in both engines:

  Spark :  CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

15 hex digits = 60 bits, always non-negative, fits BIGINT in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_DIGITS = 15
HASH_MOD = 1 << 60


def portable_hash(col: Column) -> Column:
    """60-bit non-negative hash of a string column; see module docstring."""
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_DIGITS), 16, 10).cast("long")


def seeded_hash(col: Column, seed: int) -> Column:
    """Family of independent portable hashes: h_seed(x) = H(seed || ':' || x)."""
    return portable_hash(F.concat(F.lit(f"{seed}:"), col))


def portable_hash_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`portable_hash` for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HASH_HEX_DIGITS}) AS BIGINT)"


def seeded_hash_sql(expr: str, seed: int) -> str:
    """DuckDB SQL twin of :func:`seeded_hash`."""
    return portable_hash_sql(f"'{seed}:' || {expr}")
