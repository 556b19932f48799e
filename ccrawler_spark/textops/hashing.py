"""Portable 60-bit hash used by dedup/fingerprint operators.

Defined as the first 15 hex chars of md5, read as an integer — md5 is
bit-identical across Spark, DuckDB, and Python, so every operator that
needs a DuckDB oracle (driver CORRECTNESS gate) hashes with this
instead of engine-specific functions like xxhash64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def phash60(col: Column) -> Column:
    """Spark side: conv(hex) returns a decimal string; 15 hex digits
    < 2^60 always fit a signed long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def phash60_sql(expr: str) -> str:
    """DuckDB side of the same hash."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def phash60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
