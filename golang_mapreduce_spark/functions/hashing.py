"""Deterministic cross-engine string hashing.

The reference partitions by FNV-32a (ihash, 6.5840/src/mr/worker.go:30-34).
Partition assignment is an invisible implementation detail here (Spark's
Exchange uses Murmur3), but the dedup/fingerprint operators need a numeric
string hash whose value is *identical* in Spark and in the DuckDB oracle
SQL.  md5 is the one hash both engines implement bit-identically, so:

    hash32(s) = int(md5(s)[:8 hex], 16)    in [0, 2^32)
    hash60(s) = int(md5(s)[:15 hex], 16)   in [0, 2^60)

Spark side uses ``conv(substring(md5(s),1,k), 16, 10)``; oracle side uses
``('0x' || substr(md5(s),1,k))::BIGINT``.  Both verified equal.

MinHash uses universal hashing h_i(x) = (a_i*x + b_i) mod P over the
32-bit base hash with P = 4294967311 (smallest prime > 2^32); with
a_i < 2^20 the product stays < 2^52, well inside signed-64 range in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Smallest prime above 2^32 — modulus for the universal hash family.
MINHASH_PRIME = 4294967311


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_seeds(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs for the universal hash family, derived from a
    fixed linear recurrence so Spark and SQL share the exact same family.
    """
    seeds = []
    a, b = 37, 91
    for _ in range(num_hashes):
        a = (a * 131 + 17) % 1_000_003
        b = (b * 137 + 29) % 1_000_003
        seeds.append((a or 1, b))
    return seeds


def sql_hash32(expr: str) -> str:
    """DuckDB-SQL fragment computing the same value as :func:`hash32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def sql_hash60(expr: str) -> str:
    """DuckDB-SQL fragment computing the same value as :func:`hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
