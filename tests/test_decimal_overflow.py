"""Pin the decimal-overflow failure mode that SCALE.md's headroom
argument relies on: DECIMAL(28,6) sums have ~10^22 of capacity, and
when a sum DOES exceed it Spark fails loudly (ANSI overflow error) —
never a silent wrap.  A 100 TB aggregate that outgrows the headroom is
therefore a visible incident, not a corrupted answer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_decimal_sum_within_headroom_is_exact(spark):
    # DECIMAL(18,6) holds 12 integer digits; 10^5 rows at its cap sum to
    # ~10^17 — far inside the DECIMAL(28,6) accumulator's 10^22
    df = spark.range(100_000).select(
        F.expr("CAST(999999999999.5 AS DECIMAL(18,6))").alias("v")
    )
    got = df.agg(F.sum("v").alias("s")).first()["s"]
    # bit-exact, fold-order free: n * (10^12 - 0.5)
    assert got * 2 == 100_000 * (2 * 10**12 - 1)


def test_decimal_sum_overflow_fails_loudly(spark):
    # SUM widens the accumulator to precision min(p+10, 38); a
    # DECIMAL(38,6) input gets no extra headroom, so rows near its 10^32
    # cap overflow the sum — which must surface as an ANSI error (or at
    # minimum a NULL under legacy mode), never a silently wrapped number
    df = spark.range(100).select(
        F.expr(
            "CAST('99999999999999999999999999999999.0' AS DECIMAL(38,6))"
        ).alias("v")
    )
    try:
        got = df.agg(F.sum("v")).first()[0]
    except Exception as e:  # ANSI mode: loud failure
        msg = str(e)
        assert "overflow" in msg.lower() or "NUMERIC_VALUE_OUT_OF_RANGE" in msg
    else:  # legacy fallback documented by Spark: NULL, never a wrap
        assert got is None
