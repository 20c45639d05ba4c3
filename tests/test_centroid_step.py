"""The adaptive IVF/PQ centroid family must be computed identically by
the Spark side (math.isqrt integer arithmetic) and the oracle SQL
(floor(sqrt(double)) + integer ceil-division) for any collection size —
and it must actually scale as ~sqrt(n)."""

import duckdb
import pytest

from golang_mapreduce_spark.operators.similarity import (
    centroid_step,
    ivf_n_probe,
)

_SQL = """
SELECT GREATEST(1,
         ({n} + CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) - 1)
         // CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT))
"""


@pytest.mark.parametrize(
    "n",
    [1, 2, 3, 4, 10, 53, 100, 499, 500, 501, 2000, 2001, 4096, 5000,
     20000, 65536, 1_000_000, 10_000_001],
)
def test_step_matches_sql(n):
    con = duckdb.connect()
    sql_step = con.execute(_SQL.format(n=n)).fetchone()[0]
    assert centroid_step(n) == sql_step


def test_family_size_tracks_sqrt():
    for n in (500, 2000, 20000, 2_000_000):
        step = centroid_step(n)
        family = n // step  # dense-id family size (scaled ids only shrink it)
        assert 0.5 * n**0.5 <= family <= 1.5 * n**0.5


def test_n_probe_floor_and_fraction():
    assert ivf_n_probe(0) == 2
    assert ivf_n_probe(22) == 2
    assert ivf_n_probe(141) == 14
