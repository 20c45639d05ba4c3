"""lsh_band_config: the (bands, rows) factorization must center the LSH
S-curve on the requested Jaccard threshold and always factor n_hashes."""

from __future__ import annotations

import pytest

from golang_mapreduce_spark.operators.dedup import NUM_HASHES, lsh_band_config


@pytest.mark.parametrize("threshold,n,expected", [
    # midpoints for 16 hashes: b=1→1.0, b=2→(1/2)^(1/8)≈.917,
    # b=4→(1/4)^(1/4)≈.707, b=8→(1/8)^(1/2)≈.354, b=16→.0625
    (0.7, 16, (4, 4)),
    (0.35, 16, (8, 2)),
    (0.08, 16, (16, 1)),
    (0.95, 16, (2, 8)),
    # 128 hashes, the production MinHash width: 0.5 → b=32,r=4 (.420) vs
    # b=16,r=8 (.707): 32 bands is closer
    (0.5, 128, (32, 4)),
])
def test_band_config_centers_curve(threshold, n, expected):
    assert lsh_band_config(threshold, n) == expected


def test_band_config_always_factors():
    for n in (8, 16, 32, 64, 128):
        for t in (0.05, 0.25, 0.5, 0.75, 0.95):
            b, r = lsh_band_config(t, n)
            assert b * r == n
            assert b >= 1 and r >= 1


def test_band_config_monotone_in_threshold():
    """Higher thresholds never need MORE bands (bands grow as the target
    similarity falls — more buckets to catch weaker pairs)."""
    prev_bands = None
    for t in (0.9, 0.7, 0.5, 0.3, 0.1):
        b, _ = lsh_band_config(t, 64)
        if prev_bands is not None:
            assert b >= prev_bands
        prev_bands = b


def test_default_width_matches_module_constants():
    """The module's hand-picked 4x4 banding is what the autotuner returns
    for the midpoint its curve actually has — documenting that the
    shipped config targets ~0.7 Jaccard collisions with the 0.25
    estimate filter doing the precision work downstream."""
    assert lsh_band_config(0.7, NUM_HASHES) == (4, 4)
