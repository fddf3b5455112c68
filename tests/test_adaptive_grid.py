"""adaptive_grid unit contract (operators/similarity.py): the grid
that fixes the fixed-grid law must (a) bound expected block size by
the target at any corpus size, (b) keep per-vector assignment cost
O(log N), and (c) reproduce the fixture-pinned grids at fixture scale
so q163/q164 hash-match the q149/q150 oracles."""

from __future__ import annotations

import math

from rds_glue_s3_etl_pipeline_spark.operators.similarity import adaptive_grid


def test_fixture_pins():
    # the coincidences the q163/q164/q165 oracles rely on
    assert adaptive_grid(500, 4) == [16, 8]       # q149's grid (q163)
    assert adaptive_grid(500, 32) == [16]         # q150's codebook (q164)
    assert adaptive_grid(500, 8) == [16, 4]       # q165's pinned tree


def test_block_size_bounded_everywhere():
    for n in (1, 10, 500, 2_000, 20_000, 200_000, 10**7, 10**10):
        for target in (4, 8, 32, 1000):
            ks = adaptive_grid(n, target)
            prod = math.prod(ks)
            assert n / prod <= target  # expected block size <= target
            assert all(2 <= k or i == 0 for i, k in enumerate(ks))
            assert ks[0] <= 16 and all(k <= 8 for k in ks[1:])


def test_assignment_cost_is_logarithmic():
    # sum(ks) = centroid scores per vector; must stay tiny even at
    # planetary corpus sizes (depth ~ log_8(N / target)).
    ks = adaptive_grid(10**10, 32)
    assert sum(ks) < 100
    assert len(ks) <= 12


def test_depth_monotone_in_corpus():
    prev = 0
    for n in (500, 5_000, 50_000, 500_000, 5_000_000):
        ks = adaptive_grid(n, 4)
        prod = math.prod(ks)
        assert prod >= prev  # block count never shrinks as N grows
        prev = prod


def test_degenerate_inputs():
    assert adaptive_grid(0, 4) == [1]
    assert adaptive_grid(1, 4) == [1]
    assert adaptive_grid(3, 4) == [1]
    assert adaptive_grid(17, 4) == [5]
