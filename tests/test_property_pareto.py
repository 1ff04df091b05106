"""Property differential for the Pareto-frontier kernel: the
vectorized group-max/prefix-max mask must equal the O(n^2) dominance
definition on arbitrary integer point sets (duplicates, ties on one
axis, negative values, single points)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from trafaret_ray.pipelines.queries import _pareto_keep


def _brute(s, n):
    m = len(s)
    keep = np.ones(m, dtype=bool)
    for i in range(m):
        for j in range(m):
            if i == j:
                continue
            if s[j] >= s[i] and n[j] >= n[i] \
                    and (s[j] > s[i] or n[j] > n[i]):
                keep[i] = False
                break
    return keep


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(-1000, 1000),
                          st.integers(-1000, 1000)),
                min_size=1, max_size=60))
def test_pareto_matches_brute_force(points):
    s = np.array([p[0] for p in points], dtype=np.int64)
    n = np.array([p[1] for p in points], dtype=np.int64)
    assert list(_pareto_keep(s, n)) == list(_brute(s, n))


def test_extreme_magnitudes():
    # int64 extremes INCLUDING the exact boundary: a frontier point
    # with n == int64.min must survive (a min-sentinel prefix would
    # collide with it and drop it — the kernel gates the first s-group
    # on group index instead)
    mn, mx = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    s = np.array([5, 0], dtype=np.int64)
    n = np.array([mn, 0], dtype=np.int64)
    assert list(_pareto_keep(s, n)) == [True, True]
    s2 = np.array([mn, 0, mx], dtype=np.int64)
    n2 = np.array([mx, 0, mn], dtype=np.int64)
    assert list(_pareto_keep(s2, n2)) == list(_brute(s2, n2))
