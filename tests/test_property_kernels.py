"""Property-based checks of the pure-numpy window/rank kernels against
straight-line oracles (pandas window functions / brute-force loops).
No Ray needed — these exercise the kernels the bucket tasks run."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from trafaret_ray.stages.reshape import group_ranks
from trafaret_ray.stages import window as W


def _groups(draw_groups, draw_vals):
    """(starts, values, group_ids) from drawn per-group sizes."""
    sizes = draw_groups
    n = sum(sizes)
    starts = np.zeros(n, dtype=bool)
    g = np.empty(n, dtype=np.int64)
    pos = 0
    for gi, s in enumerate(sizes):
        starts[pos] = True
        g[pos:pos + s] = gi
        pos += s
    return starts, np.array(draw_vals[:n], dtype=np.float64), g


sizes_st = st.lists(st.integers(1, 6), min_size=1, max_size=5)
vals_st = st.lists(st.integers(-3, 3), min_size=30, max_size=30)


class TestFixedPointCrossEngine:
    @settings(max_examples=80, deadline=None)
    @given(xs=st.lists(st.floats(min_value=-1e7, max_value=1e7,
                                 allow_nan=False, allow_infinity=False),
                       min_size=1, max_size=12))
    def test_fixed6_matches_duckdb_floor(self, xs):
        """The byte-determinism mechanism: floor(x*1e6+0.5) as int64 must
        be IDENTICAL between pyarrow and DuckDB for the same doubles —
        and its int sum is order-independent by construction."""
        import duckdb
        import pyarrow as pa
        from trafaret_ray.pipelines.queries import _fixed6
        ours = _fixed6(pa.array(xs, type=pa.float64())).to_pylist()
        theirs = duckdb.sql(
            'SELECT cast(floor(x * 1e6 + 0.5) AS BIGINT) AS v FROM '
            '(SELECT unnest(?::DOUBLE[]) AS x)', params=[xs]).df()
        assert ours == [int(v) for v in theirs['v']]


class TestGroupRanksProperty:
    @settings(max_examples=60, deadline=None)
    @given(sizes=sizes_st, vals=vals_st)
    def test_matches_pandas_rank(self, sizes, vals):
        starts, v, g = _groups(sizes, vals)
        rank, dense = group_ranks(v, starts, descending=True)
        df = pd.DataFrame({'g': g, 'v': v})
        exp_rank = df.groupby('g')['v'].rank(method='min',
                                             ascending=False)
        exp_dense = df.groupby('g')['v'].rank(method='dense',
                                              ascending=False)
        assert list(rank) == [int(x) for x in exp_rank]
        assert list(dense) == [int(x) for x in exp_dense]


class TestTimeRangeProperty:
    @settings(max_examples=60, deadline=None)
    @given(sizes=sizes_st,
           deltas=st.lists(st.integers(0, 5), min_size=30, max_size=30),
           vals=vals_st,
           rng=st.integers(0, 8))
    def test_matches_bruteforce(self, sizes, deltas, vals, rng):
        starts, v, g = _groups(sizes, vals)
        n = len(v)
        # ts: cumulative non-negative deltas, restarting per group,
        # sorted within each group (the kernel's precondition)
        ts = np.zeros(n, dtype=np.int64)
        for i in range(1, n):
            ts[i] = deltas[i] if starts[i] else ts[i - 1] + deltas[i]
        vi = v.astype(np.int64)
        sums, counts = W.time_range_sum(vi, ts, starts, rng)
        for i in range(n):
            # SQL RANGE ... CURRENT ROW: all rows of the group with
            # ts[i] - rng <= ts[j] <= ts[i] (peers after i included)
            mask = (g == g[i]) & (ts >= ts[i] - rng) & (ts <= ts[i])
            assert counts[i] == mask.sum(), i
            assert sums[i] == vi[mask].sum(), i

    @settings(max_examples=40, deadline=None)
    @given(sizes=sizes_st, vals=vals_st)
    def test_running_sum(self, sizes, vals):
        starts, v, g = _groups(sizes, vals)
        vi = v.astype(np.int64)
        run = W.running_sum(vi, starts)
        df = pd.DataFrame({'g': g, 'v': vi})
        exp = df.groupby('g')['v'].cumsum()
        assert list(run) == list(exp)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_interval_bins_complete(data):
    """Candidate completeness of the binned range join: whenever
    lo <= v < hi, the value's bin is among the interval's bins (no
    matching pair can be missed by the bin co-partition)."""
    from trafaret_ray.stages.joins import interval_bins
    w = data.draw(st.floats(min_value=1e-3, max_value=1e3,
                            allow_nan=False, allow_infinity=False))
    lo = data.draw(st.floats(min_value=-1e6, max_value=1e6,
                             allow_nan=False, allow_infinity=False))
    span = data.draw(st.floats(min_value=0.0, max_value=1e4,
                               allow_nan=False, allow_infinity=False))
    hi = lo + span
    v = data.draw(st.floats(min_value=-1e6, max_value=2e6,
                            allow_nan=False, allow_infinity=False))
    rows, bins = interval_bins(np.array([lo]), np.array([hi]), w)
    if lo <= v < hi:
        assert int(np.floor(v / w)) in set(bins.tolist())
