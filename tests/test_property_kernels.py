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


class TestAsofDirectionsProperty:
    """asof_backward/forward/nearest vs a per-row brute-force oracle,
    random groups/timestamps including cross-group and tie cases."""

    ts_st = st.lists(st.integers(0, 12), min_size=1, max_size=20)
    g_st = st.lists(st.integers(0, 3), min_size=1, max_size=20)

    @staticmethod
    def _brute(lts, lg, rts, rg, direction, allow_exact):
        out = []
        for t, g in zip(lts, lg):
            cands = []
            for j, (rt, rgj) in enumerate(zip(rts, rg)):
                if rgj != g:
                    continue
                if direction == 'backward':
                    hit = rt <= t if allow_exact else rt < t
                    key = (rt, j)        # latest ts, then last input
                else:
                    hit = rt >= t if allow_exact else rt > t
                    key = (-rt, j)       # earliest ts, then last input
                if hit:
                    cands.append((key, j))
            out.append(max(cands)[1] if cands else None)
        return out

    @given(lts=ts_st, lg=g_st, rts=ts_st, rg=g_st,
           direction=st.sampled_from(['backward', 'forward']),
           allow_exact=st.booleans())
    @settings(max_examples=150, deadline=None)
    def test_matches_bruteforce(self, lts, lg, rts, rg, direction,
                                allow_exact):
        m = min(len(lts), len(lg))
        r = min(len(rts), len(rg))
        lts, lg = np.array(lts[:m]), np.array(lg[:m])
        rts, rg = np.array(rts[:r]), np.array(rg[:r])
        fn = W.asof_backward if direction == 'backward' else W.asof_forward
        idx, ok = fn(lts, lg, rts, rg, allow_exact=allow_exact)
        exp = self._brute(lts, lg, rts, rg, direction, allow_exact)
        for i in range(m):
            if exp[i] is None:
                assert not ok[i], i
            else:
                assert ok[i] and idx[i] == exp[i], (i, idx[i], exp[i])

    # FLOAT on-columns with sub-unit gaps: an int64 truncation anywhere
    # in the kernels collapses 2.1/2.5/2.9 onto 2 and flips matches —
    # the exact bug class fixed in asof_forward/asof_nearest (late r3)
    fts_st = st.lists(st.sampled_from(
        [0.0, 0.4, 0.5, 1.1, 2.1, 2.5, 2.9, 3.0]), min_size=1, max_size=16)

    @given(lts=fts_st, lg=g_st, rts=fts_st, rg=g_st,
           direction=st.sampled_from(['backward', 'forward']),
           allow_exact=st.booleans())
    @settings(max_examples=120, deadline=None)
    def test_matches_bruteforce_float_on(self, lts, lg, rts, rg,
                                         direction, allow_exact):
        m = min(len(lts), len(lg))
        r = min(len(rts), len(rg))
        lts, lg = np.array(lts[:m]), np.array(lg[:m])
        rts, rg = np.array(rts[:r]), np.array(rg[:r])
        fn = W.asof_backward if direction == 'backward' else W.asof_forward
        idx, ok = fn(lts, lg, rts, rg, allow_exact=allow_exact)
        exp = self._brute(lts, lg, rts, rg, direction, allow_exact)
        for i in range(m):
            if exp[i] is None:
                assert not ok[i], i
            else:
                assert ok[i] and idx[i] == exp[i], (i, idx[i], exp[i])

    @given(lts=fts_st, lg=g_st, rts=fts_st, rg=g_st)
    @settings(max_examples=80, deadline=None)
    def test_nearest_float_distances(self, lts, lg, rts, rg):
        m = min(len(lts), len(lg))
        r = min(len(rts), len(rg))
        lts, lg = np.array(lts[:m]), np.array(lg[:m])
        rts, rg = np.array(rts[:r]), np.array(rg[:r])
        idx, ok = W.asof_nearest(lts, lg, rts, rg)
        for i in range(m):
            same = [j for j in range(r) if rg[j] == lg[i]]
            if not same:
                assert not ok[i]
                continue
            assert ok[i]
            dmin = min(abs(float(rts[j]) - float(lts[i])) for j in same)
            assert abs(float(rts[idx[i]]) - float(lts[i])) == dmin, i

    @given(lts=ts_st, lg=g_st, rts=ts_st, rg=g_st)
    @settings(max_examples=100, deadline=None)
    def test_nearest_distance_and_tiebreak(self, lts, lg, rts, rg):
        m = min(len(lts), len(lg))
        r = min(len(rts), len(rg))
        lts, lg = np.array(lts[:m]), np.array(lg[:m])
        rts, rg = np.array(rts[:r]), np.array(rg[:r])
        idx, ok = W.asof_nearest(lts, lg, rts, rg)
        for i in range(m):
            same = [j for j in range(r) if rg[j] == lg[i]]
            if not same:
                assert not ok[i]
                continue
            assert ok[i]
            dmin = min(abs(int(rts[j]) - int(lts[i])) for j in same)
            got_d = abs(int(rts[idx[i]]) - int(lts[i]))
            assert got_d == dmin, (i, got_d, dmin)
            # on a distance tie the backward candidate wins
            if got_d > 0 and any(
                    abs(int(rts[j]) - int(lts[i])) == dmin
                    and rts[j] < lts[i] for j in same):
                assert rts[idx[i]] < lts[i], i
