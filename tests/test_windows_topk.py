"""hopping_window and grouped_topk operator semantics (tiny inputs with
hand-computed expectations)."""

import numpy as np
import pyarrow as pa
import pytest


def _events():
    # two users; timestamps in microseconds at 0, 10min, 70min
    us = [0, 600_000_000, 4_200_000_000]
    return pa.table({
        'user_id': pa.array([1, 1, 2], type=pa.int64()),
        'ts': pa.array(us, type=pa.int64()).cast(pa.timestamp('us')),
        'v': pa.array([1.0, 2.0, 5.0]),
    })


class TestHoppingWindow:
    def test_each_event_in_two_windows(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.streaming import hopping_window
        out = hopping_window(rd.from_arrow(_events()), 'user_id', 'ts',
                             3_600_000_000, 1_800_000_000,
                             {'n': ('v', 'count'), 's': ('v', 'sum')})\
            .to_pandas().sort_values(['user_id', 'window_start'])\
            .reset_index(drop=True)
        # user 1: events at 0 and 10min are in windows starting -30min and
        # 0; user 2: event at 70min in windows 30min and 60min
        u1 = out[out.user_id == 1]
        assert list(u1['n']) == [2, 2]
        assert list(u1['s']) == [3.0, 3.0]
        starts = u1['window_start'].astype('datetime64[us]')\
            .astype('int64').to_numpy()
        assert list(starts) == [-1_800_000_000, 0]
        u2 = out[out.user_id == 2]
        assert list(u2['n']) == [1, 1]

    def test_rejects_non_divisible_hop(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.streaming import hopping_window
        with pytest.raises(ValueError):
            hopping_window(rd.from_arrow(_events()), 'user_id', 'ts',
                           3_600_000_000, 7, {'n': ('v', 'count')})


class TestGroupedTopk:
    def test_topk_with_tiebreak(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import grouped_topk
        rng = np.random.default_rng(3)
        n = 5000
        tbl = pa.table({
            'g': pa.array(rng.integers(0, 20, n)),
            'x': pa.array(rng.integers(0, 100, n)),
            'id': pa.array(np.arange(n)),
        })
        out = grouped_topk(rd.from_arrow(tbl), 'g', 'x', 3,
                           tiebreak='id').to_pandas()
        import pandas as pd
        df = tbl.to_pandas()
        expect = df.sort_values(['g', 'x', 'id'],
                                ascending=[True, False, True])\
            .groupby('g').head(3)
        got = out.sort_values(['g', 'x', 'id'],
                              ascending=[True, False, True])
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      expect.reset_index(drop=True))

    def test_small_groups_survive(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import grouped_topk
        tbl = pa.table({'g': pa.array([1]), 'x': pa.array([7]),
                        'id': pa.array([0])})
        out = grouped_topk(rd.from_arrow(tbl), 'g', 'x', 5,
                           tiebreak='id').to_pandas()
        assert len(out) == 1


class TestTimeRangeWindow:
    def test_bounds_with_tied_timestamps(self):
        from trafaret_ray.stages import window as W
        # one group; ties at t=100 must include ALL peers (SQL RANGE)
        ts = np.array([0, 50, 100, 100, 200], dtype=np.int64)
        starts = np.array([True, False, False, False, False])
        lo, hi = W.time_range_bounds(ts, starts, 60)
        assert list(lo) == [0, 0, 1, 1, 4]
        assert list(hi) == [0, 1, 3, 3, 4]   # rows 2 and 3 are peers

    def test_sum_across_groups(self):
        from trafaret_ray.stages import window as W
        ts = np.array([0, 10, 0, 10], dtype=np.int64)
        starts = np.array([True, False, True, False])
        v = np.array([1, 2, 10, 20], dtype=np.int64)
        sums, counts = W.time_range_sum(v, ts, starts, 100)
        assert list(sums) == [1, 3, 10, 30]   # no cross-group leakage
        assert list(counts) == [1, 2, 1, 2]

    def test_running_sum(self):
        from trafaret_ray.stages import window as W
        starts = np.array([True, False, True, False, False])
        v = np.array([1, 2, 5, 5, 5], dtype=np.int64)
        assert list(W.running_sum(v, starts)) == [1, 3, 5, 10, 15]


class TestReshape:
    def test_group_ranks_ties_and_groups(self):
        from trafaret_ray.stages.reshape import group_ranks
        starts = np.array([True, False, False, False, True, False])
        v = np.array([5.0, 5.0, 3.0, 1.0, 2.0, 9.0])
        rank, dense = group_ranks(v, starts, descending=True)
        assert list(rank) == [1, 1, 3, 4, 2, 1]
        assert list(dense) == [1, 1, 2, 3, 2, 1]

    def test_group_ranks_nan_peers(self):
        """SQL rank()/dense_rank() treat NULLs as PEERS of each other:
        two NaNs in one group must share a rank (DuckDB parity)."""
        from trafaret_ray.stages.reshape import group_ranks
        starts = np.array([True, False, False, False, False])
        v = np.array([5.0, 3.0, np.nan, np.nan, 2.0])
        rank, dense = group_ranks(v, starts, descending=True)
        assert list(rank) == [1, 2, 4, 4, 3]
        assert list(dense) == [1, 2, 4, 4, 3]

    def test_melt(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.reshape import melt
        tbl = pa.table({'id': pa.array([1, 2]),
                        'a': pa.array([10.0, 20.0]),
                        'b': pa.array([1, 2])})
        out = melt(rd.from_arrow(tbl), ['id'], ['a', 'b']).to_pandas()\
            .sort_values(['id', 'variable']).reset_index(drop=True)
        assert len(out) == 4
        assert list(out['variable']) == ['a', 'b', 'a', 'b']
        assert list(out['value']) == [10.0, 1.0, 20.0, 2.0]


class TestHistogramQuantiles:
    def test_accuracy_vs_exact(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.sketches import histogram_quantiles
        rng = np.random.default_rng(13)
        tbl = pa.table({'g': pa.array(np.repeat(['a', 'b'], 4000)),
                        'v': pa.array(rng.normal(size=8000))})
        out = histogram_quantiles(rd.from_arrow(tbl), 'g', 'v',
                                  [0.5, 0.95], n_bins=4096).to_pandas()
        df = tbl.to_pandas()
        for g in ('a', 'b'):
            vals = df[df.g == g]['v'].to_numpy()
            span = vals.max() - vals.min()
            for q in (0.5, 0.95):
                exact = np.percentile(vals, q * 100)
                got = out[(out.g == g) & (out.q == q)]['value'].iloc[0]
                assert abs(got - exact) <= span / 4096 * 2, (g, q)


class TestGroupedQuantiles:
    def test_nulls_ignored_like_quantile_cont(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import grouped_quantiles
        tbl = pa.table({'g': pa.array(['a', 'a', 'a']),
                        'v': pa.array([1.0, None, 3.0])})
        out = grouped_quantiles(rd.from_arrow(tbl), 'g', 'v',
                                [0.5]).to_pandas()
        assert out['value'].iloc[0] == 2.0

    def test_matches_numpy_per_group(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import grouped_quantiles
        rng = np.random.default_rng(11)
        tbl = pa.table({'g': pa.array(np.repeat(['a', 'b'], 500)),
                        'v': pa.array(rng.normal(size=1000))})
        out = grouped_quantiles(rd.from_arrow(tbl), 'g', 'v',
                                [0.5, 0.9]).to_pandas()\
            .sort_values(['g', 'q']).reset_index(drop=True)
        df = tbl.to_pandas()
        for g in ('a', 'b'):
            vals = df[df.g == g]['v'].to_numpy()
            for q in (0.5, 0.9):
                expect = round(float(np.percentile(vals, q * 100)), 6)
                got = out[(out.g == g) & (out.q == q)]['value'].iloc[0]
                assert got == expect


class TestEwma:
    def test_distributed_matches_global_pandas(self, ray_session):
        """q_ewma_events' bucketed recursion equals a single-machine
        pandas ewm over the globally sorted frame (partitioning must not
        change any user's recursion order)."""
        import pandas as pd
        from trafaret_ray.pipelines.queries import q_ewma_events
        out = q_ewma_events('/root/testdata/sf0.001').to_pandas()
        df = pd.read_parquet('/root/testdata/sf0.001/events.parquet',
                             columns=['event_id', 'user_id', 'ts',
                                      'value'])
        df = df[df['ts'].notna()]
        df = df.sort_values(['user_id', 'ts', 'event_id'])
        exp = df.groupby('user_id', sort=False)['value']\
            .ewm(alpha=0.3, adjust=False, ignore_na=True).mean()\
            .reset_index(level=0, drop=True)
        df = df.assign(ewma=exp.to_numpy())\
            .sort_values('event_id').reset_index(drop=True)
        got = out.sort_values('event_id').reset_index(drop=True)
        # BITWISE equality — the r4 oracle contract (null == leading-NaN)
        ge = got['ewma_value'].to_numpy(dtype=np.float64)
        ee = df['ewma'].to_numpy(dtype=np.float64)
        assert np.array_equal(ge, ee, equal_nan=True)

    def test_value_stats_degenerate_groups(self, ray_session):
        """n=1 groups get NULL std on both engines; identical values
        (var clamped at 0) give std 0 instead of a sqrt crash."""
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq, tempfile, os
        from trafaret_ray.pipelines.queries import QUERIES, ORACLE_SQL
        tbl = pa.table({
            'user_id': pa.array([1, 2, 2, 3, 3], type=pa.int64()),
            'value': pa.array([5.0, 0.0115, 0.0115, 1.0, 2.0])})
        d = tempfile.mkdtemp()
        pq.write_table(tbl, os.path.join(d, 'events.parquet'))
        got = QUERIES['q_user_value_stats'](d).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
        exp = con.sql(ORACLE_SQL['q_user_value_stats']).df()
        for c in ('n_events', 'mean_value', 'std_value'):
            a, b = got[c], exp[c]
            assert (pd.isna(a) == pd.isna(b)).all(), c
            m = ~pd.isna(a)
            assert (a[m].to_numpy() == b[m].to_numpy()).all(), c
        assert pd.isna(got['std_value'].iloc[0])   # n=1 -> NULL
        assert got['std_value'].iloc[1] == 0.0     # clamped var


class TestAggregateDifferentialFuzz:
    def test_bucket_aggregate_randomized_vs_duckdb(self, ray_session):
        """Randomized differential: partial/final aggregation over keys
        and values WITH NULLS must match DuckDB GROUP BY (null keys form
        their own group; sum/count skip null values; min/max exact)."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from trafaret_ray.stages.aggregate import bucket_aggregate
        for seed in (3, 4, 5):
            rng = np.random.default_rng(seed)
            n = 300
            k = rng.integers(0, 15, n).astype(float)
            k[rng.random(n) < 0.08] = np.nan
            v = rng.integers(-50, 50, n).astype(float)
            v[rng.random(n) < 0.08] = np.nan
            tbl = pa.table({
                'k': pa.array([None if np.isnan(x) else int(x)
                               for x in k], type=pa.int64()),
                'v': pa.array([None if np.isnan(x) else int(x)
                               for x in v], type=pa.int64())})
            got = bucket_aggregate(
                rd.from_arrow(tbl).repartition(5), ['k'],
                {'s': ('v', 'sum'), 'c': ('v', 'count'),
                 'lo': ('v', 'min'), 'hi': ('v', 'max')},
                num_buckets=4).to_pandas()
            con = duckdb.connect()
            con.register('t', tbl.to_pandas())
            exp = con.sql('SELECT k, sum(v) s, count(v) c, min(v) lo, '
                          'max(v) hi FROM t GROUP BY k').df()
            g = got.sort_values('k', na_position='last')\
                .reset_index(drop=True)
            e = exp.sort_values('k', na_position='last')\
                .reset_index(drop=True)
            assert len(g) == len(e), seed
            for c in ('s', 'c', 'lo', 'hi'):
                a = g[c].to_numpy(dtype=float)
                b = e[c].to_numpy(dtype=float)
                assert np.allclose(a, b, equal_nan=True), (seed, c)

    def test_all_null_group_sum_is_null(self, ray_session):
        """SQL parity: a group whose values are ALL null sums to NULL,
        not 0 (DuckDB semantics), across partial/final phases."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from trafaret_ray.stages.aggregate import (bucket_aggregate,
                                                   pre_aggregate)
        tbl = pa.table({'k': pa.array([1, 1, 2], type=pa.int64()),
                        'v': pa.array([None, None, 5], type=pa.int64())})
        for op in (bucket_aggregate, pre_aggregate):
            out = op(rd.from_arrow(tbl).repartition(2), ['k'],
                     {'s': ('v', 'sum'), 'c': ('v', 'count')})\
                .to_pandas().sort_values('k').reset_index(drop=True)
            assert pd.isna(out['s'].iloc[0]) and out['c'].iloc[0] == 0
            assert out['s'].iloc[1] == 5 and out['c'].iloc[1] == 1

    def test_topk_null_group_is_one_group(self, ray_session):
        """SQL parity: NULL group keys form ONE group (a nullable int
        group column materializes as NaN in numpy, and NaN != NaN would
        otherwise make every null row its own run)."""
        import duckdb
        import pyarrow as pa
        import ray.data as rd
        from trafaret_ray.stages.aggregate import grouped_topk
        tbl = pa.table({
            'g': pa.array([1, None, 1, None, 2, None], type=pa.int64()),
            'v': pa.array([3.0, 5.0, 4.0, 1.0, 2.0, 7.0]),
            't': pa.array([1, 2, 3, 4, 5, 6], type=pa.int64())})
        out = grouped_topk(rd.from_arrow(tbl), 'g', 'v', 1, tiebreak='t')\
            .to_pandas().sort_values('t').reset_index(drop=True)
        ora = duckdb.sql(
            "SELECT g, v, t FROM (SELECT *, row_number() OVER "
            "(PARTITION BY g ORDER BY v DESC, t) rn FROM tbl) "
            "WHERE rn <= 1 ORDER BY t").df().reset_index(drop=True)
        assert list(out['t']) == list(ora['t'])

    def test_windows_null_ts(self, ray_session):
        """A NULL timestamp groups under a NULL window (tumbling) and
        lands in exactly ONE null window, not k copies (hopping)."""
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from trafaret_ray.stages.streaming import (hopping_window,
                                                   tumbling_window)
        tbl = pa.table({
            'k': pa.array(['x', 'x', 'y', 'x'], type=pa.string()),
            'ts': pa.array([1_000_000, None, 3_000_000, 1_500_000],
                           type=pa.timestamp('us')),
            'v': pa.array([1.0, 2.0, 3.0, 4.0])})
        out = tumbling_window(rd.from_arrow(tbl), 'k', 'ts', 2_000_000,
                              {'n': ('v', 'count'), 's': ('v', 'sum')})\
            .to_pandas()
        nullrow = out[out['window_start'].isna()]
        assert len(nullrow) == 1 and nullrow['s'].iloc[0] == 2.0
        assert out[~out['window_start'].isna()]['n'].sum() == 3

        hop = hopping_window(rd.from_arrow(tbl), 'k', 'ts',
                             2_000_000, 1_000_000, {'n': ('v', 'count')})\
            .to_pandas()
        hnull = hop[hop['window_start'].isna()]
        assert len(hnull) == 1 and hnull['n'].iloc[0] == 1


class TestGroupPositions:
    def test_randomized_vs_duckdb(self):
        """row_number/percent_rank/cume_dist/ntile against DuckDB window
        functions over random heavy-tie data (total order pinned by a
        unique tiebreak, as SQL requires for a deterministic compare)."""
        import duckdb
        import pandas as pd
        from trafaret_ray.stages.reshape import group_positions
        rng = np.random.default_rng(3)
        for trial in range(5):
            n = int(rng.integers(1, 400))
            g = np.sort(rng.integers(0, 8, n))
            v = rng.integers(0, 6, n).astype(float)
            if trial % 2:                       # NaN peers too
                v[rng.random(n) < 0.1] = np.nan
            tb = rng.permutation(n).astype(np.int64)
            starts = np.ones(n, dtype=bool)
            starts[1:] = g[1:] != g[:-1]
            rn, pct, cume, tile = group_positions(
                v, tb, starts, descending=True, tiles=4)
            con = duckdb.connect()
            con.register('t', pd.DataFrame({'g': g, 'v': v, 'tb': tb}))
            exp = con.execute("""
              SELECT row_number() OVER w2 rn, percent_rank() OVER w pct,
                     cume_dist() OVER w cume, ntile(4) OVER w2 tile, tb
              FROM t
              WINDOW w AS (PARTITION BY g ORDER BY v DESC),
                     w2 AS (PARTITION BY g ORDER BY v DESC, tb ASC)
              """).df().sort_values('tb')
            got = pd.DataFrame({'rn': rn, 'pct': pct, 'cume': cume,
                                'tile': tile, 'tb': tb}).sort_values('tb')
            for c in ('rn', 'tile'):
                assert got[c].tolist() == exp[c].tolist(), (trial, c)
            for c in ('pct', 'cume'):
                assert np.allclose(got[c].to_numpy(),
                                   exp[c].to_numpy()), (trial, c)


class TestGlobalTopk:
    def test_matches_sorted_limit_and_handles_nulls(self, ray_session):
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.aggregate import global_topk
        rng = np.random.default_rng(21)
        n = 5000
        vals = rng.normal(size=n)
        vals[rng.choice(n, 50, replace=False)] = np.nan
        tbl = pa.table({
            'id': pa.array(np.arange(n, dtype=np.int64)),
            'v': pa.array(vals, from_pandas=True),  # NaN -> null
        })
        got = global_topk(rd.from_arrow(tbl).repartition(7),
                          [('v', 'descending'), ('id', 'ascending')],
                          25).to_pandas()
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute('select id, v from t '
                          'order by v desc nulls last, id limit 25').df()
        assert got['id'].tolist() == exp['id'].tolist()
        assert np.allclose(got['v'], exp['v'])

    def test_fewer_rows_than_k(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import global_topk
        tbl = pa.table({'id': pa.array([3, 1, 2], type=pa.int64())})
        got = global_topk(rd.from_arrow(tbl), [('id', 'ascending')],
                          10).to_pandas()
        assert got['id'].tolist() == [1, 2, 3]


class TestGroupPositionsDifferentialFuzz:
    def test_randomized_vs_duckdb_with_ties(self):
        """Randomized differential for the positional window family:
        heavy ties (few distinct values) so percent_rank/cume_dist peer
        runs and ntile fill rules are actually exercised."""
        import duckdb
        from trafaret_ray.stages.reshape import group_positions
        from trafaret_ray.stages.window import group_starts
        for seed, tiles in ((13, 3), (14, 4), (15, 5)):
            rng = np.random.default_rng(seed)
            n = 400
            g = np.sort(rng.integers(0, 12, n))
            v = rng.integers(0, 5, n).astype(np.float64)  # heavy ties
            tb = rng.permutation(n).astype(np.int64)
            starts = group_starts(g)
            rn, pct, cume, tile = group_positions(
                v, tb, starts, descending=True, tiles=tiles)
            con = duckdb.connect()
            con.register('t', pa.table({
                'g': pa.array(g), 'v': pa.array(v),
                'tb': pa.array(tb)}))
            exp = con.execute(f"""
                SELECT row_number()  OVER w2 AS rn,
                       percent_rank() OVER w  AS pct,
                       cume_dist()    OVER w  AS cume,
                       ntile({tiles}) OVER w2 AS tile
                FROM t
                WINDOW w  AS (PARTITION BY g ORDER BY v DESC),
                       w2 AS (PARTITION BY g ORDER BY v DESC, tb ASC)
                ORDER BY g, v DESC, tb""").df()
            order = np.lexsort((tb, -v, g))
            assert rn[order].tolist() == exp['rn'].tolist(), seed
            assert np.allclose(pct[order], exp['pct']), seed
            assert np.allclose(cume[order], exp['cume']), seed
            assert tile[order].tolist() == exp['tile'].tolist(), seed

    def test_randomized_vs_duckdb_with_nulls(self):
        """Same differential with ~30% NULLs in the ordering key: NULLs
        are PEERS (one tie run) and sort LAST in both directions on both
        engines (DuckDB default NULLS LAST; lexsort places NaN last)."""
        import duckdb

        from trafaret_ray.stages.reshape import group_positions, group_ranks
        from trafaret_ray.stages.window import group_starts
        for seed in (23, 24):
            rng = np.random.default_rng(seed)
            n = 300
            g = np.sort(rng.integers(0, 10, n))
            v = rng.integers(0, 4, n).astype(np.float64)
            v[rng.random(n) < 0.3] = np.nan
            tb = rng.permutation(n).astype(np.int64)
            starts = group_starts(g)
            rn, pct, cume, tile = group_positions(
                v, tb, starts, descending=True, tiles=4)
            rank, dense = group_ranks(v, starts, descending=True)
            con = duckdb.connect()
            # from_pandas=True maps NaN -> NULL for the SQL side
            con.register('t', pa.table({
                'g': pa.array(g), 'v': pa.array(v, from_pandas=True),
                'tb': pa.array(tb)}))
            exp = con.execute("""
                SELECT row_number()   OVER w2 AS rn,
                       percent_rank() OVER w  AS pct,
                       cume_dist()    OVER w  AS cume,
                       ntile(4)       OVER w2 AS tile,
                       rank()         OVER w  AS rk,
                       dense_rank()   OVER w  AS dr
                FROM t
                WINDOW w  AS (PARTITION BY g ORDER BY v DESC),
                       w2 AS (PARTITION BY g ORDER BY v DESC, tb ASC)
                ORDER BY g, v DESC NULLS LAST, tb""").df()
            order = np.lexsort((tb, -v, g))
            assert rn[order].tolist() == exp['rn'].tolist(), seed
            assert np.allclose(pct[order], exp['pct']), seed
            assert np.allclose(cume[order], exp['cume']), seed
            assert tile[order].tolist() == exp['tile'].tolist(), seed
            assert rank[order].tolist() == exp['rk'].tolist(), seed
            assert dense[order].tolist() == exp['dr'].tolist(), seed
