"""NULL-group-key parity: SQL GROUP BY treats NULL keys as ONE group,
COUNT(DISTINCT) skips NULL values, and PIVOT keeps null-id rows without
expanding unobserved id combinations.

Also pins the pyarrow 16.1 hash-grouper bug: a composite key mixing a
null-bearing string column with a double column emits DUPLICATE groups
(6 identical (null, 10.0) rows -> 2 output groups). _group_table recodes
null keys as (fill, validity) pairs so the grouper never sees one.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _frame(seed=7, n=4000):
    rng = np.random.default_rng(seed)
    g = rng.choice(['a', 'b', 'c', None], n).tolist()
    v = [None if rng.random() < 0.15 else int(rng.integers(0, 40))
         for _ in range(n)]
    return g, v, pa.table({'g': pa.array(g, type=pa.string()),
                           'v': pa.array(v, type=pa.int64())})


class TestArrowGrouperNullRecode:
    def test_composite_string_double_null_key(self):
        """Direct pin of the pyarrow duplicate-group shape."""
        from trafaret_ray.stages.aggregate import _group_table
        rows = 6
        t = pa.table({'g': pa.array([None] * rows, type=pa.string()),
                      'v': pa.array([10.0] * rows),
                      'c': pa.array([1] * rows, type=pa.int64())})
        # mimic the exchange: per-row tables concatenated
        t = pa.concat_tables([t.slice(i, 1) for i in range(rows)])
        out = _group_table(t, ['g', 'v'], [('c', 'sum')])
        assert out.num_rows == 1
        assert out.column('c_sum')[0].as_py() == rows
        assert not out.column('g')[0].is_valid

    def test_key_also_aggregated_keeps_nulls(self):
        """A column used as BOTH key and agg source must count its own
        nulls as missing (exact_distinct's null-pair detector)."""
        from trafaret_ray.stages.aggregate import _group_table
        t = pa.table({'g': pa.array(['a', 'a', None], type=pa.string()),
                      'v': pa.array([1, None, None], type=pa.int64())})
        out = _group_table(t, ['g', 'v'], [('v', 'count')])
        got = {(r['g'], r['v']): r['v_count']
               for r in out.to_pylist()}
        assert got == {('a', 1): 1, ('a', None): 0, (None, None): 0}


class TestNullGroupDifferential:
    def test_exact_distinct_vs_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.sketches import exact_distinct
        g, v, tbl = _frame()
        got = exact_distinct(rd.from_arrow(tbl).repartition(6), 'g', 'v')\
            .to_pandas().sort_values('g', na_position='first')\
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute('select g, count(distinct v) as n_distinct '
                          'from t group by g order by g nulls first').df()
        assert got['g'].fillna('<N>').tolist() == \
            exp['g'].fillna('<N>').tolist()
        assert got['n_distinct'].tolist() == exp['n_distinct'].tolist()

    def test_pre_aggregate_null_string_keys(self, ray_session):
        """Used to crash Ray's sort groupby (None in searchsorted)."""
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.aggregate import pre_aggregate
        g, v, tbl = _frame(seed=11)
        got = pre_aggregate(rd.from_arrow(tbl).repartition(6), ['g'],
                            {'s': ('v', 'sum'), 'c': ('v', 'count')})\
            .to_pandas().sort_values('g', na_position='first')\
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute('select g, sum(v) as s, count(v) as c from t '
                          'group by g order by g nulls first').df()
        assert got['g'].fillna('<N>').tolist() == \
            exp['g'].fillna('<N>').tolist()
        assert got['s'].tolist() == exp['s'].astype('Int64').tolist()
        assert got['c'].tolist() == exp['c'].tolist()

    def test_hll_null_group_kept_null_values_skipped(self, ray_session):
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.sketches import hll_distinct
        g, v, tbl = _frame(seed=13)
        got = hll_distinct(rd.from_arrow(tbl).repartition(6), 'g', 'v',
                           p=14).to_pandas()\
            .sort_values('g', na_position='first').reset_index(drop=True)
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute('select g, count(distinct v) as n from t '
                          'group by g order by g nulls first').df()
        assert got['g'].fillna('<N>').tolist() == \
            exp['g'].fillna('<N>').tolist()
        for a, b in zip(got['approx_distinct'], exp['n']):
            assert abs(a - b) <= max(2, 0.05 * b)


class TestPivotNullIds:
    def test_null_id_rows_kept_no_cartesian(self, ray_session):
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.reshape import pivot
        rng = np.random.default_rng(17)
        n = 3000
        ids = rng.choice(['x1', 'x2', None], n).tolist()
        sub = rng.integers(0, 3, n)          # second id col, partial
        var = rng.choice(['p', 'q'], n).tolist()
        val = rng.integers(0, 100, n)
        # make (x1, 2) unobserved: pivot must NOT invent it
        keep = ~((np.array([i == 'x1' for i in ids])) & (sub == 2))
        tbl = pa.table({'id': pa.array(np.array(ids, dtype=object)[keep]),
                        'sub': pa.array(sub[keep], type=pa.int64()),
                        'var': pa.array(np.array(var)[keep]),
                        'val': pa.array(val[keep], type=pa.int64())})
        got = pivot(rd.from_arrow(tbl).repartition(5), ['id', 'sub'],
                    'var', 'val', ['p', 'q'], aggfunc='sum').to_pandas()\
            .sort_values(['id', 'sub'], na_position='first')\
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute(
            "select id, sub, sum(val) filter (var='p') as p, "
            "sum(val) filter (var='q') as q from t group by id, sub "
            "order by id nulls first, sub").df()
        assert len(got) == len(exp)
        assert got['id'].fillna('<N>').tolist() == \
            exp['id'].fillna('<N>').tolist()
        for c in ('p', 'q'):
            assert np.allclose(got[c].to_numpy(dtype=float),
                               exp[c].to_numpy(dtype=float),
                               equal_nan=True)


class TestHeavyHittersNull:
    def test_null_is_a_group_certified_and_fallback(self, ray_session):
        """SQL GROUP BY: NULL is a (often dominant) group. Covers both
        the certified-exact sketch path (skewed) and the full-count
        fallback (flat distribution)."""
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.sketches import heavy_hitters
        rng = np.random.default_rng(10)
        skewed = rng.choice(['x', 'y', 'z', None], 6000,
                            p=(.2, .15, .1, .55)).tolist()
        # ~50 flat distinct values + nulls, expansion=2 -> local tops
        # truncate, the certificate fails, the exact fallback runs
        flat = [None if rng.random() < 0.3 else f'v{rng.integers(0, 50)}'
                for _ in range(6000)]
        for vals, expansion in ((skewed, 16), (flat, 2)):
            tbl = pa.table({'c': pa.array(vals, type=pa.string())})
            got = heavy_hitters(rd.from_arrow(tbl).repartition(6), 'c',
                                k=3, expansion=expansion).to_pandas()
            con = duckdb.connect()
            con.register('t', tbl)
            exp = con.execute(
                'select c, count(*) as n from t group by c '
                'order by n desc, c asc nulls last limit 3').df()
            assert got['c'].fillna('<N>').tolist() == \
                exp['c'].fillna('<N>').tolist(), expansion
            assert got['n'].tolist() == exp['n'].tolist(), expansion


class TestRollupAggregate:
    def test_matches_duckdb_with_null_keys(self, ray_session):
        """ROLLUP with a genuine NULL key: grouping_id disambiguates a
        rolled-up NULL from a data NULL, matching DuckDB's GROUPING()."""
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.aggregate import rollup_aggregate
        rng = np.random.default_rng(5)
        n = 4000
        tbl = pa.table({
            'a': pa.array(rng.choice(['x', 'y', None], n).tolist(),
                          type=pa.string()),
            'b': pa.array(rng.integers(0, 3, n), type=pa.int64()),
            'v': pa.array(rng.integers(0, 50, n), type=pa.int64()),
        })
        got = rollup_aggregate(
            rd.from_arrow(tbl).repartition(5), ['a', 'b'],
            {'s': ('v', 'sum'), 'n': ('v', 'count'),
             'mn': ('v', 'min'), 'mx': ('v', 'max')}).to_pandas()
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute(
            'select a, b, sum(v) as s, count(v) as n, min(v) as mn, '
            'max(v) as mx, grouping(a, b) as grouping_id '
            'from t group by rollup(a, b)').df()

        def norm(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if df[c].dtype.kind in 'iuf':
                    df[c] = df[c].astype('float64')
            return df.sort_values(list(df.columns), na_position='first')\
                .reset_index(drop=True)

        g, e = norm(got), norm(exp)
        assert len(g) == len(e)
        for c in g.columns:
            gv, ev = g[c], e[c]
            if gv.dtype.kind == 'f':
                assert np.allclose(gv.to_numpy(dtype=float),
                                   ev.to_numpy(dtype=float),
                                   equal_nan=True), c
            else:
                assert gv.fillna('<N>').tolist() == \
                    ev.fillna('<N>').tolist(), c

    def test_mean_rejected(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import rollup_aggregate
        tbl = pa.table({'a': ['x'], 'v': [1]})
        with pytest.raises(ValueError, match='not re-mergeable'):
            rollup_aggregate(rd.from_arrow(tbl), ['a'],
                             {'m': ('v', 'mean')})

    def test_cube_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.aggregate import cube_aggregate
        rng = np.random.default_rng(9)
        n = 3000
        tbl = pa.table({
            'a': pa.array(rng.choice(['p', 'q', None], n).tolist(),
                          type=pa.string()),
            'b': pa.array(rng.choice(['u', None], n).tolist(),
                          type=pa.string()),
            'v': pa.array(rng.integers(0, 9, n), type=pa.int64()),
        })
        got = cube_aggregate(rd.from_arrow(tbl).repartition(4),
                             ['a', 'b'], {'s': ('v', 'sum')}).to_pandas()
        con = duckdb.connect()
        con.register('t', tbl)
        exp = con.execute(
            'select a, b, sum(v) as s, grouping(a, b) as grouping_id '
            'from t group by cube(a, b)').df()

        def norm(df):
            df = df.copy()
            df['s'] = df['s'].astype('float64')
            return df.sort_values(['grouping_id', 'a', 'b', 's'],
                                  na_position='first')\
                .reset_index(drop=True)

        g, e = norm(got), norm(exp)
        assert len(g) == len(e) == 12  # (3a+null-roll) x (2b+null-roll)
        for c in g.columns:
            assert g[c].fillna('<N>').tolist() == \
                e[c].fillna('<N>').tolist(), c


class TestLatestByKey:
    """latest_by_key = CDC latest-wins compaction (stages/aggregate)."""

    def _run(self, tbl, keys, order_by):
        import ray.data as rd
        from trafaret_ray.stages.aggregate import latest_by_key
        return latest_by_key(rd.from_arrow(tbl), keys, order_by,
                             num_buckets=4).to_pandas()

    def test_matches_pandas_idxmax(self, ray_session):
        import pandas as pd
        rng = np.random.default_rng(3)
        n = 5_000
        tbl = pa.table({
            'k': rng.integers(0, 200, n),
            'ts': rng.integers(0, 1_000_000, n),
            'uid': np.arange(n, dtype=np.int64),
            'v': rng.standard_normal(n),
        })
        out = self._run(tbl, 'k', ['ts', 'uid']).sort_values('k')\
            .reset_index(drop=True)
        df = tbl.to_pandas().sort_values(['k', 'ts', 'uid'])
        exp = df.groupby('k', as_index=False).last()
        assert len(out) == len(exp)
        for c in ('k', 'ts', 'uid'):
            assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c
        assert np.allclose(out['v'], exp['v'])

    def test_composite_key_and_null_group(self, ray_session):
        tbl = pa.table({
            'a': pa.array([1, 1, None, None, 2], pa.int64()),
            'b': pa.array(['x', 'x', 'y', 'y', 'y']),
            'ts': pa.array([5, 9, 1, 3, 7], pa.int64()),
            'v': pa.array([10, 20, 30, 40, 50], pa.int64()),
        })
        out = self._run(tbl, ['a', 'b'], ['ts'])
        got = {(None if pd.isna(a) else int(a), b): int(v)
               for a, b, v in zip(out['a'], out['b'], out['v'])}
        assert got == {(1, 'x'): 20, (None, 'y'): 40, (2, 'y'): 50}
