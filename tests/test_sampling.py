"""hash_split: deterministic, disjoint-cover, proportional, SQL-mirrored."""

import numpy as np
import pyarrow as pa


class TestHashSplit:
    def test_proportions_and_determinism(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.sampling import hash_split
        keys = np.arange(50_000, dtype=np.int64)
        ds = rd.from_arrow(pa.table({'k': keys})).repartition(8)
        out = hash_split(ds, 'k').to_pandas()
        frac = out['split'].value_counts(normalize=True)
        assert abs(frac['train'] - 0.8) < 0.01
        assert abs(frac['val'] - 0.1) < 0.005
        assert abs(frac['test'] - 0.1) < 0.005
        # re-run with different partitioning: identical assignment
        out2 = hash_split(rd.from_arrow(pa.table({'k': keys})), 'k')\
            .to_pandas()
        a = out.sort_values('k')['split'].tolist()
        b = out2.sort_values('k')['split'].tolist()
        assert a == b

    def test_salt_changes_assignment(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.sampling import hash_split
        keys = np.arange(5_000, dtype=np.int64)
        t = pa.table({'k': keys})
        a = hash_split(rd.from_arrow(t), 'k').to_pandas()\
            .sort_values('k')['split'].to_numpy()
        b = hash_split(rd.from_arrow(t), 'k', salt=7).to_pandas()\
            .sort_values('k')['split'].to_numpy()
        assert (a != b).mean() > 0.1

    def test_sql_expr_matches_kernel(self):
        """The oracle CASE expression and the numpy kernel agree row
        for row, including at the bucket edges and for huge keys."""
        import duckdb
        import pandas as pd
        from trafaret_ray.functions.sampling import (split_buckets,
                                                     split_sql_expr)
        rng = np.random.default_rng(1)
        keys = np.concatenate([
            rng.integers(0, 1 << 62, 2000),
            np.arange(3000),                 # dense small keys
        ]).astype(np.int64)
        fr = {'train': 0.8, 'val': 0.1, 'test': 0.1}
        b = split_buckets(keys)
        edges = np.array([8000, 9000])
        names = np.array(['train', 'val', 'test'], dtype=object)
        mine = names[np.searchsorted(edges, b, side='right')]
        con = duckdb.connect()
        con.register('t', pd.DataFrame({'event_id': keys}))
        sql = ('SELECT event_id, '
               + split_sql_expr('event_id', fr)
               + ' AS s FROM t')
        exp = con.execute(sql).df()['s'].to_numpy()
        assert (mine == exp).all()

    def test_rejects_bad_fractions(self, ray_session):
        import pytest
        import ray.data as rd
        from trafaret_ray.functions.sampling import hash_split
        ds = rd.from_arrow(pa.table({'k': [1, 2]}))
        with pytest.raises(ValueError):
            hash_split(ds, 'k', {'a': 0.5, 'b': 0.2})


class TestPrioritySample:
    def test_deterministic_and_weight_biased(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.sampling import priority_sample
        n = 400
        # two weight classes: heavy rows (w=50) vs light rows (w=1)
        w = pa.array([50 if i % 4 == 0 else 1 for i in range(n)],
                     pa.int64())
        tbl = pa.table({'k': pa.array(range(n), pa.int64()), 'w': w})
        out1 = priority_sample(rd.from_arrow(tbl), 'k', 'w', k=40,
                               salt=3).to_pandas()
        out2 = priority_sample(rd.from_arrow(tbl), 'k', 'w', k=40,
                               salt=3).to_pandas()
        assert sorted(out1['k']) == sorted(out2['k'])   # deterministic
        assert len(out1) == 40
        # inclusion bias: heavy rows are 25% of the population but
        # carry ~94% of the weight — they must dominate the sample
        heavy = (out1['k'] % 4 == 0).sum()
        assert heavy > 25, heavy

    def test_matches_numpy_oracle(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.sampling import (priority_sample,
                                                     split_buckets)
        rng = np.random.default_rng(5)
        keys = np.arange(300, dtype=np.int64)
        w = rng.integers(1, 1000, 300).astype(np.int64)
        tbl = pa.table({'k': pa.array(keys), 'w': pa.array(w)})
        got = priority_sample(rd.from_arrow(tbl), 'k', 'w', k=25,
                              salt=11).to_pandas()
        h = split_buckets(keys, mod=2 ** 32, salt=11)
        prio = w.astype(np.float64) / (h + 1).astype(np.float64)
        want = keys[np.lexsort((keys, -prio))][:25]
        assert sorted(got['k']) == sorted(want.tolist())

    def test_nonpositive_and_null_weights_excluded(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.sampling import priority_sample
        tbl = pa.table({'k': pa.array([1, 2, 3, 4], pa.int64()),
                        'w': pa.array([5, 0, None, -2], pa.int64())})
        out = priority_sample(rd.from_arrow(tbl), 'k', 'w',
                              k=10).to_pandas()
        assert out['k'].tolist() == [1]
