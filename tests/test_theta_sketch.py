"""KMV / theta sketch: bottom-k distinct estimation + set operations."""
import numpy as np
import pyarrow as pa

from trafaret_ray.stages.sketches import (kmv_estimate, kmv_merge,
                                          kmv_partial)


class TestKMVKernel:
    def test_exact_below_capacity(self):
        vals = np.arange(100, dtype=np.int64)
        mins = kmv_partial(vals, 4096)
        assert kmv_estimate(mins, 4096) == 100.0

    def test_distinct_not_rows(self):
        vals = np.array([1, 1, 1, 2, 2, 3], dtype=np.int64)
        assert kmv_estimate(kmv_partial(vals, 64), 64) == 3.0

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 1 << 40, size=50_000)
        k = 1024
        whole = kmv_partial(vals, k)
        parts = [kmv_partial(c, k) for c in np.array_split(vals, 7)]
        assert np.array_equal(kmv_merge(parts, k), whole)

    def test_estimate_accuracy_above_capacity(self):
        rng = np.random.default_rng(9)
        n = 200_000
        vals = rng.integers(0, 1 << 62, size=n)  # ~all distinct
        k = 4096
        est = kmv_estimate(kmv_partial(vals, k), k)
        assert abs(est - n) / n < 0.05


class TestThetaSetOps:
    def test_intersection_estimate(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.sketches import theta_set_ops
        # |A|=150k, |B|=100k, |A n B|=50k — all above sketch capacity
        a = np.arange(150_000, dtype=np.int64)
        b = np.arange(100_000, dtype=np.int64) + 100_000
        out = theta_set_ops(
            rd.from_arrow(pa.table({'v': pa.array(a)})).repartition(8),
            rd.from_arrow(pa.table({'v': pa.array(b)})).repartition(8),
            'v', k=4096).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert abs(r['approx_a'] - 150_000) / 150_000 < 0.05
        assert abs(r['approx_b'] - 100_000) / 100_000 < 0.05
        assert abs(r['approx_union'] - 200_000) / 200_000 < 0.05
        assert abs(r['approx_intersection'] - 50_000) / 50_000 < 0.15

    def test_exact_twin_below_capacity(self, ray_session):
        """At sketch capacity > distinct count the estimates are EXACT —
        pin the query against its exact twin on the driver testdata."""
        import duckdb

        from trafaret_ray.pipelines.queries import q_theta_users_overlap
        sf = '/root/testdata/sf0.01'
        out = q_theta_users_overlap(sf).to_pandas().iloc[0]
        exact = duckdb.sql(f"""
            SELECT
              (SELECT count(DISTINCT user_id) FROM
                 read_parquet('{sf}/events.parquet')
               WHERE event_type='click' AND user_id IS NOT NULL) a,
              (SELECT count(DISTINCT user_id) FROM
                 read_parquet('{sf}/events.parquet')
               WHERE event_type='purchase' AND user_id IS NOT NULL) b,
              (SELECT count(DISTINCT user_id) FROM
                 read_parquet('{sf}/events.parquet')
               WHERE event_type IN ('click','purchase')
                 AND user_id IS NOT NULL) u
        """).fetchone()
        assert (out['approx_a'], out['approx_b'],
                out['approx_union']) == (exact[0], exact[1], exact[2])
        assert out['approx_intersection'] == \
            exact[0] + exact[1] - exact[2]

    def test_empty_sides(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.sketches import theta_set_ops
        e = rd.from_arrow(pa.table({'v': pa.array([], pa.int64())}))
        out = theta_set_ops(e, e, 'v', k=64).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].tolist() == [0.0, 0.0, 0.0, 0.0]
