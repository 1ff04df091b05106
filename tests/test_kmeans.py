"""Distributed Lloyd k-means: exact-integer reproducibility contract.

The claim under test (stages/ann.kmeans_lloyd docstring): every step is
int64 micro-unit arithmetic, so distributed == single-task == a plain
sequential numpy run, byte-for-byte, under any row order or partitioning.
"""

import numpy as np
import pyarrow as pa

from trafaret_ray.stages.ann import (_assign6, _kmeans_local6, _matrix6,
                                     kmeans_assign, kmeans_lloyd)


def _corpus(n=600, dim=8, n_groups=5, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_groups, dim)) * 5
    rows = centers[rng.integers(0, n_groups, n)] \
        + rng.standard_normal((n, dim))
    return pa.table({
        'vec_id': pa.array(np.arange(n, dtype=np.int64)),
        'embedding': pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32())),
    })


def _reference(tbl, k, iters):
    """Sequential ground truth computed OUTSIDE the engine: same integer
    update rule, init = vectors of the k smallest ids."""
    x6 = _matrix6(tbl, 'embedding')
    ids = tbl.column('vec_id').to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind='stable')[:k]
    return _kmeans_local6(x6, x6[np.sort(order)].copy(), iters)


class TestKmeansLloyd:
    def test_distributed_equals_sequential(self, ray_session):
        import ray.data as rd
        tbl = _corpus()
        ds = rd.from_arrow(tbl).repartition(7)
        # force the distributed loop (local_rows_max=0)
        c6, sizes, inertia = kmeans_lloyd(ds, n_clusters=5, iters=4,
                                          local_rows_max=0)
        rc6, rsizes, rinertia = _reference(tbl, 5, 4)
        assert np.array_equal(c6, rc6)
        assert np.array_equal(sizes, rsizes)
        assert inertia == rinertia

    def test_local_fast_path_matches_distributed(self, ray_session):
        import ray.data as rd
        tbl = _corpus(n=300, seed=3)
        ds = rd.from_arrow(tbl).repartition(5)
        dist = kmeans_lloyd(ds, n_clusters=4, iters=3, local_rows_max=0)
        loc = kmeans_lloyd(rd.from_arrow(tbl), n_clusters=4, iters=3,
                           local_rows_max=10**9)
        assert np.array_equal(dist[0], loc[0])
        assert np.array_equal(dist[1], loc[1])
        assert dist[2] == loc[2]

    def test_row_order_invariance(self, ray_session):
        import ray.data as rd
        tbl = _corpus(n=400, seed=7)
        perm = np.random.default_rng(0).permutation(tbl.num_rows)
        shuf = tbl.take(pa.array(perm))
        a = kmeans_lloyd(rd.from_arrow(tbl).repartition(6),
                         n_clusters=5, iters=3, local_rows_max=0)
        b = kmeans_lloyd(rd.from_arrow(shuf).repartition(3),
                         n_clusters=5, iters=3, local_rows_max=0)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])
        assert a[2] == b[2]

    def test_inertia_non_increasing(self):
        tbl = _corpus(n=500, seed=11)
        x6 = _matrix6(tbl, 'embedding')
        c6 = x6[:6].copy()
        prev = None
        for _ in range(6):
            c6, _, inertia = _kmeans_local6(x6, c6, 1)
            if prev is not None:
                assert inertia <= prev
            prev = inertia

    def test_empty_cluster_keeps_centroid(self):
        # 4 identical points, 2 clusters: one centroid captures all
        # points, the other keeps its init coordinates
        x6 = np.full((4, 3), 1_000_000, dtype=np.int64)
        init = np.array([[1_000_000] * 3, [9_000_000] * 3],
                        dtype=np.int64)
        c6, sizes, _ = _kmeans_local6(x6, init.copy(), 3)
        assert np.array_equal(c6[0], x6[0])
        assert np.array_equal(c6[1], init[1])
        assert sizes.tolist() == [4, 0]

    def test_nulls_dropped_and_k_capped(self, ray_session):
        import ray.data as rd
        tbl = _corpus(n=3, seed=2)
        with_null = pa.table({
            'vec_id': pa.array([0, 1, 2, 3], pa.int64()),
            'embedding': pa.concat_arrays([
                tbl.column('embedding').combine_chunks(),
                pa.array([None], tbl.column('embedding').type)]),
        })
        c6, sizes, _ = kmeans_lloyd(rd.from_arrow(with_null),
                                    n_clusters=8, iters=2)
        assert c6.shape[0] == 3          # k capped at non-null rows
        assert sizes.sum() == 3

    def test_assign_covers_and_ties_low(self, ray_session):
        import ray.data as rd
        tbl = _corpus(n=200, seed=5)
        ds = rd.from_arrow(tbl)
        c6, _, _ = kmeans_lloyd(ds, n_clusters=4, iters=2)
        out = kmeans_assign(ds, c6).take_all()
        assert len(out) == 200
        assert set(r['cluster'] for r in out) <= set(range(4))
        # tie rule: a vector EXACTLY on a centroid shared by a duplicate
        # centroid row must pick the lowest index
        dup = np.vstack([c6[0], c6[0]])
        a, _ = _assign6(c6[0][None, :], dup)
        assert a[0] == 0
