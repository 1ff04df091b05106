"""Distributed connected components (min-label propagation)."""

import numpy as np
import pyarrow as pa


def _cc(edges, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import connected_components
    tbl = pa.table({'src': pa.array([a for a, _ in edges], pa.int64()),
                    'dst': pa.array([b for _, b in edges], pa.int64())})
    out = connected_components(rd.from_arrow(tbl), num_buckets=4,
                               **kw).to_pandas()
    return dict(zip(out['node'], out['component']))


class TestConnectedComponents:
    def test_two_cliques(self, ray_session):
        comp = _cc([(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == comp[12] == 10

    def test_chain_diameter(self, ray_session):
        # a 7-node chain needs ~diameter iterations to converge
        comp = _cc([(i, i + 1) for i in range(5, 11)])
        assert all(comp[i] == 5 for i in range(5, 12))

    def test_matches_union_find_on_random_graph(self, ray_session):
        rng = np.random.default_rng(21)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 60, size=(80, 2)) if a != b]
        comp = _cc(edges)
        # straight-line union-find oracle
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for n, c in comp.items():
            assert find(n) == c, n

    def test_distributed_path_matches_local(self, ray_session):
        # local_edges_max=0 forces the iterative propagation path; both
        # paths must emit the identical min-node labeling
        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 40, size=(60, 2)) if a != b]
        assert _cc(edges) == _cc(edges, local_edges_max=0)

    def test_distributed_chain(self, ray_session):
        # diameter > 1 on the distributed path (multi-round convergence)
        comp = _cc([(i, i + 1) for i in range(5, 11)],
                   local_edges_max=0)
        assert all(comp[i] == 5 for i in range(5, 12))

    def test_unconverged_warns(self, ray_session):
        # a chain longer than max_iters can propagate must WARN instead
        # of silently returning split components (ADVICE r2)
        import warnings

        import ray.data as rd
        from trafaret_ray.stages.graph import connected_components
        edges = [(i, i + 1) for i in range(0, 30)]
        tbl = pa.table({'src': pa.array([a for a, _ in edges], pa.int64()),
                        'dst': pa.array([b for _, b in edges], pa.int64())})
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter('always')
            connected_components(rd.from_arrow(tbl), num_buckets=2,
                                 max_iters=1, local_edges_max=0)\
                .materialize()
        assert any('no fixpoint' in str(w.message) for w in caught
                   if issubclass(w.category, RuntimeWarning))
