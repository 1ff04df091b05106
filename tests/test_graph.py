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


def _pr(edges, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import pagerank
    tbl = pa.table({'src': pa.array([a for a, _ in edges], pa.int64()),
                    'dst': pa.array([b for _, b in edges], pa.int64())})
    out = pagerank(rd.from_arrow(tbl), num_buckets=4, **kw).to_pandas()
    return dict(zip(out['node'], out['rank']))


def _pr_float_oracle(edges, iters=20, d=0.85):
    """Straight-line float power iteration (dangling mass uniform)."""
    nodes = sorted({n for e in edges for n in e})
    ix = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[ix[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.zeros(n)
        for a, b in edges:
            nr[ix[b]] += r[ix[a]] / out[ix[a]]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (nr + dang / n)
    return {nd: r[ix[nd]] for nd in nodes}


class TestPageRank:
    def test_matches_float_power_iteration(self, ray_session):
        rng = np.random.default_rng(7)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 40, size=(120, 2)) if a != b]
        got = _pr(edges)
        want = _pr_float_oracle(edges)
        for nd, r in want.items():
            # fixed-point quantum 1e-9; floor leak << 1e-6
            assert abs(got[nd] - r) < 1e-5, nd

    def test_mass_conserved_with_dangling(self, ray_session):
        # node 3 is dangling (no out-edges) — its mass redistributes
        got = _pr([(1, 2), (2, 3), (1, 3)])
        assert abs(sum(got.values()) - 1.0) < 1e-6
        assert got[3] > got[2] > got[1]

    def test_edge_order_invariance(self, ray_session):
        rng = np.random.default_rng(11)
        edges = [(int(a), int(b)) for a, b in
                 rng.integers(0, 30, size=(80, 2)) if a != b]
        got = _pr(edges)
        perm = [edges[i] for i in rng.permutation(len(edges))]
        assert _pr(perm) == got     # EXACT equality — integer math

    def test_distributed_path_matches_local(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
        local = _pr(edges, iters=5)
        dist = _pr(edges, iters=5, local_edges_max=0)
        assert dist == local        # byte-identical fixed-point paths


def _tri(edges, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import triangle_counts
    tbl = pa.table({'a': pa.array([min(e) for e in edges], pa.int64()),
                    'b': pa.array([max(e) for e in edges], pa.int64())})
    out = triangle_counts(rd.from_arrow(tbl), num_buckets=4,
                          edges_schema=tbl.schema, **kw).to_pandas()
    if len(out) == 0:       # all-empty Dataset drops columns (CLAUDE.md)
        return {}
    return dict(zip(out['node'], out['n_triangles']))


def _tri_brute(edges):
    from itertools import combinations
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


class TestTriangleCounts:
    def test_k4_plus_pendant(self, ray_session):
        # K4: 4 triangles, every node in 3; pendant node 9 in none
        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
        got = _tri(k4)
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_triangle_free_graph_empty(self, ray_session):
        # a 4-cycle plus a chain: wedges exist, no triangle closes
        got = _tri([(1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (5, 6)])
        assert got == {}

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(33)
        edges = {(min(int(a), int(b)), max(int(a), int(b)))
                 for a, b in rng.integers(0, 25, size=(120, 2)) if a != b}
        edges = sorted(edges)
        assert _tri(edges) == _tri_brute(edges)

    def test_edge_order_invariance(self, ray_session):
        rng = np.random.default_rng(5)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 18, size=(60, 2))
                        if a != b})
        got = _tri(edges)
        perm = [edges[i] for i in rng.permutation(len(edges))]
        assert _tri(perm) == got

    def test_hub_star_no_wedge_blowup(self, ray_session):
        # star K1,50 + one closing edge: degree orientation points all
        # star edges INTO the hub, so only the closed pair pairs up
        edges = [(0, i) for i in range(1, 51)] + [(1, 2)]
        got = _tri(edges)
        assert got == {0: 1, 1: 1, 2: 1}

    def test_distributed_path_matches_local(self, ray_session):
        rng = np.random.default_rng(41)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 30, size=(150, 2))
                        if a != b})
        local = _tri(edges)
        dist = _tri(edges, local_edges_max=0)
        assert dist == local and local == _tri_brute(edges)


def _kcore(edges, k, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import k_core
    tbl = pa.table({'a': pa.array([min(e) for e in edges], pa.int64()),
                    'b': pa.array([max(e) for e in edges], pa.int64())})
    out = k_core(rd.from_arrow(tbl), k, num_buckets=4,
                 edges_schema=tbl.schema, **kw).to_pandas()
    if len(out) == 0:
        return {}
    return dict(zip(out['node'], out['deg']))


def _kcore_brute(edges, k):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


class TestKCore:
    def test_clique_with_tail(self, ray_session):
        # K4 survives the 3-core; the pendant chain peels away entirely
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 5), (5, 6), (6, 7)]
        assert _kcore(edges, 3) == {1: 3, 2: 3, 3: 3, 4: 3}
        # the 2-core is just the clique too (the chain has degree-1 ends
        # that unravel it completely)
        assert _kcore(edges, 2) == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_everything_peels(self, ray_session):
        assert _kcore([(1, 2), (2, 3), (3, 4)], 2) == {}

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(13)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 30, size=(140, 2))
                        if a != b})
        for k in (2, 3, 4):
            assert _kcore(edges, k) == _kcore_brute(edges, k), k

    def test_distributed_path_matches_local(self, ray_session):
        rng = np.random.default_rng(19)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 20, size=(80, 2))
                        if a != b})
        local = _kcore(edges, 3)
        dist = _kcore(edges, 3, local_edges_max=0)
        assert dist == local and local == _kcore_brute(edges, 3)

    def test_max_iters_warns(self, ray_session):
        # a long path at k=2 peels two ends per round: max_iters=1
        # cannot reach the (empty) fixpoint -> RuntimeWarning
        import warnings
        edges = [(i, i + 1) for i in range(20)]
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter('always')
            _kcore(edges, 2, local_edges_max=0, max_iters=1)
        assert any('no fixpoint' in str(w.message) for w in caught
                   if issubclass(w.category, RuntimeWarning))


def _lpa(edges, iters=10, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import label_propagation
    tbl = pa.table({'a': pa.array([e[0] for e in edges], pa.int64()),
                    'b': pa.array([e[1] for e in edges], pa.int64())})
    out = label_propagation(rd.from_arrow(tbl), iters=iters,
                            num_buckets=4, **kw).take_all()
    return {r['node']: r['community'] for r in out}


def _lpa_brute(edges, iters=10):
    """Reference synchronous LPA: majority neighbor label, ties to the
    smallest label, all nodes updated simultaneously."""
    from collections import Counter
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {v: v for v in nbrs}
    for _ in range(iters):
        new = {}
        for v, ns in nbrs.items():
            c = Counter(lab[u] for u in ns)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties to the SMALLEST label: max on (count, -label)
            new[v] = best[0]
        if new == lab:
            break
        lab = new
    return lab


class TestLPA:
    def test_two_cliques_bridge(self, ray_session):
        import itertools
        E = (list(itertools.combinations(range(0, 5), 2))
             + list(itertools.combinations(range(10, 15), 2))
             + [(4, 10)])
        out = _lpa(E)
        assert out == _lpa_brute(E)
        assert len(set(out.values())) == 2

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(23)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 40, size=(160, 2))
                        if a != b})
        assert _lpa(edges) == _lpa_brute(edges)

    def test_distributed_matches_local_and_order(self, ray_session):
        rng = np.random.default_rng(31)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 25, size=(90, 2))
                        if a != b})
        local = _lpa(edges)
        dist = _lpa(edges, local_edges_max=0)
        perm = [edges[i] for i in rng.permutation(len(edges))]
        shuf = _lpa(perm, local_edges_max=0)
        assert dist == local == shuf == _lpa_brute(edges)

    def test_oscillation_is_deterministic(self, ray_session):
        # a single edge oscillates under synchronous updates; a fixed
        # round count keeps the result a pure function of the input
        E = [(1, 2)]
        assert _lpa(E, iters=10) == _lpa(E, iters=10)
        assert _lpa(E, iters=10) == _lpa_brute(E, iters=10)


def _dbscan(edges, nodes, min_pts=3, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import dbscan_from_edges
    et = pa.table({'a': pa.array([e[0] for e in edges], pa.int64()),
                   'b': pa.array([e[1] for e in edges], pa.int64())})
    nt = pa.table({'node': pa.array(sorted(nodes), pa.int64())})
    out = dbscan_from_edges(rd.from_arrow(et), rd.from_arrow(nt),
                            min_pts=min_pts, num_buckets=4,
                            **kw).take_all()
    return {r['node']: (r['role'], r['cluster']) for r in out}


def _dbscan_brute(edges, nodes, min_pts=3):
    nbrs = {v: set() for v in nodes}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    core = {v for v in nodes if len(nbrs[v]) + 1 >= min_pts}
    # min-label components over core-core edges
    lab = {v: v for v in core}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            if a in core and b in core:
                m = min(lab[a], lab[b])
                if lab[a] != m or lab[b] != m:
                    lab[a] = lab[b] = m
                    changed = True
    out = {}
    for v in sorted(nodes):
        if v in core:
            out[v] = (0, lab[v])
        else:
            cl = [lab[u] for u in nbrs[v] if u in core]
            out[v] = (1, min(cl)) if cl else (2, -1)
    return out


class TestDBSCAN:
    def test_two_blobs_bridge_noise(self, ray_session):
        import itertools
        blob1 = list(itertools.combinations(range(0, 4), 2))
        blob2 = list(itertools.combinations(range(10, 14), 2))
        E = blob1 + blob2 + [(3, 20), (20, 10)]   # 20: thin bridge
        nodes = set(range(0, 4)) | set(range(10, 14)) | {20, 99}
        # min_pts=4: K4 members have deg+1 >= 4 (core); the bridge node
        # has deg 2 -> border, so the blobs stay separate clusters
        got = _dbscan(E, nodes, min_pts=4)
        exp = _dbscan_brute(E, nodes, min_pts=4)
        assert got == exp
        assert got[99] == (2, -1)                 # isolated -> noise
        assert got[20][0] == 1                    # bridge -> border
        assert got[20][1] == 0                    # min core cluster
        assert len({c for r, c in got.values() if r == 0}) == 2

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.default_rng(41)
        nodes = set(range(40))
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 40, size=(100, 2))
                        if a != b})
        for mp in (2, 3, 5):
            assert _dbscan(edges, nodes, mp) == \
                _dbscan_brute(edges, nodes, mp), mp

    def test_distributed_matches_local(self, ray_session):
        rng = np.random.default_rng(43)
        nodes = set(range(30))
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 30, size=(80, 2))
                        if a != b})
        loc = _dbscan(edges, nodes, 3)
        dist = _dbscan(edges, nodes, 3, local_edges_max=0)
        assert dist == loc == _dbscan_brute(edges, nodes, 3)

    def test_isolated_core_singleton(self, ray_session):
        # min_pts=1: every node is core, even isolated ones
        got = _dbscan([(1, 2)], {1, 2, 5}, min_pts=1)
        assert got == {1: (0, 1), 2: (0, 1), 5: (0, 5)}


def _bfs(edges, seeds, max_hops=10, **kw):
    import ray.data as rd
    from trafaret_ray.stages.graph import bfs_hops
    et = pa.table({'a': pa.array([e[0] for e in edges], pa.int64()),
                   'b': pa.array([e[1] for e in edges], pa.int64())})
    out = bfs_hops(rd.from_arrow(et), np.array(seeds, np.int64),
                   max_hops=max_hops, num_buckets=4, **kw).take_all()
    return {r['node']: r['hops'] for r in out}


def _bfs_brute(edges, seeds, max_hops=10):
    from collections import deque
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= max_hops:
            continue
        for u in nbrs.get(v, []):
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


class TestBFS:
    def test_path_graph(self, ray_session):
        E = [(i, i + 1) for i in range(6)]
        assert _bfs(E, [0], max_hops=3) == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_multi_source_random(self, ray_session):
        rng = np.random.default_rng(51)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 35, size=(90, 2))
                        if a != b})
        seeds = [0, 7, 19]
        assert _bfs(edges, seeds) == _bfs_brute(edges, seeds)

    def test_distributed_matches_local(self, ray_session):
        rng = np.random.default_rng(53)
        edges = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.integers(0, 25, size=(60, 2))
                        if a != b})
        loc = _bfs(edges, [1, 4], max_hops=4)
        dist = _bfs(edges, [1, 4], max_hops=4, local_edges_max=0)
        assert dist == loc == _bfs_brute(edges, [1, 4], max_hops=4)

    def test_isolated_seed(self, ray_session):
        assert _bfs([(1, 2)], [99]) == {99: 0}


    def test_duplicate_universe_rows(self, ray_session):
        # a raw endpoint-explode universe (dup node rows) must not
        # duplicate output rows on either path
        import ray.data as rd
        from trafaret_ray.stages.graph import dbscan_from_edges
        et = pa.table({'a': pa.array([1, 2, 3], pa.int64()),
                       'b': pa.array([2, 3, 1], pa.int64())})
        nt = pa.table({'node': pa.array([1, 1, 2, 2, 3, 3, 9],
                                        pa.int64())})
        exp = [(1, 0, 1), (2, 0, 1), (3, 0, 1), (9, 2, -1)]
        for lem in (10**9, 0):
            out = dbscan_from_edges(
                rd.from_arrow(et), rd.from_arrow(nt), min_pts=3,
                num_buckets=4, local_edges_max=lem).take_all()
            got = sorted((r['node'], r['role'], r['cluster'])
                         for r in out)
            assert got == exp, lem
