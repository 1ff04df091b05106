"""Graph-family endurance run: CC / PageRank / triangles at 1M+ edges.

Generates a deterministic Zipf-skewed (hub-heavy) undirected simple
graph — the degenerate stressor for triangle counting: a hub whose
edges pair up would expand deg^2 wedges, so this probe is what
demonstrates the degree-ordered orientation's O(m^1.5) bound actually
holding. Writes edges.parquet under /tmp, then streams the graph
stages end-to-end. ``local_edges_max=0`` forces the DISTRIBUTED paths
(the sf-scale suite always takes the one-task fast path).

One JSON line of per-path seconds + edges/s.

Usage: PYTHONPATH=/root/repo python tools/graph_endurance.py [n_edges]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(path: str, n_edges: int, seed: int = 17) -> int:
    """Zipf(1.3) endpoint graph, deduped, self-loops dropped, a < b.
    Hub collisions under Zipf repeat the same pair massively, so draw
    in rounds until ``n_edges`` UNIQUE edges accumulate."""
    rng = np.random.default_rng(seed)
    n_nodes = max(100, n_edges // 5)
    keys = np.empty(0, dtype=np.int64)
    for _ in range(12):
        raw = rng.zipf(1.3, size=(n_edges, 2))
        raw = np.minimum(raw - 1, n_nodes - 1).astype(np.int64)
        a = np.minimum(raw[:, 0], raw[:, 1])
        b = np.maximum(raw[:, 0], raw[:, 1])
        k = (a * np.int64(n_nodes) + b)[a != b]
        keys = np.unique(np.concatenate([keys, k]))
        if len(keys) >= n_edges:
            break
    keys = keys[:n_edges]
    pq.write_table(pa.table({'a': pa.array(keys // n_nodes),
                             'b': pa.array(keys % n_nodes)}),
                   path, row_group_size=1 << 18)
    return len(keys)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = f'/tmp/graph_endurance_{n_edges}'
    os.makedirs(d, exist_ok=True)
    path = f'{d}/edges.parquet'
    if not os.path.exists(path):
        t0 = time.time()
        m = generate(path, n_edges)
        print(f'generated {m} edges in {time.time()-t0:.1f}s '
              f'({os.path.getsize(path)>>20} MiB)', file=sys.stderr)

    import ray
    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, '/root/repo')
    import bench
    bench._tune(DataContext.get_current())

    import ray.data as rd

    from trafaret_ray.stages.graph import (bfs_hops, connected_components,
                                           dbscan_from_edges, k_core,
                                           label_propagation, pagerank,
                                           triangle_counts)

    edges = rd.read_parquet(path)
    m = edges.count()
    out = {'n_edges': m, 'mib': os.path.getsize(path) >> 20}

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({'src': t.column('a'), 'dst': t.column('b')})

    sd = edges.map_batches(rename, batch_format='pyarrow')

    t0 = time.time()
    cc = connected_components(sd, num_buckets=16, local_edges_max=0)
    n_comp = cc.map_batches(
        lambda t: pa.table({'c': t.column('component')}),
        batch_format='pyarrow').unique('c')
    out['cc_sec'] = round(time.time() - t0, 2)
    out['cc_components'] = len(n_comp)
    out['cc_edges_per_sec'] = int(m / out['cc_sec'])

    t0 = time.time()
    pr = pagerank(sd, iters=10, num_buckets=16, local_edges_max=0)
    out['pagerank_nodes'] = pr.count()
    out['pagerank_sec'] = round(time.time() - t0, 2)
    out['pagerank_edges_per_sec'] = int(m * 10 / out['pagerank_sec'])

    t0 = time.time()
    tri = triangle_counts(edges, num_buckets=16, local_edges_max=0)
    tot = tri.map_batches(
        lambda t: pa.table({'s': pa.array(
            [t.column('n_triangles').to_numpy(
                zero_copy_only=False).sum()], type=pa.int64())}),
        batch_format='pyarrow').sum('s')
    out['tri_sec'] = round(time.time() - t0, 2)
    out['tri_total'] = int((tot or 0) // 3)
    out['tri_edges_per_sec'] = int(m / out['tri_sec'])

    t0 = time.time()
    core = k_core(edges, k=8, num_buckets=16, local_edges_max=0)
    out['kcore_nodes'] = core.count()
    out['kcore_sec'] = round(time.time() - t0, 2)
    out['kcore_edges_per_sec'] = int(m / out['kcore_sec'])

    t0 = time.time()
    lpa = label_propagation(edges, iters=5, num_buckets=16,
                            local_edges_max=0)
    n_comm = lpa.map_batches(
        lambda t: pa.table({'c': t.column('community')}),
        batch_format='pyarrow').unique('c')
    out['lpa_sec'] = round(time.time() - t0, 2)
    out['lpa_communities'] = len(n_comm)
    out['lpa_edges_per_sec'] = int(m * 5 / out['lpa_sec'])

    t0 = time.time()
    seeds = np.arange(16, dtype=np.int64)
    hops = bfs_hops(edges, seeds, max_hops=8, num_buckets=16,
                    local_edges_max=0)
    out['bfs_nodes'] = hops.count()
    out['bfs_sec'] = round(time.time() - t0, 2)
    out['bfs_edges_per_sec'] = int(m / out['bfs_sec'])

    t0 = time.time()
    nodes_ds = edges.map_batches(
        lambda t: pa.table({'node': pa.concat_arrays(
            [t.column('a').combine_chunks(),
             t.column('b').combine_chunks()])}),
        batch_format='pyarrow').materialize()
    db = dbscan_from_edges(edges, nodes_ds, min_pts=8, num_buckets=16,
                           local_edges_max=0)
    core_n = db.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column('role'), 0)),
        batch_format='pyarrow').count()
    out['dbscan_core_nodes'] = core_n
    out['dbscan_sec'] = round(time.time() - t0, 2)
    out['dbscan_edges_per_sec'] = int(m / out['dbscan_sec'])

    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
