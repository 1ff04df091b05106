"""SemDeDup scale probe: exact-integer k-means + within-cluster cosine
dedup over a clustered vector corpus with planted near-copies.

Usage: PYTHONPATH=/root/repo python tools/semdedup_endurance.py [n_vecs]
(default 200_000). Prints ONE JSON line: wall, vecs/s, planted recall
(every planted copy must land in its source's group with exactly one
keep), and the max cluster size the O(B^2) scan paid for."""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_GROUPS = 256
N_PLANT = 2000


def generate(path: str, n: int, seed: int = 11,
             chunk: int = 100_000) -> None:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_GROUPS, DIM)) * 4

    def table(ids, rows):
        return pa.table({
            'vec_id': pa.array(ids, pa.int64()),
            'embedding': pa.FixedSizeListArray.from_arrays(
                pa.array(rows.astype(np.float64).reshape(-1)),
                DIM).cast(pa.list_(pa.float64())),
        })

    first_rows = None
    with pq.ParquetWriter(path, pa.schema([
            ('vec_id', pa.int64()),
            ('embedding', pa.list_(pa.float64()))])) as w:
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            rows = (centers[rng.integers(0, N_GROUPS, m)]
                    + rng.standard_normal((m, DIM)))
            if lo == 0:
                first_rows = rows[:N_PLANT].copy()
            w.write_table(table(np.arange(lo, lo + m), rows),
                          row_group_size=25_000)
        # planted near-copies of the first N_PLANT vectors: cosine to
        # the source ≈ 0.9999 — far above any natural pair
        copies = first_rows + rng.standard_normal(
            (N_PLANT, DIM)) * 0.005
        w.write_table(table(np.arange(n, n + N_PLANT), copies))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    path = f'/tmp/trafaret_ray_semdedup_{n}.parquet'
    if not os.path.exists(path):
        generate(path, n)

    import ray
    import ray.data as rd
    ray.init(address='local', num_cpus=32, include_dashboard=False,
             logging_level='ERROR')
    from bench import _tune
    from ray.data.context import DataContext
    _tune(DataContext.get_current())
    from trafaret_ray.stages.dedup import semdedup

    ds = rd.read_parquet(path)
    total = n + N_PLANT
    # default: the operator's own 'auto' policy (k scales with the
    # corpus inside semdedup — the probe passes NO manual knob);
    # GRAFT_SEMDEDUP_K overrides to measure the fixed-k O(B^2) cost
    k_env = os.environ.get('GRAFT_SEMDEDUP_K')
    n_clusters = int(k_env) if k_env else 'auto'
    t0 = time.time()
    out = semdedup(ds, 'embedding', 'vec_id', n_clusters=n_clusters,
                   iters=4, threshold=0.99, num_buckets=64,
                   cluster_rows_max=200_000).materialize()
    wall = round(time.time() - t0, 2)

    df = out.to_pandas()
    plant = df[df['vec_id'] >= n].reset_index(drop=True)
    src_group = df.set_index('vec_id')['group']
    # planted copy must share its source's group
    recall = float((plant['group'].to_numpy()
                    == src_group.loc[plant['vec_id'] - n].to_numpy())
                   .mean()) if len(plant) else None
    grp_sizes = df.groupby('group').size()
    keeps = df.groupby('group')['keep'].sum()
    out_line = {
        'n_vecs': total, 'wall_sec': wall,
        'vecs_per_sec': int(total / wall),
        'planted': len(plant), 'planted_recall': round(recall, 4),
        'one_keep_per_group': bool((keeps == 1).all()),
        'max_cluster': int(df.groupby('cluster').size().max()),
        'dup_groups': int((grp_sizes >= 2).sum()),
    }
    print(json.dumps(out_line))
    ray.shutdown()


if __name__ == '__main__':
    main()
