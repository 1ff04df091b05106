"""Vector-corpus endurance run: the ANN family at ~500k x 64d.

Generates a deterministic clustered-gaussian embedding corpus shaped
like the driver's embeddings table (list<float32>[64] + int64 ids,
scaled up), writes multi-row-group parquet under /tmp, then runs each
search path end-to-end, printing one JSON line of throughputs and
recalls vs the exact scan. Nothing materializes driver-side in the
measured paths except the k-row results.

Usage: PYTHONPATH=/root/repo python tools/ann_endurance.py [n_vecs]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_GROUPS = 256


def generate(path: str, n: int, seed: int = 5,
             chunk: int = 100_000) -> np.ndarray:
    """Write the corpus; return the query matrix. Each query gets 12
    PLANTED near neighbors (query + 0.25·noise vs 1.0 cluster noise) so
    recall measures finding GENUINELY-similar items — the similarity-
    search product case — not breaking noise-level ties between a tight
    cluster's ~n/256 interchangeable members, which no fixed-size code
    can rank and no application needs ranked."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_GROUPS, DIM)) * 4
    queries = centers[:4] + rng.standard_normal((4, DIM)) * 0.5

    def table(ids, rows):
        return pa.table({
            'vec_id': pa.array(ids, pa.int64()),
            'embedding': pa.FixedSizeListArray.from_arrays(
                pa.array(rows.astype(np.float32).reshape(-1)),
                DIM).cast(pa.list_(pa.float32())),
        })

    with pq.ParquetWriter(path, pa.schema([
            ('vec_id', pa.int64()),
            ('embedding', pa.list_(pa.float32()))])) as w:
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            rows = (centers[rng.integers(0, N_GROUPS, m)]
                    + rng.standard_normal((m, DIM)))
            w.write_table(table(np.arange(lo, lo + m), rows),
                          row_group_size=25_000)
        planted = np.repeat(queries, 12, axis=0) \
            + rng.standard_normal((4 * 12, DIM)) * 0.25
        w.write_table(table(np.arange(n, n + 4 * 12), planted))
    return queries


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    path = f'/tmp/ann_endurance_{n}.parquet'
    queries = generate(path, n) if not os.path.exists(path) else \
        generate(path + '.probe', 1)  # regenerate queries only
    if os.path.exists(path + '.probe'):
        os.remove(path + '.probe')
    print(f'corpus {os.path.getsize(path)>>20} MiB', file=sys.stderr)

    import ray
    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, logging_level='ERROR')
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from trafaret_ray.stages.aggregate import global_topk
    from trafaret_ray.stages.ann import (cosine_topk_rows, ivf_build,
                                         ivf_search, ivfpq_build,
                                         ivfpq_search, pq_encode,
                                         pq_search, pq_train,
                                         _batch_matrix,
                                         drop_null_vectors, kmeans_lloyd)

    out = {'n_vecs': n, 'dim': DIM,
           'mib': os.path.getsize(path) >> 20}
    K = 10

    def read():
        return rd.read_parquet(path)

    def brute(q):
        def topk_batch(tbl):
            tbl = drop_null_vectors(tbl, 'embedding')
            if tbl.num_rows == 0:
                return pa.table({'vec_id': pa.array([], pa.int64()),
                                 'cos_sim': pa.array([], pa.float64())})
            mat = _batch_matrix(tbl, 'embedding')
            sims = (mat @ q) / (np.linalg.norm(mat, axis=1)
                                * np.linalg.norm(q))
            ids = tbl.column('vec_id').combine_chunks().to_numpy(
                zero_copy_only=False)
            ti, ts = cosine_topk_rows(ids, sims, K)
            return pa.table({'vec_id': pa.array(ti),
                             'cos_sim': pa.array(ts, pa.float64())})
        c = read().map_batches(topk_batch, batch_format='pyarrow',
                               zero_copy_batch=True)
        return global_topk(c, [('cos_sim', 'descending'),
                               ('vec_id', 'ascending')], K)

    # exact scan: ground truth + throughput baseline
    t0 = time.time()
    exact = [set(brute(q).to_pandas()['vec_id']) for q in queries]
    dt = time.time() - t0
    out['brute_sec_per_query'] = round(dt / len(queries), 2)
    out['brute_vecs_per_sec'] = int(n * len(queries) / dt)

    def recall(res_sets):
        return round(float(np.mean([
            len(a & b) / K for a, b in zip(res_sets, exact)])), 3)

    # IVF: ON-DISK build once (hive-partitioned by centroid), then
    # pruned-probe searches that read only 8/64 clusters' files
    idx_dir = f'/tmp/ann_endurance_ivf_{n}'
    t0 = time.time()
    ivf_build(read(), idx_dir, n_clusters=64, sample_size=4096)
    out['ivf_build_sec'] = round(time.time() - t0, 2)
    t0 = time.time()
    ivf = [set(ivf_search(idx_dir, q, k=K, nprobe=8)
               .to_pandas()['vec_id']) for q in queries]
    dt = time.time() - t0
    out['ivf_sec_per_query'] = round(dt / len(queries), 2)
    out['ivf_recall'] = recall(ivf)

    # PQ: one build (train+encode, amortized over every later query),
    # ADC searches over the materialized code column, then the same
    # with a top-100 exact rerank (the production recipe)
    t0 = time.time()
    books = pq_train(read(), m=16, ks=256, sample_size=4096)
    codes = pq_encode(read(), books).materialize()
    build = time.time() - t0
    out['pq_build_sec'] = round(build, 2)
    out['pq_encode_vecs_per_sec'] = int(n / build)
    t0 = time.time()
    pqr = [set(pq_search(codes, books, q, k=K)
               .to_pandas()['vec_id']) for q in queries]
    dt = time.time() - t0
    out['pq_sec_per_query'] = round(dt / len(queries), 2)
    out['pq_vecs_per_sec'] = int(n * len(queries) / dt)
    out['pq_recall'] = recall(pqr)
    t0 = time.time()
    corpus = read().materialize()
    pqrr = [set(pq_search(codes, books, q, k=K, rerank=100,
                          rerank_ds=corpus).to_pandas()['vec_id'])
            for q in queries]
    dt = time.time() - t0
    out['pq_rerank_sec_per_query'] = round(dt / len(queries), 2)
    out['pq_rerank_recall'] = recall(pqrr)

    # IVF-PQ: build once, probed ADC searches, with + without rerank
    t0 = time.time()
    index = ivfpq_build(read(), n_clusters=64, m=16, ks=256,
                        sample_size=4096)
    out['ivfpq_build_sec'] = round(time.time() - t0, 2)
    t0 = time.time()
    ivfpq = [set(ivfpq_search(index, q, k=K, nprobe=8)
                 .to_pandas()['vec_id']) for q in queries]
    dt = time.time() - t0
    out['ivfpq_sec_per_query'] = round(dt / len(queries), 2)
    out['ivfpq_recall'] = recall(ivfpq)
    t0 = time.time()
    ivfpqr = [set(ivfpq_search(index, q, k=K, nprobe=8, rerank=100)
                  .to_pandas()['vec_id']) for q in queries]
    dt = time.time() - t0
    out['ivfpq_rerank_sec_per_query'] = round(dt / len(queries), 2)
    out['ivfpq_rerank_recall'] = recall(ivfpqr)

    # full-table distributed Lloyd (exact-integer path, forced
    # distributed loop): clustering throughput over every vector
    t0 = time.time()
    c6, sizes, inertia = kmeans_lloyd(read(), n_clusters=16, iters=5,
                                      local_rows_max=0)
    dt = time.time() - t0
    out['kmeans_sec'] = round(dt, 2)
    out['kmeans_vecs_per_sec'] = int(n * 5 / dt)
    out['kmeans_nonempty'] = int((sizes > 0).sum())

    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
