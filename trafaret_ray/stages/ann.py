"""Approximate nearest neighbor search: IVF (inverted-file) index.

The scale path for similarity search over an embedding column
(SURVEY.md §2.9): a coarse k-means quantizer is trained on a driver-side
SAMPLE (tiny), centroids broadcast via ``ray.put``, every batch assigns
its vectors vectorized (one matmul), and a query probes only the
``nprobe`` nearest clusters — the corpus scan is pruned to
``nprobe / n_clusters`` of the data, each batch emitting only its local
top-k. With ``nprobe == n_clusters`` the search is EXACT (equals the
brute-force oracle — used by the driver-checked q_ivf_topk); lower
nprobe trades recall for a proportional scan cut (recall asserted in
tests/test_ann.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def drop_null_vectors(tbl: pa.Table, emb_col: str) -> pa.Table:
    """Rows with a NULL embedding cannot enter the vector math — the
    ListArray flatten would silently skip the null slot and MISALIGN the
    matrix against the id column (or crash the reshape). Dropping them
    matches the SQL oracles, whose ``unnest(embedding)`` emits nothing
    for a NULL list. Call before every ``_batch_matrix``."""
    col = tbl.column(emb_col)
    if col.null_count:
        tbl = tbl.filter(pc.is_valid(col))
    return tbl


def _batch_matrix(tbl: pa.Table, emb_col: str) -> np.ndarray:
    la = tbl.column(emb_col).combine_chunks()
    return np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64).reshape(len(la), -1)


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
               seed: int = 0) -> np.ndarray:
    """Plain Lloyd's k-means on a driver-side sample (numpy, determinstic
    seed). Fine for a coarse quantizer: the sample is small and the
    centroids only need to partition space roughly evenly."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = sample[rng.choice(n, size=min(n_clusters, n), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_assign(ds, emb_col: str = 'embedding', n_clusters: int = 64,
               sample_size: int = 4096, iters: int = 10, seed: int = 0):
    """Train the coarse quantizer on a sample and append a ``_centroid``
    column (vectorized assignment per batch). Returns (dataset,
    centroids). At 100 TB: write the assigned dataset partitioned by
    centroid so probes read only their clusters' files."""
    sample_tbl = ds.limit(sample_size).take_batch(sample_size,
                                                  batch_format='pyarrow')
    sample_tbl = drop_null_vectors(sample_tbl, emb_col)
    sample = _batch_matrix(sample_tbl, emb_col)
    cents = kmeans_fit(sample, n_clusters, iters, seed)
    cents_ref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            self.cnorm2 = (self.cents ** 2).sum(axis=1)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            tbl = drop_null_vectors(tbl, emb_col)
            if tbl.num_rows == 0:
                return tbl.append_column('_centroid',
                                         pa.array([], type=pa.int32()))
            mat = _batch_matrix(tbl, emb_col)
            # argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c), vectorized
            scores = self.cnorm2[None, :] - 2.0 * (mat @ self.cents.T)
            assign = scores.argmin(axis=1).astype(np.int32)
            return tbl.append_column('_centroid', pa.array(assign))

    return ds.map_batches(Assign, batch_format='pyarrow',
                          concurrency=2), cents


def ivf_topk(ds, query: np.ndarray, k: int = 10, emb_col: str = 'embedding',
             id_col: str = 'vec_id', n_clusters: int = 64,
             nprobe: int = 8, sample_size: int = 4096, seed: int = 0,
             exclude_ids=()):
    """Cosine top-k for one query via IVF probing: only rows assigned
    to the ``nprobe`` centroids nearest the query are scored (one matmul
    per surviving batch slice); each batch emits its local top-k and a
    global sort+limit finishes. Returns (vec_id, cos_sim) rows."""
    assigned, cents = ivf_assign(ds, emb_col, n_clusters, sample_size,
                                 seed=seed)
    q = np.asarray(query, dtype=np.float64)
    qnorm = np.linalg.norm(q)
    cd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(cd, kind='stable')[:nprobe].astype(np.int32)
    probe_arr = pa.array(probe, type=pa.int32())
    excl = pa.array(list(exclude_ids), type=pa.int64())

    def topk_batch(tbl: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          'cos_sim': pa.array([], pa.float64())})
        tbl = tbl.filter(pc.is_in(tbl.column('_centroid'),
                                  value_set=probe_arr))
        if len(excl):
            tbl = tbl.filter(pc.invert(pc.is_in(tbl.column(id_col),
                                                value_set=excl)))
        if tbl.num_rows == 0:
            return empty
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return empty
        mat = _batch_matrix(tbl, emb_col)
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qnorm)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            id_col: pa.array(top_ids),
            'cos_sim': pa.array(top_sims, type=pa.float64()),
        })

    cands = assigned.map_batches(topk_batch, batch_format='pyarrow')
    from .aggregate import global_topk
    return global_topk(cands, [('cos_sim', 'descending'),
                               (id_col, 'ascending')], k)


def cosine_topk_rows(ids: np.ndarray, sims: np.ndarray, k: int):
    """Per-batch top-k cut under the fixed-point rank discipline
    (CLAUDE.md row-picking rule): rank on int64 micro-units with the id
    as the EXPLICIT tie key — ranking raw doubles would keep tied rows
    by batch position and drop a smaller id the oracle keeps — and emit
    cos_sim = sim6/1e6 so both engines order identical doubles."""
    # NaN sims (zero-norm vectors) must NOT rank: NaN -> INT64_MIN under
    # the cast, and negation wraps INT64_MIN to itself — it would rank
    # FIRST (np.argsort(-sims) used to push NaN last)
    good = ~np.isnan(sims)
    if not good.all():
        ids, sims = ids[good], sims[good]
    sim6 = np.floor(sims * 1e6 + 0.5).astype(np.int64)
    order = np.lexsort((ids, -sim6))[:k]
    return ids[order], sim6[order].astype(np.float64) / 1e6


def ivf_build(ds, index_dir: str, emb_col: str = 'embedding',
              id_col: str = 'vec_id', n_clusters: int = 64,
              sample_size: int = 4096, iters: int = 10, seed: int = 0,
              min_rows_per_file: int = 50_000):
    """Materialize the IVF index ON DISK in the 100-TB layout the probe
    path needs: rows written partitioned by coarse-centroid assignment
    (hive dirs ``_centroid=<c>/`` — a probe then reads ONLY its
    clusters' files, never the corpus) plus the centroid matrix and
    metadata in the index root. Build is one assignment map + one
    partitioned write; no driver materialization.

    ``min_rows_per_file`` coalesces the per-partition fanout: a
    partitioned write otherwise emits one file per (input block x
    centroid) — 64 blocks x 64 dirs = 4096 tiny files whose per-file
    open cost made a probed search SLOWER than the brute scan on the
    500k endurance corpus."""
    import json as _json
    import os

    assigned, cents = ivf_assign(ds, emb_col, n_clusters, sample_size,
                                 iters, seed)
    tmp = index_dir.rstrip('/') + '.__tmp__'
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    assigned.write_parquet(tmp, partition_cols=['_centroid'],
                           min_rows_per_file=min_rows_per_file)
    np.save(os.path.join(tmp, 'centroids.npy'), cents)
    with open(os.path.join(tmp, 'meta.json'), 'w') as f:
        _json.dump({'n_clusters': int(len(cents)), 'emb_col': emb_col,
                    'id_col': id_col, 'dim': int(cents.shape[1])}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return index_dir


def ivf_search(index_dir: str, query: np.ndarray, k: int = 10,
               nprobe: int = 8, exclude_ids=()):
    """Probe an on-disk IVF index: pick the ``nprobe`` centroids nearest
    the query, ``read_parquet`` ONLY those partitions' directories
    (partition pruning at the read — the other clusters' files are never
    opened), score per batch and finish with a global sort+limit.
    Returns a Dataset of (id, cos_sim) rows."""
    import json as _json
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, 'centroids.npy'))
    with open(os.path.join(index_dir, 'meta.json')) as f:
        meta = _json.load(f)
    emb_col, id_col = meta['emb_col'], meta['id_col']
    q = np.asarray(query, dtype=np.float64)
    qnorm = np.linalg.norm(q)
    cd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(cd, kind='stable')[:nprobe]
    dirs = [os.path.join(index_dir, f'_centroid={c}') for c in probe]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith('.parquet')]
    if not files:
        return rd.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             'cos_sim': pa.array([], pa.float64())}))
    ds = rd.read_parquet(files, columns=[id_col, emb_col])
    excl = pa.array(list(exclude_ids), type=pa.int64())

    def topk_batch(tbl: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          'cos_sim': pa.array([], pa.float64())})
        if len(excl):
            tbl = tbl.filter(pc.invert(pc.is_in(tbl.column(id_col),
                                                value_set=excl)))
        if tbl.num_rows == 0:
            return empty
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return empty
        mat = _batch_matrix(tbl, emb_col)
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qnorm)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            id_col: pa.array(top_ids),
            'cos_sim': pa.array(top_sims, type=pa.float64()),
        })

    cands = ds.map_batches(topk_batch, batch_format='pyarrow')
    from .aggregate import global_topk
    return global_topk(cands, [('cos_sim', 'descending'),
                               (id_col, 'ascending')], k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the compressed-domain scan path.
#
# IVF prunes WHICH rows are scanned; PQ shrinks WHAT a scan reads — a
# d-dim float32 vector (d*4 bytes) becomes m uint8 codes (m bytes, 32x
# at d=64/m=8), so a 100-TB embedding corpus scans from ~3 TB of codes
# held in the object store, with asymmetric distance computation (ADC):
# the query stays exact, each row's distance is m table lookups. Public
# technique (Jégou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI 2011). Composable with IVF (encode each
# cluster's residuals) — here the flat variant, the piece IVF lacks.
# ---------------------------------------------------------------------------

_PQ_HASH_KEY = 'feedfacecafebeef'


def _bottomk_sample(ds, emb_col: str, id_col: str, sample_size: int,
                    hash_mode: str = 'pandas'):
    """PERMUTATION-INVARIANT training sample: the ``sample_size`` rows
    with the smallest salted id hashes (a bottom-k sketch — the same
    sample set under ANY row order, partitioning, or parallelism, which
    ``ds.limit()`` is not). The shuffled gate self-compares approximate
    queries against the pristine run byte-for-byte; an order-dependent
    training sample would flip codebooks and fail it by design."""
    import pandas as pd

    def add_h(tbl: pa.Table) -> pa.Table:
        tbl = drop_null_vectors(tbl, emb_col)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        if hash_mode == 'duckdb':
            # DuckDB-parity hash, UNSIGNED ascending order (SQL
            # ORDER BY hash(id)): xor the sign bit so the int64 sort
            # key ascends exactly like the UBIGINT (uint64 columns
            # break round-trips — CLAUDE.md)
            from .sketches import duckdb_hash64
            hv = (duckdb_hash64(ids) ^ np.uint64(1 << 63))\
                .view(np.int64)
        else:
            hv = pd.util.hash_array(
                ids, hash_key=_PQ_HASH_KEY, categorize=False)\
                .view(np.int64)
        return tbl.append_column('_h', pa.array(hv, type=pa.int64()))

    from .aggregate import global_topk
    top = global_topk(
        ds.map_batches(add_h, batch_format='pyarrow',
                       zero_copy_batch=True),
        [('_h', 'ascending'), (id_col, 'ascending')], sample_size)
    batches = list(top.iter_batches(batch_size=None,
                                    batch_format='pyarrow'))
    if not batches:
        return None
    tbl = pa.concat_tables([pa.table(b) for b in batches])
    return tbl if tbl.num_rows else None


def _unit_rows(mat: np.ndarray):
    """L2-normalize rows; zero-norm rows are flagged invalid (they have
    no cosine direction — the exact path's NaN-sim drop, applied before
    the code domain so they can never rank)."""
    norms = np.linalg.norm(mat, axis=1)
    ok = norms > 0
    safe = np.where(ok, norms, 1.0)
    return mat / safe[:, None], ok


def pq_train(ds, emb_col: str = 'embedding', id_col: str = 'vec_id',
             m: int = 8, ks: int = 32, sample_size: int = 1024,
             iters: int = 10, seed: int = 0, hash_mode: str = 'pandas'):
    """Train PQ codebooks on a bottom-k-hash sample: rows are unit-
    normalized (cosine = L2 on the unit sphere), dims split into ``m``
    contiguous subspaces, one small k-means per subspace. Returns a
    (m, ks', d/m) float64 array (ks' <= ks when the sample is small),
    or None on an empty/all-null corpus.

    ``hash_mode='duckdb'`` makes the whole PQ pipeline a deterministic
    function DuckDB recomputes in SQL (the q_pq_topk oracle): the
    sample is bottom-k by the DuckDB-parity id hash, rows micro-
    quantize after unit-normalizing, and the subspace k-means runs the
    kmeans_lloyd exact-int rules (first-ks seeding, argmin ties to the
    smallest code, round-half-up floor-div mean). Returned books are
    INT64 micro-units — the dtype routes pq_encode/pq_search onto
    exact-integer arithmetic."""
    if hash_mode == 'duckdb':
        # drop zero-norm rows BEFORE sampling: the oracle's samp CTE
        # selects from u (WHERE nrm > 0), so a zero vector in the
        # bottom-k would give the two sides different training sets
        # (review finding: reproduced codebook divergence)
        def nonzero(tbl: pa.Table) -> pa.Table:
            tbl = drop_null_vectors(tbl, emb_col)
            if tbl.num_rows == 0:
                return tbl
            mat = _batch_matrix(tbl, emb_col)
            return tbl.filter(pa.array(
                np.linalg.norm(mat, axis=1) > 0))

        ds = ds.map_batches(nonzero, batch_format='pyarrow',
                            zero_copy_batch=True)
    tbl = _bottomk_sample(ds, emb_col, id_col, sample_size,
                          hash_mode=hash_mode)
    if tbl is None:
        return None
    sample = _batch_matrix(tbl, emb_col)
    sample, ok = _unit_rows(sample)
    if hash_mode == 'duckdb':
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)[ok]
        sample = sample[ok]
        if len(sample) == 0:
            return None
        # deterministic SQL-matching order: id ascending; train in
        # exact int64 micro-units (books dtype int64 marks the mode
        # for encode/search)
        order = np.argsort(ids, kind='stable')
        x6 = np.floor(sample[order] * 1e6 + 0.5).astype(np.int64)
        return _train_books_exact(x6, m, ks, iters)
    sample = sample[ok]
    if len(sample) == 0:
        return None
    return _train_books(sample, m, ks, iters, seed)


def _train_books_exact(x6: np.ndarray, m: int, ks: int,
                       iters: int) -> np.ndarray:
    """Per-subspace Lloyd in exact int64 micro-units — the kmeans_lloyd
    rules on a driver-side sample: seeds are the first ``ks`` rows (the
    caller passes rows in id order), assignment is argmin of the exact
    squared distance with ties to the smallest code (np.argmin picks
    the first, i.e. smallest), the mean update is the round-half-up
    floor-div (s + n//2) // n (numerators here are sums of micro
    components — can be negative, so floor via np.floor_divide which
    already floors), and an empty cluster keeps its previous centroid.
    Returns int64 (m, ks', d/m)."""
    n, d = x6.shape
    if d % m:
        raise ValueError(f'dim {d} not divisible by m={m}')
    dsub = d // m
    ks_eff = min(ks, n)
    books = np.empty((m, ks_eff, dsub), dtype=np.int64)
    for j in range(m):
        sub = x6[:, j * dsub:(j + 1) * dsub]
        c = sub[:ks_eff].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for cid in range(ks_eff):
                mask = assign == cid
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                s = sub[mask].sum(axis=0)
                c[cid] = np.floor_divide(s + cnt // 2, cnt)
        books[j] = c
    return books


def _train_books(sample: np.ndarray, m: int, ks: int, iters: int,
                 seed: int) -> np.ndarray:
    """One small k-means per contiguous dim subspace over an already-
    prepared sample matrix (unit rows for flat PQ; coarse-centroid
    residuals for IVF-PQ)."""
    d = sample.shape[1]
    if d % m:
        raise ValueError(f'dim {d} not divisible by m={m}')
    dsub = d // m
    books = [kmeans_fit(sample[:, j * dsub:(j + 1) * dsub].copy(),
                        ks, iters, seed + j) for j in range(m)]
    ks_eff = min(len(b) for b in books)
    return np.stack([b[:ks_eff] for b in books])


def pq_encode(ds, codebooks, emb_col: str = 'embedding',
              id_col: str = 'vec_id'):
    """Corpus -> Dataset of (id, code fixed_size_list<uint8>[m]): one
    small matmul per subspace per batch (argmin over ks centroids),
    codebooks broadcast once via the object store. Zero-norm vectors
    drop (no cosine direction). The code column round-trips parquet, so
    a 100-TB build writes codes once and every later query scans only
    the m-byte column."""
    # closure-captured ObjectRef, ray.get per task: the shared-memory
    # read is zero-copy and the stage stays a TASK pool — an actor pool
    # here would cap encode parallelism at its concurrency (measured
    # 2.8x wall on the 500k-vector endurance probe at concurrency=2)
    exact = np.issubdtype(np.asarray(codebooks).dtype, np.integer)
    books_ref = ray.put(np.asarray(
        codebooks, dtype=np.int64 if exact else np.float64))

    def encode(tbl: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        cn2 = (books ** 2).sum(axis=2)
        m, _ks, dsub = books.shape
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            'code': pa.array([], pa.list_(pa.uint8(), m))})
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return empty
        mat = _batch_matrix(tbl, emb_col)
        mat, ok = _unit_rows(mat)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)[ok]
        mat = mat[ok]
        if len(mat) == 0:
            return empty
        if exact:
            # int64 micro-quantized rows vs int64 books — the argmin
            # is an exact-integer comparison (tie -> smallest code)
            mat = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            if exact:
                # exact-int argmin via ||c||^2 - 2 x.c (the x^2 term is
                # constant per row); int64 matmul, no 3-D blowup
                scores_i = cn2[j][None, :] - 2 * (sub @ books[j].T)
                codes[:, j] = scores_i.argmin(axis=1)
                continue
            # argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c)
            scores = cn2[j][None, :] - 2.0 * (sub @ books[j].T)
            codes[:, j] = scores.argmin(axis=1)
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            'code': pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), m),
        })

    return ds.map_batches(encode, batch_format='pyarrow',
                          zero_copy_batch=True)


def pq_search(codes_ds, codebooks, query: np.ndarray, k: int = 10,
              id_col: str = 'vec_id', exclude_ids=(),
              rerank_ds=None, rerank: int = 0,
              emb_col: str = 'embedding'):
    """ADC top-k over PQ codes: ONE (m, ks) distance table from the
    exact query, each row costs m uint8 lookups + a sum — no float
    vectors are read at all. Approximate cosine = 1 - d2/2 (unit
    sphere); ranking follows the fixed-point discipline (int64
    micro-units, id tiebreak) so results are identical under any
    partitioning. Returns a Dataset of (id, approx_cos) rows.

    ``rerank``/``rerank_ds``: the production recipe — codes can rank a
    SHORTLIST reliably but not the fine order inside a tight cluster
    (every member is within the quantization noise). With rerank=R, the
    ADC pass returns its top-R ids, and ONE pruned pass over
    ``rerank_ds`` (the float corpus; at 100 TB an id-partitioned
    parquet read) scores exactly those R rows with true cosine — the
    heavy scan stays in the code domain, the float read touches R rows.
    Measured on the 500k endurance corpus: recall@10 0.1 -> 0.97 at
    R=100. Output column becomes exact ``cos_sim``."""
    if rerank and rerank_ds is not None:
        shortlist = pq_search(codes_ds, codebooks, query,
                              k=max(rerank, k), id_col=id_col,
                              exclude_ids=exclude_ids)
        return _exact_rerank(rerank_ds, shortlist, query, k,
                             id_col, emb_col)
    exact = np.issubdtype(np.asarray(codebooks).dtype, np.integer)
    books = np.asarray(codebooks,
                       dtype=np.int64 if exact else np.float64)
    m, _ks, dsub = books.shape
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if exact and qn == 0:
        # a zero-norm query has no cosine direction; the oracle's q6
        # CTE (built from the nrm>0-filtered unit rows) is empty, so
        # the exact mode must short-circuit too (review finding)
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            'approx_cos': pa.array([], pa.float64())}))
    if qn > 0:
        q = q / qn
    if exact:
        # int64-books mode (pq_train hash_mode='duckdb'): the query
        # micro-quantizes like every corpus row and the ADC table is
        # exact int64; approx_cos is ONE shared double expression of
        # the integer distance on both engines
        q6 = np.floor(q * 1e6 + 0.5).astype(np.int64)
        table = ((books - q6.reshape(m, 1, dsub)) ** 2).sum(axis=2)
    else:
        # table[j, c] = ||q_j - books[j, c]||^2
        table = ((books - q.reshape(m, 1, dsub)) ** 2).sum(axis=2)
    excl = pa.array(list(exclude_ids), type=pa.int64())
    jidx = np.arange(m)

    def topk_batch(tbl: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          'approx_cos': pa.array([], pa.float64())})
        if len(excl):
            tbl = tbl.filter(pc.invert(pc.is_in(tbl.column(id_col),
                                                value_set=excl)))
        if tbl.num_rows == 0:
            return empty
        la = tbl.column('code').combine_chunks()
        codes = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                           dtype=np.int64).reshape(len(la), m)
        d2 = table[jidx[None, :], codes].sum(axis=1)
        if exact:
            # exact int64 distance in (1e6)^2 units -> the SAME double
            # expression the SQL oracle evaluates; ranking then runs on
            # sim6 micro-units with the id tie key (cosine_topk_rows)
            sims = 1.0 - d2.astype(np.float64) / 2e12
        else:
            sims = 1.0 - d2 / 2.0
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            id_col: pa.array(top_ids),
            'approx_cos': pa.array(top_sims, type=pa.float64()),
        })

    cands = codes_ds.map_batches(topk_batch, batch_format='pyarrow')
    from .aggregate import global_topk
    return global_topk(cands, [('approx_cos', 'descending'),
                               (id_col, 'ascending')], k)


def ivfpq_build(ds, emb_col: str = 'embedding', id_col: str = 'vec_id',
                n_clusters: int = 16, m: int = 8, ks: int = 32,
                sample_size: int = 1024, iters: int = 10, seed: int = 0,
                hash_mode: str = 'pandas'):
    """Build the IVF-PQ index ONCE (amortized over every query): unit-
    normalize the corpus, train the coarse quantizer and the residual
    codebooks on a permutation-invariant bottom-k-hash sample, encode
    every row to (_centroid, m uint8 residual codes). Returns a dict
    index {codes, cents, books, unit} — ``codes`` is a MATERIALIZED
    Dataset (at 100 TB: write_parquet partitioned by _centroid instead,
    the ivf_build layout), ``unit`` the materialized unit corpus for
    optional exact re-ranking. Returns None on an empty corpus."""
    # unit-normalize once: coarse assign, residuals and ADC all live in
    # the same L2-on-the-sphere geometry
    def unit(tbl: pa.Table) -> pa.Table:
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             emb_col: pa.array([], pa.list_(pa.float64()))})
        mat = _batch_matrix(tbl, emb_col)
        mat, ok = _unit_rows(mat)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)[ok]
        mat = mat[ok]
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            emb_col: pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), mat.shape[1] or 1).cast(
                    pa.list_(pa.float64())),
        })

    # the unit corpus feeds three consumers (coarse sample, encode,
    # and the codebook sample) — materialize once
    unit_ds = ds.map_batches(unit, batch_format='pyarrow',
                             zero_copy_batch=True).materialize()
    sample_tbl = _bottomk_sample(unit_ds, emb_col, id_col, sample_size,
                                 hash_mode=hash_mode)
    if sample_tbl is None:
        return None
    sample = _batch_matrix(sample_tbl, emb_col)
    exact = hash_mode == 'duckdb'
    if exact:
        # SQL-recomputable index (the q_ivfpq_topk oracle): sample in
        # id order, micro-quantized; coarse quantizer AND residual
        # codebooks run the kmeans_lloyd exact-int rules (the coarse
        # chain is _train_books_exact with one full-width "subspace");
        # int64 cents/books route encode + search onto exact integers
        sids = sample_tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.argsort(sids, kind='stable')
        s6 = np.floor(sample[order] * 1e6 + 0.5).astype(np.int64)
        cents = _train_books_exact(s6, 1, n_clusters, iters)[0]
        sd6 = ((s6[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        resid6 = s6 - cents[sd6.argmin(axis=1)]
        books = _train_books_exact(resid6, m, ks, iters)
    else:
        cents = kmeans_fit(sample.copy(), n_clusters, iters, seed)
        # residual codebooks from the SAME sample, assigned to its
        # centroid
        sd = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        resid = sample - cents[sd.argmin(axis=1)]
        books = _train_books(resid, m, ks, iters, seed + 101)

    cents_ref = ray.put(cents)
    books_ref = ray.put(books)

    def encode(tbl: pa.Table) -> pa.Table:
        """(id, _centroid, residual uint8 codes) per batch: one coarse
        matmul + m subspace matmuls. Task pool with closure-captured
        refs (zero-copy ray.get per task) — an actor pool would cap
        encode parallelism at its concurrency."""
        cents_ = ray.get(cents_ref)
        books_ = ray.get(books_ref)
        cn2 = (cents_ ** 2).sum(axis=1)
        bn2 = (books_ ** 2).sum(axis=2)
        mm, _ks, dsub = books_.shape
        if tbl.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                '_centroid': pa.array([], pa.int32()),
                'code': pa.array([], pa.list_(pa.uint8(), mm))})
        mat = _batch_matrix(tbl, emb_col)
        if exact:
            # exact-int coarse assign + residual codes (||c||^2 - 2x.c
            # preserves the argmin and its first-index tie rule)
            mat = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        assign = (cn2[None, :]
                  - (2 if exact else 2.0) * (mat @ cents_.T))\
            .argmin(axis=1)
        resid = mat - cents_[assign]
        codes = np.empty((len(mat), mm), dtype=np.uint8)
        for j in range(mm):
            sub = resid[:, j * dsub:(j + 1) * dsub]
            scores = bn2[j][None, :] \
                - (2 if exact else 2.0) * (sub @ books_[j].T)
            codes[:, j] = scores.argmin(axis=1)
        return pa.table({
            id_col: tbl.column(id_col),
            '_centroid': pa.array(assign.astype(np.int32)),
            'code': pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), mm),
        })

    codes_ds = unit_ds.map_batches(encode, batch_format='pyarrow',
                                   zero_copy_batch=True).materialize()
    return {'codes': codes_ds, 'cents': cents, 'books': books,
            'unit': unit_ds, 'emb_col': emb_col, 'id_col': id_col}


def ivfpq_search(index, query: np.ndarray, k: int = 10,
                 nprobe: int = 4, exclude_ids=(), rerank: int = 0):
    """Probe an IVF-PQ index: ONE (nprobe, m, ks) ADC table family from
    the exact query, rows outside the probed clusters filtered before
    any math, each surviving row costs m uint8 lookups. With
    ``rerank=R`` the ADC pass returns a top-R shortlist and one pruned
    float pass scores exactly those R rows with true cosine (the
    production recipe — codes shortlist reliably but cannot rank inside
    a tight cluster where members sit within the quantization noise).
    Returns a Dataset of (id, approx_cos) — or (id, cos_sim) when
    re-ranked."""
    cents, books = index['cents'], index['books']
    id_col = index['id_col']
    if rerank:
        shortlist = ivfpq_search(index, query, k=max(rerank, k),
                                 nprobe=nprobe, exclude_ids=exclude_ids)
        return _exact_rerank(index['unit'], shortlist, query, k,
                             id_col, index['emb_col'])
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      'approx_cos': pa.array([], pa.float64())})
    exact = np.issubdtype(np.asarray(books).dtype, np.integer)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if exact and qn == 0:
        # zero-norm query: no cosine direction, oracle's q rows are
        # empty — short-circuit (review finding, same as pq_search)
        import ray.data as rd
        return rd.from_arrow(empty)
    if qn > 0:
        q = q / qn
    if exact:
        # int64-index mode (ivfpq_build hash_mode='duckdb'): the query
        # micro-quantizes like every corpus row; probe pick, residual
        # and the ADC family are exact integers
        q = np.floor(q * 1e6 + 0.5).astype(np.int64)
    cd = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(cd, kind='stable')[:nprobe])
    # table[p, j, c] = ||(q - cent_p)_j - books[j, c]||^2 — the full
    # probed-cluster ADC family, built once from the exact query
    mm, _kse, dsub = books.shape
    qr = q[None, :] - cents[probe]                      # (P, d)
    qr = qr.reshape(len(probe), mm, 1, dsub)
    table = ((qr - books[None, :, :, :]) ** 2).sum(axis=3)  # (P, m, ks)
    probe_pos = np.full(len(cents), -1, dtype=np.int64)
    probe_pos[probe] = np.arange(len(probe))
    probe_arr = pa.array(probe.astype(np.int32), type=pa.int32())
    excl = pa.array(list(exclude_ids), type=pa.int64())
    jidx = np.arange(mm)

    def topk_batch(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.is_in(tbl.column('_centroid'),
                                  value_set=probe_arr))
        if len(excl):
            tbl = tbl.filter(pc.invert(pc.is_in(tbl.column(id_col),
                                                value_set=excl)))
        if tbl.num_rows == 0:
            return empty
        la = tbl.column('code').combine_chunks()
        codes = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                           dtype=np.int64).reshape(len(la), mm)
        cl = probe_pos[tbl.column('_centroid').combine_chunks()
                       .to_numpy(zero_copy_only=False)]
        d2 = table[cl[:, None], jidx[None, :], codes].sum(axis=1)
        if exact:
            sims = 1.0 - d2.astype(np.float64) / 2e12
        else:
            sims = 1.0 - d2 / 2.0
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            id_col: pa.array(top_ids),
            'approx_cos': pa.array(top_sims, type=pa.float64()),
        })

    cands = index['codes'].map_batches(topk_batch,
                                       batch_format='pyarrow')
    from .aggregate import global_topk
    return global_topk(cands, [('approx_cos', 'descending'),
                               (id_col, 'ascending')], k)


def ivfpq_topk(ds, query: np.ndarray, k: int = 10,
               emb_col: str = 'embedding', id_col: str = 'vec_id',
               n_clusters: int = 16, nprobe: int = 4, m: int = 8,
               ks: int = 32, sample_size: int = 1024, iters: int = 10,
               seed: int = 0, exclude_ids=(), rerank: int = 0,
               hash_mode: str = 'pandas'):
    """IVF-PQ: the standard web-scale vector-index shape (Jégou et al.
    2011; Faiss's IVFPQ) — a coarse quantizer prunes WHICH clusters are
    scanned (IVF) while residual product codes shrink WHAT the scan
    reads (PQ of x - centroid(x), which carries far less variance than
    x itself, so the same code budget quantizes finer). All sampling is
    bottom-k-hash (permutation-invariant: identical output under any
    row order/partitioning — ``ds.limit`` would flip codebooks with
    order); everything runs on the unit sphere so the ADC distance maps
    to cosine (approx_cos = 1 - d2/2). One-shot convenience over
    ivfpq_build + ivfpq_search — repeated queries should build once."""
    index = ivfpq_build(ds, emb_col, id_col, n_clusters, m, ks,
                        sample_size, iters, seed, hash_mode=hash_mode)
    if index is None:
        import ray.data as rd
        return rd.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             'approx_cos': pa.array([], pa.float64())}))
    return ivfpq_search(index, query, k, nprobe, exclude_ids, rerank)


def _exact_rerank(ds, shortlist, query: np.ndarray, k: int,
                  id_col: str, emb_col: str):
    """Score ONLY the shortlist ids with true cosine: the id set is
    tiny (rerank size), broadcast as an Arrow array; one pruned pass
    over the float corpus emits per-batch local top-k."""
    chunks = [b.column(id_col) for b in
              shortlist.iter_batches(batch_size=None,
                                     batch_format='pyarrow')]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      'cos_sim': pa.array([], pa.float64())})
    if not chunks:
        import ray.data as rd
        return rd.from_arrow(empty)
    wanted = pc.unique(pa.concat_arrays(
        [c.combine_chunks().cast(pa.int64()) for c in chunks]))
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)

    def score(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.is_in(tbl.column(id_col),
                                  value_set=wanted))
        if tbl.num_rows == 0:
            return empty
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return empty
        mat = _batch_matrix(tbl, emb_col)
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
        ids = tbl.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            id_col: pa.array(top_ids),
            'cos_sim': pa.array(top_sims, type=pa.float64()),
        })

    cands = ds.map_batches(score, batch_format='pyarrow',
                           zero_copy_batch=True)
    from .aggregate import global_topk
    return global_topk(cands, [('cos_sim', 'descending'),
                               (id_col, 'ascending')], k)


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means (exact integer arithmetic end-to-end)
# ---------------------------------------------------------------------------

_X6_MAX = 3 * 10**8      # |x6| bound: D * x6^2 must stay inside int64


def _matrix6(tbl: pa.Table, emb_col: str) -> np.ndarray:
    """Embedding list column -> (n, D) int64 micro-unit matrix
    (floor(x*1e6 + 0.5)); the fixed-point view under which every k-means
    step below is EXACT integer arithmetic.

    Guard: the assignment's ||x||^2 term is sum_D x6^2 — at D=64 a
    coordinate beyond ~3.8e8 micro-units (|x| ~ 380) would WRAP int64
    and silently poison every centroid, so out-of-range batches raise
    instead (embeddings are unit-ish; rescale before clustering if
    yours are not)."""
    m = _batch_matrix(tbl, emb_col)
    x6 = np.floor(m * 1e6 + 0.5).astype(np.int64)
    if x6.size and np.abs(x6).max() > _X6_MAX:
        raise ValueError(
            'kmeans_lloyd: |coordinate| > 300 overflows the exact '
            'int64 distance arithmetic — rescale the embedding column')
    return x6


def _assign6(x6: np.ndarray, c6: np.ndarray) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """argmin_k sum_d (x6 - c6)^2 with ties to the LOWEST cluster index.

    All int64: coordinates are micro-units (~1e6), so a squared diff is
    <= ~1.6e13 and a D-dim sum <= ~1e15 — far inside int64. Because no
    float ever enters, the assignment is bit-identical under any batch
    boundary, row order or partitioning (argmin on exact ints; numpy
    argmin already takes the first minimum = lowest index).
    Returns (assignment int32, min squared distance int64)."""
    # (n, k, d) diff would be fine at batch sizes used here, but the
    # expansion ||x||^2 - 2 x.c + ||c||^2 stays exact in int64 too and
    # is k*d times smaller: x.c <= d * 1e6 * 1e6 * few ~ 1e14.
    xx = (x6 * x6).sum(axis=1)                      # (n,)
    cc = (c6 * c6).sum(axis=1)                      # (k,)
    d2 = xx[:, None] - 2 * (x6 @ c6.T) + cc[None, :]  # exact int64
    assign = d2.argmin(axis=1).astype(np.int32)
    return assign, d2[np.arange(len(d2)), assign]


def _kmeans_local6(x6: np.ndarray, c6: np.ndarray,
                   iters: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Sequential Lloyd iterations in the same integer arithmetic as the
    distributed path — the parity reference and the single-task fast
    path. Returns (final centroids int64 (k, D), cluster sizes int64
    (k,), inertia int64)."""
    k, d = c6.shape
    sizes = np.zeros(k, dtype=np.int64)
    inertia = 0
    for _ in range(iters):
        assign, mind2 = _assign6(x6, c6)
        s6 = np.zeros((k, d), dtype=np.int64)
        np.add.at(s6, assign, x6)
        sizes = np.bincount(assign, minlength=k).astype(np.int64)
        inertia = int(mind2.sum())
        nz = sizes > 0
        # floor(s/n + 1/2) per coordinate, exact in ints; an EMPTY
        # cluster keeps its previous centroid (standard Lloyd choice)
        c6 = c6.copy()
        c6[nz] = (s6[nz] + sizes[nz, None] // 2) // sizes[nz, None]
    return c6, sizes, inertia


def kmeans_lloyd(ds, emb_col: str = 'embedding', id_col: str = 'vec_id',
                 n_clusters: int | str = 8, iters: int = 5,
                 local_rows_max: int = 200_000,
                 target_cluster_rows: int = 2_000,
                 auto_k_max: int = 65_536):
    """Distributed Lloyd k-means over the FULL dataset (unlike
    ``kmeans_fit``, which trains a coarse quantizer on a driver sample).

    Every step is int64 micro-unit arithmetic — assignment distances,
    partial coordinate sums, and the floor-rounded mean update — so the
    result is EXACTLY reproducible: distributed == single-task ==
    sequential numpy, under any row order or partitioning (pinned in
    tests/test_kmeans.py). Init is the vectors of the ``n_clusters``
    smallest ids (shuffle-invariant, no RNG).

    100-TB shape: the (id, vector) matrix is materialized ONCE (column-
    pruned ints); each iteration is one map_batches pass emitting k*D
    per-batch partial rows (cluster, dim, s6, n) — pre-summed inside the
    batch — merged by a tiny low-cardinality aggregation; centroids
    (k*D ints) live on the driver and are re-broadcast per round via
    ray.put. Inputs <= ``local_rows_max`` rows skip the loop and run all
    iterations in ONE task on the same kernel.

    Returns (centroids int64 (k, D) micro-units, sizes int64 (k,),
    inertia int64 micro^2 units) — inertia is the within-cluster sum of
    squared distances at the LAST assignment.
    """
    from .aggregate import pre_aggregate

    def to_int_rows(tbl: pa.Table) -> pa.Table:
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return pa.table({'_id': pa.array([], pa.int64()),
                             '_x6': pa.array([], pa.list_(pa.int64()))})
        x6 = _matrix6(tbl, emb_col)
        n, d = x6.shape
        return pa.table({
            '_id': tbl.column(id_col).combine_chunks().cast(pa.int64()),
            '_x6': pa.FixedSizeListArray.from_arrays(
                pa.array(x6.reshape(-1)), d).cast(pa.list_(pa.int64())),
        })

    mat = ds.map_batches(to_int_rows, batch_format='pyarrow',
                         zero_copy_batch=True).materialize()
    total = mat.count()
    if total == 0:
        raise ValueError('kmeans_lloyd: no non-null vectors')
    if n_clusters == 'auto':
        # scale k with the corpus (mean cluster ~= target_cluster_rows)
        # so a caller's downstream O(B^2) within-cluster work stays
        # bounded without a manual knob. Capped at auto_k_max: per-row
        # assignment cost is O(k*D) and centroids are driver-held, so
        # k cannot grow linearly forever — past the cap, shard the
        # corpus and run per shard (SemDeDup runs 50k on LAION-scale).
        n_clusters = min(auto_k_max,
                         max(8, -(-total // target_cluster_rows)))
    k = min(int(n_clusters), total)

    def _rows_matrix(tbl: pa.Table) -> np.ndarray:
        la = tbl.column('_x6').combine_chunks()
        return np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.int64).reshape(len(la), -1)

    # ---- init: k smallest ids (per-batch partial top-k, driver merge of
    # <= blocks*k tiny rows — shuffle-invariant, deterministic)
    def min_k(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        ids = tbl.column('_id').to_numpy(zero_copy_only=False)
        keep = np.sort(np.argsort(ids, kind='stable')[:k])
        return tbl.take(pa.array(keep))

    _mat_schema = pa.schema([('_id', pa.int64()),
                             ('_x6', pa.list_(pa.int64()))])

    def _collect(d) -> pa.Table:
        tbls = [t.cast(_mat_schema) for t in
                d.iter_batches(batch_format='pyarrow') if t.num_rows]
        if not tbls:
            return _mat_schema.empty_table()
        return pa.concat_tables(tbls)

    seed_rows = _collect(mat.map_batches(min_k, batch_format='pyarrow',
                                         zero_copy_batch=True))
    # positions of the k smallest ids, IN ASCENDING ID ORDER — the
    # centroid indexing must not depend on row positions
    order = np.argsort(
        seed_rows.column('_id').to_numpy(zero_copy_only=False),
        kind='stable')[:k]
    c6 = _rows_matrix(seed_rows.take(pa.array(order)))
    d = c6.shape[1]

    if total <= local_rows_max:
        return _kmeans_local6(_rows_matrix(_collect(mat)), c6, iters)

    sizes = np.zeros(k, dtype=np.int64)
    inertia = 0
    for _ in range(iters):
        c_ref = ray.put(c6)

        def partials(tbl: pa.Table, _c_ref=c_ref) -> pa.Table:
            cents = ray.get(_c_ref)
            kk, dd = cents.shape
            if tbl.num_rows == 0:
                z = pa.array([], pa.int64())
                return pa.table({'cluster': z, 'dim': z, 's6': z, 'n': z})
            x6 = _rows_matrix(tbl)
            assign, mind2 = _assign6(x6, cents)
            s6 = np.zeros((kk, dd), dtype=np.int64)
            np.add.at(s6, assign, x6)
            cnt = np.bincount(assign, minlength=kk).astype(np.int64)
            cl = np.repeat(np.arange(kk, dtype=np.int64), dd)
            dim = np.tile(np.arange(dd, dtype=np.int64), kk)
            # inertia partial rides as a sentinel row (cluster -1)
            return pa.table({
                'cluster': pa.array(np.concatenate([cl, [-1]])),
                'dim': pa.array(np.concatenate([dim, [-1]])),
                's6': pa.array(np.concatenate([s6.reshape(-1),
                                               [mind2.sum()]])),
                'n': pa.array(np.concatenate([np.repeat(cnt, dd), [0]])),
            })

        merged = pre_aggregate(
            mat.map_batches(partials, batch_format='pyarrow',
                            zero_copy_batch=True),
            ['cluster', 'dim'], {'s6': ('s6', 'sum'), 'n': ('n', 'sum')})
        _p_schema = pa.schema([('cluster', pa.int64()),
                               ('dim', pa.int64()),
                               ('s6', pa.int64()), ('n', pa.int64())])
        ptbls = [t.cast(_p_schema) for t in
                 merged.iter_batches(batch_format='pyarrow') if t.num_rows]
        rows = pa.concat_tables(ptbls) if ptbls \
            else _p_schema.empty_table()
        cl = rows.column('cluster').to_numpy(zero_copy_only=False)
        dim = rows.column('dim').to_numpy(zero_copy_only=False)
        s6v = rows.column('s6').to_numpy(zero_copy_only=False)
        nv = rows.column('n').to_numpy(zero_copy_only=False)
        inertia = int(s6v[cl == -1].sum())
        real = cl >= 0
        s6m = np.zeros((k, d), dtype=np.int64)
        s6m[cl[real], dim[real]] = s6v[real]
        sizes = np.zeros(k, dtype=np.int64)
        sizes[cl[real]] = nv[real]   # n repeated per dim; same value
        nz = sizes > 0
        c6 = c6.copy()
        c6[nz] = (s6m[nz] + sizes[nz, None] // 2) // sizes[nz, None]
    return c6, sizes, inertia


def kmeans_assign(ds, c6: np.ndarray, emb_col: str = 'embedding'):
    """Append the exact-integer cluster assignment for trained
    ``kmeans_lloyd`` centroids as an int32 ``cluster`` column."""
    c_ref = ray.put(np.ascontiguousarray(c6, dtype=np.int64))

    class Assign:
        def __init__(self):
            self.c6 = ray.get(c_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            tbl = drop_null_vectors(tbl, emb_col)
            if tbl.num_rows == 0:
                return tbl.append_column(
                    'cluster', pa.array([], type=pa.int32()))
            assign, _ = _assign6(_matrix6(tbl, emb_col), self.c6)
            return tbl.append_column('cluster', pa.array(assign))

    return ds.map_batches(Assign, batch_format='pyarrow', concurrency=2)


def mmr_topk(ds, query: np.ndarray, k: int = 10, fetch_k: int = 100,
             lam: float = 0.5, emb_col: str = 'embedding',
             id_col: str = 'vec_id'):
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    1998): retrieve an exact-cosine shortlist of ``fetch_k``, then pick
    ``k`` results greedily by
    ``argmax lam*sim(q,i) - (1-lam)*max_{j in S} sim(i,j)`` —
    relevance traded against redundancy with already-selected results.

    Distributed shape (the 100-TB path is the shortlist, not the
    greedy): every batch emits only its LOCAL top-``fetch_k`` survivors
    (id, micro-cosine, micro-unit vector), one merge task keeps the
    global shortlist and runs the greedy loop over ``fetch_k`` rows.
    All comparisons are exact int64 — query cosines are floored to
    micro-units, pair dots of the micro-quantized unit vectors are
    exact 1e12-scale ints, and the MMR score is int64 at 1e18 max —
    so the selection is bit-stable under any batching/partitioning;
    ties break to the smallest id. Returns a Dataset of
    (rank, id, sim_q6) in selection order.
    """
    import ray.data as rd

    out_schema = pa.schema([('rank', pa.int64()), (id_col, pa.int64()),
                            ('sim_q6', pa.int64())])
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        return rd.from_arrow(out_schema.empty_table())
    qu = q / qn
    lam_u = int(np.floor(lam * 1e6 + 0.5))
    cand_schema = pa.schema([(id_col, pa.int64()), ('sim_q6', pa.int64()),
                             ('_u6', pa.list_(pa.int64()))])

    def shortlist(tbl: pa.Table) -> pa.Table:
        tbl = drop_null_vectors(tbl, emb_col)
        if tbl.num_rows == 0:
            return cand_schema.empty_table()
        m = _batch_matrix(tbl, emb_col)
        nrm = np.linalg.norm(m, axis=1)
        keep = nrm > 0
        m, nrm = m[keep], nrm[keep]
        ids = tbl.column(id_col).combine_chunks().cast(pa.int64())\
            .to_numpy(zero_copy_only=False)[keep]
        if not len(ids):
            return cand_schema.empty_table()
        u = m / nrm[:, None]
        sim6 = np.floor((u @ qu) * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((ids, -sim6))[:fetch_k]
        u6 = np.floor(u[order] * 1e6 + 0.5).astype(np.int64)
        n, d = u6.shape
        return pa.table({
            id_col: pa.array(ids[order]),
            'sim_q6': pa.array(sim6[order]),
            '_u6': pa.FixedSizeListArray.from_arrays(
                pa.array(u6.reshape(-1)), d).cast(pa.list_(pa.int64())),
        }, schema=cand_schema)

    def greedy(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sim6 = tbl.column('sim_q6').to_numpy(zero_copy_only=False)
        la = tbl.column('_u6').combine_chunks()
        U = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                       dtype=np.int64).reshape(len(la), -1)
        order = np.lexsort((ids, -sim6))[:fetch_k]
        ids, sim6, U = ids[order], sim6[order], U[order]
        n = len(ids)
        picked = np.zeros(n, dtype=bool)
        maxpair = np.zeros(n, dtype=np.int64)      # max sim to selected
        out_ids, out_sims = [], []
        for step in range(min(k, n)):
            # score in 1e18 max: lam_u (1e6) * sim12 (1e12); the
            # redundancy term is 0 on the first pick (empty S)
            score = (lam_u * (sim6 * 1_000_000)
                     - (1_000_000 - lam_u) * maxpair)
            score[picked] = np.iinfo(np.int64).min
            best = score.max()
            cand = np.nonzero((score == best) & ~picked)[0]
            j = cand[np.argmin(ids[cand])]
            picked[j] = True
            out_ids.append(ids[j])
            out_sims.append(sim6[j])
            pair = U @ U[j]                        # exact 1e12-scale
            if step == 0:
                maxpair = pair                     # true max, not clamped
            else:
                np.maximum(maxpair, pair, out=maxpair)
        return pa.table({
            'rank': pa.array(np.arange(len(out_ids), dtype=np.int64)),
            id_col: pa.array(np.asarray(out_ids, dtype=np.int64)),
            'sim_q6': pa.array(np.asarray(out_sims, dtype=np.int64)),
        }, schema=out_schema)

    cands = ds.map_batches(shortlist, batch_format='pyarrow',
                           zero_copy_batch=True)
    return cands.repartition(1).map_batches(greedy, batch_size=None,
                                            batch_format='pyarrow')
