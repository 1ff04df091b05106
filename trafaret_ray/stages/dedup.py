"""Deduplication operators: exact, n-gram-Jaccard (exact pairs),
MinHash+LSH, SimHash, embedding-cosine near-dup.

These are first-class engine operators (SURVEY.md §2.9). Shuffle budget
per op is stated in each docstring; the common discipline is: compute
content keys vectorized inside ``map_batches``, exchange only (key, id)
or partial rows, and verify candidates locally per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from .aggregate import pre_aggregate


def exact_dedup(ds, text_col: str = 'text', id_col: str = 'doc_id'):
    """Exact dedup: one canonical (min id) row per distinct content.

    Scale: fingerprints are computed per batch (vectorized hash); the
    exchange moves one partial row per distinct text per batch — the raw
    text never shuffles twice. Returns (id, fingerprint, n_dups).
    """
    def fp(tbl: pa.Table) -> pa.Table:
        return pa.table({
            id_col: tbl.column(id_col),
            'fingerprint': T.rolling_fingerprint(
                tbl.column(text_col).combine_chunks()),
        })

    hashed = ds.map_batches(fp, batch_format='pyarrow', zero_copy_batch=True)
    return pre_aggregate(hashed, ['fingerprint'],
                         {id_col: (id_col, 'min'),
                          'n_dups': (id_col, 'count')})


def ngram_jaccard_pairs(ds, text_col: str = 'text', id_col: str = 'doc_id',
                        k: int = 3, threshold: float = 0.5,
                        num_buckets: int = 32, max_df: int | None = 50):
    """EXACT word-k-gram Jaccard similar pairs (doc_a, doc_b, jaccard).

    Plan: explode each doc to its DISTINCT shingles (vectorized set-build
    per batch) → hash-repartition by shingle → per-partition pair partial
    counts (pandas merge inside the block) → one small groupby summing
    pair counts → jaccard = common / (|A| + |B| - common).

    Scale notes: the shingle exchange carries (shingle, id, doc_size)
    only. A stop-shingle appearing in d docs emits d² pairs, so shingles
    with document frequency > ``max_df`` are DROPPED on both engines (the
    oracle applies the identical cap): Jaccard is then computed over the
    capped shingle sets — exact w.r.t. that declared universe. Pass
    ``max_df=None`` for the uncapped exact variant (only safe on corpora
    without stop-shingles). Hot shingles are discovered by a census and
    broadcast (the hot set is small by definition).
    """
    import ray as _ray
    def explode(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        lengths, flat = T.word_shingles(texts, k)
        doc_rep = np.repeat(ids, lengths)
        size_rep = np.repeat(lengths, lengths)
        return pa.table({
            's': pa.array(flat, type=pa.string()),
            'doc': pa.array(doc_rep),
            'size': pa.array(size_rep, type=pa.int64()),
        })

    shingles = ds.map_batches(explode, batch_format='pyarrow',
                              zero_copy_batch=True)

    if max_df is not None:
        df_census = pre_aggregate(shingles, ['s'], {'df': ('doc', 'count')})
        hot = df_census.filter(
            lambda r: r['df'] > max_df).to_pandas()
        # an empty filtered dataset loses its schema -> no 's' column
        hot_set = set(hot['s']) if 's' in hot.columns else set()
        hot_ref = _ray.put(hot_set)

        # per-doc sizes must be recomputed over the capped shingle
        # universe, so re-explode with the hot set filtered inside the
        # per-doc shingle build
        def explode_capped(tbl: pa.Table) -> pa.Table:
            hs = _ray.get(hot_ref)
            texts = tbl.column(text_col).to_pylist()
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            lengths, flat = T.word_shingles(texts, k)
            if hs:
                keep = np.fromiter((x not in hs for x in flat), dtype=bool,
                                   count=len(flat))
                doc_rep_all = np.repeat(np.arange(len(ids)), lengths)
                kept_counts = np.bincount(doc_rep_all[keep],
                                          minlength=len(ids))
                flat = flat[keep]
                doc_rep = ids[doc_rep_all[keep]]
                size_rep = kept_counts[doc_rep_all[keep]]
            else:
                doc_rep = np.repeat(ids, lengths)
                size_rep = np.repeat(lengths, lengths)
            return pa.table({
                's': pa.array(flat, type=pa.string()),
                'doc': pa.array(doc_rep),
                'size': pa.array(size_rep, type=pa.int64()),
            })

        shingles = ds.map_batches(explode_capped, batch_format='pyarrow',
                                  zero_copy_batch=True)

    def pair_counts(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({'doc_a': pa.array([], pa.int64()),
                             'doc_b': pa.array([], pa.int64()),
                             'size_a': pa.array([], pa.int64()),
                             'size_b': pa.array([], pa.int64()),
                             'common': pa.array([], pa.int64())})
        df = tbl.to_pandas()
        m = df.merge(df, on='s', suffixes=('_a', '_b'))
        m = m[m['doc_a'] < m['doc_b']]
        g = m.groupby(['doc_a', 'doc_b', 'size_a', 'size_b'], sort=False)\
            .size().rename('common').reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from .conversations import bucket_exchange
    partial = bucket_exchange(shingles, 's', pair_counts, num_buckets)
    merged = pre_aggregate(partial, ['doc_a', 'doc_b', 'size_a', 'size_b'],
                           {'common': ('common', 'sum')})

    def jaccard(tbl: pa.Table) -> pa.Table:
        common = pc.cast(tbl.column('common'), pa.float64())
        union = pc.subtract(
            pc.cast(pc.add(tbl.column('size_a'), tbl.column('size_b')),
                    pa.float64()), common)
        j = pc.divide(common, union)
        out = pa.table({'doc_a': tbl.column('doc_a'),
                        'doc_b': tbl.column('doc_b'),
                        'jaccard': pc.round(j, ndigits=6)})
        return out.filter(pc.greater_equal(out.column('jaccard'), threshold))

    return merged.map_batches(jaccard, batch_format='pyarrow')


def minhash_signature_ds(ds, text_col='text', id_col='doc_id',
                         num_perm=128, num_bands=32, shingle_k=3,
                         seed=1234):
    """(id, band_id, band_hash) rows — the LSH index. One vectorized pass;
    emits num_bands rows per doc (ids + 2 uint64s, tiny vs the text)."""
    def sig(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        lengths, flat = T.word_shingles(texts, shingle_k)
        hashes = T.hash_shingles(flat)
        s = T.minhash_matrix(lengths, hashes, num_perm, seed)
        bh = T.band_hashes(s, num_bands)
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_bands)),
            'band_id': pa.array(np.tile(np.arange(num_bands, dtype=np.int32),
                                        n), type=pa.int32()),
            'band_hash': pa.array(bh.reshape(-1).view(np.int64),
                                  type=pa.int64()),
        })

    return ds.map_batches(sig, batch_format='pyarrow', zero_copy_batch=True)


def minhash_candidates(ds, text_col='text', id_col='doc_id', num_perm=128,
                       num_bands=32, shingle_k=3, seed=1234,
                       num_buckets=32):
    """Candidate near-dup pairs from MinHash-LSH banding: docs sharing any
    (band_id, band_hash) bucket. One exchange of the tiny LSH index."""
    index = minhash_signature_ds(ds, text_col, id_col, num_perm, num_bands,
                                 shingle_k, seed)

    def pairs(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        m = df.merge(df, on=['band_id', 'band_hash'], suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        out = m[[f'{id_col}_a', f'{id_col}_b']].drop_duplicates()
        out.columns = ['doc_a', 'doc_b']
        return pa.Table.from_pandas(out, preserve_index=False)

    from .conversations import bucket_exchange
    cand = bucket_exchange(index, 'band_hash', pairs, num_buckets)
    # distinct pairs across partitions (a pair can match in several bands
    # that hash to different partitions)
    return pre_aggregate(cand, ['doc_a', 'doc_b'],
                         {'n_bands': ('doc_a', 'count')})


def minhash_dedup(ds, text_col='text', id_col='doc_id', threshold=0.7,
                  num_perm=128, num_bands=32, shingle_k=3, seed=1234):
    """MinHash-LSH near-dup clusters: LSH candidates → exact Jaccard verify
    on the candidate docs only → union-find clusters → (id, cluster_id).

    The verify + clustering steps materialize only the CANDIDATE pairs and
    their texts (bounded by the LSH hit set, not the corpus). Union-find
    runs on the driver over verified pairs — documented assumption:
    verified-duplicate pairs fit driver memory (at 100 TB shard this stage
    by band-hash range and cluster per shard).
    """
    cand = minhash_candidates(ds, text_col, id_col, num_perm, num_bands,
                              shingle_k, seed).to_pandas()
    if len(cand) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         'cluster_id': pa.array([], pa.int64())})
    need = sorted(set(cand['doc_a']) | set(cand['doc_b']))
    need_set = set(need)

    def pick(tbl: pa.Table) -> pa.Table:
        mask = pa.array([i in need_set
                         for i in tbl.column(id_col).to_pylist()])
        return tbl.filter(mask)

    docs = ds.map_batches(pick, batch_format='pyarrow').to_pandas()
    text_of = dict(zip(docs[id_col], docs[text_col]))
    # exact verify
    verified = []
    sh_cache: dict = {}

    def shingles_of(d):
        if d not in sh_cache:
            lengths, flat = T.word_shingles([text_of[d]], shingle_k)
            sh_cache[d] = set(flat.tolist())
        return sh_cache[d]

    for a, b in zip(cand['doc_a'], cand['doc_b']):
        sa, sb = shingles_of(a), shingles_of(b)
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and inter / union >= threshold:
            verified.append((a, b))
    # union-find
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({d for pair in verified for d in pair})
    return pa.table({
        id_col: pa.array(members, type=pa.int64()),
        'cluster_id': pa.array([find(d) for d in members], type=pa.int64()),
    })


def simhash_candidates(ds, text_col='text', id_col='doc_id',
                       max_hamming=3, num_chunks=4, num_buckets=32,
                       max_bucket: int = 256):
    """SimHash near-dup: 64-bit signatures, banded into ``num_chunks``
    16-bit chunks (pigeonhole: any pair within hamming distance
    ``num_chunks - 1`` shares a chunk); chunk-bucket exchange, verify
    hamming distance per bucket. Returns (doc_a, doc_b, hamming)."""
    def sig(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        lengths, flat = T.word_shingles(texts, 1)  # token-level
        hashes = T.hash_shingles(flat)
        s = T.simhash64(lengths, hashes)
        n = len(ids)
        bits = 64 // num_chunks
        chunks = np.empty((n, num_chunks), dtype=np.uint64)
        for c in range(num_chunks):
            chunks[:, c] = (s >> np.uint64(c * bits)) \
                & np.uint64((1 << bits) - 1)
        chunks_i64 = chunks.view(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_chunks)),
            'sim': pa.array(np.repeat(s, num_chunks).view(np.int64),
                            type=pa.int64()),
            'chunk_id': pa.array(np.tile(np.arange(num_chunks,
                                                   dtype=np.int32), n)),
            'chunk_val': pa.array(chunks_i64.reshape(-1), type=pa.int64()),
        })

    index = ds.map_batches(sig, batch_format='pyarrow', zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        # a chunk value shared by > max_bucket docs is non-discriminative
        # (stop-pattern); drop it — near-dups still match on their other
        # chunks with high probability (documented recall trade)
        sizes = df.groupby(['chunk_id', 'chunk_val'])['sim']\
            .transform('size')
        df = df[sizes <= max_bucket]
        m = df.merge(df, on=['chunk_id', 'chunk_val'], suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        if len(m) == 0:
            return pa.table({'doc_a': pa.array([], pa.int64()),
                             'doc_b': pa.array([], pa.int64()),
                             'hamming': pa.array([], pa.int64())})
        hd = T.hamming_distance(
            m['sim_a'].to_numpy(dtype=np.int64).view(np.uint64),
            m['sim_b'].to_numpy(dtype=np.int64).view(np.uint64))
        m = m.assign(hamming=hd)
        m = m[m['hamming'] <= max_hamming]
        out = m[[f'{id_col}_a', f'{id_col}_b', 'hamming']]\
            .drop_duplicates([f'{id_col}_a', f'{id_col}_b'])
        out.columns = ['doc_a', 'doc_b', 'hamming']
        return pa.Table.from_pandas(out, preserve_index=False)

    from .conversations import bucket_exchange
    cand = bucket_exchange(index, 'chunk_val', pairs, num_buckets)
    return pre_aggregate(cand, ['doc_a', 'doc_b'],
                         {'hamming': ('hamming', 'min')})


def embedding_near_dup(ds, emb_col='embedding', id_col='vec_id',
                       threshold=0.95, num_planes=8, seed=7,
                       num_buckets=32):
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by the
    sign pattern of ``num_planes`` random projections (broadcast plane
    matrix), then exact pairwise cosine inside each bucket (numpy matmul).
    Neighbors in adjacent buckets are missed at probability falling with
    cosine similarity — the standard LSH trade; raise num_planes for
    precision, lower for recall. Returns (id_a, id_b, cos_sim)."""
    import pyarrow.parquet  # noqa: F401

    first = ds.take_batch(1, batch_format='pyarrow')
    dim = len(first[emb_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))

    def bucketize(tbl: pa.Table) -> pa.Table:
        la = tbl.column(emb_col).combine_chunks()
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        signs = (mat @ planes) > 0
        bucket = np.zeros(len(la), dtype=np.int64)
        for p in range(num_planes):
            bucket |= signs[:, p].astype(np.int64) << np.int64(p)
        norms = np.linalg.norm(mat, axis=1)
        return tbl.append_column('bucket', pa.array(bucket, pa.int64()))\
                  .append_column('norm', pa.array(norms))

    bucketed = ds.map_batches(bucketize, batch_format='pyarrow',
                              zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        df_ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        buckets = tbl.column('bucket').to_numpy(zero_copy_only=False)
        la = tbl.column(emb_col).combine_chunks()
        if len(la) == 0:
            return pa.table({'id_a': pa.array([], pa.int64()),
                             'id_b': pa.array([], pa.int64()),
                             'cos_sim': pa.array([], pa.float64())})
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        norms = tbl.column('norm').to_numpy(zero_copy_only=False)
        order = np.argsort(buckets, kind='stable')
        sb = buckets[order]
        starts = np.nonzero(np.diff(sb, prepend=sb[0] - 1))[0]
        ends = np.append(starts[1:], len(sb))
        for lo, hi in zip(starts, ends):
            idx = order[lo:hi]
            if len(idx) < 2:
                continue
            sub = mat[idx]
            nrm = norms[idx]
            sims = (sub @ sub.T) / np.outer(nrm, nrm)
            ia, ib = np.triu_indices(len(idx), k=1)
            hit = sims[ia, ib] >= threshold
            out_a.append(df_ids[idx[ia[hit]]])
            out_b.append(df_ids[idx[ib[hit]]])
            out_c.append(np.round(sims[ia[hit], ib[hit]], 6))
        if not out_a:
            return pa.table({'id_a': pa.array([], pa.int64()),
                             'id_b': pa.array([], pa.int64()),
                             'cos_sim': pa.array([], pa.float64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        c = np.concatenate(out_c)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({'id_a': pa.array(a2), 'id_b': pa.array(b2),
                         'cos_sim': pa.array(c)})

    from .conversations import bucket_exchange
    return bucket_exchange(bucketed, 'bucket', pairs, num_buckets)
