"""End-to-end differential fuzz for the r4 LSH oracle chains.

The fixture gates exercise the driver corpus; these run the FULL
engine pipeline (hash_mode='duckdb') against the FULL generated SQL
twin on adversarial mini-corpora (repeats, near-dups, unicode, empty
and sub-k docs) — the same bar as tests/test_jw_kernel.py but for the
composed minhash/simhash transcriptions."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from trafaret_ray.pipelines.queries import (ORACLE_SQL,
                                            _minhash_oracle_sql)
from trafaret_ray.stages.dedup import minhash_dedup, simhash_candidates


def _corpus(seed: int, n: int = 60) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ['alpha', 'beta', 'gamma', 'delta', 'x', 'é', '日本', '--',
             'the', 'of', 'zz9']
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 12))
        words = [vocab[int(v)] for v in rng.integers(0, len(vocab), k)]
        texts.append(' '.join(words))
    # planted structures: verbatim dup, near dup, empty, single word
    texts[0] = 'alpha beta gamma delta alpha beta'
    texts[1] = texts[0]
    texts[2] = 'alpha beta gamma delta alpha zz9'
    texts[3] = ''
    texts[4] = 'é'
    return pa.table({'doc_id': pa.array(np.arange(n), pa.int64()),
                     'text': pa.array(texts)})


def _sql(tbl: pa.Table, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register('documents', tbl)
    out = con.execute(sql).df()
    con.close()
    return out


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_minhash_chain_matches_sql(ray_session, seed):
    tbl = _corpus(seed)
    eng = minhash_dedup(rd.from_arrow(tbl), threshold=0.5,
                        hash_mode='duckdb').sort('doc_id').to_pandas()
    want = _sql(tbl, _minhash_oracle_sql())
    assert eng.reset_index(drop=True).astype('int64').equals(
        want.reset_index(drop=True).astype('int64'))


@pytest.mark.parametrize('seed', [4, 5])
def test_simhash_chain_matches_sql(ray_session, seed):
    tbl = _corpus(seed, n=40)
    eng = simhash_candidates(rd.from_arrow(tbl), max_hamming=3,
                             num_buckets=4, hash_mode='duckdb')\
        .sort(['doc_a', 'doc_b']).to_pandas()
    want = _sql(tbl, ORACLE_SQL['q_simhash_candidates_docs'])
    assert eng.reset_index(drop=True).astype('int64').equals(
        want.reset_index(drop=True).astype('int64'))


def test_minhash_chain_deep_cluster_matches_sql(ray_session):
    # review counterexample: doc i = word blocks i..i+4 forms a
    # near-dup PATH of diameter 19 — hooking-only unrolls (12 rounds)
    # mislabeled the tail; the pointer-jumping rounds converge
    # logarithmically and must match the engine's CC fixpoint
    blocks = [' '.join(f'w{b}x{t}' for t in range(6)) for b in range(26)]
    texts = [' '.join(blocks[i:i + 5]) for i in range(20)]
    tbl = pa.table({'doc_id': pa.array(np.arange(20), pa.int64()),
                    'text': pa.array(texts)})
    eng = minhash_dedup(rd.from_arrow(tbl), threshold=0.5,
                        hash_mode='duckdb').sort('doc_id').to_pandas()
    want = _sql(tbl, _minhash_oracle_sql())
    assert len(eng) > 0   # the chain must actually link
    assert eng.reset_index(drop=True).astype('int64').equals(
        want.reset_index(drop=True).astype('int64'))
    # and the engine found one chain-wide cluster, proving depth
    assert eng['cluster_id'].nunique() <= 3


def _emb_corpus(seed: int, n: int = 120, zero_rows=()) -> pa.Table:
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, 64)).astype(np.float32)
    for z in zero_rows:
        mat[z] = 0.0
    return pa.table({
        'vec_id': pa.array(np.arange(n), pa.int64()),
        'embedding': pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), 64).cast(pa.list_(pa.float32())),
    })


def test_pq_zero_vector_in_sample_matches_sql(ray_session):
    # review finding: a zero-norm row whose id hash lands in the
    # bottom-k gave the engine and the oracle different training sets;
    # pq_train(duckdb) now drops zero-norm rows BEFORE sampling
    from trafaret_ray.pipelines.queries import _pq_oracle_sql
    from trafaret_ray.stages.ann import pq_encode, pq_search, pq_train
    tbl = _emb_corpus(11, zero_rows=(7, 30))
    ds = rd.from_arrow(tbl).materialize()
    books = pq_train(ds, m=8, ks=32, sample_size=512,
                     hash_mode='duckdb')
    codes = pq_encode(ds, books)
    q = np.asarray(tbl['embedding'][0].as_py(), dtype=np.float64)
    eng = pq_search(codes, books, q, k=10, exclude_ids=[0])
    eng = (eng.to_pandas() if hasattr(eng, 'to_pandas') else eng)\
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register('embeddings', tbl)
    want = con.execute(_pq_oracle_sql()).df()
    con.close()
    assert eng['vec_id'].tolist() == want['vec_id'].tolist()
    assert np.allclose(eng['approx_cos'], want['approx_cos'])


def test_pq_zero_norm_query_short_circuits(ray_session):
    # review finding: the oracle's q6 CTE is empty for a zero-norm
    # query; the exact engine mode must emit 0 rows too
    from trafaret_ray.stages.ann import pq_encode, pq_search, pq_train
    from trafaret_ray.stages.ann import ivfpq_topk
    tbl = _emb_corpus(12, zero_rows=(0,))
    ds = rd.from_arrow(tbl).materialize()
    books = pq_train(ds, m=8, ks=32, sample_size=512,
                     hash_mode='duckdb')
    codes = pq_encode(ds, books)
    zq = np.zeros(64)
    out = pq_search(codes, books, zq, k=10, exclude_ids=[0])
    out = out.to_pandas() if hasattr(out, 'to_pandas') else out
    assert len(out) == 0
    out2 = ivfpq_topk(rd.from_arrow(tbl), zq, k=10, n_clusters=8,
                      nprobe=2, m=8, ks=16, sample_size=128,
                      exclude_ids=[0], rerank=20, hash_mode='duckdb')
    out2 = out2.to_pandas() if hasattr(out2, 'to_pandas') else out2
    assert len(out2) == 0
