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
