"""Training-data assembly ops: weighted mixing, concat-chunk packing,
deterministic shuffle-export sharding (functions/sampling.py,
stages/packing.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from trafaret_ray.functions.sampling import (
    shard_positions, split_buckets, weighted_mix)
from trafaret_ray.stages.packing import concat_chunk_pack, \
    global_prefix_sum


def _docs_tbl(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        'doc_id': pa.array(np.arange(n, dtype=np.int64)),
        'source': pa.array([f'src{i % 5}' for i in range(n)]),
        'n_tokens': pa.array(rng.integers(0, 90, n).astype(np.int64)),
    })


class TestWeightedMix:
    RATES = {'src0': 1.0, 'src1': 0.5, 'src2': 0.0}

    def test_rates_and_determinism(self, ray_session):
        tbl = _docs_tbl(1000)
        out = weighted_mix(rd.from_arrow(tbl), 'source', 'doc_id',
                           self.RATES, default_rate=0.25,
                           salt=5).to_pandas()
        # rate-1.0 sources keep everything, rate-0 nothing
        n_src = 200
        got = out.groupby('source').size()
        assert got.get('src0', 0) == n_src
        assert 'src2' not in got
        # fractional rates hold to within binomial noise
        assert abs(got['src1'] / n_src - 0.5) < 0.15
        assert abs((got.get('src3', 0) + got.get('src4', 0))
                   / (2 * n_src) - 0.25) < 0.15
        # partitioning-independent: same rows from a shuffled 7-block run
        perm = np.random.default_rng(1).permutation(len(tbl))
        out2 = weighted_mix(
            rd.from_arrow(tbl.take(perm)).repartition(7), 'source',
            'doc_id', self.RATES, default_rate=0.25, salt=5).to_pandas()
        assert sorted(out2['doc_id']) == sorted(out['doc_id'])

    def test_salt_independence(self, ray_session):
        tbl = _docs_tbl(1000)
        a = weighted_mix(rd.from_arrow(tbl), 'source', 'doc_id',
                         {'src0': 0.5}, default_rate=0.5,
                         salt=5).to_pandas()
        b = weighted_mix(rd.from_arrow(tbl), 'source', 'doc_id',
                         {'src0': 0.5}, default_rate=0.5,
                         salt=99).to_pandas()
        overlap = len(set(a['doc_id']) & set(b['doc_id']))
        # independent coins: overlap ~ n/4, far from either sample size
        assert 0.15 < overlap / 1000 < 0.35


class TestPrefixSumAndPacking:
    def test_prefix_matches_numpy(self, ray_session):
        tbl = _docs_tbl(777)
        out = global_prefix_sum(
            rd.from_arrow(tbl).repartition(5), 'doc_id', 'n_tokens',
            0, 776, num_buckets=8).to_pandas().sort_values('doc_id')
        vals = tbl.column('n_tokens').to_numpy()
        expect = np.concatenate(([0], np.cumsum(vals[:-1])))
        assert (out['prefix'].to_numpy() == expect).all()

    def test_pack_boundaries(self, ray_session):
        tbl = pa.table({
            'doc_id': pa.array(np.arange(6, dtype=np.int64)),
            'n_tokens': pa.array(
                np.array([100, 100, 60, 0, 300, 1], dtype=np.int64)),
        })
        out = concat_chunk_pack(rd.from_arrow(tbl), 'doc_id',
                                'n_tokens', 128, 0, 5, num_buckets=2)\
            .to_pandas().sort_values('doc_id').reset_index(drop=True)
        assert list(out['start_tok']) == [0, 100, 200, 260, 260, 560]
        # doc1 straddles the 128 boundary; doc4 spans three sequences
        assert list(out['seq_first']) == [0, 0, 1, 2, 2, 4]
        assert list(out['seq_last']) == [0, 1, 2, 2, 4, 4]
        # zero-token doc3: seq_last == seq_first, occupies nothing
        assert out.loc[3, 'seq_first'] == out.loc[3, 'seq_last']
        assert list(out['tok_offset']) == [0, 100, 72, 4, 4, 48]

    def test_pack_partitioning_invariant(self, ray_session):
        tbl = _docs_tbl(500, seed=3)
        a = concat_chunk_pack(rd.from_arrow(tbl), 'doc_id', 'n_tokens',
                              256, 0, 499, num_buckets=4)\
            .to_pandas().sort_values('doc_id').reset_index(drop=True)
        perm = np.random.default_rng(2).permutation(500)
        b = concat_chunk_pack(
            rd.from_arrow(tbl.take(perm)).repartition(9), 'doc_id',
            'n_tokens', 256, 0, 499, num_buckets=11)\
            .to_pandas().sort_values('doc_id').reset_index(drop=True)
        assert a.equals(b)

    def test_budget_validation(self, ray_session):
        with pytest.raises(ValueError):
            concat_chunk_pack(rd.from_arrow(_docs_tbl(4)), 'doc_id',
                              'n_tokens', 0, 0, 3)


class TestShardPositions:
    def test_dense_positions_and_determinism(self, ray_session):
        tbl = _docs_tbl(800)
        out = shard_positions(rd.from_arrow(tbl).repartition(6),
                              'doc_id', 8, salt=7).to_pandas()
        assert len(out) == 800
        for _, grp in out.groupby('shard'):
            assert sorted(grp['pos']) == list(range(len(grp)))
        # shard assignment matches the pure hash
        expect = split_buckets(out['doc_id'].to_numpy(np.int64),
                               mod=8, salt=7)
        assert (out['shard'].to_numpy() == expect).all()
        # stable across partitionings
        out2 = shard_positions(rd.from_arrow(tbl).repartition(13),
                               'doc_id', 8, salt=7).to_pandas()
        a = out.sort_values('doc_id').reset_index(drop=True)
        b = out2.sort_values('doc_id').reset_index(drop=True)
        assert a.equals(b)
