"""IVF index: exactness at full probe, recall/prune trade at low probe."""

import numpy as np
import pyarrow as pa


def _corpus(n=400, dim=16, n_groups=8, seed=4):
    """Clustered gaussian corpus so the coarse quantizer has structure."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_groups, dim)) * 4
    rows = centers[rng.integers(0, n_groups, n)] \
        + rng.standard_normal((n, dim))
    return pa.table({
        'vec_id': pa.array(np.arange(n, dtype=np.int64)),
        'embedding': pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32())),
    }), rows


def _brute_topk(rows, q, k, exclude):
    sims = (rows @ q) / (np.linalg.norm(rows, axis=1) * np.linalg.norm(q))
    order = np.argsort(-sims, kind='stable')
    return [i for i in order if i not in exclude][:k]


class TestIVF:
    def test_full_probe_is_exact(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivf_topk
        tbl, rows = _corpus()
        q = rows[0]
        got = ivf_topk(rd.from_arrow(tbl), q, k=10, n_clusters=8,
                       nprobe=8, exclude_ids=[0]).to_pandas()
        expect = _brute_topk(rows, q, 10, {0})
        assert list(got['vec_id']) == expect

    def test_pruned_probe_recall(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivf_topk
        tbl, rows = _corpus()
        q = rows[0]
        got = ivf_topk(rd.from_arrow(tbl), q, k=10, n_clusters=8,
                       nprobe=3, exclude_ids=[0]).to_pandas()
        expect = set(_brute_topk(rows, q, 10, {0}))
        recall = len(set(got['vec_id']) & expect) / 10
        assert recall >= 0.7, recall

    def test_assignment_covers_all(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivf_assign
        tbl, _ = _corpus()
        assigned, cents = ivf_assign(rd.from_arrow(tbl), n_clusters=8)
        df = assigned.to_pandas()
        assert len(df) == tbl.num_rows
        assert df['_centroid'].between(0, len(cents) - 1).all()


class TestDeterministicSample:
    def test_stable_and_rate(self, ray_session):
        import ray.data as rd
        from trafaret_ray.functions.text import (deterministic_sample,
                                                 hash_sample_mask)
        ids = np.arange(20000, dtype=np.int64)
        tbl = pa.table({'user_id': pa.array(ids)})
        out1 = deterministic_sample(rd.from_arrow(tbl), 'user_id', 0.1)\
            .to_pandas()
        out2 = deterministic_sample(
            rd.from_arrow(tbl).repartition(7), 'user_id', 0.1).to_pandas()
        # partitioning-independent membership
        assert sorted(out1['user_id']) == sorted(out2['user_id'])
        assert 0.08 < len(out1) / len(ids) < 0.12
        # per-value mask equals dataset filter
        mask = hash_sample_mask(ids, 0.1)
        assert sorted(ids[mask]) == sorted(out1['user_id'])
        # different salt -> different sample
        m2 = hash_sample_mask(ids, 0.1, salt='v2')
        assert (mask != m2).any()


class TestIVFIndexOnDisk:
    def test_build_search_exact_and_pruned(self, ray_session, tmp_path):
        """On-disk IVF: partition-by-centroid layout; full probe equals
        brute force, a pruned probe opens ONLY its clusters' dirs."""
        import os
        import ray.data as rd
        from trafaret_ray.stages.ann import ivf_build, ivf_search
        tbl, rows = _corpus()
        idx = str(tmp_path / 'ivf')
        ivf_build(rd.from_arrow(tbl), idx, n_clusters=8, seed=0)
        parts = [d for d in os.listdir(idx) if d.startswith('_centroid=')]
        assert 1 < len(parts) <= 8
        assert os.path.exists(os.path.join(idx, 'centroids.npy'))

        q = rows[0]
        got = ivf_search(idx, q, k=10, nprobe=8,
                         exclude_ids=[0]).to_pandas()
        assert list(got['vec_id']) == _brute_topk(rows, q, 10, {0})

        pruned = ivf_search(idx, q, k=10, nprobe=2,
                            exclude_ids=[0]).to_pandas()
        expect = set(_brute_topk(rows, q, 10, {0}))
        assert len(set(pruned['vec_id']) & expect) / 10 >= 0.5

    def test_rebuild_is_atomic(self, ray_session, tmp_path):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivf_build, ivf_search
        tbl, rows = _corpus()
        idx = str(tmp_path / 'ivf')
        ivf_build(rd.from_arrow(tbl), idx, n_clusters=4, seed=0)
        # rebuild over the same path replaces, never mixes
        ivf_build(rd.from_arrow(tbl), idx, n_clusters=4, seed=1)
        got = ivf_search(idx, rows[3], k=5, nprobe=4).to_pandas()
        assert list(got['vec_id'])[0] == 3  # self-match tops at full probe


class TestPQ:
    def _pq(self, tbl, m=4, ks=32):
        import ray.data as rd
        from trafaret_ray.stages.ann import pq_encode, pq_train
        ds = rd.from_arrow(tbl)
        books = pq_train(ds, m=m, ks=ks, sample_size=512, seed=0)
        return ds, books

    def test_recall_vs_exact(self, ray_session):
        from trafaret_ray.stages.ann import pq_encode, pq_search
        tbl, rows = _corpus()
        ds, books = self._pq(tbl)
        codes = pq_encode(ds, books)
        got = pq_search(codes, books, rows[0], k=10,
                        exclude_ids=[0]).to_pandas()
        expect = set(_brute_topk(rows, rows[0], 10, {0}))
        recall = len(set(got['vec_id']) & expect) / 10
        assert recall >= 0.6, recall

    def test_permutation_invariance(self, ray_session):
        """Shuffled input -> byte-identical codebooks AND results: the
        bottom-k-hash training sample is order-independent (the shuffled
        gate's bar for rows-only queries)."""
        import ray.data as rd
        from trafaret_ray.stages.ann import (pq_encode, pq_search,
                                             pq_train)
        tbl, rows = _corpus()
        perm = np.random.default_rng(7).permutation(tbl.num_rows)
        shuf = tbl.take(perm)
        b1 = pq_train(rd.from_arrow(tbl), m=4, sample_size=100)
        b2 = pq_train(rd.from_arrow(shuf), m=4, sample_size=100)
        np.testing.assert_array_equal(b1, b2)
        r1 = pq_search(pq_encode(rd.from_arrow(tbl), b1), b1, rows[3],
                       k=10).to_pandas()
        r2 = pq_search(pq_encode(rd.from_arrow(shuf), b2), b2, rows[3],
                       k=10).to_pandas()
        assert r1.equals(r2)

    def test_zero_and_null_vectors_drop(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import pq_encode
        tbl, _rows = _corpus(n=20)
        dim = len(tbl.column('embedding')[0])
        extra = pa.table({
            'vec_id': pa.array([100, 101], type=pa.int64()),
            'embedding': pa.array([[0.0] * dim, None],
                                  type=pa.list_(pa.float32())),
        })
        both = pa.concat_tables([tbl, extra])
        ds, books = self._pq(both)
        codes = pq_encode(ds, books).to_pandas()
        assert 100 not in set(codes['vec_id'])
        assert 101 not in set(codes['vec_id'])
        assert len(codes) == 20

    def test_code_width(self, ray_session):
        from trafaret_ray.stages.ann import pq_encode
        tbl, _rows = _corpus()
        ds, books = self._pq(tbl, m=4)
        codes = pq_encode(ds, books).take_batch(5, batch_format='pyarrow')
        assert len(codes.column('code')[0]) == 4


class TestIVFPQ:
    def test_recall_vs_exact(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivfpq_topk
        tbl, rows = _corpus()
        got = ivfpq_topk(rd.from_arrow(tbl), rows[0], k=10,
                         n_clusters=8, nprobe=4, m=8, ks=32,
                         exclude_ids=[0]).to_pandas()
        expect = set(_brute_topk(rows, rows[0], 10, {0}))
        recall = len(set(got['vec_id']) & expect) / 10
        assert recall >= 0.6, recall

    def test_residual_codes_beat_flat_at_same_budget(self, ray_session):
        """The reason IVF-PQ exists: residuals carry less variance than
        raw vectors, so the same (m, ks) budget quantizes finer."""
        import ray.data as rd
        from trafaret_ray.stages.ann import (ivfpq_topk, pq_encode,
                                             pq_search, pq_train)
        tbl, rows = _corpus(n=600)
        qs = [rows[i] for i in (1, 5, 9, 13, 17)]
        ds = rd.from_arrow(tbl)
        books = pq_train(ds, m=4, ks=16, sample_size=512)
        codes = pq_encode(ds, books).materialize()
        r_flat = r_ivf = 0.0
        for i, q in enumerate(qs):
            expect = set(_brute_topk(rows, q, 10, {i}))
            flat = pq_search(codes, books, q, k=10,
                             exclude_ids=[4 * i + 1]).to_pandas()
            ivf = ivfpq_topk(ds, q, k=10, n_clusters=8, nprobe=8,
                             m=4, ks=16,
                             exclude_ids=[4 * i + 1]).to_pandas()
            r_flat += len(set(flat['vec_id']) & expect)
            r_ivf += len(set(ivf['vec_id']) & expect)
        assert r_ivf >= r_flat, (r_ivf, r_flat)

    def test_permutation_invariance(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivfpq_topk
        tbl, rows = _corpus()
        perm = np.random.default_rng(11).permutation(tbl.num_rows)
        r1 = ivfpq_topk(rd.from_arrow(tbl), rows[2], k=10,
                        n_clusters=8, nprobe=4, m=4).to_pandas()
        r2 = ivfpq_topk(rd.from_arrow(tbl.take(perm)), rows[2], k=10,
                        n_clusters=8, nprobe=4, m=4).to_pandas()
        assert r1.equals(r2)


class TestRerank:
    def test_pq_rerank_restores_exact_order(self, ray_session):
        """The shortlist+exact-rerank recipe: top-k is the true cosine
        order whenever the true top-k survive the shortlist."""
        import ray.data as rd
        from trafaret_ray.stages.ann import (pq_encode, pq_search,
                                             pq_train)
        tbl, rows = _corpus()
        ds = rd.from_arrow(tbl)
        books = pq_train(ds, m=8, ks=32, sample_size=512)
        codes = pq_encode(ds, books)
        got = pq_search(codes, books, rows[0], k=10, exclude_ids=[0],
                        rerank=200, rerank_ds=ds).to_pandas()
        assert list(got['vec_id']) == _brute_topk(rows, rows[0], 10, {0})
        assert 'cos_sim' in got.columns

    def test_ivfpq_index_reuse(self, ray_session):
        """build once, search many: results equal the one-shot path."""
        import ray.data as rd
        from trafaret_ray.stages.ann import (ivfpq_build, ivfpq_search,
                                             ivfpq_topk)
        tbl, rows = _corpus()
        ds = rd.from_arrow(tbl)
        idx = ivfpq_build(ds, n_clusters=8, m=8, ks=32)
        for qi in (2, 6):
            a = ivfpq_search(idx, rows[qi], k=10, nprobe=4).to_pandas()
            b = ivfpq_topk(ds, rows[qi], k=10, n_clusters=8, nprobe=4,
                           m=8, ks=32).to_pandas()
            assert a.equals(b)

    def test_ivfpq_rerank_recall(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.ann import ivfpq_build, ivfpq_search
        tbl, rows = _corpus()
        idx = ivfpq_build(rd.from_arrow(tbl), n_clusters=8, m=8, ks=32)
        got = ivfpq_search(idx, rows[0], k=10, nprobe=8, rerank=100,
                           exclude_ids=[0]).to_pandas()
        expect = set(_brute_topk(rows, rows[0], 10, {0}))
        assert len(set(got['vec_id']) & expect) / 10 >= 0.9
