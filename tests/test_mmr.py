"""MMR diverse top-k (stages/ann.mmr_topk): sequential-reference parity,
diversity behavior on planted clones, and partitioning invariance."""
import numpy as np
import pyarrow as pa

from trafaret_ray.stages.ann import mmr_topk


def _emb_table(mat, ids=None):
    n, d = mat.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table({
        'vec_id': pa.array(np.asarray(ids, dtype=np.int64)),
        'embedding': pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1).astype(np.float64)), d)
            .cast(pa.list_(pa.float64())),
    })


def _mmr_reference(mat, ids, q, k, lam):
    """Straight-line numpy MMR in the SAME integer arithmetic."""
    u = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qu = q / np.linalg.norm(q)
    sim6 = np.floor((u @ qu) * 1e6 + 0.5).astype(np.int64)
    u6 = np.floor(u * 1e6 + 0.5).astype(np.int64)
    lam_u = int(np.floor(lam * 1e6 + 0.5))
    picked, maxpair = [], None
    avail = list(range(len(ids)))
    for step in range(k):
        best_j, best_s = None, None
        for j in avail:
            red = 0 if maxpair is None else maxpair[j]
            s = lam_u * (sim6[j] * 1_000_000) - (1_000_000 - lam_u) * red
            if best_s is None or s > best_s or \
                    (s == best_s and ids[j] < ids[best_j]):
                best_j, best_s = j, s
        picked.append(best_j)
        avail.remove(best_j)
        pair = u6 @ u6[best_j]
        maxpair = pair if maxpair is None else np.maximum(maxpair, pair)
    return [int(ids[j]) for j in picked]


class TestMMR:
    def test_reference_parity_and_invariance(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(17)
        mat = rng.standard_normal((60, 8))
        q = rng.standard_normal(8)
        tbl = _emb_table(mat)
        want = _mmr_reference(mat, np.arange(60), q, 10, 0.5)
        a = mmr_topk(rd.from_arrow(tbl).repartition(6), q,
                     k=10, fetch_k=100, lam=0.5).to_pandas()
        assert list(a.sort_values('rank')['vec_id']) == want
        perm = rng.permutation(60)
        b = mmr_topk(rd.from_arrow(tbl.take(pa.array(perm)))
                     .repartition(3), q, k=10, fetch_k=100,
                     lam=0.5).to_pandas()
        assert a.sort_values('rank').reset_index(drop=True).equals(
            b.sort_values('rank').reset_index(drop=True))

    def test_clone_is_demoted(self, ray_session):
        import ray.data as rd
        # vec 0 is most relevant; vec 1 is its exact clone. Pure top-k
        # would rank the clone 2nd; diversity-weighted MMR (lam=0.3)
        # must demote it below the unrelated-but-relevant vectors.
        # (At lam=0.5 the clone legitimately wins the 3rd slot here:
        # 0.99875 - 1.0 > 0.8 - 0.829 — balanced MMR trades, it does
        # not ban duplicates.)
        q = np.array([1.0, 0.0, 0.0, 0.0])
        mat = np.array([
            [1.0, 0.05, 0.0, 0.0],     # 0: top relevance
            [1.0, 0.05, 0.0, 0.0],     # 1: exact clone of 0
            [0.8, 0.6, 0.0, 0.0],      # 2: relevant, different
            [0.8, 0.0, 0.6, 0.0],      # 3: relevant, different
        ])
        df = mmr_topk(rd.from_arrow(_emb_table(mat)), q, k=3,
                      fetch_k=10, lam=0.3).to_pandas()
        got = list(df.sort_values('rank')['vec_id'])
        assert got[0] == 0
        assert 1 not in got            # clone never makes diverse top-3
        assert set(got[1:]) == {2, 3}

    def test_lambda_one_is_pure_topk(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(3)
        mat = rng.standard_normal((30, 6))
        q = rng.standard_normal(6)
        df = mmr_topk(rd.from_arrow(_emb_table(mat)), q, k=5,
                      fetch_k=30, lam=1.0).to_pandas()
        u = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim6 = np.floor((u @ (q / np.linalg.norm(q))) * 1e6 + 0.5)
        want = list(np.lexsort((np.arange(30), -sim6))[:5])
        assert list(df.sort_values('rank')['vec_id']) == want

    def test_empty_and_zero_query(self, ray_session):
        import ray.data as rd
        empty = _emb_table(np.zeros((0, 4)))
        out = mmr_topk(rd.from_arrow(empty), np.ones(4))
        assert out.count() == 0
        out2 = mmr_topk(rd.from_arrow(_emb_table(np.eye(4))),
                        np.zeros(4))
        assert out2.count() == 0
