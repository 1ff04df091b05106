"""SemDeDup (stages/dedup.semdedup): planted-duplicate recall, the
paper's keep rule, and bit-exact invariance under row order and
partitioning (every comparison is int64 micro-unit arithmetic)."""
import numpy as np
import pyarrow as pa
import pytest

from trafaret_ray.stages.dedup import semdedup


def _emb_table(mat: np.ndarray, ids=None) -> pa.Table:
    n, d = mat.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table({
        'vec_id': pa.array(np.asarray(ids, dtype=np.int64)),
        'embedding': pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1).astype(np.float64)), d)
            .cast(pa.list_(pa.float64())),
    })


def _planted(seed=11, n_base=40, n_dup_groups=8, dups_per=2, d=8):
    """Well-separated base vectors + near-copies (cos > 0.999) of the
    first ``n_dup_groups`` bases. Returns (matrix, group-of-row)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [base]
    owner = list(range(n_base))
    for g in range(n_dup_groups):
        for j in range(dups_per):
            noise = rng.standard_normal(d) * 1e-3
            v = base[g] + noise
            rows.append((v / np.linalg.norm(v))[None, :])
            owner.append(g)
    return np.vstack(rows), np.asarray(owner)


def _run(tbl, **kw):
    import ray.data as rd
    out = semdedup(rd.from_arrow(tbl).repartition(5), **kw)
    return out.to_pandas().sort_values('vec_id').reset_index(drop=True)


class TestSemDedup:
    def test_planted_groups_one_keep_each(self, ray_session):
        mat, owner = _planted()
        df = _run(_emb_table(mat), n_clusters=6, iters=4, threshold=0.99)
        assert len(df) == len(mat)
        # every planted group collapsed to ONE semantic group with
        # exactly one kept member; the copies share the base's group id
        for g in range(8):
            members = df[df['vec_id'].isin(np.nonzero(owner == g)[0])]
            assert members['group'].nunique() == 1
            assert members['group'].iloc[0] == g      # min id = the base
            assert int(members['keep'].sum()) == 1
            kept = members[members['keep']]
            # keep rule: least similar to centroid (ties -> min id)
            assert kept['cent_sim6'].iloc[0] <= \
                members['cent_sim6'].min()
        # non-duplicated bases stay their own singleton groups, kept
        solo = df[df['vec_id'].isin(np.arange(8, 40))]
        assert solo['keep'].all()
        assert (solo['group'] == solo['vec_id']).all()

    def test_row_order_and_partitioning_invariance(self, ray_session):
        import ray.data as rd
        mat, _ = _planted(seed=23, n_dup_groups=5)
        tbl = _emb_table(mat)
        perm = np.random.default_rng(3).permutation(len(mat))
        shuf = tbl.take(pa.array(perm))
        a = semdedup(rd.from_arrow(tbl).repartition(7),
                     n_clusters=5, iters=3, threshold=0.99).to_pandas()
        b = semdedup(rd.from_arrow(shuf).repartition(3),
                     n_clusters=5, iters=3, threshold=0.99).to_pandas()
        a = a.sort_values('vec_id').reset_index(drop=True)
        b = b.sort_values('vec_id').reset_index(drop=True)
        assert a.equals(b)

    def test_empty_and_all_null(self, ray_session):
        import ray.data as rd
        empty = _emb_table(np.zeros((0, 4)))
        out = semdedup(rd.from_arrow(empty))
        assert out.count() == 0
        nulls = pa.table({
            'vec_id': pa.array([1, 2], pa.int64()),
            'embedding': pa.array([None, None], pa.list_(pa.float64())),
        })
        out2 = semdedup(rd.from_arrow(nulls))
        assert out2.count() == 0
        # schema survives the empty path (CLAUDE.md invariant)
        assert set(out.schema().names) == {
            'vec_id', 'cluster', 'group', 'cent_sim6', 'keep'}

    def test_oversized_cluster_raises(self, ray_session):
        mat, _ = _planted(seed=5)
        with pytest.raises(Exception, match='cluster_rows_max'):
            _run(_emb_table(mat), n_clusters=1, iters=1,
                 threshold=0.99, cluster_rows_max=10)

    def test_exact_copies_dedup_to_min_id(self, ray_session):
        # 3 exact copies of one vector among distinct others: one group,
        # group id = min vec_id, exactly one keep (tie on cent_sim ->
        # min id keeps)
        rng = np.random.default_rng(9)
        others = rng.standard_normal((6, 4))
        others /= np.linalg.norm(others, axis=1, keepdims=True)
        v = np.array([0.5, 0.5, 0.5, 0.5])
        mat = np.vstack([others, v, v, v])
        df = _run(_emb_table(mat), n_clusters=3, iters=3, threshold=0.999)
        grp = df[df['vec_id'] >= 6]
        assert (grp['group'] == 6).all()
        assert int(grp['keep'].sum()) == 1
        assert df.loc[df['keep'] & (df['vec_id'] >= 6),
                      'vec_id'].iloc[0] == 6
