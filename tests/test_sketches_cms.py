"""Count-min sketch: overcount-only, bounded error, exact reproducibility."""

import numpy as np
import pyarrow as pa


def _corpus(n=30_000, seed=3):
    rng = np.random.default_rng(seed)
    # zipf: few heavy values, long tail
    return (rng.zipf(1.5, n) % 500).astype(np.int64)


class TestCountMin:
    def test_overcounts_only_within_bound(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.sketches import cms_build, cms_estimate
        vals = _corpus()
        ds = rd.from_arrow(pa.table({'v': pa.array(vals)}))
        sk = cms_build(ds, 'v', d=4, w=2048, num_shards=8)
        assert sk.shape == (4, 2048)
        assert sk.sum() == 4 * len(vals)          # every row sees all mass
        uniq, true = np.unique(vals, return_counts=True)
        est = cms_estimate(sk, uniq)
        assert (est >= true).all()                # CMS never undercounts
        # eps ~ e/w of total mass with prob 1 - e^-d
        assert (est - true).max() <= np.e / 2048 * len(vals) * 3

    def test_reproducible_across_partitionings(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.sketches import cms_build
        vals = _corpus(8_000, seed=9)
        t = pa.table({'v': pa.array(vals)})
        a = cms_build(rd.from_arrow(t), 'v', d=4, w=1024, num_shards=4)
        perm = np.random.default_rng(1).permutation(len(vals))
        t2 = pa.table({'v': pa.array(vals[perm])})
        b = cms_build(rd.from_arrow(t2).repartition(7), 'v',
                      d=4, w=1024, num_shards=4)
        assert (a == b).all()                     # integer sums — exact

    def test_nulls_not_counted_and_strings(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.sketches import cms_build, cms_estimate
        t = pa.table({'v': pa.array(['a', 'a', None, 'b'], pa.string())})
        sk = cms_build(rd.from_arrow(t), 'v', d=3, w=64, num_shards=4)
        assert sk.sum() == 3 * 3                  # 3 non-null rows
        est = cms_estimate(sk, np.array(['a', 'b'], dtype=object))
        assert est[0] >= 2 and est[1] >= 1
