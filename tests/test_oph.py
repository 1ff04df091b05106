"""One-permutation MinHash kernel (functions/text.py:minhash_matrix_oph):
estimator accuracy envelope, exact min-mergeability of raw partials, and
densification determinism. Pure numpy — no Ray."""
import numpy as np

from trafaret_ray.functions.text import (_OPH_MAX, densify_oph,
                                         minhash_matrix_oph)


def _two_sets(seed=0, n=20000, overlap=10000):
    rng = np.random.default_rng(seed)
    universe = rng.integers(0, 2 ** 63, 2 * n - overlap,
                            dtype=np.uint64).astype(np.uint64)
    a = universe[:n]
    b = universe[n - overlap:]
    j = overlap / (2 * n - overlap)
    return a, b, j


class TestOPH:
    def test_estimator_within_envelope(self):
        a, b, j = _two_sets()
        lengths = np.array([len(a), len(b)])
        hashes = np.concatenate([a, b])
        ests = []
        for seed in range(20):
            sig = minhash_matrix_oph(lengths, hashes, 64, seed=seed)
            ests.append(float((sig[0] == sig[1]).mean()))
        mean = np.mean(ests)
        stderr = np.sqrt(j * (1 - j) / 64) / np.sqrt(20)
        assert abs(mean - j) < 5 * stderr + 0.02

    def test_raw_partials_min_merge_exactly(self):
        a, _, _ = _two_sets(seed=3)
        full = minhash_matrix_oph(np.array([len(a)]), a, 64,
                                  densify=False)
        for cut in (1, 137, len(a) // 2, len(a) - 1):
            s1 = minhash_matrix_oph(np.array([cut]), a[:cut], 64,
                                    densify=False)
            s2 = minhash_matrix_oph(np.array([len(a) - cut]), a[cut:],
                                    64, densify=False)
            assert np.array_equal(np.minimum(s1, s2), full)
        assert np.array_equal(densify_oph(np.minimum(s1, s2)),
                              densify_oph(full))

    def test_identical_sets_estimate_one(self):
        a, _, _ = _two_sets(seed=5, n=500, overlap=0)
        lengths = np.array([len(a), len(a)])
        sig = minhash_matrix_oph(lengths, np.concatenate([a, a]), 64)
        assert (sig[0] == sig[1]).all()

    def test_densify_fills_from_filled_bins_only(self):
        # tiny set: most bins empty; after densify no sentinel remains
        vals = np.arange(3, dtype=np.uint64) * np.uint64(2 ** 40 + 17)
        sig = minhash_matrix_oph(np.array([3]), vals, 64, densify=False)
        assert (sig == _OPH_MAX).sum() >= 61
        d = densify_oph(sig)
        assert not (d == _OPH_MAX).any()
        # deterministic
        assert np.array_equal(d, densify_oph(sig))

    def test_zero_shingle_row_stays_sentinel(self):
        z = minhash_matrix_oph(np.array([0]),
                               np.array([], dtype=np.uint64), 64)
        assert (z == _OPH_MAX).all()
