"""interval_join: differential against the brute-force O(n*m) overlap
join — the replication + responsibility rule must emit every
overlapping pair EXACTLY once, for any bucket width, boundary
straddles, zero-length intervals and negative coordinates."""

import numpy as np
import pyarrow as pa

from trafaret_ray.stages.joins import interval_join


def _mk(ids, los, his):
    return pa.table({'id': pa.array(ids, pa.int64()),
                     'lo': pa.array(los, pa.int64()),
                     'hi': pa.array(his, pa.int64())})


_SCHEMA = pa.schema([('id', pa.int64()), ('lo', pa.int64()),
                     ('hi', pa.int64())])


def _run(left_tbl, right_tbl, bucket_us):
    import ray.data as rd
    out = interval_join(rd.from_arrow(left_tbl), rd.from_arrow(right_tbl),
                        bucket_us=bucket_us, num_buckets=4,
                        left_schema=_SCHEMA, right_schema=_SCHEMA)
    pairs = [(r['id_a'], r['id_b']) for r in out.take_all()]
    assert len(pairs) == len(set(pairs)), 'duplicate pair emitted'
    return set(pairs)


def _brute(left_tbl, right_tbl):
    la = left_tbl.to_pandas()
    rb = right_tbl.to_pandas()
    out = set()
    for _, a in la.iterrows():
        for _, b in rb.iterrows():
            if a['lo'] <= b['hi'] and b['lo'] <= a['hi']:
                out.add((a['id'], b['id']))
    return out


def _random_intervals(n, rng, span=1000, maxlen=120):
    lo = rng.integers(-span, span, n)
    ln = rng.integers(0, maxlen, n)
    return _mk(np.arange(n), lo, lo + ln)


class TestIntervalJoin:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(3)
        A = _random_intervals(120, rng)
        B = _random_intervals(90, rng)
        for w in (64, 100, 1000, 10**9):
            assert _run(A, B, w) == _brute(A, B), f'bucket_us={w}'

    def test_boundary_straddle_and_touch(self, ray_session):
        # intervals meeting exactly at a bucket edge (closed: touch =
        # overlap), straddling several buckets, zero-length points
        A = _mk([1, 2, 3], [0, 99, 250], [100, 99, 610])
        B = _mk([10, 11, 12], [100, 99, 599], [150, 99, 599])
        assert _run(A, B, 100) == _brute(A, B)

    def test_self_join_orientations(self, ray_session):
        A = _mk([1, 2, 3], [0, 50, 200], [100, 150, 300])
        got = _run(A, A, 64)
        assert got == _brute(A, A)
        assert (1, 1) in got and (1, 2) in got and (2, 1) in got

    def test_null_bounds_drop(self, ray_session):
        A = pa.table({'id': pa.array([1, 2], pa.int64()),
                      'lo': pa.array([0, None], pa.int64()),
                      'hi': pa.array([10, 20], pa.int64())})
        B = _mk([7], [5], [6])
        assert _run(A, B, 100) == {(1, 7)}


class TestTieredPath:
    def test_tiered_search_matches_brute(self, ray_session):
        # one giant interval + many points: force the tiered branch
        # (tier_slots=0) and compare against the single-band default
        rng = np.random.default_rng(9)
        n = 150
        lo = rng.integers(0, 5000, n)
        ln = rng.integers(0, 40, n)
        ln[0] = 100_000           # the giant: overlaps everything
        A = _mk(np.arange(n), lo, lo + ln)
        B = _mk(np.arange(100, 100 + n), lo[::-1], lo[::-1] + ln[::-1])
        exp = _brute(A, B)
        for w in (128, 1024):
            import ray.data as rd
            from trafaret_ray.stages.joins import interval_join
            out = interval_join(rd.from_arrow(A), rd.from_arrow(B),
                                bucket_us=w, num_buckets=4,
                                left_schema=_SCHEMA,
                                right_schema=_SCHEMA,
                                tier_slots=0)
            pairs = [(r['id_a'], r['id_b']) for r in out.take_all()]
            assert len(pairs) == len(set(pairs))
            assert set(pairs) == exp, w


class TestOutputBudgetGuards:
    def test_max_span_raises_on_mega_interval(self, ray_session):
        import pytest
        import ray.data as rd
        import ray.exceptions
        A = _mk([1, 2, 3], [0, 10, 20], [5, 15, 10_000_000])
        out = interval_join(rd.from_arrow(A), rd.from_arrow(A),
                            bucket_us=100, num_buckets=2,
                            left_schema=_SCHEMA, right_schema=_SCHEMA,
                            max_span=1_000)
        with pytest.raises(ray.exceptions.RayTaskError,
                           match='max_span'):
            out.count()

    def test_max_pairs_per_bucket_raises_on_dense_bucket(
            self, ray_session):
        import pytest
        import ray.data as rd
        import ray.exceptions
        # 60 intervals all overlapping inside one bucket -> 3600 pairs
        n = 60
        A = _mk(list(range(n)), [0] * n, [99] * n)
        out = interval_join(rd.from_arrow(A), rd.from_arrow(A),
                            bucket_us=1_000, num_buckets=2,
                            left_schema=_SCHEMA, right_schema=_SCHEMA,
                            max_pairs_per_bucket=500)
        with pytest.raises(ray.exceptions.RayTaskError,
                           match='max_pairs_per_bucket'):
            out.count()

    def test_budgets_off_and_within_budget_match_brute(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(11)
        los = rng.integers(0, 500, 40)
        his = los + rng.integers(0, 50, 40)
        A = _mk(list(range(40)), los.tolist(), his.tolist())
        B = _mk(list(range(100, 140)), los[::-1].tolist(),
                his[::-1].tolist())
        want = _brute(A, B)
        out = interval_join(rd.from_arrow(A), rd.from_arrow(B),
                            bucket_us=100, num_buckets=4,
                            left_schema=_SCHEMA, right_schema=_SCHEMA,
                            max_span=10_000,
                            max_pairs_per_bucket=1_000_000)
        pairs = {(r['id_a'], r['id_b']) for r in out.take_all()}
        assert pairs == want
