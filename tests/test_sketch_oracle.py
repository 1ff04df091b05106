"""Differential pins for the DuckDB-oracle-compatible sketch kernels.

duckdb_hash64 must stay byte-equal to SQL ``hash(x::BIGINT)`` — the HLL
(and KMV) oracles transcribe register/bottom-k computations into SQL on
that equality. Same pattern as the JW/DL kernel differentials
(tests/test_jw_kernel.py)."""

import math

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trafaret_ray.stages.sketches import (HLL, duckdb_hash64,
                                          hll_estimate_exact6)


def _sql_hash(vals):
    con = duckdb.connect()
    out = con.execute(
        "SELECT list(hash(x) ORDER BY i) FROM "
        "(SELECT row_number() OVER () AS i, unnest(?::BIGINT[]) AS x)",
        [list(map(int, vals))]).fetchone()[0]
    con.close()
    return [int(v) for v in out]


def test_hash_matches_duckdb_fixed():
    vals = [0, 1, -1, 42, -5, 2 ** 40 + 7, 2 ** 63 - 1, -(2 ** 63) + 1,
            123456789, -987654321]
    assert duckdb_hash64(vals).tolist() == _sql_hash(vals)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63) + 1,
                            max_value=2 ** 63 - 1),
                min_size=1, max_size=50))
def test_hash_matches_duckdb_fuzz(vals):
    assert duckdb_hash64(vals).tolist() == _sql_hash(vals)


def test_hash_accepts_null_padded_float_ids():
    # pandas null-padding floatifies int ids; the kernel must hash the
    # integral float round-trip identically to the original ints
    ids = np.array([3.0, 77.0, 2.0 ** 40], dtype=np.float64)
    assert duckdb_hash64(ids).tolist() == \
        duckdb_hash64(ids.astype(np.int64)).tolist()


def test_exact6_estimator_close_to_float_estimator():
    from trafaret_ray.stages.sketches import hll_estimate
    rng = np.random.default_rng(7)
    h = HLL(p=12, hash_mode='duckdb64').add(
        rng.integers(0, 2 ** 50, 20000))
    a, b = hll_estimate(h.regs), hll_estimate_exact6(h.regs)
    assert math.isclose(a, b, rel_tol=1e-9)
    # and the sketch is still an accurate distinct counter
    assert abs(b - 20000) / 20000 < 0.05


def test_exact6_small_range_branch():
    h = HLL(p=12, hash_mode='duckdb64').add(np.arange(50))
    est = hll_estimate_exact6(h.regs)
    assert abs(est - 50) / 50 < 0.25


def test_hll_rejects_unknown_hash_mode():
    with pytest.raises(ValueError):
        HLL(hash_mode='md5')


def test_kmv_at_capacity_matches_sql_estimate():
    # >k distinct ids forces the (k-1)/theta branch; the SQL expression
    # must produce the SAME double as kmv_estimate (duckdb64 hashes)
    from trafaret_ray.stages.sketches import kmv_estimate, kmv_partial
    k = 256
    rng = np.random.default_rng(3)
    ids = rng.choice(10 ** 12, size=5000, replace=False)
    mins = kmv_partial(ids, k, hash_mode='duckdb64')
    assert len(mins) == k
    eng = kmv_estimate(mins, k)
    con = duckdb.connect()
    got = con.execute(
        f"""WITH s AS (SELECT DISTINCT hash(x) AS h FROM
              (SELECT unnest(?::BIGINT[]) AS x) ORDER BY h LIMIT {k})
            SELECT CASE WHEN (SELECT count(*) FROM s) < {k}
                        THEN CAST((SELECT count(*) FROM s) AS DOUBLE)
                        WHEN (SELECT max(h) FROM s) > 0
                        THEN {float(k - 1)!r} /
                             ((SELECT max(h) FROM s)::DOUBLE
                              / {repr(float(1 << 64))})
                        ELSE {float(k)!r} END""",
        [ids.tolist()]).fetchone()[0]
    con.close()
    assert eng == got          # bit-equal, not isclose
    assert abs(eng - 5000) / 5000 < 0.15


# ---- string hash: duckdb_hash_str64 must stay byte-equal to SQL
# hash(x::VARCHAR) (MurmurHash64A, DuckDB seed) — the CMS oracle
# transcribes bucket indices on that equality.

def _sql_hash_str(vals):
    con = duckdb.connect()
    out = con.execute(
        "SELECT list(hash(x) ORDER BY i) FROM "
        "(SELECT row_number() OVER () AS i, unnest(?::VARCHAR[]) AS x)",
        [list(vals)]).fetchone()[0]
    con.close()
    return [int(v) for v in out]


def test_str_hash_matches_duckdb_fixed():
    from trafaret_ray.stages.sketches import duckdb_hash_str64
    vals = ['', 'a', 'ab', 'abcdefg', 'abcdefgh', 'abcdefghi',
            'x' * 100, 'hello world', 'é', '日本語テキスト',
            '\t\n', '🎉🎉🎉🎉🎉', 'the', 'a b c']
    assert duckdb_hash_str64(vals).tolist() == _sql_hash_str(vals)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1,
                max_size=50))
def test_str_hash_matches_duckdb_fuzz(vals):
    from trafaret_ray.stages.sketches import duckdb_hash_str64
    assert duckdb_hash_str64(vals).tolist() == _sql_hash_str(vals)


def test_str_hash_rejects_nulls_and_handles_sliced_input():
    import pyarrow as pa

    from trafaret_ray.stages.sketches import duckdb_hash_str64
    with pytest.raises(ValueError):
        duckdb_hash_str64(pa.array(['a', None]))
    arr = pa.array(['pad', 'a', 'bc', 'def'])
    assert duckdb_hash_str64(arr.slice(1)).tolist() == \
        duckdb_hash_str64(['a', 'bc', 'def']).tolist()


def test_cms_duckdb_positions_match_sql():
    # hash(xor(hash(tok), j)) % w — the exact expression the CMS
    # oracle's pos CTE uses
    from trafaret_ray.stages.sketches import _cms_rows
    toks = ['alpha', 'beta', '', 'gamma delta', 'é🎉']
    rows = _cms_rows(toks, d=4, w=16384, hash_mode='duckdb')
    con = duckdb.connect()
    for j in range(4):
        want = [con.execute(
            "select (hash(xor(hash(?::VARCHAR), ?::UBIGINT)) "
            "% 16384)::BIGINT", [t, j]).fetchone()[0] for t in toks]
        assert rows[j].tolist() == want
    con.close()


def test_cms_rows_rejects_unknown_hash_mode():
    from trafaret_ray.stages.sketches import _cms_rows
    with pytest.raises(ValueError):
        _cms_rows(['a'], d=2, w=64, hash_mode='md5')


# ---- minhash-family duckdb-mode kernels: the engine folds that the
# q_minhash_dedup_docs / q_curate_docs oracles transcribe as nested
# hash(xor(...)) SQL must stay byte-equal to DuckDB.

def test_shingle_fold_matches_duckdb():
    import pyarrow as pa

    from trafaret_ray.functions.text import shingle_hash_explode
    texts = pa.array(['a b c d', 'x y z', 'one two', '', 'é 日本 c x'])
    lengths, gd, gh = shingle_hash_explode(texts, 3, distinct=False,
                                           hash_mode='duckdb')
    con = duckdb.connect()
    want = []
    for t in ['a b c d', 'x y z', 'é 日本 c x']:
        ws = t.split(' ')
        for i in range(len(ws) - 2):
            want.append(con.execute(
                "select hash(xor(hash(xor(hash(?::VARCHAR), "
                "hash(?::VARCHAR))), hash(?::VARCHAR)))",
                ws[i:i + 3]).fetchone()[0])
    con.close()
    assert gh.tolist() == want
    assert lengths.tolist() == [2, 1, 0, 0, 2]


def test_minhash_perm_matches_duckdb():
    from trafaret_ray.functions.text import minhash_matrix
    gh = np.array([123456789, 2 ** 60 + 7, 42], dtype=np.uint64)
    sig = minhash_matrix(np.array([3]), gh, num_perm=4,
                         hash_mode='duckdb')
    con = duckdb.connect()
    for p in range(4):
        want = min(con.execute(
            "select hash(xor(?::UBIGINT, hash(?::BIGINT)))",
            [int(g), p]).fetchone()[0] for g in gh)
        assert int(sig[0, p]) == want
    con.close()


def test_band_fold_matches_duckdb():
    from trafaret_ray.functions.text import band_hashes
    sig = np.array([[11, 22, 33, 44, 55, 66, 77, 88]], dtype=np.uint64)
    bh = band_hashes(sig, num_bands=2, hash_mode='duckdb')
    con = duckdb.connect()
    for b in range(2):
        acc = 0
        for c in range(4):
            acc = con.execute(
                "select hash(xor(?::UBIGINT, ?::UBIGINT))",
                [acc, int(sig[0, b * 4 + c])]).fetchone()[0]
        assert int(bh[0, b]) == acc
    con.close()


def test_rademacher_planes_match_duckdb_hash_bits():
    # embedding_near_dup(hash_mode='duckdb') plane component for
    # (dim d, plane p) = ±1 from bit 0 of hash(d*6 + p)
    from trafaret_ray.stages.sketches import _murmur64_u64
    con = duckdb.connect()
    idx = np.arange(24, dtype=np.uint64)
    bits = (_murmur64_u64(idx) & np.uint64(1)).astype(int)
    want = [con.execute("select hash(?::BIGINT) & 1",
                        [int(i)]).fetchone()[0] for i in range(24)]
    con.close()
    assert bits.tolist() == [int(w) for w in want]


def test_str_hash_chunked_giant_value_path():
    # one space-free adversarial "token" must not inflate every row's
    # padding: the >64MB guard slices rows, each slice re-derives pad.
    # Equality with the unchunked per-value hash is the invariant.
    from trafaret_ray.stages.sketches import duckdb_hash_str64
    vals = ['tiny'] * 70000 + ['x' * (2 ** 20)] + ['tail'] * 3
    got = duckdb_hash_str64(vals)
    assert got[0] == duckdb_hash_str64(['tiny'])[0]
    assert got[70000] == duckdb_hash_str64(['x' * (2 ** 20)])[0]
    assert got[-1] == duckdb_hash_str64(['tail'])[0]
    assert _sql_hash_str(['x' * (2 ** 20)]) == [int(got[70000])]
