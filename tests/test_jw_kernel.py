"""jaro_winkler_bytes differential vs DuckDB jaro_winkler_similarity:
random corpora, mutated near-dups, multibyte/control strings, and the
boost-at-exactly-0.7 edge. Pure numpy + duckdb — no Ray."""
import random

import duckdb
import numpy as np

from trafaret_ray.functions.text import jaro_winkler_bytes


def _duck(pairs):
    con = duckdb.connect()
    con.execute('create table t(a varchar, b varchar)')
    con.executemany('insert into t values (?,?)', pairs)
    return np.array([r[0] for r in con.execute(
        'select cast(floor(jaro_winkler_similarity(a,b)*1000000 + 0.5)'
        ' as bigint) from t').fetchall()])


class TestJWKernel:
    def test_known_values_and_edges(self):
        pairs = [('martha', 'marhta'), ('dixon', 'dicksonx'),
                 ('jellyfish', 'smellyfish'), ('abc', 'abc'),
                 ('', 'abc'), ('', ''), ('a', 'b'), ('crate', 'trace'),
                 ('dwayne', 'duane'), ('ab', 'ba'),
                 ('ée', 'ee'),                 # BYTE semantics
                 ('ab', 'abzzzzzz'),           # boosted
                 ('abcdefghzz', 'abzzzzzzzz'),  # 0.6: below threshold
                 ('e', 'ecbaccbabc')]          # jaro EXACTLY 0.7: boosts
        # (the dedup fast-path twin of ('','') lives in
        # stages/dedup._jw_by_code: equal EMPTY prefixes must score 0)
        got = jaro_winkler_bytes([p[0] for p in pairs],
                                 [p[1] for p in pairs])
        assert np.array_equal(got, _duck(pairs))
        assert got[-1] == 730000              # the 0.7-edge boost

    def test_random_differential(self):
        rng = random.Random(42)
        alpha = 'abcdefg '
        pairs = []
        for _ in range(4000):
            pairs.append((
                ''.join(rng.choice(alpha) for _ in range(rng.randint(0, 20))),
                ''.join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))))
        for _ in range(1500):   # realistic near-dups: few mutations
            base = ''.join(rng.choice(alpha)
                           for _ in range(rng.randint(10, 60)))
            mut = list(base)
            for _ in range(rng.randint(0, 4)):
                p = rng.randrange(len(mut))
                mut[p] = rng.choice(alpha)
            pairs.append((base, ''.join(mut)))
        got = jaro_winkler_bytes([p[0] for p in pairs],
                                 [p[1] for p in pairs])
        assert np.array_equal(got, _duck(pairs))

    def test_multibyte_differential(self):
        rng = random.Random(7)
        alpha = 'aébç日本 '
        pairs = [(''.join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
                  ''.join(rng.choice(alpha) for _ in range(rng.randint(0, 12))))
                 for _ in range(2000)]
        got = jaro_winkler_bytes([p[0] for p in pairs],
                                 [p[1] for p in pairs])
        assert np.array_equal(got, _duck(pairs))

    def test_long_strings_object_path(self):
        # > 512-byte strings exercise the object-int fallback
        a = ['x' * 600 + 'abc', 'y' * 700]
        b = ['x' * 600 + 'abd', 'y' * 700]
        got = jaro_winkler_bytes(a, b)
        assert np.array_equal(got, _duck(list(zip(a, b))))

    def test_by_code_empty_equal_is_zero(self):
        import numpy as np
        from trafaret_ray.stages.dedup import _jw_by_code
        ca = np.array([0, 1, 0])
        cb = np.array([0, 1, 1])
        got = _jw_by_code(ca, cb, np.array(['', 'abc'], dtype=object))
        assert got[0] == 0          # jw('','') = 0 (DuckDB)
        assert got[1] == 1_000_000  # jw('abc','abc') = 1
        assert got[2] == 0          # jw('','abc') = 0

    def test_hypothesis_differential(self):
        from hypothesis import given, settings, strategies as st
        # printable unicode incl. multibyte, no surrogates; DuckDB
        # varchar rejects NUL so exclude it
        alphabet = st.characters(min_codepoint=1, max_codepoint=0x2fff,
                                 blacklist_categories=('Cs',))
        text = st.text(alphabet=alphabet, max_size=24)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.tuples(text, text), min_size=1, max_size=8))
        def check(pairs):
            got = jaro_winkler_bytes([p[0] for p in pairs],
                                     [p[1] for p in pairs])
            assert np.array_equal(got, _duck(pairs))

        check()
