"""Damerau-Levenshtein kernel: differential parity against DuckDB.

DuckDB's damerau_levenshtein is the UNRESTRICTED (Lowrance-Wagner)
variant — 'CA'→'ABC' is 2 — computed over UTF-8 bytes. The banded,
pair-vectorized kernel must agree exactly for every distance <= max_dist
and clamp the rest to max_dist + 1.
"""

import random

import duckdb
import numpy as np

from trafaret_ray.functions.text import damerau_levenshtein_bytes as dl


def _duck(pairs):
    con = duckdb.connect()
    return [con.sql('select damerau_levenshtein(?, ?)',
                    params=[x, y]).fetchone()[0] for x, y in pairs]


def _diff(A, B, k):
    exp = np.minimum(np.array(_duck(list(zip(A, B)))), k + 1)
    got = dl([x.encode() for x in A], [y.encode() for y in B], k)
    return got, exp


class TestDamerauKernel:
    def test_unrestricted_signature_cases(self):
        got = dl([b'CA', b'kitten', b'abc', b'', b'a', b'ab'],
                 [b'ABC', b'sitting', b'abc', b'xy', b'', b'ba'], 16)
        # CA->ABC = 2 distinguishes unrestricted from OSA (=3)
        assert got.tolist() == [2, 3, 0, 2, 1, 1]

    def test_random_small_alphabet(self):
        random.seed(0)
        A = [''.join(random.choice('ab') for _ in range(
            random.randint(0, 20))) for _ in range(1500)]
        B = [''.join(random.choice('ab') for _ in range(
            random.randint(0, 20))) for _ in range(1500)]
        got, exp = _diff(A, B, 8)
        assert np.array_equal(got, exp)

    def test_multibyte_utf8(self):
        random.seed(1)
        alph = ['é', '日', 'a', '𝄞', '́']
        A = [''.join(random.choice(alph) for _ in range(
            random.randint(0, 10))) for _ in range(600)]
        B = [''.join(random.choice(alph) for _ in range(
            random.randint(0, 10))) for _ in range(600)]
        got, exp = _diff(A, B, 12)
        assert np.array_equal(got, exp)

    def test_band_edges(self):
        random.seed(2)
        A = [''.join(random.choice('abcdefgh') for _ in range(
            random.randint(30, 60))) for _ in range(300)]
        B = [''.join(random.choice('abcdefgh') for _ in range(
            random.randint(30, 60))) for _ in range(300)]
        for k in (4, 16, 32):
            got, exp = _diff(A, B, k)
            assert np.array_equal(got, exp), f'k={k}'

    def test_chunking_boundary(self):
        # force the internal pair-chunk split (CHUNK=8192)
        random.seed(3)
        A = [''.join(random.choice('abc') for _ in range(6))
             for _ in range(9000)]
        B = [''.join(random.choice('abc') for _ in range(6))
             for _ in range(9000)]
        whole = dl([x.encode() for x in A], [y.encode() for y in B], 6)
        head = dl([x.encode() for x in A[:100]],
                  [y.encode() for y in B[:100]], 6)
        assert np.array_equal(whole[:100], head)
