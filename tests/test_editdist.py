"""Edit-distance kernel + editdist_pairs stage.

The kernel's contract is byte-for-byte DuckDB ``levenshtein`` parity for
every value <= max_dist (values above come back capped at max_dist + 1) —
the property the q_editdist_pairs_docs oracle gate rides on.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from trafaret_ray.functions.text import levenshtein_bytes


def _ref(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


class TestLevenshteinKernel:
    def test_known_values(self):
        a = [b'kitten', b'', b'ab', b'abc', b'same']
        b = [b'sitting', b'ab', b'', b'abc', b'same']
        assert levenshtein_bytes(a, b, 16).tolist() == [3, 2, 2, 0, 0]

    def test_multibyte_utf8_is_byte_based(self):
        # DuckDB semantics: levenshtein('héllo','hello') = 2 (bytes)
        got = levenshtein_bytes(['héllo'.encode(), '日本'.encode()],
                                ['hello'.encode(), '日本語'.encode()], 16)
        assert got.tolist() == [2, 3]

    def test_cap_above_max_dist(self):
        got = levenshtein_bytes([b'aaaaaaaaaa', b'x' * 40],
                                [b'bbbbbbbbbb', b''], 3)
        assert got.tolist() == [4, 4]

    def test_empty_input(self):
        assert levenshtein_bytes([], [], 5).tolist() == []

    def test_random_differential(self):
        rng = np.random.default_rng(11)
        alpha = [c.encode('utf-8') for c in 'abcé日\x00 ']
        pairs = []
        for _ in range(600):
            la, lb = rng.integers(0, 18, size=2)
            pairs.append((b''.join(alpha[i] for i in
                                   rng.integers(0, len(alpha), la)),
                          b''.join(alpha[i] for i in
                                   rng.integers(0, len(alpha), lb))))
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        for k in (0, 2, 7, 32):
            got = levenshtein_bytes(a, b, k)
            exp = np.array([min(_ref(x, y), k + 1) for x, y in pairs])
            assert (got == exp).all()

    def test_out_of_band_pairs_capped_not_stale(self):
        # mixed lengths force the band to exit for some pairs while
        # others still read results — the readout must never pick up a
        # stale cell from two DP rows ago
        a = [b'abcdefghijklmnop', b'abc', b'abcdefgh' * 6]
        b = [b'abcdefghijklmnop', b'abcdefghijklmnopqrstuvwx', b'abc']
        got = levenshtein_bytes(a, b, 4)
        assert got.tolist() == [0, 5, 5]


class TestEditdistPairsStage:
    def _docs(self):
        return pa.table({
            'doc_id': pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            'text': pa.array(['the quick brown fox', 'the quick brown fax',
                              'totally different text here',
                              'the quick brown fox',  # exact dup of 1
                              None, 'blocked away']),
            'lang': pa.array(['en', 'en', 'en', 'en', 'en', None]),
            'band': pa.array([0, 0, 0, 0, 0, 0], pa.int64()),
        })

    def test_pairs_and_null_blocks(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        out = editdist_pairs(rd.from_arrow(self._docs()),
                             ['lang', 'band'], max_dist=3,
                             num_buckets=4).to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        # doc 5 (null text) and doc 6 (null lang) never pair; doc 3 is
        # beyond distance 3 from everything
        assert out[['doc_a', 'doc_b', 'edist']].values.tolist() == \
            [[1, 2, 1], [1, 4, 0], [2, 4, 1]]

    def test_blocking_excludes_cross_block(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        t = pa.table({
            'doc_id': pa.array([1, 2], pa.int64()),
            'text': pa.array(['same text', 'same text']),
            'lang': pa.array(['en', 'de']),
            'band': pa.array([0, 0], pa.int64()),
        })
        out = editdist_pairs(rd.from_arrow(t), ['lang', 'band'],
                             num_buckets=4).to_pandas()
        assert len(out) == 0

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        out = editdist_pairs(rd.from_arrow(self._docs().slice(0, 0)),
                             ['lang', 'band'], num_buckets=4).to_pandas()
        assert len(out) == 0

    def test_dense_block_fanout_parity(self, ray_session):
        # a dense block above fanout_block_docs must auto-escalate to
        # the chunk-pair fan-out and return EXACTLY the one-task result
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        rng = np.random.default_rng(11)
        base = 'the quick brown fox jumps over the lazy dog'
        texts, langs = [], []
        for i in range(120):
            s = list(base)
            for _ in range(int(rng.integers(0, 4))):
                s[int(rng.integers(0, len(s)))] = \
                    chr(ord('a') + int(rng.integers(0, 26)))
            texts.append(''.join(s))
            langs.append('en' if i % 3 else 'de')
        t = pa.table({
            'doc_id': pa.array(np.arange(120, dtype=np.int64)),
            'text': pa.array(texts),
            'lang': pa.array(langs),
            'band': pa.array(np.zeros(120, dtype=np.int64)),
        })

        def run(**kw):
            return editdist_pairs(rd.from_arrow(t), ['lang', 'band'],
                                  max_dist=6, num_buckets=4, **kw)\
                .to_pandas().sort_values(['doc_a', 'doc_b'])\
                .reset_index(drop=True)

        brute = run(fanout_block_docs=None)
        fanned = run(fanout_block_docs=10)   # both blocks go hot
        mixed = run(fanout_block_docs=50)    # 'en' hot, 'de' cold
        assert len(brute) > 100              # dense: real pair volume
        pd.testing.assert_frame_equal(brute, fanned)
        pd.testing.assert_frame_equal(brute, mixed)

    def test_block_docs_max_raises(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        t = pa.table({
            'doc_id': pa.array(np.arange(30, dtype=np.int64)),
            'text': pa.array(['same text'] * 30),
            'lang': pa.array(['en'] * 30),
            'band': pa.array(np.zeros(30, dtype=np.int64)),
        })
        with pytest.raises(ValueError, match='block_docs_max'):
            editdist_pairs(rd.from_arrow(t), ['lang', 'band'],
                           num_buckets=4, fanout_block_docs=5,
                           block_docs_max=20,
                           on_oversize='raise').to_pandas()

    def _near_dup_block(self, n, lang, rng, base=None):
        # near-identical multi-word prefixes: the LSH-escalation
        # regime (word-2-shingle Jaccard stays high, recall ~1)
        base = base or ('the quick brown fox jumps over the '
                        'lazy dog tonight')
        texts = []
        for _ in range(n):
            s = list(base)
            for _ in range(int(rng.integers(0, 2))):
                s[int(rng.integers(0, len(s)))] = \
                    chr(ord('a') + int(rng.integers(0, 26)))
            texts.append(''.join(s))
        return texts, [lang] * n

    def test_oversize_block_lsh_escalation_parity(self, ray_session):
        # a block forced above block_docs_max must AUTO-ESCALATE to the
        # LSH-prefilter path (on_oversize='lsh' default) instead of
        # raising, and on a near-identical planted block the escalated
        # pairs must EQUAL the exact path's (verify kernel is shared,
        # banding recall ~1 in this regime); cold and fan tiers keep
        # their exact results alongside
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        rng = np.random.default_rng(5)
        texts, langs = self._near_dup_block(24, 'en', rng)
        t2, l2 = self._near_dup_block(8, 'fr', rng)   # fan tier
        t3, l3 = self._near_dup_block(3, 'de', rng)   # cold tier
        texts += t2 + t3
        langs += l2 + l3
        t = pa.table({
            'doc_id': pa.array(np.arange(len(texts), dtype=np.int64)),
            'text': pa.array(texts),
            'lang': pa.array(langs),
            'band': pa.array(np.zeros(len(texts), dtype=np.int64)),
        })

        def run(**kw):
            return editdist_pairs(rd.from_arrow(t), ['lang', 'band'],
                                  max_dist=6, num_buckets=4, **kw)\
                .to_pandas().sort_values(['doc_a', 'doc_b'])\
                .reset_index(drop=True)

        exact = run(fanout_block_docs=None)
        esc = run(fanout_block_docs=5, block_docs_max=10)
        assert len(exact) > 100
        pd.testing.assert_frame_equal(exact, esc)

    def test_jw_oversize_block_lsh_escalation_parity(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import jw_pairs
        rng = np.random.default_rng(9)
        texts, langs = self._near_dup_block(24, 'en', rng)
        t3, l3 = self._near_dup_block(4, 'de', rng)
        texts += t3
        langs += l3
        t = pa.table({
            'doc_id': pa.array(np.arange(len(texts), dtype=np.int64)),
            'text': pa.array(texts),
            'lang': pa.array(langs),
            'band': pa.array(np.zeros(len(texts), dtype=np.int64)),
        })

        def run(**kw):
            return jw_pairs(rd.from_arrow(t), ['lang', 'band'],
                            min_sim6=900_000, num_buckets=4, **kw)\
                .to_pandas().sort_values(['doc_a', 'doc_b'])\
                .reset_index(drop=True)

        exact = run(block_docs_max=None)
        esc = run(block_docs_max=10)
        assert len(exact) > 100
        pd.testing.assert_frame_equal(exact, esc)
        with pytest.raises(ValueError, match='block_docs_max'):
            run(block_docs_max=10, on_oversize='raise')

    def test_string_doc_ids(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import editdist_pairs
        t = pa.table({
            'doc_id': pa.array(['a1', 'b2', 'c3']),
            'text': pa.array(['same text here', 'same text hero',
                              'entirely unrelated string']),
            'lang': pa.array(['en', 'en', 'en']),
            'band': pa.array([0, 0, 0], pa.int64()),
        })
        out = editdist_pairs(rd.from_arrow(t), ['lang', 'band'],
                             max_dist=2, num_buckets=4).to_pandas()
        assert out[['doc_a', 'doc_b', 'edist']].values.tolist() == \
            [['a1', 'b2', 1]]
