"""BPE trainer: exact parity with a straightforward reference
implementation (same count-max / lexicographic-min tie / leftmost
non-overlap rules), including the overlap chains ('aaa', 'banana')
the vectorized parity-run merge must get right."""

import random
from collections import Counter

from trafaret_ray.functions.text import bpe_train_from_word_counts


def _ref(wc, n):
    vocab = {tuple(w): c for w, c in wc.items() if w}
    out = []
    for _ in range(n):
        pairs = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        a, b = best
        out.append((a, b, a + b, mx))
        nv = {}
        for sym, c in vocab.items():
            s, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    s.append(a + b)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            nv[tuple(s)] = nv.get(tuple(s), 0) + c
        vocab = nv
    return out


class TestBPETrain:
    def test_classic_with_overlap_chains(self):
        wc = {'low': 5, 'lower': 2, 'newest': 6, 'widest': 3,
              'aaa': 4, 'aaaa': 2, 'banana': 3}
        assert bpe_train_from_word_counts(
            list(wc), list(wc.values()), 12) == _ref(wc, 12)

    def test_random_corpora(self):
        for seed in (3, 7, 11):
            rng = random.Random(seed)
            wc = {}
            for _ in range(400):
                w = ''.join(rng.choice('abcde')
                            for _ in range(rng.randint(1, 9)))
                wc[w] = wc.get(w, 0) + rng.randint(1, 20)
            assert bpe_train_from_word_counts(
                list(wc), list(wc.values()), 50) == _ref(wc, 50)

    def test_input_order_invariance(self):
        wc = {'abc': 3, 'bcd': 5, 'cde': 2, 'aaa': 7}
        items = list(wc.items())
        a = bpe_train_from_word_counts([w for w, _ in items],
                                       [c for _, c in items], 10)
        rev = items[::-1]
        b = bpe_train_from_word_counts([w for w, _ in rev],
                                       [c for _, c in rev], 10)
        assert a == b

    def test_empty_and_degenerate(self):
        assert bpe_train_from_word_counts([], [], 5) == []
        assert bpe_train_from_word_counts(['', 'x'], [3, 2], 5) == []
        assert bpe_train_from_word_counts(['ab'], [1], 3) \
            == [('a', 'b', 'ab', 1)]

    def test_unicode_symbols(self):
        wc = {'日本語': 4, '日本': 6, 'éé': 3}
        assert bpe_train_from_word_counts(
            list(wc), list(wc.values()), 6) == _ref(wc, 6)


class TestBPEEncode:
    def test_encode_matches_reference(self):
        from trafaret_ray.functions.text import bpe_encode_counts

        def ref_encode(t, merges):
            total = 0
            for w in (t or '').split(' '):
                if not w:
                    continue
                sym = list(w)
                for a, b, mg, _ in merges:
                    s, i = [], 0
                    while i < len(sym):
                        if i + 1 < len(sym) and sym[i] == a \
                                and sym[i + 1] == b:
                            s.append(mg)
                            i += 2
                        else:
                            s.append(sym[i])
                            i += 1
                    sym = s
                total += len(sym)
            return total

        wc = {'low': 5, 'lower': 2, 'newest': 6, 'widest': 3,
              'aaa': 4, 'banana': 3}
        m = bpe_train_from_word_counts(list(wc), list(wc.values()), 10)
        texts = ['low lower newest', 'widest low', '', None,
                 'zzz unknown', 'banana aaa aaaa', 'wi de st']
        got = bpe_encode_counts(texts, m)
        assert got.tolist() == [ref_encode(t, m) for t in texts]

    def test_encode_empty_merges(self):
        from trafaret_ray.functions.text import bpe_encode_counts
        assert bpe_encode_counts(['ab c', ''], []).tolist() == [3, 0]

    def test_encode_multibyte(self):
        from trafaret_ray.functions.text import bpe_encode_counts

        def ref_encode(t, merges):
            total = 0
            for w in (t or '').split(' '):
                if not w:
                    continue
                sym = list(w)
                for a, b, mg, _ in merges:
                    s, i = [], 0
                    while i < len(sym):
                        if i + 1 < len(sym) and sym[i] == a \
                                and sym[i + 1] == b:
                            s.append(mg)
                            i += 2
                        else:
                            s.append(sym[i])
                            i += 1
                    sym = s
                total += len(sym)
            return total

        wc = {'日本語': 5, '日本': 7, 'ééé': 4, 'é日': 3, '𝄞x𝄞': 2}
        m = bpe_train_from_word_counts(list(wc), list(wc.values()), 8)
        texts = ['日本語 日本 ない', 'ééé é日 zzz', '𝄞x𝄞 日本語', '', None]
        got = bpe_encode_counts(texts, m)
        assert got.tolist() == [ref_encode(t, m) for t in texts]
