"""Dedup + text-analysis operators: planted-duplicate recall, exact
Jaccard parity, signature determinism."""

import numpy as np
import pyarrow as pa
import pytest

from trafaret_ray.functions import text as T


def corpus():
    rng = np.random.default_rng(5)
    vocab = ['alpha', 'beta', 'gamma', 'delta', 'eps', 'zeta', 'eta',
             'theta', 'iota', 'kappa', 'lam', 'mu']
    docs = [' '.join(rng.choice(vocab, 40)) for _ in range(100)]
    near = docs[0].split()
    near[5], near[20] = 'changed', 'words'
    docs.append(' '.join(near))   # id 100: near-dup of 0
    docs.append(docs[1])          # id 101: exact dup of 1
    return pa.table({'doc_id': list(range(len(docs))), 'text': docs})


class TestTextFunctions:
    def test_shingles(self):
        lengths, flat = T.word_shingles(['a b c d', 'x y'], k=3)
        # sub-k docs emit ZERO shingles — same semantics as
        # shingle_hash_explode and the SQL oracles (a whole-doc fallback
        # shingle would silently diverge from both)
        assert lengths.tolist() == [2, 0]
        assert set(flat) == {'a b c', 'b c d'}

    def test_minhash_similarity_estimate(self):
        # jaccard(sigA, sigB) agreement rate ~ true jaccard
        l1, f1 = T.word_shingles(['a b c d e f g h i j'], k=2)
        l2, f2 = T.word_shingles(['a b c d e f g h i XX'], k=2)
        s1 = T.minhash_matrix(l1, T.hash_shingles(f1), 256)
        s2 = T.minhash_matrix(l2, T.hash_shingles(f2), 256)
        est = (s1[0] == s2[0]).mean()
        sa = set(f1.tolist())
        sb = set(f2.tolist())
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(est - true_j) < 0.15

    def test_simhash_identical_docs(self):
        l, f = T.word_shingles(['one two three', 'one two three',
                                'totally different words'], k=1)
        s = T.simhash64(l, T.hash_shingles(f))
        assert s[0] == s[1]
        assert T.hamming_distance(s[:1], s[2:3])[0] > 0

    def test_fingerprint_deterministic(self):
        a = T.rolling_fingerprint(pa.array(['x', 'y', 'x']))
        assert a[0] == a[2] and a[0] != a[1]

    def test_language_id(self):
        langs, conf = T.language_id([
            'the cat and the dog went to the market',
            'der hund und die katze ist nicht da',
            'el perro y la casa es una cosa',
            'zzz qqq www'])
        assert langs.tolist() == ['en', 'de', 'es', 'unknown']
        assert conf[0] > 0

    def test_quality_features(self):
        q = T.quality_features(pa.array(['The cat, and DOG 42!', 'x']))
        assert q['n_words'][0].as_py() == 5
        assert q['punct_ratio'][0].as_py() > 0
        assert q['digit_ratio'][1].as_py() == 0

    def test_normalize_text(self):
        out = T.normalize_text(pa.array([
            '  Hello\t\tWORLD \n x ', 'ok']))
        assert out.to_pylist() == ['hello world x', 'ok']

    def test_repetition_signals(self):
        sig = T.repetition_signals(pa.array([
            'a\nb\na\na',          # 4 lines, 2 distinct -> dup 0.5
            'x y x y x y',         # bigrams: xy,yx,xy,yx,xy -> top 3/5
            'one two three',       # all distinct -> dup 0, top 1/2
            'solo',                # no bigram -> 0
        ]))
        assert list(np.round(sig['dup_line_frac'], 6)) == [0.5, 0, 0, 0]
        # doc 0 is a single space-token (newlines aren't word splits)
        assert list(np.round(sig['top_bigram_frac'], 6)) \
            == [0, 0.6, 0.5, 0]

    def test_token_counts(self):
        t = pa.array(['a b  c', 'one'])
        assert T.whitespace_token_count(t).to_pylist() == [4, 1]
        assert T.bpe_ish_token_count(
            pa.array(['hello world 123, ok!'])).to_pylist() == [6]


class TestDedupRay:
    def test_exact_dedup(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.dedup import exact_dedup
        out = exact_dedup(rd.from_arrow(corpus())).to_pandas()
        dups = out[out.n_dups > 1]
        assert dups['doc_id'].tolist() == [1]
        assert dups['n_dups'].tolist() == [2]
        assert len(out) == 101

    def test_ngram_jaccard_exact(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.dedup import ngram_jaccard_pairs
        out = ngram_jaccard_pairs(rd.from_arrow(corpus()), threshold=0.5,
                                  num_buckets=8).to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        assert out[['doc_a', 'doc_b']].values.tolist() == [[0, 100], [1, 101]]
        assert out['jaccard'].tolist()[1] == 1.0
        assert 0.6 < out['jaccard'].tolist()[0] < 0.8

    def test_pair_driven_verify_matches_allpairs_restricted(
            self, ray_session):
        """candidate_pair_jaccard's contract: identical output to
        ngram_jaccard_pairs(max_df=None, candidates=...) — the pair-
        driven verify only changes COST (pairs instead of per-shingle
        df^2), never results. Candidates include true dups, a partial
        overlap, and a zero-overlap pair (must drop on both paths)."""
        import ray.data as rd

        from trafaret_ray.stages.dedup import (candidate_pair_jaccard,
                                               ngram_jaccard_pairs)
        cand = rd.from_arrow(pa.table({
            'doc_a': pa.array([0, 1, 0, 2], pa.int64()),
            'doc_b': pa.array([100, 101, 1, 50], pa.int64())}))
        docs = rd.from_arrow(corpus())
        a = candidate_pair_jaccard(docs, cand, threshold=0.0,
                                   num_buckets=8).to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        b = ngram_jaccard_pairs(docs, threshold=0.0, max_df=None,
                                num_buckets=8, candidates=cand)\
            .to_pandas().sort_values(['doc_a', 'doc_b'])\
            .reset_index(drop=True)
        assert a.equals(b)
        assert set(map(tuple, a[['doc_a', 'doc_b']].values.tolist())) \
            <= {(0, 100), (1, 101), (0, 1), (2, 50)}
        assert {(0, 100), (1, 101)} <= \
            set(map(tuple, a[['doc_a', 'doc_b']].values.tolist()))

    def test_minhash_dedup_recall(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.dedup import minhash_dedup
        out = minhash_dedup(rd.from_arrow(corpus()),
                            threshold=0.5).to_pandas()
        clusters = dict(zip(out['doc_id'], out['cluster_id']))
        assert clusters[0] == clusters[100]
        assert clusters[1] == clusters[101]

    def test_minhash_dedup_many_batches(self, ray_session):
        """Candidates spanning many input blocks: 200 planted dup pairs
        over a 1000-doc corpus split into 16 blocks — the distributed
        verify must recover every planted cluster with the driver holding
        only edges."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import minhash_dedup
        rng = np.random.default_rng(5)
        vocab = [f'w{i}' for i in range(500)]
        texts, ids = [], []
        for i in range(600):
            ids.append(i)
            texts.append(' '.join(rng.choice(vocab, size=30)))
        # plant 200 exact dups of the first 200 docs, ids offset by 10000
        for i in range(200):
            ids.append(10000 + i)
            texts.append(texts[i])
        tbl = pa.table({'doc_id': pa.array(ids, type=pa.int64()),
                        'text': pa.array(texts)})
        ds = rd.from_arrow(tbl).repartition(16)
        out = minhash_dedup(ds, threshold=0.9).to_pandas()
        clusters = dict(zip(out['doc_id'], out['cluster_id']))
        for i in range(200):
            assert clusters.get(i) is not None
            assert clusters[i] == clusters[10000 + i]

    def test_simhash_exact_dup_distance_zero(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.dedup import simhash_candidates
        out = simhash_candidates(rd.from_arrow(corpus()), max_hamming=0,
                                 num_buckets=8).to_pandas()
        pairs = set(map(tuple, out[['doc_a', 'doc_b']].values.tolist()))
        assert (1, 101) in pairs

    def test_embedding_near_dup(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.dedup import embedding_near_dup
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((60, 16)).astype(np.float32)
        emb = np.vstack([emb, emb[7] * 1.001])
        tbl = pa.table({
            'vec_id': list(range(61)),
            'embedding': pa.array([list(map(float, r)) for r in emb],
                                  type=pa.list_(pa.float32()))})
        out = embedding_near_dup(rd.from_arrow(tbl), threshold=0.99,
                                 num_planes=4, num_buckets=4).to_pandas()
        assert [7, 60] in out[['id_a', 'id_b']].values.tolist()


class TestSketches:
    def test_hll_vs_exact(self, ray_session):
        import ray.data as rd
        import numpy as np
        from trafaret_ray.stages.sketches import hll_distinct, exact_distinct
        rng = np.random.default_rng(1)
        tbl = pa.table({
            'g': rng.choice(['a', 'b'], 20_000),
            'v': rng.integers(0, 3_000, 20_000),
        })
        exact = exact_distinct(rd.from_arrow(tbl), 'g', 'v').to_pandas()\
            .set_index('g')['n_distinct']
        approx = hll_distinct(rd.from_arrow(tbl), 'g', 'v').to_pandas()\
            .set_index('g')['approx_distinct']
        for g in ('a', 'b'):
            assert abs(approx[g] - exact[g]) / exact[g] < 0.05, g

    def test_ngram_jaccard_sizes_join_mode(self, ray_session):
        """sizes_mode='join' (the 10^12-doc scale path: size table never
        on the driver) produces exactly the broadcast-mode result."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import ngram_jaccard_pairs
        a = ngram_jaccard_pairs(rd.from_arrow(corpus()), threshold=0.5,
                                num_buckets=8).to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        b = ngram_jaccard_pairs(rd.from_arrow(corpus()), threshold=0.5,
                                num_buckets=8, sizes_mode='join')\
            .to_pandas()[['doc_a', 'doc_b', 'jaccard']]\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        assert a[['doc_a', 'doc_b']].values.tolist() \
            == b[['doc_a', 'doc_b']].values.tolist()
        assert np.allclose(a['jaccard'], b['jaccard'])

    def test_ngram_jaccard_auto_tier(self, ray_session):
        """'auto' (the default) censuses the size table and picks the
        tier; a tiny broadcast_sizes_max forces the join path — both
        byte-identical to explicit broadcast."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import ngram_jaccard_pairs
        base = ngram_jaccard_pairs(
            rd.from_arrow(corpus()), threshold=0.5, num_buckets=8,
            sizes_mode='broadcast').to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        for cap in (2_000_000, 1):   # auto->broadcast, auto->join
            got = ngram_jaccard_pairs(
                rd.from_arrow(corpus()), threshold=0.5, num_buckets=8,
                sizes_mode='auto', broadcast_sizes_max=cap)\
                .to_pandas()[['doc_a', 'doc_b', 'jaccard']]\
                .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
            assert base[['doc_a', 'doc_b']].values.tolist() \
                == got[['doc_a', 'doc_b']].values.tolist(), cap
            assert np.allclose(base['jaccard'], got['jaccard']), cap

    def test_candidate_pair_jaccard_sizes_join_mode(self, ray_session):
        """candidate_pair_jaccard's 'join' tier (sizes never on the
        driver) matches broadcast exactly, including the auto census."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import candidate_pair_jaccard
        cand = rd.from_arrow(pa.table({
            'doc_a': pa.array([0, 1, 0, 2], pa.int64()),
            'doc_b': pa.array([100, 101, 1, 50], pa.int64())}))
        docs = rd.from_arrow(corpus())
        base = candidate_pair_jaccard(
            docs, cand, threshold=0.0, num_buckets=8,
            sizes_mode='broadcast').to_pandas()\
            .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
        for mode, cap in (('join', 2_000_000), ('auto', 1)):
            got = candidate_pair_jaccard(
                docs, cand, threshold=0.0, num_buckets=8,
                sizes_mode=mode, broadcast_sizes_max=cap)\
                .to_pandas()[['doc_a', 'doc_b', 'jaccard']]\
                .sort_values(['doc_a', 'doc_b']).reset_index(drop=True)
            assert base[['doc_a', 'doc_b']].values.tolist() \
                == got[['doc_a', 'doc_b']].values.tolist(), mode
            assert np.allclose(base['jaccard'], got['jaccard']), mode

    def test_minhash_dedup_bloom_ids_mode(self, ray_session):
        """ids_mode='bloom' (no exact id broadcast) yields the identical
        clustering: Bloom false positives only admit extra docs into the
        verify, where the candidate-pair restriction drops them."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import minhash_dedup
        a = minhash_dedup(rd.from_arrow(corpus()),
                          threshold=0.5).to_pandas()
        b = minhash_dedup(rd.from_arrow(corpus()), threshold=0.5,
                          ids_mode='bloom').to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestHeavyHitters:
    def test_skewed_exact_via_sketch(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.sketches import heavy_hitters
        rng = np.random.default_rng(2)
        # Zipf-ish: a few heavy keys + long tail
        vals = np.concatenate([
            np.repeat([f'top{i}' for i in range(5)], 500),
            np.array([f'tail{i}' for i in range(2000)])])
        rng.shuffle(vals)
        ds = rd.from_arrow(pa.table({'v': vals})).repartition(8)
        out = heavy_hitters(ds, 'v', k=5, expansion=8).to_pandas()
        assert sorted(out['v']) == [f'top{i}' for i in range(5)]
        assert (out['n'] == 500).all()

    def test_flat_distribution_falls_back_exact(self, ray_session):
        """Flat data defeats the truncated summaries: the certification
        threshold fails and the exact full-count fallback must produce
        the true top-k anyway."""
        import ray.data as rd
        from trafaret_ray.stages.sketches import heavy_hitters
        rng = np.random.default_rng(4)
        # 4000 distinct keys, nearly uniform; true top-3 appear +2 times
        base = np.array([f'k{i:05d}' for i in range(4000)])
        vals = np.concatenate([np.repeat(base, 2),
                               np.repeat(['k00007', 'k00011', 'k00013'],
                                         2)])
        rng.shuffle(vals)
        ds = rd.from_arrow(pa.table({'v': vals})).repartition(16)
        out = heavy_hitters(ds, 'v', k=3, expansion=2).to_pandas()
        assert sorted(out['v']) == ['k00007', 'k00011', 'k00013']
        assert (out['n'] == 4).all()


class TestRedaction:
    def test_patterns_and_counts(self, ray_session):
        import pyarrow as pa
        from trafaret_ray.functions.text import redact_text
        out = redact_text(pa.array([
            'mail bob@example.com or alice@test.org',
            'see https://a.io/x and http://b.co',
            'call 555-123-4567',
            'nothing here', None]))
        assert out.to_pylist() == [
            'mail <EMAIL> or <EMAIL>',
            'see <URL> and <URL>',
            'call <PHONE>',
            'nothing here', None]

    def test_redaction_null_text_propagates(self, ray_session):
        """Null text yields NULL redacted text and NULL count (oracle
        parity), never garbage from a NaN->int cast."""
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq, tempfile, os
        from trafaret_ray.pipelines.queries import (QUERIES, ORACLE_SQL)
        tbl = pa.table({'doc_id': pa.array([0, 1, 2], type=pa.int64()),
                        'text': pa.array(['mail a@b.co', None, 'x'])})
        d = tempfile.mkdtemp()
        pq.write_table(tbl, os.path.join(d, 'documents.parquet'))
        got = QUERIES['q_redact_docs'](d).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        exp = con.sql(ORACLE_SQL['q_redact_docs']).df()
        assert got['text_redacted'].tolist()[0] == '<EMAIL>'.join(
            ['mail ', ''])
        a, b = got['n_redactions'], exp['n_redactions']
        assert (pd.isna(a) == pd.isna(b)).all()
        assert a.iloc[0] == b.iloc[0] == 1 and pd.isna(a.iloc[1])


class TestProfile:
    def test_edge_columns(self, ray_session):
        """All-null column still profiles (n_distinct=0, null extremes);
        int64 beyond 2^53 doesn't crash; -0.0 == 0.0 for DISTINCT."""
        import pandas as pd
        import ray.data as rd
        from trafaret_ray.stages.sketches import profile_columns
        tbl = pa.table({
            'big': pa.array([2**53 + 1, 2**53 + 3, 2**53 + 1],
                            type=pa.int64()),
            'allnull': pa.array([None, None, None], type=pa.float64()),
            'zeros': pa.array([0.0, -0.0, 1.0]),
        })
        out = profile_columns(rd.from_arrow(tbl).repartition(2),
                              ['big', 'allnull', 'zeros']).to_pandas()\
            .set_index('column')
        assert out.loc['big', 'n_distinct'] == 2
        assert out.loc['allnull', 'n_distinct'] == 0
        assert out.loc['allnull', 'n_nulls'] == 3
        assert pd.isna(out.loc['allnull', 'vmin'])
        assert out.loc['zeros', 'n_distinct'] == 2   # -0.0 == 0.0
        assert (out['n_rows'] == 3).all()


class TestSortedNeighborhood:
    def test_snm_matches_brute_force(self, ray_session):
        """sorted_neighborhood_pairs == the single-process definition
        (rank by (prefix, id), all pairs within the window, levenshtein
        filter) on a corpus engineered to cross every distributed
        seam: multiple range buckets, multiple rank blocks (block_size
        16 << n), identical-prefix runs (rank ties broken by id), and
        planted near-dups at block boundaries."""
        import ray.data as rd

        from trafaret_ray.functions import text as T
        from trafaret_ray.stages.dedup import sorted_neighborhood_pairs

        rng = np.random.default_rng(7)
        letters = np.array(list('abcdefghij'))
        texts, ids = [], []
        for i in range(120):
            base = ''.join(rng.choice(letters, size=20))
            texts.append(base)
            ids.append(i)
            if i % 7 == 0:                    # planted near-dup
                texts.append(base[:-1] + 'z')
                ids.append(1000 + i)
            if i % 11 == 0:                   # exact duplicate run
                texts.append(base)
                ids.append(2000 + i)
        tbl = pa.table({'doc_id': pa.array(ids, pa.int64()),
                        'text': pa.array(texts)})
        window, max_dist, pfx = 5, 6, 16

        out = sorted_neighborhood_pairs(
            rd.from_arrow(tbl), prefix_cp=pfx, window=window,
            max_dist=max_dist, num_buckets=4, block_size=16)\
            .to_pandas().sort_values(['rank_a', 'rank_b'])\
            .reset_index(drop=True)

        # single-process oracle
        pref = [t[:pfx] for t in texts]
        order = sorted(range(len(ids)), key=lambda i: (pref[i], ids[i]))
        exp = []
        for p in range(len(order)):
            for q in range(p + 1, min(p + window + 1, len(order))):
                a, b = order[p], order[q]
                d = int(T.levenshtein_bytes(
                    [pref[a].encode()], [pref[b].encode()],
                    max_dist)[0])
                if d <= max_dist:
                    exp.append((ids[a], ids[b], p, q, d))
        exp.sort(key=lambda r: (r[2], r[3]))
        got = list(map(tuple, out[['doc_a', 'doc_b', 'rank_a',
                                   'rank_b', 'edist']].values.tolist()))
        assert got == exp
        assert len(exp) > 20          # the fixture actually has pairs

    def test_snm_empty_and_all_null(self, ray_session):
        import ray.data as rd

        from trafaret_ray.stages.dedup import sorted_neighborhood_pairs
        tbl = pa.table({'doc_id': pa.array([1, 2], pa.int64()),
                        'text': pa.array([None, None], pa.string())})
        out = sorted_neighborhood_pairs(rd.from_arrow(tbl)).to_pandas()
        assert len(out) == 0
