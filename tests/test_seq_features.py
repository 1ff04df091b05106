"""The late-r3 sequence/corpus-statistics query family (SCD2,
transitions, BM25, rolling median, histogram, pareto, attribution,
PMI, bigram-LM, keywords, OHLC, burst, inverted index, A/B z-test,
item co-occurrence, assoc rules, group k-fold, Gram matrix, trend,
census percentile, TWA, golden record, KM survival, drawdown, WoW
growth, cross-correlation — pipelines/queries.py). Exact expected
outputs on hand-built fixtures; sf-scale oracle parity is covered by
tools/check_queries.py."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trafaret_ray.pipelines.queries import (
    _pareto_keep, q_ab_test_events, q_assoc_rules_events,
    q_attribution_events, q_bm25_docs,
    q_burst_events, q_drawdown_events, q_golden_record_events,
    q_groupkfold_events, q_histogram_events,
    q_gram_embeddings, q_inverted_index_docs, q_item_cooc_events,
    q_keywords_docs, q_ks_drift_events, q_lm_score_docs,
    q_ohlc_events, q_pareto_users,
    q_pmi_bigrams_docs, q_quality_percentile_docs,
    q_rolling_median_events, q_scd2_events, q_survival_users,
    q_transitions_events, q_trend_events, q_twa_events,
    q_wow_growth_events, q_xcorr_events)


TS0 = pd.Timestamp('2024-01-01')


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, minutes, event_type[, value])."""
    tbl = pa.table({
        'event_id': pa.array([r[0] for r in rows], type=pa.int64()),
        'user_id': pa.array([r[1] for r in rows], type=pa.int64()),
        'ts': pa.array([TS0 + pd.Timedelta(minutes=r[2]) for r in rows],
                       type=pa.timestamp('us')),
        'event_type': pa.array([r[3] for r in rows], type=pa.string()),
        'value': pa.array([r[4] if len(r) > 4 else 1.0 for r in rows],
                          type=pa.float64()),
        'props': pa.array(['{}'] * len(rows), type=pa.string()),
    })
    pq.write_table(tbl, f'{tmp_path}/events.parquet')
    return str(tmp_path)


class TestScd2:
    def test_runs_compress_to_intervals(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [
            (0, 1, 0, 'view'), (1, 1, 5, 'view'), (2, 1, 9, 'click'),
            (3, 1, 12, 'view'),
            (4, 2, 0, None), (5, 2, 3, None), (6, 2, 7, 'buy'),
        ])
        df = q_scd2_events(sf).to_pandas()
        assert list(df['user_id']) == [1, 1, 1, 2, 2]
        assert list(df['run_seq']) == [1, 2, 3, 1, 2]
        assert list(df['state'].fillna('~')) == \
            ['view', 'click', 'view', '~', 'buy']
        assert list(df['n_events']) == [2, 1, 1, 2, 1]
        # valid_to chains to the next run's start; open run is NULL
        assert df['valid_to'].iloc[0] == df['valid_from'].iloc[1]
        assert df['valid_to'].iloc[1] == df['valid_from'].iloc[2]
        assert pd.isna(df['valid_to'].iloc[2])       # user 1 current
        assert df['valid_to'].iloc[3] == df['valid_from'].iloc[4]
        assert pd.isna(df['valid_to'].iloc[4])       # user 2 current
        # intervals tile the user's history: from[k+1] == to[k]
        assert df['valid_from'].iloc[0] == TS0

    def test_null_state_runs_merge(self, ray_session, tmp_path):
        # NULL IS NOT DISTINCT FROM NULL: consecutive nulls are ONE run
        sf = _write_events(tmp_path, [
            (0, 1, 0, None), (1, 1, 1, None), (2, 1, 2, None)])
        df = q_scd2_events(sf).to_pandas()
        assert len(df) == 1
        assert df['n_events'].iloc[0] == 3


class TestTransitions:
    def test_counts_probs_entropy(self, ray_session, tmp_path):
        # user 1: a->b, b->a, a->b ; user 2: a->b  (no cross-user pair)
        sf = _write_events(tmp_path, [
            (0, 1, 0, 'a'), (1, 1, 1, 'b'), (2, 1, 2, 'a'),
            (3, 1, 3, 'b'), (4, 2, 0, 'a'), (5, 2, 1, 'b'),
        ])
        df = q_transitions_events(sf)
        df = df.set_index(['src', 'dst'])
        assert df.loc[('a', 'b'), 'n'] == 3
        assert df.loc[('b', 'a'), 'n'] == 1
        assert len(df) == 2
        # src 'a' is deterministic -> p=1, entropy 0
        assert df.loc[('a', 'b'), 'p'] == 1.0
        assert df.loc[('a', 'b'), 'src_entropy'] == 0.0

    def test_split_source_entropy(self, ray_session, tmp_path):
        # src 'a' goes to b,b,c,c -> p=.5/.5, entropy = ln 2
        sf = _write_events(tmp_path, [
            (0, 1, 0, 'a'), (1, 1, 1, 'b'),
            (2, 1, 2, 'a'), (3, 1, 3, 'b'),
            (4, 2, 0, 'a'), (5, 2, 1, 'c'),
            (6, 2, 2, 'a'), (7, 2, 3, 'c'),
        ])
        df = q_transitions_events(sf)
        a_rows = df[df['src'] == 'a']
        assert set(zip(a_rows['dst'], a_rows['n'])) \
            == {('b', 2), ('c', 2)}
        ent = a_rows['src_entropy'].iloc[0]
        assert ent == pytest.approx(math.log(2), abs=2e-6)


class TestBm25:
    def _write_docs(self, tmp_path, texts):
        tbl = pa.table({
            'doc_id': pa.array(np.arange(len(texts), dtype=np.int64)),
            'text': pa.array(texts, type=pa.string()),
            'lang': pa.array(['en'] * len(texts)),
            'source': pa.array(['s'] * len(texts)),
            'n_chars': pa.array([len(t or '') for t in texts],
                                type=pa.int64()),
        })
        pq.write_table(tbl, f'{tmp_path}/documents.parquet')
        return str(tmp_path)

    def test_matches_reference_formula(self, ray_session, tmp_path):
        texts = ['cat dog cat', 'dog fish', 'cat cat cat bird',
                 'fish fish dog cat']
        sf = self._write_docs(tmp_path, texts)
        df = q_bm25_docs(sf).to_pandas().set_index('doc_id')
        # independent plain-python recomputation
        toks = [t.split(' ') for t in texts]
        n = len(texts)
        dls = [len(t) for t in toks]
        avgdl = sum(dls) / n
        dfreq = {}
        for t in toks:
            for w in set(t):
                dfreq[w] = dfreq.get(w, 0) + 1
        terms = sorted(dfreq, key=lambda w: (-dfreq[w], w))[:8]
        for i, t in enumerate(toks):
            micro = 0
            hits = 0
            for w in terms:
                tf = t.count(w)
                if tf == 0:
                    continue
                hits += 1
                idf = math.log((n - dfreq[w] + 0.5)
                               / (dfreq[w] + 0.5) + 1.0)
                s = idf * (tf * 2.5) \
                    / (tf + 1.5 * (1.0 - 0.75 + 0.75 * dls[i] / avgdl))
                micro += math.floor(s * 1e6 + 0.5)
            assert df.loc[i, 'n_hits'] == hits
            assert df.loc[i, 'score'] == pytest.approx(micro / 1e6,
                                                       abs=1e-9)

    def test_empty_corpus(self, ray_session, tmp_path):
        sf = self._write_docs(tmp_path, [])
        df = q_bm25_docs(sf)
        assert list(df.columns) == ['doc_id', 'n_hits', 'score']
        assert len(df) == 0


class TestRollingMedian:
    def test_expanding_then_window(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [
            (0, 1, 0, 'a', 1.0), (1, 1, 1, 'a', 2.0),
            (2, 1, 2, 'a', 3.0), (3, 1, 3, 'a', 100.0),
        ])
        df = q_rolling_median_events(sf).to_pandas()
        assert list(df['med']) == [1.0, 1.5, 2.0, 2.5]
        assert list(df['n_win']) == [1, 2, 3, 4]

    def test_null_values_skipped(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [
            (0, 1, 0, 'a', 5.0), (1, 1, 1, 'a', None),
            (2, 1, 2, 'a', 9.0),
        ])
        df = q_rolling_median_events(sf).to_pandas()
        assert list(df['n_win']) == [1, 1, 2]
        assert df['med'].iloc[1] == 5.0          # window = {5.0}
        assert df['med'].iloc[2] == 7.0          # {5.0, 9.0}


class TestHistogram:
    def test_global_equal_width_bins(self, ray_session, tmp_path):
        # values 0..19 over one type -> one count per bin
        rows = [(i, 1, i, 'a', float(i)) for i in range(20)]
        sf = _write_events(tmp_path, rows)
        df = q_histogram_events(sf).to_pandas()
        assert list(df['bin']) == list(range(20))
        assert set(df['n']) == {1}

    def test_per_type_shared_edges(self, ray_session, tmp_path):
        # type b's values land in the GLOBAL bins set by a's range
        rows = [(0, 1, 0, 'a', 0.0), (1, 1, 1, 'a', 100.0),
                (2, 1, 2, 'b', 0.0), (3, 1, 3, 'b', 99.0)]
        sf = _write_events(tmp_path, rows)
        df = q_histogram_events(sf).to_pandas().set_index(
            ['event_type', 'bin'])
        assert df.loc[('a', 0), 'n'] == 1
        assert df.loc[('a', 19), 'n'] == 1
        assert df.loc[('b', 0), 'n'] == 1
        assert df.loc[('b', 19), 'n'] == 1


class TestPareto:
    def test_keep_mask(self):
        s = np.array([10, 5, 10, 1, 2], dtype=np.int64)
        n = np.array([1, 5, 5, 10, 2], dtype=np.int64)
        assert list(_pareto_keep(s, n)) == \
            [False, False, True, True, False]

    def test_duplicates_survive(self):
        s = np.array([3, 3], dtype=np.int64)
        n = np.array([4, 4], dtype=np.int64)
        assert list(_pareto_keep(s, n)) == [True, True]

    def test_query_frontier(self, ray_session, tmp_path):
        # user 1: spend 10 / 1 event; user 2: 5 / 2; user 3: 1 / 3
        # all on the frontier; user 4 (4 / 1) dominated by user 2
        rows = [(0, 1, 0, 'a', 10.0),
                (1, 2, 0, 'a', 2.0), (2, 2, 1, 'a', 3.0),
                (3, 3, 0, 'a', 0.4), (4, 3, 1, 'a', 0.3),
                (5, 3, 2, 'a', 0.3),
                (6, 4, 0, 'a', 4.0)]
        sf = _write_events(tmp_path, rows)
        df = q_pareto_users(sf)
        assert list(df['user_id']) == [1, 2, 3]
        assert list(df['n']) == [1, 2, 3]


class TestAttribution:
    def test_first_last_touch(self, ray_session, tmp_path):
        # user 1: view .. purchase(7) .. click ; user 2: click only
        rows = [(0, 1, 0, 'view', 1.0), (1, 1, 5, 'purchase', 7.0),
                (2, 1, 9, 'click', 2.0),
                (3, 2, 0, 'click', 3.0)]
        sf = _write_events(tmp_path, rows)
        df = q_attribution_events(sf).set_index('channel')
        assert df.loc['view', 'n_first'] == 1
        assert df.loc['view', 'first_rev'] == 7.0
        assert df.loc['view', 'last_rev'] == 0.0
        assert df.loc['click', 'n_last'] == 2
        assert df.loc['click', 'last_rev'] == 7.0   # user 1's purchases
        assert df.loc['click', 'n_first'] == 1      # user 2 starts here
        assert df.loc['click', 'first_rev'] == 0.0  # user 2 never bought


class TestPmiBigrams:
    def test_exact_pmi(self, ray_session, tmp_path):
        sf = TestBm25._write_docs(self, tmp_path, ['a b a b', 'a b'])
        df = q_pmi_bigrams_docs(sf).set_index(['a', 'b'])
        # bigrams: (a,b) x3, (b,a) x1 ; unigrams a=3,b=3 over T=6; P=4
        assert df.loc[('a', 'b'), 'n'] == 3
        assert df.loc[('b', 'a'), 'n'] == 1
        assert df.loc[('a', 'b'), 'pmi'] == pytest.approx(
            math.log((3 / 4) / ((3 / 6) * (3 / 6))), abs=1e-12)

    def test_empty(self, ray_session, tmp_path):
        sf = TestBm25._write_docs(self, tmp_path, [])
        df = q_pmi_bigrams_docs(sf)
        assert len(df) == 0
        assert list(df.columns) == ['a', 'b', 'n', 'pmi']


class TestLmScore:
    def test_exact_nll(self, ray_session, tmp_path):
        sf = TestBm25._write_docs(self, tmp_path, ['x y', 'x y x z'])
        df = q_lm_score_docs(sf).to_pandas().set_index('doc_id')
        # global: n(x,y)=2 n(y,x)=1 n(x,z)=1; ctx x=3, y=1
        m = lambda p: math.floor(-math.log(p) * 1e6 + 0.5)
        assert df.loc[0, 'n_bigrams'] == 1
        assert df.loc[0, 'nll'] == pytest.approx(m(2 / 3) / 1e6, abs=1e-9)
        assert df.loc[1, 'n_bigrams'] == 3
        exp = (m(2 / 3) + m(1 / 1) + m(1 / 3)) / 3 / 1e6
        assert df.loc[1, 'nll'] == pytest.approx(exp, abs=1e-9)

    def test_repetitive_scores_lower(self, ray_session, tmp_path):
        # doc 0 repeats the corpus's dominant (a,a) continuation; doc 1
        # uses rare continuations of the same 'a' context
        texts = ['a a a a a a', 'a b a c a d']
        sf = TestBm25._write_docs(self, tmp_path, texts)
        df = q_lm_score_docs(sf).to_pandas().set_index('doc_id')
        assert df.loc[0, 'nll'] < df.loc[1, 'nll']

    def test_hot_tier_byte_parity(self, ray_session, tmp_path):
        # planted Zipf head: 'the' dominates contexts; forcing the
        # salted hot tier must be byte-identical to the cold co-located
        # path (same micro-unit floor on both)
        rng = np.random.default_rng(7)
        vocab = [f'w{i}' for i in range(40)]
        texts = []
        for i in range(60):
            toks = []
            for _ in range(30):
                toks.append('the' if rng.random() < 0.4
                            else vocab[rng.integers(0, 40)])
            texts.append(' '.join(toks))
        sf = TestBm25._write_docs(self, tmp_path, texts)
        cold = q_lm_score_docs(sf).to_pandas()\
            .sort_values('doc_id').reset_index(drop=True)
        # threshold 5: only genuinely hot contexts take the salted path
        mixed = q_lm_score_docs(sf, hot_ctx_rows=5, num_salts=4)\
            .to_pandas().sort_values('doc_id').reset_index(drop=True)
        # threshold 0: EVERY context is hot (cold side empty — the
        # degenerate all-hot corpus must still unify schemas)
        allhot = q_lm_score_docs(sf, hot_ctx_rows=0, num_salts=3)\
            .to_pandas().sort_values('doc_id').reset_index(drop=True)
        pd.testing.assert_frame_equal(cold, mixed)
        pd.testing.assert_frame_equal(cold, allhot)


class TestDfAttachTiers:
    def test_join_tier_matches_broadcast(self, ray_session, tmp_path):
        # df_broadcast_max=0 forces the open-vocab tier (hot-head
        # broadcast + tail hash_join); rows must byte-match the
        # broadcast tier
        from trafaret_ray.pipelines.queries import q_tfidf_docs
        rng = np.random.default_rng(5)
        vocab = [f'w{i}' for i in range(60)]
        texts = [' '.join(
            ('the' if rng.random() < 0.3 else
             vocab[rng.integers(0, 60)]) for _ in range(25))
            for _ in range(40)]
        sf = TestBm25._write_docs(self, tmp_path, texts)
        for fn, keys in ((q_tfidf_docs, ['doc_id', 'tok']),
                         (q_keywords_docs, ['doc_id', 'rank'])):
            a = fn(sf).to_pandas().sort_values(keys)\
                .reset_index(drop=True)
            b = fn(sf, df_broadcast_max=0).to_pandas()\
                .sort_values(keys).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b[a.columns])


class TestKeywords:
    def test_distinctive_term_ranks_first(self, ray_session, tmp_path):
        texts = ['common zebra common', 'common common', 'common yak']
        sf = TestBm25._write_docs(self, tmp_path, texts)
        df = q_keywords_docs(sf).to_pandas()
        top = df[df['rank'] == 1].set_index('doc_id')
        assert top.loc[0, 'tok'] == 'zebra'
        assert top.loc[2, 'tok'] == 'yak'
        # 'common' appears in every doc -> idf 0 -> never outranks
        assert (df[df['tok'] == 'common']['score'] == 0).all()
        # at most 3 keywords per doc, ranks contiguous from 1
        g = df.groupby('doc_id')['rank'].agg(['min', 'max', 'count'])
        assert (g['min'] == 1).all()
        assert (g['max'] == g['count']).all()
        assert (g['count'] <= 3).all()


class TestOhlc:
    def test_two_hour_bars(self, ray_session, tmp_path):
        rows = [(0, 1, 1, 'a', 10.0), (1, 1, 30, 'a', 50.0),
                (2, 1, 59, 'a', 20.0),           # hour 0
                (3, 1, 61, 'a', 5.0), (4, 1, 62, 'a', 7.0)]  # hour 1
        sf = _write_events(tmp_path, rows)
        df = q_ohlc_events(sf).to_pandas()
        assert len(df) == 2
        b0, b1 = df.iloc[0], df.iloc[1]
        assert (b0['open'], b0['high'], b0['low'], b0['close']) \
            == (10.0, 50.0, 10.0, 20.0)
        assert b0['n'] == 3 and b0['vol'] == 80.0
        assert (b1['open'], b1['close'], b1['n']) == (5.0, 7.0, 2)

    def test_same_ts_tie_uses_event_id(self, ray_session, tmp_path):
        rows = [(7, 1, 0, 'a', 3.0), (2, 1, 0, 'a', 9.0)]
        sf = _write_events(tmp_path, rows)
        df = q_ohlc_events(sf).to_pandas()
        assert df['open'].iloc[0] == 9.0     # event_id 2 first
        assert df['close'].iloc[0] == 3.0    # event_id 7 last


class TestBurst:
    def test_spike_hour_flagged(self, ray_session, tmp_path):
        # type 'a': 1 event/hour for 20 hours, 30 in hour 20 -> spike
        rows = [(i, 1, i * 60, 'a', 1.0) for i in range(20)]
        rows += [(100 + j, 1, 20 * 60 + j, 'a', 1.0) for j in range(30)]
        # type 'b': uniform, no spike
        rows += [(500 + i, 1, i * 60, 'b', 1.0) for i in range(10)]
        sf = _write_events(tmp_path, rows)
        df = q_burst_events(sf).to_pandas()
        assert len(df) == 1
        assert df['event_type'].iloc[0] == 'a'
        assert df['n'].iloc[0] == 30
        assert df['hour'].iloc[0] == TS0 + pd.Timedelta(hours=20)

    def test_integer_threshold_is_exact(self, ray_session, tmp_path):
        # counts 1,1,1,9: mean 3, var 12, 3sigma test:
        # (9*4-12)^2 = 576 vs 9*(84*4-144) = 1728 -> NOT a burst
        rows = []
        eid = 0
        for h, k in enumerate([1, 1, 1, 9]):
            for _ in range(k):
                rows.append((eid, 1, h * 60, 'a', 1.0))
                eid += 1
        sf = _write_events(tmp_path, rows)
        df = q_burst_events(sf).to_pandas()
        assert len(df) == 0


class TestInvertedIndex:
    def test_postings_sorted_distinct(self, ray_session, tmp_path):
        texts = [f'hot tok{i}' for i in range(6)] + ['hot hot hot']
        sf = TestBm25._write_docs(self, tmp_path, texts)
        df = q_inverted_index_docs(sf).to_pandas()
        # only 'hot' reaches df >= 5; repeats inside doc 6 dedup
        assert list(df['tok']) == ['hot']
        assert df['df'].iloc[0] == 7
        assert df['postings'].iloc[0] == '0,1,2,3,4,5,6'


class TestAbTest:
    def test_counts_and_z(self, ray_session, tmp_path):
        from trafaret_ray.functions.sampling import split_buckets
        rows = []
        eid = 0
        for u in range(40):
            conv = u % 3 == 0
            rows.append((eid, u, eid, 'purchase' if conv else 'view',
                         1.0))
            eid += 1
        sf = _write_events(tmp_path, rows)
        df = q_ab_test_events(sf)
        b = split_buckets(np.arange(40, dtype=np.int64))
        va = b < 5000
        conv = np.array([u % 3 == 0 for u in range(40)])
        assert df['n_a'].iloc[0] == va.sum()
        assert df['x_a'].iloc[0] == conv[va].sum()
        assert df['n_b'].iloc[0] == (~va).sum()
        n_a, x_a = int(va.sum()), int(conv[va].sum())
        n_b, x_b = int((~va).sum()), int(conv[~va].sum())
        p = (x_a + x_b) / (n_a + n_b)
        z = (x_a / n_a - x_b / n_b) / math.sqrt(
            p * (1 - p) * (1 / n_a + 1 / n_b))
        assert df['z'].iloc[0] == pytest.approx(z, abs=1e-12)

    def test_empty(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [])
        df = q_ab_test_events(sf)
        assert df['n_a'].iloc[0] == 0 and pd.isna(df['z'].iloc[0])


class TestItemCooc:
    def test_exact_cosine(self, ray_session, tmp_path):
        # user 1: a x2, b x1 ; user 2: a x1, c x1
        rows = [(0, 1, 0, 'a'), (1, 1, 1, 'a'), (2, 1, 2, 'b'),
                (3, 2, 0, 'a'), (4, 2, 1, 'c')]
        sf = _write_events(tmp_path, rows)
        df = q_item_cooc_events(sf).set_index(['a', 'b'])
        # vectors over users: a=(2,1), b=(1,0), c=(0,1)
        assert df.loc[('a', 'b'), 'dot'] == 2
        assert df.loc[('a', 'c'), 'dot'] == 1
        assert ('b', 'c') not in df.index        # no shared user
        assert df.loc[('a', 'b'), 'cosine'] == pytest.approx(
            2 / (math.sqrt(5) * 1), abs=1e-12)
        assert df.loc[('a', 'c'), 'cosine'] == pytest.approx(
            1 / (math.sqrt(5) * 1), abs=1e-12)

    def test_pair_order_canonical(self, ray_session, tmp_path):
        rows = [(0, 1, 0, 'z'), (1, 1, 1, 'a')]
        sf = _write_events(tmp_path, rows)
        df = q_item_cooc_events(sf)
        assert list(df['a']) == ['a'] and list(df['b']) == ['z']


class TestGroupKFold:
    def test_partition_and_totals(self, ray_session, tmp_path):
        from trafaret_ray.functions.sampling import split_buckets
        rows = [(i, i % 17, i, 'a') for i in range(100)]
        sf = _write_events(tmp_path, rows)
        df = q_groupkfold_events(sf).to_pandas()
        assert df['n_users'].sum() == 17
        assert df['n_events'].sum() == 100
        # fold is the group-level hash: recompute independently
        folds = split_buckets(np.arange(17, dtype=np.int64), mod=5)
        exp = pd.Series(folds).value_counts().sort_index()
        got = df.set_index('fold')['n_users']
        for f, n in exp.items():
            assert got.loc[f] == n


class TestGram:
    def test_matches_direct_matmul(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        X = rng.normal(0, 0.2, (300, 8)).astype(np.float32)
        tbl = pa.table({
            'vec_id': pa.array(np.arange(300, dtype=np.int64)),
            'embedding': pa.array(list(X), type=pa.list_(pa.float32())),
            'label': pa.array(np.zeros(300, dtype=np.int32)),
        })
        pq.write_table(tbl, f'{tmp_path}/embeddings.parquet')
        df = q_gram_embeddings(str(tmp_path)).to_pandas()
        V = np.floor(X.astype(np.float64) * 1e4 + 0.5)
        G = (V.T @ V) / 1e8
        iu = np.triu_indices(8)
        assert len(df) == 36
        got = df.set_index(['i', 'j'])['g']
        for i, j in zip(*iu):
            assert got.loc[(i, j)] == G[i, j]

    def test_partition_invariance(self, ray_session, tmp_path):
        # partials from many small blocks sum to the same ints
        import ray.data as rd
        rng = np.random.default_rng(4)
        X = rng.normal(0, 0.2, (64, 4)).astype(np.float32)
        tbl = pa.table({
            'vec_id': pa.array(np.arange(64, dtype=np.int64)),
            'embedding': pa.array(list(X), type=pa.list_(pa.float32())),
            'label': pa.array(np.zeros(64, dtype=np.int32)),
        })
        pq.write_table(tbl, f'{tmp_path}/embeddings.parquet')
        a = q_gram_embeddings(str(tmp_path)).to_pandas()
        d = tmp_path / 'many'
        d.mkdir()
        rd.from_arrow(tbl).repartition(16).write_parquet(str(d))
        import os
        merged = pa.concat_tables([
            pq.read_table(f'{d}/{f}') for f in sorted(os.listdir(d))
            if f.endswith('.parquet')])
        pq.write_table(merged, f'{tmp_path}/embeddings.parquet')
        b = q_gram_embeddings(str(tmp_path)).to_pandas()
        assert (a['g'].to_numpy() == b['g'].to_numpy()).all()


class TestTrend:
    def test_monotonic_and_reversed(self, ray_session, tmp_path):
        rows = [(i, 1, i, 'a', float(i)) for i in range(6)]          # up
        rows += [(10 + i, 2, i, 'a', float(10 - i)) for i in range(6)]
        rows += [(20 + i, 3, i, 'a', 5.0) for i in range(6)]   # constant
        rows += [(30, 4, 0, 'a', 1.0)]                   # n < 5: dropped
        sf = _write_events(tmp_path, rows)
        df = q_trend_events(sf).to_pandas().set_index('user_id')
        assert df.loc[1, 'rho'] == 1.0
        assert df.loc[2, 'rho'] == -1.0
        assert pd.isna(df.loc[3, 'rho'])        # zero variance
        assert 4 not in df.index

    def test_tied_ranks_average(self, ray_session, tmp_path):
        # values 1,1,2,3,4 over time: scipy spearmanr gives 0.975
        vals = [1.0, 1.0, 2.0, 3.0, 4.0]
        rows = [(i, 1, i, 'a', v) for i, v in enumerate(vals)]
        sf = _write_events(tmp_path, rows)
        df = q_trend_events(sf).to_pandas()
        # exact: R2=[3,3,6,8,10], T2=[2,4,6,8,10]
        n, sx, sy = 5, 30, 30
        sxx = 9 + 9 + 36 + 64 + 100
        syy = 4 + 16 + 36 + 64 + 100
        sxy = 6 + 12 + 36 + 64 + 100
        exp = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        assert df['rho'].iloc[0] == pytest.approx(exp, abs=1e-12)


class TestQualityPercentile:
    def test_min_rank_ties(self, ray_session, tmp_path):
        lens = [10, 20, 20, 30, 40]
        texts = ['x' * n for n in lens]
        sf = TestBm25._write_docs(self, tmp_path, texts)
        df = q_quality_percentile_docs(sf).to_pandas()
        # percent_rank min-rank semantics: ties share (#smaller)/(n-1)
        assert list(df['pr']) == [0.0, 0.25, 0.25, 0.75, 1.0]

    def test_single_doc(self, ray_session, tmp_path):
        sf = TestBm25._write_docs(self, tmp_path, ['abc'])
        df = q_quality_percentile_docs(sf).to_pandas()
        assert list(df['pr']) == [0.0]


class TestTwa:
    def test_trapezoid_exact(self, ray_session, tmp_path):
        # v: 0 for 10 min then 10 for 30 min
        rows = [(0, 1, 0, 'a', 0.0), (1, 1, 10, 'a', 10.0),
                (2, 1, 40, 'a', 10.0)]
        sf = _write_events(tmp_path, rows)
        df = q_twa_events(sf).to_pandas()
        # trapezoid: (0+10)/2 * 10 + (10+10)/2 * 30 = 50+300 over 40
        assert df['twa'].iloc[0] == pytest.approx(350 / 40, abs=1e-9)
        assert df['n_intervals'].iloc[0] == 2

    def test_zero_span_is_null(self, ray_session, tmp_path):
        rows = [(0, 1, 0, 'a', 1.0), (1, 1, 0, 'a', 9.0)]
        sf = _write_events(tmp_path, rows)
        df = q_twa_events(sf).to_pandas()
        assert pd.isna(df['twa'].iloc[0])

    def test_single_event_user_absent(self, ray_session, tmp_path):
        rows = [(0, 1, 0, 'a', 1.0)]
        sf = _write_events(tmp_path, rows)
        assert len(q_twa_events(sf).to_pandas()) == 0


class TestAssocRules:
    def test_support_confidence_lift(self, ray_session, tmp_path):
        # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={b,c}
        rows = [(0, 1, 0, 'a'), (1, 1, 1, 'b'),
                (2, 2, 0, 'a'), (3, 2, 1, 'b'),
                (4, 3, 0, 'a'),
                (5, 4, 0, 'b'), (6, 4, 1, 'c')]
        sf = _write_events(tmp_path, rows)
        df = q_assoc_rules_events(sf).set_index(['a', 'b'])
        # N=4, n_a=3, n_b=3, n_ab=2
        assert df.loc[('a', 'b'), 'n_ab'] == 2
        assert df.loc[('a', 'b'), 'support'] == 0.5
        assert df.loc[('a', 'b'), 'confidence'] == pytest.approx(2 / 3)
        assert df.loc[('a', 'b'), 'lift'] == pytest.approx(
            (2 / 3) / (3 / 4))
        # asymmetry: b -> a has same n_ab, different confidence base
        assert df.loc[('b', 'a'), 'confidence'] == pytest.approx(2 / 3)
        assert df.loc[('b', 'c'), 'confidence'] == pytest.approx(1 / 3)
        assert ('a', 'c') not in df.index


class TestGoldenRecord:
    def test_null_does_not_clobber(self, ray_session, tmp_path):
        rows = [(0, 1, 0, 'view', 5.0),
                (1, 1, 5, None, None),        # newest row, all nulls
                (2, 2, 0, 'click', 2.0),
                (3, 2, 5, 'buy', None)]
        sf = _write_events(tmp_path, rows)
        df = q_golden_record_events(sf).to_pandas().set_index('user_id')
        # user 1: nulls in the newest row fall back to older values
        assert df.loc[1, 'last_type'] == 'view'
        assert df.loc[1, 'last_value'] == 5.0
        assert df.loc[1, 'last_ts'] == TS0 + pd.Timedelta(minutes=5)
        assert df.loc[1, 'n_events'] == 2
        # user 2: newest type wins, value survives from older row
        assert df.loc[2, 'last_type'] == 'buy'
        assert df.loc[2, 'last_value'] == 2.0

    def test_all_null_attribute_stays_null(self, ray_session, tmp_path):
        rows = [(0, 1, 0, None, None)]
        sf = _write_events(tmp_path, rows)
        df = q_golden_record_events(sf).to_pandas()
        assert pd.isna(df['last_type'].iloc[0])
        assert pd.isna(df['last_value'].iloc[0])


class TestSurvival:
    def test_km_curve(self, ray_session, tmp_path):
        # users 1-3 die (last events far from corpus max); user 4's
        # last event IS the corpus max (gap 0 < 12h) -> censored
        D = 24 * 60
        rows = [(0, 1, 0, 'a'), (1, 1, D, 'a'),
                (2, 2, 0, 'a'), (3, 2, D, 'a'),
                (4, 3, 0, 'a'), (5, 3, 2 * D, 'a'),
                (6, 4, 0, 'a'), (7, 4, 30 * D, 'a')]   # censored
        sf = _write_events(tmp_path, rows)
        df = q_survival_users(sf)
        df = df.set_index('t')
        # t=1: n_risk 4, deaths 2 -> ln(1/2); t=2: n_risk 2, deaths 1
        assert df.loc[1, 'n_risk'] == 4 and df.loc[1, 'deaths'] == 2
        assert df.loc[2, 'n_risk'] == 2 and df.loc[2, 'deaths'] == 1
        m = lambda p: math.floor(math.log(p) * 1e6 + 0.5)
        assert df.loc[1, 'log_s'] == pytest.approx(m(0.5) / 1e6)
        assert df.loc[2, 'log_s'] == pytest.approx(
            (m(0.5) + m(0.5)) / 1e6)
        assert 30 not in df.index          # censored-only time: no row

    def test_terminal_zero_survival(self, ray_session, tmp_path):
        # u3's lone far-future event sets the corpus max (censored at
        # t=0); u1/u2 then both DIE at t=1 with n_risk=2 -> S hits
        # exactly 0 -> log_s NULL at that step
        D = 24 * 60
        rows = [(0, 1, 0, 'a'), (1, 1, D, 'a'),
                (2, 2, 0, 'a'), (3, 2, D, 'a'),
                (4, 3, 40 * D, 'a')]
        sf = _write_events(tmp_path, rows)
        df = q_survival_users(sf).set_index('t')
        assert df.loc[1, 'deaths'] == 2
        assert df.loc[1, 'n_risk'] == 2
        assert pd.isna(df.loc[1, 'log_s'])

    def test_all_censored_is_empty(self, ray_session, tmp_path):
        D = 24 * 60
        rows = [(0, 1, 0, 'a'), (1, 1, D, 'a'),
                (2, 2, 0, 'a'), (3, 2, D, 'a')]
        sf = _write_events(tmp_path, rows)
        assert len(q_survival_users(sf)) == 0


class TestDrawdown:
    def test_peak_and_drawdown(self, ray_session, tmp_path):
        # path 10 -> 30 -> 5 -> 20: peak 30, max drawdown 25
        rows = [(0, 1, 0, 'a', 10.0), (1, 1, 1, 'a', 30.0),
                (2, 1, 2, 'a', 5.0), (3, 1, 3, 'a', 20.0)]
        sf = _write_events(tmp_path, rows)
        df = q_drawdown_events(sf).to_pandas()
        assert df['peak'].iloc[0] == 30.0
        assert df['max_dd'].iloc[0] == 25.0

    def test_monotone_rise_has_zero_dd(self, ray_session, tmp_path):
        rows = [(i, 1, i, 'a', float(i)) for i in range(5)]
        sf = _write_events(tmp_path, rows)
        df = q_drawdown_events(sf).to_pandas()
        assert df['max_dd'].iloc[0] == 0.0

    def test_no_cross_user_leak(self, ray_session, tmp_path):
        # user 1 peaks at 100; user 2's low values must not see it
        rows = [(0, 1, 0, 'a', 100.0), (1, 2, 0, 'a', 1.0),
                (2, 2, 1, 'a', 2.0)]
        sf = _write_events(tmp_path, rows)
        df = q_drawdown_events(sf).to_pandas().set_index('user_id')
        assert df.loc[2, 'max_dd'] == 0.0
        assert df.loc[2, 'peak'] == 2.0


class TestWowGrowth:
    def test_adjacent_weeks_only(self, ray_session, tmp_path):
        W = 7 * 24 * 60
        # type a: weeks 0 (2 events), 1 (3 events), 3 (1 event)
        rows = [(0, 1, 1, 'a'), (1, 1, 2, 'a'),
                (2, 1, W + 1, 'a'), (3, 1, W + 2, 'a'),
                (4, 1, W + 3, 'a'),
                (5, 1, 3 * W + 1, 'a')]
        sf = _write_events(tmp_path, rows)
        df = q_wow_growth_events(sf)
        df = df.set_index('week')
        w0 = df.index.min()
        assert pd.isna(df.loc[w0, 'prev_n'])          # no prior week
        assert df.loc[w0 + 1, 'prev_n'] == 2
        assert df.loc[w0 + 1, 'growth'] == 0.5        # 2 -> 3
        assert pd.isna(df.loc[w0 + 3, 'growth'])      # gap week


class TestLmScoreNulTokens:
    def test_nul_inside_tokens_does_not_collide(self, ray_session,
                                                tmp_path):
        # pairs ('x\x00y','z') and ('x','y\x00z') would encode the
        # same delimiter-joined composite; the numeric pair-code
        # lookup must keep them distinct (engine-only hazard — DuckDB
        # VARCHAR cannot hold NUL, so no oracle covers this)
        docs = ['x\x00y z', 'x\x00y z', 'x\x00y z', 'x y\x00z']
        sf = TestBm25._write_docs(self, tmp_path, docs)
        df = q_lm_score_docs(sf).to_pandas().set_index('doc_id')
        # ctx 'x\x00y': 3 bigrams all ('x\x00y','z') -> nll 0
        assert df.loc[0, 'nll'] == 0.0
        # ctx 'x': 1 bigram ('x','y\x00z') -> its own count, nll 0,
        # NOT 'x\x00y z's count of 3
        assert df.loc[3, 'nll'] == 0.0
        assert df.loc[3, 'n_bigrams'] == 1


class TestXcorr:
    def test_planted_lead_lag(self, ray_session, tmp_path):
        # purchases echo views ONE week later -> r peaks at lag 1
        W = 7 * 24 * 60
        rows, eid = [], 0
        views = [5, 1, 8, 2, 9, 3]
        for w, k in enumerate(views):
            for _ in range(k):
                rows.append((eid, 1, w * W + 1, 'view')); eid += 1
        for w, k in enumerate(views[:-1]):       # echoed at w+1
            for _ in range(k):
                rows.append((eid, 1, (w + 1) * W + 2, 'purchase'))
                eid += 1
        sf = _write_events(tmp_path, rows)
        df = q_xcorr_events(sf).set_index('lag')
        assert df.loc[1, 'r'] == pytest.approx(1.0, abs=1e-9)
        assert df.loc[0, 'r'] < 0.9
        assert df.loc[1, 'n_weeks'] == 5      # 6 weeks, lag-1 pairs

    def test_constant_series_is_null(self, ray_session, tmp_path):
        W = 7 * 24 * 60
        rows = [(w, 1, w * W + 1, 'view') for w in range(4)]
        rows += [(10 + w, 1, w * W + 2, 'purchase') for w in range(4)]
        sf = _write_events(tmp_path, rows)
        df = q_xcorr_events(sf).set_index('lag')
        assert pd.isna(df.loc[0, 'r'])           # zero variance

    def test_span_shorter_than_max_lag(self, ray_session, tmp_path):
        # 2 distinct weeks: lags 2-3 have no aligned pairs -> NO rows
        # (matches the oracle's empty self-join, not n_weeks=0 rows)
        W = 7 * 24 * 60
        rows = [(0, 1, 1, 'view'), (1, 1, W + 1, 'purchase')]
        sf = _write_events(tmp_path, rows)
        df = q_xcorr_events(sf)
        assert list(df['lag']) == [0, 1]
        assert list(df['n_weeks']) == [2, 1]


class TestKsDrift:
    def test_identical_halves_zero_d(self, ray_session, tmp_path):
        from trafaret_ray.functions.sampling import split_buckets
        # plant identical value multisets in both hash halves
        b = split_buckets(np.arange(4000, dtype=np.int64))
        a_ids = np.nonzero(b < 5000)[0][:100]
        b_ids = np.nonzero(b >= 5000)[0][:100]
        rows = []
        for i, (ia, ib) in enumerate(zip(a_ids, b_ids)):
            rows.append((int(ia), 1, i, 'a', float(i % 7)))
            rows.append((int(ib), 1, i, 'a', float(i % 7)))
        sf = _write_events(tmp_path, rows)
        df = q_ks_drift_events(sf)
        assert df['n_a'].iloc[0] == 100 and df['n_b'].iloc[0] == 100
        assert df['d'].iloc[0] == 0.0

    def test_planted_shift_detected(self, ray_session, tmp_path):
        from trafaret_ray.functions.sampling import split_buckets
        b = split_buckets(np.arange(4000, dtype=np.int64))
        a_ids = np.nonzero(b < 5000)[0][:100]
        b_ids = np.nonzero(b >= 5000)[0][:100]
        rows = []
        for i, ia in enumerate(a_ids):
            rows.append((int(ia), 1, i, 'a', 1.0))     # half A: all 1
        for i, ib in enumerate(b_ids):
            rows.append((int(ib), 1, i, 'a', 9.0))     # half B: all 9
        sf = _write_events(tmp_path, rows)
        df = q_ks_drift_events(sf)
        assert df['d'].iloc[0] == 1.0                  # total separation
        assert df['at_value'].iloc[0] == 1.0

    def test_empty(self, ray_session, tmp_path):
        sf = _write_events(tmp_path, [])
        df = q_ks_drift_events(sf)
        assert df['n_a'].iloc[0] == 0 and pd.isna(df['d'].iloc[0])
