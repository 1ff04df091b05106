"""Substring-level (k-token span) exact dedup — q_dup_spans_docs.

Positions must be 1-based start-token indices under single-space split
semantics (SQL string_split parity), and a span counts as duplicated on
>= 2 occurrences corpus-wide INCLUDING repeats within one document.
"""
import numpy as np
import pyarrow as pa


def _brute(docs, k):
    from collections import Counter
    grams = []
    for doc_id, text in docs:
        t = text.split(' ')
        for i in range(len(t) - k + 1):
            grams.append((doc_id, i + 1, ' '.join(t[i:i + k])))
    cnt = Counter(g for _, _, g in grams)
    return sorted((d, p) for d, p, g in grams if cnt[g] >= 2)


class TestDupSpans:
    def test_positions_and_counts(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from trafaret_ray.pipelines.queries import q_dup_spans_docs
        docs = [
            (1, 'a b c d e a b c d e'),       # span repeats WITHIN doc
            (2, 'x a b c d different tail'),   # shares 'a b c d' with 1
            (3, 'totally unrelated words go here now ok'),
            (4, 'short'),                      # < k tokens: no grams
            (5, 'x a b c d different tail'),   # exact dup of 2
        ]
        t = pa.table({
            'doc_id': pa.array([d for d, _ in docs], pa.int64()),
            'text': pa.array([s for _, s in docs]),
            'lang': pa.array(['en'] * 5),
            'source': pa.array(['s'] * 5),
            'n_chars': pa.array([len(s) for _, s in docs], pa.int64()),
        })
        pq.write_table(t, tmp_path / 'documents.parquet')
        k = 4
        out = q_dup_spans_docs(str(tmp_path), k=k).to_pandas()
        got = sorted(map(tuple, out[['doc_id', 'pos']].values.tolist()))
        assert got == _brute(docs, k)
        # sanity on the fixture itself: doc 1's within-doc repeat and
        # the doc 2/5 exact pair must both appear
        assert (1, 1) in got and (1, 6) in got
        assert (2, 1) in got and (5, 1) in got
        assert all(d != 3 and d != 4 for d, _ in got)

    def test_interval_coalescing(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from trafaret_ray.pipelines.queries import q_dup_intervals_docs
        # doc 1 repeats 'a b c d' at tokens 1 and 6 (overlap-chain via
        # the shared dup grams) while doc 2/3 are exact dups — intervals
        # must be maximal, not per-span
        docs = [
            (1, 'a b c d e a b c d e unrelated trailing words here'),
            (2, 'x a b c d different tail'),
            (3, 'x a b c d different tail'),
        ]
        t = pa.table({
            'doc_id': pa.array([d for d, _ in docs], pa.int64()),
            'text': pa.array([s for _, s in docs]),
            'lang': pa.array(['en'] * 3),
            'source': pa.array(['s'] * 3),
            'n_chars': pa.array([len(s) for _, s in docs], pa.int64()),
        })
        pq.write_table(t, tmp_path / 'documents.parquet')
        out = q_dup_intervals_docs(str(tmp_path), k=4).to_pandas()
        rows = out[['doc_id', 'start_tok', 'end_tok', 'n_spans']]\
            .values.tolist()
        # doc 2/3: every 4-gram duplicated -> one interval covering all
        # 7 tokens (spans at pos 1..4, end 4+3)
        assert [2, 1, 7, 4] in rows and [3, 1, 7, 4] in rows
        # doc 1: dup spans at pos 1,2,6,7 ('a b c d','b c d e' twice) —
        # gap 2->6 is 4 <= k so they coalesce into ONE interval [1, 10]
        assert [1, 1, 10, 4] in rows
        assert len(rows) == 3

    def test_cut_application(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from trafaret_ray.pipelines.queries import q_dedup_cut_docs
        docs = [
            (1, 'a b c d e a b c d e unrelated trailing words here'),
            (2, 'x a b c d different tail'),   # exact dup of 3:
            (3, 'x a b c d different tail'),   # both fully covered
            (4, 'untouched document with enough distinct words'),
        ]
        t = pa.table({
            'doc_id': pa.array([d for d, _ in docs], pa.int64()),
            'text': pa.array([s for _, s in docs]),
            'lang': pa.array(['en'] * 4),
            'source': pa.array(['s'] * 4),
            'n_chars': pa.array([len(s) for _, s in docs], pa.int64()),
        })
        pq.write_table(t, tmp_path / 'documents.parquet')
        out = q_dedup_cut_docs(str(tmp_path), k=4).to_pandas()
        got = dict(zip(out['doc_id'], out['text_cut']))
        # doc 1 loses tokens 1-10 (the coalesced interval), keeps tail
        assert got[1] == 'unrelated trailing words here'
        # fully-duplicated docs disappear entirely
        assert 2 not in got and 3 not in got
        # a doc with no dup spans passes through byte-identical
        assert got[4] == docs[3][1]
        assert out.set_index('doc_id')['n_kept'].to_dict() == {1: 4, 4: 6}
