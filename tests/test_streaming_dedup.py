"""StreamingDeduper (stages/streaming.py): first-seen emission across
batches, in-batch first-occurrence wins, and the bloom mode's
no-duplicate-leak guarantee."""
import numpy as np
import pyarrow as pa
import pytest

from trafaret_ray.stages.streaming import StreamingDeduper


def _tbl(ids, texts):
    return pa.table({'doc_id': pa.array(ids, pa.int64()),
                     'text': pa.array(texts, pa.string())})


class TestStreamingDeduper:
    def test_exact_first_seen_across_batches(self):
        d = StreamingDeduper()
        out1 = d(_tbl([1, 2, 3, 4], ['a', 'b', 'a', 'c']))
        # in-batch: first occurrence of 'a' (id 1) wins
        assert out1.column('doc_id').to_pylist() == [1, 2, 4]
        out2 = d(_tbl([5, 6, 7], ['b', 'd', 'c']))
        # cross-batch: 'b' and 'c' already seen
        assert out2.column('doc_id').to_pylist() == [6]
        # null text hashes as '' — dedups with other nulls/empties
        out3 = d(_tbl([8, 9, 10], [None, '', 'e']))
        assert out3.column('doc_id').to_pylist() == [8, 10]

    def test_bloom_never_leaks_duplicates(self):
        d = StreamingDeduper(mode='bloom', m_bits=1 << 16)
        rng = np.random.default_rng(3)
        seen_texts = set()
        emitted = []
        for _ in range(20):
            texts = [f't-{rng.integers(0, 500)}' for _ in range(200)]
            out = d(_tbl(list(range(200)), texts))
            for t in out.column('text').to_pylist():
                assert t not in emitted        # no duplicate ever leaks
                emitted.append(t)
            seen_texts.update(texts)
        # false positives only DROP new rows; emitted is a subset
        assert set(emitted) <= seen_texts
        # at this fill level the vast majority of distinct texts got out
        assert len(emitted) >= 0.9 * len(seen_texts)

    def test_bad_mode_raises_and_empty_passthrough(self):
        with pytest.raises(ValueError):
            StreamingDeduper(mode='nope')
        d = StreamingDeduper()
        empty = _tbl([], [])
        assert d(empty).num_rows == 0

    def test_replay_guard_reemits_identically(self):
        # an at-least-once replay of the SAME batch must re-emit exactly
        # the first attempt's rows (idempotent), never drop them all
        d = StreamingDeduper()
        b = _tbl([1, 2, 3], ['a', 'b', 'a'])
        out1 = d(b)
        assert out1.column('doc_id').to_pylist() == [1, 2]
        out2 = d(b)  # replay
        assert out2.column('doc_id').to_pylist() == [1, 2]
        # a DIFFERENT batch with seen content still dedups
        out3 = d(_tbl([4, 5], ['b', 'z']))
        assert out3.column('doc_id').to_pylist() == [5]

    def test_replay_guard_off_restores_first_seen(self):
        d = StreamingDeduper(replay_guard=False)
        b = _tbl([1, 2], ['a', 'b'])
        assert d(b).num_rows == 2
        assert d(b).num_rows == 0  # pure first-seen: replay drops all

    def test_replay_guard_bloom(self):
        d = StreamingDeduper(mode='bloom', m_bits=1 << 16)
        b = _tbl([1, 2, 3], ['x', 'y', 'x'])
        assert d(b).column('doc_id').to_pylist() == [1, 2]
        assert d(b).column('doc_id').to_pylist() == [1, 2]
