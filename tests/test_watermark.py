"""LateRowTagger / watermark_tumbling: event-time watermark semantics
against a straight-line reference loop."""

import numpy as np
import pyarrow as pa

from trafaret_ray.stages.streaming import LateRowTagger, watermark_tumbling


def straight_line_late(ts_list, lateness_us):
    """The definitional per-row loop the vectorized actor must match."""
    out, max_ts = [], None
    for t in ts_list:
        late = max_ts is not None and t < max_ts - lateness_us
        out.append(late)
        max_ts = t if max_ts is None else max(max_ts, t)
    return out


def _tbl(ts_us):
    return pa.table({'ts': pa.array(np.asarray(ts_us, dtype=np.int64))
                    .cast(pa.timestamp('us')),
                     'v': pa.array(np.arange(len(ts_us),
                                             dtype=np.int64))})


class TestLateRowTagger:
    def test_matches_reference_loop_random(self):
        rng = np.random.default_rng(11)
        ts = np.cumsum(rng.integers(0, 100, 500)) \
            - rng.integers(0, 300, 500)  # out-of-order stream
        tagger = LateRowTagger(ts_col='ts', lateness_us=50)
        got = tagger(_tbl(ts)).column('late').to_pylist()
        assert got == straight_line_late(ts.tolist(), 50)

    def test_state_carries_across_batches(self):
        tagger = LateRowTagger(ts_col='ts', lateness_us=10)
        a = tagger(_tbl([100, 200])).column('late').to_pylist()
        # 150 is NOT late (200-10=190 > 150 -> late actually). Check
        # against the reference loop instead of hand-reasoning:
        b = tagger(_tbl([150, 185, 250])).column('late').to_pylist()
        assert a + b == straight_line_late([100, 200, 150, 185, 250], 10)

    def test_first_row_never_late_and_empty_batch(self):
        tagger = LateRowTagger(ts_col='ts', lateness_us=0)
        assert tagger(_tbl([5])).column('late').to_pylist() == [False]
        empty = tagger(_tbl([]))
        assert empty.num_rows == 0
        assert empty.schema.field('late').type == pa.bool_()

    def test_zero_lateness_tags_any_backstep(self):
        tagger = LateRowTagger(ts_col='ts', lateness_us=0)
        got = tagger(_tbl([10, 20, 19, 20, 21])).column('late')\
            .to_pylist()
        assert got == [False, False, True, False, False]


class TestWatermarkTumbling:
    def test_on_time_windows_and_late_side(self, ray_session):
        import ray.data as rd
        # one user; 100us windows; lateness 20us. Rows 250, then a
        # late 40 (watermark 230), then 180 (late), then 310.
        ts = [50, 120, 250, 40, 180, 310]
        tbl = pa.table({
            'user_id': pa.array([1] * 6, type=pa.int64()),
            'ts': pa.array(np.asarray(ts, dtype=np.int64))
            .cast(pa.timestamp('us')),
            'value': pa.array([1.0] * 6),
        })
        windows, tagged = watermark_tumbling(
            rd.from_arrow(tbl), 'user_id', 'ts', window_us=100,
            lateness_us=20, aggs={'n': ('value', 'count')})
        tag = tagged.to_pandas().sort_values('ts')
        exp_late = straight_line_late(ts, 20)
        got_late = [bool(tag.loc[tag['ts'].astype('int64') == t, 'late']
                         .iloc[0]) for t in ts]
        assert got_late == exp_late
        win = windows.to_pandas().sort_values('window_start')
        # on-time rows: 50,120,250,310 -> windows 0,100,200,300
        assert win['window_start'].astype('int64').tolist() == \
            [0, 100, 200, 300]
        assert win['n'].tolist() == [1, 1, 1, 1]
