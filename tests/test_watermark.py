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


class TestStreamingBars:
    def _table(self, rows):
        import pyarrow as pa
        return pa.table({
            'event_type': pa.array([r[0] for r in rows]),
            'ts': pa.array([r[1] for r in rows],
                           type=pa.timestamp('us')),
            'value': pa.array([r[2] for r in rows],
                              type=pa.float64()),
        })

    HOUR = 3_600_000_000

    def test_watermark_finalizes_exactly_once(self):
        from trafaret_ray.stages.streaming import StreamingBarAggregator
        agg = StreamingBarAggregator()
        H = self.HOUR
        b1 = self._table([('a', 10, 1.0), ('a', 20, 5.0),
                          ('a', H + 1, 2.0)])
        out1 = agg(b1)
        # hour 0 closed (watermark in hour 1): emitted once, finalized
        assert out1.num_rows == 1
        assert out1.column('open')[0].as_py() == 1.0
        assert out1.column('close')[0].as_py() == 5.0
        assert out1.column('n')[0].as_py() == 2
        # a later batch in hour 1 does NOT re-emit hour 0
        out2 = agg(self._table([('a', H + 50, 3.0)]))
        assert out2.num_rows == 0
        fin = agg.flush(key_type=out1.schema.field('event_type').type)
        assert fin.num_rows == 1               # the open hour-1 bar
        assert fin.column('n')[0].as_py() == 2
        assert fin.column('close')[0].as_py() == 3.0

    def test_batch_boundary_invariance(self):
        import pyarrow as pa
        from trafaret_ray.stages.streaming import StreamingBarAggregator
        H = self.HOUR
        rows = [('a', 5, 1.5), ('b', 7, 2.0), ('a', 30, 9.0),
                ('a', H + 2, 4.0), ('b', H + 3, 1.0),
                ('a', 2 * H + 1, 7.0), ('b', 2 * H + 9, 8.0)]
        def run(splits):
            agg = StreamingBarAggregator()
            outs = []
            lo = 0
            for hi in list(splits) + [len(rows)]:
                outs.append(agg(self._table(rows[lo:hi])))
                lo = hi
            outs.append(agg.flush(pa.string()))
            t = pa.concat_tables([o for o in outs if o.num_rows])
            return t.sort_by([('event_type', 'ascending'),
                              ('hour', 'ascending')]).to_pydict()
        whole = run([])
        assert run([2, 4]) == whole
        assert run([1, 2, 3, 4, 5, 6]) == whole
        # sanity on content: 'a' hour 0 bar
        assert whole['open'][0] == 1.5 and whole['close'][0] == 9.0
