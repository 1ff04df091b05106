"""Streaming-shaped workloads over the ordered, partitioned event log.

Ray Data is a batch/streaming-batch engine with no event-time watermarks
(SURVEY.md §1.5: the reference has no streaming semantics either). The
engine's streaming story:

  * **Tumbling / sliding windows** are batch-expressible: derive the
    window id per row (`floor(ts / size)`) and partial-aggregate — no
    ordering requirement at all, so they stream with full parallelism.
  * **Incremental per-entity state** (open sessions, running counters)
    uses a stateful ACTOR per key-hash bucket fed batches in ts order:
    ``StreamingSessionizer`` below carries each entity's open-session
    state across batches. Ordering assumption: within one actor's feed,
    batches arrive in non-decreasing ts order per entity (guaranteed when
    the upstream is the bucket exchange over a ts-sorted log).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import bucket_aggregate


def _ts_us_int(tbl: pa.Table, ts_col: str):
    """ts column as (arrow int64 us, numpy view with nulls->0). Cast to
    timestamp(us) FIRST: a ns input (pandas round-trip) cast straight to
    int64 would inflate window ids 1000x (CLAUDE.md landmine) — one copy
    of that invariant for every window flavor."""
    col = tbl.column(ts_col).combine_chunks()\
        .cast(pa.timestamp('us')).cast(pa.int64())
    return col, col.fill_null(0).to_numpy(zero_copy_only=False)


def _finish_window_start(out):
    """window_start_us (int64) -> window_start (timestamp[us]) — the
    shared output contract of tumbling/hopping."""
    def finish(tbl: pa.Table) -> pa.Table:
        cols = {name: tbl.column(name) for name in tbl.column_names}
        cols['window_start'] = tbl.column('window_start_us')\
            .combine_chunks().cast(pa.timestamp('us'))
        del cols['window_start_us']
        return pa.table(cols)

    return out.map_batches(finish, batch_format='pyarrow')


def tumbling_window(ds, key: str, ts_col: str, window_us: int,
                    aggs: dict[str, tuple[str, str]]):
    """Per (key, window) aggregate; window = floor(epoch_us / window_us).
    Emits ``window_start`` (timestamp[us]). Streams with one partial/final
    aggregation — no sort, no per-entity exchange. The (key, window) key
    space is high-cardinality, so the final merge is bucket_aggregate
    (hash exchange), not a Ray sort."""

    def derive(tbl: pa.Table) -> pa.Table:
        col, ts = _ts_us_int(tbl, ts_col)
        win = pa.array((ts // window_us) * window_us, type=pa.int64())
        if col.null_count:  # SQL: a NULL ts groups under a NULL window
            win = pc.if_else(col.is_null(), pa.nulls(len(col), pa.int64()),
                             win)
        return tbl.append_column('window_start_us', win)

    derived = ds.map_batches(derive, batch_format='pyarrow',
                             zero_copy_batch=True)
    out = bucket_aggregate(derived, [key, 'window_start_us'], aggs)
    return _finish_window_start(out)


def hopping_window(ds, key: str, ts_col: str, window_us: int, hop_us: int,
                   aggs: dict[str, tuple[str, str]]):
    """Sliding/hopping windows: each row belongs to ``window_us / hop_us``
    overlapping windows; rows explode to one copy per window (vectorized
    np.repeat — the explosion factor is the overlap count, a small
    constant) and partial-aggregate exactly like tumbling. No sort, no
    per-entity exchange. Emits ``window_start`` (timestamp[us])."""
    if window_us % hop_us:
        raise ValueError('window_us must be a multiple of hop_us')
    k = window_us // hop_us

    def derive(tbl: pa.Table) -> pa.Table:
        col, ts = _ts_us_int(tbl, ts_col)
        n = len(ts)
        base = (ts // hop_us)
        # windows starting at (base - j) * hop for j in 0..k-1 all contain
        # ts (start <= ts < start + window)
        j = np.tile(np.arange(k, dtype=np.int64), n)
        win = pa.array((np.repeat(base, k) - j) * hop_us, type=pa.int64())
        rep_idx = np.repeat(np.arange(n, dtype=np.int64), k)
        if col.null_count:  # a NULL ts row lands in ONE null window, not k
            # keep a single copy of each null-ts row with a null window id
            nulls = col.is_null().to_numpy(zero_copy_only=False)
            rep = np.repeat(nulls, k)
            first = np.zeros(n * k, dtype=bool)
            first[::k] = True
            keep = ~rep | first
            rep_idx = rep_idx[keep]
            win = pc.if_else(pa.array(rep[keep]),
                             pa.nulls(int(keep.sum()), pa.int64()),
                             win.filter(pa.array(keep)))
        out = tbl.take(pa.array(rep_idx))
        return out.append_column('window_start_us', win)

    derived = ds.map_batches(derive, batch_format='pyarrow',
                             zero_copy_batch=True)
    out = bucket_aggregate(derived, [key, 'window_start_us'], aggs)
    return _finish_window_start(out)


class StreamingSessionizer:
    """Stateful actor stage: incremental gap-sessionization.

    One actor per key-hash bucket; per batch it assigns global session ids
    continuing from carried per-entity state {entity: (last_ts,
    sessions_so_far)}. Exactness requires each entity's rows to reach ONE
    actor in ts order — i.e. feed it bucket-sorted blocks.
    """

    def __init__(self, key: str = 'user_id', ts_col: str = 'ts',
                 gap_us: int = 30 * 60 * 1_000_000):
        self.key = key
        self.ts_col = ts_col
        self.gap_us = gap_us
        self.state: dict = {}   # entity -> (last_ts, session_count)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from .window import group_starts
        if tbl.num_rows == 0:
            return tbl.append_column('session_id',
                                     pa.array([], type=pa.int64()))
        tbl = tbl.sort_by([(self.key, 'ascending'),
                           (self.ts_col, 'ascending')])
        keys = tbl.column(self.key).to_numpy(zero_copy_only=False)
        ts = tbl.column(self.ts_col).combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        n = len(keys)
        starts = group_starts(keys)
        lo = np.nonzero(starts)[0]
        sizes = np.diff(np.append(lo, n))
        hi = np.append(lo[1:], n) - 1

        # carry lookup once per ENTITY (not per row): segmented kernels
        # do the per-row work
        carried = [self.state.get(k) for k in keys[lo]]
        base = np.array([c[1] if c is not None else 0 for c in carried],
                        dtype=np.int64)
        prev_ts = np.array([c[0] if c is not None else 0 for c in carried],
                           dtype=np.int64)
        has_prev = np.array([c is not None for c in carried], dtype=bool)

        inc = np.zeros(n, dtype=np.int64)
        inc[1:] = ((ts[1:] - ts[:-1] > self.gap_us)
                   & ~starts[1:]).astype(np.int64)
        inc[lo] = (has_prev & (ts[lo] - prev_ts > self.gap_us))\
            .astype(np.int64)
        c = np.cumsum(inc)
        session_id = np.repeat(base, sizes) + c \
            - np.repeat(c[lo] - inc[lo], sizes)

        # update carried state once per entity with its LAST row
        for k, t, s in zip(keys[lo], ts[hi], session_id[hi]):
            self.state[k] = (int(t), int(s))
        return tbl.append_column('session_id',
                                 pa.array(session_id, type=pa.int64()))


class StreamingLagger:
    """Stateful actor stage: lag-1 features with state carried ACROSS
    batches — the actor-pool form of per-entity lag for a partitioned,
    ordered stream (each entity's rows must reach ONE actor in ts order,
    i.e. feed it bucket-sorted blocks; same contract as
    StreamingSessionizer).

    Emits ``prev_<col>`` for every requested value column plus
    ``gap_s`` (seconds since the entity's previous row). The first row
    an actor ever sees for an entity gets nulls — unless a carried state
    exists from an earlier batch, which is the point.
    """

    def __init__(self, key: str = 'user_id', ts_col: str = 'ts',
                 value_cols=('value',)):
        self.key = key
        self.ts_col = ts_col
        self.value_cols = list(value_cols)
        self.state: dict = {}   # entity -> (last_ts, {col: last_value})

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from .window import group_starts
        if tbl.num_rows == 0:
            out = tbl
            for c in self.value_cols:
                # TYPED empty: pa.array([]) is type null, and a
                # null-typed prev_<col> block cannot unify with
                # non-empty batches' output schema
                out = out.append_column(
                    f'prev_{c}',
                    pa.array([], type=tbl.schema.field(c).type))
            return out.append_column('gap_s',
                                     pa.array([], type=pa.float64()))
        tbl = tbl.sort_by([(self.key, 'ascending'),
                           (self.ts_col, 'ascending')])
        keys = tbl.column(self.key).to_numpy(zero_copy_only=False)
        ts = tbl.column(self.ts_col).combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        n = len(keys)
        starts = group_starts(keys)
        lo = np.nonzero(starts)[0]
        hi = np.append(lo[1:], n) - 1

        carried = [self.state.get(k) for k in keys[lo]]
        has_prev = np.array([c is not None for c in carried], dtype=bool)
        prev_ts_first = np.array([c[0] if c is not None else 0
                                  for c in carried], dtype=np.int64)

        # gap: within-batch diff everywhere, carried diff on first rows
        gap = np.empty(n, dtype=np.float64)
        gap[1:] = (ts[1:] - ts[:-1]) / 1e6
        gap[lo] = np.where(has_prev, (ts[lo] - prev_ts_first) / 1e6,
                           np.nan)
        out = tbl
        for c in self.value_cols:
            col = tbl.column(c).combine_chunks()
            # shift-by-one inside the batch: null row 0, then rows 0..n-2
            shifted = pa.concat_arrays([
                pa.nulls(1, type=col.type), col.slice(0, n - 1)])
            # entity firsts: carried value (null when no carry)
            first_vals = pa.array(
                [self.state[k][1].get(c) if self.state.get(k) is not None
                 else None for k in keys[lo]], type=col.type)
            mask = np.zeros(n, dtype=bool)
            mask[lo] = True
            import pyarrow.compute as pc
            shifted = pc.replace_with_mask(shifted, pa.array(mask),
                                           first_vals)
            out = out.append_column(f'prev_{c}', shifted)
        out = out.append_column('gap_s', pa.array(gap, type=pa.float64(),
                                                  mask=np.isnan(gap)))
        # carry each entity's LAST row (once per entity)
        for gi, k in enumerate(keys[lo]):
            h = hi[gi]
            self.state[k] = (int(ts[h]),
                             {c: tbl.column(c)[h].as_py()
                              for c in self.value_cols})
        return out


class LateRowTagger:
    """Stateful actor stage: event-time WATERMARK tracking with
    late-row tagging (the allowed-lateness model of the streaming
    engines Ray Data lacks natively).

    The watermark is ``max(event ts seen so far) - lateness_us``,
    carried across batches; a row is late iff its ts is strictly below
    the watermark AT ITS ARRIVAL (rows inside a batch advance the
    watermark in row order — vectorized as a shifted running max, no
    per-row Python). Late rows are TAGGED (``late`` bool column), not
    dropped — route them like quarantine: keep a side output, or filter
    and aggregate the on-time stream.

    Ordering contract (same as StreamingSessionizer): arrival order =
    the order batches reach ONE actor — run with ``concurrency=1`` (or
    one actor per key-hash bucket for per-partition watermarks) and
    ``preserve_order`` execution when replaying a log deterministically.
    """

    def __init__(self, ts_col: str = 'ts',
                 lateness_us: int = 5 * 60 * 1_000_000):
        self.ts_col = ts_col
        self.lateness_us = lateness_us
        self.max_ts: int | None = None   # max event ts seen so far

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column('late',
                                     pa.array([], type=pa.bool_()))
        ts = tbl.column(self.ts_col).combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        run = np.maximum.accumulate(ts)
        # max ts BEFORE each row: carried max for row 0, shifted running
        # max after — then the row itself advances the watermark
        before = np.empty_like(ts)
        # a first-ever row has no history: watermark undefined, never
        # late (before = its own ts keeps the arithmetic in-range)
        before[0] = self.max_ts if self.max_ts is not None else ts[0]
        before[1:] = run[:-1]
        if self.max_ts is not None:
            before = np.maximum(before, np.int64(self.max_ts))
        late = ts < before - np.int64(self.lateness_us)
        self.max_ts = int(max(run[-1],
                              self.max_ts if self.max_ts is not None
                              else run[-1]))
        return tbl.append_column('late', pa.array(late))


def watermark_tumbling(ds, key: str, ts_col: str, window_us: int,
                       lateness_us: int,
                       aggs: dict[str, tuple[str, str]]):
    """Tumbling windows over the ON-TIME stream of an out-of-order log:
    tag rows against the watermark (one LateRowTagger actor — a global
    watermark, the deterministic-replay configuration), window-aggregate
    the on-time rows, and return ``(windows, tagged)`` so the caller can
    audit or reroute the late side exactly like quarantine."""
    tagged = ds.map_batches(LateRowTagger,
                            fn_constructor_kwargs={
                                'ts_col': ts_col,
                                'lateness_us': lateness_us},
                            batch_format='pyarrow', concurrency=1)
    on_time = tagged.map_batches(
        lambda t: t.filter(pc.invert(t.column('late'))),
        batch_format='pyarrow', zero_copy_batch=True)
    return tumbling_window(on_time, key, ts_col, window_us, aggs), tagged


class StreamingBarAggregator:
    """Stateful actor stage: incremental OHLC resampling with
    event-time finalization.

    One actor per key-hash bucket; per batch it folds rows into
    per-(key, hour) bar partials and EMITS the bars whose hour closed —
    a bar is final once the actor's event-time watermark (max ts seen)
    has moved past its hour, so downstream consumers see each bar
    exactly once, as soon as it cannot change. Same feed contract as
    the other streaming actors: each key's rows reach ONE actor in
    non-decreasing ts order (bucket-sorted blocks). ``flush()`` emits
    the still-open bars at end-of-stream. State is one small tuple per
    OPEN (key, hour) — bounded by keys x 1, not by history.

    Byte-exactness: values fold at 1e6 fixed point; merging a batch's
    partial bar into a carried one is exact int math, so bar output is
    independent of batch boundaries (pinned by tests)."""

    HOUR_US = 3_600_000_000

    def __init__(self, key: str = 'event_type', ts_col: str = 'ts',
                 value_col: str = 'value'):
        self.key = key
        self.ts_col = ts_col
        self.value_col = value_col
        self.state: dict = {}        # (key, hour) -> bar tuple
        self.watermark = np.iinfo(np.int64).min

    _SCHEMA_TAIL = [('hour', pa.timestamp('us')), ('open', pa.float64()),
                    ('high', pa.float64()), ('low', pa.float64()),
                    ('close', pa.float64()), ('n', pa.int64()),
                    ('vol', pa.float64())]

    def _out_schema(self, key_type) -> pa.Schema:
        return pa.schema([(self.key, key_type)] + self._SCHEMA_TAIL)

    def _emit(self, items, key_type) -> pa.Table:
        cols = {self.key: pa.array([k for (k, _h) in items],
                                   type=key_type),
                'hour': pc.cast(pa.array(
                    [h * self.HOUR_US for (_k, h) in items],
                    type=pa.int64()), pa.timestamp('us'))}
        for i, name in enumerate(('open', 'high', 'low', 'close',
                                  'vol')):
            cols[name] = pa.array(
                [self.state[it][i] / 1e6 for it in items],
                type=pa.float64())
        cols['n'] = pa.array([self.state[it][5] for it in items],
                             type=pa.int64())
        out = pa.table(cols, schema=self._out_schema(key_type))
        for it in items:
            del self.state[it]
        return out.select([self.key, 'hour', 'open', 'high', 'low',
                           'close', 'n', 'vol'])

    def __call__(self, tbl: pa.Table) -> pa.Table:
        key_type = (tbl.schema.field(self.key).type
                    if self.key in tbl.column_names else pa.string())
        if tbl.num_rows == 0:
            return self._out_schema(key_type).empty_table()
        # in-batch bars via the segmented kernel
        t = tbl.sort_by([(self.key, 'ascending'),
                         (self.ts_col, 'ascending')])
        _, ts = _ts_us_int(t, self.ts_col)
        keys = t.column(self.key).to_numpy(zero_copy_only=False)
        hour = ts // self.HOUR_US
        new = np.ones(len(keys), dtype=bool)
        new[1:] = (keys[1:] != keys[:-1]) | (hour[1:] != hour[:-1])
        gi = np.nonzero(new)[0]
        last = np.append(gi[1:] - 1, len(keys) - 1)
        v = t.column(self.value_col).combine_chunks()\
            .cast(pa.float64())
        v6 = pc.cast(pc.floor(pc.add(pc.multiply(v, pa.scalar(1e6)),
                                     pa.scalar(0.5))), pa.int64())\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # fold each (key, hour) group into state (once per GROUP)
        for g, (s_, e_) in enumerate(zip(gi, last)):
            it = (keys[s_], int(hour[s_]))
            seg = v6[s_:e_ + 1]
            o, h, lo_, c = int(seg[0]), int(seg.max()), \
                int(seg.min()), int(seg[-1])
            n_, vol = int(e_ - s_ + 1), int(seg.sum())
            prev = self.state.get(it)
            if prev is None:
                self.state[it] = (o, h, lo_, c, vol, n_)
            else:
                self.state[it] = (prev[0], max(prev[1], h),
                                  min(prev[2], lo_), c,
                                  prev[4] + vol, prev[5] + n_)
        self.watermark = max(self.watermark, int(ts.max()))
        wm_hour = self.watermark // self.HOUR_US
        closed = sorted([it for it in self.state
                         if it[1] < wm_hour])
        return self._emit(closed, key_type)

    def flush(self, key_type=pa.string()) -> pa.Table:
        """End-of-stream: emit every still-open bar."""
        return self._emit(sorted(self.state), key_type)


class StreamingDeduper:
    """Stateful first-seen dedup for streaming ingestion: the actor
    holds the fingerprint state of everything it has seen and each
    batch emits only rows whose content hash is new (within the batch,
    first occurrence wins — arrival order IS the semantics of a
    streaming dedup).

    Modes: ``exact`` keeps an int64 fingerprint set (~50-80 B/distinct
    doc of actor heap — size the actor or shard the stream before the
    pool); ``bloom`` keeps a fixed ``m_bits`` bitmap (the joins.py
    double-hash family): memory-bounded forever, NEVER leaks a
    duplicate, and drops ~eps(fill) genuinely-new rows — the standard
    at-most-once trade for unbounded streams.

    Use with ``map_batches(StreamingDeduper, concurrency=1)`` for one
    global stream, or route by a key-hash exchange first and give each
    bucket its own actor for partitioned streams. Membership tests and
    bitmap updates are batch-vectorized (pandas hash isin / numpy
    scatter) — no per-row Python.

    At-least-once replay: a Ray actor task retry re-runs its batches
    against state the first attempt already updated — without a guard
    every row of a replayed batch reads as "seen" and is silently
    dropped (data loss beyond the documented bloom trade). The built-in
    ``replay_guard`` memoizes, per task, the emitted mask keyed by the
    batch's fingerprint-content hash, so a replay re-emits exactly what
    the first attempt emitted (idempotent — Ray discards the failed
    attempt's output). Envelope: it covers retries WITHIN a task
    (masks reset when a new task id arrives); lineage reconstruction
    re-running a previously-COMPLETED task is not covered — disable
    retries (``max_task_retries=0``, the default for actor tasks) if
    that can occur, mirroring how
    ``conversation_exact_dedup_incremental`` raises on a replayed
    ingest_key. Two content-identical batches inside ONE task are
    indistinguishable from a replay and re-emit (set
    ``replay_guard=False`` to restore pure first-seen semantics there).
    """

    def __init__(self, text_col: str = 'text', mode: str = 'exact',
                 m_bits: int = 1 << 27, k: int = 4,
                 replay_guard: bool = True):
        if mode not in ('exact', 'bloom'):
            raise ValueError(f'StreamingDeduper: unknown mode {mode!r}')
        self.text_col = text_col
        self.mode = mode
        self.replay_guard = replay_guard
        self._cur_task = None
        self._task_masks: dict = {}
        if mode == 'exact':
            self._seen: set = set()
        else:
            self.m_bits = ((m_bits + 7) // 8) * 8
            self.k = k
            # PACKED bitmap (uint8): m_bits/8 bytes of actor heap —
            # an unpacked bool array would cost 8x the advertised
            # memory per actor
            self._bits = np.zeros(self.m_bits // 8, dtype=np.uint8)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        from ..functions import text as T
        txt = pc.fill_null(
            tbl.column(self.text_col).cast(pa.string()), '')
        fp = T.hash_shingles(txt.to_numpy(zero_copy_only=False))\
            .view(np.int64)
        guard_key = None
        if self.replay_guard:
            try:
                import ray
                tid = ray.get_runtime_context().get_task_id()
            except Exception:
                tid = None
            if tid != self._cur_task:
                # new task: prior attempts of it can no longer replay
                self._cur_task = tid
                self._task_masks = {}
            guard_key = hash(fp.tobytes())
            cached = self._task_masks.get(guard_key)
            if cached is not None:
                return tbl.filter(pa.array(cached))
            if len(self._task_masks) > 256:
                # driver-side use has no task ids (tid None forever):
                # bound the memoization window
                self._task_masks.pop(next(iter(self._task_masks)))
        first_in_batch = ~pd.Series(fp).duplicated().to_numpy()
        if self.mode == 'exact':
            new = first_in_batch & ~pd.Series(fp).isin(self._seen)\
                .to_numpy()
            self._seen.update(fp[new].tolist())
        else:
            from .joins import _bloom_hashes
            pos = _bloom_hashes(fp.view(np.uint64).astype(np.uint64),
                                self.m_bits, self.k)
            byte, bit = pos >> 3, (pos & 7).astype(np.uint8)
            maybe_seen = ((self._bits[byte] >> bit) & 1).all(axis=0)
            new = first_in_batch & ~maybe_seen
            np.bitwise_or.at(self._bits, byte[:, new].reshape(-1),
                             np.uint8(1) << bit[:, new].reshape(-1))
        if guard_key is not None:
            self._task_masks[guard_key] = new
        return tbl.filter(pa.array(new))
