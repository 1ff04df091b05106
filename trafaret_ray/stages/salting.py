"""Skew salting: mega-conversations split into turn-range chunks with
EXACT boundary-state handoff (SURVEY.md §7 phase 4).

A conversation with millions of turns would pin one bucket task to a
single core (and can exceed its memory). The salted flagship:

  1. **Census** — partial-agg row counts per conv_id; conversations above
     ``max_group_rows`` become "mega" (rare by construction, so the mega
     set is tiny and broadcastable).
  2. **Chunking** — mega rows get ``salt = turn_idx // chunk_rows``;
     normal rows salt 0. The exchange key becomes (conv_id, salt), so a
     mega conversation spreads over ceil(n/chunk) tasks.
  3. **Boundary summaries** (distributed, mega rows only) — per chunk:
     row count, first/last row's (turn_idx, ts, role, text_len),
     sessions opened inside the chunk, last tool event in the chunk, and
     position bookkeeping. These are ~#chunks rows — tiny.
  4. **Driver scan** — an exclusive scan over each mega conv's chunk
     summaries (ordered by salt) yields, per chunk: the previous ROW's
     fields (for lag-1 / time-since / session-boundary tests), the
     session-id offset, the running position inside an open session, the
     carried last-tool state, and the NEXT chunk's first role (for
     lead-1). Broadcast via ``ray.put``.
  5. **Main pass** — one exchange on (conv_id, salt); per chunk the
     normal vectorized kernels run, then the first/last rows are patched
     from the carried state. Output is byte/allclose-identical to the
     unsalted pipeline (asserted in tests/test_salting.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .aggregate import pre_aggregate
from .conversations import BUCKET_COL, sort_bucket, _HASH_KEY
from .features import GAP_US_DEFAULT, conversation_features
from .window import group_starts

SALT_COL = '_salt'


def conv_census(ds, key='conv_id'):
    """Row count per conversation (partials exchange, not raw rows)."""
    def ids(tbl: pa.Table) -> pa.Table:
        return tbl.select([key])
    return pre_aggregate(ds.map_batches(ids, batch_format='pyarrow',
                                        zero_copy_batch=True),
                         [key], {'n_rows': (key, 'count')})


def _add_salt(tbl: pa.Table, mega: dict, chunk_rows: int,
              num_buckets: int) -> pa.Table:
    conv_col = tbl.column('conv_id').combine_chunks()
    conv = conv_col.to_numpy(zero_copy_only=False)
    turn = tbl.column('turn_idx').combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    salt = np.zeros(len(conv), dtype=np.int32)
    if mega:
        is_mega = np.asarray(
            pc.is_in(conv_col, value_set=pa.array(list(mega)))
            .to_numpy(zero_copy_only=False), dtype=bool)
        salt[is_mega] = (turn[is_mega] // chunk_rows).astype(np.int32)
    h = pd.util.hash_array(conv, hash_key=_HASH_KEY, categorize=False)
    bucket = ((h ^ (salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
              % np.uint64(num_buckets)).astype(np.int32)
    return tbl.append_column(SALT_COL, pa.array(salt, pa.int32()))\
              .append_column(BUCKET_COL, pa.array(bucket, pa.int32()))


def _chunk_summaries(tbl: pa.Table, gap_us: int) -> pa.Table:
    """Per-(conv, salt) boundary summary over a sorted bucket table."""
    conv = tbl.column('conv_id').to_numpy(zero_copy_only=False)
    salt = tbl.column(SALT_COL).to_numpy(zero_copy_only=False)
    keys = np.char.add(np.char.add(conv.astype('U'), '#'),
                       salt.astype('U'))
    starts = group_starts(keys)
    ts = tbl.column('ts').combine_chunks().cast(pa.timestamp('us'))\
        .cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    role = tbl.column('role').to_numpy(zero_copy_only=False)
    tool = tbl.column('tool').combine_chunks()
    tool_np = tool.to_numpy(zero_copy_only=False)
    tool_valid = np.asarray(tool.is_valid().to_numpy(zero_copy_only=False),
                            dtype=bool)
    # KEEP NULLS: a NULL chunk-final text must carry as NULL prev_text_len
    # (the unsalted lag emits NULL there); the numpy view would floatify
    # to NaN and .astype(int64) turns that into INT64_MIN garbage
    text_len_arr = pc.cast(
        pc.utf8_length(tbl.column('text').combine_chunks()), pa.int64())

    lo = np.nonzero(starts)[0]
    hi = np.append(lo[1:], len(keys)) - 1
    # sessions opened strictly inside the chunk (after its first row)
    delta = np.zeros(len(ts), dtype=np.int64)
    delta[1:] = ts[1:] - ts[:-1]
    inner_new = (~starts) & (delta > gap_us)
    c = np.cumsum(inner_new)
    inner_sessions = c[hi] - c[lo] + inner_new[lo]
    # rows since the last session break at chunk end (for pos carry)
    idx = np.arange(len(ts))
    brk = np.where(inner_new | starts, idx, 0)
    last_brk = np.maximum.accumulate(brk)
    tail_rows = idx - last_brk + 1          # rows in the open session ending at i
    # last tool event position per chunk
    tool_pos = np.where(tool_valid, idx, -1)
    tool_cum = np.maximum.accumulate(np.where(starts, tool_pos,
                                              np.maximum(tool_pos, -1)))
    # per-chunk last tool: max within [lo, hi]
    seg_last_tool = np.maximum.reduceat(tool_pos, lo)

    rows = {
        'conv_id': conv[lo],
        'salt': salt[lo],
        'n_rows': (hi - lo + 1).astype(np.int64),
        'first_ts': ts[lo],
        'last_ts': ts[hi],
        'last_role': role[hi],
        'first_role': role[lo],
        'last_text_len': text_len_arr.take(pa.array(hi, type=pa.int64())),
        'inner_sessions': inner_sessions.astype(np.int64),
        'tail_rows': tail_rows[hi].astype(np.int64),
        'has_tool': seg_last_tool >= 0,
        'last_tool': np.where(seg_last_tool >= 0,
                              tool_np[np.maximum(seg_last_tool, 0)], None),
        'last_tool_ts': ts[np.maximum(seg_last_tool, 0)],
    }
    return pa.table({k: (v if isinstance(v, (pa.Array, pa.ChunkedArray))
                         else pa.array(v)) for k, v in rows.items()})


def _scan_carry(summaries: pd.DataFrame, gap_us: int) -> dict:
    """Driver-side exclusive scan per conv over chunk summaries (ordered
    by salt). Returns {(conv, salt): carry dict} for salt > 0 chunks plus
    next-role for every chunk."""
    carry = {}
    for conv, g in summaries.groupby('conv_id', sort=False):
        g = g.sort_values('salt').reset_index(drop=True)
        session_base = 0          # sessions opened before this chunk
        open_run = 0              # rows of the open session before chunk
        prev = None               # previous chunk's summary row
        tool_state = (None, None)
        for i, row in g.iterrows():
            nxt_role = g.iloc[i + 1]['first_role'] if i + 1 < len(g) else None
            if prev is not None:
                boundary_new = (row['first_ts'] - prev['last_ts']) > gap_us
                carry[(conv, int(row['salt']))] = {
                    'prev_ts': int(prev['last_ts']),
                    'prev_role': prev['last_role'],
                    # NULL-text chunk end: carry None (pandas surfaces
                    # the arrow null as NaN), matching the unsalted lag
                    'prev_text_len': (None if pd.isna(prev['last_text_len'])
                                      else int(prev['last_text_len'])),
                    'session_base': session_base,
                    'boundary_new': bool(boundary_new),
                    'open_run': 0 if boundary_new else int(open_run),
                    'tool': tool_state[0],
                    'tool_ts': tool_state[1],
                }
            carry[('next', conv, int(row['salt']))] = nxt_role
            # advance the scan
            first_new = prev is None or \
                (row['first_ts'] - prev['last_ts']) > gap_us
            # a chunk whose first row opens a session (incl. the conv's
            # very first chunk) contributes that session too
            opened = int(row['inner_sessions']) + (1 if first_new else 0)
            session_base += opened
            if int(row['inner_sessions']) > 0 or first_new:
                open_run = int(row['tail_rows'])
            else:
                open_run += int(row['n_rows'])
            if row['has_tool']:
                tool_state = (row['last_tool'], int(row['last_tool_ts']))
            prev = row
    return carry


def flagship_features_salted(ok_ds, max_group_rows: int = 100_000,
                             chunk_rows: int | None = None,
                             gap_us: int = GAP_US_DEFAULT,
                             num_buckets: int = 32):
    """Skew-hardened flagship feature stage: identical output to
    ``feature_dataset`` but no task ever holds more than ~chunk_rows rows
    of one conversation."""
    chunk_rows = chunk_rows or max_group_rows
    census = conv_census(ok_ds).to_pandas()
    mega = {c: int(n) for c, n in zip(census['conv_id'], census['n_rows'])
            if n > max_group_rows}

    if not mega:
        from ..pipelines.flagship import feature_dataset
        return feature_dataset(ok_ds, num_buckets, gap_us)

    mega_ref = ray.put(mega)

    # -- boundary summaries over mega rows only ---------------------------
    def only_mega(tbl: pa.Table) -> pa.Table:
        m = ray.get(mega_ref)
        return tbl.filter(pc.is_in(tbl.column('conv_id'),
                                   value_set=pa.array(list(m))))

    mega_rows = ok_ds.map_batches(only_mega, batch_format='pyarrow',
                                  zero_copy_batch=True)
    salted_mega = mega_rows.map_batches(
        lambda t: _add_salt(t, mega, chunk_rows, num_buckets),
        batch_format='pyarrow')

    def summarize(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([('conv_id', 'ascending'), (SALT_COL, 'ascending'),
                           ('turn_idx', 'ascending'), ('ts', 'ascending')])
        return _chunk_summaries(tbl, gap_us)

    summaries = salted_mega.groupby(BUCKET_COL).map_groups(
        lambda t: summarize(t.drop_columns([BUCKET_COL])),
        batch_format='pyarrow').to_pandas()
    carry = _scan_carry(summaries, gap_us)
    carry_ref = ray.put(carry)

    # -- main pass --------------------------------------------------------
    def run_chunk(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        cmap = ray.get(carry_ref)
        tbl = tbl.sort_by([('conv_id', 'ascending'), (SALT_COL, 'ascending'),
                           ('turn_idx', 'ascending'), ('ts', 'ascending')])
        conv = tbl.column('conv_id').to_numpy(zero_copy_only=False)
        salt = tbl.column(SALT_COL).to_numpy(zero_copy_only=False)
        keys = np.char.add(np.char.add(conv.astype('U'), '#'),
                           salt.astype('U'))
        starts = group_starts(keys)
        body = tbl.drop_columns([SALT_COL])
        feats = conversation_features(body, starts, gap_us)
        return _patch_chunks(feats, conv, salt, starts, cmap, gap_us)

    salted = ok_ds.map_batches(
        lambda t: _add_salt(t, mega, chunk_rows, num_buckets),
        batch_format='pyarrow')
    return salted.groupby(BUCKET_COL).map_groups(
        lambda t: run_chunk(t.drop_columns([BUCKET_COL])),
        batch_format='pyarrow')


def _patch_chunks(feats: pa.Table, conv, salt, starts, cmap,
                  gap_us) -> pa.Table:
    """Fix up chunk-local features with carried boundary state.

    Fully vectorized: the only Python loop is over CHUNKS (≈rows /
    chunk_rows — tiny), never rows. String columns are patched in place
    with ``pc.replace_with_mask`` (replacements only for masked slots);
    the carried-tool patch is a masked fill over each chunk's
    null-prefix (rows before the first local tool event), not a per-row
    walk."""
    n = feats.num_rows
    cols = {name: feats.column(name).combine_chunks()
            for name in feats.column_names}
    ts_us = cols['ts'].cast(pa.timestamp('us')).cast(pa.int64())\
        .to_numpy(zero_copy_only=False)

    sess = cols['session_id'].to_numpy(zero_copy_only=False).astype(
        np.int64).copy()
    pos = cols['pos_in_session'].to_numpy(zero_copy_only=False).astype(
        np.int64).copy()
    is_new = cols['is_new_session'].to_numpy(zero_copy_only=False).copy()
    tsp = cols['time_since_prev_s'].to_numpy(zero_copy_only=False).copy()
    tst = cols['time_since_tool_s'].to_numpy(zero_copy_only=False).copy()

    lo_idx = np.nonzero(starts)[0]
    ng = len(lo_idx)
    sizes = np.diff(np.append(lo_idx, n))
    ends = np.append(lo_idx[1:], n) - 1
    idx = np.arange(n)

    # gather per-GROUP carried state (loop over chunks, not rows)
    g_carry = [cmap.get((conv[lo], int(salt[lo])))
               if salt[lo] > 0 else None for lo in lo_idx]
    g_next = [cmap.get(('next', conv[lo], int(salt[lo]))) for lo in lo_idx]
    has = np.array([cr is not None for cr in g_carry], dtype=bool)

    def gvals(field, default, dtype):
        return np.array([cr[field] if cr is not None else default
                         for cr in g_carry], dtype=dtype)

    g_prev_ts = gvals('prev_ts', 0, np.int64)
    g_first_new = gvals('boundary_new', False, bool)
    g_session_base = gvals('session_base', 0, np.int64)
    g_open_run = gvals('open_run', 0, np.int64)
    g_tool = np.array([cr['tool'] if cr is not None else None
                       for cr in g_carry], dtype=object)
    g_tool_ts = np.array([cr['tool_ts'] if cr is not None
                          and cr['tool'] is not None else 0
                          for cr in g_carry], dtype=np.int64)

    # -- lag-1 fields on each carried chunk's first row -------------------
    lo_has = lo_idx[has]
    tsp[lo_has] = (ts_us[lo_has] - g_prev_ts[has]) / 1e6
    is_new[lo_has] = g_first_new[has]

    mask = np.zeros(n, dtype=bool)
    mask[lo_has] = True
    cols['prev_role'] = pc.replace_with_mask(
        cols['prev_role'], pa.array(mask),
        pa.array([cr['prev_role'] for cr in g_carry if cr is not None],
                 type=pa.string()))
    cols['prev_text_len'] = pc.replace_with_mask(
        cols['prev_text_len'], pa.array(mask),
        pa.array([cr['prev_text_len'] for cr in g_carry if cr is not None],
                 type=cols['prev_text_len'].type))

    # -- lead-1 on each chunk's last row (next chunk's first role) --------
    nr_null = pc.is_null(cols['next_role']).to_numpy(zero_copy_only=False)
    g_patch_next = np.array(
        [nx is not None and nr_null[ends[gi]]
         for gi, nx in enumerate(g_next)], dtype=bool)
    nmask = np.zeros(n, dtype=bool)
    nmask[ends[g_patch_next]] = True
    cols['next_role'] = pc.replace_with_mask(
        cols['next_role'], pa.array(nmask),
        pa.array([nx for gi, nx in enumerate(g_next) if g_patch_next[gi]],
                 type=pa.string()))

    # -- session accounting (per-row adds via repeat over group sizes) ----
    g_sess_add = np.where(has,
                          g_session_base - (~g_first_new).astype(np.int64),
                          0)
    sess += np.repeat(g_sess_add, sizes)
    # pos offset: continued-session chunks add open_run to the prefix up
    # to the first LOCAL new session strictly after the chunk start
    rel = idx - np.repeat(lo_idx, sizes)
    new_after = is_new & (rel > 0)
    first_new_after = np.minimum.reduceat(
        np.where(new_after, idx, n), lo_idx) if ng else np.array([], int)
    stop = np.minimum(first_new_after, ends + 1)
    g_pos_add = np.where(has & ~g_first_new, g_open_run, 0)
    pos += np.where(idx < np.repeat(stop, sizes),
                    np.repeat(g_pos_add, sizes), 0)

    # -- carried tool state: masked fill over each chunk's null-prefix ---
    row_ctool = np.repeat(
        np.array([t is not None for t in g_tool]), sizes)
    row_tool_ts = np.repeat(g_tool_ts, sizes)
    lt_null = pc.is_null(cols['last_tool']).to_numpy(zero_copy_only=False)
    mask_lt = lt_null & row_ctool
    row_tool = np.repeat(g_tool, sizes)
    cols['last_tool'] = pc.replace_with_mask(
        cols['last_tool'], pa.array(mask_lt),
        pa.array(row_tool[mask_lt], type=pa.string()))
    lt_ts = pc.replace_with_mask(
        cols['last_tool_ts'].cast(pa.int64()), pa.array(mask_lt),
        pa.array(row_tool_ts[mask_lt], type=pa.int64()))
    cols['last_tool_ts'] = lt_ts.cast(pa.timestamp('us'))
    tst = np.where(mask_lt, (ts_us - row_tool_ts) / 1e6, tst)
    tf_null = pc.is_null(cols['tool_ffill']).to_numpy(zero_copy_only=False)
    mask_tf = tf_null & row_ctool
    cols['tool_ffill'] = pc.replace_with_mask(
        cols['tool_ffill'], pa.array(mask_tf),
        pa.array(row_tool[mask_tf], type=pa.string()))

    # session_base for salt>0 chunks whose first row IS new already counts
    # it: when first_new, local session 0 is a NEW session and session_base
    # sessions came before -> ids shift by session_base (applied above).
    out = dict(cols)
    out['session_id'] = pa.array(sess.astype(np.int32), type=pa.int32())
    out['pos_in_session'] = pa.array(pos.astype(np.int32), type=pa.int32())
    out['is_new_session'] = pa.array(is_new)
    out['time_since_prev_s'] = pa.array(
        tsp, type=pa.float64(),
        mask=np.isnan(tsp))
    out['time_since_tool_s'] = pa.array(tst, type=pa.float64(),
                                        mask=np.isnan(tst))
    return pa.table(out)
