"""The flagship per-turn feature vector (north rule).

``conversation_features`` computes, over one sorted bucket (all
conversations contiguous, order (conv_id, turn_idx, ts)):

  * text_len              — utf8 length of the turn text
  * time_since_prev_s     — seconds since previous turn (null at conv start)
  * is_new_session        — gap-based session boundary (gap > gap_us)
  * session_id            — 0-based session index within the conversation
  * pos_in_session        — 0-based turn index within the session
  * prev_role / next_role — lag/lead-1 of role (null at edges)
  * prev_text_len         — lag-1 of text_len
  * tool_ffill            — latest tool used at-or-before this turn
  * last_tool             — as-of join: tool of the latest STRICTLY-prior
                            tool turn (zero leakage: a tool turn never sees
                            its own state)
  * last_tool_ts          — its timestamp
  * time_since_tool_s     — seconds since it

Everything is one vectorized pass (pyarrow.compute + the segmented numpy
kernels in stages/window.py); the as-of state side (role == 'tool') is
co-resident in the bucket, so the flagship needs NO second shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import window as W

GAP_US_DEFAULT = 30 * 60 * 1_000_000  # 30 minutes


def conversation_features(tbl: pa.Table, starts: np.ndarray,
                          gap_us: int = GAP_US_DEFAULT) -> pa.Table:
    n = tbl.num_rows
    role = tbl.column('role').combine_chunks()
    text = tbl.column('text').combine_chunks()
    tool = tbl.column('tool').combine_chunks()
    ts = tbl.column('ts').combine_chunks().cast(pa.timestamp('us'))
    ts_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)

    text_len = pc.utf8_length(text).cast(pa.int32())

    delta, delta_valid = W.time_since_prev_us(ts_us, starts)
    time_since_prev_s = pa.array(delta / 1e6, type=pa.float64(),
                                 mask=~delta_valid)

    is_new, session_id = W.sessionize(ts_us, starts, gap_us)
    pos_in_session = W.position_in_session(is_new)

    lag_idx, lag_ok = W.lag_indices(starts, 1)
    lead_idx, lead_ok = W.lead_indices(starts, 1)
    prev_role = W.take_masked(role, lag_idx, lag_ok)
    next_role = W.take_masked(role, lead_idx, lead_ok)
    prev_text_len = W.take_masked(text_len, lag_idx, lag_ok)

    tool_ffill = W.ffill_column(tool, starts)

    # as-of vs the conversation's own tool-state stream (strict <)
    conv_code = np.cumsum(starts) - 1
    tool_rows = np.asarray(tool.is_valid().to_numpy(zero_copy_only=False),
                           dtype=bool)
    r_idx = np.nonzero(tool_rows)[0]
    if len(r_idx):
        a_idx, a_ok = W.asof_backward(ts_us, conv_code,
                                      ts_us[r_idx], conv_code[r_idx])
        match = r_idx[a_idx]  # a_idx is 0 where unmatched; masked below
    else:
        match = np.zeros(n, dtype=np.int64)
        a_ok = np.zeros(n, dtype=bool)
    last_tool = W.take_masked(tool, match, a_ok)
    last_tool_ts = W.take_masked(ts, match, a_ok)
    tst = (ts_us - ts_us[match]) / 1e6
    time_since_tool_s = pa.array(tst, type=pa.float64(), mask=~a_ok)

    return pa.table({
        'conv_id': tbl.column('conv_id'),
        'turn_idx': tbl.column('turn_idx'),
        'role': role,
        'text': text,
        'tool': tool,
        'ts': ts,
        'text_len': text_len,
        'time_since_prev_s': time_since_prev_s,
        'is_new_session': pa.array(is_new),
        'session_id': pa.array(session_id, type=pa.int32()),
        'pos_in_session': pa.array(pos_in_session, type=pa.int32()),
        'prev_role': prev_role,
        'next_role': next_role,
        'prev_text_len': prev_text_len,
        'tool_ffill': tool_ffill,
        'last_tool': last_tool,
        'last_tool_ts': last_tool_ts,
        'time_since_tool_s': time_since_tool_s,
    })
