"""Segmented window kernels: vectorized per-group ordered features.

These are the new-engine operators the reference does not have
(SURVEY.md §2.9): lag/lead, time-since-prev, gap sessionization,
forward/backward fill — all computed over a batch whose rows are SORTED by
(group, order keys) with each group contiguous. Everything is numpy over
the whole batch (no per-group python), so a bucket holding thousands of
small conversations is one vectorized pass.

Inputs are plain numpy arrays + a boolean ``starts`` vector marking the
first row of each group. ``group_starts`` derives it from the sorted group
key column.

Leakage discipline (SURVEY.md §4.3): ``lag`` shifts strictly backward;
``ffill`` propagates past → future only; ``bfill`` is future → past and is
only legal for columns the pipeline explicitly declares training-safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def group_starts(keys: np.ndarray) -> np.ndarray:
    """First-row-of-group mask for a sorted key array."""
    n = len(keys)
    starts = np.empty(n, dtype=bool)
    if n == 0:
        return starts
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    return starts


def group_start_index(starts: np.ndarray) -> np.ndarray:
    """Per-row index of its group's first row."""
    n = len(starts)
    return np.maximum.accumulate(np.where(starts, np.arange(n), 0))


def group_end_index(starts: np.ndarray) -> np.ndarray:
    """Per-row index of its group's last row (inclusive)."""
    n = len(starts)
    ends = np.empty(n, dtype=np.int64)
    if n == 0:
        return ends
    is_last = np.empty(n, dtype=bool)
    is_last[:-1] = starts[1:]
    is_last[-1] = True
    rev = np.where(is_last, np.arange(n), n - 1)
    return np.minimum.accumulate(rev[::-1])[::-1]


def lag_indices(starts: np.ndarray, k: int = 1):
    """(take_index, valid) for a strict k-step backward shift within group."""
    n = len(starts)
    gs = group_start_index(starts)
    idx = np.arange(n) - k
    valid = idx >= gs
    return np.where(valid, idx, 0), valid


def lead_indices(starts: np.ndarray, k: int = 1):
    n = len(starts)
    ge = group_end_index(starts)
    idx = np.arange(n) + k
    valid = idx <= ge
    return np.where(valid, idx, 0), valid


def take_masked(arr: pa.Array, idx: np.ndarray, valid: np.ndarray) -> pa.Array:
    """arr[idx] with null where ~valid — the Arrow-typed shift primitive."""
    return arr.take(pa.array(idx, mask=~valid))


def lag_column(arr: pa.Array, starts: np.ndarray, k: int = 1) -> pa.Array:
    idx, valid = lag_indices(starts, k)
    return take_masked(arr, idx, valid)


def lead_column(arr: pa.Array, starts: np.ndarray, k: int = 1) -> pa.Array:
    idx, valid = lead_indices(starts, k)
    return take_masked(arr, idx, valid)


def time_since_prev_us(ts_us: np.ndarray, starts: np.ndarray):
    """(delta_us int64, valid) — delta to the previous turn in the group."""
    n = len(ts_us)
    delta = np.zeros(n, dtype=np.int64)
    if n:
        delta[1:] = ts_us[1:] - ts_us[:-1]
    valid = ~starts
    delta[starts] = 0
    return delta, valid


def sessionize(ts_us: np.ndarray, starts: np.ndarray,
               gap_us: int) -> tuple[np.ndarray, np.ndarray]:
    """Gap-based sessions: a new session begins at each group start and
    wherever the delta to the previous turn exceeds ``gap_us``.

    Returns (is_new_session bool, session_id int64 0-based within group).
    """
    delta, valid = time_since_prev_us(ts_us, starts)
    is_new = starts | (valid & (delta > gap_us))
    c = np.cumsum(is_new)
    gs = group_start_index(starts)
    session_id = c - c[gs]  # 0 at the group's first session row
    return is_new, session_id


def position_in_session(is_new_session: np.ndarray) -> np.ndarray:
    """0-based turn index within the current session."""
    n = len(is_new_session)
    idx = np.arange(n)
    sess_start = np.maximum.accumulate(np.where(is_new_session, idx, 0))
    return idx - sess_start


def ffill_indices(valid_value: np.ndarray, starts: np.ndarray):
    """(take_index, ok): index of the latest non-null value at-or-before each
    row within its group (past → future, leakage-safe)."""
    n = len(valid_value)
    idx = np.arange(n)
    pos = np.where(valid_value, idx, -1)
    pos = np.maximum.accumulate(pos)
    gs = group_start_index(starts)
    ok = pos >= gs
    return np.where(ok, pos, 0), ok


def bfill_indices(valid_value: np.ndarray, starts: np.ndarray):
    """(take_index, ok): earliest non-null value at-or-after each row within
    its group (future → past; only for declared non-leaking columns)."""
    n = len(valid_value)
    ge = group_end_index(starts)
    idx = np.arange(n)
    pos = np.where(valid_value, idx, n)
    pos = np.minimum.accumulate(pos[::-1])[::-1]
    ok = pos <= ge
    return np.where(ok, pos, 0), ok


def ffill_column(arr: pa.Array, starts: np.ndarray) -> pa.Array:
    valid = np.asarray(arr.is_valid().to_numpy(zero_copy_only=False),
                       dtype=bool)
    idx, ok = ffill_indices(valid, starts)
    return take_masked(arr, idx, ok)


def bfill_column(arr: pa.Array, starts: np.ndarray) -> pa.Array:
    valid = np.asarray(arr.is_valid().to_numpy(zero_copy_only=False),
                       dtype=bool)
    idx, ok = bfill_indices(valid, starts)
    return take_masked(arr, idx, ok)


def asof_backward(left_ts: np.ndarray, left_group: np.ndarray,
                  right_ts: np.ndarray, right_group: np.ndarray,
                  allow_exact: bool = False):
    """Per-group strict-backward as-of match (zero temporal leakage).

    Returns (right_index, matched) per left row: the index into the
    UNSORTED right arrays of the LATEST right row with ``right.ts <
    left.ts`` in the same group — strict ``<``, so a same-timestamp state
    row never leaks into its own turn (SURVEY.md §4.3); ``allow_exact``
    relaxes to ``<=`` (pandas merge_asof's allow_exact_matches). Group
    keys must be comparable scalars (factorized int codes recommended);
    neither side needs to be pre-sorted.

    Fully vectorized merge-rank algorithm, no per-group loop:
    interleave both sides sorted by (group, ts, side) with left rows
    ordered BEFORE right rows at equal ts (this is what makes the match
    strict; allow_exact flips that tie order); then for each left row the
    count of right rows earlier in its group picks the matching right row
    by rank. Among right ties on ts the last by input order wins (stable
    sort) — the deterministic tie-break.
    """
    m, r = len(left_ts), len(right_ts)
    if r == 0 or m == 0:
        return np.zeros(m, dtype=np.int64), np.zeros(m, dtype=bool)
    r_order = np.lexsort((right_ts, right_group))
    r_ts = right_ts[r_order]
    r_g = right_group[r_order]

    ts_all = np.concatenate([left_ts, r_ts])
    g_all = np.concatenate([left_group, r_g])
    side = np.concatenate([np.zeros(m, dtype=np.int8),
                           np.ones(r, dtype=np.int8)])
    sort_side = (np.int8(1) - side) if allow_exact else side
    order = np.lexsort((sort_side, ts_all, g_all))
    is_right = side[order] == 1
    cum_right = np.cumsum(is_right)
    starts = group_starts(g_all[order])
    gs = group_start_index(starts)
    # k: right rows in the same group at sorted positions <= p; for a left
    # row (is_right == 0) that is exactly "right rows strictly before it"
    k = cum_right - (cum_right[gs] - is_right[gs])
    left_pos = ~is_right
    k_left = k[left_pos]
    matched_sorted = k_left >= 1
    # right-group start offsets per left row
    orig_left_idx = order[left_pos]          # position into left arrays
    grp_lo = np.searchsorted(r_g, g_all[order][left_pos], side='left')
    match_sorted_right = grp_lo + np.maximum(k_left - 1, 0)
    match_right = r_order[np.minimum(match_sorted_right, r - 1)]

    out_idx = np.zeros(m, dtype=np.int64)
    out_ok = np.zeros(m, dtype=bool)
    out_idx[orig_left_idx] = match_right
    out_ok[orig_left_idx] = matched_sorted
    return out_idx, out_ok


def asof_forward(left_ts: np.ndarray, left_group: np.ndarray,
                 right_ts: np.ndarray, right_group: np.ndarray,
                 allow_exact: bool = False):
    """Per-group forward as-of match: the EARLIEST right row with
    ``right.ts > left.ts`` (``>=`` when ``allow_exact``) in the same
    group. The exact timestamp-negated mirror of ``asof_backward`` —
    same vectorized merge-rank, same input-order tie-break among equal
    right timestamps."""
    # negate in the NATIVE dtype — an int64 cast would truncate float
    # on-columns (2.9 -> 2) and match against the wrong values; unsigned
    # ints must widen first or negation wraps
    lt, rt = np.asarray(left_ts), np.asarray(right_ts)
    if lt.dtype.kind == 'u':
        lt = lt.astype(np.int64)
    if rt.dtype.kind == 'u':
        rt = rt.astype(np.int64)
    return asof_backward(-lt, left_group, -rt,
                         right_group, allow_exact=allow_exact)


def asof_nearest(left_ts: np.ndarray, left_group: np.ndarray,
                 right_ts: np.ndarray, right_group: np.ndarray,
                 allow_exact: bool = True):
    """Per-group nearest as-of match: the right row minimizing
    ``|right.ts - left.ts|``; on a distance tie the BACKWARD candidate
    wins (deterministic). ``allow_exact=True`` (default, pandas-like)
    lets an equal-timestamp row match at distance zero."""
    if len(right_ts) == 0 or len(left_ts) == 0:
        return (np.zeros(len(left_ts), dtype=np.int64),
                np.zeros(len(left_ts), dtype=bool))
    bi, bok = asof_backward(left_ts, left_group, right_ts, right_group,
                            allow_exact=allow_exact)
    fi, fok = asof_forward(left_ts, left_group, right_ts, right_group,
                           allow_exact=False)
    # distances in the native width: an int64 cast truncates float
    # on-columns and can flip which side is nearer on sub-unit gaps
    lts, rts = np.asarray(left_ts), np.asarray(right_ts)
    if lts.dtype.kind == 'f' or rts.dtype.kind == 'f':
        lts, rts = lts.astype(np.float64), rts.astype(np.float64)
        big = np.inf
    else:
        lts, rts = lts.astype(np.int64), rts.astype(np.int64)
        big = np.iinfo(np.int64).max
    bd = np.where(bok, lts - rts[bi], big)
    fd = np.where(fok, rts[fi] - lts, big)
    use_f = fok & (~bok | (fd < bd))
    idx = np.where(use_f, fi, bi)
    return idx, bok | fok


def rolling_window_bounds(starts: np.ndarray, k: int):
    """Per-row inclusive window [lo, i] of the last k rows within the
    group (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)."""
    n = len(starts)
    gs = group_start_index(starts)
    lo = np.maximum(np.arange(n) - (k - 1), gs)
    return lo


def rolling_sum(values: np.ndarray, starts: np.ndarray, k: int):
    """Windowed sum/count over the last k rows within each group — one
    cumsum + a gather, no per-window loop. NaNs count as missing.

    Returns (sums, counts) float64/int64 arrays.
    """
    n = len(values)
    v = np.asarray(values, dtype=np.float64)
    ok = ~np.isnan(v)
    vv = np.where(ok, v, 0.0)
    csum = np.concatenate([[0.0], np.cumsum(vv)])
    ccnt = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
    lo = rolling_window_bounds(starts, k)
    idx = np.arange(n)
    sums = csum[idx + 1] - csum[lo]
    counts = ccnt[idx + 1] - ccnt[lo]
    return sums, counts


def rolling_mean(values: np.ndarray, starts: np.ndarray, k: int):
    """Windowed mean over the last k rows within each group; NaN where the
    window holds no valid values."""
    sums, counts = rolling_sum(values, starts, k)
    with np.errstate(invalid='ignore', divide='ignore'):
        return np.where(counts > 0, sums / counts, np.nan)


def rolling_sum_fixed(values: np.ndarray, starts: np.ndarray, k: int):
    """``rolling_sum`` in EXACT int64 fixed-point: ``values`` is a float
    view of micro-unit integers (NaN = missing). The float64 prefix-sum
    in ``rolling_sum`` rounds at the magnitude of the whole-bucket
    prefix, so window sums lose exactness as buckets grow past 2^53
    micro-units — for an oracle-checked window aggregate the cumsum
    must be integer (CLAUDE.md fixed-point discipline).

    Returns (sums int64, counts int64)."""
    n = len(values)
    v = np.asarray(values, dtype=np.float64)
    ok = ~np.isnan(v)
    vv = np.where(ok, v, 0.0).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(vv, dtype=np.int64)])
    ccnt = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
    lo = rolling_window_bounds(starts, k)
    idx = np.arange(n)
    return csum[idx + 1] - csum[lo], ccnt[idx + 1] - ccnt[lo]


def rolling_min_max(values: np.ndarray, starts: np.ndarray, k: int):
    """Windowed min/max over the last k rows within each group.

    Uses a strided sliding-window view over the cummax-reset trick is not
    exact across group boundaries, so this pads each row's window to k via
    the [lo, i] bounds and reduces with np.minimum/maximum over k shifted
    copies — O(n·k) vectorized, fine for small k (document: for large k
    use a monotonic-deque per bucket).
    """
    n = len(values)
    v = np.asarray(values, dtype=np.float64)
    lo = rolling_window_bounds(starts, k)
    idx = np.arange(n)
    mins = v.copy()
    maxs = v.copy()
    for s in range(1, k):
        j = idx - s
        valid = j >= lo
        jj = np.maximum(j, 0)
        mins = np.where(valid, np.fmin(mins, v[jj]), mins)
        maxs = np.where(valid, np.fmax(maxs, v[jj]), maxs)
    return mins, maxs


def time_range_bounds(ts_us: np.ndarray, starts: np.ndarray,
                      range_us: int):
    """Per-row window [lo, hi] for RANGE BETWEEN range_us PRECEDING AND
    CURRENT ROW over ts-sorted groups, with SQL peer semantics: the
    window ENDS at the last row sharing this row's timestamp (standard
    RANGE/CURRENT ROW includes all peers).

    Vectorized across ALL groups at once: timestamps are normalized and
    shifted by group ordinal x span so one global searchsorted respects
    group boundaries (falls back to a per-group loop only if the shifted
    key would overflow int64 — astronomically large buckets)."""
    n = len(ts_us)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    gs = group_start_index(starts)
    g = np.cumsum(starts) - 1
    ts0 = ts_us - ts_us.min()
    span = int(ts0.max()) + int(range_us) + 1
    if int(g[-1]) * span < (1 << 62):
        shifted = ts0 + g * span
        lo = np.searchsorted(shifted, shifted - range_us, side='left')
        hi = np.searchsorted(shifted, shifted, side='right') - 1
    else:  # pragma: no cover - pathological span
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        bounds = np.append(gs[starts], n)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts_us[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - range_us, 'left')
            hi[s:e] = s + np.searchsorted(seg, seg, 'right') - 1
    return np.maximum(lo, gs), hi


def time_range_sum(values: np.ndarray, ts_us: np.ndarray,
                   starts: np.ndarray, range_us: int):
    """Windowed sum/count over the trailing time range per group (int64
    values stay exact int64 — pair with fixed-point scaling for
    byte-stable float sums). Returns (sums, counts)."""
    lo, hi = time_range_bounds(ts_us, starts, range_us)
    csum = np.concatenate([[0], np.cumsum(values)])
    sums = csum[hi + 1] - csum[lo]
    counts = (hi + 1 - lo).astype(np.int64)
    return sums, counts


def running_sum(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum within each group (ROWS UNBOUNDED PRECEDING);
    int64 in, exact int64 out."""
    cs = np.cumsum(values)
    gs = group_start_index(starts)
    base = cs[gs] - values[gs]
    return cs - base
