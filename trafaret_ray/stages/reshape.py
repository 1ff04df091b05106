"""Reshape operators: melt (wide -> long) and per-group window ranks.

Both are pure per-batch / per-bucket vectorized transforms — melt never
shuffles at all; ranks ride the standard per-entity exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = 'variable', value_name: str = 'value'):
    """Wide -> long (SQL UNPIVOT): each row explodes to one row per value
    column, labeled with the column name. Pure map — the explosion factor
    is len(value_cols), no exchange; value columns unify to float64."""

    def f(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        parts = []
        for c in value_cols:
            cols = {k: tbl.column(k) for k in id_cols}
            cols[var_name] = pa.array(np.full(n, c, dtype=object),
                                      type=pa.string())
            cols[value_name] = pc.cast(tbl.column(c), pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format='pyarrow', zero_copy_batch=True)


def explode_list(ds, list_col: str, id_cols: list[str],
                 pos_name: str = 'pos', value_name: str = 'val'):
    """UNNEST a list column: one output row per element, with the
    element's 0-based position. SQL unnest semantics — empty and NULL
    lists produce no rows.

    Pure map, no exchange: the flattened values child is taken from the
    ListArray without copying element storage (``pc.list_flatten``), id
    columns replicate via one vectorized ``take`` per column, and
    positions come from a single arange-minus-starts pass. The explosion
    factor is the mean list length — size ``batch_size`` upstream so
    batch_rows x list_len stays within the worker heap (a 4k-dim
    embedding batch of 100k rows is 400M output rows: use small batches
    for wide lists)."""

    def f(tbl: pa.Table) -> pa.Table:
        arr = tbl.column(list_col).combine_chunks()
        lens = pc.fill_null(pc.list_value_length(arr), 0)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        starts = np.cumsum(lens) - lens
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        cols = {c: tbl.column(c).take(pa.array(parent)) for c in id_cols}
        cols[pos_name] = pa.array(pos)
        cols[value_name] = pc.list_flatten(arr)
        return pa.table(cols)

    return ds.map_batches(f, batch_format='pyarrow', zero_copy_batch=True)


def pivot(ds, id_cols: list[str], var_col: str, value_col: str,
          variables: list[str], aggfunc: str = 'first',
          num_buckets: int = 32):
    """Long -> wide (SQL PIVOT): co-locate each id with one hash exchange
    on the first id column, then one pandas pivot per bucket. The output
    column set must be DECLARED (``variables``) — discovering it would
    need an extra distinct pass, and a 100-TB pivot with unbounded
    variables is a design smell anyway. ``aggfunc`` resolves duplicate
    (id, variable) cells ('first'/'sum'/'min'/'max'; for byte-stable
    float sums feed fixed-point int64 values)."""

    def f(tbl: pa.Table) -> pa.Table:
        gtypes = {c: tbl.schema.field(c).type for c in id_cols} \
            if tbl.num_rows else {c: pa.int64() for c in id_cols}
        vtype = tbl.schema.field(value_col).type if tbl.num_rows \
            else pa.float64()
        if tbl.num_rows == 0:
            cols = {c: pa.array([], type=gtypes[c]) for c in id_cols}
            for v in variables:
                cols[v] = pa.array([], type=vtype)
            return pa.table(cols)
        df = tbl.to_pandas()
        # groupby(dropna=False)+unstack, NOT pivot_table: SQL GROUP BY
        # keeps NULL id keys as a group, and pivot_table's dropna=False
        # expands the index to the CARTESIAN product of id values —
        # unstack keeps only observed id combinations.
        # SQL sum over only-NULL cells is NULL; pandas' default sum of
        # all-NaN is 0.0 — min_count=1 restores the SQL behavior. Call
        # .sum() directly (cythonized); agg(lambda) would run a Python
        # call per group (measured 12x wall on the pivot query).
        gb = df.groupby(id_cols + [var_col], sort=False,
                        dropna=False)[value_col]
        ser = gb.sum(min_count=1) if aggfunc == 'sum' else gb.agg(aggfunc)
        wide = ser.unstack(var_col).reindex(columns=variables)\
            .reset_index()
        wide.columns = [str(c) for c in wide.columns]
        # Pin the output schema to the INPUT field types: pandas re-infers
        # per bucket, so a bucket whose id values are all NULL comes back
        # as float64 (vs string elsewhere) and a fully-observed bucket
        # emits int64 values while one with missing cells emits float64 —
        # block schema unification then fails nondeterministically
        # depending on how groups packed into tasks. from_pandas with an
        # explicit schema maps NaN -> null losslessly.
        target = pa.schema([(c, gtypes[c]) for c in id_cols]
                           + [(str(v), vtype) for v in variables])
        return pa.Table.from_pandas(wide, schema=target,
                                    preserve_index=False)

    from .conversations import bucket_exchange
    return bucket_exchange(ds, id_cols[0], f, num_buckets)


def group_positions(values: np.ndarray, tiebreak: np.ndarray,
                    starts: np.ndarray, descending: bool = True,
                    tiles: int = 4):
    """The positional SQL window functions per group, one lexsort over
    the whole bucket: row_number() / percent_rank() / cume_dist() /
    ntile(tiles).

    ``tiebreak`` makes the row_number/ntile order TOTAL (SQL leaves tie
    order undefined — an oracle comparison needs it pinned); rank-based
    percent_rank/cume_dist treat equal ``values`` as peers (NaN == NaN,
    like group_ranks). percent_rank of a 1-row group is 0.0; ntile
    follows SQL's fill rule (first n%tiles buckets get one extra row).

    Returns (row_number, percent_rank, cume_dist, ntile) arrays aligned
    with the input rows.
    """
    n = len(values)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        f = np.zeros(0, dtype=np.float64)
        return z, f, f.copy(), z.copy()
    g = np.cumsum(starts) - 1
    key = -values if descending else values
    order = np.lexsort((tiebreak, key, g))
    gs, ks = g[order], key[order]
    pos = np.arange(n, dtype=np.int64)
    new_g = np.ones(n, dtype=bool)
    new_g[1:] = gs[1:] != gs[:-1]
    gstart = np.maximum.accumulate(np.where(new_g, pos, 0))
    rn_sorted = pos - gstart + 1
    gb = np.nonzero(new_g)[0]
    gsizes = np.diff(np.append(gb, n))
    ng = np.repeat(gsizes, gsizes)
    # tie runs over VALUES (peers; NaN compares equal to NaN)
    neq = ks[1:] != ks[:-1]
    if ks.dtype.kind == 'f':
        neq &= ~(np.isnan(ks[1:]) & np.isnan(ks[:-1]))
    new_val = np.ones(n, dtype=bool)
    new_val[1:] = new_g[1:] | neq
    run_first = np.maximum.accumulate(np.where(new_val, pos, 0))
    rank_sorted = run_first - gstart + 1
    vb = np.nonzero(new_val)[0]
    vsizes = np.diff(np.append(vb, n))
    run_last = np.repeat(vb + vsizes - 1, vsizes)
    peer_last = run_last - gstart + 1
    cume_sorted = peer_last.astype(np.float64) / ng
    pct_sorted = np.where(
        ng > 1, (rank_sorted - 1).astype(np.float64)
        / np.maximum(ng - 1, 1), 0.0)
    # SQL NTILE: the first n%tiles buckets take ceil(n/tiles) rows
    size = ng // tiles
    rem = ng % tiles
    r0 = rn_sorted - 1
    big = rem * (size + 1)
    tile_sorted = np.where(
        r0 < big, r0 // np.maximum(size + 1, 1),
        rem + (r0 - big) // np.maximum(size, 1)) + 1
    rn = np.empty(n, dtype=np.int64)
    pct = np.empty(n, dtype=np.float64)
    cume = np.empty(n, dtype=np.float64)
    tile = np.empty(n, dtype=np.int64)
    rn[order] = rn_sorted
    pct[order] = pct_sorted
    cume[order] = cume_sorted
    tile[order] = tile_sorted
    return rn, pct, cume, tile


def group_ranks(values: np.ndarray, starts: np.ndarray,
                descending: bool = True):
    """Per-group rank() and dense_rank() of ``values`` over groups marked
    by ``starts`` (SQL semantics: rank has gaps after ties, dense_rank
    does not). One lexsort over the whole bucket — no per-group loop.

    Returns (rank, dense_rank) int64 arrays aligned with the input rows.
    """
    n = len(values)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    g = np.cumsum(starts) - 1
    key = -values if descending else values
    order = np.lexsort((key, g))
    gs, ks = g[order], key[order]
    pos = np.arange(n, dtype=np.int64)
    gstart = np.zeros(n, dtype=np.int64)
    new_g = np.ones(n, dtype=bool)
    new_g[1:] = gs[1:] != gs[:-1]
    gstart = np.maximum.accumulate(np.where(new_g, pos, 0))
    # first position of each tie run (same group AND same key).
    # SQL rank()/dense_rank() treat NULLs as PEERS, so NaN must compare
    # equal to NaN here (plain != would give every NaN its own rank);
    # np.lexsort already groups NaNs together at the end of each group.
    neq = ks[1:] != ks[:-1]
    if ks.dtype.kind == 'f':
        neq &= ~(np.isnan(ks[1:]) & np.isnan(ks[:-1]))
    new_val = np.ones(n, dtype=bool)
    new_val[1:] = new_g[1:] | neq
    run_first = np.maximum.accumulate(np.where(new_val, pos, 0))
    rank_sorted = run_first - gstart + 1
    # dense rank: count of distinct values so far within the group
    cnv = np.cumsum(new_val)
    dense_sorted = cnv - np.maximum.accumulate(
        np.where(new_g, cnv - 1, 0))
    rank = np.empty(n, dtype=np.int64)
    dense = np.empty(n, dtype=np.int64)
    rank[order] = rank_sorted
    dense[order] = dense_sorted
    return rank, dense
