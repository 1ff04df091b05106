"""Two-phase (partial/final) aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every row; at 100 TB that
is the dominant cost for low-cardinality keys. ``pre_aggregate`` combines
inside each ``map_batches`` first (one partial row per key per batch —
Arrow-native ``Table.group_by``), so the exchange moves only partials, then a
small Ray ``groupby`` finalizes. Supported aggs compose from mergeable
partials: sum, count, min, max; mean is finalized as sum/count.

For HIGH-cardinality keys (pair counts, per-document rollups, content
fingerprints) the final Ray ``groupby`` is a full sort by the key tuple —
measured ~8x slower than hashing here. ``bucket_aggregate`` keeps the same
partial phase but exchanges on an int32 hash bucket of the keys and
finishes with an in-bucket Arrow ``group_by`` instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MERGE = {'sum': 'sum', 'count': 'sum', 'min': 'min', 'max': 'max'}


def _build_plan(aggs: dict[str, tuple[str, str]]):
    plan = {}      # partial col -> (src col, partial fn)
    finals = {}    # out name -> expression over partial cols
    for out, (col, fn) in aggs.items():
        if fn == 'mean':
            plan[f'__s_{out}'] = (col, 'sum')
            plan[f'__c_{out}'] = (col, 'count')
            finals[out] = ('div', f'__s_{out}', f'__c_{out}')
        else:
            plan[out] = (col, fn)
            finals[out] = ('id', out, None)
    return plan, finals


def _group_table(tbl: pa.Table, keys, specs_src) -> pa.Table:
    """Arrow-native grouped aggregation; returns key cols + '{col}_{fn}'
    columns. SQL semantics throughout: null keys form their own group,
    'count' counts non-null values, and a sum over ONLY nulls is NULL
    (not 0) — matching the DuckDB oracle; null partials are then skipped
    by the merge phase, so mixed groups still sum correctly."""
    # options built here: pyarrow *Options objects don't pickle
    import pyarrow.compute as _pc
    specs = [(col, fn, _pc.ScalarAggregateOptions(min_count=1))
             if fn == 'sum' else (col, fn) for col, fn in specs_src]
    # pyarrow 16.1's hash grouper emits DUPLICATE groups when a
    # composite key mixes a null-bearing string column with a numeric
    # one (single-key nulls group fine; observed: 6 identical
    # (null, 10.0) rows -> 2 output groups). Never feed the grouper a
    # null key: group on (fill_null(col), is_valid(col)) pairs — a 1:1
    # recoding — and restore the nulls on the way out.
    # The recoded key lives in RENAMED companion columns so a column
    # that is both a group key and an aggregation source (exact_distinct
    # counts its own key to detect null pairs) keeps its nulls.
    gkeys, restore = [], {}            # key col -> (filled, validity)
    for k in list(keys):
        col = tbl.column(k)
        fill = _zero_scalar(col.type) if col.null_count else None
        if fill is None:               # no nulls (or exotic key type)
            gkeys.append(k)
            continue
        kname, vname = f'__key_{k}', f'__valid_{k}'
        tbl = tbl.append_column(kname, _pc.fill_null(col, fill))
        tbl = tbl.append_column(vname, _pc.is_valid(col))
        gkeys += [kname, vname]
        restore[k] = (kname, vname)
    agged = tbl.group_by(gkeys).aggregate(specs)
    for k, (kname, vname) in restore.items():
        col = agged.column(kname)
        null = pa.scalar(None, type=col.type)
        agged = agged.append_column(
            k, _pc.if_else(agged.column(vname), col, null))
        agged = agged.drop_columns([kname, vname])
    return agged


def _zero_scalar(t: pa.DataType):
    """An arbitrary in-domain fill constant for a key type (a validity
    companion column disambiguates real zeros from filled nulls)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar('', type=t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return pa.scalar(b'\x00' * t.byte_width
                         if pa.types.is_fixed_size_binary(t) else b'',
                         type=t)
    if pa.types.is_boolean(t):
        return pa.scalar(False, type=t)
    try:                               # ints, floats, temporal, decimal
        return pa.scalar(0, type=t)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, TypeError):
        return None


def _finalize_fn(keys, finals):
    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {k: tbl.column(k) for k in keys}
        for out, (kind, a, b) in finals.items():
            if kind == 'div':
                cols[out] = pc.divide(
                    pc.cast(tbl.column(a), pa.float64()),
                    pc.cast(tbl.column(b), pa.float64()))
            else:
                cols[out] = tbl.column(a)
        return pa.table(cols)
    return finalize


def pre_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                  batch_format: str = 'pyarrow'):
    """aggs: {out_name: (col, fn)} with fn in sum|count|min|max|mean.

    Returns a Ray Dataset of one row per key combination with the named
    output columns. ``count`` counts non-null values of ``col`` (use any
    non-null column for row counts). ``mean`` adds hidden sum/count
    partials and divides at the end.
    """
    # The merge phase is the same hash-bucket exchange as
    # bucket_aggregate: Ray's native sort-based groupby crashes on NULL
    # string keys (its range partitioner searchsorted's object arrays
    # containing None) and is measured ~8x slower besides. For the
    # low-cardinality keys this entry point targets, the partials are
    # tiny either way; 8 buckets keep the exchange shallow.
    return bucket_aggregate(ds, keys, aggs, num_buckets=8)


def bucket_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                     num_buckets: int = 32):
    """``pre_aggregate`` for HIGH-cardinality keys.

    Same partial combine per batch, but the exchange is a hash-bucket
    groupby on an int32 bucket of the key hash (strategy-independent, no
    full key-tuple sort); each bucket finishes its keys with one Arrow
    ``group_by``. Output rows are NOT globally sorted — follow with
    ``.sort`` if order matters.
    """
    from .conversations import BUCKET_COL, add_bucket

    plan, finals = _build_plan(aggs)
    uniq = list(dict.fromkeys(plan.values()))
    merge_specs = list(dict.fromkeys(
        (pcol, _MERGE[fn]) for pcol, (col, fn) in plan.items()))

    def partial(tbl: pa.Table) -> pa.Table:
        agged = _group_table(tbl, keys, uniq)
        cols = {k: agged.column(k) for k in keys}
        for pcol, (col, fn) in plan.items():
            cols[pcol] = agged.column(f'{col}_{fn}')
        # the ONE composite-key bucket hash (conversations.add_bucket) —
        # keeps this exchange co-partitioned with hash_join/bucket_exchange
        return add_bucket(pa.table(cols), keys, num_buckets)

    partials = ds.map_batches(partial, batch_format='pyarrow',
                              zero_copy_batch=True)

    finalize = _finalize_fn(keys, finals)

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        if BUCKET_COL in tbl.column_names:
            tbl = tbl.drop_columns([BUCKET_COL])
        agged = _group_table(tbl, keys, merge_specs)
        cols = {k: agged.column(k) for k in keys}
        for pcol, mfn in merge_specs:
            cols[pcol] = agged.column(f'{pcol}_{mfn}')
        return finalize(pa.table(cols))

    return partials.groupby(BUCKET_COL).map_groups(
        merge_bucket, batch_format='pyarrow')


def grouping_sets_aggregate(ds, keys: list[str], sets,
                            aggs: dict[str, tuple[str, str]],
                            num_buckets: int = 32,
                            grouping_col: str = 'grouping_id'):
    """SQL ``GROUP BY GROUPING SETS``: aggregate at several key subsets
    in ONE pass over the input.

    The finest level (the full ``keys`` tuple) runs as a normal
    ``bucket_aggregate`` and is materialized ONCE (its output is already
    group-sized, not input-sized); every requested set re-aggregates
    that same finest output — sum/count/min/max partials are mergeable,
    so the raw input is read exactly once and the whole thing costs
    exactly TWO executions (finest + the union of sets) no matter how
    many sets are asked for. Rolled-up key columns are typed NULLs and
    ``grouping_col`` carries the SQL ``GROUPING(keys...)`` bitmask
    (keys[0] is the most-significant bit; a set bit means that key is
    rolled up), which disambiguates a rolled-up NULL from a genuine
    NULL key. ``mean`` is not mergeable across levels — compute sum and
    count, divide downstream.

    ``sets``: iterable of key subsets (each a list/tuple preserving
    ``keys`` membership; order within a set is irrelevant).
    ``rollup_aggregate`` and ``cube_aggregate`` are the standard
    instantiations.
    """
    for out, (_, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(
                f'grouping_sets_aggregate: {fn!r} ({out}) is not '
                're-mergeable across levels; use sum/count/min/max and '
                'derive means downstream')
    sets = [tuple(s) for s in sets]
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f'grouping set {s} has keys {unknown} '
                             f'outside {keys}')
    out_names = list(aggs)
    ordered = keys + out_names + [grouping_col]

    finest = bucket_aggregate(ds, keys, aggs, num_buckets).materialize()

    def with_grouping(gid, rolled=()):
        def f(tbl: pa.Table) -> pa.Table:
            cols = {}
            for c in ordered:
                if c == grouping_col:
                    cols[c] = pa.array(np.full(tbl.num_rows, gid,
                                               dtype=np.int64))
                elif c in rolled:
                    cols[c] = pa.nulls(tbl.num_rows,
                                       type=tbl.schema.field(c).type)
                else:
                    cols[c] = tbl.column(c)
            return pa.table(cols)
        return f

    out = None
    for s in sets:
        kept = [k for k in keys if k in s]
        rolled = tuple(k for k in keys if k not in s)
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in s)
        if not rolled:
            cur = finest.map_batches(with_grouping(0),
                                     batch_format='pyarrow')
        else:
            # merge spec: re-aggregate outputs (count -> sum of
            # counts); rolled keys ride along as 'min' ONLY to preserve
            # their Arrow type — with_grouping nulls them out
            remerge = {out_n: (out_n, _MERGE[aggs[out_n][1]])
                       for out_n in out_names}
            remerge.update({k: (k, 'min') for k in rolled})
            if kept:
                agged = bucket_aggregate(finest, kept, remerge,
                                         num_buckets=8)
            else:
                const = '__gsets_all'

                def tag(tbl: pa.Table) -> pa.Table:
                    return tbl.append_column(
                        const, pa.array(np.zeros(tbl.num_rows,
                                                 dtype=np.int8)))

                agged = bucket_aggregate(
                    finest.map_batches(tag, batch_format='pyarrow'),
                    [const], remerge, num_buckets=1).map_batches(
                    lambda t: t.drop_columns([const]),
                    batch_format='pyarrow')
            cur = agged.map_batches(with_grouping(gid, rolled),
                                    batch_format='pyarrow')
        out = cur if out is None else out.union(cur)
    return out


def rollup_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                     num_buckets: int = 32,
                     grouping_col: str = 'grouping_id'):
    """SQL ``GROUP BY ROLLUP(keys...)``: every prefix level of the key
    list plus the grand total (see grouping_sets_aggregate for the
    one-input-pass / two-execution physical plan)."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, aggs, num_buckets,
                                   grouping_col)


def cube_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                   num_buckets: int = 32,
                   grouping_col: str = 'grouping_id'):
    """SQL ``GROUP BY CUBE(keys...)``: all 2**len(keys) key subsets
    (see grouping_sets_aggregate for the one-input-pass /
    two-execution physical plan)."""
    from itertools import combinations
    sets = [c for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sets, aggs, num_buckets,
                                   grouping_col)


def grouped_quantiles(ds, group_col: str, value_col: str, qs,
                      num_buckets: int = 32, ndigits: int = 6):
    """EXACT per-group quantiles (linear interpolation, quantile_cont
    semantics): one hash exchange co-locates each group, then a single
    vectorized np.percentile per group over the sorted bucket.

    Scale note: a group's values must fit one bucket task (same bound as
    any exact quantile); for sketch-sized state use a mergeable histogram
    instead. Output columns: group, q, value.
    """
    qs = list(qs)

    def bucket_fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        gtype = tbl.schema.field(group_col).type \
            if group_col in tbl.column_names else pa.string()
        # quantile_cont semantics: NULL values are ignored (a null would
        # otherwise NaN-poison the whole group's percentiles)
        if tbl.num_rows:
            tbl = tbl.filter(pc.is_valid(tbl.column(value_col)))
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             'q': pa.array([], pa.float64()),
                             'value': pa.array([], pa.float64())})
        tbl = tbl.sort_by([(group_col, 'ascending')])
        groups = tbl.column(group_col).combine_chunks()
        vals = tbl.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        gnp = groups.to_numpy(zero_copy_only=False)
        starts = np.ones(len(gnp), dtype=bool)
        starts[1:] = gnp[1:] != gnp[:-1]
        if gnp.dtype.kind == 'f':
            # a nullable numeric group column materializes as float64
            # with NaN, and NaN != NaN would make every null row its own
            # group (then pa.array(NaN, int64) crashes) — NULL is ONE
            # group, like histogram_quantiles / SQL GROUP BY
            starts[1:] &= ~(np.isnan(gnp[1:]) & np.isnan(gnp[:-1]))
        lo = np.nonzero(starts)[0]
        hi = np.append(lo[1:], len(gnp))
        out_g, out_q, out_v = [], [], []
        for s, e in zip(lo, hi):
            pv = np.percentile(vals[s:e], [q * 100 for q in qs],
                               method='linear')
            # key from the ARROW array: None for null, exact value
            # otherwise (the numpy view floatifies nullable ints)
            out_g.extend([groups[int(s)].as_py()] * len(qs))
            out_q.extend(qs)
            out_v.extend(np.round(pv, ndigits))
        return pa.table({group_col: pa.array(out_g, type=groups.type),
                         'q': pa.array(out_q, type=pa.float64()),
                         'value': pa.array(out_v, type=pa.float64())})

    from .conversations import bucket_exchange
    return bucket_exchange(ds, group_col, bucket_fn, num_buckets)


def global_topk(ds, sort_keys: list[tuple[str, str]], k: int):
    """ORDER BY ... LIMIT k without a full distributed sort.

    Each batch prunes to its local top-k (only rows that can survive
    globally), then ONE merge task sorts the at-most k x blocks
    survivors — no range-partitioned sort exchange over the full
    dataset (``.sort().limit(k)`` would shuffle every row; at 100 TB
    the difference is the whole job). Output is the globally sorted
    top-k. ``sort_keys``: pyarrow ``sort_by`` spec, e.g.
    ``[('revenue', 'descending'), ('id', 'ascending')]`` — include a
    tiebreak for determinism.
    """

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows <= k:
            return tbl
        return tbl.sort_by(sort_keys).slice(0, k)

    pruned = ds.map_batches(prune, batch_format='pyarrow',
                            zero_copy_batch=True)
    # the survivors are tiny (k per block): one final merge task
    return pruned.repartition(1).map_batches(
        lambda t: t.sort_by(sort_keys).slice(0, k),
        batch_format='pyarrow')


def grouped_topk(ds, group_col: str, order_col: str, k: int,
                 descending: bool = True, tiebreak: str | None = None,
                 num_buckets: int = 32):
    """Top-k rows per group with a deterministic tiebreak column.

    Scale: each batch first prunes to its LOCAL per-group top-k (the only
    rows that can survive the global answer), so the exchange moves at
    most k rows per (group, batch); the bucket task repeats the same
    prune over the co-located group. Output is unsorted across groups —
    follow with ``.sort`` if order matters.
    """
    sort_keys = [(group_col, 'ascending'),
                 (order_col, 'descending' if descending else 'ascending')]
    if tiebreak:
        sort_keys.append((tiebreak, 'ascending'))

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        tbl = tbl.sort_by(sort_keys)
        col = tbl.column(group_col).combine_chunks()
        groups = col.to_numpy(zero_copy_only=False)
        starts = np.ones(len(groups), dtype=bool)
        neq = groups[1:] != groups[:-1]
        # SQL GROUP BY: NULLs are one group (a nullable int materializes
        # as NaN here, and NaN != NaN would make every null its own run)
        if groups.dtype.kind == 'f':
            neq &= ~(np.isnan(groups[1:]) & np.isnan(groups[:-1]))
        if col.null_count:
            nulls = col.is_null().to_numpy(zero_copy_only=False)
            neq = (neq | (nulls[1:] ^ nulls[:-1])) \
                & ~(nulls[1:] & nulls[:-1])
        starts[1:] = neq
        # rank within group = position - group start position
        idx = np.arange(len(groups))
        gstart = np.maximum.accumulate(np.where(starts, idx, 0))
        keep = (idx - gstart) < k
        return tbl.filter(pa.array(keep))

    pruned = ds.map_batches(prune, batch_format='pyarrow',
                            zero_copy_batch=True)
    from .conversations import bucket_exchange
    return bucket_exchange(pruned, group_col, prune, num_buckets)


def _latest_indices(tbl: pa.Table, keys, order_by) -> np.ndarray:
    """Indices of the max-``order_by``-tuple row per distinct key tuple.
    Only the key/order columns leave Arrow (for code computation); the
    surviving rows are taken from the original table zero-copy."""
    import pandas as pd
    if len(keys) == 1:
        codes = pd.factorize(tbl.column(keys[0]).to_pandas(),
                             use_na_sentinel=False)[0]
    else:
        codes = pd.MultiIndex.from_frame(pd.DataFrame(
            {k: tbl.column(k).to_pandas() for k in keys}))\
            .factorize(use_na_sentinel=False)[0]
    order_np = []
    for c in order_by:
        col = tbl.column(c).combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp('us')).cast(pa.int64())
        order_np.append(col.to_numpy(zero_copy_only=False))
    # lexsort: codes primary, then order_by asc (last listed = primary)
    order = np.lexsort((*reversed(order_np), codes))
    sc = codes[order]
    last = np.nonzero(np.r_[sc[1:] != sc[:-1], True])[0]
    return order[last]


def latest_by_key(ds, keys, order_by, num_buckets: int = 32):
    """Latest-wins compaction (the CDC-upsert / snapshot shape): ONE
    surviving row per distinct ``keys`` tuple — the row with the maximum
    ``order_by`` tuple (e.g. ``['ts', 'event_id']``). Per-batch local
    argmax prunes to <= 1 row per key per batch, then ONE hash-bucket
    exchange of the pruned rows and the same argmax per bucket: shuffle
    bytes are O(distinct keys per batch), never the raw changelog.

    ``order_by`` must be a strict total order within each key (append a
    unique id as the final tiebreak) — cross-batch ties would otherwise
    resolve by arrival order, which is not deterministic. Null key
    cells form one group (SQL GROUP BY semantics); ``order_by`` columns
    must be non-null."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        return tbl.take(pa.array(
            np.sort(_latest_indices(tbl, keys, order_by)),
            type=pa.int64()))

    pruned = ds.map_batches(prune, batch_format='pyarrow',
                            zero_copy_batch=True)
    from .conversations import bucket_exchange
    return bucket_exchange(pruned, keys, prune, num_buckets)
