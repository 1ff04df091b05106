"""Driver-facing query suite: each entry is one operator/pipeline from
SURVEY.md §2 / §2.9 expressed Ray-Data-first, with a matching ANSI-SQL
oracle (DuckDB) in ``ORACLE_SQL`` computing identical column names/values
over the same parquet tables.

Scale discipline per query is noted in its docstring: column pruning at
the read, partial aggregation before any exchange, broadcast for small
sides, one hash exchange for windowed/per-entity work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.aggregate import pre_aggregate
from ..stages.conversations import per_conversation
from ..stages import window as W

GAP_US = 30 * 60 * 1_000_000


def _fixed6(col) -> pa.Array:
    """floor(x*1e6 + 0.5) as int64 — a fixed-point view of a float column.

    Summing these is EXACT integer arithmetic, so parallel aggregation is
    order-independent and byte-identical to the DuckDB oracle computing
    the same expression (the driver gate hashes bytes, and float-sum
    reassociation across batch boundaries otherwise flips last ulps).
    int64 headroom: 9.2e18 / 1e6 ≈ 9.2e12 in value terms per group —
    shard or widen to decimal128 beyond that.
    """
    scaled = pc.add(pc.multiply(pc.cast(col, pa.float64()),
                                pa.scalar(1e6)), pa.scalar(0.5))
    return pc.cast(pc.floor(scaled), pa.int64())


def _fixed2(col) -> pa.Array:
    """floor(x*1e2 + 0.5) as int64 — the SECOND/cross-moment scale.

    x² and x·y at 1e6 wrap int64 within ~800 rows of realistic values,
    where DuckDB silently promotes its sum to HUGEINT and Arrow wraps
    (CLAUDE.md overflow discipline) — 1e2 buys 1e4 more headroom at the
    cost of centi-unit granularity, applied identically on both engines.
    """
    scaled = pc.add(pc.multiply(pc.cast(col, pa.float64()),
                                pa.scalar(1e2)), pa.scalar(0.5))
    return pc.cast(pc.floor(scaled), pa.int64())


def _unfix6(col, ndigits: int = 6) -> pa.Array:
    """int64 fixed-point sum -> rounded float64 (matches the oracle's
    round(sum(...)/1e6, 6))."""
    return pc.round(pc.divide(pc.cast(col, pa.float64()), pa.scalar(1e6)),
                    ndigits=ndigits)


_READ_TARGET_BYTES = 2 << 20


def _read(sf_dir: str, table: str, columns=None, require=()):
    """Pruned parquet read with size-aware block sizing.

    ``require``: column names that must be NON-NULL for a row to enter
    the pipeline — the temporal operators (sessionize, lag, as-of,
    windows) are defined over a valid event time, so rows without one
    are excluded IDENTICALLY on both engines (the matching oracle
    carries ``WHERE <col> IS NOT NULL``); in the production pipeline the
    contract gate quarantines them before this point.

    Ray's default parallelism splits ANY file into ~2x-CPU blocks; a
    10 MB table then becomes 64 sub-200KB blocks, and every downstream
    all-to-all exchange pays a 64-task map wave for kilobytes of data —
    measured 5x wall on the multi-exchange queries at sf0.1. Cap blocks
    at ~2 MiB compressed each for SMALL files only: beyond 64 computed
    blocks (≈128 MiB) the override is skipped entirely, so at real
    scale Ray's own size-based splitting governs."""
    import os

    import ray.data as rd
    path = f'{sf_dir}/{table}.parquet'
    nb = None
    try:
        est = max(1, -(-os.path.getsize(path) // _READ_TARGET_BYTES))
        if est < 64:
            nb = est
    except OSError:
        pass
    ds = rd.read_parquet(path, columns=columns, override_num_blocks=nb)
    if require:
        req = list(require)

        def _valid(tbl: pa.Table) -> pa.Table:
            m = pc.is_valid(tbl.column(req[0]))
            for c in req[1:]:
                m = pc.and_(m, pc.is_valid(tbl.column(c)))
            return tbl.filter(m)

        ds = ds.map_batches(_valid, batch_format='pyarrow',
                            zero_copy_batch=True)
    return ds


def _typed_result(ds, schema: pa.Schema) -> pd.DataFrame:
    """Collect a SMALL result with a guaranteed schema: an all-empty
    filtered Dataset loses its columns (CLAUDE.md invariant), which
    would fail the driver's column compare on legitimately-empty
    results (e.g. an EXCEPT with nothing left)."""
    df = ds.to_pandas()
    if len(df) == 0 and list(df.columns) != list(schema.names):
        return schema.empty_table().to_pandas()
    return df


def _sort_ns(ds, cols, str_cols=()):
    """Deterministic output sort that tolerates NULL STRING keys.

    Ray's range sort compares Python objects for string blocks, and
    ``None < 'a'`` raises TypeError — so a null group key (a legal SQL
    GROUP BY result) crashes the final ordering sort. For each key named
    in ``str_cols`` (the caller knows its output columns — deriving them
    from a derived-dataset ``.schema()`` would force a partial
    execution), sort by (is-null flag, ''-filled copy) — nulls last,
    total order preserved — and drop the helpers after. Other keys sort
    natively (Arrow handles numeric/temporal nulls)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    str_cols = set(str_cols)
    if not str_cols:
        return ds.sort(cols)

    def tag(tbl: pa.Table) -> pa.Table:
        for c in cols:
            if c in str_cols:
                col = tbl.column(c)
                tbl = tbl.append_column(
                    f'__nn_{c}', pc.cast(pc.is_null(col), pa.int8()))
                tbl = tbl.append_column(f'__sv_{c}', pc.fill_null(col, ''))
        return tbl

    keys, helper = [], []
    for c in cols:
        if c in str_cols:
            keys += [f'__nn_{c}', f'__sv_{c}']
            helper += [f'__nn_{c}', f'__sv_{c}']
        else:
            keys.append(c)
    out = ds.map_batches(tag, batch_format='pyarrow',
                         zero_copy_batch=True).sort(keys)
    return out.map_batches(lambda t: t.drop_columns(helper),
                           batch_format='pyarrow')


def _small_df(ds, cols) -> pd.DataFrame:
    """Driver-side SMALL-side pull (broadcast dims, censuses, quantile
    cut tables): ``to_pandas`` that keeps its columns when the dataset
    is empty — an all-empty Dataset loses its schema (CLAUDE.md
    invariant), and the downstream column access would otherwise crash
    a job whose filter legitimately matched nothing."""
    df = ds.to_pandas()
    if len(df) == 0:
        for c in cols:
            if c not in df.columns:
                df[c] = pd.Series(dtype=object)
        return df[list(cols)]
    return df


# ---------------------------------------------------------------------------
# relational aggregates / joins
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem.

    Scale: columns pruned at the read; per-batch partial aggregation (6 key
    combos) so the exchange moves a handful of rows per block, not 6B rows.
    Float measures sum as int64 fixed-point (see _fixed6) so the parallel
    sum is exact and byte-matches the oracle at any parallelism.
    """
    ds = _read(sf_dir, 'lineitem',
               ['l_returnflag', 'l_linestatus', 'l_quantity',
                'l_extendedprice', 'l_discount', 'l_tax'])

    def derive(tbl: pa.Table) -> pa.Table:
        disc = pc.multiply(tbl.column('l_extendedprice'),
                           pc.subtract(pa.scalar(1.0), tbl.column('l_discount')))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), tbl.column('l_tax')))
        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'l_linestatus': tbl.column('l_linestatus'),
            'qty6': _fixed6(tbl.column('l_quantity')),
            'price6': _fixed6(tbl.column('l_extendedprice')),
            'disc6': _fixed6(tbl.column('l_discount')),
            'disc_price6': _fixed6(disc),
            'charge6': _fixed6(charge),
            # count(*) parity under NULL measures: a never-null marker
            '_one': pa.array(np.ones(tbl.num_rows, dtype=np.int64)),
        })

    ds = ds.map_batches(derive, batch_format='pyarrow', zero_copy_batch=True)
    out = pre_aggregate(
        ds, ['l_returnflag', 'l_linestatus'],
        {'sum_qty6': ('qty6', 'sum'),
         'sum_base_price6': ('price6', 'sum'),
         'sum_disc_price6': ('disc_price6', 'sum'),
         'sum_charge6': ('charge6', 'sum'),
         'sum_disc6': ('disc6', 'sum'),
         'count_order': ('_one', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        cnt = pc.cast(tbl.column('count_order'), pa.float64())

        def avg(sum_col):
            return pc.round(pc.divide(pc.divide(
                pc.cast(tbl.column(sum_col), pa.float64()),
                pa.scalar(1e6)), cnt), ndigits=6)

        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'l_linestatus': tbl.column('l_linestatus'),
            'sum_qty': _unfix6(tbl.column('sum_qty6')),
            'sum_base_price': _unfix6(tbl.column('sum_base_price6')),
            'sum_disc_price': _unfix6(tbl.column('sum_disc_price6')),
            'sum_charge': _unfix6(tbl.column('sum_charge6')),
            'avg_qty': avg('sum_qty6'),
            'avg_price': avg('sum_base_price6'),
            'avg_disc': avg('sum_disc6'),
            'count_order': tbl.column('count_order'),
        })

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort(['l_returnflag', 'l_linestatus'])


def q_top_customers(sf_dir: str):
    """Revenue per customer: partial-agg orders by custkey (shuffle moves
    partials), then broadcast-join the small customer dim on the driver
    side of a tiny result, top-10 with deterministic tie-break. A NULL
    o_custkey never matches the oracle's inner join — excluded on both
    engines; n_orders is count(*)."""
    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'],
                   require=('o_custkey',))

    def scale(tbl: pa.Table) -> pa.Table:
        return pa.table({'o_custkey': tbl.column('o_custkey'),
                         'rev6': _fixed6(tbl.column('o_totalprice')),
                         '_one': pa.array(np.ones(tbl.num_rows,
                                                  dtype=np.int64))})

    from ..stages.aggregate import bucket_aggregate
    orders = orders.map_batches(scale, batch_format='pyarrow',
                                zero_copy_batch=True)
    per_cust = bucket_aggregate(orders, ['o_custkey'],
                                {'rev6': ('rev6', 'sum'),
                                 'n_orders': ('_one', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'o_custkey': tbl.column('o_custkey'),
                         'revenue': _unfix6(tbl.column('rev6')),
                         'n_orders': tbl.column('n_orders')})

    per_cust = per_cust.map_batches(finalize, batch_format='pyarrow')
    cust = _small_df(_read(sf_dir, 'customer', ['c_custkey', 'c_name']),
                     ['c_custkey', 'c_name'])
    dim_keys = pa.array(cust['c_custkey'].to_numpy(dtype=np.int64))
    dim_names = pa.array(cust['c_name'], type=pa.string())

    def attach(tbl: pa.Table) -> pa.Table:
        idx = pc.index_in(tbl.column('o_custkey'), value_set=dim_keys)
        # INNER-join parity: a dangling o_custkey (no customer row)
        # drops, while a matched customer with a NULL c_name keeps its
        # row — same split as q_region_revenue / q_returned_revenue
        tbl = tbl.append_column('c_name', dim_names.take(idx))
        return tbl.filter(pc.is_valid(idx))

    joined = per_cust.map_batches(attach, batch_format='pyarrow')
    from ..stages.aggregate import global_topk
    top = global_topk(joined, [('revenue', 'descending'),
                               ('o_custkey', 'ascending')], 10)
    return top.map_batches(
        lambda t: t.select(['o_custkey', 'c_name', 'revenue', 'n_orders']),
        batch_format='pyarrow')


def q_region_revenue(sf_dir: str):
    """3-way broadcast join (customer→nation→region are tiny dims) +
    partial aggregation: the fact table never shuffles raw rows."""
    import ray
    nation = _small_df(_read(sf_dir, 'nation',
                             ['n_nationkey', 'n_regionkey']),
                       ['n_nationkey', 'n_regionkey'])
    region = _small_df(_read(sf_dir, 'region', ['r_regionkey', 'r_name']),
                       ['r_regionkey', 'r_name'])
    cust = _small_df(_read(sf_dir, 'customer',
                           ['c_custkey', 'c_nationkey']),
                     ['c_custkey', 'c_nationkey'])
    n2r = dict(zip(nation['n_nationkey'], nation['n_regionkey']))
    r2name = dict(zip(region['r_regionkey'], region['r_name']))
    # dim as parallel Arrow arrays: lookup is pc.index_in + take per
    # batch. INNER-join parity needs two distinct outcomes: a null /
    # dangling KEY anywhere in the chain never matches (row dropped),
    # while a MATCHED region whose r_name is null keeps its row and
    # groups under the NULL name — exactly what the SQL joins emit.
    _sentinel = object()

    def _chain(nk):
        rk = n2r.get(nk, _sentinel) if nk == nk else _sentinel
        return r2name.get(rk, _sentinel) if rk is not _sentinel \
            else _sentinel
    chained = [_chain(nk) for nk in cust['c_nationkey']]
    keep = np.array([c is not _sentinel for c in chained], dtype=bool)
    cust_keys = pa.array(
        cust['c_custkey'].to_numpy(dtype=np.int64)[keep])
    cust_region = pa.array([c for c in chained if c is not _sentinel],
                           type=pa.string())
    ref = ray.put((cust_keys, cust_region))

    class Attach:
        def __init__(self):
            self.keys, self.names = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            idx = pc.index_in(tbl.column('o_custkey'), value_set=self.keys)
            out = tbl.append_column('r_name', self.names.take(idx))
            return out.filter(pc.is_valid(idx))

    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'])
    with_region = orders.map_batches(Attach, batch_format='pyarrow',
                                    concurrency=2)

    def scale(tbl: pa.Table) -> pa.Table:
        return pa.table({'r_name': tbl.column('r_name'),
                         'rev6': _fixed6(tbl.column('o_totalprice')),
                         '_one': pa.array(np.ones(tbl.num_rows,
                                                  dtype=np.int64))})

    scaled = with_region.map_batches(scale, batch_format='pyarrow',
                                     zero_copy_batch=True)
    out = pre_aggregate(scaled, ['r_name'],
                        {'rev6': ('rev6', 'sum'),
                         # count(*) parity: _one is never null; r_name
                         # (a matched-but-null dim name) and rev6 CAN be
                         'n_orders': ('_one', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'r_name': tbl.column('r_name'),
                         'revenue': _unfix6(tbl.column('rev6')),
                         'n_orders': tbl.column('n_orders')})

    return out.map_batches(finalize, batch_format='pyarrow').sort('r_name')


# ---------------------------------------------------------------------------
# windowed / per-entity features over the events stream
# ---------------------------------------------------------------------------

def _per_user(ds, fn, num_buckets=32):
    return per_conversation(ds, fn, key='user_id',
                            order=('ts', 'event_id'),
                            num_buckets=num_buckets)


def q_sessionize_events(sf_dir: str):
    """Gap sessionization (30-min) per user → per-user session/event counts.
    One hash exchange; per-bucket vectorized kernels; the per-user rollup
    happens inside the bucket (users are bucket-local). Rows with a NULL
    ts carry no event time and are excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        is_new, _ = W.sessionize(ts_us, starts, GAP_US)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        uniq_pos = np.nonzero(starts)[0]
        n_sessions = np.add.reduceat(is_new.astype(np.int64), uniq_pos)
        counts = np.diff(np.append(uniq_pos, len(users)))
        return pa.table({
            'user_id': pa.array(users[uniq_pos]),
            'n_sessions': pa.array(n_sessions, type=pa.int64()),
            'n_events': pa.array(counts, type=pa.int64()),
        })

    return _per_user(ds, fn).sort('user_id')


def q_lag_events(sf_dir: str):
    """lag/lead features per user ordered by (ts, event_id). NULL-ts
    rows have no position in the order — excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        value = tbl.column('value').combine_chunks()
        ts = tbl.column('ts').combine_chunks().cast(pa.timestamp('us'))
        ts_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        lag_idx, lag_ok = W.lag_indices(starts, 1)
        delta, dvalid = W.time_since_prev_us(ts_us, starts)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'value': value,
            'prev_value': W.take_masked(value, lag_idx, lag_ok),
            'gap_s': pa.array(delta / 1e6, type=pa.float64(), mask=~dvalid),
        })

    return _per_user(ds, fn).sort('event_id')


def q_ffill_events(sf_dir: str):
    """Forward-fill: latest purchase value at-or-before each event, per
    user (past→future only — leakage-safe fill direction)."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        is_p = pc.equal(tbl.column('event_type').combine_chunks(), 'purchase')
        pval = pc.if_else(is_p, tbl.column('value').combine_chunks(),
                          pa.scalar(None, type=pa.float64()))
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'last_purchase_value': W.ffill_column(pval, starts),
        })

    return _per_user(ds, fn).sort('event_id')


def q_asof_events(sf_dir: str):
    """Point-in-time as-of join: for each purchase, the latest prior click
    value per user, strict < (zero leakage). The click side is first
    deduplicated to one row per (user, ts) so the match is unambiguous on
    both engines. NULL-ts rows can't be time-aligned — excluded on
    both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        etype = tbl.column('event_type').combine_chunks()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        value = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False)
        is_click = np.asarray(pc.equal(etype, 'click').to_numpy(
            zero_copy_only=False), dtype=bool)
        is_purchase = np.asarray(pc.equal(etype, 'purchase').to_numpy(
            zero_copy_only=False), dtype=bool)
        # dedup clicks to (user, ts) -> max(value)
        cu, ct, cv = users[is_click], ts_us[is_click], value[is_click]
        if len(cu):
            cdf = pd.DataFrame({'u': cu, 't': ct, 'v': cv})
            cg = cdf.groupby(['u', 't'], sort=True)['v'].max().reset_index()
            ru, rt, rv = (cg['u'].to_numpy(), cg['t'].to_numpy(),
                          cg['v'].to_numpy())
        else:
            ru = rt = rv = np.array([], dtype=np.int64)
        lp = np.nonzero(is_purchase)[0]
        idx, ok = W.asof_backward(ts_us[lp], users[lp], rt, ru)
        lcv = np.where(ok, rv[np.minimum(idx, max(len(rv) - 1, 0))]
                       if len(rv) else 0.0, np.nan)
        return pa.table({
            'event_id': tbl.column('event_id').combine_chunks().take(
                pa.array(lp, type=pa.int64())),
            'user_id': pa.array(users[lp]),
            'value': pa.array(value[lp], type=pa.float64()),
            'last_click_value': pa.array(lcv, type=pa.float64(), mask=~ok),
        })

    return _per_user(ds, fn).sort('event_id')


def q_asof_events_stage(sf_dir: str):
    """The DATASET-LEVEL as-of join operator (stages/joins.py:asof_join —
    co-bucketed sides, one exchange) on the same purchases-vs-clicks
    alignment as q_asof_events; byte-matched to the identical oracle.
    Sides + derived-dataset-safe schemas come from the shared
    _asof_sides helper (one copy of the '.schema() on a DERIVED
    dataset' invariant for the whole as-of family)."""
    from ..stages.joins import asof_join
    purchases, clicks, lschema, rschema = _asof_sides(sf_dir)
    out = asof_join(purchases, clicks, by='user_id', on='ts',
                    value_cols=['click_value'], suffix='',
                    left_schema=lschema, right_schema=rschema)
    return out.map_batches(
        lambda t: pa.table({
            'event_id': t.column('event_id'),
            'user_id': t.column('user_id'),
            'value': t.column('value'),
            'last_click_value': t.column('click_value')}),
        batch_format='pyarrow').sort('event_id')


def _asof_sides(sf_dir: str):
    """Shared purchases/clicks split for the as-of direction family:
    left = purchases, right = clicks deduped to (user, ts) -> max(value)
    so every direction's match is unambiguous on both engines. NULL-ts
    rows can't be time-aligned — excluded on both engines."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'],
               require=('ts',))

    def side(etype, cols):
        def f(tbl: pa.Table) -> pa.Table:
            return tbl.filter(pc.equal(tbl.column('event_type'), etype))\
                .select(cols)
        return f

    purchases = ds.map_batches(
        side('purchase', ['user_id', 'ts', 'event_id', 'value']),
        batch_format='pyarrow', zero_copy_batch=True)
    clicks = bucket_aggregate(
        ds.map_batches(side('click', ['user_id', 'ts', 'value']),
                       batch_format='pyarrow', zero_copy_batch=True),
        ['user_id', 'ts'], {'click_value': ('value', 'max')})
    # parquet metadata, NOT ds.schema(): ds is a derived (require-
    # filtered) dataset — its schema() forces a partial execution and
    # is None on an empty input
    import pyarrow.parquet as _pq
    sch = _pq.read_schema(f'{sf_dir}/events.parquet')
    et = dict(zip(sch.names, sch.types))
    lschema = pa.schema([('user_id', et['user_id']), ('ts', et['ts']),
                         ('event_id', et['event_id']),
                         ('value', et['value'])])
    rschema = pa.schema([('user_id', et['user_id']), ('ts', et['ts']),
                         ('click_value', et['value'])])
    return purchases, clicks, lschema, rschema


def q_asof_broadcast_events(sf_dir: str):
    """The NO-SHUFFLE as-of variant (stages/joins.py:asof_join_broadcast)
    on the q_asof_events_stage alignment: the deduped click-state table
    is small, so it broadcasts once and every batch matches locally —
    zero exchanges. Byte-matched to the identical ASOF LEFT JOIN
    oracle."""
    from ..stages.joins import asof_join_broadcast
    purchases, clicks, _ls, _rs = _asof_sides(sf_dir)
    batches = list(clicks.iter_batches(batch_size=None,
                                       batch_format='pyarrow'))
    # zero batches on an empty input: concat_tables needs >= 1 table
    state = pa.concat_tables(batches) if batches else _rs.empty_table()
    out = asof_join_broadcast(purchases, state, by='user_id', on='ts',
                              value_cols=['click_value'], suffix='')
    return out.map_batches(
        lambda t: pa.table({
            'event_id': t.column('event_id'),
            'user_id': t.column('user_id'),
            'value': t.column('value'),
            'last_click_value': t.column('click_value'),
        }), batch_format='pyarrow').sort('event_id')


def q_asof_forward_events(sf_dir: str):
    """FORWARD as-of with a 6-hour tolerance: for each purchase the
    EARLIEST strictly-later click value per user within 6h — the
    label-attribution shape (outcome-after-action), mirror of the
    backward state join. Exercises asof_join(direction='forward',
    tolerance=...) end-to-end against a correlated-subquery oracle."""
    from ..stages.joins import asof_join
    purchases, clicks, lschema, rschema = _asof_sides(sf_dir)
    out = asof_join(purchases, clicks, by='user_id', on='ts',
                    value_cols=['click_value'], suffix='',
                    left_schema=lschema, right_schema=rschema,
                    direction='forward',
                    tolerance=6 * 3600 * 1_000_000)
    return out.map_batches(
        lambda t: pa.table({
            'event_id': t.column('event_id'),
            'user_id': t.column('user_id'),
            'value': t.column('value'),
            'next_click_value': t.column('click_value'),
        }), batch_format='pyarrow').sort('event_id')


def q_asof_nearest_events(sf_dir: str):
    """NEAREST as-of: the click value minimizing |click.ts - purchase.ts|
    per user, backward candidate winning distance ties (the pinned
    deterministic tie rule, tests/test_joins_multimodal.py). Oracle =
    order candidates by (abs delta, ts): the smaller ts of a tied pair
    IS the backward one."""
    from ..stages.joins import asof_join
    purchases, clicks, lschema, rschema = _asof_sides(sf_dir)
    out = asof_join(purchases, clicks, by='user_id', on='ts',
                    value_cols=['click_value'], suffix='',
                    left_schema=lschema, right_schema=rschema,
                    direction='nearest')
    return out.map_batches(
        lambda t: pa.table({
            'event_id': t.column('event_id'),
            'user_id': t.column('user_id'),
            'value': t.column('value'),
            'nearest_click_value': t.column('click_value'),
        }), batch_format='pyarrow').sort('event_id')


# ---------------------------------------------------------------------------
# documents: dedup + text analysis
# ---------------------------------------------------------------------------

def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: canonical doc per distinct text (min doc_id) + dup
    count. Partial-agg by text per batch, then one exchange of partials
    keyed by the text (hash-partition by content)."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = bucket_aggregate(ds, ['text'], {'doc_id': ('doc_id', 'min'),
                                          'n_dups': ('doc_id', 'count')})
    return out.map_batches(
        lambda t: t.select(['doc_id', 'text', 'n_dups']),
        batch_format='pyarrow').sort('doc_id')


def q_token_stats(sf_dir: str):
    """Text analysis rollup per language: doc count, avg chars, avg
    whitespace tokens (single-space split semantics on both engines)."""
    ds = _read(sf_dir, 'documents', ['lang', 'text', 'n_chars'])

    def derive(tbl: pa.Table) -> pa.Table:
        from ..functions.text import whitespace_token_count
        toks = whitespace_token_count(tbl.column('text'))
        return tbl.append_column('n_tokens', pc.cast(toks, pa.int64()))

    ds = ds.map_batches(derive, batch_format='pyarrow', zero_copy_batch=True)
    out = pre_aggregate(ds, ['lang'],
                        {'n_docs': ('n_chars', 'count'),
                         'avg_chars': ('n_chars', 'mean'),
                         'avg_tokens': ('n_tokens', 'mean')})
    return out.sort('lang')


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------

def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Deterministic query vector: the embedding of ``vec_id`` (shared by
    q_ann_topk / q_ivf_topk so the two oracles stay equivalent)."""
    import pyarrow.parquet as pq
    t0 = pq.read_table(f'{sf_dir}/embeddings.parquet',
                       columns=['vec_id', 'embedding'])
    rows = t0.filter(pc.equal(t0.column('vec_id'), vec_id))\
        .column('embedding').to_pylist()
    # empty corpus / id absent / NULL embedding cell: caller emits 0 rows
    # (matches the oracle's EXISTS guard on a non-null query vector)
    if not rows or rows[0] is None:
        return None
    return np.array(rows[0], dtype=np.float64)


_TOPK_EMPTY = pa.schema([('vec_id', pa.int64()),
                         ('cos_sim', pa.float64())])


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: broadcast the query vector, one numpy
    matmul per batch, global top-10 via sort+limit on the tiny per-batch
    candidate set. Scale path: each batch emits only its local top-k."""
    k = 10
    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    qvec = _query_vec(sf_dir)
    if qvec is None:     # keep the schema: empty Datasets lose theirs
        return _TOPK_EMPTY.empty_table().to_pandas()
    qnorm = np.linalg.norm(qvec)

    def topk_batch(tbl: pa.Table) -> pa.Table:
        from ..stages.ann import drop_null_vectors
        tbl = drop_null_vectors(tbl, 'embedding')
        if tbl.num_rows == 0:
            return _TOPK_EMPTY.empty_table()
        la = tbl.column('embedding').combine_chunks()
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        sims = (mat @ qvec) / (np.linalg.norm(mat, axis=1) * qnorm)
        ids = tbl.column('vec_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = ids != 0
        sims, ids = sims[keep], ids[keep]
        from ..stages.ann import cosine_topk_rows
        top_ids, top_sims = cosine_topk_rows(ids, sims, k)
        return pa.table({
            'vec_id': pa.array(top_ids),
            'cos_sim': pa.array(top_sims, type=pa.float64()),
        })

    cands = emb.map_batches(topk_batch, batch_format='pyarrow',
                            zero_copy_batch=True)
    from ..stages.aggregate import global_topk
    return global_topk(cands, [('cos_sim', 'descending'),
                               ('vec_id', 'ascending')], k)


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two retrieval rankings — the
    multi-query (query-expansion) retrieval primitive: rank the corpus
    by cosine against TWO broadcast query vectors (vec 0 and vec 1),
    take each query's exact top-100, fuse with
    score = 1/(60+r_a) + 1/(60+r_b) (Cormack et al. 2009, k=60).
    Distributed shape: per-batch micro-int metrics + local top-100
    prune per ranking; only the k-bounded candidate union reaches the
    driver (the standard global top-k merge). Ranks are ints, the two
    reciprocal terms are divisions of IDENTICAL doubles added in the
    same order on both engines, and the emitted score is micro-floored
    — byte-stable. Absent-from-a-list ranks emit 0 (NOT null: a null
    int column floatifies in pandas, CLAUDE.md)."""
    K, RRF_K = 100, 60
    cols = ['vec_id', 'rank_a', 'rank_b', 'rrf6']
    empty = pd.DataFrame({'vec_id': pd.Series(dtype=np.int64),
                          'rank_a': pd.Series(dtype=np.int64),
                          'rank_b': pd.Series(dtype=np.int64),
                          'rrf6': pd.Series(dtype=np.int64)})
    qa = _query_vec(sf_dir, 0)
    qb = _query_vec(sf_dir, 1)
    if qa is None or qb is None:
        return empty
    na, nb = np.linalg.norm(qa), np.linalg.norm(qb)
    cand_schema = pa.schema([('vec_id', pa.int64()),
                             ('cos6a', pa.int64()), ('cos6b', pa.int64())])

    def local_prune(tbl: pa.Table) -> pa.Table:
        from ..stages.ann import drop_null_vectors
        tbl = drop_null_vectors(tbl, 'embedding')
        if tbl.num_rows == 0:
            return cand_schema.empty_table()
        ids = tbl.column('vec_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        la = tbl.column('embedding').combine_chunks()
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        keep = (ids != 0) & (ids != 1)
        ids, mat = ids[keep], mat[keep]
        if len(ids) == 0:
            return cand_schema.empty_table()
        norms = np.linalg.norm(mat, axis=1)
        cos6a = np.floor((mat @ qa) / (norms * na) * 1e6 + 0.5)\
            .astype(np.int64)
        cos6b = np.floor((mat @ qb) / (norms * nb) * 1e6 + 0.5)\
            .astype(np.int64)
        # union of the two local top-K index sets (ties -> smaller id,
        # matching the global rank order)
        oc = np.lexsort((ids, -cos6a))[:K]
        od = np.lexsort((ids, -cos6b))[:K]
        sel = np.unique(np.concatenate([oc, od]))
        return pa.table({'vec_id': pa.array(ids[sel]),
                         'cos6a': pa.array(cos6a[sel]),
                         'cos6b': pa.array(cos6b[sel])},
                        schema=cand_schema)

    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    cands = emb.map_batches(local_prune, batch_format='pyarrow',
                            zero_copy_batch=True)
    df = _small_df(cands, ['vec_id', 'cos6a', 'cos6b'])
    if len(df) == 0:
        return empty
    ids = df['vec_id'].to_numpy(dtype=np.int64)
    cos6a = df['cos6a'].to_numpy(dtype=np.int64)
    cos6b = df['cos6b'].to_numpy(dtype=np.int64)
    ra = np.zeros(len(ids), dtype=np.int64)
    rb = np.zeros(len(ids), dtype=np.int64)
    oc = np.lexsort((ids, -cos6a))[:K]
    od = np.lexsort((ids, -cos6b))[:K]
    ra[oc] = np.arange(1, len(oc) + 1)
    rb[od] = np.arange(1, len(od) + 1)
    fused = (ra > 0) | (rb > 0)
    # same term order as the SQL: query-a term + query-b term
    score = (np.where(ra > 0, 1.0 / (RRF_K + ra), 0.0)
             + np.where(rb > 0, 1.0 / (RRF_K + rb), 0.0))
    out = pd.DataFrame({
        'vec_id': ids[fused], 'rank_a': ra[fused],
        'rank_b': rb[fused],
        'rrf6': np.floor(score[fused] * 1e6 + 0.5).astype(np.int64)})
    return out[cols].sort_values('vec_id').reset_index(drop=True)


def q_ivf_topk(sf_dir: str):
    """IVF-indexed cosine top-k (stages/ann.py): coarse k-means quantizer
    + cluster-probed scan. Run with nprobe == n_clusters (exact mode) so
    the result byte-matches the same brute-force SQL oracle as q_ann_topk
    — the driver thereby checks the whole IVF plumbing; the pruned-probe
    recall trade is asserted in tests/test_ann.py."""
    from ..stages.ann import ivf_topk
    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    qvec = _query_vec(sf_dir)
    if qvec is None:     # keep the schema: empty Datasets lose theirs
        return _TOPK_EMPTY.empty_table().to_pandas()
    return ivf_topk(emb, qvec, k=10, n_clusters=16,
                    nprobe=16, exclude_ids=[0])


QUERIES = {
    'q_ivf_topk': q_ivf_topk,
    'q1_pricing_summary': q1_pricing_summary,
    'q_top_customers': q_top_customers,
    'q_region_revenue': q_region_revenue,
    'q_sessionize_events': q_sessionize_events,
    'q_lag_events': q_lag_events,
    'q_ffill_events': q_ffill_events,
    'q_asof_events': q_asof_events,
    'q_exact_dedup_docs': q_exact_dedup_docs,
    'q_token_stats': q_token_stats,
    'q_ann_topk': q_ann_topk,
    'q_rrf_fusion': q_rrf_fusion,
}


ORACLE_SQL = {
    # float measures aggregate as int64 fixed-point (floor(x*1e6+0.5)) on
    # BOTH engines: integer sums are order-independent, so the driver's
    # byte-hash gate is stable at any parallelism.
    'q1_pricing_summary': """
        WITH s AS (
          SELECT l_returnflag, l_linestatus,
                 cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT)      AS qty6,
                 cast(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS price6,
                 cast(floor(l_discount * 1e6 + 0.5) AS BIGINT)      AS disc6,
                 cast(floor(l_extendedprice * (1 - l_discount) * 1e6 + 0.5)
                      AS BIGINT)                                    AS disc_price6,
                 cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            * 1e6 + 0.5) AS BIGINT)                 AS charge6
          FROM lineitem)
        SELECT l_returnflag, l_linestatus,
               round(cast(sum(qty6) AS DOUBLE) / 1e6, 6)        AS sum_qty,
               round(cast(sum(price6) AS DOUBLE) / 1e6, 6)      AS sum_base_price,
               round(cast(sum(disc_price6) AS DOUBLE) / 1e6, 6) AS sum_disc_price,
               round(cast(sum(charge6) AS DOUBLE) / 1e6, 6)     AS sum_charge,
               round(cast(sum(qty6) AS DOUBLE) / 1e6
                     / count(*), 6)                             AS avg_qty,
               round(cast(sum(price6) AS DOUBLE) / 1e6
                     / count(*), 6)                             AS avg_price,
               round(cast(sum(disc6) AS DOUBLE) / 1e6
                     / count(*), 6)                             AS avg_disc,
               count(*)                                         AS count_order
        FROM s
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    'q_top_customers': """
        SELECT o_custkey, c_name,
               round(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e6, 6) AS revenue,
               count(*)                        AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey, c_name
        ORDER BY revenue DESC, o_custkey ASC
        LIMIT 10
    """,
    'q_region_revenue': """
        SELECT r_name,
               round(cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e6, 6) AS revenue,
               count(*)                        AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    'q_sessionize_events': """
        WITH o AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM events WHERE ts IS NOT NULL),
        f AS (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS is_new
          FROM o)
        SELECT user_id,
               cast(sum(is_new) AS BIGINT) AS n_sessions,
               count(*)                    AS n_events
        FROM f GROUP BY user_id ORDER BY user_id
    """,
    'q_lag_events': """
        SELECT event_id, user_id, value,
               lag(value) OVER w AS prev_value,
               cast(epoch_us(ts - lag(ts) OVER w) AS DOUBLE) / 1e6 AS gap_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    'q_ffill_events': """
        SELECT event_id, user_id,
               last_value(CASE WHEN event_type = 'purchase' THEN value END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_purchase_value
        FROM events ORDER BY event_id
    """,
    'q_asof_events': """
        WITH clicks AS (
          SELECT user_id, ts, max(value) AS click_value
          FROM events WHERE event_type = 'click' AND ts IS NOT NULL
          GROUP BY user_id, ts),
        purchases AS (
          SELECT event_id, user_id, ts, value
          FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
        SELECT p.event_id, p.user_id, p.value,
               c.click_value AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts > c.ts
        ORDER BY p.event_id
    """,
    'q_exact_dedup_docs': """
        SELECT min(doc_id) AS doc_id, text, count(*) AS n_dups
        FROM documents GROUP BY text ORDER BY doc_id
    """,
    'q_token_stats': """
        SELECT lang,
               count(n_chars)                         AS n_docs,
               sum(n_chars) / count(n_chars)          AS avg_chars,
               sum(len(string_split(text, ' ')))
                 / count(text)                        AS avg_tokens
        FROM documents GROUP BY lang ORDER BY lang
    """,
    # exact-mode IVF (nprobe == n_clusters) reduces to brute force —
    # same oracle as q_ann_topk
    'q_ivf_topk': """
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                   WHERE vec_id = 0 AND embedding IS NOT NULL)
        SELECT vec_id,
               cast(floor(list_cosine_similarity(embedding::DOUBLE[],
                                                 (SELECT qe FROM q))
                          * 1e6 + 0.5) AS BIGINT) / 1e6
                 AS cos_sim
        FROM embeddings
        WHERE vec_id <> 0 AND embedding IS NOT NULL
          AND EXISTS (SELECT 1 FROM q)
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    'q_ann_topk': """
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                   WHERE vec_id = 0 AND embedding IS NOT NULL)
        SELECT vec_id,
               cast(floor(list_cosine_similarity(embedding::DOUBLE[],
                                                 (SELECT qe FROM q))
                          * 1e6 + 0.5) AS BIGINT) / 1e6
                 AS cos_sim
        FROM embeddings
        WHERE vec_id <> 0 AND embedding IS NOT NULL
          AND EXISTS (SELECT 1 FROM q)
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    'q_rrf_fusion': """
        WITH qa AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                    WHERE vec_id = 0 AND embedding IS NOT NULL),
        qb AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id = 1 AND embedding IS NOT NULL),
        m AS (SELECT vec_id,
                cast(floor(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT qe FROM qa)) * 1e6 + 0.5) AS BIGINT)
                  AS cos6a,
                cast(floor(list_cosine_similarity(embedding::DOUBLE[],
                     (SELECT qe FROM qb)) * 1e6 + 0.5) AS BIGINT)
                  AS cos6b
              FROM embeddings
              WHERE vec_id NOT IN (0, 1) AND embedding IS NOT NULL
                AND EXISTS (SELECT 1 FROM qa)
                AND EXISTS (SELECT 1 FROM qb)),
        rc AS (SELECT vec_id, row_number() OVER
                   (ORDER BY cos6a DESC, vec_id) AS ra
               FROM m QUALIFY ra <= 100),
        rd AS (SELECT vec_id, row_number() OVER
                   (ORDER BY cos6b DESC, vec_id) AS rb
               FROM m QUALIFY rb <= 100)
        SELECT coalesce(rc.vec_id, rd.vec_id) AS vec_id,
               coalesce(ra, 0) AS rank_a,
               coalesce(rb, 0) AS rank_b,
               cast(floor((CASE WHEN ra IS NULL THEN 0.0
                           ELSE 1.0 / (60 + ra) END
                           + CASE WHEN rb IS NULL THEN 0.0
                           ELSE 1.0 / (60 + rb) END) * 1e6 + 0.5)
                    AS BIGINT) AS rrf6
        FROM rc FULL JOIN rd ON rc.vec_id = rd.vec_id
        ORDER BY vec_id
    """,
}


# ---------------------------------------------------------------------------
# dedup / text-analysis / similarity (training-data ops)
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup pairs over documents (threshold
    0.5): shingle explode → shingle-hash exchange → pair partials → one
    small groupby (stages/dedup.py:ngram_jaccard_pairs)."""
    from ..stages.dedup import ngram_jaccard_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ngram_jaccard_pairs(ds, threshold=0.5, num_buckets=16)\
        .sort(['doc_a', 'doc_b'])


def q_quality_scores(sf_dir: str):
    """Per-doc quality signals (SQL-expressible subset): word count, mean
    word length, distinct-word ratio, en-stopword ratio. Vectorized Arrow
    kernels + single-space split semantics shared with the oracle."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def score(tbl: pa.Table) -> pa.Table:
        from ..functions.text import (whitespace_token_count,
                                      stopword_distinct_ratios,
                                      _LANG_STOPWORDS)
        text = tbl.column('text').combine_chunks()
        n_chars = pc.utf8_length(text)
        n_words = whitespace_token_count(text)
        stop_ratio, distinct_ratio = stopword_distinct_ratios(
            text, _LANG_STOPWORDS['en'])
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'n_words': n_words,
            'mean_word_len': pc.round(pc.divide(
                pc.cast(n_chars, pa.float64()),
                pc.cast(n_words, pa.float64())), ndigits=6),
            'stopword_ratio': pa.array(np.round(stop_ratio, 6)),
            'distinct_word_ratio': pa.array(np.round(distinct_ratio, 6)),
        })

    return ds.map_batches(score, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


def q_normalized_docs(sf_dir: str):
    """Text-cleaning stage: whitespace collapse + trim + lowercase per doc
    (functions/text.py:normalize_text — three Arrow kernels)."""
    from ..functions.text import normalize_text
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def norm(tbl: pa.Table) -> pa.Table:
        out = normalize_text(tbl.column('text').combine_chunks())
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'text_norm': out,
            'n_chars_norm': pc.cast(pc.utf8_length(out), pa.int64()),
        })

    return ds.map_batches(norm, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


QUERIES['q_normalized_docs'] = q_normalized_docs
ORACLE_SQL['q_normalized_docs'] = """
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text_norm,
           length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
             AS n_chars_norm
    FROM documents ORDER BY doc_id
"""


def q_repetition_scores(sf_dir: str):
    """Gopher-style repetition signals per doc: duplicate-line fraction
    and top-bigram fraction (functions/text.py:repetition_signals —
    one split + hash + lexsort pass, no per-doc Python)."""
    from ..functions.text import repetition_signals
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def score(tbl: pa.Table) -> pa.Table:
        sig = repetition_signals(tbl.column('text'))
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'dup_line_frac': pa.array(np.round(sig['dup_line_frac'], 6)),
            'top_bigram_frac': pa.array(
                np.round(sig['top_bigram_frac'], 6)),
        })

    return ds.map_batches(score, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


def q_bpe_token_stats(sf_dir: str):
    """BPE-ish pre-token counts per source (regex piece counting)."""
    from ..functions.text import bpe_ish_token_count
    ds = _read(sf_dir, 'documents', ['source', 'text'], require=('text',))

    def derive(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'source': tbl.column('source'),
            'n_bpe': bpe_ish_token_count(tbl.column('text').combine_chunks()),
        })

    ds = ds.map_batches(derive, batch_format='pyarrow', zero_copy_batch=True)
    out = pre_aggregate(ds, ['source'], {'total_bpe': ('n_bpe', 'sum'),
                                         'avg_bpe': ('n_bpe', 'mean')})

    def round_avg(tbl: pa.Table) -> pa.Table:
        return tbl.set_column(
            tbl.column_names.index('avg_bpe'), 'avg_bpe',
            pc.round(tbl.column('avg_bpe'), ndigits=6))

    return out.map_batches(round_avg, batch_format='pyarrow').sort('source')


def _cosine_edges(sf_dir: str):
    """Unsorted exact cosine-similar pairs (vec_id < 1000, sim6 >=
    300000) — the shared edge builder for q_cosine_pairs and
    q_triangles_embeddings. Emits (id_a, id_b, cos_sim) with
    id_a < id_b; the similarity cut happens on int64 micro-units on
    both engines (CLAUDE.md fixed-point row-pick discipline)."""
    import pyarrow.parquet as pq
    cap, threshold = 1000, 0.3
    t0 = pq.read_table(f'{sf_dir}/embeddings.parquet',
                       columns=['vec_id', 'embedding'])
    t0 = t0.filter(pc.and_(pc.less(t0.column('vec_id'), cap),
                           pc.is_valid(t0.column('embedding'))))
    if t0.num_rows == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            'id_a': pa.array([], pa.int64()),
            'id_b': pa.array([], pa.int64()),
            'cos_sim': pa.array([], pa.float64())}))
    ids0 = t0.column('vec_id').to_numpy(zero_copy_only=False)
    la = t0.column('embedding').combine_chunks()
    mat0 = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64).reshape(len(la), -1)
    norm0 = np.linalg.norm(mat0, axis=1)
    import ray
    ref = ray.put((ids0, mat0, norm0))

    class PairFinder:
        def __init__(self):
            self.ids0, self.mat0, self.norm0 = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            tbl = tbl.filter(pc.and_(
                pc.less(tbl.column('vec_id'), cap),
                pc.is_valid(tbl.column('embedding'))))
            if tbl.num_rows == 0:
                return pa.table({'id_a': pa.array([], pa.int64()),
                                 'id_b': pa.array([], pa.int64()),
                                 'cos_sim': pa.array([], pa.float64())})
            ids = tbl.column('vec_id').to_numpy(zero_copy_only=False)
            la = tbl.column('embedding').combine_chunks()
            mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                             dtype=np.float64).reshape(len(la), -1)
            sims = (mat @ self.mat0.T) / np.outer(
                np.linalg.norm(mat, axis=1), self.norm0)
            # row-picking float compare: round BOTH engines to int64
            # micro-units first (CLAUDE.md fixed-point discipline —
            # numpy's blocked dot and DuckDB's sequential loop disagree
            # in the last ulp, which flips pairs sitting on the cut)
            sim6 = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            ia, ib = np.nonzero(sim6 >= int(round(threshold * 1e6)))
            keep = ids[ia] < self.ids0[ib]
            return pa.table({
                'id_a': pa.array(ids[ia[keep]]),
                'id_b': pa.array(self.ids0[ib[keep]]),
                'cos_sim': pa.array(
                    sim6[ia[keep], ib[keep]].astype(np.float64) / 1e6),
            })

    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return emb.map_batches(PairFinder, batch_format='pyarrow',
                           concurrency=2)


def q_cosine_pairs(sf_dir: str):
    """EXACT cosine-similar pairs (vec_id < 1000, cos >= 0.3): brute-force
    per-batch matmul against the broadcast sub-matrix; each batch emits
    only qualifying pairs. The LSH-bucketed variant for full-scale corpora
    is stages/dedup.py:embedding_near_dup (rows-only check)."""
    return _cosine_edges(sf_dir).sort(['id_a', 'id_b'])


def q_triangles_embeddings(sf_dir: str):
    """Per-node triangle participation counts of the cosine-similarity
    graph (edges = q_cosine_pairs' exact sim6 >= 0.3 cut): the
    clustering-coefficient / community-density primitive over an
    embedding corpus. The count itself is
    stages/graph.py:triangle_counts — degree-ordered wedge expansion
    bounded by O(m^1.5) plus a composite-key closing join, every stage
    distributed. Counts are exact integers, so parity is
    unconditional."""
    from ..stages.graph import triangle_counts

    edge_schema = pa.schema([('a', pa.int64()), ('b', pa.int64())])

    def as_edge(tbl: pa.Table) -> pa.Table:
        return pa.table({'a': tbl.column('id_a').combine_chunks(),
                         'b': tbl.column('id_b').combine_chunks()},
                        schema=edge_schema)

    edges = _cosine_edges(sf_dir).map_batches(as_edge,
                                              batch_format='pyarrow')
    counts = triangle_counts(edges, num_buckets=8,
                             edges_schema=edge_schema)

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table({'vec_id': tbl.column('node'),
                         'n_triangles': tbl.column('n_triangles')})

    return counts.map_batches(finish, batch_format='pyarrow')\
        .sort('vec_id')


_EDGE_SCHEMA = pa.schema([('a', pa.int64()), ('b', pa.int64())])


def _cosine_edge_ds(sf_dir: str):
    """(a, b) edge Dataset of the exact cosine>=0.3 graph, materialized
    once (it feeds multiple consumers in the graph-metric queries)."""
    def as_edge(tbl: pa.Table) -> pa.Table:
        return pa.table({'a': tbl.column('id_a').combine_chunks(),
                         'b': tbl.column('id_b').combine_chunks()},
                        schema=_EDGE_SCHEMA)

    return _cosine_edges(sf_dir).map_batches(
        as_edge, batch_format='pyarrow').materialize()


def _edge_degrees(edges, num_buckets=8):
    """(node, deg) Dataset from an (a, b) edge Dataset."""
    from ..stages.aggregate import bucket_aggregate

    def endpoints(tbl: pa.Table) -> pa.Table:
        a = tbl.column('a').combine_chunks()
        b = tbl.column('b').combine_chunks()
        return pa.table({'node': pa.concat_arrays([a, b]),
                         '_one': pa.array(np.ones(2 * tbl.num_rows,
                                                  dtype=np.int64))})

    return bucket_aggregate(
        edges.map_batches(endpoints, batch_format='pyarrow'),
        ['node'], {'deg': ('_one', 'sum')}, num_buckets=num_buckets)


def q_clustering_embeddings(sf_dir: str):
    """Per-node local clustering coefficient of the cosine graph:
    clus = triangles(v) / C(deg(v), 2) — the community-density score
    used for graph-based corpus curation. Entirely integer: triangle
    and degree counts are exact, the coefficient is ONE integer
    division (2e6*tri // deg*(deg-1), both operands non-negative so
    numpy floor == DuckDB trunc). Nodes with deg < 2 are excluded
    (coefficient undefined) on both engines."""
    from ..stages.graph import triangle_counts
    from ..stages.joins import hash_join

    edges = _cosine_edge_ds(sf_dir)
    tri = triangle_counts(edges, num_buckets=8,
                          edges_schema=_EDGE_SCHEMA)
    deg = _edge_degrees(edges)
    j = hash_join(
        deg, tri, on='node', how='left', num_buckets=8,
        left_schema=pa.schema([('node', pa.int64()),
                               ('deg', pa.int64())]),
        right_schema=pa.schema([('node', pa.int64()),
                                ('n_triangles', pa.int64())]))
    out_schema = pa.schema([('vec_id', pa.int64()), ('deg', pa.int64()),
                            ('tri', pa.int64()), ('clus6', pa.int64())])

    def coeff(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        d = tbl.column('deg').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        t = pc.fill_null(tbl.column('n_triangles'), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        node = tbl.column('node').to_numpy(zero_copy_only=False)
        keep = d >= 2
        d, t, node = d[keep], t[keep], node[keep]
        clus6 = (2_000_000 * t) // (d * (d - 1))
        return pa.table({'vec_id': pa.array(node), 'deg': pa.array(d),
                         'tri': pa.array(t), 'clus6': pa.array(clus6)},
                        schema=out_schema)

    return j.map_batches(coeff, batch_format='pyarrow').sort('vec_id')


def q_kcore_embeddings(sf_dir: str):
    """3-core of the cosine graph (stages/graph.py:k_core): iterative
    min-degree peel — the web-graph density filter. ORACLE-able (r4):
    every peel round is an exact-integer degree count + >= k filter, so
    a FIXED unroll transcribes into a MATERIALIZED CTE chain (pattern
    of q_pagerank_events / q_kmeans_embeddings); rounds past the
    fixpoint are no-ops, so the unroll count only needs to EXCEED the
    data's peel depth (measured 9-11 at sf scale; 40 unrolled).
    Brute-force parity + local==distributed parity stay pinned in
    tests/test_graph.py."""
    import ray.data as rd
    from ..stages.graph import k_core
    edges = _cosine_edge_ds(sf_dir)
    out = k_core(edges, k=3, num_buckets=8,
                 edges_schema=_EDGE_SCHEMA).sort('node')
    # an EMPTY k-core (the stacked null-graph fixture peels to
    # nothing) loses its schema through the sort — re-pin it; the
    # appended 0-row block cannot perturb the sorted order
    return out.union(rd.from_arrow(pa.schema(
        [('node', pa.int64()), ('deg', pa.int64())]).empty_table()))


def _kcore_oracle_sql(k: int = 3, rounds: int = 60) -> str:
    """SQL twin of k_core over the q_cosine_pairs edge set: ``rounds``
    unrolled peel rounds (degree count -> >= k survivors -> edge
    semi-join), each MATERIALIZED (CLAUDE.md: DuckDB inlines plain
    CTEs per reference — exponential in a chained recursion). The peel
    is idempotent at fixpoint, so overshooting the data's true depth
    changes nothing. Unlike the min-label CC unrolls (which pointer-
    jump to logarithmic convergence), peel depth is inherently
    sequential — 60 rounds covers the measured 9-11 at pristine sf
    scale AND the 48-deep peel the stacked null-graph fixture produces
    (10%-null embeddings thin the graph into long degree-3 chains that
    peel one layer per round; the r5 sentinel caught the old 40-round
    unroll stopping short of that fixpoint). A
    corpus whose peel runs deeper than the unroll fails LOUDLY, not as
    an opaque byte mismatch: one EXTRA verification round runs past
    ``rounds`` and a sentinel compares e{rounds} vs e{rounds+1} edge
    counts, calling error() on inequality (answer still comes from
    e{rounds}, so a peel converging at exactly ``rounds`` passes)."""
    parts = ["""
    WITH e0 AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) a
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) b
        ON a.vec_id < b.vec_id
      WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                       * 1e6 + 0.5) AS BIGINT) >= 300000)"""]
    for r in range(1, rounds + 2):   # +1 = sentinel round
        parts.append(f""",
    d{r} AS MATERIALIZED (
      SELECT node, count(*)::BIGINT AS deg FROM (
        SELECT a AS node FROM e{r - 1}
        UNION ALL SELECT b FROM e{r - 1}) GROUP BY node),
    n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r} AS MATERIALIZED (
      SELECT a, b FROM e{r - 1}
      WHERE a IN (SELECT node FROM n{r})
        AND b IN (SELECT node FROM n{r}))""")
    parts.append(f""",
    chk AS MATERIALIZED (
      SELECT CASE WHEN (SELECT count(*) FROM e{rounds})
                       <> (SELECT count(*) FROM e{rounds + 1})
                  THEN error('kcore oracle: peel depth exceeds the '
                             || '{rounds}-round unroll — raise rounds')
                  ELSE 0 END AS ok)
    SELECT node, count(*)::BIGINT AS deg FROM (
      SELECT a AS node FROM e{rounds}
      UNION ALL SELECT b FROM e{rounds}) CROSS JOIN chk
    WHERE chk.ok = 0
    GROUP BY node ORDER BY node""")
    return ''.join(parts)


ORACLE_SQL['q_kcore_embeddings'] = _kcore_oracle_sql()


def q_assortativity_embeddings(sf_dir: str):
    """Degree assortativity (Newman 2002) of the cosine graph: Pearson
    correlation of endpoint degrees over both edge orientations — do
    similar-degree nodes link to each other? The moment sums are EXACT
    int64 (degrees are integers; no fixed-point scaling needed at sf
    scale — at web scale the squared sums need the 1e2-style rescale,
    CLAUDE.md); only the final r divides two exact integers as doubles,
    micro-floored identically on both engines. Distributed shape: the
    two degree attachments are hash_joins, per-batch moment partials,
    one block-bounded driver reduce."""
    from ..stages.joins import hash_join

    empty = pd.DataFrame({'m': pd.Series(dtype=np.int64),
                          'r6': pd.Series(dtype=np.int64)})
    edges = _cosine_edge_ds(sf_dir)
    deg = _edge_degrees(edges)

    def key_a(tbl: pa.Table) -> pa.Table:
        return pa.table({'a': tbl.column('node'),
                         'deg_a': tbl.column('deg')})

    def key_b(tbl: pa.Table) -> pa.Table:
        return pa.table({'b': tbl.column('node'),
                         'deg_b': tbl.column('deg')})

    dschema = pa.schema([('node', pa.int64()), ('deg', pa.int64())])
    ed = hash_join(edges, deg.map_batches(key_a, batch_format='pyarrow'),
                   on='a', num_buckets=8, left_schema=_EDGE_SCHEMA,
                   right_schema=pa.schema([('a', pa.int64()),
                                           ('deg_a', pa.int64())]))
    ed = hash_join(ed, deg.map_batches(key_b, batch_format='pyarrow'),
                   on='b', num_buckets=8,
                   left_schema=pa.schema(
                       [('a', pa.int64()), ('b', pa.int64()),
                        ('deg_a', pa.int64())]),
                   right_schema=pa.schema([('b', pa.int64()),
                                           ('deg_b', pa.int64())]))
    part_schema = pa.schema([('m', pa.int64()), ('sx', pa.int64()),
                             ('sxx', pa.int64()), ('sxy', pa.int64())])

    def partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return part_schema.empty_table()
        da = tbl.column('deg_a').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        db = tbl.column('deg_b').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        return pa.table({
            'm': pa.array([len(da)], pa.int64()),
            'sx': pa.array([int((da + db).sum())], pa.int64()),
            'sxx': pa.array([int((da * da + db * db).sum())], pa.int64()),
            'sxy': pa.array([int((2 * da * db).sum())], pa.int64()),
        })

    df = _small_df(ed.map_batches(partial, batch_format='pyarrow'),
                   ['m', 'sx', 'sxx', 'sxy'])
    if len(df) == 0 or df['m'].sum() == 0:
        return empty
    m = int(df['m'].sum())
    n = 2 * m
    sx = int(df['sx'].sum())
    sxx = int(df['sxx'].sum())
    sxy = int(df['sxy'].sum())
    den = n * sxx - sx * sx
    num = n * sxy - sx * sx
    r6 = 0 if den == 0 else int(np.floor(float(num) / float(den)
                                         * 1e6 + 0.5))
    return pd.DataFrame({'m': pd.Series([m], dtype=np.int64),
                         'r6': pd.Series([r6], dtype=np.int64)})


def q_minhash_dedup_docs(sf_dir: str):
    """MinHash-LSH near-dup clusters over documents. ORACLE-able (r4):
    with hash_mode='duckdb' every stage is a deterministic function
    DuckDB recomputes — shingle hashes are nested hash(xor(...)) folds
    over DuckDB-parity word hashes, the 128 permutations are
    hash(xor(g, hash(p))) (the murmur finalizer is a uint64 bijection),
    band hashes fold the 4-row slices the same way, the Jaccard verify
    decision is the exact rational compare common*1e7 >= 4999995*union,
    and the cluster labels are min-label CC unrolled past its fixpoint.
    Still approximate at heart (pairs missed by all 32 bands stay
    missed); planted-pair recall stays pinned in tests/test_dedup.py."""
    from ..stages.dedup import minhash_dedup
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return minhash_dedup(ds, threshold=0.5, hash_mode='duckdb')\
        .sort('doc_id')


def _minhash_cluster_ctes(rounds: int = 12) -> str:
    """The CTE block transcribing minhash_dedup(hash_mode='duckdb',
    threshold=0.5, num_perm=128, num_bands=32, shingle_k=3) over a
    caller-provided ``mh_src(doc_id, text)`` CTE: shingle/permutation/
    band hashes as nested hash(xor(...)), LSH banding, exact-rational
    Jaccard verify, then ``rounds`` unrolled min-label CC steps (dup
    clusters are shallow; extra rounds are no-ops). The final cluster
    labels live in c{rounds}(node, lab). MATERIALIZED throughout
    (CLAUDE.md chained-recursion rule). Shared by the
    q_minhash_dedup_docs and q_curate_docs oracles."""
    parts = ["""
    toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM mh_src WHERE text IS NOT NULL),
    w AS MATERIALIZED (
      SELECT doc_id, unnest(ws) AS wd,
             unnest(generate_series(1, len(ws))) AS pos
      FROM toks),
    wh AS MATERIALIZED (SELECT doc_id, pos, hash(wd) AS h FROM w),
    grams AS MATERIALIZED (
      SELECT DISTINCT a.doc_id,
             hash(xor(hash(xor(a.h, b.h)), c.h)) AS g
      FROM wh a
      JOIN wh b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN wh c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
    sig AS MATERIALIZED (
      SELECT doc_id, p.range AS p,
             min(hash(xor(g, hash(p.range)))) AS s
      FROM grams CROSS JOIN range(128) p GROUP BY doc_id, p.range),
    band AS MATERIALIZED (
      SELECT doc_id, p // 4 AS band_id,
        hash(xor(hash(xor(hash(xor(hash(
          max(CASE WHEN p % 4 = 0 THEN s END)),
          max(CASE WHEN p % 4 = 1 THEN s END))),
          max(CASE WHEN p % 4 = 2 THEN s END))),
          max(CASE WHEN p % 4 = 3 THEN s END))) AS bh
      FROM sig GROUP BY doc_id, p // 4),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM band a JOIN band b
        ON a.band_id = b.band_id AND a.bh = b.bh
        AND a.doc_id < b.doc_id),
    szs AS MATERIALIZED (
      SELECT doc_id, count(*)::BIGINT AS sz FROM grams GROUP BY doc_id),
    com AS MATERIALIZED (
      SELECT c.da, c.db, count(*)::BIGINT AS common
      FROM cand c JOIN grams ga ON ga.doc_id = c.da
                  JOIN grams gb ON gb.doc_id = c.db AND gb.g = ga.g
      GROUP BY c.da, c.db),
    e0 AS MATERIALIZED (
      SELECT da AS a, db AS b FROM com
      JOIN szs sa ON sa.doc_id = com.da
      JOIN szs sb ON sb.doc_id = com.db
      WHERE common * 10000000 >= 4999995 * (sa.sz + sb.sz - common)),
    adj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM e0 UNION ALL SELECT b, a FROM e0),
    c0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM adj)"""]
    for r in range(1, rounds + 1):
        # hooking (min over neighbor labels) PLUS pointer jumping
        # (label of my label): jumping makes convergence logarithmic
        # in chain length, so the fixed unroll matches the engine's
        # CC fixpoint far beyond the round count (review finding: a
        # diameter-19 near-dup chain beat 12 hooking-only rounds)
        parts.append(f""",
    c{r} AS MATERIALIZED (
      SELECT c.node, least(c.lab, j.lab, m.mn) AS lab
      FROM c{r - 1} c
      LEFT JOIN c{r - 1} j ON j.node = c.lab
      LEFT JOIN (
        SELECT adj.node, min(l.lab) AS mn
        FROM adj JOIN c{r - 1} l ON adj.nb = l.node
        GROUP BY adj.node) m ON m.node = c.node)""")
    return ''.join(parts)


def _minhash_oracle_sql(rounds: int = 12) -> str:
    return f"""
    WITH mh_src AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    {_minhash_cluster_ctes(rounds)}
    SELECT node AS doc_id, lab AS cluster_id FROM c{rounds}
    ORDER BY doc_id"""


ORACLE_SQL['q_minhash_dedup_docs'] = _minhash_oracle_sql()


def q_simhash_candidates_docs(sf_dir: str):
    """SimHash near-dup candidates (hamming <= 3). ORACLE-able (r4):
    with hash_mode='duckdb' the 64-bit signature is a deterministic
    function of the token stream under the DuckDB-parity MurmurHash64A
    token hash — per bit, the ±1 occurrence-vote sum decides via v > 0;
    DuckDB recomputes the sig (64-way bit expansion + winning-bit power
    sum), the 16-bit chunk banding, the >256 stop-pattern drop, and the
    bit_count(xor) hamming verify byte-for-byte."""
    from ..stages.dedup import simhash_candidates
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return simhash_candidates(ds, max_hamming=3, num_buckets=16,
                              hash_mode='duckdb')\
        .sort(['doc_a', 'doc_b'])


ORACLE_SQL['q_simhash_candidates_docs'] = """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL AND length(text) > 0),
    votes AS MATERIALIZED (
      SELECT doc_id, b.range AS b,
             sum(CASE WHEN (hash(tok) >> b.range) & 1 = 1
                 THEN 1 ELSE -1 END) AS v
      FROM toks CROSS JOIN range(64) b GROUP BY doc_id, b.range),
    sig AS MATERIALIZED (
      SELECT doc_id,
             cast(sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT
                      ELSE 0 END) AS UBIGINT) AS s
      FROM votes GROUP BY doc_id),
    chunks AS MATERIALIZED (
      SELECT doc_id, s, c.range AS chunk_id,
             (s >> (c.range * 16)) & 65535 AS chunk_val
      FROM sig CROSS JOIN range(4) c),
    kept AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY chunk_id, chunk_val)
          AS bsz FROM chunks) WHERE bsz <= 256),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.s, b.s))::BIGINT AS hamming
      FROM kept a JOIN kept b
        ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
        AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 3)
    SELECT doc_a, doc_b, min(hamming) AS hamming
    FROM pairs GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b
"""


def q_embedding_near_dup(sf_dir: str):
    """Random-hyperplane-LSH cosine near-dups. ORACLE-able (r4): with
    hash_mode='duckdb' the hyperplanes are hash-derived Rademacher
    vectors, the bucket is the sign pattern of EXACT int64 projections
    over micro-quantized components, and the in-bucket verify follows
    the q_cosine_pairs fixed-point discipline — DuckDB recomputes
    buckets and pairs byte-for-byte. Still an approximate operator at
    heart: pairs in different buckets are missed by design (recall
    behavior pinned in tests/test_dedup.py). Threshold 0.3 matches the
    q_cosine_pairs cut so natural pairs exist at sf scale (0.95 returns
    zero rows on this corpus — a vacuous check)."""
    from ..stages.dedup import embedding_near_dup
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return embedding_near_dup(ds, threshold=0.3, num_planes=6,
                              num_buckets=16, hash_mode='duckdb')\
        .sort(['id_a', 'id_b'])


# SQL twin of embedding_near_dup(hash_mode='duckdb'): Rademacher plane
# component for (dim d, plane p) = ±1 from bit 0 of hash(d*6 + p);
# projection = exact int64 dot over floor(x*1e6+0.5) components; bucket
# = sum of winning-sign powers; verify = micro-floored cosine >= the
# query's 0.3 cut (sim6 >= 300000, same as q_cosine_pairs).
ORACLE_SQL['q_embedding_near_dup'] = """
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE embedding IS NOT NULL),
    proj AS MATERIALIZED (
      SELECT vec_id, p.range AS p,
             sum(cast(floor(emb[d.range + 1] * 1e6 + 0.5) AS BIGINT)
                 * (CASE WHEN (hash(d.range * 6 + p.range) & 1) = 1
                    THEN 1 ELSE -1 END)) AS pr
      FROM e CROSS JOIN range(64) d CROSS JOIN range(6) p
      GROUP BY vec_id, p.range),
    bkt AS MATERIALIZED (
      SELECT vec_id,
             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END)
               AS bucket
      FROM proj GROUP BY vec_id),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             cast(floor(list_cosine_similarity(ea.emb, eb.emb)
                        * 1e6 + 0.5) AS BIGINT) AS sim6
      FROM bkt a JOIN bkt b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id)
    SELECT id_a, id_b, sim6 / 1e6 AS cos_sim
    FROM pairs WHERE sim6 >= 300000 ORDER BY id_a, id_b
"""


def q_embedding_dup_detect(sf_dir: str):
    """ORACLE-CHECKED embedding-LSH dedup: the corpus unioned with a
    planted exact copy of itself (vec_id + 1_000_000) runs through the
    random-hyperplane LSH near-dup at threshold 0.95. Identical vectors
    share every projection sign, so LSH finds each planted pair with
    certainty, and the fixtures' max natural cosine is ~0.6 (verified),
    so the EXACT expected output is the n planted pairs at cos 1.0 —
    SQL-expressible, giving the approximate-LSH code path a byte-level
    driver check (recall is covered separately in tests/test_dedup.py)."""
    from ..stages.dedup import embedding_near_dup
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])

    def shift(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'vec_id': pc.add(tbl.column('vec_id'),
                             pa.scalar(1_000_000, type=pa.int64())),
            'embedding': tbl.column('embedding'),
        })

    doubled = ds.union(ds.map_batches(shift, batch_format='pyarrow'))
    return embedding_near_dup(doubled, threshold=0.95, num_planes=6,
                              num_buckets=16).sort(['id_a', 'id_b'])


def q_langid_docs(sf_dir: str):
    """Stopword-voting language ID per doc — fully vectorized and
    SQL-expressible (per-language vote counts + alphabetical-first
    argmax), so the driver byte-checks it against DuckDB."""
    from ..functions.text import language_id
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def lid(tbl: pa.Table) -> pa.Table:
        langs, conf = language_id(tbl.column('text'))
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'lang_pred': pa.array(langs, type=pa.string()),
            'confidence': pa.array(np.round(conf, 6)),
        })

    return ds.map_batches(lid, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


QUERIES.update({
    'q_ngram_jaccard_pairs': q_ngram_jaccard_pairs,
    'q_quality_scores': q_quality_scores,
    'q_repetition_scores': q_repetition_scores,
    'q_bpe_token_stats': q_bpe_token_stats,
    'q_cosine_pairs': q_cosine_pairs,
    'q_triangles_embeddings': q_triangles_embeddings,
    'q_clustering_embeddings': q_clustering_embeddings,
    'q_assortativity_embeddings': q_assortativity_embeddings,
    'q_kcore_embeddings': q_kcore_embeddings,
    'q_minhash_dedup_docs': q_minhash_dedup_docs,
    'q_simhash_candidates_docs': q_simhash_candidates_docs,
    'q_embedding_near_dup': q_embedding_near_dup,
    'q_embedding_dup_detect': q_embedding_dup_detect,
    'q_langid_docs': q_langid_docs,
})

ORACLE_SQL.update({
    'q_ngram_jaccard_pairs': """
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE text IS NOT NULL),
        sh0 AS (
          -- s IS NOT NULL matters twice: a NULL text has no shingles
          -- (engine parity), and a NULL inside the NOT-IN subquery
          -- below would void EVERY membership test (SQL three-valued
          -- logic) — at scale the NULL-shingle group goes 'hot' and
          -- silently empties the whole result
          SELECT DISTINCT doc_id,
                 w[x] || ' ' || w[x + 1] || ' ' || w[x + 2] AS s
          FROM words, unnest(range(1, greatest(len(w) - 1, 2))) AS t(x)
          WHERE w[x] || ' ' || w[x + 1] || ' ' || w[x + 2] IS NOT NULL),
        -- identical stop-shingle cap as the Ray side (max_df = 50)
        hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 50),
        sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c / (sa.sz + sb.sz - c) >= 0.5
        ORDER BY doc_a, doc_b
    """,
    'q_quality_scores': """
        WITH w AS (
          SELECT doc_id, text, string_split(text, ' ') AS ws,
                 string_split(lower(text), ' ') AS lws
          FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents)
        SELECT doc_id,
               len(ws) AS n_words,
               round(length(text) * 1.0 / len(ws), 6) AS mean_word_len,
               round(len(list_filter(lws, x -> x IN
                 ('the','and','of','to','a','in','is','that','it','for')))
                 * 1.0 / len(lws), 6) AS stopword_ratio,
               round(len(list_distinct(lws)) * 1.0 / len(lws), 6)
                 AS distinct_word_ratio
        FROM w ORDER BY doc_id
    """,
    'q_repetition_scores': """
        WITH l AS (
          SELECT doc_id, string_split(text, chr(10)) AS lines
          FROM documents),
        lf AS (
          SELECT doc_id,
                 -- coalesce: NULL text -> 0.0 (engine fills null to '')
                 coalesce(round((len(lines) - len(list_distinct(lines)))
                                * 1.0 / greatest(len(lines), 1), 6), 0.0)
                   AS dup_line_frac
          FROM l),
        w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (
          SELECT w.doc_id, ws[x] || ' ' || ws[x + 1] AS bg
          FROM w, unnest(range(1, len(ws))) AS t(x)),
        cnt AS (SELECT doc_id, bg, count(*) AS c
                FROM g GROUP BY doc_id, bg),
        bf AS (SELECT doc_id,
                      round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
               FROM cnt GROUP BY doc_id)
        SELECT lf.doc_id, lf.dup_line_frac,
               coalesce(bf.top_bigram_frac, 0.0) AS top_bigram_frac
        FROM lf LEFT JOIN bf ON lf.doc_id = bf.doc_id
        ORDER BY lf.doc_id
    """,
    'q_bpe_token_stats': """
        WITH t AS (
          SELECT source,
                 len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]{1,3}|[^\\sA-Za-z0-9]+')) AS n_bpe
          FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents)
        SELECT source,
               cast(sum(n_bpe) AS BIGINT)       AS total_bpe,
               round(sum(n_bpe) * 1.0 / count(*), 6) AS avg_bpe
        FROM t GROUP BY source ORDER BY source
    """,
    # per-language stopword votes + alphabetical-first argmax — identical
    # vote/tie-break/confidence arithmetic to functions/text.language_id
    'q_langid_docs': """
        WITH w AS (
          SELECT doc_id, string_split(lower(text), ' ') AS lws
          FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
        s AS (
          SELECT doc_id, len(lws) AS nw,
            len(list_filter(lws, x -> x IN
              ('das','der','die','ein','ist','mit','nicht','und','zu')))
              AS s_de,
            len(list_filter(lws, x -> x IN
              ('a','and','for','in','is','it','of','that','the','to')))
              AS s_en,
            len(list_filter(lws, x -> x IN
              ('el','en','es','la','las','los','por','que','un','una')))
              AS s_es,
            len(list_filter(lws, x -> x IN
              ('dans','est','et','la','le','les','pour','un','une')))
              AS s_fr
          FROM w),
        m AS (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS mx FROM s)
        SELECT doc_id,
               CASE WHEN mx = 0 THEN 'unknown'
                    WHEN s_de = mx THEN 'de'
                    WHEN s_en = mx THEN 'en'
                    WHEN s_es = mx THEN 'es'
                    ELSE 'fr' END AS lang_pred,
               CASE WHEN mx = 0 THEN 0.0
                    ELSE round(mx * 1.0 / greatest(nw, 1), 6)
               END AS confidence
        FROM m ORDER BY doc_id
    """,
    # identical vectors: cos = (v.v)/(|v||v|) = 1 +- 1 ulp -> rounds to
    # exactly 1.0; the fixtures' max natural cosine is ~0.6 so only the
    # planted pairs qualify at 0.95 (see q_embedding_dup_detect docstring)
    'q_embedding_dup_detect': """
        SELECT vec_id            AS id_a,
               vec_id + 1000000  AS id_b,
               1.0               AS cos_sim
        FROM embeddings
        WHERE embedding IS NOT NULL   -- a NULL vector can't pair
        ORDER BY id_a
    """,
    # threshold and output in int64 micro-units on BOTH engines: the
    # raw-double cut flips pairs within 1 ulp of 0.3 (summation order)
    'q_cosine_pairs': """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                   FROM embeddings WHERE vec_id < 1000),
        s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     cast(floor(list_cosine_similarity(a.emb, b.emb)
                                * 1e6 + 0.5) AS BIGINT) AS sim6
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, sim6 / 1e6 AS cos_sim
        FROM s WHERE sim6 >= 300000
        ORDER BY id_a, id_b
    """,
    'q_triangles_embeddings': """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                   FROM embeddings WHERE vec_id < 1000),
        ed AS (SELECT a.vec_id AS va, b.vec_id AS vb
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                                * 1e6 + 0.5) AS BIGINT) >= 300000),
        tri AS (SELECT e1.va AS x, e1.vb AS y, e2.vb AS z
                FROM ed e1
                JOIN ed e2 ON e2.va = e1.va AND e2.vb > e1.vb
                JOIN ed e3 ON e3.va = e1.vb AND e3.vb = e2.vb),
        nodes AS (SELECT x AS vec_id FROM tri
                  UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri)
        SELECT vec_id, count(*) AS n_triangles
        FROM nodes GROUP BY vec_id ORDER BY vec_id
    """,
    'q_clustering_embeddings': """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                   FROM embeddings WHERE vec_id < 1000),
        ed AS (SELECT a.vec_id AS va, b.vec_id AS vb
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                                * 1e6 + 0.5) AS BIGINT) >= 300000),
        deg AS (SELECT vec_id, count(*) AS deg FROM (
                  SELECT va AS vec_id FROM ed
                  UNION ALL SELECT vb FROM ed) GROUP BY vec_id),
        tri AS (SELECT e1.va AS x, e1.vb AS y, e2.vb AS z
                FROM ed e1
                JOIN ed e2 ON e2.va = e1.va AND e2.vb > e1.vb
                JOIN ed e3 ON e3.va = e1.vb AND e3.vb = e2.vb),
        tc AS (SELECT vec_id, count(*) AS tri FROM (
                 SELECT x AS vec_id FROM tri
                 UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY vec_id)
        SELECT d.vec_id, d.deg, coalesce(t.tri, 0) AS tri,
               (2000000 * coalesce(t.tri, 0)) // (d.deg * (d.deg - 1))
                 AS clus6
        FROM deg d LEFT JOIN tc t USING (vec_id)
        WHERE d.deg >= 2
        ORDER BY d.vec_id
    """,
    'q_assortativity_embeddings': """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                   FROM embeddings WHERE vec_id < 1000),
        ed AS (SELECT a.vec_id AS va, b.vec_id AS vb
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                                * 1e6 + 0.5) AS BIGINT) >= 300000),
        deg AS (SELECT vec_id, count(*) AS deg FROM (
                  SELECT va AS vec_id FROM ed
                  UNION ALL SELECT vb FROM ed) GROUP BY vec_id),
        p AS (SELECT d1.deg AS da, d2.deg AS db
              FROM ed JOIN deg d1 ON d1.vec_id = ed.va
                      JOIN deg d2 ON d2.vec_id = ed.vb),
        s AS (SELECT count(*) AS m, sum(da + db) AS sx,
                     sum(da * da + db * db) AS sxx,
                     sum(2 * da * db) AS sxy
              FROM p)
        SELECT m,
               CASE WHEN 2 * m * sxx - sx * sx = 0 THEN 0
                    ELSE cast(floor(
                        cast(2 * m * sxy - sx * sx AS DOUBLE)
                        / cast(2 * m * sxx - sx * sx AS DOUBLE)
                        * 1e6 + 0.5) AS BIGINT) END AS r6
        FROM s WHERE m > 0
        ORDER BY m
    """,
})


def _priority_revenue_impl(sf_dir: str, join_fn):
    """Shared body of q_priority_revenue / q_priority_revenue_salted —
    the two MUST byte-match the same oracle, so everything except the
    join call is one implementation. ``join_fn(per_order, orders,
    left_schema)`` returns the joined dataset."""
    from ..stages.aggregate import bucket_aggregate
    lineitem = _read(sf_dir, 'lineitem',
                     ['l_orderkey', 'l_extendedprice', 'l_discount'])

    def rev(tbl: pa.Table) -> pa.Table:
        r = pc.multiply(tbl.column('l_extendedprice'),
                        pc.subtract(pa.scalar(1.0), tbl.column('l_discount')))
        return pa.table({'o_orderkey': tbl.column('l_orderkey'),
                         'rev6': _fixed6(r),
                         '_one': pa.array(np.ones(tbl.num_rows,
                                                  dtype=np.int64))})

    lrev = lineitem.map_batches(rev, batch_format='pyarrow',
                                zero_copy_batch=True)
    per_order = bucket_aggregate(lrev, ['o_orderkey'],
                                 {'rev6': ('rev6', 'sum'),
                                  # count(*) parity: _one is never null;
                                  # rev6 CAN be (null price/disc)
                                  'n_items': ('_one', 'count')},
                                 num_buckets=16)
    orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_orderpriority'])
    li = dict(zip(lineitem.schema().names, lineitem.schema().types))
    joined = join_fn(per_order, orders,
                     pa.schema([('o_orderkey', li['l_orderkey']),
                                ('rev6', pa.int64()),
                                ('n_items', pa.int64())]))

    # the join's null-padded union floatifies the int64 partials; restore
    # exact int64 (integer-valued doubles cast exactly) so sums stay
    # order-independent
    def reint(tbl: pa.Table) -> pa.Table:
        cols = {}
        for n in tbl.column_names:
            cols[n] = (pc.cast(tbl.column(n), pa.int64())
                       if n in ('rev6', 'n_items') else tbl.column(n))
        return pa.table(cols)

    joined = joined.map_batches(reint, batch_format='pyarrow')
    out = pre_aggregate(joined, ['o_orderpriority'],
                        {'rev6': ('rev6', 'sum'),
                         'n_items': ('n_items', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'o_orderpriority': tbl.column('o_orderpriority'),
                         'total_revenue': _unfix6(tbl.column('rev6')),
                         'n_items': tbl.column('n_items')})

    return _sort_ns(out.map_batches(finalize, batch_format='pyarrow'),
                    'o_orderpriority', str_cols=['o_orderpriority'])


def q_priority_revenue(sf_dir: str):
    """Large×large partitioned hash join (lineitem ⋈ orders on orderkey —
    one bucket exchange of both sides; stages/joins.py:hash_join) then
    partial-aggregated revenue per order priority. The fact side is
    pre-aggregated per l_orderkey BEFORE the join (~4 lineitem rows per
    order collapse to one partial), cutting join-exchange bytes ~4×."""
    from ..stages.joins import hash_join

    def join_fn(per_order, orders, left_schema):
        return hash_join(per_order, orders, on='o_orderkey',
                         num_buckets=16, left_schema=left_schema)

    return _priority_revenue_impl(sf_dir, join_fn)


def q_latest_events(sf_dir: str):
    """Latest-wins compaction (CDC upsert / snapshot): each user's most
    recent event row, order (ts, event_id) — event_id breaks same-ts
    ties deterministically. stages/aggregate.latest_by_key: per-batch
    argmax prune, ONE bucket exchange of the pruned rows. A CDC record
    needs an event time: NULL-ts rows are excluded on both engines."""
    from ..stages.aggregate import latest_by_key
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'],
               require=('ts',))
    out = latest_by_key(ds, 'user_id', ['ts', 'event_id'])

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'user_id': tbl.column('user_id'),
            'ts_us': pc.cast(pc.cast(tbl.column('ts'),
                                     pa.timestamp('us')), pa.int64()),
            'event_id': tbl.column('event_id'),
            'event_type': tbl.column('event_type'),
            'value': tbl.column('value'),
        })

    return out.map_batches(finish, batch_format='pyarrow')\
        .sort('user_id')


QUERIES['q_latest_events'] = q_latest_events
ORACLE_SQL['q_latest_events'] = """
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
    FROM events WHERE ts IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""

QUERIES['q_asof_broadcast_events'] = q_asof_broadcast_events
ORACLE_SQL['q_asof_broadcast_events'] = """
    WITH clicks AS (
      SELECT user_id, ts, max(value) AS click_value
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT p.event_id, p.user_id, p.value,
           c.click_value AS last_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY p.event_id
"""

QUERIES['q_asof_forward_events'] = q_asof_forward_events
ORACLE_SQL['q_asof_forward_events'] = """
    WITH clicks AS (
      SELECT user_id, ts, max(value) AS click_value
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT p.event_id, p.user_id, p.value,
           (SELECT c.click_value FROM clicks c
             WHERE c.user_id = p.user_id AND c.ts > p.ts
               AND c.ts <= p.ts + INTERVAL 6 HOUR
             ORDER BY c.ts LIMIT 1) AS next_click_value
    FROM purchases p
    ORDER BY p.event_id
"""

QUERIES['q_asof_nearest_events'] = q_asof_nearest_events
ORACLE_SQL['q_asof_nearest_events'] = """
    WITH clicks AS (
      SELECT user_id, ts, max(value) AS click_value
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT p.event_id, p.user_id, p.value,
           (SELECT c.click_value FROM clicks c
             WHERE c.user_id = p.user_id
             ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
             LIMIT 1) AS nearest_click_value
    FROM purchases p
    ORDER BY p.event_id
"""

QUERIES['q_asof_events_stage'] = q_asof_events_stage
ORACLE_SQL['q_asof_events_stage'] = """
    WITH clicks AS (
      SELECT user_id, ts, max(value) AS click_value
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT p.event_id, p.user_id, p.value,
           c.click_value AS last_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY p.event_id
"""


QUERIES['q_priority_revenue'] = q_priority_revenue
ORACLE_SQL['q_priority_revenue'] = """
    SELECT o_orderpriority,
           round(cast(sum(cast(floor(l_extendedprice * (1 - l_discount)
                                     * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6, 6)  AS total_revenue,
           count(*)         AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue from RETURNED items.
    Two pre-aggregations collapse the fact side before each exchange
    (per-orderkey before lineitem ⋈ orders, per-custkey before
    ⋈ customer), nation attaches via a 25-row broadcast, and the top-20
    order is TOTAL (rev desc, custkey asc — exact int64 revenue, so the
    cut is deterministic on both engines)."""
    import ray
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import hash_join

    lineitem = _read(sf_dir, 'lineitem',
                     ['l_orderkey', 'l_extendedprice', 'l_discount',
                      'l_returnflag'])

    def rev(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.equal(tbl.column('l_returnflag'),
                                  pa.scalar('R')))
        r = pc.multiply(tbl.column('l_extendedprice'),
                        pc.subtract(pa.scalar(1.0),
                                    tbl.column('l_discount')))
        return pa.table({'o_orderkey': tbl.column('l_orderkey'),
                         'rev6': _fixed6(r)})

    li = dict(zip(lineitem.schema().names, lineitem.schema().types))
    per_order = bucket_aggregate(
        lineitem.map_batches(rev, batch_format='pyarrow',
                             zero_copy_batch=True),
        ['o_orderkey'], {'rev6': ('rev6', 'sum')}, num_buckets=16)

    orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_custkey'])
    joined = hash_join(
        per_order, orders, on='o_orderkey', num_buckets=16,
        left_schema=pa.schema([('o_orderkey', li['l_orderkey']),
                               ('rev6', pa.int64())]))

    def to_cust(tbl: pa.Table) -> pa.Table:
        # the join's null-padding floatified rev6 — restore exact int64
        return pa.table({'c_custkey': tbl.column('o_custkey'),
                         'rev6': pc.cast(tbl.column('rev6'), pa.int64())})

    per_cust = bucket_aggregate(
        joined.map_batches(to_cust, batch_format='pyarrow'),
        ['c_custkey'], {'rev6': ('rev6', 'sum')}, num_buckets=16)

    customer = _read(sf_dir, 'customer',
                     ['c_custkey', 'c_name', 'c_acctbal', 'c_nationkey'])
    cu = dict(zip(customer.schema().names, customer.schema().types))
    with_cust = hash_join(
        per_cust, customer, on='c_custkey', num_buckets=16,
        left_schema=pa.schema([('c_custkey', cu['c_custkey']),
                               ('rev6', pa.int64())]))

    nation = _small_df(_read(sf_dir, 'nation', ['n_nationkey', 'n_name']),
                       ['n_nationkey', 'n_name'])
    nref = ray.put((pa.array(nation['n_nationkey'].to_numpy(
                        dtype=np.int64)),
                    pa.array(nation['n_name'], type=pa.string())))

    def attach_nation(tbl: pa.Table) -> pa.Table:
        keys, names = ray.get(nref)
        idx = pc.index_in(tbl.column('c_nationkey'), value_set=keys)
        out = pa.table({
            'c_custkey': tbl.column('c_custkey'),
            'c_name': tbl.column('c_name'),
            'c_acctbal': tbl.column('c_acctbal'),
            'n_name': names.take(idx),
            'rev6': pc.cast(tbl.column('rev6'), pa.int64()),
        })
        # null/dangling c_nationkey never MATCHES the oracle's inner
        # join — drop on lookup failure (is_valid(idx)), NOT on a null
        # n_name: a matched nation whose name is null stays, with its
        # NULL name, exactly as the SQL join emits it
        return out.filter(pc.is_valid(idx))

    from ..stages.aggregate import global_topk
    top = global_topk(
        with_cust.map_batches(attach_nation, batch_format='pyarrow'),
        [('rev6', 'descending'), ('c_custkey', 'ascending')], 20)

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'c_custkey': tbl.column('c_custkey'),
            'c_name': tbl.column('c_name'),
            'c_acctbal': tbl.column('c_acctbal'),
            'n_name': tbl.column('n_name'),
            'revenue': _unfix6(tbl.column('rev6')),
        })

    return top.map_batches(finalize, batch_format='pyarrow')\
        .sort(['revenue', 'c_custkey'], descending=[True, False])


QUERIES['q_returned_revenue'] = q_returned_revenue
ORACLE_SQL['q_returned_revenue'] = """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           round(cast(sum(cast(floor(l_extendedprice * (1 - l_discount)
                                     * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6, 6) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum(cast(floor(l_extendedprice * (1 - l_discount)
                            * 1e6 + 0.5) AS BIGINT)) DESC, c_custkey
    LIMIT 20
"""


def q_rolling_events(sf_dir: str):
    """Rolling-window aggregates per user over the last 5 events
    (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW): mean/min/max of value —
    cumsum-based segmented kernels, one hash exchange."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False)
        # window sums in EXACT int64 micro-units (CLAUDE.md): a float
        # prefix-sum difference rounds at the whole-bucket prefix
        # magnitude, flipping round(mean, 6) vs the oracle as buckets
        # grow; both engines now divide identical integers
        v6 = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)
        sum6, cnt = W.rolling_sum_fixed(v6, starts, 5)
        with np.errstate(invalid='ignore', divide='ignore'):
            mean = np.floor(sum6 / np.maximum(cnt, 1) + 0.5) / 1e6
        mn, mx = W.rolling_min_max(v, starts, 5)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'roll_mean': pa.array(mean, mask=(cnt == 0)),
            'roll_min': pa.array(mn),
            'roll_max': pa.array(mx),
        })

    return _per_user(ds, fn).sort('event_id')


def q_time_window_events(sf_dir: str):
    """Trailing 1-hour RANGE window per user: count + exact sum of value
    (stages/window.py:time_range_sum — one searchsorted over the shifted
    keys, SQL peer semantics for tied timestamps, fixed-point sums).
    NULL-ts rows are excluded on both engines; NULL values skip the sum
    but still count toward count(*), and an all-null window sums to
    NULL."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        v6f = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nn = ~np.isnan(v6f)
        v6 = np.where(nn, v6f, 0.0).astype(np.int64)
        sums, counts = W.time_range_sum(v6, ts_us, starts, 3_600_000_000)
        nonnull, _ = W.time_range_sum(nn.astype(np.int64), ts_us, starts,
                                      3_600_000_000)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'n_window': pa.array(counts, type=pa.int64()),
            'sum_window': pa.array(
                np.round(sums.astype(np.float64) / 1e6, 6),
                mask=nonnull == 0),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_time_window_events'] = q_time_window_events
ORACLE_SQL['q_time_window_events'] = """
    WITH s AS (
      SELECT event_id, user_id, ts,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL)
    SELECT event_id, user_id,
           count(*) OVER w AS n_window,
           round(cast(sum(v6) OVER w AS DOUBLE) / 1e6, 6) AS sum_window
    FROM s
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                           AND CURRENT ROW)
    ORDER BY event_id
"""


def q_cumsum_events(sf_dir: str):
    """Running total per user ordered by (ts, event_id): exact int64
    cumulative sums (stages/window.py:running_sum). NULL-ts rows are
    excluded on both engines; NULL values skip the sum (SQL semantics),
    and a prefix with no non-null value yet is NULL, not 0."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v6f = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nn = ~np.isnan(v6f)
        v6 = np.where(nn, v6f, 0.0).astype(np.int64)
        run = W.running_sum(v6, starts)
        seen = W.running_sum(nn.astype(np.int64), starts)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'cum_value': pa.array(
                np.round(run.astype(np.float64) / 1e6, 6),
                mask=seen == 0),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_cumsum_events'] = q_cumsum_events
ORACLE_SQL['q_cumsum_events'] = """
    SELECT event_id, user_id,
           round(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 1e6, 6) AS cum_value
    FROM events WHERE ts IS NOT NULL ORDER BY event_id
"""


QUERIES['q_rolling_events'] = q_rolling_events
ORACLE_SQL['q_rolling_events'] = """
    -- window mean from int64 micro-unit sums (identical integers on
    -- both engines), not avg() over raw floats — float window sums are
    -- not byte-stable against the engine's prefix-sum kernel
    SELECT event_id, user_id,
           CASE WHEN count(value) OVER w > 0 THEN
             floor(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                        OVER w AS DOUBLE)
                   / count(value) OVER w + 0.5) / 1e6
           END                         AS roll_mean,
           min(value) OVER w           AS roll_min,
           max(value) OVER w           AS roll_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""


def q_rank_events(sf_dir: str):
    """Window ranks per user by value desc: rank() (gaps after ties) and
    dense_rank() — one lexsort per bucket, no per-group loop
    (stages/reshape.py:group_ranks)."""
    from ..stages.reshape import group_ranks
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False)
        rank, dense = group_ranks(v, starts, descending=True)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'value_rank': pa.array(rank),
            'value_dense_rank': pa.array(dense),
        })

    return per_conversation(ds, fn, key='user_id', order=('event_id',),
                            num_buckets=32).sort('event_id')


QUERIES['q_rank_events'] = q_rank_events
ORACLE_SQL['q_rank_events'] = """
    SELECT event_id, user_id,
           rank() OVER w       AS value_rank,
           dense_rank() OVER w AS value_dense_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC)
    ORDER BY event_id
"""


def q_rank_nulls_events(sf_dir: str):
    """Window ranks over a NULL-BEARING key: values under 50 become
    NULL, survivors quantize to floor(value) so non-null ties exist too.
    Gates the NULLs-are-peers / NULLs-sort-last semantics of
    stages/reshape.py:group_ranks (NaN==NaN tie runs; lexsort places
    NaN last in both directions) against DuckDB, which the all-non-null
    events fixture in q_rank_events never exercises (ADVICE r2).
    floor() on exact parquet doubles is deterministic on both engines —
    no float-sum ordering hazard."""
    from ..stages.reshape import group_ranks
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False)
        key = np.where(v >= 50.0, np.floor(v), np.nan)
        rank, dense = group_ranks(key, starts, descending=True)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'value_rank': pa.array(rank),
            'value_dense_rank': pa.array(dense),
        })

    return per_conversation(ds, fn, key='user_id', order=('event_id',),
                            num_buckets=32).sort('event_id')


QUERIES['q_rank_nulls_events'] = q_rank_nulls_events
ORACLE_SQL['q_rank_nulls_events'] = """
    SELECT event_id, user_id,
           rank() OVER w       AS value_rank,
           dense_rank() OVER w AS value_dense_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CASE WHEN value >= 50.0
                               THEN floor(value) END DESC)
    ORDER BY event_id
"""


def q_window_positions_events(sf_dir: str):
    """The positional window-function family per user by value desc:
    row_number()/ntile(4) over a TOTAL order (event_id tiebreak — SQL
    leaves tie order undefined, the oracle comparison needs it pinned)
    and percent_rank()/cume_dist() over value peers. One lexsort per
    bucket (stages/reshape.py:group_positions), same single exchange as
    q_rank_events."""
    from ..stages.reshape import group_positions
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False)
        eid = tbl.column('event_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        rn, pct, cume, tile = group_positions(v, eid, starts,
                                              descending=True, tiles=4)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'rn': pa.array(rn),
            'pct_rank': pa.array(pct),
            'cume': pa.array(cume),
            'tile': pa.array(tile),
        })

    return per_conversation(ds, fn, key='user_id', order=('event_id',),
                            num_buckets=32).sort('event_id')


QUERIES['q_window_positions_events'] = q_window_positions_events
ORACLE_SQL['q_window_positions_events'] = """
    SELECT event_id, user_id,
           row_number()  OVER w2 AS rn,
           percent_rank() OVER w  AS pct_rank,
           cume_dist()    OVER w  AS cume,
           ntile(4)       OVER w2 AS tile
    FROM events
    WINDOW w  AS (PARTITION BY user_id ORDER BY value DESC),
           w2 AS (PARTITION BY user_id ORDER BY value DESC,
                  event_id ASC)
    ORDER BY event_id
"""


def q_zscore_events(sf_dir: str):
    """Per-event z-score of value within its user — group-wise
    normalization, the feature-scaling staple. ONE exchange on user_id;
    in-bucket segmented fixed-point moment sums (np.add.reduceat over
    int64 micro-units — order-independent, so mean/std are byte-stable)
    then a vectorized (v - mean)/std per row. SQL degenerates: a 1-row
    group and a zero std both yield NULL."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks()
        # avg/stddev skip NULLs (SQL): moments over non-null values
        # only; a null-value row still gets a row out, with z NULL
        v6f = _fixed6(v).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nnrow = ~np.isnan(v6f)
        v6 = np.where(nnrow, v6f, 0.0).astype(np.int64)
        # SECOND moment at 1e2 scale (CLAUDE.md): value² × 1e6 wraps
        # int64 within ~9e6 rows of one hot user, where DuckDB silently
        # promotes to int128 — 1e2 buys 1e4 more rows of headroom on
        # both engines identically
        sq = pc.multiply(pc.cast(v, pa.float64()),
                         pc.cast(v, pa.float64()))
        sq2f = _fixed2(sq).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        sq2 = np.where(nnrow, sq2f, 0.0).astype(np.int64)
        lo = np.nonzero(starts)[0]
        sizes = np.diff(np.append(lo, len(v6)))
        s1i = np.add.reduceat(v6, lo).astype(np.float64)
        s2i = np.add.reduceat(sq2, lo).astype(np.float64)
        ng = np.add.reduceat(nnrow.astype(np.int64), lo)\
            .astype(np.float64)
        s1 = s1i / 1e6
        s2 = s2i / 1e2
        with np.errstate(divide='ignore', invalid='ignore'):
            mean_g = np.floor(s1i / ng + 0.5) / 1e6
            var = np.maximum((s2 - s1 * s1 / ng) / (ng - 1), 0.0)
            std_g = np.floor(np.sqrt(var) * 1e6 + 0.5) / 1e6
        mean = np.repeat(mean_g, sizes)
        std = np.repeat(std_g, sizes)
        bad = np.repeat((ng <= 1), sizes) | (std == 0) \
            | ~np.isfinite(std) | ~nnrow
        with np.errstate(divide='ignore', invalid='ignore'):
            z = (np.where(nnrow, v.to_numpy(zero_copy_only=False), 0.0)
                 - mean) / std
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'z_value': pa.array(z, mask=bad),
        })

    return per_conversation(ds, fn, key='user_id', order=('event_id',),
                            num_buckets=32).sort('event_id')


QUERIES['q_zscore_events'] = q_zscore_events
ORACLE_SQL['q_zscore_events'] = """
    WITH m AS (
      SELECT user_id,
             sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))         AS s1i,
             -- second moment at 1e2 (CLAUDE.md): 1e6 wraps Arrow int64
             -- on a hot user while DuckDB promotes to HUGEINT
             sum(cast(floor(value * value * 1e2 + 0.5) AS BIGINT)) AS s2i,
             count(value) AS n   -- avg/stddev semantics: nulls excluded
      FROM events GROUP BY user_id),
    s AS (
      SELECT user_id,
             floor(s1i / n + 0.5) / 1e6 AS mean,
             CASE WHEN n > 1 THEN
               floor(sqrt(greatest(
                 (s2i / 1e2 - (s1i / 1e6) * (s1i / 1e6) / n) / (n - 1),
                 0.0)) * 1e6 + 0.5) / 1e6
             END AS std
      FROM m)
    SELECT e.event_id, e.user_id,
           (e.value - s.mean) / nullif(s.std, 0.0) AS z_value
    FROM events e JOIN s USING (user_id)
    ORDER BY e.event_id
"""


def q_winsorize_events(sf_dir: str):
    """Per-user outlier clipping (winsorization): clamp value into the
    user's [p10, p90]. One exchange on user_id; the bucket sorts by
    (user, value) so BOTH per-group quantiles interpolate from array
    positions with no per-group loop, quantile bounds round to 6
    decimals on both engines (the q_value_quantiles precedent), then a
    vectorized clip per row."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v = tbl.column('value').combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        lo = np.nonzero(starts)[0]
        sizes = np.diff(np.append(lo, len(v)))
        # quantile_cont skips NULLs: the bucket sort placed nulls LAST
        # within each group, so the non-null run is a prefix — quantile
        # positions index into it; null-value rows emit NULL
        nn = (~np.isnan(v)).astype(np.int64)
        nn_sizes = np.add.reduceat(nn, lo)

        def q_at(q: float) -> np.ndarray:
            n_eff = np.maximum(nn_sizes, 1)
            h = (n_eff - 1) * q
            f = np.floor(h).astype(np.int64)
            frac = h - f
            lower = v[lo + f]
            upper = v[np.minimum(lo + f + 1, lo + n_eff - 1)]
            return np.floor((lower + frac * (upper - lower)) * 1e6
                            + 0.5) / 1e6

        lo_b = np.repeat(q_at(0.10), sizes)
        hi_b = np.repeat(q_at(0.90), sizes)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'value_w': pa.array(np.minimum(np.maximum(v, lo_b), hi_b),
                                mask=np.isnan(v)),
        })

    return per_conversation(ds, fn, key='user_id', order=('value',),
                            num_buckets=32).sort('event_id')


QUERIES['q_winsorize_events'] = q_winsorize_events
ORACLE_SQL['q_winsorize_events'] = """
    WITH b AS (
      SELECT user_id,
             round(quantile_cont(value, 0.10), 6) AS lo,
             round(quantile_cont(value, 0.90), 6) AS hi
      FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id,
           -- NULL in, NULL out (DuckDB least/greatest would otherwise
           -- IGNORE the null and clip it to the lower bound)
           CASE WHEN e.value IS NOT NULL
                THEN least(greatest(e.value, b.lo), b.hi) END AS value_w
    FROM events e JOIN b USING (user_id)
    ORDER BY e.event_id
"""


def q_split_events(sf_dir: str):
    """Deterministic train/val/test assignment per event — pure int64
    multiplicative hash of the key, so the SAME rows land in the SAME
    split on every run, partitioning, and engine (the leakage-audit
    property; functions/sampling.py:hash_split). Zero shuffle — one
    vectorized map."""
    from ..functions.sampling import hash_split
    ds = _read(sf_dir, 'events', ['event_id'])
    return hash_split(ds, 'event_id', _SPLIT_FRACS).sort('event_id')


_SPLIT_FRACS = {'train': 0.8, 'val': 0.1, 'test': 0.1}

QUERIES['q_split_events'] = q_split_events


def _split_oracle() -> str:
    from ..functions.sampling import split_sql_expr
    return (
        'SELECT event_id, ' + split_sql_expr('event_id', _SPLIT_FRACS)
        + ' AS split FROM events ORDER BY event_id')


ORACLE_SQL['q_split_events'] = _split_oracle()


def q_late_events(sf_dir: str):
    """Per-user event-time WATERMARK late-row tagging over a
    deterministically disordered arrival (hash of event_id — the
    replayable stand-in for network reordering). Same semantics as the
    stateful LateRowTagger actor (stages/streaming.py), here in the
    batch-replay form: one exchange on user_id, then a SEGMENTED
    shifted running-max per user (offset-trick cummax — no per-row
    loop, no per-group loop); a row is late iff its ts is strictly
    below the user's prior max ts minus 7 days. A NULL ts carries no
    event time to watermark — excluded on both engines."""
    LATENESS_US = 7 * 24 * 3600 * 1_000_000
    from ..functions.sampling import split_buckets
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'],
               require=('ts',))

    def with_arrival(tbl: pa.Table) -> pa.Table:
        keys = tbl.column('event_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        return tbl.append_column(
            'arr', pa.array(split_buckets(keys, mod=2 ** 32)))

    ds = ds.map_batches(with_arrival, batch_format='pyarrow',
                        zero_copy_batch=True)

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        g = np.cumsum(starts) - 1
        # segmented inclusive cummax via the offset trick: adding
        # g * (range+1) makes every later group strictly dominate, so
        # one global maximum.accumulate respects group boundaries.
        # REBASE to ts.min() first: with raw epoch-µs values the
        # n_groups × span product can overflow int64 (wraps silently ->
        # garbage late flags); rebased, the bound is groups × span,
        # documented at ~4e12 group-years per bucket
        t0 = np.int64(int(ts.min()))
        tsr = ts - t0
        big = np.int64(int(tsr.max()) + 1)
        cm = np.maximum.accumulate(tsr + g * big) - g * big + t0
        prior = np.empty_like(ts)
        prior[1:] = cm[:-1]
        late = np.zeros(len(ts), dtype=bool)
        late[1:] = ts[1:] < prior[1:] - np.int64(LATENESS_US)
        late[starts] = False
        return pa.table({'event_id': tbl.column('event_id'),
                         'user_id': tbl.column('user_id'),
                         'late': pa.array(late)})

    return per_conversation(ds, fn, key='user_id',
                            order=('arr', 'event_id'),
                            num_buckets=32).sort('event_id')


QUERIES['q_late_events'] = q_late_events
ORACLE_SQL['q_late_events'] = """
    SELECT event_id, user_id,
           coalesce(epoch_us(ts) <
             max(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY ((event_id % 2147483648) * 2654435761)
                        % 4294967296, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - 604800000000, false) AS late
    FROM events WHERE ts IS NOT NULL
    ORDER BY event_id
"""


def q_stratified_events(sf_dir: str):
    """Deterministic stratified sampling: the 50 events per event_type
    with the smallest key hash (functions/sampling.py:
    stratified_sample). Physically grouped top-k — each batch prunes
    to its local per-group 50 before the one exchange — and the sample
    is a pure function of event_id, reproduced exactly by the SQL
    row_number() oracle."""
    from ..functions.sampling import stratified_sample
    ds = _read(sf_dir, 'events', ['event_id', 'event_type'])
    out = stratified_sample(ds, 'event_type', 'event_id', k=50)
    return out.sort(['event_type', 'event_id'])


QUERIES['q_stratified_events'] = q_stratified_events
ORACLE_SQL['q_stratified_events'] = """
    SELECT event_type, event_id FROM (
      SELECT event_type, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY ((event_id % 2147483648) * 2654435761)
                        % 4294967296, event_id) AS rn
      FROM events)
    WHERE rn <= 50
    ORDER BY event_type, event_id
"""


def q_melt_lineitem(sf_dir: str):
    """Wide -> long UNPIVOT of lineitem's four measures (pure map, no
    exchange; stages/reshape.py:melt)."""
    from ..stages.reshape import melt
    ds = _read(sf_dir, 'lineitem',
               ['l_orderkey', 'l_linenumber', 'l_quantity',
                'l_extendedprice', 'l_discount', 'l_tax'])
    out = melt(ds, ['l_orderkey', 'l_linenumber'],
               ['l_quantity', 'l_extendedprice', 'l_discount', 'l_tax'])

    def round6(tbl: pa.Table) -> pa.Table:
        # UNPIVOT parity: SQL omits NULL cells from the long form
        tbl = tbl.filter(pc.is_valid(tbl.column('value')))
        i = tbl.column_names.index('value')
        return tbl.set_column(i, 'value',
                              pc.round(tbl.column('value'), ndigits=6))

    return out.map_batches(round6, batch_format='pyarrow')\
        .sort(['l_orderkey', 'l_linenumber', 'variable'])


QUERIES['q_melt_lineitem'] = q_melt_lineitem
ORACLE_SQL['q_melt_lineitem'] = """
    SELECT l_orderkey, l_linenumber, variable,
           round(value, 6) AS value
    FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
                      l_extendedprice, l_discount, l_tax FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME variable VALUE value)
    ORDER BY l_orderkey, l_linenumber, variable
"""


def q_pivot_lineitem(sf_dir: str):
    """Long -> wide aggregating PIVOT: melted lineitem measures pivot
    back to one row per (orderkey, linenumber), duplicate cells summing
    exactly via fixed-point int64 (stages/reshape.py:pivot — one hash
    exchange)."""
    from ..stages.reshape import melt, pivot
    measures = ['l_quantity', 'l_extendedprice', 'l_discount', 'l_tax']
    ds = _read(sf_dir, 'lineitem',
               ['l_orderkey', 'l_linenumber'] + measures)

    def scale(tbl: pa.Table) -> pa.Table:
        cols = {'l_orderkey': tbl.column('l_orderkey'),
                'l_linenumber': tbl.column('l_linenumber')}
        for m in measures:
            cols[m] = _fixed6(tbl.column(m))
        return pa.table(cols)

    long = melt(ds.map_batches(scale, batch_format='pyarrow',
                               zero_copy_batch=True),
                ['l_orderkey', 'l_linenumber'], measures)

    def reint(tbl: pa.Table) -> pa.Table:
        # melt unifies to float64; the fixed-point values cast back exact
        i = tbl.column_names.index('value')
        return tbl.set_column(i, 'value',
                              pc.cast(tbl.column('value'), pa.int64()))

    long = long.map_batches(reint, batch_format='pyarrow')
    wide = pivot(long, ['l_orderkey', 'l_linenumber'], 'variable', 'value',
                 measures, aggfunc='sum')

    def unfix(tbl: pa.Table) -> pa.Table:
        cols = {c: tbl.column(c) for c in ('l_orderkey', 'l_linenumber')}
        for m in measures:
            cols[m] = _unfix6(tbl.column(m))
        return pa.table(cols)

    return wide.map_batches(unfix, batch_format='pyarrow')\
        .sort(['l_orderkey', 'l_linenumber'])


QUERIES['q_pivot_lineitem'] = q_pivot_lineitem
ORACLE_SQL['q_pivot_lineitem'] = """
    SELECT l_orderkey, l_linenumber,
           round(cast(sum(cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS l_quantity,
           round(cast(sum(cast(floor(l_extendedprice * 1e6 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1e6, 6)
             AS l_extendedprice,
           round(cast(sum(cast(floor(l_discount * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS l_discount,
           round(cast(sum(cast(floor(l_tax * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS l_tax
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    ORDER BY l_orderkey, l_linenumber
"""


def q_explode_embeddings(sf_dir: str):
    """UNNEST the list<float> embedding column to (vec_id, pos, val)
    rows (stages/reshape.py:explode_list). Pure map, no exchange — the
    values child flattens zero-copy and ids replicate with one take per
    column; SQL unnest semantics (empty/NULL lists emit nothing)."""
    from ..stages.reshape import explode_list
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return explode_list(ds, 'embedding', ['vec_id'])\
        .sort(['vec_id', 'pos'])


QUERIES['q_explode_embeddings'] = q_explode_embeddings
ORACLE_SQL['q_explode_embeddings'] = """
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
           unnest(embedding) AS val
    FROM embeddings
    ORDER BY vec_id, pos
"""


def q_json_props_events(sf_dir: str):
    """Vectorized JSON field extraction (functions/text.py:json_bigint —
    one RE2 pass per batch for flat integer payloads; cells with
    floats / nesting / escapes take a per-row exact mirror of DuckDB's
    yyjson + CAST semantics, differential-fuzzed in
    tests/test_json_kernel.py; divergence-envelope strings reroute per
    bigint_from_string, mirrored in the oracle by duckdb_bigint_sql)
    feeding a partial aggregation per event_type.

    The SUM is exact at any magnitude: DuckDB promotes sum(BIGINT) to
    HUGEINT while a raw Arrow int64 sum silently wraps, so k rides the
    exchange as three 21-bit limbs (h2 = k >> 42 arithmetic, then two
    masked limbs) whose int64 partial sums cannot wrap below ~2^41 rows
    per group per batch and ~2^22 partials; the final recombination is
    exact python-int arithmetic over the (tiny) per-group result, NULL
    when the true sum leaves int64 — byte-matching the oracle's
    TRY_CAST(sum(k) AS BIGINT). Only the two needed columns leave the
    read; the exchange moves a handful of partial rows per block."""
    from ..functions.text import json_bigint
    ds = _read(sf_dir, 'events', ['event_type', 'props'])

    def extract(tbl: pa.Table) -> pa.Table:
        k = json_bigint(tbl.column('props'), 'k')
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        return pa.table({
            'event_type': tbl.column('event_type'), 'k': k,
            'h2': pa.array(kv >> 42, pa.int64()),
            'h1': pa.array((kv >> 21) & 0x1FFFFF, pa.int64()),
            'l0': pa.array(kv & 0x1FFFFF, pa.int64())})

    ds = ds.map_batches(extract, batch_format='pyarrow',
                        zero_copy_batch=True)
    out = pre_aggregate(ds, ['event_type'],
                        {'n_k': ('k', 'count'),
                         's2': ('h2', 'sum'),
                         's1': ('h1', 'sum'),
                         's0': ('l0', 'sum'),
                         'max_k': ('k', 'max')})

    def finalize(tbl: pa.Table) -> pa.Table:
        sums = []
        for n, s2, s1, s0 in zip(tbl.column('n_k').to_pylist(),
                                 tbl.column('s2').to_pylist(),
                                 tbl.column('s1').to_pylist(),
                                 tbl.column('s0').to_pylist()):
            if not n:
                sums.append(None)
                continue
            total = (s2 << 42) + (s1 << 21) + s0
            sums.append(total if -(1 << 63) <= total < (1 << 63)
                        else None)
        return pa.table({'event_type': tbl.column('event_type'),
                         'n_k': tbl.column('n_k'),
                         'sum_k': pa.array(sums, pa.int64()),
                         'max_k': tbl.column('max_k')})

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort('event_type')


QUERIES['q_json_props_events'] = q_json_props_events


def _json_props_oracle() -> str:
    from ..functions.text import duckdb_bigint_sql
    return f"""
    SELECT event_type,
           count(k) AS n_k,
           TRY_CAST(sum(k) AS BIGINT) AS sum_k,
           max(k) AS max_k
    FROM (SELECT event_type,
                 {duckdb_bigint_sql('ks')} AS k
          FROM (SELECT event_type,
                       json_extract_string(props, '$.k') AS ks
                FROM events))
    GROUP BY event_type
    ORDER BY event_type
"""


ORACLE_SQL['q_json_props_events'] = _json_props_oracle()


def q_tumbling_events(sf_dir: str):
    """Tumbling 1-hour windows per user: event count + value sum
    (streaming-shaped batch windowing; stages/streaming.py). NULL-ts
    rows have no window — excluded on both engines; n_events counts
    ROWS (user_id is never null), value nulls only skip the sum."""
    from ..stages.streaming import tumbling_window
    ds = _read(sf_dir, 'events', ['user_id', 'ts', 'value'],
               require=('ts',))

    def scale(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'ts': tbl.column('ts'),
                         'value6': _fixed6(tbl.column('value'))})

    ds = ds.map_batches(scale, batch_format='pyarrow', zero_copy_batch=True)
    out = tumbling_window(ds, 'user_id', 'ts', 3_600_000_000,
                          {'n_events': ('user_id', 'count'),
                           'sum_value6': ('value6', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'n_events': tbl.column('n_events'),
                         'sum_value': _unfix6(tbl.column('sum_value6')),
                         'window_start': tbl.column('window_start')})

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort(['user_id', 'window_start'])


QUERIES['q_tumbling_events'] = q_tumbling_events
ORACLE_SQL['q_tumbling_events'] = """
    SELECT user_id,
           count(*) AS n_events,
           round(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS sum_value,
           to_timestamp((epoch_us(ts) // 3600000000) * 3600)::TIMESTAMP
             AS window_start
    FROM events WHERE ts IS NOT NULL
    GROUP BY user_id, window_start
    ORDER BY user_id, window_start
"""


def q_hopping_events(sf_dir: str):
    """Sliding 1-hour windows hopping every 30 min per user (each event
    lands in 2 windows): count + fixed-point-exact value sum
    (stages/streaming.py:hopping_window). NULL-ts rows have no
    window — excluded on both engines; n_events counts ROWS."""
    from ..stages.streaming import hopping_window
    ds = _read(sf_dir, 'events', ['user_id', 'ts', 'value'],
               require=('ts',))

    def scale(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'ts': tbl.column('ts'),
                         'value6': _fixed6(tbl.column('value'))})

    ds = ds.map_batches(scale, batch_format='pyarrow', zero_copy_batch=True)
    out = hopping_window(ds, 'user_id', 'ts', 3_600_000_000, 1_800_000_000,
                         {'n_events': ('user_id', 'count'),
                          'sum_value6': ('value6', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'n_events': tbl.column('n_events'),
                         'sum_value': _unfix6(tbl.column('sum_value6')),
                         'window_start': tbl.column('window_start')})

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort(['user_id', 'window_start'])


QUERIES['q_hopping_events'] = q_hopping_events
ORACLE_SQL['q_hopping_events'] = """
    WITH e AS (
      SELECT user_id,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS value6,
             epoch_us(ts) AS tus
      FROM events WHERE ts IS NOT NULL),
    x AS (
      SELECT user_id, value6,
             ((tus // 1800000000) - j) * 1800000000 AS ws
      FROM e, unnest([0, 1]) AS t(j))
    SELECT user_id,
           count(*) AS n_events,
           round(cast(sum(value6) AS DOUBLE) / 1e6, 6) AS sum_value,
           to_timestamp(ws // 1000000)::TIMESTAMP AS window_start
    FROM x
    GROUP BY user_id, ws
    ORDER BY user_id, window_start
"""


def q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k: 3 longest docs per language, deterministic doc_id
    tiebreak (stages/aggregate.py:grouped_topk — local per-batch prune,
    one bucket exchange of survivors)."""
    from ..stages.aggregate import grouped_topk
    ds = _read(sf_dir, 'documents', ['lang', 'doc_id', 'n_chars'])
    out = grouped_topk(ds, 'lang', 'n_chars', 3, descending=True,
                       tiebreak='doc_id')
    return out.map_batches(
        lambda t: t.select(['lang', 'doc_id', 'n_chars']),
        batch_format='pyarrow').sort(['lang', 'doc_id'])


QUERIES['q_top_docs_per_lang'] = q_top_docs_per_lang
ORACLE_SQL['q_top_docs_per_lang'] = """
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents)
    WHERE rn <= 3
    ORDER BY lang, doc_id
"""


def q_value_quantiles(sf_dir: str):
    """Exact p50/p95/p99 of event value per event type (grouped exact
    quantiles — one group exchange, vectorized percentile per group;
    stages/aggregate.py:grouped_quantiles)."""
    from ..stages.aggregate import grouped_quantiles
    ds = _read(sf_dir, 'events', ['event_type', 'value'])
    return grouped_quantiles(ds, 'event_type', 'value',
                             [0.5, 0.95, 0.99]).sort(['event_type', 'q'])


def q_hist_quantiles(sf_dir: str):
    """Approximate per-group quantiles via the mergeable histogram
    sketch (stages/sketches.py:histogram_quantiles — the 100-TB path;
    accuracy vs the exact operator asserted in
    tests/test_windows_topk.py). ORACLE-able despite being a sketch
    (r4): the sketch is a deterministic function of (lo, hi, counts) —
    fixed 4096-bin grid, trunc bin assignment, rank pick by cumulative
    count, micro-floored midpoint — every step either exact int or the
    identical IEEE expression, so DuckDB reproduces the ESTIMATE
    byte-for-byte (the estimate, not the true quantile, is the
    contract)."""
    from ..stages.sketches import histogram_quantiles
    ds = _read(sf_dir, 'events', ['event_type', 'value'])
    return histogram_quantiles(ds, 'event_type', 'value',
                               [0.5, 0.95, 0.99]).sort(['event_type', 'q'])


ORACLE_SQL['q_hist_quantiles'] = """
    WITH src AS MATERIALIZED (
      SELECT event_type, value FROM events WHERE value IS NOT NULL),
    b AS MATERIALIZED (
      SELECT event_type, min(value) AS lo, max(value) AS hi,
             count(*) AS total
      FROM src GROUP BY event_type),
    binned AS MATERIALIZED (
      SELECT s.event_type,
             least(cast(trunc((s.value - b.lo)
                   / greatest(b.hi - b.lo, 1e-300) * 4096) AS BIGINT),
                   4095) AS bin
      FROM src s
      JOIN b ON s.event_type IS NOT DISTINCT FROM b.event_type),
    counts AS MATERIALIZED (
      SELECT event_type, bin, count(*) AS c FROM binned
      GROUP BY event_type, bin),
    grid AS MATERIALIZED (
      SELECT b.event_type, g.i AS bin, b.lo, b.hi, b.total,
             coalesce(c.c, 0) AS c
      FROM b CROSS JOIN range(0, 4096) g(i)
      LEFT JOIN counts c
        ON c.event_type IS NOT DISTINCT FROM b.event_type
       AND c.bin = g.i),
    cum AS MATERIALIZED (
      SELECT event_type, bin, lo, hi, total,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
      FROM grid),
    qs AS (SELECT unnest([cast(0.5 AS DOUBLE), cast(0.95 AS DOUBLE),
                          cast(0.99 AS DOUBLE)]) AS q),
    hit AS (
      SELECT c.event_type, q.q, max(c.lo) AS lo, max(c.hi) AS hi,
             least(sum(CASE WHEN cast(c.cum AS DOUBLE)
                                 < q.q * (c.total - 1) + 1
                        THEN 1 ELSE 0 END), 4095) AS bh
      FROM cum c CROSS JOIN qs q
      GROUP BY c.event_type, q.q)
    SELECT event_type, q,
           floor((lo + (bh + cast(0.5 AS DOUBLE)) / 4096
                  * greatest(hi - lo, 1e-300)) * 1e6 + 0.5) / 1e6
             AS value
    FROM hit ORDER BY event_type, q
"""


def q_quantile_bins_events(sf_dir: str):
    """Equal-frequency discretization: per event type, bin each value by
    the type's exact quartiles (grouped_quantiles) and aggregate per
    bin. The thresholds and values are compared in int64 fixed-point
    micro-units (bin = count of thresholds strictly below v6), so the
    bin assignment is integer-exact on both engines; the tiny per-group
    threshold table is the standard broadcast small side."""
    import ray as _ray
    from ..stages.aggregate import grouped_quantiles
    # binning a NULL value (or an unkeyed row) is undefined — both
    # engines restrict to complete rows; the contract gate owns them
    ds = _read(sf_dir, 'events', ['event_type', 'value'],
               require=('event_type', 'value'))
    qt = _small_df(grouped_quantiles(ds, 'event_type', 'value',
                                     [0.25, 0.5, 0.75]),
                   ['event_type', 'q', 'value'])
    th6 = {}
    for et, g in qt.groupby('event_type'):
        th6[et] = np.sort(np.floor(
            g['value'].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64))
    th_ref = _ray.put(th6)

    class Binner:
        def __init__(self):
            self.th6 = _ray.get(th_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            v6 = _fixed6(pc.cast(tbl.column('value'), pa.float64()))\
                .to_numpy(zero_copy_only=False)
            ets = tbl.column('event_type').to_pandas()
            bins = np.zeros(len(v6), dtype=np.int64)
            for et, th in self.th6.items():
                m = (ets == et).to_numpy()
                if m.any():
                    bins[m] = np.searchsorted(th, v6[m], side='left')
            return pa.table({
                'event_type': tbl.column('event_type'),
                'bin': pa.array(bins),
                'v6': pa.array(v6, type=pa.int64()),
            })

    binned = ds.map_batches(Binner, batch_format='pyarrow',
                            concurrency=2)
    out = pre_aggregate(binned, ['event_type', 'bin'],
                        {'n_events': ('v6', 'count'),
                         'sum_value6': ('v6', 'sum')})
    return out.sort(['event_type', 'bin'])


QUERIES['q_quantile_bins_events'] = q_quantile_bins_events
ORACLE_SQL['q_quantile_bins_events'] = """
    WITH src AS (
      SELECT event_type, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    th AS (
      SELECT event_type,
             unnest(quantile_cont(value, [0.25, 0.5, 0.75])) AS t
      FROM src GROUP BY event_type),
    th6 AS (
      SELECT event_type, cast(floor(t * 1e6 + 0.5) AS BIGINT) AS t6
      FROM th),
    bins AS (
      SELECT e.event_type,
             cast(floor(e.value * 1e6 + 0.5) AS BIGINT) AS v6,
             (SELECT count(*) FROM th6 t
               WHERE t.event_type = e.event_type
                 AND t.t6 < cast(floor(e.value * 1e6 + 0.5) AS BIGINT))
               AS bin
      FROM src e)
    SELECT event_type, bin, count(*) AS n_events, sum(v6) AS sum_value6
    FROM bins GROUP BY event_type, bin
    ORDER BY event_type, bin
"""

QUERIES['q_hist_quantiles'] = q_hist_quantiles
QUERIES['q_value_quantiles'] = q_value_quantiles
ORACLE_SQL['q_value_quantiles'] = """
    SELECT event_type, q, round(value, 6) AS value FROM (
      SELECT event_type,
             unnest([0.5, 0.95, 0.99]) AS q,
             unnest(quantile_cont(value, [0.5, 0.95, 0.99])) AS value
      FROM events GROUP BY event_type)
    ORDER BY event_type, q
"""


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type — two-phase distinct
    (stages/sketches.py:exact_distinct); the HLL sketch variant is
    q_hll_distinct_users (approximate → rows-only)."""
    from ..stages.sketches import exact_distinct
    ds = _read(sf_dir, 'events', ['event_type', 'user_id'])
    return exact_distinct(ds, 'event_type', 'user_id').sort('event_type')


def q_hll_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users per event type (mergeable
    per-batch sketches, ~1.6% standard error at p=12). ORACLE-able
    (r4): the registers are a deterministic function of the DuckDB-equal
    integer hash (stages/sketches.duckdb_hash64 — differential-pinned
    against SQL hash()), rank extraction is exact bit arithmetic
    (length(bin(low52)) in SQL), the register sum is an exact HUGEINT,
    and the estimate is one shared double literal divided by that sum
    (small-range branch: libm ln on both engines), micro-floored —
    see _hll_oracle_sql. Accuracy continues to be asserted in tests."""
    from ..stages.sketches import hll_distinct
    ds = _read(sf_dir, 'events', ['event_type', 'user_id'])
    return hll_distinct(ds, 'event_type', 'user_id',
                        hash_mode='duckdb64').sort('event_type')


def _hll_oracle_sql(p: int = 12) -> str:
    """SQL twin of stages/sketches._hll_update + hll_estimate_exact6
    over hash(user_id). The numerator alpha*m^2*2^64 is embedded as the
    repr of the SAME Python expression the engine evaluates — both
    parsers are correctly-rounding, so the doubles are identical; the
    register sum is exact HUGEINT; ::DOUBLE of it is one IEEE rounding
    on both engines. rank = 53 - bitlen(low 52 bits), bitlen via
    length(bin(x)) (string-exact; float log2 would misround just below
    powers of two >= 2^48)."""
    m = 1 << p
    low_mod = 1 << (64 - p)
    num = (0.7213 / (1 + 1.079 / m)) * m * m * 2.0 ** 64
    return f"""
    WITH v AS MATERIALIZED (
      SELECT event_type, hash(user_id) AS h
      FROM events WHERE user_id IS NOT NULL),
    reg AS MATERIALIZED (
      SELECT event_type, h // {low_mod} AS idx,
             max(CASE WHEN h % {low_mod} = 0 THEN {64 - p + 1}
                 ELSE {64 - p + 1} - length(bin(h % {low_mod})) END)
               AS rank
      FROM v GROUP BY event_type, idx),
    agg AS MATERIALIZED (
      SELECT event_type,
             cast(count(*) AS BIGINT) AS present,
             sum(1::HUGEINT << (64 - rank)) AS s_present
      FROM reg GROUP BY event_type),
    est AS (
      SELECT event_type, {m} - present AS zeros,
             {num!r} /
               (s_present
                + ({m} - present) * (1::HUGEINT << 63) * 2)::DOUBLE
               AS raw
      FROM agg)
    SELECT event_type,
           cast(floor(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                           THEN {float(m)!r} * ln({float(m)!r} / zeros)
                           ELSE raw END * 1e6 + 0.5) AS BIGINT) / 1e6
             AS approx_distinct
    FROM est ORDER BY event_type
    """


QUERIES['q_distinct_users'] = q_distinct_users
QUERIES['q_hll_distinct_users'] = q_hll_distinct_users
ORACLE_SQL['q_hll_distinct_users'] = _hll_oracle_sql()
ORACLE_SQL['q_distinct_users'] = """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type ORDER BY event_type
"""


def q_session_stats(sf_dir: str):
    """Per-(user, session) rollup: event count + session duration —
    sessionize inside the bucket, then a vectorized segment reduce per
    session (two-level grouping without a second exchange). NULL-ts
    rows are excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        is_new, session_id = W.sessionize(ts_us, starts, GAP_US)
        lo = np.nonzero(is_new)[0]
        hi = np.append(lo[1:], len(ts_us)) - 1
        return pa.table({
            'user_id': pa.array(users[lo]),
            'session_id': pa.array(session_id[lo].astype(np.int64)),
            'n_events': pa.array((hi - lo + 1).astype(np.int64)),
            'duration_s': pa.array(
                np.round((ts_us[hi] - ts_us[lo]) / 1e6, 6)),
        })

    return _per_user(ds, fn).sort(['user_id', 'session_id'])


QUERIES['q_session_stats'] = q_session_stats
ORACLE_SQL['q_session_stats'] = """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM o),
    g AS (
      SELECT user_id, ts,
             cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) - 1
                  AS BIGINT) AS session_id
      FROM f)
    SELECT user_id, session_id,
           count(*) AS n_events,
           round(cast(epoch_us(max(ts) - min(ts)) AS DOUBLE) / 1e6, 6)
             AS duration_s
    FROM g GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""


def q_outer_join_users(sf_dir: str):
    """FULL OUTER partitioned hash join (stages/joins.py:hash_join
    how='outer'): per-user high-value click counts vs per-user
    high-value purchase revenue — the thresholds make both sides carry
    EXCLUSIVE users, so the outer join's null-padding on each side is
    actually exercised (and Arrow's key coalescing across sides must
    match SQL's)."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import hash_join
    ds = _read(sf_dir, 'events', ['user_id', 'event_type', 'value'])

    def side(etype, th, as_rev):
        def f(tbl: pa.Table) -> pa.Table:
            t = tbl.filter(pc.and_(
                pc.equal(tbl.column('event_type'), etype),
                pc.greater(tbl.column('value'), pa.scalar(float(th)))))
            cols = {'user_id': t.column('user_id')}
            if as_rev:
                cols['v6'] = _fixed6(pc.cast(t.column('value'),
                                             pa.float64()))
            return pa.table(cols)
        return f

    clicks = bucket_aggregate(
        ds.map_batches(side('click', 150, False),
                       batch_format='pyarrow', zero_copy_batch=True),
        ['user_id'], {'n_clicks': ('user_id', 'count')})
    purch = bucket_aggregate(
        ds.map_batches(side('purchase', 140, True),
                       batch_format='pyarrow', zero_copy_batch=True),
        ['user_id'], {'rev6': ('v6', 'sum')})
    joined = hash_join(
        clicks, purch, on='user_id', how='outer',
        left_schema=pa.schema([('user_id', pa.int64()),
                               ('n_clicks', pa.int64())]),
        right_schema=pa.schema([('user_id', pa.int64()),
                                ('rev6', pa.int64())]))

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'n_clicks': tbl.column('n_clicks'),
                         'big_purchase_rev': _unfix6(tbl.column('rev6'))})

    return joined.map_batches(finalize, batch_format='pyarrow')\
        .sort('user_id')


QUERIES['q_outer_join_users'] = q_outer_join_users
ORACLE_SQL['q_outer_join_users'] = """
    WITH c AS (
      SELECT user_id, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' AND value > 150
      GROUP BY user_id),
    p AS (
      SELECT user_id,
             round(cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1e6, 6) AS big_purchase_rev
      FROM events WHERE event_type = 'purchase' AND value > 140
      GROUP BY user_id)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           c.n_clicks, p.big_purchase_rev
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    ORDER BY user_id
"""


def q_quarantine_audit_events(sf_dir: str):
    """Quarantine analytics: run a deliberately strict contract over
    events and aggregate the REJECTION channel — (field, error code)
    counts, the lineage report a 100-TB ingest job ships alongside its
    output. The oracle re-states each field predicate in SQL with the
    reference's literal error-code strings (contracts/codes.py — the
    output contract), so the driver byte-checks the error taxonomy
    itself, not just the survivor rows."""
    import trafaret_ray.contracts as t
    from ..contracts import BatchValidator

    contract = t.Dict(
        event_id=t.Int(gte=0),
        value=t.Float(lt=300.0),
        event_type=t.Enum('click', 'view', 'purchase'),
        user_id=t.Int(lte=120))

    class Audit:
        def __init__(self):
            self.v = BatchValidator(contract)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            cres, _n = self.v.apply_table(tbl)
            fields, codes = [], []
            for errs in cres.row_errors.values():
                for f, e in errs.items():
                    fields.append(f)
                    codes.append(e.code or 'unknown')
            return pa.table({'field': pa.array(fields, pa.string()),
                             'code': pa.array(codes, pa.string())})

    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'event_type',
                                  'value'])
    out = pre_aggregate(
        ds.map_batches(Audit, batch_format='pyarrow', concurrency=2),
        ['field', 'code'], {'n_rows': ('code', 'count')})
    return out.sort(['field', 'code'])


QUERIES['q_quarantine_audit_events'] = q_quarantine_audit_events
ORACLE_SQL['q_quarantine_audit_events'] = """
    WITH errs AS (
      SELECT 'value' AS field, 'too_big' AS code
      FROM events WHERE NOT (value < 300.0)   -- NULL -> no range error
      UNION ALL
      SELECT 'event_type', 'does_not_match_any'
      FROM events WHERE event_type NOT IN ('click', 'view', 'purchase')
      UNION ALL
      SELECT 'user_id', 'too_big'
      FROM events WHERE user_id > 120
      UNION ALL
      -- null cell == absent key (contracts/record.py deviation note):
      -- a required key with a NULL cell rejects with the reference's
      -- 'required' code, not a range/enum error
      SELECT 'value', 'required' FROM events WHERE value IS NULL
      UNION ALL
      SELECT 'event_type', 'required'
      FROM events WHERE event_type IS NULL)
    SELECT field, code, count(*) AS n_rows
    FROM errs GROUP BY field, code
    ORDER BY field, code
"""


def q_struct_payload_events(sf_dir: str):
    """Dict-on-StructArray end-to-end: the events ``props`` JSON string
    parses into a nested struct payload (vectorized regex extract), a
    Dict-of-Dict contract validates it on the StructArray directly
    (contracts/record.py Dict struct path; reference Dict semantics
    base.py:1007-1221), rows failing the nested keys quarantine with
    nested error codes, and surviving payloads flatten back to columns.

    Scale: pure map stage — contract compiled once per actor, zero
    shuffle; the final sort exists only for the driver's deterministic
    compare."""
    import trafaret_ray.contracts as t
    from ..contracts import BatchValidator
    ds = _read(sf_dir, 'events',
               ['event_id', 'event_type', 'value', 'props'])

    contract = t.Dict(
        event_id=t.Int(gte=0),
        value=t.Float(lt=400),
        payload=t.Dict(
            k=t.Int(lt=80),
            event_type=t.Enum('click', 'view', 'purchase', 'signup')))

    class Gate:
        def __init__(self):
            self.v = BatchValidator(contract)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            ks = pc.struct_field(
                pc.extract_regex(tbl.column('props').combine_chunks(),
                                 r'"k": (?P<k>-?\d+)'), 'k')
            # TRY_CAST mirror: a digit run past int64 must NULL like
            # the oracle, not raise (pc.cast throws on overflow); the
            # >=19-digit slice is rare, so only it pays the safe path
            long = pc.fill_null(
                pc.greater_equal(pc.utf8_length(ks), 19), False)
            if pc.any(long).as_py():
                vals = []
                for s in ks.to_pylist():
                    if s is None:
                        vals.append(None)
                        continue
                    v = int(s)
                    vals.append(v if -(1 << 63) <= v < (1 << 63)
                                else None)
                k = pa.array(vals, pa.int64())
            else:
                k = pc.cast(ks, pa.int64())
            payload = pa.StructArray.from_arrays(
                [k, tbl.column('event_type').combine_chunks()],
                names=['k', 'event_type'])
            inp = pa.table({'event_id': tbl.column('event_id'),
                            'value': tbl.column('value'),
                            'payload': payload})
            ok, _quar = self.v.split(inp)
            pl = ok.column('payload').combine_chunks()
            return pa.table({
                'event_id': ok.column('event_id'),
                'k': pc.struct_field(pl, 'k'),
                'event_type': pc.struct_field(pl, 'event_type'),
                'value': ok.column('value')})

    return ds.map_batches(Gate, batch_format='pyarrow',
                          zero_copy_batch=True,
                          concurrency=2).sort('event_id')


QUERIES['q_struct_payload_events'] = q_struct_payload_events
ORACLE_SQL['q_struct_payload_events'] = """
    SELECT event_id,
           try_cast(regexp_extract(props, '"k": (-?\\d+)', 1)
                    AS BIGINT) AS k,
           event_type, value
    FROM events
    WHERE event_id >= 0
      AND value < 400
      AND try_cast(regexp_extract(props, '"k": (-?\\d+)', 1)
                   AS BIGINT) < 80
      AND event_type IN ('click', 'view', 'purchase', 'signup')
    ORDER BY event_id
"""


def q_partsupp_returns(sf_dir: str):
    """COMPOSITE-KEY partitioned left join: per (part, supplier) total
    shipped quantity vs returned ('R') quantity. ONE aggregation pass
    computes both sides' partials (the returned sum rides as a masked
    column plus an R-row count); the returned side is then the n_ret>0
    slice of the materialized partials — byte-identical to aggregating
    the R rows separately (groups with no R rows are ABSENT, so the
    left join pads NULL exactly as before) at half the exchanges and
    one lineitem scan instead of two. Derived-side schemas are passed
    explicitly so no derived .schema() call runs; fixed-point sums keep
    the parallel aggregation byte-stable vs the oracle."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import hash_join
    li = _read(sf_dir, 'lineitem',
               ['l_partkey', 'l_suppkey', 'l_quantity', 'l_returnflag'])

    def qty(tbl: pa.Table) -> pa.Table:
        q6 = _fixed6(tbl.column('l_quantity'))
        is_r = pc.fill_null(
            pc.equal(tbl.column('l_returnflag'), 'R'), False)
        zero = pa.scalar(0, pa.int64())
        return pa.table({'l_partkey': tbl.column('l_partkey'),
                         'l_suppkey': tbl.column('l_suppkey'),
                         'qty6': q6,
                         '_one': pa.array(np.ones(tbl.num_rows,
                                                  dtype=np.int64)),
                         'ret6': pc.if_else(is_r, q6, zero),
                         '_retn': pc.cast(is_r, pa.int64())})

    keys = ['l_partkey', 'l_suppkey']
    combined = bucket_aggregate(
        li.map_batches(qty, batch_format='pyarrow', zero_copy_batch=True),
        keys, {'qty6': ('qty6', 'sum'),
               # count(*) parity: _one is never null, qty6 CAN be
               'n_lines': ('_one', 'count'),
               'ret6': ('ret6', 'sum'),
               'n_ret': ('_retn', 'sum')},
        num_buckets=16).materialize()

    kt = dict(zip(li.schema().names, li.schema().types))
    key_schema = [(k, kt[k]) for k in keys]

    def left_side(tbl: pa.Table) -> pa.Table:
        return tbl.select(keys + ['qty6', 'n_lines'])

    def ret_side(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.greater(pc.fill_null(
            pc.cast(tbl.column('n_ret'), pa.int64()), 0), 0))
        return t.select(keys + ['ret6'])

    joined = hash_join(
        combined.map_batches(left_side, batch_format='pyarrow'),
        combined.map_batches(ret_side, batch_format='pyarrow'),
        on=keys, how='left', num_buckets=16,
        left_schema=pa.schema(key_schema + [('qty6', pa.int64()),
                                            ('n_lines', pa.int64())]),
        right_schema=pa.schema(key_schema + [('ret6', pa.int64())]))

    def finalize(tbl: pa.Table) -> pa.Table:
        qty6 = pc.cast(tbl.column('qty6'), pa.int64())
        ret6 = pc.cast(pc.fill_null(
            pc.cast(tbl.column('ret6'), pa.float64()), 0.0), pa.int64())
        return pa.table({
            'l_partkey': tbl.column('l_partkey'),
            'l_suppkey': tbl.column('l_suppkey'),
            'total_qty': _unfix6(qty6),
            'n_lines': pc.cast(tbl.column('n_lines'), pa.int64()),
            'returned_qty': _unfix6(ret6)})

    return joined.map_batches(finalize, batch_format='pyarrow')\
        .sort(['l_partkey', 'l_suppkey'])


QUERIES['q_partsupp_returns'] = q_partsupp_returns
ORACLE_SQL['q_partsupp_returns'] = """
    WITH a AS (
      SELECT l_partkey, l_suppkey,
             sum(cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS qty6,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    r AS (
      SELECT l_partkey, l_suppkey,
             sum(cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS ret6
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_partkey, l_suppkey)
    SELECT a.l_partkey, a.l_suppkey,
           round(cast(a.qty6 AS DOUBLE) / 1e6, 6)              AS total_qty,
           a.n_lines,
           round(cast(coalesce(r.ret6, 0) AS DOUBLE) / 1e6, 6) AS returned_qty
    FROM a LEFT JOIN r USING (l_partkey, l_suppkey)
    ORDER BY a.l_partkey, a.l_suppkey
"""


def q_value_bands_events(sf_dir: str):
    """Range (interval) join: band each event's value against a small
    non-overlapping banding table (stages/joins.py:range_join_broadcast
    — broadcast sorted edges, one searchsorted per batch, no shuffle),
    then aggregate per band with fixed-point sums."""
    from ..stages.joins import range_join_broadcast
    ds = _read(sf_dir, 'events', ['event_id', 'value'])
    bands = pa.table({'lo': pa.array([0.0, 50.0, 200.0]),
                      'hi': pa.array([50.0, 200.0, 500.0]),
                      'band': pa.array(['low', 'mid', 'high'])})
    joined = range_join_broadcast(ds, bands, 'value')

    def prep(tbl: pa.Table) -> pa.Table:
        return pa.table({'band': tbl.column('band'),
                         'v6': _fixed6(tbl.column('value'))})

    out = pre_aggregate(joined.map_batches(prep, batch_format='pyarrow'),
                        ['band'], {'n_events': ('v6', 'count'),
                                   'v6': ('v6', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'band': tbl.column('band'),
                         'n_events': tbl.column('n_events'),
                         'sum_value': _unfix6(tbl.column('v6'))})

    return out.map_batches(finalize, batch_format='pyarrow').sort('band')


QUERIES['q_value_bands_events'] = q_value_bands_events
ORACLE_SQL['q_value_bands_events'] = """
    SELECT b.band,
           count(*) AS n_events,
           round(cast(sum(cast(floor(e.value * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS sum_value
    FROM events e
    JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 200.0, 'mid'),
                 (200.0, 500.0, 'high')) AS b(lo, hi, band)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band ORDER BY b.band
"""


def q_session_paths_events(sf_dir: str):
    """Training-example construction: ordered per-session event-path
    strings ('click>view>...') — gap sessionization + ordered string
    concatenation as a two-level group inside ONE bucket pass (strings
    join per session; session count bounds the loop, never rows across
    sessions). Byte-matched against DuckDB's ordered string_agg: NULL
    event types are SKIPPED by string_agg (all-null session -> NULL
    path) but still count; NULL-ts rows are excluded on both
    engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        et = tbl.column('event_type').combine_chunks().to_numpy(
            zero_copy_only=False)
        is_new, session_id = W.sessionize(ts_us, starts, GAP_US)
        lo = np.nonzero(is_new)[0]
        hi = np.append(lo[1:], len(ts_us)) - 1
        # string_agg semantics: NULL elements are skipped; a session
        # with ONLY nulls aggregates to NULL (not '')
        paths = []
        for a, b in zip(lo, hi):
            parts = [x for x in et[a:b + 1] if x is not None]
            paths.append('>'.join(parts) if parts else None)
        return pa.table({
            'user_id': pa.array(users[lo]),
            'session_id': pa.array(session_id[lo].astype(np.int64)),
            'path': pa.array(paths, type=pa.string()),
            'n_events': pa.array((hi - lo + 1).astype(np.int64)),
        })

    return _per_user(ds, fn).sort(['user_id', 'session_id'])


QUERIES['q_session_paths_events'] = q_session_paths_events
ORACLE_SQL['q_session_paths_events'] = """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS is_new
      FROM o),
    g AS (
      SELECT *, cast(sum(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) - 1
                     AS BIGINT) AS session_id
      FROM f)
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           count(*) AS n_events
    FROM g GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""


def q_quality_filter_docs(sf_dir: str):
    """Quantile-gated quality filter: keep docs at or above their
    language's MEDIAN word count — exact grouped quantiles
    (stages/aggregate.grouped_quantiles) broadcast as a per-lang
    threshold, then a vectorized filter. The canonical 'drop the bottom
    half per language' curation step."""
    import ray as _ray
    from ..stages.aggregate import grouped_quantiles
    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'text'], require=('text',))

    def words(tbl: pa.Table) -> pa.Table:
        from ..functions.text import whitespace_token_count
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'lang': tbl.column('lang'),
            'n_words': pc.cast(whitespace_token_count(
                tbl.column('text').combine_chunks()), pa.int64()),
        })

    scored = ds.map_batches(words, batch_format='pyarrow',
                            zero_copy_batch=True)
    med = _small_df(grouped_quantiles(scored, 'lang', 'n_words', [0.5]),
                    ['lang', 'q', 'value'])
    med_ref = _ray.put(dict(zip(med['lang'], med['value'])))

    class Gate:
        def __init__(self):
            self.med = _ray.get(med_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            # a NULL lang never matches the oracle's JOIN on lang —
            # those docs drop here too. NOTE use_na_sentinel=False:
            # plain factorize codes None as -1 while pd.unique keeps
            # it, silently MISALIGNING every threshold after a null
            langs = tbl.column('lang').to_numpy(zero_copy_only=False)
            if not len(langs):
                return tbl
            codes, uniq = pd.factorize(langs, use_na_sentinel=False)

            def _k(u):
                return u is not None and u == u and u in self.med
            thr = np.array([self.med[u] if _k(u) else np.inf
                            for u in uniq])[codes]
            known = np.array([_k(u) for u in uniq], dtype=bool)[codes]
            nw = tbl.column('n_words').to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(known & (nw >= thr)))

    return scored.map_batches(Gate, batch_format='pyarrow',
                              concurrency=2).sort('doc_id')


QUERIES['q_quality_filter_docs'] = q_quality_filter_docs
ORACLE_SQL['q_quality_filter_docs'] = """
    WITH s AS (
      SELECT doc_id, lang,
             cast(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    m AS (SELECT lang, median(n_words) AS med FROM s GROUP BY lang)
    SELECT s.doc_id, s.lang, s.n_words
    FROM s JOIN m USING (lang)
    WHERE s.n_words >= m.med
    ORDER BY s.doc_id
"""


def q_normalized_dedup_docs(sf_dir: str):
    """Composed curation pipeline: normalize (whitespace collapse + trim
    + lowercase) THEN exact-dedup on the normalized text — catches dups
    that differ only in casing/spacing. Normalization is a zero-shuffle
    map; dedup exchanges one fingerprint partial per distinct text per
    batch (stages/dedup.py:exact_dedup discipline), never the text."""
    from ..functions.text import normalize_text
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def norm(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'text_norm': normalize_text(
                tbl.column('text').combine_chunks()),
        })

    normed = ds.map_batches(norm, batch_format='pyarrow',
                            zero_copy_batch=True)
    out = bucket_aggregate(normed, ['text_norm'],
                           {'doc_id': ('doc_id', 'min'),
                            'n_dups': ('doc_id', 'count')})
    return out.map_batches(
        lambda t: t.select(['doc_id', 'text_norm', 'n_dups']),
        batch_format='pyarrow').sort('doc_id')


QUERIES['q_normalized_dedup_docs'] = q_normalized_dedup_docs
ORACLE_SQL['q_normalized_dedup_docs'] = """
    WITH n AS (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
               AS text_norm
      FROM documents)
    SELECT min(doc_id) AS doc_id, text_norm,
           count(*) AS n_dups
    FROM n GROUP BY text_norm ORDER BY min(doc_id)
"""


def q_token_rarity_docs(sf_dir: str):
    """Corpus-statistics quality signal: per doc the mean GLOBAL count
    of its tokens and its rare-token count (global count <= 2) — the
    integer-exact stand-in for LM logprob scoring. Two passes: a
    bucket-aggregated vocabulary (one partial exchange), broadcast as an
    Arrow key array + count vector, then a zero-shuffle per-doc rollup
    (index_in + bincount). Integer sums make the result byte-stable."""
    import ray as _ray
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def explode(tbl: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
        return pa.table({'tok': words.flatten()})

    vocab = bucket_aggregate(
        ds.map_batches(explode, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['tok'], {'cnt': ('tok', 'count')})
    vocab = _small_df(vocab, ['tok', 'cnt'])
    keys = pa.array(vocab['tok'].to_numpy(), type=pa.string())
    vals = vocab['cnt'].to_numpy(dtype=np.int64)
    ref = _ray.put((keys, vals))

    class Score:
        def __init__(self):
            self.keys, self.vals = _ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            words = pc.split_pattern(
                pc.fill_null(tbl.column('text').combine_chunks(), ''),
                ' ')
            wc = pc.list_value_length(words).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = words.flatten()
            idx = pc.index_in(flat, value_set=self.keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            cnts = self.vals[idx]
            doc_of = np.repeat(np.arange(n, dtype=np.int64), wc)
            sums = np.bincount(doc_of, weights=cnts,
                               minlength=n).astype(np.int64)
            rare = np.bincount(doc_of, weights=(cnts <= 2),
                               minlength=n).astype(np.int64)
            return pa.table({
                'doc_id': tbl.column('doc_id'),
                'n_tokens': pa.array(wc),
                'mean_token_count': pa.array(np.round(
                    sums.astype(np.float64) / wc, 6)),
                'n_rare': pa.array(rare),
            })

    return ds.map_batches(Score, batch_format='pyarrow',
                          zero_copy_batch=True,
                          concurrency=2).sort('doc_id')


QUERIES['q_token_rarity_docs'] = q_token_rarity_docs
ORACLE_SQL['q_token_rarity_docs'] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(cast(sum(v.cnt) AS DOUBLE) / count(*), 6)
             AS mean_token_count,
           cast(sum(CASE WHEN v.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare
    FROM toks t JOIN vocab v USING (tok)
    GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_priority_revenue_salted(sf_dir: str):
    """q_priority_revenue through the SKEW-SALTED join
    (stages/joins.py:salted_hash_join): the most frequent orderkeys are
    treated as hot — spread over salts on the fact side, replicated per
    salt on the dim side. Salting must never change results, so this
    runs the SHARED _priority_revenue_impl body and byte-matches the
    SAME oracle as the plain join."""
    from ..stages.joins import salted_hash_join
    # deterministic 'hot' set: the first 100 orderkeys — the point is
    # exercising the salted path under the byte gate, not skew detection
    hot = list(range(1, 101))

    def join_fn(per_order, orders, left_schema):
        return salted_hash_join(per_order, orders, on='o_orderkey',
                                hot_keys=hot, num_buckets=16,
                                salt_factor=4, left_schema=left_schema)

    return _priority_revenue_impl(sf_dir, join_fn)


QUERIES['q_priority_revenue_salted'] = q_priority_revenue_salted
ORACLE_SQL['q_priority_revenue_salted'] = ORACLE_SQL['q_priority_revenue']


def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP over (l_returnflag, l_linestatus): all prefix
    levels + grand total in ONE pass — the raw input aggregates once at
    the finest level and each coarser level re-merges the previous
    level's tiny output (stages/aggregate.py:rollup_aggregate).
    grouping_id carries SQL GROUPING() so rolled-up NULLs are
    unambiguous. Fixed-point int64 sums keep every level byte-stable."""
    from ..stages.aggregate import rollup_aggregate
    ds = _read(sf_dir, 'lineitem',
               ['l_returnflag', 'l_linestatus', 'l_quantity'])

    def derive(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'l_linestatus': tbl.column('l_linestatus'),
            'qty6': _fixed6(tbl.column('l_quantity')),
        })

    ds = ds.map_batches(derive, batch_format='pyarrow',
                        zero_copy_batch=True)
    out = rollup_aggregate(ds, ['l_returnflag', 'l_linestatus'],
                           {'sum_qty6': ('qty6', 'sum'),
                            'n_items': ('qty6', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'l_linestatus': tbl.column('l_linestatus'),
            'sum_qty': _unfix6(tbl.column('sum_qty6')),
            'n_items': tbl.column('n_items'),
            'grouping_id': tbl.column('grouping_id'),
        })

    return _sort_ns(out.map_batches(finalize, batch_format='pyarrow'),
                    ['grouping_id', 'l_returnflag', 'l_linestatus'],
                    str_cols=['l_returnflag', 'l_linestatus'])


QUERIES['q_rollup_pricing'] = q_rollup_pricing
ORACLE_SQL['q_rollup_pricing'] = """
    SELECT l_returnflag, l_linestatus,
           round(cast(sum(cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e6, 6) AS sum_qty,
           count(l_quantity) AS n_items,
           grouping(l_returnflag, l_linestatus) AS grouping_id
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY grouping_id, l_returnflag, l_linestatus
"""


def q_mode_user_events(sf_dir: str):
    """Per-group MODE (most frequent value, lexicographic tiebreak) as a
    composition: partial (user, event_type) counts, then grouped top-1 —
    at most one row per (group, batch) survives to the final exchange.
    Deterministic unlike SQL mode(): ties break on the value itself,
    pinned identically in the row_number() oracle."""
    from ..stages.aggregate import bucket_aggregate, grouped_topk
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'])
    counts = bucket_aggregate(ds, ['user_id', 'event_type'],
                              {'n': ('event_type', 'count')},
                              num_buckets=16)
    top = grouped_topk(counts, 'user_id', 'n', k=1, descending=True,
                       tiebreak='event_type', num_buckets=8)
    return top.map_batches(
        lambda t: t.select(['user_id', 'event_type', 'n']),
        batch_format='pyarrow').sort('user_id')


QUERIES['q_mode_user_events'] = q_mode_user_events
ORACLE_SQL['q_mode_user_events'] = """
    SELECT user_id, event_type, n FROM (
      SELECT user_id, event_type, count(event_type) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(event_type) DESC,
                                         event_type) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    ORDER BY user_id
"""


def q_centroids_embeddings(sf_dir: str):
    """Per-label centroid of the embedding vectors: UNNEST the list
    column (zero-copy flatten) then ONE partial aggregation per
    (label, dim) — the mean of each coordinate. List-column aggregation
    as a two-operator composition; float32 coordinates widen exactly to
    float64 and sum as int64 fixed-point, so the parallel mean is
    byte-stable against the SQL unnest oracle."""
    from ..stages.reshape import explode_list
    ds = _read(sf_dir, 'embeddings', ['label', 'embedding'])
    flat = explode_list(ds, 'embedding', ['label'])

    def scale(tbl: pa.Table) -> pa.Table:
        return pa.table({'label': tbl.column('label'),
                         'pos': tbl.column('pos'),
                         'v6': _fixed6(pc.cast(tbl.column('val'),
                                               pa.float64()))})

    agged = pre_aggregate(flat.map_batches(scale, batch_format='pyarrow',
                                           zero_copy_batch=True),
                          ['label', 'pos'],
                          {'s': ('v6', 'sum'), 'n': ('v6', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        s = tbl.column('s').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        n = tbl.column('n').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        # explicit half-up in the micro-unit domain (SQL round parity)
        mean = np.floor(s / n + 0.5) / 1e6
        return pa.table({'label': tbl.column('label'),
                         'pos': tbl.column('pos'),
                         'centroid': pa.array(mean)})

    return agged.map_batches(finalize, batch_format='pyarrow')\
        .sort(['label', 'pos'])


QUERIES['q_centroids_embeddings'] = q_centroids_embeddings
ORACLE_SQL['q_centroids_embeddings'] = """
    WITH flat AS (
      SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
             cast(floor(cast(unnest(embedding) AS DOUBLE) * 1e6 + 0.5)
                  AS BIGINT) AS v6
      FROM embeddings)
    SELECT label, pos,
           floor(cast(sum(v6) AS DOUBLE) / count(v6) + 0.5) / 1e6
             AS centroid
    FROM flat GROUP BY label, pos
    ORDER BY label, pos
"""


def q_time_range_join_events(sf_dir: str):
    """LARGE x LARGE interval join (stages/joins.py:range_join_binned):
    every purchase opens a 30-minute window [ts, ts+30m) and the query
    counts ALL clicks (any user) inside it — overlapping intervals, so
    the broadcast-banding path doesn't apply. Bin width = the window
    span (explosion factor <= 2); the exact predicate filters after the
    bin-key hash join, and the high-cardinality per-purchase count
    finishes in a bucket aggregate."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import range_join_binned
    ds = _read(sf_dir, 'events', ['event_id', 'ts', 'event_type'])
    win_us = 30 * 60 * 1_000_000

    def clicks_fn(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column('event_type'), 'click'))
        us = pc.cast(pc.cast(t.column('ts'), pa.timestamp('us')),
                     pa.int64())
        return pa.table({'ts_us': us})

    def purch_fn(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column('event_type'), 'purchase'))
        us = pc.cast(pc.cast(t.column('ts'), pa.timestamp('us')),
                     pa.int64())
        return pa.table({
            'event_id': t.column('event_id'),
            'lo': us,
            'hi': pc.add(us, pa.scalar(win_us, pa.int64())),
        })

    clicks = ds.map_batches(clicks_fn, batch_format='pyarrow',
                            zero_copy_batch=True)
    purch = ds.map_batches(purch_fn, batch_format='pyarrow',
                           zero_copy_batch=True)
    eid_t = dict(zip(ds.schema().names, ds.schema().types))['event_id']
    joined = range_join_binned(
        clicks, purch, 'ts_us', bin_width=float(win_us),
        left_schema=pa.schema([('ts_us', pa.int64())]),
        right_schema=pa.schema([('event_id', eid_t),
                                ('lo', pa.int64()),
                                ('hi', pa.int64())]))
    out = bucket_aggregate(joined, ['event_id'],
                           {'n_clicks': ('ts_us', 'count')})
    return out.sort('event_id')


QUERIES['q_time_range_join_events'] = q_time_range_join_events
ORACLE_SQL['q_time_range_join_events'] = """
    WITH clicks AS (
      SELECT ts FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, count(*) AS n_clicks
    FROM purch p JOIN clicks c
      ON c.ts >= p.ts AND c.ts < p.ts + INTERVAL 30 MINUTE
    GROUP BY p.event_id
    ORDER BY p.event_id
"""


def q_nearest_centroid_embeddings(sf_dir: str):
    """Nearest-centroid classification over the embedding column: each
    vector is assigned to the closest per-label centroid (euclidean),
    output = the (true label, assigned label) confusion counts. The
    centroids are the byte-stable fixed-point means
    (q_centroids_embeddings), broadcast once; distances round to int64
    micro-units before the argmin with a label tie-break, so the
    assignment is integer-deterministic on both engines."""
    import ray as _ray
    cent = _small_df(q_centroids_embeddings(sf_dir),
                     ['label', 'pos', 'centroid'])
    if len(cent) == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            'label': pa.array([], pa.int64()),
            'assigned': pa.array([], pa.int64()),
            'n_vecs': pa.array([], pa.int64())}))
    # a NULL label is a real SQL group: the GROUP BY builds a NULL-label
    # centroid that COMPETES in the assignment, with NULLS-LAST in the
    # tie-break (ORDER BY d6, clabel). Map it to a sentinel above every
    # real label so argmin's first-minimum rule reproduces that order,
    # and map back to null on output.
    _NULL_LAB = np.int64(1) << 62
    _labf = cent['label'].to_numpy(dtype=np.float64)
    cent = cent.assign(label=np.where(
        np.isnan(_labf), np.float64(_NULL_LAB), _labf).astype(np.int64))
    labels = np.sort(cent['label'].unique())
    ndim = int(cent['pos'].max()) + 1
    C = np.zeros((len(labels), ndim))
    li = {l: i for i, l in enumerate(labels)}
    C[[li[l] for l in cent['label']],
      cent['pos'].to_numpy(np.int64)] = cent['centroid'].to_numpy()
    cref = _ray.put((labels.astype(np.int64), C))
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'label', 'embedding'])

    class Assign:
        def __init__(self):
            self.labels, self.C = _ray.get(cref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            from ..stages.ann import drop_null_vectors
            tbl = drop_null_vectors(tbl, 'embedding')
            emb = tbl.column('embedding').combine_chunks()
            n = len(emb)
            if n == 0:
                return pa.table({'label': pa.array([], pa.int64()),
                                 'assigned': pa.array([], pa.int64()),
                                 '_one': pa.array([], pa.int64())})
            X = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                           dtype=np.float64).reshape(n, -1)
            d6 = np.empty((n, len(self.labels)), dtype=np.int64)
            for j in range(len(self.labels)):
                d = np.sqrt(((X - self.C[j]) ** 2).sum(axis=1))
                d6[:, j] = np.floor(d * 1e6 + 0.5).astype(np.int64)
            # argmin returns the FIRST minimum = smallest label on ties;
            # the NULL-label sentinel sorts last (SQL NULLS LAST)
            assigned = self.labels[np.argmin(d6, axis=1)]
            a = pa.array(assigned)
            a = pc.if_else(pc.equal(a, pa.scalar(int(_NULL_LAB))),
                           pa.nulls(n, pa.int64()), a)
            return pa.table({
                'label': pc.cast(tbl.column('label'), pa.int64()),
                'assigned': a,
                # count(*) parity: never-null row marker ('count' counts
                # NON-NULL values, and label/assigned may be null groups)
                '_one': pa.array(np.ones(n, dtype=np.int64)),
            })

    out = pre_aggregate(
        ds.map_batches(Assign, batch_format='pyarrow', concurrency=2),
        ['label', 'assigned'], {'n_vecs': ('_one', 'count')})
    return out.sort(['label', 'assigned'])


QUERIES['q_nearest_centroid_embeddings'] = q_nearest_centroid_embeddings
ORACLE_SQL['q_nearest_centroid_embeddings'] = """
    WITH flat AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
             cast(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings),
    cent AS (
      SELECT label AS clabel, pos,
             floor(cast(sum(cast(floor(val * 1e6 + 0.5) AS BIGINT))
                        AS DOUBLE) / count(*) + 0.5) / 1e6 AS c
      FROM flat GROUP BY label, pos),
    dists AS (
      SELECT f.vec_id, f.label, c.clabel,
             cast(floor(sqrt(sum((f.val - c.c) * (f.val - c.c)))
                        * 1e6 + 0.5) AS BIGINT) AS d6
      FROM flat f JOIN cent c USING (pos)
      GROUP BY f.vec_id, f.label, c.clabel),
    assign AS (
      SELECT vec_id, label, clabel,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d6, clabel) AS rn
      FROM dists)
    SELECT label, clabel AS assigned, count(*) AS n_vecs
    FROM assign WHERE rn = 1
    GROUP BY label, clabel
    ORDER BY label, assigned
"""


def q_corr_lineitem(sf_dir: str):
    """Per-group Pearson correlation from mergeable fixed-point moment
    partials (n, Σx, Σy, Σx², Σy², Σxy as int64 micro-units — integer
    sums are order-independent, so the parallel aggregation is
    byte-stable; both engines then evaluate the IDENTICAL float formula
    over identical integers, with explicit floor-half-up rounding).
    int64 headroom: first moments carry 1e6 micro-units, but the
    SQUARED/product terms carry 1e2 centi-units — price² is ~1.2e10 per
    row, so 1e6 scaling would overflow int64 within ~800 rows (DuckDB
    silently promotes its sum to int128; Arrow wraps — the mismatch
    this query exists to catch)."""
    ds = _read(sf_dir, 'lineitem',
               ['l_returnflag', 'l_quantity', 'l_extendedprice'])

    def moments(tbl: pa.Table) -> pa.Table:
        x = pc.cast(tbl.column('l_quantity'), pa.float64())
        y = pc.cast(tbl.column('l_extendedprice'), pa.float64())
        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'x6': _fixed6(x), 'y6': _fixed6(y),
            'xx2': _fixed2(pc.multiply(x, x)),
            'yy2': _fixed2(pc.multiply(y, y)),
            'xy2': _fixed2(pc.multiply(x, y)),
        })

    out = pre_aggregate(ds.map_batches(moments, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['l_returnflag'],
                        {'n': ('x6', 'count'),
                         'sx': ('x6', 'sum'), 'sy': ('y6', 'sum'),
                         'sxx': ('xx2', 'sum'), 'syy': ('yy2', 'sum'),
                         'sxy': ('xy2', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        f = {c: tbl.column(c).to_numpy(zero_copy_only=False)
             .astype(np.float64) for c in
             ('n', 'sx', 'sy', 'sxx', 'syy', 'sxy')}
        n = f['n']
        sx, sy = f['sx'] / 1e6, f['sy'] / 1e6
        sxx, syy, sxy = f['sxx'] / 1e2, f['syy'] / 1e2, f['sxy'] / 1e2
        num = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        corr = np.floor(num / den * 1e6 + 0.5) / 1e6
        return pa.table({
            'l_returnflag': tbl.column('l_returnflag'),
            'n_items': pc.cast(tbl.column('n'), pa.int64()),
            'corr_qty_price': pa.array(corr),
        })

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort('l_returnflag')


def q_regression_events(sf_dir: str):
    """Per-group simple linear regression (value ~ hour-of-day) from
    mergeable moment partials — the q_corr_lineitem fixed-point
    discipline: x (hour) is an EXACT small int so Σx/Σx² are exact
    int64 sums; y carries 1e6 micro-units in its first moment and 1e2
    in the cross moment x·y (second-moment overflow scale). Both engines evaluate the identical
    slope/intercept float formula over identical integers. Moments use
    PAIRWISE-complete rows (SQL regr_* semantics: a row with a NULL x
    or y contributes to no moment) — both engines filter ts AND
    value."""
    ds = _read(sf_dir, 'events', ['event_type', 'ts', 'value'],
               require=('ts', 'value'))

    def moments(tbl: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(tbl.column('ts'), pa.timestamp('us')),
                     pa.int64()).to_numpy(zero_copy_only=False)
        x = pa.array((us // 3_600_000_000) % 24, type=pa.int64())
        val = pc.cast(tbl.column('value'), pa.float64())
        y6 = _fixed6(val)
        # CROSS moment at 1e2 (CLAUDE.md second-moment discipline):
        # x*y6 is ~2.3e10 per row, wrapping Arrow's int64 sum within
        # ~4e8 rows of one low-cardinality event_type group while
        # DuckDB promotes to HUGEINT
        y2 = _fixed2(val)
        return pa.table({
            'event_type': tbl.column('event_type'),
            'x': x, 'xx': pc.multiply(x, x),
            'y6': y6, 'xy2': pc.multiply(x, y2),
        })

    out = pre_aggregate(ds.map_batches(moments, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['event_type'],
                        {'n': ('x', 'count'), 'sx': ('x', 'sum'),
                         'sxx': ('xx', 'sum'), 'sy6': ('y6', 'sum'),
                         'sxy2': ('xy2', 'sum')})

    def finalize(tbl: pa.Table) -> pa.Table:
        f = {c: tbl.column(c).to_numpy(zero_copy_only=False)
             .astype(np.float64) for c in ('n', 'sx', 'sxx', 'sy6',
                                           'sxy2')}
        n, sx, sxx = f['n'], f['sx'], f['sxx']
        sy, sxy = f['sy6'] / 1e6, f['sxy2'] / 1e2
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = num / den
        intercept = (sy - slope * sx) / n
        return pa.table({
            'event_type': tbl.column('event_type'),
            'n_events': pc.cast(tbl.column('n'), pa.int64()),
            'slope_value_hour': pa.array(
                np.floor(slope * 1e6 + 0.5) / 1e6),
            'intercept_value': pa.array(
                np.floor(intercept * 1e6 + 0.5) / 1e6),
        })

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort('event_type')


QUERIES['q_regression_events'] = q_regression_events
ORACLE_SQL['q_regression_events'] = """
    WITH p AS (
      SELECT event_type,
             count(*) AS n,
             sum(cast(hour(ts) AS BIGINT)) AS sx,
             sum(cast(hour(ts) * hour(ts) AS BIGINT)) AS sxx,
             sum(cast(floor(value * 1e6 + 0.5) AS BIGINT)) AS sy6,
             -- cross moment at 1e2 (second-moment overflow discipline)
             sum(cast(hour(ts) AS BIGINT)
                 * cast(floor(value * 1e2 + 0.5) AS BIGINT)) AS sxy2
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY event_type)
    SELECT event_type, n AS n_events,
           floor((n * (sxy2 / 1e2) - (sx * 1.0) * (sy6 / 1e6))
                 / (n * (sxx * 1.0) - (sx * 1.0) * (sx * 1.0))
                 * 1e6 + 0.5) / 1e6 AS slope_value_hour,
           floor(((sy6 / 1e6)
                  - ((n * (sxy2 / 1e2) - (sx * 1.0) * (sy6 / 1e6))
                     / (n * (sxx * 1.0) - (sx * 1.0) * (sx * 1.0)))
                    * (sx * 1.0)) / n * 1e6 + 0.5) / 1e6
             AS intercept_value
    FROM p ORDER BY event_type
"""

QUERIES['q_corr_lineitem'] = q_corr_lineitem
ORACLE_SQL['q_corr_lineitem'] = """
    WITH p AS (
      SELECT l_returnflag,
             count(l_quantity) AS n,
             sum(cast(floor(l_quantity * 1e6 + 0.5) AS BIGINT)) AS sx,
             sum(cast(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
               AS sy,
             sum(cast(floor(l_quantity * l_quantity * 1e2 + 0.5)
                      AS BIGINT)) AS sxx,
             sum(cast(floor(l_extendedprice * l_extendedprice * 1e2
                            + 0.5) AS BIGINT)) AS syy,
             sum(cast(floor(l_quantity * l_extendedprice * 1e2 + 0.5)
                      AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n AS n_items,
           floor((n * (sxy / 1e2) - (sx / 1e6) * (sy / 1e6))
                 / (sqrt(n * (sxx / 1e2) - (sx / 1e6) * (sx / 1e6))
                    * sqrt(n * (syy / 1e2) - (sy / 1e6) * (sy / 1e6)))
                 * 1e6 + 0.5) / 1e6 AS corr_qty_price
    FROM p ORDER BY l_returnflag
"""


def q_cube_docs(sf_dir: str):
    """GROUP BY CUBE over (lang, source): all four grouping sets in one
    input pass + one re-merge execution
    (stages/aggregate.py:cube_aggregate). Character counts sum as
    exact int64 so every level is byte-stable."""
    from ..stages.aggregate import cube_aggregate
    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'source', 'text'])

    def derive(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'lang': tbl.column('lang'),
            'source': tbl.column('source'),
            'chars': pc.cast(pc.utf8_length(
                pc.fill_null(tbl.column('text'), '')), pa.int64()),
        })

    ds = ds.map_batches(derive, batch_format='pyarrow',
                        zero_copy_batch=True)
    out = cube_aggregate(ds, ['lang', 'source'],
                         {'n_docs': ('chars', 'count'),
                          'sum_chars': ('chars', 'sum')})
    return _sort_ns(out, ['grouping_id', 'lang', 'source'],
                    str_cols=['lang', 'source'])


QUERIES['q_cube_docs'] = q_cube_docs
ORACLE_SQL['q_cube_docs'] = """
    SELECT lang, source,
           count(coalesce(length(text), 0)) AS n_docs,
           sum(coalesce(length(text), 0)) AS sum_chars,
           grouping(lang, source) AS grouping_id
    FROM documents
    GROUP BY CUBE(lang, source)
    ORDER BY grouping_id, lang, source
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped 3-table chain: the tiny customer dim is read
    driver-side ONCE and its qualifying custkeys broadcast into a fused
    filter over date-pruned orders (pc.is_in per batch — the
    q_region_revenue small-dim idiom; at cluster scale the array ships
    via ray.put exactly once), and the lineitem side pre-aggregates per
    orderkey BEFORE the one large x large hash join — the exchange
    moves one int64 partial row per order, not raw lineitem rows.
    Global top-10 via sort+limit on the already-small join output."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import hash_join
    import datetime
    cut = pa.scalar(datetime.datetime(1998, 6, 1), type=pa.timestamp('us'))

    cust = _small_df(_read(sf_dir, 'customer',
                           ['c_custkey', 'c_mktsegment']),
                     ['c_custkey', 'c_mktsegment'])
    bkeys = pa.array(
        cust.loc[cust['c_mktsegment'] == 'BUILDING',
                 'c_custkey'].to_numpy(dtype=np.int64))

    orders = _read(sf_dir, 'orders',
                   ['o_orderkey', 'o_custkey', 'o_orderdate'])
    # capture the schema BEFORE the filter map: parquet metadata is
    # free, a derived .schema() forces a partial execution (CLAUDE.md)
    oschema = orders.schema()
    orders = orders.map_batches(
        lambda t: t.filter(pc.and_(
            pc.less(t.column('o_orderdate'), cut),
            pc.is_in(t.column('o_custkey'), value_set=bkeys))),
        batch_format='pyarrow', zero_copy_batch=True)

    lineitem = _read(sf_dir, 'lineitem',
                     ['l_orderkey', 'l_extendedprice', 'l_discount',
                      'l_shipdate'])

    def rev(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.greater(tbl.column('l_shipdate'), cut))
        r = pc.multiply(tbl.column('l_extendedprice'),
                        pc.subtract(pa.scalar(1.0),
                                    tbl.column('l_discount')))
        return pa.table({'o_orderkey': tbl.column('l_orderkey'),
                         'rev6': _fixed6(r)})

    lrev = lineitem.map_batches(rev, batch_format='pyarrow',
                                zero_copy_batch=True)
    per_order = bucket_aggregate(lrev, ['o_orderkey'],
                                 {'rev6': ('rev6', 'sum')},
                                 num_buckets=16)
    li = dict(zip(lineitem.schema().names, lineitem.schema().types))
    joined = hash_join(
        per_order, orders, on='o_orderkey', num_buckets=16,
        left_schema=pa.schema([('o_orderkey', li['l_orderkey']),
                               ('rev6', pa.int64())]),
        right_schema=oschema)

    def finalize(tbl: pa.Table) -> pa.Table:
        # inner-join union padding floatifies int64 partials; integer-
        # valued doubles cast back exactly
        rev6 = pc.cast(tbl.column('rev6'), pa.int64())
        return pa.table({'l_orderkey': tbl.column('o_orderkey'),
                         'revenue': _unfix6(rev6),
                         'o_orderdate': tbl.column('o_orderdate')})

    out = joined.map_batches(finalize, batch_format='pyarrow')
    from ..stages.aggregate import global_topk
    return global_topk(out, [('revenue', 'descending'),
                             ('l_orderkey', 'ascending')], 10)


QUERIES['q_shipping_priority'] = q_shipping_priority
ORACLE_SQL['q_shipping_priority'] = """
    SELECT l_orderkey,
           round(cast(sum(cast(floor(l_extendedprice * (1 - l_discount)
                                     * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6, 6) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


def q_curate_docs(sf_dir: str):
    """The end-to-end curation composition (pipelines/curation.py):
    normalize → language filter → quality gate → exact dedup →
    near-dedup keep-canonical. ORACLE-able (r4): every stage already
    has a byte-green transcription — the normalize expression is
    q_normalized_docs', the stopword-vote langid is q_langid_docs',
    exact dedup is min(id) per normalized text, and the near-dedup
    clusters are the shared DuckDB-recomputable minhash CTE block
    (_minhash_cluster_ctes) fed by the exact-unique survivors — so the
    whole composition chains into one oracle."""
    from .curation import curate_documents
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return curate_documents(ds, langs=('en', 'de', 'es'), min_words=5,
                            near_threshold=0.5, num_buckets=16,
                            hash_mode='duckdb').sort('doc_id')


def _curate_oracle_sql(rounds: int = 12) -> str:
    """SQL twin of curate_documents(langs=('en','de','es'), min_words=5,
    near_threshold=0.5, hash_mode='duckdb'): normalize + langid + word
    gate, min-id-per-text exact dedup, then the shared minhash cluster
    CTEs over the survivors; kept = survivors that are not a
    non-canonical member of a near-dup cluster."""
    return f"""
    WITH cleaned AS MATERIALIZED (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS tn
      FROM documents WHERE text IS NOT NULL),
    lid AS MATERIALIZED (
      SELECT doc_id, tn, len(string_split(tn, ' ')) AS n_words,
        len(list_filter(string_split(tn, ' '), x -> x IN
          ('das','der','die','ein','ist','mit','nicht','und','zu')))
          AS s_de,
        len(list_filter(string_split(tn, ' '), x -> x IN
          ('a','and','for','in','is','it','of','that','the','to')))
          AS s_en,
        len(list_filter(string_split(tn, ' '), x -> x IN
          ('el','en','es','la','las','los','por','que','un','una')))
          AS s_es,
        len(list_filter(string_split(tn, ' '), x -> x IN
          ('dans','est','et','la','le','les','pour','un','une')))
          AS s_fr
      FROM cleaned),
    gated AS MATERIALIZED (
      SELECT doc_id, tn,
             CASE WHEN mx = 0 THEN 'unknown'
                  WHEN s_de = mx THEN 'de'
                  WHEN s_en = mx THEN 'en'
                  WHEN s_es = mx THEN 'es'
                  ELSE 'fr' END AS lang,
             n_words
      FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr) AS mx FROM lid)
      WHERE n_words >= 5),
    kept_lang AS MATERIALIZED (
      SELECT * FROM gated WHERE lang IN ('en', 'de', 'es')),
    exact_canon AS MATERIALIZED (
      SELECT min(doc_id) AS doc_id FROM kept_lang GROUP BY tn),
    exact_unique AS MATERIALIZED (
      SELECT k.* FROM kept_lang k
      JOIN exact_canon e ON e.doc_id = k.doc_id),
    mh_src AS MATERIALIZED (
      SELECT doc_id, tn AS text FROM exact_unique),
    {_minhash_cluster_ctes(rounds)}
    SELECT e.doc_id, e.tn AS text_norm, e.lang, e.n_words
    FROM exact_unique e
    LEFT JOIN c{rounds} cl ON cl.node = e.doc_id
    WHERE cl.lab IS NULL OR cl.lab = e.doc_id
    ORDER BY e.doc_id"""


QUERIES['q_curate_docs'] = q_curate_docs
ORACLE_SQL['q_curate_docs'] = _curate_oracle_sql()


def q_list_payload_embeddings(sf_dir: str):
    """List-payload contracts end-to-end: the embeddings list<float>
    column validates through Dict + List(Float bounds, fixed length) —
    vectorized over the ListArray (contracts/record.py List.apply;
    reference List semantics base.py:788-884) — out-of-bound vectors
    quarantine, survivors emit order-independent list stats."""
    import trafaret_ray.contracts as t
    from ..contracts import BatchValidator
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'label', 'embedding'])

    contract = t.Dict(
        vec_id=t.Int(gte=0),
        label=t.Int(gte=0, lte=9),
        embedding=t.List(t.Float(gte=-0.5, lte=0.5),
                         min_length=64, max_length=64))

    class Gate:
        def __init__(self):
            self.v = BatchValidator(contract)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            ok, _q = self.v.split(tbl)
            emb = ok.column('embedding').combine_chunks()
            n = len(emb)
            if n == 0:
                return pa.table({'vec_id': pa.array([], pa.int64()),
                                 'label': pa.array([], pa.int64()),
                                 'n_dims': pa.array([], pa.int64()),
                                 'emb_min': pa.array([], pa.float64()),
                                 'emb_max': pa.array([], pa.float64())})
            flat = np.asarray(emb.flatten().to_numpy(
                zero_copy_only=False), dtype=np.float64)
            lens = pc.list_value_length(emb).to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            return pa.table({
                'vec_id': ok.column('vec_id'),
                'label': pc.cast(ok.column('label'), pa.int64()),
                'n_dims': pa.array(lens),
                'emb_min': pa.array(np.round(
                    np.minimum.reduceat(flat, offs), 6)),
                'emb_max': pa.array(np.round(
                    np.maximum.reduceat(flat, offs), 6)),
            })

    return ds.map_batches(Gate, batch_format='pyarrow',
                          zero_copy_batch=True,
                          concurrency=2).sort('vec_id')


QUERIES['q_list_payload_embeddings'] = q_list_payload_embeddings
ORACLE_SQL['q_list_payload_embeddings'] = """
    SELECT vec_id, cast(label AS BIGINT) AS label,
           cast(len(embedding) AS BIGINT) AS n_dims,
           round(cast(list_aggregate(embedding, 'min') AS DOUBLE), 6)
             AS emb_min,
           round(cast(list_aggregate(embedding, 'max') AS DOUBLE), 6)
             AS emb_max
    FROM embeddings
    WHERE vec_id >= 0 AND label BETWEEN 0 AND 9
      AND len(embedding) = 64
      AND list_aggregate(embedding, 'min') >= -0.5
      AND list_aggregate(embedding, 'max') <= 0.5
    ORDER BY vec_id
"""


def q_chunk_docs(sf_dir: str):
    """Training-example chunking: overlapping 32-token windows with
    8-token overlap per doc (functions/text.py:chunk_token_windows —
    map-only explode, zero shuffle; explosion factor chunk/stride)."""
    from ..functions.text import chunk_token_windows
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def chunks(tbl: pa.Table) -> pa.Table:
        ids = tbl.column('doc_id').to_numpy(zero_copy_only=False)
        di, ci, texts, nt = chunk_token_windows(
            tbl.column('text'), chunk=32, overlap=8)
        return pa.table({
            'doc_id': pa.array(ids[di], type=pa.int64()),
            'chunk_id': pa.array(ci),
            'chunk_text': pa.array(texts, type=pa.string()),
            'n_tokens': pa.array(nt),
        })

    return ds.map_batches(chunks, batch_format='pyarrow',
                          zero_copy_batch=True)\
        .sort(['doc_id', 'chunk_id'])


QUERIES['q_chunk_docs'] = q_chunk_docs
ORACLE_SQL['q_chunk_docs'] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    c AS (
      SELECT doc_id, ws, n, x AS chunk_id
      FROM w, unnest(range(0,
        CASE WHEN n <= 32 THEN 1
             ELSE 1 + cast(ceil((n - 32) * 1.0 / 24) AS BIGINT) END))
        t(x))
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(ws, chunk_id * 24 + 1,
                                      least(chunk_id * 24 + 32, n)), ' ')
             AS chunk_text,
           cast(least(32, n - chunk_id * 24) AS BIGINT) AS n_tokens
    FROM c ORDER BY doc_id, chunk_id
"""


def q_brand_revenue(sf_dir: str):
    """Broadcast join coverage: lineitem ⋈ part on partkey with the part
    dim broadcast once via the object store (stages/joins.py:
    broadcast_join — no shuffle for the join itself), then partial-
    aggregated revenue per brand with fixed-point sums."""
    import pyarrow.parquet as pq
    from ..stages.joins import broadcast_join
    lineitem = _read(sf_dir, 'lineitem',
                     ['l_partkey', 'l_extendedprice', 'l_discount'])

    def rev(tbl: pa.Table) -> pa.Table:
        r = pc.multiply(tbl.column('l_extendedprice'),
                        pc.subtract(pa.scalar(1.0),
                                    tbl.column('l_discount')))
        return pa.table({'p_partkey': tbl.column('l_partkey'),
                         'rev6': _fixed6(r)})

    lrev = lineitem.map_batches(rev, batch_format='pyarrow',
                                zero_copy_batch=True)
    part = pq.read_table(f'{sf_dir}/part.parquet',
                         columns=['p_partkey', 'p_brand'])
    joined = broadcast_join(lrev, part, on='p_partkey')

    # pandas merge floatifies int64 under the hood on some paths; pin it
    def reint(tbl: pa.Table) -> pa.Table:
        i = tbl.column_names.index('rev6')
        return tbl.set_column(i, 'rev6',
                              pc.cast(tbl.column('rev6'), pa.int64()))

    out = pre_aggregate(joined.map_batches(reint, batch_format='pyarrow'),
                        ['p_brand'], {'rev6': ('rev6', 'sum'),
                                      # count(*) parity: join key is
                                      # never null; rev6 CAN be
                                      'n_items': ('p_partkey', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        return pa.table({'p_brand': tbl.column('p_brand'),
                         'revenue': _unfix6(tbl.column('rev6')),
                         'n_items': tbl.column('n_items')})

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort('p_brand')


QUERIES['q_brand_revenue'] = q_brand_revenue
ORACLE_SQL['q_brand_revenue'] = """
    SELECT p_brand,
           round(cast(sum(cast(floor(l_extendedprice * (1 - l_discount)
                                     * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1e6, 6) AS revenue,
           count(*)        AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
"""


def q_cum_distinct_events(sf_dir: str):
    """Running per-user DISTINCT count: how many distinct event types the
    user has seen up to and including each event — first-occurrence flags
    via one lexsort over (user, type, ts, event_id), then a per-user
    running sum in time order. One hash exchange, segmented kernels."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        et = tbl.column('event_type').combine_chunks().to_numpy(
            zero_copy_only=False)
        codes, _ = pd.factorize(et)
        codes = codes.astype(np.int64)
        n = len(users)
        # rows arrive sorted by (user, ts, event_id); order by
        # (user, type) keeping time order within ties -> first occurrence
        # of each (user, type) = run start in that ordering
        order = np.lexsort((np.arange(n), codes, users))
        first_sorted = np.ones(n, dtype=bool)
        first_sorted[1:] = (users[order][1:] != users[order][:-1]) \
            | (codes[order][1:] != codes[order][:-1])
        first = np.empty(n, dtype=np.int64)
        first[order] = first_sorted.astype(np.int64)
        # running sum per user in the original (time) order
        c = np.cumsum(first)
        lo = np.nonzero(starts)[0]
        sizes = np.diff(np.append(lo, n))
        base = np.repeat(c[lo] - first[lo], sizes)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'n_distinct_types': pa.array(c - base),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_cum_distinct_events'] = q_cum_distinct_events
ORACLE_SQL['q_cum_distinct_events'] = """
    WITH f AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT event_id, user_id,
           cast(sum(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_distinct_types
    FROM f ORDER BY event_id
"""


def q_ewma_events(sf_dir: str, alpha: float = 0.3):
    """Per-user exponential moving average of value (adjust=False
    recursion y_i = (1-a)y_{i-1} + a x_i on VALID observations; null
    values carry the previous state unchanged — ignore_na=True) in
    (ts, event_id) order — the classic decayed-history feature. One
    hash exchange; inside each bucket pandas GroupBy.ewm runs the
    recursion in C per user.

    ORACLE-able despite the recursive form (r4): with ignore_na=True
    the pandas C kernel is BITWISE the plain recursion
    y = (1-a)*y + a*x (probed: (1-0.3)==0.7 and 0.7+0.3==1.0 exactly,
    so pandas' normalization divide is identity), and a DuckDB
    recursive CTE evaluating cast(0.7 AS DOUBLE)*y + cast(0.3 AS
    DOUBLE)*x per (user, row_number) step reproduces every double
    exactly; null-value rows re-attach via the ffill window idiom."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        df = tbl.select(['event_id', 'user_id', 'value']).to_pandas()
        ew = df.groupby('user_id', sort=False)['value']\
            .ewm(alpha=alpha, adjust=False, ignore_na=True).mean()\
            .reset_index(level=0, drop=True).to_numpy()
        # rows before a user's first valid value are NULL (not NaN) —
        # SQL has no NaN; a valid x never produces NaN
        return pa.table({
            'event_id': pa.array(df['event_id'].to_numpy()),
            'user_id': pa.array(df['user_id'].to_numpy()),
            'ewma_value': pa.array(
                np.where(np.isnan(ew), 0.0, ew), pa.float64(),
                mask=np.isnan(ew)),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_ewma_events'] = q_ewma_events
ORACLE_SQL['q_ewma_events'] = """
    WITH RECURSIVE e AS MATERIALIZED (
      SELECT event_id, user_id, ts, value FROM events
      WHERE ts IS NOT NULL),
    v AS MATERIALIZED (
      SELECT event_id, user_id, cast(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM e WHERE value IS NOT NULL),
    r AS (
      SELECT user_id, rn, event_id, x AS y FROM v WHERE rn = 1
      UNION ALL
      SELECT v.user_id, v.rn, v.event_id,
             cast(0.7 AS DOUBLE) * r.y + cast(0.3 AS DOUBLE) * v.x
      FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1)
    SELECT e.event_id, e.user_id,
           last_value(r.y IGNORE NULLS) OVER (
             PARTITION BY e.user_id ORDER BY e.ts, e.event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS ewma_value
    FROM e LEFT JOIN r ON r.event_id = e.event_id
    ORDER BY e.event_id
"""


def q_distinct_pairs_events(sf_dir: str):
    """SELECT DISTINCT over a composite key: one partial-distinct per
    batch then a hash-bucket merge (same two-phase shape as
    exact_distinct, emitting the rows themselves)."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'])
    out = bucket_aggregate(ds, ['user_id', 'event_type'],
                           {'n': ('user_id', 'count')})
    return out.map_batches(
        lambda t: t.select(['user_id', 'event_type']),
        batch_format='pyarrow').sort(['user_id', 'event_type'])


QUERIES['q_distinct_pairs_events'] = q_distinct_pairs_events
ORACLE_SQL['q_distinct_pairs_events'] = """
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
"""


def q_intersect_users_events(sf_dir: str):
    """INTERSECT: users who both clicked AND purchased — per-side
    distinct partials, then a broadcast semi join of the smaller side's
    key set (no shuffle for the intersect itself)."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import semi_join
    # both set-op sides derive from one scan: materialize the pruned
    # read so Ray doesn't re-execute it per consumer
    ds = _read(sf_dir, 'events',
               ['user_id', 'event_type']).materialize()

    def side(etype):
        def f(tbl: pa.Table) -> pa.Table:
            t = tbl.filter(pc.equal(tbl.column('event_type'), etype))
            return t.select(['user_id'])
        return f

    clicks = bucket_aggregate(
        ds.map_batches(side('click'), batch_format='pyarrow',
                       zero_copy_batch=True),
        ['user_id'], {'n': ('user_id', 'count')})
    purchases = ds.map_batches(side('purchase'), batch_format='pyarrow',
                               zero_copy_batch=True)
    # semi_join's default null-matches-null IS SQL INTERSECT semantics
    both = semi_join(
        clicks.map_batches(lambda t: t.select(['user_id']),
                           batch_format='pyarrow'),
        purchases, 'user_id')
    return _typed_result(both.sort('user_id'),
                         pa.schema([('user_id', pa.int64())]))


QUERIES['q_intersect_users_events'] = q_intersect_users_events
ORACLE_SQL['q_intersect_users_events'] = """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
"""


def q_except_langs_docs(sf_dir: str):
    """EXCEPT: languages present in source 'src0' but absent from
    'src18' — per-side distinct partials, then an anti join against the
    broadcast key set (no shuffle for the except itself)."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import anti_join
    ds = _read(sf_dir, 'documents', ['lang', 'source']).materialize()

    def side(src):
        def f(tbl: pa.Table) -> pa.Table:
            return tbl.filter(pc.equal(tbl.column('source'), src))\
                .select(['lang'])
        return f

    a = bucket_aggregate(
        ds.map_batches(side('src0'), batch_format='pyarrow',
                       zero_copy_batch=True),
        ['lang'], {'n': ('lang', 'count')})
    b = ds.map_batches(side('src18'), batch_format='pyarrow',
                       zero_copy_batch=True)
    out = anti_join(
        a.map_batches(lambda t: t.select(['lang']),
                      batch_format='pyarrow'),
        b, 'lang')
    return _typed_result(out.sort('lang'),
                         pa.schema([('lang', pa.string())]))


QUERIES['q_except_langs_docs'] = q_except_langs_docs
ORACLE_SQL['q_except_langs_docs'] = """
    SELECT DISTINCT lang FROM documents WHERE source = 'src0'
    EXCEPT
    SELECT DISTINCT lang FROM documents WHERE source = 'src18'
    ORDER BY lang
"""


def q_heavy_hitter_tokens(sf_dir: str):
    """Exact top-20 most frequent tokens via the two-pass heavy-hitters
    sketch (stages/sketches.py:heavy_hitters — truncated local
    summaries, candidate union, exact recount; the full vocabulary
    never shuffles)."""
    from ..stages.sketches import heavy_hitters
    ds = _read(sf_dir, 'documents', ['text'])

    def explode(tbl: pa.Table) -> pa.Table:
        # NO fill_null: a null doc must emit zero tokens (flatten skips
        # null list slots — matching unnest(string_split(NULL)))
        words = pc.split_pattern(tbl.column('text').combine_chunks(), ' ')
        return pa.table({'tok': words.flatten()})

    toks = ds.map_batches(explode, batch_format='pyarrow',
                          zero_copy_batch=True)
    return heavy_hitters(toks, 'tok', k=20, expansion=16)


QUERIES['q_heavy_hitter_tokens'] = q_heavy_hitter_tokens
ORACLE_SQL['q_heavy_hitter_tokens'] = """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    SELECT tok, count(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT 20
"""


def q_user_value_stats(sf_dir: str):
    """Mergeable MOMENT partials: per-user mean and sample std of value
    from fixed-point sum/sum-of-squares partials (v6 = floor(v*1e6),
    sq2 = floor(v²*1e2), the second-moment overflow scale — integer
    sums are order-independent, so the
    parallel aggregation is byte-stable; both engines then compute the
    identical float formula from identical integers). Degenerate groups
    follow SQL: n=1 → NULL std; fixed-point noise clamps at var=0."""
    ds = _read(sf_dir, 'events', ['user_id', 'value'])

    def moments(tbl: pa.Table) -> pa.Table:
        v = tbl.column('value')
        sq = pc.multiply(pc.cast(v, pa.float64()),
                         pc.cast(v, pa.float64()))
        # second moment at 1e2 (CLAUDE.md): value**2 x 1e6 wraps Arrow's
        # int64 sum on a hot user while DuckDB promotes to HUGEINT
        sq2 = _fixed2(sq)
        return pa.table({'user_id': tbl.column('user_id'),
                         'v6': _fixed6(v), 'sq2': sq2})

    out = pre_aggregate(ds.map_batches(moments, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['user_id'],
                        {'s1': ('v6', 'sum'), 's2': ('sq2', 'sum'),
                         'n': ('v6', 'count')})

    def finalize(tbl: pa.Table) -> pa.Table:
        # explicit half-up rounding in the integer micro-unit domain:
        # np.round is half-even but SQL round is half-away, and a mean
        # lands exactly on the 5e-7 boundary often enough to matter
        s1i = tbl.column('s1').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        s2 = tbl.column('s2').to_numpy(zero_copy_only=False)\
            .astype(np.float64) / 1e2
        n = tbl.column('n').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        s1 = s1i / 1e6
        mean = np.floor(s1i / n + 0.5) / 1e6
        # SQL parity on degenerate groups: n=1 divides by zero -> NULL
        # in DuckDB; fixed-point noise can make var slightly negative,
        # where DuckDB sqrt() ERRORS -- clamp at 0 on both engines
        with np.errstate(divide='ignore', invalid='ignore'):
            var = np.maximum((s2 - s1 * s1 / n) / (n - 1), 0.0)
            std = np.floor(np.sqrt(var) * 1e6 + 0.5) / 1e6
        return pa.table({
            'user_id': tbl.column('user_id'),
            'n_events': pc.cast(tbl.column('n'), pa.int64()),
            'mean_value': pa.array(mean),
            'std_value': pa.array(std, mask=(n <= 1)),
        })

    return out.map_batches(finalize, batch_format='pyarrow')\
        .sort('user_id')


QUERIES['q_user_value_stats'] = q_user_value_stats
ORACLE_SQL['q_user_value_stats'] = """
    WITH m AS (
      SELECT user_id,
             sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))          AS s1i,
             -- second moment at 1e2 (CLAUDE.md overflow discipline)
             sum(cast(floor(value * value * 1e2 + 0.5) AS BIGINT))  AS s2i,
             count(value) AS n   -- avg/stddev semantics: nulls excluded
      FROM events GROUP BY user_id)
    SELECT user_id, n AS n_events,
           floor(cast(s1i AS DOUBLE) / n + 0.5) / 1e6 AS mean_value,
           CASE WHEN n > 1 THEN
             floor(sqrt(greatest((cast(s2i AS DOUBLE) / 1e2
                       - (cast(s1i AS DOUBLE) / 1e6)
                         * (cast(s1i AS DOUBLE) / 1e6) / n)
                      / (n - 1), 0)) * 1e6 + 0.5) / 1e6
           END AS std_value
    FROM m ORDER BY user_id
"""


def q_redact_docs(sf_dir: str):
    """Safety scrubbing: email/URL/phone patterns replaced with typed
    placeholders (functions/text.py:redact_text — one RE2 pass per
    pattern, zero shuffle), plus the per-doc match count. The synthetic
    corpus carries little PII, so the strong assertions live in
    tests/test_dedup.py::TestRedaction; this query byte-checks the
    identical regex semantics against DuckDB over the full table."""
    from ..functions.text import REDACT_PATTERNS, redact_text
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def scrub(tbl: pa.Table) -> pa.Table:
        text = tbl.column('text').combine_chunks()
        # null text -> NULL count (oracle parity): accumulate in float
        # (null counts surface as NaN) and mask at the end
        valid = np.asarray(text.is_valid().to_numpy(
            zero_copy_only=False), dtype=bool)
        total = np.zeros(tbl.num_rows, dtype=np.float64)
        for pat, _repl in REDACT_PATTERNS:
            total += pc.count_substring_regex(text, pat)\
                .to_numpy(zero_copy_only=False)
        n_red = pa.array(np.where(valid, np.nan_to_num(total),
                                  0).astype(np.int64), mask=~valid)
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'text_redacted': redact_text(text),
            'n_redactions': n_red,
        })

    return ds.map_batches(scrub, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


QUERIES['q_redact_docs'] = q_redact_docs
ORACLE_SQL['q_redact_docs'] = r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\bhttps?://[^\s]+', '<URL>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS text_redacted,
           cast(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(text, '\bhttps?://[^\s]+'))
            + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
            AS BIGINT) AS n_redactions
    FROM documents ORDER BY doc_id
"""


def q_decontaminate_docs(sf_dir: str, k: int = 5):
    """Benchmark decontamination: drop every corpus doc sharing ANY
    word-k-gram with the benchmark set (docs 0-19 stand in for an
    external eval set). The benchmark's 64-bit shingle-hash set
    broadcasts once; each corpus batch explodes its own hashes
    (functions/text.py:shingle_hash_explode) and a per-doc any-overlap
    test drops contaminated docs — zero shuffle, the corpus text never
    moves. Hash-vs-string equivalence as in q_ngram_jaccard_pairs."""
    import pyarrow.parquet as pq
    import ray as _ray
    from ..functions import text as T

    # predicate pushdown: only the benchmark rows' row groups are read
    # (the docstring's 'corpus text never moves' must hold at the driver
    # too)
    bench_tbl = pq.read_table(f'{sf_dir}/documents.parquet',
                              columns=['doc_id', 'text'],
                              filters=[('doc_id', '<', 20)])
    _, _, bh = T.shingle_hash_explode(bench_tbl.column('text'), k)
    bench_ref = _ray.put(pa.array(np.unique(bh.view(np.int64)),
                                  type=pa.int64()))

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    class Decontaminate:
        def __init__(self):
            self.bench = _ray.get(bench_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            tbl = tbl.filter(pc.greater_equal(tbl.column('doc_id'), 20))
            if tbl.num_rows == 0:
                return pa.table({'doc_id': pa.array([], pa.int64())})
            _, gd, gh = T.shingle_hash_explode(tbl.column('text'), k)
            hits = pc.is_in(pa.array(gh.view(np.int64), type=pa.int64()),
                            value_set=self.bench)\
                .to_numpy(zero_copy_only=False)
            dirty = np.zeros(tbl.num_rows, dtype=bool)
            if len(gd):
                dirty = np.bincount(gd[hits.astype(bool)],
                                    minlength=tbl.num_rows) > 0
            return pa.table({'doc_id':
                             tbl.column('doc_id').filter(
                                 pa.array(~dirty))})

    return ds.map_batches(Decontaminate, batch_format='pyarrow',
                          zero_copy_batch=True,
                          concurrency=2).sort('doc_id')


QUERIES['q_decontaminate_docs'] = q_decontaminate_docs
ORACLE_SQL['q_decontaminate_docs'] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             ws[x] || ' ' || ws[x+1] || ' ' || ws[x+2] || ' '
                   || ws[x+3] || ' ' || ws[x+4] AS s
      FROM w, unnest(range(1, greatest(len(ws) - 3, 2))) AS t(x)
      WHERE ws[x+4] IS NOT NULL),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
    bad AS (SELECT DISTINCT sh.doc_id FROM sh
            JOIN bench USING (s) WHERE sh.doc_id >= 20)
    SELECT doc_id FROM documents
    WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM bad)
    ORDER BY doc_id
"""


def q_profile_events(sf_dir: str):
    """Per-column data profile over the numeric event columns
    (stages/sketches.py:profile_columns): row/null/exact-distinct
    counts + extremes from one stats pass and one distinct-partial
    exchange."""
    from ..stages.sketches import profile_columns
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])
    return profile_columns(ds, ['event_id', 'user_id', 'value'])


QUERIES['q_profile_events'] = q_profile_events
ORACLE_SQL['q_profile_events'] = """
    SELECT 'event_id' AS "column", count(*) AS n_rows,
           count(*) - count(event_id) AS n_nulls,
           count(DISTINCT event_id) AS n_distinct,
           round(cast(min(event_id) AS DOUBLE), 6) AS vmin,
           round(cast(max(event_id) AS DOUBLE), 6) AS vmax
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           round(cast(min(user_id) AS DOUBLE), 6),
           round(cast(max(user_id) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value),
           count(DISTINCT value),
           round(cast(min(value) AS DOUBLE), 6),
           round(cast(max(value) AS DOUBLE), 6)
    FROM events
    ORDER BY "column"
"""

def _nonnull_count(sf_dir: str, table: str, col: str) -> int:
    """Non-null row count of one column from parquet FOOTER stats when
    complete — "stats absent" is NOT "zero nulls" (a writer may omit
    null_count, and assuming 0 silently inflates corpus N) — with an
    exact distributed validity-count fallback."""
    import pyarrow.parquet as _pq
    md = _pq.read_metadata(f'{sf_dir}/{table}.parquet')
    nulls = 0
    complete = True
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            c = rgm.column(ci)
            if c.path_in_schema != col:
                continue
            if c.statistics is not None and c.statistics.has_null_count:
                nulls += c.statistics.null_count
            else:
                complete = False
    if complete:
        return md.num_rows - nulls
    return _read(sf_dir, table, [col], require=(col,)).count()


def _df_attach_tiered(tf, dfh, tf_schema: pa.Schema,
                      df_broadcast_max: int, hot_k: int = 4096,
                      num_buckets: int = 16):
    """Attach the vocabulary df census to a (doc_id, tok, tf) table,
    auto-tiered for scale. Returns ``(ref, ds)``:

    * vocab <= ``df_broadcast_max``: ``ref`` is a ray.put of
      (tok array, df array) for an in-bucket lookup, ``ds`` is ``tf``
      unchanged — zero extra exchange, the sf-scale default.
    * open vocab: ``ref`` is None and ``ds`` carries a ``df`` column —
      the Zipf-HEAD tokens (top ``hot_k`` by df) attach via a tiny
      broadcast lookup (a tok-keyed join would concentrate the head
      token's O(#docs) rows in one bucket), the Heaps tail attaches
      via a tok-keyed hash_join whose per-key multiplicity is bounded
      by the (hot_k+1)-th df. Both tiers produce identical rows —
      parity pinned in tests/test_seq_features.py.
    """
    import ray as _ray
    from ..stages.aggregate import global_topk
    from ..stages.joins import hash_join
    df_schema = pa.schema([('tok', pa.string()), ('df', pa.int64())])
    if dfh.count() <= df_broadcast_max:
        dfp = _small_df(dfh, ['tok', 'df'])
        ref = _ray.put((pa.array(dfp['tok'].to_numpy(), type=pa.string()),
                        dfp['df'].to_numpy(dtype=np.int64)))
        return ref, tf
    hot_df = _small_df(global_topk(dfh, [('df', 'descending'),
                                         ('tok', 'ascending')], hot_k),
                       ['tok', 'df'])
    hot_ref = _ray.put((pa.array(hot_df['tok'].to_numpy(),
                                 type=pa.string()),
                        hot_df['df'].to_numpy(dtype=np.int64)))
    out_schema = pa.schema(list(tf_schema) + [pa.field('df', pa.int64())])
    cols = [f.name for f in out_schema]

    def split(tbl: pa.Table, keep_hot: bool) -> pa.Table:
        keys, vals = _ray.get(hot_ref)
        ti = pc.index_in(tbl.column('tok'), value_set=keys)
        m = pc.is_valid(ti)
        if not keep_hot:
            return tbl.filter(pc.invert(m))
        t = tbl.filter(m)
        tv = pc.index_in(t.column('tok'), value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.append_column('df', pa.array(vals[tv])).select(cols)\
            .cast(out_schema)

    hot = tf.map_batches(lambda t: split(t, True),
                         batch_format='pyarrow', zero_copy_batch=True)
    cold = hash_join(
        tf.map_batches(lambda t: split(t, False),
                       batch_format='pyarrow', zero_copy_batch=True),
        dfh, on='tok', num_buckets=num_buckets,
        left_schema=tf_schema, right_schema=df_schema)
    cold = cold.map_batches(
        lambda t: t.select(cols).cast(out_schema),
        batch_format='pyarrow', zero_copy_batch=True)
    return None, hot.union(cold)


def q_tfidf_docs(sf_dir: str, df_broadcast_max: int = 2_000_000):
    """Per-(doc, token) TF-IDF over the corpus — the classic two-pass
    corpus statistic. One exchange builds the (doc_id, tok) term counts
    (bucket_aggregate, high-cardinality), the vocabulary document
    frequencies re-aggregate that already-collapsed table, and one
    doc-bucket exchange co-locates each doc's terms to compute doc
    length + the final score without ever touching the raw text again.
    N comes free from parquet metadata. tf/df are exact ints; tfidf
    rounds at 6 like every float column.

    AUTO-TIERED df attachment (r4): a vocabulary census up to
    ``df_broadcast_max`` rows is pulled once and ray.put-broadcast
    (one lookup per bucket, zero extra exchange); an open-vocab corpus
    above it switches to a tok-keyed hash_join — bounded worker heap
    instead of an O(vocab) driver pull (the ngram_jaccard tiering
    pattern). Both tiers compute the identical expression — parity
    pinned in tests/test_seq_features.py."""
    import ray as _ray
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    # N = docs WITH text (null-text docs are outside the corpus on both
    # engines); footer stats give it for free, exact-count fallback
    n_docs = _nonnull_count(sf_dir, 'documents', 'text')
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    tf_schema = pa.schema([('doc_id', pa.int64()), ('tok', pa.string()),
                           ('tf', pa.int64())])
    tf = bucket_aggregate(
        ds.map_batches(_tok_explode, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['doc_id', 'tok'], {'tf': ('tok', 'count')},
        num_buckets=16).materialize()

    dfh = bucket_aggregate(tf, ['tok'], {'df': ('tok', 'count')},
                           num_buckets=4).materialize()
    ref, scored_in = _df_attach_tiered(tf, dfh, tf_schema,
                                       df_broadcast_max)

    def score(tbl: pa.Table) -> pa.Table:
        dl = tbl.group_by(['doc_id']).aggregate([('tf', 'sum')])
        di = pc.index_in(tbl.column('doc_id'),
                         value_set=dl.column('doc_id'))
        doc_len = dl.column('tf_sum').take(di).to_numpy(
            zero_copy_only=False).astype(np.float64)
        if ref is not None:
            keys, dfs = _ray.get(ref)
            ti = pc.index_in(tbl.column('tok'), value_set=keys)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dfv = dfs[ti]
        else:
            dfv = tbl.column('df').to_numpy(
                zero_copy_only=False).astype(np.int64)
        tfv = tbl.column('tf').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        tfidf = np.round((tfv / doc_len) * np.log(float(n_docs) / dfv),
                         6)
        return pa.table({'doc_id': tbl.column('doc_id'),
                         'tok': tbl.column('tok'),
                         'tf': pc.cast(tbl.column('tf'), pa.int64()),
                         'df': pa.array(dfv),
                         'tfidf': pa.array(tfidf)})

    out = bucket_exchange(scored_in, 'doc_id', score, num_buckets=16)
    return out.sort(['doc_id', 'tok'])


QUERIES['q_tfidf_docs'] = q_tfidf_docs
ORACLE_SQL['q_tfidf_docs'] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    tf AS (SELECT doc_id, tok, count(tok) AS tf
           FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY doc_id),
    df AS (SELECT tok, count(tok) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents)
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           round((cast(tf.tf AS DOUBLE) / dl.doc_len)
                 * ln(cast(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN n
    ORDER BY doc_id, tok
"""

_MEDIA_PQ = '/tmp/trafaret_media_v1.parquet'
_MEDIA_MAX = 2048


def _ensure_media_parquet() -> str:
    """Deterministic seeded 24x24 P6-PPM payload table (2048 images)
    persisted once for both engines (prefix-stable draws — see
    _ensure_audio_parquet)."""
    import os
    if not os.path.exists(_MEDIA_PQ):
        import pyarrow.parquet as _pq
        from ..stages.multimodal import encode_ppm
        rng = np.random.default_rng(123)
        payloads = [encode_ppm(rng.integers(0, 256, (24, 24, 3),
                                            dtype=np.uint8))
                    for _ in range(_MEDIA_MAX)]
        tbl = pa.table({
            'media_id': pa.array(np.arange(_MEDIA_MAX, dtype=np.int64)),
            'payload': pa.array(payloads, type=pa.binary())})
        tmp = f'{_MEDIA_PQ}.tmp-{os.getpid()}'
        _pq.write_table(tbl, tmp)
        os.replace(tmp, _MEDIA_PQ)
    return _MEDIA_PQ


def q_media_embed(sf_dir: str):
    """Multimodal image path end-to-end over REAL binary payloads: the
    persisted seeded PPM corpus streams through the two actor-pool
    stages DecodeImage -> ImageEmbed (real P6 decode + nearest resize,
    model 'load' once per actor) and reduces each embedding to scalar
    features. ORACLE-able as of r5: every arithmetic step is either
    exact (uint8 pools stay below 2^24 in f32; /1024 is a power of
    two) or a single defined IEEE rounding (the explicit 3-step f32
    projection in ImageEmbed; sequential f64 chains here), and the
    oracle recomputes the whole path from hex(payload) — P6 raster at
    byte offset 13, the (o*24)//32 nearest maps, the inlined 3x64
    projection constants, and the same parenthesized chains."""
    import ray.data as rd
    import pyarrow.parquet as _pq
    from ..stages.multimodal import decode_pipeline
    n = min(int(_pq.read_metadata(
        f'{sf_dir}/documents.parquet').num_rows), _MEDIA_MAX)
    path = _ensure_media_parquet()
    ds = rd.read_parquet(path, override_num_blocks=4)\
        .filter(expr=f'media_id < {n}')
    emb = decode_pipeline(ds, concurrency=2, batch_size=128)

    def feats(t: pa.Table) -> pa.Table:
        la = t.column('embedding').combine_chunks()
        m = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                       dtype=np.float64).reshape(len(la), -1)
        sq = m[:, 0] * m[:, 0]
        acc = m[:, 0].copy()
        for j in range(1, m.shape[1]):
            sq = sq + m[:, j] * m[:, j]
            acc = acc + m[:, j]
        return pa.table({
            'media_id': t.column('media_id'),
            'dim': pa.array(np.full(len(la), m.shape[1],
                                    dtype=np.int64)),
            'norm': pa.array(
                np.floor(np.sqrt(sq) * 1e6 + 0.5) / 1e6),
            'mean': pa.array(
                np.floor(acc / m.shape[1] * 1e6 + 0.5) / 1e6),
        })

    return emb.map_batches(feats, batch_format='pyarrow')\
        .sort('media_id')


QUERIES['q_media_embed'] = q_media_embed


def _media_oracle() -> str:
    """hex(payload)-driven SQL twin of the image pipeline. The 3x64
    f32 projection matrix (ImageEmbed seed 11) is inlined as exact
    shortest-roundtrip double literals; every f32 op is mirrored as an
    exact double op + CAST AS FLOAT (double products/sums of f32
    inputs are exact at <= 48 significant bits, so the single cast IS
    the f32 rounding)."""
    path = _ensure_media_parquet()
    rng = np.random.default_rng(11)
    proj = rng.standard_normal((3, 64)).astype(np.float32)
    e_exprs = []
    for d in range(64):
        m0, m1, m2 = (repr(float(proj[c, d])) for c in range(3))
        # f32 products, f64 sums, one trailing f32 cast — mirrors
        # ImageEmbed's op sequence; native FLOAT addition is avoided
        # on BOTH engines (double-rounding ties differ between
        # implementations)
        e_exprs.append(
            f"CAST((CAST(CAST(p0 * {m0} AS FLOAT) AS DOUBLE) + "
            f"CAST(CAST(p1 * {m1} AS FLOAT) AS DOUBLE)) + "
            f"CAST(CAST(p2 * {m2} AS FLOAT) AS DOUBLE) "
            f"AS FLOAT) AS e{d}")
    sq_chain = 'CAST(e0 AS DOUBLE) * e0'
    acc_chain = 'CAST(e0 AS DOUBLE)'
    for d in range(1, 64):
        sq_chain = f'({sq_chain} + CAST(e{d} AS DOUBLE) * e{d})'
        acc_chain = f'({acc_chain} + e{d})'
    return f"""
    WITH clips AS MATERIALIZED (
      SELECT media_id, hex(payload) AS hx
      FROM read_parquet('{path}')
      WHERE media_id < least((SELECT count(*) FROM documents), 2048)),
    -- resized pixel (oy, ox) reads source ((oy*24)//32, (ox*24)//32);
    -- raster bytes start at offset 13 ('P6\\n24 24\\n255\\n')
    px AS (
      SELECT media_id, oy.range AS oy, ox.range AS ox,
             13 + 3 * (24 * ((oy.range * 24) // 32)
                       + ((ox.range * 24) // 32)) AS base
      FROM clips CROSS JOIN range(32) oy CROSS JOIN range(32) ox),
    sums AS MATERIALIZED (
      SELECT p.media_id,
             sum(CAST('0x' || substr(c.hx, 2 * p.base + 1, 2)
                      AS BIGINT)) AS s0,
             sum(CAST('0x' || substr(c.hx, 2 * (p.base + 1) + 1, 2)
                      AS BIGINT)) AS s1,
             sum(CAST('0x' || substr(c.hx, 2 * (p.base + 2) + 1, 2)
                      AS BIGINT)) AS s2
      FROM px p JOIN clips c ON c.media_id = p.media_id
      GROUP BY p.media_id),
    pooled AS MATERIALIZED (
      SELECT media_id, s0 / 1024.0 AS p0, s1 / 1024.0 AS p1,
             s2 / 1024.0 AS p2
      FROM sums),
    emb AS MATERIALIZED (
      SELECT media_id, {', '.join(e_exprs)} FROM pooled)
    SELECT media_id, CAST(64 AS BIGINT) AS dim,
           floor(sqrt({sq_chain}) * 1e6 + 0.5) / 1e6 AS norm,
           floor({acc_chain} / 64.0 * 1e6 + 0.5) / 1e6 AS mean
    FROM emb ORDER BY media_id
"""


ORACLE_SQL['q_media_embed'] = _media_oracle()


_AUDIO_PQ = '/tmp/trafaret_audio_v1.parquet'
_AUDIO_MAX = 2048


def _ensure_audio_parquet() -> str:
    """Deterministic seeded PCM-WAV payload table (2048 clips, 1600
    samples each) persisted once — both engines read it, which is what
    makes the audio codec path byte-checkable (the rng draw sequence
    is per-iteration, so any n-prefix equals an n-clip generation)."""
    import os
    if not os.path.exists(_AUDIO_PQ):
        import pyarrow.parquet as _pq
        from ..stages.multimodal import encode_wav
        rng = np.random.default_rng(321)
        t_ax = np.arange(1600, dtype=np.float64) / 16000.0
        payloads = []
        for _ in range(_AUDIO_MAX):
            freq = 100.0 + float(rng.integers(0, 400))
            amp = 0.1 + 0.8 * float(rng.random())
            payloads.append(encode_wav(amp * np.sin(
                2 * np.pi * freq * t_ax)))
        tbl = pa.table({
            'media_id': pa.array(np.arange(_AUDIO_MAX, dtype=np.int64)),
            'payload': pa.array(payloads, type=pa.binary())})
        tmp = f'{_AUDIO_PQ}.tmp-{os.getpid()}'
        _pq.write_table(tbl, tmp)
        os.replace(tmp, _AUDIO_PQ)
    return _AUDIO_PQ


def q_audio_energy(sf_dir: str):
    """Multimodal audio path: deterministic seeded PCM-WAV payloads
    (real stdlib WAV encode/decode, persisted parquet) -> AudioFeatures
    actor stage (windowed RMS) -> per-clip scalar features. ORACLE-able
    as of r5: the PCM16 RMS is sqrt(int64-sum-of-squares / n) / 32768 —
    exact-input IEEE ops the oracle recomputes from hex(payload) (raw
    little-endian int16s at byte offset 44), and the window mean uses
    an EXPLICIT sequential add chain mirrored verbatim in SQL (numpy's
    pairwise mean is order-dependent; a spelled-out chain is not)."""
    import ray.data as rd
    import pyarrow.parquet as _pq
    from ..stages.multimodal import AudioFeatures
    n = min(int(_pq.read_metadata(
        f'{sf_dir}/documents.parquet').num_rows), _AUDIO_MAX)
    path = _ensure_audio_parquet()
    ds = rd.read_parquet(path, override_num_blocks=4)\
        .filter(expr=f'media_id < {n}')
    # 0.5-CPU actors: the pool must leave CPUs for the parquet read
    # tasks or a small (4-CPU) session deadlocks
    feats = ds.map_batches(
        AudioFeatures, batch_format='pyarrow', batch_size=256,
        concurrency=2, num_cpus=0.5)

    def reduce_(t: pa.Table) -> pa.Table:
        la = t.column('energies').combine_chunks()
        m = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                       dtype=np.float64).reshape(len(la), -1)
        acc = m[:, 0].copy()
        for j in range(1, m.shape[1]):
            acc = acc + m[:, j]
        return pa.table({
            'media_id': t.column('media_id'),
            'rms_mean': pa.array(
                np.floor(acc / m.shape[1] * 1e6 + 0.5) / 1e6),
            'rms_peak': pa.array(
                np.floor(m.max(axis=1) * 1e6 + 0.5) / 1e6),
        })

    return feats.map_batches(reduce_, batch_format='pyarrow')\
        .sort('media_id')


QUERIES['q_audio_energy'] = q_audio_energy


def _audio_oracle() -> str:
    path = _ensure_audio_parquet()
    # ::DOUBLE: the engine's window-mean chain is f64 over f32-valued
    # inputs; DuckDB FLOAT + FLOAT would stay f32 and diverge
    wcols = ', '.join(
        f'CAST(max(CASE WHEN w = {j} THEN rms END) AS DOUBLE) AS w{j}'
        for j in range(16))
    chain = 'w0'
    for j in range(1, 16):
        chain = f'({chain} + w{j})'
    gl = ', '.join(f'w{j}' for j in range(16))
    return f"""
    WITH clips AS MATERIALIZED (
      SELECT media_id, hex(payload) AS hx
      FROM read_parquet('{path}')
      WHERE media_id < least((SELECT count(*) FROM documents), 2048)),
    samp AS (
      SELECT media_id, k.range AS k,
             CAST('0x' || substr(hx, 2 * (45 + 2 * k.range) + 1, 2)
                       || substr(hx, 2 * (44 + 2 * k.range) + 1, 2)
                  AS INTEGER) AS raw
      FROM clips CROSS JOIN range(1600) k),
    wr AS MATERIALIZED (
      SELECT media_id, k // 100 AS w,
             CAST(sqrt(sum(CAST(CASE WHEN raw >= 32768
                                     THEN raw - 65536 ELSE raw END
                                AS BIGINT)
                           * CASE WHEN raw >= 32768
                                  THEN raw - 65536 ELSE raw END)
                       / 100.0) / 32768.0 AS FLOAT) AS rms
      FROM samp GROUP BY media_id, k // 100),
    piv AS MATERIALIZED (
      SELECT media_id, {wcols} FROM wr GROUP BY media_id)
    SELECT media_id,
           floor({chain} / 16.0 * 1e6 + 0.5) / 1e6 AS rms_mean,
           floor(greatest({gl}) * 1e6 + 0.5) / 1e6 AS rms_peak
    FROM piv ORDER BY media_id
"""


ORACLE_SQL['q_audio_energy'] = _audio_oracle()


# ---------------------------------------------------------------------------
# training-data assembly: mixing, packing, shuffle-export
# ---------------------------------------------------------------------------

_MIX_RATES = {'src0': 1.0, 'src1': 0.75, 'src2': 0.5, 'src3': 0.25}
_MIX_DEFAULT = 0.1


def q_mix_docs(sf_dir: str):
    """Weighted corpus mixing: per-source deterministic keep rates to
    hit target training proportions (functions/sampling.py:
    weighted_mix). Pure function of (doc_id, salt) — identical mixed
    corpus on every run/partitioning/engine; zero shuffle, one
    vectorized filter map over pruned columns."""
    from ..functions.sampling import weighted_mix
    ds = _read(sf_dir, 'documents', ['doc_id', 'source'])
    return weighted_mix(ds, 'source', 'doc_id', _MIX_RATES,
                        default_rate=_MIX_DEFAULT, salt=5).sort('doc_id')


QUERIES['q_mix_docs'] = q_mix_docs


def _mix_oracle() -> str:
    from ..functions.sampling import mix_sql_expr
    return ('SELECT doc_id, source FROM documents WHERE '
            + mix_sql_expr('source', 'doc_id', _MIX_RATES,
                           default_rate=_MIX_DEFAULT, salt=5)
            + ' ORDER BY doc_id')


ORACLE_SQL['q_mix_docs'] = _mix_oracle()

_PACK_BUDGET = 256


def q_pack_docs(sf_dir: str):
    """GPT-style concat-and-chunk sequence packing: documents in doc_id
    order form one virtual token stream cut into 256-token training
    sequences; each doc reports its global token offset, spanned
    sequence ids and in-sequence offset (stages/packing.py). Physical
    shape: one RANGE exchange + per-bucket numpy cumsum + a
    num_buckets-row prefix on the driver — the global prefix sum never
    materializes the corpus anywhere."""
    import pyarrow.parquet as _pq
    from ..stages.packing import concat_chunk_pack
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def ntok(tbl: pa.Table) -> pa.Table:
        from ..functions.text import whitespace_token_count
        toks = whitespace_token_count(tbl.column('text'))
        return pa.table({'doc_id': tbl.column('doc_id'),
                         'n_tokens': pc.cast(toks, pa.int64())})

    md = _pq.ParquetFile(f'{sf_dir}/documents.parquet').metadata
    if md.num_rows == 0:    # genuinely empty input: no docs, no packing
        import ray.data as rd
        return rd.from_arrow(pa.table({
            'doc_id': pa.array([], pa.int64()),
            'n_tokens': pa.array([], pa.int64()),
            'start_tok': pa.array([], pa.int64()),
            'seq_first': pa.array([], pa.int64()),
            'seq_last': pa.array([], pa.int64()),
            'tok_offset': pa.array([], pa.int64())}))
    lo, hi = None, None
    stats_complete = True
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            c = rgm.column(ci)
            if c.path_in_schema != 'doc_id':
                continue
            s = c.statistics
            # "no stats" != "no rows": a writer may omit min/max
            # entirely or per row group (has_min_max False)
            if s is None or not s.has_min_max:
                stats_complete = False
                continue
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
    if lo is None or not stats_complete:
        # footer stats absent/partial on a NON-empty file: one pruned
        # key-column read for the true range (at 100 TB: a Ray min/max
        # aggregate over the key column, same plan)
        kcol = _pq.read_table(f'{sf_dir}/documents.parquet',
                              columns=['doc_id']).column('doc_id')
        lo, hi = pc.min(kcol).as_py(), pc.max(kcol).as_py()
    out = concat_chunk_pack(
        ds.map_batches(ntok, batch_format='pyarrow',
                       zero_copy_batch=True),
        'doc_id', 'n_tokens', _PACK_BUDGET, int(lo), int(hi),
        num_buckets=16)
    return out.sort('doc_id')


QUERIES['q_pack_docs'] = q_pack_docs
ORACLE_SQL['q_pack_docs'] = f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    c AS (
      SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS start_tok
      FROM t)
    SELECT doc_id, n_tokens, start_tok,
           start_tok // {_PACK_BUDGET}                         AS seq_first,
           (start_tok + greatest(n_tokens - 1, 0))
             // {_PACK_BUDGET}                                 AS seq_last,
           start_tok % {_PACK_BUDGET}                          AS tok_offset
    FROM c ORDER BY doc_id
"""

_SHARD_N, _SHARD_SALT, _SHARD_OSALT = 16, 7, 3


def q_shard_docs(sf_dir: str):
    """Deterministic shuffle-export layout: shard = hash(doc_id), pos =
    rank of an independent second hash inside the shard — the practical
    100-TB "global shuffle" (no random permutation; hash-sharding +
    in-shard hash order, resumable and engine-stable;
    functions/sampling.py:shard_positions). One hash exchange."""
    from ..functions.sampling import shard_positions
    ds = _read(sf_dir, 'documents', ['doc_id'])
    return shard_positions(ds, 'doc_id', _SHARD_N, salt=_SHARD_SALT,
                           order_salt=_SHARD_OSALT).sort('doc_id')


QUERIES['q_shard_docs'] = q_shard_docs
ORACLE_SQL['q_shard_docs'] = f"""
    WITH h AS (
      SELECT doc_id,
             (((doc_id + {_SHARD_SALT}) % 2147483648) * 2654435761)
               % 4294967296 % {_SHARD_N}   AS shard,
             (((doc_id + {_SHARD_OSALT}) % 2147483648) * 2654435761)
               % 4294967296                AS h2
      FROM documents)
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id)
             - 1 AS pos
    FROM h ORDER BY doc_id
"""


_BUDGET_TOKENS = 1000


def q_token_budget_docs(sf_dir: str):
    """Per-source token-budget capping: each source contributes docs in
    doc_id order only until its token budget is exhausted (the
    data-mixing step that caps any one corpus's contribution to a
    training run). One hash exchange on source; inside each bucket a
    SEGMENTED numpy cumsum (offset trick — no per-group loop) computes
    each doc's tokens-before-it, and rows with cum_before >= budget
    drop. Exact and engine-stable: token counts are the shared
    single-space-split definition."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'source', 'text'], require=('text',))

    def ntok(tbl: pa.Table) -> pa.Table:
        from ..functions.text import whitespace_token_count
        toks = whitespace_token_count(tbl.column('text'))
        return pa.table({'doc_id': tbl.column('doc_id'),
                         'source': tbl.column('source'),
                         'n_tokens': pc.cast(toks, pa.int64())})

    def cap(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        nt = tbl.column('n_tokens').combine_chunks().to_numpy(
            zero_copy_only=False)
        # segmented exclusive cumsum: global cumsum minus each group's
        # running offset at its start
        cs = np.cumsum(nt, dtype=np.int64)
        before = cs - nt
        group_base = np.zeros(len(nt), dtype=np.int64)
        group_base[starts] = before[starts]
        group_base = np.maximum.accumulate(group_base)
        cum_before = before - group_base
        keep = cum_before < _BUDGET_TOKENS
        out = pa.table({'doc_id': tbl.column('doc_id'),
                        'source': tbl.column('source'),
                        'n_tokens': tbl.column('n_tokens'),
                        'cum_before': pa.array(cum_before)})
        return out.filter(pa.array(keep))

    return per_conversation(
        ds.map_batches(ntok, batch_format='pyarrow',
                       zero_copy_batch=True),
        cap, key='source', order=('doc_id',),
        num_buckets=16).sort('doc_id')


QUERIES['q_token_budget_docs'] = q_token_budget_docs
ORACLE_SQL['q_token_budget_docs'] = f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tokens
      FROM (SELECT * FROM documents WHERE text IS NOT NULL) documents),
    c AS (
      SELECT *,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS cum_before
      FROM t)
    SELECT doc_id, source, n_tokens, cum_before
    FROM c WHERE cum_before < {_BUDGET_TOKENS}
    ORDER BY doc_id
"""


def q_editdist_pairs_docs(sf_dir: str):
    """Edit-distance near-dup pairs over documents, blocked on
    (lang, 64-char length band): pairs whose 48-codepoint text prefix is
    within byte-Levenshtein distance 16 (stages/dedup.py:editdist_pairs;
    banded-DP kernel functions/text.py:levenshtein_bytes — byte
    semantics match DuckDB levenshtein, prefix slicing matches substr).
    The reference has no distance ops; this is an engine-level
    training-data operator (near-dup verify for fuzzy dedup)."""
    from ..stages.dedup import editdist_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang', 'n_chars'],
               require=('text', 'lang', 'n_chars'))

    def band(tbl: pa.Table) -> pa.Table:
        # floor division (DuckDB // floors; pc.divide truncates toward
        # zero, which would diverge on any negative length)
        b = np.floor_divide(
            tbl.column('n_chars').combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False), 64)
        return tbl.append_column('band', pa.array(b, type=pa.int64()))

    banded = ds.map_batches(band, batch_format='pyarrow',
                            zero_copy_batch=True)
    return editdist_pairs(banded, ['lang', 'band'], num_buckets=16)\
        .sort(['doc_a', 'doc_b'])


QUERIES['q_editdist_pairs_docs'] = q_editdist_pairs_docs
ORACLE_SQL['q_editdist_pairs_docs'] = """
    WITH d AS (
      SELECT doc_id, lang, n_chars // 64 AS band,
             substr(text, 1, 48) AS pfx
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.pfx, b.pfx) AS edist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 16
    ORDER BY doc_a, doc_b
"""


def _dup_span_rows(sf_dir: str, k: int):
    """(doc_id, pos) rows for every ``k``-token span occurring >= 2 times
    corpus-wide — shared producer for q_dup_spans_docs /
    q_dup_intervals_docs. Shape: one vectorized gram explode, ONE
    gram-hash exchange with an in-bucket occurrence count."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    def grams(tbl: pa.Table) -> pa.Table:
        from ..functions.text import shingle_hash_explode
        id_t = tbl.schema.field('doc_id').type
        ids = tbl.column('doc_id').to_numpy(zero_copy_only=False)
        lengths, gd, gh = shingle_hash_explode(
            tbl.column('text'), k, distinct=False)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(gd), dtype=np.int64) - starts[gd] + 1
        return pa.table({
            'doc_id': pa.array(ids[gd], type=id_t),
            'pos': pa.array(pos, type=pa.int64()),
            # int64 view: uint64 columns break pandas/ray round-trips
            'gh': pa.array(gh.view(np.int64), type=pa.int64())})

    g = ds.map_batches(grams, batch_format='pyarrow', zero_copy_batch=True)

    def dup_only(tbl: pa.Table) -> pa.Table:
        gh = tbl.column('gh').combine_chunks().to_numpy(
            zero_copy_only=False)
        _, inv, cnt = np.unique(gh, return_inverse=True,
                                return_counts=True)
        keep = cnt[inv] >= 2
        return tbl.filter(pa.array(keep)).select(['doc_id', 'pos'])

    from ..stages.conversations import bucket_exchange
    return bucket_exchange(g, 'gh', dup_only, num_buckets=16)


def q_dup_spans_docs(sf_dir: str, k: int = 8):
    """Substring-level exact dedup (the train-data dedup op from 'Deduplicating
    Training Data Makes Language Models Better', Lee et al. 2022, public):
    every position where a ``k``-token span occurs MORE THAN ONCE corpus-wide.
    Gram explode is one vectorized pass (functions/text.py:
    shingle_hash_explode, distinct=False keeps every occurrence in
    start-token order, so the position is a segmented arange); then ONE
    hash exchange of (doc_id, pos, gram_hash) rows with an in-bucket
    occurrence count — all occurrences of a gram co-locate, no join-back
    pass. 64-bit gram hashes stand in for span equality (same documented
    collision tradeoff as q_exact_dedup_docs). Returns (doc_id, pos),
    pos = 1-based start-token index."""
    return _dup_span_rows(sf_dir, k).sort(['doc_id', 'pos'])


def _dup_interval_rows(sf_dir: str, k: int):
    """(doc_id, start_tok, end_tok, n_spans) maximal dup intervals —
    shared producer for q_dup_intervals_docs / q_dedup_cut_docs. One
    doc_id exchange over the span rows; the merge is a segmented numpy
    kernel (break where pos - prev_pos > k), no per-row Python."""
    from ..stages.conversations import per_conversation
    spans = _dup_span_rows(sf_dir, k)

    def merge(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        pos = tbl.column('pos').combine_chunks().to_numpy(
            zero_copy_only=False)
        new = starts.copy()
        # spans [p, p+k-1] and [q, q+k-1] (p < q) merge when they
        # overlap OR touch end-to-start: q - p <= k
        new[1:] |= (pos[1:] - pos[:-1]) > k
        idx = np.nonzero(new)[0]
        seg_end = np.append(idx[1:], len(pos)) - 1
        return pa.table({
            'doc_id': tbl.column('doc_id').take(pa.array(idx)),
            'start_tok': pa.array(pos[idx], type=pa.int64()),
            'end_tok': pa.array(pos[seg_end] + (k - 1), type=pa.int64()),
            'n_spans': pa.array(seg_end - idx + 1, type=pa.int64())})

    return per_conversation(spans, merge, key='doc_id', order=('pos',),
                            num_buckets=16)


def q_dup_intervals_docs(sf_dir: str, k: int = 8):
    """Interval coalescing (gaps-and-islands) over the duplicated spans:
    merge contiguous-or-overlapping k-token dup spans into maximal
    per-doc intervals [start_tok, end_tok] — the actual removal unit of
    substring dedup. Returns (doc_id, start_tok, end_tok, n_spans)."""
    return _dup_interval_rows(sf_dir, k).sort(['doc_id', 'start_tok'])


QUERIES['q_dup_spans_docs'] = q_dup_spans_docs
ORACLE_SQL['q_dup_spans_docs'] = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2)
    SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)
    ORDER BY doc_id, pos
"""


QUERIES['q_dup_intervals_docs'] = q_dup_intervals_docs
ORACLE_SQL['q_dup_intervals_docs'] = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    spans AS (SELECT doc_id, pos FROM grams
              WHERE g IN (SELECT g FROM dup)),
    brks AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM spans),
    grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS seg
      FROM brks)
    SELECT doc_id, min(pos) AS start_tok, max(pos) + 7 AS end_tok,
           count(*) AS n_spans
    FROM grp GROUP BY doc_id, seg
    ORDER BY doc_id, start_tok
"""


def q_dedup_cut_docs(sf_dir: str, k: int = 8):
    """APPLY substring dedup: rebuild each doc's text with every maximal
    duplicated interval removed — the artifact a 100-TB substring-dedup
    job actually writes. One left hash_join of documents onto the
    interval rows (co-partitioned, derived side carries an explicit
    schema per the CLAUDE.md invariant), then a doc_id exchange whose
    kernel is fully vectorized: split -> flat token offsets -> +-1 diff
    coverage mask over the interval ranges -> filtered ListArray ->
    pc.binary_join. Docs left with ZERO tokens (fully duplicated)
    disappear, matching the SQL GROUP BY over zero kept rows. Returns
    (doc_id, text_cut, n_kept)."""
    from ..stages.conversations import per_conversation
    from ..stages.joins import hash_join
    docs = _read(sf_dir, 'documents', ['doc_id', 'text'],
                 require=('text',))
    # parquet footer, NOT docs.schema(): the require filter makes docs a
    # DERIVED dataset — .schema() would force a partial execution (and
    # returns None outright on an all-empty input)
    import pyarrow.parquet as _pq
    fschema = _pq.read_schema(f'{sf_dir}/documents.parquet')
    id_t = fschema.field('doc_id').type
    iv_schema = pa.schema([('doc_id', id_t), ('start_tok', pa.int64()),
                           ('end_tok', pa.int64()),
                           ('n_spans', pa.int64())])
    joined = hash_join(docs, _dup_interval_rows(sf_dir, k),
                       on='doc_id', how='left', num_buckets=16,
                       left_schema=pa.schema(
                           [('doc_id', id_t),
                            ('text', fschema.field('text').type)]),
                       right_schema=iv_schema)

    def cut(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({'doc_id': pa.array([], type=id_t),
                             'text_cut': pa.array([], type=pa.string()),
                             'n_kept': pa.array([], type=pa.int64())})
        first = np.nonzero(starts)[0]
        fidx = pa.array(first)
        texts = tbl.column('text').combine_chunks().take(fidx)
        toks = pc.split_pattern(texts, ' ')
        wc = pc.list_value_length(toks).to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        off = np.cumsum(wc) - wc
        total = int(wc.sum())
        st = tbl.column('start_tok').combine_chunks()
        valid = pc.is_valid(st).to_numpy(zero_copy_only=False)
        doc_ord = (np.cumsum(starts) - 1)[valid]
        s = st.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        e = tbl.column('end_tok').combine_chunks()\
            .to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        # +-1 diff coverage: intervals are disjoint per doc but the mask
        # is correct under overlap too (covered where running sum > 0);
        # e <= token count, so off + e never passes the doc boundary
        delta = np.zeros(total + 1, dtype=np.int64)
        np.add.at(delta, off[doc_ord] + s - 1, 1)
        np.add.at(delta, off[doc_ord] + e, -1)
        keep = np.cumsum(delta[:total]) <= 0
        kept = np.add.reduceat(keep.astype(np.int64), off) \
            if total else np.zeros(len(wc), dtype=np.int64)
        new_off = np.zeros(len(wc) + 1, dtype=np.int32)
        new_off[1:] = np.cumsum(kept)
        lst = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()),
            toks.flatten().filter(pa.array(keep)))
        out = pa.table({
            'doc_id': tbl.column('doc_id').combine_chunks().take(fidx),
            'text_cut': pc.binary_join(lst, ' '),
            'n_kept': pa.array(kept, type=pa.int64())})
        return out.filter(pa.array(kept > 0))

    return per_conversation(joined, cut, key='doc_id',
                            order=('start_tok',), num_buckets=16,
                            ).sort('doc_id')


QUERIES['q_dedup_cut_docs'] = q_dedup_cut_docs
ORACLE_SQL['q_dedup_cut_docs'] = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)),
    dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    spans AS (SELECT doc_id, pos FROM grams
              WHERE g IN (SELECT g FROM dup)),
    brks AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM spans),
    grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS seg
      FROM brks),
    intervals AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM grp GROUP BY doc_id, seg),
    tok_rows AS (
      SELECT doc_id, i, t[i] AS w
      FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
    kept AS (
      SELECT r.doc_id, r.i, r.w FROM tok_rows r
      WHERE NOT EXISTS (SELECT 1 FROM intervals v
                        WHERE v.doc_id = r.doc_id
                          AND r.i BETWEEN v.s AND v.e))
    SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text_cut,
           count(*)::BIGINT AS n_kept
    FROM kept GROUP BY doc_id
    ORDER BY doc_id
"""


def q_theta_users_overlap(sf_dir: str):
    """KMV / theta-sketch set operations: approximate distinct click
    users, purchase users, their union and their INTERSECTION — the
    estimate an HLL cannot form. Exact twin: q_intersect_users_events.
    One 8-KB partial per batch, one single-group merge
    (stages/sketches.py:theta_set_ops).

    ORACLE-able (r4): with the DuckDB-equal integer hash the bottom-k
    sketch is ``SELECT DISTINCT hash(id) ORDER BY h LIMIT k`` verbatim
    (per-batch bottom-k + merge == global bottom-k of distinct hashes
    — bottom-k is a distributive aggregate), the below-capacity branch
    is an exact count, and the at-capacity branch is the single IEEE
    expression (k-1)/(h_k/2^64) mirrored structurally in SQL
    (_theta_oracle_sql). Accuracy stays property-tested."""
    from ..stages.sketches import theta_set_ops
    ds = _read(sf_dir, 'events', ['user_id', 'event_type']).materialize()

    def side(etype):
        def f(tbl: pa.Table) -> pa.Table:
            return tbl.filter(pc.equal(tbl.column('event_type'), etype))\
                .select(['user_id'])
        return f

    a = ds.map_batches(side('click'), batch_format='pyarrow',
                       zero_copy_batch=True)
    b = ds.map_batches(side('purchase'), batch_format='pyarrow',
                       zero_copy_batch=True)
    return theta_set_ops(a, b, 'user_id', hash_mode='duckdb64')


def _theta_oracle_sql(k: int = 4096) -> str:
    """SQL twin of stages/sketches.theta_set_ops (duckdb64 hash mode).
    All counts are exact ints; the only float ops are int->double
    conversions, one division per estimate, and the final jac*est_u
    product — each mirrored in the engine's evaluation order."""
    scale = repr(float(1 << 64))
    est = (f"CASE WHEN n{{s}} < {k} THEN CAST(n{{s}} AS DOUBLE) "
           f"WHEN h{{s}} > 0 THEN {float(k - 1)!r} "
           f"/ (h{{s}}::DOUBLE / {scale}) "
           f"ELSE {float(k)!r} END")
    return f"""
    WITH a AS MATERIALIZED (
      SELECT DISTINCT hash(user_id) AS h FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL
      ORDER BY h LIMIT {k}),
    b AS MATERIALIZED (
      SELECT DISTINCT hash(user_id) AS h FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
      ORDER BY h LIMIT {k}),
    u AS MATERIALIZED (
      SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
      ORDER BY h LIMIT {k}),
    stats AS (
      SELECT (SELECT count(*) FROM a) AS na, (SELECT max(h) FROM a) AS ha,
             (SELECT count(*) FROM b) AS nb, (SELECT max(h) FROM b) AS hb,
             (SELECT count(*) FROM u) AS nu, (SELECT max(h) FROM u) AS hu,
             (SELECT count(*) FROM u
              WHERE h IN (SELECT h FROM a)
                AND h IN (SELECT h FROM b)) AS nboth),
    est AS (
      SELECT nu, nboth,
             {est.format(s='a')} AS approx_a,
             {est.format(s='b')} AS approx_b,
             {est.format(s='u')} AS approx_union
      FROM stats)
    SELECT approx_a, approx_b, approx_union,
           (CASE WHEN nu = 0 THEN 0.0
                 ELSE CAST(nboth AS DOUBLE) / nu END) * approx_union
             AS approx_intersection
    FROM est
    """


QUERIES['q_theta_users_overlap'] = q_theta_users_overlap
ORACLE_SQL['q_theta_users_overlap'] = _theta_oracle_sql()


def _urgent_custkeys(sf_dir: str):
    """Key side shared by the semi/anti join queries: custkeys holding
    at least one URGENT order. Null ``o_custkey`` rows are dropped at
    the source — SQL ``EXISTS (… o_custkey = c_custkey)`` can never
    match them, and a null key would also floatify the int64 batch on
    its way into the Bloom hasher (CLAUDE.md landmine)."""
    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_orderpriority'])

    def urgent(tbl: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(pc.fill_null(tbl.column('o_orderpriority'),
                                          ''), '1-URGENT'),
                    pc.is_valid(tbl.column('o_custkey')))
        return pa.table({'c_custkey': tbl.filter(m).column('o_custkey')})

    return orders.map_batches(urgent, batch_format='pyarrow',
                              zero_copy_batch=True)


def q_semi_join_customers(sf_dir: str):
    """EXISTS semi join, scale shape: a distributed Bloom prefilter
    (stages/joins.py:bloom_build — per-batch bitmap partials, tree-OR
    via a shard groupby, driver assembles ONE m_bits/8 buffer) cuts the
    probe side without broadcasting the key set, then the exact
    broadcast ``semi_join`` (SQL IN semantics, match_nulls=False)
    removes the Bloom's false positives. At 100 TB the Bloom pass is
    what keeps a too-large-to-broadcast key side from forcing a full
    hash-join exchange; the exact pass runs over the surviving
    fraction only. Reference semantics: filtering is the row-level
    analogue of trafaret's Dict key gating (reference base.py:1007) —
    here the predicate is membership, not shape."""
    from ..stages.joins import semi_join, semi_join_bloom
    cust = _read(sf_dir, 'customer', ['c_custkey', 'c_name', 'c_acctbal'])
    # the key side feeds TWO consumers (bloom_build + the exact key
    # pull) — materialize the tiny projected key set once so the
    # orders read+filter doesn't re-derive per consumer (spillable;
    # at 100 TB the key side would checkpoint to parquet instead)
    keys = _urgent_custkeys(sf_dir).materialize()
    pre = semi_join_bloom(cust, keys, on='c_custkey', m_bits=1 << 20)
    return semi_join(pre, keys, on='c_custkey',
                     match_nulls=False).sort('c_custkey')


QUERIES['q_semi_join_customers'] = q_semi_join_customers
ORACLE_SQL['q_semi_join_customers'] = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
"""


def q_anti_join_customers(sf_dir: str):
    """NOT EXISTS anti join: customers holding NO urgent order —
    broadcast distinct key set + vectorized ``pc.is_in`` invert per
    batch (stages/joins.py:anti_join), zero shuffle. NULL semantics
    match SQL NOT EXISTS, not NOT IN: a null right-side key is dropped
    at the source (it can never equal any c_custkey), so it does NOT
    blank the whole result the way NOT IN would — the r3 null gate's
    NOT-IN trap, avoided by construction."""
    from ..stages.joins import anti_join
    cust = _read(sf_dir, 'customer',
                 ['c_custkey', 'c_mktsegment', 'c_acctbal'])
    return anti_join(cust, _urgent_custkeys(sf_dir),
                     on='c_custkey').sort('c_custkey')


QUERIES['q_anti_join_customers'] = q_anti_join_customers
ORACLE_SQL['q_anti_join_customers'] = """
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = customer.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
"""


def q_first_last_events(sf_dir: str):
    """Positional window values per user: first_value / last_value /
    nth_value(2) of ``value`` over (ts, event_id) order, one row per
    user. Same one-exchange shape as the lag/lead family: the segment
    boundary positions ARE the first/last/second row indices, so the
    kernel is three vectorized takes — no per-group loop, no full
    window materialization (SQL's nth_value replays the partition per
    row; here each group is touched O(1)). NULL-ts rows have no
    position in the order — excluded identically on both engines;
    NULL values pass through takes untouched (RESPECT NULLS
    semantics, the SQL default)."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        value = tbl.column('value').combine_chunks()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        n = tbl.num_rows
        first_idx = np.nonzero(starts)[0]
        counts = np.diff(np.append(first_idx, n))
        last_idx = first_idx + counts - 1
        second_ok = counts >= 2
        second_idx = np.where(second_ok, first_idx + 1, first_idx)
        return pa.table({
            'user_id': pa.array(users[first_idx]),
            'first_value': value.take(pa.array(first_idx)),
            'last_value': value.take(pa.array(last_idx)),
            'second_value': W.take_masked(value, second_idx, second_ok),
            'n_events': pa.array(counts, type=pa.int64()),
        })

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_first_last_events'] = q_first_last_events
ORACLE_SQL['q_first_last_events'] = """
    SELECT DISTINCT user_id,
           first_value(value) OVER w AS first_value,
           last_value(value) OVER w2 AS last_value,
           nth_value(value, 2) OVER w2 AS second_value,
           count(*) OVER w2 AS n_events
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
"""


def q_funnel_events(sf_dir: str):
    """Ordered funnel (view -> click -> purchase) per user: the first
    view, the first click STRICTLY after it, the first purchase
    strictly after that, plus the stage count reached. A sequential-
    pattern operator SQL needs three chained self-joins for; here it is
    three masked segmented-min passes over the one per-user exchange
    (np.minimum.reduceat with +inf sentinels), each conditioned on the
    previous step's per-user timestamp broadcast back to rows — zero
    extra shuffles, zero leakage (strict >). NULL event_type rows match
    no step (SQL equality semantics)."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'], require=('ts',))
    INF = np.iinfo(np.int64).max

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        etype = tbl.column('event_type').combine_chunks()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        first_idx = np.nonzero(starts)[0]
        counts = np.diff(np.append(first_idx, n))

        def step_min(step: str, after_row: np.ndarray) -> np.ndarray:
            m = pc.fill_null(pc.equal(etype, step), False)\
                .to_numpy(zero_copy_only=False).astype(bool)
            m &= ts_us > after_row
            return np.minimum.reduceat(np.where(m, ts_us, INF),
                                       first_idx) if n else \
                np.empty(0, dtype=np.int64)

        t_view = step_min('view', np.full(n, -1, dtype=np.int64))
        t_click = step_min('click', np.repeat(t_view, counts))
        t_buy = step_min('purchase', np.repeat(t_click, counts))

        def ts_col(t: np.ndarray) -> pa.Array:
            return pa.array(t, type=pa.int64(), mask=t == INF)\
                .cast(pa.timestamp('us'))

        stages = ((t_view != INF).astype(np.int64)
                  + (t_click != INF) + (t_buy != INF))
        return pa.table({
            'user_id': pa.array(users[first_idx]),
            't_view': ts_col(t_view),
            't_click': ts_col(t_click),
            't_purchase': ts_col(t_buy),
            'n_stages': pa.array(stages, type=pa.int64()),
        })

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_funnel_events'] = q_funnel_events
ORACLE_SQL['q_funnel_events'] = """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' AND ts IS NOT NULL
               GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events WHERE ts IS NOT NULL)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
              AS BIGINT) AS n_stages
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    ORDER BY user_id
"""


def q_retention_events(sf_dir: str):
    """Cohort retention: cohort = a user's first epoch-week; for every
    (cohort_week, week_offset) the count of cohort users active that
    week. Week = epoch_us // 7 days — pure int64 arithmetic, byte-
    stable on both engines. One per-user exchange computes each user's
    cohort and its DISTINCT active weeks via an adjacency dedup (rows
    are ts-sorted, so per-user weeks are non-decreasing — distinct =
    value-change positions, no hash set); each user then contributes
    exactly one row per offset, so the rollup is a plain count — one
    small second exchange over (cohort, offset) partials."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'],
               require=('ts',))
    WEEK_US = 7 * 86_400 * 1_000_000

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        weeks = ts_us // WEEK_US
        first_idx = np.nonzero(starts)[0]
        counts = np.diff(np.append(first_idx, n))
        cohort_row = np.repeat(weeks[first_idx], counts)
        new = starts.copy()
        if n > 1:
            new[1:] |= weeks[1:] != weeks[:-1]
        keep = np.nonzero(new)[0]
        return pa.table({
            'cohort_week': pa.array(cohort_row[keep], type=pa.int64()),
            'week_offset': pa.array(weeks[keep] - cohort_row[keep],
                                    type=pa.int64()),
        })

    per_user = _per_user(ds, fn)
    out = bucket_aggregate(per_user, ['cohort_week', 'week_offset'],
                           {'n_users': ('cohort_week', 'count')})
    return out.sort(['cohort_week', 'week_offset'])


QUERIES['q_retention_events'] = q_retention_events
ORACLE_SQL['q_retention_events'] = """
    WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
               FROM events WHERE ts IS NOT NULL),
    c AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id),
    d AS (SELECT DISTINCT w.user_id, c.cohort_week,
                 w.wk - c.cohort_week AS week_offset
          FROM w JOIN c USING (user_id))
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM d GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
"""


def q_paginate_events(sf_dir: str):
    """Deep pagination (ORDER BY ... LIMIT 100 OFFSET 200) without a
    global sort: global_topk prunes each block to its local
    top-(offset+limit) survivors — the only rows that can reach the
    page — and ONE merge task sorts them and slices the page out. At
    100 TB this moves k+offset rows per block instead of range-
    partitioning the whole table; deep offsets should switch to keyset
    pagination (WHERE value < last_seen), same operator with offset=0.
    Total order is (value DESC NULLS LAST, event_id) — Arrow sort_by
    places nulls at_end, matching the oracle's NULLS LAST."""
    from ..stages.aggregate import global_topk
    limit, offset = 100, 200
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'value'])
    top = global_topk(ds, [('value', 'descending'),
                           ('event_id', 'ascending')], limit + offset)
    return top.map_batches(lambda t: t.slice(offset),
                           batch_format='pyarrow').sort('event_id')


QUERIES['q_paginate_events'] = q_paginate_events
ORACLE_SQL['q_paginate_events'] = """
    SELECT * FROM (
        SELECT event_id, user_id, value FROM events
        ORDER BY value DESC NULLS LAST, event_id
        LIMIT 100 OFFSET 200)
    ORDER BY event_id
"""


def q_pq_topk(sf_dir: str):
    """Product-quantization ANN top-k (stages/ann.py): codebooks trained
    on a PERMUTATION-INVARIANT bottom-k-hash sample, corpus encoded to
    m uint8 codes per vector (32x smaller than float32 at d=64/m=8),
    query answered by asymmetric distance over the code column only.
    ORACLE-able (r4): with hash_mode='duckdb' the sample is bottom-k by
    the DuckDB-parity id hash, the per-subspace Lloyd runs the
    kmeans_lloyd exact-int rules GROUPED over all 8 subspaces in one
    unrolled CTE chain, encode/ADC are exact-integer argmins/sums, and
    approx_cos is one shared double expression of the integer distance
    micro-floored for the rank (_pq_oracle_sql). The code domain stays
    lossy — recall vs the exact scan is still pinned in
    tests/test_ann.py."""
    from ..stages.ann import pq_encode, pq_search, pq_train
    empty = pa.schema([('vec_id', pa.int64()),
                       ('approx_cos', pa.float64())])
    qvec = _query_vec(sf_dir)
    if qvec is None:     # keep the schema: empty Datasets lose theirs
        return empty.empty_table().to_pandas()
    # train + encode both consume the corpus: materialize the pruned
    # read once (at 100 TB the encode output itself is the persisted
    # artifact — codes written to parquet, scanned by every query)
    emb = _read(sf_dir, 'embeddings',
                ['vec_id', 'embedding']).materialize()
    books = pq_train(emb, m=8, ks=32, sample_size=512,
                     hash_mode='duckdb')
    if books is None:
        return empty.empty_table().to_pandas()
    codes = pq_encode(emb, books)
    return pq_search(codes, books, qvec, k=10, exclude_ids=[0])


def _pq_oracle_sql(m: int = 8, dsub: int = 8, ks: int = 32,
                   sample: int = 512, iters: int = 10,
                   k: int = 10) -> str:
    """SQL twin of pq_train(hash_mode='duckdb') + pq_encode + pq_search:
    bottom-``sample`` by hash(vec_id), unit micro-quantized rows (the
    accepted micro-floor float step), ``iters`` unrolled exact-int
    Lloyd rounds GROUPED by subspace j (one chain covers all m
    codebooks), exact-int encode + ADC, micro-floored rank."""
    parts = [f"""
    WITH ve AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL),
    u AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
             cast(floor(unnest(emb) / nrm * 1e6 + 0.5) AS BIGINT) AS ux
      FROM (SELECT vec_id, emb,
                   sqrt(list_sum(list_transform(emb, v -> v * v)))
                     AS nrm
            FROM ve) WHERE nrm > 0),
    samp AS MATERIALIZED (
      SELECT vec_id FROM (SELECT DISTINCT vec_id FROM u)
      ORDER BY hash(vec_id), vec_id LIMIT {sample}),
    sx AS MATERIALIZED (
      SELECT u.vec_id, u.dim // {dsub} AS j, u.dim % {dsub} AS sd, u.ux
      FROM u JOIN samp USING (vec_id)),
    seed AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM samp ORDER BY vec_id LIMIT {ks}),
    b0 AS MATERIALIZED (
      SELECT x.j, s.cid, x.sd, x.ux AS c
      FROM seed s JOIN sx x ON x.vec_id = s.vec_id)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    pd{i} AS MATERIALIZED (
      SELECT x.vec_id, x.j, c.cid,
             cast(sum((x.ux - c.c) * (x.ux - c.c)) AS BIGINT) AS d2
      FROM sx x JOIN b{i - 1} c ON c.j = x.j AND c.sd = x.sd
      GROUP BY x.vec_id, x.j, c.cid),
    pa{i} AS MATERIALIZED (
      SELECT vec_id, j, cid FROM (
        SELECT vec_id, j, cid, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY d2, cid) AS rnk
        FROM pd{i}) WHERE rnk = 1),
    ps{i} AS MATERIALIZED (
      SELECT a.j, a.cid, x.sd, cast(sum(x.ux) AS BIGINT) AS s,
             cast(count(*) AS BIGINT) AS n
      FROM pa{i} a JOIN sx x ON x.vec_id = a.vec_id AND x.j = a.j
      GROUP BY a.j, a.cid, x.sd),
    b{i} AS MATERIALIZED (
      SELECT p.j, p.cid, p.sd,
             CASE WHEN s.n IS NULL THEN p.c
                  ELSE ((s.s + s.n // 2)
                        - (((s.s + s.n // 2) % s.n + s.n) % s.n))
                       // s.n END AS c
      FROM b{i - 1} p LEFT JOIN ps{i} s
        ON s.j = p.j AND s.cid = p.cid AND s.sd = p.sd)""")
    parts.append(f""",
    ux AS MATERIALIZED (
      SELECT vec_id, dim // {dsub} AS j, dim % {dsub} AS sd, ux FROM u),
    ed AS MATERIALIZED (
      SELECT x.vec_id, x.j, c.cid,
             cast(sum((x.ux - c.c) * (x.ux - c.c)) AS BIGINT) AS d2
      FROM ux x JOIN b{iters} c ON c.j = x.j AND c.sd = x.sd
      GROUP BY x.vec_id, x.j, c.cid),
    code AS MATERIALIZED (
      SELECT vec_id, j, cid FROM (
        SELECT vec_id, j, cid, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY d2, cid) AS rnk
        FROM ed) WHERE rnk = 1),
    q6 AS MATERIALIZED (
      SELECT dim // {dsub} AS j, dim % {dsub} AS sd, ux FROM u
      WHERE vec_id = 0),
    tadc AS MATERIALIZED (
      SELECT c.j, c.cid,
             cast(sum((q.ux - c.c) * (q.ux - c.c)) AS BIGINT) AS d
      FROM b{iters} c JOIN q6 q ON q.j = c.j AND q.sd = c.sd
      GROUP BY c.j, c.cid),
    dist AS MATERIALIZED (
      SELECT code.vec_id, cast(sum(t.d) AS BIGINT) AS d2
      FROM code JOIN tadc t ON t.j = code.j AND t.cid = code.cid
      WHERE code.vec_id <> 0 GROUP BY code.vec_id)
    SELECT vec_id,
           cast(floor((1.0 - cast(d2 AS DOUBLE) / 2e12) * 1e6 + 0.5)
                AS BIGINT) / 1e6 AS approx_cos
    FROM dist
    ORDER BY approx_cos DESC, vec_id LIMIT {k}""")
    return ''.join(parts)


QUERIES['q_pq_topk'] = q_pq_topk
ORACLE_SQL['q_pq_topk'] = _pq_oracle_sql()


def q_fk_audit_star(sf_dir: str):
    """Cross-TABLE data-quality audit — the table-level complement of
    the row-level contract gate: referential integrity over the
    orders⟷lineitem FK in BOTH directions (orphan children, childless
    parents) plus primary-key uniqueness of events.event_id, one
    summary row.

    Shape: every table maps to per-batch (tag, key, count) partials —
    16-byte key rows, never payload — and all three partial streams
    union into ONE hash-bucket exchange; each bucket resolves its keys
    (a key lives in exactly one bucket) and emits one summary row the
    driver sums. No driver-held or broadcast key arrays (the previous
    design pulled each side's distinct keys to the driver and
    broadcast them — the 100-TB cliff this audit must avoid) and one
    pipeline execution instead of five. Table row totals ride the same
    exchange under reserved tags. NULL FK cells are NOT orphans (SQL
    FK semantics: a null reference references nothing); events PK
    coverage is count(event_id) (non-null), matching the oracle."""
    from ..stages.conversations import bucket_exchange

    _SCHEMA = pa.schema([('tbl', pa.string()), ('k', pa.int64()),
                         ('n', pa.int64())])

    def partial(tag, key_col, total_tag=None):
        def fn(tbl: pa.Table) -> pa.Table:
            col = tbl.column(key_col)
            nn = tbl.filter(pc.is_valid(col))
            g = pa.table({'k': pc.cast(nn.column(key_col), pa.int64())})\
                .group_by('k').aggregate([('k', 'count')])
            tags = [tag] * g.num_rows
            ks = g.column('k').to_pylist()
            ns = g.column('k_count').to_pylist()
            if total_tag is not None:
                tags.append(total_tag)
                ks.append(0)
                ns.append(tbl.num_rows)
            return pa.table({'tbl': pa.array(tags, pa.string()),
                             'k': pa.array(ks, pa.int64()),
                             'n': pa.array(ns, pa.int64())},
                            schema=_SCHEMA)
        return fn

    li = _read(sf_dir, 'lineitem', ['l_orderkey'])\
        .map_batches(partial('li', 'l_orderkey', 'li_total'),
                     batch_format='pyarrow', zero_copy_batch=True)
    o = _read(sf_dir, 'orders', ['o_orderkey'])\
        .map_batches(partial('o', 'o_orderkey', 'o_total'),
                     batch_format='pyarrow', zero_copy_batch=True)
    ev = _read(sf_dir, 'events', ['event_id'])\
        .map_batches(partial('e', 'event_id'),
                     batch_format='pyarrow', zero_copy_batch=True)

    _OUT = pa.schema([(c, pa.int64()) for c in
                      ('lineitem_rows', 'orphan_lineitems', 'orders_rows',
                       'childless_orders', 'event_id_rows',
                       'dup_event_ids')])

    def audit(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _OUT.empty_table()
        df = tbl.to_pandas()
        by = {t: g.groupby('k')['n'].sum()
              for t, g in df.groupby('tbl', sort=False)}
        lik = by.get('li', pd.Series(dtype='int64'))
        ok = by.get('o', pd.Series(dtype='int64'))
        evk = by.get('e', pd.Series(dtype='int64'))
        vals = [
            int(by.get('li_total', pd.Series(dtype='int64')).sum()),
            int(lik[~lik.index.isin(ok.index)].sum()),
            int(by.get('o_total', pd.Series(dtype='int64')).sum()),
            int(ok[~ok.index.isin(lik.index)].sum()),
            int(evk.sum()),
            int(evk.sum()) - len(evk),
        ]
        return pa.table({f.name: pa.array([v], pa.int64())
                         for f, v in zip(_OUT, vals)}, schema=_OUT)

    parts = bucket_exchange(li.union(o, ev), 'k', audit, num_buckets=16)
    sums = _small_df(parts, [f.name for f in _OUT])
    return pd.DataFrame({f.name: pd.array(
        [int(sums[f.name].sum()) if f.name in sums.columns else 0],
        dtype='int64') for f in _OUT})


QUERIES['q_fk_audit_star'] = q_fk_audit_star
ORACLE_SQL['q_fk_audit_star'] = """
    SELECT
      (SELECT count(*) FROM lineitem) AS lineitem_rows,
      (SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
      (SELECT count(*) FROM orders) AS orders_rows,
      (SELECT count(*) FROM orders o
        WHERE o.o_orderkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey)) AS childless_orders,
      (SELECT count(event_id) FROM events) AS event_id_rows,
      (SELECT count(event_id) - count(DISTINCT event_id)
         FROM events) AS dup_event_ids
"""


def q_ivfpq_topk(sf_dir: str):
    """IVF-PQ ANN top-k (stages/ann.py:ivfpq_topk): coarse clusters
    prune WHICH rows are scanned, residual product codes shrink WHAT
    the scan reads — the Faiss-style web-scale index shape. All
    sampling is bottom-k-hash (permutation-invariant), so the shuffled
    gate's byte self-compare holds. ORACLE-able (r4): with
    hash_mode='duckdb' both quantizers run the kmeans_lloyd exact-int
    rules (the coarse chain is one full-width "subspace"), residuals,
    encode, probe pick and the ADC family are exact integers, and the
    rerank is the micro-floored exact cosine over the unit corpus —
    two unrolled Lloyd chains in SQL. Recall and the residual-vs-flat
    advantage stay pinned in tests/test_ann.py."""
    from ..stages.ann import ivfpq_topk
    empty = pa.schema([('vec_id', pa.int64()),
                       ('cos_sim', pa.float64())])
    qvec = _query_vec(sf_dir)
    if qvec is None:     # keep the schema: empty Datasets lose theirs
        return empty.empty_table().to_pandas()
    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    # rerank=50: the production recipe — the ADC pass shortlists, one
    # pruned float pass scores exactly 50 rows with true cosine
    return ivfpq_topk(emb, qvec, k=10, n_clusters=16, nprobe=4,
                      m=8, ks=32, sample_size=512, exclude_ids=[0],
                      rerank=50, hash_mode='duckdb')


def _lloyd_chain_sql(pfx: str, src: str, seed_src: str, ks: int,
                     iters: int) -> str:
    """Unrolled exact-int Lloyd CTE chain over ``src(vec_id, j, sd,
    ux)`` with seeds = the first ``ks`` ids of ``seed_src`` (id order).
    Final books land in {pfx}b{iters}(j, cid, sd, c). The grouped-by-j
    form trains every subspace in ONE chain; a full-width chain is
    just j = 0. Shared by the IVF-PQ oracle's coarse + residual
    quantizers."""
    parts = [f""",
    {pfx}seed AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM {seed_src} ORDER BY vec_id LIMIT {ks}),
    {pfx}b0 AS MATERIALIZED (
      SELECT x.j, s.cid, x.sd, x.ux AS c
      FROM {pfx}seed s JOIN {src} x ON x.vec_id = s.vec_id)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    {pfx}d{i} AS MATERIALIZED (
      SELECT x.vec_id, x.j, c.cid,
             cast(sum((x.ux - c.c) * (x.ux - c.c)) AS BIGINT) AS d2
      FROM {src} x JOIN {pfx}b{i - 1} c ON c.j = x.j AND c.sd = x.sd
      GROUP BY x.vec_id, x.j, c.cid),
    {pfx}a{i} AS MATERIALIZED (
      SELECT vec_id, j, cid FROM (
        SELECT vec_id, j, cid, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY d2, cid) AS rnk
        FROM {pfx}d{i}) WHERE rnk = 1),
    {pfx}s{i} AS MATERIALIZED (
      SELECT a.j, a.cid, x.sd, cast(sum(x.ux) AS BIGINT) AS s,
             cast(count(*) AS BIGINT) AS n
      FROM {pfx}a{i} a JOIN {src} x
        ON x.vec_id = a.vec_id AND x.j = a.j
      GROUP BY a.j, a.cid, x.sd),
    {pfx}b{i} AS MATERIALIZED (
      SELECT p.j, p.cid, p.sd,
             CASE WHEN s.n IS NULL THEN p.c
                  ELSE ((s.s + s.n // 2)
                        - (((s.s + s.n // 2) % s.n + s.n) % s.n))
                       // s.n END AS c
      FROM {pfx}b{i - 1} p LEFT JOIN {pfx}s{i} s
        ON s.j = p.j AND s.cid = p.cid AND s.sd = p.sd)""")
    return ''.join(parts)


def _ivfpq_oracle_sql(nc: int = 16, nprobe: int = 4, m: int = 8,
                      dsub: int = 8, ks: int = 32, sample: int = 512,
                      iters: int = 10, rerank: int = 50,
                      k: int = 10) -> str:
    """SQL twin of ivfpq_topk(hash_mode='duckdb', rerank=50): unit
    micro rows, bottom-``sample`` by hash(vec_id), coarse + residual
    exact-int Lloyd chains, exact-int encode/probe/ADC, ADC shortlist
    of ``rerank`` ids, micro-floored exact-cosine rerank."""
    head = f"""
    WITH ve AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL),
    un AS MATERIALIZED (
      SELECT vec_id, emb,
             sqrt(list_sum(list_transform(emb, v -> v * v))) AS nrm
      FROM ve),
    u AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
             cast(floor(unnest(emb) / nrm * 1e6 + 0.5) AS BIGINT) AS ux
      FROM un WHERE nrm > 0),
    udbl AS MATERIALIZED (
      SELECT vec_id, list_transform(emb, v -> v / nrm) AS ud
      FROM un WHERE nrm > 0),
    samp AS MATERIALIZED (
      SELECT vec_id FROM (SELECT DISTINCT vec_id FROM u)
      ORDER BY hash(vec_id), vec_id LIMIT {sample}),
    csx AS MATERIALIZED (
      SELECT u.vec_id, 0 AS j, u.dim AS sd, u.ux
      FROM u JOIN samp USING (vec_id))"""
    coarse = _lloyd_chain_sql('c', 'csx', 'samp', nc, iters)
    resid_prep = f""",
    sassign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT x.vec_id, c.cid, row_number() OVER (
          PARTITION BY x.vec_id
          ORDER BY sum((x.ux - c.c) * (x.ux - c.c)), c.cid) AS rnk
        FROM csx x JOIN cb{iters} c ON c.sd = x.sd
        GROUP BY x.vec_id, c.cid) WHERE rnk = 1),
    rsx AS MATERIALIZED (
      SELECT x.vec_id, x.sd // {dsub} AS j, x.sd % {dsub} AS sd,
             x.ux - c.c AS ux
      FROM csx x JOIN sassign a ON a.vec_id = x.vec_id
      JOIN cb{iters} c ON c.cid = a.cid AND c.sd = x.sd)"""
    resid = _lloyd_chain_sql('r', 'rsx', 'samp', ks, iters)
    tail = f""",
    uxx AS MATERIALIZED (
      SELECT vec_id, 0 AS j, dim AS sd, ux FROM u),
    cass AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT x.vec_id, c.cid, row_number() OVER (
          PARTITION BY x.vec_id
          ORDER BY sum((x.ux - c.c) * (x.ux - c.c)), c.cid) AS rnk
        FROM uxx x JOIN cb{iters} c ON c.sd = x.sd
        GROUP BY x.vec_id, c.cid) WHERE rnk = 1),
    cres AS MATERIALIZED (
      SELECT x.vec_id, x.dim // {dsub} AS j, x.dim % {dsub} AS sd,
             x.ux - c.c AS rx
      FROM u x JOIN cass a ON a.vec_id = x.vec_id
      JOIN cb{iters} c ON c.cid = a.cid AND c.sd = x.dim),
    ecd AS MATERIALIZED (
      SELECT x.vec_id, x.j, b.cid,
             cast(sum((x.rx - b.c) * (x.rx - b.c)) AS BIGINT) AS d2
      FROM cres x JOIN rb{iters} b ON b.j = x.j AND b.sd = x.sd
      GROUP BY x.vec_id, x.j, b.cid),
    ecode AS MATERIALIZED (
      SELECT vec_id, j, cid FROM (
        SELECT vec_id, j, cid, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY d2, cid) AS rnk
        FROM ecd) WHERE rnk = 1),
    qx AS MATERIALIZED (SELECT dim, ux FROM u WHERE vec_id = 0),
    probe AS MATERIALIZED (
      SELECT cid FROM (
        SELECT c.cid, sum((q.ux - c.c) * (q.ux - c.c)) AS d2
        FROM cb{iters} c JOIN qx q ON q.dim = c.sd
        GROUP BY c.cid ORDER BY d2, cid LIMIT {nprobe})),
    qres AS MATERIALIZED (
      SELECT p.cid AS pcid, q.dim // {dsub} AS j,
             q.dim % {dsub} AS sd, q.ux - c.c AS rx
      FROM probe p JOIN cb{iters} c ON c.cid = p.cid
      JOIN qx q ON q.dim = c.sd),
    tadc AS MATERIALIZED (
      SELECT q.pcid, b.j, b.cid,
             cast(sum((q.rx - b.c) * (q.rx - b.c)) AS BIGINT) AS d
      FROM rb{iters} b JOIN qres q ON q.j = b.j AND q.sd = b.sd
      GROUP BY q.pcid, b.j, b.cid),
    dist AS MATERIALIZED (
      SELECT e.vec_id, cast(sum(t.d) AS BIGINT) AS d2
      FROM ecode e JOIN cass a ON a.vec_id = e.vec_id
      JOIN probe p ON p.cid = a.cid
      JOIN tadc t ON t.pcid = a.cid AND t.j = e.j AND t.cid = e.cid
      WHERE e.vec_id <> 0 GROUP BY e.vec_id),
    short AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id,
               cast(floor((1.0 - cast(d2 AS DOUBLE) / 2e12) * 1e6
                          + 0.5) AS BIGINT) AS sim6
        FROM dist ORDER BY sim6 DESC, vec_id LIMIT {rerank})),
    rr AS MATERIALIZED (
      SELECT s.vec_id,
             cast(floor(list_cosine_similarity(udbl.ud,
                    (SELECT emb FROM ve WHERE vec_id = 0))
                  * 1e6 + 0.5) AS BIGINT) AS cos6
      FROM short s JOIN udbl ON udbl.vec_id = s.vec_id)
    SELECT vec_id, cos6 / 1e6 AS cos_sim FROM rr
    ORDER BY cos6 DESC, vec_id LIMIT {k}"""
    return head + coarse + resid_prep + resid + tail


QUERIES['q_ivfpq_topk'] = q_ivfpq_topk
ORACLE_SQL['q_ivfpq_topk'] = _ivfpq_oracle_sql()


def q_target_encode_events(sf_dir: str):
    """Leakage-free target encoding: each event's feature is the
    expanding mean of ``value`` over STRICTLY PRIOR events of the same
    event_type in (ts, event_id) order — the point-in-time categorical
    encoder (SQL frame ROWS UNBOUNDED PRECEDING .. 1 PRECEDING). Zero
    temporal leakage by construction: row i never sees its own target
    or anything later. Mean = exact int64 micro-unit prefix sums
    (CLAUDE.md fixed-point discipline) over prior non-null count —
    identical integers on both engines, one floor(sum/cnt+0.5) each.
    NULL event_type forms ONE partition (SQL window semantics; None
    keys group contiguously in per_conversation). NULL values count
    toward neither sum nor count; NULL-ts rows have no event time and
    are excluded on both engines. Low-cardinality partition key: at
    sf-scale each type is one bucket task; a 100-TB run reuses the
    salted two-pass for the same prefix semantics (per-chunk partials
    + driver exclusive scan over chunk summaries, stages/salting.py)."""
    ds = _read(sf_dir, 'events', ['event_id', 'event_type', 'ts',
                                  'value'], require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v6f = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nn = ~np.isnan(v6f)
        v6 = np.where(nn, v6f, 0.0).astype(np.int64)
        nni = nn.astype(np.int64)
        prior6 = W.running_sum(v6, starts) - v6
        prior_n = W.running_sum(nni, starts) - nni
        with np.errstate(invalid='ignore', divide='ignore'):
            te = np.floor(prior6.astype(np.float64)
                          / np.maximum(prior_n, 1) + 0.5) / 1e6
        return pa.table({
            'event_id': tbl.column('event_id'),
            'event_type': tbl.column('event_type'),
            'te_value': pa.array(te, mask=(prior_n == 0)),
        })

    return per_conversation(ds, fn, key='event_type',
                            order=('ts', 'event_id'),
                            num_buckets=8).sort('event_id')


QUERIES['q_target_encode_events'] = q_target_encode_events
ORACLE_SQL['q_target_encode_events'] = """
    -- expanding prior mean from int64 micro-unit sums: identical
    -- integers on both engines, then ONE double division each
    WITH s AS (
      SELECT event_id, event_type, ts,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL)
    SELECT event_id, event_type,
           CASE WHEN count(v6) OVER w > 0 THEN
             floor(cast(sum(v6) OVER w AS DOUBLE)
                   / count(v6) OVER w + 0.5) / 1e6
           END AS te_value
    FROM s
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ORDER BY event_id
"""


def q_interp_events(sf_dir: str):
    """Time-weighted linear interpolation of missing values per user:
    a NULL ``value`` takes prev + (next-prev) * (ts-ts_prev)/(ts_next-
    ts_prev) between its nearest non-null neighbors in (ts, event_id)
    order; leading/trailing gaps stay NULL; a zero time span (tied
    timestamps) takes the previous value. One hash exchange + the
    ffill/bfill index kernels (stages/window.py:122,134) — no per-row
    work. Byte-stability: each arithmetic step is a single IEEE-754
    double op evaluated in the same expression shape as the oracle —
    correctly-rounded mul/div/add on identical inputs are bit-identical
    across engines; only reassociating SUMS need fixed-point
    (CLAUDE.md), and there is no sum here."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        val = tbl.column('value').combine_chunks()
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        v = val.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = np.asarray(val.is_valid().to_numpy(zero_copy_only=False),
                           dtype=bool)
        # for a null row, "at-or-before/after" == strictly before/after
        pidx, pok = W.ffill_indices(valid, starts)
        nidx, nok = W.bfill_indices(valid, starts)
        pv, nv = v[pidx], v[nidx]
        pt, nt = ts_us[pidx], ts_us[nidx]
        both = pok & nok & ~valid
        with np.errstate(invalid='ignore', divide='ignore'):
            frac = (ts_us - pt).astype(np.float64) \
                / (nt - pt).astype(np.float64)
            interp = pv + (nv - pv) * frac
        out = np.where(valid, v,
                       np.where(both & (nt > pt), interp,
                                np.where(both, pv, np.nan)))
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'value_interp': pa.array(out, mask=~(valid | both)),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_interp_events'] = q_interp_events
ORACLE_SQL['q_interp_events'] = """
    -- the interpolation arithmetic mirrors the engine op-for-op:
    -- IEEE double mul/div/add are correctly rounded, so identical
    -- inputs give bit-identical results (no reassociating sums here)
    WITH s AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS tus
      FROM events WHERE ts IS NOT NULL),
    w AS (
      SELECT event_id, user_id, value, tus,
             last_value(value IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN value IS NOT NULL THEN tus END
                        IGNORE NULLS) OVER wb AS pt,
             first_value(value IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN value IS NOT NULL THEN tus END
                         IGNORE NULLS) OVER wf AS nt
      FROM s
      WINDOW wb AS (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           CASE WHEN value IS NOT NULL THEN value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) *
                     (cast(tus - pt AS DOUBLE) / cast(nt - pt AS DOUBLE))
           END AS value_interp
    FROM w ORDER BY event_id
"""


def q_mad_outliers_events(sf_dir: str):
    """Robust outlier detection per event_type: flag rows whose absolute
    deviation from the group MEDIAN exceeds 3.5x the group MAD (median
    absolute deviation) — the robust-statistics complement of
    q_zscore_events (means/stds are themselves skewed by the outliers
    they hunt). One hash exchange co-locates each type; two vectorized
    percentile passes per group (same per-group-fits-one-task bound as
    grouped_quantiles; the histogram sketch is the 100-TB swap-in).

    Byte-stability of the ROW PICK (CLAUDE.md row-picking discipline):
    values enter as int64 micro-units, and quantile_cont interpolation
    over integers is EXACT in ieee754 on both engines (b-a, *0.5, +a
    all representable), so med6 is an exact half-unit, adev6 an exact
    half, mad6 an exact quarter, 3.5*mad6 an exact eighth — the
    comparison is deterministic, no epsilon. Rows with NULL type/value
    have no robust score — excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'event_type', 'value'],
               require=('event_type', 'value'))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        v6 = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lo = np.nonzero(starts)[0]
        hi = np.append(lo[1:], len(v6))
        med6 = np.empty(len(v6))
        mad6 = np.empty(len(v6))
        for s, e in zip(lo, hi):     # per GROUP, not per row
            m = np.percentile(v6[s:e], 50, method='linear')
            med6[s:e] = m
            mad6[s:e] = np.percentile(np.abs(v6[s:e] - m), 50,
                                      method='linear')
        adev6 = np.abs(v6 - med6)
        keep = adev6 > 3.5 * mad6
        out = pa.table({
            'event_id': tbl.column('event_id'),
            'event_type': tbl.column('event_type'),
            'value': tbl.column('value'),
            'med': pa.array(np.round(med6 / 1e6, 6)),
            'mad': pa.array(np.round(mad6 / 1e6, 6)),
        })
        return out.filter(pa.array(keep))

    return per_conversation(ds, fn, key='event_type', order=(),
                            num_buckets=8).sort('event_id')


QUERIES['q_mad_outliers_events'] = q_mad_outliers_events
ORACLE_SQL['q_mad_outliers_events'] = """
    -- integer micro-unit medians: quantile_cont interpolation over
    -- int64 inputs is ieee-exact on both engines, so the 3.5*MAD row
    -- pick is deterministic (CLAUDE.md row-picking discipline)
    WITH s AS (
      SELECT event_id, event_type, value,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL),
    m AS (
      SELECT event_type,
             quantile_cont(cast(v6 AS DOUBLE), 0.5) AS med6
      FROM s GROUP BY event_type),
    a AS (
      SELECT s.event_id, s.event_type, s.value, m.med6,
             abs(cast(s.v6 AS DOUBLE) - m.med6) AS adev6
      FROM s JOIN m USING (event_type)),
    d AS (
      SELECT event_type, quantile_cont(adev6, 0.5) AS mad6
      FROM a GROUP BY event_type)
    SELECT a.event_id, a.event_type, a.value,
           round(a.med6 / 1e6, 6) AS med,
           round(d.mad6 / 1e6, 6) AS mad
    FROM a JOIN d USING (event_type)
    WHERE a.adev6 > 3.5 * d.mad6
    ORDER BY a.event_id
"""


def q_pagerank_events(sf_dir: str):
    """PageRank centrality of the event-type transition graph: edges
    are consecutive (prev_type -> type) transitions per user in
    (ts, event_id) order (one hash exchange + lag kernel), nodes are
    event types (64-bit surrogate ids, sign-cleared for the graph's
    non-negative id contract). stages/graph.py:pagerank runs entirely
    in int64 fixed-point, so ranks are EXACTLY reproducible under any
    row order — the --shuffled self-parity bar. The same property makes
    it ORACLE-able (r4): the update (contrib = r // outdeg per edge,
    dangling share // n, r' = base9 + (d6 * (in9 + dsh)) // 1e6) is
    pure non-negative int64 arithmetic, so the 20 iterations UNROLL
    into a generated CTE chain that matches byte-for-byte — every `//`
    operand is provably non-negative (CLAUDE.md trunc-vs-floor rule);
    the final rank = r20 / 1e9 is one exact int-to-double division on
    both engines."""
    from ..stages.graph import pagerank
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'],
               require=('ts', 'event_type'))

    def _sid(vals: np.ndarray) -> np.ndarray:
        h = pd.util.hash_array(vals, categorize=False)
        return (h >> np.uint64(1)).astype(np.int64)

    def edges_fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        et = tbl.column('event_type').combine_chunks()
        prev = W.lag_column(et, starts, 1)
        keep = np.asarray(prev.is_valid().to_numpy(
            zero_copy_only=False), dtype=bool)
        cur = et.to_numpy(zero_copy_only=False)[keep]
        prv = prev.to_numpy(zero_copy_only=False)[keep]
        return pa.table({'src': pa.array(_sid(prv), pa.int64()),
                         'dst': pa.array(_sid(cur), pa.int64())})

    edges = _per_user(ds, edges_fn)
    ranks = _small_df(pagerank(edges), ['node', 'rank'])

    types = _small_df(pre_aggregate(
        ds, ['event_type'], {'n': ('event_id', 'count')}),
        ['event_type', 'n'])
    if len(types) == 0 or len(ranks) == 0:
        return pd.DataFrame({'event_type': pd.array([], dtype='string'),
                             'rank': pd.array([], dtype='float64')})
    tv = types['event_type'].to_numpy()
    name_of = dict(zip(_sid(tv), tv))
    out = pd.DataFrame({
        'event_type': [name_of.get(n) for n in ranks['node']],
        'rank': ranks['rank'].astype('float64'),
    })
    return out.sort_values('event_type').reset_index(drop=True)


QUERIES['q_pagerank_events'] = q_pagerank_events


def _pagerank_oracle_sql(iters: int = 20, damping6: int = 850_000) -> str:
    """Generated CTE chain mirroring stages/graph.py pagerank exactly:
    all-int64 arithmetic, iterations unrolled (SQL recursion cannot
    aggregate in the recursive member; a fixed iteration count can)."""
    head = """
    WITH ev AS MATERIALIZED (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    edges AS MATERIALIZED (
      SELECT prev AS s, event_type AS d FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM ev)
      WHERE prev IS NOT NULL),
    nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM edges
              UNION SELECT DISTINCT d FROM edges),
    deg AS MATERIALIZED (
      SELECT n.node, coalesce(o.c, 0) AS outdeg
      FROM nodes n LEFT JOIN
        (SELECT s, count(*) AS c FROM edges GROUP BY s) o
        ON o.s = n.node),
    nn AS MATERIALIZED (
      SELECT count(*) AS n,
             (150000::BIGINT * 1000000000::BIGINT)
               // (1000000::BIGINT * count(*)) AS base9
      FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, outdeg,
             1000000000::BIGINT // (SELECT n FROM nn) AS r
      FROM deg)"""
    steps = []
    for k in range(1, iters + 1):
        p = f'r{k - 1}'
        steps.append(f""",
    in{k} AS MATERIALIZED (
      SELECT e.d AS node, sum(p.r // p.outdeg) AS in9
      FROM edges e JOIN {p} p ON p.node = e.s GROUP BY e.d),
    dsh{k} AS MATERIALIZED (
      SELECT coalesce(sum(r), 0) // (SELECT n FROM nn) AS dsh
      FROM {p} WHERE outdeg = 0),
    r{k} AS MATERIALIZED (
      SELECT p.node, p.outdeg,
             (SELECT base9 FROM nn)
             + ({damping6}::BIGINT * (coalesce(i.in9, 0)
                              + (SELECT dsh FROM dsh{k}))) // 1000000
               AS r
      FROM {p} p LEFT JOIN in{k} i ON i.node = p.node)""")
    tail = f"""
    SELECT node AS event_type,
           cast(r AS DOUBLE) / 1000000000 AS "rank"
    FROM r{iters} ORDER BY event_type"""
    return head + ''.join(steps) + tail


ORACLE_SQL['q_pagerank_events'] = _pagerank_oracle_sql()


def q_weighted_sample_docs(sf_dir: str):
    """Quality-weighted corpus subsampling: 80 documents drawn WITHOUT
    replacement with probability ~ n_chars via deterministic priority
    sampling (functions/sampling.py:priority_sample — hash-uniform
    u in (0,1], priority w/u, global top-k). The priority is one ieee
    division of exactly-representable values, so the DuckDB oracle
    reproduces the pick bit-identically (no transcendental E-S key);
    local per-batch pruning means at most k rows leave each block.
    NULL / non-positive weights are excluded on both engines."""
    from ..functions.sampling import priority_sample
    ds = _read(sf_dir, 'documents', ['doc_id', 'n_chars'])
    return priority_sample(ds, 'doc_id', 'n_chars', k=80,
                           salt=7).sort('doc_id')


QUERIES['q_weighted_sample_docs'] = q_weighted_sample_docs
ORACLE_SQL['q_weighted_sample_docs'] = """
    -- priority sampling: w/u with u = (hash+1)/2^32; the division is
    -- one correctly-rounded ieee op on exact inputs — bit-identical
    -- across engines (CLAUDE.md row-picking discipline, no epsilon)
    WITH s AS (
      SELECT doc_id, n_chars,
             (((doc_id + 7) % 2147483648) * 2654435761)
               % 4294967296 AS b
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL),
    t AS (
      SELECT doc_id, n_chars
      FROM s
      ORDER BY cast(n_chars AS DOUBLE) / (b + 1) DESC, doc_id
      LIMIT 80)
    SELECT doc_id, n_chars FROM t ORDER BY doc_id
"""


def q_novelty_docs(sf_dir: str):
    """Corpus novelty curve: per document, how many of its DISTINCT
    tokens appear for the FIRST time within its language (corpus
    ordered by doc_id) — the curation signal behind diminishing-returns
    data selection (novelty ~ marginal information of adding the doc).

    Shape: tokens explode to 64-bit (lang, token) fingerprint rows (the
    exact-dedup collision tradeoff, 16 bytes/row — raw text never rides
    the exchange); ONE high-cardinality bucket_aggregate takes min
    doc_id per fingerprint; per-batch recounts by first-doc plus the
    doc-local distinct counts (vectorized lexsort, zero exchange) union
    into one tiny per-doc sum exchange. The novelty ratio is one ieee
    division of identical integers on both engines. NULL lang/text rows
    carry no tokens — excluded on both engines."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'text'],
               require=('lang', 'text'))
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _h(arr) -> np.ndarray:
        return pd.util.hash_array(np.asarray(arr, dtype=object),
                                  categorize=False)

    _P = pa.schema([('doc', pa.int64()), ('nd', pa.int64()),
                    ('nv', pa.int64())])

    def explode(tbl: pa.Table) -> pa.Table:
        words = pc.split_pattern(tbl.column('text').combine_chunks(), ' ')
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        docs = tbl.column('doc_id').combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        lang_h = _h(tbl.column('lang').combine_chunks().to_numpy(
            zero_copy_only=False))
        tok_h = _h(words.flatten().to_numpy(zero_copy_only=False))
        k = (np.repeat(lang_h, lens) * _GOLD + tok_h).view(np.int64)
        return pa.table({'k': pa.array(k, pa.int64()),
                         'doc': pa.array(np.repeat(docs, lens))})

    exploded = ds.map_batches(explode, batch_format='pyarrow',
                              zero_copy_batch=True)
    firsts = bucket_aggregate(exploded, ['k'],
                              {'first_doc': ('doc', 'min')},
                              num_buckets=32)

    def novel_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _P.empty_table()
        fd = tbl.column('first_doc').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        u, c = np.unique(fd, return_counts=True)
        z = np.zeros(len(u), dtype=np.int64)
        return pa.table({'doc': pa.array(u), 'nd': pa.array(z),
                         'nv': pa.array(c)}, schema=_P)

    def distinct_local(tbl: pa.Table) -> pa.Table:
        words = pc.split_pattern(tbl.column('text').combine_chunks(), ' ')
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        docs = tbl.column('doc_id').combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok_h = _h(words.flatten().to_numpy(zero_copy_only=False))\
            .view(np.int64)
        row = np.repeat(np.arange(len(docs)), lens)
        order = np.lexsort((tok_h, row))
        r, t = row[order], tok_h[order]
        new = np.ones(len(r), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (t[1:] != t[:-1])
        nd = np.zeros(len(docs), dtype=np.int64)
        np.add.at(nd, r, new.astype(np.int64))
        return pa.table({'doc': pa.array(docs),
                         'nd': pa.array(nd),
                         'nv': pa.array(np.zeros(len(docs), np.int64))},
                        schema=_P)

    parts = ds.map_batches(distinct_local, batch_format='pyarrow',
                           zero_copy_batch=True).union(
        firsts.map_batches(novel_partial, batch_format='pyarrow'))
    per_doc = bucket_aggregate(parts, ['doc'],
                               {'nd': ('nd', 'sum'),
                                'nv': ('nv', 'sum')}, num_buckets=16)

    def finish(tbl: pa.Table) -> pa.Table:
        nd = tbl.column('nd').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nv = tbl.column('nv').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        with np.errstate(invalid='ignore', divide='ignore'):
            ratio = nv / nd
        return pa.table({
            'doc_id': tbl.column('doc'),
            'n_distinct': pc.cast(tbl.column('nd'), pa.int64()),
            'n_novel': pc.cast(tbl.column('nv'), pa.int64()),
            'novelty': pa.array(ratio, mask=(nd == 0)),
        })

    return per_doc.map_batches(finish, batch_format='pyarrow')\
        .sort('doc_id')


QUERIES['q_novelty_docs'] = q_novelty_docs
ORACLE_SQL['q_novelty_docs'] = """
    WITH d AS (
      SELECT doc_id, lang, text FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM d),
    dd AS (SELECT DISTINCT doc_id, lang, tok FROM toks),
    firsts AS (
      SELECT lang, tok, min(doc_id) AS first_doc
      FROM dd GROUP BY lang, tok),
    novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel
      FROM firsts GROUP BY first_doc),
    dist AS (
      SELECT doc_id, count(DISTINCT tok) AS n_distinct FROM toks
      GROUP BY doc_id)
    SELECT dist.doc_id, dist.n_distinct,
           coalesce(novel.n_novel, 0) AS n_novel,
           cast(coalesce(novel.n_novel, 0) AS DOUBLE) / dist.n_distinct
             AS novelty
    FROM dist LEFT JOIN novel USING (doc_id)
    ORDER BY dist.doc_id
"""


def q_cms_token_counts(sf_dir: str):
    """Count-min sketch frequency estimates next to the exact counts
    for the corpus's top-20 tokens: the bounded-memory path (one
    d x w int64 matrix regardless of vocabulary size) vs the exact
    two-pass heavy hitters. The sketch tree-merges by shard-range sum
    (stages/sketches.py:cms_build) and only OVERcounts; integer sums
    make it exactly reproducible under any row order — the --shuffled
    self-parity bar. ORACLE-able (r4): with hash_mode='duckdb' every
    bucket index is hash(xor(hash(tok), j)) % w on the DuckDB-parity
    murmur kernels (duckdb_hash_str64 differential-pinned against SQL
    hash(VARCHAR)), so DuckDB recomputes the exact same d x w counter
    matrix from the token stream and the same min-over-rows estimates
    — the sketch ESTIMATE is a deterministic function of the corpus.
    Error-bound and invariance properties stay pinned in
    tests/test_sketches_cms.py."""
    from ..stages.sketches import cms_build, cms_estimate, heavy_hitters
    ds = _read(sf_dir, 'documents', ['text'])

    def explode(tbl: pa.Table) -> pa.Table:
        words = pc.split_pattern(tbl.column('text').combine_chunks(), ' ')
        return pa.table({'tok': words.flatten()})

    toks = ds.map_batches(explode, batch_format='pyarrow',
                          zero_copy_batch=True).materialize()
    top = _small_df(heavy_hitters(toks, 'tok', k=20, expansion=16),
                    ['tok', 'n'])
    sk = cms_build(toks, 'tok', d=4, w=16384, hash_mode='duckdb')
    if len(top) == 0:
        return pd.DataFrame({'tok': pd.array([], dtype='string'),
                             'n': pd.array([], dtype='int64'),
                             'approx_n': pd.array([], dtype='int64')})
    est = cms_estimate(sk, top['tok'].to_numpy(object),
                       hash_mode='duckdb')
    return pd.DataFrame({'tok': top['tok'],
                         'n': top['n'].astype('int64'),
                         'approx_n': pd.array(est, dtype='int64')})\
        .sort_values('tok').reset_index(drop=True)


QUERIES['q_cms_token_counts'] = q_cms_token_counts
# SQL twin of cms_build/cms_estimate (hash_mode='duckdb'): positions
# via hash(xor(hash(tok), j)) % w, counts per (row, bucket) over every
# token OCCURRENCE, estimate = min over the d row counts. Top-20 by
# (exact count DESC, tok) mirrors heavy_hitters' tie order.
ORACLE_SQL['q_cms_token_counts'] = """
    WITH toks AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL),
    exact AS MATERIALIZED (
      SELECT tok, count(*)::BIGINT AS n FROM toks GROUP BY tok),
    top AS MATERIALIZED (
      SELECT tok, n FROM exact ORDER BY n DESC, tok LIMIT 20),
    pos AS MATERIALIZED (
      SELECT e.tok, r.range AS j,
             (hash(xor(hash(e.tok), r.range::UBIGINT)) % 16384)::BIGINT
               AS p
      FROM exact e CROSS JOIN range(4) r),
    counts AS MATERIALIZED (
      SELECT pp.j, pp.p, sum(e.n)::BIGINT AS c
      FROM pos pp JOIN exact e USING (tok)
      GROUP BY pp.j, pp.p)
    SELECT top.tok AS tok, top.n AS n,
           (SELECT min(cc.c) FROM pos pp
            JOIN counts cc ON pp.j = cc.j AND pp.p = cc.p
            WHERE pp.tok = top.tok) AS approx_n
    FROM top ORDER BY tok
"""


def q_feature_matrix_events(sf_dir: str):
    """Point-in-time training-matrix assembly: FIVE leakage-free
    features per event — gap to previous event (us), count of strictly
    prior events, expanding prior mean of value (fixed-point), latest
    STRICTLY-prior click value (lag of the at-or-before ffill — row i-1's
    fill is exactly "latest click before i"), and the gap-based session
    index — all from ONE per-user hash exchange + segmented kernels.
    This is the engine's core composition claim: a feature matrix is
    one exchange wide, not one exchange per feature. Zero temporal
    leakage by construction (every window ends at 1 PRECEDING / uses
    the prior row's fill). NULL-ts rows have no event time — excluded
    on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        # gap to previous event (NULL on first row of each user)
        gap, has_prev = W.time_since_prev_us(ts_us, starts)
        # strictly-prior row count = position within group
        gs_idx = np.arange(len(ts_us)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(ts_us)), 0))
        # expanding prior mean of value, exact fixed-point
        v6f = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        nn = ~np.isnan(v6f)
        v6 = np.where(nn, v6f, 0.0).astype(np.int64)
        nni = nn.astype(np.int64)
        prior6 = W.running_sum(v6, starts) - v6
        prior_n = W.running_sum(nni, starts) - nni
        with np.errstate(invalid='ignore', divide='ignore'):
            te = np.floor(prior6.astype(np.float64)
                          / np.maximum(prior_n, 1) + 0.5) / 1e6
        # latest strictly-prior click value: lag of the at-or-before fill
        etype = tbl.column('event_type').combine_chunks()
        val = tbl.column('value').combine_chunks()
        click_val = pc.if_else(pc.equal(etype, 'click'), val,
                               pa.scalar(None, pa.float64()))
        at_or_before = W.ffill_column(
            pc.cast(click_val, pa.float64()), starts)
        last_click = W.lag_column(at_or_before, starts, 1)
        # gap-based session index (1-based, 30-min threshold)
        is_new, _ = W.sessionize(ts_us, starts, GAP_US)
        sidx = W.running_sum(is_new.astype(np.int64), starts)
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'gap_us': pa.array(gap, mask=~has_prev),
            'n_prior': pa.array(gs_idx.astype(np.int64)),
            'te_prior': pa.array(te, mask=(prior_n == 0)),
            'last_click_value': last_click,
            'session_idx': pa.array(sidx),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_feature_matrix_events'] = q_feature_matrix_events
ORACLE_SQL['q_feature_matrix_events'] = f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, value, ts,
             epoch_us(ts) AS tus,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL),
    g AS (
      SELECT *,
             tus - lag(tus) OVER wo                    AS gap_us,
             cast(row_number() OVER wo - 1 AS BIGINT)  AS n_prior,
             CASE WHEN count(v6) OVER wp > 0 THEN
               floor(cast(sum(v6) OVER wp AS DOUBLE)
                     / count(v6) OVER wp + 0.5) / 1e6
             END                                       AS te_prior,
             last_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS) OVER wp          AS last_click_value
      FROM s
      WINDOW wo AS (PARTITION BY user_id ORDER BY tus, event_id),
             wp AS (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, gap_us, n_prior, te_prior,
           last_click_value,
           sum(CASE WHEN gap_us IS NULL OR gap_us > {GAP_US}
                    THEN 1 ELSE 0 END) OVER
             (PARTITION BY user_id ORDER BY tus, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                                       AS session_idx
    FROM g ORDER BY event_id
"""


def q_scd2_events(sf_dir: str):
    """SCD2 state compression: consecutive runs of the same event_type
    per user collapse into validity intervals [valid_from, valid_to),
    valid_to = next run's start (NULL on the open/current run) — the
    classic change-data-capture compaction (reference has no engine
    analogue; standard warehouse op). ONE per-user hash exchange; run
    detection is a vectorized factorize-diff (NULL states compare equal
    to each other, matching SQL IS NOT DISTINCT FROM). NULL-ts rows
    have no position in history — excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'], require=('ts',))
    out_schema = pa.schema([
        ('user_id', pa.int64()), ('run_seq', pa.int64()),
        ('state', pa.string()),
        ('valid_from', pa.timestamp('us')),
        ('valid_to', pa.timestamp('us')), ('n_events', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        et = tbl.column('event_type').combine_chunks()
        # factorize: equal values share a code and ALL nulls share -1 —
        # exactly SQL "IS NOT DISTINCT FROM" run semantics
        codes = pd.factorize(et.to_pandas(), use_na_sentinel=True)[0]
        new_run = starts.copy()
        new_run[1:] |= codes[1:] != codes[:-1]
        ridx = np.nonzero(new_run)[0]
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        vfrom = ts_us[ridx]
        ru = users[ridx]
        nruns = len(ridx)
        vto = np.zeros(nruns, dtype=np.int64)
        has_to = np.zeros(nruns, dtype=bool)
        if nruns > 1:
            vto[:-1] = vfrom[1:]
            has_to[:-1] = ru[:-1] == ru[1:]
        lens = np.diff(np.append(ridx, n)).astype(np.int64)
        # 1-based run ordinal within user
        ustart = np.nonzero(starts[ridx])[0]
        per_user = np.diff(np.append(ustart, nruns))
        seq = np.arange(nruns, dtype=np.int64) \
            - np.repeat(ustart, per_user) + 1
        return pa.table({
            'user_id': pa.array(ru, type=pa.int64()),
            'run_seq': pa.array(seq),
            'state': et.take(pa.array(ridx)),
            'valid_from': pc.cast(pa.array(vfrom), pa.timestamp('us')),
            'valid_to': pc.cast(pa.array(vto, mask=~has_to),
                                pa.timestamp('us')),
            'n_events': pa.array(lens),
        }, schema=out_schema)

    return _per_user(ds, fn).sort(['user_id', 'run_seq'])


QUERIES['q_scd2_events'] = q_scd2_events
ORACLE_SQL['q_scd2_events'] = """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE ts IS NOT NULL),
    m AS (
      SELECT *,
             CASE WHEN row_number() OVER w = 1
                    OR event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT *, cast(sum(is_new) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_seq
      FROM m),
    agg AS (
      SELECT user_id, run_seq, min(event_type) AS state,
             min(ts) AS valid_from, count(*) AS n_events
      FROM r GROUP BY user_id, run_seq)
    SELECT user_id, run_seq, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_seq)
             AS valid_to,
           n_events
    FROM agg ORDER BY user_id, run_seq
"""


def q_transitions_events(sf_dir: str):
    """Markov transition matrix over the event stream: per-user
    (event_type -> next event_type) pairs, global transition counts,
    row-normalized probabilities and the per-source transition entropy
    (sequence-mining primitive for behavioral features). The pair
    extraction is one per-user exchange; counts collapse via
    bucket_aggregate; the final matrix is vocab^2-bounded, finished
    driver-side. Fixed-point discipline: p = floor(n/tot*1e6+0.5)/1e6
    and entropy terms are micro-unit ints summed exactly — identical
    on both engines. NULL event_types are legal states (SQL group
    keys); NULL-ts rows are excluded on both engines."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'], require=('ts',))
    pair_schema = pa.schema([('src', pa.string()), ('dst', pa.string()),
                             ('_one', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return pair_schema.empty_table()
        et = tbl.column('event_type').combine_chunks()
        valid = np.zeros(n, dtype=bool)
        valid[:-1] = ~starts[1:]
        idx = np.nonzero(valid)[0]
        return pa.table({
            'src': et.take(pa.array(idx)),
            'dst': et.take(pa.array(idx + 1)),
            '_one': pa.array(np.ones(len(idx), dtype=np.int64)),
        }, schema=pair_schema)

    pairs = _per_user(ds, fn)
    counts = bucket_aggregate(pairs, ['src', 'dst'],
                              {'n': ('_one', 'sum')}, num_buckets=8)
    dfp = _small_df(counts, ['src', 'dst', 'n'])
    out_cols = ['src', 'dst', 'n', 'p', 'src_entropy']
    if len(dfp) == 0:
        return pd.DataFrame({'src': pd.Series(dtype=object),
                             'dst': pd.Series(dtype=object),
                             'n': pd.Series(dtype=np.int64),
                             'p': pd.Series(dtype=np.float64),
                             'src_entropy': pd.Series(dtype=np.float64)})
    nv = dfp['n'].to_numpy(dtype=np.int64)
    tot = dfp.groupby('src', dropna=False)['n'].transform('sum')\
        .to_numpy(dtype=np.int64)
    p = np.floor(nv.astype(np.float64) / tot * 1e6 + 0.5) / 1e6
    # p micro-floors to exactly 0 when a pair's share is < 5e-7 —
    # its entropy contribution limits to 0, so pin it there (-0*ln(0)
    # is NaN and would poison the whole src group on both engines)
    safe = np.where(p > 0, p, 1.0)
    hm = np.where(p > 0,
                  np.floor((-safe * np.log(safe)) * 1e6 + 0.5),
                  0.0).astype(np.int64)
    dfp = dfp.assign(p=p, __hm=hm)
    ent = dfp.groupby('src', dropna=False)['__hm'].transform('sum')\
        .to_numpy(dtype=np.int64)
    dfp['src_entropy'] = ent.astype(np.float64) / 1e6
    dfp = dfp[out_cols].sort_values(['src', 'dst'], na_position='last')
    return dfp.reset_index(drop=True)


QUERIES['q_transitions_events'] = q_transitions_events
ORACLE_SQL['q_transitions_events'] = """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE ts IS NOT NULL),
    nxt AS (
      SELECT event_type AS src,
             lead(event_type) OVER w AS dst,
             lead(event_id) OVER w AS nxt_id
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    c AS (
      SELECT src, dst, count(*) AS n
      FROM nxt WHERE nxt_id IS NOT NULL GROUP BY src, dst),
    t AS (
      SELECT src, dst, n,
             cast(sum(n) OVER (PARTITION BY src) AS BIGINT) AS tot
      FROM c),
    sc AS (
      SELECT src, dst, n,
             floor(cast(n AS DOUBLE) / tot * 1e6 + 0.5) / 1e6 AS p
      FROM t),
    h AS (
      SELECT src, dst, n, p,
             CASE WHEN p > 0
                  THEN cast(floor((-p * ln(p)) * 1e6 + 0.5) AS BIGINT)
                  ELSE 0 END AS hm
      FROM sc)
    SELECT src, dst, n, p,
           cast(sum(hm) OVER (PARTITION BY src) AS DOUBLE) / 1e6
             AS src_entropy
    FROM h ORDER BY src, dst
"""


def q_bm25_docs(sf_dir: str):
    """BM25 (Okapi, k1=1.5, b=0.75) relevance of every document against
    the corpus's 8 highest-df tokens — the doc-length-normalized
    retrieval score TF-IDF lacks. Shape: the (doc, tok) term counts are
    built ONCE (one high-cardinality exchange); df census and the tiny
    term list broadcast; a doc-bucket exchange computes doc length +
    per-term scores + the per-doc rollup without re-touching text.
    Parity discipline: tf/df/dl/N/tot are exact ints, each term score
    is a double expression written in the SAME association order as the
    oracle then floored to micro-units, and per-doc totals are int
    sums — order-independent on both engines."""
    import ray as _ray
    from ..stages.aggregate import bucket_aggregate, global_topk
    from ..stages.conversations import bucket_exchange
    K1, B, N_TERMS = 1.5, 0.75, 8
    out_schema = pa.schema([('doc_id', pa.int64()),
                            ('n_hits', pa.int64()),
                            ('score', pa.float64())])
    n_docs = _nonnull_count(sf_dir, 'documents', 'text')
    if n_docs == 0:
        return out_schema.empty_table().to_pandas()
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    # the high-cardinality (doc, token) exchange is HASH-KEYED (16-byte
    # int rows); token strings only ride the Heaps'-bounded vocab
    # census, joined in for the tiny term pick below
    tf = bucket_aggregate(
        ds.map_batches(_tok_explode_hashed, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['doc_id', 'th'], {'tf': ('th', 'count')},
        num_buckets=16).materialize()
    # total corpus tokens (for avgdl) — exact int Dataset aggregate
    tot_tokens = tf.sum('tf') or 0
    if tot_tokens == 0:
        return out_schema.empty_table().to_pandas()
    # query terms: top-df tokens, ties broken by token asc (identical
    # deterministic pick in the oracle's ORDER BY df DESC, tok LIMIT).
    # the df census is hash-keyed; strings attach via one vocab-sized
    # hash_join, then global_topk local-prunes per block — only
    # per-block top-8 candidates reach the driver
    from ..stages.joins import hash_join
    dfh = bucket_aggregate(tf, ['th'], {'df': ('th', 'count')},
                           num_buckets=4)
    dfj = hash_join(
        dfh, _vocab_census(ds), on='th', num_buckets=4,
        left_schema=pa.schema([('th', pa.int64()), ('df', pa.int64())]),
        right_schema=pa.schema([('th', pa.int64()),
                                ('tok', pa.string())]))
    dfp = _small_df(global_topk(
        dfj, [('df', 'descending'), ('tok', 'ascending')], N_TERMS),
        ['th', 'tok', 'df'])
    ref = _ray.put((pa.array(dfp['th'].to_numpy(dtype=np.int64),
                             type=pa.int64()),
                    dfp['df'].to_numpy(dtype=np.int64)))

    def score(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        keys, dfs = _ray.get(ref)
        dl = tbl.group_by(['doc_id']).aggregate([('tf', 'sum')])
        di = pc.index_in(tbl.column('doc_id'),
                         value_set=dl.column('doc_id'))
        dlv = dl.column('tf_sum').take(di).to_numpy(
            zero_copy_only=False).astype(np.float64)
        ti = pc.index_in(tbl.column('th'), value_set=keys)
        hit = pc.is_valid(ti).to_numpy(zero_copy_only=False)
        if not hit.any():
            return out_schema.empty_table()
        tiv = ti.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        tfv = tbl.column('tf').to_numpy(
            zero_copy_only=False)[hit].astype(np.float64)
        dlv = dlv[hit]
        dfv = dfs[tiv].astype(np.float64)
        # association order mirrors the oracle expression EXACTLY
        avgdl = tot_tokens / n_docs
        idf = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
        term = idf * (tfv * (K1 + 1.0)) \
            / (tfv + K1 * (1.0 - B + B * dlv / avgdl))
        micro = np.floor(term * 1e6 + 0.5).astype(np.int64)
        hits = pa.table({
            'doc_id': tbl.column('doc_id').filter(pa.array(hit)),
            'micro': pa.array(micro),
            '_one': pa.array(np.ones(len(micro), dtype=np.int64))})
        agg = hits.group_by(['doc_id']).aggregate(
            [('_one', 'sum'), ('micro', 'sum')])
        return pa.table({
            'doc_id': pc.cast(agg.column('doc_id'), pa.int64()),
            'n_hits': pc.cast(agg.column('_one_sum'), pa.int64()),
            'score': pc.divide(pc.cast(agg.column('micro_sum'),
                                       pa.float64()), pa.scalar(1e6)),
        }, schema=out_schema)

    out = bucket_exchange(tf, 'doc_id', score, num_buckets=16)
    return out.sort('doc_id')


QUERIES['q_bm25_docs'] = q_bm25_docs
ORACLE_SQL['q_bm25_docs'] = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE text IS NOT NULL),
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM docs),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
           GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM tf
           GROUP BY doc_id),
    stats AS (SELECT (SELECT count(*) FROM docs) AS n,
                     (SELECT cast(sum(dl) AS BIGINT) FROM dl) AS tot),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    terms AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 8),
    scored AS (
      SELECT tf.doc_id,
             cast(floor(
               ln((cast(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.5)
               / (tf + 1.5 * (1.0 - 0.75
                              + 0.75 * dl / (cast(tot AS DOUBLE) / n)))
               * 1e6 + 0.5) AS BIGINT) AS micro
      FROM tf JOIN terms USING (tok) JOIN dl USING (doc_id)
      CROSS JOIN stats)
    SELECT doc_id, count(*) AS n_hits,
           cast(sum(micro) AS DOUBLE) / 1e6 AS score
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def q_rolling_median_events(sf_dir: str):
    """Rolling MEDIAN of value over the last 10 events per user — the
    windowed order statistic the running-sum family can't express.
    ONE per-user exchange; the kernel materializes a (rows x 10)
    lagged fixed-point matrix (null-skipping sort, middle picks), so
    cost is rows x window, fully vectorized. Parity: v6 ints are exact
    in double, so numpy's (a+b)/2 and DuckDB's quantile_cont
    interpolation a+(b-a)*0.5 agree BIT-EXACTLY (every intermediate is
    an exact integer-valued double); NULL values are skipped, NULL-ts
    rows excluded on both engines."""
    WIN = 10
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts',))

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return pa.schema([('event_id', pa.int64()),
                              ('user_id', pa.int64()),
                              ('n_win', pa.int64()),
                              ('med', pa.float64())]).empty_table()
        v6f = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.float64)   # NaN where null
        m = np.empty((n, WIN), dtype=np.float64)
        m[:, 0] = v6f
        for j in range(1, WIN):
            idx, ok = W.lag_indices(starts, j)
            m[:, j] = np.where(ok, v6f[idx], np.nan)
        m.sort(axis=1)                                 # NaN sorts last
        cnt = WIN - np.isnan(m).sum(axis=1)
        has = cnt > 0
        safe = np.maximum(cnt, 1)
        lo = m[np.arange(n), (safe - 1) // 2]
        hi = m[np.arange(n), safe // 2]
        med = (lo + hi) / 2.0 / 1e6
        return pa.table({
            'event_id': tbl.column('event_id'),
            'user_id': tbl.column('user_id'),
            'n_win': pa.array(cnt.astype(np.int64)),
            'med': pa.array(med, mask=~has),
        })

    return _per_user(ds, fn).sort('event_id')


QUERIES['q_rolling_median_events'] = q_rolling_median_events
ORACLE_SQL['q_rolling_median_events'] = """
    WITH s AS (
      SELECT event_id, user_id, ts,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL)
    SELECT event_id, user_id,
           cast(count(v6) OVER w AS BIGINT) AS n_win,
           median(v6) OVER w / 1e6 AS med
    FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""


def q_histogram_events(sf_dir: str):
    """Equi-width histogram of value per event_type over GLOBAL 20-bin
    edges — profiling/binning primitive. Two passes: a tiny per-batch
    min/max partial (scalar exchange), then one low-cardinality
    pre_aggregate on (event_type, bin). Bin assignment is pure int64
    arithmetic ((v6-lo)*20 // span) — exact on both engines; NULL
    values have no bin (excluded both sides), NULL event_type is a
    legal group key."""
    from ..stages.aggregate import pre_aggregate as _pre
    NBINS = 20
    ds = _read(sf_dir, 'events', ['event_type', 'value'],
               require=('value',))
    out_schema = pa.schema([('event_type', pa.string()),
                            ('bin', pa.int64()), ('n', pa.int64())])

    def mm(tbl: pa.Table) -> pa.Table:
        v6 = _fixed6(tbl.column('value'))
        return pa.table({'lo': pa.array([pc.min(v6).as_py()],
                                        type=pa.int64()),
                         'hi': pa.array([pc.max(v6).as_py()],
                                        type=pa.int64())})

    mmdf = _small_df(ds.map_batches(mm, batch_format='pyarrow',
                                    zero_copy_batch=True), ['lo', 'hi'])
    mmdf = mmdf.dropna()
    if len(mmdf) == 0:
        return out_schema.empty_table().to_pandas()
    lo = int(mmdf['lo'].min())
    span = int(mmdf['hi'].max()) - lo + 1

    def binify(tbl: pa.Table) -> pa.Table:
        v6 = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)
        b = (v6 - lo) * NBINS // span
        return pa.table({'event_type': tbl.column('event_type'),
                         'bin': pa.array(b.astype(np.int64)),
                         '_one': pa.array(np.ones(len(b),
                                                  dtype=np.int64))})

    binned = ds.map_batches(binify, batch_format='pyarrow',
                            zero_copy_batch=True)
    out = _pre(binned, ['event_type', 'bin'], {'n': ('_one', 'sum')})
    return _sort_ns(out, ['event_type', 'bin'], str_cols=('event_type',))


QUERIES['q_histogram_events'] = q_histogram_events
ORACLE_SQL['q_histogram_events'] = """
    WITH s AS (
      SELECT event_type, cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE value IS NOT NULL),
    m AS (SELECT min(v6) AS lo, max(v6) - min(v6) + 1 AS span FROM s)
    SELECT event_type, cast((v6 - lo) * 20 // span AS BIGINT) AS bin,
           count(*) AS n
    FROM s CROSS JOIN m GROUP BY event_type, bin
    ORDER BY event_type NULLS LAST, bin
"""


def _pareto_keep(s6: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D Pareto frontier (maximize both): a row
    survives iff no other row weakly dominates it with one strict
    inequality; duplicate (s6, n) points all survive. Vectorized: sort
    by (s desc, n desc), per-equal-s group max, prefix max over
    strictly-greater s."""
    m = len(s6)
    # ascending lexsort reversed, NOT lexsort((-n, -s6)): negating
    # int64.min overflows and corrupts the order at the boundary
    order = np.lexsort((n, s6))[::-1]
    ss, nn = s6[order], n[order]
    new_s = np.ones(m, dtype=bool)
    new_s[1:] = ss[1:] != ss[:-1]
    gid = np.cumsum(new_s) - 1
    gvals = nn[new_s]                      # per-group max n (n desc)
    run = np.maximum.accumulate(gvals)
    prev = np.empty_like(run)
    prev[1:] = run[:-1]
    # the first s-group has NO strictly-greater-s predecessor: gate on
    # group index instead of a sentinel value (int64.min as sentinel
    # would collide with a genuine n == int64.min frontier point)
    prev[0] = 0
    first = gid == 0
    keep_sorted = (nn == gvals[gid]) \
        & (first | (gvals[gid] > prev[gid]))
    keep = np.zeros(m, dtype=bool)
    keep[order] = keep_sorted
    return keep


def q_pareto_users(sf_dir: str):
    """Pareto frontier (skyline) of users over (total spend, activity):
    a user survives iff no other user has >= on both axes with one
    strict. Distributed dominance pruning: per-user aggregate (one
    high-cardinality exchange), then each BLOCK computes its local
    frontier — frontier(union of partial frontiers) == frontier(all),
    so only the tiny partials reach the final merge. Final merge is
    one small task (tree-merge it if frontiers ever grow). Users with
    no non-null value have no position on the spend axis — excluded
    on both engines."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['user_id', 'value'],
               require=('value',))

    def v6(tbl: pa.Table) -> pa.Table:
        return pa.table({'user_id': tbl.column('user_id'),
                         'v6': _fixed6(tbl.column('value'))})

    per_user = bucket_aggregate(
        ds.map_batches(v6, batch_format='pyarrow', zero_copy_batch=True),
        ['user_id'], {'s6': ('v6', 'sum'), 'n': ('v6', 'count')},
        num_buckets=16)

    def local_frontier(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        keep = _pareto_keep(
            tbl.column('s6').to_numpy(zero_copy_only=False)
            .astype(np.int64),
            tbl.column('n').to_numpy(zero_copy_only=False)
            .astype(np.int64))
        return tbl.filter(pa.array(keep))

    partial = per_user.map_batches(local_frontier, batch_format='pyarrow',
                                   zero_copy_batch=True)
    dfp = _small_df(partial, ['user_id', 's6', 'n'])
    out_schema = pa.schema([('user_id', pa.int64()),
                            ('spend', pa.float64()), ('n', pa.int64())])
    if len(dfp) == 0:
        return out_schema.empty_table().to_pandas()
    s6 = dfp['s6'].to_numpy(dtype=np.int64)
    n = dfp['n'].to_numpy(dtype=np.int64)
    keep = _pareto_keep(s6, n)
    out = pd.DataFrame({'user_id': dfp['user_id'].to_numpy()[keep],
                        'spend': s6[keep].astype(np.float64) / 1e6,
                        'n': n[keep]})
    return out.sort_values('user_id').reset_index(drop=True)


QUERIES['q_pareto_users'] = q_pareto_users
ORACLE_SQL['q_pareto_users'] = """
    WITH u AS (
      SELECT user_id,
             cast(sum(cast(floor(value * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS s6,
             count(value) AS n
      FROM events WHERE value IS NOT NULL GROUP BY user_id)
    SELECT user_id, cast(s6 AS DOUBLE) / 1e6 AS spend, n
    FROM u a
    WHERE NOT EXISTS (
      SELECT 1 FROM u b
      WHERE b.s6 >= a.s6 AND b.n >= a.n
        AND (b.s6 > a.s6 OR b.n > a.n))
    ORDER BY user_id
"""


def q_attribution_events(sf_dir: str):
    """First-touch / last-touch revenue attribution: each user's total
    purchase value is credited to the event_type of their FIRST and
    LAST event — the standard marketing-channel rollup. ONE per-user
    exchange emits a (first, last, rev6) row per user; the channel
    rollup is vocabulary-bounded (conditional-aggregate pivot,
    driver-side like every broadcast-census). NULL first/last states
    are legal channels; NULL-ts rows have no order — excluded on both
    engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'],
               require=('ts',))
    side_schema = pa.schema([('channel', pa.string()),
                             ('side', pa.string()),
                             ('rev6', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return side_schema.empty_table()
        et = tbl.column('event_type').combine_chunks()
        first_i = np.nonzero(starts)[0]
        last_i = np.append(first_i[1:] - 1, n - 1)
        is_p = pc.equal(et, 'purchase')
        v6f = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.float64)   # NaN where null
        pmask = pc.fill_null(is_p, False).to_numpy(zero_copy_only=False) \
            & ~np.isnan(v6f)
        pv = np.where(pmask, v6f, 0).astype(np.int64)
        rev = np.add.reduceat(pv, first_i).astype(np.int64)
        fch = et.take(pa.array(first_i))
        lch = et.take(pa.array(last_i))
        nu = len(first_i)
        return pa.table({
            'channel': pa.chunked_array([fch, lch]).combine_chunks(),
            'side': pa.array(['first'] * nu + ['last'] * nu,
                             type=pa.string()),
            'rev6': pa.array(np.concatenate([rev, rev])),
        }, schema=side_schema)

    sides = _per_user(ds, fn)
    # collapse to (channel, side) DISTRIBUTED — only the vocab-bounded
    # census reaches the driver, never a per-user row
    census = pre_aggregate(sides, ['channel', 'side'],
                           {'n': ('rev6', 'count'),
                            'rev6s': ('rev6', 'sum')})
    dfp = _small_df(census, ['channel', 'side', 'n', 'rev6s'])
    out_cols = ['channel', 'n_first', 'n_last', 'first_rev', 'last_rev']
    if len(dfp) == 0:
        return pd.DataFrame({
            'channel': pd.Series(dtype=object),
            'n_first': pd.Series(dtype=np.int64),
            'n_last': pd.Series(dtype=np.int64),
            'first_rev': pd.Series(dtype=np.float64),
            'last_rev': pd.Series(dtype=np.float64)})
    g = dfp.groupby('channel', dropna=False)
    agg = g.apply(lambda d: pd.Series({
        'n_first': np.int64(d.loc[d['side'] == 'first', 'n']
                            .to_numpy(dtype=np.int64).sum()),
        'n_last': np.int64(d.loc[d['side'] == 'last', 'n']
                           .to_numpy(dtype=np.int64).sum()),
        'first_rev': d.loc[d['side'] == 'first', 'rev6s']
            .to_numpy(dtype=np.int64).sum() / 1e6,
        'last_rev': d.loc[d['side'] == 'last', 'rev6s']
            .to_numpy(dtype=np.int64).sum() / 1e6,
    }), include_groups=False).reset_index()
    agg['n_first'] = agg['n_first'].astype(np.int64)
    agg['n_last'] = agg['n_last'].astype(np.int64)
    agg = agg[out_cols].sort_values('channel', na_position='last')
    return agg.reset_index(drop=True)


QUERIES['q_attribution_events'] = q_attribution_events
ORACLE_SQL['q_attribution_events'] = """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type, value
      FROM events WHERE ts IS NOT NULL),
    w AS (
      SELECT user_id, event_type,
             row_number() OVER wo AS rn,
             count(*) OVER (PARTITION BY user_id) AS cnt
      FROM e WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)),
    rev AS (
      SELECT user_id,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                               AND value IS NOT NULL THEN
                  cast(floor(value * 1e6 + 0.5) AS BIGINT) END),
                  0) AS rev6
      FROM e GROUP BY user_id),
    u AS (
      SELECT w.user_id,
             min(CASE WHEN rn = 1 THEN event_type END) AS first_ch,
             min(CASE WHEN rn = cnt THEN event_type END) AS last_ch,
             min(rev6) AS rev6
      FROM w JOIN rev USING (user_id) GROUP BY w.user_id),
    sides AS (
      SELECT first_ch AS channel, 'first' AS side, rev6 FROM u
      UNION ALL
      SELECT last_ch, 'last', rev6 FROM u)
    SELECT channel,
           cast(sum(CASE WHEN side = 'first' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_first,
           cast(sum(CASE WHEN side = 'last' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_last,
           cast(sum(CASE WHEN side = 'first' THEN rev6 ELSE 0 END)
                AS DOUBLE) / 1e6 AS first_rev,
           cast(sum(CASE WHEN side = 'last' THEN rev6 ELSE 0 END)
                AS DOUBLE) / 1e6 AS last_rev
    FROM sides GROUP BY channel ORDER BY channel NULLS LAST
"""


def _tok_explode(tbl: pa.Table) -> pa.Table:
    """(doc_id, tok) rows from whitespace-split text — the shared
    tokenizer of the tf/df corpus statistics (tfidf, bm25, keywords,
    inverted index); one definition so split semantics cannot drift."""
    words = pc.split_pattern(
        pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
    wc = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rep = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), wc)
    return pa.table({'doc_id': tbl.column('doc_id').take(rep),
                     'tok': words.flatten()})


def _tok_explode_hashed(tbl: pa.Table) -> pa.Table:
    """(doc_id, th) rows — _tok_explode with the token dictionary-
    encoded to its 64-bit hash (functions/text.py:hash_shingles), so
    the high-cardinality (doc, token) exchange moves fixed 16-byte int
    rows instead of strings (BASELINE.md named token-string exchange
    bytes the 100x limiter for the text-stat family). Token STRINGS
    travel only through _vocab_census (once per block-distinct token),
    which also detects hash collisions loudly."""
    from ..functions.text import hash_shingles
    words = pc.split_pattern(
        pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
    wc = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rep = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), wc)
    th = hash_shingles(
        words.flatten().to_numpy(zero_copy_only=False)).view(np.int64)
    return pa.table({'doc_id': tbl.column('doc_id').take(rep),
                     'th': pa.array(th)})


def _vocab_census(ds, num_buckets: int = 8, with_count: bool = False):
    """(th, tok[, c]) token dictionary Dataset: per-batch DISTINCT
    (hash, token) rows -> one th-keyed aggregate. Strings cross the
    wire once per (block, distinct token) — the Heaps'-law bounded
    volume — instead of riding every (doc, token) exchange row. With
    ``with_count`` the same exchange also carries the per-block
    occurrence count, so a caller needing the unigram census gets
    counts AND strings for one exchange. A 64-bit collision (two
    tokens, one hash) would silently merge corpus statistics; the
    census carries min AND max token per hash and RAISES on
    disagreement (the semdedup cluster_rows_max discipline: loud,
    not wrong)."""
    from ..functions.text import hash_shingles
    from ..stages.aggregate import bucket_aggregate

    def explode(tbl: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
        flat = words.flatten()
        vc = pc.value_counts(flat)
        toks = vc.field('values')
        th = hash_shingles(
            toks.to_numpy(zero_copy_only=False)).view(np.int64)
        cols = {'th': pa.array(th), 'tok': toks}
        if with_count:
            cols['c'] = pc.cast(vc.field('counts'), pa.int64())
        return pa.table(cols)

    aggs = {'tok': ('tok', 'min'), 'tok_chk': ('tok', 'max')}
    if with_count:
        aggs['c'] = ('c', 'sum')
    census = bucket_aggregate(
        ds.map_batches(explode, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['th'], aggs, num_buckets=num_buckets)

    def check(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows and not pc.all(
                pc.equal(tbl.column('tok'),
                         tbl.column('tok_chk'))).as_py():
            bad = tbl.filter(pc.invert(pc.equal(
                tbl.column('tok'), tbl.column('tok_chk'))))
            raise ValueError(
                'token hash collision: '
                f"{bad.column('tok')[0].as_py()!r} vs "
                f"{bad.column('tok_chk')[0].as_py()!r} share a 64-bit "
                'hash — the hashed text-stat exchange cannot key this '
                'corpus; widen the hash or fall back to string keys')
        return tbl.drop_columns(['tok_chk'])

    return census.map_batches(check, batch_format='pyarrow')


def _bigram_explode(tbl: pa.Table, with_doc: bool,
                    hashed: bool = False) -> pa.Table:
    """Adjacent token pairs per document, vectorized: flatten the
    split-token lists once, then (a, b) = (flat[:-1], flat[1:]) masked
    to within-document positions. ``hashed=True`` emits 64-bit token
    hashes (int64 a/b) instead of strings — one hash pass over the
    flat token array, pairs by shift — so downstream bigram exchanges
    move 24-byte int rows; see _tok_explode_hashed for the
    string-volume rationale and _vocab_census for recovering strings."""
    words = pc.split_pattern(
        pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
    wc = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    n = len(flat)
    doc_of = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), wc)
    # position j starts a bigram iff j+1 is in the same doc
    ok = np.zeros(n, dtype=bool)
    if n > 1:
        ok[:-1] = doc_of[1:] == doc_of[:-1]
    idx = np.nonzero(ok)[0]
    if hashed:
        from ..functions.text import hash_shingles
        h = hash_shingles(
            flat.to_numpy(zero_copy_only=False)).view(np.int64)
        cols = {'a': pa.array(h[idx]), 'b': pa.array(h[idx + 1])}
    else:
        cols = {'a': flat.take(pa.array(idx)),
                'b': flat.take(pa.array(idx + 1))}
    if with_doc:
        cols = {'doc_id': tbl.column('doc_id').take(doc_of[idx]), **cols}
    cols['_one'] = pa.array(np.ones(len(idx), dtype=np.int64))
    return pa.table(cols)


def q_pmi_bigrams_docs(sf_dir: str):
    """Collocation mining: top-20 corpus bigrams by count with their
    pointwise mutual information ln((n/P) / ((ca/T)(cb/T))). Both
    censuses are HASH-KEYED (int64 token hashes): the bigram exchange
    moves 24-byte int rows, strings ride only the Heaps'-bounded vocab
    census (which doubles as the unigram count census — one exchange).
    The top-20 pick is threshold-safe under hashing: global_topk with
    the HASH tiebreak yields a count floor t (every string-ordered
    top-20 member must have n >= t — all 20 hash-picked rows outrank
    anything below t on count alone), the census is filtered to
    n >= t distributed, and only those boundary candidates reach the
    driver, where the oracle's (n DESC, a, b) STRING order decides the
    final 20. All counts exact ints; PMI doubles evaluate the same
    expression in the same association order on both engines."""
    from ..stages.aggregate import bucket_aggregate, global_topk
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))
    out_cols = ['a', 'b', 'n', 'pmi']
    empty = pd.DataFrame({'a': pd.Series(dtype=object),
                          'b': pd.Series(dtype=object),
                          'n': pd.Series(dtype=np.int64),
                          'pmi': pd.Series(dtype=np.float64)})
    uni = _vocab_census(ds, num_buckets=16, with_count=True).materialize()
    total_t = uni.sum('c') or 0
    if total_t == 0:
        return empty
    bigrams = ds.map_batches(
        lambda t: _bigram_explode(t, with_doc=False, hashed=True),
        batch_format='pyarrow', zero_copy_batch=True)
    bc = bucket_aggregate(bigrams, ['a', 'b'], {'n': ('_one', 'sum')},
                          num_buckets=16).materialize()
    total_p = bc.sum('n') or 0
    if total_p == 0:
        return empty
    toph = _small_df(global_topk(bc, [('n', 'descending'),
                                      ('a', 'ascending'),
                                      ('b', 'ascending')], 20),
                     ['a', 'b', 'n'])
    t_min = int(toph['n'].min())
    cand = _small_df(
        bc.map_batches(
            lambda t, _t=t_min: t.filter(
                pc.greater_equal(t.column('n'), _t)),
            batch_format='pyarrow', zero_copy_batch=True),
        ['a', 'b', 'n'])
    need = pa.array(np.unique(np.concatenate(
        [cand['a'].to_numpy(dtype=np.int64),
         cand['b'].to_numpy(dtype=np.int64)])), type=pa.int64())

    def pick(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.is_in(tbl.column('th'), value_set=need))

    cdf = _small_df(uni.map_batches(pick, batch_format='pyarrow',
                                    zero_copy_batch=True),
                    ['th', 'tok', 'c'])
    smap = dict(zip(cdf['th'].astype(np.int64), cdf['tok']))
    cmap = dict(zip(cdf['th'].astype(np.int64), cdf['c'].astype(np.int64)))
    cand['a_s'] = cand['a'].map(smap)
    cand['b_s'] = cand['b'].map(smap)
    top = cand.sort_values(
        ['n', 'a_s', 'b_s'], ascending=[False, True, True],
        kind='mergesort').head(20).reset_index(drop=True)
    nv = top['n'].to_numpy(dtype=np.int64)
    ca = np.array([cmap[x] for x in top['a'].astype(np.int64)],
                  dtype=np.int64)
    cb = np.array([cmap[x] for x in top['b'].astype(np.int64)],
                  dtype=np.int64)
    top = top.assign(a=top['a_s'], b=top['b_s'])
    T, P = float(total_t), float(total_p)
    # math.log, NOT np.log: numpy's SIMD log diverges from libm by
    # 1 ulp on some inputs, and DuckDB's ln IS libm — for a raw-double
    # output column (no micro-floor to absorb the ulp) the scalar libm
    # call is the byte-exact choice (20 rows, cost irrelevant)
    import math
    pmi = np.array([math.log((n_ / P) / ((ca_ / T) * (cb_ / T)))
                    for n_, ca_, cb_ in zip(nv, ca, cb)])
    out = pd.DataFrame({'a': top['a'].to_numpy(),
                        'b': top['b'].to_numpy(), 'n': nv, 'pmi': pmi})
    return out[out_cols].reset_index(drop=True)


QUERIES['q_pmi_bigrams_docs'] = q_pmi_bigrams_docs
ORACLE_SQL['q_pmi_bigrams_docs'] = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE text IS NOT NULL),
    tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM docs),
    uni AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
    tt AS (SELECT count(*) AS t FROM tk),
    bg AS (SELECT p[1] AS a, p[2] AS b
           FROM (SELECT unnest(list_zip(l, l[2:])) AS p
                 FROM (SELECT string_split(text, ' ') AS l FROM docs))
           WHERE p[2] IS NOT NULL),
    bc AS (SELECT a, b, count(*) AS n FROM bg GROUP BY a, b),
    pt AS (SELECT count(*) AS p FROM bg),
    top AS (SELECT a, b, n FROM bc ORDER BY n DESC, a, b LIMIT 20)
    SELECT a, b, n,
           ln((cast(n AS DOUBLE) / p)
              / ((cast(ua.c AS DOUBLE) / t)
                 * (cast(ub.c AS DOUBLE) / t))) AS pmi
    FROM top
    JOIN uni ua ON ua.tok = top.a
    JOIN uni ub ON ub.tok = top.b
    CROSS JOIN tt CROSS JOIN pt
    ORDER BY n DESC, a, b
"""


def q_lm_score_docs(sf_dir: str, hot_ctx_rows: int = 1_000_000,
                    num_salts: int = 16):
    """Bigram language-model quality score per document: mean negative
    log-likelihood of the doc's bigrams under the corpus's own bigram
    model, nll(a,b) = -ln(n_ab / ctx_a) — the classic LM-based curation
    signal (low = formulaic/repetitive, high = novel). Tokens are
    HASH-ENCODED (int64) before any exchange, so the heavy (doc,a,b)
    census moves 40-byte int rows, never strings (output carries no
    tokens — no string recovery needed).

    Skew tier: the Zipf-head context ("the" holds ~7% of all bigram
    contexts) makes the default a-bucket exchange concentrate that
    share of ALL per-doc rows in one task — fine today, a memory cliff
    at 100x. An EXACT context census (map-side combined — per-a
    exchange rows are bounded by #blocks, in-bucket it sums partials)
    costs one cheap partial exchange and detects contexts whose row
    volume exceeds ``hot_ctx_rows``. Cold contexts keep the
    co-located single-exchange path; hot contexts take a SALTED pair
    join — data rows bucket on (pair, hash(doc) % num_salts), the
    per-pair model census rides replicated x num_salts (vocab-bounded
    count rows, not doc rows), ctx totals for the few hot heads come
    from the census. Both paths compute the identical micro-unit
    floor, so the output is byte-equal regardless of tiering
    (pinned in tests/test_seq_features.py::TestLmScore). Measured at
    1M Zipf docs / 32 CPUs: hot tier 21.7 s vs cold 31.7 s — the
    single hot-'a' bucket serializes ~7% of all rows into one task
    well before memory becomes the binding constraint, hence the
    1M-row default threshold."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))
    bigrams = ds.map_batches(
        lambda t: _bigram_explode(t, with_doc=True, hashed=True),
        batch_format='pyarrow', zero_copy_batch=True)
    # materialized: the census feeds the ctx census AND the scoring
    # exchange (object-store checkpoint; parquet checkpoint at 100 TB)
    dab = bucket_aggregate(bigrams, ['doc_id', 'a', 'b'],
                           {'n_dab': ('_one', 'sum')},
                           num_buckets=16).materialize()

    term_schema = pa.schema([('doc_id', pa.int64()),
                             ('contrib', pa.int64()),
                             ('n_dab', pa.int64())])

    def score_terms(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return term_schema.empty_table()
        ab = tbl.group_by(['a', 'b']).aggregate([('n_dab', 'sum')])
        ctx = ab.group_by(['a']).aggregate([('n_dab_sum', 'sum')])
        ai = pc.index_in(tbl.column('a'), value_set=ctx.column('a'))
        ctx_a = ctx.column('n_dab_sum_sum').take(ai).to_numpy(
            zero_copy_only=False).astype(np.float64)
        # n_ab lookup by NUMERIC pair code — a delimiter-joined string
        # composite is ambiguous when tokens contain the delimiter
        # (e.g. NUL inside a whitespace-split token), silently scoring
        # one pair with another's count
        ub = pc.unique(ab.column('b'))
        k = len(ub)
        a_row = ai.to_numpy(zero_copy_only=False).astype(np.int64)
        b_row = pc.index_in(tbl.column('b'), value_set=ub)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        a_ab = pc.index_in(ab.column('a'), value_set=ctx.column('a'))\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        b_ab = pc.index_in(ab.column('b'), value_set=ub)\
            .to_numpy(zero_copy_only=False).astype(np.int64)
        key_ab = a_ab * k + b_ab
        order = np.argsort(key_ab)
        pos = np.searchsorted(key_ab[order], a_row * k + b_row)
        n_ab = ab.column('n_dab_sum').to_numpy(zero_copy_only=False)\
            [order[pos]].astype(np.float64)
        n_dab = tbl.column('n_dab').to_numpy(
            zero_copy_only=False).astype(np.int64)
        micro = np.floor(-np.log(n_ab / ctx_a) * 1e6 + 0.5)\
            .astype(np.int64)
        return pa.table({'doc_id': tbl.column('doc_id'),
                         'contrib': pa.array(micro * n_dab),
                         'n_dab': pa.array(n_dab)}, schema=term_schema)

    # exact context census (ctx_a = sum of n_dab over docs and b's);
    # partial combine keeps the hot head's exchange rows at #blocks
    ctx_census = bucket_aggregate(dab, ['a'], {'ca': ('n_dab', 'sum')},
                                  num_buckets=16)
    hot_df = _small_df(
        ctx_census.map_batches(
            lambda t, _h=hot_ctx_rows: t.filter(
                pc.greater(t.column('ca'), _h)),
            batch_format='pyarrow', zero_copy_batch=True),
        ['a', 'ca'])

    if len(hot_df) == 0:
        terms = bucket_exchange(dab, 'a', score_terms, num_buckets=16)
    else:
        hot_a = np.sort(hot_df['a'].to_numpy(dtype=np.int64))
        hot_ca = hot_df.set_index('a')['ca'].astype(np.int64)\
            .reindex(hot_a).to_numpy()
        hot_set = pa.array(hot_a, type=pa.int64())
        GOLD = np.uint64(0x9E3779B97F4A7C15)
        S = int(num_salts)

        def split(tbl: pa.Table, keep_hot: bool) -> pa.Table:
            m = pc.is_in(tbl.column('a'), value_set=hot_set)
            return tbl.filter(m if keep_hot else pc.invert(m))

        cold_terms = bucket_exchange(
            dab.map_batches(lambda t: split(t, False),
                            batch_format='pyarrow', zero_copy_batch=True),
            'a', score_terms, num_buckets=16)

        hot_rows = dab.map_batches(lambda t: split(t, True),
                                   batch_format='pyarrow',
                                   zero_copy_batch=True)
        hot_ab = bucket_aggregate(hot_rows, ['a', 'b'],
                                  {'n_ab': ('n_dab', 'sum')},
                                  num_buckets=16)
        # tagged union for the salted pair join: the exchange key mixes
        # the PAIR hash with a salt — doc-derived on data rows, 0..S-1
        # replicated on model rows — so pair-hash collisions only cost
        # balance, never correctness (the in-bucket lookup re-keys on
        # the true (a, b) values)
        u_schema = pa.schema([('doc_id', pa.int64()), ('a', pa.int64()),
                              ('b', pa.int64()), ('n_dab', pa.int64()),
                              ('n_ab', pa.int64()), ('skey', pa.int64())])

        def _pair_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            ua = a.astype(np.int64).view(np.uint64)
            ub = b.astype(np.int64).view(np.uint64)
            return (ua * GOLD) ^ (ub * np.uint64(0xC2B2AE3D27D4EB4F))

        def tag_data(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return u_schema.empty_table()
            a = tbl.column('a').to_numpy(zero_copy_only=False)
            b = tbl.column('b').to_numpy(zero_copy_only=False)
            doc = tbl.column('doc_id').to_numpy(zero_copy_only=False)
            salt = ((doc.astype(np.int64).view(np.uint64) * GOLD)
                    >> np.uint64(40)) % np.uint64(S)
            skey = (_pair_hash(a, b) ^ (salt * GOLD)).view(np.int64)
            return pa.table({
                'doc_id': tbl.column('doc_id'), 'a': tbl.column('a'),
                'b': tbl.column('b'), 'n_dab': tbl.column('n_dab'),
                'n_ab': pa.nulls(tbl.num_rows, pa.int64()),
                'skey': pa.array(skey)}, schema=u_schema)

        def tag_model(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return u_schema.empty_table()
            n = tbl.num_rows
            rep = np.repeat(np.arange(n, dtype=np.int64), S)
            a = tbl.column('a').to_numpy(zero_copy_only=False)[rep]
            b = tbl.column('b').to_numpy(zero_copy_only=False)[rep]
            nab = tbl.column('n_ab').to_numpy(zero_copy_only=False)[rep]
            salt = np.tile(np.arange(S, dtype=np.uint64), n)
            skey = (_pair_hash(a, b) ^ (salt * GOLD)).view(np.int64)
            return pa.table({
                'doc_id': pa.nulls(n * S, pa.int64()),
                'a': pa.array(a.astype(np.int64)),
                'b': pa.array(b.astype(np.int64)),
                'n_dab': pa.nulls(n * S, pa.int64()),
                'n_ab': pa.array(nab.astype(np.int64)),
                'skey': pa.array(skey)}, schema=u_schema)

        tagged = hot_rows.map_batches(
            tag_data, batch_format='pyarrow', zero_copy_batch=True
        ).union(hot_ab.map_batches(
            tag_model, batch_format='pyarrow', zero_copy_batch=True))

        def hot_score(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return term_schema.empty_table()
            is_model = pc.is_valid(tbl.column('n_ab'))
            model = tbl.filter(is_model)
            data = tbl.filter(pc.invert(is_model))
            if data.num_rows == 0:
                return term_schema.empty_table()
            # exact in-bucket pair lookup on TRUE (a, b) values —
            # same index_in + numeric-pair-code trick as score_terms
            ub = pc.unique(pa.chunked_array(
                [model.column('b').combine_chunks(),
                 data.column('b').combine_chunks()]))
            k = len(ub)
            a_m = np.searchsorted(
                hot_a, model.column('a').to_numpy(zero_copy_only=False))
            b_m = pc.index_in(model.column('b'), value_set=ub)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            a_d = np.searchsorted(
                hot_a, data.column('a').to_numpy(zero_copy_only=False))
            b_d = pc.index_in(data.column('b'), value_set=ub)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            key_m = a_m * k + b_m
            # a pair's model row can arrive once per salt that maps to
            # this bucket — dedup before the lookup
            key_mu, first = np.unique(key_m, return_index=True)
            nab_m = model.column('n_ab').to_numpy(
                zero_copy_only=False)[first].astype(np.float64)
            pos = np.searchsorted(key_mu, a_d * k + b_d)
            n_ab = nab_m[pos]
            ctx_a = hot_ca[a_d].astype(np.float64)
            n_dab = data.column('n_dab').to_numpy(
                zero_copy_only=False).astype(np.int64)
            micro = np.floor(-np.log(n_ab / ctx_a) * 1e6 + 0.5)\
                .astype(np.int64)
            return pa.table({'doc_id': data.column('doc_id'),
                             'contrib': pa.array(micro * n_dab),
                             'n_dab': pa.array(n_dab)},
                            schema=term_schema)

        hot_terms = bucket_exchange(tagged, 'skey', hot_score,
                                    num_buckets=16)
        terms = cold_terms.union(hot_terms)

    per_doc = bucket_aggregate(terms, ['doc_id'],
                               {'n_bigrams': ('n_dab', 'sum'),
                                'c6': ('contrib', 'sum')},
                               num_buckets=16)

    def finish(tbl: pa.Table) -> pa.Table:
        nb = tbl.column('n_bigrams').to_numpy(
            zero_copy_only=False).astype(np.int64)
        c6 = tbl.column('c6').to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({
            'doc_id': tbl.column('doc_id'),
            'n_bigrams': pa.array(nb),
            'nll': pa.array(c6 / nb / 1e6),
        })

    return per_doc.map_batches(finish, batch_format='pyarrow',
                               zero_copy_batch=True).sort('doc_id')


QUERIES['q_lm_score_docs'] = q_lm_score_docs
ORACLE_SQL['q_lm_score_docs'] = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE text IS NOT NULL),
    bg AS (SELECT doc_id, p[1] AS a, p[2] AS b
           FROM (SELECT doc_id, unnest(list_zip(l, l[2:])) AS p
                 FROM (SELECT doc_id, string_split(text, ' ') AS l
                       FROM docs))
           WHERE p[2] IS NOT NULL),
    dab AS (SELECT doc_id, a, b, count(*) AS n_dab FROM bg
            GROUP BY doc_id, a, b),
    ab AS (SELECT a, b, cast(sum(n_dab) AS BIGINT) AS n_ab FROM dab
           GROUP BY a, b),
    ctx AS (SELECT a, cast(sum(n_ab) AS BIGINT) AS ctx_a FROM ab
            GROUP BY a),
    term AS (
      SELECT doc_id, n_dab,
             cast(floor(-ln(cast(n_ab AS DOUBLE) / ctx_a) * 1e6 + 0.5)
                  AS BIGINT) AS micro
      FROM dab JOIN ab USING (a, b) JOIN ctx USING (a))
    SELECT doc_id, cast(sum(n_dab) AS BIGINT) AS n_bigrams,
           cast(sum(micro * n_dab) AS DOUBLE) / sum(n_dab) / 1e6 AS nll
    FROM term GROUP BY doc_id ORDER BY doc_id
"""


def q_keywords_docs(sf_dir: str, df_broadcast_max: int = 2_000_000):
    """Keyword extraction: top-3 TF-IDF terms per document with rank —
    the per-doc summarization primitive on top of the corpus statistic.
    Same two-exchange shape as q_tfidf_docs, including the r4
    auto-tiered df attachment (_df_attach_tiered: vocab broadcast at
    sf scale, hot-head broadcast + tail hash_join at open-vocab
    scale); the per-doc rank is an in-bucket Arrow sort on
    (doc, -micro, tok) with segment position picks. Rank cuts are
    float row-picks, so they follow the CLAUDE.md fixed-point
    discipline: both engines rank on the micro-unit int with tok as
    the tie key."""
    import ray as _ray
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    TOP = 3
    out_schema = pa.schema([('doc_id', pa.int64()), ('rank', pa.int64()),
                            ('tok', pa.string()),
                            ('score', pa.float64())])
    n_docs = _nonnull_count(sf_dir, 'documents', 'text')
    if n_docs == 0:
        return out_schema.empty_table().to_pandas()
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))

    tf_schema = pa.schema([('doc_id', pa.int64()), ('tok', pa.string()),
                           ('tf', pa.int64())])
    tf = bucket_aggregate(
        ds.map_batches(_tok_explode, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['doc_id', 'tok'], {'tf': ('tok', 'count')},
        num_buckets=16).materialize()
    dfh = bucket_aggregate(tf, ['tok'], {'df': ('tok', 'count')},
                           num_buckets=4).materialize()
    ref, picked_in = _df_attach_tiered(tf, dfh, tf_schema,
                                       df_broadcast_max)

    def pick(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        dl = tbl.group_by(['doc_id']).aggregate([('tf', 'sum')])
        di = pc.index_in(tbl.column('doc_id'),
                         value_set=dl.column('doc_id'))
        doc_len = dl.column('tf_sum').take(di).to_numpy(
            zero_copy_only=False).astype(np.float64)
        if ref is not None:
            keys, dfs = _ray.get(ref)
            ti = pc.index_in(tbl.column('tok'), value_set=keys)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dfv = dfs[ti]
        else:
            dfv = tbl.column('df').to_numpy(
                zero_copy_only=False).astype(np.int64)
        tfv = tbl.column('tf').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        # same association order as q_tfidf_docs / the oracle
        micro = np.floor((tfv / doc_len) * np.log(float(n_docs) / dfv)
                         * 1e6 + 0.5).astype(np.int64)
        t = pa.table({'doc_id': tbl.column('doc_id'),
                      'tok': tbl.column('tok'),
                      'micro': pa.array(micro)})
        t = t.sort_by([('doc_id', 'ascending'), ('micro', 'descending'),
                       ('tok', 'ascending')])
        docs = t.column('doc_id').to_numpy(zero_copy_only=False)
        new = np.ones(len(docs), dtype=bool)
        new[1:] = docs[1:] != docs[:-1]
        gs = np.maximum.accumulate(
            np.where(new, np.arange(len(docs)), 0))
        pos = np.arange(len(docs)) - gs
        keep = pos < TOP
        t = t.filter(pa.array(keep))
        return pa.table({
            'doc_id': pc.cast(t.column('doc_id'), pa.int64()),
            'rank': pa.array(pos[keep].astype(np.int64) + 1),
            'tok': t.column('tok'),
            'score': pc.divide(pc.cast(t.column('micro'), pa.float64()),
                               pa.scalar(1e6)),
        }, schema=out_schema)

    out = bucket_exchange(picked_in, 'doc_id', pick, num_buckets=16)
    return out.sort(['doc_id', 'rank'])


QUERIES['q_keywords_docs'] = q_keywords_docs
ORACLE_SQL['q_keywords_docs'] = """
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE text IS NOT NULL),
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM docs),
    tf AS (SELECT doc_id, tok, count(tok) AS tf FROM toks
           GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, sum(tf) AS doc_len FROM tf GROUP BY doc_id),
    df AS (SELECT tok, count(tok) AS df FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM docs),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             cast(floor((cast(tf.tf AS DOUBLE) / dl.doc_len)
                        * ln(cast(n.n_docs AS DOUBLE) / df.df)
                        * 1e6 + 0.5) AS BIGINT) AS micro
      FROM tf JOIN dl USING (doc_id) JOIN df USING (tok) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, tok, micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY micro DESC, tok) AS rank
      FROM scored)
    SELECT doc_id, cast(rank AS BIGINT) AS rank, tok,
           cast(micro AS DOUBLE) / 1e6 AS score
    FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_ohlc_events(sf_dir: str):
    """Time-series resampling to hourly OHLC bars: open/close are the
    values at the first/last (ts, event_id) in the hour, high/low/vol
    exact fixed-point extrema/sums, n the row count — the financial
    downsampling primitive. ONE hour-bucket exchange; the kernel is a
    lexsort + segment boundary picks/reduceats. Rows lacking ts or
    value have no bar — excluded on both engines."""
    from ..stages.conversations import bucket_exchange
    ds = _read(sf_dir, 'events', ['event_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([
        ('hour', pa.timestamp('us')), ('open', pa.float64()),
        ('high', pa.float64()), ('low', pa.float64()),
        ('close', pa.float64()), ('n', pa.int64()),
        ('vol', pa.float64())])
    HOUR_US = 3_600_000_000

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            'hour': pa.array(ts_us // HOUR_US * HOUR_US),
            'ts_us': pa.array(ts_us),
            'event_id': tbl.column('event_id'),
            'v6': _fixed6(tbl.column('value')),
        })

    def bars(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        h = tbl.column('hour').to_numpy(zero_copy_only=False)
        ts = tbl.column('ts_us').to_numpy(zero_copy_only=False)
        eid = tbl.column('event_id').to_numpy(zero_copy_only=False)
        v6 = tbl.column('v6').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        order = np.lexsort((eid, ts, h))
        h, v6 = h[order], v6[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = h[1:] != h[:-1]
        gi = np.nonzero(new)[0]
        last = np.append(gi[1:] - 1, len(h) - 1)
        return pa.table({
            'hour': pc.cast(pa.array(h[gi]), pa.timestamp('us')),
            'open': pa.array(v6[gi].astype(np.float64) / 1e6),
            'high': pa.array(np.maximum.reduceat(v6, gi)
                             .astype(np.float64) / 1e6),
            'low': pa.array(np.minimum.reduceat(v6, gi)
                            .astype(np.float64) / 1e6),
            'close': pa.array(v6[last].astype(np.float64) / 1e6),
            'n': pa.array(np.diff(np.append(gi, len(h)))
                          .astype(np.int64)),
            'vol': pa.array(np.add.reduceat(v6, gi)
                            .astype(np.float64) / 1e6),
        }, schema=out_schema)

    prepped = ds.map_batches(prep, batch_format='pyarrow',
                             zero_copy_batch=True)
    return bucket_exchange(prepped, 'hour', bars,
                           num_buckets=16).sort('hour')


QUERIES['q_ohlc_events'] = q_ohlc_events
ORACLE_SQL['q_ohlc_events'] = """
    WITH s AS (
      SELECT date_trunc('hour', ts) AS hour, ts, event_id,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    w AS (
      SELECT *,
             row_number() OVER (PARTITION BY hour
                                ORDER BY ts, event_id) AS rna,
             row_number() OVER (PARTITION BY hour
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM s)
    SELECT hour,
           cast(min(CASE WHEN rna = 1 THEN v6 END) AS DOUBLE) / 1e6
             AS open,
           cast(max(v6) AS DOUBLE) / 1e6 AS high,
           cast(min(v6) AS DOUBLE) / 1e6 AS low,
           cast(min(CASE WHEN rnd = 1 THEN v6 END) AS DOUBLE) / 1e6
             AS close,
           count(*) AS n,
           cast(sum(v6) AS DOUBLE) / 1e6 AS vol
    FROM w GROUP BY hour ORDER BY hour
"""


def q_burst_events(sf_dir: str):
    """Burst/spike detection: (event_type, hour) buckets whose count
    exceeds that type's mean + 3 sigma over its observed hours — the
    ops-anomaly primitive. The entire test is INTEGER algebra on exact
    counts (cH > S and (cH-S)^2 > 9(QH - S^2) with H hours, S = sum c,
    Q = sum c^2), so no float threshold can flip between engines.
    int64 envelope: the widest terms (c*H - S)^2 and 9*Q*H scale as
    (c*H)^2, so c*H < ~1e9 — at larger scale downshift counts to a
    coarser unit first; DuckDB's BIGINT product errors loudly past it
    rather than wrapping. One
    low-cardinality pre_aggregate + one per-type bucket exchange."""
    from ..stages.aggregate import pre_aggregate as _pre
    from ..stages.conversations import bucket_exchange
    ds = _read(sf_dir, 'events', ['event_type', 'ts'], require=('ts',))
    HOUR_US = 3_600_000_000
    out_schema = pa.schema([('event_type', pa.string()),
                            ('hour', pa.timestamp('us')),
                            ('n', pa.int64())])

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            'event_type': tbl.column('event_type'),
            'hour': pa.array(ts_us // HOUR_US * HOUR_US),
            '_one': pa.array(np.ones(tbl.num_rows, dtype=np.int64))})

    counts = _pre(ds.map_batches(prep, batch_format='pyarrow',
                                 zero_copy_batch=True),
                  ['event_type', 'hour'], {'c': ('_one', 'sum')})

    def flag(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        et = tbl.column('event_type')
        c = tbl.column('c').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        # per-type H/S/Q over this bucket (types are bucket-local)
        key = pd.factorize(et.to_pandas(), use_na_sentinel=False)[0]
        ng = key.max() + 1
        # exact int64 accumulation (np.bincount weights would round
        # through float64 above 2^53, flipping boundary comparisons
        # against the oracle's exact BIGINT sums)
        H = np.bincount(key, minlength=ng).astype(np.int64)
        S = np.zeros(ng, dtype=np.int64)
        np.add.at(S, key, c)
        Q = np.zeros(ng, dtype=np.int64)
        np.add.at(Q, key, c * c)
        d = c * H[key] - S[key]
        keep = (d > 0) & (d * d > 9 * (Q[key] * H[key]
                                       - S[key] * S[key]))
        t = tbl.filter(pa.array(keep))
        return pa.table({
            'event_type': t.column('event_type'),
            'hour': pc.cast(t.column('hour'), pa.timestamp('us')),
            'n': pc.cast(t.column('c'), pa.int64()),
        }, schema=out_schema)

    out = bucket_exchange(counts, 'event_type', flag, num_buckets=8)
    return _sort_ns(out, ['event_type', 'hour'],
                    str_cols=('event_type',))


QUERIES['q_burst_events'] = q_burst_events
ORACLE_SQL['q_burst_events'] = """
    WITH s AS (
      SELECT event_type, date_trunc('hour', ts) AS h
      FROM events WHERE ts IS NOT NULL),
    c AS (SELECT event_type, h, count(*) AS c FROM s
          GROUP BY event_type, h),
    m AS (SELECT event_type, cast(count(*) AS BIGINT) AS hh,
                 cast(sum(c) AS BIGINT) AS ss,
                 cast(sum(c * c) AS BIGINT) AS qq
          FROM c GROUP BY event_type)
    SELECT c.event_type, c.h AS hour, c.c AS n
    FROM c JOIN m ON m.event_type IS NOT DISTINCT FROM c.event_type
    WHERE c.c * hh > ss
      AND (c.c * hh - ss) * (c.c * hh - ss) > 9 * (qq * hh - ss * ss)
    ORDER BY c.event_type NULLS LAST, hour
"""


def q_inverted_index_docs(sf_dir: str):
    """Inverted-index build: token -> sorted posting list of doc_ids
    (as a ','-joined string — list columns don't survive the driver's
    row-sorting compare) for tokens appearing in >= 5 docs. One
    (doc,tok) dedup exchange + one token-bucket exchange; the posting
    join is Arrow list-aggregate + binary_join, no per-token Python.
    The df >= 5 floor is the realistic stop-token economics: rare
    tokens dominate vocab but carry tiny lists; hot tokens carry the
    bytes. At 100 TB, shard postings per token range."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    from ..stages.joins import hash_join
    MIN_DF = 5
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'], require=('text',))
    out_schema = pa.schema([('tok', pa.string()), ('df', pa.int64()),
                            ('postings', pa.string())])
    post_schema = pa.schema([('th', pa.int64()), ('df', pa.int64()),
                             ('postings', pa.string())])

    # (doc, th) dedup — posting lists hold DISTINCT docs. The heavy
    # (doc, token) exchange is HASH-KEYED (16-byte int rows); token
    # strings ride only the Heaps'-bounded vocab census, joined onto
    # the (much smaller) df >= MIN_DF survivor postings at the end.
    dt = bucket_aggregate(
        ds.map_batches(_tok_explode_hashed, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['doc_id', 'th'], {'_n': ('th', 'count')}, num_buckets=16)

    def build(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return post_schema.empty_table()
        t = pa.table({'th': tbl.column('th').combine_chunks(),
                      'doc_id': tbl.column('doc_id').combine_chunks()})
        t = t.sort_by([('th', 'ascending'), ('doc_id', 'ascending')])
        t = t.append_column('doc_str',
                            pc.cast(t.column('doc_id'), pa.string()))
        agg = t.group_by(['th'], use_threads=False).aggregate(
            [('doc_str', 'list'), ('doc_id', 'count')])
        df_ = agg.column('doc_id_count')
        agg = agg.filter(pc.greater_equal(df_, MIN_DF))
        if agg.num_rows == 0:
            return post_schema.empty_table()
        postings = pc.binary_join(agg.column('doc_str_list'), ',')
        return pa.table({
            'th': agg.column('th'),
            'df': pc.cast(agg.column('doc_id_count'), pa.int64()),
            'postings': pc.cast(postings, pa.string()),
        }, schema=post_schema)

    posts = bucket_exchange(dt, 'th', build, num_buckets=16)
    out = hash_join(posts, _vocab_census(ds), on='th', num_buckets=16,
                    left_schema=post_schema,
                    right_schema=pa.schema([('th', pa.int64()),
                                            ('tok', pa.string())]))
    out = out.map_batches(
        lambda t: t.select(['tok', 'df', 'postings']).cast(out_schema),
        batch_format='pyarrow', zero_copy_batch=True)
    return out.sort('tok')


QUERIES['q_inverted_index_docs'] = q_inverted_index_docs
ORACLE_SQL['q_inverted_index_docs'] = """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL)
    SELECT tok, count(*) AS df,
           string_agg(cast(doc_id AS VARCHAR), ','
                      ORDER BY doc_id) AS postings
    FROM toks GROUP BY tok HAVING count(*) >= 5 ORDER BY tok
"""


def q_ab_test_events(sf_dir: str):
    """A/B experiment analysis: users split 50/50 by the deterministic
    multiplicative hash (same expression as hash_split — the
    experiment-unit assignment is a pure function of user_id, stable
    across engines and runs), conversion = user has >= 1 purchase,
    output the two-proportion z statistic. Counts are exact ints from
    one per-user aggregate + one tiny census; z is one scalar double
    computed in the oracle's association order (sqrt is IEEE
    correctly-rounded — no libm drift)."""
    from ..functions.sampling import split_buckets
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'])

    def conv(tbl: pa.Table) -> pa.Table:
        is_p = pc.fill_null(
            pc.equal(tbl.column('event_type').combine_chunks(),
                     'purchase'), False)
        return pa.table({'user_id': tbl.column('user_id'),
                         'conv': pc.cast(is_p, pa.int64())})

    per_user = bucket_aggregate(
        ds.map_batches(conv, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['user_id'], {'conv': ('conv', 'max')}, num_buckets=16)

    def variant(tbl: pa.Table) -> pa.Table:
        u = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        b = split_buckets(u, mod=10_000, salt=0)
        va = b < 5_000
        cv = tbl.column('conv').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        return pa.table({
            'n_a': pa.array([np.int64(va.sum())]),
            'x_a': pa.array([np.int64(cv[va].sum())]),
            'n_b': pa.array([np.int64((~va).sum())]),
            'x_b': pa.array([np.int64(cv[~va].sum())])})

    parts = _small_df(per_user.map_batches(
        variant, batch_format='pyarrow', zero_copy_batch=True),
        ['n_a', 'x_a', 'n_b', 'x_b'])
    n_a = int(parts['n_a'].sum()) if len(parts) else 0
    x_a = int(parts['x_a'].sum()) if len(parts) else 0
    n_b = int(parts['n_b'].sum()) if len(parts) else 0
    x_b = int(parts['x_b'].sum()) if len(parts) else 0
    z = None
    if n_a > 0 and n_b > 0:
        p = (x_a + x_b) / (n_a + n_b)
        den = p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)
        if den > 0:
            z = (x_a / n_a - x_b / n_b) / np.sqrt(den)
    return pd.DataFrame({'n_a': pd.array([n_a], dtype=np.int64),
                         'x_a': pd.array([x_a], dtype=np.int64),
                         'n_b': pd.array([n_b], dtype=np.int64),
                         'x_b': pd.array([x_b], dtype=np.int64),
                         'z': pd.array([z], dtype=np.float64)})


def _ab_oracle() -> str:
    from ..functions.sampling import split_sql_expr
    var = split_sql_expr('user_id', {'A': 0.5, 'B': 0.5})
    return f"""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id),
    v AS (SELECT conv, {var} AS variant FROM u),
    s AS (SELECT
            coalesce(cast(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0
                          END) AS BIGINT), 0) AS n_a,
            coalesce(cast(sum(CASE WHEN variant = 'A' THEN conv ELSE 0
                          END) AS BIGINT), 0) AS x_a,
            coalesce(cast(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0
                          END) AS BIGINT), 0) AS n_b,
            coalesce(cast(sum(CASE WHEN variant = 'B' THEN conv ELSE 0
                          END) AS BIGINT), 0) AS x_b
          FROM v)
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND (cast(x_a + x_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 - cast(x_a + x_b AS DOUBLE) / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b) > 0
           THEN (cast(x_a AS DOUBLE) / n_a - cast(x_b AS DOUBLE) / n_b)
                / sqrt((cast(x_a + x_b AS DOUBLE) / (n_a + n_b))
                       * (1.0 - cast(x_a + x_b AS DOUBLE)
                          / (n_a + n_b))
                       * (1.0 / n_a + 1.0 / n_b))
           END AS z
    FROM s
"""


QUERIES['q_ab_test_events'] = q_ab_test_events
ORACLE_SQL['q_ab_test_events'] = _ab_oracle()


def q_item_cooc_events(sf_dir: str):
    """Item-item cosine similarity from user co-occurrence — the
    collaborative-filtering primitive: each event_type is a vector of
    per-user interaction counts; sim(a,b) = dot / (|a||b|). Exact-int
    core: per-(user,item) counts in one bucket aggregation, pair
    products expanded INSIDE each user bucket (cost sum_u k_u^2 with
    k_u = items per user, bounded by the item vocab — never a global
    self-join), dots and squared norms are int64 sums; only the final
    cosine divides doubles (sqrt is IEEE-exact). Pair output is
    vocab^2-bounded. NULL items are excluded on both engines (SQL
    a.t < b.t would drop them silently — made explicit)."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'],
               require=('event_type',))
    counts = bucket_aggregate(
        ds.map_batches(
            lambda t: pa.table({
                'user_id': t.column('user_id'),
                't': t.column('event_type'),
                '_one': pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['user_id', 't'], {'c': ('_one', 'sum')},
        num_buckets=16).materialize()

    n2df = _small_df(bucket_aggregate(
        counts.map_batches(
            lambda t: pa.table({
                't': t.column('t'),
                'c2': pc.multiply(t.column('c'), t.column('c'))}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['t'], {'n2': ('c2', 'sum')}, num_buckets=4), ['t', 'n2'])

    pair_schema = pa.schema([('a', pa.string()), ('b', pa.string()),
                             ('prod', pa.int64())])

    def pairs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pair_schema.empty_table()
        t = tbl.sort_by([('user_id', 'ascending'), ('t', 'ascending')])
        users = t.column('user_id').to_numpy(zero_copy_only=False)
        c = t.column('c').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        new = np.ones(len(users), dtype=bool)
        new[1:] = users[1:] != users[:-1]
        gs = np.maximum.accumulate(
            np.where(new, np.arange(len(users)), 0))
        pos = np.arange(len(users)) - gs        # position within user
        # all (i, j) with same user, pos_i < pos_j: each row j pairs
        # with the pos_j earlier rows of its segment — loop-free via
        # the slot trick (offset within the expansion of each j)
        rep = pos                                # partners per row j
        if rep.sum() == 0:
            return pair_schema.empty_table()
        j = np.repeat(np.arange(len(users)), rep)
        slot = np.arange(len(j)) - np.repeat(np.cumsum(rep) - rep, rep)
        i = gs[j] + slot                         # segment start + 0..
        ta = t.column('t').take(pa.array(i))
        tb = t.column('t').take(pa.array(j))
        return pa.table({'a': ta, 'b': tb,
                         'prod': pa.array(c[i] * c[j])},
                        schema=pair_schema)

    dots = bucket_aggregate(
        bucket_exchange(counts, 'user_id', pairs, num_buckets=16),
        ['a', 'b'], {'dot': ('prod', 'sum')}, num_buckets=8)
    dfp = _small_df(dots, ['a', 'b', 'dot'])
    out_cols = ['a', 'b', 'dot', 'cosine']
    if len(dfp) == 0:
        return pd.DataFrame({'a': pd.Series(dtype=object),
                             'b': pd.Series(dtype=object),
                             'dot': pd.Series(dtype=np.int64),
                             'cosine': pd.Series(dtype=np.float64)})
    n2 = dict(zip(n2df['t'], n2df['n2'].astype(np.int64)))
    dot = dfp['dot'].to_numpy(dtype=np.int64)
    na2 = np.array([n2[x] for x in dfp['a']], dtype=np.float64)
    nb2 = np.array([n2[x] for x in dfp['b']], dtype=np.float64)
    cos = dot / (np.sqrt(na2) * np.sqrt(nb2))
    out = pd.DataFrame({'a': dfp['a'].to_numpy(),
                        'b': dfp['b'].to_numpy(), 'dot': dot,
                        'cosine': cos})
    return out[out_cols].sort_values(['a', 'b']).reset_index(drop=True)


QUERIES['q_item_cooc_events'] = q_item_cooc_events
ORACLE_SQL['q_item_cooc_events'] = """
    WITH e AS (SELECT user_id, event_type FROM events
               WHERE event_type IS NOT NULL),
    c AS (SELECT user_id, event_type AS t, count(*) AS c FROM e
          GROUP BY user_id, event_type),
    n2 AS (SELECT t, cast(sum(c * c) AS BIGINT) AS n2 FROM c
           GROUP BY t),
    d AS (SELECT x.t AS a, y.t AS b,
                 cast(sum(x.c * y.c) AS BIGINT) AS dot
          FROM c x JOIN c y ON x.user_id = y.user_id AND x.t < y.t
          GROUP BY x.t, y.t)
    SELECT a, b, dot,
           cast(dot AS DOUBLE)
             / (sqrt(cast(na.n2 AS DOUBLE))
                * sqrt(cast(nb.n2 AS DOUBLE))) AS cosine
    FROM d JOIN n2 na ON na.t = d.a JOIN n2 nb ON nb.t = d.b
    ORDER BY a, b
"""


def q_groupkfold_events(sf_dir: str):
    """Leakage-safe GROUP k-fold assignment: every event of a user
    lands in the SAME of 5 folds (the grouped extension of hash_split —
    fold is a pure function of user_id, so cross-validation never
    splits an entity across train/test). Output is the per-fold census
    (users, events) — zero shuffle beyond one per-user aggregate."""
    from ..functions.sampling import split_buckets
    from ..stages.aggregate import bucket_aggregate, pre_aggregate
    K = 5
    ds = _read(sf_dir, 'events', ['user_id'])
    per_user = bucket_aggregate(
        ds.map_batches(
            lambda t: pa.table({
                'user_id': t.column('user_id'),
                '_one': pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['user_id'], {'n_events': ('_one', 'sum')}, num_buckets=16)

    def fold(tbl: pa.Table) -> pa.Table:
        u = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        f = split_buckets(u, mod=K, salt=0)
        return pa.table({
            'fold': pa.array(f.astype(np.int64)),
            '_u': pa.array(np.ones(len(u), dtype=np.int64)),
            'n_events': tbl.column('n_events')})

    out = pre_aggregate(per_user.map_batches(
        fold, batch_format='pyarrow', zero_copy_batch=True),
        ['fold'], {'n_users': ('_u', 'sum'),
                   'n_events': ('n_events', 'sum')})
    return out.sort('fold')


def _groupkfold_oracle() -> str:
    b = '(((user_id + 0) % 2147483648) * 2654435761) % 4294967296 % 5'
    return f"""
    WITH u AS (SELECT user_id, count(*) AS n_events FROM events
               GROUP BY user_id)
    SELECT cast({b} AS BIGINT) AS fold,
           count(*) AS n_users,
           cast(sum(n_events) AS BIGINT) AS n_events
    FROM u GROUP BY fold ORDER BY fold
"""


QUERIES['q_groupkfold_events'] = q_groupkfold_events
ORACLE_SQL['q_groupkfold_events'] = _groupkfold_oracle()


def q_gram_embeddings(sf_dir: str):
    """Distributed Gram matrix X^T X over the embedding column — the
    covariance/PCA building block. Each batch contributes one d x d
    partial via BLAS dgemm on FIXED-POINT values: coordinates floor to
    1e4 ints, and every dgemm intermediate is an exact integer < 2^53,
    so the float64 matmul is EXACT integer arithmetic regardless of
    BLAS blocking/FMA — partials then sum as int64 (order-independent,
    byte-equal to the SQL self-join oracle). Upper triangle only
    (d(d+1)/2 rows out); exchange volume is d^2 ints per batch, never
    the vectors. int64 bound: rows x (1e4 x max|x|)^2 < 9e18."""
    ds = _read(sf_dir, 'embeddings', ['embedding'],
               require=('embedding',))
    out_schema = pa.schema([('i', pa.int64()), ('j', pa.int64()),
                            ('g4', pa.int64())])

    def partial(tbl: pa.Table) -> pa.Table:
        col = tbl.column('embedding').combine_chunks()
        n = len(col)
        if n == 0:
            return out_schema.empty_table()
        lens = pc.list_value_length(col)
        if pc.min(lens).as_py() != pc.max(lens).as_py():
            raise ValueError('q_gram_embeddings: ragged embedding '
                             'lists — a silent reshape would shear '
                             'every subsequent row')
        flat_arr = pc.list_flatten(col)
        if flat_arr.null_count:
            raise ValueError('q_gram_embeddings: null elements inside '
                             'embedding lists — NaN would poison the '
                             'integer partials')
        flat = flat_arr.to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        if len(flat) == 0:
            return out_schema.empty_table()
        d = len(flat) // n
        V = np.floor(flat * 1e4 + 0.5).reshape(n, d)
        G = V.T @ V                      # exact: integer-valued doubles
        iu = np.triu_indices(d)
        return pa.table({'i': pa.array(iu[0].astype(np.int64)),
                         'j': pa.array(iu[1].astype(np.int64)),
                         'g4': pa.array(G[iu].astype(np.int64))},
                        schema=out_schema)

    agg = pre_aggregate(ds.map_batches(partial, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['i', 'j'], {'g4': ('g4', 'sum')})

    def finish(tbl: pa.Table) -> pa.Table:
        g4 = tbl.column('g4').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        return pa.table({'i': tbl.column('i'), 'j': tbl.column('j'),
                         'g': pa.array(g4 / 1e8)})

    return agg.map_batches(finish, batch_format='pyarrow')\
        .sort(['i', 'j'])


QUERIES['q_gram_embeddings'] = q_gram_embeddings
ORACLE_SQL['q_gram_embeddings'] = """
    WITH f AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             cast(floor(cast(unnest(embedding) AS DOUBLE) * 1e4 + 0.5)
                  AS BIGINT) AS v
      FROM embeddings)
    SELECT a.i AS i, b.i AS j,
           cast(cast(sum(a.v * b.v) AS BIGINT) AS DOUBLE) / 1e8 AS g
    FROM f a JOIN f b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i ORDER BY i, j
"""


def q_trend_events(sf_dir: str):
    """Per-user monotonic-trend detection: Spearman rank correlation
    between time order and value (robust trend statistic, >= 5 obs).
    EXACT core: tie-averaged value ranks doubled to stay integer
    (R2 = 2*rank_min + ties - 1), time ranks T2 = 2*row_number, and
    the five Pearson sums are int64 — the only doubles are the final
    division and an IEEE-exact sqrt, in the oracle's association
    order. int64 envelope: n*syy ~ (4/3)n^4, so users are capped at
    n <= 30000 events ON BOTH ENGINES (1.1e18 < int64; the oracle's
    HUGEINT would silently diverge past that) — shard or subsample
    longer histories first. ONE per-user exchange; rank assignment is
    a segment-vectorized argsort per bucket."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([('user_id', pa.int64()), ('n', pa.int64()),
                            ('rho', pa.float64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        v6 = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gs = np.maximum.accumulate(np.where(starts, np.arange(m), 0))
        pos = np.arange(m) - gs
        t2 = 2 * (pos + 1)
        # tie-averaged value ranks within user, doubled: sort by
        # (user, v6), find equal-runs, rank_min = run start - user
        # start + 1
        order = np.lexsort((v6, users))
        su, sv = users[order], v6[order]
        sgs = np.maximum.accumulate(
            np.where(np.r_[True, su[1:] != su[:-1]], np.arange(m), 0))
        new_run = np.r_[True, (sv[1:] != sv[:-1]) | (su[1:] != su[:-1])]
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(m), 0))
        run_idx = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(run_idx, m))
        cnt = np.repeat(run_len, run_len)
        r2_sorted = 2 * (run_start - sgs + 1) + cnt - 1
        r2 = np.empty(m, dtype=np.int64)
        r2[order] = r2_sorted
        # five exact sums per user
        ustart = np.nonzero(starts)[0]
        n = np.diff(np.append(ustart, m)).astype(np.int64)
        sx = np.add.reduceat(r2, ustart)
        sy = np.add.reduceat(t2, ustart)
        sxx = np.add.reduceat(r2 * r2, ustart)
        syy = np.add.reduceat(t2 * t2, ustart)
        sxy = np.add.reduceat(r2 * t2, ustart)
        keep = (n >= 5) & (n <= 30000)
        n, sx, sy = n[keep], sx[keep], sy[keep]
        sxx, syy, sxy = sxx[keep], syy[keep], sxy[keep]
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        ok = (d1 > 0) & (d2 > 0)
        with np.errstate(invalid='ignore', divide='ignore'):
            rho = num.astype(np.float64) \
                / np.sqrt(d1.astype(np.float64) * d2.astype(np.float64))
        return pa.table({
            'user_id': pa.array(users[ustart][keep]),
            'n': pa.array(n),
            'rho': pa.array(rho, mask=~ok),
        }, schema=out_schema)

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_trend_events'] = q_trend_events
ORACLE_SQL['q_trend_events'] = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    r AS (
      SELECT user_id,
             cast(2 * row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                  AS BIGINT) AS t2,
             cast(2 * rank() OVER (PARTITION BY user_id ORDER BY v6)
                  + count(*) OVER (PARTITION BY user_id, v6) - 1
                  AS BIGINT) AS r2
      FROM e),
    s AS (
      SELECT user_id, cast(count(*) AS BIGINT) AS n,
             cast(sum(r2) AS BIGINT) AS sx,
             cast(sum(t2) AS BIGINT) AS sy,
             cast(sum(r2 * r2) AS BIGINT) AS sxx,
             cast(sum(t2 * t2) AS BIGINT) AS syy,
             cast(sum(r2 * t2) AS BIGINT) AS sxy
      FROM r GROUP BY user_id
      HAVING count(*) >= 5 AND count(*) <= 30000)
    SELECT user_id, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN cast(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(cast(n * sxx - sx * sx AS DOUBLE)
                            * cast(n * syy - sy * sy AS DOUBLE))
           END AS rho
    FROM s ORDER BY user_id
"""


def q_quality_percentile_docs(sf_dir: str):
    """GLOBAL percent_rank of every document by length — without a
    global sort. The corpus ranks through a VALUE CENSUS: one bounded
    aggregation counts docs per distinct n_chars, the cumulative
    census broadcasts (cardinality = distinct lengths, not docs), and
    each doc's percentile is exact integer arithmetic
    (#strictly-smaller / (N-1)) applied per batch. The 100-TB story:
    a census + broadcast replaces the all-to-all sort that
    percent_rank() OVER () implies. Min-rank tie semantics match SQL
    percent_rank exactly."""
    import ray as _ray
    from ..stages.aggregate import pre_aggregate as _pre
    ds = _read(sf_dir, 'documents', ['doc_id', 'n_chars'],
               require=('n_chars',))
    census = _small_df(_pre(
        ds.map_batches(
            lambda t: pa.table({
                'n_chars': t.column('n_chars'),
                '_one': pa.array(np.ones(t.num_rows, dtype=np.int64))}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['n_chars'], {'c': ('_one', 'sum')}), ['n_chars', 'c'])
    out_schema = pa.schema([('doc_id', pa.int64()),
                            ('n_chars', pa.int64()),
                            ('pr', pa.float64())])
    if len(census) == 0:
        return out_schema.empty_table().to_pandas()
    census = census.sort_values('n_chars')
    vals = census['n_chars'].to_numpy(dtype=np.int64)
    cnts = census['c'].to_numpy(dtype=np.int64)
    smaller = np.cumsum(cnts) - cnts          # docs strictly below val
    total = int(cnts.sum())
    ref = _ray.put((vals, smaller))

    def pr(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        v, sm = _ray.get(ref)
        nc = tbl.column('n_chars').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        below = sm[np.searchsorted(v, nc)]
        p = below.astype(np.float64) / (total - 1) if total > 1 \
            else np.zeros(len(nc))
        return pa.table({
            'doc_id': pc.cast(tbl.column('doc_id'), pa.int64()),
            'n_chars': pa.array(nc),
            'pr': pa.array(p),
        }, schema=out_schema)

    return ds.map_batches(pr, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


QUERIES['q_quality_percentile_docs'] = q_quality_percentile_docs
ORACLE_SQL['q_quality_percentile_docs'] = """
    SELECT doc_id, n_chars,
           percent_rank() OVER (ORDER BY n_chars) AS pr
    FROM documents WHERE n_chars IS NOT NULL ORDER BY doc_id
"""


def q_twa_events(sf_dir: str):
    """Time-weighted average of value per user — trapezoidal
    integration over the irregular event series (the monitoring/
    finance statistic a plain mean gets wrong when sampling is
    uneven). EXACT core: fixed-point 1e2 values x MILLISECOND gaps
    (quantized identically on both engines) stay int64 because
    sum(v*dt) <= 2*vmax*1e2*total_span_ms — bounded by the per-user
    time span, not the event count; int64 envelope
    vmax*span_days < ~5e8. Only the final division is a double in
    the oracle's association order. Users need >= 2 events and a positive span.
    ONE per-user exchange, segmented reduceats."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([('user_id', pa.int64()),
                            ('n_intervals', pa.int64()),
                            ('twa', pa.float64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        v2 = _fixed2(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # pair i -> i+1 within user
        pair = np.zeros(m, dtype=bool)
        pair[:-1] = ~starts[1:]
        pi = np.nonzero(pair)[0]
        dt = (ts_us[pi + 1] - ts_us[pi]) // 1000      # ms weights
        term = (v2[pi] + v2[pi + 1]) * dt
        # per-user rollup (users are contiguous)
        pu = users[pi]
        new = np.r_[True, pu[1:] != pu[:-1]] if len(pu) else \
            np.empty(0, dtype=bool)
        gi = np.nonzero(new)[0]
        if len(gi) == 0:
            return out_schema.empty_table()
        st = np.add.reduceat(term, gi)
        sd = np.add.reduceat(dt, gi)
        nn = np.diff(np.append(gi, len(pu))).astype(np.int64)
        ok = sd > 0
        with np.errstate(invalid='ignore', divide='ignore'):
            twa = st.astype(np.float64) / (2 * sd) / 1e2
        return pa.table({
            'user_id': pa.array(pu[gi]),
            'n_intervals': pa.array(nn),
            'twa': pa.array(twa, mask=~ok),
        }, schema=out_schema)

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_twa_events'] = q_twa_events
ORACLE_SQL['q_twa_events'] = """
    WITH e AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS tus,
             cast(floor(value * 1e2 + 0.5) AS BIGINT) AS v2
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    p AS (
      SELECT user_id, v2, tus,
             lead(v2) OVER w AS v2n, lead(tus) OVER w AS tusn
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id,
             cast(sum((v2 + v2n) * ((tusn - tus) // 1000))
                  AS BIGINT) AS st,
             cast(sum((tusn - tus) // 1000) AS BIGINT) AS sd,
             count(*) AS n_intervals
      FROM p WHERE tusn IS NOT NULL GROUP BY user_id)
    SELECT user_id, cast(n_intervals AS BIGINT) AS n_intervals,
           CASE WHEN sd > 0
                THEN cast(st AS DOUBLE) / (2 * sd) / 1e2 END AS twa
    FROM s ORDER BY user_id
"""


def q_assoc_rules_events(sf_dir: str):
    """Association rules over per-user event-type baskets: for every
    ORDERED pair a -> b, support n_ab/N, confidence n_ab/n_a and lift
    conf/(n_b/N) — market-basket mining with exact distinct-cooccurrence
    counts. The basket dedup and the in-bucket ordered-pair expansion
    are the same bounded shapes as item co-occurrence (cost sum_u k_u^2
    with k_u <= item vocab); singles census broadcasts; the final rule
    table is vocab^2-bounded. NULL items excluded on both engines."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.conversations import bucket_exchange
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'],
               require=('event_type',))
    baskets = bucket_aggregate(
        ds.map_batches(
            lambda t: pa.table({'user_id': t.column('user_id'),
                                't': t.column('event_type')}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['user_id', 't'], {'_n': ('t', 'count')},
        num_buckets=16).materialize()
    singles = _small_df(bucket_aggregate(
        baskets, ['t'], {'c': ('t', 'count')}, num_buckets=4),
        ['t', 'c'])
    n_users = int(bucket_aggregate(
        baskets, ['user_id'], {'_n': ('t', 'count')},
        num_buckets=8).count())
    pair_schema = pa.schema([('a', pa.string()), ('b', pa.string()),
                             ('_one', pa.int64())])

    def pairs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pair_schema.empty_table()
        t = tbl.sort_by([('user_id', 'ascending'), ('t', 'ascending')])
        users = t.column('user_id').to_numpy(zero_copy_only=False)
        new = np.ones(len(users), dtype=bool)
        new[1:] = users[1:] != users[:-1]
        gs = np.maximum.accumulate(
            np.where(new, np.arange(len(users)), 0))
        glen = np.diff(np.append(np.nonzero(new)[0], len(users)))
        k = np.repeat(glen, glen)               # basket size per row
        if len(k) == 0 or k.max() < 2:
            return pair_schema.empty_table()
        # ordered pairs: expand every (row, basket slot) then drop the
        # self match — loop-free
        i_all = np.repeat(np.arange(len(users)), k)
        slot = np.arange(len(i_all)) - np.repeat(
            np.cumsum(k) - k, k)                # 0..k-1 within each row
        j_all = gs[i_all] + slot
        keep = j_all != i_all
        i, j = i_all[keep], j_all[keep]
        ta = t.column('t').take(pa.array(i))
        tb = t.column('t').take(pa.array(j))
        return pa.table({'a': ta, 'b': tb,
                         '_one': pa.array(np.ones(len(i),
                                                  dtype=np.int64))},
                        schema=pair_schema)

    ab = _small_df(bucket_aggregate(
        bucket_exchange(baskets, 'user_id', pairs, num_buckets=16),
        ['a', 'b'], {'n_ab': ('_one', 'sum')}, num_buckets=8),
        ['a', 'b', 'n_ab'])
    out_cols = ['a', 'b', 'n_ab', 'support', 'confidence', 'lift']
    if len(ab) == 0:
        return pd.DataFrame({
            'a': pd.Series(dtype=object), 'b': pd.Series(dtype=object),
            'n_ab': pd.Series(dtype=np.int64),
            'support': pd.Series(dtype=np.float64),
            'confidence': pd.Series(dtype=np.float64),
            'lift': pd.Series(dtype=np.float64)})
    cmap = dict(zip(singles['t'], singles['c'].astype(np.int64)))
    nab = ab['n_ab'].to_numpy(dtype=np.int64)
    ca = np.array([cmap[x] for x in ab['a']], dtype=np.int64)
    cb = np.array([cmap[x] for x in ab['b']], dtype=np.int64)
    support = nab / n_users
    conf = nab / ca
    lift = (nab / ca) / (cb / n_users)
    out = pd.DataFrame({'a': ab['a'].to_numpy(),
                        'b': ab['b'].to_numpy(), 'n_ab': nab,
                        'support': support, 'confidence': conf,
                        'lift': lift})
    return out[out_cols].sort_values(['a', 'b']).reset_index(drop=True)


QUERIES['q_assoc_rules_events'] = q_assoc_rules_events
ORACLE_SQL['q_assoc_rules_events'] = """
    WITH e AS (SELECT DISTINCT user_id, event_type FROM events
               WHERE event_type IS NOT NULL),
    n AS (SELECT count(DISTINCT user_id) AS nn FROM e),
    ia AS (SELECT event_type AS t, count(*) AS c FROM e
           GROUP BY event_type),
    ab AS (SELECT x.event_type AS a, y.event_type AS b,
                  count(*) AS n_ab
           FROM e x JOIN e y ON x.user_id = y.user_id
                            AND x.event_type <> y.event_type
           GROUP BY x.event_type, y.event_type)
    SELECT a, b, n_ab,
           cast(n_ab AS DOUBLE) / nn AS support,
           cast(n_ab AS DOUBLE) / ca.c AS confidence,
           (cast(n_ab AS DOUBLE) / ca.c)
             / (cast(cb.c AS DOUBLE) / nn) AS lift
    FROM ab JOIN ia ca ON ca.t = ab.a JOIN ia cb ON cb.t = ab.b
    CROSS JOIN n ORDER BY a, b
"""


def q_golden_record_events(sf_dir: str):
    """Golden-record survivorship merge (MDM compaction): one row per
    user carrying the LATEST NON-NULL value of each attribute — unlike
    latest-wins compaction (q_latest_events), a null in the newest row
    does not clobber an older observed value. Per-column forward-fill
    + segment-end pick inside ONE per-user exchange; type-generic
    (string/float/json alike — row picks, no arithmetic, so floats
    stay byte-stable without fixed-point). NULL-ts rows have no
    recency — excluded on both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value', 'props'],
               require=('ts',))
    out_schema = pa.schema([
        ('user_id', pa.int64()), ('last_type', pa.string()),
        ('last_value', pa.float64()), ('last_props', pa.string()),
        ('last_ts', pa.timestamp('us')), ('n_events', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        ustart = np.nonzero(starts)[0]
        ends = np.append(ustart[1:] - 1, m - 1)
        ends_pa = pa.array(ends)
        cols = {}
        for src, out in (('event_type', 'last_type'),
                         ('value', 'last_value'),
                         ('props', 'last_props')):
            filled = W.ffill_column(
                tbl.column(src).combine_chunks(), starts)
            cols[out] = filled.take(ends_pa)
        n = np.diff(np.append(ustart, m)).astype(np.int64)
        return pa.table({
            'user_id': tbl.column('user_id').take(ends_pa),
            'last_type': cols['last_type'],
            'last_value': pc.cast(cols['last_value'], pa.float64()),
            'last_props': cols['last_props'],
            'last_ts': tbl.column('ts').take(ends_pa)
                .cast(pa.timestamp('us')),
            'n_events': pa.array(n),
        }, schema=out_schema)

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_golden_record_events'] = q_golden_record_events
ORACLE_SQL['q_golden_record_events'] = """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type, value, props
      FROM events WHERE ts IS NOT NULL),
    w AS (
      SELECT user_id,
             last_value(event_type IGNORE NULLS) OVER wf AS last_type,
             last_value(value IGNORE NULLS) OVER wf AS last_value,
             last_value(props IGNORE NULLS) OVER wf AS last_props,
             max(ts) OVER (PARTITION BY user_id) AS last_ts,
             count(*) OVER (PARTITION BY user_id) AS n_events,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM e
      WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING))
    SELECT user_id, last_type, last_value, last_props, last_ts,
           cast(n_events AS BIGINT) AS n_events
    FROM w WHERE rn = 1 ORDER BY user_id
"""


def q_survival_users(sf_dir: str):
    """Kaplan-Meier survival curve of user lifetimes with right
    censoring: lifetime = days between a user's first and last event;
    users whose last event falls within 12 hours of the corpus's max
    ts are CENSORED (still active), not deaths. Output per death-time:
    at-risk count, deaths, censored, and the LOG survival estimate —
    log S(t) = sum of micro-floored ln(1 - d/n) terms, an int64
    cumulative sum, so the curve is byte-stable where a floating
    product would reassociate (np.log's SIMD ulp is absorbed by the
    micro-floor; CLAUDE.md). A terminal d == n step means S hits
    exactly 0 — log_s goes NULL from there on both engines. Shape:
    one per-user min/max aggregation + a day-census exchange; the
    final scan is over distinct lifetime DAYS (bounded by the corpus
    time span, not by users)."""
    from ..stages.aggregate import bucket_aggregate
    DAY_US = 86_400_000_000
    CENSOR_US = 12 * 3_600_000_000
    ds = _read(sf_dir, 'events', ['user_id', 'ts'], require=('ts',))

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())
        return pa.table({'user_id': tbl.column('user_id'),
                         'tus': ts_us})

    spans = bucket_aggregate(
        ds.map_batches(prep, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['user_id'], {'f': ('tus', 'min'), 'l': ('tus', 'max')},
        num_buckets=16).materialize()
    out_schema = pa.schema([('t', pa.int64()), ('deaths', pa.int64()),
                            ('cens', pa.int64()),
                            ('n_risk', pa.int64()),
                            ('log_s', pa.float64())])
    mx = spans.max('l')
    if mx is None:
        return out_schema.empty_table().to_pandas()

    def census(tbl: pa.Table) -> pa.Table:
        f = tbl.column('f').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        l = tbl.column('l').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        t = (l - f) // DAY_US
        cen = ((mx - l) < CENSOR_US).astype(np.int64)
        return pa.table({'t': pa.array(t),
                         'dd': pa.array(1 - cen), 'cc': pa.array(cen)})

    cdf = _small_df(bucket_aggregate(
        spans.map_batches(census, batch_format='pyarrow',
                          zero_copy_batch=True),
        ['t'], {'deaths': ('dd', 'sum'), 'cens': ('cc', 'sum')},
        num_buckets=8), ['t', 'deaths', 'cens'])
    cdf = cdf.sort_values('t')
    t = cdf['t'].to_numpy(dtype=np.int64)
    d = cdf['deaths'].to_numpy(dtype=np.int64)
    c = cdf['cens'].to_numpy(dtype=np.int64)
    total = int((d + c).sum())
    gone = np.cumsum(d + c) - (d + c)
    n_risk = total - gone
    keep = d > 0
    t, d, c, n_risk = t[keep], d[keep], c[keep], n_risk[keep]
    if len(t) == 0:
        return out_schema.empty_table().to_pandas()
    frac = d.astype(np.float64) / n_risk
    hm = np.where(d == n_risk, 0,
                  np.floor(np.log(np.where(d == n_risk, 0.5,
                                           1.0 - frac)) * 1e6 + 0.5))\
        .astype(np.int64)
    zero_seen = np.cumsum(d == n_risk) > 0
    log_s = np.cumsum(hm).astype(np.float64) / 1e6
    return pd.DataFrame({
        't': t, 'deaths': d, 'cens': c, 'n_risk': n_risk,
        'log_s': np.where(zero_seen, np.nan, log_s)})


QUERIES['q_survival_users'] = q_survival_users
ORACLE_SQL['q_survival_users'] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events
               WHERE ts IS NOT NULL),
    g AS (SELECT max(tus) AS mx FROM e),
    u AS (SELECT user_id, min(tus) AS f, max(tus) AS l FROM e
          GROUP BY user_id),
    d AS (SELECT (l - f) // 86400000000 AS t,
                 CASE WHEN mx - l < 43200000000 THEN 1 ELSE 0 END
                   AS cen
          FROM u CROSS JOIN g),
    c AS (SELECT t, cast(sum(1 - cen) AS BIGINT) AS deaths,
                 cast(sum(cen) AS BIGINT) AS cens
          FROM d GROUP BY t),
    r AS (SELECT t, deaths, cens,
                 cast((SELECT count(*) FROM d)
                      - coalesce(sum(deaths + cens) OVER
                        (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
          FROM c),
    h AS (SELECT t, deaths, cens, n_risk,
                 CASE WHEN deaths = n_risk THEN cast(0 AS BIGINT)
                      ELSE cast(floor(ln(1.0 - cast(deaths AS DOUBLE)
                                         / n_risk) * 1e6 + 0.5)
                                AS BIGINT) END AS hm,
                 CASE WHEN deaths = n_risk THEN 1 ELSE 0 END AS z
          FROM r WHERE deaths > 0)
    SELECT t, deaths, cens, n_risk,
           CASE WHEN max(z) OVER w = 1 THEN NULL
                ELSE cast(sum(hm) OVER w AS DOUBLE) / 1e6 END AS log_s
    FROM h WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    ORDER BY t
"""


def q_drawdown_events(sf_dir: str):
    """Maximum drawdown of value per user — the running-peak-minus-
    current extremum (risk metric for any monotone-peak series).
    ENTIRELY int64: fixed-point values, segmented cummax, max of the
    gap — no float ever enters, so parity is unconditional. ONE
    per-user exchange. Also reports the peak itself and n."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([('user_id', pa.int64()), ('n', pa.int64()),
                            ('peak', pa.float64()),
                            ('max_dd', pa.float64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        v6 = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # segmented running max: pandas' cythonized groupby cummax —
        # exact int64 at ANY value range (an offset/lift trick would
        # silently leak across users once a user's value span nears
        # the band width)
        ustart = np.nonzero(starts)[0]
        gid = np.cumsum(starts) - 1
        cummax = pd.Series(v6).groupby(gid).cummax()\
            .to_numpy(dtype=np.int64)
        dd = cummax - v6
        n = np.diff(np.append(ustart, m)).astype(np.int64)
        max_dd = np.maximum.reduceat(dd, ustart)
        peak = np.maximum.reduceat(v6, ustart)
        return pa.table({
            'user_id': pa.array(users[ustart]),
            'n': pa.array(n),
            'peak': pa.array(peak.astype(np.float64) / 1e6),
            'max_dd': pa.array(max_dd.astype(np.float64) / 1e6),
        }, schema=out_schema)

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_drawdown_events'] = q_drawdown_events
ORACLE_SQL['q_drawdown_events'] = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    r AS (
      SELECT user_id, v6,
             max(v6) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS peak6
      FROM e)
    SELECT user_id, count(*) AS n,
           cast(max(peak6) AS DOUBLE) / 1e6 AS peak,
           cast(max(peak6 - v6) AS DOUBLE) / 1e6 AS max_dd
    FROM r GROUP BY user_id ORDER BY user_id
"""


def q_cusum_events(sf_dir: str):
    """CUSUM changepoint statistic per user: S_k = sum_{i<=k}(v_i - mean),
    report max_k |S_k| and the k attaining it (the changepoint location;
    tie -> smallest k). To stay EXACT-INTEGER the statistic is scaled by
    n: n*S_k = n*cumsum(v6)_k - k*total(v6), all int64 (bound: n^2 * v6
    must stay under 2^63 — fine to ~2M events/user at |value| ~1e3;
    beyond that, rescale v6). ONE per-user exchange; segmented cumsum +
    reduceat extrema, no Python loop."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([('user_id', pa.int64()), ('n', pa.int64()),
                            ('cusum_num', pa.int64()),
                            ('k_at_max', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        m = tbl.num_rows
        if m == 0:
            return out_schema.empty_table()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        v6 = _fixed6(tbl.column('value')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ustart = np.nonzero(starts)[0]
        n = np.diff(np.append(ustart, m)).astype(np.int64)
        cum = np.cumsum(v6)
        seg_base = np.repeat(cum[ustart] - v6[ustart], n)
        c = cum - seg_base                     # segmented cumsum
        tot = np.repeat(c[np.append(ustart[1:], m) - 1], n)
        n_rep = np.repeat(n, n)
        k = np.arange(m, dtype=np.int64) - np.repeat(ustart, n) + 1
        score = np.abs(n_rep * c - k * tot)
        mx = np.maximum.reduceat(score, ustart)
        # first k attaining the max (tie -> smallest k): mask non-max
        # positions to a beyond-range sentinel gated on the SEGMENT
        # (k <= n always, so n+1 cannot be attained by real data)
        k_at = np.minimum.reduceat(
            np.where(score == np.repeat(mx, n), k, m + 1), ustart)
        return pa.table({
            'user_id': pa.array(users[ustart]),
            'n': pa.array(n),
            'cusum_num': pa.array(mx),
            'k_at_max': pa.array(k_at),
        }, schema=out_schema)

    return _per_user(ds, fn).sort('user_id')


QUERIES['q_cusum_events'] = q_cusum_events
ORACLE_SQL['q_cusum_events'] = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    s AS (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id) AS n,
             sum(v6) OVER (PARTITION BY user_id) AS tot,
             sum(v6) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k
      FROM e)
    SELECT user_id, n, abs(n * c - k * tot) AS cusum_num, k AS k_at_max
    FROM s
    QUALIFY row_number() OVER (
        PARTITION BY user_id
        ORDER BY abs(n * c - k * tot) DESC, k ASC) = 1
    ORDER BY user_id
"""


def q_wow_growth_events(sf_dir: str):
    """Week-over-week growth per event_type: weekly counts, previous
    week's count, and the growth ratio — the period-over-period
    reporting primitive. Counts are exact; growth is one micro-floored
    division (NULL when there is no directly-preceding week). Weeks are
    epoch-aligned 7-day buckets (pure int arithmetic, identical on
    both engines). Low-cardinality pre_aggregate + a vocab-bounded
    driver finish."""
    from ..stages.aggregate import pre_aggregate as _pre
    WEEK_US = 7 * 86_400_000_000
    ds = _read(sf_dir, 'events', ['event_type', 'ts'], require=('ts',))

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            'event_type': tbl.column('event_type'),
            'week': pa.array(ts_us // WEEK_US),
            '_one': pa.array(np.ones(tbl.num_rows, dtype=np.int64))})

    wk = _small_df(_pre(ds.map_batches(prep, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['event_type', 'week'], {'n': ('_one', 'sum')}),
                   ['event_type', 'week', 'n'])
    if len(wk) == 0:
        return pd.DataFrame({
            'event_type': pd.Series(dtype=object),
            'week': pd.Series(dtype=np.int64),
            'n': pd.Series(dtype=np.int64),
            'prev_n': pd.Series(dtype='Int64'),
            'growth': pd.Series(dtype=np.float64)})
    wk = wk.sort_values(['event_type', 'week'],
                        na_position='last').reset_index(drop=True)
    et = wk['event_type']
    same = et.eq(et.shift()) | (et.isna() & et.shift().isna())
    adjacent = same & (wk['week'] == wk['week'].shift() + 1)
    prev = wk['n'].shift().where(adjacent)
    n = wk['n'].to_numpy(dtype=np.int64)
    pv = prev.to_numpy(dtype=np.float64)          # NaN where absent
    with np.errstate(invalid='ignore', divide='ignore'):
        growth = np.floor((n - pv) / pv * 1e6 + 0.5) / 1e6
    out = pd.DataFrame({
        'event_type': et.to_numpy(),
        'week': wk['week'].to_numpy(dtype=np.int64),
        'n': n,
        'prev_n': prev.astype('Int64'),
        'growth': growth})
    return out


QUERIES['q_wow_growth_events'] = q_wow_growth_events
ORACLE_SQL['q_wow_growth_events'] = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 604800000000 AS week
      FROM events WHERE ts IS NOT NULL),
    c AS (SELECT event_type, week, count(*) AS n FROM e
          GROUP BY event_type, week),
    l AS (
      SELECT event_type, week, n,
             CASE WHEN lag(week) OVER w = week - 1
                  THEN lag(n) OVER w END AS prev_n
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY week))
    SELECT event_type, week, n, prev_n,
           floor((n - cast(prev_n AS DOUBLE)) / prev_n * 1e6 + 0.5)
             / 1e6 AS growth
    FROM l ORDER BY event_type NULLS LAST, week
"""


def q_xcorr_events(sf_dir: str):
    """Cross-correlation of two event-type time series: Pearson r
    between weekly 'view' counts and weekly 'purchase' counts shifted
    by lag 0..3 weeks — does engagement LEAD revenue? The weekly
    census is calendar-bounded (one low-cardinality aggregation), the
    series densify over the full [min_week, max_week] range with 0
    fills on BOTH engines, and all Pearson sums are exact ints —
    doubles only in the final division/sqrt, oracle association
    order. Lag rows with degenerate variance report NULL r; lags
    beyond the week span emit NO row (the oracle's self-join is
    empty). int64 envelope: n*sxx ~ (weeks x cmax)^2, so
    weeks * max_weekly_count < ~3e9."""
    from ..stages.aggregate import pre_aggregate as _pre
    WEEK_US = 7 * 86_400_000_000
    A, B, MAX_LAG = 'view', 'purchase', 3
    ds = _read(sf_dir, 'events', ['event_type', 'ts'], require=('ts',))

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            'event_type': tbl.column('event_type'),
            'week': pa.array(ts_us // WEEK_US),
            '_one': pa.array(np.ones(tbl.num_rows, dtype=np.int64))})

    wk = _small_df(_pre(ds.map_batches(prep, batch_format='pyarrow',
                                       zero_copy_batch=True),
                        ['event_type', 'week'], {'n': ('_one', 'sum')}),
                   ['event_type', 'week', 'n'])
    empty = pd.DataFrame({'lag': pd.Series(dtype=np.int64),
                          'n_weeks': pd.Series(dtype=np.int64),
                          'r': pd.Series(dtype=np.float64)})
    wk = wk[wk['event_type'].isin([A, B])]
    if len(wk) == 0:
        return empty
    lo, hi = int(wk['week'].min()), int(wk['week'].max())
    weeks = np.arange(lo, hi + 1, dtype=np.int64)
    dense = {}
    for t in (A, B):
        sub = wk[wk['event_type'] == t]
        v = np.zeros(len(weeks), dtype=np.int64)
        v[sub['week'].to_numpy(dtype=np.int64) - lo] = \
            sub['n'].to_numpy(dtype=np.int64)
        dense[t] = v
    rows = []
    for lag in range(MAX_LAG + 1):
        # a lag with no aligned pairs produces NO row in the oracle
        # (the self-join is empty) — and a negative slice stop would
        # silently keep trailing elements (lag > span: [:-1] is one
        # element against an empty y)
        if lag >= len(weeks):
            continue
        x = dense[A][:len(weeks) - lag]
        y = dense[B][lag:]
        n = np.int64(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        r = (n * sxy - sx * sy) / np.sqrt(
            float(d1) * float(d2)) if d1 > 0 and d2 > 0 else np.nan
        rows.append((int(lag), int(n), r))
    return pd.DataFrame(rows, columns=['lag', 'n_weeks', 'r'])


QUERIES['q_xcorr_events'] = q_xcorr_events
ORACLE_SQL['q_xcorr_events'] = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 604800000000 AS week
      FROM events
      WHERE ts IS NOT NULL AND event_type IN ('view', 'purchase')),
    c AS (SELECT event_type, week, count(*) AS n FROM e
          GROUP BY event_type, week),
    b AS (SELECT min(week) AS lo, max(week) AS hi FROM e),
    w AS (SELECT unnest(range(lo, hi + 1)) AS week FROM b),
    v AS (SELECT w.week,
                 coalesce((SELECT n FROM c WHERE c.event_type = 'view'
                           AND c.week = w.week), 0) AS x,
                 coalesce((SELECT n FROM c
                           WHERE c.event_type = 'purchase'
                           AND c.week = w.week), 0) AS y
          FROM w),
    lags AS (SELECT unnest(range(0, 4)) AS lag),
    p AS (SELECT lag, a.x AS x, b2.y AS y
          FROM lags, v a JOIN v b2 ON b2.week = a.week + lag
          CROSS JOIN b WHERE a.week <= hi - lag),
    s AS (SELECT lag, cast(count(*) AS BIGINT) AS n,
                 cast(sum(x) AS BIGINT) AS sx,
                 cast(sum(y) AS BIGINT) AS sy,
                 cast(sum(x * x) AS BIGINT) AS sxx,
                 cast(sum(y * y) AS BIGINT) AS syy,
                 cast(sum(x * y) AS BIGINT) AS sxy
          FROM p GROUP BY lag)
    SELECT lag, n AS n_weeks,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN cast(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(cast(n * sxx - sx * sx AS DOUBLE)
                            * cast(n * syy - sy * sy AS DOUBLE))
           END AS r
    FROM s ORDER BY lag
"""


def q_ks_drift_events(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift statistic between the two
    deterministic hash halves of the value distribution — the
    data-drift monitor (same-distribution halves give small D; a
    shifted upstream would spike it). EXACT row pick: the sup of
    |ECDF_A - ECDF_B| is argmaxed on the cross-multiplied integer
    |cumA*nB - cumB*nA| (no float comparison can flip ties; smallest
    value wins ties on both engines); only the final normalization
    divides doubles. The value census is cardinality-bounded (distinct
    fixed-point values), so the driver finish never sees row counts.
    int64 envelope: n_a * n_b < 9e18."""
    from ..functions.sampling import split_buckets
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['event_id', 'value'],
               require=('value',))

    def prep(tbl: pa.Table) -> pa.Table:
        eid = tbl.column('event_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        side = (split_buckets(eid, mod=10_000, salt=0) >= 5_000)\
            .astype(np.int64)
        return pa.table({'v6': _fixed6(tbl.column('value')),
                         'ca': pa.array(1 - side), 'cb': pa.array(side)})

    census = _small_df(bucket_aggregate(
        ds.map_batches(prep, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['v6'], {'ca': ('ca', 'sum'), 'cb': ('cb', 'sum')},
        num_buckets=8), ['v6', 'ca', 'cb'])
    def row(na, nb, d=None, at=None):
        return pd.DataFrame({
            'n_a': pd.array([na], dtype=np.int64),
            'n_b': pd.array([nb], dtype=np.int64),
            'd': pd.array([d], dtype=np.float64),
            'at_value': pd.array([at], dtype=np.float64)})

    census = census.sort_values('v6')
    v6 = census['v6'].to_numpy(dtype=np.int64)
    ca = census['ca'].to_numpy(dtype=np.int64)
    cb = census['cb'].to_numpy(dtype=np.int64)
    na, nb = int(ca.sum()), int(cb.sum())
    if na == 0 or nb == 0:
        return row(na, nb)
    dd = np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na)
    mx = int(dd.max())
    return row(na, nb, mx / (float(na) * nb),
               float(v6[dd == mx].min()) / 1e6)


def _ks_oracle() -> str:
    from ..functions.sampling import split_sql_expr
    side = split_sql_expr('event_id', {'a': 0.5, 'b': 0.5})
    return f"""
    WITH e AS (
      SELECT cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6,
             CASE WHEN {side} = 'a' THEN 0 ELSE 1 END AS side
      FROM events WHERE value IS NOT NULL),
    n AS (SELECT
            coalesce(cast(sum(1 - side) AS BIGINT), 0) AS na,
            coalesce(cast(sum(side) AS BIGINT), 0) AS nb FROM e),
    c AS (SELECT v6, cast(sum(1 - side) AS BIGINT) AS ca,
                 cast(sum(side) AS BIGINT) AS cb
          FROM e GROUP BY v6),
    cum AS (SELECT v6,
                   cast(sum(ca) OVER w AS BIGINT) AS cuma,
                   cast(sum(cb) OVER w AS BIGINT) AS cumb
            FROM c WINDOW w AS (ORDER BY v6 ROWS UNBOUNDED PRECEDING)),
    dd AS (SELECT v6, abs(cuma * nb - cumb * na) AS dd
           FROM cum CROSS JOIN n),
    m AS (SELECT max(dd) AS mx FROM dd)
    SELECT na AS n_a, nb AS n_b,
           CASE WHEN na > 0 AND nb > 0
                THEN cast(mx AS DOUBLE) / (cast(na AS DOUBLE) * nb)
           END AS d,
           CASE WHEN na > 0 AND nb > 0 THEN
             (SELECT min(v6) FROM dd WHERE dd.dd = m.mx) / 1e6
           END AS at_value
    FROM n CROSS JOIN m
"""


QUERIES['q_ks_drift_events'] = q_ks_drift_events
ORACLE_SQL['q_ks_drift_events'] = _ks_oracle()


def q_entropy_users(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity score a curation pipeline uses to separate
    bots (entropy ~0, one action repeated) from organic users. ONE
    per-user hash exchange; type counts per user via a sorted-segment
    kernel inside the bucket.

    Byte parity (CLAUDE.md ln discipline): each p*ln(p) term is
    computed with libm ``math.log`` (== DuckDB ``ln``; np.log's SIMD
    path differs by 1 ulp on some inputs) on an EXACT double p = cnt/n
    (int64/int64 division, identical rounding on both engines), then
    micro-floored to int64 BEFORE the per-user sum — integer sums are
    order-free, so parallelism never flips a last ulp. NULL event_type
    rows carry no category — excluded on both engines."""
    import math
    ds = _read(sf_dir, 'events', ['user_id', 'event_type'],
               require=('event_type',))

    out_schema = pa.schema([('user_id', pa.int64()),
                            ('n_events', pa.int64()),
                            ('n_types', pa.int64()),
                            ('entropy', pa.float64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        users = tbl.column('user_id').to_numpy(zero_copy_only=False)
        # int codes for the (bucket-local) type vocabulary
        types = tbl.column('event_type').combine_chunks()\
            .dictionary_encode().indices.to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        lo = np.nonzero(starts)[0]
        hi = np.append(lo[1:], n)
        uid = np.empty(len(lo), dtype=np.int64)
        nev = np.empty(len(lo), dtype=np.int64)
        nty = np.empty(len(lo), dtype=np.int64)
        h6 = np.empty(len(lo), dtype=np.int64)
        log = math.log
        floor = math.floor
        for g, (s, e) in enumerate(zip(lo, hi)):   # per USER group
            cnts = np.bincount(types[s:e])
            cnts = cnts[cnts > 0]
            tot = e - s
            acc = 0
            for c in cnts.tolist():
                p = c / tot
                acc += floor(p * log(p) * 1e6 + 0.5)
            uid[g] = users[s]
            nev[g] = tot
            nty[g] = len(cnts)
            h6[g] = -acc
        return pa.table({
            'user_id': pa.array(uid),
            'n_events': pa.array(nev),
            'n_types': pa.array(nty),
            'entropy': pa.array(h6.astype(np.float64) / 1e6),
        }, schema=out_schema)

    return per_conversation(ds, fn, key='user_id', order=(),
                            num_buckets=32).sort('user_id')


QUERIES['q_entropy_users'] = q_entropy_users
ORACLE_SQL['q_entropy_users'] = """
    -- each p*ln(p) term micro-floored to int64 BEFORE the per-user sum
    -- (order-free integer aggregation; ln is libm on both engines)
    WITH c AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type),
    u AS (
      SELECT user_id, cast(sum(cnt) AS BIGINT) AS n,
             count(*) AS n_types
      FROM c GROUP BY user_id),
    t AS (
      SELECT c.user_id,
             cast(floor((cast(c.cnt AS DOUBLE) / u.n)
                        * ln(cast(c.cnt AS DOUBLE) / u.n)
                        * 1e6 + 0.5) AS BIGINT) AS term6
      FROM c JOIN u USING (user_id))
    SELECT u.user_id, u.n AS n_events, u.n_types,
           cast(-cast(sum(t.term6) AS BIGINT) AS DOUBLE) / 1e6
             AS entropy
    FROM u JOIN t ON t.user_id = u.user_id
    GROUP BY u.user_id, u.n, u.n_types
    ORDER BY u.user_id
"""


def q_gini_priority(sf_dir: str):
    """Gini coefficient of order value per order priority — the
    revenue-concentration (inequality) statistic. Per-group formula
    over ascending-sorted cent-unit prices:
    ``G = sum_i (2i - n - 1) x_i / (n * sum x)`` (1-based i), which is
    TIE-ORDER INVARIANT (equal x contribute the same regardless of
    their rank order), so no tie-break key is needed on either engine.

    Overflow discipline (CLAUDE.md second-moment rule): prices enter at
    1e2 (cent) scale, not 1e6 — the rank-weighted sum multiplies an x
    by n, and n*x6*n would wrap int64 at ~1e5 rows/group where DuckDB
    silently promotes to HUGEINT. At 1e2, 1e7-row groups stay exact.
    The final ratio is floor-quantized to micro-units before the
    divide-back, so round-half behavior never diverges."""
    ds = _read(sf_dir, 'orders', ['o_orderpriority', 'o_totalprice'],
               require=('o_totalprice',))

    out_schema = pa.schema([('o_orderpriority', pa.string()),
                            ('n_orders', pa.int64()),
                            ('total_price', pa.float64()),
                            ('gini', pa.float64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        x2 = _fixed2(tbl.column('o_totalprice')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pri = tbl.column('o_orderpriority')
        lo = np.nonzero(starts)[0]
        hi = np.append(lo[1:], n)
        rows = []
        for s, e in zip(lo, hi):                   # per PRIORITY group
            xs = np.sort(x2[s:e])
            m = e - s
            i = np.arange(1, m + 1, dtype=np.int64)
            num = int(np.sum((2 * i - m - 1) * xs))
            s2 = int(xs.sum())
            den = m * s2
            g6 = int(np.floor(num / den * 1e6 + 0.5)) if den else 0
            rows.append((pri[s].as_py(), m, s2, g6))
        return pa.table({
            'o_orderpriority': pa.array([r[0] for r in rows],
                                        type=pa.string()),
            'n_orders': pa.array([r[1] for r in rows], type=pa.int64()),
            'total_price': pa.array([r[2] / 1e2 for r in rows],
                                    type=pa.float64()),
            'gini': pa.array([r[3] / 1e6 for r in rows],
                             type=pa.float64()),
        }, schema=out_schema)

    return per_conversation(ds, fn, key='o_orderpriority', order=(),
                            num_buckets=4).sort('o_orderpriority')


QUERIES['q_gini_priority'] = q_gini_priority
ORACLE_SQL['q_gini_priority'] = """
    -- rank-weighted Gini over cent-scale int64 (tie-order invariant);
    -- ratio floor-quantized to micro-units before the divide-back
    WITH x AS (
      SELECT o_orderpriority,
             cast(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS x2
      FROM orders WHERE o_totalprice IS NOT NULL),
    r AS (
      SELECT o_orderpriority, x2,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY x2) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM x),
    a AS (
      SELECT o_orderpriority, max(n) AS n,
             cast(sum((2 * rn - n - 1) * x2) AS BIGINT) AS num,
             cast(sum(x2) AS BIGINT) AS s2
      FROM r GROUP BY o_orderpriority)
    SELECT o_orderpriority, n AS n_orders,
           cast(s2 AS DOUBLE) / 1e2 AS total_price,
           cast(floor(cast(num AS DOUBLE) / (n * s2) * 1e6 + 0.5)
                AS BIGINT) / 1e6 AS gini
    FROM a
    ORDER BY o_orderpriority
"""


def q_rfm_users(sf_dir: str):
    """RFM segmentation: per-user Recency (days since last event,
    against the corpus max timestamp), Frequency (event count) and
    Monetary (summed value), each cut into integer-rank quartile codes
    ``1 + (rank-1)*4 // n`` — the classic CRM scoring rollup.

    Shape: ONE per-user hash-bucket aggregate (bucket_aggregate — the
    same exchange every per-user query pays); the quartile cut is a
    CENSUS operation over the per-user rollup (one small row per user),
    ranked driver-side like every census/broadcast step in this suite —
    at 100 TB the rollup is ~1e9 rows and the rank becomes one
    ``Dataset.sort`` per metric instead. All ranking is pure integer
    arithmetic over (metric, user_id) — byte-stable by construction;
    NULL ts rows have no event time — excluded on both engines."""
    from ..stages.aggregate import bucket_aggregate
    ds = _read(sf_dir, 'events', ['user_id', 'ts', 'value'],
               require=('ts',))

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())
        return pa.table({'user_id': tbl.column('user_id'),
                         'ts_us': ts_us,
                         'v6': pc.fill_null(_fixed6(tbl.column('value')),
                                            0)})

    per_user = bucket_aggregate(
        ds.map_batches(prep, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['user_id'],
        {'last_ts': ('ts_us', 'max'), 'n': ('ts_us', 'count'),
         'm6': ('v6', 'sum')},
        num_buckets=16)

    df = _small_df(per_user, ['user_id', 'last_ts', 'n', 'm6'])
    out_schema = pa.schema([
        ('user_id', pa.int64()), ('recency_days', pa.int64()),
        ('n_events', pa.int64()), ('monetary', pa.float64()),
        ('r_code', pa.int64()), ('f_code', pa.int64()),
        ('m_code', pa.int64()), ('rfm_code', pa.int64())])
    if len(df) == 0:
        return out_schema.empty_table().to_pandas()
    uid = df['user_id'].to_numpy(dtype=np.int64)
    last = df['last_ts'].to_numpy(dtype=np.int64)
    n = df['n'].to_numpy(dtype=np.int64)
    m6 = df['m6'].to_numpy(dtype=np.int64)
    rec = (last.max() - last) // 86_400_000_000    # non-negative
    cnt = len(uid)

    def code(metric: np.ndarray) -> np.ndarray:
        order = np.lexsort((uid, metric))
        rn = np.empty(cnt, dtype=np.int64)
        rn[order] = np.arange(1, cnt + 1)
        return 1 + (rn - 1) * 4 // cnt

    rc, fc, mc = code(rec), code(n), code(m6)
    out = pd.DataFrame({
        'user_id': uid, 'recency_days': rec, 'n_events': n,
        'monetary': m6.astype(np.float64) / 1e6,
        'r_code': rc, 'f_code': fc, 'm_code': mc,
        'rfm_code': rc * 100 + fc * 10 + mc})
    return out.sort_values('user_id').reset_index(drop=True)


QUERIES['q_rfm_users'] = q_rfm_users
ORACLE_SQL['q_rfm_users'] = """
    -- integer quartile codes 1 + (rank-1)*4 // n over (metric, user_id)
    -- total orders; byte-stable (no ntile / float percentiles)
    WITH u AS (
      SELECT user_id, max(ts) AS last_ts, count(*) AS n,
             cast(coalesce(sum(cast(floor(value * 1e6 + 0.5)
                                    AS BIGINT)), 0) AS BIGINT) AS m6
      FROM events WHERE ts IS NOT NULL GROUP BY user_id),
    g AS (SELECT max(last_ts) AS mx FROM u),
    r AS (
      SELECT user_id,
             (epoch_us(g.mx) - epoch_us(last_ts)) // 86400000000
               AS rec_days,
             n, m6
      FROM u CROSS JOIN g),
    k AS (
      SELECT user_id, rec_days, n, m6,
             row_number() OVER (ORDER BY rec_days, user_id) AS rr,
             row_number() OVER (ORDER BY n, user_id) AS rf,
             row_number() OVER (ORDER BY m6, user_id) AS rm,
             count(*) OVER () AS cnt
      FROM r)
    SELECT user_id, rec_days AS recency_days, n AS n_events,
           cast(m6 AS DOUBLE) / 1e6 AS monetary,
           1 + (rr - 1) * 4 // cnt AS r_code,
           1 + (rf - 1) * 4 // cnt AS f_code,
           1 + (rm - 1) * 4 // cnt AS m_code,
           (1 + (rr - 1) * 4 // cnt) * 100
             + (1 + (rf - 1) * 4 // cnt) * 10
             + (1 + (rm - 1) * 4 // cnt) AS rfm_code
    FROM k
    ORDER BY user_id
"""


def q_chi2_events(sf_dir: str):
    """Chi-square independence test of event_type x day-of-week, with
    Cramer's V — "is activity mix stable across the week?", the
    categorical drift check next to q_ks_drift_events' numeric one.

    Shape: dow derives per batch from the int64 microsecond timestamp
    ((days + 4) % 7, Sunday=0, matching DuckDB dayofweek); the
    contingency table is VOCABULARY-BOUNDED (|types| x 7 cells), so a
    partial-aggregate census is the whole exchange and the statistic
    folds driver-side from ~50 cells. Per-cell terms
    (o - rc/t)^2 / (rc/t) are identical double expressions over exact
    int64 counts on both engines, micro-floored to int64 BEFORE the
    cell sum (order-free). NULL type / NULL ts rows are excluded on
    both engines."""
    import math
    ds = _read(sf_dir, 'events', ['event_type', 'ts'],
               require=('event_type', 'ts'))

    def prep(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        dow = (ts_us // 86_400_000_000 + 4) % 7
        return pa.table({'event_type': tbl.column('event_type'),
                         'dow': pa.array(dow, type=pa.int64()),
                         '_one': pa.array(np.ones(tbl.num_rows,
                                                  dtype=np.int64))})

    cells = pre_aggregate(
        ds.map_batches(prep, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['event_type', 'dow'], {'o': ('_one', 'sum')})

    df = _small_df(cells, ['event_type', 'dow', 'o'])
    out_schema = pa.schema([
        ('n_rows', pa.int64()), ('n_types', pa.int64()),
        ('n_dows', pa.int64()), ('dof', pa.int64()),
        ('chi2', pa.float64()), ('cramers_v', pa.float64())])
    if len(df) == 0:
        return out_schema.empty_table().to_pandas()
    o = df['o'].to_numpy(dtype=np.int64)
    t = int(o.sum())
    rsum = df.groupby('event_type')['o'].transform('sum')\
        .to_numpy(dtype=np.int64)
    csum = df.groupby('dow')['o'].transform('sum')\
        .to_numpy(dtype=np.int64)
    chi2_6 = 0
    floor = math.floor
    for oi, ri, ci in zip(o.tolist(), rsum.tolist(), csum.tolist()):
        e = float(ri * ci) / t
        dev = oi - e
        chi2_6 += floor(dev * dev / e * 1e6 + 0.5)
    n_types = int(df['event_type'].nunique())
    n_dows = int(df['dow'].nunique())
    dof = (n_types - 1) * (n_dows - 1)
    chi2 = chi2_6 / 1e6
    mind = min(n_types - 1, n_dows - 1)
    v6 = floor(math.sqrt(chi2 / (t * mind)) * 1e6 + 0.5) if mind else 0
    return pd.DataFrame({
        'n_rows': [t], 'n_types': [n_types], 'n_dows': [n_dows],
        'dof': [dof], 'chi2': [chi2], 'cramers_v': [v6 / 1e6]})


QUERIES['q_chi2_events'] = q_chi2_events
ORACLE_SQL['q_chi2_events'] = """
    -- per-cell (o-e)^2/e terms micro-floored to int64 before the sum;
    -- e = cast(r*c AS DOUBLE)/t, the identical scalar expression the
    -- engine evaluates per cell
    WITH s AS (
      SELECT event_type, dayofweek(ts) AS dow
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
    cell AS (
      SELECT event_type, dow, count(*) AS o
      FROM s GROUP BY event_type, dow),
    tot AS (SELECT cast(sum(o) AS BIGINT) AS t FROM cell),
    term AS (
      SELECT cast(floor(
               (o - cast(r * c AS DOUBLE) / t)
               * (o - cast(r * c AS DOUBLE) / t)
               / (cast(r * c AS DOUBLE) / t) * 1e6 + 0.5)
             AS BIGINT) AS term6
      FROM (SELECT event_type, dow, o,
                   cast(sum(o) OVER (PARTITION BY event_type)
                        AS BIGINT) AS r,
                   cast(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c
            FROM cell) CROSS JOIN tot),
    dims AS (
      SELECT count(DISTINCT event_type) AS n_types,
             count(DISTINCT dow) AS n_dows
      FROM cell),
    agg AS (SELECT cast(sum(term6) AS BIGINT) AS chi2_6 FROM term)
    SELECT tot.t AS n_rows, dims.n_types, dims.n_dows,
           (dims.n_types - 1) * (dims.n_dows - 1) AS dof,
           cast(agg.chi2_6 AS DOUBLE) / 1e6 AS chi2,
           CASE WHEN least(dims.n_types - 1, dims.n_dows - 1) > 0
                THEN cast(floor(sqrt((cast(agg.chi2_6 AS DOUBLE) / 1e6)
                       / (tot.t * least(dims.n_types - 1,
                                        dims.n_dows - 1)))
                       * 1e6 + 0.5) AS BIGINT) / 1e6
                ELSE 0.0 END AS cramers_v
    FROM tot CROSS JOIN dims CROSS JOIN agg
"""


def q_benford_orders(sf_dir: str):
    """Benford's-law screen over order totals: the distribution of the
    LEADING significant digit vs the log-law expectation
    ln(1+1/d)/ln(10) — the standard forensic test for fabricated
    numeric columns. The digit is extracted from the micro-unit int64
    by pure integer division (18 vectorized halving passes — never a
    float log10, whose boundary ulps would misclassify powers of ten);
    counts census via partial aggregation (9 cells). Shares and
    expectations are micro-floored; ln is libm on both engines."""
    import math
    ds = _read(sf_dir, 'orders', ['o_totalprice'],
               require=('o_totalprice',))

    def prep(tbl: pa.Table) -> pa.Table:
        x6 = _fixed6(tbl.column('o_totalprice')).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x6 = x6[x6 > 0]
        d = x6.copy()
        for _ in range(18):                # int64 has <= 19 digits
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        return pa.table({'digit': pa.array(d),
                         '_one': pa.array(np.ones(len(d),
                                                  dtype=np.int64))})

    census = pre_aggregate(
        ds.map_batches(prep, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['digit'], {'n': ('_one', 'sum')})

    df = _small_df(census, ['digit', 'n'])
    out_schema = pa.schema([('digit', pa.int64()), ('n', pa.int64()),
                            ('share', pa.float64()),
                            ('benford', pa.float64())])
    if len(df) == 0:
        return out_schema.empty_table().to_pandas()
    df = df.sort_values('digit').reset_index(drop=True)
    n = df['n'].to_numpy(dtype=np.int64)
    t = int(n.sum())
    floor, log = math.floor, math.log
    share6 = np.array([floor(c / t * 1e6 + 0.5) for c in n.tolist()],
                      dtype=np.int64)
    bf6 = np.array([floor(log(1 + 1 / int(d)) / log(10) * 1e6 + 0.5)
                    for d in df['digit'].tolist()], dtype=np.int64)
    return pd.DataFrame({
        'digit': df['digit'].to_numpy(dtype=np.int64), 'n': n,
        'share': share6.astype(np.float64) / 1e6,
        'benford': bf6.astype(np.float64) / 1e6})


QUERIES['q_benford_orders'] = q_benford_orders
ORACLE_SQL['q_benford_orders'] = """
    -- leading digit by string-slicing the positive micro-unit int64
    -- (no float log10); shares/expectations micro-floored like the
    -- engine
    WITH x AS (
      SELECT cast(floor(o_totalprice * 1e6 + 0.5) AS BIGINT) AS x6
      FROM orders WHERE o_totalprice IS NOT NULL),
    d AS (
      SELECT cast(substr(cast(x6 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM x WHERE x6 > 0),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT cast(sum(n) AS BIGINT) AS t FROM c)
    SELECT digit, n,
           cast(floor(cast(n AS DOUBLE) / t.t * 1e6 + 0.5) AS BIGINT)
             / 1e6 AS share,
           cast(floor(ln(1 + 1.0 / digit) / ln(10) * 1e6 + 0.5)
                AS BIGINT) / 1e6 AS benford
    FROM c CROSS JOIN t
    ORDER BY digit
"""


def q_snm_pairs_docs(sf_dir: str):
    """Sorted-neighborhood (SNM) near-dup candidate pairs: documents
    ranked globally by (32-codepoint prefix, doc_id), every pair within
    8 ranks verified by byte Levenshtein <= 12 on the prefix — the
    entity-resolution blocking family's third member next to equality
    blocking (q_editdist_pairs_docs) and LSH (q_minhash_dedup_docs).
    See stages/dedup.py:sorted_neighborhood_pairs for the two-exchange
    distributed shape (range-bucket global rank, rank-block window
    pairs with lookahead copies; only per-bucket counts touch the
    driver)."""
    from ..stages.dedup import sorted_neighborhood_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    pairs = sorted_neighborhood_pairs(
        ds, text_col='text', id_col='doc_id', prefix_cp=32,
        window=8, max_dist=12, num_buckets=8, block_size=256)
    return pairs.sort(['rank_a', 'rank_b'])


QUERIES['q_snm_pairs_docs'] = q_snm_pairs_docs
ORACLE_SQL['q_snm_pairs_docs'] = """
    -- global bytewise rank (binary collation == the engine's UTF-8
    -- codepoint sort), window join on rank distance, byte levenshtein
    WITH k AS (
      SELECT doc_id, substr(text, 1, 32) AS skey
      FROM documents WHERE text IS NOT NULL),
    r AS (
      SELECT doc_id, skey,
             row_number() OVER (ORDER BY skey, doc_id) - 1 AS rnk
      FROM k)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.rnk AS rank_a, b.rnk AS rank_b,
           levenshtein(a.skey, b.skey) AS edist
    FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 8
    WHERE levenshtein(a.skey, b.skey) <= 12
    ORDER BY rank_a, rank_b
"""


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the FULL embeddings table
    (stages/ann.kmeans_lloyd): 8 clusters, 5 iterations, init = the 8
    smallest vec_ids. Every step — assignment distances, partial sums,
    the floor-rounded mean update — is int64 micro-unit arithmetic, so
    the output is EXACTLY reproducible under any row order, batch
    boundary or partitioning (the --shuffled gate's self-parity bar) and
    the distributed path byte-equals a sequential numpy run
    (tests/test_kmeans.py). The same exactness makes the 5 iterations
    ORACLE-able (r4): each round unrolls to assignment (exploded
    (vec, dim) rows joined to the (cid, dim) centroid table, argmin
    with ties to the lowest cid) + a floor-div mean update — the
    update's numerator can be NEGATIVE, so the SQL uses the exact
    integer floor-division idiom (num - posmod(num, n)) // n rather
    than DuckDB's truncating `//` (CLAUDE.md rule).

    Output: one row per (cluster, dim) with the final centroid
    coordinate in micro-units plus the cluster size, and one summary row
    (cluster=-1, dim=-1, c6=total inertia in micro^2 units, n=0).

    100-TB shape: the pruned int matrix is materialized once; each
    iteration is one map pass emitting k*D pre-summed partial rows and a
    tiny low-cardinality merge; driver state is k*D ints."""
    from ..stages.ann import kmeans_lloyd
    import ray.data as rd
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    try:
        c6, sizes, inertia = kmeans_lloyd(ds, 'embedding', 'vec_id',
                                          n_clusters=8, iters=5)
    except ValueError:   # 0-row / all-null input
        z = pa.array([], pa.int64())
        return rd.from_arrow(pa.table({'cluster': z, 'dim': z,
                                       'c6': z, 'n': z}))
    k, d = c6.shape
    out = pa.table({
        'cluster': pa.array(np.concatenate(
            [np.repeat(np.arange(k, dtype=np.int64), d), [-1]])),
        'dim': pa.array(np.concatenate(
            [np.tile(np.arange(d, dtype=np.int64), k), [-1]])),
        'c6': pa.array(np.concatenate([c6.reshape(-1), [inertia]])),
        'n': pa.array(np.concatenate([np.repeat(sizes, d), [0]])),
    })
    return rd.from_arrow(out).sort(['cluster', 'dim'])


QUERIES['q_kmeans_embeddings'] = q_kmeans_embeddings


def _kmeans_cte_chain(k: int = 8, iters: int = 5) -> str:
    """The shared WITH-body transcribing stages/ann.kmeans_lloyd
    (int64 micro-units end to end) up to the final centroid CTE
    c{iters} — built on by the q_kmeans_embeddings AND
    q_semdedup_embeddings oracles. Floor-division with possibly
    negative numerators uses (num - ((num % n + n) % n)) // n — the
    subtraction makes the numerator an exact multiple of n, where
    truncation equals floor."""
    head = f"""
    WITH vecs AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
                            v -> cast(floor(v * 1e6 + 0.5) AS BIGINT))
               AS x6
      FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL),
    vx AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(x6, 1) - 1 AS dim,
             unnest(x6) AS x
      FROM vecs),
    seed AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      FROM vecs ORDER BY vec_id LIMIT {k}),
    c0 AS MATERIALIZED (
      SELECT s.cid, v.dim, v.x AS c
      FROM seed s JOIN vx v ON v.vec_id = s.vec_id)"""
    steps = []
    for i in range(1, iters + 1):
        p = f'c{i - 1}'
        steps.append(f""",
    d{i} AS MATERIALIZED (
      SELECT v.vec_id, c.cid,
             cast(sum((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS d2
      FROM vx v JOIN {p} c ON c.dim = v.dim
      GROUP BY v.vec_id, c.cid),
    a{i} AS MATERIALIZED (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rnk
        FROM d{i}) WHERE rnk = 1),
    s{i} AS MATERIALIZED (
      SELECT a.cid, v.dim, cast(sum(v.x) AS BIGINT) AS s,
             cast(count(*) AS BIGINT) AS n
      FROM a{i} a JOIN vx v ON v.vec_id = a.vec_id
      GROUP BY a.cid, v.dim),
    c{i} AS MATERIALIZED (
      SELECT p.cid, p.dim,
             CASE WHEN s.n IS NULL THEN p.c
                  ELSE ((s.s + s.n // 2)
                        - (((s.s + s.n // 2) % s.n + s.n) % s.n))
                       // s.n
             END AS c
      FROM {p} p LEFT JOIN s{i} s
        ON s.cid = p.cid AND s.dim = p.dim)""")
    return head + ''.join(steps)


def _kmeans_oracle_sql(k: int = 8, iters: int = 5) -> str:
    """q_kmeans_embeddings: the shared Lloyd chain plus the
    (cluster, dim, c6, n) + inertia-row tail."""
    tail = f"""
    SELECT c.cid AS cluster, c.dim, c.c AS c6,
           coalesce(z.n, 0) AS n
    FROM c{iters} c
    LEFT JOIN (SELECT cid, cast(count(*) AS BIGINT) AS n
               FROM a{iters} GROUP BY cid) z ON z.cid = c.cid
    UNION ALL
    SELECT -1, -1, (SELECT cast(coalesce(sum(d2), 0) AS BIGINT)
                    FROM a{iters}), 0
    WHERE EXISTS (SELECT 1 FROM vecs)
    ORDER BY cluster, dim"""
    return _kmeans_cte_chain(k, iters) + tail


ORACLE_SQL['q_kmeans_embeddings'] = _kmeans_oracle_sql()


def q_seasonal_events(sf_dir: str):
    """Seasonal-baseline anomaly detection: the baseline for each event
    is the mean value of its (day-of-week, hour-of-day) cell across the
    whole table; the 50 events with the largest |value - baseline| are
    the anomalies. The time-series profiling primitive behind "is this
    reading unusual FOR a Tuesday 3am".

    Byte discipline: values enter as _fixed6 micro-units; the per-cell
    mean is a FLOOR division made sign-safe with a 2^40 offset (DuckDB
    ``//`` truncates toward zero on negatives, numpy floors — the offset
    makes the numerator positive so both floor, CLAUDE.md ``//`` rule);
    the residual and its |.| are then exact ints, so the top-50 pick and
    the event_id tie-break are integer-deterministic on both engines.

    100-TB shape: one pass of per-batch partials into a 168-cell
    pre_aggregate, the tiny baseline broadcast driver-side, one scoring
    pass pruned per batch by global_topk — no full sort, no row
    exchange."""
    from ..stages.aggregate import pre_aggregate as _pre, global_topk
    _OFF = 1 << 40
    ds = _read(sf_dir, 'events', ['event_id', 'ts', 'value'],
               require=('ts', 'value'))
    out_schema = pa.schema([
        ('event_id', pa.int64()), ('dow', pa.int64()),
        ('hr', pa.int64()), ('n_grp', pa.int64()),
        ('resid6', pa.int64())])

    def parts(tbl: pa.Table):
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        days = ts_us // 86_400_000_000
        dow = (days + 4) % 7            # epoch day 0 = Thursday = 4
        hr = (ts_us // 3_600_000_000) % 24
        v6 = _fixed6(tbl.column('value')).to_numpy(zero_copy_only=False)
        return dow, hr, v6

    def cell_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({'dow': z, 'hr': z, 's6': z, '_one': z})
        dow, hr, v6 = parts(tbl)
        return pa.table({'dow': pa.array(dow), 'hr': pa.array(hr),
                         's6': pa.array(v6),
                         '_one': pa.array(np.ones(len(v6), np.int64))})

    base = _small_df(_pre(
        ds.map_batches(cell_partial, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['dow', 'hr'], {'s6': ('s6', 'sum'), 'n': ('_one', 'count')}),
        ['dow', 'hr', 's6', 'n'])
    if len(base) == 0:
        import ray.data as rd
        return rd.from_arrow(out_schema.empty_table())
    mean6 = np.full((7, 24), 0, dtype=np.int64)
    ncell = np.zeros((7, 24), dtype=np.int64)
    bd = base['dow'].to_numpy(np.int64)
    bh = base['hr'].to_numpy(np.int64)
    bs = base['s6'].to_numpy(np.int64)
    bn = base['n'].to_numpy(np.int64)
    mean6[bd, bh] = (bs + _OFF * bn) // bn - _OFF
    ncell[bd, bh] = bn
    import ray as _ray
    bref = _ray.put((mean6, ncell))

    class Score:
        def __init__(self):
            self.mean6, self.ncell = _ray.get(bref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return out_schema.empty_table().append_column(
                    '_a6', pa.array([], pa.int64()))
            dow, hr, v6 = parts(tbl)
            resid6 = v6 - self.mean6[dow, hr]
            return pa.table({
                'event_id': pc.cast(tbl.column('event_id'), pa.int64()),
                'dow': pa.array(dow), 'hr': pa.array(hr),
                'n_grp': pa.array(self.ncell[dow, hr]),
                'resid6': pa.array(resid6),
                '_a6': pa.array(np.abs(resid6)),
            })

    top = global_topk(
        ds.map_batches(Score, batch_format='pyarrow', concurrency=2),
        [('_a6', 'descending'), ('event_id', 'ascending')], 50)
    return top.drop_columns(['_a6']).sort(['resid6', 'event_id'])


QUERIES['q_seasonal_events'] = q_seasonal_events
ORACLE_SQL['q_seasonal_events'] = """
    WITH e AS (
      SELECT event_id, dayofweek(ts) AS dow, hour(ts) AS hr,
             cast(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    g AS (
      SELECT dow, hr, sum(v6) AS s6, count(*) AS n
      FROM e GROUP BY dow, hr),
    j AS (
      SELECT e.event_id, e.dow, e.hr, g.n AS n_grp,
             e.v6 - ((g.s6 + 1099511627776 * g.n) // g.n
                     - 1099511627776) AS resid6
      FROM e JOIN g USING (dow, hr)),
    t AS (
      SELECT * FROM j
      ORDER BY abs(resid6) DESC, event_id
      LIMIT 50)
    SELECT event_id, dow, hr, n_grp, resid6
    FROM t ORDER BY resid6, event_id
"""


def q_wilson_events(sf_dir: str):
    """Wilson score 95% confidence interval for the per-event-type
    success proportion (success = value > 100) — the interval estimate a
    conversion dashboard puts around every rate. Counts are exact ints
    from one low-cardinality partial aggregation; the interval is one
    scalar double formula per group computed in the ORACLE'S association
    order (z*z folded as a DOUBLE product on both engines — DuckDB folds a bare
    1.96*1.96 in DECIMAL, a DIFFERENT double than 1.96**2, hence the
    explicit casts in the oracle; sqrt and /,*,+ are IEEE
    correctly-rounded, so identical expression trees give identical
    bits — same discipline as q_ab_test_events).

    100-TB shape: per-batch (type, n, k) partials into an 8-bucket
    exchange; the driver computes the closed form on the handful of
    group rows."""
    from ..stages.aggregate import pre_aggregate as _pre
    import ray.data as rd
    ds = _read(sf_dir, 'events', ['event_type', 'value'],
               require=('value',))

    def part(tbl: pa.Table) -> pa.Table:
        succ = pc.cast(pc.greater(tbl.column('value'), pa.scalar(100.0)),
                       pa.int64())
        return pa.table({
            'event_type': tbl.column('event_type'),
            '_one': pa.array(np.ones(tbl.num_rows, np.int64)),
            '_succ': pc.fill_null(succ, 0),
        })

    g = _small_df(_pre(
        ds.map_batches(part, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['event_type'], {'n': ('_one', 'count'), 'k': ('_succ', 'sum')}),
        ['event_type', 'n', 'k'])
    out_schema = pa.schema([
        ('event_type', pa.string()), ('n', pa.int64()),
        ('k', pa.int64()), ('wilson_lo', pa.float64()),
        ('wilson_hi', pa.float64())])
    if len(g) == 0:
        return rd.from_arrow(out_schema.empty_table())
    n = g['n'].to_numpy(np.int64).astype(np.float64)
    k = g['k'].to_numpy(np.int64).astype(np.float64)
    z = 1.96
    zz = z * z                      # folded constant, == DuckDB's
    p = k / n
    root = z * np.sqrt((p * (1.0 - p) + zz / (4.0 * n * n)) / n)
    denom = 1.0 + zz / n
    lo = (p + zz / (2.0 * n) - root) / denom
    hi = (p + zz / (2.0 * n) + root) / denom
    out = pa.table({
        'event_type': pa.array(g['event_type'].astype(object).where(
            g['event_type'].notna(), None), pa.string()),
        'n': pa.array(n.astype(np.int64)),
        'k': pa.array(k.astype(np.int64)),
        'wilson_lo': pa.array(lo, pa.float64()),
        'wilson_hi': pa.array(hi, pa.float64()),
    })
    return _sort_ns(rd.from_arrow(out), ['event_type'],
                    str_cols=('event_type',))


QUERIES['q_wilson_events'] = q_wilson_events
ORACLE_SQL['q_wilson_events'] = """
    WITH g AS (
      SELECT event_type, count(*) AS n,
             sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS k
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type)
    SELECT event_type, n, k,
      ((cast(k AS DOUBLE) / cast(n AS DOUBLE))
       + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / (2.0 * cast(n AS DOUBLE))
       - 1.96 * sqrt(((cast(k AS DOUBLE) / cast(n AS DOUBLE))
                      * (1.0 - cast(k AS DOUBLE) / cast(n AS DOUBLE))
                      + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / (4.0 * cast(n AS DOUBLE)
                                       * cast(n AS DOUBLE)))
                     / cast(n AS DOUBLE)))
      / (1.0 + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / cast(n AS DOUBLE)) AS wilson_lo,
      ((cast(k AS DOUBLE) / cast(n AS DOUBLE))
       + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / (2.0 * cast(n AS DOUBLE))
       + 1.96 * sqrt(((cast(k AS DOUBLE) / cast(n AS DOUBLE))
                      * (1.0 - cast(k AS DOUBLE) / cast(n AS DOUBLE))
                      + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / (4.0 * cast(n AS DOUBLE)
                                       * cast(n AS DOUBLE)))
                     / cast(n AS DOUBLE)))
      / (1.0 + (cast(1.96 AS DOUBLE)*cast(1.96 AS DOUBLE)) / cast(n AS DOUBLE)) AS wilson_hi
    FROM g ORDER BY event_type
"""


def q_dl_pairs_docs(sf_dir: str):
    """Transposition-aware near-dup pairs: same (lang, 64-char length
    band) equality blocking as q_editdist_pairs_docs, but the verify
    kernel is the UNRESTRICTED Damerau-Levenshtein distance over the
    32-codepoint text prefix (functions/text.py:
    damerau_levenshtein_bytes — banded DP with a bounded-lookback ring
    for the transposition reference, vectorized across pairs; byte
    semantics differentially verified against DuckDB's
    damerau_levenshtein on random/multibyte corpora in
    tests/test_dl_kernel.py). Transposition awareness matters for
    OCR/typo-heavy dedup where swapped characters are 1 edit, not 2."""
    from ..stages.dedup import editdist_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang', 'n_chars'],
               require=('text', 'lang', 'n_chars'))

    def band(tbl: pa.Table) -> pa.Table:
        b = np.floor_divide(
            tbl.column('n_chars').combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False), 64)
        return tbl.append_column('band', pa.array(b, type=pa.int64()))

    banded = ds.map_batches(band, batch_format='pyarrow',
                            zero_copy_batch=True)
    return editdist_pairs(banded, ['lang', 'band'], prefix_cp=32,
                          max_dist=12, num_buckets=16,
                          kernel='damerau').sort(['doc_a', 'doc_b'])


QUERIES['q_dl_pairs_docs'] = q_dl_pairs_docs
ORACLE_SQL['q_dl_pairs_docs'] = """
    WITH d AS (
      SELECT doc_id, lang, n_chars // 64 AS band,
             substr(text, 1, 32) AS pfx
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           damerau_levenshtein(a.pfx, b.pfx) AS edist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE damerau_levenshtein(a.pfx, b.pfx) <= 12
    ORDER BY doc_a, doc_b
"""


def q_lpa_embeddings(sf_dir: str):
    """Community detection over the cosine>=0.3 graph by synchronous
    label propagation (stages/graph.py:label_propagation): 10 rounds of
    every node adopting its neighbors' most frequent label, ties to the
    smallest label — fully deterministic, so local == distributed ==
    any row order byte-exactly (tests/test_graph.py::TestLPA).
    ORACLE-able (r4): a FIXED round count of an exact-integer majority
    vote unrolls into a MATERIALIZED CTE chain (count DESC, label ASC
    row_number pick per round — the same tie rule as _lpa_pick); the
    engine's early fixpoint exit is parity-safe because converged
    rounds are no-ops on both sides."""
    from ..stages.graph import label_propagation
    edges = _cosine_edge_ds(sf_dir)
    return label_propagation(edges, iters=10, num_buckets=8)\
        .sort('node')


def _lpa_oracle_sql(iters: int = 10) -> str:
    """SQL twin of label_propagation over the q_cosine_pairs edge set:
    ``iters`` unrolled synchronous majority-vote rounds. Every CTE is
    MATERIALIZED (CLAUDE.md chained-recursion rule)."""
    parts = ["""
    WITH e0 AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) a
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) b
        ON a.vec_id < b.vec_id
      WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                       * 1e6 + 0.5) AS BIGINT) >= 300000),
    adj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM e0
      UNION ALL SELECT b, a FROM e0),
    l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM adj)"""]
    for r in range(1, iters + 1):
        parts.append(f""",
    v{r} AS MATERIALIZED (
      SELECT adj.node, l.lab, count(*) AS c
      FROM adj JOIN l{r - 1} l ON adj.nb = l.node
      GROUP BY adj.node, l.lab),
    l{r} AS MATERIALIZED (
      SELECT node, lab FROM (
        SELECT node, lab, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, lab) AS rn
        FROM v{r}) WHERE rn = 1)""")
    parts.append(f"""
    SELECT node, lab AS community FROM l{iters} ORDER BY node""")
    return ''.join(parts)


QUERIES['q_lpa_embeddings'] = q_lpa_embeddings
ORACLE_SQL['q_lpa_embeddings'] = _lpa_oracle_sql()


def q_concurrent_sessions_events(sf_dir: str):
    """Interval OVERLAP self-join (stages/joins.py:interval_join): which
    user pairs were online at the same time, and for how long. Sessions
    (30-min gap rule, identical to q_session_stats) become closed
    [first-event, last-event] intervals; the join replicates each
    interval to the day buckets it touches, finds candidates with a
    banded search on clip-sorted starts, and emits every overlapping
    pair exactly once via the max(lo_a, lo_b) responsibility bucket.
    Output per (user_a < user_b): overlapping-session-pair count and
    total overlap in EXACT integer microseconds (no float anywhere, so
    the parallel aggregation is trivially byte-stable vs the oracle's
    nested-loop inequality join)."""
    from ..stages.aggregate import bucket_aggregate
    from ..stages.joins import interval_join
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'],
               require=('ts',))

    def sess_fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        is_new, session_id = W.sessionize(ts_us, starts, GAP_US)
        lo = np.nonzero(is_new)[0]
        hi = np.append(lo[1:], len(ts_us)) - 1
        return pa.table({
            'user_id': pa.array(users[lo]),
            'session_id': pa.array(session_id[lo].astype(np.int64)),
            'lo_us': pa.array(ts_us[lo]),
            'hi_us': pa.array(ts_us[hi]),
        })

    sess_schema = pa.schema([('user_id', pa.int64()),
                             ('session_id', pa.int64()),
                             ('lo_us', pa.int64()),
                             ('hi_us', pa.int64())])
    sess = per_conversation(ds, sess_fn, key='user_id',
                            order=('ts', 'event_id'),
                            num_buckets=8).materialize()
    # 2h buckets: sessions cap at ~1h (30-min gap rule), so intervals
    # touch <= 2 buckets while dense-concurrency buckets stay small —
    # at 2M synthetic events the 1-day default was 10x slower (one
    # day-bucket held every concurrent session)
    joined = interval_join(sess, sess, lo='lo_us', hi='hi_us',
                           bucket_us=7_200_000_000, num_buckets=16,
                           left_schema=sess_schema,
                           right_schema=sess_schema)

    def pair_partial(tbl: pa.Table) -> pa.Table:
        ua = tbl.column('user_id_a')
        ub = tbl.column('user_id_b')
        t = tbl.filter(pc.less(ua, ub))   # NULL users never pair (SQL)
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({'user_a': z, 'user_b': z,
                             '_one': z, 'ov_us': z})
        ov = pc.subtract(
            pc.min_element_wise(t.column('hi_us_a'), t.column('hi_us_b')),
            pc.max_element_wise(t.column('lo_us_a'), t.column('lo_us_b')))
        return pa.table({
            'user_a': pc.cast(t.column('user_id_a'), pa.int64()),
            'user_b': pc.cast(t.column('user_id_b'), pa.int64()),
            '_one': pa.array(np.ones(t.num_rows, np.int64)),
            'ov_us': pc.cast(ov, pa.int64()),
        })

    out = bucket_aggregate(
        joined.map_batches(pair_partial, batch_format='pyarrow'),
        ['user_a', 'user_b'],
        {'n_pairs': ('_one', 'sum'), 'overlap_us': ('ov_us', 'sum')},
        num_buckets=16)
    return out.sort(['user_a', 'user_b'])


QUERIES['q_concurrent_sessions_events'] = q_concurrent_sessions_events
ORACLE_SQL['q_concurrent_sessions_events'] = """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM o),
    g AS (
      SELECT user_id, ts,
             cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) - 1
                  AS BIGINT) AS session_id
      FROM f),
    s AS (
      SELECT user_id, epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
      FROM g GROUP BY user_id, session_id)
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_pairs,
           sum(least(a.hi, b.hi) - greatest(a.lo, b.lo)) AS overlap_us
    FROM s a JOIN s b
      ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id < b.user_id
    GROUP BY a.user_id, b.user_id
    ORDER BY user_a, user_b
"""


def q_nfc_docs(sf_dir: str):
    """Unicode NFC normalization of the corpus text
    (functions/text.py:nfc_normalize — ASCII fast path + NFC
    quick-check, byte-matching DuckDB nfc_normalize): the canonical
    first step of any multilingual training-data pipeline (decomposed
    accents, compatibility forms and jamo all collapse to one
    representation so downstream dedup/fingerprints see one form).
    Output: normalized text, its codepoint length, and whether the row
    changed — byte-compared against the oracle, which the --dirty gate
    feeds adversarial decomposed/combining input."""
    from ..functions.text import nfc_normalize
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def fn(tbl: pa.Table) -> pa.Table:
        txt = tbl.column('text').combine_chunks()
        norm = nfc_normalize(txt)
        return pa.table({
            'doc_id': pc.cast(tbl.column('doc_id'), pa.int64()),
            'norm_text': norm,
            'norm_chars': pc.cast(pc.utf8_length(norm), pa.int64()),
            'changed': pc.not_equal(norm, txt),
        })

    return ds.map_batches(fn, batch_format='pyarrow',
                          zero_copy_batch=True).sort('doc_id')


QUERIES['q_nfc_docs'] = q_nfc_docs
ORACLE_SQL['q_nfc_docs'] = """
    SELECT doc_id, nfc_normalize(text) AS norm_text,
           length(nfc_normalize(text)) AS norm_chars,
           (nfc_normalize(text) <> text) AS changed
    FROM documents ORDER BY doc_id
"""


def q_dbscan_embeddings(sf_dir: str):
    """DBSCAN density clustering over the cosine eps-graph
    (stages/graph.py:dbscan_from_edges; eps-neighborhood = the exact
    cos>=0.3 pairs shared with the other graph-metric queries,
    min_pts=4): core points sit in dense regions, borders attach to
    the SMALLEST adjacent core cluster (the deterministic pin of
    DBSCAN's classically order-dependent step), everything else is
    noise. Complements k-means (centroidal) and LPA (modularity-ish)
    with density-based clustering that finds non-convex shapes and an
    explicit noise class. ORACLE-able (r4): core/border rules are
    exact-integer predicates, and the cluster labels are min-label CC
    over core-core edges — unrollable as least(own, min-neighbor)
    rounds (measured 8 to fixpoint at sf scale; 20 unrolled, no-ops
    past fixpoint). Brute-force + local==distributed parity stay in
    tests/test_graph.py::TestDBSCAN."""
    from ..stages.graph import dbscan_from_edges
    edges = _cosine_edge_ds(sf_dir)
    # the node universe must match the edge builder's (vec_id < 1000,
    # non-null embedding): isolated vectors classify as noise
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])

    def nodes_fn(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.and_(
            pc.less(tbl.column('vec_id'), 1000),
            pc.is_valid(tbl.column('embedding'))))
        return pa.table({'node': t.column('vec_id').combine_chunks()
                         .cast(pa.int64())})

    nodes = ds.map_batches(nodes_fn, batch_format='pyarrow',
                           zero_copy_batch=True)
    return dbscan_from_edges(edges, nodes, min_pts=4,
                             num_buckets=8).sort('node')


def _dbscan_oracle_sql(min_pts: int = 4, rounds: int = 20) -> str:
    """SQL twin of dbscan_from_edges over the q_cosine_pairs edge set:
    core iff degree + 1 >= min_pts, cluster = min-label CC over
    core-core edges (``rounds`` unrolled least(own, min-neighbor)
    steps, MATERIALIZED per CLAUDE.md), border = smallest adjacent
    core cluster, else noise (-1). DuckDB least() ignoring NULLs is
    exactly the no-core-neighbor case."""
    parts = [f"""
    WITH e0 AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) a
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb
            FROM embeddings WHERE vec_id < 1000) b
        ON a.vec_id < b.vec_id
      WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                       * 1e6 + 0.5) AS BIGINT) >= 300000),
    uni AS MATERIALIZED (
      SELECT vec_id AS node FROM embeddings
      WHERE vec_id < 1000 AND embedding IS NOT NULL),
    deg AS MATERIALIZED (
      SELECT node, count(*)::BIGINT AS deg FROM (
        SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
      GROUP BY node),
    core AS MATERIALIZED (
      SELECT node FROM deg WHERE deg + 1 >= {min_pts}),
    cce AS MATERIALIZED (
      SELECT a, b FROM e0
      WHERE a IN (SELECT node FROM core)
        AND b IN (SELECT node FROM core)),
    adjc AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM cce
      UNION ALL SELECT b, a FROM cce),
    c0 AS MATERIALIZED (SELECT node, node AS lab FROM core)"""]
    for r in range(1, rounds + 1):
        # hooking + pointer jumping (see _minhash_cluster_ctes):
        # logarithmic convergence keeps the fixed unroll safely past
        # the engine's CC fixpoint on chain-shaped clusters
        parts.append(f""",
    c{r} AS MATERIALIZED (
      SELECT c.node, least(c.lab, j.lab, m.mn) AS lab
      FROM c{r - 1} c
      LEFT JOIN c{r - 1} j ON j.node = c.lab
      LEFT JOIN (
        SELECT adjc.node, min(l.lab) AS mn
        FROM adjc JOIN c{r - 1} l ON adjc.nb = l.node
        GROUP BY adjc.node) m ON m.node = c.node)""")
    parts.append(f""",
    border AS MATERIALIZED (
      SELECT adj.node, min(cl.lab) AS lab FROM (
        SELECT a AS node, b AS nb FROM e0
        UNION ALL SELECT b, a FROM e0) adj
      JOIN c{rounds} cl ON adj.nb = cl.node
      WHERE adj.node NOT IN (SELECT node FROM core)
      GROUP BY adj.node)
    SELECT u.node,
           (CASE WHEN cl.lab IS NOT NULL THEN 0
                 WHEN bo.lab IS NOT NULL THEN 1
                 ELSE 2 END)::TINYINT AS role,
           coalesce(cl.lab, bo.lab, -1)::BIGINT AS cluster
    FROM uni u
    LEFT JOIN c{rounds} cl ON cl.node = u.node
    LEFT JOIN border bo ON bo.node = u.node
    ORDER BY u.node""")
    return ''.join(parts)


QUERIES['q_dbscan_embeddings'] = q_dbscan_embeddings
ORACLE_SQL['q_dbscan_embeddings'] = _dbscan_oracle_sql()


def q_bpe_train_docs(sf_dir: str):
    """BPE vocabulary training over the corpus
    (functions/text.py:bpe_train_from_word_counts): 100 merges learned
    from the word-frequency table. The SCALE SHAPE is the one real
    trainers use — the corpus is scanned ONCE (vectorized whitespace
    split + explode, one hash-bucket count per distinct word), the
    distinct-word table is capped at the 50k most frequent words
    (global_topk — count desc, word asc, deterministic), and the merge
    loop runs over that tiny table locally. ORACLE-able as of r5 (the
    r4 'iterative, not unrollable' claim fell to the Lloyd/peel unroll
    pattern): each of the 100 merge rounds is 5 MATERIALIZED CTEs —
    weighted pair counts, ORDER-BY-LIMIT-1 best pair, and the
    leftmost-first overlap rule as a run-parity window — see
    _bpe_train_ctes; exact reference-impl parity incl. overlap chains
    additionally pinned in tests/test_bpe.py. Output: one row per
    merge, rank-ordered."""
    from ..functions.text import bpe_train_from_word_counts
    from ..stages.aggregate import bucket_aggregate, global_topk
    import ray.data as rd
    out_schema = pa.schema([
        ('rank', pa.int64()), ('left', pa.string()),
        ('right', pa.string()), ('merged', pa.string()),
        ('pair_count', pa.int64())])
    ds = _read(sf_dir, 'documents', ['text'], require=('text',))

    def words_fn(tbl: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(tbl.column('text').combine_chunks(), ''), ' ')
        flat = w.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({'word': flat,
                         '_one': pa.array(
                             np.ones(len(flat), np.int64))})

    wc = bucket_aggregate(
        ds.map_batches(words_fn, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['word'], {'n': ('_one', 'sum')}, num_buckets=16)
    top = global_topk(wc, [('n', 'descending'), ('word', 'ascending')],
                      50_000)
    df = _small_df(top, ['word', 'n'])
    if len(df) == 0:
        return rd.from_arrow(out_schema.empty_table())
    merges = bpe_train_from_word_counts(
        df['word'].tolist(), df['n'].tolist(), num_merges=100)
    if not merges:
        return rd.from_arrow(out_schema.empty_table())
    return rd.from_arrow(pa.table({
        'rank': pa.array(np.arange(len(merges), dtype=np.int64)),
        'left': pa.array([m[0] for m in merges], pa.string()),
        'right': pa.array([m[1] for m in merges], pa.string()),
        'merged': pa.array([m[2] for m in merges], pa.string()),
        'pair_count': pa.array([m[3] for m in merges], pa.int64()),
    })).sort('rank')


QUERIES['q_bpe_train_docs'] = q_bpe_train_docs


def q_bpe_encode_docs(sf_dir: str):
    """BPE ENCODE with the vocabulary learned by q_bpe_train_docs:
    per-document token counts under the trained merges — the token
    budgeting that decides what a corpus costs to train on. The merge
    table is broadcast once (ray.put) into an ACTOR-POOL stage whose
    __init__ resolves merge codes per actor and whose __call__ applies
    the SAME vectorized merge pass as the trainer over the whole batch
    (functions/text.py:bpe_encode_counts — apply == train semantics by
    shared kernel, reference parity in tests/test_bpe.py). ORACLE-able
    as of r5: the oracle re-derives the merge table (shared
    _bpe_train_ctes chain) and unrolls the same 100 applications over
    every distinct corpus word (_bpe_encode_oracle)."""
    import ray as _ray
    import ray.data as rd
    from ..pipelines.queries import q_bpe_train_docs  # self-module ref
    out_schema = pa.schema([('doc_id', pa.int64()),
                            ('n_chars', pa.int64()),
                            ('n_tokens', pa.int64())])
    mt = _small_df(q_bpe_train_docs(sf_dir),
                   ['rank', 'left', 'right', 'merged', 'pair_count'])
    merges = [(r['left'], r['right'], r['merged'], int(r['pair_count']))
              for _, r in mt.sort_values('rank').iterrows()]
    mref = _ray.put(merges)
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'],
               require=('text',))

    class Encode:
        def __init__(self):
            from ..functions.text import bpe_encode_counts
            self._encode = bpe_encode_counts
            self._merges = _ray.get(mref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return out_schema.empty_table()
            texts = tbl.column('text').to_pylist()
            return pa.table({
                'doc_id': pc.cast(tbl.column('doc_id'), pa.int64()),
                'n_chars': pc.cast(pc.utf8_length(
                    tbl.column('text').combine_chunks()), pa.int64()),
                'n_tokens': pa.array(self._encode(texts, self._merges)),
            }, schema=out_schema)

    return ds.map_batches(Encode, batch_format='pyarrow',
                          concurrency=2).sort('doc_id')


QUERIES['q_bpe_encode_docs'] = q_bpe_encode_docs


def _bpe_train_ctes(rounds: int) -> str:
    """CTE chain transcribing bpe_train_from_word_counts over the
    ``documents`` view — the r5 de-listing of the LAST 'iterative, not
    unrollable' claims. Each merge round is 5 CTEs: weighted adjacent
    pair counts (overlaps counted, like the engine's bincount), the
    best pair via ORDER BY cnt DESC, l, rgt LIMIT 1 (python min on the
    string tuple == DuckDB binary collation — UTF-8 byte order is
    codepoint order), candidate positions, the leftmost-first
    non-overlap rule as run-parity (pos - row_number() groups a run of
    consecutive candidates; even offsets merge — exactly
    _apply_bpe_merge's pos_in_run %% 2, and a no-op unless left ==
    right), and the rebuilt tokenization. LEFT JOIN b{r} ON TRUE makes
    an exhausted round (no pairs left) a no-op instead of truncating
    the chain, mirroring the engine's loop break. ~500 MATERIALIZED
    CTEs at 100 rounds: DuckDB 1.0 plans and runs it in ~5 s at sf0.01
    (the MATERIALIZED markers are load-bearing — CLAUDE.md
    chained-recursion rule)."""
    parts = ["""
    words0 AS (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL),
    wc0 AS (
      SELECT word, count(*)::BIGINT AS n FROM words0
      WHERE len(word) > 0 GROUP BY word),
    wcnt AS MATERIALIZED (
      SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS wid
      FROM (SELECT * FROM wc0 ORDER BY n DESC, word LIMIT 50000)),
    tokp AS (
      SELECT wid, word,
             unnest(generate_series(1, len(word))) AS pos
      FROM wcnt),
    tok0 AS MATERIALIZED (
      SELECT wid, pos, substr(word, CAST(pos AS INTEGER), 1) AS sym
      FROM tokp)"""]
    for r in range(1, rounds + 1):
        q = r - 1
        parts.append(f""",
    p{r} AS (
      SELECT a.sym AS l, c.sym AS rgt, sum(w.n) AS cnt
      FROM tok{q} a
      JOIN tok{q} c ON c.wid = a.wid AND c.pos = a.pos + 1
      JOIN wcnt w ON w.wid = a.wid
      GROUP BY a.sym, c.sym),
    b{r} AS MATERIALIZED (
      SELECT l, rgt, l || rgt AS m, cnt
      FROM p{r} ORDER BY cnt DESC, l, rgt LIMIT 1),
    cand{r} AS (
      SELECT t.wid, t.pos,
             t.pos - row_number() OVER (PARTITION BY t.wid
                                        ORDER BY t.pos) AS grp
      FROM tok{q} t
      JOIN tok{q} u ON u.wid = t.wid AND u.pos = t.pos + 1
      JOIN b{r} bb ON t.sym = bb.l AND u.sym = bb.rgt),
    keep{r} AS MATERIALIZED (
      SELECT wid, pos FROM (
        SELECT wid, pos,
               (pos - min(pos) OVER (PARTITION BY wid, grp)) % 2 AS par
        FROM cand{r})
      WHERE par = 0),
    tok{r} AS MATERIALIZED (
      SELECT t.wid,
             row_number() OVER (PARTITION BY t.wid
                                ORDER BY t.pos) AS pos,
             CASE WHEN k.pos IS NOT NULL THEN bb.m ELSE t.sym END AS sym
      FROM tok{q} t
      LEFT JOIN b{r} bb ON TRUE
      LEFT JOIN keep{r} k ON k.wid = t.wid AND k.pos = t.pos
      LEFT JOIN keep{r} d ON d.wid = t.wid AND d.pos = t.pos - 1
      WHERE d.pos IS NULL)""")
    return ''.join(parts)


def _bpe_train_oracle(rounds: int = 100) -> str:
    sel = '\n      UNION ALL '.join(
        f'SELECT CAST({r - 1} AS BIGINT) AS rank, l AS "left", '
        f'rgt AS "right", m AS merged, CAST(cnt AS BIGINT) '
        f'AS pair_count FROM b{r}'
        for r in range(1, rounds + 1))
    return f"""
    WITH {_bpe_train_ctes(rounds)}
    SELECT * FROM ({sel}) ORDER BY rank"""


ORACLE_SQL['q_bpe_train_docs'] = _bpe_train_oracle()


def _bpe_encode_oracle(rounds: int = 100) -> str:
    """Train chain (shared b{{r}} CTEs) + the same merge application
    unrolled over ALL distinct words of the corpus (the engine encodes
    each distinct word once and scatters counts back — mirrored here by
    the dw/wtok join), then per-doc token sums. Unknown symbols never
    match a merge and count one token each on both engines."""
    parts = [f"""
    WITH {_bpe_train_ctes(rounds)},
    docs AS MATERIALIZED (
      SELECT doc_id, text, len(text) AS n_chars
      FROM documents WHERE text IS NOT NULL),
    docw AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM docs),
    dwords AS (
      SELECT DISTINCT word FROM docw WHERE len(word) > 0),
    dw AS MATERIALIZED (
      SELECT word, row_number() OVER (ORDER BY word) AS uwid
      FROM dwords),
    etokp AS (
      SELECT uwid, word, unnest(generate_series(1, len(word))) AS pos
      FROM dw),
    etok0 AS MATERIALIZED (
      SELECT uwid, pos, substr(word, CAST(pos AS INTEGER), 1) AS sym
      FROM etokp)"""]
    for r in range(1, rounds + 1):
        q = r - 1
        parts.append(f""",
    ecand{r} AS (
      SELECT t.uwid, t.pos,
             t.pos - row_number() OVER (PARTITION BY t.uwid
                                        ORDER BY t.pos) AS grp
      FROM etok{q} t
      JOIN etok{q} u ON u.uwid = t.uwid AND u.pos = t.pos + 1
      JOIN b{r} bb ON t.sym = bb.l AND u.sym = bb.rgt),
    ekeep{r} AS MATERIALIZED (
      SELECT uwid, pos FROM (
        SELECT uwid, pos,
               (pos - min(pos) OVER (PARTITION BY uwid, grp)) % 2 AS par
        FROM ecand{r})
      WHERE par = 0),
    etok{r} AS MATERIALIZED (
      SELECT t.uwid,
             row_number() OVER (PARTITION BY t.uwid
                                ORDER BY t.pos) AS pos,
             CASE WHEN k.pos IS NOT NULL THEN bb.m ELSE t.sym END AS sym
      FROM etok{q} t
      LEFT JOIN b{r} bb ON TRUE
      LEFT JOIN ekeep{r} k ON k.uwid = t.uwid AND k.pos = t.pos
      LEFT JOIN ekeep{r} d ON d.uwid = t.uwid AND d.pos = t.pos - 1
      WHERE d.pos IS NULL)""")
    parts.append(f""",
    wtok AS MATERIALIZED (
      SELECT uwid, count(*)::BIGINT AS ntok FROM etok{rounds}
      GROUP BY uwid)
    SELECT d.doc_id, d.n_chars::BIGINT AS n_chars,
           coalesce(sum(wt.ntok), 0)::BIGINT AS n_tokens
    FROM docs d
    LEFT JOIN docw w ON w.doc_id = d.doc_id AND len(w.word) > 0
    LEFT JOIN dw ON dw.word = w.word
    LEFT JOIN wtok wt ON wt.uwid = dw.uwid
    GROUP BY d.doc_id, d.n_chars
    ORDER BY d.doc_id""")
    return ''.join(parts)


ORACLE_SQL['q_bpe_encode_docs'] = _bpe_encode_oracle()


def q_bfs_embeddings(sf_dir: str):
    """Hop distance from a vetted seed set over the cosine graph
    (stages/graph.py:bfs_hops): seeds = the 10 smallest vec_ids in the
    graph universe; output (node, hops) for everything within 6 hops —
    the trust/quality-propagation primitive (how many similarity hops
    separate a document from a human-reviewed cluster). Deterministic
    BFS levels (brute-force + local==distributed parity in
    tests/test_graph.py::TestBFS); ORACLE-able (r4) because max_hops
    is FIXED: the 6 rounds unroll into level CTEs (frontier = rows
    settled exactly last round, min(h) merge), sidestepping SQL
    recursion's no-aggregate rule."""
    from ..stages.graph import bfs_hops
    edges = _cosine_edge_ds(sf_dir)
    seeds = np.arange(10, dtype=np.int64)
    return bfs_hops(edges, seeds, max_hops=6, num_buckets=8)\
        .sort('node')


QUERIES['q_bfs_embeddings'] = q_bfs_embeddings


def _bfs_oracle_sql(max_hops: int = 6, n_seeds: int = 10) -> str:
    """Unrolled multi-source BFS over the cosine>=0.3 graph (same edge
    CTE as the other graph oracles); isolated seeds still emit hops 0,
    matching bfs_hops' node universe = edges ∪ seeds."""
    seeds = ', '.join(str(i) for i in range(n_seeds))
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings WHERE vec_id < 1000),
    ed AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE cast(floor(list_cosine_similarity(a.emb, b.emb)
                       * 1e6 + 0.5) AS BIGINT) >= 300000),
    sym AS MATERIALIZED (
      SELECT va AS s, vb AS d FROM ed
      UNION ALL SELECT vb, va FROM ed),
    l0 AS MATERIALIZED (
      SELECT cast(unnest([{seeds}]) AS BIGINT) AS node,
             cast(0 AS BIGINT) AS h)"""
    steps = []
    for k in range(1, max_hops + 1):
        p = f'l{k - 1}'
        steps.append(f""",
    l{k} AS MATERIALIZED (
      SELECT node, min(h) AS h FROM (
        SELECT node, h FROM {p}
        UNION ALL
        SELECT s.d AS node, cast({k} AS BIGINT) AS h
        FROM sym s JOIN {p} p ON p.node = s.s
        WHERE p.h = {k - 1}
      ) GROUP BY node)""")
    tail = f"""
    SELECT node, h AS hops FROM l{max_hops} ORDER BY node"""
    return head + ''.join(steps) + tail


ORACLE_SQL['q_bfs_embeddings'] = _bfs_oracle_sql()


def q_class_balance_docs(sf_dir: str):
    """Class-balanced downsampling: every language keeps exactly
    min-class-count documents (the k smallest doc_ids per language —
    deterministic, so the oracle's row_number() pick is byte-equal).
    The training-data rebalancer that stops a 90/10 language split from
    dominating the mix.

    100-TB shape: one tiny per-class count (pre_aggregate over ~5
    langs), then each batch PRUNES to its local k-smallest per class
    before ONE lang-keyed exchange finishes the global pick — the
    exchange ships at most k x classes x blocks id rows, never the
    corpus (same survivors-only argument as global_topk)."""
    from ..stages.aggregate import pre_aggregate as _pre
    from ..stages.conversations import bucket_exchange
    import ray.data as rd
    out_schema = pa.schema([('doc_id', pa.int64()),
                            ('lang', pa.string())])
    ds = _read(sf_dir, 'documents', ['doc_id', 'lang'],
               require=('lang',))
    counts = _small_df(_pre(
        ds.map_batches(
            lambda t: pa.table({'lang': t.column('lang'),
                                '_one': pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format='pyarrow', zero_copy_batch=True),
        ['lang'], {'n': ('_one', 'count')}), ['lang', 'n'])
    if len(counts) == 0:
        return rd.from_arrow(out_schema.empty_table())
    k = int(counts['n'].min())

    def local_prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        ids = tbl.column('doc_id').combine_chunks().cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        langs = tbl.column('lang').combine_chunks()
        lcodes, _ = pd.factorize(langs.to_pandas(), sort=False)
        order = np.lexsort((ids, lcodes))
        pos = np.arange(len(order))
        seg = np.ones(len(order), dtype=bool)
        seg[1:] = lcodes[order][1:] != lcodes[order][:-1]
        rank = pos - np.maximum.accumulate(np.where(seg, pos, -1))
        keep = np.sort(order[rank < k])
        return pa.table({
            'doc_id': pa.array(ids[keep]),
            'lang': langs.take(pa.array(keep)),
        }, schema=out_schema)

    def finish(tbl: pa.Table) -> pa.Table:
        return local_prune(tbl)

    pruned = ds.map_batches(local_prune, batch_format='pyarrow',
                            zero_copy_batch=True)
    out = bucket_exchange(pruned, 'lang', finish, num_buckets=8)
    return _sort_ns(out, ['lang', 'doc_id'], str_cols=('lang',))


QUERIES['q_class_balance_docs'] = q_class_balance_docs
ORACLE_SQL['q_class_balance_docs'] = """
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents
      WHERE lang IS NOT NULL GROUP BY lang),
    k AS (SELECT min(n) AS k FROM c),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id)
               AS rn
      FROM documents WHERE lang IS NOT NULL)
    SELECT doc_id, lang FROM r, k WHERE r.rn <= k.k
    ORDER BY lang, doc_id
"""


def q_dup_events_events(sf_dir: str):
    """Duplicate-event (rapid-repeat) detection: an event whose
    predecessor in the same user's (ts, event_id) order happened within
    10 minutes with the SAME event_type — the instrumentation-bug audit
    every event pipeline runs before trusting counts. One user-keyed
    exchange, vectorized segment shift inside the bucket; NULL types
    never match (SQL = semantics). A typed 0-row union keeps the output
    schema when no duplicates exist (the empty-Dataset trap)."""
    ds = _read(sf_dir, 'events',
               ['event_id', 'user_id', 'ts', 'event_type'],
               require=('ts',))
    out_schema = pa.schema([
        ('event_id', pa.int64()), ('user_id', pa.int64()),
        ('gap_us', pa.int64())])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        et = tbl.column('event_type').combine_chunks()
        n = tbl.num_rows
        prev_ok = ~starts
        prev_ok[0] = False
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        same_t = np.zeros(n, dtype=bool)
        if n > 1:
            eq_t = pc.equal(et.slice(1), et.slice(0, n - 1))
            same_t[1:] = pc.fill_null(eq_t, False)\
                .to_numpy(zero_copy_only=False)
        hit = prev_ok & same_t & (gap <= 600_000_000)
        idx = np.nonzero(hit)[0]
        return pa.table({
            'event_id': pc.cast(tbl.column('event_id'), pa.int64())
            .take(pa.array(idx)),
            'user_id': pc.cast(tbl.column('user_id'), pa.int64())
            .take(pa.array(idx)),
            'gap_us': pa.array(gap[idx]),
        }, schema=out_schema)

    import ray.data as rd
    out = per_conversation(ds, fn, key='user_id',
                           order=('ts', 'event_id'), num_buckets=8)
    # an all-empty result loses its schema (CLAUDE.md) — a legitimate
    # outcome here (clean data has no double-fires)
    return out.union(rd.from_arrow(out_schema.empty_table()))\
        .sort(['event_id'])


QUERIES['q_dup_events_events'] = q_dup_events_events
ORACLE_SQL['q_dup_events_events'] = """
    WITH o AS (
      SELECT event_id, user_id, ts, event_type,
             lag(ts) OVER w AS pts,
             lag(event_type) OVER w AS ptype
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id, epoch_us(ts - pts) AS gap_us
    FROM o
    WHERE pts IS NOT NULL AND epoch_us(ts - pts) <= 600000000
      AND ptype = event_type
    ORDER BY event_id
"""


def q_kanon_docs(sf_dir: str):
    """k-anonymity audit over the quasi-identifier tuple
    (lang, source, 256-char length band): every combination shared by
    FEWER than k=5 documents is a re-identification risk — the privacy
    gate a corpus passes before release. One low-cardinality partial
    aggregation (the QI tuple is small by construction; a
    high-cardinality QI set would use bucket_aggregate), risk rows =
    the < k groups with their sizes. NULL QI values form real groups
    (SQL GROUP BY semantics); the length band floor-divides exactly
    like the oracle."""
    from ..stages.aggregate import pre_aggregate as _pre
    ds = _read(sf_dir, 'documents', ['lang', 'source', 'n_chars'],
               require=('n_chars',))
    K = 5

    def qi(tbl: pa.Table) -> pa.Table:
        band = np.floor_divide(
            tbl.column('n_chars').combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False), 256)
        return pa.table({
            'lang': tbl.column('lang'),
            'source': tbl.column('source'),
            'band': pa.array(band),
            '_one': pa.array(np.ones(tbl.num_rows, np.int64))})

    g = _pre(ds.map_batches(qi, batch_format='pyarrow',
                            zero_copy_batch=True),
             ['lang', 'source', 'band'], {'n_docs': ('_one', 'count')})
    risky = g.map_batches(
        lambda t: t.filter(pc.less(pc.cast(t.column('n_docs'),
                                           pa.int64()), K)),
        batch_format='pyarrow')
    return _sort_ns(risky, ['lang', 'source', 'band'],
                    str_cols=('lang', 'source'))


QUERIES['q_kanon_docs'] = q_kanon_docs
ORACLE_SQL['q_kanon_docs'] = """
    SELECT lang, source, n_chars // 256 AS band, count(*) AS n_docs
    FROM documents WHERE n_chars IS NOT NULL
    GROUP BY lang, source, band
    HAVING count(*) < 5
    ORDER BY lang, source, band
"""


def q_containment_pairs(sf_dir: str):
    """ASYMMETRIC near-dup: word-3-gram max-containment pairs
    (common / min(|A|, |B|) >= 0.8) — a short document fully quoted
    inside a long one scores 1.0 where Jaccard stays tiny; this is the
    benchmark-contamination / inclusion detector
    (stages/dedup.py:ngram_jaccard_pairs with metric='containment' —
    the SAME single shingle-hash exchange and df cap, different final
    formula)."""
    from ..stages.dedup import ngram_jaccard_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ngram_jaccard_pairs(ds, threshold=0.8, num_buckets=16,
                               metric='containment')\
        .sort(['doc_a', 'doc_b'])


QUERIES['q_containment_pairs'] = q_containment_pairs
ORACLE_SQL['q_containment_pairs'] = """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE text IS NOT NULL),
    sh0 AS (
      SELECT DISTINCT doc_id,
             w[x] || ' ' || w[x + 1] || ' ' || w[x + 2] AS s
      FROM words, unnest(range(1, greatest(len(w) - 1, 2))) AS t(x)
      WHERE w[x] || ' ' || w[x + 1] || ' ' || w[x + 2] IS NOT NULL),
    hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 50),
    sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           round(c / least(sa.sz, sb.sz), 6) AS containment
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c / least(sa.sz, sb.sz) >= 0.8
    ORDER BY doc_a, doc_b
"""


def q_storm_sessions_events(sf_dir: str):
    """TWO-SIDED interval overlap join (stages/joins.py:interval_join,
    left != right): user sessions vs global error-storm windows (1h
    buckets with >= 3 'error' events) — per user, how many of their
    sessions overlapped an error storm and for how long. The windows
    come from a tiny low-cardinality aggregation (at most one row per
    hour of history); sessions from the same builder as
    q_concurrent_sessions_events; exact-integer microsecond overlap
    sums keep the parallel aggregation byte-stable vs the oracle's
    inequality join."""
    from ..stages.aggregate import bucket_aggregate, pre_aggregate as _pre
    from ..stages.joins import interval_join
    import ray.data as rd
    HOUR = 3_600_000_000
    out_schema = pa.schema([('user_id', pa.int64()),
                            ('n_pairs', pa.int64()),
                            ('overlap_us', pa.int64())])
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type'], require=('ts',))

    def err_hours(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(pc.fill_null(
            tbl.column('event_type'), ''), 'error'))
        if t.num_rows == 0:
            return pa.table({'hb': pa.array([], pa.int64()),
                             '_one': pa.array([], pa.int64())})
        ts_us = t.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({'hb': pa.array(ts_us // HOUR),
                         '_one': pa.array(np.ones(t.num_rows,
                                                  np.int64))})

    storms = _small_df(_pre(
        ds.map_batches(err_hours, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['hb'], {'n': ('_one', 'count')}), ['hb', 'n'])
    storms = storms[storms['n'] >= 3]
    if len(storms) == 0:
        return rd.from_arrow(out_schema.empty_table())
    hb = storms['hb'].to_numpy(np.int64)
    storm_tbl = pa.table({
        'storm_id': pa.array(hb),
        'lo_us': pa.array(hb * HOUR),
        'hi_us': pa.array(hb * HOUR + (HOUR - 1)),
    })

    def sess_fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks()\
            .cast(pa.timestamp('us')).cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        is_new, _sid = W.sessionize(ts_us, starts, GAP_US)
        lo = np.nonzero(is_new)[0]
        hi = np.append(lo[1:], len(ts_us)) - 1
        return pa.table({
            'user_id': pa.array(users[lo]),
            'lo_us': pa.array(ts_us[lo]),
            'hi_us': pa.array(ts_us[hi]),
        })

    sess_schema = pa.schema([('user_id', pa.int64()),
                             ('lo_us', pa.int64()),
                             ('hi_us', pa.int64())])
    sess = per_conversation(ds, sess_fn, key='user_id',
                            order=('ts', 'event_id'),
                            num_buckets=8).materialize()
    joined = interval_join(
        sess, rd.from_arrow(storm_tbl), lo='lo_us', hi='hi_us',
        bucket_us=7_200_000_000, num_buckets=8,
        left_schema=sess_schema,
        right_schema=pa.schema([('storm_id', pa.int64()),
                                ('lo_us', pa.int64()),
                                ('hi_us', pa.int64())]))

    def pair_partial(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({'user_id': z, '_one': z, 'ov_us': z})
        ov = pc.subtract(
            pc.min_element_wise(tbl.column('hi_us_a'),
                                tbl.column('hi_us_b')),
            pc.max_element_wise(tbl.column('lo_us_a'),
                                tbl.column('lo_us_b')))
        return pa.table({
            'user_id': pc.cast(tbl.column('user_id_a'), pa.int64()),
            '_one': pa.array(np.ones(tbl.num_rows, np.int64)),
            'ov_us': pc.cast(ov, pa.int64()),
        })

    out = bucket_aggregate(
        joined.map_batches(pair_partial, batch_format='pyarrow'),
        ['user_id'],
        {'n_pairs': ('_one', 'sum'), 'overlap_us': ('ov_us', 'sum')},
        num_buckets=8)
    return out.union(rd.from_arrow(out_schema.empty_table()))\
        .sort('user_id')


QUERIES['q_storm_sessions_events'] = q_storm_sessions_events
ORACLE_SQL['q_storm_sessions_events'] = """
    WITH st AS (
      SELECT hb * 3600000000 AS wlo,
             hb * 3600000000 + 3599999999 AS whi
      FROM (SELECT epoch_us(ts) // 3600000000 AS hb, count(*) AS n
            FROM events
            WHERE ts IS NOT NULL AND event_type = 'error'
            GROUP BY hb)
      WHERE n >= 3),
    o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM o),
    g AS (
      SELECT user_id, ts,
             cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) - 1
                  AS BIGINT) AS session_id
      FROM f),
    s AS (
      SELECT user_id, epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
      FROM g GROUP BY user_id, session_id)
    SELECT s.user_id, count(*) AS n_pairs,
           sum(least(s.hi, st.whi) - greatest(s.lo, st.wlo))
             AS overlap_us
    FROM s JOIN st ON s.lo <= st.whi AND st.wlo <= s.hi
    GROUP BY s.user_id ORDER BY user_id
"""


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic dedup (stages/dedup.semdedup; Abbas et al.
    2023): exact-integer k-means (8 clusters, 5 iters) over the
    embeddings table, then within-cluster cosine >= 0.5 duplicate
    groups with the paper's keep rule — keep the member LEAST similar
    to its centroid, ties to min vec_id. ORACLE-able (r4): the whole
    composite is exact-int64 (the design goal) — the Lloyd chain is the
    shared q_kmeans transcription, the final assignment is one more
    argmin CTE, pair dots and the keep pick are integer compares, and
    duplicate groups unroll as min-label CC (near-cliques: shallow).
    Determinism under row order/partitioning and planted-duplicate
    recall stay pinned in tests/test_semdedup.py.

    Output: one row per vector — (vec_id, cluster, group = min id of
    its duplicate component, cent_sim6, keep).

    100-TB shape: n_clusters is the knob that bounds the O(B^2)
    within-cluster scan (paper: 50k clusters on LAION); one exchange
    keyed on the int32 cluster id; oversized clusters raise instead of
    running quadratic tasks."""
    from ..stages.dedup import semdedup
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    out = semdedup(ds, 'embedding', 'vec_id', n_clusters=8, iters=5,
                   threshold=0.5)
    return out.sort(['vec_id'])


def _semdedup_oracle_sql(k: int = 8, iters: int = 5,
                         thr12: int = 500_000_000_000,
                         cc_rounds: int = 8) -> str:
    """SQL twin of stages/dedup.semdedup(n_clusters=8, iters=5,
    threshold=0.5): the shared Lloyd chain (_kmeans_cte_chain), a final
    exact-int argmin assignment, micro-quantized unit vectors (the one
    accepted float step — sqrt(list_sum(v*v)) vs numpy's pairwise norm
    differ in the last ulp, absorbed by the micro-floor per the
    q_cosine_pairs precedent), exact-int64 pair dots >= thr12,
    ``cc_rounds`` unrolled min-label CC steps for duplicate groups, and
    the (cent_sim6 ASC, vec_id ASC) keep pick. cent_sim6 rescales the
    1e12 dot with the sign-safe floor-div idiom (CLAUDE.md // rule —
    a cosine can be negative)."""
    parts = [_kmeans_cte_chain(k, iters), f""",
    d_fin AS MATERIALIZED (
      SELECT v.vec_id, c.cid,
             cast(sum((v.x - c.c) * (v.x - c.c)) AS BIGINT) AS d2
      FROM vx v JOIN c{iters} c ON c.dim = v.dim
      GROUP BY v.vec_id, c.cid),
    asg AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rnk
        FROM d_fin) WHERE rnk = 1),
    ve AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb
      FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL),
    u AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
             cast(floor(unnest(emb) /
                        (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)
                        * 1e6 + 0.5) AS BIGINT) AS ux
      FROM (SELECT vec_id, emb,
                   sqrt(list_sum(list_transform(emb, v -> v * v)))
                     AS nrm
            FROM ve)),
    cu AS MATERIALIZED (
      SELECT cid, list(cast(c AS DOUBLE) / 1e6 ORDER BY dim) AS cf
      FROM c{iters} GROUP BY cid),
    cuu AS MATERIALIZED (
      SELECT cid, generate_subscripts(cf, 1) - 1 AS dim,
             cast(floor(unnest(cf) /
                        (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END)
                        * 1e6 + 0.5) AS BIGINT) AS cu6
      FROM (SELECT cid, cf,
                   sqrt(list_sum(list_transform(cf, v -> v * v)))
                     AS nrm
            FROM cu)),
    cd AS MATERIALIZED (
      SELECT u.vec_id, cast(sum(u.ux * cc.cu6) AS BIGINT) AS cd
      FROM u JOIN asg ON asg.vec_id = u.vec_id
      JOIN cuu cc ON cc.cid = asg.cid AND cc.dim = u.dim
      GROUP BY u.vec_id),
    pe AS MATERIALIZED (
      SELECT x.vec_id AS a, y.vec_id AS b
      FROM asg x JOIN asg y
        ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN u ua ON ua.vec_id = x.vec_id
      JOIN u ub ON ub.vec_id = y.vec_id AND ub.dim = ua.dim
      GROUP BY x.vec_id, y.vec_id
      HAVING cast(sum(ua.ux * ub.ux) AS BIGINT) >= {thr12}),
    padj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM pe UNION ALL SELECT b, a FROM pe),
    g0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM padj)"""]
    for r in range(1, cc_rounds + 1):
        # hooking + pointer jumping (see _minhash_cluster_ctes)
        parts.append(f""",
    g{r} AS MATERIALIZED (
      SELECT g.node, least(g.lab, j.lab, m.mn) AS lab
      FROM g{r - 1} g
      LEFT JOIN g{r - 1} j ON j.node = g.lab
      LEFT JOIN (
        SELECT padj.node, min(l.lab) AS mn
        FROM padj JOIN g{r - 1} l ON padj.nb = l.node
        GROUP BY padj.node) m ON m.node = g.node)""")
    parts.append(f""",
    fin AS MATERIALIZED (
      SELECT asg.vec_id, asg.cid,
             coalesce(g.lab, asg.vec_id) AS grp, cd.cd
      FROM asg JOIN cd ON cd.vec_id = asg.vec_id
      LEFT JOIN g{cc_rounds} g ON g.node = asg.vec_id)
    SELECT vec_id, cast(cid AS INTEGER) AS cluster, grp AS "group",
           ((cd + 500000) - (((cd + 500000) % 1000000 + 1000000)
                             % 1000000)) // 1000000 AS cent_sim6,
           (row_number() OVER (PARTITION BY grp ORDER BY cd, vec_id)
            = 1) AS keep
    FROM fin ORDER BY vec_id""")
    return ''.join(parts)


QUERIES['q_semdedup_embeddings'] = q_semdedup_embeddings
ORACLE_SQL['q_semdedup_embeddings'] = _semdedup_oracle_sql()


def _planted_transcripts(n_turns: int = 4000, seed: int = 7) -> pa.Table:
    """Deterministic transcripts (input_hint shape) with planted
    conversation duplicates: every 8th conversation is copied verbatim
    under a 'dup-' id, and every (8k+4)th is copied with ONE turn's text
    perturbed under a 'near-' id — the ground truth the conv-dedup
    queries and probes recover."""
    from ..sources.transcripts import generate_table
    base = generate_table(n_turns, seed=seed)
    df = base.to_pandas()
    convs = df['conv_id'].unique()
    out = [df]
    for i, cid in enumerate(convs):
        if i % 8 == 0:
            c = df[df['conv_id'] == cid].copy()
            c['conv_id'] = 'dup-' + cid
            out.append(c)
        elif i % 8 == 4:
            c = df[df['conv_id'] == cid].copy()
            c['conv_id'] = 'near-' + cid
            t = c['text'].to_numpy(dtype=object)
            t[len(t) // 2] = str(t[len(t) // 2]) + ' with one edit'
            c['text'] = t
            out.append(c)
    all_df = pd.concat(out, ignore_index=True)
    return pa.Table.from_pandas(all_df, preserve_index=False,
                                schema=base.schema)


_TRANSCRIPTS_PQ = '/tmp/trafaret_conv_transcripts_v1.parquet'


def _ensure_transcripts_parquet() -> str:
    """Write the deterministic planted-transcripts table to a parquet
    BOTH engines read — the engine as a Ray read, the oracle via
    read_parquet() in SQL — which moves the conversation-dedup queries
    from rows-only onto the byte-checked surface (the r4 verdict's
    blocker was the input being an in-memory table, not SQL
    expressibility). Content is seed-deterministic; the version-tagged
    name invalidates stale copies if the generator ever changes; the
    tmp-then-rename write is atomic under concurrent test runners."""
    import os
    if not os.path.exists(_TRANSCRIPTS_PQ):
        import pyarrow.parquet as pq
        tmp = f'{_TRANSCRIPTS_PQ}.tmp-{os.getpid()}'
        pq.write_table(_planted_transcripts(), tmp)
        os.replace(tmp, _TRANSCRIPTS_PQ)
    return _TRANSCRIPTS_PQ


def _read_transcripts():
    """Block-capped Ray read of the planted-transcripts parquet (same
    small-file discipline as queries._read)."""
    import os

    import ray.data as rd
    path = _ensure_transcripts_parquet()
    est = max(1, -(-os.path.getsize(path) // _READ_TARGET_BYTES))
    return rd.read_parquet(path,
                           override_num_blocks=est if est < 64 else None)


def q_conv_exact_dedup(sf_dir: str):
    """Exact conversation-level dedup over the transcripts payload
    (stages/dedup.conversation_exact_dedup, hash_mode='duckdb'): two
    conversations are duplicates iff every (turn_idx, role, text)
    matches. The planted-transcripts input is a deterministic parquet
    both engines read, and in duckdb hash mode every per-turn hash is
    the murmur chain hash(xor(hash(role || chr(31) || text),
    hash(turn_idx + 1))) with the conversation fingerprint its
    mod-2^64 wrap-sum — the oracle recomputes the identical chain with
    HUGEINT arithmetic, so the whole operator is byte-checked (newly
    oracle-ized in r5; recall/order/partitioning invariants pinned in
    tests/test_conv_dedup.py).

    100-TB shape: each batch emits one ~24-byte partial row per
    conversation (position-mixed hash wrap-sum + turn count); text never
    leaves the reading task; two tiny exchanges total."""
    from ..stages.dedup import conversation_exact_dedup
    return conversation_exact_dedup(_read_transcripts(),
                                    hash_mode='duckdb').sort('conv_id')


QUERIES['q_conv_exact_dedup'] = q_conv_exact_dedup


def _conv_exact_oracle() -> str:
    path = _ensure_transcripts_parquet()
    return f"""
    WITH t AS (
        SELECT conv_id,
               CAST(hash(xor(hash(coalesce(role, '') || chr(31) ||
                                  coalesce(text, '')),
                             hash(turn_idx + 1))) AS HUGEINT) AS h
        FROM read_parquet('{path}')
    ), f AS (
        SELECT conv_id,
               sum(h) % CAST(18446744073709551616 AS HUGEINT) AS m,
               count(*) AS n_turns
        FROM t GROUP BY conv_id
    ), fp AS (
        SELECT conv_id, n_turns,
               CAST(CASE WHEN m >= CAST(9223372036854775808 AS HUGEINT)
                         THEN m - CAST(18446744073709551616 AS HUGEINT)
                         ELSE m END AS BIGINT) AS fpv
        FROM f
    )
    SELECT fp.conv_id, g.grp AS "group", fp.n_turns
    FROM fp JOIN (SELECT fpv, n_turns, min(conv_id) AS grp
                  FROM fp GROUP BY fpv, n_turns) g
      USING (fpv, n_turns)
    ORDER BY conv_id
"""


ORACLE_SQL['q_conv_exact_dedup'] = _conv_exact_oracle()


def q_conv_minhash_dedup(sf_dir: str):
    """Near-duplicate conversation clusters over the transcripts payload
    (stages/dedup.conversation_minhash_dedup, hash_mode='duckdb'):
    MinHash over the union of per-turn word-shingle hashes, LSH
    banding, signature-estimated Jaccard verify (matching permutations
    >= threshold — at threshold=0.5/num_perm=64 the float compare is
    EXACTLY matching*2 >= 64, both /64 and 0.5 being powers of two),
    distributed connected components. Newly oracle-ized in r5: the
    planted-transcripts input is a parquet both engines read, and in
    duckdb hash mode every shingle/permutation/band hash is a murmur
    chain the oracle recomputes verbatim — per-(conv, turn) k-grams,
    64 permutation mins, 16-band folds, candidate join, estimate
    verify, then 12 unrolled min-label CC rounds with pointer jumping.
    Planted verbatim AND one-edit near-duplicates must land in their
    source's cluster — pinned with the partitioning-invariance bar in
    tests/test_conv_dedup.py.

    100-TB shape: per-batch partial signatures are the ONLY exchanged
    state (turn text never moves); pair emission is exactly-once via the
    first-matching-band responsibility rule; labeling stays in Datasets."""
    from ..stages.dedup import conversation_minhash_dedup
    return conversation_minhash_dedup(_read_transcripts(), threshold=0.5,
                                      hash_mode='duckdb').sort('conv_id')


QUERIES['q_conv_minhash_dedup'] = q_conv_minhash_dedup


def _conv_minhash_oracle(rounds: int = 12) -> str:
    path = _ensure_transcripts_parquet()
    parts = [f"""
    WITH mh_src AS MATERIALIZED (
      SELECT conv_id, turn_idx, text
      FROM read_parquet('{path}') WHERE text IS NOT NULL),
    toks AS MATERIALIZED (
      SELECT conv_id, turn_idx, string_split(text, ' ') AS ws
      FROM mh_src),
    w AS MATERIALIZED (
      SELECT conv_id, turn_idx, unnest(ws) AS wd,
             unnest(generate_series(1, len(ws))) AS pos
      FROM toks),
    wh AS MATERIALIZED (
      SELECT conv_id, turn_idx, pos, hash(wd) AS h FROM w),
    grams AS MATERIALIZED (
      SELECT DISTINCT a.conv_id,
             hash(xor(hash(xor(a.h, b.h)), c.h)) AS g
      FROM wh a
      JOIN wh b ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx
               AND b.pos = a.pos + 1
      JOIN wh c ON c.conv_id = a.conv_id AND c.turn_idx = a.turn_idx
               AND c.pos = a.pos + 2),
    sig AS MATERIALIZED (
      SELECT conv_id, p.range AS p,
             min(hash(xor(g, hash(p.range)))) AS s
      FROM grams CROSS JOIN range(64) p GROUP BY conv_id, p.range),
    band AS MATERIALIZED (
      SELECT conv_id, p // 4 AS band_id,
        hash(xor(hash(xor(hash(xor(hash(
          max(CASE WHEN p % 4 = 0 THEN s END)),
          max(CASE WHEN p % 4 = 1 THEN s END))),
          max(CASE WHEN p % 4 = 2 THEN s END))),
          max(CASE WHEN p % 4 = 3 THEN s END))) AS bh
      FROM sig GROUP BY conv_id, p // 4),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.conv_id AS ca, b.conv_id AS cb
      FROM band a JOIN band b
        ON a.band_id = b.band_id AND a.bh = b.bh
        AND a.conv_id < b.conv_id),
    e0 AS MATERIALIZED (
      SELECT c.ca AS a, c.cb AS b
      FROM cand c JOIN sig sa ON sa.conv_id = c.ca
                  JOIN sig sb ON sb.conv_id = c.cb AND sb.p = sa.p
      GROUP BY c.ca, c.cb
      HAVING 2 * count(*) FILTER (WHERE sa.s = sb.s) >= 64),
    adj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM e0 UNION ALL SELECT b, a FROM e0),
    c0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM adj)"""]
    for r in range(1, rounds + 1):
        # hooking + pointer jumping (see _minhash_cluster_ctes)
        parts.append(f""",
    c{r} AS MATERIALIZED (
      SELECT c.node, least(c.lab, j.lab, m.mn) AS lab
      FROM c{r - 1} c
      LEFT JOIN c{r - 1} j ON j.node = c.lab
      LEFT JOIN (
        SELECT adj.node, min(l.lab) AS mn
        FROM adj JOIN c{r - 1} l ON adj.nb = l.node
        GROUP BY adj.node) m ON m.node = c.node)""")
    parts.append(f"""
    SELECT node AS conv_id, lab AS "group" FROM c{rounds}
    ORDER BY conv_id""")
    return ''.join(parts)


ORACLE_SQL['q_conv_minhash_dedup'] = _conv_minhash_oracle()


def q_mmr_topk(sf_dir: str):
    """MMR diverse top-k retrieval (stages/ann.mmr_topk; Carbonell &
    Goldstein 1998): exact-cosine shortlist of 100 per batch (local
    prune, one merge task), greedy lambda=0.5 relevance-vs-redundancy
    selection of 10 in exact int64 micro-units — bit-stable under
    partitioning, ties to min vec_id. ORACLE-able (r4): the greedy is a
    FIXED-k loop over exact ints (micro-floored query cosines; pair
    dots of the micro-quantized unit vectors are integers <= ~1e12,
    exact in DOUBLE), so each of the 10 picks unrolls to one
    argmax-CTE (ORDER BY score DESC, vec_id LIMIT 1) plus one
    maxpair-update CTE — see _mmr_oracle_sql. A sequential numpy
    reference and the shuffled self-parity bar remain pinned in
    tests/test_mmr.py."""
    from ..stages.ann import mmr_topk
    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    qvec = _query_vec(sf_dir)
    if qvec is None or not np.linalg.norm(qvec):
        # empty-path schema survives as pandas (an empty Ray Dataset
        # loses its columns, CLAUDE.md) — same shape as q_ann_topk
        return pa.schema(
            [('rank', pa.int64()), ('vec_id', pa.int64()),
             ('sim_q6', pa.int64())]).empty_table().to_pandas()
    return mmr_topk(emb, qvec, k=10, fetch_k=100, lam=0.5)


QUERIES['q_mmr_topk'] = q_mmr_topk


def _mmr_oracle_sql(k: int = 10, fetch_k: int = 100,
                    lam_u: int = 500_000) -> str:
    """Generated CTE chain mirroring stages/ann.mmr_topk exactly.

    Exactness argument (why the greedy transcribes): sim6 and the u6
    unit-vector components are micro-floored on both engines (the same
    list_cosine_similarity + floor discipline as q_cosine_pairs); from
    there everything is integer — a pair dot of two u6 vectors is a sum
    of 64 products each <= 1e12 whose partial sums stay far below 2^53,
    so DuckDB's list_inner_product over u6::DOUBLE[] is EXACT, and the
    MMR score lam_u*(sim6*1e6) - (1e6-lam_u)*maxpair caps at ~5e17 <
    int64 max (DuckDB would throw, not wrap, if that ever broke). Each
    pick is ORDER BY score DESC, vec_id LIMIT 1 (ties to min id, same
    as the engine's argmin-over-argmax); LIMIT 1 over an empty relation
    chains to 0 rows, matching the engine's min(k, n) picks. CTEs are
    MATERIALIZED per the unrolled-oracle rule (CLAUDE.md: DuckDB
    inlines plain CTEs per reference — exponential in a chain)."""
    head = f"""
    WITH q AS MATERIALIZED (
      SELECT embedding::DOUBLE[] AS qe FROM embeddings
      WHERE vec_id = 0 AND embedding IS NOT NULL
        AND list_inner_product(embedding::DOUBLE[],
                               embedding::DOUBLE[]) > 0),
    raw AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_inner_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nrm
      FROM embeddings
      WHERE embedding IS NOT NULL AND EXISTS (SELECT 1 FROM q)),
    cand AS MATERIALIZED (
      SELECT vec_id,
             cast(floor(list_cosine_similarity(e, (SELECT qe FROM q))
                        * 1e6 + 0.5) AS BIGINT) AS sim_q6,
             list_transform(e, x -> cast(floor(x / nrm * 1e6 + 0.5)
                                         AS BIGINT)) AS u6
      FROM raw WHERE nrm > 0
      ORDER BY sim_q6 DESC, vec_id LIMIT {fetch_k}),
    p1 AS MATERIALIZED (
      SELECT vec_id, sim_q6, u6 FROM cand
      ORDER BY sim_q6 DESC, vec_id LIMIT 1),
    r1 AS MATERIALIZED (
      SELECT c.vec_id, c.sim_q6, c.u6,
             cast(list_inner_product(c.u6::DOUBLE[], p.u6::DOUBLE[])
                  AS BIGINT) AS mp
      FROM cand c, p1 p WHERE c.vec_id <> p.vec_id)"""
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
    p{i} AS MATERIALIZED (
      SELECT vec_id, sim_q6, u6 FROM r{i - 1}
      ORDER BY {lam_u} * (sim_q6 * 1000000)
               - {1_000_000 - lam_u} * mp DESC, vec_id LIMIT 1),
    r{i} AS MATERIALIZED (
      SELECT r.vec_id, r.sim_q6, r.u6,
             greatest(r.mp,
                      cast(list_inner_product(r.u6::DOUBLE[],
                                              p.u6::DOUBLE[]) AS BIGINT))
               AS mp
      FROM r{i - 1} r, p{i} p WHERE r.vec_id <> p.vec_id)""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {i - 1} AS rank, vec_id, sim_q6 FROM p{i}"
        for i in range(1, k + 1))
    tail = f"""
    SELECT * FROM (
      {unions}
    ) ORDER BY rank"""
    return head + ''.join(steps) + tail


ORACLE_SQL['q_mmr_topk'] = _mmr_oracle_sql()


def q_jw_pairs_docs(sf_dir: str):
    """Jaro-Winkler near-dup pairs (stages/dedup.jw_pairs): same
    (lang, 64-char length band) equality blocking as
    q_editdist_pairs_docs, similarity kernel over the 32-codepoint
    prefix with jw6 >= 0.85e6. The kernel
    (functions/text.py:jaro_winkler_bytes) is exact-integer after the
    greedy match — DuckDB jaro_winkler_similarity BYTE semantics
    including the empty-vs-empty 0 and the boost-at-exactly-0.7 edge
    (the engine compares the exact rational >= 7/10 because DuckDB's
    double literal 0.7 sits below it; 25k-pair differential in
    tests/test_jw_kernel.py)."""
    from ..stages.dedup import jw_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang', 'n_chars'],
               require=('text', 'lang', 'n_chars'))

    def band(tbl: pa.Table) -> pa.Table:
        b = np.floor_divide(
            tbl.column('n_chars').combine_chunks().cast(pa.int64())
            .to_numpy(zero_copy_only=False), 64)
        return tbl.append_column('band', pa.array(b, type=pa.int64()))

    banded = ds.map_batches(band, batch_format='pyarrow',
                            zero_copy_batch=True)
    return jw_pairs(banded, ['lang', 'band'], prefix_cp=32,
                    min_sim6=850_000, num_buckets=16)\
        .sort(['doc_a', 'doc_b'])


QUERIES['q_jw_pairs_docs'] = q_jw_pairs_docs
ORACLE_SQL['q_jw_pairs_docs'] = """
    WITH d AS (
      SELECT doc_id, lang, n_chars // 64 AS band,
             substr(text, 1, 32) AS pfx
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
        AND n_chars IS NOT NULL)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(floor(jaro_winkler_similarity(a.pfx, b.pfx) * 1000000
                      + 0.5) AS BIGINT) AS jw6
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE cast(floor(jaro_winkler_similarity(a.pfx, b.pfx) * 1000000
                     + 0.5) AS BIGINT) >= 850000
    ORDER BY doc_a, doc_b
"""
