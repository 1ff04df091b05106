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


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f'{sf_dir}/{table}.parquet', columns=columns)


# ---------------------------------------------------------------------------
# relational aggregates / joins
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate over lineitem.

    Scale: columns pruned at the read; per-batch partial aggregation (6 key
    combos) so the exchange moves a handful of rows per block, not 6B rows.
    """
    ds = _read(sf_dir, 'lineitem',
               ['l_returnflag', 'l_linestatus', 'l_quantity',
                'l_extendedprice', 'l_discount', 'l_tax'])

    def derive(tbl: pa.Table) -> pa.Table:
        disc = pc.multiply(tbl.column('l_extendedprice'),
                           pc.subtract(pa.scalar(1.0), tbl.column('l_discount')))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), tbl.column('l_tax')))
        return tbl.append_column('disc_price', disc)\
                  .append_column('charge', charge)

    ds = ds.map_batches(derive, batch_format='pyarrow', zero_copy_batch=True)
    out = pre_aggregate(
        ds, ['l_returnflag', 'l_linestatus'],
        {'sum_qty': ('l_quantity', 'sum'),
         'sum_base_price': ('l_extendedprice', 'sum'),
         'sum_disc_price': ('disc_price', 'sum'),
         'sum_charge': ('charge', 'sum'),
         'avg_qty': ('l_quantity', 'mean'),
         'avg_price': ('l_extendedprice', 'mean'),
         'avg_disc': ('l_discount', 'mean'),
         'count_order': ('l_quantity', 'count')})
    return out.sort(['l_returnflag', 'l_linestatus'])


def q_top_customers(sf_dir: str):
    """Revenue per customer: partial-agg orders by custkey (shuffle moves
    partials), then broadcast-join the small customer dim on the driver
    side of a tiny result, top-10 with deterministic tie-break."""
    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'])
    per_cust = pre_aggregate(orders, ['o_custkey'],
                             {'revenue': ('o_totalprice', 'sum'),
                              'n_orders': ('o_totalprice', 'count')})
    cust = _read(sf_dir, 'customer', ['c_custkey', 'c_name']).to_pandas()
    name_of = dict(zip(cust['c_custkey'], cust['c_name']))

    def attach(tbl: pa.Table) -> pa.Table:
        keys = tbl.column('o_custkey').to_pylist()
        names = pa.array([name_of.get(k) for k in keys], type=pa.string())
        return tbl.append_column('c_name', names)

    joined = per_cust.map_batches(attach, batch_format='pyarrow')
    top = joined.sort(['revenue', 'o_custkey'],
                      descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: t.select(['o_custkey', 'c_name', 'revenue', 'n_orders']),
        batch_format='pyarrow')


def q_region_revenue(sf_dir: str):
    """3-way broadcast join (customer→nation→region are tiny dims) +
    partial aggregation: the fact table never shuffles raw rows."""
    import ray
    nation = _read(sf_dir, 'nation', ['n_nationkey', 'n_regionkey']).to_pandas()
    region = _read(sf_dir, 'region', ['r_regionkey', 'r_name']).to_pandas()
    cust = _read(sf_dir, 'customer', ['c_custkey', 'c_nationkey']).to_pandas()
    n2r = dict(zip(nation['n_nationkey'], nation['n_regionkey']))
    r2name = dict(zip(region['r_regionkey'], region['r_name']))
    c2region = {ck: r2name[n2r[nk]]
                for ck, nk in zip(cust['c_custkey'], cust['c_nationkey'])}
    ref = ray.put(c2region)

    class Attach:
        def __init__(self):
            self.map = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            keys = tbl.column('o_custkey').to_pylist()
            names = pa.array([self.map.get(k) for k in keys],
                             type=pa.string())
            return tbl.append_column('r_name', names)

    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'])
    with_region = orders.map_batches(Attach, batch_format='pyarrow',
                                     concurrency=2)
    out = pre_aggregate(with_region, ['r_name'],
                        {'revenue': ('o_totalprice', 'sum'),
                         'n_orders': ('o_totalprice', 'count')})
    return out.sort('r_name')


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
    happens inside the bucket (users are bucket-local)."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        ts_us = tbl.column('ts').combine_chunks().cast(pa.int64())\
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
    """lag/lead features per user ordered by (ts, event_id)."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        value = tbl.column('value').combine_chunks()
        ts = tbl.column('ts').combine_chunks()
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
    both engines."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts',
                                  'event_type', 'value'])

    def fn(tbl: pa.Table, starts: np.ndarray) -> pa.Table:
        etype = tbl.column('event_type').combine_chunks()
        users = tbl.column('user_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        ts_us = tbl.column('ts').combine_chunks().cast(pa.int64())\
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


# ---------------------------------------------------------------------------
# documents: dedup + text analysis
# ---------------------------------------------------------------------------

def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: canonical doc per distinct text (min doc_id) + dup
    count. Partial-agg by text per batch, then one exchange of partials
    keyed by the text (hash-partition by content)."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = pre_aggregate(ds, ['text'], {'doc_id': ('doc_id', 'min'),
                                       'n_dups': ('doc_id', 'count')})
    return out.map_batches(
        lambda t: t.select(['doc_id', 'text', 'n_dups']),
        batch_format='pyarrow').sort('doc_id')


def q_token_stats(sf_dir: str):
    """Text analysis rollup per language: doc count, avg chars, avg
    whitespace tokens (single-space split semantics on both engines)."""
    ds = _read(sf_dir, 'documents', ['lang', 'text', 'n_chars'])

    def derive(tbl: pa.Table) -> pa.Table:
        toks = pc.add(pc.count_substring(tbl.column('text'), ' '),
                      pa.scalar(1, type=pa.int64()))
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

def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: broadcast the query vector, one numpy
    matmul per batch, global top-10 via sort+limit on the tiny per-batch
    candidate set. Scale path: each batch emits only its local top-k."""
    import ray.data as rd
    k = 10
    emb = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    # deterministic query: the embedding of vec_id 0
    import pyarrow.parquet as pq
    t0 = pq.read_table(f'{sf_dir}/embeddings.parquet',
                       columns=['vec_id', 'embedding'])
    qvec = np.array(t0.filter(pc.equal(t0.column('vec_id'), 0))
                    .column('embedding').to_pylist()[0], dtype=np.float64)
    qnorm = np.linalg.norm(qvec)

    def topk_batch(tbl: pa.Table) -> pa.Table:
        la = tbl.column('embedding').combine_chunks()
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        sims = (mat @ qvec) / (np.linalg.norm(mat, axis=1) * qnorm)
        ids = tbl.column('vec_id').combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = ids != 0
        sims, ids = sims[keep], ids[keep]
        loc = np.argsort(-sims, kind='stable')[:k]
        return pa.table({
            'vec_id': pa.array(ids[loc]),
            'cos_sim': pa.array(np.round(sims[loc], 6), type=pa.float64()),
        })

    cands = emb.map_batches(topk_batch, batch_format='pyarrow',
                            zero_copy_batch=True)
    return cands.sort(['cos_sim', 'vec_id'],
                      descending=[True, False]).limit(k)


QUERIES = {
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
}


ORACLE_SQL = {
    'q1_pricing_summary': """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                   AS sum_qty,
               sum(l_extendedprice)                              AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))           AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               sum(l_quantity) / count(l_quantity)               AS avg_qty,
               sum(l_extendedprice) / count(l_extendedprice)     AS avg_price,
               sum(l_discount) / count(l_discount)               AS avg_disc,
               count(*)                                          AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    'q_top_customers': """
        SELECT o_custkey, c_name,
               sum(o_totalprice) AS revenue,
               count(*)          AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey, c_name
        ORDER BY revenue DESC, o_custkey ASC
        LIMIT 10
    """,
    'q_region_revenue': """
        SELECT r_name,
               sum(o_totalprice) AS revenue,
               count(*)          AS n_orders
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
          FROM events),
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
        FROM events
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
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts),
        purchases AS (
          SELECT event_id, user_id, ts, value
          FROM events WHERE event_type = 'purchase')
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
    'q_ann_topk': """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding, (SELECT qe FROM q)), 6)
                 AS cos_sim
        FROM embeddings
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
}
