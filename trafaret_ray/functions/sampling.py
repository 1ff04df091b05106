"""Deterministic dataset splitting / sampling on an integer key.

``hash_split`` assigns every row to a named split (train/val/test …)
from a multiplicative hash of a NON-NEGATIVE integer key — pure int64
arithmetic that an ANSI-SQL oracle reproduces exactly (DuckDB BIGINT):

    b = (((key % 2^31) * 2654435761) % 2^32) % mod

The 2^31 pre-fold keeps the product inside int64 for ANY non-negative
key (2^31 * 2654435761 < 2^63); numpy's wrap-on-overflow would
otherwise silently diverge from SQL's overflow error. Knuth's golden
multiplier decorrelates the low bits used by the final ``mod``. Keys
MUST be non-negative: numpy's floored ``%`` and SQL's truncated ``%``
disagree on negatives.

For string/arbitrary keys use
``functions.text.hash_sample_mask`` (pandas 64-bit hash — stronger,
but not SQL-expressible; rows-only checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = 2654435761


def split_buckets(keys: np.ndarray, mod: int = 10_000,
                  salt: int = 0) -> np.ndarray:
    """The int64 bucket in [0, mod) for each key (vectorized)."""
    k = keys.astype(np.int64, copy=False)
    folded = (k + np.int64(salt)) % np.int64(2 ** 31)
    return ((folded * np.int64(_KNUTH)) % np.int64(2 ** 32)) \
        % np.int64(mod)


def split_sql_expr(key_col: str, fractions: dict[str, float],
                   mod: int = 10_000, salt: int = 0) -> str:
    """The matching ANSI-SQL CASE expression for the oracle side."""
    b = (f'((({key_col} + {salt}) % 2147483648) * {_KNUTH}) '
         f'% 4294967296 % {mod}')
    cum, arms = 0.0, []
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        arms.append(f"WHEN {b} < {int(round(cum * mod))} THEN '{name}'")
    return ('CASE ' + ' '.join(arms)
            + f" ELSE '{items[-1][0]}' END")


def hash_split(ds, col: str, fractions: dict[str, float] | None = None,
               mod: int = 10_000, salt: int = 0,
               out_col: str = 'split'):
    """Append a deterministic split label per row.

    ``fractions`` maps split name -> fraction (must sum to ~1; the last
    split takes the remainder, so rounding never drops rows). The
    assignment is a pure function of (key, salt) — stable across runs,
    re-partitioning, and engines — which is what makes train/test
    leakage auditable: the same key lands in the same split everywhere.
    """
    if fractions is None:
        fractions = {'train': 0.8, 'val': 0.1, 'test': 0.1}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f'fractions sum to {total}, expected 1')
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names[:-1]])
    edges = np.round(bounds * mod).astype(np.int64)

    def assign(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(col).combine_chunks().to_numpy(
            zero_copy_only=False)
        b = split_buckets(keys, mod=mod, salt=salt)
        lab = np.array(names, dtype=object)[np.searchsorted(
            edges, b, side='right')]
        return tbl.append_column(out_col,
                                 pa.array(lab, type=pa.string()))

    return ds.map_batches(assign, batch_format='pyarrow',
                          zero_copy_batch=True)


def weighted_mix(ds, group_col: str, key_col: str,
                 rates: dict[str, float], default_rate: float = 0.0,
                 mod: int = 10_000, salt: int = 0):
    """Deterministic weighted corpus mixing: keep each row with a
    per-source probability — the standard "sample source s at rate w_s
    to hit target corpus proportions" step of LLM pre-training data
    assembly. The keep decision is a pure function of (key, salt), so
    the mixed corpus is identical across runs, partitionings and
    engines, and composes with ``hash_split`` (different salts stay
    independent). Zero shuffle — one vectorized filter map; sources not
    in ``rates`` get ``default_rate``.
    """
    names = list(rates)
    thresholds = np.array(
        [int(round(rates[n] * mod)) for n in names] +
        [int(round(default_rate * mod))], dtype=np.int64)

    def keep(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        b = split_buckets(keys, mod=mod, salt=salt)
        idx = pc.index_in(
            tbl.column(group_col),
            value_set=pa.array(names, type=pa.string()))
        idx = idx.combine_chunks().fill_null(len(names)).to_numpy(
            zero_copy_only=False)
        return tbl.filter(pa.array(b < thresholds[idx]))

    return ds.map_batches(keep, batch_format='pyarrow',
                          zero_copy_batch=True)


def mix_sql_expr(group_col: str, key_col: str, rates: dict[str, float],
                 default_rate: float = 0.0, mod: int = 10_000,
                 salt: int = 0) -> str:
    """The matching ANSI-SQL WHERE predicate for ``weighted_mix``."""
    b = (f'((({key_col} + {salt}) % 2147483648) * {_KNUTH}) '
         f'% 4294967296 % {mod}')
    arms = ' '.join(
        f"WHEN '{n}' THEN {int(round(r * mod))}"
        for n, r in rates.items())
    return (f'{b} < CASE {group_col} {arms} '
            f'ELSE {int(round(default_rate * mod))} END')


def shard_positions(ds, key_col: str, num_shards: int, salt: int = 0,
                    order_salt: int = 1):
    """Deterministic global shuffle for training-data export: every row
    gets a shard id (hash of key) and its position inside the shard
    (rank of a SECOND, independent hash — the within-shard shuffle
    order). This is how a 100-TB corpus is shuffled in practice: no
    global random permutation, just hash-sharding plus an in-shard
    hash order, both pure functions of the key — resumable, stable
    across engines, and reproduced exactly by a SQL row_number()
    oracle.

    One hash exchange on the shard id; each shard sorts its rows by
    (order hash, key) — vectorized argsort — and emits positions.
    """
    from ..stages.conversations import bucket_exchange

    def tag(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            key_col: pa.array(keys.astype(np.int64)),
            'shard': pa.array(split_buckets(keys, mod=num_shards,
                                            salt=salt)),
            '_h': pa.array(split_buckets(keys, mod=2 ** 32,
                                         salt=order_salt)),
        })

    def rank(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or key_col not in tbl.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             'shard': pa.array([], pa.int64()),
                             'pos': pa.array([], pa.int64())})
        sh = tbl.column('shard').combine_chunks().to_numpy(
            zero_copy_only=False)
        h = tbl.column('_h').combine_chunks().to_numpy(
            zero_copy_only=False)
        k = tbl.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((k, h, sh))
        # position within each shard run of the sorted order
        sh_sorted = sh[order]
        starts = np.concatenate(([True], sh_sorted[1:] != sh_sorted[:-1]))
        seg = np.cumsum(starts) - 1
        first = np.flatnonzero(starts)
        pos_sorted = np.arange(len(sh_sorted), dtype=np.int64) \
            - first[seg]
        pos = np.empty(len(sh_sorted), dtype=np.int64)
        pos[order] = pos_sorted
        return pa.table({key_col: pa.array(k.astype(np.int64)),
                         'shard': pa.array(sh.astype(np.int64)),
                         'pos': pa.array(pos)})

    tagged = ds.map_batches(tag, batch_format='pyarrow',
                            zero_copy_batch=True)
    return bucket_exchange(tagged, 'shard', rank,
                           num_buckets=min(num_shards, 64))


def stratified_sample(ds, group_col: str, key_col: str, k: int,
                      salt: int = 0, num_buckets: int = 32):
    """Deterministic stratified sample: the k rows per group with the
    smallest key hash — a pure function of (key, salt), so the sample
    is stable across runs, partitionings and engines, and an ANSI-SQL
    oracle reproduces it exactly (row_number() over the same hash
    expression).

    Physically this is grouped top-k: each batch prunes to its local
    per-group k before the one exchange, so at most k rows per
    (group, batch) move. Keys must be non-negative integers (see
    split_buckets).
    """
    from ..stages.aggregate import grouped_topk

    def with_hash(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        # mod = 2^32: the full fold, no extra reduction
        h = split_buckets(keys, mod=2 ** 32, salt=salt)
        return tbl.append_column('_strat_h', pa.array(h))

    top = grouped_topk(ds.map_batches(with_hash, batch_format='pyarrow',
                                      zero_copy_batch=True),
                       group_col, '_strat_h', k, descending=False,
                       tiebreak=key_col, num_buckets=num_buckets)
    return top.map_batches(lambda t: t.drop_columns(['_strat_h']),
                           batch_format='pyarrow')


def priority_sample(ds, key_col: str, weight_col: str, k: int,
                    salt: int = 0):
    """Deterministic weighted sampling WITHOUT replacement via priority
    sampling (Duffield-Lund-Thorup): each row gets priority
    ``w / u`` where ``u = (h + 1) / 2^32`` is hash-uniform in (0, 1],
    and the k highest-priority rows are the sample. Heavier rows get
    proportionally larger priorities — the weighted analogue of the
    engine's bottom-k-hash samples.

    Why priorities and not Efraimidis-Spirakis (``u^(1/w)``): the E-S
    key needs a transcendental (pow/ln) whose last ulp differs between
    libm implementations — not oracle-checkable at the byte bar. The
    priority is ONE ieee754 division of exactly-representable values
    (w integer-valued, h+1 <= 2^32), which DuckDB reproduces
    bit-identically; ties (equal w, colliding h) break on the key.
    Pure function of (key, salt, weight): stable across runs,
    partitionings and row orders.

    Physically: per-batch local top-k prune, one merge task
    (stages/aggregate.global_topk) — at most k rows per block move.
    Rows with NULL or non-positive weight have zero inclusion
    probability (excluded). Keys must be non-negative integers."""
    from ..stages.aggregate import global_topk

    def with_priority(tbl: pa.Table) -> pa.Table:
        w = tbl.column(weight_col)
        good = pc.and_(pc.is_valid(w),
                       pc.greater(pc.cast(w, pa.float64()),
                                  pa.scalar(0.0)))
        if key_col != weight_col:
            good = pc.and_(good, pc.is_valid(tbl.column(key_col)))
        tbl = tbl.filter(good)
        keys = tbl.column(key_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        h = split_buckets(keys, mod=2 ** 32, salt=salt)
        wf = pc.cast(tbl.column(weight_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        prio = wf / (h + 1).astype(np.float64)
        return tbl.append_column('_prio', pa.array(prio))

    top = global_topk(
        ds.map_batches(with_priority, batch_format='pyarrow',
                       zero_copy_batch=True),
        [('_prio', 'descending'), (key_col, 'ascending')], k)
    return top.map_batches(lambda t: t.drop_columns(['_prio']),
                           batch_format='pyarrow')
