"""Per-conversation execution: the engine's ONE shuffle.

Pattern (SURVEY.md §7 phase 2): hash-bucket conversations so each bucket
holds complete conversations, exchange once via ``groupby('_bucket')``,
then run vectorized segmented kernels over each bucket with all its
conversations sorted (conv_id, turn_idx, ts) and contiguous. Per-bucket
work is numpy/Arrow over the whole bucket — never per-conversation python
— so thousands of small conversations cost one pass.

Scale notes:
  * ``num_buckets`` bounds shuffle-partition size; size it ≈ 2-4× total
    cores cluster-wide (more buckets = smaller, more uniform tasks).
  * A mega-conversation is still confined to one bucket; the salted path
    (stages/salting.py) splits those by turn-range with overlap carry.
  * The bucket hash is deterministic (pandas hash_array with a fixed key),
    so reruns and resumed jobs land rows in identical buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .window import group_starts

BUCKET_COL = '_bucket'
_HASH_KEY = '0123456789abcdef'  # fixed -> deterministic across processes


def bucket_of(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic uint64 hash-bucket of a key array (vectorized C).

    MUST stay bit-identical to ``add_bucket``'s single-key case (h
    starts at 0, so the golden-ratio combine degenerates to the same
    ``hash_array`` — asserted in tests/test_features.py): two hash
    functions that disagree would silently break bucket co-location."""
    h = pd.util.hash_array(values, hash_key=_HASH_KEY, categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _hashable_np(col) -> np.ndarray:
    """Key column -> numpy for hashing, with a DTYPE that does not
    depend on whether THIS block happens to contain nulls.

    pyarrow's ``to_numpy`` floatifies int columns (and objectifies bool)
    when nulls are present, and ``hash_array`` hashes the raw bit
    pattern — so the same key value would land in a DIFFERENT bucket in
    a null-bearing block than in a null-free one, silently breaking
    co-location for every exchange/join keyed on a nullable int column.
    Nulls hash as 0/False (they only need a consistent bucket; an
    equality join never matches them anyway)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        import pyarrow.compute as _pc
        if pa.types.is_integer(col.type):
            col = _pc.fill_null(col, 0)
        elif pa.types.is_boolean(col.type):
            col = _pc.fill_null(col, False)
    return col.to_numpy(zero_copy_only=False)


def key_hash(table: pa.Table, keys) -> np.ndarray:
    """Deterministic uint64 hash of a (possibly composite) key, one
    value per row — the same golden-ratio per-column mix every exchange
    buckets on (add_bucket == key_hash % num_buckets), exposed so
    skew-tier splits (hot-key membership tests) agree bit-for-bit with
    the exchanges they divert rows from."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    h = np.zeros(table.num_rows, dtype=np.uint64)
    for k in keys:
        vals = _hashable_np(table.column(k))
        h = (h * np.uint64(0x9E3779B97F4A7C15)
             + pd.util.hash_array(vals, hash_key=_HASH_KEY,
                                  categorize=False))
    return h


def add_bucket(table: pa.Table, key='conv_id',
               num_buckets: int = 64) -> pa.Table:
    """Append the int32 hash bucket of ``key`` (one column name or a
    list — composite keys combine per-column hashes with the same
    golden-ratio mix as bucket_aggregate, so single-key buckets are
    unchanged)."""
    h = key_hash(table, key)
    return table.append_column(
        BUCKET_COL, pa.array((h % np.uint64(num_buckets)).astype(np.int32),
                             type=pa.int32()))


def sort_bucket(table: pa.Table, key: str = 'conv_id',
                order: tuple = ('turn_idx', 'ts')) -> pa.Table:
    """Stable in-bucket sort giving the engine's canonical row order
    (conv_id, turn_idx, ts) — the ordering the byte-equality invariant is
    defined over (SURVEY.md §4.3)."""
    keys = [(key, 'ascending')] + [(o, 'ascending') for o in order]
    return table.sort_by(keys)


def per_conversation(ds, fn, key: str = 'conv_id',
                     order: tuple = ('turn_idx', 'ts'),
                     num_buckets: int = 64, drop_bucket: bool = True,
                     **groupby_kwargs):
    """ds → one hash exchange → fn(sorted_bucket_table, starts) per bucket.

    ``fn`` receives the bucket as a pyarrow Table sorted by (key, *order)
    with a numpy bool ``starts`` marking each conversation's first row, and
    returns a pyarrow Table.
    """

    def _run(bucket_tbl: pa.Table) -> pa.Table:
        # Ray 2.49 map_groups can hand SCHEMA-LESS empty blocks (no
        # columns) — nothing to do with those. But a 0-row block that
        # still CARRIES the input schema must flow through fn like any
        # other: returning it raw would emit an input-schema block
        # (with _bucket, without fn's output columns) that cannot unify
        # with the populated buckets' output schema.
        if bucket_tbl.num_rows == 0 and key not in bucket_tbl.column_names:
            return bucket_tbl
        tbl = sort_bucket(bucket_tbl, key, order)
        if drop_bucket and BUCKET_COL in tbl.column_names:
            tbl = tbl.drop_columns([BUCKET_COL])
        keys = tbl.column(key).combine_chunks().to_numpy(
            zero_copy_only=False)
        out = fn(tbl, group_starts(keys))
        return out

    bucketed = ds.map_batches(
        lambda t: add_bucket(t, key, num_buckets),
        batch_format='pyarrow', zero_copy_batch=True)
    return bucketed.groupby(BUCKET_COL).map_groups(
        _run, batch_format='pyarrow', **groupby_kwargs)


def bucket_exchange(ds, key: str, fn, num_buckets: int = 32,
                    **groupby_kwargs):
    """Generic hash exchange: co-locate all rows sharing ``key`` into one
    task, run ``fn(table) -> table`` per bucket. Unlike
    ``Dataset.repartition(keys=...)`` this works under every shuffle
    strategy (it is a groupby on a computed int32 bucket column), and a
    bucket holds MANY keys — fn must group internally (vectorized)."""

    def _run(bucket_tbl: pa.Table) -> pa.Table:
        # drop _bucket on ANY block that has it — gating on num_rows
        # would pass the internal column through fn on a 0-row block
        # that kept its schema, diverging from sibling blocks' output
        if BUCKET_COL in bucket_tbl.column_names:
            bucket_tbl = bucket_tbl.drop_columns([BUCKET_COL])
        return fn(bucket_tbl)

    bucketed = ds.map_batches(
        lambda t: add_bucket(t, key, num_buckets),
        batch_format='pyarrow', zero_copy_batch=True)
    return bucketed.groupby(BUCKET_COL).map_groups(
        _run, batch_format='pyarrow', **groupby_kwargs)
