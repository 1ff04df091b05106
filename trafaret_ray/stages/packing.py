"""Concat-and-chunk sequence packing (the GPT-style training layout).

Documents are laid out in a deterministic global order (``key_col``,
ascending), concatenated into one virtual token stream, and the stream
is cut into fixed ``budget``-token training sequences. Each document
reports where it landed: its global token offset, the first/last
sequence ids it spans, and its offset inside the first sequence. This
is the standard packing step of an LLM pre-training pipeline (public
knowledge; e.g. the GPT-2/3 papers' "documents are concatenated and
chunked" description) — NOT in the reference, which has no physical
operators at all (SURVEY.md §2.9).

Physical shape (scale-first):
- one projection pass computes per-row token counts (vectorized);
- one RANGE exchange on ``key_col`` (dense-int range buckets, NOT hash
  buckets — a prefix sum needs contiguous key ranges per task) sorts
  each bucket and computes its LOCAL cumulative sum;
- per-bucket totals (``num_buckets`` int64 rows — bytes, not data)
  reach the driver, which prefix-sums them into per-bucket offsets;
- a final map adds the broadcast offset and derives sequence ids.

So the full input is never materialized on the driver and every
per-row step is a numpy kernel. The intermediate (key, ntok, local
cumsum, bucket) projection is materialized once in the object store
(4 int64 columns/row) so the totals aggregate and the final map don't
recompute the exchange.

Range buckets assume roughly uniform key density (true for dense ids;
the id-assignment step upstream guarantees it). For pathological key
distributions, sample quantile edges first — same shape, different
edge computation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _range_bucket(keys: np.ndarray, lo: int, hi: int,
                  num_buckets: int) -> np.ndarray:
    """Contiguous range bucket in [0, num_buckets) for dense int keys."""
    span = max(int(hi) - int(lo) + 1, 1)
    b = ((keys.astype(np.int64) - np.int64(lo)) * np.int64(num_buckets)
         ) // np.int64(span)
    return np.clip(b, 0, num_buckets - 1).astype(np.int32)


def global_prefix_sum(ds, key_col: str, val_col: str, key_lo: int,
                      key_hi: int, num_buckets: int = 32,
                      out_col: str = 'prefix'):
    """Exclusive prefix sum of ``val_col`` over ascending ``key_col``
    order: out row = (key, val, sum of vals of all strictly-smaller
    keys). Keys must be unique dense-ish non-negative ints within
    [key_lo, key_hi] (supply parquet column statistics — they are free).

    Returns a Dataset of (key_col, val_col, out_col) int64 columns.
    """
    schema = pa.schema([(key_col, pa.int64()), (val_col, pa.int64()),
                        ('_local', pa.int64()), ('_rb', pa.int32())])

    def project(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key_col).combine_chunks().cast(pa.int64())\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(keys),
            val_col: tbl.column(val_col).combine_chunks()
            .cast(pa.int64()),
            '_rb': pa.array(_range_bucket(keys, key_lo, key_hi,
                                          num_buckets)),
        })

    def local_cumsum(tbl: pa.Table) -> pa.Table:
        # Ray 2.49 map_groups can hand schema-less EMPTY tables for
        # empty sort partitions — return an explicitly-typed empty
        if tbl.num_rows == 0 or key_col not in tbl.column_names:
            return schema.empty_table()
        order = pc.sort_indices(tbl.column(key_col))
        tbl = tbl.take(order)
        vals = tbl.column(val_col).combine_chunks()\
            .to_numpy(zero_copy_only=False)
        local = np.concatenate(([0], np.cumsum(vals[:-1], dtype=np.int64)))
        return pa.table({
            key_col: tbl.column(key_col).combine_chunks(),
            val_col: tbl.column(val_col).combine_chunks(),
            '_local': pa.array(local),
            '_rb': tbl.column('_rb').combine_chunks(),
        }, schema=schema)

    bucketed = ds.map_batches(project, batch_format='pyarrow',
                              zero_copy_batch=True)
    local = bucketed.groupby('_rb').map_groups(
        local_cumsum, batch_format='pyarrow').materialize()

    # per-bucket totals: num_buckets int64 rows — the ONLY driver data
    totals = local.groupby('_rb').sum(val_col).to_pandas()
    tot = np.zeros(num_buckets, dtype=np.int64)
    tot[totals['_rb'].to_numpy(np.int64)] = \
        totals[f'sum({val_col})'].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(tot[:-1], dtype=np.int64)))

    def add_offset(tbl: pa.Table) -> pa.Table:
        rb = tbl.column('_rb').combine_chunks()\
            .to_numpy(zero_copy_only=False)
        loc = tbl.column('_local').combine_chunks()\
            .to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: tbl.column(key_col).combine_chunks(),
            val_col: tbl.column(val_col).combine_chunks(),
            out_col: pa.array(loc + offsets[rb]),
        })

    return local.map_batches(add_offset, batch_format='pyarrow',
                             zero_copy_batch=True)


def concat_chunk_pack(ds, key_col: str, ntok_col: str, budget: int,
                      key_lo: int, key_hi: int, num_buckets: int = 32):
    """Pack rows (documents) into fixed ``budget``-token sequences by
    concatenation order of ``key_col``. Output per row:

    - ``start_tok``  global token offset of the row's first token
    - ``seq_first``  id of the training sequence holding that token
    - ``seq_last``   id of the sequence holding the row's LAST token
      (== seq_first when the row does not straddle a chunk boundary;
      rows with 0 tokens keep seq_last == seq_first)
    - ``tok_offset`` position inside seq_first where the row starts
    """
    if budget <= 0:
        raise ValueError('budget must be positive')
    pre = global_prefix_sum(ds, key_col, ntok_col, key_lo, key_hi,
                            num_buckets, out_col='start_tok')

    def derive(tbl: pa.Table) -> pa.Table:
        start = tbl.column('start_tok').combine_chunks()\
            .to_numpy(zero_copy_only=False)
        ntok = tbl.column(ntok_col).combine_chunks()\
            .to_numpy(zero_copy_only=False)
        b = np.int64(budget)
        seq_first = start // b
        last_tok = start + np.maximum(ntok - 1, 0)
        return pa.table({
            key_col: tbl.column(key_col).combine_chunks(),
            ntok_col: tbl.column(ntok_col).combine_chunks(),
            'start_tok': pa.array(start),
            'seq_first': pa.array(seq_first),
            'seq_last': pa.array(last_tok // b),
            'tok_offset': pa.array(start % b),
        })

    return pre.map_batches(derive, batch_format='pyarrow',
                           zero_copy_batch=True)
