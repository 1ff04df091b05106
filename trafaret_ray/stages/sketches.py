"""Mergeable sketches: HyperLogLog distinct counting (numpy).

Sketches are the scale path for cardinality questions: each batch emits
ONE serialized sketch (2^p bytes), the exchange merges a handful of
sketches instead of shuffling every key (ray guide: "emit one serialized
sketch per batch and merge them in a second, tiny stage").

``hll_distinct`` = grouped approximate COUNT(DISTINCT x) with standard
HLL error ~1.04/sqrt(2^p) (p=12 → ~1.6%). The exact operator for
oracle-checkable results is ``exact_distinct`` (two-phase distinct).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import pre_aggregate

_HASH_KEY = '0123456789abcdef'


def _hll_update(regs: np.ndarray, values: np.ndarray, p: int):
    """Fold a batch of uint64 hashes into 2^p registers (vectorized)."""
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = values << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits + 1
    lz = np.full(len(values), 64 - p, dtype=np.int64)
    mask = rest != 0
    # float trick is unsafe past 2^53; use bit-scan via np.log2 on the top
    # 32 bits with a fallback loop-free correction
    r = rest[mask]
    hi = (r >> np.uint64(32)).astype(np.uint64)
    lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    lz_hi = 31 - np.floor(np.log2(hi.astype(np.float64) + 0.5)).astype(np.int64)
    lz_lo = 63 - np.floor(np.log2(lo.astype(np.float64) + 0.5)).astype(np.int64)
    use_hi = hi != 0
    lzv = np.where(use_hi, np.clip(lz_hi, 0, 31), np.clip(lz_lo, 32, 63))
    lz[mask] = np.minimum(lzv, 64 - p)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


class HLL:
    """One sketch; mergeable via element-wise register max."""

    def __init__(self, p: int = 12):
        self.p = p
        self.regs = np.zeros(1 << p, dtype=np.uint8)

    def add(self, values) -> 'HLL':
        arr = np.asarray(values, dtype=object) \
            if not isinstance(values, np.ndarray) else values
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)
        _hll_update(self.regs, h.astype(np.uint64), self.p)
        return self

    def merge(self, other: 'HLL') -> 'HLL':
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        return hll_estimate(self.regs)


def hll_distinct(ds, group_col: str, value_col: str, p: int = 12):
    """Approximate COUNT(DISTINCT value) per group: one sketch row per
    (group, batch), merged by register-max in one tiny exchange.
    Returns (group, approx_distinct)."""

    def sketch(tbl: pa.Table) -> pa.Table:
        gtype = tbl.schema.field(group_col).type
        df = tbl.select([group_col, value_col]).to_pandas()
        rows_g, rows_s = [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = HLL(p).add(sub[value_col].to_numpy())
            rows_g.append(g)
            rows_s.append(h.regs.tobytes())
        # typed empty: schema-less blocks break downstream schema checks
        return pa.table({group_col: pa.array(rows_g, type=gtype),
                         'sketch': pa.array(rows_s, type=pa.binary())})

    sketches = ds.map_batches(sketch, batch_format='pyarrow',
                              zero_copy_batch=True)

    def merge_group(tbl: pa.Table) -> pa.Table:
        gtype = tbl.schema.field(group_col).type
        df = tbl.to_pandas()
        out_g, out_e = [], []
        for g, sub in df.groupby(group_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for b in sub['sketch']:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            out_g.append(g)
            out_e.append(hll_estimate(regs))
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         'approx_distinct': pa.array(out_e,
                                                     type=pa.float64())})

    from .conversations import bucket_exchange
    return bucket_exchange(sketches, group_col, merge_group, num_buckets=8)


def exact_distinct(ds, group_col: str, value_col: str):
    """Exact COUNT(DISTINCT value) per group, two-phase: distinct
    (group, value) partials per batch → one exchange of distinct pairs →
    count per group. Returns (group, n_distinct)."""
    def dedup(tbl: pa.Table) -> pa.Table:
        df = tbl.select([group_col, value_col]).to_pandas()\
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(dedup, batch_format='pyarrow',
                           zero_copy_batch=True)
    # (group, value) is high-cardinality -> hash-bucket merge, not a sort
    from .aggregate import bucket_aggregate
    uniq = bucket_aggregate(pairs, [group_col, value_col],
                            {'_one': (value_col, 'count')})
    return pre_aggregate(uniq, [group_col],
                         {'n_distinct': ('_one', 'count')})
