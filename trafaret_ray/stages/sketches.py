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
import pyarrow.compute as pc

from .aggregate import pre_aggregate

_HASH_KEY = '0123456789abcdef'


def duckdb_hash64(values) -> np.ndarray:
    """DuckDB-compatible 64-bit integer hash (murmurhash64 finalizer
    with the leading fold: x ^= x>>32; x *= C; x ^= x>>32; x *= C;
    x ^= x>>32). Byte-equal to SQL ``hash(x::BIGINT)`` — pinned by a
    differential sweep in tests/test_sketches.py — which makes
    hash-indexed sketches (HLL registers, KMV bottom-k) transcribable
    into DuckDB oracles. Accepts anything int64-coercible (including
    the float64 that pandas null-padding produces for nullable int
    ids; values must be integral and < 2^53 for that round trip)."""
    x = np.asarray(values)
    if x.dtype != np.int64:
        x = x.astype(np.int64)
    x = x.astype(np.uint64)
    return _murmur64_u64(x)


def _murmur64_u64(x: np.ndarray) -> np.ndarray:
    """The murmurhash64 finalizer on raw uint64 lanes (DuckDB's
    Hash(UBIGINT) — same bit pattern as Hash(BIGINT))."""
    with np.errstate(over='ignore'):
        x = x ^ (x >> np.uint64(32))
        x = x * np.uint64(0xd6e8feb86659fd93)
        x = x ^ (x >> np.uint64(32))
        x = x * np.uint64(0xd6e8feb86659fd93)
        x = x ^ (x >> np.uint64(32))
    return x


_MMA_MUL = np.uint64(0xc6a4a7935bd1e995)
_MMA_SEED = np.uint64(0xe17a1465)


def duckdb_hash_str64(values) -> np.ndarray:
    """DuckDB-compatible 64-bit STRING hash: MurmurHash64A (Appleby's
    public 64-bit murmur) with DuckDB's seed, byte-equal to SQL
    ``hash(x::VARCHAR)`` on DuckDB 1.0 — pinned by the differential
    fuzz in tests/test_sketch_oracle.py. Vectorized ACROSS rows: the
    ragged UTF-8 bytes scatter once into a zero-padded (n, pad) byte
    matrix, then the 8-byte chunk loop runs max_len/8 iterations of
    whole-column uint64 ops with per-row activity masks (tokens are
    short, so a handful of vector passes hashes millions of rows).
    The zero padding IS the algorithm's tail rule: murmur64a's tail
    step xors the little-endian composition of the remaining <8 bytes,
    exactly the padded chunk's value. Accepts a pyarrow string/binary
    (chunked) array or anything pa.array() can coerce; nulls must be
    dropped by the caller (raises otherwise)."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values, type=pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.null_count:
        raise ValueError('duckdb_hash_str64: drop nulls before hashing')
    arr = values.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_buf = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    off = off_buf[arr.offset:arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = off[:-1]
    lens = (off[1:] - starts).astype(np.int64)
    maxlen = int(lens.max())
    pad = max(((maxlen + 7) // 8) * 8, 8)
    # the padded matrix is n * max_len bytes — ONE pathological value
    # (a space-free adversarial document read as a single "token")
    # would inflate every row's padding. Cap the matrix at ~64 MB:
    # oversize rows (>64 KB) hash individually, the rest re-batch with
    # their own (small) pad — a giant value only pays for itself, and
    # the short rows keep the vector path (review finding: a global
    # step = CAP // pad degraded to one-row slices when pad was huge)
    if n * pad > 64 * 2 ** 20 and n > 1:
        out = np.empty(n, dtype=np.uint64)
        big = lens > 65536
        if big.any():
            small_idx = np.nonzero(~big)[0]
            if small_idx.size:
                out[small_idx] = duckdb_hash_str64(
                    arr.take(pa.array(small_idx)))
            for i in np.nonzero(big)[0]:
                out[i] = duckdb_hash_str64(arr.slice(int(i), 1))[0]
            return out
        step = max(1, (64 * 2 ** 20) // pad)
        for lo in range(0, n, step):
            out[lo:lo + step] = duckdb_hash_str64(
                arr.slice(lo, min(step, n - lo)))
        return out
    mat = np.zeros((n, pad), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        row = np.repeat(np.arange(n), lens)
        pos_in_row = np.arange(total) - np.repeat(
            np.cumsum(lens) - lens, lens)
        mat[row, pos_in_row] = data[np.repeat(starts, lens) + pos_in_row]
    chunks = mat.view('<u8')                    # (n, pad // 8)
    r = np.uint64(47)
    nfull = lens // 8
    tail = lens - nfull * 8
    with np.errstate(over='ignore'):
        h = _MMA_SEED ^ (lens.astype(np.uint64) * _MMA_MUL)
        for c in range(pad // 8):
            k = chunks[:, c]
            full = nfull > c
            if full.any():
                kk = k[full] * _MMA_MUL
                kk ^= kk >> r
                kk *= _MMA_MUL
                h[full] = (h[full] ^ kk) * _MMA_MUL
            t = (nfull == c) & (tail > 0)
            if t.any():
                h[t] = (h[t] ^ k[t]) * _MMA_MUL
        h ^= h >> r
        h *= _MMA_MUL
        h ^= h >> r
    return h


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


def hll_estimate_exact6(regs: np.ndarray) -> float:
    """Byte-deterministic HLL estimator, micro-floored to 6 decimals.

    Same estimate as :func:`hll_estimate` up to float summation order,
    but built so a DuckDB oracle reproduces it bit-for-bit: the
    register sum 2^64 * sum(2^-M[j]) is an EXACT Python integer (one
    ``1 << (64-rank)`` term per register, absent registers contribute
    2^64), the numerator alpha*m^2*2^64 is ONE double literal shared
    verbatim with the SQL text, and the only float ops are a single
    int->double conversion (IEEE round-to-nearest on both engines),
    one division, and libm log in the small-range branch (math.log ==
    DuckDB ln, CLAUDE.md). Output floor(x*1e6+0.5)/1e6."""
    import math
    m = len(regs)
    present = regs > 0
    s = (m - int(present.sum())) << 64
    cnt = np.bincount(regs[present].astype(np.int64))
    for r in np.nonzero(cnt)[0]:
        s += int(cnt[r]) << (64 - int(r))
    num = (0.7213 / (1 + 1.079 / m)) * m * m * 2.0 ** 64
    raw = num / float(s)
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        est = float(m) * math.log(float(m) / zeros)
    else:
        est = raw
    return math.floor(est * 1e6 + 0.5) / 1e6


class HLL:
    """One sketch; mergeable via element-wise register max.

    ``hash_mode='pandas'`` (default) hashes any value type via
    pd.util.hash_array; ``'duckdb64'`` uses the DuckDB-equal integer
    hash (int64 values only) so grouped estimates gain a byte-checked
    SQL oracle (see queries.q_hll_distinct_users)."""

    def __init__(self, p: int = 12, hash_mode: str = 'pandas'):
        if hash_mode not in ('pandas', 'duckdb64'):
            raise ValueError(f'unknown hash_mode {hash_mode!r}')
        self.p = p
        self.hash_mode = hash_mode
        self.regs = np.zeros(1 << p, dtype=np.uint8)

    def add(self, values) -> 'HLL':
        if self.hash_mode == 'duckdb64':
            h = duckdb_hash64(values)
        else:
            arr = np.asarray(values, dtype=object) \
                if not isinstance(values, np.ndarray) else values
            h = pd.util.hash_array(arr, hash_key=_HASH_KEY,
                                   categorize=False).astype(np.uint64)
        _hll_update(self.regs, h, self.p)
        return self

    def merge(self, other: 'HLL') -> 'HLL':
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        return hll_estimate(self.regs)


def hll_distinct(ds, group_col: str, value_col: str, p: int = 12,
                 hash_mode: str = 'pandas'):
    """Approximate COUNT(DISTINCT value) per group: one sketch row per
    (group, batch), merged by register-max in one tiny exchange.
    Estimates use the byte-deterministic exact-int estimator
    (hll_estimate_exact6) so results are partition-invariant; with
    ``hash_mode='duckdb64'`` (int64 values) the whole pipeline is
    byte-reproducible in SQL. Returns (group, approx_distinct)."""

    def sketch(tbl: pa.Table) -> pa.Table:
        gtype = tbl.schema.field(group_col).type
        df = tbl.select([group_col, value_col]).to_pandas()
        rows_g, rows_s = [], []
        # dropna=False: NULL group keys are one group (SQL GROUP BY);
        # NULL values are NOT counted (SQL COUNT(DISTINCT) semantics)
        for g, sub in df.groupby(group_col, sort=False, dropna=False):
            h = HLL(p, hash_mode=hash_mode).add(
                sub[value_col].dropna().to_numpy())
            rows_g.append(None if pd.isna(g) else g)
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
        for g, sub in df.groupby(group_col, sort=False, dropna=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for b in sub['sketch']:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            out_g.append(None if pd.isna(g) else g)
            out_e.append(hll_estimate_exact6(regs))
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         'approx_distinct': pa.array(out_e,
                                                     type=pa.float64())})

    from .conversations import bucket_exchange
    return bucket_exchange(sketches, group_col, merge_group, num_buckets=8)


def histogram_quantiles(ds, group_col: str, value_col: str, qs,
                        n_bins: int = 4096, ndigits: int = 6):
    """Approximate per-group quantiles via a MERGEABLE fixed-bin
    histogram — the scale path when a group's values exceed one task
    (exact counterpart: stages/aggregate.grouped_quantiles).

    Two passes: (1) tiny min/max partials per group (broadcast), (2) one
    histogram partial per (group, batch) — n_bins int64 counts, a few KB
    — merged by vector add in a small exchange. The answer is the
    midpoint of the bin holding the target RANK, so rank error is ≤ 1
    sample and value error is ≤ (max-min)/n_bins of that sample's bin;
    against interpolated exact quantiles (quantile_cont) the gap can
    additionally reach the local sample spacing — material only in
    sparse tails (e.g. p99 of a 200-sample group). Returns
    (group, q, value).
    """
    import ray

    from .aggregate import pre_aggregate
    from .conversations import bucket_exchange

    qs = list(qs)
    bounds = pre_aggregate(ds.map_batches(
        lambda t: t.select([group_col, value_col]), batch_format='pyarrow',
        zero_copy_batch=True), [group_col],
        {'lo': (value_col, 'min'), 'hi': (value_col, 'max')}).to_pandas()
    if len(bounds) == 0 or group_col not in bounds.columns:
        # empty input lost its schema (CLAUDE.md invariant): no groups,
        # no quantiles — emit the typed empty result
        import ray.data as rd
        gtype = dict(zip(ds.schema().names, ds.schema().types))[group_col]
        return rd.from_arrow(pa.table({
            group_col: pa.array([], type=gtype),
            'q': pa.array([], pa.float64()),
            'value': pa.array([], pa.float64())}))
    b_keys = pa.array(bounds[group_col])
    b_lo = bounds['lo'].to_numpy(dtype=np.float64)
    b_hi = bounds['hi'].to_numpy(dtype=np.float64)
    bref = ray.put((b_keys, b_lo, b_hi))

    def hist(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys, lo, hi = ray.get(bref)
        gtype = tbl.schema.field(group_col).type
        # NULLs are ignored (NaN would land in bin 0 via INT64_MIN clip,
        # silently dragging low quantiles down)
        if tbl.num_rows:
            tbl = tbl.filter(pc.is_valid(tbl.column(value_col)))
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             'counts': pa.array([], type=pa.binary())})
        garr = tbl.column(group_col)
        gif = pc.index_in(garr, value_set=keys)\
            .to_numpy(zero_copy_only=False).astype(np.float64)
        if garr.null_count:
            # index_in never matches null-to-null: route NULL-group rows
            # to the null slot of keys (a NULL group is a group)
            knull = np.nonzero(pc.is_null(keys)
                               .to_numpy(zero_copy_only=False))[0]
            gif = np.where(
                np.isnan(gif),
                np.float64(knull[0]) if len(knull) else np.nan, gif)
        keep = ~np.isnan(gif)
        if not keep.all():
            tbl = tbl.filter(pa.array(keep))
            gif = gif[keep]
        gi = gif.astype(np.int64)
        v = tbl.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        span = np.maximum(hi - lo, 1e-300)
        binf = (v - lo[gi]) / span[gi] * n_bins
        bins = np.clip(binf.astype(np.int64), 0, n_bins - 1)
        out_g, out_c = [], []
        for g in np.unique(gi):
            m = gi == g
            counts = np.bincount(bins[m], minlength=n_bins)
            out_g.append(keys[int(g)].as_py())
            out_c.append(counts.astype(np.int64).tobytes())
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         'counts': pa.array(out_c, type=pa.binary())})

    partials = ds.map_batches(hist, batch_format='pyarrow',
                              zero_copy_batch=True)

    def merge(tbl: pa.Table) -> pa.Table:
        keys, lo, hi = ray.get(bref)
        gtype = tbl.schema.field(group_col).type \
            if group_col in tbl.column_names else keys.type
        out_g, out_q, out_v = [], [], []
        if tbl.num_rows:
            df = tbl.to_pandas()
            # dropna=False: a NULL group is a group (SQL GROUP BY parity;
            # hist ships null-key partials and index_in matches null)
            for g, sub in df.groupby(group_col, sort=False, dropna=False):
                # pandas surfaces a NULL group key as float NaN — map it
                # back to None before it meets a typed Arrow array
                if g is None or (isinstance(g, float) and np.isnan(g)):
                    g = None
                acc = np.zeros(n_bins, dtype=np.int64)
                for c in sub['counts']:
                    acc += np.frombuffer(c, dtype=np.int64)
                total = acc.sum()
                cum = np.cumsum(acc)
                import pyarrow.compute as pc
                gidx = pc.index_in(pa.array([g], type=keys.type),
                                   value_set=keys)[0].as_py()
                span = max(hi[gidx] - lo[gidx], 1e-300)
                for q in qs:
                    target = q * (total - 1)
                    b = int(np.searchsorted(cum, target + 1))
                    b = min(b, n_bins - 1)
                    # midpoint of the hit bin, half-up micro-floored —
                    # floor is exact on both engines where python
                    # round() (decimal half-even) and DuckDB round()
                    # (scaled) can disagree by an ulp (CLAUDE.md
                    # float-comparison discipline)
                    val = lo[gidx] + (b + 0.5) / n_bins * span
                    scale = 10.0 ** ndigits
                    out_g.append(g)
                    out_q.append(q)
                    out_v.append(float(np.floor(val * scale + 0.5)
                                       / scale))
        return pa.table({group_col: pa.array(out_g, type=gtype),
                         'q': pa.array(out_q, type=pa.float64()),
                         'value': pa.array(out_v, type=pa.float64())})

    return bucket_exchange(partials, group_col, merge, num_buckets=8)


def exact_distinct(ds, group_col: str, value_col: str):
    """Exact COUNT(DISTINCT value) per group, two-phase: distinct
    (group, value) partials per batch → one exchange of distinct pairs →
    count per group. Returns (group, n_distinct)."""
    def dedup(tbl: pa.Table) -> pa.Table:
        # distinct pairs IN ARROW: a pandas round-trip here floatifies a
        # nullable int value column in null-bearing batches only, so the
        # same value hashes to two different buckets (int 1 vs float
        # 1.0) and n_distinct overcounts (CLAUDE.md from_pandas rule)
        sel = tbl.select([group_col, value_col])
        return sel.group_by([group_col, value_col]).aggregate([])

    pairs = ds.map_batches(dedup, batch_format='pyarrow',
                           zero_copy_batch=True)
    # (group, value) is high-cardinality -> hash-bucket merge, not a sort
    from .aggregate import bucket_aggregate
    uniq = bucket_aggregate(pairs, [group_col, value_col],
                            {'_one': (value_col, 'count')})

    # SQL COUNT(DISTINCT v): NULL values don't count, but an all-null
    # group still appears with 0. After the merge, _one is >0 for a
    # distinct non-null value (its per-batch counts summed) and 0 for
    # the group's NULL-value pair — clamp to a 0/1 indicator and SUM.
    def indicator(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        one = pc.cast(pc.greater(tbl.column('_one'), 0), pa.int64())
        return tbl.set_column(tbl.column_names.index('_one'), '_one', one)

    return pre_aggregate(uniq.map_batches(indicator, batch_format='pyarrow',
                                          zero_copy_batch=True),
                         [group_col], {'n_distinct': ('_one', 'sum')})


def heavy_hitters(ds, col: str, k: int = 20, expansion: int = 16,
                  num_buckets: int = 32):
    """EXACT top-k most frequent values, normally in two passes without
    ever exchanging the full key space (the Misra-Gries/Space-Saving
    shape) — with a PROVEN exactness check and an exact fallback:

      1. per-batch LOCAL top-(k*expansion) counts (np.unique — a
         truncated summary), plus the batch's truncation CUT (the
         smallest kept count; 0 when nothing was dropped),
      2. candidate union via one bucket merge of the tiny summaries,
      3. broadcast the candidates, EXACT counts over one more pass,
         top-k by (count desc, value asc).

    Exactness proof: a key absent from batch b's summary has local
    count <= cut_b, so a never-summarized key's global count <= T =
    sum(cut_b), and a candidate dropped at the driver's head(m) cut has
    true count <= its summed partial + T. If the k-th exact candidate
    count beats BOTH bounds (kth > T + max dropped partial) the result
    is provably exact;
    otherwise the operator FALLS BACK to a full exact group count —
    output is always exact, the sketch only saves work when the
    distribution allows. The driver-side candidate union is bounded by
    the distinct keys that survive ANY local top — small for the skewed
    distributions heavy hitters target; flat data takes the fallback
    anyway. Returns a Dataset (value, n)."""
    import ray as _ray

    from .aggregate import bucket_aggregate

    m = k * expansion

    def local_top(tbl: pa.Table) -> pa.Table:
        ctype = tbl.schema.field(col).type
        arr = tbl.column(col).combine_chunks()
        n_null = arr.null_count              # SQL GROUP BY: NULL is a
        vals = arr.drop_null().to_numpy(zero_copy_only=False)  # group
        if len(vals) == 0 and n_null == 0:
            return pa.table({col: pa.array([], type=ctype),
                             'n': pa.array([], pa.int64()),
                             '_cut': pa.array([], pa.int64())})
        uniq, counts = np.unique(vals, return_counts=True)
        top = np.argsort(-counts, kind='stable')[:m]
        # the batch's truncation bound rides on its first summary row;
        # the NULL count is exact per batch (never truncated), so it
        # rides along as one more candidate row without touching cut
        cuts = np.zeros(len(top) + (1 if n_null else 0), dtype=np.int64)
        if len(uniq) > m:
            cuts[0] = int(counts[top].min())
        keys = pa.array(uniq[top]).cast(ctype)
        ns = counts[top]
        if n_null:
            keys = pa.concat_arrays([keys, pa.array([None], type=ctype)])
            ns = np.append(ns, n_null)
        return pa.table({
            col: keys,
            'n': pa.array(ns, type=pa.int64()),
            '_cut': pa.array(cuts),
        })

    partials = ds.map_batches(local_top, batch_format='pyarrow',
                              zero_copy_batch=True)
    cand = bucket_aggregate(partials, [col],
                            {'n': ('n', 'sum'), 'cut': ('_cut', 'sum')},
                            num_buckets=num_buckets).to_pandas()
    if len(cand) == 0 or col not in cand.columns:
        # empty input lost its schema (CLAUDE.md invariant): no values,
        # no heavy hitters — emit the typed empty result. A fully-empty
        # DERIVED input has schema()=None (0 blocks, nothing to infer);
        # string is the only defensible default for a token/value column
        # no row of which ever existed.
        import ray.data as rd
        sch = ds.schema()
        ctype = (dict(zip(sch.names, sch.types))[col]
                 if sch is not None else pa.string())
        return rd.from_arrow(pa.table({col: pa.array([], type=ctype),
                                       'n': pa.array([], pa.int64())}))
    threshold = int(cand['cut'].sum()) if len(cand) else 0
    cand = cand.sort_values(['n', col],
                            ascending=[False, True])
    # a candidate dropped at head(m) was truncated in SOME batches, so
    # its true count can reach (its summed partial + T) — the certificate
    # must clear that bound too, not just the never-seen-key bound T
    dropped_max = int(cand['n'].iloc[m]) if len(cand) > m else 0
    cand = cand.head(m)
    null_cand = cand[col].isna().any()
    cand_ref = _ray.put(pa.array(cand[col].dropna().to_numpy()))

    def pick(tbl: pa.Table) -> pa.Table:
        mask = pc.is_in(tbl.column(col), value_set=_ray.get(cand_ref))
        if null_cand:
            mask = pc.or_kleene(mask, pc.is_null(tbl.column(col)))
        keep = tbl.filter(pc.fill_null(mask, False)).select([col])
        # count ROWS per value (count(col) would skip the NULL group)
        return keep.append_column(
            '_one', pa.array(np.ones(keep.num_rows, dtype=np.int64)))

    counted = bucket_aggregate(
        ds.map_batches(pick, batch_format='pyarrow',
                       zero_copy_batch=True),
        [col], {'n': ('_one', 'count')}, num_buckets=num_buckets)
    # counted is <= m+1 rows — sort driver-side (Ray's range sort also
    # chokes on None in object key arrays; SQL order: n desc, value asc
    # NULLS LAST)
    top = counted.to_pandas().sort_values(
        ['n', col], ascending=[False, True],
        na_position='last', kind='stable').head(k).reset_index(drop=True)
    kth = int(top['n'].iloc[-1]) if len(top) >= k else 0
    # exact iff no missed key can reach kth: never-summarized keys are
    # bounded by T, head(m)-dropped candidates by dropped_max + T
    if kth > threshold + dropped_max:
        import ray.data as rd
        return rd.from_pandas(top)
    # the sketch cannot certify exactness on this distribution: run the
    # full exact group count (one exchange over the whole key space)
    def ones(t: pa.Table) -> pa.Table:
        return t.select([col]).append_column(
            '_one', pa.array(np.ones(t.num_rows, dtype=np.int64)))

    full = bucket_aggregate(
        ds.map_batches(ones, batch_format='pyarrow',
                       zero_copy_batch=True),
        [col], {'n': ('_one', 'count')}, num_buckets=num_buckets)\
        .materialize()                  # read twice below (split on null)
    # the NULL group (at most one row) joins the top-k driver-side so
    # the distributed sort never sees a null key
    import ray.data as rd
    nonnull = full.map_batches(
        lambda t: t.filter(pc.is_valid(t.column(col))),
        batch_format='pyarrow', zero_copy_batch=True)
    topk = nonnull.sort(['n', col], descending=[True, False])\
        .limit(k).to_pandas()
    nullrow = full.map_batches(
        lambda t: t.filter(pc.is_null(t.column(col))),
        batch_format='pyarrow', zero_copy_batch=True).to_pandas()
    if len(nullrow):
        import pandas as _pd
        topk = _pd.concat([topk, nullrow], ignore_index=True)
    topk = topk.sort_values(['n', col], ascending=[False, True],
                            na_position='last', kind='stable')\
        .head(k).reset_index(drop=True)
    return rd.from_pandas(topk)


def profile_columns(ds, cols, num_buckets: int = 16):
    """Per-column data profile: row count, null count, exact distinct
    count, min and max — the schema-discovery / data-quality staple.
    TWO lean passes over the input: a stats pass emitting one partial
    row per column per batch, and a distinct pass emitting hashed
    per-batch uniques (values never leave the batch as Python objects;
    int64 beyond 2^53 and float negative zero are handled via
    normalize-then-hash). All-null columns still profile (n_distinct=0,
    null extremes). Returns a Dataset
    (column, n_rows, n_nulls, n_distinct, vmin, vmax) with extremes as
    float64 (numeric columns only)."""
    from .aggregate import bucket_aggregate

    def partial(tbl: pa.Table) -> pa.Table:
        rows = {'column': [], 'n_rows': [], 'n_nulls': [],
                'vmin': [], 'vmax': []}
        for c in cols:
            col = tbl.column(c).combine_chunks()
            rows['column'].append(c)
            rows['n_rows'].append(tbl.num_rows)
            rows['n_nulls'].append(col.null_count)
            valid = col.drop_null()
            if len(valid):
                rows['vmin'].append(float(pc.min(valid).as_py()))
                rows['vmax'].append(float(pc.max(valid).as_py()))
            else:
                rows['vmin'].append(None)
                rows['vmax'].append(None)
        return pa.table({
            'column': pa.array(rows['column'], pa.string()),
            'n_rows': pa.array(rows['n_rows'], pa.int64()),
            'n_nulls': pa.array(rows['n_nulls'], pa.int64()),
            'vmin': pa.array(rows['vmin'], pa.float64()),
            'vmax': pa.array(rows['vmax'], pa.float64()),
        })

    stats = pre_aggregate(
        ds.map_batches(partial, batch_format='pyarrow',
                       zero_copy_batch=True),
        ['column'], {'n_rows': ('n_rows', 'sum'),
                     'n_nulls': ('n_nulls', 'sum'),
                     'vmin': ('vmin', 'min'),
                     'vmax': ('vmax', 'max')})

    # exact distinct per column over 64-bit HASHES of the per-batch
    # uniques: exact for any type width (no lossy float casts), with
    # float -0.0 normalized to 0.0 first (SQL DISTINCT equality)
    _EMPTY_D = pa.table({'column': pa.array([], pa.string()),
                         'h': pa.array([], pa.int64())})

    def distinct_partial(tbl: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            u = pc.unique(tbl.column(c).combine_chunks().drop_null())
            if pa.types.is_floating(u.type):
                u = pc.unique(pc.add(u, pa.scalar(0.0, u.type)))
            if len(u) == 0:
                continue
            h = pd.util.hash_array(
                u.to_numpy(zero_copy_only=False), hash_key=_HASH_KEY,
                categorize=False).view(np.int64)
            parts.append(pa.table({
                'column': pa.array(np.repeat(c, len(h)), pa.string()),
                'h': pa.array(h, pa.int64())}))
        return pa.concat_tables(parts) if parts else _EMPTY_D

    dcounts = pre_aggregate(
        bucket_aggregate(
            ds.map_batches(distinct_partial, batch_format='pyarrow',
                           zero_copy_batch=True),
            ['column', 'h'], {'n': ('h', 'count')},
            num_buckets=num_buckets),
        ['column'], {'n_distinct': ('h', 'count')})

    from .joins import hash_join
    # LEFT join: an all-null column has no distinct row but must still
    # appear in the profile (n_distinct coalesces to 0 below)
    out = hash_join(
        stats, dcounts, on='column', how='left', num_buckets=4,
        left_schema=pa.schema([('column', pa.string()),
                               ('n_rows', pa.int64()),
                               ('n_nulls', pa.int64()),
                               ('vmin', pa.float64()),
                               ('vmax', pa.float64())]),
        right_schema=pa.schema([('column', pa.string()),
                                ('n_distinct', pa.int64())]))

    def finish(tbl: pa.Table) -> pa.Table:
        nd = pc.cast(pc.fill_null(pc.cast(tbl.column('n_distinct'),
                                          pa.float64()), 0.0), pa.int64())
        return pa.table({
            'column': tbl.column('column'),
            'n_rows': pc.cast(tbl.column('n_rows'), pa.int64()),
            'n_nulls': pc.cast(tbl.column('n_nulls'), pa.int64()),
            'n_distinct': nd,
            'vmin': pc.round(tbl.column('vmin'), ndigits=6),
            'vmax': pc.round(tbl.column('vmax'), ndigits=6),
        })

    return out.map_batches(finish, batch_format='pyarrow')\
        .sort('column')


# ---------------------------------------------------------------------------
# KMV / theta sketch: bottom-k distinct hashes — set-operation estimates
# (Beyer et al. 2007 "On Synopses for Distinct-Value Estimation"; the
# theta-sketch construction — public knowledge). Unlike HLL, a KMV
# sketch supports INTERSECTION estimates, which a union-only register
# sketch cannot.
# ---------------------------------------------------------------------------

_KMV_SCALE = float(1 << 63) * 2.0  # 2^64 as float


def kmv_partial(values: np.ndarray, k: int,
                hash_mode: str = 'pandas') -> np.ndarray:
    """Bottom-k DISTINCT uint64 hashes of ``values`` (sorted).
    ``hash_mode='duckdb64'`` (int64 values) uses the DuckDB-equal hash
    so the sketch is reproducible in a SQL oracle."""
    if len(values) == 0:
        return np.array([], dtype=np.uint64)
    if hash_mode == 'duckdb64':
        h = np.unique(duckdb_hash64(values))
    else:
        h = np.unique(pd.util.hash_array(values, hash_key=_HASH_KEY,
                                         categorize=False))
    return h[:k]


def kmv_merge(parts, k: int) -> np.ndarray:
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(mins: np.ndarray, k: int) -> float:
    """Distinct estimate: exact below k, (k-1)/theta at capacity."""
    if len(mins) < k:
        return float(len(mins))
    theta = float(mins[k - 1]) / _KMV_SCALE
    return (k - 1) / theta if theta > 0 else float(k)


def theta_set_ops(ds_a, ds_b, col: str, k: int = 4096,
                  hash_mode: str = 'pandas'):
    """Approximate |A|, |B|, |A u B|, |A n B| over the DISTINCT values of
    two dataset columns, via bottom-k sketches: each batch emits one
    sorted-hash partial (<= 8k bytes); ONE tiny single-group exchange
    merges them and forms the estimates. Deterministic (hash-based, no
    RNG); NULLs are not counted (COUNT DISTINCT semantics). Relative
    error ~1/sqrt(k) for the unary counts; the intersection inherits
    union error / jaccard. Returns a one-row Dataset
    (approx_a, approx_b, approx_union, approx_intersection)."""
    def part(side: int):
        def f(tbl: pa.Table) -> pa.Table:
            vals = tbl.column(col).combine_chunks().drop_null()\
                .to_numpy(zero_copy_only=False)
            mins = kmv_partial(vals, k, hash_mode=hash_mode)
            # deterministic shard from the sketch content: the level-1
            # tree merge fans partials over shards so the final task
            # sees <= 2*64 rows, not one row per input batch (at 100 TB
            # that is millions of 8-KB partials through one task)
            shard = int(mins[0] % np.uint64(64)) if len(mins) else 0
            return pa.table({
                '_one': pa.array([1], pa.int32()),
                '_shard': pa.array([shard], pa.int32()),
                'side': pa.array([side], pa.int8()),
                'sketch': pa.array([mins.tobytes()], pa.binary())})
        return f

    import ray.data as _rd

    # one empty seed partial per side: an ALL-EMPTY input produces no
    # batches at all, and the answer (all zeros) must still be one row
    seed = _rd.from_arrow(pa.table({
        '_one': pa.array([1, 1], pa.int32()),
        '_shard': pa.array([0, 0], pa.int32()),
        'side': pa.array([0, 1], pa.int8()),
        'sketch': pa.array([b'', b''], pa.binary())}))
    both = ds_a.map_batches(part(0), batch_format='pyarrow',
                            zero_copy_batch=True)\
        .union(ds_b.map_batches(part(1), batch_format='pyarrow',
                                zero_copy_batch=True))\
        .union(seed)

    # level-1 tree merge: KMV merge is associative and union-dedups, so
    # per-(side, shard) pre-merge is result-identical; output <= 128 rows
    def premerge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'sketch' not in tbl.column_names:
            return pa.table({'_one': pa.array([], pa.int32()),
                             '_shard': pa.array([], pa.int32()),
                             'side': pa.array([], pa.int8()),
                             'sketch': pa.array([], pa.binary())})
        sides = tbl.column('side').to_numpy(zero_copy_only=False)
        shards = tbl.column('_shard').to_numpy(zero_copy_only=False)
        raw = tbl.column('sketch').to_pylist()
        out_sd, out_sh, out_sk = [], [], []
        for sd in np.unique(sides):
            for sh in np.unique(shards[sides == sd]):
                sel = (sides == sd) & (shards == sh)
                m = kmv_merge([np.frombuffer(b, dtype=np.uint64)
                               for b, s in zip(raw, sel) if s], k)
                out_sd.append(int(sd))
                out_sh.append(int(sh))
                out_sk.append(m.tobytes())
        return pa.table({
            '_one': pa.array([1] * len(out_sd), pa.int32()),
            '_shard': pa.array(out_sh, pa.int32()),
            'side': pa.array(out_sd, pa.int8()),
            'sketch': pa.array(out_sk, pa.binary())})

    from .conversations import bucket_exchange as _bx
    both = _bx(both, ['side', '_shard'], premerge,
               num_buckets=8)

    _SCHEMA = pa.schema([('approx_a', pa.float64()),
                         ('approx_b', pa.float64()),
                         ('approx_union', pa.float64()),
                         ('approx_intersection', pa.float64())])

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'sketch' not in tbl.column_names:
            return _SCHEMA.empty_table()
        sides = tbl.column('side').to_numpy(zero_copy_only=False)
        raw = tbl.column('sketch').to_pylist()
        mins = {s: kmv_merge([np.frombuffer(b, dtype=np.uint64)
                              for b, sd in zip(raw, sides) if sd == s], k)
                for s in (0, 1)}
        union = kmv_merge([mins[0], mins[1]], k)
        est_u = kmv_estimate(union, k)
        # members of the union sketch seen on both sides estimate the
        # jaccard; scale by the union estimate for the intersection
        in_both = (np.isin(union, mins[0]) & np.isin(union, mins[1]))
        jac = in_both.sum() / len(union) if len(union) else 0.0
        return pa.table({
            'approx_a': pa.array([kmv_estimate(mins[0], k)], pa.float64()),
            'approx_b': pa.array([kmv_estimate(mins[1], k)], pa.float64()),
            'approx_union': pa.array([est_u], pa.float64()),
            'approx_intersection': pa.array([jac * est_u], pa.float64())})

    from .conversations import bucket_exchange
    return bucket_exchange(both, '_one', merge, num_buckets=1)


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable approximate frequencies at fixed memory
# ---------------------------------------------------------------------------

_CMS_MUL = np.uint64(6364136223846793005)   # Knuth MMIX LCG multiplier
_CMS_INC = np.uint64(1442695040888963407)


def _cms_rows(values, d: int, w: int,
              hash_mode: str = 'pandas') -> np.ndarray:
    """(d, n) column indices: one base 64-bit hash per value, then d
    derived per-row hashes (public Kirsch-Mitzenmacher-style
    construction — independent-enough rows from one strong hash).
    ``hash_mode='duckdb'`` uses the SQL-transcribable derivation
    hash(xor(hash(tok), j)) % w on DuckDB-parity murmur kernels, which
    makes the whole sketch a deterministic function DuckDB can
    recompute (the CMS oracle); 'pandas' is the legacy default."""
    if hash_mode == 'duckdb':
        base = duckdb_hash_str64(values)
        rows = np.empty((d, len(base)), dtype=np.int64)
        for j in range(d):
            x = _murmur64_u64(base ^ np.uint64(j))
            rows[j] = (x % np.uint64(w)).astype(np.int64)
        return rows
    if hash_mode != 'pandas':
        raise ValueError(f'unknown hash_mode: {hash_mode!r}')
    vals = np.asarray(values) if not isinstance(
        values, (pa.Array, pa.ChunkedArray)) else \
        values.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals, hash_key='0123456789abcdef',
                           categorize=False)
    rows = np.empty((d, len(h)), dtype=np.int64)
    x = h
    for j in range(d):
        x = x * _CMS_MUL + _CMS_INC
        rows[j] = ((x >> np.uint64(33)) % np.uint64(w)).astype(np.int64)
    return rows


def cms_build(ds, col: str, d: int = 4, w: int = 16384,
              num_shards: int = 16,
              hash_mode: str = 'pandas') -> np.ndarray:
    """Distributed count-min sketch of value frequencies: each batch
    builds one (d, w) int64 partial vectorized (np.add.at) and SPLITS
    it into ``num_shards`` flat ranges; a hash exchange on shard id
    SUMS each range across all partials in parallel (addition is
    associative — a tree merge, same shape as bloom_build). The driver
    assembles exactly one d*w*8-byte matrix — the bounded summary is
    the point: approximate per-key counts when the exact key table
    exceeds memory. Estimates (min over rows) only OVERcount
    (eps ~ e/w of total mass, delta ~ e^-d). NULL values are not
    counted. Integer sums -> permutation/partition-invariant, exactly
    reproducible."""
    from .conversations import bucket_exchange
    size = d * w
    assert size % num_shards == 0, 'd*w must divide num_shards'
    shard_len = size // num_shards

    def partial(tbl: pa.Table) -> pa.Table:
        c = tbl.column(col)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        c = c.drop_null()
        vals = c if hash_mode == 'duckdb' \
            else c.to_numpy(zero_copy_only=False)
        m = np.zeros((d, w), dtype=np.int64)
        if len(vals):
            pos = _cms_rows(vals, d, w, hash_mode=hash_mode)
            for j in range(d):
                np.add.at(m[j], pos[j], 1)
        flat = m.reshape(-1)
        shards, payloads = [], []
        for s in range(num_shards):
            piece = flat[s * shard_len:(s + 1) * shard_len]
            if piece.any():
                shards.append(s)
                payloads.append(piece.tobytes())
        return pa.table({'shard': pa.array(shards, pa.int64()),
                         'counts': pa.array(payloads, pa.binary())})

    parts = ds.map_batches(partial, batch_format='pyarrow',
                           zero_copy_batch=True)

    def merge_shard(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({'shard': pa.array([], pa.int64()),
                             'counts': pa.array([], pa.binary())})
        df = tbl.to_pandas()
        out_s, out_c = [], []
        for s, sub in df.groupby('shard', sort=False):
            acc = np.zeros(shard_len, dtype=np.int64)
            for b in sub['counts']:
                acc += np.frombuffer(b, dtype=np.int64)
            out_s.append(int(s))
            out_c.append(acc.tobytes())
        return pa.table({'shard': pa.array(out_s, pa.int64()),
                         'counts': pa.array(out_c, pa.binary())})

    merged = bucket_exchange(parts, 'shard', merge_shard,
                             num_buckets=num_shards)
    flat = np.zeros(size, dtype=np.int64)
    for b in merged.iter_batches(batch_size=None, batch_format='pyarrow'):
        for s, payload in zip(b.column('shard').to_pylist(),
                              b.column('counts').to_pylist()):
            flat[s * shard_len:(s + 1) * shard_len] = np.frombuffer(
                payload, dtype=np.int64)
    return flat.reshape(d, w)


def cms_estimate(sketch: np.ndarray, values: np.ndarray,
                 hash_mode: str = 'pandas') -> np.ndarray:
    """Point estimates: min over the d rows at each value's positions."""
    d, w = sketch.shape
    if len(values) == 0:
        return np.zeros(0, dtype=np.int64)
    pos = _cms_rows(values, d, w, hash_mode=hash_mode)
    return np.min(sketch[np.arange(d)[:, None], pos], axis=0)
