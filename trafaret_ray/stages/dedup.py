"""Deduplication operators: exact, n-gram-Jaccard (exact pairs),
MinHash+LSH, SimHash, embedding-cosine near-dup.

These are first-class engine operators (SURVEY.md §2.9). Shuffle budget
per op is stated in each docstring; the common discipline is: compute
content keys vectorized inside ``map_batches``, exchange only (key, id)
or partial rows, and verify candidates locally per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from .aggregate import bucket_aggregate, pre_aggregate


def exact_dedup(ds, text_col: str = 'text', id_col: str = 'doc_id'):
    """Exact dedup: one canonical (min id) row per distinct content.

    Scale: fingerprints are computed per batch (vectorized hash); the
    exchange moves one partial row per distinct text per batch — the raw
    text never shuffles twice. Returns (id, fingerprint, n_dups).
    """
    def fp(tbl: pa.Table) -> pa.Table:
        return pa.table({
            id_col: tbl.column(id_col),
            'fingerprint': T.rolling_fingerprint(
                tbl.column(text_col).combine_chunks()),
        })

    hashed = ds.map_batches(fp, batch_format='pyarrow', zero_copy_batch=True)
    return bucket_aggregate(hashed, ['fingerprint'],
                            {id_col: (id_col, 'min'),
                             'n_dups': (id_col, 'count')})


def ngram_jaccard_pairs(ds, text_col: str = 'text', id_col: str = 'doc_id',
                        k: int = 3, threshold: float = 0.5,
                        num_buckets: int = 32, max_df: int | None = 50,
                        candidates=None, sizes_mode: str = 'auto',
                        metric: str = 'jaccard',
                        broadcast_sizes_max: int = 2_000_000):
    """EXACT word-k-gram Jaccard similar pairs (doc_a, doc_b, jaccard).

    ``metric='containment'`` instead scores common / min(|A|, |B|) —
    the ASYMMETRIC near-dup detector (a short doc fully contained in a
    long one scores 1.0 where Jaccard stays tiny; the
    benchmark-contamination / quote-inclusion shape). Same single
    exchange, same df cap; only the final formula and the output
    column name change.

    ONE shingling pass + ONE exchange: each doc explodes to DISTINCT
    64-bit shingle hashes (functions/text.py:shingle_hash_explode — no
    Python loops, no shingle strings ever leave the batch; the exchange
    moves 16-byte (hash, id) rows, ~10x fewer bytes than strings). Equal
    hashes co-locate in one bucket task which computes the df census, the
    df-capped per-doc size partials AND the pair partials in a single
    pass; only those tiny partials flow downstream. Docs with < k words
    emit zero shingles (oracle parity: its NULL shingles never join).

    ``sizes_mode``: 'broadcast' attaches capped per-doc sizes via a
    broadcast table + ``pc.index_in`` — bounded by one 16-byte row per
    doc with ≥1 kept shingle, but that table lives in the DRIVER heap.
    'join' is the 10^12-doc scale path: sizes stay a Dataset and attach
    through two partitioned hash joins (doc_a then doc_b) — no
    driver-side size table at all. 'auto' (default) censuses the size
    table (one count over the materialized aggregate) and picks
    broadcast at or below ``broadcast_sizes_max`` docs (~16 B each,
    32 MB at the default), join above — the same adaptive-tier
    discipline as interval_join and conversation_minhash_dedup's
    carried_sig_max; both tiers are byte-identical (pinned in
    tests/test_dedup.py).

    A stop-shingle appearing in d docs emits d² pairs, so hashes with
    document frequency > ``max_df`` are DROPPED on both engines (the
    oracle applies the identical cap); Jaccard is exact over the capped
    shingle universe. Capped sizes are attached to pairs at the very end
    by ``pc.index_in`` against the broadcast size table (one row per doc
    with ≥1 kept shingle — at 100 TB broadcast becomes a hash_join on
    doc id, same plan otherwise).

    ``candidates``: optional Dataset of (doc_a, doc_b) pairs; when given,
    output is RESTRICTED to those pairs, and the restriction rides the
    SAME (doc_a, doc_b) bucket merge as the pair partials (a marker row
    per candidate, max-combined) — no extra exchange.
    """
    import ray as _ray

    def explode(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        _, gd, gh = T.shingle_hash_explode(tbl.column(text_col), k)
        return pa.table({
            'h': pa.array(gh.view(np.int64), type=pa.int64()),
            'doc': pa.array(ids[gd], type=pa.int64()),
        })

    index = ds.map_batches(explode, batch_format='pyarrow',
                           zero_copy_batch=True)

    _EMPTY = pa.table({'doc_a': pa.array([], pa.int64()),
                       'doc_b': pa.array([], pa.int64()),
                       'common': pa.array([], pa.int64())})

    def bucket_fn(tbl: pa.Table) -> pa.Table:
        """Per hash-bucket (equal h co-located): df-cap, per-doc size
        partials (doc_b = NULL rows) and pair partials — one pass."""
        if tbl.num_rows == 0:
            return _EMPTY
        df = tbl.to_pandas()
        if max_df is not None:
            df = df[df.groupby('h')['doc'].transform('size') <= max_df]
        if len(df) == 0:
            return _EMPTY
        sizes = df.groupby('doc', sort=False).size()
        m = df.merge(df, on='h', suffixes=('_a', '_b'))
        m = m[m['doc_a'] < m['doc_b']]
        g = m.groupby(['doc_a', 'doc_b'], sort=False)\
            .size().rename('common').reset_index()
        return pa.table({
            'doc_a': pa.array(np.concatenate([
                sizes.index.to_numpy(dtype=np.int64),
                g['doc_a'].to_numpy(dtype=np.int64)])),
            'doc_b': pa.array(np.concatenate([
                np.full(len(sizes), -1, dtype=np.int64),
                g['doc_b'].to_numpy(dtype=np.int64)])).cast(pa.int64()),
            'common': pa.array(np.concatenate([
                sizes.to_numpy(dtype=np.int64),
                g['common'].to_numpy(dtype=np.int64)])),
        })

    from .conversations import bucket_exchange
    # ONE exchange of the 16-byte (h, doc) index carries the df census,
    # the capped sizes and the pair partials; its output is tiny
    # (partials only), so materializing for the two consumers is cheap
    partial = bucket_exchange(index, 'h', bucket_fn, num_buckets)\
        .materialize()

    # doc_b = -1 tags size partials (doc ids are non-negative)
    def _side(want_sizes: bool):
        def f(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or 'doc_b' not in tbl.column_names:
                return _EMPTY
            mask = pc.equal(tbl.column('doc_b'), -1)
            return tbl.filter(mask if want_sizes else pc.invert(mask))
        return f

    if sizes_mode not in ('auto', 'broadcast', 'join'):
        raise ValueError(
            f'ngram_jaccard_pairs: unknown sizes_mode {sizes_mode!r}')
    sizes_ds = bucket_aggregate(
        partial.map_batches(_side(True), batch_format='pyarrow'),
        ['doc_a'], {'sz': ('common', 'sum')},
        num_buckets=num_buckets)
    if sizes_mode == 'auto':
        # census off the materialized aggregate (count is then free and
        # the chosen tier reuses the same blocks — no double execution)
        sizes_ds = sizes_ds.materialize()
        sizes_mode = ('broadcast'
                      if sizes_ds.count() <= broadcast_sizes_max
                      else 'join')
    sz_ref = None
    if sizes_mode == 'broadcast':
        sizes = sizes_ds.to_pandas()
        if len(sizes) == 0 or 'doc_a' not in sizes.columns:
            import ray.data as _rd
            return _rd.from_arrow(pa.table(
                {'doc_a': pa.array([], pa.int64()),
                 'doc_b': pa.array([], pa.int64()),
                 metric: pa.array([], pa.float64())}))
        size_keys = pa.array(sizes['doc_a'].to_numpy(dtype=np.int64))
        size_vals = sizes['sz'].to_numpy(dtype=np.float64)
        sz_ref = _ray.put((size_keys, size_vals))

    pair_partials = partial.map_batches(_side(False),
                                        batch_format='pyarrow')
    if candidates is None:
        merged = bucket_aggregate(pair_partials, ['doc_a', 'doc_b'],
                                  {'common': ('common', 'sum')},
                                  num_buckets=num_buckets)
    else:
        # candidate marker rows (common=0, is_cand=1) ride the same
        # (doc_a, doc_b) bucket merge; real partials carry is_cand=0
        def mark(is_cand: int):
            def f(tbl: pa.Table) -> pa.Table:
                if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
                    return pa.table(
                        {'doc_a': pa.array([], pa.int64()),
                         'doc_b': pa.array([], pa.int64()),
                         'common': pa.array([], pa.int64()),
                         'is_cand': pa.array([], pa.int8())})
                common = (tbl.column('common') if not is_cand
                          else pa.array(np.zeros(tbl.num_rows, np.int64)))
                return pa.table({
                    'doc_a': tbl.column('doc_a').combine_chunks()
                    .cast(pa.int64()),
                    'doc_b': tbl.column('doc_b').combine_chunks()
                    .cast(pa.int64()),
                    'common': common,
                    'is_cand': pa.array(np.full(tbl.num_rows, is_cand,
                                                dtype=np.int8))})
            return f

        both = pair_partials.map_batches(mark(0), batch_format='pyarrow')\
            .union(candidates.map_batches(mark(1),
                                          batch_format='pyarrow'))
        merged = bucket_aggregate(both, ['doc_a', 'doc_b'],
                                  {'common': ('common', 'sum'),
                                   'is_cand': ('is_cand', 'max')},
                                  num_buckets=num_buckets)

    _EMPTY_J = pa.table({'doc_a': pa.array([], pa.int64()),
                         'doc_b': pa.array([], pa.int64()),
                         metric: pa.array([], pa.float64())})

    def _restrict(tbl: pa.Table):
        """Candidate filter shared by both size modes; None if drained."""
        if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
            return None
        if candidates is not None:
            # keep only marked candidate pairs with real shingle overlap
            tbl = tbl.filter(pc.and_(
                pc.greater(pc.cast(tbl.column('is_cand'), pa.int64()), 0),
                pc.greater(pc.cast(tbl.column('common'), pa.int64()), 0)))
            if tbl.num_rows == 0:
                return None
        return tbl

    def _finish(tbl: pa.Table, sz_a, sz_b) -> pa.Table:
        common = tbl.column('common').to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        if metric == 'containment':
            j = np.round(common / np.minimum(sz_a, sz_b), 6)
        else:
            j = np.round(common / (sz_a + sz_b - common), 6)
        out = pa.table({'doc_a': tbl.column('doc_a'),
                        'doc_b': tbl.column('doc_b'),
                        metric: pa.array(j, type=pa.float64())})
        return out.filter(pc.greater_equal(out.column(metric),
                                           threshold))

    if sizes_mode == 'broadcast':
        def jaccard(tbl: pa.Table) -> pa.Table:
            tbl = _restrict(tbl)
            if tbl is None:
                return _EMPTY_J
            keys, vals = _ray.get(sz_ref)
            sz_a = vals[pc.index_in(tbl.column('doc_a'), value_set=keys)
                        .to_numpy(zero_copy_only=False)]
            sz_b = vals[pc.index_in(tbl.column('doc_b'), value_set=keys)
                        .to_numpy(zero_copy_only=False)]
            return _finish(tbl, sz_a, sz_b)

        return merged.map_batches(jaccard, batch_format='pyarrow')

    # sizes_mode == 'join': sizes stay a Dataset; attach via two
    # partitioned hash joins (explicit schemas — all inputs are derived)
    from .joins import hash_join

    def ren(a_name, sz_name):
        def f(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
                return pa.table({a_name: pa.array([], pa.int64()),
                                 sz_name: pa.array([], pa.int64())})
            return pa.table({
                a_name: tbl.column('doc_a').combine_chunks()
                .cast(pa.int64()),
                sz_name: pc.cast(tbl.column('sz'), pa.int64())})
        return f

    mcols = [('doc_a', pa.int64()), ('doc_b', pa.int64()),
             ('common', pa.int64())]
    if candidates is not None:
        mcols.append(('is_cand', pa.int8()))

    def coerce_m(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
            return pa.table({n: pa.array([], t) for n, t in mcols})
        return pa.table({n: tbl.column(n).combine_chunks().cast(t)
                         for n, t in mcols})

    merged = merged.map_batches(coerce_m, batch_format='pyarrow')
    j1 = hash_join(
        merged, sizes_ds.map_batches(ren('doc_a', 'sz_a'),
                                     batch_format='pyarrow'),
        on='doc_a', num_buckets=num_buckets,
        left_schema=pa.schema(mcols),
        right_schema=pa.schema([('doc_a', pa.int64()),
                                ('sz_a', pa.int64())]))
    j2 = hash_join(
        j1, sizes_ds.map_batches(ren('doc_b', 'sz_b'),
                                 batch_format='pyarrow'),
        on='doc_b', num_buckets=num_buckets,
        left_schema=pa.schema(mcols + [('sz_a', pa.int64())]),
        right_schema=pa.schema([('doc_b', pa.int64()),
                                ('sz_b', pa.int64())]))

    def jaccard_joined(tbl: pa.Table) -> pa.Table:
        tbl = _restrict(tbl)
        if tbl is None:
            return _EMPTY_J
        sz_a = pc.cast(tbl.column('sz_a'), pa.float64())\
            .to_numpy(zero_copy_only=False)
        sz_b = pc.cast(tbl.column('sz_b'), pa.float64())\
            .to_numpy(zero_copy_only=False)
        return _finish(tbl, sz_a, sz_b)

    return j2.map_batches(jaccard_joined, batch_format='pyarrow')


def candidate_pair_jaccard(docs, cand, text_col='text', id_col='doc_id',
                           k=3, threshold=0.5, num_buckets=32,
                           sizes_mode: str = 'auto',
                           broadcast_sizes_max: int = 2_000_000,
                           hash_mode: str = 'pandas'):
    """EXACT word-k-gram Jaccard for an explicit candidate-pair Dataset
    — the verify stage of LSH dedup. Output semantics are identical to
    ``ngram_jaccard_pairs(..., max_df=None, candidates=cand)`` (uncapped
    sizes, jaccard rounded to 6 dp, >= threshold, zero-overlap pairs
    dropped), but the cost scales with the PAIR list instead of with
    per-shingle document frequency: each pair pulls its two docs'
    distinct shingle hashes through one doc-keyed hash_join and counts
    the overlap in one (a, b) bucket exchange. The all-pairs path
    explodes d^2 rows for a shingle shared by d docs — boilerplate text
    makes d ~ the whole candidate set (measured 67.8s vs 4s on a 100k-doc
    Zipf corpus with 10.9k candidate docs); here a boilerplate shingle
    costs one row per pair endpoint that actually carries it.

    ``docs`` should already be restricted to docs appearing in ``cand``
    (minhash_dedup's semi-join does this); extra docs only add join
    build rows. Doc ids must be int64 (minhash_dedup's contract).

    ``hash_mode='duckdb'`` uses the SQL-transcribable shingle hash AND
    switches the threshold decision to the EXACT rational compare
    common * 1e7 >= (round(threshold*1e6)*10 - 5) * union — equivalent
    to round6(jaccard) >= threshold without the float pipeline whose
    last-ulp order dependence the fixed-point discipline exists to
    avoid (CLAUDE.md row-picking rule)."""
    thr6x10 = int(round(threshold * 1e6)) * 10 - 5

    def explode(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        _, gd, gh = T.shingle_hash_explode(tbl.column(text_col), k,
                                           hash_mode=hash_mode)
        return pa.table({
            'doc': pa.array(ids[gd].astype(np.int64), type=pa.int64()),
            'h': pa.array(gh.view(np.int64), type=pa.int64())})

    shing = docs.map_batches(explode, batch_format='pyarrow',
                             zero_copy_batch=True)

    def sides(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
            return pa.table({'doc': pa.array([], pa.int64()),
                             'a': pa.array([], pa.int64()),
                             'b': pa.array([], pa.int64())})
        # per-batch pair dedup: a repeated candidate row would join its
        # docs' shingles twice and inflate `common` (cross-batch dups
        # would still double-count — minhash_candidates emits globally
        # distinct pairs by construction; this guards sloppier callers)
        an = tbl.column('doc_a').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        bn = tbl.column('doc_b').to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        order = np.lexsort((bn, an))
        an, bn = an[order], bn[order]
        keep = np.ones(len(an), dtype=bool)
        keep[1:] = (an[1:] != an[:-1]) | (bn[1:] != bn[:-1])
        a = pa.array(an[keep], pa.int64())
        b = pa.array(bn[keep], pa.int64())
        return pa.table({'doc': pa.concat_arrays([a, b]),
                         'a': pa.concat_arrays([a, a]),
                         'b': pa.concat_arrays([b, b])})

    sd = cand.map_batches(sides, batch_format='pyarrow')

    from .joins import hash_join
    joined = hash_join(
        sd, shing, on='doc', num_buckets=num_buckets,
        left_schema=pa.schema([('doc', pa.int64()), ('a', pa.int64()),
                               ('b', pa.int64())]),
        right_schema=pa.schema([('doc', pa.int64()),
                                ('h', pa.int64())]))

    # per-doc DISTINCT shingle counts: exact from one map pass (explode
    # is per-doc distinct already). sizes_mode mirrors
    # ngram_jaccard_pairs: 'broadcast' pulls the (doc, sz) table to the
    # driver (16 B/doc — fine to ~2M candidate docs), 'join' keeps it a
    # Dataset and attaches through two partitioned hash joins (the
    # 10^12-doc path), 'auto' (default) censuses and picks.
    import ray as _ray

    def szs(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        lengths, _, _ = T.shingle_hash_explode(tbl.column(text_col), k,
                                               hash_mode=hash_mode)
        nz = lengths > 0
        return pa.table({
            'doc': pa.array(ids[nz].astype(np.int64), type=pa.int64()),
            'sz': pa.array(lengths[nz], type=pa.int64())})

    if sizes_mode not in ('auto', 'broadcast', 'join'):
        raise ValueError(
            f'candidate_pair_jaccard: unknown sizes_mode {sizes_mode!r}')
    sizes_ds = docs.map_batches(szs, batch_format='pyarrow',
                                zero_copy_batch=True)
    if sizes_mode == 'auto':
        sizes_ds = sizes_ds.materialize()
        sizes_mode = ('broadcast'
                      if sizes_ds.count() <= broadcast_sizes_max
                      else 'join')
    _EMPTY_J = pa.table({'doc_a': pa.array([], pa.int64()),
                         'doc_b': pa.array([], pa.int64()),
                         'jaccard': pa.array([], pa.float64())})
    _EMPTY_C = pa.table({'doc_a': pa.array([], pa.int64()),
                         'doc_b': pa.array([], pa.int64()),
                         'common': pa.array([], pa.int64())})
    sz_ref = None
    if sizes_mode == 'broadcast':
        sizes = sizes_ds.to_pandas()
        if len(sizes) == 0 or 'doc' not in sizes.columns:
            import ray.data as _rd
            return _rd.from_arrow(_EMPTY_J)
        sz_ref = _ray.put(
            (pa.array(sizes['doc'].to_numpy(dtype=np.int64)),
             sizes['sz'].to_numpy(dtype=np.float64)))

    def verify(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'a' not in tbl.column_names:
            return _EMPTY_J if sz_ref is not None else _EMPTY_C
        a = tbl.column('a').combine_chunks().to_numpy(
            zero_copy_only=False)
        b = tbl.column('b').combine_chunks().to_numpy(
            zero_copy_only=False)
        h = tbl.column('h').combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((h, b, a))
        a, b, h = a[order], b[order], h[order]
        # a shingle appears at most once per doc, so within a pair each
        # h occurs 1 or 2 times — a duplicate marks a common shingle
        dup = np.zeros(len(a), dtype=bool)
        dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (h[1:] == h[:-1])
        new_pair = np.ones(len(a), dtype=bool)
        new_pair[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        pid = np.cumsum(new_pair) - 1
        common = np.bincount(pid[dup],
                             minlength=int(pid[-1]) + 1 if len(pid) else 0)
        firsts = np.nonzero(new_pair)[0]
        pa_, pb = a[firsts], b[firsts]
        keep = common > 0
        pa_, pb, common = pa_[keep], pb[keep], common[keep]
        if len(pa_) == 0:
            return _EMPTY_J if sz_ref is not None else _EMPTY_C
        if sz_ref is None:
            return pa.table({
                'doc_a': pa.array(pa_, pa.int64()),
                'doc_b': pa.array(pb, pa.int64()),
                'common': pa.array(common.astype(np.int64), pa.int64())})
        keys, vals = _ray.get(sz_ref)
        sz_a = vals[pc.index_in(pa.array(pa_, pa.int64()),
                                value_set=keys)
                    .to_numpy(zero_copy_only=False)]
        sz_b = vals[pc.index_in(pa.array(pb, pa.int64()),
                                value_set=keys)
                    .to_numpy(zero_copy_only=False)]
        union = sz_a + sz_b - common
        j = np.round(common / union, 6)
        out = pa.table({'doc_a': pa.array(pa_, pa.int64()),
                        'doc_b': pa.array(pb, pa.int64()),
                        'jaccard': pa.array(j, pa.float64())})
        if hash_mode == 'duckdb':
            keep = common.astype(np.int64) * 10_000_000 \
                >= thr6x10 * union.astype(np.int64)
            return out.filter(pa.array(keep))
        return out.filter(pc.greater_equal(out.column('jaccard'),
                                           threshold))

    from .conversations import bucket_exchange
    counted = bucket_exchange(joined, ['a', 'b'], verify, num_buckets)
    if sz_ref is not None:
        return counted

    # sizes_mode == 'join': attach sizes through two partitioned hash
    # joins — no driver-side table; byte-identical to broadcast
    from .joins import hash_join

    def ren(side: str):
        def f(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0 or 'doc' not in tbl.column_names:
                return pa.table({f'doc_{side}': pa.array([], pa.int64()),
                                 f'sz_{side}': pa.array([], pa.int64())})
            return pa.table({
                f'doc_{side}': tbl.column('doc').combine_chunks()
                .cast(pa.int64()),
                f'sz_{side}': tbl.column('sz').combine_chunks()
                .cast(pa.int64())})
        return f

    j1 = hash_join(
        counted, sizes_ds.map_batches(ren('a'), batch_format='pyarrow'),
        on='doc_a', num_buckets=num_buckets,
        left_schema=pa.schema([('doc_a', pa.int64()),
                               ('doc_b', pa.int64()),
                               ('common', pa.int64())]),
        right_schema=pa.schema([('doc_a', pa.int64()),
                                ('sz_a', pa.int64())]))
    j2 = hash_join(
        j1, sizes_ds.map_batches(ren('b'), batch_format='pyarrow'),
        on='doc_b', num_buckets=num_buckets,
        left_schema=pa.schema([('doc_a', pa.int64()),
                               ('doc_b', pa.int64()),
                               ('common', pa.int64()),
                               ('sz_a', pa.int64())]),
        right_schema=pa.schema([('doc_b', pa.int64()),
                                ('sz_b', pa.int64())]))

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
            return _EMPTY_J
        common = pc.cast(tbl.column('common'), pa.float64())\
            .to_numpy(zero_copy_only=False)
        sz_a = pc.cast(tbl.column('sz_a'), pa.float64())\
            .to_numpy(zero_copy_only=False)
        sz_b = pc.cast(tbl.column('sz_b'), pa.float64())\
            .to_numpy(zero_copy_only=False)
        union = sz_a + sz_b - common
        j = np.round(common / union, 6)
        out = pa.table({'doc_a': tbl.column('doc_a'),
                        'doc_b': tbl.column('doc_b'),
                        'jaccard': pa.array(j, pa.float64())})
        if hash_mode == 'duckdb':
            keep = common.astype(np.int64) * 10_000_000 \
                >= thr6x10 * union.astype(np.int64)
            return out.filter(pa.array(keep))
        return out.filter(pc.greater_equal(out.column('jaccard'),
                                           threshold))

    return j2.map_batches(finish, batch_format='pyarrow')


def minhash_signature_ds(ds, text_col='text', id_col='doc_id',
                         num_perm=128, num_bands=32, shingle_k=3,
                         seed=1234, hash_mode: str = 'pandas'):
    """(id, band_id, band_hash) rows — the LSH index. One vectorized pass
    (shingle_hash_explode, no Python loops); emits num_bands rows per doc.
    Docs with zero shingles (< shingle_k words) are EXCLUDED — their empty
    signatures are all identical and would pair every short doc with every
    other (the SQL-oracle-parity choice: sub-k docs never near-dup)."""
    def sig(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        lengths, _, gh = T.shingle_hash_explode(tbl.column(text_col),
                                                shingle_k,
                                                hash_mode=hash_mode)
        mh_mode = 'duckdb' if hash_mode == 'duckdb' else 'affine'
        bh_mode = 'duckdb' if hash_mode == 'duckdb' else 'fnv'
        s = T.minhash_matrix(lengths, gh, num_perm, seed,
                             hash_mode=mh_mode)
        bh = T.band_hashes(s, num_bands, hash_mode=bh_mode)
        keep = lengths > 0
        ids, bh = ids[keep], bh[keep]
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_bands)),
            'band_id': pa.array(np.tile(np.arange(num_bands, dtype=np.int32),
                                        n), type=pa.int32()),
            'band_hash': pa.array(bh.reshape(-1).view(np.int64),
                                  type=pa.int64()),
        })

    return ds.map_batches(sig, batch_format='pyarrow', zero_copy_batch=True)


def minhash_candidates(ds, text_col='text', id_col='doc_id', num_perm=128,
                       num_bands=32, shingle_k=3, seed=1234,
                       num_buckets=32, hash_mode: str = 'pandas'):
    """Candidate near-dup pairs from MinHash-LSH banding: docs sharing any
    (band_id, band_hash) bucket. One exchange of the tiny LSH index."""
    index = minhash_signature_ds(ds, text_col, id_col, num_perm, num_bands,
                                 shingle_k, seed, hash_mode=hash_mode)

    def pairs(tbl: pa.Table) -> pa.Table:
        # explicit schema (CLAUDE.md from_pandas rule): inference would
        # emit whatever pandas guesses per bucket — non-int64 doc ids or
        # an empty bucket would then disagree with sibling blocks
        id_t = (tbl.schema.field(id_col).type
                if id_col in tbl.schema.names else pa.int64())
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t)])
        df = tbl.to_pandas()
        m = df.merge(df, on=['band_id', 'band_hash'], suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        out = m[[f'{id_col}_a', f'{id_col}_b']].drop_duplicates()
        out.columns = ['doc_a', 'doc_b']
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=out_schema)

    from .conversations import bucket_exchange
    cand = bucket_exchange(index, 'band_hash', pairs, num_buckets)
    # distinct pairs across partitions (a pair can match in several bands
    # that hash to different partitions)
    return bucket_aggregate(cand, ['doc_a', 'doc_b'],
                            {'n_bands': ('doc_a', 'count')},
                            num_buckets=num_buckets)


def minhash_dedup(ds, text_col='text', id_col='doc_id', threshold=0.7,
                  num_perm=128, num_bands=32, shingle_k=3, seed=1234,
                  num_buckets=32, ids_mode: str = 'broadcast',
                  hash_mode: str = 'pandas'):
    """MinHash-LSH near-dup clusters: LSH candidates → DISTRIBUTED exact
    Jaccard verify, restricted to the candidate pairs inside the
    verify's own (doc_a, doc_b) bucket merge (hashed-shingle
    ngram_jaccard_pairs with candidates= over the candidate docs only) →
    distributed connected components → Dataset of (id, cluster_id).

    Candidate pairs and verified edges live ONLY in Datasets end-to-end —
    the driver never holds a pair list, so a hot near-dup cluster (m docs
    → m² candidate pairs) cannot exhaust driver memory. The one
    broadcast object is the distinct candidate DOC-ID array used to
    pre-filter the corpus (bounded by corpus doc count at 8 bytes/id —
    the standard broadcast-small-side pattern). ``ids_mode='bloom'`` is
    the 10^12-doc path: the pre-filter becomes a distributed Bloom
    filter whose false positives only admit extra docs into the verify,
    where the candidate-pair restriction drops them — the OUTPUT is
    identical in both modes (tested).
    """
    import ray.data as rd

    from .graph import connected_components
    from .joins import semi_join, semi_join_bloom

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      'cluster_id': pa.array([], pa.int64())})
    cand = minhash_candidates(ds, text_col, id_col, num_perm, num_bands,
                              shingle_k, seed, num_buckets=num_buckets,
                              hash_mode=hash_mode).materialize()
    if cand.count() == 0:
        return rd.from_arrow(empty)

    # pre-filter the corpus to candidate docs (ids, never pairs)
    ids_of_pairs = cand.map_batches(
        lambda t: pa.table({id_col: pa.concat_arrays([
            t.column('doc_a').combine_chunks(),
            t.column('doc_b').combine_chunks()])}),
        batch_format='pyarrow', zero_copy_batch=True)
    if ids_mode == 'bloom':
        docs_c = semi_join_bloom(ds, ids_of_pairs, id_col)
    else:
        docs_c = semi_join(ds, ids_of_pairs, id_col)
    # the pair-driven verify consumes docs_c twice (shingles + size
    # table); materialize the candidate-bounded subset once
    docs_c = docs_c.materialize()

    # exact jaccard restricted to the LSH candidate pairs, PAIR-driven:
    # cost scales with the pair list, not with per-shingle df — an
    # all-pairs verify explodes d^2 rows per boilerplate shingle shared
    # by d candidate docs (measured 67.8s vs 4s at 100k Zipf docs);
    # still a Dataset of (doc_a, doc_b, jaccard), identical output to
    # ngram_jaccard_pairs(max_df=None, candidates=cand)
    exact = candidate_pair_jaccard(docs_c, cand, text_col, id_col,
                                   k=shingle_k, threshold=threshold,
                                   num_buckets=num_buckets,
                                   hash_mode=hash_mode)

    def as_edges(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or 'doc_a' not in tbl.column_names:
            return pa.table({'src': pa.array([], pa.int64()),
                             'dst': pa.array([], pa.int64())})
        return pa.table({'src': tbl.column('doc_a'),
                         'dst': tbl.column('doc_b')})

    # coalesce the (small) edge set to a few blocks before the iterative
    # clustering: connected_components pays per-BLOCK task overhead every
    # round, and the verify exchange leaves ~num_buckets mostly-empty
    # blocks (measured 6x slower CC on this VM when skipped)
    edges = exact.map_batches(as_edges, batch_format='pyarrow')\
        .repartition(8).materialize()
    if edges.count() == 0:
        return rd.from_arrow(empty)

    # DISTRIBUTED clustering: min-label propagation keeps the component
    # state in a Dataset (stages/graph.py) — no driver union-find; the
    # labeling (component = min member id) is identical to a min-root
    # union-find, so outputs are unchanged
    cc = connected_components(edges, num_buckets=8)
    return cc.map_batches(
        lambda t: pa.table({id_col: t.column('node'),
                            'cluster_id': t.column('component')}),
        batch_format='pyarrow').sort(id_col)


def simhash_candidates(ds, text_col='text', id_col='doc_id',
                       max_hamming=3, num_chunks=4, num_buckets=32,
                       max_bucket: int = 256, hash_mode: str = 'pandas'):
    """SimHash near-dup: 64-bit signatures, banded into ``num_chunks``
    16-bit chunks (pigeonhole: any pair within hamming distance
    ``num_chunks - 1`` shares a chunk); chunk-bucket exchange, verify
    hamming distance per bucket. Returns (doc_a, doc_b, hamming).

    ``hash_mode='duckdb'`` hashes tokens with the DuckDB-parity
    MurmurHash64A kernel (stages/sketches.duckdb_hash_str64), which
    makes the whole operator a deterministic function DuckDB recomputes
    in SQL (per-bit ±1 vote sums, sig = sum of winning-bit powers,
    bit_count(xor) verify) — the q_simhash_candidates_docs oracle."""
    def sig(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        text = tbl.column(text_col).combine_chunks()
        # token-level, NON-distinct: SimHash signatures are term-
        # frequency weighted (a doc dominated by one repeated token must
        # vote that token's bits once per occurrence)
        if hash_mode == 'duckdb':
            from .sketches import duckdb_hash_str64
            words = pc.split_pattern(pc.fill_null(text, ''), ' ')
            lengths = pc.list_value_length(words)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            hashes = duckdb_hash_str64(words.flatten())
        else:
            lengths, _, hashes = T.shingle_hash_explode(text, 1,
                                                        distinct=False)
        s = T.simhash64(lengths, hashes)
        # empty texts carry no tokens: drop them from the index (their
        # all-zero signatures would otherwise pair with each other)
        nonempty = np.asarray(pc.greater(
            pc.utf8_length(pc.fill_null(text, '')), 0)
            .to_numpy(zero_copy_only=False), dtype=bool)
        ids, s = ids[nonempty], s[nonempty]
        n = len(ids)
        bits = 64 // num_chunks
        chunks = np.empty((n, num_chunks), dtype=np.uint64)
        for c in range(num_chunks):
            chunks[:, c] = (s >> np.uint64(c * bits)) \
                & np.uint64((1 << bits) - 1)
        chunks_i64 = chunks.view(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_chunks)),
            'sim': pa.array(np.repeat(s, num_chunks).view(np.int64),
                            type=pa.int64()),
            'chunk_id': pa.array(np.tile(np.arange(num_chunks,
                                                   dtype=np.int32), n)),
            'chunk_val': pa.array(chunks_i64.reshape(-1), type=pa.int64()),
        })

    index = ds.map_batches(sig, batch_format='pyarrow', zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        # explicit schema (CLAUDE.md from_pandas rule): the empty path
        # and the populated path must emit the SAME types for any id
        # dtype, or blocks disagree nondeterministically with packing
        id_t = (tbl.schema.field(id_col).type
                if id_col in tbl.schema.names else pa.int64())
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                                ('hamming', pa.int64())])
        df = tbl.to_pandas()
        # a chunk value shared by > max_bucket docs is non-discriminative
        # (stop-pattern); drop it — near-dups still match on their other
        # chunks with high probability (documented recall trade)
        sizes = df.groupby(['chunk_id', 'chunk_val'])['sim']\
            .transform('size')
        df = df[sizes <= max_bucket]
        m = df.merge(df, on=['chunk_id', 'chunk_val'], suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        if len(m) == 0:
            return out_schema.empty_table()
        hd = T.hamming_distance(
            m['sim_a'].to_numpy(dtype=np.int64).view(np.uint64),
            m['sim_b'].to_numpy(dtype=np.int64).view(np.uint64))
        m = m.assign(hamming=hd)
        m = m[m['hamming'] <= max_hamming]
        out = m[[f'{id_col}_a', f'{id_col}_b', 'hamming']]\
            .drop_duplicates([f'{id_col}_a', f'{id_col}_b'])
        out.columns = ['doc_a', 'doc_b', 'hamming']
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=out_schema)

    from .conversations import bucket_exchange
    cand = bucket_exchange(index, 'chunk_val', pairs, num_buckets)
    return bucket_aggregate(cand, ['doc_a', 'doc_b'],
                            {'hamming': ('hamming', 'min')},
                            num_buckets=num_buckets)


def embedding_near_dup(ds, emb_col='embedding', id_col='vec_id',
                       threshold=0.95, num_planes=8, seed=7,
                       num_buckets=32, hash_mode: str = 'gaussian'):
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by the
    sign pattern of ``num_planes`` random projections (broadcast plane
    matrix), then exact pairwise cosine inside each bucket (numpy matmul).
    Neighbors in adjacent buckets are missed at probability falling with
    cosine similarity — the standard LSH trade; raise num_planes for
    precision, lower for recall. Returns (id_a, id_b, cos_sim).

    ``hash_mode='duckdb'`` makes the whole operator a deterministic
    function DuckDB recomputes in SQL: the hyperplanes become Rademacher
    (±1) vectors derived from the DuckDB-parity integer murmur hash
    (sign LSH keeps its cosine guarantee under ±1 projections — the
    public sign-random-projection family), the projection sign is an
    EXACT int64 dot over micro-quantized components (floor(x*1e6+0.5) —
    a float dot's near-zero sign could flip between numpy's blocked sum
    and DuckDB's sequential sum), and the verify follows the
    q_cosine_pairs fixed-point row-pick discipline (sim6 =
    floor(cos*1e6+0.5), compare and emit in micro-units)."""
    import pyarrow.parquet  # noqa: F401

    _PAIRS_EMPTY = pa.table({'id_a': pa.array([], pa.int64()),
                             'id_b': pa.array([], pa.int64()),
                             'cos_sim': pa.array([], pa.float64())})
    from .ann import drop_null_vectors
    try:
        first = drop_null_vectors(
            ds.take_batch(64, batch_format='pyarrow'), emb_col)
    except ValueError:        # empty corpus: no pairs
        import ray.data as rd
        return rd.from_arrow(_PAIRS_EMPTY)
    if first.num_rows == 0:   # nothing but NULL vectors in the probe
        import ray.data as rd
        return rd.from_arrow(_PAIRS_EMPTY)
    dim = len(first[emb_col][0].as_py())
    if hash_mode == 'duckdb':
        from .sketches import _murmur64_u64
        bits = _murmur64_u64(
            np.arange(dim * num_planes, dtype=np.uint64)) & np.uint64(1)
        planes = (bits.astype(np.int64) * 2 - 1)\
            .reshape(dim, num_planes)
    elif hash_mode == 'gaussian':
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, num_planes))
    else:
        raise ValueError(f'unknown hash_mode: {hash_mode!r}')

    def bucketize(tbl: pa.Table) -> pa.Table:
        tbl = drop_null_vectors(tbl, emb_col)
        la = tbl.column(emb_col).combine_chunks()
        if len(la) == 0:
            return tbl.append_column('bucket',
                                     pa.array([], pa.int64()))\
                      .append_column('norm', pa.array([], pa.float64()))
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        if hash_mode == 'duckdb':
            e6 = np.floor(mat * 1e6 + 0.5).astype(np.int64)
            signs = (e6 @ planes) > 0
        else:
            signs = (mat @ planes) > 0
        bucket = np.zeros(len(la), dtype=np.int64)
        for p in range(num_planes):
            bucket |= signs[:, p].astype(np.int64) << np.int64(p)
        norms = np.linalg.norm(mat, axis=1)
        return tbl.append_column('bucket', pa.array(bucket, pa.int64()))\
                  .append_column('norm', pa.array(norms))

    bucketed = ds.map_batches(bucketize, batch_format='pyarrow',
                              zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        df_ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        buckets = tbl.column('bucket').to_numpy(zero_copy_only=False)
        la = tbl.column(emb_col).combine_chunks()
        if len(la) == 0:
            return pa.table({'id_a': pa.array([], pa.int64()),
                             'id_b': pa.array([], pa.int64()),
                             'cos_sim': pa.array([], pa.float64())})
        mat = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(len(la), -1)
        norms = tbl.column('norm').to_numpy(zero_copy_only=False)
        order = np.argsort(buckets, kind='stable')
        sb = buckets[order]
        starts = np.nonzero(np.diff(sb, prepend=sb[0] - 1))[0]
        ends = np.append(starts[1:], len(sb))
        for lo, hi in zip(starts, ends):
            idx = order[lo:hi]
            if len(idx) < 2:
                continue
            sub = mat[idx]
            nrm = norms[idx]
            sims = (sub @ sub.T) / np.outer(nrm, nrm)
            ia, ib = np.triu_indices(len(idx), k=1)
            if hash_mode == 'duckdb':
                # fixed-point row-pick (CLAUDE.md): compare AND emit
                # in micro-units so the cut matches list_cosine_similarity
                sim6 = np.floor(sims[ia, ib] * 1e6 + 0.5)\
                    .astype(np.int64)
                hit = sim6 >= int(round(threshold * 1e6))
                out_c.append(sim6[hit].astype(np.float64) / 1e6)
            else:
                hit = sims[ia, ib] >= threshold
                out_c.append(np.round(sims[ia[hit], ib[hit]], 6))
            out_a.append(df_ids[idx[ia[hit]]])
            out_b.append(df_ids[idx[ib[hit]]])
        if not out_a:
            return pa.table({'id_a': pa.array([], pa.int64()),
                             'id_b': pa.array([], pa.int64()),
                             'cos_sim': pa.array([], pa.float64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        c = np.concatenate(out_c)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({'id_a': pa.array(a2), 'id_b': pa.array(b2),
                         'cos_sim': pa.array(c)})

    from .conversations import bucket_exchange
    return bucket_exchange(bucketed, 'bucket', pairs, num_buckets)


def _editdist_by_code(ca: np.ndarray, cb: np.ndarray, uniq,
                      max_dist: int,
                      kernel: str = 'levenshtein') -> np.ndarray:
    """Distances for pair rows given factorized prefix codes — the DP
    cost model for editdist_pairs.

    Two result-preserving reductions before the O(len * band) DP:
    unordered (code_a, code_b) dedup (a block of D identical docs is ONE
    DP row, not D^2/2 — the skew-gate shape) and the exact-equal fast
    path. Each prune only drops pairs whose result is already known, so
    the output is byte-identical to running the kernel on every pair.
    (A byte-histogram L1/2 lower-bound screen was measured and REJECTED:
    on same-vocabulary corpora 75% of pairs survive it and the 256-wide
    gathers cost 3x the banded DP they save.)"""
    n = len(ca)
    out = np.full(n, max_dist + 1, dtype=np.int64)
    nu = len(uniq)
    if n == 0 or nu == 0:
        return out
    lo = np.minimum(ca, cb).astype(np.int64)
    hi = np.maximum(ca, cb).astype(np.int64)
    ukey, inv = np.unique(lo * nu + hi, return_inverse=True)
    ua, ub = ukey // nu, ukey % nu
    ue = np.full(len(ukey), max_dist + 1, dtype=np.int64)
    ue[ua == ub] = 0
    enc = [s.encode('utf-8') for s in uniq]
    cand = np.nonzero(ua != ub)[0]
    if cand.size:
        fn = (T.damerau_levenshtein_bytes if kernel == 'damerau'
              else T.levenshtein_bytes)
        ue[cand] = fn(
            [enc[i] for i in ua[cand]], [enc[i] for i in ub[cand]],
            max_dist)
    return ue[inv]


def _lsh_blocked_pairs(mega, pschema, block_cols, id_col, verify_fn,
                       out_col: str, num_buckets: int,
                       num_perm: int = 64, num_bands: int = 32,
                       shingle_k: int = 2, seed: int = 1234):
    """LSH-prefiltered pair path for OVERSIZED equality blocks — the
    editdist_pairs / jw_pairs auto-escalation above ``block_docs_max``.

    Exact blocked pair expansion is O(B²) per block key; past
    ``block_docs_max`` that is no longer computable, so the rows of
    such blocks divert here: MinHash-LSH banding over the comparison
    PREFIX generates candidate pairs (docs sharing any (true block
    key, band_id, band_hash) bucket — the real block columns ride the
    index rows, so hash collisions can never pair docs across blocks),
    and candidates are verified with the SAME kernel as the exact
    path, so every emitted pair is byte-identical to the exact path's
    verdict for it.

    APPROXIMATE BY DESIGN on recall: a qualifying pair whose prefix
    word-``shingle_k``-gram Jaccard falls below the banding threshold
    (~(1/b)^(1/r) with b = num_bands, r = num_perm/num_bands — ≈ 0.18
    at 64 perms / 32 bands) can
    be missed; near-identical prefixes — the regime a near-dup
    operator exists for — band together with probability ~1.  Docs
    whose prefix has < shingle_k words emit no signature and cannot
    pair (the minhash_signature_ds exclusion).  Escalation parity with
    the exact path on a planted dense block is pinned in
    tests/test_editdist.py.

    Shape: one banding exchange of slim (id, block key, band) index
    rows, one distinct-pair aggregate, two partitioned hash joins to
    attach prefixes, one vectorized verify — no stage ever holds B²
    rows, and the candidate volume is governed by true near-dup
    density, not block size.
    """
    from .aggregate import bucket_aggregate
    from .conversations import bucket_exchange
    from .joins import hash_join

    block_cols = list(block_cols)
    # pschema is a (materialized) Ray Data schema — names/types lists
    id_t = dict(zip(pschema.names, pschema.types))[id_col]

    def sig(tbl: pa.Table) -> pa.Table:
        lengths, _, gh = T.shingle_hash_explode(tbl.column('_pfx'),
                                                shingle_k)
        s = T.minhash_matrix(lengths, gh, num_perm, seed)
        bh = T.band_hashes(s, num_bands)
        keep = np.nonzero(lengths > 0)[0]
        base = tbl.take(pa.array(np.repeat(keep, num_bands)))
        cols = {id_col: base.column(id_col)}
        for c in block_cols:
            cols[c] = base.column(c)
        cols['band_id'] = pa.array(
            np.tile(np.arange(num_bands, dtype=np.int32), len(keep)),
            pa.int32())
        cols['band_hash'] = pa.array(
            bh[keep].reshape(-1).view(np.int64), pa.int64())
        return pa.table(cols)

    index = mega.map_batches(sig, batch_format='pyarrow',
                             zero_copy_batch=True)

    def cand_fn(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t)])
        df = tbl.to_pandas()
        if len(df) == 0:
            return out_schema.empty_table()
        m = df.merge(df, on=block_cols + ['band_id', 'band_hash'],
                     suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        out = m[[f'{id_col}_a', f'{id_col}_b']].drop_duplicates()
        out.columns = ['doc_a', 'doc_b']
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=out_schema)

    cand = bucket_exchange(index, 'band_hash', cand_fn, num_buckets)
    # global distinct (a pair can surface in bands landing in different
    # partitions)
    cand = bucket_aggregate(cand, ['doc_a', 'doc_b'],
                            {'_nb': ('doc_a', 'count')},
                            num_buckets=num_buckets)
    cand_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                             ('_nb', pa.int64())])

    def ren(side: str):
        def f(tbl: pa.Table) -> pa.Table:
            return pa.table({f'doc_{side}': tbl.column(id_col),
                             f'_pfx_{side}': tbl.column('_pfx')})
        return f

    pf_a = mega.map_batches(ren('a'), batch_format='pyarrow',
                            zero_copy_batch=True)
    pf_b = mega.map_batches(ren('b'), batch_format='pyarrow',
                            zero_copy_batch=True)
    pfa_schema = pa.schema([('doc_a', id_t), ('_pfx_a', pa.string())])
    pfb_schema = pa.schema([('doc_b', id_t), ('_pfx_b', pa.string())])
    j1 = hash_join(cand, pf_a, on='doc_a', num_buckets=num_buckets,
                   left_schema=cand_schema, right_schema=pfa_schema)
    j1_schema = pa.schema(list(cand_schema) + [pa.field('_pfx_a',
                                                        pa.string())])
    j2 = hash_join(j1, pf_b, on='doc_b', num_buckets=num_buckets,
                   left_schema=j1_schema, right_schema=pfb_schema)

    def verify(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                                (out_col, pa.int64())])
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        a = tbl.column('_pfx_a').to_pandas()
        b = tbl.column('_pfx_b').to_pandas()
        codes, uniq = pd.factorize(pd.concat([a, b], ignore_index=True),
                                   sort=False)
        n = tbl.num_rows
        vals, keep = verify_fn(codes[:n], codes[n:], uniq)
        idx = np.nonzero(keep)[0]
        t2 = tbl.take(pa.array(idx))
        return pa.table({'doc_a': t2.column('doc_a'),
                         'doc_b': t2.column('doc_b'),
                         out_col: pa.array(vals[idx], pa.int64())})

    return j2.map_batches(verify, batch_format='pyarrow')


def editdist_pairs(ds, block_cols, text_col: str = 'text',
                   id_col: str = 'doc_id', prefix_cp: int = 48,
                   max_dist: int = 16, num_buckets: int = 16,
                   kernel: str = 'levenshtein',
                   fanout_block_docs: int | None = 1024,
                   block_docs_max: int = 500_000,
                   on_oversize: str = 'lsh'):
    """Edit-distance near-dup pairs under equality blocking: docs sharing
    ``block_cols`` (e.g. (lang, length band)) are candidates; a pair is
    kept when the byte-level edit distance of the first ``prefix_cp``
    CODEPOINTS is <= ``max_dist``. Returns (doc_a, doc_b, edist),
    doc_a < doc_b. ``kernel``: 'levenshtein' (default) or 'damerau'
    (UNRESTRICTED transposition-aware variant, DuckDB
    damerau_levenshtein semantics — both metrics, so the unordered
    unique-pair dedup below stays result-preserving).

    Oracle parity: the prefix is sliced by codepoints
    (pc.utf8_slice_codeunits == DuckDB substr, verified on multibyte and
    control chars) and the distance is computed over its UTF-8 bytes
    (DuckDB levenshtein is byte-based) — see
    functions/text.py:levenshtein_bytes.

    100-TB shape: ONE hash exchange carrying (id, block key, <=
    prefix_cp*4-byte prefix) rows — never the corpus; per-bucket pandas
    self-merge then ONE vectorized banded-DP call over all pairs in the
    bucket. A block key shared by B docs costs O(B^2) pairs inside one
    task, so choose block_cols to bound B (the length band caps
    natural-language blocks; a 300x-duplicated doc — the skew-gate bound
    — is ~45k pairs, one DP call). Rows with a NULL block key or NULL
    text are excluded (SQL join-on-NULL semantics).

    Dense-block auto-escalation: a cheap map-side-combined census
    detects blocks above ``fanout_block_docs``; their rows divert to a
    CHUNK-PAIR fan-out — docs hash into C = ceil(B / fanout_block_docs)
    chunks, each doc replicates C times keyed on (block, chunk_i,
    chunk_j), and every chunk-pair's expansion runs as its own bucket
    task. This is EXACT (every pair lands in exactly one chunk-pair —
    result-identical to the one-task path, pinned in
    tests/test_editdist.py), unlike a first-token sub-block key, which
    would silently drop cross-token near-dups. The O(B^2) total work is
    inherent to exact semantics; the fan-out removes the single-task
    memory/serialization cliff. Above ``block_docs_max`` a block's
    ~B^2/2 >= 1e11 DP pairs are beyond exact semantics at any fan-out:
    with ``on_oversize='lsh'`` (default) such blocks AUTO-ESCALATE to
    the MinHash-LSH prefilter path (_lsh_blocked_pairs — candidates
    from prefix banding, verified with the SAME kernel; approximate on
    recall only, and only for those blocks — a 100-TB run keeps going
    instead of waiting for a human retry loop), while
    ``on_oversize='raise'`` keeps the loud r4 guard for jobs that must
    be exact end-to-end. ``fanout_block_docs=None`` disables census +
    escalation entirely (one fewer exchange — the pre-r4 plan).
    """
    block_cols = list(block_cols)

    def prep(tbl: pa.Table) -> pa.Table:
        pfx = pc.utf8_slice_codeunits(
            tbl.column(text_col).combine_chunks(), 0, prefix_cp)
        cols = {id_col: tbl.column(id_col), '_pfx': pfx}
        for c in block_cols:
            cols[c] = tbl.column(c)
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format='pyarrow',
                             zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        # explicit schema (CLAUDE.md from_pandas rule): empty and
        # populated buckets must emit identical types for any id dtype
        id_t = (tbl.schema.field(id_col).type
                if id_col in tbl.schema.names else pa.int64())
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                                ('edist', pa.int64())])
        df = tbl.to_pandas()
        if len(df):
            # NULL block keys never join (pandas merge would match
            # NaN == NaN); NULL prefixes have NULL distance in SQL
            df = df.dropna(subset=block_cols + ['_pfx'])
        if len(df) == 0:
            return out_schema.empty_table()
        # factorize prefixes once: the DP runs per UNIQUE prefix pair,
        # not per doc pair — a hot block of D identical docs (the
        # skew-gate 300x doc) collapses its D^2/2 pairs to ONE DP row
        codes, uniq = pd.factorize(df['_pfx'], sort=False)
        # the merge frame carries only (id, prefix code, block key) —
        # self-merging with the object prefix strings attached would
        # copy every string into the O(B^2) pair frame
        df = df[[id_col] + block_cols].assign(_pc=codes)
        m = df.merge(df, on=block_cols, suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        if len(m) == 0:
            return out_schema.empty_table()
        ed = _editdist_by_code(m['_pc_a'].to_numpy(),
                               m['_pc_b'].to_numpy(), uniq, max_dist,
                               kernel)
        keep = ed <= max_dist
        m = m[keep]
        return pa.table({
            'doc_a': pa.array(m[f'{id_col}_a'].to_numpy(), type=id_t),
            'doc_b': pa.array(m[f'{id_col}_b'].to_numpy(), type=id_t),
            'edist': pa.array(ed[keep], type=pa.int64())})

    from .aggregate import bucket_aggregate
    from .conversations import bucket_exchange, key_hash
    # pair expansion is O(B^2) per block key while the INPUT is tiny
    # (id + block key + <=48-cp prefix rows) — a small corpus fits one
    # Ray block and would serialize every bucket into one map_groups
    # task (measured 16x on the sf0.1 documents table, which the
    # small-file read cap packs into a single block). Repartitioning to
    # the bucket width aligns map blocks with the exchange's reduce
    # width; num_buckets is the cluster-scale knob here as everywhere.
    if fanout_block_docs is None:
        return bucket_exchange(prepped.repartition(num_buckets),
                               block_cols, pairs, num_buckets)

    # dense-block census (map-side combined — partial rows only) and
    # the hot-block pull: both tiny, the fan-out decision is exact
    prepped = prepped.materialize()
    census = bucket_aggregate(prepped, block_cols,
                              {'_n': (id_col, 'count')}, num_buckets=8)
    hot_df = census.map_batches(
        lambda t, _f=fanout_block_docs: t.filter(
            pc.greater(t.column('_n'), _f)),
        batch_format='pyarrow', zero_copy_batch=True).to_pandas()
    if len(hot_df):
        hot_df = hot_df.dropna(subset=block_cols)  # NULL keys never pair
    if len(hot_df) == 0:
        return bucket_exchange(prepped.repartition(num_buckets),
                               block_cols, pairs, num_buckets)
    worst = int(hot_df['_n'].max())
    if worst > block_docs_max and on_oversize != 'lsh':
        raise ValueError(
            f'editdist_pairs: a block key is shared by {worst} docs '
            f'(> block_docs_max={block_docs_max}) — ~{worst * worst // 2:.0e}'
            ' candidate pairs is beyond exact blocked edit distance; add '
            'a discriminating block column or prefilter candidates with '
            'minhash_lsh_pairs, raise block_docs_max explicitly, or use '
            "on_oversize='lsh' for the automatic LSH-prefilter escalation")

    pschema = prepped.schema()          # materialized — no execution
    ptypes = dict(zip(pschema.names, pschema.types))
    mega_df = hot_df[hot_df['_n'] > block_docs_max]
    fan_df = hot_df[hot_df['_n'] <= block_docs_max]

    def _keyset(df) -> np.ndarray:
        if len(df) == 0:
            return np.array([], dtype=np.uint64)
        kt = pa.Table.from_pandas(
            df[block_cols], preserve_index=False,
            schema=pa.schema([(c, ptypes[c]) for c in block_cols]))
        return key_hash(kt, block_cols)

    # blocks past block_docs_max divert to the LSH-prefilter escalation
    # (_lsh_blocked_pairs); on a fan/mega HASH collision the mega tier
    # wins (the row set must partition) — a 2^-64 event that degrades
    # one exact block to prefiltered, never duplicates or crosses keys
    mega_h = np.sort(_keyset(mega_df))
    hk = _keyset(fan_df)
    order = np.argsort(hk, kind='stable')
    hot_h = hk[order]
    # duplicate hot hashes (two hot blocks colliding) keep the larger
    # count — C only sizes chunks, membership stays exact on the true
    # key via the merge below
    hot_n = fan_df['_n'].to_numpy(dtype=np.int64)[order]
    for i in range(1, len(hot_h)):
        if hot_h[i] == hot_h[i - 1]:
            hot_n[i] = max(hot_n[i], hot_n[i - 1])
            hot_n[i - 1] = hot_n[i]
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def split(tbl: pa.Table, tier: str) -> pa.Table:
        h = key_hash(tbl, block_cols)
        in_mega = np.isin(h, mega_h)
        if tier == 'mega':
            m = in_mega
        elif tier == 'hot':
            m = np.isin(h, hot_h) & ~in_mega
        else:
            m = ~np.isin(h, hot_h) & ~in_mega
        return tbl.filter(pa.array(m))

    cold = prepped.map_batches(lambda t: split(t, 'cold'),
                               batch_format='pyarrow',
                               zero_copy_batch=True)
    cold_pairs = bucket_exchange(cold.repartition(num_buckets),
                                 block_cols, pairs, num_buckets)

    mega_out = None
    if len(mega_df):
        def _ed_verify(ca, cb, uniq):
            ed = _editdist_by_code(ca, cb, uniq, max_dist, kernel)
            return ed, ed <= max_dist

        mega_rows = prepped.map_batches(lambda t: split(t, 'mega'),
                                        batch_format='pyarrow',
                                        zero_copy_batch=True)
        mega_out = _lsh_blocked_pairs(mega_rows, pschema, block_cols,
                                      id_col, _ed_verify, 'edist',
                                      num_buckets)
    if len(fan_df) == 0:
        return cold_pairs.union(mega_out) if mega_out is not None \
            else cold_pairs

    from .conversations import _hashable_np
    from .conversations import _HASH_KEY as _HK

    def fan(tbl: pa.Table) -> pa.Table:
        # replicate each hot row once per chunk-pair it participates in
        h = key_hash(tbl, block_cols)
        pos = np.searchsorted(hot_h, h)
        B = hot_n[pos]
        C = -(-B // fanout_block_docs)
        ids = _hashable_np(tbl.column(id_col))
        c = (pd.util.hash_array(ids, hash_key=_HK, categorize=False)
             % C.astype(np.uint64)).astype(np.int64)
        rep = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), C)
        j = np.arange(len(rep), dtype=np.int64) \
            - np.repeat(np.cumsum(C) - C, C)
        ci = np.minimum(c[rep], j)
        cj = np.maximum(c[rep], j)
        fo = ((h[rep] * GOLD + ci.view(np.uint64)) * GOLD
              + cj.view(np.uint64)).view(np.int64)
        out = tbl.take(pa.array(rep))
        out = out.append_column('_ci', pa.array(ci, pa.int64()))
        out = out.append_column('_cj', pa.array(cj, pa.int64()))
        out = out.append_column('_role', pa.array(c[rep], pa.int64()))
        return out.append_column('_fo', pa.array(fo, pa.int64()))

    def hot_pairs(tbl: pa.Table) -> pa.Table:
        id_t = (tbl.schema.field(id_col).type
                if id_col in tbl.schema.names else pa.int64())
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                                ('edist', pa.int64())])
        df = tbl.to_pandas()
        if len(df):
            df = df.dropna(subset=block_cols + ['_pfx'])
        if len(df) == 0:
            return out_schema.empty_table()
        codes, uniq = pd.factorize(df['_pfx'], sort=False)
        df = df[[id_col] + block_cols + ['_ci', '_cj', '_role']]\
            .assign(_pc=codes)
        m = df.merge(df, on=block_cols + ['_ci', '_cj'],
                     suffixes=('_a', '_b'))
        ia = m[f'{id_col}_a'].to_numpy()
        ib = m[f'{id_col}_b'].to_numpy()
        same = m['_ci'].to_numpy() == m['_cj'].to_numpy()
        # within-chunk: id order dedups the self-merge; cross-chunk:
        # exactly the (role_a, role_b) == (chunk_i, chunk_j) orientation
        # (each unordered pair appears in exactly one chunk-pair group)
        keep = np.where(
            same, ia < ib,
            (m['_role_a'].to_numpy() == m['_ci'].to_numpy())
            & (m['_role_b'].to_numpy() == m['_cj'].to_numpy()))
        m = m[keep]
        if len(m) == 0:
            return out_schema.empty_table()
        ed = _editdist_by_code(m['_pc_a'].to_numpy(),
                               m['_pc_b'].to_numpy(), uniq, max_dist,
                               kernel)
        kp = ed <= max_dist
        m = m[kp]
        ia = m[f'{id_col}_a'].to_numpy()
        ib = m[f'{id_col}_b'].to_numpy()
        return pa.table({
            'doc_a': pa.array(np.minimum(ia, ib), type=id_t),
            'doc_b': pa.array(np.maximum(ia, ib), type=id_t),
            'edist': pa.array(ed[kp], type=pa.int64())})

    hot_fan = prepped.map_batches(lambda t: split(t, 'hot'),
                                  batch_format='pyarrow',
                                  zero_copy_batch=True)\
        .map_batches(fan, batch_format='pyarrow', zero_copy_batch=True)
    hot_out = bucket_exchange(hot_fan.repartition(num_buckets), '_fo',
                              hot_pairs, num_buckets)
    out = cold_pairs.union(hot_out)
    return out.union(mega_out) if mega_out is not None else out


def _lead_bytes_u32(sa: pa.StringArray) -> np.ndarray:
    """First 4 UTF-8 bytes of each string as a big-endian uint32 —
    an ORDER-CONSISTENT coarsening of bytewise string order (s1 <= s2
    implies u32(s1) <= u32(s2), zero-padded), used only for range
    bucketing. Pure buffer gathers: no per-row Python."""
    sa = sa.combine_chunks() if isinstance(sa, pa.ChunkedArray) else sa
    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off = np.frombuffer(sa.buffers()[1], dtype=np.int32)[
        sa.offset:sa.offset + n + 1].astype(np.int64)
    dbuf = sa.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None
            else np.zeros(0, dtype=np.uint8))
    if len(data) == 0:          # all-empty strings
        return np.zeros(n, dtype=np.uint64)
    lens = off[1:] - off[:-1]
    out = np.zeros(n, dtype=np.uint64)
    for k in range(4):
        idx = np.minimum(off[:-1] + k, len(data) - 1)
        b = np.where(lens > k, data[idx], 0)
        out = out * np.uint64(256) + b.astype(np.uint64)
    return out


def sorted_neighborhood_pairs(ds, text_col: str = 'text',
                              id_col: str = 'doc_id',
                              prefix_cp: int = 32, window: int = 8,
                              max_dist: int = 8, num_buckets: int = 16,
                              block_size: int = 4096):
    """Sorted-neighborhood method (SNM) near-dup pairs: rows are ranked
    by (text prefix, id) in GLOBAL bytewise order and every pair within
    ``window`` ranks is verified by byte-level Levenshtein over the
    ``prefix_cp``-codepoint prefix. The classic entity-resolution
    blocking alternative to equality blocking (editdist_pairs) and LSH
    (minhash): sorting brings near-identical records adjacent, so the
    candidate set is O(n * window) regardless of key skew.

    Distributed shape (two exchanges, no driver data-plane):
    1. RANGE exchange on the first-4-byte integer of the sort key
       (order-consistent, so equal keys co-locate and bucket-local rank
       + a broadcast per-bucket offset = the exact global
       ``row_number() OVER (ORDER BY skey, id)``); only ``num_buckets``
       int64 counts reach the driver. Fixed byte-space split assumes
       rough prefix uniformity — sample quantile edges for skewed
       corpora (same note as packing.py's range buckets).
    2. Rank-block exchange: each row goes to block rank//block_size,
       plus a LOOKAHEAD copy to the previous block when within
       ``window`` of its start, so every window pair is generated in
       exactly one task (the pair is owned by its left member's block).
       Per block the DP runs once per unique prefix pair
       (_editdist_by_code), so a run of D identical docs costs ONE DP
       row, not D*window.

    Returns (doc_a, doc_b, rank_a, rank_b, edist) with rank_a < rank_b,
    edist <= max_dist. Oracle parity: prefix slicing by codepoints ==
    DuckDB substr; ranking over UTF-8 bytewise order == DuckDB's binary
    collation (Python str comparison is codepoint-wise, which UTF-8
    preserves); distance == DuckDB levenshtein (byte-based). NULL text
    rows carry no sort key — excluded on both engines."""
    id_t = pa.int64()

    def prep(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.is_valid(tbl.column(text_col)))
        skey = pc.utf8_slice_codeunits(
            tbl.column(text_col).combine_chunks(), 0, prefix_cp)
        k4 = _lead_bytes_u32(skey)
        rb = ((k4 * np.uint64(num_buckets)) >> np.uint64(32))\
            .astype(np.int32)
        return pa.table({
            id_col: tbl.column(id_col).combine_chunks().cast(id_t),
            '_skey': skey,
            '_rb': pa.array(rb, type=pa.int32()),
        })

    ranked_schema = pa.schema([(id_col, id_t), ('_skey', pa.string()),
                               ('_rb', pa.int32()),
                               ('_lrank', pa.int64())])

    def local_rank(tbl: pa.Table) -> pa.Table:
        # Ray 2.49 map_groups hands schema-less empty blocks for empty
        # sort partitions — emit the explicit schema either way
        if tbl.num_rows == 0 or id_col not in tbl.column_names:
            return ranked_schema.empty_table()
        df = tbl.select([id_col, '_skey', '_rb']).to_pandas()
        df = df.sort_values(['_skey', id_col], kind='mergesort')
        df['_lrank'] = np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df, schema=ranked_schema,
                                    preserve_index=False)

    prepped = ds.map_batches(prep, batch_format='pyarrow',
                             zero_copy_batch=True)
    ranked = prepped.groupby('_rb').map_groups(
        local_rank, batch_format='pyarrow').materialize()

    # per-bucket totals: num_buckets int64 rows — the ONLY driver data
    totals = ranked.groupby('_rb').count().to_pandas()
    tot = np.zeros(num_buckets, dtype=np.int64)
    if len(totals):
        tot[totals['_rb'].to_numpy(np.int64)] = \
            totals['count()'].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(tot[:-1], dtype=np.int64)))

    blk_schema = pa.schema([(id_col, id_t), ('_skey', pa.string()),
                            ('_rnk', pa.int64()), ('_blk', pa.int64())])

    def to_blocks(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return blk_schema.empty_table()
        rb = tbl.column('_rb').to_numpy(zero_copy_only=False)
        rnk = tbl.column('_lrank').to_numpy(zero_copy_only=False) \
            + offsets[rb]
        blk = rnk // block_size
        ids = tbl.column(id_col).combine_chunks()
        skey = tbl.column('_skey').combine_chunks()
        # lookahead copy: the previous block needs this row to close
        # its window pairs
        look = (rnk % block_size < window) & (blk > 0)
        li = np.nonzero(look)[0]
        return pa.table({
            id_col: pa.chunked_array([ids, ids.take(pa.array(li))])
            .combine_chunks(),
            '_skey': pa.chunked_array([skey, skey.take(pa.array(li))])
            .combine_chunks(),
            '_rnk': pa.array(np.concatenate([rnk, rnk[li]])),
            '_blk': pa.array(np.concatenate([blk, blk[li] - 1])),
        }, schema=blk_schema)

    out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                            ('rank_a', pa.int64()),
                            ('rank_b', pa.int64()),
                            ('edist', pa.int64())])

    def gen_pairs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or id_col not in tbl.column_names:
            return out_schema.empty_table()
        if '_bucket' in tbl.column_names:
            tbl = tbl.drop_columns(['_bucket'])
        order = pc.sort_indices(tbl.column('_rnk'))
        tbl = tbl.take(order)
        rnk = tbl.column('_rnk').to_numpy(zero_copy_only=False)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        blk = tbl.column('_blk').to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            tbl.column('_skey').to_pandas(), sort=False)
        own = rnk // block_size == blk     # left member owns the pair
        a_idx, b_idx = [], []
        n = len(rnk)
        for d in range(1, window + 1):
            if d >= n:
                break
            ok = own[:-d] & (rnk[d:] - rnk[:-d] <= window)
            hit = np.nonzero(ok)[0]
            a_idx.append(hit)
            b_idx.append(hit + d)
        if not a_idx:
            return out_schema.empty_table()
        ai = np.concatenate(a_idx)
        bi = np.concatenate(b_idx)
        ed = _editdist_by_code(codes[ai], codes[bi],
                               list(uniq), max_dist)
        keep = ed <= max_dist
        ai, bi, ed = ai[keep], bi[keep], ed[keep]
        return pa.table({
            'doc_a': pa.array(ids[ai], type=id_t),
            'doc_b': pa.array(ids[bi], type=id_t),
            'rank_a': pa.array(rnk[ai]),
            'rank_b': pa.array(rnk[bi]),
            'edist': pa.array(ed, type=pa.int64()),
        }, schema=out_schema)

    blocks = ranked.map_batches(to_blocks, batch_format='pyarrow',
                                zero_copy_batch=True)
    return blocks.groupby('_blk').map_groups(
        gen_pairs, batch_format='pyarrow')


def semdedup(ds, emb_col='embedding', id_col='vec_id', n_clusters='auto',
             iters=5, threshold=0.95, num_buckets=32,
             cluster_rows_max=50_000, pair_cap=8_000_000,
             target_cluster_rows=2_000):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering the embedding space, then marking within-cluster
    pairs with cosine >= ``threshold`` as duplicates and keeping ONE doc
    per duplicate group — the member LEAST similar to its cluster
    centroid (the paper's keep rule: low-centroid-similarity examples
    carry the most marginal information), ties to the smallest id.

    Every comparison is exact int64: rows are unit-normalized and
    quantized to micro-units once per row (order-invariant), so a pair's
    cosine dot is an exact integer in ~1e12 scale and the threshold test,
    the duplicate-group union-find (min-label hooking) and the keep rule
    are all bit-identical under any row order, batch boundary or
    partitioning — same discipline as ``ann.kmeans_lloyd``, which
    provides the deterministic clustering.

    Returns one row per non-null vector: (id, cluster int32, group = min
    id of the duplicate component, cent_sim6 = cosine to the assigned
    centroid in micro-units, keep bool).

    100-TB shape: k-means is the scale knob — the within-cluster pair
    scan is O(B^2) per cluster, so ``n_clusters`` must grow with the
    corpus to hold mean cluster size at ~1-10k rows (the paper runs 50k
    clusters on LAION). The default ``n_clusters='auto'`` folds that
    policy into the operator: k = clamp(rows / target_cluster_rows,
    8, 65536) resolved from the row count kmeans_lloyd already takes
    (the endurance probe measured the fixed-k O(B^2) slowdown this
    removes); a cluster above ``cluster_rows_max`` still raises with
    that guidance instead of silently running a quadratic task. Beyond
    the k-means passes the op is ONE exchange keyed on the int32 cluster
    id moving (id, unit-vector, cent_dot) rows; the pair matmul is
    chunked so a task never holds more than ~64 MB of scores.
    """
    import ray
    import ray.data as rd
    from .ann import _assign6, _batch_matrix, _matrix6, drop_null_vectors
    from .ann import kmeans_lloyd
    from .conversations import bucket_exchange

    out_schema = pa.schema([
        (id_col, pa.int64()), ('cluster', pa.int32()),
        ('group', pa.int64()), ('cent_sim6', pa.int64()),
        ('keep', pa.bool_()),
    ])
    try:
        c6, _sizes, _inertia = kmeans_lloyd(
            ds, emb_col, id_col, n_clusters=n_clusters, iters=iters,
            target_cluster_rows=target_cluster_rows)
    except ValueError:          # 0-row / all-null input
        return rd.from_arrow(out_schema.empty_table())

    # unit-normalized centroids, re-quantized to micro-units (driver-side
    # once, broadcast) — cent_dot below is then an exact int64 in ~1e12
    cf = c6.astype(np.float64) / 1e6
    cn = np.linalg.norm(cf, axis=1)
    cn[cn == 0] = 1.0
    cu6 = np.floor(cf / cn[:, None] * 1e6 + 0.5).astype(np.int64)
    c_ref = ray.put((np.ascontiguousarray(c6), np.ascontiguousarray(cu6)))
    thr12 = int(np.floor(threshold * 1e12 + 0.5))

    class Assign:
        def __init__(self):
            self.c6, self.cu6 = ray.get(c_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            tbl = drop_null_vectors(tbl, emb_col)
            if tbl.num_rows == 0:
                return pa.table({
                    '_id': pa.array([], pa.int64()),
                    'cluster': pa.array([], pa.int32()),
                    '_u6': pa.array([], pa.list_(pa.int64())),
                    '_cd': pa.array([], pa.int64())})
            assign, _ = _assign6(_matrix6(tbl, emb_col), self.c6)
            m = _batch_matrix(tbl, emb_col)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0          # zero vectors never pass thr>0
            u6 = np.floor(m / nrm[:, None] * 1e6 + 0.5).astype(np.int64)
            cd = (u6 * self.cu6[assign]).sum(axis=1)
            n, d = u6.shape
            return pa.table({
                '_id': tbl.column(id_col).combine_chunks()
                          .cast(pa.int64()),
                'cluster': pa.array(assign),
                '_u6': pa.FixedSizeListArray.from_arrays(
                    pa.array(u6.reshape(-1)), d)
                    .cast(pa.list_(pa.int64())),
                '_cd': pa.array(cd),
            })

    # autoscaling actor pool: assignment is the full-corpus pass, so
    # the pool must widen with input (2 actors would throttle 100 TB)
    assigned = ds.map_batches(Assign, batch_format='pyarrow',
                              zero_copy_batch=True, concurrency=(2, 16))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        ids = tbl.column('_id').to_numpy(zero_copy_only=False)
        cl = tbl.column('cluster').to_numpy(zero_copy_only=False)
        cd = tbl.column('_cd').to_numpy(zero_copy_only=False)
        la = tbl.column('_u6').combine_chunks()
        U = np.asarray(la.flatten().to_numpy(zero_copy_only=False),
                       dtype=np.int64).reshape(len(la), -1)
        group = ids.copy()
        keep = np.ones(len(ids), dtype=bool)
        order = np.argsort(cl, kind='stable')
        sc = cl[order]
        starts = np.nonzero(np.diff(sc, prepend=sc[0] - 1))[0]
        ends = np.append(starts[1:], len(sc))
        for lo, hi in zip(starts, ends):
            idx = order[lo:hi]
            B = len(idx)
            if B < 2:
                continue
            if B > cluster_rows_max:
                raise ValueError(
                    f'semdedup: cluster of {B} rows exceeds '
                    f'cluster_rows_max={cluster_rows_max} — raise '
                    f'n_clusters so the O(B^2) within-cluster scan '
                    f'stays bounded')
            Us = U[idx]
            # collapse EXACT-duplicate vectors first: a hot blob of D
            # bit-identical embeddings contributes D-1 trivial links,
            # not D^2/2 scored pairs (the 300x-dup skew-gate shape)
            rows_view = Us.view([('', Us.dtype)] * Us.shape[1])\
                .ravel()
            _, rep_of = np.unique(rows_view, return_inverse=True)
            # first occurrence per duplicate group, in ORIGINAL order:
            # stable argsort of group codes -> group segment heads
            ord_g = np.argsort(rep_of, kind='stable')
            heads = np.ones(B, dtype=bool)
            heads[1:] = rep_of[ord_g][1:] != rep_of[ord_g][:-1]
            first_of = np.empty(rep_of.max() + 1, dtype=np.int64)
            first_of[rep_of[ord_g[heads]]] = ord_g[heads]
            scan = np.nonzero(first_of[rep_of] == np.arange(B))[0]
            ea, eb = [], []
            # duplicate members link to their first occurrence — but
            # only when the vector actually clears the threshold
            # against itself (a zero vector's cosine is 0, and exact
            # zero-copies must NOT pair, matching the scored path)
            dup_members = np.nonzero(first_of[rep_of]
                                     != np.arange(B))[0]
            if dup_members.size:
                selfdot = (Us[dup_members].astype(np.int64) ** 2)\
                    .sum(axis=1)
                dup_members = dup_members[selfdot >= thr12]
            if dup_members.size:
                ea.append(first_of[rep_of[dup_members]])
                eb.append(dup_members)
            Uscan = Us[scan]
            Bs = len(scan)
            # chunk rows so a score block never exceeds ~64 MB int64
            chunk = max(64, min(4096, 8_000_000 // max(Bs, 1)))
            n_pairs = 0
            for lo2 in range(0, Bs, chunk):
                dots = Uscan[lo2:lo2 + chunk] @ Uscan.T  # exact int64
                ii, jj = np.nonzero(dots >= thr12)
                gi = ii + lo2
                keep_m = jj > gi                       # upper triangle
                if keep_m.any():
                    n_pairs += int(keep_m.sum())
                    if n_pairs > pair_cap:
                        raise ValueError(
                            f'semdedup: > {pair_cap} near-dup pairs '
                            f'inside one cluster of {B} rows — raise '
                            f'n_clusters or threshold so the pair '
                            f'set stays bounded')
                    ea.append(scan[gi[keep_m]])
                    eb.append(scan[jj[keep_m]])
            if not ea:
                continue
            ai = np.concatenate(ea)
            bi = np.concatenate(eb)
            lab = np.arange(B, dtype=np.int64)
            while True:                 # min-label hooking (_local_cc)
                old = lab.copy()
                np.minimum.at(lab, ai, lab[bi])
                np.minimum.at(lab, bi, lab[ai])
                while True:
                    nl = lab[lab]
                    if np.array_equal(nl, lab):
                        break
                    lab = nl
                if np.array_equal(lab, old):
                    break
            ids_s = ids[idx]
            rep = np.full(B, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(rep, lab, ids_s)
            group[idx] = rep[lab]
            # keep = least-similar-to-centroid member, tie -> min id
            ord2 = np.lexsort((ids_s, cd[idx]))
            _, first = np.unique(lab[ord2], return_index=True)
            kp = np.zeros(B, dtype=bool)
            kp[ord2[first]] = True
            keep[idx] = kp
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            'cluster': pa.array(cl, pa.int32()),
            'group': pa.array(group, pa.int64()),
            'cent_sim6': pa.array(
                (cd + 500_000) // 1_000_000, pa.int64()),
            'keep': pa.array(keep),
        }, schema=out_schema)

    # quadratic-compute reduce: align reduce width with num_buckets —
    # a small input is ONE block and would serialize every cluster's
    # O(B^2) scan into a single task (CLAUDE.md exchange rule)
    out = bucket_exchange(assigned.repartition(num_buckets), 'cluster',
                          per_bucket, num_buckets)
    # a fully-empty exchange emits schema-less blocks — pin the schema
    return out.union(rd.from_arrow(out_schema.empty_table()))


# ---------------------------------------------------------------------------
# Conversation-level dedup over the transcripts payload (conv_id, turn_idx,
# role, text, ts). Both operators move ONLY fixed-size partial rows through
# the exchanges — turn text never leaves its input task, which is the shape
# a 10^12-turn corpus needs.
# ---------------------------------------------------------------------------

_PHI64 = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set) —
    uint64 in, uint64 out; the mod-2^64 wraps are the intended math."""
    with np.errstate(over='ignore'):
        z = x + _PHI64
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _turn_content_hash(tbl: pa.Table, role_col: str, text_col: str,
                       order_col: str,
                       hash_mode: str = 'pandas') -> np.ndarray:
    """Position-mixed uint64 hash of each turn's (turn_idx, role, text).
    Summing these per conversation (mod 2^64) yields an ORDER-SENSITIVE
    yet batch-mergeable conversation fingerprint: the sum commutes with
    arbitrary batching while turn_idx keeps reordered content distinct.

    ``hash_mode='duckdb'`` swaps the pandas/splitmix mix for the
    DuckDB-parity murmur chain hash(xor(hash(role || chr(31) || text),
    hash(turn_idx + 1))) (stages/sketches.py kernels) — a value SQL
    recomputes verbatim, making the whole fingerprint chain
    oracle-checkable (q_conv_exact_dedup)."""
    joined = pc.binary_join_element_wise(
        pc.fill_null(tbl.column(role_col).cast(pa.string()), ''),
        pc.fill_null(tbl.column(text_col).cast(pa.string()), ''),
        '\x1f')
    idx = tbl.column(order_col).cast(pa.int64())\
        .to_numpy(zero_copy_only=False).astype(np.uint64)
    if hash_mode == 'duckdb':
        from .sketches import _murmur64_u64, duckdb_hash_str64
        hs = duckdb_hash_str64(joined)
        with np.errstate(over='ignore'):
            return _murmur64_u64(hs ^ _murmur64_u64(idx + np.uint64(1)))
    h = T.hash_shingles(joined.to_numpy(zero_copy_only=False))
    with np.errstate(over='ignore'):
        return _splitmix64(h ^ ((idx + np.uint64(1)) * _PHI64))


def conversation_exact_dedup(ds, conv_col='conv_id', order_col='turn_idx',
                             role_col='role', text_col='text',
                             num_buckets: int = 32,
                             hash_mode: str = 'pandas'):
    """Exact conversation dedup: two conversations are duplicates iff
    they have the same number of turns and identical (turn_idx, role,
    text) content at every position. Returns one row per conversation:
    (conv_id, group = min conv_id sharing the fingerprint, n_turns).

    100-TB shape: each input batch emits ONE partial row per
    conversation it touches — (conv, wrap-sum of position-mixed turn
    hashes, turn count) — so the first exchange moves ~24-byte rows and
    the text column never leaves the reading task. A second tiny
    exchange keyed on the merged fingerprint groups equal conversations
    (collisions are 64-bit-hash-sum improbable; the turn count rides in
    the group key as a free guard).

    ``hash_mode='duckdb'`` (see _turn_content_hash) makes every hash a
    DuckDB-recomputable murmur chain, and the mod-2^64 wrap-sum is SQL
    HUGEINT arithmetic (sum then % 2^64) — the whole operator then has
    a byte-parity oracle (q_conv_exact_dedup). Default 'pandas' is
    untouched.
    """
    import ray.data as rd

    from .conversations import bucket_exchange

    part_schema = pa.schema([('conv', pa.string()), ('fp', pa.int64()),
                             ('n', pa.int64())])
    out_schema = pa.schema([(conv_col, pa.string()),
                            ('group', pa.string()),
                            ('n_turns', pa.int64())])

    def partials(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return part_schema.empty_table()
        hp = _turn_content_hash(tbl, role_col, text_col, order_col,
                                hash_mode)
        conv = tbl.column(conv_col).cast(pa.string())\
            .to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(conv, sort=False)
        s = np.zeros(len(uniq), dtype=np.uint64)
        with np.errstate(over='ignore'):
            np.add.at(s, codes, hp)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({'conv': pa.array(uniq, pa.string()),
                         'fp': pa.array(s.view(np.int64)),
                         'n': pa.array(n)}, schema=part_schema)

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return part_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        fp = tbl.column('fp').to_numpy(zero_copy_only=False)\
            .view(np.uint64)
        n = tbl.column('n').to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(conv, sort=False)
        s = np.zeros(len(uniq), dtype=np.uint64)
        with np.errstate(over='ignore'):
            np.add.at(s, codes, fp)
        nn = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nn, codes, n)
        return pa.table({'conv': pa.array(uniq, pa.string()),
                         'fp': pa.array(s.view(np.int64)),
                         'n': pa.array(nn)}, schema=part_schema)

    def group_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        fp = tbl.column('fp').to_numpy(zero_copy_only=False)
        n = tbl.column('n').to_numpy(zero_copy_only=False)
        df = pd.DataFrame({'conv': conv, 'fp': fp, 'n': n})
        rep = df.groupby(['fp', 'n'], sort=False)['conv'].transform('min')
        return pa.table({conv_col: pa.array(conv, pa.string()),
                         'group': pa.array(rep.to_numpy(), pa.string()),
                         'n_turns': pa.array(n)}, schema=out_schema)

    parts = ds.map_batches(partials, batch_format='pyarrow',
                           zero_copy_batch=True)
    merged = bucket_exchange(parts, 'conv', merge, num_buckets)
    out = bucket_exchange(merged, 'fp', group_fn, num_buckets)
    return out.union(rd.from_arrow(out_schema.empty_table()))


def conversation_minhash_dedup(ds, conv_col='conv_id', text_col='text',
                               threshold=0.7, num_perm=64, num_bands=16,
                               shingle_k=3, seed=1234,
                               num_buckets: int = 32,
                               carried_sig_max: int = 1_000_000,
                               sig_mode: str = 'perm',
                               hash_mode: str = 'pandas'):
    """Near-duplicate conversation clusters: MinHash over the UNION of
    every turn's word-``shingle_k``-gram hashes, LSH banding for
    candidates, signature-estimated Jaccard verify, then distributed
    connected components. Returns (conv_id, group = min conv_id of the
    cluster) for conversations in a near-dup cluster only.

    Unlike the doc-level ``minhash_dedup`` (whose exact verify re-reads
    the candidate docs' text), the verify here is the SIGNATURE estimate
    (matching-permutation fraction >= threshold): conversations span
    batches, so per-batch partial signatures (min per permutation,
    packed one fixed-binary row per conversation per batch) are the only
    state exchanged and turn text NEVER moves — the documented trade is
    an estimator with stderr ~= sqrt(j(1-j)/num_perm); raise
    ``num_perm`` to tighten it. ``sig_mode='oph'`` switches to
    one-permutation hashing with rotation densification (Li et al.
    2012; Shrivastava & Li 2014): ONE rehash pass instead of num_perm
    passes, with RAW (undensified) bins as the still-min-mergeable
    partials, densified once after the global merge. It is NOT the
    default because it needs |shingle set| >> num_perm: on short
    conversations (~30-50 shingles into 64 bins) half the bins are
    empty and densification CORRELATES slots across conversations —
    the 10M-turn probe measured estimate inflation (12.6k clustered
    convs vs 6.0k truth) and 3x the wall from the extra candidates.
    Use it for long-document/transcript corpora where sets are large;
    the default 'perm' is the classic per-permutation family.

    The candidate/verify stage is SIZE-TIERED (same discipline as
    interval_join's adaptive tiering; both 2M/10M-turn probe records in
    BASELINE.md): at or below ``carried_sig_max`` conversations the
    band rows carry the signature and one exchange finds AND verifies
    pairs with a first-matching-band responsibility rule (exactly-once
    emission) — measured 2.5x faster at ~350k convs, where extra
    exchange floors dominate. Above it, band rows go LIGHT (20 bytes),
    pairs are dedup'd by a distinct aggregation, and the fixed-binary
    signature moves only once per conversation plus once per candidate
    side through two hash joins — carrying signatures on every band row
    would cost num_bands x the signature volume (≈14 GB at 1.7M convs).
    The cluster labeling (CC + min-string representative) stays in
    Datasets end-to-end on both tiers.

    Collision bound: conversations are identified by ``ch``, a 64-bit
    hash of ``conv_id``, as the CC node id and the signature-join key.
    A cross-conversation collision silently merges two unrelated
    clusters; by the birthday bound P(any collision) ≈ n²/2⁶⁵ — ~3%
    at 1e9 conversations, negligible below ~1e8. Past that scale pass
    pre-sharded inputs (dedup per shard/date-bucket keyed by the conv
    string) or widen the id: the exact path is immune (its fingerprint
    rides n_turns as a free secondary guard).
    """
    import ray.data as rd

    from .conversations import bucket_exchange
    from .graph import connected_components
    from .joins import hash_join

    if sig_mode not in ('perm', 'oph'):
        raise ValueError(
            f'conversation_minhash_dedup: unknown sig_mode {sig_mode!r} '
            f"(expected 'perm' or 'oph')")
    # hash_mode='duckdb' swaps shingle/permutation/band hashes for the
    # DuckDB-parity murmur chains (stages/sketches.py) so the whole
    # pipeline — per-turn shingles, per-conv min signature, banding,
    # estimate verify, CC — is recomputable in SQL (q_conv_minhash_dedup
    # oracle). Only the classic per-permutation family has a SQL
    # transcription; OPH densification does not.
    if hash_mode == 'duckdb' and sig_mode != 'perm':
        raise ValueError("hash_mode='duckdb' requires sig_mode='perm'")
    band_mode = 'duckdb' if hash_mode == 'duckdb' else 'fnv'

    sigpart_schema = pa.schema([
        ('conv', pa.string()), ('ch', pa.int64()),
        ('sigp', pa.binary(num_perm * 8))])
    sig_schema = pa.schema([
        ('conv', pa.string()), ('ch', pa.int64()),
        ('sig', pa.binary(num_perm * 8))])
    out_schema = pa.schema([(conv_col, pa.string()),
                            ('group', pa.string())])
    edge_schema = pa.schema([('src', pa.int64()), ('dst', pa.int64()),
                             ('est_jaccard', pa.float64())])

    def _sig_matrix(col) -> np.ndarray:
        fsb = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        if len(fsb) == 0:
            return np.zeros((0, num_perm), dtype=np.uint64)
        buf = np.frombuffer(fsb.buffers()[1], dtype=np.uint64)
        start = fsb.offset * num_perm
        return buf[start:start + len(fsb) * num_perm]\
            .reshape(len(fsb), num_perm)

    def sig_partials(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return sigpart_schema.empty_table()
        conv = tbl.column(conv_col).cast(pa.string())\
            .to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(conv, sort=False)
        order = np.argsort(codes, kind='stable')
        lengths, _, gh = T.shingle_hash_explode(
            tbl.take(pa.array(order)).column(text_col), shingle_k,
            hash_mode=hash_mode)
        conv_len = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(conv_len, codes[order], lengths)
        if sig_mode == 'oph':
            # raw (undensified) OPH partials stay min-mergeable across
            # batches; densification happens once after the global merge
            sig = T.minhash_matrix_oph(conv_len, gh, num_perm, seed,
                                       densify=False)
        else:
            sig = T.minhash_matrix(
                conv_len, gh, num_perm, seed,
                hash_mode='duckdb' if hash_mode == 'duckdb' else 'affine')
        keep = conv_len > 0
        if not keep.any():
            return sigpart_schema.empty_table()
        uniq_k = uniq[keep]
        sig_k = np.ascontiguousarray(sig[keep])
        nk = len(uniq_k)
        ch = T.hash_shingles(np.asarray(uniq_k, dtype=object))\
            .view(np.int64)
        # ONE packed row per conversation per batch: the whole partial
        # signature as fixed binary — 64x fewer exchange rows (and no
        # per-perm conv-string repetition) than exploded (conv, perm,
        # min) rows
        return pa.table({
            'conv': pa.array(uniq_k, pa.string()),
            'ch': pa.array(ch),
            'sigp': pa.array([sig_k[i].tobytes() for i in range(nk)],
                             pa.binary(num_perm * 8)),
        }, schema=sigpart_schema)

    def merge_sigs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return sig_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        ch = tbl.column('ch').to_numpy(zero_copy_only=False)
        P = _sig_matrix(tbl.column('sigp'))       # (rows, num_perm) u64
        codes, uniq = pd.factorize(conv, sort=False)
        order = np.argsort(codes, kind='stable')
        sc = codes[order]
        new = np.ones(len(sc), dtype=bool)
        new[1:] = sc[1:] != sc[:-1]
        starts = np.nonzero(new)[0]
        sig_u = np.minimum.reduceat(P[order], starts, axis=0)
        if sig_mode == 'oph':
            sig_u = T.densify_oph(sig_u)
        nconv = len(uniq)
        assert sig_u.shape == (nconv, num_perm)
        ch_u = ch[order][starts]
        return pa.table({
            'conv': pa.array(uniq, pa.string()),
            'ch': pa.array(ch_u),
            'sig': pa.array(
                [np.ascontiguousarray(sig_u[i]).tobytes()
                 for i in range(nconv)],
                pa.binary(num_perm * 8)),
        }, schema=sig_schema)

    parts = ds.map_batches(sig_partials, batch_format='pyarrow',
                           zero_copy_batch=True)
    sigs = bucket_exchange(parts, 'conv', merge_sigs, num_buckets)\
        .materialize()
    nconv_total = sigs.count()
    if nconv_total == 0:
        return rd.from_arrow(out_schema.empty_table())

    if nconv_total <= carried_sig_max:
        edges = _conv_pairs_carried(sigs, _sig_matrix, threshold,
                                    num_perm, num_bands, num_buckets,
                                    edge_schema, band_mode)
    else:
        edges = _conv_pairs_joined(sigs, _sig_matrix, threshold,
                                   num_perm, num_bands, num_buckets,
                                   edge_schema, band_mode)
    edges = edges.repartition(8).materialize()
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    cc = connected_components(edges, num_buckets=8)

    # label back to conv strings without leaving Datasets: join the
    # components to the signature table's (ch, conv) map, then one
    # exchange on the component for the min-string representative
    name_map = sigs.map_batches(
        lambda t: pa.table({'node': t.column('ch'),
                            'conv': t.column('conv')}),
        batch_format='pyarrow')
    joined = hash_join(
        cc, name_map, on='node', num_buckets=8,
        left_schema=pa.schema([('node', pa.int64()),
                               ('component', pa.int64())]),
        right_schema=pa.schema([('node', pa.int64()),
                                ('conv', pa.string())]))

    def label_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        comp = tbl.column('component').to_numpy(zero_copy_only=False)
        df = pd.DataFrame({'conv': conv, 'comp': comp}).drop_duplicates()
        rep = df.groupby('comp', sort=False)['conv'].transform('min')
        return pa.table({conv_col: pa.array(df['conv'].to_numpy(),
                                            pa.string()),
                         'group': pa.array(rep.to_numpy(), pa.string())},
                        schema=out_schema)

    out = bucket_exchange(joined, 'component', label_fn, 8)
    return out.union(rd.from_arrow(out_schema.empty_table()))


def _conv_pairs_carried(sigs, _sig_matrix, threshold, num_perm,
                        num_bands, num_buckets, edge_schema,
                        band_mode: str = 'fnv'):
    """Small tier: band rows CARRY the signature; one exchange both
    finds and verifies pairs; exactly-once emission via the
    first-matching-band responsibility rule (both signatures are at
    hand in every matching band bucket)."""
    from .conversations import bucket_exchange

    band_schema = pa.schema([
        ('ch', pa.int64()), ('band_id', pa.int32()),
        ('band_hash', pa.int64()), ('sig', pa.binary(num_perm * 8))])

    def to_bands(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return band_schema.empty_table()
        sig_u = _sig_matrix(tbl.column('sig'))
        bh = T.band_hashes(sig_u, num_bands, hash_mode=band_mode)
        ch = tbl.column('ch').to_numpy(zero_copy_only=False)
        n = len(ch)
        sig_col = tbl.column('sig').combine_chunks()
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64),
                                     num_bands))
        return pa.table({
            'ch': pa.array(np.repeat(ch, num_bands)),
            'band_id': pa.array(np.tile(
                np.arange(num_bands, dtype=np.int32), n)),
            'band_hash': pa.array(bh.reshape(-1).view(np.int64)),
            'sig': sig_col.take(rep_idx),
        }, schema=band_schema)

    def pair_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return edge_schema.empty_table()
        bid = tbl.column('band_id').to_numpy(zero_copy_only=False)
        bh = tbl.column('band_hash').to_numpy(zero_copy_only=False)
        ch = tbl.column('ch').to_numpy(zero_copy_only=False)
        S = _sig_matrix(tbl.column('sig'))
        order = np.lexsort((ch, bh, bid))
        sb, sh = bid[order], bh[order]
        new = np.ones(len(sb), dtype=bool)
        new[1:] = (sb[1:] != sb[:-1]) | (sh[1:] != sh[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(sb))
        ia_l, ib_l = [], []
        for lo, hi in zip(starts, ends):
            g = hi - lo
            if g < 2:
                continue
            loc = order[lo:hi]
            a = np.repeat(np.arange(g), g)
            b = np.tile(np.arange(g), g)
            m = a < b
            ia_l.append(loc[a[m]])
            ib_l.append(loc[b[m]])
        if not ia_l:
            return edge_schema.empty_table()
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
        est = (S[ia] == S[ib]).mean(axis=1)
        keep = est >= threshold
        ia, ib, est = ia[keep], ib[keep], est[keep]
        if not len(ia):
            return edge_schema.empty_table()
        # responsibility: emit only from the FIRST band whose hashes
        # match — every matching band bucket holds both signatures, so
        # the check is local and emission is exactly-once
        bha = T.band_hashes(S[ia], num_bands, hash_mode=band_mode)
        bhb = T.band_hashes(S[ib], num_bands, hash_mode=band_mode)
        first = np.argmax(bha == bhb, axis=1).astype(np.int32)
        own = first == bid[ia]
        ia, ib, est = ia[own], ib[own], est[own]
        if not len(ia):
            return edge_schema.empty_table()
        a_ch, b_ch = ch[ia], ch[ib]
        swap = a_ch > b_ch
        return pa.table({
            'src': pa.array(np.where(swap, b_ch, a_ch)),
            'dst': pa.array(np.where(swap, a_ch, b_ch)),
            'est_jaccard': pa.array(est)}, schema=edge_schema)

    bands = sigs.map_batches(to_bands, batch_format='pyarrow',
                             zero_copy_batch=True)
    return bucket_exchange(bands, 'band_hash', pair_fn, num_buckets)


def _conv_pairs_joined(sigs, _sig_matrix, threshold, num_perm,
                       num_bands, num_buckets, edge_schema,
                       band_mode: str = 'fnv'):
    """Large tier: LIGHT band rows (20 bytes) find raw pairs, a distinct
    aggregation dedups across bands, then the fixed-binary signature
    moves once per candidate side through two hash joins for the
    estimate verify."""
    from .conversations import bucket_exchange
    from .joins import hash_join

    band_schema = pa.schema([
        ('ch', pa.int64()), ('band_id', pa.int32()),
        ('band_hash', pa.int64())])
    rawpair_schema = pa.schema([('src', pa.int64()), ('dst', pa.int64())])

    def to_bands(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return band_schema.empty_table()
        sig_u = _sig_matrix(tbl.column('sig'))
        bh = T.band_hashes(sig_u, num_bands, hash_mode=band_mode)
        ch = tbl.column('ch').to_numpy(zero_copy_only=False)
        n = len(ch)
        return pa.table({
            'ch': pa.array(np.repeat(ch, num_bands)),
            'band_id': pa.array(np.tile(
                np.arange(num_bands, dtype=np.int32), n)),
            'band_hash': pa.array(bh.reshape(-1).view(np.int64)),
        }, schema=band_schema)

    def pair_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return rawpair_schema.empty_table()
        bid = tbl.column('band_id').to_numpy(zero_copy_only=False)
        bh = tbl.column('band_hash').to_numpy(zero_copy_only=False)
        ch = tbl.column('ch').to_numpy(zero_copy_only=False)
        order = np.lexsort((ch, bh, bid))
        sb, sh = bid[order], bh[order]
        new = np.ones(len(sb), dtype=bool)
        new[1:] = (sb[1:] != sb[:-1]) | (sh[1:] != sh[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(sb))
        src_l, dst_l = [], []
        for lo, hi in zip(starts, ends):
            g = hi - lo
            if g < 2:
                continue
            loc = order[lo:hi]
            a = np.repeat(np.arange(g), g)
            b = np.tile(np.arange(g), g)
            m = a < b
            ca, cb = ch[loc[a[m]]], ch[loc[b[m]]]
            swap = ca > cb
            src_l.append(np.where(swap, cb, ca))
            dst_l.append(np.where(swap, ca, cb))
        if not src_l:
            return rawpair_schema.empty_table()
        return pa.table({'src': pa.array(np.concatenate(src_l)),
                         'dst': pa.array(np.concatenate(dst_l))},
                        schema=rawpair_schema)

    bands = sigs.map_batches(to_bands, batch_format='pyarrow',
                             zero_copy_batch=True)
    raw_pairs = bucket_exchange(bands, 'band_hash', pair_fn, num_buckets)
    # a pair matching in several bands appears once per band — one
    # distinct aggregation instead of shipping signatures per band
    cand = bucket_aggregate(raw_pairs, ['src', 'dst'],
                            {'n_bands': ('src', 'count')},
                            num_buckets=num_buckets)

    sig_a = sigs.map_batches(
        lambda t: pa.table({'src': t.column('ch'),
                            'sig_a': t.column('sig')}),
        batch_format='pyarrow')
    sig_b = sigs.map_batches(
        lambda t: pa.table({'dst': t.column('ch'),
                            'sig_b': t.column('sig')}),
        batch_format='pyarrow')
    sb_t = pa.binary(num_perm * 8)
    with_a = hash_join(
        cand, sig_a, on='src', num_buckets=num_buckets,
        left_schema=pa.schema([('src', pa.int64()), ('dst', pa.int64()),
                               ('n_bands', pa.int64())]),
        right_schema=pa.schema([('src', pa.int64()), ('sig_a', sb_t)]))
    with_ab = hash_join(
        with_a, sig_b, on='dst', num_buckets=num_buckets,
        left_schema=pa.schema([('src', pa.int64()), ('dst', pa.int64()),
                               ('n_bands', pa.int64()),
                               ('sig_a', sb_t)]),
        right_schema=pa.schema([('dst', pa.int64()), ('sig_b', sb_t)]))

    def verify(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return edge_schema.empty_table()
        Sa = _sig_matrix(tbl.column('sig_a'))
        Sb = _sig_matrix(tbl.column('sig_b'))
        est = (Sa == Sb).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            'src': tbl.column('src').filter(pa.array(keep)),
            'dst': tbl.column('dst').filter(pa.array(keep)),
            'est_jaccard': pa.array(est[keep])}, schema=edge_schema)

    return with_ab.map_batches(verify, batch_format='pyarrow')


def conversation_exact_dedup_incremental(new_ds, state_dir: str,
                                         conv_col='conv_id',
                                         order_col='turn_idx',
                                         role_col='role',
                                         text_col='text',
                                         num_buckets: int = 32,
                                         ingest_key: str | None = None,
                                         hash_mode: str = 'pandas'):
    """Incremental exact conversation dedup against PERSISTED
    fingerprint state — the data-lake shape: each ingest dedups its new
    shard against everything ever ingested WITHOUT re-reading old text.

    State layout under ``state_dir``: ``manifest.json`` naming the
    current version directory, which holds the merged (conv, fp, n)
    fingerprint rows as parquet. Because the fingerprint is a
    position-mixed wrap-SUM of turn hashes, prior state merges with the
    new shard's partials by plain summation — a conversation SPLIT
    across ingests (later shard appends turns) still fingerprints
    exactly as if read whole. Each ingest writes a complete new version
    directory and swaps the manifest atomically (tmp + os.replace, the
    state/checkpoint.py invariant): a crash BEFORE the manifest swap
    leaves the prior version current and the ingest re-runs cleanly.
    A crash AFTER the swap means the shard WAS applied — pass a stable
    ``ingest_key`` (file digest / offset range) and a replay raises
    instead of double-summing the fingerprints (at-least-once delivery
    corrupts state otherwise).

    Returns ``(groups_ds, info)``: groups only for conversations
    TOUCHED by the new shard — ``group`` may name a previously-ingested
    conversation — and info with the new state version and cumulative
    conversation count.
    """
    import json
    import os

    import ray.data as rd

    from .conversations import bucket_exchange

    tag_schema = pa.schema([('conv', pa.string()), ('fp', pa.int64()),
                            ('n', pa.int64()), ('_new', pa.int8())])
    state_schema = pa.schema([('conv', pa.string()), ('fp', pa.int64()),
                              ('n', pa.int64())])
    out_schema = pa.schema([(conv_col, pa.string()),
                            ('group', pa.string()),
                            ('n_turns', pa.int64())])

    def partials(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tag_schema.empty_table()
        hp = _turn_content_hash(tbl, role_col, text_col, order_col,
                                hash_mode)
        conv = tbl.column(conv_col).cast(pa.string())\
            .to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(conv, sort=False)
        s = np.zeros(len(uniq), dtype=np.uint64)
        with np.errstate(over='ignore'):
            np.add.at(s, codes, hp)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({'conv': pa.array(uniq, pa.string()),
                         'fp': pa.array(s.view(np.int64)),
                         'n': pa.array(n),
                         '_new': pa.array(
                             np.ones(len(uniq), dtype=np.int8))},
                        schema=tag_schema)

    def merge(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tag_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        fp = tbl.column('fp').to_numpy(zero_copy_only=False)\
            .view(np.uint64)
        n = tbl.column('n').to_numpy(zero_copy_only=False)
        nw = tbl.column('_new').to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(conv, sort=False)
        s = np.zeros(len(uniq), dtype=np.uint64)
        with np.errstate(over='ignore'):
            np.add.at(s, codes, fp)
        nn = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nn, codes, n)
        mx = np.zeros(len(uniq), dtype=np.int8)
        np.maximum.at(mx, codes, nw)
        return pa.table({'conv': pa.array(uniq, pa.string()),
                         'fp': pa.array(s.view(np.int64)),
                         'n': pa.array(nn), '_new': pa.array(mx)},
                        schema=tag_schema)

    # prior state (if any) joins the merge as _new=0 rows
    os.makedirs(state_dir, exist_ok=True)
    man_path = os.path.join(state_dir, 'manifest.json')
    manifest = {'version': -1, 'dir': None, 'n_convs': 0,
                'ingest_keys': []}
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
    # replay guard: merging the SAME shard twice would double its
    # fingerprint sums (fp -> 2fp) and silently break future matching
    # for those conversations — an at-least-once pipeline MUST pass a
    # stable ingest_key (file digest, offset range) so a redelivery
    # fails loudly instead of corrupting state
    if ingest_key is not None \
            and ingest_key in manifest.get('ingest_keys', []):
        raise ValueError(
            f'conversation_exact_dedup_incremental: ingest_key '
            f'{ingest_key!r} was already applied to {state_dir!r} — '
            f'replaying a shard would double its fingerprints')
    # hash-mode guard: fingerprints from different hash families can
    # NEVER match — merging them silently breaks all future dedup for
    # prior conversations, so the state remembers its mode and a
    # mismatched ingest fails loudly (same discipline as the replay
    # guard). Legacy manifests (no field) are 'pandas'.
    state_mode = manifest.get('hash_mode', 'pandas')
    if manifest['dir'] is not None and state_mode != hash_mode:
        raise ValueError(
            f'conversation_exact_dedup_incremental: state under '
            f'{state_dir!r} was built with hash_mode={state_mode!r}; '
            f'this ingest uses {hash_mode!r} — fingerprints would '
            f'never match. Re-ingest from scratch or pass '
            f'hash_mode={state_mode!r}')
    manifest['hash_mode'] = hash_mode

    new_parts = new_ds.map_batches(partials, batch_format='pyarrow',
                                   zero_copy_batch=True)
    if manifest['dir'] is not None:
        vdir = os.path.join(state_dir, manifest['dir'])
        prior = rd.read_parquet(vdir).map_batches(
            lambda t: t.append_column(
                '_new', pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format='pyarrow')
        new_parts = new_parts.union(prior)
    merged = bucket_exchange(new_parts, 'conv', merge, num_buckets)\
        .materialize()

    # persist the new version whole, then swap the manifest (a crash
    # before the swap leaves the old version current)
    version = manifest['version'] + 1
    vname = f'v-{version:05d}'
    tmp_dir = os.path.join(state_dir, vname + '.tmp')
    final_dir = os.path.join(state_dir, vname)
    # a crashed prior attempt may have left an orphan tmp or an
    # unreferenced final dir (crash AFTER the dir swap but BEFORE the
    # manifest swap) — both are safe to clear: the manifest still
    # points at the previous version
    import shutil
    for orphan in (tmp_dir, final_dir):
        if os.path.exists(orphan):
            shutil.rmtree(orphan)
    merged.map_batches(lambda t: t.drop_columns(['_new'])
                       .cast(state_schema), batch_format='pyarrow')\
        .write_parquet(tmp_dir)
    os.replace(tmp_dir, final_dir)
    n_convs = merged.count()
    keys = list(manifest.get('ingest_keys', []))
    if ingest_key is not None:
        keys.append(ingest_key)
    man_tmp = man_path + '.tmp'
    with open(man_tmp, 'w') as f:
        json.dump({'version': version, 'dir': vname,
                   'n_convs': n_convs, 'ingest_keys': keys,
                   'hash_mode': hash_mode},
                  f, indent=1, sort_keys=True)
    os.replace(man_tmp, man_path)

    def group_fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column('conv').to_numpy(zero_copy_only=False)
        fp = tbl.column('fp').to_numpy(zero_copy_only=False)
        n = tbl.column('n').to_numpy(zero_copy_only=False)
        nw = tbl.column('_new').to_numpy(zero_copy_only=False)
        df = pd.DataFrame({'conv': conv, 'fp': fp, 'n': n, 'nw': nw})
        rep = df.groupby(['fp', 'n'], sort=False)['conv'].transform('min')
        keep = df['nw'].to_numpy() == 1
        return pa.table({
            conv_col: pa.array(conv[keep], pa.string()),
            'group': pa.array(rep.to_numpy()[keep], pa.string()),
            'n_turns': pa.array(n[keep])}, schema=out_schema)

    out = bucket_exchange(merged, 'fp', group_fn, num_buckets)
    groups = out.union(rd.from_arrow(out_schema.empty_table()))
    return groups, {'version': version, 'dir': vname,
                    'n_convs': n_convs}


def _jw_by_code(ca: np.ndarray, cb: np.ndarray, uniq) -> np.ndarray:
    """Jaro-Winkler micro-similarities for pair rows given factorized
    prefix codes — same result-preserving reductions as
    _editdist_by_code: unordered code-pair dedup (JW is symmetric) and
    the exact-equal fast path (jw6 = 1e6)."""
    n = len(ca)
    nu = len(uniq)
    if n == 0 or nu == 0:
        return np.zeros(n, dtype=np.int64)
    lo = np.minimum(ca, cb).astype(np.int64)
    hi = np.maximum(ca, cb).astype(np.int64)
    ukey, inv = np.unique(lo * nu + hi, return_inverse=True)
    ua, ub = ukey // nu, ukey % nu
    us = np.zeros(len(ukey), dtype=np.int64)
    enc = [s.encode('utf-8') for s in uniq]
    # equal-code fast path: jw(s, s) = 1 EXCEPT the empty string —
    # DuckDB defines jaro of two empties as 0 (dirty-gate find)
    nonempty = np.array([len(e) > 0 for e in enc], dtype=bool)
    us[(ua == ub) & nonempty[ua]] = 1_000_000
    cand = np.nonzero(ua != ub)[0]
    if cand.size:
        us[cand] = T.jaro_winkler_bytes(
            [enc[i] for i in ua[cand]], [enc[i] for i in ub[cand]])
    return us[inv]


def jw_pairs(ds, block_cols, text_col: str = 'text',
             id_col: str = 'doc_id', prefix_cp: int = 48,
             min_sim6: int = 850_000, num_buckets: int = 16,
             block_docs_max: int | None = 500_000,
             on_oversize: str = 'lsh'):
    """Jaro-Winkler near-dup pairs under equality blocking — the
    similarity twin of ``editdist_pairs``: docs sharing ``block_cols``
    are candidates; a pair is kept when the byte-level Jaro-Winkler of
    the first ``prefix_cp`` CODEPOINTS is >= ``min_sim6`` micro-units.
    Returns (doc_a, doc_b, jw6), doc_a < doc_b, jw6 exact-int
    (functions/text.py:jaro_winkler_bytes — DuckDB
    jaro_winkler_similarity byte parity incl. the >=0.7 boost edge,
    25k-pair differential).

    Same 100-TB shape as editdist_pairs: ONE exchange of (id, block
    key, prefix) rows, per-bucket unique-prefix-pair dedup, one
    vectorized kernel call per bucket; B^2 bounded by the block key.
    Blocks above ``block_docs_max`` get the same census-driven
    treatment as editdist_pairs: ``on_oversize='lsh'`` (default)
    diverts their rows to the _lsh_blocked_pairs prefilter (same JW
    kernel on the candidates — approximate on recall only, for those
    blocks only), 'raise' keeps the loud guard;
    ``block_docs_max=None`` skips the census entirely (one fewer
    exchange when block sizes are known-bounded).
    """
    block_cols = list(block_cols)

    def prep(tbl: pa.Table) -> pa.Table:
        pfx = pc.utf8_slice_codeunits(
            tbl.column(text_col).combine_chunks(), 0, prefix_cp)
        cols = {id_col: tbl.column(id_col), '_pfx': pfx}
        for c in block_cols:
            cols[c] = tbl.column(c)
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format='pyarrow',
                             zero_copy_batch=True)

    def pairs(tbl: pa.Table) -> pa.Table:
        id_t = (tbl.schema.field(id_col).type
                if id_col in tbl.schema.names else pa.int64())
        out_schema = pa.schema([('doc_a', id_t), ('doc_b', id_t),
                                ('jw6', pa.int64())])
        df = tbl.to_pandas()
        if len(df):
            df = df.dropna(subset=block_cols + ['_pfx'])
        if len(df) == 0:
            return out_schema.empty_table()
        codes, uniq = pd.factorize(df['_pfx'], sort=False)
        df = df[[id_col] + block_cols].assign(_pc=codes)
        m = df.merge(df, on=block_cols, suffixes=('_a', '_b'))
        m = m[m[f'{id_col}_a'] < m[f'{id_col}_b']]
        if len(m) == 0:
            return out_schema.empty_table()
        jw = _jw_by_code(m['_pc_a'].to_numpy(),
                         m['_pc_b'].to_numpy(), uniq)
        keep = jw >= min_sim6
        m = m[keep]
        return pa.table({
            'doc_a': pa.array(m[f'{id_col}_a'].to_numpy(), type=id_t),
            'doc_b': pa.array(m[f'{id_col}_b'].to_numpy(), type=id_t),
            'jw6': pa.array(jw[keep], type=pa.int64())})

    from .conversations import bucket_exchange, key_hash
    if block_docs_max is None:
        return bucket_exchange(prepped.repartition(num_buckets),
                               block_cols, pairs, num_buckets)

    from .aggregate import bucket_aggregate
    prepped = prepped.materialize()
    census = bucket_aggregate(prepped, block_cols,
                              {'_n': (id_col, 'count')}, num_buckets=8)
    mega_df = census.map_batches(
        lambda t, _m=block_docs_max: t.filter(
            pc.greater(t.column('_n'), _m)),
        batch_format='pyarrow', zero_copy_batch=True).to_pandas()
    if len(mega_df):
        mega_df = mega_df.dropna(subset=block_cols)
    if len(mega_df) == 0:
        return bucket_exchange(prepped.repartition(num_buckets),
                               block_cols, pairs, num_buckets)
    if on_oversize != 'lsh':
        worst = int(mega_df['_n'].max())
        raise ValueError(
            f'jw_pairs: a block key is shared by {worst} docs '
            f'(> block_docs_max={block_docs_max}) — add a '
            'discriminating block column, raise block_docs_max, or use '
            "on_oversize='lsh' for the automatic LSH-prefilter "
            'escalation')

    pschema = prepped.schema()          # materialized — no execution
    ptypes = dict(zip(pschema.names, pschema.types))
    kt = pa.Table.from_pandas(
        mega_df[block_cols], preserve_index=False,
        schema=pa.schema([(c, ptypes[c]) for c in block_cols]))
    mega_h = np.sort(key_hash(kt, block_cols))

    def split(tbl: pa.Table, keep_mega: bool) -> pa.Table:
        m = np.isin(key_hash(tbl, block_cols), mega_h)
        return tbl.filter(pa.array(m if keep_mega else ~m))

    cold = prepped.map_batches(lambda t: split(t, False),
                               batch_format='pyarrow',
                               zero_copy_batch=True)
    cold_pairs = bucket_exchange(cold.repartition(num_buckets),
                                 block_cols, pairs, num_buckets)

    def _jw_verify(ca, cb, uniq):
        jw = _jw_by_code(ca, cb, uniq)
        return jw, jw >= min_sim6

    mega_rows = prepped.map_batches(lambda t: split(t, True),
                                    batch_format='pyarrow',
                                    zero_copy_batch=True)
    mega_out = _lsh_blocked_pairs(mega_rows, pschema, block_cols,
                                  id_col, _jw_verify, 'jw6',
                                  num_buckets)
    return cold_pairs.union(mega_out)
