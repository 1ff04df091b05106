"""Distributed connected components via min-label propagation.

The clustering step of near-duplicate dedup is a connected-components
problem over verified duplicate edges. A driver-side union-find bounds
the job by driver memory; this operator keeps ALL state distributed:
labels live in a Dataset and each iteration is exactly TWO hash-bucket
exchanges over (int64, int64) rows — one join propagating labels across
both edge directions at once, one min-aggregate — with labels
materialized per round. Convergence is detected from the label sum (a
monotonically non-increasing integer; unchanged == fixpoint), computed
as a distributed Sum aggregate — one scalar reaches the driver per
round.

Converges in O(component diameter) iterations; near-dup clusters are
low-diameter (near-cliques), so 2-4 iterations is typical. Node ids
must be non-negative (-1 is the internal edge/label tag).

Small edge sets (<= ``local_edges_max``) skip the iteration entirely and
cluster in a single Ray task (``_local_cc``) — every per-round exchange
is pure fixed overhead at that size. Both paths emit the same labeling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregate import bucket_aggregate
from .conversations import bucket_exchange


def _empty_nl() -> pa.Table:
    return pa.table({'node': pa.array([], pa.int64()),
                     'label': pa.array([], pa.int64())})


def _local_cc(tbl: pa.Table, src: str, dst: str) -> pa.Table:
    """Whole-graph components inside ONE task: vectorized min-label
    hooking (np.minimum.at over both edge directions) + pointer-doubling
    compression (lab = lab[lab]) until fixpoint — O(E) work per round,
    O(log diameter) rounds. Labels are indices into the SORTED unique
    node array, so min index == min node id: the output labeling is
    byte-identical to the distributed propagation path."""
    if tbl.num_rows == 0:
        return pa.table({'node': pa.array([], pa.int64()),
                         'component': pa.array([], pa.int64())})
    a = tbl.column(src).combine_chunks().cast(pa.int64())\
        .to_numpy(zero_copy_only=False)
    b = tbl.column(dst).combine_chunks().cast(pa.int64())\
        .to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
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
    return pa.table({'node': pa.array(nodes),
                     'component': pa.array(nodes[lab])})


def connected_components(edges, src: str = 'src', dst: str = 'dst',
                         num_buckets: int = 16, max_iters: int = 25,
                         local_edges_max: int = 2_000_000):
    """edges: Dataset of int64 (src, dst) pairs -> Dataset of
    (node, component) where component = min node id in the component
    (identical labeling to a min-root union-find).

    SIZE-AWARE SHAPE: verified-duplicate edge sets are tiny relative to
    the corpus (LSH-bounded), and the iterative propagation pays 2-3
    pipeline executions PER ROUND — measured 3.4-5.5 s on a 256-edge
    graph on this VM, all Ray floor. When the edge count (free: input is
    materialized) is <= ``local_edges_max`` (~32 MB of int64 pairs), the
    whole graph clusters in ONE Ray task via ``_local_cc`` instead —
    same output, one execution. Larger graphs take the distributed
    propagation path unchanged. Pass ``local_edges_max=0`` to force the
    distributed path."""
    # both paths consume `edges` at least twice — materialize once
    # (no-op if the caller already did, the common case)
    edges = edges.materialize()
    if local_edges_max and edges.count() <= local_edges_max:
        return edges.repartition(1).map_batches(
            lambda t: _local_cc(t, src, dst), batch_format='pyarrow',
            zero_copy_batch=True)

    def init_nodes(tbl: pa.Table) -> pa.Table:
        n = pa.concat_arrays([
            tbl.column(src).combine_chunks().cast(pa.int64()),
            tbl.column(dst).combine_chunks().cast(pa.int64())])
        return pa.table({'node': n, 'label': n})

    labels = bucket_aggregate(
        edges.map_batches(init_nodes, batch_format='pyarrow',
                          zero_copy_batch=True),
        ['node'], {'label': ('label', 'min')},
        num_buckets=num_buckets).materialize()

    # both directions tagged once: each edge contributes (src, peer=dst)
    # and (dst, peer=src) rows keyed by the label-holding node
    def tag_edges(tbl: pa.Table) -> pa.Table:
        a = tbl.column(src).combine_chunks().cast(pa.int64())
        b = tbl.column(dst).combine_chunks().cast(pa.int64())
        return pa.table({
            'node': pa.concat_arrays([a, b]),
            'peer': pa.concat_arrays([b, a]),
            'label': pa.array(np.full(2 * tbl.num_rows, -1,
                                      dtype=np.int64)),
        })

    tagged_edges = edges.map_batches(tag_edges, batch_format='pyarrow',
                                     zero_copy_batch=True).materialize()

    def tag_labels(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column('node'),
            'peer': pa.array(np.full(tbl.num_rows, -1, dtype=np.int64)),
            'label': tbl.column('label'),
        })

    def join_bucket(tbl: pa.Table) -> pa.Table:
        """Per node-bucket: send this node's label to every peer, and
        keep the node's own label row (so one downstream min-aggregate
        sees both candidates)."""
        if tbl.num_rows == 0:
            return _empty_nl()
        df = tbl.to_pandas()
        lab = df[df['peer'] == -1][['node', 'label']]
        edg = df[df['peer'] != -1][['node', 'peer']]
        m = edg.merge(lab, on='node', how='inner')
        return pa.table({
            'node': pa.array(np.concatenate([
                m['peer'].to_numpy(np.int64),
                lab['node'].to_numpy(np.int64)])),
            'label': pa.array(np.concatenate([
                m['label'].to_numpy(np.int64),
                lab['label'].to_numpy(np.int64)])),
        })

    def label_sum(lbl) -> int:
        # distributed Sum aggregate over the materialized labels — ONE
        # int64 scalar reaches the driver per round, not O(nodes) rows
        s = lbl.sum('label')
        return int(s) if s is not None else 0

    prev = label_sum(labels)
    converged = False
    for _ in range(max_iters):
        both = tagged_edges.union(
            labels.map_batches(tag_labels, batch_format='pyarrow'))
        cand = bucket_exchange(both, 'node', join_bucket, num_buckets)
        # repartition BOUNDS the label block count: a sort's output
        # block count equals its input's, and the per-round union would
        # otherwise compound it round over round (task count then grows
        # linearly per round — measured 11s -> 42s/round by iteration 10
        # on a 1M-edge graph before the cap)
        labels = bucket_aggregate(cand, ['node'],
                                  {'label': ('label', 'min')},
                                  num_buckets=num_buckets)\
            .repartition(num_buckets).materialize()
        cur = label_sum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        import warnings
        warnings.warn(
            f'connected_components: no fixpoint after {max_iters} '
            'iterations — labels may split long-diameter components; '
            'raise max_iters', RuntimeWarning)

    return labels.map_batches(
        lambda t: t.rename_columns(['node', 'component']),
        batch_format='pyarrow')


# ---------------------------------------------------------------------------
# PageRank — integer fixed-point power iteration
# ---------------------------------------------------------------------------

_PR_R = 10**9          # rank mass scale: total graph mass == 1e9
_PR_D6 = 850_000       # damping 0.85 in 1e-6 units


def _pr_new9(in9, dangling_share9: int, base9: int,
             damping6: int):
    """rank' = base + d*(in + dangling_share), all int64 floor ops —
    exact integer arithmetic, so the result is independent of edge
    order, block boundaries and summation order (the --shuffled
    self-parity bar for rows-only operators). Headroom: damping6
    (<=1e6) * in9 (<= total mass 1e9) = 1e15 << int64."""
    return base9 + (damping6 * (in9 + dangling_share9)) // 10**6


def _local_pagerank(tbl: pa.Table, src: str, dst: str,
                    iters: int, damping6: int) -> pa.Table:
    """Whole-graph PageRank inside ONE task: the same fixed-point
    update as the distributed path (identical floor arithmetic -> the
    two paths are byte-identical, pinned in tests/test_graph.py)."""
    if tbl.num_rows == 0:
        return pa.table({'node': pa.array([], pa.int64()),
                         'rank': pa.array([], pa.float64())})
    a = tbl.column(src).combine_chunks().cast(pa.int64())\
        .to_numpy(zero_copy_only=False)
    b = tbl.column(dst).combine_chunks().cast(pa.int64())\
        .to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, ai, 1)
    dangling = outdeg == 0
    base9 = ((10**6 - damping6) * _PR_R) // (10**6 * n)
    rank9 = np.full(n, _PR_R // n, dtype=np.int64)
    for _ in range(iters):
        contrib = rank9[ai] // outdeg[ai]
        in9 = np.zeros(n, dtype=np.int64)
        np.add.at(in9, bi, contrib)
        dshare9 = int(rank9[dangling].sum()) // n
        rank9 = _pr_new9(in9, dshare9, base9, damping6)
    return pa.table({'node': pa.array(nodes),
                     'rank': pa.array(rank9 / _PR_R)})


def pagerank(edges, src: str = 'src', dst: str = 'dst',
             iters: int = 20, damping: float = 0.85,
             num_buckets: int = 16, local_edges_max: int = 2_000_000):
    """edges: Dataset of int64 (src, dst) pairs -> Dataset of
    (node, rank), rank in [0, 1], total ~1 (floor-rounding leaks
    < outdeg/1e9 mass per node per iteration — deterministic).

    All arithmetic is int64 fixed-point (mass scale 1e9, damping 1e6):
    integer sums are associative, so ranks are EXACTLY reproducible
    under any edge order, partitioning or batch boundary — the same
    determinism contract as the dedup fingerprints. Dangling nodes
    redistribute their mass uniformly (standard PageRank).

    SIZE-AWARE SHAPE (same policy as connected_components): edge sets
    <= ``local_edges_max`` run in ONE task via ``_local_pagerank``;
    larger graphs run the distributed power iteration — per round, one
    tiny scalar Sum (dangling mass), one src-keyed exchange scattering
    rank/outdeg onto edges, one dst-keyed sum of contributions, and one
    node-keyed merge back onto the static degree table. Each round's
    state is one (node, outdeg, rank9) Dataset — O(nodes) rows, never
    the edge payload."""
    import pyarrow.compute as pc

    damping6 = int(round(damping * 10**6))
    edges = edges.materialize()
    if local_edges_max and edges.count() <= local_edges_max:
        return edges.repartition(1).map_batches(
            lambda t: _local_pagerank(t, src, dst, iters, damping6),
            batch_format='pyarrow', zero_copy_batch=True)

    def init_nodes(tbl: pa.Table) -> pa.Table:
        s = tbl.column(src).combine_chunks().cast(pa.int64())
        d = tbl.column(dst).combine_chunks().cast(pa.int64())
        deg = pa.concat_arrays([
            pa.array(np.ones(len(s), dtype=np.int64)),
            pa.array(np.zeros(len(d), dtype=np.int64))])
        return pa.table({'node': pa.concat_arrays([s, d]), 'outdeg': deg})

    nodes_deg = bucket_aggregate(
        edges.map_batches(init_nodes, batch_format='pyarrow',
                          zero_copy_batch=True),
        ['node'], {'outdeg': ('outdeg', 'sum')},
        num_buckets=num_buckets).materialize()
    n = nodes_deg.count()
    if n == 0:
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            'node': pa.array([], pa.int64()),
            'rank': pa.array([], pa.float64())}))
    base9 = ((10**6 - damping6) * _PR_R) // (10**6 * n)

    def seed(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            'rank9', pa.array(np.full(tbl.num_rows, _PR_R // n,
                                      dtype=np.int64)))

    ranks = nodes_deg.map_batches(seed, batch_format='pyarrow')\
        .materialize()

    # static edge rows for the src-keyed scatter (dst >= 0 tags an edge
    # row; rank rows ride with dst == -1)
    def tag_edges(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column(src).combine_chunks().cast(pa.int64()),
            'dst': tbl.column(dst).combine_chunks().cast(pa.int64()),
            'outdeg': pa.array(np.full(tbl.num_rows, -1, np.int64)),
            'rank9': pa.array(np.full(tbl.num_rows, -1, np.int64)),
        })

    tagged_edges = edges.map_batches(tag_edges, batch_format='pyarrow',
                                     zero_copy_batch=True).materialize()

    def tag_ranks(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column('node'),
            'dst': pa.array(np.full(tbl.num_rows, -1, np.int64)),
            'outdeg': tbl.column('outdeg'),
            'rank9': tbl.column('rank9'),
        })

    _EMPTY_C = pa.table({'node': pa.array([], pa.int64()),
                         'in9': pa.array([], pa.int64())})

    def scatter(tbl: pa.Table) -> pa.Table:
        """Per src-bucket: contribution rank9//outdeg to each out-edge,
        PARTIALLY pre-summed per dst inside the bucket (cuts the next
        exchange from O(edges) to O(distinct dst) rows). Vectorized:
        searchsorted rank-row lookup, bincount partial sums — exact,
        every value <= 1e9 mass < 2^53 so the float pathway is
        integer-lossless."""
        if tbl.num_rows == 0:
            return _EMPTY_C
        node = tbl.column('node').to_numpy(zero_copy_only=False)
        dstv = tbl.column('dst').to_numpy(zero_copy_only=False)
        outd = tbl.column('outdeg').to_numpy(zero_copy_only=False)
        rk9 = tbl.column('rank9').to_numpy(zero_copy_only=False)
        is_rank = dstv == -1
        rn, rdeg, rr = node[is_rank], outd[is_rank], rk9[is_rank]
        en, ed = node[~is_rank], dstv[~is_rank]
        if len(en) == 0 or len(rn) == 0:
            return _EMPTY_C
        order = np.argsort(rn, kind='stable')   # one rank row per node
        rn_s = rn[order]
        # dangling rank rows (outdeg 0) are never matched by an edge —
        # the max(.,1) only silences the unused division
        contrib_s = rr[order] // np.maximum(rdeg[order], 1)
        pos = np.searchsorted(rn_s, en)
        ok = (pos < len(rn_s)) & (rn_s[np.minimum(pos, len(rn_s) - 1)]
                                  == en)
        c = contrib_s[pos[ok]]
        ud, inv = np.unique(ed[ok], return_inverse=True)
        if len(ud) == 0:
            return _EMPTY_C
        sums = np.bincount(inv, weights=c.astype(np.float64))\
            .astype(np.int64)
        return pa.table({'node': pa.array(ud),
                         'in9': pa.array(sums)})

    for _ in range(iters):
        # dangling mass: one int64 scalar to the driver per round
        dang = ranks.map_batches(
            lambda t: pa.table({'d9': pc.if_else(
                pc.equal(t.column('outdeg'), 0),
                t.column('rank9'), pa.scalar(0, pa.int64()))}),
            batch_format='pyarrow').sum('d9')
        dshare9 = int(dang or 0) // n

        both = tagged_edges.union(
            ranks.map_batches(tag_ranks, batch_format='pyarrow'))
        # scatter emits bucket-partial per-dst sums; ``upd`` finishes the
        # aggregation inside the node-keyed merge exchange (integer sums
        # are associative) — TWO exchanges per round, not three
        in_sum = bucket_exchange(both, 'node', scatter, num_buckets)

        # merge contributions back onto the static degree table
        def upd(tbl: pa.Table, _d=dshare9) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table({'node': pa.array([], pa.int64()),
                                 'outdeg': pa.array([], pa.int64()),
                                 'rank9': pa.array([], pa.int64())})
            df = tbl.to_pandas()
            deg = df[df['dst'] == -1]
            ins = df[df['dst'] == -2].groupby('node')['rank9'].sum()
            in9 = deg['node'].map(ins).fillna(0).to_numpy(np.int64)
            return pa.table({
                'node': pa.array(deg['node'].to_numpy(np.int64)),
                'outdeg': pa.array(deg['outdeg'].to_numpy(np.int64)),
                'rank9': pa.array(_pr_new9(in9, _d, base9, damping6)),
            })

        def tag_deg(tbl: pa.Table) -> pa.Table:
            return pa.table({
                'node': tbl.column('node'),
                'dst': pa.array(np.full(tbl.num_rows, -1, np.int64)),
                'outdeg': tbl.column('outdeg'),
                'rank9': pa.array(np.zeros(tbl.num_rows, np.int64)),
            })

        def tag_in(tbl: pa.Table) -> pa.Table:
            return pa.table({
                'node': tbl.column('node'),
                'dst': pa.array(np.full(tbl.num_rows, -2, np.int64)),
                'outdeg': pa.array(np.zeros(tbl.num_rows, np.int64)),
                'rank9': tbl.column('in9'),
            })

        merged = nodes_deg.map_batches(tag_deg, batch_format='pyarrow')\
            .union(in_sum.map_batches(tag_in, batch_format='pyarrow'))
        # repartition bounds the per-round block growth (see the same
        # cap in connected_components)
        ranks = bucket_exchange(merged, 'node', upd, num_buckets)\
            .repartition(num_buckets).materialize()

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column('node'),
            'rank': pa.array(tbl.column('rank9').to_numpy(
                zero_copy_only=False).astype(np.float64) / _PR_R),
        })

    return ranks.map_batches(finish, batch_format='pyarrow')


def _local_triangles(tbl: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """Whole-graph per-node triangle counts in ONE task: the same
    degree-ordered wedge plan as the distributed path (so outputs are
    identical), with the closing-edge membership test a searchsorted
    against the sorted oriented edge keys. Node ids are compacted via
    np.unique first, so key arithmetic never overflows and ids may be
    arbitrary int64."""
    a_t = tbl.schema.field(a_col).type
    out_schema = pa.schema([('node', a_t), ('n_triangles', pa.int64())])
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    a = tbl.column(a_col).to_numpy(zero_copy_only=False)
    b = tbl.column(b_col).to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ac, bc = inv[:len(a)], inv[len(a):]
    n = len(nodes)
    deg = np.bincount(ac, minlength=n) + np.bincount(bc, minlength=n)
    # compact ids preserve original-id order (np.unique is sorted), so
    # (deg, compact-id) ties break exactly like the distributed path
    a_first = (deg[ac] < deg[bc]) | ((deg[ac] == deg[bc]) & (ac < bc))
    src = np.where(a_first, ac, bc)
    dst = np.where(a_first, bc, ac)
    ekey = np.sort(src.astype(np.int64) * n + dst)
    order = np.lexsort((dst, deg[dst], src))
    s, d = src[order], dst[order]
    new = np.ones(len(s), dtype=bool)
    new[1:] = s[1:] != s[:-1]
    gs = np.maximum.accumulate(np.where(new, np.arange(len(s)), 0))
    rep = np.arange(len(s)) - gs
    if rep.sum() == 0:
        return out_schema.empty_table()
    j = np.repeat(np.arange(len(s)), rep)
    slot = np.arange(len(j)) - np.repeat(np.cumsum(rep) - rep, rep)
    i = gs[j] + slot
    v, w, u = d[i], d[j], s[j]
    wkey = v.astype(np.int64) * n + w
    pos = np.searchsorted(ekey, wkey)
    hit = (pos < len(ekey)) & (ekey[np.minimum(pos, len(ekey) - 1)]
                               == wkey)
    cnt = np.bincount(np.concatenate([u[hit], v[hit], w[hit]]),
                      minlength=n).astype(np.int64)
    nz = np.nonzero(cnt)[0]
    return pa.table({'node': pa.array(nodes[nz]).cast(a_t),
                     'n_triangles': pa.array(cnt[nz])},
                    schema=out_schema)


def triangle_counts(edges, num_buckets: int = 16, a_col: str = 'a',
                    b_col: str = 'b',
                    edges_schema: pa.Schema | None = None,
                    local_edges_max: int = 200_000):
    """Per-node triangle participation counts over an undirected simple
    graph (``edges`` rows are (a, b) with a < b, deduplicated).

    Degree-ordered orientation (the compact-forward / node-iterator
    family — Schank & Wagner 2005; Suri & Vassilvitskii, WWW'11 give the
    same shape for MapReduce): every edge is directed from its lower
    (degree, id) endpoint to the higher. Each triangle then has exactly
    ONE wedge (u->v, u->w) whose closing edge is itself oriented v->w,
    so joining oriented wedges against oriented edges counts every
    triangle exactly once, and total wedge rows are bounded by
    sum_u outdeg(u)^2 = O(m^1.5). The orientation is what makes hub
    nodes safe at scale: a hub's edges point INTO it, so its million
    neighbors never pair up at the hub.

    Shape: one endpoint-explode + count exchange (degrees), two
    hash_joins attaching the endpoint degrees (schemas passed
    explicitly — no derived-dataset ``.schema()`` calls), one
    per-source wedge expansion inside a bucket exchange (slot-trick
    pair expansion, no Python loop), one composite-key (v, w)
    hash_join closing the wedges, and one final per-node count.
    Every stage streams; nothing node- or edge-proportional reaches
    the driver. Returns a Dataset of (node, n_triangles), nodes with
    zero triangles omitted (SQL-join parity).

    Edge sets <= ``local_edges_max`` skip the exchanges and count in
    ONE Ray task (``_local_triangles``, identical output — parity
    pinned in tests/test_graph.py); pass ``local_edges_max=0`` to
    force the distributed path.
    """
    from .joins import hash_join

    if edges_schema is None:
        edges_schema = edges.schema()
    # .names/.types (not .field) — Dataset.schema() returns Ray's
    # Schema wrapper, not a pyarrow.Schema
    a_t = dict(zip(edges_schema.names, edges_schema.types))[a_col]

    # edges feed two consumers (degree count + degree join) and the
    # oriented form feeds two more (wedges + closing join): checkpoint
    # each once in the OBJECT STORE so Ray doesn't re-execute the whole
    # upstream lineage per consumer. Both are edge-proportional — they
    # spill, they never touch the driver.
    edges = edges.materialize()

    import ray.data as rd
    out_schema = pa.schema([('node', a_t), ('n_triangles', pa.int64())])

    # SIZE-AWARE SHAPE (same policy as connected_components/pagerank):
    # the distributed plan pays ~6 exchanges of pure fixed overhead on
    # a small graph; below ``local_edges_max`` the whole count runs in
    # ONE Ray task with identical output. The cap is deliberately lower
    # than CC's: wedge expansion is O(m^1.5) worst-case, so 200k edges
    # bounds the single task at ~90M wedge rows even on a near-clique.
    if local_edges_max and edges.count() <= local_edges_max:
        out = edges.repartition(1).map_batches(
            lambda t: _local_triangles(t, a_col, b_col),
            batch_format='pyarrow', zero_copy_batch=True)
        return out.union(rd.from_arrow(out_schema.empty_table()))

    def endpoints(tbl: pa.Table) -> pa.Table:
        a = tbl.column(a_col).combine_chunks()
        b = tbl.column(b_col).combine_chunks()
        return pa.table({'node': pa.concat_arrays(
            [a.cast(a_t), b.cast(a_t)]),
            '_one': pa.array(np.ones(2 * tbl.num_rows, np.int64))})

    degrees = bucket_aggregate(
        edges.map_batches(endpoints, batch_format='pyarrow'),
        ['node'], {'deg': ('_one', 'sum')},
        num_buckets=num_buckets).materialize()
    deg_schema = pa.schema([('node', a_t), ('deg', pa.int64())])

    def as_key(col):
        def f(tbl: pa.Table) -> pa.Table:
            return pa.table({col: tbl.column('node'),
                             'deg_' + col: tbl.column('deg')})
        return f

    ed = hash_join(
        edges, degrees.map_batches(as_key(a_col), batch_format='pyarrow'),
        on=a_col, num_buckets=num_buckets,
        left_schema=edges_schema,
        right_schema=pa.schema([(a_col, a_t), ('deg_' + a_col,
                                               pa.int64())]))
    ed_schema = pa.schema(list(zip(edges_schema.names,
                                   edges_schema.types))
                          + [('deg_' + a_col, pa.int64())])
    ed = hash_join(
        ed, degrees.map_batches(as_key(b_col), batch_format='pyarrow'),
        on=b_col, num_buckets=num_buckets,
        left_schema=ed_schema,
        right_schema=pa.schema([(b_col, a_t), ('deg_' + b_col,
                                               pa.int64())]))

    orient_schema = pa.schema([('src', a_t), ('dst', a_t),
                               ('deg_dst', pa.int64())])

    def orient(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return orient_schema.empty_table()
        a = tbl.column(a_col).to_numpy(zero_copy_only=False)
        b = tbl.column(b_col).to_numpy(zero_copy_only=False)
        da = tbl.column('deg_' + a_col).to_numpy(zero_copy_only=False)
        db = tbl.column('deg_' + b_col).to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            'src': pa.array(np.where(a_first, a, b)),
            'dst': pa.array(np.where(a_first, b, a)),
            'deg_dst': pa.array(np.where(a_first, db, da)),
        }, schema=orient_schema)

    oriented = ed.map_batches(orient, batch_format='pyarrow')\
        .materialize()

    wedge_schema = pa.schema([('v', a_t), ('w', a_t), ('u', a_t)])

    def wedges(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return wedge_schema.empty_table()
        # out-neighbors per src, sorted by (deg, id) so pair (i < j)
        # reproduces the closing edge's own orientation v -> w
        t = tbl.sort_by([('src', 'ascending'), ('deg_dst', 'ascending'),
                         ('dst', 'ascending')])
        src = t.column('src').to_numpy(zero_copy_only=False)
        dst = t.column('dst').to_numpy(zero_copy_only=False)
        new = np.ones(len(src), dtype=bool)
        new[1:] = src[1:] != src[:-1]
        gs = np.maximum.accumulate(np.where(new, np.arange(len(src)), 0))
        rep = np.arange(len(src)) - gs          # earlier rows in segment
        if rep.sum() == 0:
            return wedge_schema.empty_table()
        j = np.repeat(np.arange(len(src)), rep)
        slot = np.arange(len(j)) - np.repeat(np.cumsum(rep) - rep, rep)
        i = gs[j] + slot
        return pa.table({'v': pa.array(dst[i]), 'w': pa.array(dst[j]),
                         'u': pa.array(src[j])}, schema=wedge_schema)

    wedge_ds = bucket_exchange(oriented, 'src', wedges,
                               num_buckets=num_buckets)

    def close_key(tbl: pa.Table) -> pa.Table:
        return pa.table({'v': tbl.column('src'), 'w': tbl.column('dst')})

    tri = hash_join(
        wedge_ds, oriented.map_batches(close_key, batch_format='pyarrow'),
        on=['v', 'w'], num_buckets=num_buckets,
        left_schema=wedge_schema,
        right_schema=pa.schema([('v', a_t), ('w', a_t)]))

    def tri_nodes(tbl: pa.Table) -> pa.Table:
        arrs = [tbl.column(c).combine_chunks().cast(a_t)
                for c in ('u', 'v', 'w')]
        return pa.table({'node': pa.concat_arrays(arrs),
                         '_one': pa.array(np.ones(3 * tbl.num_rows,
                                                  np.int64))})

    counts = bucket_aggregate(
        tri.map_batches(tri_nodes, batch_format='pyarrow'),
        ['node'], {'n_triangles': ('_one', 'sum')},
        num_buckets=num_buckets)
    # a triangle-free graph yields an all-empty Dataset, which loses
    # its schema (CLAUDE.md invariant) — union one typed 0-row block so
    # downstream column access survives the legitimate zero-result case
    return counts.union(rd.from_arrow(out_schema.empty_table()))


def _local_kcore(tbl: pa.Table, a_col: str, b_col: str,
                 k: int) -> pa.Table:
    """Whole-graph k-core peel in ONE task: iteratively drop nodes with
    degree < k until fixpoint — vectorized bincount rounds over the
    surviving edge set."""
    a_t = tbl.schema.field(a_col).type
    out_schema = pa.schema([('node', a_t), ('deg', pa.int64())])
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    a = tbl.column(a_col).to_numpy(zero_copy_only=False)
    b = tbl.column(b_col).to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ac, bc = inv[:len(a)], inv[len(a):]
    n = len(nodes)
    while True:
        deg = np.bincount(ac, minlength=n) + np.bincount(bc, minlength=n)
        alive = deg >= k
        keep = alive[ac] & alive[bc]
        if keep.all():
            break
        ac, bc = ac[keep], bc[keep]
        if len(ac) == 0:
            return out_schema.empty_table()
    nz = np.nonzero(deg >= k)[0]
    return pa.table({'node': pa.array(nodes[nz]).cast(a_t),
                     'deg': pa.array(deg[nz].astype(np.int64))},
                    schema=out_schema)


def k_core(edges, k: int, num_buckets: int = 16, a_col: str = 'a',
           b_col: str = 'b', edges_schema: pa.Schema | None = None,
           local_edges_max: int = 200_000, max_iters: int = 50):
    """k-core decomposition (fixed k): iteratively peel nodes of degree
    < k until the surviving subgraph's minimum degree is >= k — the
    web-graph density filter (spam rings and boilerplate clusters
    survive high cores; tails and weakly-attached pages don't).
    Returns (node, deg): the members of the k-core with their degree
    WITHIN the core subgraph.

    Distributed round: one degree count (endpoint-explode +
    bucket_aggregate), then the edge set semi-joins the surviving
    (deg >= k) node table on BOTH endpoints (two hash_joins — each
    side's schema passed explicitly) and repartitions to cap per-round
    block growth (see connected_components). Convergence is a single
    driver scalar per round (surviving-edge count, monotone
    decreasing). Peel rounds are O(graph diameter)-ish on real graphs;
    a path graph at k=2 degenerates to O(n) rounds — ``max_iters``
    caps it with a RuntimeWarning like connected_components.

    Edge sets <= ``local_edges_max`` peel in ONE Ray task
    (``_local_kcore``, identical output); ``local_edges_max=0`` forces
    the distributed path.
    """
    import pyarrow.compute as pc

    from .joins import hash_join

    if edges_schema is None:
        edges_schema = edges.schema()
    a_t = dict(zip(edges_schema.names, edges_schema.types))[a_col]
    out_schema = pa.schema([('node', a_t), ('deg', pa.int64())])
    eschema = pa.schema([(a_col, a_t), (b_col, a_t)])

    import ray.data as rd
    edges = edges.materialize()
    m = edges.count()
    if local_edges_max and m <= local_edges_max:
        out = edges.repartition(1).map_batches(
            lambda t: _local_kcore(t, a_col, b_col, k),
            batch_format='pyarrow', zero_copy_batch=True)
        return out.union(rd.from_arrow(out_schema.empty_table()))

    def endpoints(tbl: pa.Table) -> pa.Table:
        a = tbl.column(a_col).combine_chunks().cast(a_t)
        b = tbl.column(b_col).combine_chunks().cast(a_t)
        return pa.table({'node': pa.concat_arrays([a, b]),
                         '_one': pa.array(np.ones(2 * tbl.num_rows,
                                                  np.int64))})

    def survivors(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.greater_equal(tbl.column('deg'),
                                           pa.scalar(k, pa.int64())))

    degrees = None
    converged = False
    for _ in range(max_iters):
        degrees = bucket_aggregate(
            edges.map_batches(endpoints, batch_format='pyarrow'),
            ['node'], {'deg': ('_one', 'sum')},
            num_buckets=num_buckets).materialize()
        alive = degrees.map_batches(survivors, batch_format='pyarrow')\
            .materialize()

        def keep_key(col):
            def f(tbl: pa.Table) -> pa.Table:
                return pa.table({col: tbl.column('node').combine_chunks()
                                 .cast(a_t)})
            return f

        pruned = hash_join(
            edges, alive.map_batches(keep_key(a_col),
                                     batch_format='pyarrow'),
            on=a_col, num_buckets=num_buckets, left_schema=eschema,
            right_schema=pa.schema([(a_col, a_t)]))
        pruned = hash_join(
            pruned, alive.map_batches(keep_key(b_col),
                                      batch_format='pyarrow'),
            on=b_col, num_buckets=num_buckets, left_schema=eschema,
            right_schema=pa.schema([(b_col, a_t)]))
        pruned = pruned.repartition(num_buckets).materialize()
        m_new = pruned.count()
        if m_new == m:
            converged = True
            break
        edges, m = pruned, m_new
        if m == 0:
            converged = True
            break

    if not converged:
        import warnings
        warnings.warn(
            f'k_core: no fixpoint after {max_iters} peel rounds — '
            'the result may include sub-core nodes; raise max_iters',
            RuntimeWarning)

    if m == 0 or degrees is None:
        return rd.from_arrow(out_schema.empty_table())
    final = bucket_aggregate(
        edges.map_batches(endpoints, batch_format='pyarrow'),
        ['node'], {'deg': ('_one', 'sum')}, num_buckets=num_buckets)
    out = final.map_batches(
        lambda t: pa.table({'node': t.column('node'),
                            'deg': t.column('deg')}, schema=out_schema),
        batch_format='pyarrow')
    return out.union(rd.from_arrow(out_schema.empty_table()))


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous, deterministic tie rule)
# ---------------------------------------------------------------------------

def _lpa_pick(node_idx: np.ndarray, nb_lab: np.ndarray,
              cnt: np.ndarray | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
    """Per-node winning label from (node, neighbor-label[, count]) rows:
    highest count, ties to the SMALLEST label — the deterministic LPA
    update rule shared by the local and distributed paths.
    Returns (nodes, winning labels), nodes ascending."""
    if cnt is None:
        cnt = np.ones(len(node_idx), dtype=np.int64)
    order = np.lexsort((nb_lab, node_idx))
    ni, la, ct = node_idx[order], nb_lab[order], cnt[order]
    if len(ni) == 0:
        return ni, la
    new = np.ones(len(ni), dtype=bool)
    new[1:] = (ni[1:] != ni[:-1]) | (la[1:] != la[:-1])
    starts = np.nonzero(new)[0]
    run_node, run_lab = ni[starts], la[starts]
    csum = np.concatenate([[0], np.cumsum(ct)])
    ends = np.concatenate([starts[1:], [len(ni)]])
    run_cnt = csum[ends] - csum[starts]
    # count is a small positive degree sum — negating for the desc key
    # cannot overflow (the int64.min lexsort trap needs the full range)
    order2 = np.lexsort((run_lab, -run_cnt, run_node))
    rn = run_node[order2]
    first = np.ones(len(rn), dtype=bool)
    first[1:] = rn[1:] != rn[:-1]
    return rn[first], run_lab[order2][first]


def _local_lpa(tbl: pa.Table, a_col: str, b_col: str,
               iters: int) -> pa.Table:
    """Whole-graph synchronous label propagation in ONE task."""
    out_schema = pa.schema([('node', pa.int64()),
                            ('community', pa.int64())])
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    a = tbl.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ac, bc = inv[:len(a)], inv[len(a):]
    nb_src = np.concatenate([ac, bc])
    nb_dst = np.concatenate([bc, ac])
    lab = nodes.copy()
    for _ in range(iters):
        win_nodes, win_lab = _lpa_pick(nb_src, lab[nb_dst])
        new = lab.copy()
        new[win_nodes] = win_lab
        if np.array_equal(new, lab):   # true fixpoint: further rounds
            break                      # are no-ops (parity-safe)
        lab = new
    return pa.table({'node': pa.array(nodes),
                     'community': pa.array(lab)}, schema=out_schema)


def label_propagation(edges, iters: int = 10, num_buckets: int = 16,
                      a_col: str = 'a', b_col: str = 'b',
                      local_edges_max: int = 2_000_000):
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) with a DETERMINISTIC update: every node simultaneously
    adopts its neighbors' most frequent label, ties to the smallest
    label value; labels start as node ids; exactly ``iters`` rounds
    (synchronous LPA may oscillate on bipartite structures — a fixed
    round count keeps the output a pure function of the edge set, so
    the --shuffled self-parity bar holds). Returns (node, community).

    SIZE-AWARE SHAPE (same policy as connected_components): small edge
    sets run in ONE task via ``_local_lpa``; larger graphs run the
    distributed rounds — per round, one node-keyed scatter of labels
    onto both edge directions (labels ride the same exchange as the
    static edge rows), per-bucket partial (peer, label) counts, then a
    node-keyed merge picking the winner with the SAME tie rule
    (``_lpa_pick`` is shared), repartitioned to cap per-round block
    growth. Early exit is deliberately NOT attempted on the distributed
    path: a converged round is a no-op, so running the full ``iters``
    byte-equals the local path's early stop."""
    from .aggregate import bucket_aggregate
    from .conversations import bucket_exchange

    edges = edges.materialize()
    if local_edges_max and edges.count() <= local_edges_max:
        return edges.repartition(1).map_batches(
            lambda t: _local_lpa(t, a_col, b_col, iters),
            batch_format='pyarrow', zero_copy_batch=True)

    def init_nodes(tbl: pa.Table) -> pa.Table:
        n = pa.concat_arrays([
            tbl.column(a_col).combine_chunks().cast(pa.int64()),
            tbl.column(b_col).combine_chunks().cast(pa.int64())])
        return pa.table({'node': n, 'label': n})

    labels = bucket_aggregate(
        edges.map_batches(init_nodes, batch_format='pyarrow',
                          zero_copy_batch=True),
        ['node'], {'label': ('label', 'min')},
        num_buckets=num_buckets).materialize()

    def tag_edges(tbl: pa.Table) -> pa.Table:
        a = tbl.column(a_col).combine_chunks().cast(pa.int64())
        b = tbl.column(b_col).combine_chunks().cast(pa.int64())
        return pa.table({
            'node': pa.concat_arrays([a, b]),
            'peer': pa.concat_arrays([b, a]),
            'label': pa.array(np.full(2 * tbl.num_rows, -1,
                                      dtype=np.int64)),
        })

    tagged_edges = edges.map_batches(tag_edges, batch_format='pyarrow',
                                     zero_copy_batch=True).materialize()

    def tag_labels(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column('node'),
            'peer': pa.array(np.full(tbl.num_rows, -1, dtype=np.int64)),
            'label': tbl.column('label'),
        })

    _CNT_SCHEMA = pa.schema([('node', pa.int64()), ('label', pa.int64()),
                             ('cnt', pa.int64())])

    def scatter(tbl: pa.Table) -> pa.Table:
        """Per node-bucket: each node's label flows to every peer,
        pre-counted per (peer, label) inside the bucket."""
        if tbl.num_rows == 0:
            return _CNT_SCHEMA.empty_table()
        df = tbl.to_pandas()
        lab = df[df['peer'] == -1][['node', 'label']]
        edg = df[df['peer'] != -1][['node', 'peer']]
        m = edg.merge(lab, on='node', how='inner')
        if len(m) == 0:
            return _CNT_SCHEMA.empty_table()
        g = m.groupby(['peer', 'label'], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({'node': pa.array(idx['peer'].to_numpy(np.int64)),
                         'label': pa.array(
                             idx['label'].to_numpy(np.int64)),
                         'cnt': pa.array(g.to_numpy(np.int64))},
                        schema=_CNT_SCHEMA)

    _LAB_SCHEMA = pa.schema([('node', pa.int64()), ('label', pa.int64())])

    def pick(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _LAB_SCHEMA.empty_table()
        n, l = _lpa_pick(
            tbl.column('node').to_numpy(zero_copy_only=False),
            tbl.column('label').to_numpy(zero_copy_only=False),
            tbl.column('cnt').to_numpy(zero_copy_only=False))
        return pa.table({'node': pa.array(n), 'label': pa.array(l)},
                        schema=_LAB_SCHEMA)

    for _ in range(iters):
        both = tagged_edges.union(
            labels.map_batches(tag_labels, batch_format='pyarrow'))
        counts = bucket_exchange(both, 'node', scatter, num_buckets)
        labels = bucket_exchange(counts, 'node', pick, num_buckets)\
            .repartition(num_buckets).materialize()

    return labels.map_batches(
        lambda t: t.rename_columns(['node', 'community']),
        batch_format='pyarrow')


# ---------------------------------------------------------------------------
# DBSCAN over a precomputed eps-neighborhood graph
# ---------------------------------------------------------------------------

def _local_dbscan(edges_tbl: pa.Table, nodes_tbl: pa.Table,
                  min_pts: int, a_col: str = 'a',
                  b_col: str = 'b') -> pa.Table:
    """Whole-graph DBSCAN in one task — the parity reference for the
    distributed composition (same deterministic rules)."""
    out_schema = pa.schema([('node', pa.int64()), ('role', pa.int8()),
                            ('cluster', pa.int64())])
    all_nodes = np.unique(nodes_tbl.column('node')
                          .to_numpy(zero_copy_only=False)
                          .astype(np.int64))
    if len(all_nodes) == 0:
        return out_schema.empty_table()
    a = edges_tbl.column(a_col).to_numpy(zero_copy_only=False)\
        .astype(np.int64)
    b = edges_tbl.column(b_col).to_numpy(zero_copy_only=False)\
        .astype(np.int64)
    idx = {v: i for i, v in enumerate(all_nodes)}
    ai = np.array([idx[v] for v in a], dtype=np.int64)
    bi = np.array([idx[v] for v in b], dtype=np.int64)
    n = len(all_nodes)
    deg = (np.bincount(ai, minlength=n)
           + np.bincount(bi, minlength=n))
    core = deg + 1 >= min_pts
    # min-label union-find over core-core edges
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ai, bi):
        if core[x] and core[y]:
            rx, ry = find(x), find(y)
            if rx != ry:
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
    # component label = min node id: roots compress to min via a pass
    root = np.array([find(i) for i in range(n)])
    comp_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, root[core], all_nodes[core])
    cluster = np.full(n, -1, dtype=np.int64)
    role = np.full(n, 2, dtype=np.int8)            # noise
    cluster[core] = comp_min[root[core]]
    role[core] = 0
    # border: non-core with a core neighbor -> MIN core-neighbor's
    # cluster label (deterministic tie rule)
    for x, y in zip(ai, bi):
        for u, v in ((x, y), (y, x)):
            if not core[u] and core[v]:
                lab = comp_min[root[v]]
                if role[u] == 2 or lab < cluster[u]:
                    role[u] = 1
                    cluster[u] = lab
    return pa.table({'node': pa.array(all_nodes),
                     'role': pa.array(role),
                     'cluster': pa.array(cluster)}, schema=out_schema)


def dbscan_from_edges(edges, nodes, min_pts: int = 4,
                      num_buckets: int = 16, a_col: str = 'a',
                      b_col: str = 'b',
                      edges_schema: pa.Schema | None = None,
                      local_edges_max: int = 2_000_000):
    """DBSCAN given a precomputed eps-neighborhood graph (edges =
    point pairs within eps; ``nodes`` = (node) Dataset of the FULL
    point universe, so isolated points classify as noise).

    PRECONDITION: edges are DISTINCT unordered pairs with a != b (the
    cosine edge builders emit exactly this); duplicate rows or
    self-loops would inflate the degree count and promote false cores
    on both the local and distributed paths identically.

    Rules (deterministic — standard DBSCAN leaves border assignment
    order-dependent, here it is pinned): core iff neighbor count + 1
    >= min_pts; clusters = connected components over core-core edges
    labeled by MIN member id (isolated cores are singleton clusters);
    border = non-core adjacent to >= 1 core, taking the SMALLEST
    adjacent core cluster label; everything else is noise
    (cluster -1). role: 0 core / 1 border / 2 noise.

    Distributed composition (all existing primitives): one degree
    aggregation, two semi-joins pruning to core-core edges,
    connected_components, one core-border scatter + min-aggregate,
    and a final universe left-join — each an exchange-shaped stage.
    Small graphs (<= ``local_edges_max`` edges) run the identical
    rules in ONE task."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .aggregate import bucket_aggregate
    from .joins import hash_join

    out_schema = pa.schema([('node', pa.int64()), ('role', pa.int8()),
                            ('cluster', pa.int64())])
    eschema = pa.schema([(a_col, pa.int64()), (b_col, pa.int64())])
    nschema = pa.schema([('node', pa.int64())])

    def as_nodes(tbl: pa.Table) -> pa.Table:
        return pa.table({'node': tbl.column('node').combine_chunks()
                         .cast(pa.int64())})

    def as_edges(tbl: pa.Table) -> pa.Table:
        return pa.table({
            a_col: tbl.column(a_col).combine_chunks().cast(pa.int64()),
            b_col: tbl.column(b_col).combine_chunks().cast(pa.int64())})

    from .aggregate import bucket_aggregate as _bagg

    edges = edges.map_batches(as_edges, batch_format='pyarrow')\
        .materialize()
    # dedupe the universe: the LOCAL path np.unique's it, and the
    # final universe left-join would otherwise emit one row per
    # duplicate (caught by the endurance probe feeding raw endpoint
    # explodes)
    nodes = _bagg(nodes.map_batches(as_nodes, batch_format='pyarrow'),
                  ['node'], {'node': ('node', 'min')},
                  num_buckets=num_buckets).materialize()
    if local_edges_max and edges.count() <= local_edges_max:
        etbl = pa.concat_tables(
            [t.cast(eschema) for t in
             edges.iter_batches(batch_format='pyarrow') if t.num_rows]
            or [eschema.empty_table()])
        ntbl = pa.concat_tables(
            [t.cast(nschema) for t in
             nodes.iter_batches(batch_format='pyarrow') if t.num_rows]
            or [nschema.empty_table()])
        return rd.from_arrow(_local_dbscan(etbl, ntbl, min_pts,
                                           a_col, b_col))

    # 1. degrees -> core set
    def endpoints(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': pa.concat_arrays(
                [tbl.column(a_col).combine_chunks(),
                 tbl.column(b_col).combine_chunks()]),
            '_one': pa.array(np.ones(2 * tbl.num_rows, np.int64))})

    deg = bucket_aggregate(
        edges.map_batches(endpoints, batch_format='pyarrow'),
        ['node'], {'deg': ('_one', 'sum')},
        num_buckets=num_buckets).materialize()
    core = deg.map_batches(
        lambda t: pa.table({'node': t.column('node').combine_chunks()
                            .cast(pa.int64())},).filter(
            pc.greater_equal(pc.add(t.column('deg').combine_chunks()
                                    .cast(pa.int64()), 1),
                             min_pts)),
        batch_format='pyarrow').materialize()

    # 2. core-core edges -> clusters (CC labels = min member id)
    cc_edges = hash_join(
        edges, core.map_batches(
            lambda t: t.rename_columns([a_col]), batch_format='pyarrow'),
        on=a_col, num_buckets=num_buckets, left_schema=eschema,
        right_schema=pa.schema([(a_col, pa.int64())]))
    cc_edges = hash_join(
        cc_edges, core.map_batches(
            lambda t: t.rename_columns([b_col]), batch_format='pyarrow'),
        on=b_col, num_buckets=num_buckets, left_schema=eschema,
        right_schema=pa.schema([(b_col, pa.int64())]))
    comp = connected_components(cc_edges, src=a_col, dst=b_col,
                                num_buckets=num_buckets).materialize()
    cschema = pa.schema([('node', pa.int64()),
                         ('component', pa.int64())])
    # isolated cores = singleton clusters (own id)
    core_clustered = hash_join(
        core, comp, on='node', how='left', num_buckets=num_buckets,
        left_schema=nschema, right_schema=cschema)

    def fill_own(tbl: pa.Table) -> pa.Table:
        node = tbl.column('node').combine_chunks().cast(pa.int64())
        # left-join padding may floatify (CLAUDE.md) — detect the null
        # through NaN, never a sentinel the data could contain
        compf = pc.cast(tbl.column('component').combine_chunks(),
                        pa.float64()).to_numpy(zero_copy_only=False)
        nodev = node.to_numpy(zero_copy_only=False)
        lab = np.where(np.isnan(compf), nodev, compf).astype(np.int64)
        return pa.table({'node': node, 'cluster': pa.array(lab)})

    core_lab = core_clustered.map_batches(
        fill_own, batch_format='pyarrow').materialize()
    clab_schema = pa.schema([('node', pa.int64()),
                             ('cluster', pa.int64())])

    # 3. border: edges with exactly one core side scatter the core's
    # cluster onto the other side; min per non-core node
    half = edges.map_batches(
        lambda t: pa.table({
            'node': pa.concat_arrays(
                [t.column(a_col).combine_chunks(),
                 t.column(b_col).combine_chunks()]),
            'peer': pa.concat_arrays(
                [t.column(b_col).combine_chunks(),
                 t.column(a_col).combine_chunks()])}),
        batch_format='pyarrow')
    half_schema = pa.schema([('node', pa.int64()), ('peer', pa.int64())])
    # attach the PEER's core cluster (inner join drops non-core peers)
    peer_lab = hash_join(
        half, core_lab.map_batches(
            lambda t: t.rename_columns(['peer', '_plab']),
            batch_format='pyarrow'),
        on='peer', num_buckets=num_buckets, left_schema=half_schema,
        right_schema=pa.schema([('peer', pa.int64()),
                                ('_plab', pa.int64())]))
    cand = bucket_aggregate(
        peer_lab.map_batches(
            lambda t: t.select(['node', '_plab']),
            batch_format='pyarrow'),
        ['node'], {'blab': ('_plab', 'min')},
        num_buckets=num_buckets)
    # non-core only
    border = hash_join(
        cand, core.map_batches(
            lambda t: pa.table({'node': t.column('node'),
                                '_isc': pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format='pyarrow'),
        on='node', how='left', num_buckets=num_buckets,
        left_schema=pa.schema([('node', pa.int64()),
                               ('blab', pa.int64())]),
        right_schema=pa.schema([('node', pa.int64()),
                                ('_isc', pa.int64())]))
    border = border.map_batches(
        lambda t: t.filter(pc.is_null(t.column('_isc')))
        .select(['node', 'blab']), batch_format='pyarrow')

    # 4. assemble over the full universe
    uni = hash_join(nodes, core_lab, on='node', how='left',
                    num_buckets=num_buckets, left_schema=nschema,
                    right_schema=clab_schema)
    uni = hash_join(uni, border, on='node', how='left',
                    num_buckets=num_buckets,
                    left_schema=pa.schema([('node', pa.int64()),
                                           ('cluster', pa.int64())]),
                    right_schema=pa.schema([('node', pa.int64()),
                                            ('blab', pa.int64())]))

    def finish(tbl: pa.Table) -> pa.Table:
        node = tbl.column('node').combine_chunks().cast(pa.int64())
        cl = pc.cast(pc.fill_null(pc.cast(tbl.column('cluster'),
                                          pa.float64()), np.nan),
                     pa.float64())
        bl = pc.cast(pc.fill_null(pc.cast(tbl.column('blab'),
                                          pa.float64()), np.nan),
                     pa.float64())
        clv = cl.to_numpy(zero_copy_only=False)
        blv = bl.to_numpy(zero_copy_only=False)
        is_core = ~np.isnan(clv)
        is_border = np.isnan(clv) & ~np.isnan(blv)
        role = np.where(is_core, 0, np.where(is_border, 1, 2))\
            .astype(np.int8)
        cluster = np.where(is_core, np.nan_to_num(clv, nan=-1),
                           np.where(is_border,
                                    np.nan_to_num(blv, nan=-1), -1))\
            .astype(np.int64)
        return pa.table({'node': node, 'role': pa.array(role),
                         'cluster': pa.array(cluster)},
                        schema=out_schema)

    return uni.map_batches(finish, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance
# ---------------------------------------------------------------------------

def _local_bfs(edges_tbl: pa.Table, seeds: np.ndarray,
               max_hops: int, a_col: str, b_col: str) -> pa.Table:
    """Whole-graph multi-source BFS in one task."""
    out_schema = pa.schema([('node', pa.int64()), ('hops', pa.int64())])
    a = edges_tbl.column(a_col).to_numpy(zero_copy_only=False)\
        .astype(np.int64)
    b = edges_tbl.column(b_col).to_numpy(zero_copy_only=False)\
        .astype(np.int64)
    nodes = np.unique(np.concatenate([a, b, seeds]))
    if len(nodes) == 0:
        return out_schema.empty_table()
    idx = {v: i for i, v in enumerate(nodes)}
    ai = np.array([idx[v] for v in a], dtype=np.int64)
    bi = np.array([idx[v] for v in b], dtype=np.int64)
    dist = np.full(len(nodes), -1, dtype=np.int64)
    dist[np.searchsorted(nodes, np.intersect1d(nodes, seeds))] = 0
    frontier = dist == 0
    for h in range(1, max_hops + 1):
        if not frontier.any():
            break
        nxt = np.zeros(len(nodes), dtype=bool)
        m = frontier[ai]
        nxt[bi[m]] = True
        m = frontier[bi]
        nxt[ai[m]] = True
        nxt &= dist == -1
        dist[nxt] = h
        frontier = nxt
    reached = dist >= 0
    return pa.table({'node': pa.array(nodes[reached]),
                     'hops': pa.array(dist[reached])},
                    schema=out_schema)


def bfs_hops(edges, seeds, max_hops: int = 10, num_buckets: int = 16,
             a_col: str = 'a', b_col: str = 'b',
             local_edges_max: int = 2_000_000):
    """Multi-source BFS hop distance over an undirected edge Dataset:
    (node, hops) for every node within ``max_hops`` of the seed set —
    the quality/trust-propagation primitive (how far is each document
    from a vetted seed cluster). ``seeds``: numpy int64 array.

    Distributed round (same shapes as connected_components): the
    settled (node, hops) table rides one node-keyed exchange with the
    static both-direction edge rows; each bucket scatters the CURRENT
    frontier's hops+1 onto peers; one min-aggregate merges candidates
    with the settled table; the round stops early when the settled
    count stops growing (monotone — a safe distributed fixpoint test
    via one scalar). Exactly BFS because level h's frontier can only
    settle nodes at distance h+1. Small graphs run one task."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .aggregate import bucket_aggregate
    from .conversations import bucket_exchange

    out_schema = pa.schema([('node', pa.int64()), ('hops', pa.int64())])
    seeds = np.asarray(seeds, dtype=np.int64)
    edges = edges.materialize()
    if local_edges_max and edges.count() <= local_edges_max:
        eschema = pa.schema([(a_col, pa.int64()), (b_col, pa.int64())])
        etbl = pa.concat_tables(
            [t.select([a_col, b_col]).cast(eschema) for t in
             edges.iter_batches(batch_format='pyarrow') if t.num_rows]
            or [eschema.empty_table()])
        return rd.from_arrow(_local_bfs(etbl, seeds, max_hops,
                                        a_col, b_col))

    def tag_edges(tbl: pa.Table) -> pa.Table:
        a = tbl.column(a_col).combine_chunks().cast(pa.int64())
        b = tbl.column(b_col).combine_chunks().cast(pa.int64())
        return pa.table({
            'node': pa.concat_arrays([a, b]),
            'peer': pa.concat_arrays([b, a]),
            'hops': pa.array(np.full(2 * tbl.num_rows, -1, np.int64)),
        })

    tagged = edges.map_batches(tag_edges, batch_format='pyarrow',
                               zero_copy_batch=True).materialize()
    settled = rd.from_arrow(pa.table({
        'node': pa.array(np.unique(seeds)),
        'hops': pa.array(np.zeros(len(np.unique(seeds)), np.int64))}))\
        .materialize()
    n_settled = settled.count()

    def tag_state(tbl: pa.Table) -> pa.Table:
        return pa.table({
            'node': tbl.column('node'),
            'peer': pa.array(np.full(tbl.num_rows, -1, np.int64)),
            'hops': tbl.column('hops'),
        })

    _NL = pa.schema([('node', pa.int64()), ('hops', pa.int64())])

    def make_scatter(h: int):
        def scatter(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return _NL.empty_table()
            df = tbl.to_pandas()
            st = df[df['peer'] == -1][['node', 'hops']]
            # keep the settled rows; scatter ONLY the current frontier
            fr = st[st['hops'] == h - 1]
            edg = df[df['peer'] != -1][['node', 'peer']]
            m = edg.merge(fr[['node']], on='node', how='inner')
            return pa.table({
                'node': pa.array(np.concatenate([
                    m['peer'].to_numpy(np.int64),
                    st['node'].to_numpy(np.int64)])),
                'hops': pa.array(np.concatenate([
                    np.full(len(m), h, np.int64),
                    st['hops'].to_numpy(np.int64)])),
            }, schema=_NL)
        return scatter

    for h in range(1, max_hops + 1):
        both = tagged.union(
            settled.map_batches(tag_state, batch_format='pyarrow'))
        cand = bucket_exchange(both, 'node', make_scatter(h),
                               num_buckets)
        settled = bucket_aggregate(
            cand, ['node'], {'hops': ('hops', 'min')},
            num_buckets=num_buckets)\
            .repartition(num_buckets).materialize()
        n_new = settled.count()
        if n_new == n_settled:
            break
        n_settled = n_new

    return settled
