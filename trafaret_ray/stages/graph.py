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
        labels = bucket_aggregate(cand, ['node'],
                                  {'label': ('label', 'min')},
                                  num_buckets=num_buckets).materialize()
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
