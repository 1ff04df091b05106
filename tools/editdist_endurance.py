"""Endurance probe for the blocked-pair family's oversized-block
escalation (stages/dedup._lsh_blocked_pairs): a corpus forced into ONE
equality block ABOVE block_docs_max, where the exact O(B²) expansion is
not computable (~B²/2 pair rows in one task) and the r4 code raised.
The probe measures the LSH-prefilter path's wall-clock and its recall
of a planted near-duplicate family (pairs it emits are exact-kernel
verdicts by construction; only recall is approximate).

Usage: PYTHONPATH=/root/repo python tools/editdist_endurance.py [n_docs]
Prints one JSON line. BASELINE.md holds the records.
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    family = max(2, n_docs // 100)
    import ray
    ray.init(address='local',
             num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '16')),
             include_dashboard=False, logging_level='ERROR')
    import ray.data as rd

    from trafaret_ray.stages.dedup import editdist_pairs

    rng = np.random.default_rng(3)
    base = 'the quick brown fox jumps over the lazy dog tonight again'
    texts = []
    fam_ids = []
    for i in range(n_docs):
        s = list(base)
        if i % 100 == 0:
            # planted family: <=2 scattered edits, stays near-identical
            for _ in range(int(rng.integers(0, 3))):
                s[int(rng.integers(0, len(s)))] = \
                    chr(ord('a') + int(rng.integers(0, 26)))
            fam_ids.append(i)
        else:
            # heavy edits: not near-dups of anything
            for _ in range(20):
                s[int(rng.integers(0, len(s)))] = \
                    chr(ord('a') + int(rng.integers(0, 26)))
        texts.append(''.join(s))
    t = pa.table({
        'doc_id': pa.array(np.arange(n_docs, dtype=np.int64)),
        'text': pa.array(texts),
        'lang': pa.array(['en'] * n_docs),
        'band': pa.array(np.zeros(n_docs, dtype=np.int64))})

    t0 = time.time()
    out = editdist_pairs(rd.from_arrow(t), ['lang', 'band'], max_dist=6,
                         num_buckets=16, fanout_block_docs=1000,
                         block_docs_max=max(1000, n_docs // 6)
                         ).to_pandas()
    dt = time.time() - t0

    fam = set(fam_ids)
    fam_pairs = sum(1 for a, b in zip(out['doc_a'], out['doc_b'])
                    if a in fam and b in fam)
    true_pairs = len(fam) * (len(fam) - 1) // 2
    print(json.dumps({
        'n_docs': n_docs, 'wall_sec': round(dt, 2),
        'docs_per_sec': int(n_docs / dt), 'pairs': int(len(out)),
        'planted_family': len(fam),
        'family_pairs_found': int(fam_pairs),
        'family_pairs_true': int(true_pairs),
        'recall': round(fam_pairs / true_pairs, 4) if true_pairs else 1.0,
    }))
    ray.shutdown()


if __name__ == '__main__':
    main()
