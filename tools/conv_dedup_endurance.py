"""Conversation-dedup scale probe: exact + MinHash conv dedup over a
multi-million-turn transcripts corpus with planted duplicate and
near-duplicate conversations.

Usage: PYTHONPATH=/root/repo python tools/conv_dedup_endurance.py [n_turns]
(default 2_000_000). Prints ONE JSON line: wall + turns/s per path +
planted recall. Inputs are cached under /tmp keyed by size."""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_corpus(path: str, n_turns: int, n_plant: int = 2000) -> None:
    """Sharded transcripts + one 'dup' shard (verbatim copies of the
    first n_plant conversations of shard 0) and one 'near' shard (same
    conversations, one-token edit per text)."""
    from trafaret_ray.sources.transcripts import write_transcripts
    os.makedirs(path, exist_ok=True)
    write_transcripts(path, n_turns=n_turns, seed=42, malformed_frac=0.0)
    t0 = pq.read_table(os.path.join(path, 'part-00000.parquet'))
    uniq = pc.unique(t0.column('conv_id'))[:n_plant]
    sub = t0.filter(pc.is_in(t0.column('conv_id'), value_set=uniq))

    def prefixed(tbl: pa.Table, prefix: str, edit: bool) -> pa.Table:
        cid = pc.binary_join_element_wise(
            pa.array([prefix] * tbl.num_rows), tbl.column('conv_id')
            .cast(pa.string()).combine_chunks(), '')
        tbl = tbl.set_column(tbl.schema.get_field_index('conv_id'),
                             'conv_id', cid)
        if edit:
            # deterministically edit ~1 in 6 turns' text
            h = np.arange(tbl.num_rows) % 6 == 0
            txt = tbl.column('text').cast(pa.string()).combine_chunks()
            edited = pc.binary_join_element_wise(
                pc.fill_null(txt, ''),
                pa.array([' probe-edit'] * tbl.num_rows), '')
            new = pc.if_else(pa.array(h), edited, txt)
            tbl = tbl.set_column(tbl.schema.get_field_index('text'),
                                 'text', new)
        return tbl

    pq.write_table(prefixed(sub, 'dup-', False),
                   os.path.join(path, 'part-dup.parquet'))
    pq.write_table(prefixed(sub, 'near-', True),
                   os.path.join(path, 'part-near.parquet'))


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    path = f'/tmp/trafaret_ray_conv_dedup_{n_turns}'
    if not os.path.exists(os.path.join(path, 'part-near.parquet')):
        build_corpus(path, n_turns)

    import ray
    import ray.data as rd
    ray.init(address='local', num_cpus=32, include_dashboard=False,
             logging_level='ERROR')
    from bench import _tune
    from ray.data.context import DataContext
    _tune(DataContext.get_current())
    from trafaret_ray.stages.dedup import (conversation_exact_dedup,
                                           conversation_minhash_dedup)
    out = {'n_turns': n_turns}

    ds = rd.read_parquet(path)
    total = ds.count()
    out['total_turns'] = total

    t0 = time.time()
    hm = os.environ.get('GRAFT_CONV_HASH_MODE', 'pandas')
    ex = conversation_exact_dedup(ds, num_buckets=64,
                                  hash_mode=hm).materialize()
    out['exact_sec'] = round(time.time() - t0, 2)
    out['exact_turns_per_sec'] = int(total / out['exact_sec'])
    dup = ex.filter(
        lambda r: r['conv_id'].startswith('dup-'))
    ddf = dup.to_pandas()
    out['exact_planted'] = len(ddf)
    out['exact_recall'] = round(float(
        (ddf['group'] == ddf['conv_id'].str[4:]).mean()), 4) \
        if len(ddf) else None

    t0 = time.time()
    kw = {}
    if os.environ.get('GRAFT_CONV_CARRIED_MAX'):
        kw['carried_sig_max'] = int(os.environ['GRAFT_CONV_CARRIED_MAX'])
    kw['hash_mode'] = hm
    mh = conversation_minhash_dedup(ds, threshold=0.5,
                                    num_buckets=64, **kw).materialize()
    out['minhash_sec'] = round(time.time() - t0, 2)
    out['minhash_turns_per_sec'] = int(total / out['minhash_sec'])
    mdf = mh.to_pandas()
    nb = mdf[mdf['conv_id'].str.startswith('near-')]
    db = mdf[mdf['conv_id'].str.startswith('dup-')]
    out['minhash_clustered'] = len(mdf)
    out['minhash_near_recall'] = round(float(
        (nb['group'] == nb['conv_id'].str[5:]).mean()), 4) \
        if len(nb) else None
    out['minhash_dup_recall'] = round(float(
        (db['group'] == db['conv_id'].str[4:]).mean()), 4) \
        if len(db) else None
    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
