"""Job entry point for ``ray job submit`` / CLI runs.

    python -m trafaret_ray.run --input /data/transcripts --out /data/out \
        [--num-buckets 256] [--gap-minutes 30] [--max-group-rows 1000000] \
        [--num-cpus N]

Runs the checkpointed flagship pipeline (validate → quarantine split →
exchange → features → partitioned write + lineage metrics). Re-running
with the same --out resumes: completed stages are skipped via their
_SUCCESS markers. On a cluster, submit with ``ray job submit --
python -m trafaret_ray.run ...`` and omit --num-cpus (the job uses the
cluster's resources; streaming execution end-to-end).

``--pipeline curate`` instead runs the corpus-curation pipeline
(normalize → language/quality gate → exact dedup → near-dedup keep-
canonical) over a documents-shaped parquet input:

    python -m trafaret_ray.run --pipeline curate --input docs/ \
        --out curated/ [--langs en,de] [--min-words 5] \
        [--near-threshold 0.7]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--input', required=True,
                   help='parquet path/dir of transcripts (input_hint schema)')
    p.add_argument('--out', required=True, help='output directory')
    p.add_argument('--pipeline',
                   choices=('flagship', 'curate', 'incremental',
                            'conv-dedup'),
                   default='flagship',
                   help='flagship transcript features (default) or the '
                        'documents corpus-curation pipeline')
    p.add_argument('--num-buckets', type=int, default=256)
    p.add_argument('--gap-minutes', type=float, default=30.0)
    p.add_argument('--batch-size', type=int, default=131072)
    p.add_argument('--max-group-rows', type=int, default=None,
                   help='enable skew salting above this conversation size')
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--num-cpus', type=int, default=None,
                   help='local-mode CPU count (omit on a real cluster)')
    # curate-only options
    p.add_argument('--langs', default='en,de,es',
                   help='comma-separated language allowlist (curate)')
    p.add_argument('--min-words', type=int, default=5)
    p.add_argument('--near-threshold', type=float, default=0.7)
    p.add_argument('--id-col', default='doc_id')
    p.add_argument('--text-col', default='text')
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kwargs = {'include_dashboard': False, 'logging_level': 'ERROR'}
        if args.num_cpus is not None:
            kwargs.update(address='local', num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    ctx.target_max_block_size = 512 * 1024 * 1024

    if args.pipeline == 'curate':
        import time
        import ray.data as rd
        from trafaret_ray.pipelines.curation import curate_documents
        t0 = time.perf_counter()
        ds = rd.read_parquet(args.input)
        n_in = ds.count()
        curated = curate_documents(
            ds, id_col=args.id_col, text_col=args.text_col,
            langs=tuple(s for s in args.langs.split(',') if s),
            min_words=args.min_words,
            near_threshold=args.near_threshold,
            num_buckets=args.num_buckets)
        # atomic output: write to a temp dir, then swap — re-running
        # with the same --out must not APPEND new UUID-named part files
        # next to a previous run's (duplicated corpus + 2x docs_kept)
        import os
        import shutil
        tmp_out = args.out.rstrip('/') + '.tmp'
        shutil.rmtree(tmp_out, ignore_errors=True)
        curated.write_parquet(tmp_out)
        shutil.rmtree(args.out, ignore_errors=True)
        os.replace(tmp_out, args.out)
        n_out = rd.read_parquet(args.out).count()
        metrics = {'pipeline': 'curate', 'docs_in': n_in,
                   'docs_kept': n_out,
                   'wall_s': round(time.perf_counter() - t0, 3)}
    elif args.pipeline == 'conv-dedup':
        # conversation-level dedup over the transcripts input: exact
        # fingerprint groups + MinHash near-dup clusters, each written
        # atomically under --out
        import time
        import os
        import shutil
        import ray.data as rd
        from trafaret_ray.stages.dedup import (
            conversation_exact_dedup, conversation_minhash_dedup)
        t0 = time.perf_counter()
        ds = rd.read_parquet(args.input)
        outs = {}
        for name, res in (
                ('exact', conversation_exact_dedup(
                    ds, num_buckets=args.num_buckets)),
                ('near', conversation_minhash_dedup(
                    ds, threshold=args.near_threshold,
                    num_buckets=args.num_buckets))):
            sub = os.path.join(args.out, name)
            tmp = sub + '.tmp'
            shutil.rmtree(tmp, ignore_errors=True)
            res.write_parquet(tmp)
            shutil.rmtree(sub, ignore_errors=True)
            os.makedirs(args.out, exist_ok=True)
            os.replace(tmp, sub)
            outs[name] = rd.read_parquet(sub).count()
        metrics = {'pipeline': 'conv-dedup',
                   'conversations': outs['exact'],
                   'near_dup_clustered': outs['near'],
                   'wall_s': round(time.perf_counter() - t0, 3)}
    elif args.pipeline == 'incremental':
        # --input is a DIRECTORY of immutable parquet shards; only
        # unseen files run (pipelines/flagship.py:run_incremental)
        from trafaret_ray.pipelines.flagship import run_incremental
        metrics = run_incremental(
            args.input, args.out,
            num_buckets=args.num_buckets,
            gap_us=int(args.gap_minutes * 60 * 1_000_000),
            batch_size=args.batch_size,
            resume=not args.no_resume,
            max_group_rows=args.max_group_rows,
        )
    else:
        from trafaret_ray.pipelines.flagship import run_flagship
        metrics = run_flagship(
            args.input, args.out,
            num_buckets=args.num_buckets,
            gap_us=int(args.gap_minutes * 60 * 1_000_000),
            batch_size=args.batch_size,
            resume=not args.no_resume,
            max_group_rows=args.max_group_rows,
        )
    print(json.dumps(metrics, sort_keys=True))
    ray.shutdown()


if __name__ == '__main__':
    main()
