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
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--input', required=True,
                   help='parquet path/dir of transcripts (input_hint schema)')
    p.add_argument('--out', required=True, help='output directory')
    p.add_argument('--num-buckets', type=int, default=256)
    p.add_argument('--gap-minutes', type=float, default=30.0)
    p.add_argument('--batch-size', type=int, default=131072)
    p.add_argument('--max-group-rows', type=int, default=None,
                   help='enable skew salting above this conversation size')
    p.add_argument('--no-resume', action='store_true')
    p.add_argument('--num-cpus', type=int, default=None,
                   help='local-mode CPU count (omit on a real cluster)')
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
