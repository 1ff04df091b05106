"""Event-series endurance run: the per-user kernel family at 10M+ rows.

Generates a deterministic synthetic events table shaped like the
driver's (event_id, ts, user_id, event_type, value, props) with a
Zipf-skewed user distribution (hot users stress the segment kernels
the same way hot conversations stress the flagship), writes it as
multi-row-group parquet under /tmp, then streams the late-r3 per-user
queries over it end-to-end through their exact queries() entry points.
One JSON line of per-path throughput. The sf tables top out at 100k
events — segment-kernel costs and per-user exchange skew only show
beyond ~1M.

Usage: PYTHONPATH=/root/repo python tools/events_endurance.py [n_rows]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TYPES = np.array(['view', 'click', 'purchase', 'signup', 'error'])


def generate(path: str, n_rows: int, n_users: int | None = None,
             seed: int = 11, chunk: int = 1_000_000) -> None:
    n_users = n_users or max(1000, n_rows // 100)
    rng = np.random.default_rng(seed)
    t0 = 1_704_067_200_000_000            # 2024-01-01 in epoch us
    span = 60 * 24 * 3600 * 1_000_000     # 60 days
    with pq.ParquetWriter(path, pa.schema([
            ('event_id', pa.int64()), ('ts', pa.timestamp('us')),
            ('user_id', pa.int64()), ('event_type', pa.string()),
            ('value', pa.float64()), ('props', pa.string())])) as w:
        for lo in range(0, n_rows, chunk):
            n = min(chunk, n_rows - lo)
            # Zipf-skewed users: the zipf(1.2) head user owns ~18%
            # of all events (1/zeta(1.2)) — the hot-entity stressor
            users = np.minimum(rng.zipf(1.2, size=n) - 1, n_users - 1)
            ts = t0 + rng.integers(0, span, size=n)
            w.write_table(pa.table({
                'event_id': pa.array(np.arange(lo, lo + n,
                                               dtype=np.int64)),
                'ts': pa.array(ts).cast(pa.timestamp('us')),
                'user_id': pa.array(users.astype(np.int64)),
                'event_type': pa.array(TYPES[rng.integers(0, 5, n)]),
                'value': pa.array(np.round(
                    rng.exponential(100.0, n), 2)),
                'props': pa.array(['{"k": %d}' % k for k in
                                   rng.integers(0, 100, n)]),
            }))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    sf_dir = f'/tmp/events_endurance_{n_rows}'
    os.makedirs(sf_dir, exist_ok=True)
    path = f'{sf_dir}/events.parquet'
    if not os.path.exists(path):
        t0 = time.time()
        generate(path, n_rows)
        print(f'generated {n_rows} rows in {time.time()-t0:.1f}s '
              f'({os.path.getsize(path)>>20} MiB)', file=sys.stderr)

    import ray
    if not ray.is_initialized():
        ray.init(address='local',
                 num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32')),
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # same execution tuning as bench.py (push-based sort shuffle,
    # 512 MiB blocks) — the probe measures the kernels, not defaults
    sys.path.insert(0, '/root/repo')
    import bench
    bench._tune(DataContext.get_current())

    import pandas as pd

    from trafaret_ray.pipelines import queries as Q

    out = {'n_rows': n_rows, 'mib': os.path.getsize(path) >> 20}
    paths = [
        ('scd2', Q.q_scd2_events),
        ('rolling_median', Q.q_rolling_median_events),
        ('trend', Q.q_trend_events),
        ('twa', Q.q_twa_events),
        ('golden_record', Q.q_golden_record_events),
        ('ohlc', Q.q_ohlc_events),
        ('transitions', Q.q_transitions_events),
        ('feature_matrix', Q.q_feature_matrix_events),
        ('concurrent_sessions', Q.q_concurrent_sessions_events),
    ]
    for name, fn in paths:
        t0 = time.time()
        r = fn(sf_dir)
        n_out = len(r) if isinstance(r, pd.DataFrame) else r.count()
        dt = time.time() - t0
        out[f'{name}_sec'] = round(dt, 2)
        out[f'{name}_rows_per_sec'] = int(n_rows / dt)
        out[f'{name}_out_rows'] = int(n_out)

    # output-budget guard demo: per-user [first,last] event intervals —
    # the Zipf-head user naturally spans the whole 60-day window (the
    # degenerate mega-session). interval_join must RAISE under a 7-day
    # max_span instead of silently going quadratic.
    import duckdb
    import ray.data as rd

    from trafaret_ray.stages.joins import interval_join
    iv = duckdb.sql(
        f"SELECT user_id AS id, epoch_us(min(ts)) AS lo, "
        f"epoch_us(max(ts)) AS hi "
        f"FROM read_parquet('{path}') GROUP BY user_id").arrow()
    ivd = rd.from_arrow(iv)
    try:
        interval_join(ivd, ivd, bucket_us=86_400_000_000,
                      num_buckets=8, left_schema=iv.schema,
                      right_schema=iv.schema,
                      max_span=7 * 86_400_000_000).count()
        out['mega_session_guard'] = 'MISSED'
    except Exception as e:  # noqa: BLE001
        out['mega_session_guard'] = ('raised' if 'max_span' in str(e)
                                     else f'other: {e}')

    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
