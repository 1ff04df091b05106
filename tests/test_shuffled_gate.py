"""Byte-parity under permuted input rows for the order-sensitive queries.

`tools/check_queries.py --shuffled` is the full gate (every table's rows
in a seeded random order, re-chunked row groups so Ray block boundaries
move; oracle queries byte-compare vs DuckDB, rows-only queries
self-compare vs the pristine run). At 100 TB the input arrives in
arbitrary file/row order, so no kernel may derive order from input
position. This test pins the queries whose kernels ARE order-sensitive
internally (windows, sessions, as-of, fills, EWMA, dedup canonical
selection) at sf0.001 so the suite catches regressions without the
full-gate wall time.

Runs check_queries in a subprocess (it owns its own Ray session).
"""

import subprocess
import sys

QUERIES = [
    'q_sessionize_events', 'q_lag_events', 'q_ffill_events',
    'q_asof_events_stage', 'q_rank_events', 'q_window_positions_events',
    'q_ewma_events', 'q_minhash_dedup_docs', 'q_latest_events',
    'flagship_transcript_features',
]


def test_order_sensitive_queries_byte_match(tmp_path):
    proc = subprocess.run(
        [sys.executable, 'tools/check_queries.py',
         '/root/testdata/sf0.001', '--shuffled', *QUERIES],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PYTHONPATH': '/root/repo', 'PATH': '/usr/bin:/bin',
             'HOME': '/root', 'RAY_ADDRESS': 'local'},
        timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    oks = proc.stdout.count(': ok (')
    assert oks == len(QUERIES), proc.stdout[-3000:]
