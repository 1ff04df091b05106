"""Byte-parity under NULL-bearing inputs for the null-sensitive queries.

`tools/check_queries.py --nulls` is the full gate (every oracle query,
10% nulls, deterministic); this test runs the same comparison at
sf0.001 for the queries that exercise each null-hazard class, so the
suite catches regressions without paying the full-gate wall time:

  * bucket-hash integrity (nullable int join keys float-hash apart) —
    q_returned_revenue
  * count(*) vs Arrow's count-non-null — q1, q_partsupp_returns
  * Ray sort on None in string key blocks — q_rollup_pricing
  * UNPIVOT null-cell drop / all-null SUM is NULL — q_melt_lineitem,
    q_pivot_lineitem
  * NULL-ts exclusion in temporal operators — q_sessionize_events,
    q_time_window_events, q_asof_events_stage
  * NULL group keys as real groups, NULLS-LAST ties —
    q_nearest_centroid_embeddings
  * error-taxonomy channel incl. 'required' — q_quarantine_audit_events
  * SQL NOT-IN-null trap + factorize alignment — q_ngram_jaccard_pairs,
    q_quality_filter_docs

Runs check_queries in a subprocess (it owns its own Ray session).
"""

import subprocess
import sys

QUERIES = [
    'q_returned_revenue', 'q1_pricing_summary', 'q_partsupp_returns',
    'q_rollup_pricing', 'q_melt_lineitem', 'q_pivot_lineitem',
    'q_sessionize_events', 'q_time_window_events', 'q_asof_events_stage',
    'q_nearest_centroid_embeddings', 'q_quarantine_audit_events',
    'q_ngram_jaccard_pairs', 'q_quality_filter_docs',
]


def test_null_sensitive_queries_byte_match(tmp_path):
    proc = subprocess.run(
        [sys.executable, 'tools/check_queries.py',
         '/root/testdata/sf0.001', '--nulls', *QUERIES],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PYTHONPATH': '/root/repo', 'PATH': '/usr/bin:/bin',
             'HOME': '/root', 'RAY_ADDRESS': 'local'},
        timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    oks = proc.stdout.count(': ok (')
    assert oks == len(QUERIES), proc.stdout[-3000:]
