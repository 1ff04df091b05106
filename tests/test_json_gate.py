"""Byte-parity under hostile JSON payloads for the props-touching queries.

`tools/check_queries.py --json-hostile` is the full gate (every oracle
query over a fixture whose events.props carry the divergence-envelope
string family, int64-boundary values, DuckDB cast quirks, duplicate
keys, deep nesting, unicode-escaped keys — PLUS per-type sums
engineered past int64 in both directions so the exact wide-sum path is
exercised against DuckDB's HUGEINT promotion).  This test runs the
same comparison at sf0.001 for the queries that actually read props,
so the suite catches regressions without the full-gate wall time.

Runs check_queries in a subprocess (it owns its own Ray session).
"""

import subprocess
import sys

QUERIES = [
    'q_json_props_events',
    'q_struct_payload_events',
]


def test_props_queries_byte_match_under_hostile_json(tmp_path):
    proc = subprocess.run(
        [sys.executable, 'tools/check_queries.py',
         '/root/testdata/sf0.001', '--json-hostile', *QUERIES],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PYTHONPATH': '/root/repo', 'PATH': '/usr/bin:/bin',
             'HOME': '/root', 'RAY_ADDRESS': 'local'},
        timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    oks = proc.stdout.count(': ok (')
    assert oks == len(QUERIES), proc.stdout[-3000:]
