"""Byte-parity under STACKED hazards (nulls + adversarial strings).

The fixture flags of `tools/check_queries.py` compose: `--nulls --dirty`
builds the dirty fixture ON TOP of the null-injected copy, so every row
can carry both hazards at once (NULL text next to hostile JSON, nulled
group keys next to unicode keys). Cross-hazard interactions are where
compound bugs live — e.g. the ANN query vector going NULL only exists
under `--nulls`, and first-row sampling in the skew/dirty fixture
builders only breaks when row 0 was already nulled.

This pins a fast sf0.001 subset across the hazard classes; the full
stacked gates (`--nulls --dirty`, `--nulls --skew --dirty` at sf0.01)
run out-of-band like the other full gates.

Runs check_queries in a subprocess (it owns its own Ray session).
"""

import subprocess
import sys

QUERIES = [
    # NULL query-vector short-circuit (both engines emit 0 rows)
    'q_ann_topk', 'q_ivf_topk',
    # hostile JSON x nulled props
    'q_json_props_events',
    # null text x degenerate/unicode text
    'q_token_stats', 'q_normalized_docs', 'q_exact_dedup_docs',
    # nulled group keys x unicode group keys
    'q_top_docs_per_lang',
    # float aggregate under both hazards
    'q1_pricing_summary',
]


def test_stacked_nulls_dirty_byte_match(tmp_path):
    proc = subprocess.run(
        [sys.executable, 'tools/check_queries.py',
         '/root/testdata/sf0.001', '--nulls', '--dirty', *QUERIES],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PYTHONPATH': '/root/repo', 'PATH': '/usr/bin:/bin',
             'HOME': '/root', 'RAY_ADDRESS': 'local'},
        timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    oks = proc.stdout.count(': ok (')
    assert oks == len(QUERIES), proc.stdout[-3000:]
