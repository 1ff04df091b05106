"""Byte-parity under adversarial strings for the string-sensitive queries.

`tools/check_queries.py --dirty` is the full gate (every oracle query
over a fixture with unicode/control/degenerate document texts, unicode
group keys and hostile-but-valid JSON props); this test runs the same
comparison at sf0.001 for the queries that exercise each string-hazard
class, so the suite catches regressions without the full-gate wall time:

  * JSON field extraction vs json_extract semantics (nested decoy keys,
    absent keys, JSON null, escapes, spacing) — q_json_props_events,
    q_struct_payload_events (regex-no-match rows must DROP on both
    engines: TRY_CAST oracle vs contract quarantine)
  * tokenizer / codepoint-length kernels on emoji, CJK, RTL, combining
    marks, zero-width chars, controls — q_token_stats, q_quality_scores,
    q_bpe_token_stats
  * normalization + dedup over empty/whitespace-only/duplicate-heavy
    text — q_normalized_docs, q_exact_dedup_docs, q_ngram_jaccard_pairs
  * unicode group keys and string sort order (UTF-8 byte order ==
    codepoint order on both engines) — q_top_docs_per_lang, q_cube_docs
  * regex redaction over mixed scripts and html-ish text — q_redact_docs

Runs check_queries in a subprocess (it owns its own Ray session).
"""

import subprocess
import sys

QUERIES = [
    'q_json_props_events', 'q_struct_payload_events',
    'q_token_stats', 'q_quality_scores', 'q_bpe_token_stats',
    'q_normalized_docs', 'q_exact_dedup_docs', 'q_ngram_jaccard_pairs',
    'q_top_docs_per_lang', 'q_cube_docs', 'q_redact_docs',
]


def test_string_sensitive_queries_byte_match(tmp_path):
    proc = subprocess.run(
        [sys.executable, 'tools/check_queries.py',
         '/root/testdata/sf0.001', '--dirty', *QUERIES],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PYTHONPATH': '/root/repo', 'PATH': '/usr/bin:/bin',
             'HOME': '/root', 'RAY_ADDRESS': 'local'},
        timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    oks = proc.stdout.count(': ok (')
    assert oks == len(QUERIES), proc.stdout[-3000:]
