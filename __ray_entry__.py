"""Driver contract for the Ray-Data-native engine.

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in trafaret_ray) initializes or shuts down Ray.

- ``entry()`` — flagship transcript feature pipeline at sf0.001 scale:
  deterministic synthetic transcripts (input_hint schema) → contract gate
  (quarantine) → one conv_id hash exchange → sessionize / lag / lead /
  fills / strict-< as-of vs tool state → feature vectors.
- ``queries()`` / ``oracle_sql()`` — operator inventory with DuckDB
  oracles over the driver testdata tables (see trafaret_ray/pipelines/
  queries.py for per-query scale notes). As of r5 the flagship itself
  is byte-checked: ``flagship_transcript_features`` carries a full SQL
  transcription (quarantine predicate + feature windows + strict-<
  as-of) over the same cached transcripts parquet.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any


def _flagship_input(n_turns: int = 6000, seed: int = 42):
    """Deterministic transcripts table (input_hint shape), cached as
    parquet under /tmp so repeated calls stream from disk like production."""
    import pyarrow.parquet as pq
    from trafaret_ray.sources.transcripts import generate_table
    path = os.path.join(tempfile.gettempdir(),
                        f'trafaret_ray_transcripts_{n_turns}_{seed}.parquet')
    if not os.path.exists(path):
        tmp = path + '.tmp'
        pq.write_table(generate_table(n_turns, seed=seed,
                                      malformed_frac=0.02), tmp)
        os.replace(tmp, path)
    return path


def entry() -> Any:
    """Flagship pipeline at small scale; returns the feature Dataset."""
    import ray.data as rd
    from trafaret_ray.pipelines.flagship import flagship
    ds = rd.read_parquet(_flagship_input())
    feats, _quarantine = flagship(ds, num_buckets=8)
    return feats


def queries() -> dict[str, Callable[[str], Any]]:
    from trafaret_ray.pipelines.queries import QUERIES
    q = dict(QUERIES)

    def flagship_features(sf_dir: str):
        # the transcript pipeline itself, sorted for the driver's
        # deterministic compare (oracle: _flagship_oracle_sql below —
        # newly byte-checked in r5; the pandas straight-line oracle in
        # tests/test_features.py remains as the unit-level pin)
        return entry().sort(['conv_id', 'turn_idx'])

    q['flagship_transcript_features'] = flagship_features
    return q


def _flagship_oracle_sql() -> str:
    """SQL transcription of the flagship pipeline over the SAME cached
    transcripts parquet entry() reads: the contract gate as the
    single-defect quarantine predicate (FIXTURES.md §A.1 — blank
    conv_id, negative turn_idx, unknown role, tool⟷role mismatch, null
    ts/text), then the per-conversation feature windows ordered by
    (turn_idx, ts) exactly as stages/conversations.per_conversation
    sorts. The strict-< as-of against the conversation's tool-state
    stream ties off by (ts DESC, turn_idx DESC) — asof_backward's
    'last by input order wins' rule. Single int64→double divisions
    (us / 1e6) are the only float ops, so parallel-sum byte drift
    cannot occur."""
    path = _flagship_input()
    gap_us = 30 * 60 * 1_000_000
    return f"""
    WITH ok AS MATERIALIZED (
      SELECT conv_id, turn_idx, role, text, tool, ts,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM read_parquet('{path}')
      WHERE conv_id IS NOT NULL AND conv_id <> ''
        AND turn_idx IS NOT NULL AND turn_idx >= 0
        AND role IN ('user', 'assistant', 'system', 'tool')
        AND text IS NOT NULL AND ts IS NOT NULL
        AND ((role = 'tool') = (tool IS NOT NULL))),
    w1 AS MATERIALIZED (
      SELECT *,
        CAST(length(text) AS INTEGER) AS text_len,
        lag(ts_us) OVER cw AS prev_ts_us,
        lag(role) OVER cw AS prev_role,
        lead(role) OVER cw AS next_role,
        CAST(lag(length(text)) OVER cw AS INTEGER) AS prev_text_len,
        last_value(tool IGNORE NULLS) OVER (
          PARTITION BY conv_id ORDER BY turn_idx, ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS tool_ffill
      FROM ok
      WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx, ts)),
    w2 AS MATERIALIZED (
      SELECT *, (prev_ts_us IS NULL
                 OR ts_us - prev_ts_us > {gap_us}) AS is_new_session
      FROM w1),
    w3 AS MATERIALIZED (
      SELECT *,
        CAST(sum(CASE WHEN is_new_session THEN 1 ELSE 0 END)
             OVER (PARTITION BY conv_id ORDER BY turn_idx, ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - 1 AS INTEGER) AS session_id
      FROM w2)
    SELECT w3.conv_id, w3.turn_idx, w3.role, w3.text, w3.tool, w3.ts,
           text_len,
           CASE WHEN prev_ts_us IS NULL THEN NULL
                ELSE (w3.ts_us - prev_ts_us) / 1000000.0
           END AS time_since_prev_s,
           is_new_session, session_id,
           CAST(row_number() OVER (PARTITION BY w3.conv_id, session_id
                                   ORDER BY w3.turn_idx, w3.ts) - 1
                AS INTEGER) AS pos_in_session,
           prev_role, next_role, prev_text_len, tool_ffill,
           a.tool AS last_tool, a.ts AS last_tool_ts,
           CASE WHEN a.ts IS NULL THEN NULL
                ELSE (w3.ts_us - a.ts_us) / 1000000.0
           END AS time_since_tool_s
    FROM w3
    LEFT JOIN LATERAL (
      SELECT r.tool, r.ts, r.ts_us
      FROM ok r
      WHERE r.conv_id = w3.conv_id AND r.tool IS NOT NULL
        AND r.ts_us < w3.ts_us
      ORDER BY r.ts_us DESC, r.turn_idx DESC LIMIT 1) a ON TRUE
    ORDER BY conv_id, turn_idx
"""


def oracle_sql() -> dict[str, str]:
    from trafaret_ray.pipelines.queries import ORACLE_SQL
    out = dict(ORACLE_SQL)
    out['flagship_transcript_features'] = _flagship_oracle_sql()
    return out
