"""Driver contract for the Ray-Data-native engine.

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in trafaret_ray) initializes or shuts down Ray.

- ``entry()`` — flagship transcript feature pipeline at sf0.001 scale:
  deterministic synthetic transcripts (input_hint schema) → contract gate
  (quarantine) → one conv_id hash exchange → sessionize / lag / lead /
  fills / strict-< as-of vs tool state → feature vectors.
- ``queries()`` / ``oracle_sql()`` — operator inventory with DuckDB
  oracles over the driver testdata tables (see trafaret_ray/pipelines/
  queries.py for per-query scale notes).
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
        # transcript pipeline itself (rows-only check: the oracle lives in
        # tests/test_features.py as a pandas straight-line implementation)
        return entry()

    q['flagship_transcript_features'] = flagship_features
    return q


def oracle_sql() -> dict[str, str]:
    from trafaret_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
