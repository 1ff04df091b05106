"""Salted (skew-hardened) flagship must equal the unsalted pipeline
exactly — lag/session/position/as-of across chunk boundaries included."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from trafaret_ray.sources.transcripts import generate_table


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(['conv_id', 'turn_idx']).reset_index(drop=True)


@pytest.fixture(scope='module')
def mega_table():
    """Small corpus + one forced mega conversation (3k turns with session
    gaps and tool turns) that will be split into many chunks."""
    base = generate_table(2000, seed=21, malformed_frac=0.0)
    n = 3000
    rng = np.random.default_rng(9)
    gaps = rng.integers(1, 120, n) * 1_000_000
    big = rng.random(n) < 0.01
    gaps[big] = 35 * 60 * 1_000_000  # > 30-min session gap
    gaps[0] = 0
    ts = np.int64(1_700_500_000_000_000) + np.cumsum(gaps)
    role = np.where(np.arange(n) % 2 == 0, 'user', 'assistant').astype('U9')
    tool_rows = rng.random(n) > 0.95
    role[tool_rows] = 'tool'
    tool = np.where(tool_rows, 'search', None)
    mega = pa.table({
        'conv_id': pa.array(['c-mega'] * n),
        'turn_idx': pa.array(np.arange(n, dtype=np.int32)),
        'role': pa.array(role.astype(object)),
        'text': pa.array([f'turn number {i}' for i in range(n)]),
        'tool': pa.array(tool.tolist(), type=pa.string()),
        'ts': pa.array(ts, type=pa.timestamp('us')),
    })
    return pa.concat_tables([base, mega.cast(base.schema)])


class TestSalting:
    def test_salted_equals_unsalted(self, ray_session, mega_table):
        import ray.data as rd
        from trafaret_ray.pipelines.flagship import feature_dataset
        from trafaret_ray.stages.salting import flagship_features_salted

        plain = _norm(feature_dataset(rd.from_arrow(mega_table),
                                      num_buckets=8).to_pandas())
        salted = _norm(flagship_features_salted(
            rd.from_arrow(mega_table), max_group_rows=500, chunk_rows=500,
            num_buckets=8).to_pandas())
        assert len(plain) == len(salted)
        for col in plain.columns:
            a, b = plain[col].to_numpy(), salted[col].to_numpy()
            if a.dtype.kind == 'f':
                np.testing.assert_allclose(a, b, equal_nan=True,
                                           err_msg=col)
            else:
                na, nb = pd.isna(a), pd.isna(b)
                assert (na == nb).all(), col
                assert (a[~na] == b[~nb]).all(), col

    def test_no_mega_falls_through(self, ray_session):
        import ray.data as rd
        from trafaret_ray.pipelines.flagship import feature_dataset
        from trafaret_ray.stages.salting import flagship_features_salted
        tbl = generate_table(1500, seed=4, malformed_frac=0.0)
        plain = _norm(feature_dataset(rd.from_arrow(tbl),
                                      num_buckets=4).to_pandas())
        salted = _norm(flagship_features_salted(
            rd.from_arrow(tbl), max_group_rows=10_000,
            num_buckets=4).to_pandas())
        assert (plain['session_id'].to_numpy()
                == salted['session_id'].to_numpy()).all()

    def test_census(self, ray_session, mega_table):
        import ray.data as rd
        from trafaret_ray.stages.salting import conv_census
        census = conv_census(rd.from_arrow(mega_table)).to_pandas()
        big = census[census['n_rows'] > 500]
        assert big['conv_id'].tolist() == ['c-mega']
        assert big['n_rows'].tolist() == [3000]
