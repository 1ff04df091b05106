"""Feature-stage parity vs a straight-line pandas oracle (SURVEY.md §7
phase 5): allclose for floats, byte-equal for text, zero-leakage probes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from trafaret_ray.sources.transcripts import generate_table, SESSION_GAP_US
from trafaret_ray.stages.conversations import sort_bucket, add_bucket, bucket_of
from trafaret_ray.stages.features import conversation_features
from trafaret_ray.stages.window import group_starts


def features_of(tbl: pa.Table) -> pd.DataFrame:
    tbl = sort_bucket(tbl)
    keys = tbl.column('conv_id').combine_chunks().to_numpy(
        zero_copy_only=False)
    out = conversation_features(tbl, group_starts(keys),
                                gap_us=SESSION_GAP_US)
    return out.to_pandas().sort_values(['conv_id', 'turn_idx'])\
        .reset_index(drop=True)


def pandas_oracle(tbl: pa.Table) -> pd.DataFrame:
    """Independent straight-line implementation of the flagship features."""
    df = tbl.to_pandas().sort_values(['conv_id', 'turn_idx', 'ts'])\
        .reset_index(drop=True)
    g = df.groupby('conv_id', sort=False)
    df['text_len'] = df['text'].str.len().astype('int32')
    delta = g['ts'].diff()
    df['time_since_prev_s'] = delta.dt.total_seconds()
    df['is_new_session'] = delta.isna() | \
        (delta > pd.Timedelta(microseconds=SESSION_GAP_US))
    df['session_id'] = (df.groupby('conv_id', sort=False)['is_new_session']
                        .cumsum() - 1).astype('int32')
    df['pos_in_session'] = df.groupby(['conv_id', 'session_id'],
                                      sort=False).cumcount().astype('int32')
    df['prev_role'] = g['role'].shift(1)
    df['next_role'] = g['role'].shift(-1)
    df['prev_text_len'] = g['text_len'].shift(1)
    df['tool_ffill'] = g['tool'].ffill()
    # strict-< as-of vs tool turns, per conv
    state = df[df['tool'].notna()][['conv_id', 'ts', 'tool']]\
        .rename(columns={'tool': 'last_tool', 'ts': 'last_tool_ts'})
    left = df[['conv_id', 'ts']].reset_index()
    merged = pd.merge_asof(
        left.sort_values('ts', kind='stable'),
        state.sort_values('last_tool_ts', kind='stable'),
        left_on='ts', right_on='last_tool_ts', by='conv_id',
        allow_exact_matches=False, direction='backward')
    merged = merged.set_index('index').sort_index()
    df['last_tool'] = merged['last_tool']
    df['last_tool_ts'] = merged['last_tool_ts']
    df['time_since_tool_s'] = \
        (df['ts'] - df['last_tool_ts']).dt.total_seconds()
    return df


@pytest.fixture(scope='module')
def clean_table():
    return generate_table(8000, seed=7, malformed_frac=0.0)


class TestFeatureParity:
    def test_allclose_vs_oracle(self, clean_table):
        got = features_of(clean_table)
        exp = pandas_oracle(clean_table)
        assert len(got) == len(exp)
        # byte-equal text under stable ordering (north-rule invariant)
        assert (got['text'].to_numpy() == exp['text'].to_numpy()).all()
        assert (got['conv_id'].to_numpy() == exp['conv_id'].to_numpy()).all()
        for col in ('session_id', 'pos_in_session', 'text_len',
                    'is_new_session'):
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        for col in ('prev_role', 'next_role', 'tool_ffill', 'last_tool'):
            ge, ee = got[col].isna(), exp[col].isna()
            assert (ge.to_numpy() == ee.to_numpy()).all(), col
            assert (got[col][~ge].to_numpy() == exp[col][~ee].to_numpy()).all(), col
        for col in ('time_since_prev_s', 'time_since_tool_s'):
            np.testing.assert_allclose(got[col].to_numpy(),
                                       exp[col].to_numpy(), equal_nan=True,
                                       err_msg=col)

    def test_zero_leakage_future_shift(self, clean_table):
        """Shifting all FUTURE rows' ts by +1h must not change any feature
        of earlier turns (SURVEY.md §4.3)."""
        base = features_of(clean_table)
        # pick a conv with >6 turns, shift its tail
        sizes = base.groupby('conv_id').size()
        conv = sizes[sizes > 6].index[0]
        cut_idx = 3
        tbl = clean_table.to_pandas()
        future = (tbl['conv_id'] == conv) & (tbl['turn_idx'] > cut_idx)
        tbl.loc[future, 'ts'] = tbl.loc[future, 'ts'] + pd.Timedelta(hours=1)
        shifted = features_of(pa.Table.from_pandas(tbl, preserve_index=False))
        b = base[(base['conv_id'] == conv) & (base['turn_idx'] <= cut_idx)]
        s = shifted[(shifted['conv_id'] == conv)
                    & (shifted['turn_idx'] <= cut_idx)]
        for col in ('session_id', 'last_tool', 'time_since_tool_s',
                    'prev_role', 'tool_ffill', 'time_since_prev_s'):
            bb, ss = b[col].to_numpy(), s[col].to_numpy()
            if bb.dtype.kind == 'f':
                np.testing.assert_allclose(bb, ss, equal_nan=True,
                                           err_msg=col)
            else:
                assert (pd.isna(bb) == pd.isna(ss)).all()
                assert (bb[~pd.isna(bb)] == ss[~pd.isna(ss)]).all(), col

    def test_strict_asof_no_self_match(self):
        """A tool turn must not see its own state, even at equal ts."""
        tbl = pa.table({
            'conv_id': ['c'] * 4,
            'turn_idx': pa.array([0, 1, 2, 3], type=pa.int32()),
            'role': ['user', 'tool', 'tool', 'user'],
            'text': ['a', 'b', 'c', 'd'],
            'tool': [None, 'search', 'python', None],
            # turn 2 shares ts with turn 1 (duplicate-ts tie)
            'ts': pa.array([0, 1_000_000, 1_000_000, 2_000_000],
                           type=pa.timestamp('us')),
        })
        got = features_of(tbl)
        assert got['last_tool'].tolist() == [None, None, None, 'python']

    def test_stable_order_duplicate_ts(self):
        """Duplicate timestamps: ordering and features keyed by turn_idx."""
        tbl = pa.table({
            'conv_id': ['c'] * 3,
            'turn_idx': pa.array([2, 0, 1], type=pa.int32()),
            'role': ['user', 'user', 'assistant'],
            'text': ['third', 'first', 'second'],
            'tool': [None, None, None],
            'ts': pa.array([5, 5, 5], type=pa.timestamp('us')),
        })
        got = features_of(tbl)
        assert got['text'].tolist() == ['first', 'second', 'third']
        assert got['prev_role'].tolist() == [None, 'user', 'assistant']


class TestBucketing:
    def test_deterministic(self):
        a = np.array(['c-1', 'c-2', 'c-3'], dtype=object)
        assert (bucket_of(a, 64) == bucket_of(a.copy(), 64)).all()

    def test_add_bucket(self):
        tbl = generate_table(500, seed=1)
        b = add_bucket(tbl, num_buckets=8)
        vals = b.column('_bucket').to_pylist()
        assert set(vals) <= set(range(8))

    def test_bucket_of_matches_add_bucket_single_key(self):
        # the two hash paths MUST agree bit-for-bit or co-location breaks
        tbl = generate_table(500, seed=2)
        b = add_bucket(tbl, key='conv_id', num_buckets=64)
        keys = tbl.column('conv_id').to_numpy(zero_copy_only=False)
        assert (b.column('_bucket').to_numpy()
                == bucket_of(keys, 64)).all()

    def test_null_presence_does_not_move_buckets(self):
        """A null in an int64 key block floatifies to_numpy, and hashing
        the float bit patterns would re-bucket EVERY key in the block —
        breaking join/exchange co-location against null-free blocks.
        The bucket of a key value must not depend on its neighbors."""
        import pyarrow as pa
        keys = [1242, 859, 7, 123456789]
        clean = pa.table({'k': pa.array(keys, pa.int64())})
        dirty = pa.table({'k': pa.array(keys + [None], pa.int64())})
        b_clean = add_bucket(clean, 'k', 16).column('_bucket').to_pylist()
        b_dirty = add_bucket(dirty, 'k', 16).column('_bucket').to_pylist()
        assert b_clean == b_dirty[:len(keys)]
        # strings: object dtype either way — also stable
        sc = pa.table({'k': pa.array(['a', 'bb'], pa.string())})
        sd = pa.table({'k': pa.array(['a', 'bb', None], pa.string())})
        assert add_bucket(sc, 'k', 16).column('_bucket').to_pylist() == \
            add_bucket(sd, 'k', 16).column('_bucket').to_pylist()[:2]


class TestGenerator:
    def test_deterministic(self):
        t1 = generate_table(1000, seed=3)
        t2 = generate_table(1000, seed=3)
        assert t1.equals(t2)

    def test_malformed_fraction(self):
        t1 = generate_table(5000, seed=3, malformed_frac=0.05)
        from trafaret_ray.contracts import BatchValidator
        from trafaret_ray.sources.transcripts import transcript_contract
        ok, q = BatchValidator(transcript_contract()).split(t1)
        assert 0.02 < q.num_rows / t1.num_rows < 0.09

    def test_valid_rows_pass(self):
        t1 = generate_table(5000, seed=3, malformed_frac=0.0)
        from trafaret_ray.contracts import BatchValidator
        from trafaret_ray.sources.transcripts import transcript_contract
        ok, q = BatchValidator(transcript_contract()).split(t1)
        assert q.num_rows == 0


class TestFlagshipRay:
    def test_end_to_end(self, ray_session):
        import ray.data as rd
        from trafaret_ray.pipelines.flagship import flagship
        tbl = generate_table(6000, seed=11, malformed_frac=0.02)
        feats, quarantine = flagship(rd.from_arrow(tbl), num_buckets=8)
        n_f = feats.count()
        n_q = quarantine.count()
        assert n_f + n_q == tbl.num_rows
        assert n_q > 0
        # distributed result equals single-process result
        got = feats.to_pandas().sort_values(['conv_id', 'turn_idx'])\
            .reset_index(drop=True)
        from trafaret_ray.contracts import BatchValidator
        from trafaret_ray.sources.transcripts import transcript_contract
        ok_tbl, _ = BatchValidator(transcript_contract()).split(tbl)
        exp = features_of(ok_tbl)
        assert (got['session_id'].to_numpy()
                == exp['session_id'].to_numpy()).all()
        assert (got['text'].to_numpy() == exp['text'].to_numpy()).all()
        np.testing.assert_allclose(got['time_since_tool_s'].to_numpy(),
                                   exp['time_since_tool_s'].to_numpy(),
                                   equal_nan=True)


class TestDeterminism:
    def test_identical_reruns(self, ray_session):
        """Two executions of the flagship over the same input produce
        identical feature tables (retry = replay; SURVEY §4.2)."""
        import ray.data as rd
        from trafaret_ray.pipelines.flagship import flagship
        tbl = generate_table(4000, seed=17, malformed_frac=0.02)
        outs = []
        for _ in range(2):
            feats, _ = flagship(rd.from_arrow(tbl), num_buckets=8)
            outs.append(feats.to_pandas()
                        .sort_values(['conv_id', 'turn_idx'])
                        .reset_index(drop=True))
        a, b = outs
        assert list(a.columns) == list(b.columns)
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            if av.dtype.kind == 'f':
                np.testing.assert_array_equal(
                    np.isnan(av.astype(float)), np.isnan(bv.astype(float)))
                assert (av[~pd.isna(av)] == bv[~pd.isna(bv)]).all(), col
            else:
                na, nb = pd.isna(av), pd.isna(bv)
                assert (na == nb).all() and (av[~na] == bv[~nb]).all(), col

    def test_epsilon_shift_invariance(self):
        """Shifting every timestamp by the same ε leaves all relative
        features unchanged (SURVEY §7 phase 5 leakage check)."""
        tbl = generate_table(3000, seed=23, malformed_frac=0.0)
        base = features_of(tbl)
        df = tbl.to_pandas()
        df['ts'] = df['ts'] + pd.Timedelta(microseconds=1)
        shifted = features_of(pa.Table.from_pandas(df, preserve_index=False))
        for col in ('session_id', 'pos_in_session', 'prev_role',
                    'tool_ffill', 'last_tool', 'time_since_prev_s',
                    'time_since_tool_s'):
            a, b = base[col].to_numpy(), shifted[col].to_numpy()
            if a.dtype.kind == 'f':
                np.testing.assert_allclose(a, b, equal_nan=True, err_msg=col)
            else:
                na, nb = pd.isna(a), pd.isna(b)
                assert (na == nb).all() and (a[~na] == b[~nb]).all(), col


class TestRunFlagshipResume:
    """run_flagship: checkpointed stages, per-partition lineage metrics,
    resume skips completed stages (north rule: resumable from checkpoint
    with per-partition lineage + metrics)."""

    def test_checkpoint_lineage_and_resume(self, ray_session, tmp_path):
        import os
        from trafaret_ray.pipelines.flagship import run_flagship
        from trafaret_ray.sources.transcripts import write_transcripts
        inp = str(tmp_path / 'in')
        out = str(tmp_path / 'out')
        files = write_transcripts(inp, n_turns=4000, seed=3,
                                  malformed_frac=0.05, rows_per_file=1500)
        import pyarrow.parquet as pq
        n_rows = sum(pq.read_metadata(f).num_rows for f in files)

        m1 = run_flagship(inp, out, num_buckets=4)
        assert m1['rows_ok'] > 0 and m1['rows_quarantined'] > 0
        assert m1['rows_ok'] + m1['rows_quarantined'] == n_rows
        # per-input-shard lineage covers every shard
        assert set(m1['per_file']) == {os.path.basename(f) for f in files}
        assert sum(v['rows_ok'] + v['rows_quarantined']
                   for v in m1['per_file'].values()) == n_rows
        assert m1['error_codes']  # quarantine carries reference codes
        feat_dir = os.path.join(out, 'features')
        val_dir = os.path.join(out, 'validated')
        assert os.path.exists(os.path.join(feat_dir, '_SUCCESS'))

        # full resume: nothing recomputed (stage dirs untouched)
        v_mtime = os.path.getmtime(val_dir)
        f_mtime = os.path.getmtime(feat_dir)
        m2 = run_flagship(inp, out, num_buckets=4)
        assert m2 == m1
        assert os.path.getmtime(val_dir) == v_mtime
        assert os.path.getmtime(feat_dir) == f_mtime

        # partial resume: lose the features stage -> only it re-runs
        os.remove(os.path.join(feat_dir, '_SUCCESS'))
        m3 = run_flagship(inp, out, num_buckets=4)
        assert m3 == m1
        assert os.path.getmtime(val_dir) == v_mtime
        assert os.path.exists(os.path.join(feat_dir, '_SUCCESS'))

        # feature output row count == validated ok rows
        import ray.data as rd
        assert rd.read_parquet(feat_dir).count() == m1['rows_ok']
