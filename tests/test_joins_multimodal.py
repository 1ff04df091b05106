"""Joins (broadcast/hash/semi/anti/as-of), multimodal plumbing,
checkpointer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope='module')
def tables():
    rng = np.random.default_rng(2)
    left = pa.table({
        'k': rng.integers(0, 20, 200),
        'v': rng.standard_normal(200),
    })
    right = pa.table({
        'k': np.arange(0, 15, dtype=np.int64),
        'name': [f'n{i}' for i in range(15)],
    })
    return left, right


class TestJoins:
    def test_broadcast_join(self, ray_session, tables):
        import ray.data as rd
        from trafaret_ray.stages.joins import broadcast_join
        left, right = tables
        out = broadcast_join(rd.from_arrow(left), right.to_pandas(),
                             on='k').to_pandas()
        exp = left.to_pandas().merge(right.to_pandas(), on='k')
        assert len(out) == len(exp)
        assert sorted(out['name'].unique()) == sorted(exp['name'].unique())

    def test_hash_join_matches_pandas(self, ray_session, tables):
        import ray.data as rd
        from trafaret_ray.stages.joins import hash_join
        left, right = tables
        out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                        on='k', num_buckets=8).to_pandas()
        exp = left.to_pandas().merge(right.to_pandas(), on='k')
        o = out.sort_values(['k', 'v']).reset_index(drop=True)
        e = exp.sort_values(['k', 'v']).reset_index(drop=True)
        assert len(o) == len(e)
        assert (o['name'].to_numpy() == e['name'].to_numpy()).all()

    def test_hash_join_composite_key(self, ray_session):
        """Composite-key join: bucket on the combined hash of both key
        columns and feed Arrow's multi-key join per bucket."""
        import ray.data as rd
        from trafaret_ray.stages.joins import hash_join
        rng = np.random.default_rng(11)
        left = pa.table({'a': rng.integers(0, 20, 400),
                         'b': rng.integers(0, 5, 400),
                         'x': np.arange(400, dtype=np.int64)})
        right = pa.table({'a': rng.integers(0, 20, 150),
                          'b': rng.integers(0, 5, 150),
                          'y': np.arange(150, dtype=np.int64)})
        out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                        on=['a', 'b'], num_buckets=8).to_pandas()
        exp = left.to_pandas().merge(right.to_pandas(), on=['a', 'b'])
        o = out.sort_values(['a', 'b', 'x', 'y']).reset_index(drop=True)
        e = exp.sort_values(['a', 'b', 'x', 'y']).reset_index(drop=True)
        assert len(o) == len(e) > 0
        assert (o[['a', 'b', 'x', 'y']].to_numpy()
                == e[['a', 'b', 'x', 'y']].to_numpy()).all()

    def test_hash_join_left_and_outer(self, ray_session, tables):
        import ray.data as rd
        from trafaret_ray.stages.joins import hash_join
        left, right = tables
        for how in ('left', 'outer'):
            out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                            on='k', how=how, num_buckets=8).to_pandas()
            exp = left.to_pandas().merge(right.to_pandas(), on='k',
                                         how=how)
            assert len(out) == len(exp), how
            # unmatched left keys (15..19) carry null names
            assert out[out.k >= 15]['name'].isna().all(), how

    def test_semi_anti(self, ray_session, tables):
        import ray.data as rd
        from trafaret_ray.stages.joins import semi_join, anti_join
        left, right = tables
        semi = semi_join(rd.from_arrow(left), rd.from_arrow(right),
                         on='k').to_pandas()
        anti = anti_join(rd.from_arrow(left), rd.from_arrow(right),
                         on='k').to_pandas()
        assert len(semi) + len(anti) == left.num_rows
        assert set(semi['k']) <= set(range(15))
        assert set(anti['k']).isdisjoint(set(range(15)))

    def test_bloom_semi_join(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import (bloom_build, bloom_contains,
                                               semi_join_bloom)
        rng = np.random.default_rng(9)
        keys = pa.table({'k': np.arange(0, 5000, dtype=np.int64)})
        probe = pa.table({'k': rng.integers(0, 50000, 20000)})
        bloom = bloom_build(rd.from_arrow(keys), 'k', m_bits=1 << 18, k=4)
        mask = bloom_contains(bloom, probe.column('k').to_numpy())
        truth = probe.column('k').to_numpy() < 5000
        # no false negatives
        assert mask[truth].all()
        # false-positive rate near theory ((1-e^{-kn/m})^k ~ 0.24% here)
        fp = mask[~truth].mean()
        assert fp < 0.02, fp
        out = semi_join_bloom(rd.from_arrow(probe), rd.from_arrow(keys),
                              'k', m_bits=1 << 18).to_pandas()
        assert truth.sum() <= len(out) <= truth.sum() + (~truth).sum() * 0.02

    def test_bloom_odd_m_bits(self, ray_session):
        """m_bits not divisible by 8*num_shards rounds UP instead of
        crashing in the shard merge; membership stays false-negative
        free."""
        import ray.data as rd
        from trafaret_ray.stages.joins import bloom_build, bloom_contains
        keys = pa.table({'k': np.arange(0, 100, dtype=np.int64)})
        bloom = bloom_build(rd.from_arrow(keys), 'k', m_bits=100_003, k=3)
        _, m_bits, _ = bloom
        assert m_bits >= 100_003 and m_bits % (8 * 32) == 0
        assert bloom_contains(bloom, np.arange(0, 100)).all()

    def test_asof_join_matches_merge_asof(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join
        rng = np.random.default_rng(4)
        left = pa.table({
            'ent': rng.integers(0, 10, 300),
            'ts': rng.integers(0, 10_000, 300),
            'x': rng.standard_normal(300),
        })
        right = pa.table({
            'ent': rng.integers(0, 10, 200),
            'ts': rng.integers(0, 10_000, 200),
            'state': rng.integers(0, 100, 200),
        })
        # dedup right to (ent, ts) so the match is unambiguous
        rdf = right.to_pandas().groupby(['ent', 'ts'], as_index=False)\
            .agg(state=('state', 'max'))
        out = asof_join(rd.from_arrow(left),
                        rd.from_arrow(pa.Table.from_pandas(rdf)),
                        by='ent', on='ts', value_cols=['state'],
                        num_buckets=4).to_pandas()
        ldf = left.to_pandas().reset_index()
        exp = pd.merge_asof(ldf.sort_values('ts', kind='stable'),
                            rdf.sort_values('ts', kind='stable'),
                            on='ts', by='ent', allow_exact_matches=False,
                            direction='backward')\
            .set_index('index').sort_index()
        o = out.sort_values(['ent', 'ts', 'x']).reset_index(drop=True)
        e = exp.sort_values(['ent', 'ts', 'x']).reset_index(drop=True)
        a, b = o['state_state'].to_numpy(), e['state'].to_numpy()
        assert (pd.isna(a) == pd.isna(b)).all()
        assert (a[~pd.isna(a)] == b[~pd.isna(b)]).all()

    def _asof_fixture(self, seed=11):
        rng = np.random.default_rng(seed)
        left = pa.table({
            'ent': rng.integers(0, 8, 250),
            'ts': rng.integers(0, 5_000, 250),
            'x': rng.standard_normal(250),
        })
        rdf = pd.DataFrame({
            'ent': rng.integers(0, 8, 150),
            'ts': rng.integers(0, 5_000, 150),
            'state': rng.integers(0, 100, 150),
        }).groupby(['ent', 'ts'], as_index=False)\
            .agg(state=('state', 'max'))
        return left, rdf

    def test_asof_direction_exact_tolerance_vs_pandas(self, ray_session):
        """direction x allow_exact x tolerance differential against
        pandas merge_asof on random co-keyed data."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join
        left, rdf = self._asof_fixture()
        ldf = left.to_pandas().reset_index()
        cases = [('backward', False, None), ('backward', True, None),
                 ('forward', False, None), ('forward', True, None),
                 ('backward', False, 300), ('forward', True, 300)]
        for direction, exact, tol in cases:
            out = asof_join(rd.from_arrow(left),
                            rd.from_arrow(pa.Table.from_pandas(rdf)),
                            by='ent', on='ts', value_cols=['state'],
                            num_buckets=4, direction=direction,
                            tolerance=tol, allow_exact=exact).to_pandas()
            exp = pd.merge_asof(ldf.sort_values('ts', kind='stable'),
                                rdf.sort_values('ts', kind='stable'),
                                on='ts', by='ent', direction=direction,
                                allow_exact_matches=exact, tolerance=tol)\
                .set_index('index').sort_index()
            o = out.sort_values(['ent', 'ts', 'x']).reset_index(drop=True)
            e = exp.sort_values(['ent', 'ts', 'x']).reset_index(drop=True)
            a = o['state_state'].to_numpy()
            b = e['state'].to_numpy()
            assert (pd.isna(a) == pd.isna(b)).all(), (direction, exact,
                                                      tol)
            ok = ~pd.isna(a)
            assert (a[ok] == b[ok]).all(), (direction, exact, tol)

    def test_asof_nearest_vs_reference(self, ray_session):
        """nearest = argmin |delta| with the backward candidate winning
        distance ties — per-row reference oracle (pandas' nearest tie
        rule is unspecified, so the spec is pinned here)."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join
        left, rdf = self._asof_fixture(seed=5)
        out = asof_join(rd.from_arrow(left), rd.from_arrow(
            pa.Table.from_pandas(rdf)), by='ent', on='ts',
            value_cols=['state'], num_buckets=4,
            direction='nearest').to_pandas()
        got = {}
        for ent, ts, st in zip(out['ent'], out['ts'],
                               out['state_state']):
            got.setdefault((ent, ts), set()).add(
                None if pd.isna(st) else int(st))
        ldf = left.to_pandas()
        for ent, ts in zip(ldf['ent'], ldf['ts']):
            cand = rdf[rdf['ent'] == ent]
            if cand.empty:
                expect = None
            else:
                cts = cand['ts'].to_numpy()
                d = np.abs(cts - ts)
                dm = d.min()
                tied = cand[d == dm]
                back = tied[tied['ts'] <= ts]
                row = back.iloc[-1] if len(back) else tied.iloc[0]
                expect = int(row['state'])
            assert expect in got[(ent, ts)], (ent, ts)


class TestMultimodal:
    def test_image_pipeline_plumbing(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.multimodal import (
            synthetic_media_table, decode_pipeline)
        ds = rd.from_arrow(synthetic_media_table(32, seed=1))
        out = decode_pipeline(ds, concurrency=2, batch_size=8).to_pandas()
        assert len(out) == 32
        emb = np.stack(out['embedding'].to_numpy())
        assert emb.shape == (32, 64)
        # deterministic across runs
        out2 = decode_pipeline(rd.from_arrow(synthetic_media_table(32, seed=1)),
                               concurrency=2, batch_size=8).to_pandas()
        emb2 = np.stack(out2.sort_values('media_id')['embedding'].to_numpy())
        emb1 = np.stack(out.sort_values('media_id')['embedding'].to_numpy())
        np.testing.assert_allclose(emb1, emb2)

    def test_audio_and_frames(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.multimodal import (
            synthetic_media_table, AudioFeatures, FrameSample)
        ds = rd.from_arrow(synthetic_media_table(8, seed=2, kind='audio'))
        au = ds.map_batches(AudioFeatures, batch_format='pyarrow',
                            batch_size=4, concurrency=2).to_pandas()
        assert np.stack(au['energies'].to_numpy()).shape == (8, 16)
        fr = ds.map_batches(FrameSample, batch_format='pyarrow',
                            batch_size=4, concurrency=2).to_pandas()
        assert len(fr) == 8 * 4


class TestCheckpointer:
    def test_stage_lifecycle(self, ray_session, tmp_path):
        import ray.data as rd
        from trafaret_ray.state.checkpoint import Checkpointer
        cp = Checkpointer(str(tmp_path / 'out'))
        ds = rd.from_arrow(pa.table({'a': [1, 2, 3]}))
        p = cp.write_stage(ds, 's1', metrics={'rows': 3})
        assert cp.done('s1')
        assert rd.read_parquet(p).count() == 3
        # second write is a no-op (resume)
        p2 = cp.write_stage(rd.from_arrow(pa.table({'a': [9]})), 's1')
        assert rd.read_parquet(p2).count() == 3
        assert cp.metrics('s1') == {'rows': 3}
        # fresh instance reads the manifest back
        cp2 = Checkpointer(str(tmp_path / 'out'))
        assert cp2.done('s1')


class TestReaders:
    def test_formats_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd
        import trafaret_ray.contracts as t
        from trafaret_ray.sources import readers
        from trafaret_ray.contracts.validator import drop_quarantine
        tbl = pa.table({'a': [1, 2, 3], 'b': ['x', 'y', '']})
        import pyarrow.parquet as pq
        import pyarrow.csv as pcsv
        import json as _json
        pq.write_table(tbl, str(tmp_path / 'd.parquet'))
        pcsv.write_csv(tbl, str(tmp_path / 'd.csv'))
        with open(tmp_path / 'd.json', 'w') as f:
            for r in tbl.to_pylist():
                f.write(_json.dumps(r) + '\n')
        for fmt, path in (('parquet', 'd.parquet'), ('csv', 'd.csv'),
                          ('json', 'd.json')):
            tagged = readers.read_validated(
                str(tmp_path / path),
                t.Dict(a=t.ToInt(), b=t.String()), format=fmt)
            ok = tagged.map_batches(drop_quarantine,
                                    batch_format='pyarrow')
            assert ok.count() == 2, fmt  # blank 'b' quarantined

    def test_binary_reader(self, ray_session, tmp_path):
        from trafaret_ray.sources import readers
        (tmp_path / 'f1.bin').write_bytes(b'abc')
        (tmp_path / 'f2.bin').write_bytes(b'defg')
        ds = readers.read_binary(str(tmp_path))
        rows = ds.take_all()
        assert sorted(len(r['bytes']) for r in rows) == [3, 4]


class TestRangeJoin:
    def _bands(self):
        return pa.table({'lo': pa.array([0.0, 10.0, 50.0]),
                         'hi': pa.array([10.0, 50.0, 100.0]),
                         'band': pa.array(['low', 'mid', 'high'])})

    def test_broadcast_banding(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_broadcast
        rng = np.random.default_rng(3)
        vals = np.round(rng.uniform(-5, 110, 500), 3)
        tbl = pa.table({'id': np.arange(500, dtype=np.int64), 'v': vals})
        out = range_join_broadcast(rd.from_arrow(tbl), self._bands(),
                                   'v').to_pandas()
        exp_in = ((vals >= 0) & (vals < 100)).sum()
        assert len(out) == exp_in
        m = out.set_index('id')
        for i, v in enumerate(vals):
            if 0 <= v < 10:
                assert m.loc[i, 'band'] == 'low'
            elif 50 <= v < 100:
                assert m.loc[i, 'band'] == 'high'
        # left join keeps unmatched with null band
        outl = range_join_broadcast(rd.from_arrow(tbl), self._bands(),
                                    'v', how='left').to_pandas()
        assert len(outl) == 500
        assert outl['band'].isna().sum() == 500 - exp_in

    def test_broadcast_rejects_overlap(self, ray_session):
        import pytest
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_broadcast
        bad = pa.table({'lo': pa.array([0.0, 5.0]),
                        'hi': pa.array([10.0, 15.0]),
                        'band': pa.array(['a', 'b'])})
        with pytest.raises(ValueError):
            range_join_broadcast(rd.from_arrow(pa.table(
                {'v': pa.array([1.0])})), bad, 'v')

    def test_binned_overlapping_matches_bruteforce(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_binned
        rng = np.random.default_rng(7)
        vals = np.round(rng.uniform(0, 100, 300), 3)
        left = pa.table({'id': np.arange(300, dtype=np.int64), 'v': vals})
        lo = np.round(rng.uniform(0, 90, 40), 3)
        span = rng.uniform(1, 25, 40)
        right = pa.table({'lo': lo, 'hi': np.round(lo + span, 3),
                          'iv': np.arange(40, dtype=np.int64)})
        out = range_join_binned(rd.from_arrow(left).repartition(4),
                                rd.from_arrow(right).repartition(2),
                                'v', bin_width=10.0,
                                num_buckets=8).to_pandas()
        # brute force oracle
        ldf, rdf = left.to_pandas(), right.to_pandas()
        exp = ldf.merge(rdf, how='cross')
        exp = exp[(exp['lo'] <= exp['v']) & (exp['v'] < exp['hi'])]
        got = out.sort_values(['id', 'iv']).reset_index(drop=True)
        want = exp[['id', 'v', 'iv']].sort_values(['id', 'iv'])\
            .reset_index(drop=True)
        assert len(got) == len(want)
        assert (got[['id', 'iv']].to_numpy()
                == want[['id', 'iv']].to_numpy()).all()


class TestAsofBroadcast:
    def test_matches_merge_asof(self, ray_session):
        """Broadcast as-of (no exchange) equals pandas merge_asof with
        strict-backward semantics."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join_broadcast
        rng = np.random.default_rng(6)
        left = pa.table({
            'ent': rng.integers(0, 6, 250),
            'ts': rng.integers(0, 5000, 250),
            'x': np.arange(250, dtype=np.int64),
        })
        sdf = pd.DataFrame({
            'ent': rng.integers(0, 6, 60),
            'ts': rng.integers(0, 5000, 60),
            'cfg': rng.integers(0, 9, 60),
        }).groupby(['ent', 'ts'], as_index=False).agg(cfg=('cfg', 'max'))
        out = asof_join_broadcast(
            rd.from_arrow(left).repartition(4),
            pa.Table.from_pandas(sdf), by='ent', on='ts',
            value_cols=['cfg']).to_pandas()
        exp = pd.merge_asof(
            left.to_pandas().sort_values('ts', kind='stable'),
            sdf.sort_values('ts', kind='stable'),
            on='ts', by='ent', allow_exact_matches=False,
            direction='backward')
        o = out.sort_values('x').reset_index(drop=True)
        e = exp.sort_values('x').reset_index(drop=True)
        a, b = o['cfg_state'].to_numpy(), e['cfg'].to_numpy()
        assert (pd.isna(a) == pd.isna(b)).all()
        assert (a[~pd.isna(a)] == b[~pd.isna(b)]).all()


class TestSaltedJoin:
    def test_skewed_key_matches_pandas(self, ray_session):
        """One key holds half the left rows: the salted join must equal
        a plain pandas merge, for inner and left, with the hot key's
        rows spread across salts."""
        import ray.data as rd
        from trafaret_ray.stages.joins import salted_hash_join
        rng = np.random.default_rng(8)
        keys = np.concatenate([np.full(3000, 7, dtype=np.int64),
                               rng.integers(0, 50, 3000)])
        rng.shuffle(keys)
        left = pa.table({'k': keys,
                         'x': np.arange(6000, dtype=np.int64)})
        right = pa.table({'k': np.arange(0, 40, dtype=np.int64),
                          'name': [f'n{i}' for i in range(40)]})
        for how in ('inner', 'left'):
            out = salted_hash_join(
                rd.from_arrow(left).repartition(4),
                rd.from_arrow(right), on='k', hot_keys=[7],
                how=how, num_buckets=8, salt_factor=4).to_pandas()
            exp = left.to_pandas().merge(right.to_pandas(), on='k',
                                         how=how)
            o = out.sort_values(['k', 'x']).reset_index(drop=True)
            e = exp.sort_values(['k', 'x']).reset_index(drop=True)
            assert len(o) == len(e), how
            a, b = o['name'].to_numpy(), e['name'].to_numpy()
            assert (pd.isna(a) == pd.isna(b)).all()
            assert (a[~pd.isna(a)] == b[~pd.isna(b)]).all()

    def test_rejects_outer(self, ray_session):
        import pytest
        import ray.data as rd
        from trafaret_ray.stages.joins import salted_hash_join
        t = pa.table({'k': pa.array([1], type=pa.int64())})
        with pytest.raises(ValueError):
            salted_hash_join(rd.from_arrow(t), rd.from_arrow(t), 'k',
                             hot_keys=[1], how='outer')


class TestRangeJoinRegressions:
    def test_binned_preserves_int64_ids(self, ray_session):
        """64-bit ids above 2^53 must survive the binned range join
        bit-exact (the Arrow-native merge never floatifies them)."""
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_binned
        big = np.array([2**62 + 12345, 2**62 + 12346], dtype=np.int64)
        left = pa.table({'id': big, 'v': pa.array([1.5, 2.5])})
        right = pa.table({'lo': pa.array([0.0]), 'hi': pa.array([10.0]),
                          'iv': np.array([2**62 + 99], dtype=np.int64)})
        out = range_join_binned(rd.from_arrow(left),
                                rd.from_arrow(right), 'v',
                                bin_width=5.0, num_buckets=4).to_pandas()
        assert out['id'].dtype == np.int64
        assert sorted(out['id']) == sorted(big)
        assert (out['iv'] == 2**62 + 99).all()

    def test_broadcast_empty_bands(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_broadcast
        empty = pa.table({'lo': pa.array([], pa.float64()),
                          'hi': pa.array([], pa.float64()),
                          'band': pa.array([], pa.string())})
        ds = rd.from_arrow(pa.table({'v': pa.array([1.0, 2.0])}))
        assert len(range_join_broadcast(ds, empty, 'v').to_pandas()) == 0
        outl = range_join_broadcast(ds, empty, 'v', how='left').to_pandas()
        assert len(outl) == 2 and outl['band'].isna().all()

    def test_asof_broadcast_empty_state(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join_broadcast
        left = pa.table({'ent': pa.array([1, 2], type=pa.int64()),
                         'ts': pa.array([10, 20], type=pa.int64())})
        state = pa.table({'ent': pa.array([], pa.int64()),
                          'ts': pa.array([], pa.int64()),
                          'cfg': pa.array([], pa.int64())})
        out = asof_join_broadcast(rd.from_arrow(left), state, by='ent',
                                  on='ts', value_cols=['cfg']).to_pandas()
        assert len(out) == 2 and out['cfg_state'].isna().all()


class TestAsofSparseRight:
    def test_bucket_with_no_right_rows(self, ray_session):
        """A hash bucket holding left rows but ZERO right rows must emit
        null matches, not crash (sparse/skewed right side)."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join
        left = pa.table({'ent': pa.array([1, 2, 3], type=pa.int64()),
                         'ts': pa.array([10, 20, 30], type=pa.int64()),
                         'x': pa.array([0, 1, 2], type=pa.int64())})
        right = pa.table({'ent': pa.array([999], type=pa.int64()),
                          'ts': pa.array([5], type=pa.int64()),
                          'state': pa.array([7], type=pa.int64())})
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        by='ent', on='ts', value_cols=['state'],
                        num_buckets=4).to_pandas()
        assert len(out) == 3
        assert out['state_state'].isna().all()

    def test_asof_broadcast_empty_block_schema(self, ray_session):
        """A zero-row block must emit the SAME typed column as matched
        blocks (no null-typed schema drift across blocks)."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join_broadcast
        left = pa.table({'ent': pa.array([1, 2], type=pa.int64()),
                         'ts': pa.array([10, 20], type=pa.int64())})
        state = pa.table({'ent': pa.array([1], type=pa.int64()),
                          'ts': pa.array([5], type=pa.int64()),
                          'cfg': pa.array(['on'], type=pa.string())})
        # second block filters to empty upstream
        ds = rd.from_arrow(left).repartition(2)\
            .filter(lambda r: r['ent'] != 2)
        out = asof_join_broadcast(ds, state, by='ent', on='ts',
                                  value_cols=['cfg'])
        df = out.to_pandas()
        assert len(df) == 1 and df['cfg_state'].iloc[0] == 'on'


class TestNullKeySemantics:
    def test_hash_join_nulls_never_match(self, ray_session):
        """SQL inner-join parity: null keys never match (incl. null=null),
        verified against DuckDB."""
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.joins import hash_join
        left = pa.table({'k': pa.array([1, None, 2, None], type=pa.int64()),
                         'x': pa.array([0, 1, 2, 3], type=pa.int64())})
        right = pa.table({'k': pa.array([1, None], type=pa.int64()),
                          'name': pa.array(['a', 'b'])})
        out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                        on='k', num_buckets=4).to_pandas()
        exp = duckdb.sql(
            "SELECT count(*) n FROM (SELECT unnest([1, NULL, 2, NULL]) k)"
            " l JOIN (SELECT unnest([1, NULL]) k) r USING (k)")\
            .df()['n'][0]
        assert len(out) == exp == 1
        assert out['k'].tolist() == [1]

    def test_semi_join_null_modes(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.joins import semi_join
        left = pa.table({'k': pa.array([1, None, 2], type=pa.int64())})
        keys = pa.table({'k': pa.array([1, None], type=pa.int64())})
        isin = semi_join(rd.from_arrow(left), rd.from_arrow(keys),
                         'k').to_pandas()
        assert len(isin) == 2                       # pandas isin default
        sql = semi_join(rd.from_arrow(left), rd.from_arrow(keys),
                        'k', match_nulls=False).to_pandas()
        assert sql['k'].tolist() == [1]             # SQL IN semantics

    def test_asof_null_ts_never_matches(self, ray_session):
        """SQL ASOF semantics: null-ts left rows get no match; null-ts
        state rows are never 'prior to' anything — both variants."""
        import ray.data as rd
        from trafaret_ray.stages.joins import asof_join, asof_join_broadcast
        left = pa.table({'ent': pa.array([1, 1], type=pa.int64()),
                         'ts': pa.array([10, None], type=pa.int64()),
                         'x': pa.array([0, 1], type=pa.int64())})
        state = pa.table({'ent': pa.array([1, 1], type=pa.int64()),
                          'ts': pa.array([5, None], type=pa.int64()),
                          'cfg': pa.array([7, 99], type=pa.int64())})
        out = asof_join(rd.from_arrow(left), rd.from_arrow(state),
                        by='ent', on='ts', value_cols=['cfg'],
                        num_buckets=2).to_pandas()
        m = out.set_index('x')['cfg_state']
        assert m[0] == 7 and pd.isna(m[1])
        outb = asof_join_broadcast(rd.from_arrow(left), state, by='ent',
                                   on='ts', value_cols=['cfg'])\
            .to_pandas().set_index('x')['cfg_state']
        assert outb[0] == 7 and pd.isna(outb[1])

    def test_binned_null_values_and_edges(self, ray_session):
        """Null left values and null interval edges produce zero matches
        instead of junk bins or crashes."""
        import ray.data as rd
        from trafaret_ray.stages.joins import range_join_binned
        left = pa.table({'id': pa.array([0, 1, 2], type=pa.int64()),
                         'v': pa.array([1.0, None, 50.0])})
        right = pa.table({'lo': pa.array([0.0, None]),
                          'hi': pa.array([10.0, 100.0]),
                          'iv': pa.array([5, 6], type=pa.int64())})
        out = range_join_binned(rd.from_arrow(left),
                                rd.from_arrow(right), 'v',
                                bin_width=5.0, num_buckets=4).to_pandas()
        assert out[['id', 'iv']].values.tolist() == [[0, 5]]


class TestJoinDifferentialFuzz:
    def test_hash_join_randomized_vs_duckdb(self, ray_session):
        """Randomized differential: hash_join (inner/left/outer) over
        tables with duplicate and NULL keys must match DuckDB exactly."""
        import duckdb
        import ray.data as rd
        from trafaret_ray.stages.joins import hash_join
        for seed in (0, 1, 2):
            rng = np.random.default_rng(seed)
            n_l, n_r = 80, 40
            lk = rng.integers(0, 12, n_l).astype(float)
            lk[rng.random(n_l) < 0.1] = np.nan
            rk = rng.integers(0, 12, n_r).astype(float)
            rk[rng.random(n_r) < 0.1] = np.nan
            left = pa.table({
                'k': pa.array([None if np.isnan(v) else int(v)
                               for v in lk], type=pa.int64()),
                'x': pa.array(np.arange(n_l, dtype=np.int64))})
            right = pa.table({
                'k': pa.array([None if np.isnan(v) else int(v)
                               for v in rk], type=pa.int64()),
                'y': pa.array(np.arange(n_r, dtype=np.int64))})
            con = duckdb.connect()
            con.register('l', left.to_pandas())
            con.register('r', right.to_pandas())
            for how, sql in (('inner', 'JOIN'), ('left', 'LEFT JOIN'),
                             ('outer', 'FULL JOIN')):
                got = hash_join(rd.from_arrow(left),
                                rd.from_arrow(right), on='k', how=how,
                                num_buckets=4).to_pandas()
                exp = con.sql(
                    f'SELECT coalesce(l.k, r.k) AS k, x, y '
                    f'FROM l {sql} r ON l.k = r.k').df()
                g = got.sort_values(['k', 'x', 'y'], na_position='last')\
                    .reset_index(drop=True)
                e = exp.sort_values(['k', 'x', 'y'], na_position='last')\
                    .reset_index(drop=True)
                assert len(g) == len(e), (seed, how)
                for c in ('x', 'y'):
                    a = g[c].to_numpy(dtype=float)
                    b = e[c].to_numpy(dtype=float)
                    assert np.allclose(a, b, equal_nan=True), (seed, how,
                                                               c)
