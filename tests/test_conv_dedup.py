"""Conversation-level dedup (stages/dedup.py): exact order-sensitive
fingerprints and MinHash near-dup clusters over the transcripts payload.
Text must never move — both operators exchange only fixed-size partial
rows — and results must be invariant to row order and partitioning."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from trafaret_ray.stages.dedup import (conversation_exact_dedup,
                                       conversation_minhash_dedup)


def _transcripts(convs: dict[str, list[tuple[str, str]]]) -> pa.Table:
    """convs: conv_id -> ordered [(role, text), ...]."""
    conv_ids, turn_idx, roles, texts = [], [], [], []
    for cid, turns in convs.items():
        for i, (r, t) in enumerate(turns):
            conv_ids.append(cid)
            turn_idx.append(i)
            roles.append(r)
            texts.append(t)
    return pa.table({
        'conv_id': pa.array(conv_ids, pa.string()),
        'turn_idx': pa.array(turn_idx, pa.int32()),
        'role': pa.array(roles, pa.string()),
        'text': pa.array(texts, pa.string()),
    })


def _base_convs():
    long_a = [('user', f'please summarize the quarterly report '
                       f'section {i} in plain words now') for i in range(6)]
    long_b = [('user', f'translate invoice line {i} into french '
                       f'for the paris office review today') for i in range(6)]
    return {
        'c-1': [('user', 'hello there friend'),
                ('assistant', 'hi how can I help you today')],
        'c-2': long_a,
        'c-3': long_b,
        'c-4': [('user', 'completely unrelated question about turtles'),
                ('assistant', 'turtles are reptiles with shells')],
    }


class TestConversationExactDedup:
    def test_verbatim_copy_groups(self, ray_session):
        import ray.data as rd
        convs = _base_convs()
        convs['d-1'] = list(convs['c-1'])          # verbatim copy
        convs['d-2'] = list(convs['c-2'])
        ds = rd.from_arrow(_transcripts(convs)).repartition(5)
        df = conversation_exact_dedup(ds).to_pandas()\
            .sort_values('conv_id').reset_index(drop=True)
        g = dict(zip(df['conv_id'], df['group']))
        assert g['d-1'] == 'c-1' and g['c-1'] == 'c-1'
        assert g['d-2'] == 'c-2' and g['c-2'] == 'c-2'
        assert g['c-3'] == 'c-3' and g['c-4'] == 'c-4'
        n = dict(zip(df['conv_id'], df['n_turns']))
        assert n['c-2'] == 6 and n['d-2'] == 6

    def test_order_sensitive_and_partition_invariant(self, ray_session):
        import ray.data as rd
        convs = _base_convs()
        # same turns, two texts swapped -> NOT a duplicate
        sw = list(convs['c-1'])
        sw[0], sw[1] = (sw[0][0], sw[1][1]), (sw[1][0], sw[0][1])
        convs['s-1'] = sw
        tbl = _transcripts(convs)
        perm = np.random.default_rng(5).permutation(tbl.num_rows)
        a = conversation_exact_dedup(
            rd.from_arrow(tbl).repartition(7)).to_pandas()
        b = conversation_exact_dedup(
            rd.from_arrow(tbl.take(pa.array(perm))).repartition(3))\
            .to_pandas()
        a = a.sort_values('conv_id').reset_index(drop=True)
        b = b.sort_values('conv_id').reset_index(drop=True)
        assert a.equals(b)
        g = dict(zip(a['conv_id'], a['group']))
        assert g['s-1'] == 's-1'        # swapped content is distinct

    def test_empty(self, ray_session):
        import ray.data as rd
        ds = rd.from_arrow(_transcripts({}))
        out = conversation_exact_dedup(ds)
        assert out.count() == 0
        assert set(out.schema().names) == {'conv_id', 'group', 'n_turns'}


class TestConversationMinhashDedup:
    def test_near_dup_detected_exact_copy(self, ray_session):
        import ray.data as rd
        convs = _base_convs()
        convs['d-2'] = list(convs['c-2'])             # jaccard 1.0
        near = list(convs['c-3'])
        near[5] = ('user', 'translate invoice line five into german '
                           'for the berlin office review today')
        convs['n-3'] = near                           # high overlap
        ds = rd.from_arrow(_transcripts(convs)).repartition(5)
        df = conversation_minhash_dedup(ds, threshold=0.5).to_pandas()
        g = dict(zip(df['conv_id'], df['group']))
        assert g.get('d-2') == 'c-2' and g.get('c-2') == 'c-2'
        assert g.get('n-3') == 'c-3' and g.get('c-3') == 'c-3'
        # unrelated conversations never enter a cluster
        assert 'c-4' not in g and 'c-1' not in g

    def test_partition_invariance(self, ray_session):
        import ray.data as rd
        convs = _base_convs()
        convs['d-2'] = list(convs['c-2'])
        tbl = _transcripts(convs)
        perm = np.random.default_rng(9).permutation(tbl.num_rows)
        a = conversation_minhash_dedup(
            rd.from_arrow(tbl).repartition(6), threshold=0.5).to_pandas()
        b = conversation_minhash_dedup(
            rd.from_arrow(tbl.take(pa.array(perm))).repartition(2),
            threshold=0.5).to_pandas()
        a = a.sort_values('conv_id').reset_index(drop=True)
        b = b.sort_values('conv_id').reset_index(drop=True)
        assert a.equals(b)

    def test_no_pairs_and_empty(self, ray_session):
        import ray.data as rd
        out = conversation_minhash_dedup(
            rd.from_arrow(_transcripts(_base_convs())), threshold=0.9)
        assert out.count() == 0
        out2 = conversation_minhash_dedup(rd.from_arrow(_transcripts({})))
        assert out2.count() == 0
        assert set(out2.schema().names) == {'conv_id', 'group'}


class TestTierParity:
    def test_carried_vs_joined_tier_identical(self, ray_session):
        """carried_sig_max=0 forces the join tier; both tiers must
        byte-agree on the same planted input (same bar as
        interval_join's tiered-path differential)."""
        import ray.data as rd
        convs = _base_convs()
        convs['d-2'] = list(convs['c-2'])
        near = list(convs['c-3'])
        near[5] = ('user', 'translate invoice line five into german '
                           'for the berlin office review today')
        convs['n-3'] = near
        tbl = _transcripts(convs)
        a = conversation_minhash_dedup(
            rd.from_arrow(tbl).repartition(5), threshold=0.5).to_pandas()
        b = conversation_minhash_dedup(
            rd.from_arrow(tbl).repartition(5), threshold=0.5,
            carried_sig_max=0).to_pandas()
        a = a.sort_values('conv_id').reset_index(drop=True)
        b = b.sort_values('conv_id').reset_index(drop=True)
        assert len(a) > 0
        assert a.equals(b)


class TestOPHMode:
    def test_oph_mode_recovers_planted_dups(self, ray_session):
        """Opt-in sig_mode='oph': verbatim copies (jaccard 1.0) must
        still cluster — identical shingle sets give identical OPH bins
        regardless of sparsity."""
        import ray.data as rd
        convs = _base_convs()
        convs['d-2'] = list(convs['c-2'])
        ds = rd.from_arrow(_transcripts(convs)).repartition(4)
        df = conversation_minhash_dedup(ds, threshold=0.9,
                                        sig_mode='oph').to_pandas()
        g = dict(zip(df['conv_id'], df['group']))
        assert g.get('d-2') == 'c-2' and g.get('c-2') == 'c-2'


class TestIncrementalExactDedup:
    def test_cross_ingest_dedup_and_split_conv_merge(self, ray_session,
                                                     tmp_path):
        import ray.data as rd
        from trafaret_ray.stages.dedup import (
            conversation_exact_dedup_incremental as incr)
        state = str(tmp_path / 'state')

        # ingest 1: base conversations
        convs = _base_convs()
        g1, info1 = incr(rd.from_arrow(_transcripts(convs)), state)
        df1 = g1.to_pandas()
        assert info1['version'] == 0
        assert sorted(df1['conv_id']) == sorted(convs)
        assert (df1['group'] == df1['conv_id']).all()

        # ingest 2: a verbatim copy of c-2 (cross-ingest dup), a brand
        # new conversation, and the FIRST HALF of a split conversation
        half = {'d-2': list(convs['c-2']),
                'c-5': [('user', 'brand new thing'),
                        ('assistant', 'indeed quite new')],
                'x-1': [('user', 'part one of a split conversation')]}
        g2, info2 = incr(rd.from_arrow(_transcripts(half)), state)
        df2 = g2.to_pandas()
        assert info2['version'] == 1
        # only ingest-2 conversations in the output
        assert sorted(df2['conv_id']) == ['c-5', 'd-2', 'x-1']
        gm = dict(zip(df2['conv_id'], df2['group']))
        assert gm['d-2'] == 'c-2'          # dedup against PRIOR ingest
        assert gm['c-5'] == 'c-5' and gm['x-1'] == 'x-1'

        # ingest 3: x-1's remaining turn arrives (turn_idx=1), plus a
        # whole-conversation copy of the COMPLETED x-1 under y-1 —
        # fingerprint partial sums must merge across ingests exactly
        full_x = [('user', 'part one of a split conversation'),
                  ('assistant', 'part two arrives later')]
        rest = _transcripts({'y-1': full_x})
        tail = _transcripts({'x-1': full_x}).filter(
            pc.equal(pa.array([0, 1]), 1))
        part3 = pa.concat_tables([tail, rest])
        g3, info3 = incr(rd.from_arrow(part3), state)
        df3 = g3.to_pandas()
        gm3 = dict(zip(df3['conv_id'], df3['group']))
        assert sorted(df3['conv_id']) == ['x-1', 'y-1']
        assert gm3['y-1'] == 'x-1'          # whole copy == merged split
        assert dict(zip(df3['conv_id'], df3['n_turns']))['x-1'] == 2

        # state versions accumulate; old version left intact
        import os
        assert os.path.exists(os.path.join(state, 'v-00000'))
        assert os.path.exists(os.path.join(state, 'v-00002'))

    def test_crashed_ingest_orphan_dir_is_recovered(self, ray_session,
                                                    tmp_path):
        """A crash after the version-dir swap but before the manifest
        swap leaves an unreferenced v-dir; the retry must clear and
        rewrite it instead of failing on os.replace."""
        import os
        import ray.data as rd
        from trafaret_ray.stages.dedup import (
            conversation_exact_dedup_incremental as incr)
        state = str(tmp_path / 'state')
        incr(rd.from_arrow(_transcripts(_base_convs())), state)
        # simulate the crash artifact: orphan next-version dir
        orphan = os.path.join(state, 'v-00001')
        os.makedirs(orphan)
        with open(os.path.join(orphan, 'junk.parquet'), 'w') as f:
            f.write('not parquet')
        g, info = incr(rd.from_arrow(_transcripts(
            {'c-9': [('user', 'retry after crash')]})), state)
        assert info['version'] == 1
        df = g.to_pandas()
        assert list(df['conv_id']) == ['c-9']

    def test_hash_mode_mismatch_raises(self, ray_session, tmp_path):
        """Fingerprints from different hash families can never match —
        state built in one mode must refuse an ingest in another
        (silently merging would break all future dedup) while a
        matching mode proceeds and dedups against prior state."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import (
            conversation_exact_dedup_incremental as incr)
        state = str(tmp_path / 'state')
        tbl = _transcripts(_base_convs())
        incr(rd.from_arrow(tbl), state, hash_mode='duckdb')
        with pytest.raises(ValueError, match='hash_mode'):
            incr(rd.from_arrow(_transcripts(
                {'c-9': [('user', 'x')]})), state)
        g, info = incr(rd.from_arrow(_transcripts(
            {'c-9': [('user', 'x')]})), state, hash_mode='duckdb')
        assert info['version'] == 1

    def test_ingest_key_replay_raises(self, ray_session, tmp_path):
        """At-least-once redelivery: replaying a keyed shard must raise
        instead of double-summing fingerprints."""
        import ray.data as rd
        from trafaret_ray.stages.dedup import (
            conversation_exact_dedup_incremental as incr)
        state = str(tmp_path / 'state')
        tbl = _transcripts(_base_convs())
        incr(rd.from_arrow(tbl), state, ingest_key='shard-0')
        with pytest.raises(ValueError, match='already applied'):
            incr(rd.from_arrow(tbl), state, ingest_key='shard-0')
        # a NEW key proceeds
        g, info = incr(rd.from_arrow(_transcripts(
            {'c-9': [('user', 'fresh')]})), state, ingest_key='shard-1')
        assert info['version'] == 1
