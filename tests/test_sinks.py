"""JSONL shard-export sink: deterministic layout, atomicity, resume."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray

from trafaret_ray.sinks import export_jsonl_shards, shard_path


def _docs_ds(n=200):
    return ray.data.from_arrow(pa.table({
        'doc_id': pa.array(range(n), pa.int64()),
        'text': pa.array([f'doc {i} body' for i in range(n)]),
        'score': pa.array([i / 7.0 for i in range(n)]),
    }))


def _read_back(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith('.jsonl'):
            continue
        with open(os.path.join(out_dir, name)) as f:
            rows.extend(json.loads(line) for line in f)
    return pd.DataFrame(rows).sort_values('doc_id').reset_index(drop=True)


class TestExportJsonlShards:
    def test_round_trip_and_manifest(self, ray_session, tmp_path):
        out = str(tmp_path / 'export')
        mdf = export_jsonl_shards(_docs_ds(), out, 'doc_id', num_shards=8)
        got = _read_back(out)
        assert got['doc_id'].tolist() == list(range(200))
        assert got['text'].iloc[3] == 'doc 3 body'
        # manifest covers every written shard, counts add up
        assert mdf['rows'].sum() == 200
        assert not mdf['skipped'].any()
        assert os.path.exists(os.path.join(out, '_SUCCESS'))
        with open(os.path.join(out, 'manifest.json')) as f:
            man = json.load(f)
        assert man['num_shards'] == 8 and man['key_col'] == 'doc_id'
        assert sum(s['rows'] for s in man['shards']) == 200

    def test_layout_is_deterministic(self, ray_session, tmp_path):
        a, b = str(tmp_path / 'a'), str(tmp_path / 'b')
        export_jsonl_shards(_docs_ds(), a, 'doc_id', num_shards=4)
        export_jsonl_shards(_docs_ds(), b, 'doc_id', num_shards=4)
        for s in range(4):
            pa_, pb_ = shard_path(a, s), shard_path(b, s)
            assert os.path.exists(pa_) == os.path.exists(pb_)
            if os.path.exists(pa_):
                assert open(pa_, 'rb').read() == open(pb_, 'rb').read()

    def test_resume_skips_finished_shards(self, ray_session, tmp_path):
        out = str(tmp_path / 'resume')
        m1 = export_jsonl_shards(_docs_ds(), out, 'doc_id', num_shards=4)
        written = set(m1.loc[~m1['skipped'], 'shard'])
        # simulate a partial failure: one shard file lost
        victim = sorted(written)[0]
        before = open(shard_path(out, victim), 'rb').read()
        os.remove(shard_path(out, victim))
        m2 = export_jsonl_shards(_docs_ds(), out, 'doc_id',
                                 num_shards=4, resume=True)
        # only the victim re-written; the rest skipped
        redone = set(m2.loc[~m2['skipped'], 'shard'])
        assert redone == {victim}
        assert open(shard_path(out, victim), 'rb').read() == before
        assert _read_back(out)['doc_id'].tolist() == list(range(200))

    def test_null_key_rejected(self, ray_session, tmp_path):
        ds = ray.data.from_arrow(pa.table({
            'doc_id': pa.array([1, None], pa.int64()),
            'text': pa.array(['a', 'b'])}))
        with pytest.raises(Exception, match='null doc_id'):
            export_jsonl_shards(ds, str(tmp_path / 'bad'), 'doc_id',
                                num_shards=2)

    def test_round_trip_through_validated_json_reader(self, ray_session,
                                                      tmp_path):
        """Sink → source integration: exported shards re-ingest through
        the contract gate with zero quarantine."""
        import glob

        import trafaret_ray.contracts as t
        from trafaret_ray.contracts import drop_quarantine
        from trafaret_ray.sources.readers import read_validated

        out = str(tmp_path / 'rt')
        export_jsonl_shards(_docs_ds(50), out, 'doc_id', num_shards=4)
        files = sorted(glob.glob(out + '/*.jsonl'))
        contract = t.Dict(doc_id=t.Int(gte=0), text=t.String(),
                          score=t.Float())
        tagged = read_validated(files, contract, format='json')
        ok = tagged.map_batches(drop_quarantine, batch_format='pyarrow')
        df = ok.to_pandas().sort_values('doc_id').reset_index(drop=True)
        assert df['doc_id'].tolist() == list(range(50))
        assert df['text'].iloc[7] == 'doc 7 body'

    def test_empty_input_writes_success_and_empty_manifest(
            self, ray_session, tmp_path):
        out = str(tmp_path / 'empty')
        ds = ray.data.from_arrow(pa.table({
            'doc_id': pa.array([], pa.int64()),
            'text': pa.array([], pa.string())}))
        mdf = export_jsonl_shards(ds, out, 'doc_id', num_shards=4)
        assert len(mdf) == 0
        assert os.path.exists(os.path.join(out, '_SUCCESS'))
