"""Source readers: schema-evolution-tolerant parquet ingest."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def evolved_dir(tmp_path):
    # epoch-0 shard: no 'lang' column yet, narrow int ids
    pq.write_table(
        pa.table({'doc_id': pa.array([1, 2], pa.int32()),
                  'text': pa.array(['aa', 'bb'])}),
        str(tmp_path / 'epoch0.parquet'))
    # epoch-1 shard: added 'lang', widened ids
    pq.write_table(
        pa.table({'doc_id': pa.array([3], pa.int64()),
                  'text': pa.array(['cc']),
                  'lang': pa.array(['en'])}),
        str(tmp_path / 'epoch1.parquet'))
    return str(tmp_path)


class TestReadParquetEvolved:
    def test_unifies_names_and_promotes_types(self, ray_session,
                                              evolved_dir):
        from trafaret_ray.sources.readers import read_parquet_evolved
        df = read_parquet_evolved(evolved_dir).to_pandas()\
            .sort_values('doc_id').reset_index(drop=True)
        assert df['doc_id'].tolist() == [1, 2, 3]   # int32+int64 -> int64
        assert df['lang'].tolist() == [None, None, 'en']

    def test_projects_column_missing_from_old_shards(self, ray_session,
                                                     evolved_dir):
        from trafaret_ray.sources.readers import read_parquet_evolved
        df = read_parquet_evolved(evolved_dir,
                                  columns=['doc_id', 'lang']).to_pandas()
        assert sorted(df.columns) == ['doc_id', 'lang']
        assert df['lang'].notna().sum() == 1

    def test_explicit_schema_skips_the_footer_scan(self, ray_session,
                                                   evolved_dir):
        from trafaret_ray.sources.readers import read_parquet_evolved
        schema = pa.schema([('doc_id', pa.int64()),
                            ('text', pa.string()),
                            ('lang', pa.string())])
        df = read_parquet_evolved(evolved_dir, schema=schema).to_pandas()
        assert len(df) == 3 and df['lang'].notna().sum() == 1

    def test_gated_ingest_quarantines_missing_evolved_column(
            self, ray_session, evolved_dir):
        import trafaret_ray.contracts as t
        from trafaret_ray.contracts import (drop_quarantine,
                                            only_quarantine)
        from trafaret_ray.sources.readers import read_validated
        contract = t.Dict(doc_id=t.Int(gte=0), text=t.String(),
                          lang=t.String())  # lang REQUIRED
        tagged = read_validated(evolved_dir, contract,
                                format='parquet_evolved').materialize()
        ok = tagged.map_batches(drop_quarantine,
                                batch_format='pyarrow').to_pandas()
        quar = tagged.map_batches(only_quarantine,
                                  batch_format='pyarrow').to_pandas()
        # only the epoch-1 row carries lang; epoch-0 rows quarantine
        assert ok['doc_id'].tolist() == [3]
        assert sorted(quar['doc_id'].tolist()) == [1, 2]

    def test_optional_key_admits_old_shards(self, ray_session,
                                            evolved_dir):
        import trafaret_ray.contracts as t
        from trafaret_ray.contracts import drop_quarantine
        from trafaret_ray.sources.readers import read_validated
        contract = t.Dict(t.Key('lang', optional=True,
                                trafaret=t.String()),
                          doc_id=t.Int(gte=0), text=t.String())
        tagged = read_validated(evolved_dir, contract,
                                format='parquet_evolved')
        ok = tagged.map_batches(drop_quarantine,
                                batch_format='pyarrow').to_pandas()
        assert sorted(ok['doc_id'].tolist()) == [1, 2, 3]


class TestFormatMatrix:
    """Every non-parquet ingest format through the same contract gate."""

    CONTRACT_KW = dict(event_id=None, name=None, score=None)

    def _contract(self):
        import trafaret_ray.contracts as t
        return t.Dict(event_id=t.Int(gte=0), name=t.String(),
                      score=t.ToFloat())

    def test_csv_through_gate(self, ray_session, tmp_path):
        from trafaret_ray.contracts import (drop_quarantine,
                                            only_quarantine)
        from trafaret_ray.sources.readers import read_validated
        p = tmp_path / 'rows.csv'
        p.write_text('event_id,name,score\n'
                     '1,alpha,2.5\n'
                     '-4,beta,1.0\n'       # violates gte=0
                     '7,gamma,0.25\n')
        tagged = read_validated(str(p), self._contract(), format='csv')
        ok = tagged.map_batches(drop_quarantine,
                                batch_format='pyarrow').to_pandas()
        bad = tagged.map_batches(only_quarantine,
                                 batch_format='pyarrow').to_pandas()
        assert sorted(ok['event_id']) == [1, 7]
        assert len(bad) == 1 and bad['event_id'].iloc[0] == -4
        assert 'value is less than' in bad['_errors'].iloc[0]

    def test_jsonl_through_gate(self, ray_session, tmp_path):
        from trafaret_ray.contracts import drop_quarantine
        from trafaret_ray.sources.readers import read_validated
        p = tmp_path / 'rows.json'
        p.write_text('{"event_id": 3, "name": "x", "score": "4.5"}\n'
                     '{"event_id": 9, "name": "y", "score": "0.5"}\n')
        tagged = read_validated(str(p), self._contract(), format='json')
        ok = tagged.map_batches(drop_quarantine,
                                batch_format='pyarrow').to_pandas()
        # ToFloat coerced the string scores
        assert sorted(ok['score']) == [0.5, 4.5]

    def test_text_and_binary(self, ray_session, tmp_path):
        from trafaret_ray.sources.readers import read_binary, read_text
        p = tmp_path / 'doc.txt'
        p.write_text('line one\nline two\n')
        lines = read_text(str(p)).to_pandas()
        assert list(lines['text']) == ['line one', 'line two']
        blob = read_binary(str(p)).to_pandas()
        assert len(blob) == 1
        assert bytes(blob['bytes'].iloc[0]) == b'line one\nline two\n'
        assert blob['path'].iloc[0].endswith('doc.txt')

    def test_csv_column_projection(self, ray_session, tmp_path):
        from trafaret_ray.sources.readers import read_csv
        p = tmp_path / 'rows.csv'
        p.write_text('a,b,c\n1,2,3\n4,5,6\n')
        df = read_csv(str(p), columns=['a', 'c']).to_pandas()
        assert list(df.columns) == ['a', 'c']
        assert list(df['c']) == [3, 6]


class TestORC:
    def test_orc_roundtrip_and_validated_gate(self, ray_session, tmp_path):
        import pyarrow.orc as porc
        import ray.data as rd
        import trafaret_ray.contracts as t
        from trafaret_ray.contracts import drop_quarantine
        from trafaret_ray.sinks import write_orc
        from trafaret_ray.sources.readers import read_orc, read_validated

        tbl = pa.table({'a': pa.array([1, 2, 3], pa.int64()),
                        'b': pa.array(['x', 'y', 'z'], pa.string()),
                        'c': pa.array([1.5, 2.5, 3.5], pa.float64())})
        src = tmp_path / 'in'
        src.mkdir()
        porc.write_table(tbl.slice(0, 2), str(src / 'p1.orc'))
        porc.write_table(tbl.slice(2), str(src / 'p2.orc'))

        got = read_orc(str(src)).to_pandas().sort_values('a')\
            .reset_index(drop=True)
        assert got.equals(tbl.to_pandas())
        # column pruning at decode
        only = read_orc(str(src), columns=['a']).to_pandas()
        assert list(only.columns) == ['a']

        # contract gate over ORC input
        tagged = read_validated(str(src), t.Dict(a=t.Int(gte=2),
                                                 b=t.String(),
                                                 c=t.Float()),
                                format='orc')
        ok_rows = tagged.map_batches(drop_quarantine,
                                     batch_format='pyarrow').to_pandas()
        assert sorted(ok_rows['a']) == [2, 3]

        # sink: write_orc emits one file per block + manifest
        out = tmp_path / 'out'
        man = write_orc(rd.from_arrow(tbl).repartition(2),
                        str(out)).to_pandas()
        assert man['rows'].sum() == 3
        back = pa.concat_tables(
            [porc.ORCFile(p).read() for p in sorted(man['path'])])
        assert back.num_rows == 3


class TestFeather:
    def test_feather_roundtrip_and_gate(self, ray_session, tmp_path):
        import pyarrow.feather as pf
        import ray.data as rd
        import trafaret_ray.contracts as t
        from trafaret_ray.contracts import drop_quarantine
        from trafaret_ray.sinks import write_feather
        from trafaret_ray.sources.readers import (read_feather,
                                                  read_validated)

        tbl = pa.table({'a': pa.array([1, 2, 3], pa.int64()),
                        'b': pa.array(['x', 'y', 'z'], pa.string())})
        src = tmp_path / 'in'
        src.mkdir()
        pf.write_feather(tbl.slice(0, 2), str(src / 'p1.feather'))
        pf.write_feather(tbl.slice(2), str(src / 'p2.feather'))
        got = read_feather(str(src)).to_pandas().sort_values('a')\
            .reset_index(drop=True)
        assert got.equals(tbl.to_pandas())
        only = read_feather(str(src), columns=['b']).to_pandas()
        assert list(only.columns) == ['b']
        tagged = read_validated(str(src), t.Dict(a=t.Int(gte=2),
                                                 b=t.String()),
                                format='feather')
        ok_rows = tagged.map_batches(drop_quarantine,
                                     batch_format='pyarrow').to_pandas()
        assert sorted(ok_rows['a']) == [2, 3]
        man = write_feather(rd.from_arrow(tbl).repartition(2),
                            str(tmp_path / 'out')).to_pandas()
        assert man['rows'].sum() == 3
        back = pa.concat_tables([pf.read_table(p)
                                 for p in sorted(man['path'])])
        assert back.num_rows == 3


class TestSinkIdempotence:
    def test_manifest_consumed_twice_writes_once(self, ray_session,
                                                 tmp_path):
        """The sink manifest is materialized: consuming it twice (or
        re-reading it) must NOT re-execute the writes, and retries are
        content-addressed so the file set stays stable."""
        import os
        import ray.data as rd
        from trafaret_ray.sinks import write_orc
        tbl = pa.table({'a': pa.array(list(range(10)), pa.int64())})
        out = tmp_path / 'orc'
        man = write_orc(rd.from_arrow(tbl).repartition(2), str(out))
        assert man.count() == 2
        n_files = len(os.listdir(out))
        _ = man.to_pandas()            # second consumption
        assert len(os.listdir(out)) == n_files
        total = sum(r['rows'] for r in man.to_pandas().to_dict('records'))
        assert total == 10
        # the run's file set is durably defined by the persisted
        # manifest + _SUCCESS, not by a directory listing
        import json
        assert (out / '_SUCCESS').exists()
        m = json.loads((out / 'manifest.json').read_text())
        assert m['format'] == 'orc'
        assert sorted(r['path'] for r in m['files']) == \
            sorted(man.to_pandas()['path'].tolist())
