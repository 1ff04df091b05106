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
