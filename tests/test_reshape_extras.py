"""explode_list (UNNEST) and json_scalar edge-case coverage."""

import numpy as np
import pyarrow as pa
import pytest

from trafaret_ray.functions.text import json_scalar
from trafaret_ray.stages.reshape import explode_list


class TestJsonScalar:
    def test_types_and_absence(self):
        a = pa.array(['{"k": 87}', '{"k": -3.5, "z": 1}', '{"z": 2}',
                      None, '{"k": "a\\"b"}', '{"k": true}',
                      '{"k": 1e-3}', '{"k": null}', 'not json', ''])
        got = json_scalar(a, 'k').to_pylist()
        # '1e-3' -> '0.001': numbers are re-serialized the way yyjson /
        # DuckDB json_extract_string prints them
        assert got == ['87', '-3.5', None, None, 'a"b', 'true',
                       '0.001', None, None, None]

    def test_string_with_escapes_and_colon(self):
        a = pa.array(['{"k": "v:1,2"}', '{"kk": 5, "k": "x"}'])
        assert json_scalar(a, 'k').to_pylist() == ['v:1,2', 'x']

    def test_key_is_regex_escaped(self):
        a = pa.array(['{"a.b": 7}', '{"axb": 9}'])
        assert json_scalar(a, 'a.b').to_pylist() == ['7', None]

    def test_chunked_input(self):
        a = pa.chunked_array([pa.array(['{"k": 1}']),
                              pa.array(['{"k": 2}'])])
        assert json_scalar(a, 'k').to_pylist() == ['1', '2']

    def test_nested_decoy_key_is_skipped(self):
        # top-level-only semantics, same as json_extract(..., '$.k'):
        # a k inside a nested object/array must not shadow the real one
        a = pa.array(['{"a": {"k": 99}, "k": 4}',
                      '{"a": [{"k": 99}], "k": 5}',
                      '{"a": {"b": {"k": 99}}, "k": 6}',
                      '{"a": {"k": 99}}',          # only nested -> absent
                      '{"k": 7, "b": {"k": 99}}',  # decoy after real key
                      '{"k": 8}'])                 # plain row, same batch
        got = json_scalar(a, 'k').to_pylist()
        assert got == ['4', '5', '6', None, '7', '8']

    def test_duckdb_json_extract_agreement(self):
        import duckdb
        rows = ['{"k": 87}', '{ "k" : -3 , "note" : "café" }',
                '{"kk": 9, "k": 12}', '{"a": {"k": 99}, "k": 4}',
                '{"note": "no k"}', '{"k": null}',
                '{"k": -17, "esc": "a\\"b\\\\c"}']
        ours = json_scalar(pa.array(rows), 'k').to_pylist()
        theirs = [duckdb.sql(
            "SELECT json_extract_string(?::JSON, '$.k')",
            params=[r]).fetchone()[0] for r in rows]
        assert ours == theirs


class TestExplodeList:
    def test_unnest_semantics(self, ray_session):
        import ray.data as rd
        tbl = pa.table({
            'id': pa.array([10, 11, 12, 13], type=pa.int64()),
            'v': pa.array([[1.5, 2.5], [], None, [7.0]],
                          type=pa.list_(pa.float64())),
        })
        out = explode_list(rd.from_arrow(tbl), 'v', ['id'])\
            .to_pandas().sort_values(['id', 'pos']).reset_index(drop=True)
        # SQL unnest: empty and NULL lists emit no rows
        assert out['id'].tolist() == [10, 10, 13]
        assert out['pos'].tolist() == [0, 1, 0]
        assert out['val'].tolist() == [1.5, 2.5, 7.0]

    def test_matches_numpy_oracle(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(7)
        lens = rng.integers(0, 6, 200)
        vals = [rng.normal(size=n).tolist() if n else []
                for n in lens]
        tbl = pa.table({'id': pa.array(np.arange(200, dtype=np.int64)),
                        'v': pa.array(vals, type=pa.list_(pa.float64()))})
        out = explode_list(rd.from_arrow(tbl).repartition(4), 'v', ['id'])\
            .to_pandas().sort_values(['id', 'pos']).reset_index(drop=True)
        exp_id = np.repeat(np.arange(200), lens)
        assert out['id'].to_numpy().tolist() == exp_id.tolist()
        flat = np.concatenate([np.asarray(v) for v in vals if len(v)]) \
            if lens.sum() else np.array([])
        assert np.allclose(out['val'].to_numpy(), flat)

    def test_fixed_size_list(self, ray_session):
        import ray.data as rd
        tbl = pa.table({
            'id': pa.array([1, 2], type=pa.int64()),
            'v': pa.array([[1.0, 2.0], [3.0, 4.0]],
                          type=pa.list_(pa.float64(), 2)),
        })
        out = explode_list(rd.from_arrow(tbl), 'v', ['id'])\
            .to_pandas().sort_values(['id', 'pos']).reset_index(drop=True)
        assert out['id'].tolist() == [1, 1, 2, 2]
        assert out['pos'].tolist() == [0, 1, 0, 1]
        assert out['val'].tolist() == [1.0, 2.0, 3.0, 4.0]

    def test_all_empty_keeps_schema_types(self, ray_session):
        import ray.data as rd
        tbl = pa.table({'id': pa.array([1, 2], type=pa.int64()),
                        'v': pa.array([[], None],
                                      type=pa.list_(pa.float32()))})
        out = explode_list(rd.from_arrow(tbl), 'v', ['id'])
        assert out.count() == 0
