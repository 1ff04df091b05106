"""Regression tests for the round-3 review findings (all reproduced or
proven before fixing):

  * exact_distinct overcounted when only SOME blocks carried nulls (the
    pandas round-trip floatified the value column per block, so int 1
    and float 1.0 hashed to different buckets),
  * asof_join / asof_join_broadcast matched NULL by-keys to each other
    (factorize sentinels both sides' nulls to -1),
  * asof_join cast timestamps straight to int64 (ns-unit inputs made
    tolerances 1000x too strict),
  * asof_forward / asof_nearest truncated float on-columns to int64,
  * grouped_quantiles crashed on nullable numeric group columns (NaN
    group keys -> ArrowInvalid) and split every null into its own group,
  * the salted flagship carried INT64_MIN for a NULL chunk-final text
    instead of NULL prev_text_len,
  * broadcast_join's per-batch from_pandas had no explicit schema
    (left-join null-padding floatified int columns in some blocks only),
  * heavy_hitters' exactness certificate ignored head(m)-dropped
    candidates, so it could certify a WRONG top-k as exact.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd():
    import ray.data as rd
    return rd


def test_exact_distinct_mixed_null_blocks(ray_session):
    from trafaret_ray.stages.sketches import exact_distinct
    ta = pa.table({'g': pa.array(['a'] * 100),
                   'v': pa.array([1, 2] * 50, type=pa.int64())})
    tb = pa.table({'g': pa.array(['a'] * 100),
                   'v': pa.array([1, None] * 50, type=pa.int64())})
    out = exact_distinct(_rd().from_arrow([ta, tb]), 'g', 'v').to_pandas()
    assert out.set_index('g')['n_distinct'].to_dict() == {'a': 2}


def test_asof_join_null_by_keys_never_match(ray_session):
    from trafaret_ray.stages.joins import asof_join, asof_join_broadcast
    left = pa.table({'e': pa.array([None, 'u'], type=pa.string()),
                     'ts': pa.array([10, 10], type=pa.int64())})
    right = pa.table({'e': pa.array([None, 'u'], type=pa.string()),
                      'ts': pa.array([5, 5], type=pa.int64()),
                      'val': pa.array([111, 222], type=pa.int64())})
    outs = {
        'hash': asof_join(_rd().from_arrow(left), _rd().from_arrow(right),
                          by='e', on='ts', value_cols=['val'],
                          left_schema=left.schema,
                          right_schema=right.schema),
        'broadcast': asof_join_broadcast(_rd().from_arrow(left), right,
                                         by='e', on='ts',
                                         value_cols=['val']),
    }
    for name, out in outs.items():
        df = out.to_pandas().sort_values('e', na_position='first')\
            .reset_index(drop=True)
        assert pd.isna(df.loc[0, 'val_state']), name  # NULL by: no match
        assert df.loc[1, 'val_state'] == 222, name


def test_asof_join_ns_timestamps_use_us_tolerance(ray_session):
    from trafaret_ray.stages.joins import asof_join
    # 90 s gap; tolerance 120 s in MICROSECONDS must match even when the
    # column arrives as timestamp('ns')
    lts = pa.array(np.array([200_000_000_000], dtype='datetime64[ns]'))
    rts = pa.array(np.array([110_000_000_000], dtype='datetime64[ns]'))
    left = pa.table({'e': ['u'], 'ts': lts})
    right = pa.table({'e': ['u'], 'ts': rts,
                      'val': pa.array([7], type=pa.int64())})
    out = asof_join(_rd().from_arrow(left), _rd().from_arrow(right),
                    by='e', on='ts', value_cols=['val'],
                    tolerance=120_000_000,
                    left_schema=left.schema, right_schema=right.schema)
    assert out.to_pandas()['val_state'].tolist() == [7]


def test_asof_forward_nearest_float_on():
    from trafaret_ray.stages.window import asof_forward, asof_nearest
    g = np.zeros(1, dtype=np.int64)
    rg = np.zeros(2, dtype=np.int64)
    rts = np.array([2.1, 2.9])
    # forward from 2.5: int64 truncation maps everything to 2 and finds
    # nothing; the true forward match is 2.9
    idx, ok = asof_forward(np.array([2.5]), g, rts, rg)
    assert ok[0] and rts[idx[0]] == 2.9
    # nearest to 2.6: backward candidate 2.1 (d=0.5), forward 2.9
    # (d=0.3) -> forward must win on the sub-unit gap
    idx, ok = asof_nearest(np.array([2.6]), g, rts, rg)
    assert ok[0] and rts[idx[0]] == 2.9
    # empty right side: no crash, nothing matched
    idx, ok = asof_nearest(np.array([1.0]), g, np.array([]),
                           np.array([], dtype=np.int64))
    assert not ok[0]


def test_grouped_quantiles_nullable_int_groups(ray_session):
    from trafaret_ray.stages.aggregate import grouped_quantiles
    t = pa.table({'g': pa.array([1, 1, None, None, 2, 2], type=pa.int64()),
                  'v': pa.array([1.0, 3.0, 10.0, 20.0, 5.0, 7.0])})
    out = grouped_quantiles(_rd().from_arrow(t), 'g', 'v', [0.5])\
        .to_pandas()
    got = {(-1 if pd.isna(g) else int(g)): v
           for g, v in zip(out['g'], out['value'])}
    # NULL is ONE group (SQL GROUP BY), not one group per null row
    assert got == {1: 2.0, -1: 15.0, 2: 6.0}


def test_broadcast_join_left_schema_stable(ray_session):
    from trafaret_ray.stages.joins import broadcast_join
    small = pa.table({'k': pa.array([1], type=pa.int64()),
                      'r': pa.array([100], type=pa.int64())})
    # block A fully matches; block B has zero matches (all-null padding)
    ta = pa.table({'k': pa.array([1, 1], type=pa.int64())})
    tb = pa.table({'k': pa.array([2, 2], type=pa.int64())})
    out = broadcast_join(_rd().from_arrow([ta, tb]), small, on='k',
                         how='left')
    tab = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format='pyarrow'))
    assert tab.schema.field('r').type == pa.int64()
    df = tab.to_pandas().sort_values('k').reset_index(drop=True)
    assert df['r'].tolist()[:2] == [100, 100]
    assert df['r'].isna().tolist() == [False, False, True, True]


def test_heavy_hitters_certificate_covers_dropped_candidates(ray_session):
    from trafaret_ray.stages.sketches import heavy_hitters
    # Two blocks, k=1, expansion=2 (m=2). Block 1 (no truncation):
    # A x9, D x7. Block 2 (truncates to top-2): C x10, E x9, D x5
    # hidden under cut=9. Candidate union: C:10, A:9, E:9, D:7 ->
    # head(2) keeps {C, A}; exact kth = 10 > T = 9, so the OLD
    # certificate declared [C:10] exact — but D's true count is 12.
    t1 = pa.table({'v': pa.array(['A'] * 9 + ['D'] * 7)})
    t2 = pa.table({'v': pa.array(['C'] * 10 + ['E'] * 9 + ['D'] * 5)})
    out = heavy_hitters(_rd().from_arrow([t1, t2]), 'v', k=1, expansion=2)\
        .to_pandas()
    assert out['v'].tolist() == ['D']
    assert out['n'].tolist() == [12]


def test_salted_flagship_null_text_at_chunk_boundary(ray_session):
    import pyarrow.compute as pc

    from trafaret_ray.pipelines.flagship import feature_dataset
    from trafaret_ray.stages.salting import flagship_features_salted
    n = 300
    ts = pa.array(
        np.arange(n) * 1_000_000, type=pa.int64()).cast(pa.timestamp('us'))
    text = pa.array([None if i % 100 == 99 else 't' * (i % 7 + 1)
                     for i in range(n)], type=pa.string())
    tbl = pa.table({
        'conv_id': pa.array(['c0'] * n),
        'turn_idx': pa.array(np.arange(n, dtype=np.int64)),
        'role': pa.array(['user', 'assistant'] * (n // 2)),
        'text': text,
        'tool': pa.array([None] * n, type=pa.string()),
        'ts': ts,
    })
    ds = _rd().from_arrow(tbl)
    cols = ['conv_id', 'turn_idx', 'prev_text_len', 'session_id',
            'pos_in_session', 'time_since_prev_s']
    plain = feature_dataset(ds).to_pandas()[cols]\
        .sort_values(['conv_id', 'turn_idx']).reset_index(drop=True)
    # chunk_rows=100 puts the NULL text (idx 99, 199) at chunk ends
    salted = flagship_features_salted(ds, max_group_rows=100,
                                      chunk_rows=100).to_pandas()[cols]\
        .sort_values(['conv_id', 'turn_idx']).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain, salted)
    # the carried lag on each later chunk's first row is NULL, not junk
    assert pd.isna(salted.loc[100, 'prev_text_len'])
    assert pd.isna(salted.loc[200, 'prev_text_len'])


def test_json_scalar_escaped_quote_values():
    import duckdb

    from trafaret_ray.functions.text import json_scalar
    cases = [
        '{"k": "say \\"hi\\""}',       # value ends in an escaped quote
        '{"k": "\\\\"}',               # value is a single backslash
        '{"k": "a\\"b"}', '{"k": ""}', '{"k": "tail\\\\"}',
        '{"esc": "tricky\\"", "k": 21}',   # hostile sibling
    ]
    got = json_scalar(pa.array(cases), 'k').to_pylist()
    want = [duckdb.sql(
        "select json_extract_string('"
        + c.replace("'", "''") + "', '$.k')").fetchone()[0]
        for c in cases]
    assert got == want


def test_curate_documents_string_ids(ray_session):
    from trafaret_ray.pipelines.curation import curate_documents
    text = ('the quick brown fox jumps over the lazy dog and then '
            'keeps running for a while longer')
    tbl = pa.table({
        'doc_id': pa.array([f'doc-{i:03d}' for i in range(40)]),
        'text': pa.array([text if i % 2 else text + f' extra {i}'
                          for i in range(40)]),
    })
    out = curate_documents(_rd().from_arrow(tbl), langs=('en',),
                           min_words=3, near_threshold=0.95,
                           num_buckets=4).to_pandas()
    assert len(out) >= 1
    assert out['doc_id'].map(lambda v: isinstance(v, str)).all()


def test_transcripts_single_defect_per_bad_row(ray_session):
    import pyarrow.compute as pc

    from trafaret_ray.contracts import BatchValidator, only_quarantine
    from trafaret_ray.sources.transcripts import (generate_table,
                                                  transcript_contract)
    tbl = generate_table(20000, seed=11, malformed_frac=0.2)
    v = BatchValidator(transcript_contract())
    tagged = v.tag(tbl)
    q = only_quarantine(tagged)
    import json
    errs = [json.loads(e) for e in q.column('_errors').to_pylist()]
    multi = [e for e in errs if len(e) != 1]
    assert not multi, f'{len(multi)} bad rows carry >1 defect: {multi[:3]}'


def test_int_batch_survives_out_of_range_floats():
    import trafaret_ray.contracts as t
    arr = pa.array([1e30, 2.0, -1e30, 3.0])
    res = t.Int().apply(arr)
    assert list(res.ok) == [False, True, False, True]
    assert res.values.to_pylist() == [None, 2, None, 3]


def test_mapping_sliced_maparray():
    import trafaret_ray.contracts as t
    m = pa.array([{'a': 1}, {'b': 2}, {'c': 3}, {'d': -4}, {'e': 5}],
                 type=pa.map_(pa.string(), pa.int64()))
    c = t.Mapping(t.String(), t.Int(gte=0))
    res = c.apply(m.slice(2, 3))      # rows c, d, e
    assert list(res.ok) == [True, False, True]
    assert res.values.to_pylist()[0] == [('c', 3)]
    assert res.msgs[1] == {'d': {'value': 'value is less than 0'}}


def test_tuple_all_rows_wrong_arity():
    import trafaret_ray.contracts as t
    res = t.Tuple(t.Int(), t.Int()).apply(
        pa.array([[], [1, 2, 3]], type=pa.list_(pa.int64())))
    assert list(res.ok) == [False, False]
    assert all(m == 'value must contain 2 items' for m in res.msgs)


def test_onerror_keeps_child_code_scalar():
    import pytest

    import trafaret_ray.contracts as t
    from trafaret_ray.contracts.result import DataError
    c = t.OnError(t.Int(gte=0), 'nope')          # no override code
    with pytest.raises(DataError) as ei:
        c.check(-1)
    assert ei.value.code == 'too_small'           # child code preserved
    c2 = t.OnError(t.Int(gte=0), 'nope', code='custom')
    with pytest.raises(DataError) as ei2:
        c2.check(-1)
    assert ei2.value.code == 'custom'


def test_dataerror_reference_defaults():
    from trafaret_ray.contracts.result import DataError
    e = DataError('boom')
    assert isinstance(e, ValueError)             # reference subclasses it
    assert e.code == 'unknown'                   # reference default
    assert e.to_struct() == {'code': 'unknown', 'message': 'boom'}
    nested = DataError(error={'k': DataError('bad')})
    assert nested.to_struct()['code'] == 'unknown'


def test_heavy_hitters_always_exact_random(ray_session):
    """heavy_hitters promises EXACT top-k on any distribution (certify
    or fall back) — check against brute-force counts over seeded random
    multi-block inputs stressing small m (head cuts + truncation)."""
    from collections import Counter

    from trafaret_ray.stages.sketches import heavy_hitters
    for seed in range(6):
        rng = np.random.default_rng(seed)
        blocks, everything = [], []
        for _ in range(3):
            vals = rng.zipf(1.5, size=400) % 37   # skewed, small keyspace
            strs = [f'k{v}' for v in vals]
            everything.extend(strs)
            blocks.append(pa.table({'v': pa.array(strs)}))
        k = int(rng.integers(1, 4))
        out = heavy_hitters(_rd().from_arrow(blocks), 'v', k=k,
                            expansion=2).to_pandas()
        cnt = Counter(everything)
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        got = list(zip(out['v'], out['n']))
        assert got == exp, (seed, k, got, exp)


def test_cosine_topk_rows_tie_and_nan():
    from trafaret_ray.stages.ann import cosine_topk_rows
    # 1-ulp apart: both round to 0.8 micro-units — the SMALLER id must
    # survive the cut (raw-double ranking kept batch order instead)
    ids = np.array([5, 3], dtype=np.int64)
    sims = np.array([0.8000000001, 0.7999999999])
    top_ids, top_sims = cosine_topk_rows(ids, sims, 1)
    assert top_ids.tolist() == [3] and top_sims.tolist() == [0.8]
    # NaN sims (zero-norm vector) must never rank
    ids = np.array([1, 2], dtype=np.int64)
    sims = np.array([np.nan, 0.5])
    top_ids, _ = cosine_topk_rows(ids, sims, 2)
    assert top_ids.tolist() == [2]


def test_stats_missing_parquet_fallbacks(ray_session, tmp_path):
    """q_pack_docs / q_tfidf_docs must not conflate 'writer omitted
    row-group statistics' with 'empty input' / 'zero nulls'."""
    import pyarrow.parquet as pq

    from trafaret_ray.pipelines.queries import QUERIES
    src = '/root/testdata/sf0.001/documents.parquet'
    t = pq.read_table(src)
    nostats = tmp_path / 'nostats'
    nostats.mkdir()
    pq.write_table(t, str(nostats / 'documents.parquet'),
                   write_statistics=False)
    for q in ('q_pack_docs', 'q_tfidf_docs'):
        ref = QUERIES[q]('/root/testdata/sf0.001').to_pandas()
        got = QUERIES[q](str(nostats)).to_pandas()
        pd.testing.assert_frame_equal(
            ref.reset_index(drop=True), got.reset_index(drop=True)), q
        assert len(got) > 0, q


def test_json_scalar_null_string_vs_json_null():
    import duckdb

    from trafaret_ray.functions.text import json_scalar
    cases = ['{"k": "null"}', '{"k": null}', '{"k": "x"}']
    got = json_scalar(pa.array(cases), 'k').to_pylist()
    want = [duckdb.sql("select json_extract_string('" + c + "', '$.k')")
            .fetchone()[0] for c in cases]
    assert got == want  # ['null', None, 'x']


def test_normalize_text_trims_spaces_only():
    import duckdb

    from trafaret_ray.functions.text import normalize_text
    # \x0b and \x85 are Unicode whitespace OUTSIDE RE2 \s: DuckDB's
    # space-only trim() keeps them, so must the engine
    texts = ['x\x0b', 'x\x85', '  A \t B  ', '\x0by', 'a b']
    got = normalize_text(pa.array(texts)).to_pylist()
    want = [duckdb.sql(
        "select lower(trim(regexp_replace(?, '\\s+', ' ', 'g')))",
        params=[t]).fetchone()[0] for t in texts]
    assert got == want


def test_streaming_lagger_empty_batch_typed():
    from trafaret_ray.stages.streaming import StreamingLagger
    lag = StreamingLagger(key='user_id', ts_col='ts',
                          value_cols=('value',))
    schema = pa.schema([('user_id', pa.string()),
                        ('ts', pa.timestamp('us')),
                        ('value', pa.float64())])
    empty_out = lag(schema.empty_table())
    full_out = lag(pa.table({
        'user_id': pa.array(['u']),
        'ts': pa.array([0], pa.int64()).cast(pa.timestamp('us')),
        'value': pa.array([1.0])}))
    # typed empty: prev_value must be double, and the two outputs concat
    assert empty_out.schema.field('prev_value').type == pa.float64()
    pa.concat_tables([empty_out, full_out])


def test_word_shingles_subk_emits_zero():
    from trafaret_ray.functions.text import word_shingles
    lengths, flat = word_shingles(['a b', 'a b c d', ''], k=3)
    assert lengths.tolist() == [0, 2, 0]       # sub-k docs: ZERO shingles
    assert len(flat) == 2


def test_quality_features_null_text_all_null():
    from trafaret_ray.functions.text import quality_features
    out = quality_features(pa.array(['hello world', None]))
    for name, arr in out.items():
        vals = arr.to_pylist() if not isinstance(arr, list) else arr
        assert vals[1] is None, name           # EVERY signal null
        assert vals[0] is not None, name
