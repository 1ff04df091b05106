"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side on a given sf dir, compare
row-count + schema + order-insensitive values (floats rounded).

Usage: PYTHONPATH=/root/repo python tools/check_queries.py [sf_dir] [names...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd


def to_df(res) -> pd.DataFrame:
    """Dataset -> DataFrame via the arrow blocks: Ray 2.49's
    ``to_pandas()`` returns a COLUMNLESS frame for any 0-row dataset
    even when every block carries a schema (probed; the blocks are
    fine) — concatenating the blocks ourselves keeps the schema, so a
    legitimately-empty query result (e.g. the k-core of the stacked
    null-graph fixture) still column-compares against its oracle."""
    if not hasattr(res, 'to_arrow_refs'):
        return res
    import pyarrow as pa
    import ray
    blocks = [b for b in ray.get(res.to_arrow_refs())
              if b.column_names]
    if not blocks:
        return res.to_pandas()
    return pa.concat_tables(blocks,
                            promote_options='permissive').to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype('datetime64[us]')
    return df.sort_values(list(df.columns), kind='stable')\
        .reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f'rowcount {len(ray_df)} vs {len(sql_df)}')
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f'columns {list(a.columns)} vs {list(b.columns)}')
        return problems
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                av = pd.to_numeric(a[c]).to_numpy(dtype=np.float64)
                bv = pd.to_numeric(b[c]).to_numpy(dtype=np.float64)
                # the driver gate byte-hashes values, so require EXACT
                # float equality (nan==nan), not allclose
                exact = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not exact.all():
                    bad = np.nonzero(~exact)[0][:3]
                    tag = ('HASH-ONLY ' if np.allclose(
                        av, bv, rtol=1e-6, atol=1e-9, equal_nan=True)
                        else '')
                    problems.append(f'{tag}col {c} differs at rows '
                                    f'{bad.tolist()}: {av[bad]} vs {bv[bad]}')
            else:
                eq = (pd.isna(a[c]) & pd.isna(b[c])) | (a[c] == b[c])
                if not eq.all():
                    bad = np.nonzero(~eq.to_numpy())[0][:3]
                    problems.append(
                        f'col {c} differs at rows {bad.tolist()}: '
                        f'{a[c].iloc[bad].tolist()} vs '
                        f'{b[c].iloc[bad].tolist()}')
    return problems


def make_null_fixture(src: str, rate: float = 0.1,
                      seed: int = 20260817) -> str:
    """Deterministic null-injected copy of an sf dir (non-key columns
    get ``rate`` nulls) under /tmp. The adversarial companion gate:
    `check_queries.py --nulls [sf_dir]` runs EVERY oracle compare over
    it, so null-handling divergence (NaN bucketing, count(*) vs
    count(col), NULL group keys, null-skipping sums) is caught at the
    same byte-equality bar as the pristine run."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pac
    import pyarrow.parquet as pq
    keys = {'doc_id', 'vec_id', 'event_id', 'conv_id', 'l_orderkey',
            'c_custkey', 's_suppkey', 'p_partkey', 'n_nationkey',
            'r_regionkey', 'o_orderkey', 'user_id', 'turn_idx'}
    dst = f'/tmp/sf_nulls_{os.path.basename(src.rstrip("/"))}_{rate}'
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in sorted(os.listdir(src)):
        if not f.endswith('.parquet'):
            continue
        t = pq.read_table(os.path.join(src, f))
        cols = {}
        for name in t.column_names:
            col = t.column(name).combine_chunks()
            if name not in keys and t.num_rows:
                mask = pa.array(rng.random(t.num_rows) < rate)
                col = pac.if_else(mask, pa.nulls(t.num_rows, col.type),
                                  col)
            cols[name] = col
        pq.write_table(pa.table(cols), os.path.join(dst, f))
    return dst


def make_skew_fixture(src: str, seed: int = 7) -> str:
    """Deterministic hot-key / duplication copy of an sf dir: 40% of
    events reassigned to one user, 20% of lineitem to one orderkey, one
    document duplicated 300x under fresh ids. `--skew` runs every
    oracle compare over it — salting, dedup, top-k and grouped
    aggregates must stay byte-identical under pathological key
    distributions."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pac
    import pyarrow.parquet as pq
    dst = f'/tmp/sf_skew_{os.path.basename(src.rstrip("/"))}'
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in sorted(os.listdir(src)):
        if not f.endswith('.parquet'):
            continue
        t = pq.read_table(os.path.join(src, f))
        name = f[:-8]
        if name == 'events':
            uid = t.column('user_id').to_numpy(zero_copy_only=False).copy()
            uid[rng.random(len(uid)) < 0.4] = 7
            t = t.set_column(t.column_names.index('user_id'), 'user_id',
                             pa.array(uid, pa.int64()))
        elif name == 'lineitem':
            ok = t.column('l_orderkey').to_numpy(
                zero_copy_only=False).copy()
            ok[rng.random(len(ok)) < 0.2] = 1
            t = t.set_column(t.column_names.index('l_orderkey'),
                             'l_orderkey', pa.array(ok, pa.int64()))
        elif name == 'documents':
            n = 300

            def first_valid(col):  # stacked fixtures may null row 0
                v = pac.drop_null(t.column(col))
                return v[0].as_py() if len(v) else ''
            txt = first_valid('text')
            lang = first_valid('lang')
            srcv = first_valid('source')
            maxid = int(pac.max(t.column('doc_id')).as_py())
            dup = pa.table({
                'doc_id': pa.array(np.arange(maxid + 1, maxid + 1 + n,
                                             dtype=np.int64)),
                'text': pa.array([txt] * n),
                'lang': pa.array([lang] * n),
                'source': pa.array([srcv] * n),
                'n_chars': pa.array(
                    [len(txt)] * n,
                    type=t.schema.field('n_chars').type)})
            t = pa.concat_tables([t, dup.select(t.column_names)
                                  .cast(t.schema)])
        pq.write_table(t, os.path.join(dst, f))
    return dst


DIRTY_TEXTS = [
    '',                                      # empty document
    '   \t\t \n\n  ',                        # whitespace-only
    'nbsp thin space ideographic　space',
    'hello \U0001f44b\U0001f30d world \U0001f469‍\U0001f469‍'
    '\U0001f467 family',                     # emoji + ZWJ sequence
    '数据处理引擎测试文本',  # CJK
    'اختبار النص '
    'العربي',  # Arabic RTL
    'café résumé combining marks',
    'zero​width‌non‍joiners here',
    'line1\nline2\ttab\rcarriage mixed controls',
    'x' * 5000,                              # one very long token
    ('spam ' * 200).strip(),                 # extreme repetition
    '1234567890 !@#$%^&*() ,,,/// ---===',
    '\U0001d518\U0001d52b\U0001d526\U0001d520 non-BMP math \U0001f0a1',
    'Latin кириллица '
    'ελληνικά '
    'עברית',        # mixed scripts
    '"quoted" \'single\' `back` \\back\\slash\\',
    '<p>tag &amp; entity</p> <div class="x">html-ish</div>',
]

DIRTY_PROPS = [
    '{ "k" : 87 , "note" : "café üñ" }',   # spaced + unicode
    '{"other": "éè", "k": 3}',                  # k not first
    '{"k": 5, "emoji": "\U0001f600"}',
    '{"note": "no k here"}',                              # k absent
    '{"k": null}',                                        # k JSON null
    '{"kk": 9, "k": 12}',                                 # prefix-name trap
    '{"a": {"k": 99}, "k": 4}',                           # nested decoy k
    '{"k": -17, "esc": "a\\"b\\\\c"}',                    # escaped quotes
    '{"esc": "tricky\\"", "k": 21}',     # sibling ENDS in escaped quote
    '{"esc": "\\\\", "k": 8}',           # sibling is a lone backslash
    # round-4 families (the r3 driver fixture caught one of these):
    '{"k": 1.5}',                        # float -> CAST rounds to 2
    '{"k": 2e3}',                        # scientific number
    '{"k": "1.5"}',                      # string-typed decimal
    '{"k": "  7  "}',                    # string with whitespace
    '{"k": "0x1a"}',                     # hex string -> 26
    '{"k": "15e-1"}',                    # string scientific -> 2
    '{"k": 2, "k": 99}',                 # duplicate key: first wins
    '{"a": {"b": {"c": {"k": 9}}}, "k": 11}',   # depth-3 decoy
    '{"a": "see {\\"k\\": 9}", "k": 13}',       # braces inside string
    '{"k": -0.49999999999999994}',       # near-half negative float
]


def make_dirty_fixture(src: str, rate: float = 0.12,
                       seed: int = 20260818) -> str:
    """Deterministic adversarial-strings copy of an sf dir: ~``rate`` of
    ``documents.text`` replaced with unicode/control/degenerate strings
    (``n_chars`` kept consistent, codepoint length), a few unicode
    ``lang``/``source``/``event_type`` group keys, and ~``rate`` of
    ``events.props`` replaced with hostile-but-valid JSON (unicode
    siblings, nested decoy keys, escapes). `--dirty` runs EVERY oracle
    compare over it, so tokenizer/regex/JSON/string-kernel divergence
    between the Arrow kernels and DuckDB is caught at byte equality."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    dst = f'/tmp/sf_dirty_{os.path.basename(src.rstrip("/"))}'
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in sorted(os.listdir(src)):
        if not f.endswith('.parquet'):
            continue
        t = pq.read_table(os.path.join(src, f))
        name = f[:-8]
        if name == 'documents' and t.num_rows:
            txt = t.column('text').to_pylist()
            lang = t.column('lang').to_pylist()
            srcv = t.column('source').to_pylist()
            hit = np.flatnonzero(rng.random(t.num_rows) < rate)
            for j, i in enumerate(hit):
                txt[i] = DIRTY_TEXTS[j % len(DIRTY_TEXTS)]
            for i in np.flatnonzero(rng.random(t.num_rows) < 0.02):
                lang[i] = '中文'
                srcv[i] = 'srcé/\U0001f4da'
            t = pa.table({
                'doc_id': t.column('doc_id'),
                'text': pa.array(txt, pa.string()),
                'lang': pa.array(lang, pa.string()),
                'source': pa.array(srcv, pa.string()),
                'n_chars': pa.array(
                    [len(s) if s is not None else None for s in txt],
                    pa.int64())})
        elif name == 'events' and t.num_rows:
            props = t.column('props').to_pylist()
            etype = t.column('event_type').to_pylist()
            hit = np.flatnonzero(rng.random(t.num_rows) < rate)
            for j, i in enumerate(hit):
                props[i] = DIRTY_PROPS[j % len(DIRTY_PROPS)]
            for i in np.flatnonzero(rng.random(t.num_rows) < 0.02):
                etype[i] = 'typé​'
            t = t.set_column(t.column_names.index('props'), 'props',
                             pa.array(props, pa.string()))
            t = t.set_column(t.column_names.index('event_type'),
                             'event_type', pa.array(etype, pa.string()))
        pq.write_table(t, os.path.join(dst, f))
    return dst


# Every entry parses on BOTH engines without raising (CAST errors
# abort a whole query on both sides, so error-inducing values can't be
# gate-compared — they are pinned per-value in tests/test_json_kernel.py
# instead).  Families: the divergence-envelope reroute (quoted numeric
# strings, explicit exponent + 19+ fractional digits, signs/whitespace/
# underscores), int64-boundary values, DuckDB cast quirks (hex/binary/
# separators/'+ '/break-at-zero rounding), yyjson re-serialization
# (huge ints -> double, exponent switch points), duplicate keys, deep
# nesting, unicode escapes of the key itself, and decoys.
JSON_HOSTILE_PROPS = [
    '{"k": "97094.9009592086744391727e0"}',     # the VERDICT envelope case
    '{"k": "-312.881228217819236534606E+0"}',   # negative envelope
    '{"k": ".88694853074878134095e+0"}',        # sign-flip family
    '{"k": "-.905024065117471170648579E0"}',
    '{"k": " \\t2904.90471281442944401929275243e+0 "}',  # padded envelope
    '{"k": "1.2345678901234567_89e0"}',         # underscore envelope
    '{"k": "+613.5638438692743669888_9e-2"}',   # sign + underscore env
    '{"k": "0.0000000000000000001e19"}',        # leading-zero frac env
    '{"k": "1.9999999999999999999e2"}',         # env rounding at 200
    '{"k": 9223372036854775807}',               # int64 max number
    '{"k": -9223372036854775808}',              # int64 min number
    '{"k": "9223372036854775807"}',             # int64 max string
    '{"k": "9223372036854775806.6"}',           # exact-rounding to max
    '{"k": "-9223372036854775807.5"}',          # exact-rounding to min
    '{"k": 1e18}',                              # plain-notation switch
    '{"k": 2.5}', '{"k": -2.5}', '{"k": 3.5}',  # number-path rounding
    '{"k": "2.5"}', '{"k": "-2.5"}',            # string-path half-up
    '{"k": "0x1F"}', '{"k": "0b101"}',          # hex / binary strings
    '{"k": "1_000"}', '{"k": " 1_2_3 "}',       # separators
    '{"k": "+ "}',                              # bare-sign + ws -> 0
    '{"k": "5e-100"}', '{"k": "15e-20"}',       # break-at-zero rounding
    '{"k": "0.05e-19"}',                        # tiny-fraction quirk
    '{"k": "  -42  "}',                         # whitespace trim
    '{"\\u006b": 77}',                          # escaped key IS k
    '{"k": 1, "k": 2}',                         # duplicate key first-wins
    '{"a": {"k": {"k": [{"k": 9}]}}, "k": 6}',  # deep nested decoys
    # >int64 digit run the struct-payload REGEX sees (nested, so the
    # json '$.k' path stays clean): TRY_CAST must NULL on both engines
    '{"a": {"k": 99999999999999999999}, "k": 5}',
    '{"s": "watch {\\"k\\": 1} inside", "k": 3}',
    '{"k": 7.0e0}', '{"k": -0.0}',              # integral floats
    '{"k": 0.49999999999999994}',               # just-under-half double
]


def make_json_hostile_fixture(src: str, rate: float = 0.3,
                              seed: int = 20260820) -> str:
    """Deterministic hostile-JSON copy of an sf dir: ~``rate`` of
    ``events.props`` replaced with JSON_HOSTILE_PROPS (cycled), PLUS
    half the rows of the two smallest event_types forced to int64
    max / min payloads so the per-type SUM overflows int64 in both
    directions — DuckDB promotes sum(BIGINT) to HUGEINT while a naive
    Arrow sum wraps, so `--json-hostile` proves the engine's exact
    wide-sum path and the envelope reroute at the same byte bar as the
    other gates."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    dst = f'/tmp/sf_json_hostile_{os.path.basename(src.rstrip("/"))}'
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in sorted(os.listdir(src)):
        if not f.endswith('.parquet'):
            continue
        t = pq.read_table(os.path.join(src, f))
        if f[:-8] == 'events' and t.num_rows:
            props = t.column('props').to_pylist()
            etype = t.column('event_type').to_pylist()
            types = sorted({e for e in etype if e is not None})
            overflow = {types[0]: '{"k": 9223372036854775807}'} \
                if types else {}
            if len(types) > 1:
                overflow[types[1]] = '{"k": -9223372036854775808}'
            r = rng.random(t.num_rows)
            j = 0
            for i in range(t.num_rows):
                if etype[i] in overflow and r[i] < 0.5:
                    props[i] = overflow[etype[i]]
                elif r[i] < rate:
                    props[i] = JSON_HOSTILE_PROPS[
                        j % len(JSON_HOSTILE_PROPS)]
                    j += 1
            t = t.set_column(t.column_names.index('props'), 'props',
                             pa.array(props, pa.string()))
        pq.write_table(t, os.path.join(dst, f))
    return dst


def make_shuffled_fixture(src: str, seed: int = 20260819) -> str:
    """Deterministic row-permutation copy of an sf dir: every table's
    rows land in a seeded random order (also re-chunked into small row
    groups so Ray block boundaries move). At 100 TB the input arrives
    in arbitrary file/row order — `--shuffled` proves every oracle
    query is byte-identical under a permuted input: window/session/
    as-of kernels must derive order from data (total sort keys, ties
    broken explicitly), never from input position."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    dst = f'/tmp/sf_shuffled_{os.path.basename(src.rstrip("/"))}'
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    for f in sorted(os.listdir(src)):
        if not f.endswith('.parquet'):
            continue
        t = pq.read_table(os.path.join(src, f))
        if t.num_rows:
            t = t.take(rng.permutation(t.num_rows))
        pq.write_table(t, os.path.join(dst, f),
                       row_group_size=max(1, t.num_rows // 7))
    return dst


def main():
    args = [a for a in sys.argv[1:]
            if a not in ('--nulls', '--skew', '--dirty', '--json-hostile',
                         '--shuffled')]
    sf_dir = args[0] if args else '/root/testdata/sf0.01'
    only = set(args[1:])
    selfcmp_src = None
    # fixtures STACK (applied in this order) — `--nulls --dirty` runs
    # the whole gate over a null-bearing AND adversarial-strings copy;
    # cross-hazard interactions (null text x hostile JSON, skewed hot
    # keys x permuted order) are where the compound bugs live.
    if '--nulls' in sys.argv[1:]:
        sf_dir = make_null_fixture(sf_dir)
        print(f'[null fixture] {sf_dir}')
    if '--skew' in sys.argv[1:]:
        sf_dir = make_skew_fixture(sf_dir)
        print(f'[skew fixture] {sf_dir}')
    if '--dirty' in sys.argv[1:]:
        sf_dir = make_dirty_fixture(sf_dir)
        print(f'[dirty fixture] {sf_dir}')
    if '--json-hostile' in sys.argv[1:]:
        sf_dir = make_json_hostile_fixture(sf_dir)
        print(f'[json-hostile fixture] {sf_dir}')
    if '--shuffled' in sys.argv[1:]:
        selfcmp_src = sf_dir
        sf_dir = make_shuffled_fixture(sf_dir)
        print(f'[shuffled fixture] {sf_dir}')
    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=8, include_dashboard=False,
                 logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for tbl in ('region nation customer supplier part orders lineitem '
                'events documents embeddings').split():
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tbl}.parquet')")

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            ray_df = to_df(res)
            if name not in oracles:
                if selfcmp_src is None:
                    print(f'{name}: rows-only ({len(ray_df)} rows) '
                          '[no oracle]')
                    continue
                # shuffled mode: the data is IDENTICAL (only row order
                # moved), so rows-only queries self-compare against the
                # pristine run — permutation invariance at byte parity
                res2 = fn(selfcmp_src)
                base_df = to_df(res2)
                problems = compare(name, ray_df, base_df)
                if not problems:
                    print(f'{name}: ok ({len(ray_df)} rows) '
                          '[self-parity]')
                else:
                    failures += 1
                    print(f'{name}: FAIL — ' + '; '.join(problems))
                continue
            sql_df = con.sql(oracles[name]).df()
            problems = compare(name, ray_df, sql_df)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            problems = [f'EXCEPTION {type(e).__name__}: {e}']
        if problems:
            failures += 1
            print(f'{name}: FAIL — ' + '; '.join(problems))
        else:
            print(f'{name}: ok ({len(ray_df)} rows)')
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main()
