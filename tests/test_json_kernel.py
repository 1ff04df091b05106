"""DuckDB differential for the JSON kernels (functions/text.py):

- json_scalar      vs  json_extract_string(doc, '$.k')
- json_bigint      vs  CAST(json_extract_string(doc, '$.k') AS BIGINT)
- duckdb_bigint_parse  vs  CAST(varchar AS BIGINT)

These pin the r3 driver failure (q_json_props_events hash mismatch):
DuckDB rounds decimal strings half away from zero with EXACT integer
arithmetic, parses scientific/hex/underscore forms, re-serializes JSON
numbers through yyjson, and resolves duplicate keys first-wins.  Every
family the r3 verdict named (decimal strings, scientific notation,
duplicate keys, unicode escapes, huge ints, leading +/whitespace) is
covered both by curated cases and a seeded fuzz.
"""

import json
import random

import duckdb
import pyarrow as pa
import pytest

from trafaret_ray.functions.text import (bigint_from_string,
                                         duckdb_bigint_parse,
                                         duckdb_bigint_sql, json_bigint,
                                         json_scalar)

CURATED_DOCS = [
    '{"k": 69}', '{"k":1,"k":2}', '{"k": 1, "a": {"k": 99}}',
    '{"a": {"k": 99}, "k": 1}', '{"a": "}", "k": 5}',
    '{"a": "{\\"k\\": 9}", "k": 5}', '{"k": "12"}', '{"k": 1.5}',
    '{"k": 2e3}', '{"k": null}', '{"K": 1}', '{ "k" : 3 }',
    '{"k": "1.5"}', '{"k": -0}', '{"k": "null"}', '{"a": "[", "k": 7}',
    '{"b": [{"k": 8}], "k": 6}', '{"k": "\\u0031\\u0032"}', '{}',
    '{"a": {"b": {"c": {"k": 9}}}, "k": 11}',
    '{"a": {"b": {"c": {"k": 9}}}}',
    '{"k": 1e-3}', '{"k": 12.0}', '{"k": 0.1}', '{"k": 1E+2}',
    '{"k": 12345678901234567}', '{"k": -9223372036854775808}',
    '{"k": 1.7976931348623157e308}', '{"k": 5e-324}',
    '{"k": 123456789.123456789}', '{"k": -0.0}',
    '{"k": "0x1a"}', '{"k": "1_0"}', '{"k": "  7  "}', '{"k": ".5"}',
    '{"k": "5."}', '{"k": "+7"}', '{"k": "007"}', '{"k": "2.675"}',
    '{"k": "9223372036854775806.6"}', '{"k": "0b101"}',
    '{"k": "1.5e+2"}', '{"k": "15e-1"}',
    '{"k2": 5, "k": 10}', '{"kk": 9, "k": 12}',
    '{"x": "a,\\"k\\": 77,", "k": 14}',
    '{"k": 4503599627370497.5}',
    '{"k": 1e21}', '{"k": 1e-7}', '{"k": 1e20}', '{"k": 0.000015}',
    '{"k": "say \\"hi\\""}', '{"k": ""}',
    '{"k": [1,2]}', '{"k": {"x":1}}', '{"a": 1, "k": {"k": 5}}',
    '{"k": 1.0, "k": "x"}',
    '{"deep": [[[{"k": 3}]]], "k": 15}',
    '{"k": 18446744073709551615}', '{"k": 184467440737095516150}',
    '{"k": 9223372036854775807}', '{"k": 9223372036854775808}',
]

CURATED_CASTS = [
    '1.5', '2.5', '-1.5', '0.5', '1.4999', '2e3', ' 42 ', '+7', '007',
    '9223372036854775807', '9223372036854775808', '1e19', 'true', '',
    'abc', '1.5.5', '0x10', '1_000', '.5', '-.5', '5.', '1e', 'nan',
    'inf', '1e-2', '15e-1', '1.5E2', '0b101', '0B11', '1.5_5', '1._5',
    '1.5e+2', '1.e2', '.e2', '0x', '+.5', '-.5e1', ' 0x10 ', '1 000',
    '123.', '+0', '-', 'e5', '.', '..5', '9223372036854775806.6',
    '922337203685477580.7e1', '0.49999999999999994',
    '4503599627370497.5', '1e1000000', '-1e1000000', '1e-1000000',
    '00000000000000000000001', '9223372036854775807.5',
    '-9223372036854775808', '-9223372036854775808.4',
    '-9223372036854775808.5', '0x7FFFFFFFFFFFFFFF',
    '0x8000000000000000',
    # the weird-but-real DuckDB branches (probed, see
    # duckdb_bigint_parse docstring): negative exponents round on the
    # last digit removed before the accumulator hits zero
    '5e-100', '15e-20', '45e-21', '95e-21', '9.9e-2', '123.456e-4',
    '199.9e-3', '50.4e-2', '0.5e-19', '0.05e-19', '0.55e-1',
    '0.005e-1', '0.4e-19', '5000000000000000000e-19',
    '99999999999999999999e-10', '-9223372036854775808e-1',
    '9223372036854775807e-1', '0e32767', '0e32768', '1e-32768',
    '1e-32769', '+ ', '- ', '+', ' + ', '+\t', '+5 ',
]


def _duck_extract(con, doc):
    return con.sql("SELECT json_extract_string(?, '$.k')",
                   params=[doc]).fetchone()[0]


def _duck_cast_doc(con, doc):
    try:
        return ('OK', con.sql(
            "SELECT CAST(json_extract_string(?, '$.k') AS BIGINT)",
            params=[doc]).fetchone()[0])
    except Exception:
        return ('ERR', None)


def _our_cast_doc(doc):
    try:
        return ('OK', json_bigint(pa.array([doc]), 'k').to_pylist()[0])
    except ValueError:
        return ('ERR', None)


class TestCurated:
    def test_json_scalar_matches_duckdb(self):
        con = duckdb.connect()
        ours = json_scalar(pa.array(CURATED_DOCS), 'k').to_pylist()
        for doc, mine in zip(CURATED_DOCS, ours):
            assert mine == _duck_extract(con, doc), doc

    def test_json_bigint_matches_duckdb(self):
        con = duckdb.connect()
        for doc in CURATED_DOCS:
            assert _our_cast_doc(doc) == _duck_cast_doc(con, doc), doc

    def test_bigint_parse_matches_duckdb(self):
        con = duckdb.connect()
        for s in CURATED_CASTS:
            try:
                theirs = ('OK', con.sql("SELECT CAST(? AS BIGINT)",
                                        params=[s]).fetchone()[0])
            except Exception:
                theirs = ('ERR', None)
            try:
                mine = ('OK', duckdb_bigint_parse(s))
            except ValueError:
                mine = ('ERR', None)
            assert mine == theirs, repr(s)

    def test_null_and_malformed(self):
        # nulls stay null; malformed JSON is lenient-null on our side
        # (DuckDB raises — an error on both engines can never diverge
        # a result comparison)
        a = pa.array([None, 'not json', '', '{"k": 1'])
        assert json_scalar(a, 'k').to_pylist() == [None] * 4
        assert json_bigint(a, 'k').to_pylist() == [None] * 4

    def test_booleans_raise_like_duckdb_cast(self):
        with pytest.raises(ValueError):
            json_bigint(pa.array(['{"k": true}']), 'k')
        with pytest.raises(ValueError):
            json_bigint(pa.array(['{"k": [1,2]}']), 'k')


def _rand_val(rng, depth=0):
    r = rng.random()
    if r < 0.25:
        return rng.randint(-10 ** rng.randint(0, 20),
                           10 ** rng.randint(0, 20))
    if r < 0.40:
        return rng.choice([rng.uniform(-1e6, 1e6),
                           rng.uniform(-1e-8, 1e-8),
                           rng.uniform(-1e20, 1e20),
                           1.5, 2.5, -0.0, 5e-324])
    if r < 0.55:
        return rng.choice(['12', '1.5', '2e3', ' 42 ', '0x1a', '1_0',
                           'abc', '', '{"k": 9}', 'say "hi"', 'a\\b',
                           'null', 'trué', 'k": 7,'])
    if r < 0.62:
        return rng.choice([True, False, None])
    if r < 0.75 and depth < 3:
        return {rng.choice(['k', 'a', 'kk', 'k2', 'b']):
                _rand_val(rng, depth + 1)
                for _ in range(rng.randint(0, 3))}
    if r < 0.85 and depth < 3:
        return [_rand_val(rng, depth + 1)
                for _ in range(rng.randint(0, 3))]
    return rng.randint(0, 100)


def _rand_doc(rng):
    n = rng.randint(0, 4)
    items = []
    keys = ['k', 'a', 'kk', 'k2', 'b', 'k']
    rng.shuffle(keys)
    for i in range(n):
        items.append('"%s": %s' % (
            keys[i % len(keys)],
            json.dumps(_rand_val(rng), ensure_ascii=False)))
    if rng.random() < 0.3:
        items.insert(rng.randint(0, len(items)),
                     '"k": ' + json.dumps(_rand_val(rng),
                                          ensure_ascii=False))
    return '{' + ', '.join(items) + '}'


class TestEnvelopeReroute:
    """The r4→r5 driver failure family: quoted numeric strings with an
    explicit exponent and 19+ fractional digits hit a DuckDB-internal
    decimal-accumulator overflow whose wrapped results (off-by-one,
    sign flips) are build-dependent UB — so BOTH engines reroute the
    family through a well-defined double path (bigint_from_string on
    the engine, duckdb_bigint_sql in every oracle) instead of anyone
    mirroring the wrap."""

    SQL_ENV = [  # strings where plain CAST(s AS BIGINT) is the UB path
        '97094.9009592086744391727e0',      # DuckDB 1.0.0 gives 97093
        '-312.881228217819236534606E+0',    # and -311 here
        '.88694853074878134095e+0',         # sign flip: -1 vs +1
        '-.905024065117471170648579E0',
        ' \t2904.90471281442944401929275243e+0 ',
        '1.2345678901234567_89e0',          # underscore grammar
        '+613.5638438692743669888_9e-2',
        '0.0000000000000000001e19',
        '1.9999999999999999999e2',
        '9999999999999999999.0000000000000000000e0',
        '1.0000000000000000000e999',        # double overflow -> ERR
        '1.0000000000000000000e-320',       # subnormal -> 0
        '-9223372036854775807.4999999999999999999e0',
    ]

    def _sql_cast(self, con, s):
        try:
            return ('OK', con.sql(
                'SELECT ' + duckdb_bigint_sql('$s'),
                params={'s': s}).fetchone()[0])
        except Exception:
            return ('ERR', None)

    def _mine(self, s):
        try:
            return ('OK', bigint_from_string(s))
        except ValueError:
            return ('ERR', None)

    def test_curated_envelope(self):
        con = duckdb.connect()
        for s in self.SQL_ENV:
            theirs = self._sql_cast(con, s)
            assert self._mine(s) == theirs, repr(s)
        # and the flagship case lands on the well-defined value
        assert bigint_from_string('97094.9009592086744391727e0') == 97095

    def test_non_envelope_unchanged(self):
        # outside the envelope bigint_from_string IS duckdb_bigint_parse
        for s in CURATED_CASTS:
            try:
                a = ('OK', duckdb_bigint_parse(s))
            except ValueError:
                a = ('ERR', None)
            try:
                b = ('OK', bigint_from_string(s))
            except ValueError:
                b = ('ERR', None)
            assert a == b, repr(s)

    def test_unicode_digits_rejected_like_duckdb(self):
        # python \d matches unicode digits; DuckDB's cast is ASCII-only
        con = duckdb.connect()
        for s in ['١٢٣', '１２３', '1٢3', '12e٣', '-٥', '١.٢e١' + '9' * 19]:
            try:
                con.sql('SELECT CAST(? AS BIGINT)', params=[s]).fetchone()
                raise AssertionError(f'duckdb accepted {s!r}')
            except AssertionError:
                raise
            except Exception:
                pass
            with pytest.raises(ValueError):
                bigint_from_string(s)

    def test_envelope_fuzz(self):
        rng = random.Random(20260820)
        d = '0123456789'
        con = duckdb.connect()
        for _ in range(2500):
            ip = ''.join(rng.choices(d, k=rng.randint(0, 6)))
            fp = list(rng.choices(d, k=rng.randint(14, 26)))
            if rng.random() < 0.3:
                fp = [fp[0]] + [c for x in fp[1:] for c in
                                (('_', x) if rng.random() < 0.15
                                 else (x,))]
            s = ip + '.' + ''.join(fp)
            if rng.random() < 0.85:
                s += rng.choice('eE') + rng.choice(['', '+', '-']) + str(
                    rng.choice([0, 0, 1, 2, 3, 4, 18, 19, 300, 308,
                                309, 320, 999, 32767, 32768]))
            if rng.random() < 0.3:
                s = '-' + s
            elif rng.random() < 0.1:
                s = '+' + s
            if rng.random() < 0.15:
                s = ' \t' + s + '\x0b '
            assert self._mine(s) == self._sql_cast(con, s), repr(s)

    def test_json_bigint_matches_rerouted_oracle(self):
        # end-to-end: json_bigint vs the oracle expression every
        # json query embeds (duckdb_bigint_sql over json_extract_string)
        con = duckdb.connect()
        docs = CURATED_DOCS + [
            json.dumps({'k': s}) for s in self.SQL_ENV] + [
            '{"k": "97094.9009592086744391727e0", "k": 1}',
            '{"a": {"k": "bad"}, "k": " .' + '9' * 21 + 'E0 "}',
        ]
        expr = duckdb_bigint_sql("json_extract_string($d, '$.k')")
        for doc in docs:
            try:
                theirs = ('OK', con.sql('SELECT ' + expr,
                                        params={'d': doc}).fetchone()[0])
            except Exception:
                theirs = ('ERR', None)
            assert _our_cast_doc(doc) == theirs, doc


class TestFuzz:
    def test_doc_fuzz(self):
        rng = random.Random(20260819)
        docs = [_rand_doc(rng) for _ in range(1500)]
        con = duckdb.connect()
        ours = json_scalar(pa.array(docs), 'k').to_pylist()
        for doc, mine in zip(docs, ours):
            assert mine == _duck_extract(con, doc), doc
        for doc in docs:
            assert _our_cast_doc(doc) == _duck_cast_doc(con, doc), doc

    def test_cast_fuzz(self):
        rng = random.Random(4)
        d = '0123456789'
        con = duckdb.connect()
        for _ in range(3000):
            sign = rng.choice(['', '+', '-'])
            ip = ''.join(rng.choices(d, k=rng.randint(0, 22)))
            parts = [sign, ip]
            has_exp = rng.random() < 0.5
            if rng.random() < 0.6:
                # explicit exponent + 19+ fraction digits hits a
                # DuckDB-internal accumulator overflow (documented
                # divergence envelope in duckdb_bigint_parse)
                fk = rng.randint(0, 18 if has_exp else 24)
                parts += ['.', ''.join(rng.choices(d, k=fk))]
            if has_exp:
                parts += [rng.choice('eE'), rng.choice(['', '+', '-']),
                          str(rng.randint(0, 40000)
                              if rng.random() < 0.2
                              else rng.randint(0, 30))]
            if rng.random() < 0.15:
                parts = [' ' * rng.randint(0, 2)] + parts \
                    + ['\t' * rng.randint(0, 1)]
            s = ''.join(parts)
            try:
                theirs = ('OK', con.sql("SELECT CAST(? AS BIGINT)",
                                        params=[s]).fetchone()[0])
            except Exception:
                theirs = ('ERR', None)
            try:
                mine = ('OK', duckdb_bigint_parse(s))
            except ValueError:
                mine = ('ERR', None)
            assert mine == theirs, repr(s)
