"""Reference-suite fixture matrices re-expressed as batch assertions:
internet validators (tests/test_internet.py), context threading
(tests/test_context.py), contrib dateutil parsing (tests/test_contrib.py),
class-level operator sugar."""

import datetime

import pyarrow as pa
import pytest

import trafaret_ray.contracts as t
from trafaret_ray.contracts import contrib_rfc3339
from trafaret_ray.contracts.result import DataError


def batch_ok(contract, values):
    res = contract.apply(pa.array(values, type=pa.string()))
    return list(res.ok)


VALID_V4 = ['127.0.0.1', '8.8.8.8', '192.168.1.1']
INVALID_V4 = ['32.64.128.256',
              '2001:0db8:0000:0042:0000:8a2e:0370:7334', '192.168.1.1 ']
VALID_V6 = ['2001:0db8:0000:0042:0000:8a2e:0370:7334',
            '2001:0Db8:0000:0042:0000:8A2e:0370:7334',
            '2001:cdba:0:0:0:0:3257:9652', '2001:cdba::3257:9652',
            'fe80::', '::', '::1', '2001:db8::', 'ffaa::',
            '::ffff:255.255.255.0', '2001:db8:3:4::192.168.1.1',
            'fe80::1:2%en0']
INVALID_V6 = ['2001:0db8:z000:0042:0000:8a2e:0370:7334',
              '2001:cdba:0:0:::0:0:3257:9652', '2001:cdba::3257:::9652',
              '127.0.0.1', ':ffaa:']


class TestInternetMatrix:
    def test_ipv4(self):
        assert batch_ok(t.IPv4, VALID_V4) == [True] * 3
        assert batch_ok(t.IPv4, INVALID_V4) == [False] * 3
        for ip in VALID_V4:
            assert t.IPv4.check(ip) == ip

    def test_ipv6(self):
        assert batch_ok(t.IPv6, VALID_V6) == [True] * len(VALID_V6)
        assert batch_ok(t.IPv6, INVALID_V6) == [False] * len(INVALID_V6)

    def test_ip_union(self):
        c = t.IP
        assert batch_ok(c, VALID_V4 + VALID_V6) == \
            [True] * (len(VALID_V4) + len(VALID_V6))
        assert batch_ok(c, [':ffaa:', '999.1.1.1']) == [False, False]

    def test_url_idna(self):
        # reference tests/test_internet.py TestURLTrafaret
        res = t.URL.check('http://example.net/resource/?param=value#anchor')
        assert res == 'http://example.net/resource/?param=value#anchor'
        res = t.URL.check('http://пример.рф/resource/?param=value#anchor')
        assert res == \
            'http://xn--e1afmkfd.xn--p1ai/resource/?param=value#anchor'

    def test_email_batch(self):
        ok = batch_ok(t.Email, ['a@b.com', 'someone@пример.испытание',
                                  'bad', '@nope.com'])
        assert ok == [True, True, False, False]

    def test_hex_urlsafe(self):
        assert t.Hex().check('DEADbeef') == 'deadbeef'
        assert t.URLSafe().check('a-b_c9') == 'a-b_c9'
        assert not t.URLSafe().is_valid('a b')


def check_context(value, context=None):
    if value != context:
        return DataError('have not context there')
    return value


CONTEXT_CONTRACT = (t.String() | t.Int()) & t.Any & check_context


class TestContext:
    """reference tests/test_context.py:1-38 — context threads through
    every composite on the scalar path."""

    def test_plain(self):
        assert CONTEXT_CONTRACT(123, context=123) == 123
        with pytest.raises(DataError):
            CONTEXT_CONTRACT(123, context=456)

    def test_dict_context(self):
        c = t.Dict(b=CONTEXT_CONTRACT)
        assert c.check({'b': 123}, context=123) == {'b': 123}

    def test_list_context(self):
        c = t.List(CONTEXT_CONTRACT)
        assert c.check([123], context=123) == [123]

    def test_tuple_context(self):
        c = t.Tuple(CONTEXT_CONTRACT)
        assert c.check([123], context=123) == (123,)

    def test_mapping_context(self):
        c = t.Mapping(t.Int(), CONTEXT_CONTRACT)
        assert c.check({123: 123}, context=123) == {123: 123}


class TestClassLevelOps:
    def test_class_or(self):
        c = t.Int | t.String
        assert c.check(5) == 5
        assert c.check('x') == 'x'

    def test_class_and(self):
        c = t.ToInt & t.Int(gte=0)
        assert c.check('3') == 3

    def test_class_check(self):
        # reference allows t.URL.check(...) on classes via metaclass; here
        # factory functions cover URL/Email, classes cover scalars
        assert (t.Int > 5).check(6) == 6


class TestContribDates:
    """reference tests/test_contrib.py dateutil matrix (subset — the
    container's dateutil handles these shapes)."""

    CASES = [
        ('2019-07-25', datetime.datetime(2019, 7, 25)),
        ('2019-07-25T22:32:05', datetime.datetime(2019, 7, 25, 22, 32, 5)),
        ('2019-07-25 22:32:05.123456',
         datetime.datetime(2019, 7, 25, 22, 32, 5, 123456)),
        ('Thu, 25 Jul 2019 22:32:05',
         datetime.datetime(2019, 7, 25, 22, 32, 5)),
        ('20190725T223205', datetime.datetime(2019, 7, 25, 22, 32, 5)),
        ('July 25, 2019', datetime.datetime(2019, 7, 25)),
    ]

    def test_scalar(self):
        c = contrib_rfc3339.DateTime()
        for s, expected in self.CASES:
            assert c.check(s) == expected, s

    def test_batch(self):
        c = contrib_rfc3339.DateTime()
        arr = pa.array([s for s, _ in self.CASES] + ['not a date'])
        res = c.apply(arr)
        assert list(res.ok) == [True] * len(self.CASES) + [False]
        got = res.values.to_pylist()
        for (s, expected), v in zip(self.CASES, got):
            assert v == expected, s

    def test_date(self):
        c = contrib_rfc3339.Date()
        assert c.check('July 25, 2019') == datetime.date(2019, 7, 25)
        res = c.apply(pa.array(['2019-07-25', 'nope']))
        assert list(res.ok) == [True, False]
        assert res.values.to_pylist()[0] == datetime.date(2019, 7, 25)


class TestStreaming:
    def test_streaming_sessionizer_matches_batch(self, ray_session):
        """Incremental actor state across batches == one-shot sessionize."""
        import numpy as np
        from trafaret_ray.stages.streaming import StreamingSessionizer
        from trafaret_ray.stages import window as W
        rng = np.random.default_rng(6)
        n = 2000
        users = np.sort(rng.integers(0, 20, n))
        gaps = rng.integers(1, 120, n) * 1_000_000
        gaps[rng.random(n) < 0.03] = 31 * 60 * 1_000_000
        ts = np.int64(1_700_000_000_000_000) + np.cumsum(gaps)
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        tbl = pa.table({'user_id': users,
                        'ts': pa.array(ts, type=pa.timestamp('us'))})
        # one-shot oracle
        starts = W.group_starts(users)
        _, sid = W.sessionize(ts, starts, 30 * 60 * 1_000_000)
        # incremental: feed 7 sequential slices through ONE actor instance
        actor = StreamingSessionizer()
        got = []
        for lo in range(0, n, 300):
            got.append(actor(tbl.slice(lo, 300)))
        got_ids = pa.concat_tables(got).column('session_id').to_numpy()
        assert (got_ids == sid).all()

    def test_tumbling_window(self, ray_session):
        import ray.data as rd
        from trafaret_ray.stages.streaming import tumbling_window
        tbl = pa.table({
            'k': [1, 1, 1, 2],
            'ts': pa.array([0, 10_000_000, 3_700_000_000, 100],
                           type=pa.timestamp('us')),
            'v': [1.0, 2.0, 3.0, 4.0]})
        out = tumbling_window(rd.from_arrow(tbl), 'k', 'ts', 3_600_000_000,
                              {'n': ('v', 'count')}).to_pandas()
        out = out.sort_values(['k', 'window_start']).reset_index(drop=True)
        assert out['n'].tolist() == [2, 1, 1]


class TestSubclass:
    def test_subclass(self):
        assert t.Subclass[int].check(bool) is bool
        assert not t.Subclass(int).is_valid(str)
        assert not t.Subclass(int).is_valid(5)


class TestNumericTables:
    """reference tests/test_numeric.py truth tables."""

    def test_to_decimal_table(self):
        from decimal import Decimal
        for value, expected in [
                (0, Decimal('0.0000')), (1000, Decimal('1000.0000')),
                (1000.0, Decimal('1000.0000')), ('1000', Decimal('1000')),
                ('1000.0', Decimal('1000.0000')), (-1000, Decimal('-1000')),
                (-1000.0, Decimal('-1000')), ('-1000', Decimal('-1000')),
                ('-1000.0', Decimal('-1000.0000'))]:
            assert t.ToDecimal().check(value) == expected, value
        e = t.catch(t.ToDecimal().check, '')
        assert e.code == 'invalid_decimal'
        assert t.extract_error(t.ToDecimal(), '') == \
            "value can't be converted to Decimal"

    def test_to_int_error_codes(self):
        for value, code in [(None, 'wrong_type'), ('', 'is_not_a_number'),
                            ('1.0', 'is_not_a_number')]:
            e = t.catch(t.ToInt().check, value)
            assert e.code == code, value
        assert t.extract_error(t.ToInt(), '') == \
            "value can't be converted to int"

    def test_reprs(self):
        assert repr(t.ToInt()) == '<ToInt>'
        assert repr(t.ToInt[1:]) == '<ToInt(gte=1)>'
        assert repr(t.ToInt[1:10]) == '<ToInt(gte=1, lte=10)>'
        assert repr(t.ToInt[:10]) == '<ToInt(lte=10)>'
        assert repr(t.ToInt >= 3) == '<ToInt(gte=3)>'
        assert repr(t.ToFloat[1:]) == '<ToFloat(gte=1)>'
        assert repr(1 < (t.ToFloat < 10)) == '<ToFloat(gt=1, lt=10)>'

    def test_meta_bounds(self):
        assert (t.ToInt > 5).check(10) == 10
        assert t.extract_error(t.ToInt > 5, 1) == \
            'value should be greater than 5'
        assert (t.ToInt < 3).check(1) == 1
        assert t.extract_error(t.ToInt < 3, 3) == \
            'value should be less than 3'
        assert t.extract_error(t.ToInt >= 5, 1) == 'value is less than 5'
        assert t.extract_error(t.ToInt <= 3, 4) == 'value is greater than 3'


class TestCallableKey:
    """reference test_base.py:221-231 — any generator callable is a key."""

    def test_scalar(self):
        def simple_key(value):
            yield 'simple', 'simple data', []
        c = t.Dict(simple_key)
        assert c.check({}) == {'simple': 'simple data'}
        c2 = t.Dict({t.Key('key'): t.String}, simple_key)
        assert c2.check({'key': 'blabla'}) == \
            {'key': 'blabla', 'simple': 'simple data'}

    def test_batch(self):
        def simple_key(value):
            yield 'simple', 'simple data', []
        from trafaret_ray.contracts import BatchValidator
        c = t.Dict({t.Key('key'): t.String}, simple_key)
        ok, q = BatchValidator(c).split(pa.table({'key': ['a', 'b']}))
        assert q.num_rows == 0
        assert ok.column('simple').to_pylist() == ['simple data'] * 2


class TestSample1:
    """reference samples/sample1.py end-to-end."""

    def test_sample(self):
        date = t.Dict(year=t.Int, month=t.Int, day=t.Int) \
            >> (lambda d: datetime.datetime(**d))
        task = t.Dict({'key': t.String(),
                       t.Key('timestamp', optional=True): date})
        out = task.check({'key': 'foo',
                          'timestamp': {'year': 2012, 'month': 1, 'day': 12}})
        assert out == {'key': 'foo',
                       'timestamp': datetime.datetime(2012, 1, 12)}
        assert task.check({'key': 'foo'}) == {'key': 'foo'}


class TestBasicsParity:
    """reference test_base.py TestBasics — callables chain into contracts."""

    def test_callable_chain(self):
        import functools
        to_int_10000 = functools.partial(int, '10000')
        c = t.Regexp('2|10|16') & t.ToInt & t.Call(to_int_10000)
        assert c('10') == 10000

    def test_auto_call(self):
        import functools
        to_int_10000 = functools.partial(int, '10000')
        c = t.Regexp('2|10|16') & t.ToInt & to_int_10000
        assert c('10') == 10000

    def test_context_callable_class(self):
        class Tttt:
            def __call__(self, value, context=None):
                return context(value)
        c = t.ToInt() & Tttt()
        assert c(123, context=lambda v: v + 123) == 246

    def test_str_method(self):
        c = t.Regexp(r'\w+-\w+') & str.upper
        assert c('abc-Abc') == 'ABC-ABC'


class TestDictPolicies:
    """reference test_base.py Dict extra/ignore/merge matrix."""

    def test_kwargs_extra(self):
        c = t.Dict(t.Key('foo', trafaret=t.ToInt()), allow_extra=['eggs'])
        assert c.check({'foo': 1, 'eggs': None}) == {'foo': 1, 'eggs': None}
        assert c.check({'foo': 1}) == {'foo': 1}
        with pytest.raises(DataError):
            c.check({'foo': 2, 'marmalade': 5})

    def test_kwargs_ignore(self):
        c = t.Dict(t.Key('foo', trafaret=t.ToInt()), ignore_extra=['eggs'])
        assert c.check({'foo': 1, 'eggs': None}) == {'foo': 1}
        with pytest.raises(DataError):
            c.check({'foo': 2, 'marmalade': 5})

    def test_merge_policies_union(self):
        first = t.Dict(t.Key('bar', trafaret=t.Int()), ignore_extra=['eggs'])
        second = t.Dict(t.Key('bar1', trafaret=t.Int()))
        third = first + second
        assert third.check({'bar': 4, 'bar1': 41, 'eggs': 'x'}) == \
            {'bar': 4, 'bar1': 41}
        first2 = t.Dict(t.Key('bip', trafaret=t.String()), ignore_extra=['*'])
        third2 = first2 + t.Dict(t.Key('bop', trafaret=t.Int()))
        assert third2.check({'bip': 'bam', 'bop': 17, 'matter': False}) == \
            {'bip': 'bam', 'bop': 17}
        assert third2.ignore_any
        fa = t.Dict(t.Key('bar', trafaret=t.Int()), allow_extra=['eggs'])
        fb = fa + t.Dict(t.Key('bar1', trafaret=t.Int()))
        assert fb.check({'bar': 1, 'bar1': 41, 'eggs': None}) == \
            {'bar': 1, 'bar1': 41, 'eggs': None}
        with pytest.raises(DataError):
            fb.check({'bar': 2, 'bar1': 1, 'marmalade': 5})

    def test_list_meta_guard(self):
        with pytest.raises(RuntimeError):
            t.List[1:10]

    def test_or_list_mapping_regression(self):
        # reference test_base.py:483-488 (2.0 regression)
        c = t.Dict({t.Key('params', optional=True):
                    t.Or(t.List(t.Any()),
                         t.Mapping(t.AnyString(), t.Any()))})
        assert c.check({'params': {'aaa': 123}}) == {'params': {'aaa': 123}}
        assert c.check({'params': [1, 2]}) == {'params': [1, 2]}


class TestStreamingLagger:
    def test_matches_pandas_shift_across_batches(self, ray_session):
        """Multi-batch feed to ONE lagger: output equals a global
        per-entity pandas shift (state carries across batch boundaries)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        from trafaret_ray.stages.streaming import StreamingLagger
        rng = np.random.default_rng(12)
        n = 600
        df = pd.DataFrame({
            'user_id': rng.integers(0, 9, n),
            'ts': pd.to_datetime(
                np.sort(rng.integers(0, 10**9, n)), unit='s'),
            'value': np.round(rng.standard_normal(n), 3),
        })
        lagger = StreamingLagger()
        outs = []
        for i in range(0, n, 200):   # ts-ordered batches, one actor
            outs.append(lagger(pa.Table.from_pandas(
                df.iloc[i:i + 200], preserve_index=False)).to_pandas())
        got = pd.concat(outs).sort_values(
            ['user_id', 'ts']).reset_index(drop=True)
        exp = df.sort_values(['user_id', 'ts']).reset_index(drop=True)
        g = exp.groupby('user_id')
        exp['prev_value'] = g['value'].shift(1)
        exp['gap_s'] = (exp['ts'] - g['ts'].shift(1)).dt.total_seconds()
        assert np.allclose(got['prev_value'].to_numpy(dtype=float),
                           exp['prev_value'].to_numpy(dtype=float),
                           equal_nan=True)
        assert np.allclose(got['gap_s'].to_numpy(dtype=float),
                           exp['gap_s'].to_numpy(dtype=float),
                           equal_nan=True)


class TestStreamingSessionizerDifferential:
    def test_randomized_vs_pandas(self, ray_session):
        """Randomized differential: multi-batch actor feed vs a global
        pandas sessionization (cumsum of gap breaks per entity)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        from trafaret_ray.stages.streaming import StreamingSessionizer
        gap = 1000
        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            n = 500
            df = pd.DataFrame({
                'user_id': rng.integers(0, 7, n),
                'ts': pd.to_datetime(np.sort(
                    rng.integers(0, 500_000, n)), unit='us'),
            })
            s = StreamingSessionizer(gap_us=gap)
            outs = [s(pa.Table.from_pandas(df.iloc[i:i + 100],
                                           preserve_index=False))
                    .to_pandas() for i in range(0, n, 100)]
            got = pd.concat(outs).sort_values(
                ['user_id', 'ts']).reset_index(drop=True)
            exp = df.sort_values(['user_id', 'ts']).reset_index(drop=True)
            g = exp.groupby('user_id')
            gaps = (exp['ts'] - g['ts'].shift(1)).dt.total_seconds() * 1e6
            brk = (gaps > gap).fillna(False)
            exp['session_id'] = brk.groupby(exp['user_id']).cumsum()\
                .astype(np.int64)
            assert got['session_id'].tolist() \
                == exp['session_id'].tolist(), seed
