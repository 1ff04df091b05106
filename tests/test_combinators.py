"""And / Or / OnError / Forward / construct / guard / fold — reference
semantics as batch + scalar assertions (reference tests/test_base.py,
tests/test_constructor.py, tests/test_utils.py)."""

import pyarrow as pa
import pytest

import trafaret_ray.contracts as t
from trafaret_ray.contracts import codes
from trafaret_ray.contracts.result import DataError, extract_error


class TestOr:
    def test_first_match_wins(self):
        # an input valid under alt-0 and alt-1 takes alt-0's coercion
        # (reference base.py:307-314)
        c = t.ToInt() | t.ToFloat()
        assert c.check('5') == 5
        assert isinstance(c.check('5'), int)
        arr = pa.array(['5', '5.5'])
        res = c.apply(arr)
        assert res.values.to_pylist() == [5.0, 5.5]  # unified to float64

    def test_indexed_errors(self):
        # Or failures keyed by alternative index (reference test_base.py:554)
        c = t.Null() | t.String()
        err = extract_error(c, 5)
        assert set(err.keys()) == {0, 1}
        e = t.catch(c.check, 5)
        assert e.code == codes.NOTHING_MATCH

    def test_nullable_column(self):
        c = t.Null() | t.String()
        res = c.apply(pa.array(['a', None, 'b']))
        assert list(res.ok) == [True, True, True]
        assert res.values.to_pylist() == ['a', None, 'b']
        assert c.accepts_null

    def test_batch_nothing_match(self):
        c = t.Null() | t.String()
        res = c.apply(pa.array([1, 2]))
        assert list(res.ok) == [False, False]
        assert res.codes[0] == codes.NOTHING_MATCH


class TestAnd:
    def test_chain(self):
        c = t.ToInt() & t.Int(gte=0)
        assert c.check('7') == 7
        assert extract_error(c, '-7') == 'value is less than 0'
        assert extract_error(c, 'x') == "value can't be converted to int"

    def test_rshift(self):
        c = t.ToInt() >> (lambda x: x * 2)
        assert c.check('4') == 8

    def test_batch_left_error_wins(self):
        c = t.ToInt() & t.Int(gte=0)
        res = c.apply(pa.array(['5', 'bad', '-2']))
        assert list(res.ok) == [True, False, False]
        assert res.codes[1] == codes.IS_NOT_A_NUMBER
        assert res.codes[2] == codes.TOO_SMALL


class TestOnError:
    def test_replace(self):
        c = t.OnError(t.ToInt(), 'need a number', code='custom')
        assert extract_error(c, 'x') == 'need a number'
        e = t.catch(c.check, 'x')
        assert e.code == 'custom'
        res = c.apply(pa.array(['1', 'x']))
        assert res.msgs[1] == 'need a number'
        assert res.codes[1] == 'custom'


class TestForward:
    def test_provide_once(self):
        f = t.Forward()
        f << t.ToInt()
        assert f.check('3') == 3
        with pytest.raises(RuntimeError):
            f.provide(t.String())

    def test_unset(self):
        f = t.Forward()
        e = t.catch(f.check, 1)
        assert e.code == codes.TRAFARET_IS_NOT_SET


class TestConstruct:
    def test_literals(self):
        # reference constructor.py:23-61 mapping
        c = t.construct({'a': int, 'b': [str], 'c?': float,
                         'd': (int, str), 'e': 'atom'})
        out = c.check({'a': '1', 'b': ['x'], 'd': [1, 's'], 'e': 'atom'})
        assert out == {'a': 1, 'b': ['x'], 'd': (1, 's'), 'e': 'atom'}
        assert extract_error(c, {'a': '1', 'b': ['x'], 'd': [1, 's'],
                                 'e': 'other'}) == \
            {'e': "value is not exactly 'atom'"}

    def test_optional_marker(self):
        c = t.construct({'a': int, 'b?': str})
        assert c.check({'a': 1}) == {'a': 1}


class TestGuard:
    def test_guard(self):
        @t.guard(x=t.ToInt(), y=t.String())
        def f(x, y='d'):
            return (x, y)
        assert f('3', y='z') == (3, 'z')
        assert f(1) == (1, 'd')
        with pytest.raises(t.GuardError):
            f('bad')


class TestFoldUnfold:
    def test_roundtrip(self):
        nested = {'a': {'b': 1, 'c': [2, 3]}}
        flat = t.unfold(nested)
        assert flat == {'a__b': 1, 'a__c__0': 2, 'a__c__1': 3}
        assert t.fold(flat) == nested


class TestIgnore:
    def test_ignore(self):
        assert (t.ToInt() >> t.ignore).check('5') is None


class TestDataError:
    def test_as_dict_and_struct(self):
        # reference tests/test_dataerror.py:5-36
        e = DataError(error='err', code='code1')
        assert e.as_dict() == 'err'
        assert e.to_struct() == {'code': 'code1', 'message': 'err'}
        nested = DataError(error={'a': DataError('bad', code='c2')},
                           code='top')
        assert nested.as_dict() == {'a': 'bad'}
        assert nested.to_struct() == {
            'code': 'top', 'nested': {'a': {'code': 'c2', 'message': 'bad'}}}

    def test_as_dict_value(self):
        e = DataError(error='bad', value=5)
        assert e.as_dict(value=True) == 'bad, got 5'
