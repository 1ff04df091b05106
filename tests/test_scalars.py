"""Reference scalar truth tables re-expressed as batch assertions
(SURVEY.md §5: each reference case (input, expected_output | expected_code)
becomes a row of an Arrow table; the contract runs once per column)."""

import numpy as np
import pyarrow as pa
import pytest

import trafaret_ray.contracts as t
from trafaret_ray.contracts import codes
from trafaret_ray.contracts.result import DataError, extract_error


def batch_check(contract, values, type=None):
    """Apply contract to a column of values; return (ok list, out list, codes)."""
    arr = pa.array(values, type=type)
    res = contract.apply(arr)
    out = res.values.to_pylist()
    cds = [None if res.ok[i] else res.codes[i] for i in range(len(values))]
    return list(res.ok), out, cds


class TestString:
    def test_batch(self):
        ok, out, cds = batch_check(t.String(), ['foo', '', None, 'bar'])
        assert ok == [True, False, False, True]
        assert out == ['foo', None, None, 'bar']
        assert cds[1] == codes.EMPTY_STRING
        assert cds[2] == codes.IS_NOT_A_STRING

    def test_wrong_type_column(self):
        ok, out, cds = batch_check(t.String(), [1, 2])
        assert ok == [False, False]
        assert cds == [codes.IS_NOT_A_STRING] * 2

    def test_lengths(self):
        c = t.String(min_length=2, max_length=3)
        ok, _, cds = batch_check(c, ['1', '12', '123', '1234'])
        assert ok == [False, True, True, False]
        assert cds[0] == codes.SHORT_STRING
        assert cds[3] == codes.LONG_STRING

    def test_scalar_parity(self):
        # reference doctests base.py:460-492
        assert t.String().check('foo') == 'foo'
        assert extract_error(t.String(), '') == 'blank value is not allowed'
        assert extract_error(t.String(), 1) == 'value is not a string'
        assert t.String(allow_blank=True).check('') == ''
        assert extract_error(t.String(min_length=2, max_length=6), '1') == \
            'String is shorter than 2 characters'
        assert extract_error(t.String(min_length=2, max_length=6),
                             '1234567') == 'String is longer than 6 characters'
        with pytest.raises(AssertionError):
            t.String(min_length=2, max_length=6, allow_blank=True)
        assert t.String(min_length=0, max_length=6,
                        allow_blank=True).check('123') == '123'


class TestNumbers:
    def test_toint_truth_table(self):
        # reference tests/test_numeric.py: '1.0'-style strings must FAIL
        ok, out, cds = batch_check(t.ToInt(), ['42', '-7', '1.5', 'abc',
                                               None, ' 9 '])
        assert ok == [True, True, False, False, False, True]
        assert out == [42, -7, None, None, None, 9]
        assert cds[2] == codes.IS_NOT_A_NUMBER
        assert cds[3] == codes.IS_NOT_A_NUMBER
        assert cds[4] == codes.WRONG_TYPE

    def test_int_float_column(self):
        ok, out, cds = batch_check(t.Int(), [1.0, 1.5, float('nan'), -3.0])
        assert ok == [True, False, False, True]
        assert cds[1] == codes.IS_NOT_INT

    def test_int_scalar_parity(self):
        assert t.Int().check(5) == 5
        assert extract_error(t.Int(), 1.1) == 'value is not int'
        assert t.ToInt().check('42') == 42
        e = t.catch(t.ToInt().check, '1.5')
        assert e.code == codes.IS_NOT_A_NUMBER

    def test_bounds(self):
        ok, _, cds = batch_check(t.Int(gte=0, lte=10), [-1, 0, 10, 11])
        assert ok == [False, True, True, False]
        assert cds[0] == codes.TOO_SMALL
        assert cds[3] == codes.TOO_BIG
        assert extract_error(t.Int(gte=0), -1) == 'value is less than 0'
        assert extract_error(t.Int > 5, 5) == 'value should be greater than 5'
        assert (t.Int > 5).check(10) == 10
        assert t.Int[1:10].check(5) == 5
        assert extract_error(t.Int(lt=10), 10) == 'value should be less than 10'

    def test_float(self):
        ok, out, cds = batch_check(t.ToFloat(), ['1.5', 'abc', '2e3'])
        assert ok == [True, False, True]
        assert out[0] == 1.5 and out[2] == 2000.0
        assert cds[1] == codes.IS_NOT_A_NUMBER
        assert t.Float().check(1.0) == 1.0
        assert extract_error(t.ToFloat(), 'abc') == \
            "value can't be converted to float"

    def test_float_accepts_int(self):
        ok, out, _ = batch_check(t.ToFloat(), [1, 2])
        assert ok == [True, True]
        assert out == [1.0, 2.0]

    def test_decimal(self):
        import decimal
        assert t.ToDecimal().check('1.5') == decimal.Decimal('1.5')
        e = t.catch(t.ToDecimal().check, 'aloha')
        assert e.code == codes.INVALID_DECIMAL


class TestBools:
    def test_bool(self):
        ok, _, cds = batch_check(t.Bool(), [True, False, None])
        assert ok == [True, True, False]
        assert cds[2] == codes.IS_NOT_BOOL
        assert extract_error(t.Bool(), 1) == 'value should be True or False'

    def test_tobool_truth_table(self):
        # reference doctable base.py:389-415
        for v, expected in [('y', True), ('n', False), ('1', True),
                            ('0', False), ('YeS', True), ('No', False),
                            (1, True), (0, False), (True, True),
                            (False, False), (None, False), ('on', True),
                            ('off', False), ('1.0', True), ('0.0', False)]:
            assert t.ToBool().check(v) is expected, v
        assert extract_error(t.ToBool(), 'aloha') == \
            "value can't be converted to Bool"

    def test_tobool_batch(self):
        ok, out, cds = batch_check(t.ToBool(), ['t', 'false', 'aloha', None])
        assert ok == [True, True, False, True]
        assert out == [True, False, None, False]
        assert cds[2] == codes.IS_NOT_CONVERTIBLE_TO_BOOL


class TestAtomEnumNull:
    def test_null(self):
        assert t.Null().check(None) is None
        assert extract_error(t.Null(), 1) == 'value should be None'

    def test_atom(self):
        assert t.Atom('x').check('x') == 'x'
        e = t.catch(t.Atom('x').check, 'y')
        assert e.code == codes.IS_NOT_EXACTLY

    def test_enum(self):
        c = t.Enum('foo', 'bar', 1)
        assert c.check('foo') == 'foo'
        assert c.check(1) == 1
        assert extract_error(c, 2) == "value doesn't match any variant"
        ok, _, cds = batch_check(c, ['foo', 'baz', 'bar'])
        assert ok == [True, False, True]
        assert cds[1] == codes.DOES_NOT_MATCH_ANY


class TestDates:
    def test_date(self):
        assert t.Date().check('2019-07-25') == '2019-07-25'
        import datetime
        assert t.ToDate().check('2019-07-25') == datetime.date(2019, 7, 25)
        e = t.catch(t.Date().check, '25-07-2019')
        assert e.code == codes.DOES_NOT_MATCH_FORMAT
        assert t.ToDate(format='%d-%m-%Y').check('25-07-2019') == \
            datetime.date(2019, 7, 25)

    def test_datetime(self):
        import datetime
        assert t.ToDateTime().check('2019-07-25 22:32:05') == \
            datetime.datetime(2019, 7, 25, 22, 32, 5)
        # a bare date is rejected by DateTime (reference base.py:624-625)
        e = t.catch(t.DateTime().check, datetime.date(2019, 7, 25))
        assert e.code == codes.IS_NOT_CONVERTIBLE_TO_DATETIME
        assert t.DateTime().check(datetime.datetime(2019, 7, 25)) == \
            datetime.datetime(2019, 7, 25)

    def test_date_batch_timestamp_column(self):
        import datetime
        arr = [datetime.datetime(2020, 1, 1), datetime.datetime(2021, 2, 3)]
        ok, _, _ = batch_check(t.Date(), arr)
        assert ok == [True, True]


class TestBytes:
    def test_tobytes_frombytes(self):
        assert t.ToBytes().check('abc') == b'abc'
        assert t.FromBytes().check(b'abc') == 'abc'
        e = t.catch(t.FromBytes().check, b'\xff\xfe')
        assert e.code == codes.CANNOT_BE_DECODED
        assert extract_error(t.FromBytes(), 'abc') == 'value is not a bytes'

    def test_bytes(self):
        assert t.Bytes().check(b'x') == b'x'
        assert t.AnyString().check('x') == 'x'
        assert t.AnyString().check(b'x') == b'x'


class TestTypeCall:
    def test_type(self):
        assert t.Type[int].check(3) == 3
        assert extract_error(t.Type[int], '3') == 'value is not int'
        assert t.Type(str).check('s') == 's'

    def test_call(self):
        def double(v):
            if not isinstance(v, int):
                return DataError('not int')
            return v * 2
        c = t.Call(double)
        assert c.check(2) == 4
        assert extract_error(c, 'x') == 'not int'
        ok, out, _ = batch_check(c, [1, 2, 3])
        assert out == [2, 4, 6]

    def test_call_vectorized(self):
        import pyarrow.compute as pc
        c = t.Call(lambda a: pc.add(a, 1), vectorized=True)
        ok, out, _ = batch_check(c, [1, 2])
        assert out == [2, 3]

    def test_callable(self):
        assert t.Callable().check(len) is len
        assert extract_error(t.Callable(), 5) == 'value is not callable'
