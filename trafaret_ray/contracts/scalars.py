"""Scalar validators / coercers as vectorized Arrow-batch kernels.

Each class recasts one reference operator (cited per class) from per-value
Python checks into one pass of ``pyarrow.compute`` kernels over a column.
Semantics — accepted inputs, coercion results, error codes and messages —
match the reference exactly; only the execution model is new.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import codes
from .base import Contract
from .result import CheckResult, DataError, null_out

_t = pa.types


def _np_mask(arrow_bool, n=None):
    """BooleanArray -> numpy bool mask; nulls become False."""
    if isinstance(arrow_bool, pa.ChunkedArray):
        arrow_bool = arrow_bool.combine_chunks()
    m = arrow_bool.fill_null(False).to_numpy(zero_copy_only=False)
    return np.asarray(m, dtype=bool)


def valid_mask(arr: pa.Array) -> np.ndarray:
    return _np_mask(arr.is_valid())


def _is_string_type(t):
    return _t.is_string(t) or _t.is_large_string(t)


def _is_binary_type(t):
    return _t.is_binary(t) or _t.is_large_binary(t)


class Any(Contract):
    """Accept anything (reference base.py:269-280) — including python
    objects Arrow can't represent (the scalar path passes them through
    untouched)."""
    accepts_null = True

    def apply(self, arr):
        return CheckResult.success(arr)

    def _scalar_check(self, value, context=None):
        return value

    def __repr__(self):
        return '<Any>'


class Null(Contract):
    """Value must be None (reference base.py:342-360)."""
    accepts_null = True

    def apply(self, arr):
        ok = ~valid_mask(arr)
        return CheckResult.from_mask(arr, ok, codes.IS_NOT_NULL,
                                     'value should be None')

    def __repr__(self):
        return '<Null>'


class Bool(Contract):
    """Strict bool check (reference base.py:363-386)."""

    def apply(self, arr):
        if _t.is_boolean(arr.type):
            ok = valid_mask(arr)
        else:
            ok = np.zeros(len(arr), dtype=bool)
        return CheckResult.from_mask(arr, ok, codes.IS_NOT_BOOL,
                                     'value should be True or False')

    def __repr__(self):
        return '<Bool>'


class ToBool(Contract):
    """Truth-table coercion (reference base.py:389-432): str(value).strip()
    .lower() then membership in the reference's true/false sets. Note the
    reference maps None -> 'none' -> False, so nulls are accepted."""
    accepts_null = True

    TRUE_VALUES = ('t', 'true', 'y', 'yes', 'on', '1', '1.0')
    FALSE_VALUES = ('false', 'n', 'no', 'off', '0', 'none', '0.0')

    def apply(self, arr):
        n = len(arr)
        t = arr.type
        if _t.is_boolean(t):
            return CheckResult.success(arr)
        if _t.is_null(t):
            return CheckResult.success(pa.array([False] * n, type=pa.bool_()))
        if _is_string_type(t) or _t.is_integer(t) or _t.is_floating(t):
            s = arr if _is_string_type(t) else pc.cast(arr, pa.string())
            s = pc.utf8_lower(pc.utf8_trim_whitespace(s.fill_null('none')))
            is_true = _np_mask(pc.is_in(s, value_set=pa.array(self.TRUE_VALUES)))
            is_false = _np_mask(pc.is_in(s, value_set=pa.array(self.FALSE_VALUES)))
            ok = is_true | is_false
            values = pa.array(is_true, type=pa.bool_())
            return CheckResult.from_mask(values, ok,
                                         codes.IS_NOT_CONVERTIBLE_TO_BOOL,
                                         "value can't be converted to Bool")
        return CheckResult.fail_all(arr, codes.IS_NOT_CONVERTIBLE_TO_BOOL,
                                    "value can't be converted to Bool")

    def __repr__(self):
        return '<ToBool>'


class Atom(Contract):
    """Equality with one fixed value (reference base.py:435-457)."""

    def __init__(self, value):
        self.value = value

    def apply(self, arr):
        msg = "value is not exactly '%s'" % (self.value,)
        try:
            ok = _np_mask(pc.equal(arr, pa.scalar(self.value)))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            ok = np.zeros(len(arr), dtype=bool)
        return CheckResult.from_mask(arr, ok, codes.IS_NOT_EXACTLY, msg)

    def __repr__(self):
        return '<Atom(%r)>' % (self.value,)


class String(Contract):
    """String with blank/min/max constraints (reference base.py:460-527).
    Lengths are counted in characters (``len(str)``), matching
    ``pc.utf8_length``."""

    TYPE_ERROR_MESSAGE = 'value is not a string'
    TYPE_ERROR_CODE = codes.IS_NOT_A_STRING
    _expect_binary = False

    def __init__(self, allow_blank=False, min_length=None, max_length=None):
        assert not (allow_blank and min_length), \
            'Either allow_blank or min_length should be specified, not both'
        self.allow_blank = allow_blank
        self.min_length = min_length
        self.max_length = max_length

    def _type_ok(self, t):
        return _is_binary_type(t) if self._expect_binary else _is_string_type(t)

    def _len(self, arr):
        return pc.binary_length(arr) if self._expect_binary else pc.utf8_length(arr)

    def apply(self, arr):
        if not self._type_ok(arr.type):
            return CheckResult.fail_all(arr, self.TYPE_ERROR_CODE,
                                        self.TYPE_ERROR_MESSAGE)
        ok = valid_mask(arr)
        res = CheckResult.from_mask(arr, ok, self.TYPE_ERROR_CODE,
                                    self.TYPE_ERROR_MESSAGE)
        length = self._len(arr)
        if not self.allow_blank:
            nonblank = _np_mask(pc.not_equal(length, 0))
            res = res.merge_fail(nonblank, codes.EMPTY_STRING,
                                 'blank value is not allowed')
        if self.min_length is not None:
            m = _np_mask(pc.greater_equal(length, self.min_length))
            res = res.merge_fail(m, codes.SHORT_STRING,
                                 'String is shorter than %s characters'
                                 % self.min_length)
        if self.max_length is not None:
            m = _np_mask(pc.less_equal(length, self.max_length))
            if self.allow_blank:
                m |= _np_mask(pc.equal(length, 0))
            res = res.merge_fail(m, codes.LONG_STRING,
                                 'String is longer than %s characters'
                                 % self.max_length)
        return res

    def __repr__(self):
        return '<String>' if not self.allow_blank else '<String(blank)>'


class Bytes(String):
    """String semantics over the binary type (reference base.py:680-684)."""

    TYPE_ERROR_MESSAGE = 'value is not a bytes string'
    TYPE_ERROR_CODE = codes.IS_NOT_A_BYTES_STRING
    _expect_binary = True

    def __repr__(self):
        return '<Bytes>'


class AnyString(Contract):
    """str or bytes (reference base.py:715-716)."""

    def apply(self, arr):
        if _is_string_type(arr.type) or _is_binary_type(arr.type):
            ok = valid_mask(arr)
        else:
            ok = np.zeros(len(arr), dtype=bool)
        return CheckResult.from_mask(arr, ok, codes.IS_NOT_A_STRING,
                                     'value is not a string')

    def __repr__(self):
        return '<AnyString>'


class ToBytes(Contract):
    """str -> encode(encoding); bytes passthrough (reference base.py:687-712)."""

    def __init__(self, encoding='utf-8'):
        self.encoding = encoding

    def apply(self, arr):
        t = arr.type
        if _is_binary_type(t):
            ok = valid_mask(arr)
            return CheckResult.from_mask(arr, ok, codes.IS_NOT_A_STRING,
                                         'value is not str/bytes type')
        if _is_string_type(t):
            ok = valid_mask(arr)
            if self.encoding in ('utf-8', 'utf8'):
                values = pc.cast(arr, pa.binary())
                return CheckResult.from_mask(values, ok, codes.IS_NOT_A_STRING,
                                             'value is not str/bytes type')
            # exotic encodings: python fallback per row
            out, enc_ok = [], ok.copy()
            for i, v in enumerate(arr.to_pylist()):
                if v is None:
                    out.append(None)
                    continue
                try:
                    out.append(v.encode(self.encoding))
                except UnicodeError:
                    out.append(None)
                    enc_ok[i] = False
            values = pa.array(out, type=pa.binary())
            res = CheckResult.from_mask(values, ok, codes.IS_NOT_A_STRING,
                                        'value is not str/bytes type')
            return res.merge_fail(enc_ok | ~ok, codes.CANNOT_BE_ENCODED,
                                  'value cannot be encoded with %s encoding'
                                  % self.encoding)
        return CheckResult.fail_all(arr, codes.IS_NOT_A_STRING,
                                    'value is not str/bytes type')

    def __repr__(self):
        return '<ToBytes>'


class FromBytes(Contract):
    """bytes -> decode(encoding) (reference base.py:719-743)."""

    def __init__(self, encoding='utf-8'):
        self.encoding = encoding

    def apply(self, arr):
        if not _is_binary_type(arr.type):
            return CheckResult.fail_all(arr, codes.IS_NOT_BYTES,
                                        'value is not a bytes')
        ok = valid_mask(arr)
        out, dec_ok = [], ok.copy()
        for i, v in enumerate(arr.to_pylist()):
            if v is None:
                out.append(None)
                continue
            try:
                out.append(v.decode(self.encoding))
            except UnicodeError:
                out.append(None)
                dec_ok[i] = False
        values = pa.array(out, type=pa.string())
        res = CheckResult.from_mask(values, ok, codes.IS_NOT_BYTES,
                                    'value is not a bytes')
        return res.merge_fail(dec_ok | ~ok, codes.CANNOT_BE_DECODED,
                              'value cannot be decoded with %s encoding'
                              % self.encoding)

    def __repr__(self):
        return '<FromBytes>'


class _NumberMeta(type(Contract)):
    """Class-level bounds sugar: ``Int > 5`` -> ``Int(gt=5)``, ``Int[1:10]``
    -> ``Int(gte=1, lte=10)`` (reference numeric.py:11-51)."""

    def __lt__(cls, lt):
        return cls(lt=lt)

    def __le__(cls, lte):
        return cls(lte=lte)

    def __gt__(cls, gt):
        return cls(gt=gt)

    def __ge__(cls, gte):
        return cls(gte=gte)

    def __getitem__(cls, sl):
        return cls(gte=sl.start, lte=sl.stop)


_INT_RE = r'^[+-]?[0-9]+$'


class Float(Contract, metaclass=_NumberMeta):
    """float or convertible str/Real, with gte/lte/gt/lt bounds
    (reference numeric.py:55-152). Check-only: output equals input."""

    value_type_name = 'float'
    convert = False

    def __init__(self, gte=None, lte=None, gt=None, lt=None):
        self.gte = gte
        self.lte = lte
        self.gt = gt
        self.lt = lt

    # instance-level bounds sugar (reference numeric.py:127-141)
    def __lt__(self, lt):
        return type(self)(gte=self.gte, lte=self.lte, gt=self.gt, lt=lt)

    def __gt__(self, gt):
        return type(self)(gte=self.gte, lte=self.lte, gt=gt, lt=self.lt)

    def __le__(self, lte):
        return type(self)(gte=self.gte, lte=lte, gt=self.gt, lt=self.lt)

    def __ge__(self, gte):
        return type(self)(gte=gte, lte=self.lte, gt=self.gt, lt=self.lt)

    def _wrong_type_msg(self):
        return 'value is not %s' % self.value_type_name

    # values Arrow can't even represent (complex, arbitrary objects) get
    # the numeric wrong-type message, matching the reference
    # (numeric.py:96-102: 'value is not float' / 'value is not int')
    def _unrepresentable_message(self, value):
        return self._wrong_type_msg()

    def _not_number_msg(self):
        return "value can't be converted to %s" % self.value_type_name

    def _convert_numeric(self, arr):
        """Return (numeric pa.Array float64/int64, ok, code_map) where
        code_map lists (mask, code, msg) failures."""
        raise NotImplementedError

    def apply(self, arr):
        numeric, res = self._parse(arr)
        if numeric is not None:
            res = self._bounds(numeric, res)
        if self.convert:
            values = numeric if numeric is not None else res.values
            return CheckResult(null_out(values, res.ok), res.ok,
                               res.codes, res.msgs)
        return CheckResult(null_out(arr, res.ok), res.ok, res.codes, res.msgs)

    def _parse(self, arr):
        """Parse/validate to float64; subclasses override."""
        t = arr.type
        n = len(arr)
        if _t.is_floating(t) or _t.is_integer(t) or _t.is_boolean(t) \
                or _t.is_decimal(t):
            values = pc.cast(arr, pa.float64())
            ok = valid_mask(arr)
            return values, CheckResult.from_mask(values, ok, codes.WRONG_TYPE,
                                                 self._wrong_type_msg())
        if _is_string_type(t):
            ok = valid_mask(arr)
            try:
                values = pc.cast(pc.utf8_trim_whitespace(arr), pa.float64())
                return values, CheckResult.from_mask(
                    values, ok, codes.WRONG_TYPE, self._wrong_type_msg())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass
            import pandas as pd
            s = arr.to_pandas()
            parsed = pd.to_numeric(s.str.strip(), errors='coerce')
            # 'nan'/'inf' literals are valid python floats
            literal_ok = s.str.strip().str.lower().isin(
                ('nan', '+nan', '-nan', 'inf', '+inf', '-inf',
                 'infinity', '+infinity', '-infinity')).to_numpy()
            parse_ok = (~parsed.isna().to_numpy()) | literal_ok
            values = pa.array(parsed.to_numpy(dtype=np.float64,
                                              na_value=np.nan),
                              type=pa.float64())
            res = CheckResult.from_mask(values, ok, codes.WRONG_TYPE,
                                        self._wrong_type_msg())
            res = res.merge_fail(parse_ok | ~ok, codes.IS_NOT_A_NUMBER,
                                 self._not_number_msg())
            return values, res
        return None, CheckResult.fail_all(arr, codes.WRONG_TYPE,
                                          self._wrong_type_msg())

    def _bounds(self, numeric, res):
        if self.gte is not None:
            res = res.merge_fail(_np_mask(pc.greater_equal(numeric, self.gte)),
                                 codes.TOO_SMALL,
                                 'value is less than %s' % self.gte)
        if self.lte is not None:
            res = res.merge_fail(_np_mask(pc.less_equal(numeric, self.lte)),
                                 codes.TOO_BIG,
                                 'value is greater than %s' % self.lte)
        if self.lt is not None:
            res = res.merge_fail(_np_mask(pc.less(numeric, self.lt)),
                                 codes.TOO_BIG,
                                 'value should be less than %s' % self.lt)
        if self.gt is not None:
            res = res.merge_fail(_np_mask(pc.greater(numeric, self.gt)),
                                 codes.TOO_SMALL,
                                 'value should be greater than %s' % self.gt)
        return res

    def __repr__(self):
        cls = type(self).__name__
        opts = ['%s=%s' % (k, getattr(self, k))
                for k in ('gte', 'lte', 'gt', 'lt')
                if getattr(self, k) is not None]
        return '<%s(%s)>' % (cls, ', '.join(opts)) if opts else '<%s>' % cls


class ToFloat(Float):
    """Float that returns the converted float64 (reference numeric.py:155-160)."""
    convert = True


class Int(Float):
    """int, integral float, or integer string — checked, not converted
    (reference numeric.py:163-181)."""

    value_type_name = 'int'

    def _parse(self, arr):
        t = arr.type
        n = len(arr)
        if _t.is_integer(t) or _t.is_boolean(t):
            values = pc.cast(arr, pa.int64())
            ok = valid_mask(arr)
            return values, CheckResult.from_mask(values, ok, codes.WRONG_TYPE,
                                                 self._wrong_type_msg())
        if _t.is_floating(t):
            ok = valid_mask(arr)
            finite = _np_mask(pc.is_finite(arr))
            integral = _np_mask(pc.equal(arr, pc.floor(arr))) & finite
            # int64 representability: an integral float >= 2^63 would
            # blow up the whole-batch cast (ArrowInvalid kills the Ray
            # task) — quarantine the ROW instead. The column world's
            # int target is int64; the reference's unbounded Python int
            # has no such bound, so this is a documented engine domain
            # edge (same treatment as the string path's overflow
            # fallback below).
            vals = arr.to_numpy(zero_copy_only=False)
            with np.errstate(invalid='ignore'):
                in_range = (vals >= -9.223372036854776e18) \
                    & (vals < 9.223372036854776e18)
            res = CheckResult.from_mask(arr, ok, codes.WRONG_TYPE,
                                        self._wrong_type_msg())
            res = res.merge_fail((integral & in_range) | ~ok,
                                 codes.IS_NOT_INT, 'value is not int')
            safe = pc.if_else(pa.array(res.ok), arr,
                              pa.scalar(0.0, type=arr.type))
            values = pc.cast(pc.floor(safe), pa.int64())
            return values, res
        if _is_string_type(t):
            ok = valid_mask(arr)
            trimmed = pc.utf8_trim_whitespace(arr)
            match = _np_mask(pc.match_substring_regex(trimmed, _INT_RE))
            res = CheckResult.from_mask(arr, ok, codes.WRONG_TYPE,
                                        self._wrong_type_msg())
            res = res.merge_fail(match | ~ok, codes.IS_NOT_A_NUMBER,
                                 self._not_number_msg())
            safe = pc.if_else(pa.array(res.ok), trimmed,
                              pa.scalar('0', type=arr.type))
            try:
                values = pc.cast(safe, pa.int64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                # int64 overflow — python fallback on matched rows
                out = []
                for v, okk in zip(safe.to_pylist(), res.ok):
                    if not okk or v is None:
                        out.append(None)
                        continue
                    iv = int(v)
                    out.append(iv if -2**63 <= iv < 2**63 else None)
                values = pa.array(out, type=pa.int64())
                res = res.merge_fail(valid_mask(values) | ~res.ok,
                                     codes.IS_NOT_A_NUMBER,
                                     self._not_number_msg())
            return values, res
        return None, CheckResult.fail_all(arr, codes.WRONG_TYPE,
                                          self._wrong_type_msg())


class ToInt(Int):
    """Int that returns the converted int64 (reference numeric.py:184-186)."""
    convert = True


class ToDecimal(Float):
    """Decimal coercion (reference numeric.py:189-203). Precision policy:
    decimal128(38, 18) — documents the engine-wide fixed scale (Arrow
    decimals are fixed-scale; the reference's arbitrary-precision
    ``decimal.Decimal`` has none)."""

    value_type_name = 'Decimal'
    convert = True
    DECIMAL_TYPE = pa.decimal128(38, 18)

    def _scalar_check(self, value, context=None):
        if value is None:
            # reference parity: Decimal(None) raises TypeError, which the
            # reference's _converter does NOT catch (numeric.py:195-203)
            import decimal
            decimal.Decimal(value)
        return NotImplemented

    def apply(self, arr):
        t = arr.type
        if _t.is_decimal(t):
            return CheckResult.from_mask(arr, valid_mask(arr),
                                         codes.INVALID_DECIMAL,
                                         "value can't be converted to Decimal")
        if _t.is_integer(t) or _t.is_floating(t) or _is_string_type(t):
            ok = valid_mask(arr)
            try:
                if _is_string_type(t):
                    values = pc.cast(pc.utf8_trim_whitespace(arr),
                                     self.DECIMAL_TYPE)
                else:
                    values = pc.cast(arr, self.DECIMAL_TYPE)
                res = CheckResult.from_mask(values, ok, codes.INVALID_DECIMAL,
                                            "value can't be converted to Decimal")
                return self._bounds(pc.cast(values, pa.float64()), res)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass
            # per-row fallback
            import decimal
            out, dok = [], ok.copy()
            for i, v in enumerate(arr.to_pylist()):
                if v is None:
                    out.append(None)
                    continue
                try:
                    out.append(decimal.Decimal(str(v).strip()))
                except (ValueError, ArithmeticError):
                    out.append(None)
                    dok[i] = False
            values = pa.array(out, type=self.DECIMAL_TYPE)
            res = CheckResult.from_mask(values, ok, codes.INVALID_DECIMAL,
                                        "value can't be converted to Decimal")
            res = res.merge_fail(dok | ~ok, codes.INVALID_DECIMAL,
                                 "value can't be converted to Decimal")
            return self._bounds(pc.cast(null_out(values, res.ok),
                                        pa.float64()), res)
        return CheckResult.fail_all(arr, codes.WRONG_TYPE,
                                    self._wrong_type_msg())


class Date(Contract):
    """date/datetime instance, or string matching ``format`` — checked, not
    converted (reference base.py:530-588). Default format '%Y-%m-%d'."""

    convert = False
    OUT_TYPE = pa.date32()
    FORMAT_DEFAULT = '%Y-%m-%d'
    BAD_TYPE_MSG = 'value cannot be converted to date'
    BAD_TYPE_CODE = codes.IS_NOT_CONVERTIBLE_TO_DATE
    _accept_date_types = True

    def __init__(self, format=None):
        self._format = format or self.FORMAT_DEFAULT

    def _type_accepts(self, t):
        if _t.is_timestamp(t):
            return True
        if (_t.is_date(t)) and self._accept_date_types:
            return True
        return False

    def _parsed_cast(self, parsed):
        return pc.cast(pc.cast(parsed, pa.timestamp('us')), self.OUT_TYPE)

    def apply(self, arr):
        t = arr.type
        if self._type_accepts(t):
            ok = valid_mask(arr)
            values = pc.cast(arr, self.OUT_TYPE) if self.convert else arr
            return CheckResult.from_mask(values, ok, self.BAD_TYPE_CODE,
                                         self.BAD_TYPE_MSG)
        if _is_string_type(t):
            ok = valid_mask(arr)
            parsed = pc.strptime(arr.fill_null(''), format=self._format,
                                 unit='us', error_is_null=True)
            parse_ok = valid_mask(parsed)
            res = CheckResult.from_mask(arr, ok, self.BAD_TYPE_CODE,
                                        self.BAD_TYPE_MSG)
            res = res.merge_fail(parse_ok | ~ok, codes.DOES_NOT_MATCH_FORMAT,
                                 'value does not match format %s'
                                 % self._format)
            if self.convert:
                values = null_out(self._parsed_cast(parsed), res.ok)
                return CheckResult(values, res.ok, res.codes, res.msgs)
            return res
        return CheckResult.fail_all(arr, self.BAD_TYPE_CODE, self.BAD_TYPE_MSG)

    def __repr__(self):
        return '<%s %s>' % (type(self).__name__, self._format)


class ToDate(Date):
    """Date that returns the converted date32 (reference base.py:591-607)."""
    convert = True


class DateTime(Date):
    """datetime instance or string matching format; a bare date is rejected
    (reference base.py:610-662)."""

    OUT_TYPE = pa.timestamp('us')
    FORMAT_DEFAULT = '%Y-%m-%d %H:%M:%S'
    BAD_TYPE_MSG = 'value cannot be converted to datetime'
    BAD_TYPE_CODE = codes.IS_NOT_CONVERTIBLE_TO_DATETIME
    _accept_date_types = False

    def _parsed_cast(self, parsed):
        return pc.cast(parsed, self.OUT_TYPE)


class ToDateTime(DateTime):
    """DateTime returning timestamp[us] (reference base.py:665-677)."""
    convert = True


class Enum(Contract):
    """Membership in a fixed variant set (reference base.py:1277-1305).
    Variants may mix types; only variants representable in the column's type
    participate in the vectorized membership test."""

    def __init__(self, *variants):
        self.variants = tuple(variants)

    def apply(self, arr):
        msg = "value doesn't match any variant"
        compatible = []
        for v in self.variants:
            try:
                pa.scalar(v, type=arr.type)
                compatible.append(v)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError, OverflowError):
                continue
        if not compatible:
            return CheckResult.fail_all(arr, codes.DOES_NOT_MATCH_ANY, msg)
        vs = pa.array(compatible, type=arr.type)
        ok = _np_mask(pc.is_in(arr, value_set=vs))
        return CheckResult.from_mask(arr, ok, codes.DOES_NOT_MATCH_ANY, msg)

    def __repr__(self):
        return '<Enum(%s)>' % (', '.join(repr(v) for v in self.variants))


_PY_TO_ARROW_PRED = {
    int: lambda t: _t.is_integer(t),
    float: lambda t: _t.is_floating(t),
    str: _is_string_type,
    bytes: _is_binary_type,
    bool: _t.is_boolean,
}


class _TypeMeta(type(Contract)):
    def __getitem__(cls, type_):
        return cls(type_)


class Type(Contract, metaclass=_TypeMeta):
    """isinstance check mapped to a column-type assertion
    (reference base.py:205-228, 249-266). ``Type[int]`` sugar supported."""

    def __init__(self, type_):
        self.type_ = type_

    def apply(self, arr):
        msg = 'value is not %s' % self.type_.__name__
        pred = _PY_TO_ARROW_PRED.get(self.type_)
        if pred is not None and pred(arr.type):
            ok = valid_mask(arr)
        else:
            # python fallback for exotic types
            ok = np.fromiter((isinstance(v, self.type_)
                              for v in arr.to_pylist()),
                             dtype=bool, count=len(arr))
        return CheckResult.from_mask(arr, ok, codes.WRONG_TYPE, msg)

    def __repr__(self):
        return '<Type(%s)>' % self.type_.__name__


class Callable(Contract):
    """callable(value) — python-object escape hatch only
    (reference base.py:1308-1328); no Arrow representation of callables."""

    def _scalar_check(self, value, context=None):
        if not callable(value):
            raise DataError(error='value is not callable', value=value,
                            code=codes.IS_NOT_CALLABLE)
        return value

    def apply(self, arr):
        return CheckResult.fail_all(arr, codes.IS_NOT_CALLABLE,
                                    'value is not callable')

    def __repr__(self):
        return '<Callable>'


class Call(Contract):
    """User-function escape hatch (reference base.py:1331-1366): fn returns
    the coerced value or a DataError instance (returned, not raised).

    Two modes:
      * default — per-row python loop over ``arr.to_pylist()`` (slow path;
        use only off the hot path, mirroring reference Call semantics);
      * ``vectorized=True`` — fn takes and returns a ``pa.Array`` (or a
        CheckResult), running as a single kernel.
    """

    def __init__(self, fn, vectorized=False):
        if not callable(fn):
            raise RuntimeError('Call argument should be callable')
        self.fn = fn
        self.vectorized = vectorized
        import inspect
        try:
            args = inspect.getfullargspec(fn).args
            self._with_context = 'context' in args
        except TypeError:
            self._with_context = False

    def apply(self, arr):
        if self.vectorized:
            out = self.fn(arr)
            if isinstance(out, CheckResult):
                return out
            return CheckResult.success(out)
        n = len(arr)
        out = []
        ok = np.ones(n, dtype=bool)
        msgs = np.empty(n, dtype=object)
        codes_ = np.empty(n, dtype=object)
        for i, v in enumerate(arr.to_pylist()):
            try:
                res = self.fn(v)
            except DataError as e:
                res = e
            except Exception as e:  # noqa: BLE001 — masked-row execution:
                # failed positions upstream arrive as None; any crash on
                # them must degrade to a row error, not kill the batch
                res = DataError(error=str(e) or type(e).__name__)
            if isinstance(res, DataError):
                ok[i] = False
                msgs[i] = res.as_dict()
                codes_[i] = res.code
                out.append(None)
            else:
                out.append(res)
        values = pa.array(out)
        if ok.all():
            return CheckResult.success(values)
        return CheckResult(values, ok, codes_, msgs)

    def _scalar_check(self, value, context=None):
        if self.vectorized:
            return NotImplemented
        if self._with_context:
            res = self.fn(value, context=context)
        else:
            res = self.fn(value)
        if isinstance(res, DataError):
            raise res
        return res

    async def async_check(self, value, context=None):
        # coroutine fns awaited; plain fns fall through to the sync path
        # (reference async_mixins.py:96-107)
        import inspect
        if not inspect.iscoroutinefunction(self.fn):
            return self.check(value, context=context)
        if self._with_context:
            res = await self.fn(value, context=context)
        else:
            res = await self.fn(value)
        if isinstance(res, DataError):
            raise res
        return res

    def __repr__(self):
        name = getattr(self.fn, '__name__', str(self.fn))
        return '<Call(%s)>' % name


class Subclass(Contract, metaclass=_TypeMeta):
    """issubclass(value, cls) — python-object escape hatch only
    (reference base.py:231-246); classes have no Arrow representation."""

    def __init__(self, type_):
        self.type_ = type_

    def _scalar_check(self, value, context=None):
        if not (isinstance(value, type) and issubclass(value, self.type_)):
            raise DataError('value is not subclass of %s'
                            % self.type_.__name__, value=value,
                            code=codes.WRONG_TYPE)
        return value

    def apply(self, arr):
        return CheckResult.fail_all(arr, codes.WRONG_TYPE,
                                    'value is not subclass of %s'
                                    % self.type_.__name__)

    def __repr__(self):
        return '<Subclass(%s)>' % self.type_.__name__
