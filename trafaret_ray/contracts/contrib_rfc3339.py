"""Lenient datetime parsing (reference trafaret/contrib/rfc_3339.py:8-51).

Batch strategy: a multi-format ``pc.strptime`` cascade covers the common
RFC-3339 / ISO shapes vectorized; only rows that every format misses fall
back to python ``dateutil.parser.parse`` (the reference's engine) — the
failed-mask-only python pattern from SURVEY.md §2.8.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import codes
from .base import Contract
from .result import CheckResult, DataError
from .scalars import valid_mask, _is_string_type

try:
    from dateutil.parser import parse as _du_parse
except ImportError:  # pragma: no cover
    _du_parse = None

_FORMATS = (
    '%Y-%m-%dT%H:%M:%S%z', '%Y-%m-%dT%H:%M:%S.%f%z',
    '%Y-%m-%dT%H:%M:%S', '%Y-%m-%dT%H:%M:%S.%f',
    '%Y-%m-%d %H:%M:%S', '%Y-%m-%d %H:%M:%S.%f',
    '%Y-%m-%d', '%Y%m%dT%H%M%S',
)


class DateTime(Contract):
    """Lenient datetime coercion -> timestamp[us]."""

    OUT_TYPE = pa.timestamp('us')
    ERROR_CODE = codes.NOT_DATETIME

    def __init__(self, allow_blank=False):
        self.allow_blank = allow_blank

    def _post(self, value: _dt.datetime):
        return value

    def apply(self, arr):
        t = arr.type
        n = len(arr)
        if pa.types.is_timestamp(t):
            ok = valid_mask(arr)
            return CheckResult.from_mask(pc.cast(arr, self.OUT_TYPE), ok,
                                         self.ERROR_CODE, 'invalid value')
        if not _is_string_type(t):
            return CheckResult.fail_all(arr, self.ERROR_CODE,
                                        'invalid value')
        ok = valid_mask(arr)
        filled = arr.fill_null('')
        out = pa.nulls(n, type=pa.timestamp('us'))
        remaining = ok.copy()
        for fmt in _FORMATS:
            if not remaining.any():
                break
            parsed = pc.strptime(filled, format=fmt, unit='us',
                                 error_is_null=True)
            hit = valid_mask(parsed) & remaining
            if hit.any():
                # strip tz to naive us (reference returns aware for %z
                # inputs; Arrow timestamps are naive — documented policy)
                vals = parsed.cast(pa.timestamp('us'))
                out = pc.if_else(pa.array(hit), vals, out)
                remaining &= ~hit
        msgs = np.empty(n, dtype=object)
        if remaining.any() and _du_parse is not None:
            vals = arr.to_pylist()
            py_out = out.to_pylist()
            for i in np.nonzero(remaining)[0]:
                try:
                    v = _du_parse(vals[i])
                    if v.tzinfo is not None:
                        v = v.replace(tzinfo=None)
                    py_out[i] = v
                    remaining[i] = False
                except (ValueError, TypeError, OverflowError) as e:
                    msgs[i] = str(e)
            out = pa.array(py_out, type=pa.timestamp('us'))
        final_ok = ok & ~remaining
        if final_ok.all():
            return CheckResult(out, final_ok)
        codes_ = np.empty(n, dtype=object)
        bad = ~final_ok
        codes_[bad] = self.ERROR_CODE
        for i in np.nonzero(bad)[0]:
            if msgs[i] is None:
                msgs[i] = 'invalid value'
        return CheckResult(out, final_ok, codes_, msgs)

    _ACCEPT = (_dt.datetime,)   # Date widens to dates (rfc_3339.py:43-46)

    def _scalar_check(self, value, context=None):
        if isinstance(value, self._ACCEPT):
            return self._post(value)
        if _du_parse is None:
            raise DataError('dateutil unavailable', code=self.ERROR_CODE)
        try:
            return self._post(_du_parse(value))
        except (ValueError, TypeError, OverflowError) as e:
            raise DataError(str(e), value=value, code=self.ERROR_CODE)

    def __repr__(self):
        return '<DateTime(blank)>' if self.allow_blank else '<DateTime>'


class Date(DateTime):
    """Lenient date coercion -> date32 (reference rfc_3339.py:30-51)."""

    OUT_TYPE = pa.date32()
    ERROR_CODE = codes.NOT_DATE
    _ACCEPT = (_dt.datetime, _dt.date)

    def _post(self, value):
        if isinstance(value, _dt.datetime):
            return value.date()
        return value

    def apply(self, arr):
        res = super(Date, self).apply(
            arr if not pa.types.is_date(arr.type) else arr.cast(pa.string()))
        vals = res.values
        if pa.types.is_timestamp(vals.type):
            vals = vals.cast(pa.date32())
        return CheckResult(vals, res.ok, res.codes, res.msgs)

    def __repr__(self):
        return '<Date(blank)>' if self.allow_blank else '<Date>'
