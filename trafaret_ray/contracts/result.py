"""Vectorized check results and the batch-level error model.

The reference signals failure by raising a structure-mirroring ``DataError``
tree per value (reference: trafaret/dataerror.py:4-63). The vectorized
analogue is a :class:`CheckResult`: one pass over an Arrow array yields the
coerced output array plus a boolean ok-mask and, for failed positions, an
error code + message (matching the reference's codes/messages exactly).

``DataError`` is kept as the scalar-path exception so the reference's test
suite re-expresses naturally (``contract.check(value)`` raises ``DataError``
with ``as_dict()`` / ``to_struct()`` mirroring dataerror.py:41-63).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DataError(ValueError):
    """Scalar-path validation error (reference: trafaret/dataerror.py:4-63).

    ``error`` is a message string or a dict of child DataErrors / messages,
    mirroring the input structure. ``trafaret`` carries the raising node
    (reference dataerror.py:14-28) for tools that introspect errors.
    Subclasses ValueError and defaults ``code`` to ``'unknown'`` exactly
    as the reference does (``except ValueError`` in user code must keep
    catching validation errors; quarantine payloads say "unknown", never
    null).
    """

    __slots__ = ('error', 'name', 'value', 'code', 'trafaret')

    _EMPTY = object()
    error_code = 'unknown'

    def __init__(self, error=None, name=None, value=_EMPTY, code=None,
                 trafaret=None):
        if not isinstance(error, (str, bytes, dict)):
            raise RuntimeError('Only str or dict is supported, got %r'
                               % error)
        self.error = error
        self.name = name
        self.value = value
        self.code = code or self.__class__.error_code
        self.trafaret = trafaret

    def __str__(self):
        return str(self.error)

    def __repr__(self):
        return 'DataError(%r)' % (self.error,)

    def as_dict(self, value=False):
        """Nested plain dict of messages (reference: dataerror.py:55-63)."""
        if not isinstance(self.error, dict):
            if value and self.value is not self._EMPTY:
                return '%s, got %r' % (self.error, self.value)
            return self.error
        return {
            k: v.as_dict(value=value) if isinstance(v, DataError) else v
            for k, v in self.error.items()
        }

    def to_struct(self, value=False):
        """Consistent {code, message|nested} records (reference: dataerror.py:41-53).
        ``self.code`` is used directly in both branches — the reference
        default is 'unknown', not a dict-specific substitute."""
        if isinstance(self.error, dict):
            return {
                'code': self.code,
                'nested': {
                    k: v.to_struct(value=value) if isinstance(v, DataError) else v
                    for k, v in self.error.items()
                },
            }
        return {'code': self.code, 'message': self.as_dict(value=value)}


def extract_error(contract, value):
    """Run check; return ``as_dict()`` of the error, or the CHECK RESULT
    when nothing raised (reference base.py:1529-1537 — it does not
    require an error). Accepts a contract or any checker callable
    (e.g. ``extract_error(d.check, value)``)."""
    checker = getattr(contract, 'check', contract)
    try:
        return checker(value)
    except DataError as e:
        return e.as_dict()


def catch(checker, *a, **kw):
    """Run check, returning the DataError instead of raising (base.py:1516-1525)."""
    try:
        return checker(*a, **kw)
    except DataError as error:
        return error


class CheckResult:
    """Result of applying one contract node to one Arrow array.

    Attributes:
        values: pa.Array, length n. Failed positions are nulled.
        ok: np.ndarray[bool], length n.
        codes: np.ndarray[object] | None — error code per failed position.
        msgs:  np.ndarray[object] | None — error message per failed position.

    ``codes`` / ``msgs`` are None when every row passed (the fast path).
    Entries at positions where ``ok`` is True are unspecified.
    """

    __slots__ = ('values', 'ok', 'codes', 'msgs')

    def __init__(self, values, ok, codes=None, msgs=None):
        self.values = values
        self.ok = ok
        self.codes = codes
        self.msgs = msgs

    @property
    def all_ok(self) -> bool:
        return self.codes is None or bool(self.ok.all())

    @classmethod
    def success(cls, values: pa.Array) -> 'CheckResult':
        return cls(values, np.ones(len(values), dtype=bool), None, None)

    @classmethod
    def fail_all(cls, values: pa.Array, code: str, msg: str) -> 'CheckResult':
        n = len(values)
        codes = np.full(n, code, dtype=object)
        msgs = np.full(n, msg, dtype=object)
        return cls(pa.nulls(n, type=values.type), np.zeros(n, dtype=bool), codes, msgs)

    @classmethod
    def from_mask(cls, values: pa.Array, ok: np.ndarray, code: str, msg) -> 'CheckResult':
        """Build a result failing every position where ``ok`` is False with one
        code and either a constant message or an object-array of messages."""
        if ok.all():
            return cls(values, ok, None, None)
        n = len(values)
        codes = np.empty(n, dtype=object)
        msgs = np.empty(n, dtype=object)
        bad = ~ok
        codes[bad] = code
        if isinstance(msg, np.ndarray):
            msgs[bad] = msg[bad]
        else:
            msgs[bad] = msg
        values = null_out(values, ok)
        return cls(values, ok, codes, msgs)

    def merge_fail(self, ok2: np.ndarray, code: str, msg) -> 'CheckResult':
        """Fail additional positions (those already failed keep their error)."""
        newly = self.ok & ~ok2
        if not newly.any():
            return self
        n = len(self.values)
        codes = self.codes if self.codes is not None else np.empty(n, dtype=object)
        msgs = self.msgs if self.msgs is not None else np.empty(n, dtype=object)
        codes[newly] = code
        if isinstance(msg, np.ndarray):
            msgs[newly] = msg[newly]
        else:
            msgs[newly] = msg
        ok = self.ok & ok2
        return CheckResult(null_out(self.values, ok), ok, codes, msgs)

    def scalar_raise(self, name=None):
        """Raise DataError for a 1-row result (scalar .check() path)."""
        if not self.ok[0]:
            raise DataError(error=self.msgs[0], name=name, code=self.codes[0])


def null_out(values: pa.Array, ok: np.ndarray) -> pa.Array:
    """Null out positions where ok is False (zero-copy when all ok)."""
    if ok.all():
        return values
    import pyarrow.compute as pc
    mask = pa.array(ok)
    try:
        return pc.if_else(mask, values, pa.scalar(None, type=values.type))
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        # universal fallback (nested/map types): take with null indices
        idx = np.arange(len(values), dtype=np.int64)
        return values.take(pa.array(idx, mask=~ok))


def as_array(col) -> pa.Array:
    """Normalize ChunkedArray / Array to a single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col
