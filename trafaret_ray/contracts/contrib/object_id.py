"""MongoId contract — the reference's third-party-scalar extension
pattern (reference trafaret/contrib/object_id.py:8-43) WITHOUT the bson
dependency: a minimal spec-compatible ObjectId stand-in (12 bytes =
4-byte timestamp + 5-byte random + 3-byte counter, public BSON spec)
plus a vectorized batch path over 24-hex string columns.

Error codes/messages match the reference byte-for-byte (output
contract): 'empty_value', 'invalid_objectid', 'not_objectid'.
"""

from __future__ import annotations

import os
import struct
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..base import Contract
from ..result import CheckResult, DataError, null_out
from ..scalars import valid_mask, _is_string_type, _np_mask


class InvalidId(ValueError):
    pass


class ObjectId:
    """12-byte BSON ObjectId stand-in (accepts 12-byte input or 24-char
    hex string; generates fresh ids when constructed from None)."""

    _counter_lock = threading.Lock()
    _counter = int.from_bytes(os.urandom(3), 'big')
    _random = os.urandom(5)

    __slots__ = ('binary',)

    def __init__(self, oid=None):
        if oid is None:
            with ObjectId._counter_lock:
                ObjectId._counter = (ObjectId._counter + 1) & 0xFFFFFF
                counter = ObjectId._counter
            self.binary = (struct.pack('>I', int(time.time()) & 0xFFFFFFFF)
                           + ObjectId._random
                           + counter.to_bytes(3, 'big'))
            return
        if isinstance(oid, ObjectId):
            self.binary = oid.binary
            return
        if isinstance(oid, bytes) and len(oid) == 12:
            self.binary = oid
            return
        if isinstance(oid, str):
            try:
                if len(oid) == 24:
                    self.binary = bytes.fromhex(oid)
                    return
            except ValueError:
                pass
        raise InvalidId(
            "'%s' is not a valid ObjectId, it must be a 12-byte input"
            " or a 24-character hex string" % oid)

    def __str__(self):
        return self.binary.hex()

    def __repr__(self):
        return "ObjectId('%s')" % self.binary.hex()

    def __eq__(self, other):
        return isinstance(other, ObjectId) and self.binary == other.binary

    def __hash__(self):
        return hash(self.binary)


_HEX24_RE = '^[0-9a-fA-F]{24}$'


class MongoId(Contract):
    """Check & convert ObjectId values (reference contrib/object_id.py:8-43).

    Batch path: a string column of 24-hex ids validates vectorized
    (regex) and normalizes to lowercase hex — Arrow has no ObjectId
    type, so the column representation stays the canonical hex string.
    Scalar path returns ``ObjectId`` instances like the reference.
    """

    convertable = (str, bytes, ObjectId)
    value_type = ObjectId
    allow_blank = False

    def __init__(self, allow_blank=False):
        self.allow_blank = allow_blank

    def __repr__(self):
        return '<MongoId(blank)>' if self.allow_blank else '<MongoId>'

    def apply(self, arr):
        if not _is_string_type(arr.type):
            return CheckResult.fail_all(
                arr, 'not_objectid',
                'value is not %s' % self.value_type.__name__)
        ok = valid_mask(arr)
        if self.allow_blank:
            # reference semantics: None generates a FRESH id
            import numpy as np
            nulls = ~ok
            if nulls.any():
                fill = pa.array([str(ObjectId()) if m else None
                                 for m in nulls], type=pa.string())
                arr = pc.if_else(pa.array(nulls), fill, arr)
                ok = np.ones(len(arr), dtype=bool)
        res = CheckResult.from_mask(arr, ok, 'empty_value',
                                    'blank value is not allowed')
        m = _np_mask(pc.match_substring_regex(
            pc.cast(arr, pa.string()).fill_null(''), _HEX24_RE))
        res = res.merge_fail(
            m | ~res.ok, 'invalid_objectid',
            'value is not a valid ObjectId, it must be a 12-byte input'
            ' or a 24-character hex string')
        out = pc.utf8_lower(pc.cast(arr, pa.string()))
        return CheckResult(null_out(out, res.ok), res.ok,
                           res.codes, res.msgs)

    def _scalar_check(self, value, context=None):
        if not self.allow_blank and value is None:
            raise DataError('blank value is not allowed', value=value,
                            code='empty_value')
        if isinstance(value, self.convertable) or value is None:
            try:
                return ObjectId(value)
            except InvalidId as e:
                raise DataError(str(e), value=value,
                                code='invalid_objectid')
        raise DataError('value is not %s' % self.value_type.__name__,
                        value=value, code='not_objectid')
