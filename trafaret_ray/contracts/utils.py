"""fold / unfold and the ``guard`` decorator + ``ignore``
(reference trafaret/utils.py:8-103, base.py:1421-1513).

``unfold``/``fold`` translate between nested dicts/lists and flat
delimiter-joined keys — the column-name-driven analogue of
``pa.Table.flatten``. ``guard`` validates *driver-side* call arguments
(pipeline/job configs) against a Dict contract; it is not a data-plane
operator.
"""

from __future__ import annotations

import inspect

from .base import Contract, ensure_contract
from .record import Dict, Key
from .result import DataError



def unfold(data, prefix='', delimeter='__'):
    """Nested dict/list -> flat 'a__0__b'-keyed dict; a prefix joins with
    the delimiter like any other path segment (reference utils.py:8-49)."""
    result = {}

    def _unfold(value, key):
        if isinstance(value, dict):
            for k, v in value.items():
                _unfold(v, '%s%s%s' % (key, delimeter, k) if key else str(k))
        elif isinstance(value, (list, tuple)):
            for i, v in enumerate(value):
                _unfold(v, '%s%s%s' % (key, delimeter, i) if key else str(i))
        else:
            result[key] = value

    _unfold(data, prefix)
    return result


def fold(data, prefix='', delimeter='__'):
    """Inverse of unfold: flat delimited keys -> nested dicts/lists;
    all-digit key groups become lists; ``delimeter`` may be a tuple of
    delimiters (e.g. ('[', ']') for form keys); a prefix names the
    top-level key to extract (reference utils.py:64-103)."""
    delims = list(delimeter) if isinstance(delimeter, (tuple, list)) \
        else [delimeter]
    root = {}
    for flat_key, value in sorted(data.items()):
        parts = split(flat_key, delims)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def _listify(node):
        if not isinstance(node, dict):
            return node
        items = {k: _listify(v) for k, v in node.items()}
        if items and all(k.isdigit() for k in items):
            return [items[k] for k in sorted(items, key=int)]
        return items

    out = _listify(root)
    return out[prefix] if prefix else out


class GuardError(DataError):
    """Raised by guard on invalid call args (reference base.py:1421-1427)."""


def guard(contract=None, **kwargs):
    """Decorator validating function kwargs against a Dict contract
    (reference base.py:1430-1502)."""
    if contract and not isinstance(contract, Dict) \
            and not (isinstance(contract, Contract)):
        raise RuntimeError('trafaret should be instance of Dict or Forward')
    elif contract and kwargs:
        raise RuntimeError('choose one way of initialization,'
                           ' trafaret or kwargs')
    if not contract:
        contract = Dict(**kwargs)

    def wrapper(fn):
        argspec = inspect.getfullargspec(fn)

        def decor(*args, **kw):
            fnargs = argspec.args
            if fnargs and fnargs[0] in ('self', 'cls'):
                obj = args[0]
                fnargs = fnargs[1:]
                checkargs = args[1:]
            else:
                obj = None
                checkargs = args
            try:
                call_args = dict(zip(fnargs, checkargs))
                call_args.update(kw)
                defaults = argspec.defaults or ()
                for name, default in zip(reversed(fnargs),
                                         reversed(defaults)):
                    call_args.setdefault(name, default)
                converted = contract.check(call_args)
            except DataError as err:
                raise GuardError(error=err.error)
            if obj is not None:
                return fn(obj, **converted)
            return fn(**converted)

        decor.__doc__ = 'guarded with %r\n\n' % contract + (fn.__doc__ or '')
        decor.__name__ = fn.__name__
        return decor

    return wrapper


class _Ignore(Contract):
    """Swallow the value (``>> ignore``; reference base.py:1505-1513)."""
    accepts_null = True

    def apply(self, arr):
        import pyarrow as pa
        from .result import CheckResult
        return CheckResult.success(pa.nulls(len(arr)))

    def _scalar_check(self, value, context=None):
        return None

    def __repr__(self):
        return '<Ignore>'


ignore = _Ignore()


def split(str, delimeters):  # noqa: A002 - reference signature parity
    """Split a key by a delimiter list, dropping empty pieces
    (reference utils.py:52-61)."""
    if not delimeters:
        return [str]
    rest = delimeters[1:]
    return [
        subkey
        for key in str.split(delimeters[0])
        for subkey in split(key, rest)
        if subkey
    ]
