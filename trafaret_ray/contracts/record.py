"""Record-level contracts: Key / Dict / List / Tuple / Mapping plus the
cross-field checks (xor_key, confirm_key, subdict, KeysSubset).

The reference's ``Dict`` runs declared ``Key``s over one Python mapping
(reference trafaret/base.py:1007-1221, 938-1004); here a ``Dict`` runs its
keys over a *column set* — one Arrow array per field — in a single
vectorized pass, producing per-row ok-masks and sparse per-row error dicts.
It applies identically to a ``pa.Table`` (top level) and to a
``pa.StructArray`` (nested payload column).

Null-cell policy (documented deviation): in the column world a null cell is
indistinguishable from an absent mapping key. The batch ``Dict`` therefore
treats null as *absent* — a required key with a null cell reports
``required`` (matching FIXTURES.md §A.1), an optional key with a null cell
passes nulls through, and defaults fill null cells. The reference instead
distinguishes ``{}`` from ``{'a': None}``; that distinction has no Arrow
representation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import codes
from .base import Contract, ensure_contract
from .result import CheckResult, DataError, as_array, null_out
from .scalars import Any, valid_mask, _np_mask

class _Empty:
    """Sentinel for 'no default'. A class object pickles by reference, so
    identity survives the cloudpickle round-trip into Ray workers (a bare
    ``object()`` would not)."""


_empty = _Empty


class FieldError:
    """One field's error on one row: (code, message). message may be a
    nested dict for child-structure errors."""

    __slots__ = ('code', 'message')

    def __init__(self, code, message):
        self.code = code
        self.message = message

    def as_dict(self):
        return self.message

    def to_struct(self):
        if isinstance(self.message, dict):
            return {'code': self.code or codes.SOME_ELEMENTS_DID_NOT_MATCH,
                    'nested': self.message}
        return {'code': self.code, 'message': self.message}


class ColumnsResult:
    """Result of applying a Dict to a column set.

    out_cols: ordered {out_name: pa.Array} — coerced outputs.
    ok: np.ndarray[bool]
    row_errors: {row_idx: {field_name: FieldError}} — sparse, failed rows only.
    """

    __slots__ = ('out_cols', 'ok', 'row_errors')

    def __init__(self, out_cols, ok, row_errors):
        self.out_cols = out_cols
        self.ok = ok
        self.row_errors = row_errors


def _add_field_errors(row_errors, res: CheckResult, name):
    """Merge a per-column CheckResult's failures into the sparse row-error map."""
    if res.all_ok:
        return
    for i in np.nonzero(~res.ok)[0]:
        row_errors.setdefault(int(i), {})[name] = FieldError(
            res.codes[i], res.msgs[i])


class Key:
    """Column extractor/validator (reference base.py:938-1004): rename via
    ``to_name`` / ``>> 'new'``, ``default`` (fills null cells; callable
    defaults invoked once per batch), ``optional``. Errors report under the
    ORIGINAL name (reference base.py:976-978)."""

    __slots__ = ('name', 'to_name', 'default', 'optional', 'contract')

    def __init__(self, name, default=_empty, optional=False, to_name=None,
                 trafaret=None, contract=None):
        self.name = name
        self.to_name = to_name
        self.default = default
        self.optional = optional
        c = contract if contract is not None else trafaret
        self.contract = ensure_contract(c) if c is not None else Any()

    def set_contract(self, contract):
        self.contract = ensure_contract(contract)
        return self

    # reference aliases
    set_trafaret = set_contract

    def __rshift__(self, name):
        return Key(self.name, default=self.default, optional=self.optional,
                   to_name=name, contract=self.contract)

    def get_name(self):
        return self.to_name or self.name

    def apply_columns(self, cols, n):
        """Returns (outputs, touched, ok, row_errors)."""
        if self.name not in cols:
            if self.default is not _empty:
                d = self.default() if callable(self.default) else self.default
                arr = pa.array([d] * n)
            elif self.optional:
                return {}, {self.name}, np.ones(n, dtype=bool), {}
            else:
                ok = np.zeros(n, dtype=bool)
                errs = {i: {self.name: FieldError(codes.REQUIRED, 'is required')}
                        for i in range(n)}
                return {}, {self.name}, ok, errs
        else:
            arr = as_array(cols[self.name])
            if self.default is not _empty and arr.null_count:
                d = self.default() if callable(self.default) else self.default
                arr = arr.fill_null(d)
        res = self.contract.apply(arr)
        if arr.null_count and not self.contract.accepts_null:
            null_rows = ~valid_mask(arr)
            if self.optional:
                # null cells pass through untouched
                ok = res.ok | null_rows
                values = pc.if_else(pa.array(null_rows),
                                    pa.scalar(None, type=res.values.type),
                                    res.values)
                res = CheckResult(null_out(values, ok), ok, res.codes, res.msgs)
            else:
                # required: null cell -> 'is required', overriding the
                # contract's own type error
                bad = null_rows & ~np.zeros(n, dtype=bool)
                if res.codes is None:
                    res = CheckResult(res.values, res.ok,
                                      np.empty(n, dtype=object),
                                      np.empty(n, dtype=object))
                res.codes[null_rows] = codes.REQUIRED
                res.msgs[null_rows] = 'is required'
                ok = res.ok & ~null_rows
                res = CheckResult(null_out(res.values, ok), ok,
                                  res.codes, res.msgs)
        row_errors = {}
        _add_field_errors(row_errors, res, self.name)
        return ({self.get_name(): res.values}, {self.name}, res.ok, row_errors)

    def _scalar_call(self, data, context=None):
        """Per-value generator protocol (reference base.py:964-982)."""
        if self.name in data or self.default is not _empty:
            default = self.default() if callable(self.default) else self.default
            raw = data.get(self.name, default)
            try:
                result = self.contract.check(raw, context)
            except DataError as de:
                yield self.name, de, (self.name,)
            else:
                yield self.get_name(), result, (self.name,)
            return
        if not self.optional:
            yield self.name, DataError(error='is required',
                                       code=codes.REQUIRED), (self.name,)

    async def async_call(self, data, context=None):
        """Async generator mirror of the reference's KeyAsyncMixin
        (async_mixins.py:157-181). NOTE a deliberate reference quirk:
        the async path reports errors under get_name() (the RENAMED
        name), while the sync path reports under the original name —
        both matched exactly."""
        if self.name in data or self.default is not _empty:
            default = self.default() if callable(self.default) \
                else self.default
            raw = data.get(self.name, default)
            try:
                result = await self.contract.async_check(raw,
                                                         context=context)
            except DataError as de:
                yield self.get_name(), de, (self.name,)
            else:
                yield self.get_name(), result, (self.name,)
            return
        if not self.optional:
            yield self.name, DataError(error='is required',
                                       code=codes.REQUIRED), (self.name,)

    # the reference Key IS callable (base.py:957-982): key(data) yields
    # the generator protocol triples
    def __call__(self, data, context=None):
        return self._scalar_call(data, context)

    def __repr__(self):
        return '<Key "%s"%s %s>' % (
            self.name,
            ' to "%s"' % self.to_name if self.to_name else '',
            self.contract)


class Dict(Contract):
    """Declarative record contract over a column set
    (reference base.py:1007-1221).

    Accepts a mapping of name->contract ( ``'name?'`` NOT supported here —
    that's the constructor DSL), Key instances, cross-field check objects
    (anything with ``apply_columns``), and kwargs. Extra-column policy via
    ``allow_extra`` / ``ignore_extra`` lists or ``'*'``; both return clones
    (reference base.py:1106-1130).
    """

    def __init__(self, *args, **contracts):
        keys_map = {}
        if args and isinstance(args[0], dict):
            keys_map = args[0]
            args = args[1:]

        allow_extra = contracts.pop('allow_extra', [])
        allow_extra_trafaret = contracts.pop(
            'allow_extra_trafaret', contracts.pop('allow_extra_contract', Any))
        self.extras_contract = ensure_contract(allow_extra_trafaret)
        self.allow_any = '*' in allow_extra
        self.extras = [n for n in allow_extra if n != '*']
        ignore_extra = contracts.pop('ignore_extra', [])
        self.ignore_any = '*' in ignore_extra
        self.ignore = [n for n in ignore_extra if n != '*']

        self.keys = []
        for a in args:
            if isinstance(a, Key) or hasattr(a, 'apply_columns'):
                self.keys.append(a)
            elif callable(a):
                # reference: any callable can be a key (base.py:1007-1042)
                self.keys.append(_CallableKey(a))
            else:
                raise RuntimeError(
                    'Keys in single attributes must be callables')
        import itertools
        for key, contract in itertools.chain(contracts.items(),
                                             keys_map.items()):
            if isinstance(key, str):
                key_ = Key(key)
            elif isinstance(key, Key) or hasattr(key, 'set_trafaret') \
                    or callable(key):
                key_ = key
            else:
                raise RuntimeError('Non callable Keys are not supported')
            key_.set_contract(ensure_contract(contract))
            self.keys.append(key_)

    def _clone_kw(self):
        kw = {}
        if self.allow_any or self.extras:
            kw['allow_extra'] = list(self.extras) + (['*'] if self.allow_any else [])
            kw['allow_extra_trafaret'] = self.extras_contract
        if self.ignore_any or self.ignore:
            kw['ignore_extra'] = list(self.ignore) + (['*'] if self.ignore_any else [])
        return kw

    def allow_extra(self, *names, **kw):
        kw2 = self._clone_kw()
        kw2.setdefault('allow_extra', []).extend(names)
        if 'trafaret' in kw:
            kw2['allow_extra_trafaret'] = kw['trafaret']
        if 'contract' in kw:
            kw2['allow_extra_trafaret'] = kw['contract']
        return Dict(*self.keys, **kw2)

    def ignore_extra(self, *names):
        kw2 = self._clone_kw()
        kw2.setdefault('ignore_extra', []).extend(names)
        return Dict(*self.keys, **kw2)

    def merge(self, other):
        """Concatenate key sets, union extra/ignore policies; accepts a
        Dict, a mapping, or a list/tuple of Keys
        (reference base.py:1200-1221)."""
        if isinstance(other, dict):
            other = Dict(other)
        elif isinstance(other, (list, tuple)):
            other = Dict(*other)
        elif not isinstance(other, Dict):
            raise TypeError('You must merge Dict with another Dict, a '
                            'mapping, or a list of Keys')
        kw = self._clone_kw()
        okw = other._clone_kw()
        if 'allow_extra' in okw:
            kw.setdefault('allow_extra', []).extend(okw['allow_extra'])
        if 'ignore_extra' in okw:
            kw.setdefault('ignore_extra', []).extend(okw['ignore_extra'])
        return Dict(*(list(self.keys) + list(other.keys)), **kw)

    __add__ = merge

    def apply_columns(self, cols, n) -> ColumnsResult:
        out_cols = {}
        ok = np.ones(n, dtype=bool)
        row_errors = {}
        touched = set()
        for key in self.keys:
            outputs, tnames, kok, kerrs = key.apply_columns(cols, n)
            touched |= set(tnames)
            for oname, arr in outputs.items():
                if oname in out_cols:
                    # declared-key output collision
                    ok[:] = False
                    for i in range(n):
                        row_errors.setdefault(i, {})[oname] = FieldError(
                            codes.SHADOWED, '%s key was shadowed' % oname)
                    continue
                out_cols[oname] = arr
            ok &= kok
            for i, errs in kerrs.items():
                row_errors.setdefault(i, {}).update(errs)

        if not self.ignore_any:
            for name in cols:
                if name in touched or name in self.ignore:
                    continue
                if not self.allow_any and name not in self.extras:
                    code, msg = ((codes.SHADOWED, '%s key was shadowed' % name)
                                 if name in out_cols else
                                 (codes.NOT_ALLOWED,
                                  '%s is not allowed key' % name))
                    ok[:] = False
                    for i in range(n):
                        row_errors.setdefault(i, {})[name] = FieldError(code, msg)
                elif name in out_cols:
                    ok[:] = False
                    for i in range(n):
                        row_errors.setdefault(i, {})[name] = FieldError(
                            codes.SHADOWED, '%s key was shadowed' % name)
                else:
                    res = self.extras_contract.apply(as_array(cols[name]))
                    out_cols[name] = res.values
                    ok &= res.ok
                    _add_field_errors(row_errors, res, name)
        return ColumnsResult(out_cols, ok, row_errors)

    def apply(self, arr):
        """Apply to a struct column (nested record payload)."""
        if not pa.types.is_struct(arr.type):
            return CheckResult.fail_all(arr, codes.IS_NOT_A_DICT,
                                        'value is not a dict')
        arr = as_array(arr)
        n = len(arr)
        cols = {f.name: arr.field(i) for i, f in enumerate(arr.type)}
        cres = self.apply_columns(cols, n)
        ok = cres.ok
        struct_null = ~valid_mask(arr)
        ok = ok & ~struct_null
        names = list(cres.out_cols)
        values = pa.StructArray.from_arrays(
            [cres.out_cols[m] for m in names], names=names)
        res = CheckResult.from_mask(null_out(values, ok), ok,
                                    codes.SOME_ELEMENTS_DID_NOT_MATCH, '')
        if res.msgs is not None:
            for i, errs in cres.row_errors.items():
                res.msgs[i] = {k: e.as_dict() for k, e in errs.items()}
            for i in np.nonzero(struct_null)[0]:
                res.codes[i] = codes.IS_NOT_A_DICT
                res.msgs[i] = 'value is not a dict'
        return res

    def _sweep_extras(self, value, touched, collect, errors):
        """Shared untouched-key policy (shadow / not-allowed); returns the
        keys whose values still need the extras contract — the caller
        checks them sync or async."""
        pending = []
        if self.ignore_any:
            return pending
        for k in value:
            if k in touched or k in self.ignore:
                continue
            if not self.allow_any and k not in self.extras:
                if k in collect:
                    errors[k] = DataError('%s key was shadowed' % k,
                                          code=codes.SHADOWED)
                else:
                    errors[k] = DataError('%s is not allowed key' % k,
                                          code=codes.NOT_ALLOWED)
            elif k in collect:
                errors[k] = DataError('%s key was shadowed' % k,
                                      code=codes.SHADOWED)
            else:
                pending.append(k)
        return pending

    def _scalar_check(self, value, context=None):
        """Per-value path mirroring reference Dict.transform
        (base.py:1132-1179) exactly — including the absent-key vs
        present-None distinction the batch path cannot represent."""
        from collections.abc import Mapping as _AbcMapping
        if not isinstance(value, _AbcMapping):
            raise DataError(error='value is not a dict', value=value,
                            code=codes.IS_NOT_A_DICT)
        collect = {}
        errors = {}
        touched = set()
        for key in self.keys:
            caller = getattr(key, 'scalar_call', None)
            if caller is None and isinstance(key, Key):
                caller = key._scalar_call
            for k, v, names in caller(value, context):
                touched.update(names)
                if isinstance(v, DataError):
                    errors[k] = v
                else:
                    collect[k] = v
        for k in self._sweep_extras(value, touched, collect, errors):
            try:
                collect[k] = self.extras_contract.check(value[k], context)
            except DataError as de:
                errors[k] = de
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return collect

    async def async_check(self, value, context=None):
        """Async mirror of the scalar path (reference
        async_mixins.py:110-154): Key.async_call async-generators are
        awaited; plain sync generator keys still work."""
        import inspect
        from collections.abc import Mapping as _AbcMapping
        if not isinstance(value, _AbcMapping):
            raise DataError(error='value is not a dict', value=value,
                            code=codes.IS_NOT_A_DICT)
        collect = {}
        errors = {}
        touched = set()
        for key in self.keys:
            if isinstance(key, _CallableKey):
                # raw fn so an async-generator key surfaces as such
                key_run = (key.fn(value, context=context)
                           if key._with_context else key.fn(value))
            else:
                caller = getattr(key, 'async_call', None) \
                    or getattr(key, 'scalar_call', None)
                if caller is None and isinstance(key, Key):
                    caller = key._scalar_call
                key_run = caller(value, context)
            if inspect.isasyncgen(key_run):
                async for k, v, names in key_run:
                    touched.update(names)
                    if isinstance(v, DataError):
                        errors[k] = v
                    else:
                        collect[k] = v
            else:
                for k, v, names in key_run:
                    touched.update(names)
                    if isinstance(v, DataError):
                        errors[k] = v
                    else:
                        collect[k] = v
        for k in self._sweep_extras(value, touched, collect, errors):
            try:
                collect[k] = await self.extras_contract.async_check(
                    value[k], context=context)
            except DataError as de:
                errors[k] = de
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return collect

    def __repr__(self):
        r = '<Dict('
        options = []
        if self.allow_any:
            options.append('any')
        if self.ignore:
            options.append('ignore=(%s)' % ', '.join(self.ignore))
        if self.extras:
            options.append('extras=(%s)' % ', '.join(self.extras))
        r += ', '.join(options)
        if options:
            r += ' | '
        r += ', '.join(sorted(repr(k) for k in self.keys))
        return r + ')>'


def DictKeys(keys):
    """All listed keys required with Any (reference base.py:1224-1232)."""
    return Dict({k: Any() for k in keys})


class _ListMeta(type(Contract)):
    """Square-bracket sugar (reference SquareBracketsMeta,
    base.py:746-784): ``List[Int]``, ``List[Int, 1:]``, ``List[:10, Int]``;
    a bare slice without an element trafaret is a usage error."""

    def __getitem__(cls, args):
        if not isinstance(args, tuple):
            args = (args,)
        slice_ = None
        contract = None
        for arg in args:
            if isinstance(arg, slice):
                slice_ = arg
            elif isinstance(arg, Contract) or isinstance(arg, type):
                contract = arg
        if contract is None:
            raise RuntimeError('Trafaret is required for List initialization')
        if slice_ is not None:
            return cls(contract, min_length=slice_.start or 0,
                       max_length=slice_.stop)
        return cls(contract)


class List(Contract, metaclass=_ListMeta):
    """List column: min/max length + per-element contract
    (reference base.py:788-884). Child errors are keyed by index within the
    list, parent code ``some_elements_did_not_match``."""

    def __init__(self, contract=None, min_length=0, max_length=None,
                 trafaret=None):
        c = contract if contract is not None else trafaret
        self.contract = ensure_contract(c) if c is not None else Any()
        self.min_length = min_length
        self.max_length = max_length

    def apply(self, arr):
        t = arr.type
        if not (pa.types.is_list(t) or pa.types.is_large_list(t)
                or pa.types.is_fixed_size_list(t)):
            return CheckResult.fail_all(arr, codes.IS_NOT_A_LIST,
                                        'value is not a list')
        arr = as_array(arr)
        n = len(arr)
        ok = valid_mask(arr)
        res = CheckResult.from_mask(arr, ok, codes.IS_NOT_A_LIST,
                                    'value is not a list')
        lengths = pc.list_value_length(arr).fill_null(0)
        if self.min_length:
            m = _np_mask(pc.greater_equal(lengths, self.min_length))
            res = res.merge_fail(m, codes.TOO_SHORT,
                                 'list length is less than %s'
                                 % self.min_length)
        if self.max_length is not None:
            m = _np_mask(pc.less_equal(lengths, self.max_length))
            res = res.merge_fail(m, codes.TOO_LONG,
                                 'list length is greater than %s'
                                 % self.max_length)
        child = arr.flatten()
        cres = self.contract.apply(child)
        lens_np = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
        lens_np[~ok] = 0  # null rows contribute no children to flatten()
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens_np, out=offsets[1:])
        values = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          cres.values)
        if not cres.all_ok:
            parent_idx = np.repeat(np.arange(n), lens_np)
            child_bad = ~cres.ok
            bad_parents = np.unique(parent_idx[child_bad])
            elem_ok = np.ones(n, dtype=bool)
            elem_ok[bad_parents] = False
            msgs = np.empty(n, dtype=object)
            for p in bad_parents:
                lo, hi = offsets[p], offsets[p + 1]
                msgs[p] = {int(j - lo): cres.msgs[j]
                           for j in range(lo, hi) if not cres.ok[j]}
            res = res.merge_fail(elem_ok, codes.SOME_ELEMENTS_DID_NOT_MATCH,
                                 msgs)
        return CheckResult(null_out(values, res.ok), res.ok,
                           res.codes, res.msgs)

    def _precheck(self, value):
        """Type + length gate shared by the sync and async paths;
        Iterable overrides only the type test."""
        if not isinstance(value, list):
            raise DataError('value is not a list', value=value,
                            code=codes.IS_NOT_A_LIST)
        self._length_check(value)

    def _length_check(self, value):
        if len(value) < self.min_length:
            raise DataError('list length is less than %s' % self.min_length,
                            value=value, code=codes.TOO_SHORT)
        if self.max_length is not None and len(value) > self.max_length:
            raise DataError('list length is greater than %s'
                            % self.max_length, value=value,
                            code=codes.TOO_LONG)

    def _scalar_check(self, value, context=None):
        """Per-value path (threads context to element contracts —
        reference base.py:848-859)."""
        self._precheck(value)
        out = []
        errors = {}
        for i, v in enumerate(value):
            try:
                out.append(self.contract.check(v, context))
            except DataError as e:
                errors[i] = e
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return out

    async def async_check(self, value, context=None):
        """Async element transform (reference async_mixins.py:34-48)."""
        self._precheck(value)
        out = []
        errors = {}
        for i, v in enumerate(value):
            try:
                out.append(await self.contract.async_check(v,
                                                           context=context))
            except DataError as e:
                errors[i] = e
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return out

    def __repr__(self):
        options = []
        if self.min_length:
            options.append('min_length=%s' % self.min_length)
        if self.max_length:
            options.append('max_length=%s' % self.max_length)
        r = '<List('
        if options:
            r += ', '.join(options) + ' | '
        return r + repr(self.contract) + ')>'


class Iterable(List):
    """Reference ``Iterable`` (base.py:788-873): the scalar path accepts
    ANY sized iterable (tuple, set, str, dict view, ...) with the
    "value is not iterable" message; non-sized iterables (generators)
    raise TypeError from ``len`` exactly as the reference does. The batch
    path is identical to List — an Arrow list column is already
    materialized as a list. Only the type gate differs from List; the
    length checks and element loops (sync and async) are inherited."""

    def _precheck(self, value):
        from collections.abc import Iterable as AbcIterable
        if not isinstance(value, AbcIterable):
            raise DataError('value is not iterable', value=value,
                            code=codes.IS_NOT_A_LIST)
        self._length_check(value)


class Tuple(Contract):
    """Fixed-arity tuple (reference base.py:887-935) over a list column (or
    struct column, slots = fields in order). Output is a struct column
    ``f0..f{k-1}`` when slot output types differ, else a list column."""

    def __init__(self, *contracts):
        self.contracts = [ensure_contract(c) for c in contracts]
        self.length = len(self.contracts)

    def apply(self, arr):
        t = arr.type
        n = len(arr)
        if pa.types.is_struct(t) and t.num_fields == self.length:
            arr = as_array(arr)
            slots = [arr.field(i) for i in range(self.length)]
            base_ok = valid_mask(arr)
        elif pa.types.is_list(t) or pa.types.is_large_list(t) \
                or pa.types.is_fixed_size_list(t):
            arr = as_array(arr)
            base_ok = valid_mask(arr)
            lengths = pc.list_value_length(arr).fill_null(-1)
            right_len = _np_mask(pc.equal(lengths, self.length))
            res0 = CheckResult.from_mask(arr, base_ok, codes.TUPLE_LIKE,
                                         'value must be convertable to tuple')
            res0 = res0.merge_fail(right_len | ~base_ok, codes.LOT_ELEMENTS,
                                   'value must contain %s items' % self.length)
            base_ok = res0.ok
            child = arr.flatten()
            lens_np = pc.list_value_length(arr).fill_null(0)\
                .to_numpy(zero_copy_only=False).astype(np.int64)
            lens_np[~valid_mask(arr)] = 0
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens_np[:-1], out=starts[1:])
            slots = []
            for i in range(self.length):
                if len(child) == 0:
                    # every row failed the arity gate (or is empty):
                    # the index-0 fallback would crash on the empty
                    # flattened child — the slot is all-null anyway
                    slots.append(pa.nulls(n, type=child.type))
                    continue
                idx = np.where(base_ok, starts + i, 0)
                taken = child.take(pa.array(idx, type=pa.int64()))
                slots.append(null_out(taken, base_ok))
            res = res0
            return self._apply_slots(slots, res, n)
        else:
            return CheckResult.fail_all(arr, codes.TUPLE_LIKE,
                                        'value must be convertable to tuple')
        res = CheckResult.from_mask(arr, base_ok, codes.TUPLE_LIKE,
                                    'value must be convertable to tuple')
        return self._apply_slots(slots, res, n)

    def _apply_slots(self, slots, res, n):
        slot_results = [c.apply(as_array(s))
                        for c, s in zip(self.contracts, slots)]
        elem_ok = np.ones(n, dtype=bool)
        for sres in slot_results:
            elem_ok &= sres.ok
        if not elem_ok.all():
            msgs = np.empty(n, dtype=object)
            for i in np.nonzero(~elem_ok)[0]:
                msgs[i] = {j: sres.msgs[i]
                           for j, sres in enumerate(slot_results)
                           if not sres.ok[i]}
            res = res.merge_fail(elem_ok, codes.SOME_ELEMENTS_DID_NOT_MATCH,
                                 msgs)
        types = {str(sr.values.type) for sr in slot_results}
        if len(types) == 1:
            flat = pa.chunked_array([sr.values for sr in slot_results])\
                .combine_chunks()
            idx = np.arange(n * self.length).reshape(self.length, n)\
                .T.reshape(-1)
            interleaved = flat.take(pa.array(idx, type=pa.int64()))
            offsets = pa.array(np.arange(0, (n + 1) * self.length,
                                         self.length, dtype=np.int32))
            values = pa.ListArray.from_arrays(offsets, interleaved)
        else:
            values = pa.StructArray.from_arrays(
                [sr.values for sr in slot_results],
                names=['f%d' % i for i in range(self.length)])
        return CheckResult(null_out(values, res.ok), res.ok,
                           res.codes, res.msgs)

    def _scalar_check(self, value, context=None):
        try:
            tup = tuple(value)
        except TypeError:
            raise DataError('value must be convertable to tuple', value=value,
                            code=codes.TUPLE_LIKE)
        if len(tup) != self.length:
            raise DataError('value must contain %s items' % self.length,
                            value=value, code=codes.LOT_ELEMENTS)
        result = []
        errors = {}
        for i, (c, v) in enumerate(zip(self.contracts, tup)):
            try:
                result.append(c.check(v, context))
            except DataError as e:
                errors[i] = e
        if errors:
            raise DataError(error=errors, value=value,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return tuple(result)

    async def async_check(self, value, context=None):
        """Async per-slot transform (reference async_mixins.py:51-64)."""
        try:
            tup = tuple(value)
        except TypeError:
            raise DataError('value must be convertable to tuple',
                            value=value, code=codes.TUPLE_LIKE)
        if len(tup) != self.length:
            raise DataError('value must contain %s items' % self.length,
                            value=value, code=codes.LOT_ELEMENTS)
        result = []
        errors = {}
        for i, (c, v) in enumerate(zip(self.contracts, tup)):
            try:
                result.append(await c.async_check(v, context=context))
            except DataError as e:
                errors[i] = e
        if errors:
            raise DataError(error=errors, value=value,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return tuple(result)

    def __repr__(self):
        return '<Tuple(%s)>' % (', '.join(repr(c) for c in self.contracts))


class Mapping(Contract):
    """Homogeneous map column: key contract + value contract per pair
    (reference base.py:1235-1274). Pair errors are
    ``{key: {'key': ..., 'value': ...}}``."""

    def __init__(self, key, value):
        self.key_contract = ensure_contract(key)
        self.value_contract = ensure_contract(value)

    def apply(self, arr):
        t = arr.type
        if not pa.types.is_map(t):
            return CheckResult.fail_all(arr, codes.IS_NOT_A_DICT,
                                        'value is not a dict')
        arr = as_array(arr)
        # SLICED MapArrays (routine under zero-copy Ray batch slicing)
        # expose the FULL un-sliced child via .keys/.items while
        # .offsets is slice-relative — the pair masks then misalign or
        # crash. Compact to a zero-offset array first (take rebuilds
        # child + offsets consistently); no-op cost on unsliced input.
        if arr.offset != 0 or (len(arr.offsets) and
                               arr.offsets[0].as_py() != 0):
            arr = arr.take(pa.array(np.arange(len(arr), dtype=np.int64)))
        n = len(arr)
        ok = valid_mask(arr)
        res = CheckResult.from_mask(arr, ok, codes.IS_NOT_A_DICT,
                                    'value is not a dict')
        keys = arr.keys
        items = arr.items
        kres = self.key_contract.apply(keys)
        vres = self.value_contract.apply(items)
        pair_ok = kres.ok & vres.ok
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()), kres.values, vres.values)
        if not pair_ok.all():
            lens = np.diff(offsets)
            parent_idx = np.repeat(np.arange(n), lens)
            bad_parents = np.unique(parent_idx[~pair_ok])
            elem_ok = np.ones(n, dtype=bool)
            elem_ok[bad_parents] = False
            msgs = np.empty(n, dtype=object)
            key_list = keys.to_pylist()
            for p in bad_parents:
                lo, hi = offsets[p], offsets[p + 1]
                d = {}
                for j in range(lo, hi):
                    if pair_ok[j]:
                        continue
                    e = {}
                    if not kres.ok[j]:
                        e['key'] = kres.msgs[j]
                    if not vres.ok[j]:
                        e['value'] = vres.msgs[j]
                    d[str(key_list[j])] = e
                msgs[p] = d
            res = res.merge_fail(elem_ok, codes.SOME_ELEMENTS_DID_NOT_MATCH,
                                 msgs)
        return CheckResult(null_out(values, res.ok), res.ok,
                           res.codes, res.msgs)

    def _scalar_check(self, value, context=None):
        from collections.abc import Mapping as _AbcMapping
        if not isinstance(value, _AbcMapping):
            raise DataError('value is not a dict', value=value,
                            code=codes.IS_NOT_A_DICT)
        checked = {}
        errors = {}
        for k, v in value.items():
            pair_err = {}
            ck = cv = None
            try:
                ck = self.key_contract.check(k, context)
            except DataError as e:
                pair_err['key'] = e
            try:
                cv = self.value_contract.check(v, context)
            except DataError as e:
                pair_err['value'] = e
            if pair_err:
                errors[k] = DataError(error=pair_err,
                                      code=codes.PAIR_MEMBERS_DID_NOT_MATCH)
            else:
                checked[ck] = cv
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return checked

    async def async_check(self, value, context=None):
        """Async per-pair transform (reference async_mixins.py:67-93)."""
        from collections.abc import Mapping as _AbcMapping
        if not isinstance(value, _AbcMapping):
            raise DataError('value is not a dict', value=value,
                            code=codes.IS_NOT_A_DICT)
        checked = {}
        errors = {}
        for k, v in value.items():
            pair_err = {}
            ck = cv = None
            try:
                ck = await self.key_contract.async_check(k, context=context)
            except DataError as e:
                pair_err['key'] = e
            try:
                cv = await self.value_contract.async_check(v,
                                                           context=context)
            except DataError as e:
                pair_err['value'] = e
            if pair_err:
                errors[k] = DataError(error=pair_err,
                                      code=codes.PAIR_MEMBERS_DID_NOT_MATCH)
            else:
                checked[ck] = cv
        if errors:
            raise DataError(error=errors,
                            code=codes.SOME_ELEMENTS_DID_NOT_MATCH)
        return checked

    def __repr__(self):
        return '<Mapping(%r => %r)>' % (self.key_contract, self.value_contract)


# ---------------------------------------------------------------------------
# Cross-field checks (reference trafaret/keys.py)
# ---------------------------------------------------------------------------

def _presence(cols, name, n):
    if name not in cols:
        return np.zeros(n, dtype=bool), None
    arr = as_array(cols[name])
    return valid_mask(arr), arr


class xor_key:
    """Exactly one of two columns non-null per row; the present value is
    checked and emitted under ``first`` (reference keys.py:93-143)."""

    def __init__(self, first, second, contract):
        self.first = first
        self.second = second
        self.contract = ensure_contract(contract)

    def apply_columns(self, cols, n):
        p1, a1 = _presence(cols, self.first, n)
        p2, a2 = _presence(cols, self.second, n)
        touched = {self.first, self.second} & set(cols)
        row_errors = {}
        ok = np.ones(n, dtype=bool)
        both = p1 & p2
        neither = ~p1 & ~p2
        for i in np.nonzero(both)[0]:
            row_errors.setdefault(int(i), {})[self.first] = FieldError(
                codes.ONLY_ONE_MUST_BE_DEFINED,
                'correct only if %s is not defined' % self.second)
            row_errors.setdefault(int(i), {})[self.second] = FieldError(
                codes.ONLY_ONE_MUST_BE_DEFINED,
                'correct only if %s is not defined' % self.first)
        for i in np.nonzero(neither)[0]:
            row_errors.setdefault(int(i), {})[self.first] = FieldError(
                codes.ONE_IS_REQUIRED,
                'is required if %s is not defined' % self.second)
            row_errors.setdefault(int(i), {})[self.second] = FieldError(
                codes.ONE_IS_REQUIRED,
                'is required if %s is not defined' % self.first)
        ok &= ~(both | neither)
        # merged value column: first where present else second
        if a1 is None and a2 is None:
            merged = pa.nulls(n)
        elif a1 is None:
            merged = a2
        elif a2 is None:
            merged = a1
        else:
            try:
                merged = pc.if_else(pa.array(p1), a1, a2)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    pa.ArrowTypeError):
                merged = pc.if_else(pa.array(p1), a1.cast(pa.string()),
                                    a2.cast(pa.string()))
        res = self.contract.apply(merged)
        val_bad = ~res.ok & ok  # only where xor itself passed
        for i in np.nonzero(val_bad)[0]:
            src = self.first if p1[i] else self.second
            row_errors.setdefault(int(i), {})[src] = FieldError(
                res.codes[i], res.msgs[i])
        ok &= res.ok | ~(p1 ^ p2)
        ok &= ~(both | neither)
        return ({self.first: null_out(res.values, ok)}, touched, ok,
                row_errors)


class confirm_key:
    """Both columns present, valid, and equal (reference keys.py:146-176)."""

    def __init__(self, name, confirm_name, contract):
        self.name = name
        self.confirm_name = confirm_name
        self.contract = ensure_contract(contract)

    def apply_columns(self, cols, n):
        row_errors = {}
        ok = np.ones(n, dtype=bool)
        touched = {self.name, self.confirm_name} & set(cols)
        arrs = {}
        for nm in (self.name, self.confirm_name):
            p, a = _presence(cols, nm, n)
            if a is None:
                a = pa.nulls(n)
            res = self.contract.apply(a)
            miss = ~p
            for i in np.nonzero(miss)[0]:
                row_errors.setdefault(int(i), {})[nm] = FieldError(
                    codes.REQUIRED, 'is required')
            bad = p & ~res.ok
            for i in np.nonzero(bad)[0]:
                row_errors.setdefault(int(i), {})[nm] = FieldError(
                    res.codes[i], res.msgs[i])
            ok &= p & res.ok
            arrs[nm] = res.values
        try:
            eq = _np_mask(pc.equal(arrs[self.name], arrs[self.confirm_name]))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            eq = np.zeros(n, dtype=bool)
        uneq = ok & ~eq
        for i in np.nonzero(uneq)[0]:
            row_errors.setdefault(int(i), {})[self.confirm_name] = FieldError(
                codes.MUST_BE_EQUAL, 'must be equal to %s' % self.name)
        ok = ok & eq
        return ({self.name: null_out(arrs[self.name], ok),
                 self.confirm_name: null_out(arrs[self.confirm_name], ok)},
                touched, ok, row_errors)


class subdict:
    """Combine several Keys' outputs through one callable
    (reference keys.py:43-90).

    ``fn`` modes:
      * vectorized (default False): per-row python — fn(dict) -> value or
        DataError;
      * ``vectorized=True``: fn(dict of np/pa arrays) -> pa.Array or
        CheckResult — the scale path.
    """

    def __init__(self, name, *keys, trafaret=None, contract=None,
                 vectorized=False):
        self.name = name
        self.keys = [k if isinstance(k, Key) else Key(k) for k in keys]
        self.fn = contract if contract is not None else trafaret
        assert self.fn is not None, 'subdict needs trafaret=/contract='
        self.vectorized = vectorized

    def apply_columns(self, cols, n):
        touched = set()
        ok = np.ones(n, dtype=bool)
        row_errors = {}
        member_cols = {}
        for key in self.keys:
            outputs, tn, kok, kerrs = key.apply_columns(cols, n)
            touched |= set(tn)
            ok &= kok
            for i, errs in kerrs.items():
                row_errors.setdefault(i, {}).update(errs)
            member_cols.update(outputs)
        if self.vectorized:
            out = self.fn(member_cols)
            if isinstance(out, CheckResult):
                res = out
            else:
                res = CheckResult.success(out)
            bad = ok & ~res.ok
            for i in np.nonzero(bad)[0]:
                row_errors.setdefault(int(i), {})[self.name] = FieldError(
                    res.codes[i], res.msgs[i])
            ok &= res.ok
            values = res.values
        else:
            rows = [dict(zip(member_cols,
                             (as_array(member_cols[c])[i].as_py()
                              for c in member_cols)))
                    for i in range(n)]
            out = []
            for i, r in enumerate(rows):
                if not ok[i]:
                    out.append(None)
                    continue
                try:
                    v = self.fn(r)
                except DataError as e:
                    v = e
                if isinstance(v, DataError):
                    row_errors.setdefault(int(i), {})[self.name] = FieldError(
                        v.code, v.as_dict())
                    ok[i] = False
                    out.append(None)
                else:
                    out.append(v)
            values = pa.array(out)
        return ({self.name: null_out(values, ok)}, touched, ok, row_errors)


class KeysSubset:
    """Feed a sub-view of named columns to a callable returning a dict of
    result columns / errors (reference keys.py:5-40). Per-row python unless
    ``vectorized=True`` (then fn gets/returns dicts of arrays; errors as
    CheckResult values)."""

    def __init__(self, *keys, fn=None, vectorized=False):
        self.keys = keys
        self.fn = fn
        self.vectorized = vectorized

    def set_contract(self, contract):
        self.fn = contract
        return self

    set_trafaret = set_contract

    def apply_columns(self, cols, n):
        touched = {k for k in self.keys if k in cols}
        sub = {k: as_array(cols[k]) for k in self.keys if k in cols}
        ok = np.ones(n, dtype=bool)
        row_errors = {}
        out_cols = {}
        if self.vectorized:
            result = self.fn(sub)
            for name, v in result.items():
                if isinstance(v, CheckResult):
                    bad = ~v.ok
                    for i in np.nonzero(bad)[0]:
                        row_errors.setdefault(int(i), {})[name] = FieldError(
                            v.codes[i], v.msgs[i])
                    ok &= v.ok
                    out_cols[name] = v.values
                else:
                    out_cols[name] = v
            return out_cols, touched, ok, row_errors
        rows_out = {}
        sub_py = {k: v.to_pylist() for k, v in sub.items()}
        for i in range(n):
            r = {k: sub_py[k][i] for k in sub_py}
            res = _keyssubset_run(self.fn, r)
            if isinstance(res, DataError):
                res = res.error
            for name, v in res.items():
                if isinstance(v, DataError):
                    row_errors.setdefault(int(i), {})[name] = FieldError(
                        v.code, v.as_dict())
                    ok[i] = False
                else:
                    rows_out.setdefault(name, [None] * n)[i] = v
        for name, lst in rows_out.items():
            out_cols[name] = null_out(pa.array(lst), ok)
        return out_cols, touched, ok, row_errors


# -- scalar (per-value) paths for cross-field checks, mirroring reference
#    keys.py generator semantics exactly --------------------------------------

def _xor_scalar_call(self, value, context=None):
    first, second = self.first, self.second
    if (first in value) ^ (second in value):
        key = first if first in value else second
        try:
            res = self.contract.check(value[key], context)
        except DataError as e:
            res = e
        yield first, res, (key,)
    elif first in value and second in value:
        yield first, DataError(
            'correct only if %s is not defined' % second,
            code=codes.ONLY_ONE_MUST_BE_DEFINED), (first,)
        yield second, DataError(
            'correct only if %s is not defined' % first,
            code=codes.ONLY_ONE_MUST_BE_DEFINED), (second,)
    else:
        yield first, DataError(
            'is required if %s is not defined' % second,
            code=codes.ONE_IS_REQUIRED), (first,)
        yield second, DataError(
            'is required if %s is not defined' % first,
            code=codes.ONE_IS_REQUIRED), (second,)


xor_key.scalar_call = _xor_scalar_call


def _confirm_scalar_call(self, value, context=None):
    name, confirm_name = self.name, self.confirm_name
    first = second = None
    if name in value:
        first = value[name]
        try:
            res = self.contract.check(first, context)
        except DataError as e:
            res = e
        yield name, res, (name,)
    else:
        yield name, DataError('is required', code=codes.REQUIRED), (name,)
    if confirm_name in value:
        second = value[confirm_name]
        try:
            res = self.contract.check(second, context)
        except DataError as e:
            res = e
        yield confirm_name, res, (confirm_name,)
    else:
        yield confirm_name, DataError('is required',
                                      code=codes.REQUIRED), (confirm_name,)
    if not (first and second):
        return
    if first != second:
        yield confirm_name, DataError('must be equal to %s' % name,
                                      code=codes.MUST_BE_EQUAL), (confirm_name,)


confirm_key.scalar_call = _confirm_scalar_call


def _subdict_scalar_call(self, value, context=None):
    errors = False
    preserve = []
    touched = set()
    collect = {}
    for key in self.keys:
        for k, v, names in key._scalar_call(value, context):
            touched.update(names)
            preserve.append((k, v, names))
            if isinstance(v, DataError):
                errors = True
            else:
                collect[k] = v
    if errors:
        for out in preserve:
            yield out
    elif collect:
        if self.vectorized:
            import pyarrow as _pa
            res = self.fn({k: _pa.array([v]) for k, v in collect.items()})
            if isinstance(res, CheckResult):
                if res.ok[0]:
                    v = res.values[0].as_py()
                else:
                    v = DataError(res.msgs[0], code=res.codes[0])
            else:
                v = res[0].as_py()
        else:
            try:
                v = self.fn(collect)
            except DataError as e:
                v = e
        yield self.name, v, touched


subdict.scalar_call = _subdict_scalar_call


def _keyssubset_scalar_call(self, value, context=None):
    sub = {k: value.get(k) for k in self.keys if k in value}
    res = _keyssubset_run(self.fn, sub)
    if isinstance(res, DataError):
        # a raised DataError carries {name: DataError} (reference
        # keys.py:33-38; non-DataError values are a usage error)
        for k, e in res.error.items():
            if not isinstance(e, DataError):
                raise RuntimeError('Please use DataError instance')
            yield k, e, self.keys
    else:
        for k, v in res.items():
            yield k, v, self.keys


def _keyssubset_run(fn, sub):
    """Run the subset fn — a raw callable or a Contract (Call) — catching
    a raised DataError (reference uses catch_error on the trafaret)."""
    checker = fn.check if hasattr(fn, 'check') else fn
    try:
        return checker(sub)
    except DataError as e:
        return e


KeysSubset.scalar_call = _keyssubset_scalar_call


class _CallableKey:
    """Adapter: ANY callable following the reference key protocol —
    ``fn(data) -> yields (name, value_or_DataError, touched_names)`` — can
    be a Dict key (reference base.py:1007-1042, test_base.py:221-231).

    Batch path runs the generator per row over python dicts (compatibility
    escape hatch, not a hot-path operator — use Key/cross-field objects
    for vectorized execution).
    """

    def __init__(self, fn):
        self.fn = fn
        import inspect
        try:
            self._with_context = 'context' in inspect.getfullargspec(fn).args
        except TypeError:
            self._with_context = False

    def set_contract(self, contract):
        # Dict({callable: trafaret}) form: the reference calls
        # set_trafaret on key objects; a plain callable key has no inner
        # trafaret to set — keep reference behavior (AttributeError there),
        # here a no-op for robustness.
        return self

    set_trafaret = set_contract

    def scalar_call(self, data, context=None):
        gen = self.fn(data, context=context) if self._with_context \
            else self.fn(data)
        for item in gen:
            yield item

    def apply_columns(self, cols, n):
        py_cols = {k: as_array(v).to_pylist() for k, v in cols.items()}
        out_lists: dict = {}
        touched = set()
        ok = np.ones(n, dtype=bool)
        row_errors: dict = {}
        for i in range(n):
            row = {k: py_cols[k][i] for k in py_cols}
            for name, value, names in self.scalar_call(row):
                touched.update(names)
                if isinstance(value, DataError):
                    ok[i] = False
                    row_errors.setdefault(i, {})[name] = FieldError(
                        value.code, value.as_dict())
                else:
                    out_lists.setdefault(name, [None] * n)[i] = value
        out_cols = {name: pa.array(vals) for name, vals in out_lists.items()}
        return out_cols, touched, ok, row_errors
