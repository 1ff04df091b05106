"""Contract algebra: the vectorized recast of the reference's operator tree.

A :class:`Contract` is an immutable node that validates/coerces one Arrow
array per call (the reference validates one Python value per call —
trafaret/base.py:96-152). Composition mirrors the reference exactly:
``a | b`` → :class:`Or` (first-match-wins, base.py:284-317), ``a & b`` /
``a >> b`` → :class:`And` (base.py:320-339), :class:`OnError` rewrites the
error (base.py:155-170), :class:`Forward` is the recursion cell
(base.py:1369-1418).

The scalar path (``contract.check(value)``) wraps the value in a 1-row array
and raises :class:`DataError` on failure, so the reference's test suite
re-expresses directly as batch assertions plus scalar spot checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codes
from .result import CheckResult, DataError, as_array, null_out


def _infer_array(value):
    """Build a 1-row Arrow array for the scalar path, falling back where
    Arrow can't represent the value (then contracts see a null + a pyobj)."""
    try:
        return pa.array([value])
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return None


class ContractMeta(type):
    """Class-level composition sugar (reference TrafaretMeta, base.py:72-92):
    ``Int | String``, ``Int & gte``, ``ToInt >> fn`` work on the CLASSES by
    instantiating with no args first."""

    def __or__(cls, other):
        return cls() | other

    def __and__(cls, other):
        return cls() & other

    def __rshift__(cls, other):
        return cls() >> other


class Contract(metaclass=ContractMeta):
    """Base contract node. Subclasses implement ``apply(arr) -> CheckResult``."""

    # True when this node accepts null input values (Null, Any, Or-with-Null).
    accepts_null = False

    def apply(self, arr: pa.Array) -> CheckResult:
        raise NotImplementedError

    # -- scalar convenience (parity with reference check/is_valid) ---------
    def check(self, value, context=None):
        """Validate one Python value; return the coerced value or raise
        DataError. Mirrors reference Trafaret.check (base.py:104-124);
        like the reference's _failure, the raising node is recorded on
        ``DataError.trafaret`` (innermost node wins)."""
        try:
            special = self._scalar_check(value, context)
            if special is not NotImplemented:
                return special
            arr = _infer_array(value)
            if arr is None:
                raise DataError(error=self._unrepresentable_message(value),
                                value=value,
                                code=self._unrepresentable_code())
            res = self.apply(arr)
            res.scalar_raise()
        except DataError as e:
            if e.trafaret is None:
                e.trafaret = self
            raise
        out = res.values[0]
        return out.as_py() if isinstance(out, pa.Scalar) else out

    def _scalar_check(self, value, context=None):
        """Hook for nodes whose scalar semantics Arrow can't express
        (e.g. RegexpRaw returning a match object). Return NotImplemented to
        use the batch path."""
        return NotImplemented

    def _unrepresentable_message(self, value):
        return 'value is of unsupported type'

    def _unrepresentable_code(self):
        return codes.WRONG_TYPE

    def is_valid(self, value):
        try:
            self.check(value)
            return True
        except DataError:
            return False

    def __call__(self, value, context=None):
        return self.check(value, context=context)

    async def async_check(self, value, context=None):
        """Await-able mirror of ``check`` (reference
        async_mixins.py:10-14). Leaf contracts run their sync kernel;
        composites override to AWAIT children so coroutine UDFs
        (async Call fns, async Dict keys) compose."""
        return self.check(value, context=context)

    # -- composition sugar (reference base.py:142-149) ---------------------
    def __or__(self, other):
        return Or(self, other)

    def __and__(self, other):
        return And(self, other)

    def __rshift__(self, other):
        return And(self, other)


def ensure_contract(x) -> Contract:
    """Lift a contract instance / contract class / plain callable into a
    Contract (reference ensure_trafaret, base.py:185-202)."""
    if isinstance(x, Contract):
        return x
    if isinstance(x, type) and issubclass(x, Contract):
        return x()
    if callable(x):
        from .scalars import Call
        return Call(x)
    raise RuntimeError('%r cannot be converted to Contract' % (x,))


class And(Contract):
    """Sequential composition: left's output feeds right
    (reference base.py:320-339)."""

    __slots__ = ('left', 'right')

    def __init__(self, left, right):
        self.left = ensure_contract(left)
        self.right = ensure_contract(right)
        self.accepts_null = self.left.accepts_null

    def apply(self, arr: pa.Array) -> CheckResult:
        lres = self.left.apply(arr)
        rres = self.right.apply(lres.values)
        if lres.all_ok:
            return rres
        ok = lres.ok & rres.ok
        n = len(arr)
        codes_ = np.empty(n, dtype=object)
        msgs = np.empty(n, dtype=object)
        # left's error wins where left failed; else right's
        lbad = ~lres.ok
        rbad = lres.ok & ~rres.ok
        codes_[lbad] = lres.codes[lbad]
        msgs[lbad] = lres.msgs[lbad]
        if rres.codes is not None:
            codes_[rbad] = rres.codes[rbad]
            msgs[rbad] = rres.msgs[rbad]
        return CheckResult(null_out(rres.values, ok), ok, codes_, msgs)

    def _scalar_check(self, value, context=None):
        # run scalar path sequentially so python-only nodes (Call) compose
        return self.right.check(self.left.check(value, context), context)

    async def async_check(self, value, context=None):
        res = await self.left.async_check(value, context=context)
        return await self.right.async_check(res, context=context)

    def __repr__(self):
        return '<And(%r, %r)>' % (self.left, self.right)


class Or(Contract):
    """First alternative that passes wins; rows failing every alternative get
    code ``nothing_match`` (reference base.py:284-317). The vectorized form
    runs every alternative on the full array (side-effect-free) and selects
    per-row the first success, preserving first-match-wins coercion order.

    Column-type note: when alternatives coerce to DIFFERENT Arrow types
    (e.g. ``ToInt | ToFloat``), the output column is unified to a common
    type (int64+float64 -> float64; last resort string), because one Arrow
    column holds one type — the per-row scalar path still returns the
    first-match python type exactly like the reference."""

    __slots__ = ('alts',)

    def __init__(self, *alts):
        # NOT flattened: the reference nests Or(Or(a, b), c) — chained
        # ``a | b | c`` nests too (Trafaret.__or__ wraps; reference
        # test_base.py TestTrafaretMeta::test_repr)
        self.alts = tuple(ensure_contract(a) for a in alts)
        self.accepts_null = any(a.accepts_null for a in self.alts)

    def apply(self, arr: pa.Array) -> CheckResult:
        import pyarrow.compute as pc
        n = len(arr)
        remaining = np.ones(n, dtype=bool)
        results = []
        for alt in self.alts:
            res = alt.apply(arr)
            results.append(res)
            take = remaining & res.ok
            remaining = remaining & ~res.ok
            if res.all_ok:
                break
            if not remaining.any():
                break
        ok = ~remaining
        # select values: first-match-wins
        chosen = None
        claimed = np.zeros(n, dtype=bool)
        for res in results:
            take = res.ok & ~claimed
            claimed |= take
            if chosen is None:
                chosen = null_out(res.values, take)
            elif take.any():
                try:
                    chosen = pc.if_else(pa.array(take), res.values, chosen)
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
                    # incompatible alternative output types: unify via cast
                    chosen, res_vals = _unify(chosen, res.values)
                    chosen = pc.if_else(pa.array(take), res_vals, chosen)
        if chosen is None:
            chosen = pa.nulls(n)
        if ok.all():
            return CheckResult(chosen, ok)
        msgs = np.empty(n, dtype=object)
        codes_ = np.empty(n, dtype=object)
        bad = ~ok
        codes_[bad] = codes.NOTHING_MATCH
        # error dict keyed by alternative index, mirroring base.py:314
        idxs = np.nonzero(bad)[0]
        for i in idxs:
            msgs[i] = {j: (res.msgs[i] if res.msgs is not None else 'failed')
                       for j, res in enumerate(results)}
        return CheckResult(chosen, ok, codes_, msgs)

    def _scalar_check(self, value, context=None):
        errors = []
        for alt in self.alts:
            try:
                return alt.check(value, context)
            except DataError as e:
                errors.append(e)
        raise DataError(error=dict(enumerate(errors)), code=codes.NOTHING_MATCH)

    async def async_check(self, value, context=None):
        errors = []
        for alt in self.alts:
            try:
                return await alt.async_check(value, context=context)
            except DataError as e:
                errors.append(e)
        raise DataError(error=dict(enumerate(errors)),
                        code=codes.NOTHING_MATCH)

    def __repr__(self):
        return '<Or(%s)>' % (', '.join(repr(a) for a in self.alts))


def _unify(a: pa.Array, b: pa.Array):
    """Cast two arrays to a common type (string as last resort)."""
    try:
        return a.cast(b.type), b
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        pass
    try:
        return a, b.cast(a.type)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return a.cast(pa.string()), b.cast(pa.string())


class OnError(Contract):
    """Catch child failure; replace message/code (reference base.py:155-170)."""

    __slots__ = ('contract', 'message', 'code')

    def __init__(self, contract, message, code=None):
        self.contract = ensure_contract(contract)
        self.message = message
        self.code = code
        self.accepts_null = self.contract.accepts_null

    def apply(self, arr: pa.Array) -> CheckResult:
        res = self.contract.apply(arr)
        if res.all_ok:
            return res
        bad = ~res.ok
        res.msgs[bad] = self.message
        if self.code is not None:
            res.codes[bad] = self.code
        return res

    def _scalar_check(self, value, context=None):
        try:
            return self.contract.check(value, context)
        except DataError as de:
            # reference base.py:165-169: no override code -> keep the
            # child's code (the batch path above already does)
            raise DataError(error=self.message, value=value,
                            code=self.code or de.code)

    def __repr__(self):
        return '<OnError(%s)>' % (self.message,)


class WithRepr(Contract):
    """Passthrough with a custom repr (reference base.py:173-182)."""

    __slots__ = ('contract', 'representation')

    def __init__(self, contract, representation):
        self.contract = ensure_contract(contract)
        self.representation = representation
        self.accepts_null = self.contract.accepts_null

    def apply(self, arr):
        return self.contract.apply(arr)

    def _scalar_check(self, value, context=None):
        return self.contract.check(value, context)

    def __repr__(self):
        return self.representation


class Forward(Contract):
    """Provide-once recursion cell (reference base.py:1369-1418).

    Arrow types are finite-depth, so recursive application terminates at the
    column type's nesting depth; ``provide`` may only be called once."""

    def __init__(self):
        self.contract = None
        self._provided = False

    def __lshift__(self, contract):
        self.provide(contract)

    def provide(self, contract):
        if self._provided:
            raise RuntimeError('trafaret for Forward is already set')
        self.contract = ensure_contract(contract)
        self._provided = True
        self.accepts_null = self.contract.accepts_null

    def apply(self, arr):
        if self.contract is None:
            return CheckResult.fail_all(arr, codes.TRAFARET_IS_NOT_SET,
                                        'trafaret not set yet')
        return self.contract.apply(arr)

    async def async_check(self, value, context=None):
        if self.contract is None:
            raise DataError('trafaret not set yet', value=value,
                            code=codes.TRAFARET_IS_NOT_SET)
        return await self.contract.async_check(value, context=context)

    def _scalar_check(self, value, context=None):
        if self.contract is None:
            raise DataError(error='trafaret not set yet', value=value,
                            code=codes.TRAFARET_IS_NOT_SET)
        return self.contract.check(value, context)

    def __repr__(self):
        # recursion guard: self-referential schemas print <recur>
        # (reference base.py:1411-1418)
        if getattr(self, '_recur_repr', False):
            return '<recur>'
        self._recur_repr = True
        r = '<Forward(%r)>' % (self.contract,)
        self._recur_repr = False
        return r


def deprecated(message):
    """Emit a DeprecationWarning (reference base.py:61-62)."""
    import warnings
    warnings.warn(message, DeprecationWarning)
