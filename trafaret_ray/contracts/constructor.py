"""The ``construct`` mini-DSL: Python literals -> contracts
(reference trafaret/constructor.py:23-71).

Mapping (reference constructor.py:23-61): ``int``->ToInt, ``float``->ToFloat,
``str``->String, ``bool``->Bool, 1-element list->List, tuple/n-list->Tuple,
dict->Dict, str value->Atom, other type->Type, callable->Call, contract
instance passthrough. ``'key?'`` suffix -> optional Key
(constructor.py:64-71).
"""

from __future__ import annotations

from .base import Contract
from .record import Dict, Key, List, Tuple
from .scalars import Atom, Bool, Call, String, ToFloat, ToInt, Type


def construct(arg):
    if isinstance(arg, Contract):
        return arg
    if isinstance(arg, tuple):
        return Tuple(*(construct(a) for a in arg))
    if isinstance(arg, list):
        if len(arg) == 1:
            return List(construct(arg[0]))
        return Tuple(*(construct(a) for a in arg))
    if isinstance(arg, dict):
        return Dict(*(construct_key(k, v) for k, v in arg.items()))
    if isinstance(arg, str):
        return Atom(arg)
    if isinstance(arg, type):
        if arg is int:
            return ToInt()
        if arg is float:
            return ToFloat()
        if arg is str:
            return String()
        if arg is bool:
            return Bool()
        return Type(arg)
    if callable(arg):
        return Call(arg)
    # unknown values pass through unchanged (reference constructor.py:60-61)
    return arg


def construct_key(key, value) -> Key:
    if isinstance(key, Key):
        return key.set_contract(construct(value))
    if hasattr(key, 'apply_columns'):
        return key.set_contract(construct(value))
    if isinstance(key, str):
        if key.endswith('?'):
            return Key(key[:-1], optional=True, contract=construct(value))
        return Key(key, contract=construct(value))
    raise ValueError('invalid key %r' % (key,))


class _CMeta(type):
    def __and__(cls, other):
        return construct(other)

    def __or__(cls, other):
        return construct(other)


class C(metaclass=_CMeta):
    """Seed object for ``C & int & fn`` chains (reference
    constructor.py:5-20). Class-level only, exactly like the reference:
    the chain starts at the CLASS (``C & int``), never at an instance —
    a previous ``C(int)`` constructor silently discarded its arguments
    and was removed."""
