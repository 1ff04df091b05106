"""Callable-introspection helpers mirroring the reference's ``lib``
surface (reference trafaret/lib.py:39-90): context-argument detection
for user callables, shared by Call / Dict callable keys. Written fresh
on ``inspect`` (the engine's own detection lives inline in Call; these
are the public helpers third-party code imports)."""

from __future__ import annotations

import inspect

STR_TYPES = (str, bytes)


class WithContextCaller:
    """Wrap a callable that accepts ``context``; calls pass it through."""

    def __init__(self, func):
        self.func = func
        if hasattr(func, 'async_call'):
            self.async_call = func.async_call

    def __call__(self, value, context=None):
        return self.func(value, context=context)


class WithoutContextCaller(WithContextCaller):
    """Wrap a context-less callable; the context argument is dropped."""

    def __call__(self, value, context=None):
        return self.func(value)


def get_callable_args(fn):
    """Argument names of a function / method / class / callable object;
    () when not introspectable. Bound methods keep dropping ``self``
    via inspect's own rules; classes report ``__init__``'s args."""
    if inspect.isfunction(fn) or inspect.ismethod(fn):
        inspectable = fn
    elif inspect.isclass(fn):
        inspectable = fn.__init__
    elif hasattr(fn, '__call__'):
        inspectable = fn.__call__
    else:
        inspectable = fn
    try:
        args = list(inspect.getfullargspec(inspectable).args)
    except TypeError:
        return ()
    if hasattr(fn, '__self__') and args:
        args.pop(0)              # bound method: drop self
    return args


def with_context_caller(callble):
    """Normalize any callable to a (value, context=None) caller;
    idempotent on already-wrapped callers."""
    if isinstance(callble, WithContextCaller):
        return callble
    args = get_callable_args(callble)
    if 'context' in args:
        return WithContextCaller(callble)
    return WithoutContextCaller(callble)
