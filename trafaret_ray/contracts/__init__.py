"""trafaret_ray.contracts — the vectorized contract algebra.

Public surface mirrors the reference's ``trafaret`` top-level namespace
(reference trafaret/__init__.py) so schemas written against the reference
read identically here, while every operator executes as Arrow-batch kernels.
"""

from . import codes  # noqa: F401
from .result import (  # noqa: F401
    CheckResult, DataError, extract_error, catch,
)
from .base import (  # noqa: F401
    Contract, And, Or, OnError, WithRepr, Forward, ensure_contract,
)
from .scalars import (  # noqa: F401
    Any, Null, Bool, ToBool, Atom, String, Bytes, AnyString, ToBytes,
    FromBytes, Int, ToInt, Float, ToFloat, ToDecimal, Date, ToDate,
    DateTime, ToDateTime, Enum, Type, Subclass, Callable, Call,
)
from .record import (  # noqa: F401
    Key, Dict, DictKeys, List, Iterable, Tuple, Mapping,
    xor_key, confirm_key, subdict, KeysSubset,
)
from .regexp_net import (  # noqa: F401
    Regexp, RegexpRaw, RegexpString, Hex, URLSafe, Email, URL,
    IPv4, IPv6, IP,
)
from .constructor import construct, construct_key, C  # noqa: F401
from .utils import (  # noqa: F401
    fold, unfold, split, guard, GuardError, ignore,
)
from .validator import (  # noqa: F401
    BatchValidator, validate_split, drop_quarantine, only_quarantine,
    ERRORS_COL,
)

# reference-compat aliases
Trafaret = Contract
ensure_trafaret = ensure_contract
catch_error = catch
