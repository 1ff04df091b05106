"""Property-based coherence: for any column of values, the vectorized
batch path must agree with the per-value scalar path — same accept/reject
decisions, same coerced values. This pins the two execution models of
every contract to each other (the reference only has the scalar model)."""

import math

import hypothesis.strategies as st
import pyarrow as pa
import pytest
from hypothesis import given, settings

import trafaret_ray.contracts as t
from trafaret_ray.contracts.result import DataError

CONTRACTS = [
    t.String(),
    t.String(allow_blank=True, max_length=5),
    t.ToInt(),
    t.Int(gte=0, lte=100),
    t.ToFloat(),
    t.Float(gt=-10, lt=10),
    t.ToBool(),
    t.Enum('a', 'b', 1, 2),
    t.Atom('x'),
    t.Null() | t.ToInt(),
    t.ToInt() & t.Int(gte=0),
    t.OnError(t.ToInt(), 'nope', code='custom'),
    t.Date(),
    t.ToDate(),
    t.ToDateTime(),
]

# homogeneous pools: one Arrow column has ONE type, so draw per-type lists
POOLS = {
    'str': st.text(max_size=8),
    'int': st.integers(min_value=-10**12, max_value=10**12),
    'float': st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e9, max_value=1e9),
    'numstr': st.one_of(
        st.integers(-1000, 1000).map(str),
        st.floats(-100, 100, allow_nan=False).map(str),
        st.sampled_from(['', ' ', '1.5', 'x', 'true', 'no', '1e3'])),
    'datestr': st.one_of(
        st.dates().map(str),
        st.sampled_from(['2019-07-25 22:32:05', '25-07-2019', 'nope',
                         '2019-13-40', ''])),
}


def scalar_outcome(contract, value):
    try:
        return True, contract.check(value)
    except DataError:
        return False, None


@pytest.mark.parametrize('contract', CONTRACTS, ids=lambda c: repr(c))
@pytest.mark.parametrize('pool', sorted(POOLS))
@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_batch_equals_scalar(contract, pool, data):
    values = data.draw(st.lists(POOLS[pool], min_size=1, max_size=20))
    try:
        arr = pa.array(values)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return  # not a representable homogeneous column
    res = contract.apply(arr)
    for i, v in enumerate(values):
        # the scalar path must see the same value the column stored
        # (Arrow normalizes e.g. int->float in mixed lists; use as_py)
        stored = arr[i].as_py()
        ok_scalar, out_scalar = scalar_outcome(contract, stored)
        assert bool(res.ok[i]) == ok_scalar, \
            f'{contract!r} on {stored!r}: batch={bool(res.ok[i])} ' \
            f'scalar={ok_scalar}'
        if ok_scalar:
            got = res.values[i].as_py()
            if isinstance(out_scalar, float) and isinstance(got, (int, float)):
                if math.isnan(out_scalar):
                    assert got is None or math.isnan(got)
                else:
                    assert got == pytest.approx(out_scalar)
            elif out_scalar is None:
                pass
            else:
                # Or-unification may widen the arrow type (int->float)
                if isinstance(got, float) and isinstance(out_scalar, int):
                    assert got == float(out_scalar)
                else:
                    assert got == out_scalar, \
                        f'{contract!r} on {stored!r}: {got!r} != {out_scalar!r}'
