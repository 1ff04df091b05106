"""Dict / Key / List / Tuple / Mapping / cross-field — reference semantics
as batch + scalar assertions (reference tests/test_base.py, tests/test_keys.py)."""

import pyarrow as pa
import pytest

import trafaret_ray.contracts as t
from trafaret_ray.contracts import codes
from trafaret_ray.contracts.result import DataError, extract_error


class TestDictScalar:
    def test_basic(self):
        c = t.Dict(name=t.String(), age=t.ToInt())
        assert c.check({'name': 'x', 'age': '42'}) == {'name': 'x', 'age': 42}
        assert extract_error(c, {'name': 'x'}) == {'age': 'is required'}
        assert extract_error(c, {'name': '', 'age': 'z'}) == {
            'name': 'blank value is not allowed',
            'age': "value can't be converted to int"}

    def test_extra_policies(self):
        c = t.Dict(name=t.String())
        assert extract_error(c, {'name': 'x', 'k': 1}) == \
            {'k': 'k is not allowed key'}
        assert c.allow_extra('*').check({'name': 'x', 'k': 1}) == \
            {'name': 'x', 'k': 1}
        assert c.ignore_extra('*').check({'name': 'x', 'k': 1}) == \
            {'name': 'x'}
        assert c.allow_extra('k').check({'name': 'x', 'k': 1}) == \
            {'name': 'x', 'k': 1}

    def test_rename_and_default(self):
        c = t.Dict(t.Key('old', to_name='new', contract=t.ToInt()),
                   t.Key('d', default=7, contract=t.ToInt()))
        assert c.check({'old': '1'}) == {'new': 1, 'd': 7}
        # errors report under the ORIGINAL name (reference base.py:976-978)
        assert extract_error(c, {'old': 'x'}) == \
            {'old': "value can't be converted to int"}

    def test_optional(self):
        c = t.Dict(t.Key('a', optional=True, contract=t.ToInt()),
                   b=t.String())
        assert c.check({'b': 'x'}) == {'b': 'x'}

    def test_shadow(self):
        c = t.Dict(t.Key('a', to_name='b', contract=t.ToInt()))\
            .allow_extra('*')
        err = extract_error(c, {'a': 1, 'b': 2})
        assert err == {'b': 'b key was shadowed'}

    def test_merge(self):
        c = t.Dict(a=t.ToInt()) + t.Dict(b=t.String())
        assert c.check({'a': '1', 'b': 'x'}) == {'a': 1, 'b': 'x'}

    def test_not_a_dict(self):
        assert extract_error(t.Dict(a=t.Any()), 5) == 'value is not a dict'

    def test_dict_keys(self):
        c = t.DictKeys(['a', 'b'])
        assert c.check({'a': 1, 'b': 2}) == {'a': 1, 'b': 2}
        assert extract_error(c, {'a': 1}) == {'b': 'is required'}


class TestDictBatch:
    def contract(self):
        return t.Dict(
            conv_id=t.String(),
            turn_idx=t.Int(gte=0),
            role=t.Enum('user', 'assistant', 'system', 'tool'),
        )

    def table(self):
        return pa.table({
            'conv_id': ['a', 'b', '', 'd', 'e'],
            'turn_idx': [0, 1, 2, -1, None],
            'role': ['user', 'robot', 'user', 'assistant', 'tool'],
        })

    def test_split(self):
        v = t.BatchValidator(self.contract())
        ok, q = v.split(self.table())
        assert ok.num_rows == 1
        assert q.num_rows == 4
        import json
        errs = [json.loads(r) for r in q.column('_errors').to_pylist()]
        assert errs[0]['role']['code'] == codes.DOES_NOT_MATCH_ANY
        assert errs[1]['conv_id']['code'] == codes.EMPTY_STRING
        assert errs[2]['turn_idx']['code'] == codes.TOO_SMALL
        # null in a required column -> 'required' (FIXTURES.md A.1)
        assert errs[3]['turn_idx']['code'] == codes.REQUIRED

    def test_tag_keeps_original_on_quarantine(self):
        v = t.BatchValidator(self.contract())
        tagged = v.tag(self.table())
        assert tagged.num_rows == 5
        from trafaret_ray.contracts import drop_quarantine, only_quarantine
        assert drop_quarantine(tagged).num_rows == 1
        q = only_quarantine(tagged)
        assert q.num_rows == 4
        # original offending values preserved
        assert q.column('turn_idx').to_pylist()[2] == -1

    def test_missing_column_required(self):
        v = t.BatchValidator(self.contract())
        ok, q = v.split(pa.table({'conv_id': ['a'], 'turn_idx': [0]}))
        assert ok.num_rows == 0 and q.num_rows == 1

    def test_default_fills_nulls(self):
        c = t.Dict(t.Key('x', default=5, contract=t.ToInt()))
        v = t.BatchValidator(c)
        ok, q = v.split(pa.table({'x': [1, None, 3]}))
        assert q.num_rows == 0
        assert ok.column('x').to_pylist() == [1, 5, 3]

    def test_absent_column_with_default(self):
        c = t.Dict(t.Key('x', default=5, contract=t.ToInt()),
                   y=t.ToInt()).ignore_extra('*')
        v = t.BatchValidator(c)
        ok, q = v.split(pa.table({'y': [1, 2]}))
        assert ok.column('x').to_pylist() == [5, 5]

    def test_error_code_counts(self):
        v = t.BatchValidator(self.contract())
        counts = v.error_code_counts(self.table())
        assert counts[codes.DOES_NOT_MATCH_ANY] == 1
        assert counts[codes.REQUIRED] == 1


class TestNestedStruct:
    def test_struct_payload(self):
        inner = t.Dict(x=t.ToInt())
        outer = t.Dict(id=t.ToInt(), payload=inner)
        tbl = pa.table({
            'id': [1, 2],
            'payload': pa.array([{'x': '1'}, {'x': 'bad'}],
                                type=pa.struct([('x', pa.string())])),
        })
        ok, q = t.BatchValidator(outer).split(tbl)
        assert ok.num_rows == 1 and q.num_rows == 1
        import json
        err = json.loads(q.column('_errors').to_pylist()[0])
        assert err['payload']['nested']['x'] == \
            "value can't be converted to int"

    def test_struct_payload_nested_codes(self):
        """Bound + enum failures inside a struct payload quarantine with
        the some_elements_did_not_match wrapper and per-field messages
        (the shape q_struct_payload_events relies on)."""
        import json
        c = t.Dict(event_id=t.Int(gte=0),
                   payload=t.Dict(k=t.Int(lt=80), et=t.Enum('a', 'b')))
        pl = pa.StructArray.from_arrays(
            [pa.array([5, 99, 7], type=pa.int64()),
             pa.array(['a', 'b', 'z'])], names=['k', 'et'])
        tbl = pa.table({'event_id': pa.array([1, 2, 3], type=pa.int64()),
                        'payload': pl})
        ok, q = t.BatchValidator(c).split(tbl)
        assert ok.num_rows == 1 and q.num_rows == 2
        errs = [json.loads(e) for e in q.column('_errors').to_pylist()]
        assert errs[0]['payload']['code'] == 'some_elements_did_not_match'
        assert errs[0]['payload']['nested']['k'] == \
            'value should be less than 80'
        assert errs[1]['payload']['nested']['et'] == \
            "value doesn't match any variant"


class TestList:
    def test_batch(self):
        c = t.List(t.ToInt(), min_length=1, max_length=3)
        arr = pa.array([['1', '2'], ['3', 'x'], None, [], ['1', '2', '3', '4']],
                       type=pa.list_(pa.string()))
        res = c.apply(arr)
        assert list(res.ok) == [True, False, False, False, False]
        assert res.values.to_pylist()[0] == [1, 2]
        assert res.codes[1] == codes.SOME_ELEMENTS_DID_NOT_MATCH
        assert res.msgs[1] == {1: "value can't be converted to int"}
        assert res.codes[2] == codes.IS_NOT_A_LIST
        assert res.codes[3] == codes.TOO_SHORT
        assert res.codes[4] == codes.TOO_LONG

    def test_scalar(self):
        c = t.List(t.ToInt())
        assert c.check(['1', '2']) == [1, 2]
        assert extract_error(c, ['1', 'x']) == \
            {1: "value can't be converted to int"}
        assert extract_error(c, 1) == 'value is not a list'


class TestTuple:
    def test_scalar(self):
        c = t.Tuple(t.ToInt(), t.ToInt(), t.String())
        assert c.check([1, 2, 'x']) == (1, 2, 'x')
        assert extract_error(c, [1, 2, 3]) == {2: 'value is not a string'}
        assert extract_error(c, [1, 2]) == 'value must contain 3 items'
        assert extract_error(c, 5) == 'value must be convertable to tuple'

    def test_batch_uniform(self):
        c = t.Tuple(t.ToInt(), t.ToInt())
        arr = pa.array([['1', '2'], ['3', '4'], ['5']],
                       type=pa.list_(pa.string()))
        res = c.apply(arr)
        assert list(res.ok) == [True, True, False]
        assert res.values.to_pylist()[0] == [1, 2]
        assert res.codes[2] == codes.LOT_ELEMENTS


class TestMapping:
    def test_scalar(self):
        c = t.Mapping(t.String(), t.ToInt())
        assert c.check({'a': '1'}) == {'a': 1}
        err = extract_error(c, {'a': 'x'})
        assert 'a' in err

    def test_batch(self):
        c = t.Mapping(t.String(), t.ToInt())
        arr = pa.array([[('a', '1')], [('b', 'x')]],
                       type=pa.map_(pa.string(), pa.string()))
        res = c.apply(arr)
        assert list(res.ok) == [True, False]
        assert res.msgs[1] == {'b': {'value': "value can't be converted to int"}}


class TestCrossField:
    def test_xor_key(self):
        c = t.Dict(t.xor_key('a', 'b', t.ToInt()))
        assert c.check({'a': '5'}) == {'a': 5}
        assert c.check({'b': '9'}) == {'a': 9}
        err = extract_error(c, {'a': 1, 'b': 2})
        assert err == {'a': 'correct only if b is not defined',
                       'b': 'correct only if a is not defined'}
        err = extract_error(c, {})
        assert err == {'a': 'is required if b is not defined',
                       'b': 'is required if a is not defined'}

    def test_xor_batch(self):
        c = t.Dict(t.xor_key('a', 'b', t.ToInt()))
        tbl = pa.table({'a': ['1', None, '3', None],
                        'b': [None, '2', '4', None]})
        ok, q = t.BatchValidator(c).split(tbl)
        assert ok.num_rows == 2
        assert ok.column('a').to_pylist() == [1, 2]
        assert q.num_rows == 2

    def test_confirm_key(self):
        c = t.Dict(t.confirm_key('pwd', 'pwd2', t.String()))
        # reference collects BOTH keys on success (keys.py:146-176)
        assert c.check({'pwd': 'x', 'pwd2': 'x'}) == {'pwd': 'x', 'pwd2': 'x'}
        assert extract_error(c, {'pwd': 'x', 'pwd2': 'y'}) == \
            {'pwd2': 'must be equal to pwd'}
        assert extract_error(c, {'pwd': 'x'}) == {'pwd2': 'is required'}

    def test_confirm_batch(self):
        c = t.Dict(t.confirm_key('pwd', 'pwd2', t.String()))
        tbl = pa.table({'pwd': ['x', 'a'], 'pwd2': ['x', 'b']})
        ok, q = t.BatchValidator(c).split(tbl)
        assert ok.num_rows == 1 and q.num_rows == 1

    def test_subdict(self):
        def pwcheck(data):
            if data['p1'] != data['p2']:
                return DataError('Passwords are not equal')
            return data['p1']
        c = t.Dict(t.subdict('pw', t.Key('p1'), t.Key('p2'),
                             contract=pwcheck))
        assert c.check({'p1': 'a', 'p2': 'a'}) == {'pw': 'a'}
        assert extract_error(c, {'p1': 'a', 'p2': 'b'}) == \
            {'pw': 'Passwords are not equal'}

    def test_subdict_vectorized(self):
        import pyarrow.compute as pc
        import numpy as np
        from trafaret_ray.contracts.result import CheckResult

        def tool_iff_tool_role(cols):
            # north-rule invariant: tool non-null iff role == 'tool'
            role = cols['role']
            tool = cols['tool']
            is_tool_role = pc.equal(role, 'tool')
            has_tool = pc.is_valid(tool)
            ok_arr = pc.equal(is_tool_role, has_tool)
            ok = np.asarray(ok_arr.to_numpy(zero_copy_only=False), dtype=bool)
            return CheckResult.from_mask(tool, ok, 'tool_role_mismatch',
                                         "tool must be set iff role == 'tool'")
        c = t.Dict(
            t.subdict('tool', t.Key('role'),
                      t.Key('tool', optional=True,
                            contract=t.Null() | t.String()),
                      contract=tool_iff_tool_role, vectorized=True),
        )
        tbl = pa.table({'role': ['user', 'tool', 'user', 'tool'],
                        'tool': [None, 'search', 'oops', None]})
        cres = c.apply_columns(
            {n: tbl.column(n).combine_chunks() for n in tbl.column_names}, 4)
        assert list(cres.ok) == [True, True, False, False]

    def test_keyssubset(self):
        def cmp_pwds(d):
            return {'pwd': d['pwd'] if d.get('pwd') == d.get('pwd1')
                    else DataError('Not equal')}
        c = t.Dict({t.KeysSubset('pwd', 'pwd1'): cmp_pwds, 'key1': t.String()})
        assert sorted(c.check({'pwd': 'a', 'pwd1': 'a', 'key1': 'b'})) == \
            ['key1', 'pwd']
        assert extract_error(c, {'pwd': 'a', 'pwd1': 'c', 'key1': 'b'}) == \
            {'pwd': 'Not equal'}
