"""Async mirrors (reference async_mixins.py:10-181, tests3k/test_async.py
re-expressed): every composite awaits children so coroutine UDFs compose.
Run via asyncio.run (no pytest-asyncio dependency)."""

import asyncio

import pytest

import trafaret_ray.contracts as t


def run(coro):
    return asyncio.run(coro)


async def check_int(value):
    return value


async def check_int_context(value, context=None):
    if context is not None and value > context:
        return t.DataError('too big', code='too_big')
    return value


class TestAsyncCombinators:
    def test_async_check(self):
        trafaret = t.ToInt() & int
        assert run(trafaret.async_check('5')) == 5

    def test_async_and(self):
        trafaret = t.ToInt() & check_int_context
        run(trafaret.async_check(3))
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check('blablabla'))
        assert res.value.as_dict() == "value can't be converted to int"
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check(10, context=5))
        assert res.value.as_dict() == 'too big'

    def test_async_or(self):
        trafaret = t.ToInt() | t.Null()
        assert run(trafaret.async_check(None)) is None
        assert run(trafaret.async_check('5')) == 5
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check('blablabla'))
        assert res.value.as_dict() == {
            0: "value can't be converted to int",
            1: 'value should be None',
        }

    def test_async_call(self):
        trafaret = t.ToInt() & int & check_int
        assert run(trafaret.async_check('5')) == 5


class TestAsyncDict:
    def test_dict(self):
        trafaret = t.Dict({t.Key('b'): t.ToInt() & check_int})
        assert run(trafaret.async_check({'b': '5'})) == {'b': 5}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'b': 'qwe'}))
        assert res.value.as_dict() == {'b': "value can't be converted to int"}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check(None))
        assert res.value.as_dict() == 'value is not a dict'
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({}))
        assert res.value.as_dict() == {'b': 'is required'}

    def test_sync_key(self):
        def simple_key(value):
            yield 'simple', 'simple data', []

        trafaret = t.Dict(simple_key)
        assert run(trafaret.async_check({})) == {'simple': 'simple data'}

        def bad_key(value):
            yield 'simple', t.DataError('bad key here',
                                        code='bad_key_here'), []

        trafaret = t.Dict(bad_key)
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({}))
        assert res.value.as_dict() == {'simple': 'bad key here'}

    def test_async_generator_key(self):
        async def akey(value):
            yield 'a', await check_int(value.get('a', 0)), ['a']

        trafaret = t.Dict(akey)
        assert run(trafaret.async_check({'a': 7})) == {'a': 7}

    def test_dict_extra_and_ignore(self):
        trafaret = t.Dict(
            t.Key('a', to_name='A', trafaret=t.String()),
            allow_extra=['one_extra'],
            allow_extra_trafaret=t.String(),
            ignore_extra=['one_ignore'],
        )
        res = run(trafaret.async_check(
            {'a': 's', 'one_extra': 's', 'one_ignore': 's'}))
        assert res == {'A': 's', 'one_extra': 's'}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'a': 's', 'bad_extra': 's'}))
        assert res.value.as_dict() == {
            'bad_extra': 'bad_extra is not allowed key'}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'a': 's', 'A': 's'}))
        assert res.value.as_dict() == {'A': 'A key was shadowed'}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'a': 's', 'one_extra': 5}))
        assert res.value.as_dict() == {'one_extra': 'value is not a string'}
        trafaret = trafaret.allow_extra('*')
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'a': 's', 'A': 's'}))
        assert res.value.as_dict() == {'A': 'A key was shadowed'}

    def test_key_with_callable_default(self):
        trafaret = t.Dict(t.Key('a', default=lambda: 123,
                                trafaret=t.ToInt()))
        assert run(trafaret.async_check({})) == {'a': 123}


class TestAsyncContainers:
    def test_list(self):
        trafaret = t.List(t.ToInt() & check_int)
        assert run(trafaret.async_check(['5'])) == [5]
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check(['5qwe']))
        assert res.value.as_dict() == {0: "value can't be converted to int"}

    def test_iterable(self):
        trafaret = t.Iterable(t.ToInt() & check_int)
        assert run(trafaret.async_check(('5', '6'))) == [5, 6]

    def test_tuple(self):
        trafaret = t.Tuple(t.Null(), t.ToInt() & check_int)
        assert run(trafaret.async_check([None, '5'])) == (None, 5)
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check((None, '5qwe')))
        assert res.value.as_dict() == {1: "value can't be converted to int"}

    def test_mapping(self):
        trafaret = t.Mapping(t.String(), t.ToInt() & check_int)
        assert run(trafaret.async_check({'a': '5'})) == {'a': 5}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({None: '5'}))
        assert res.value.as_dict() == {
            None: {'key': 'value is not a string'}}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check({'b': 'qwe'}))
        assert res.value.as_dict() == {
            'b': {'value': "value can't be converted to int"}}
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check(None))
        assert res.value.as_dict() == 'value is not a dict'

    def test_forward(self):
        trafaret = t.Forward()
        trafaret << t.List(t.ToInt() & check_int)
        assert run(trafaret.async_check(['5'])) == [5]

    def test_not_set_forward(self):
        trafaret = t.Forward()
        with pytest.raises(t.DataError) as res:
            run(trafaret.async_check(None))
        assert res.value.as_dict() == 'trafaret not set yet'
