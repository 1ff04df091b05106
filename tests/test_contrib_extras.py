"""Iterable scalar semantics (reference base.py:788-873) and the
MongoId contrib scalar (reference contrib/object_id.py:8-43)."""

import pyarrow as pa
import pytest

import trafaret_ray.contracts as t
from trafaret_ray.contracts import extract_error
from trafaret_ray.contracts.contrib.object_id import (
    InvalidId, MongoId, ObjectId)


class TestIterableScalar:
    def test_accepts_tuple_and_set(self):
        assert t.Iterable(t.Int()).check((1, 2, 3)) == [1, 2, 3]
        assert sorted(t.Iterable(t.Int()).check({4, 5})) == [4, 5]

    def test_accepts_string_iterates_chars(self):
        assert t.Iterable(t.String()).check('ab') == ['a', 'b']

    def test_rejects_non_iterable(self):
        assert extract_error(t.Iterable(t.Int()), 1) == 'value is not iterable'

    def test_list_still_rejects_tuple(self):
        assert extract_error(t.List(t.Int()), (1, 2)) == 'value is not a list'

    def test_length_bounds(self):
        assert extract_error(t.Iterable(t.Int(), min_length=3), (1, 2)) \
            == 'list length is less than 3'
        assert extract_error(t.Iterable(t.Int(), max_length=1), (1, 2)) \
            == 'list length is greater than 1'

    def test_element_errors_keyed_by_index(self):
        assert extract_error(t.Iterable(t.Int()), (1, 'x')) \
            == {1: "value can't be converted to int"}

    def test_batch_path_same_as_list(self):
        arr = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
        res = t.Iterable(t.Int()).apply(arr)
        assert res.ok.all()


class TestObjectId:
    def test_parse_hex(self):
        o = ObjectId('5583f69d690b2d70a4afdfae')
        assert str(o) == '5583f69d690b2d70a4afdfae'
        assert repr(o) == "ObjectId('5583f69d690b2d70a4afdfae')"

    def test_parse_bytes_roundtrip(self):
        o = ObjectId(b'\x00' * 12)
        assert ObjectId(str(o)) == o

    def test_generate_unique(self):
        assert ObjectId() != ObjectId()

    def test_invalid(self):
        with pytest.raises(InvalidId):
            ObjectId('just_id')


class TestMongoId:
    def test_repr(self):
        assert repr(MongoId()) == '<MongoId>'
        assert repr(MongoId(allow_blank=True)) == '<MongoId(blank)>'

    def test_check_returns_objectid(self):
        assert MongoId().check('5583f69d690b2d70a4afdfae') \
            == ObjectId('5583f69d690b2d70a4afdfae')

    def test_blank_rejected_then_generated(self):
        assert extract_error(MongoId(), None) == 'blank value is not allowed'
        assert isinstance(MongoId(allow_blank=True).check(None), ObjectId)

    def test_invalid_message_matches_reference(self):
        assert extract_error(MongoId(), 'just_id') \
            == ("'just_id' is not a valid ObjectId, it must be a 12-byte"
                " input or a 24-character hex string")

    def test_not_convertable_type(self):
        assert extract_error(MongoId(), 12.5) == 'value is not ObjectId'

    def test_batch_path(self):
        arr = pa.array(['5583F69D690B2D70A4AFDFAE', 'nope', None])
        res = MongoId().apply(arr)
        assert list(res.ok) == [True, False, False]
        # normalized to lowercase hex
        assert res.values[0].as_py() == '5583f69d690b2d70a4afdfae'

    def test_batch_allow_blank_generates(self):
        arr = pa.array(['5583f69d690b2d70a4afdfae', None])
        res = MongoId(allow_blank=True).apply(arr)
        assert list(res.ok) == [True, True]
        assert len(res.values[1].as_py()) == 24
