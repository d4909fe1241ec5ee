"""Key semantics: canonical JSON + Ruby <=> ordering.

Ports the behaviors pinned by the reference's specs
(spec/map_reduce/priority_queue_spec.rb, reducer_spec.rb:15-35,
mapper_spec.rb:47-87 numeric composite-key ordering) onto our SortKey.
"""

import pytest

from map_reduce_ruby_spark.core import (
    IncomparableKeyError,
    SortKey,
    canonical_json,
    ruby_cmp,
)


class TestCanonicalJson:
    # Ruby JSON.generate parity: no spaces, insertion order, unicode raw.
    def test_string(self):
        assert canonical_json("key1") == '"key1"'

    def test_int(self):
        assert canonical_json(1) == "1"

    def test_float_integral(self):
        # Ruby: JSON.generate(1.0) == "1.0" — distinct from the int.
        assert canonical_json(1.0) == "1.0"

    def test_array_no_spaces(self):
        assert canonical_json(["foo", 1.0]) == '["foo",1.0]'

    def test_nested(self):
        assert canonical_json(["foo", ["bar", 2]]) == '["foo",["bar",2]]'

    def test_unicode_not_escaped(self):
        assert canonical_json("héllo") == '"héllo"'


class TestRubyCmp:
    def test_numeric_not_lexical(self):
        # v2.0.0 behavior: 2 < 11 numerically (reference CHANGELOG.md:32-36).
        assert ruby_cmp(2, 11) == -1

    def test_int_float_mixed_ok(self):
        assert ruby_cmp(1, 1.5) == -1
        assert ruby_cmp(2.0, 2) == 0

    def test_strings(self):
        assert ruby_cmp("a", "b") == -1

    def test_array_elementwise(self):
        # ["key3", 2] < ["key3", 11] (reference mapper_spec.rb:47-87).
        assert ruby_cmp(["key3", 2], ["key3", 11]) == -1

    def test_array_prefix_shorter_first(self):
        assert ruby_cmp(["a"], ["a", 1]) == -1

    def test_string_vs_number_raises(self):
        with pytest.raises(IncomparableKeyError):
            ruby_cmp("a", 1)

    def test_dict_key_raises(self):
        # Hash keys raise ArgumentError in the reference
        # (spec/map_reduce/reducer_spec.rb:15-35).
        with pytest.raises(IncomparableKeyError):
            ruby_cmp({"value": 1}, {"value": 2})

    def test_none_raises(self):
        with pytest.raises(IncomparableKeyError):
            ruby_cmp(None, 1)

    def test_bool_raises(self):
        with pytest.raises(IncomparableKeyError):
            ruby_cmp(True, False)


class TestSortKey:
    def test_sorting(self):
        keys = [SortKey(["key3", 11]), SortKey(["key3", 2]), SortKey(["key1", 5])]
        assert [sk.key for sk in sorted(keys)] == [
            ["key1", 5],
            ["key3", 2],
            ["key3", 11],
        ]

    def test_eq_hash_int_float(self):
        # Ruby 1 == 1.0; grouping must agree.
        assert SortKey(1) == SortKey(1.0)
        assert hash(SortKey(1)) == hash(SortKey(1.0))

    def test_eq_arrays(self):
        assert SortKey(["a", 1]) == SortKey(["a", 1.0])
        assert hash(SortKey(["a", 1])) == hash(SortKey(["a", 1.0]))

    def test_incomparable_raises_on_lt_only(self):
        a, b = SortKey("x"), SortKey(1)
        assert (a == b) is False  # equality is total
        with pytest.raises(IncomparableKeyError):
            _ = a < b  # ordering raises, like the reference's merge

    def test_sorted_raises_mixed(self):
        with pytest.raises(IncomparableKeyError):
            sorted([SortKey({"v": 1}), SortKey({"v": 2})])
