"""SHA1-of-JSON partition placement, bit-identical to the reference.

Conformance values come from the reference's own specs:
- first-5-hex-chars math: spec/map_reduce/hash_partitioner_spec.rb
  ("fffff".to_i(16) % 4 == 3, % 8 == 7)
- end-to-end placement: spec/map_reduce/mapper_spec.rb shuffle spec
  (HashPartitioner(4): ["key1"]->3, ["key2"]->2, ["key3"]->0,
   ["key4"]->2, ["key5"]->3)
"""

import hashlib

import pytest

from map_reduce_ruby_spark.core import HashPartitioner, Md5Partitioner


class TestHashPartitioner:
    def test_reference_end_to_end_placement(self):
        p = HashPartitioner(4)
        assert p(["key1"]) == 3
        assert p(["key2"]) == 2
        assert p(["key3"]) == 0
        assert p(["key4"]) == 2
        assert p(["key5"]) == 3

    def test_first_five_hex_math(self):
        # The placement formula is int(sha1_hex[:5], 16) % n.
        key = "key"
        digest = hashlib.sha1(b'"key"').hexdigest()
        assert HashPartitioner(4)(key) == int(digest[:5], 16) % 4
        assert HashPartitioner(8)(key) == int(digest[:5], 16) % 8

    def test_hashes_canonical_json_of_key(self):
        # Ruby hashes JSON.generate(key): strings are quoted, arrays compact.
        assert HashPartitioner(1000)("a") != HashPartitioner(1000)(["a"])

    def test_invalid_partitions(self):
        with pytest.raises(ValueError):
            HashPartitioner(0)


class TestMd5Partitioner:
    def test_matches_duckdb_expression(self):
        # Oracle-side: ('0x' || substr(md5(j), 1, 8))::UBIGINT % n
        import duckdb

        p = Md5Partitioner(7)
        for key in ["key1", ["a", 2], 15, 2.5]:
            from map_reduce_ruby_spark.core import canonical_json

            j = canonical_json(key)
            (expected,) = duckdb.sql(
                f"select ('0x' || substr(md5('{j}'), 1, 8))::UBIGINT % 7"
            ).fetchone()
            assert p(key) == expected
