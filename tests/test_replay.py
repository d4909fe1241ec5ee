"""literal_struct_array (functions/replay.py): literal formatting guards.

The replay utility embeds a bounded collected artifact as SQL literal text;
a malformed literal would surface as an opaque engine-side parse error far
from the caller. These tests pin the caller-side guards (non-finite floats,
NULLs, booleans named by field) and the string-escaping round-trip.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from map_reduce_ruby_spark.functions.replay import _fmt, literal_struct_array


def test_fmt_rejects_nan_and_inf_naming_the_field():
    for bad in (math.nan, math.inf, -math.inf):
        with pytest.raises(ValueError, match="'score'"):
            _fmt(bad, "score")


def test_fmt_rejects_null_and_bool_naming_the_field():
    with pytest.raises(ValueError, match="'tag'"):
        _fmt(None, "tag")
    with pytest.raises(TypeError, match="'flag'"):
        _fmt(True, "flag")


def test_fmt_rejects_nonfinite_inside_arrays():
    with pytest.raises(ValueError, match="'vec'"):
        _fmt([1.0, math.nan], "vec")


def test_string_literals_roundtrip_with_escapes(spark):
    rows = [
        Row(id=1, s="plain"),
        Row(id=2, s="it's quoted"),
        Row(id=3, s="back\\slash and 'both'"),
    ]
    col = literal_struct_array(rows)
    out = (
        spark.range(1)
        .select(F.explode(col).alias("r"))
        .select("r.id", "r.s")
        .collect()
    )
    assert sorted((r.id, r.s) for r in out) == [(r.id, r.s) for r in rows]


def test_numeric_roundtrip_bit_exact(spark):
    rows = [Row(id=7, x=0.1 + 0.2, v=[1.5, -2.25e-300])]
    col = literal_struct_array(rows)
    r = spark.range(1).select(F.explode(col).alias("r")).select("r.*").collect()[0]
    assert r.id == 7
    assert r.x == 0.1 + 0.2
    assert list(r.v) == [1.5, -2.25e-300]
