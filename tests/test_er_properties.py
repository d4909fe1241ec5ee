"""Property tests: sorted-neighborhood candidates against a pure-Python
model on randomized inputs, and the Kneser-Ney estimator against a
from-scratch Python implementation on random corpora — fidelity evidence
beyond the fixture gates."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["ant", "bee", "cat", "dog", "elk", "fox"]


# --- SNM vs a brute-force model ----------------------------------------------

_recs = st.lists(
    st.tuples(st.sampled_from(_WORDS), st.sampled_from(_WORDS)),
    min_size=2,
    max_size=24,
)


def _snm_model(rows, keys_idx, w, cross_side_only):
    """Pure-Python multi-pass SNM: sort by (key, rec_id), pair each record
    with its next w neighbors, union passes, filter/canonicalize."""
    pairs = set()
    for ki in keys_idx:
        order = sorted(range(len(rows)), key=lambda i: (rows[i][ki], i))
        for pos, i in enumerate(order):
            for j in order[pos + 1 : pos + 1 + w]:
                a, b = i, j
                sa, sb = a % 2, b % 2
                if cross_side_only:
                    if sa == sb:
                        continue
                    pairs.add((a, b) if sa == 0 else (b, a))
                else:
                    pairs.add((min(a, b), max(a, b)))
    return pairs


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_recs, w=st.integers(min_value=1, max_value=5),
       cross=st.booleans())
def test_snm_candidates_match_brute_force_model(spark, rows, w, cross):
    from map_reduce_ruby_spark.operators.er import (
        sorted_neighborhood_candidates,
    )

    recs = spark.createDataFrame(
        [(i, i % 2, k1, k2) for i, (k1, k2) in enumerate(rows)],
        "rec_id long, side long, k1 string, k2 string",
    )
    got = {
        (r.a_id, r.b_id)
        for r in sorted_neighborhood_candidates(
            recs, ["k1", "k2"], w, cross_side_only=cross
        ).collect()
    }
    want = _snm_model(rows, (0, 1), w, cross)
    assert got == want


# --- Kneser-Ney vs a from-scratch Python implementation ----------------------


def _kn_model(texts, d=0.75):
    """Interpolated KN exactly as the entry defines it: all counts from
    trigram types; returns {(w1,w2,w3): (c3, p)} over every trigram."""
    tri = Counter()
    for t in texts:
        tok = t.split()
        for i in range(len(tok) - 2):
            tri[(tok[i], tok[i + 1], tok[i + 2])] += 1
    if not tri:
        return {}
    ctx, cont = defaultdict(lambda: [0, 0]), Counter()
    for (w1, w2, w3), c in tri.items():
        ctx[(w1, w2)][0] += c
        ctx[(w1, w2)][1] += 1
        cont[(w2, w3)] += 1
    mid, uni = defaultdict(lambda: [0, 0]), Counter()
    for (w2, w3), n1b in cont.items():
        mid[w2][0] += n1b
        mid[w2][1] += 1
        uni[w3] += 1
    t_total = len(cont)
    out = {}
    for (w1, w2, w3), c3 in tri.items():
        c2, t3 = ctx[(w1, w2)]
        n1b = cont[(w2, w3)]
        nmid, t2 = mid[w2]
        p_uni = uni[w3] / t_total
        p_bi = max(n1b - d, 0.0) / nmid + (d * t2 / nmid) * p_uni
        p = max(c3 - d, 0.0) / c2 + (d * t3 / c2) * p_bi
        # Spark's ROUND is BigDecimal HALF_UP over the double's shortest
        # repr; Python's round() is half-EVEN and diverges on exact .5
        # grid points (hypothesis found p = 0.7890625 exactly)
        p6 = float(
            Decimal(repr(p)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        out[(w1, w2, w3)] = (c3, p6, p)
    return out


def _kn_perplexity_model(texts, d=0.75, head=-3.05, mid=-3.35):
    """Per-doc mean KN trigram logprob + band, exactly as the filter entry
    defines it: ln of the UNROUNDED type probability per occurrence,
    snapped to the 1e3 int grid (Spark ROUND = HALF_UP over the double's
    shortest repr), summed, divided, rounded to 6dp."""
    import math

    model = _kn_model(texts, d)
    out = {}
    for doc_id, t in enumerate(texts):
        tok = t.split()
        snapped, n = 0, 0
        for i in range(len(tok) - 2):
            p = model[(tok[i], tok[i + 1], tok[i + 2])][2]
            lp = math.log(p)
            snapped += int(
                Decimal(repr(lp * 1000)).quantize(Decimal("1"), ROUND_HALF_UP)
            )
            n += 1
        if n == 0:
            continue  # no trigrams -> doc drops out, like the entry
        avg = float(
            Decimal(repr(snapped / 1000.0 / n)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        band = "head" if avg >= head else ("middle" if avg >= mid else "tail")
        out[doc_id] = (n, avg, band)
    return out


_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_kneser_ney_matches_python_model(spark, tmp_path_factory, texts):
    from map_reduce_ruby_spark.plans import all_entries

    d = tmp_path_factory.mktemp("kn_prop")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("s").alias("source"), F.length("text").alias("n_chars"),
    )
    docs.write.parquet(str(d / "documents.parquet"))
    got = {
        (r.w1, r.w2, r.w3): (r.c3, r.p_kn)
        for r in all_entries()["text_kneser_ney_trigram"].fn(spark, str(d)).collect()
    }
    model = {k: v[:2] for k, v in _kn_model(texts).items()}
    top = sorted(model.items(), key=lambda kv: (-kv[1][0], kv[0]))[:50]
    assert got == dict(top)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_kn_perplexity_filter_matches_python_model(
    spark, tmp_path_factory, texts
):
    from map_reduce_ruby_spark.plans import all_entries

    d = tmp_path_factory.mktemp("knp_prop")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("s").alias("source"), F.length("text").alias("n_chars"),
    )
    docs.write.parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: (r.n_trigrams, r.avg_lp, r.band)
        for r in all_entries()["text_kn_perplexity_filter"].fn(spark, str(d)).collect()
    }
    assert got == _kn_perplexity_model(texts)


# --- unicode keys under the DEFAULT bucket ------------------------------------

# Mixed-script words: ASCII, Latin-1 accents, Greek, CJK, and an emoji —
# first UTF-8 bytes span 0x41..0xF0, which the old ascii(substring(k,1,1))
# codepoint bucket handled only as long as codepoint order matched; the
# byte-prefix default must rank them exactly like Spark's UTF-8 string
# order (== Python's codepoint sort order, since UTF-8 is order-preserving).
_UNI_WORDS = ["ant", "Zebra", "ábaco", "Ωmega", "中文", "日本語", "🦀crab", "ému", ""]

_uni_recs = st.lists(
    st.tuples(st.sampled_from(_UNI_WORDS), st.sampled_from(_UNI_WORDS)),
    min_size=2,
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_uni_recs, w=st.integers(min_value=1, max_value=4),
       cross=st.booleans())
def test_snm_unicode_keys_default_bucket(spark, rows, w, cross):
    """The default bucket (first UTF-8 byte) is an optimization detail, not
    a correctness obligation: non-ASCII and empty keys need no bucket_fn."""
    from map_reduce_ruby_spark.operators.er import (
        sorted_neighborhood_candidates,
    )

    recs = spark.createDataFrame(
        [(i, i % 2, k1, k2) for i, (k1, k2) in enumerate(rows)],
        "rec_id long, side long, k1 string, k2 string",
    )
    got = {
        (r.a_id, r.b_id)
        for r in sorted_neighborhood_candidates(
            recs, ["k1", "k2"], w, cross_side_only=cross
        ).collect()
    }
    want = _snm_model(rows, (0, 1), w, cross)
    assert got == want


def test_snm_empty_inputs_and_bad_args(spark):
    """Standalone-operator guards: keys=[] and window<1 raise clearly; an
    EMPTY records frame flows through (the prefix scan short-circuits its
    zero-bucket case) and yields zero candidates."""
    import pytest

    from map_reduce_ruby_spark.operators.er import (
        sorted_neighborhood_candidates,
    )

    recs = spark.createDataFrame(
        [], "rec_id long, side long, k1 string, k2 string"
    )
    with pytest.raises(ValueError, match="blocking key"):
        sorted_neighborhood_candidates(recs, [], 3)
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_candidates(recs, ["k1"], 0)
    out = sorted_neighborhood_candidates(recs, ["k1", "k2"], 3)
    assert out.columns == ["a_id", "b_id"]
    assert out.count() == 0
