"""Property tests: the DSIR importance-weight / Gumbel-selection pipeline
and the hashed-ngram Naive Bayes classifier against pure-Python models on
randomized corpora — fidelity evidence beyond the fixture oracle gates."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_ruby_spark.plans.dsir_queries import (
    _BUCKETS,
    _TARGET_LANG,
    dsir_weights_for,
    gram_buckets_for,
    nb_scores_for,
)

_WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
_LANGS = ["en", "de", "fr"]

_corpus = st.lists(
    st.tuples(
        st.sampled_from(_LANGS),
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
    ),
    min_size=1,
    max_size=16,
)


def _h32_py(s: str, seed=None) -> int:
    x = f"{seed}:{s}" if seed is not None else s
    return int(hashlib.md5(x.encode()).hexdigest()[:8], 16)


def _milli(x: float) -> int:
    # Spark ROUND = BigDecimal HALF_UP over the double's shortest repr;
    # Python round() is half-even (same convention as the KN model tests).
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def _model_db(rows):
    """{(doc_id, lang, bucket): cnt} of hashed unigrams+bigrams."""
    db = Counter()
    for doc_id, lang, toks in rows:
        grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            db[(doc_id, lang, _h32_py(g) % _BUCKETS)] += 1
    return db


def _model_weights(rows):
    db = _model_db(rows)
    ct, cr = Counter(), Counter()
    n_t = n_r = 0
    for (_, lang, b), c in db.items():
        cr[b] += c
        n_r += c
        if lang == _TARGET_LANG:
            ct[b] += c
            n_t += c
    lam = {
        b: _milli(
            (
                math.log((ct[b] + 1.0) / (n_t + _BUCKETS))
                - math.log((cr[b] + 1.0) / (n_r + _BUCKETS))
            )
            * 1000
        )
        for b in cr
    }
    w, ng = defaultdict(int), Counter()
    for (doc_id, _, b), c in db.items():
        w[doc_id] += c * lam[b]
        ng[doc_id] += c
    return dict(w), dict(ng)


def _model_nb(rows):
    """{doc_id: (pred, best_milli)} — exact-int argmax, ties to last cls."""
    db = _model_db(rows)
    cb, n_c = Counter(), Counter()
    docs_per_cls = Counter()
    seen_docs = set()
    for (doc_id, lang, b), c in db.items():
        cb[(lang, b)] += c
        n_c[lang] += c
        if (doc_id, lang) not in seen_docs:
            seen_docs.add((doc_id, lang))
            docs_per_cls[lang] += 1
    nd = sum(docs_per_cls.values())
    classes = sorted(n_c)
    prior = {c: _milli(math.log(docs_per_cls[c] / nd) * 1000) for c in classes}
    llm = {
        (c, b): _milli(
            math.log((cb[(c, b)] + 1.0) / (n_c[c] + _BUCKETS)) * 1000
        )
        for c in classes
        for b in {b for (_, _, b) in db}
    }
    scores = defaultdict(int)
    for (doc_id, _, b), cnt in db.items():
        for c in classes:
            scores[(doc_id, c)] += cnt * llm[(c, b)]
    out = {}
    for doc_id in {d for (d, _, _) in db}:
        best = max(
            (scores[(doc_id, c)] + prior[c], c) for c in classes
        )  # ties -> lexicographically last class, same as max(struct)
        out[doc_id] = (best[1], best[0])
    return out


def _docs_frame(spark, rows):
    return spark.createDataFrame(
        [(doc_id, lang, " ".join(toks)) for doc_id, lang, toks in rows],
        "doc_id long, lang string, text string",
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_corpus)
def test_dsir_weights_match_python_model(spark, corpus):
    rows = [(i, lang, toks) for i, (lang, toks) in enumerate(corpus)]
    got = {
        r.doc_id: (r.weight_milli, r.n_grams)
        for r in dsir_weights_for(
            gram_buckets_for(_docs_frame(spark, rows))
        ).collect()
    }
    w, ng = _model_weights(rows)
    assert got == {d: (w[d], ng[d]) for d in w}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=_corpus)
def test_nb_argmax_matches_python_model(spark, corpus):
    rows = [(i, lang, toks) for i, (lang, toks) in enumerate(corpus)]
    got = {
        r.doc_id: (r.pred, r.best_milli)
        for r in nb_scores_for(
            gram_buckets_for(_docs_frame(spark, rows))
        ).collect()
    }
    assert got == _model_nb(rows)


def test_dsir_select_is_gumbel_topk_of_weights(spark, sf_dir):
    """The selection entry returns exactly the top ceil(n/5) documents by
    Gumbel-perturbed weight (ties by doc_id), reproduced from the weights
    entry plus a Python Gumbel draw from the same h32 stream."""
    from map_reduce_ruby_spark.plans import all_entries

    e = all_entries()
    weights = {
        r.doc_id: r.weight_milli
        for r in e["corpus_dsir_weights"].fn(spark, sf_dir).collect()
    }
    skeys = {}
    for doc_id, wm in weights.items():
        u = (_h32_py(str(doc_id), seed="dsir") + 0.5) / 4294967296.0
        skeys[doc_id] = wm + _milli(-math.log(-math.log(u)) * 1000)
    k = (len(weights) + 4) // 5
    expect = set(
        sorted(skeys, key=lambda d: (-skeys[d], d))[:k]
    )
    got = e["corpus_dsir_select"].fn(spark, sf_dir).collect()
    assert {r.doc_id for r in got} == expect
    assert all(r.skey_milli == skeys[r.doc_id] for r in got)


def test_nb_langid_beats_chance_on_fixture(spark, sf_dir):
    """Self-trained NB on the fixture's lang labels must beat the majority
    -class rate — the classifier has to actually extract signal from the
    hashed features, not just echo priors."""
    from map_reduce_ruby_spark.plans import all_entries

    rows = all_entries()["text_nb_langid"].fn(spark, sf_dir).collect()
    acc = sum(r.ok for r in rows) / len(rows)
    majority = max(Counter(r.lang for r in rows).values()) / len(rows)
    assert acc > majority, (acc, majority)
