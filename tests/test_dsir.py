"""DSIR importance resampling (operators/dsir.py): discrimination on a
planted two-domain corpus, exact hand-computed log-weights at tiny
bucket counts, deterministic selection, Gumbel reproducibility, and
edge cases (empty docs, unseen buckets)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.dsir import (
    bucket_logratios,
    dsir_logweights,
    dsir_select,
    hashed_ngram_counts,
)

CAT = [
    "cat purrs softly",
    "the cat naps",
    "cat chases cat",
    "a soft cat purrs",
]
DOG = [
    "dog barks loudly",
    "the dog runs",
    "dog chases dog",
    "a loud dog barks",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(CAT + DOG)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CAT)], "doc_id bigint, text string"
    )


def test_counts_bounded_and_total(spark, corpus):
    c = hashed_ngram_counts(corpus, "text", num_buckets=8)
    rows = c.collect()
    assert all(0 <= r.bucket < 8 for r in rows)
    # grams per doc: 3 unigrams + 2 bigrams (all docs are 3-4 tokens)
    n_tokens = sum(len(t.split()) for t in CAT + DOG)
    expect = sum(2 * len(t.split()) - 1 for t in CAT + DOG)
    assert sum(r.cnt for r in rows) == expect and n_tokens > 0


def test_logweights_match_hand_computation(spark, corpus, target):
    """Exact recompute in python: same grams, same poly-hash buckets,
    same smoothed ratios — logw must agree to float precision."""
    B, s = 16, 0.5
    tc = hashed_ngram_counts(target, "text", B)
    rc = hashed_ngram_counts(corpus, "text", B)
    got = {
        r.doc_id: (r.logw, r.n_grams)
        for r in dsir_logweights(
            corpus, "doc_id", "text", tc, rc, B, s
        ).collect()
    }

    def grams(t):
        toks = t.lower().split()
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        acc = 0
        for ch in g:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc % B

    def counts(docs):
        out: dict[int, int] = {}
        for t in docs:
            for g in grams(t):
                out[bucket(g)] = out.get(bucket(g), 0) + 1
        return out

    ct, cr = counts(CAT), counts(CAT + DOG)
    nt, nr = sum(ct.values()), sum(cr.values())
    for i, t in enumerate(CAT + DOG):
        lw = sum(
            math.log((ct.get(bucket(g), 0) + s) / (nt + s * B))
            - math.log((cr.get(bucket(g), 0) + s) / (nr + s * B))
            for g in grams(t)
        )
        assert got[i][1] == len(grams(t))
        assert abs(got[i][0] - lw) < 1e-9, f"doc {i}: {got[i][0]} vs {lw}"


def test_select_discriminates_and_is_deterministic(spark, corpus, target):
    kept = dsir_select(
        corpus, "doc_id", "text", target, k=4, num_buckets=256
    )
    ids = [r.doc_id for r in kept.collect()]
    assert sorted(ids) == [0, 1, 2, 3]  # exactly the cat docs
    again = [r.doc_id for r in dsir_select(
        corpus, "doc_id", "text", target, k=4, num_buckets=256
    ).collect()]
    assert ids == again
    # gumbel: reproducible per seed, k rows, weight still dominates
    # noise enough that the target domain is favoured on average
    g1 = [r.doc_id for r in dsir_select(
        corpus, "doc_id", "text", target, k=4, num_buckets=256,
        gumbel_seed=7,
    ).collect()]
    g2 = [r.doc_id for r in dsir_select(
        corpus, "doc_id", "text", target, k=4, num_buckets=256,
        gumbel_seed=7,
    ).collect()]
    assert g1 == g2 and len(g1) == 4


def test_empty_docs_never_selected(spark, target):
    df = target.sparkSession.createDataFrame(
        [(0, "cat purrs softly"), (1, ""), (2, "   ")],
        "doc_id bigint, text string",
    )
    tc = hashed_ngram_counts(target, "text", 64)
    rc = hashed_ngram_counts(df, "text", 64)
    w = {r.doc_id: r.logw for r in dsir_logweights(
        df, "doc_id", "text", tc, rc, 64
    ).collect()}
    assert w[1] is None and w[2] is None and w[0] is not None
    kept = dsir_select(df, "doc_id", "text", target, k=3, num_buckets=64)
    assert [r.doc_id for r in kept.collect()] == [0]


def test_bucket_logratios_guard_and_unseen(spark, corpus, target):
    with pytest.raises(ValueError, match="num_buckets"):
        hashed_ngram_counts(corpus, "text", 1)
    # a scored doc whose grams hit buckets neither corpus saw gets the
    # finite smoothing-only ratio, not a drop
    B = 1 << 20  # huge bucket space -> novel grams land in empty buckets
    tc = hashed_ngram_counts(target, "text", B)
    rc = hashed_ngram_counts(corpus, "text", B)
    novel = spark.createDataFrame(
        [(99, "zzzquux flibbertigibbet")], "doc_id bigint, text string"
    )
    w = dsir_logweights(novel, "doc_id", "text", tc, rc, B).collect()[0]
    assert w.logw is not None and w.n_grams == 3
    r = bucket_logratios(tc, rc, B).select(F.max("nt"), F.max("nr")).first()
    s, b = 0.5, float(B)
    expect = 3 * (
        math.log(s / (r[0] + s * b)) - math.log(s / (r[1] + s * b))
    )
    assert abs(w.logw - expect) < 1e-9


def test_gumbel_rejects_non_integral_id(spark, target):
    """A string id would cast to NULL inside the Gumbel key and silently
    degenerate the sample to first-k-by-id — the operator must raise."""
    df = spark.createDataFrame(
        [("a", "cat purrs softly"), ("b", "dog barks loudly")],
        "doc_id string, text string",
    )
    with pytest.raises(ValueError, match="integral id"):
        dsir_select(
            df, "doc_id", "text", target, k=1, num_buckets=64, gumbel_seed=7
        )


def test_select_releases_gram_cache(spark, corpus, target):
    """dsir_select persists its shared gram frame internally; library
    callers must not inherit that executor cache after the call. The
    only persisted block the call may leave behind is the
    localCheckpoint of its own <= k-row result."""
    # count only RDD IDS NEW since the call: the global size is suite-
    # order dependent (earlier tests' persisted fixtures/checkpoints
    # appear and are context-cleaned asynchronously, so a raw
    # size-delta flakes under full-suite runs)
    jsc = spark.sparkContext._jsc.sc()

    def _ids():
        it = jsc.getPersistentRDDs().keysIterator()
        out = set()
        while it.hasNext():
            out.add(int(it.next()))
        return out

    before = _ids()
    kept = dsir_select(corpus, "doc_id", "text", target, k=4, num_buckets=256)
    assert kept.count() == 4  # materialized result still readable
    # without the unpersist this is +2 (grams cache + checkpoint); the
    # ratios-table checkpoint leak (r12 fix) made it +2 as well
    assert len(_ids() - before) <= 1
