"""DSIR importance-resampling tests: weights against a from-scratch
Python recomputation of the exact published formula, sampling against
the deterministic Gumbel-top-k recompute, partition independence."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from omop2obo_spark.operators.curate import dsir_sample, dsir_weights

DOCS = [
    (0, "spark shuffle join agg spark shuffle"),
    (1, "heart lung kidney heart disease"),
    (2, "spark join heart"),
    (3, ""),
    (4, "kidney disease lung disease heart"),
]
TARGET = [
    (100, "heart disease lung disease"),
    (101, "kidney heart lung"),
]
B = 16


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _bucket(token):
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % B


def _expected_weights():
    raw_counts: dict[int, int] = {}
    tgt_counts: dict[int, int] = {}
    for _, text in DOCS:
        for t in _tok(text):
            raw_counts[_bucket(t)] = raw_counts.get(_bucket(t), 0) + 1
    for _, text in TARGET:
        for t in _tok(text):
            tgt_counts[_bucket(t)] = tgt_counts.get(_bucket(t), 0) + 1
    tr, tt = sum(raw_counts.values()), sum(tgt_counts.values())
    lw = {
        b: round(
            math.log((tgt_counts.get(b, 0) + 1) / (tt + B))
            - math.log((cr + 1) / (tr + B)),
            9,
        )
        for b, cr in raw_counts.items()
    }
    out = {}
    for doc_id, text in DOCS:
        toks = _tok(text)
        out[doc_id] = (len(toks), round(sum(lw[_bucket(t)] for t in toks), 6))
    return out


def test_dsir_weights_match_python_recompute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tok, r.weight)
        for r in dsir_weights(docs, target, n_buckets=B).collect()
    }
    exp = _expected_weights()
    assert set(got) == set(exp)
    for doc_id, (n_tok, weight) in exp.items():
        assert got[doc_id][0] == n_tok
        assert got[doc_id][1] == pytest.approx(weight, abs=2e-6)


def test_dsir_weights_rank_domain_docs_higher(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = {r.doc_id: r.weight for r in dsir_weights(docs, target, n_buckets=B).collect()}
    # medical docs (1, 4) must outscore the pure-spark doc (0)
    assert w[1] > w[0] and w[4] > w[0]
    # empty doc scores exactly 0
    assert w[3] == 0.0


def test_dsir_weights_partition_independent(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    a = dsir_weights(docs.repartition(1), target, n_buckets=B)
    b = dsir_weights(docs.repartition(7), target.repartition(3), n_buckets=B)
    rows_a = sorted((r.doc_id, r.n_tok, r.weight) for r in a.collect())
    rows_b = sorted((r.doc_id, r.n_tok, r.weight) for r in b.collect())
    assert rows_a == rows_b


def test_dsir_sample_matches_gumbel_recompute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    weights = dsir_weights(docs, target, n_buckets=B)
    got = [(r.doc_id, r.rank) for r in dsir_sample(weights, k=3).collect()]

    exp_w = _expected_weights()
    scored = []
    for doc_id, (_, w) in exp_w.items():
        u = (int(hashlib.md5(f"dsir|{doc_id}".encode()).hexdigest()[:8], 16) + 1.0) / (
            2**32 + 2
        )
        scored.append((round(w + -math.log(-math.log(u)), 6), -doc_id, doc_id))
    scored.sort(reverse=True)
    exp = [(doc_id, i + 1) for i, (_, _, doc_id) in enumerate(scored[:3])]
    assert sorted(got, key=lambda x: x[1]) == exp


def test_dsir_sample_validates_args(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    weights = dsir_weights(docs, target, n_buckets=B)
    with pytest.raises(ValueError):
        dsir_sample(weights, k=0)
    with pytest.raises(ValueError):
        dsir_sample(weights, k=2, temperature=0.0)
    with pytest.raises(ValueError):
        dsir_weights(docs, target, n_buckets=0)
