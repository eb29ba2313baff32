"""TF-IDF similarity tier tests.

The numpy vectorizer is pinned against hand-computed sklearn-formula
goldens (smooth idf ln((1+n)/(1+df))+1, raw tf, l2 norm), and the full
tier is exercised end-to-end: exact-duplicate strings must score 1.0, and
the per-URI-max + percentile-75 + floor semantics must match
/root/reference/omop2obo/string_similarity.py:180-204,264.
"""

import math

import numpy as np
from pyspark.sql import functions as F

from omop2obo_spark.fixtures import lexicon_df
from omop2obo_spark.functions.text import py_preprocess
from omop2obo_spark.operators.similarity import (
    TfidfModel,
    build_ont_corpus,
    filter_similarity_matches,
    fit_tfidf,
    ngrams,
    query_df_counts,
    similarity_scores,
)


def test_ngrams():
    assert ngrams(["a", "b", "c"]) == ["a", "b", "c", "a b", "b c", "a b c"]
    assert ngrams(["x"]) == ["x"]
    assert ngrams([]) == []


def test_ngrams_expr_matches_python(spark):
    """The native HOF gram generator must produce the same multiset as the
    Python reference implementation for every boundary length (0..5)."""
    from omop2obo_spark.operators.similarity import ngrams_expr

    rows = [(["t%d" % i for i in range(n)],) for n in range(6)]
    rows.append((["repeat", "repeat", "repeat"],))
    df = spark.createDataFrame(rows, "toks array<string>")
    got = [sorted(r.g) for r in df.select(ngrams_expr(F.col("toks")).alias("g")).collect()]
    want = [sorted(ngrams(r[0])) for r in rows]
    assert got == want


def test_tfidf_formula_golden():
    # corpus: two ontology docs, one query doc; compute one idf by hand
    ont = [("HP_1", ["wet", "lung"]), ("HP_2", ["dry", "lung"])]
    qdf = {"wet": 1, "wet lung": 1, "lung": 1}  # query doc: ['wet','lung']
    model = fit_tfidf(ont, qdf, n_query_docs=1)
    n_docs = 3
    # 'lung' appears in all 3 docs -> idf = ln(4/4)+1 = 1
    assert math.isclose(model.idf[model.vocab["lung"]], 1.0)
    # 'dry' appears in 1 doc -> ln(4/2)+1
    assert math.isclose(model.idf[model.vocab["dry"]], math.log(4 / 2) + 1)
    # identical strings must have cosine exactly 1.0
    X = model.transform([["wet", "lung"]])
    sims = X @ model.ont_mat.T
    assert math.isclose(sims[0, 0], 1.0, abs_tol=1e-12)
    assert sims[0, 1] < 1.0
    # rows are l2-normalized
    assert np.allclose((model.ont_mat ** 2).sum(axis=1), 1.0)


def test_similarity_tier_end_to_end(spark):
    lex = lexicon_df(spark)
    ont_corpus = build_ont_corpus(lex)
    queries = spark.createDataFrame(
        [
            ("m1", py_preprocess("pulmonary edema")),              # exact label → 1.0
            ("m2", py_preprocess("severe pulmonary edema episode")),  # near-miss
            ("m3", py_preprocess("quarterly invoice meeting")),    # noise → no hit
        ],
        "mention_id string, tokens array<string>",
    )
    dfc, n_docs = query_df_counts(queries)
    model = fit_tfidf(ont_corpus, dfc, n_docs)
    scores = similarity_scores(spark, queries, model)
    hits = filter_similarity_matches(scores)
    rows = [(r.mention_id, r.sim_uri, r.score) for r in hits.collect()]
    m1 = [r for r in rows if r[0] == "m1"]
    # the exact label string scores 1.0 against HP_0100598's label row
    assert ("m1", "HP_0100598", 1.0) in m1
    m2 = [r for r in rows if r[0] == "m2"]
    assert any(u == "HP_0100598" and 0.25 <= s < 1.0 for _, u, s in m2)
    assert not [r for r in rows if r[0] == "m3"]


def test_filter_matches_per_uri_max_and_percentile(spark):
    # replicate filters_matches semantics: dedup to per-URI max, then keep
    # scores >= exact 75th percentile of the deduped list
    scores = spark.createDataFrame(
        [
            ("m", "HP_1", 0.9), ("m", "HP_1", 0.5),   # dup URI → keep 0.9
            ("m", "HP_2", 0.6), ("m", "HP_3", 0.4), ("m", "HP_4", 0.3),
        ],
        "mention_id string, sim_uri string, score double",
    )
    out = filter_similarity_matches(scores, percentile=75.0)
    got = {(r.sim_uri, r.score) for r in out.collect()}
    # deduped scores [0.9, 0.6, 0.4, 0.3]; np.percentile(...,75) = 0.675
    assert got == {("HP_1", 0.9)}


def test_distributed_stats_match_driver_fit(spark):
    """The scale path (distributed_query_stats + fit_tfidf_ont_vocab +
    precomputed norms) must produce the SAME scores as the driver-side
    union-corpus fit — cosine factorization equivalence."""
    from omop2obo_spark.operators.similarity import (
        distributed_query_stats,
        fit_tfidf_ont_vocab,
    )

    lex = lexicon_df(spark)
    ont_corpus = build_ont_corpus(lex)
    queries = spark.createDataFrame(
        [
            ("m1", py_preprocess("pulmonary edema")),
            ("m2", py_preprocess("severe pulmonary edema episode with fluid")),
            ("m3", py_preprocess("edema lung patient wet lung fluid")),
            ("m4", py_preprocess("color vision disorder suspected")),
        ],
        "mention_id string, tokens array<string>",
    )
    # old path: full union-vocab fit on the driver
    dfc, n_docs = query_df_counts(queries)
    old_model = fit_tfidf(ont_corpus, dfc, n_docs)
    old = {
        (r.mention_id, r.sim_uri): r.score
        for r in similarity_scores(spark, queries, old_model, top_n=50, floor=0.0).collect()
    }
    # new path: ont-vocab model + Spark-side norms
    norms, ont_vocab_df, n_docs2 = distributed_query_stats(queries, ont_corpus)
    assert n_docs2 == n_docs
    new_model = fit_tfidf_ont_vocab(ont_corpus, ont_vocab_df, n_docs2)
    q2 = queries.withColumn("__k", F.md5(F.concat_ws("\x01", F.col("tokens")))).join(
        norms.withColumnRenamed("k", "__k"), on="__k", how="left"
    )
    new = {
        (r.mention_id, r.sim_uri): r.score
        for r in similarity_scores(
            spark, q2, new_model, top_n=50, floor=0.0, norm_col="norm"
        ).collect()
    }
    assert set(old) == set(new)
    for k in old:
        assert abs(old[k] - new[k]) < 1e-12, (k, old[k], new[k])
