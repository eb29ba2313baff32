"""Count-min sketch: one-sided guarantee, size bound, collision-free
parity at wide width, heavy-hitter contract, and plan shape."""

from collections import Counter
import re

import pytest
from pyspark.sql import functions as F

from omop2obo_spark.operators.sketch import cms_build, cms_estimate, heavy_hitters

DOCS = [
    (0, "the cat sat on the mat the cat"),
    (1, "the dog ate the cat's dinner"),
    (2, "mat mat mat and the dog"),
    (3, None),  # NULL text must contribute no tokens on either engine
    (4, "on and on and on"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _exact_counts() -> Counter:
    c: Counter = Counter()
    for _, text in DOCS:
        if text:
            c.update(t for t in re.split(r"[^a-z0-9']+", text.lower()) if t)
    return c


def _toks(spark):
    from omop2obo_spark.operators.textstats import tokens

    return _docs_df(spark).select(F.explode(tokens(F.col("text"))).alias("tok"))


def test_cms_never_undercounts_and_size_bounded(spark):
    toks = _toks(spark)
    depth, width = 4, 16  # deliberately narrow: forces collisions
    sketch = cms_build(toks, depth=depth, width=width)
    assert sketch.count() <= depth * width

    exact = _exact_counts()
    cand = spark.createDataFrame([(t,) for t in exact], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(sketch, cand, depth=depth, width=width).collect()
    }
    assert set(est) == set(exact)
    for tok, n in exact.items():
        assert est[tok] >= n, f"{tok}: est {est[tok]} < exact {n}"


def test_cms_exact_when_width_is_collision_free(spark):
    """At width >> vocabulary the deterministic md5 buckets collide for no
    pair of this fixture's tokens, so every estimate is exact."""
    toks = _toks(spark)
    exact = _exact_counts()
    sketch = cms_build(toks, depth=4, width=1 << 16)
    cand = spark.createDataFrame([(t,) for t in exact], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(sketch, cand, depth=4, width=1 << 16).collect()
    }
    assert est == dict(exact)


def test_cms_absent_token_estimates_from_collisions_only(spark):
    """A token never seen probes unoccupied (or collided) cells; with a
    collision-free width its estimate is exactly 0."""
    sketch = cms_build(_toks(spark), depth=4, width=1 << 16)
    cand = spark.createDataFrame([("zzz_never_seen",)], "token string")
    [row] = cms_estimate(sketch, cand, depth=4, width=1 << 16).collect()
    assert row["cms_est"] == 0


def test_heavy_hitters_contract_and_ranks(spark):
    out = heavy_hitters(_docs_df(spark), k=5, depth=4, width=64).collect()
    exact = _exact_counts()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["n_exact"]) for r in out] == want
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert all(r["no_undercount"] for r in out)
    # width 64 on this tiny corpus: bound = ceil(2N/64) with N ~ 30 gives
    # slack ~1 — the envelope must still hold deterministically
    assert all(r["within_eps"] for r in out), out


def test_cms_estimate_probe_join_is_broadcast(spark):
    sketch = cms_build(_toks(spark), depth=4, width=64)
    cand = spark.createDataFrame([("the",)], "token string")
    plan = cms_estimate(sketch, cand, depth=4, width=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_heavy_hitters_topk_is_take_ordered_not_global_window(spark):
    plan = (
        heavy_hitters(_docs_df(spark), k=5, depth=4, width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_cms_partitioning_invariance(spark):
    """Sketch and estimates are pure functions of the multiset of tokens —
    repartitioning must not change a single counter."""
    toks = _toks(spark)
    a = cms_build(toks, depth=4, width=32)
    b = cms_build(toks.repartition(7), depth=4, width=32)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
