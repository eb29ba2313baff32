"""Fellegi-Sunter entity resolution: weights vs a Python recompute,
blocking semantics, decision thresholds, validation."""

from __future__ import annotations

import math

import pytest

from omop2obo_spark.operators.er import block_compare, fs_score

PARAMS = {"name": (0.95, 0.01), "phone": (0.9, 0.05)}


def _w(agree_name, agree_phone):
    t = 0.0
    for field, agree in (("name", agree_name), ("phone", agree_phone)):
        m, u = PARAMS[field]
        t += round(
            math.log2(m / u) if agree else math.log2((1 - m) / (1 - u)), 9
        )
    return round(t, 6)


def test_block_compare_pairs_only_within_blocks(spark):
    left = spark.createDataFrame(
        [(1, "b1", "Ann", "555"), (2, "b2", "Bob", "666")],
        "rec_id long, blk string, name string, phone string",
    )
    right = spark.createDataFrame(
        [(10, "b1", "ann ", "555"), (20, "b1", "Zed", "777"), (30, "b3", "Ann", "555")],
        "rec_id long, blk string, name string, phone string",
    )
    out = block_compare(left, right, ["blk"], ["name", "phone"]).collect()
    got = {(r.left_id, r.right_id): (r.agree_name, r.agree_phone) for r in out}
    # cross-block pairs (2,30) etc. never materialize
    assert set(got) == {(1, 10), (1, 20)}
    # lower+trim normalization: 'Ann' == 'ann '
    assert got[(1, 10)] == (True, True)
    assert got[(1, 20)] == (False, False)


def test_block_compare_null_field_is_disagreement(spark):
    left = spark.createDataFrame(
        [(1, "b", None, "555")], "rec_id long, blk string, name string, phone string"
    )
    right = spark.createDataFrame(
        [(2, "b", None, "555")], "rec_id long, blk string, name string, phone string"
    )
    row = block_compare(left, right, ["blk"], ["name", "phone"]).collect()[0]
    assert row.agree_name is False and row.agree_phone is True


def test_fs_score_matches_python_recompute_all_patterns(spark):
    pairs = spark.createDataFrame(
        [
            (1, 10, True, True),
            (2, 20, True, False),
            (3, 30, False, True),
            (4, 40, False, False),
        ],
        "left_id long, right_id long, agree_name boolean, agree_phone boolean",
    )
    out = {
        r.left_id: (r.weight, r.decision)
        for r in fs_score(pairs, PARAMS, upper=5.0, lower=0.0).collect()
    }
    assert out[1][0] == pytest.approx(_w(True, True), abs=1e-6)
    assert out[2][0] == pytest.approx(_w(True, False), abs=1e-6)
    assert out[3][0] == pytest.approx(_w(False, True), abs=1e-6)
    assert out[4][0] == pytest.approx(_w(False, False), abs=1e-6)
    # decisions follow the recomputed weights against (lower=0, upper=5)
    def decide(w):
        return "link" if w >= 5.0 else ("non_link" if w <= 0.0 else "possible")

    for i, (an, ap) in [(1, (True, True)), (2, (True, False)),
                        (3, (False, True)), (4, (False, False))]:
        assert out[i][1] == decide(_w(an, ap)), (i, out[i])
    # and the extreme patterns land where FS says they must
    assert out[1][1] == "link" and out[4][1] == "non_link"


def test_fs_score_validates_params(spark):
    pairs = spark.createDataFrame(
        [(1, 2, True)], "left_id long, right_id long, agree_name boolean"
    )
    with pytest.raises(ValueError):
        fs_score(pairs, {"name": (0.5, 0.9)}, upper=1.0, lower=0.0)  # u > m
    with pytest.raises(ValueError):
        fs_score(pairs, {"name": (0.9, 0.1)}, upper=0.0, lower=1.0)  # upper < lower


def test_er_pipeline_recovers_injected_matches(spark):
    # 30 entities; the right copy corrupts name for id%3==0 and phone for
    # id%5==0 (address never corrupted); blocking on the stable group
    # key. Every same-id pair with <=1 corrupted field keeps two
    # agreements and must clear the link threshold.
    params3 = dict(PARAMS, addr=(0.9, 0.02))
    left = spark.createDataFrame(
        [(i, f"g{i % 7}", f"name{i}", f"p{i:04d}", f"a{i} main st")
         for i in range(30)],
        "rec_id long, blk string, name string, phone string, addr string",
    )
    right = spark.createDataFrame(
        [
            (
                i + 1000,
                f"g{i % 7}",
                f"name{i}" + ("x" if i % 3 == 0 else ""),
                f"p{i:04d}" if i % 5 != 0 else "p9999",
                f"a{i} main st",
            )
            for i in range(30)
        ],
        "rec_id long, blk string, name string, phone string, addr string",
    )
    pairs = block_compare(left, right, ["blk"], ["name", "phone", "addr"])
    scored = fs_score(pairs, params3, upper=5.0, lower=0.0)
    links = {
        (r.left_id, r.right_id) for r in scored.filter("decision = 'link'").collect()
    }
    for i in range(30):
        corrupted = (i % 3 == 0) + (i % 5 == 0)
        if corrupted <= 1:
            assert (i, i + 1000) in links, i
    # no cross-entity pair agrees on any field, so none can link
    assert all(l + 1000 == r for l, r in links)
