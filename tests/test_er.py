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


# ---------------------------------------------------------------------------
# graded comparison levels + survivorship
# ---------------------------------------------------------------------------

from omop2obo_spark.operators.er import (  # noqa: E402
    block_compare_graded,
    fs_score_graded,
    survivorship,
)

# level 0 = disagree, 1 = close (lev <= thresh), 2 = exact
GRADED = {
    "name": [(0.02, 0.94), (0.08, 0.05), (0.9, 0.01)],
    "city": [(0.05, 0.8), (0.15, 0.15), (0.8, 0.05)],
}


def _gw(lvl_name, lvl_city):
    t = 0.0
    for field, lvl in (("name", lvl_name), ("city", lvl_city)):
        m, u = GRADED[field][lvl]
        t += round(math.log2(m / u), 9)
    return round(t, 6)


def test_block_compare_graded_levels(spark):
    left = spark.createDataFrame(
        [(1, "b", "Ann", "Rome"), (2, "b", "Bob", None)],
        "rec_id long, blk string, name string, city string",
    )
    right = spark.createDataFrame(
        [
            (10, "b", "ann ", "Romf"),   # name exact after norm; city lev 1
            (20, "b", "Axx", "Paris"),   # name lev 2 > thresh 1; city disagree
            (30, "b", "Anq", "Rome"),    # name lev 1 (thresh 1); city exact
        ],
        "rec_id long, blk string, name string, city string",
    )
    out = block_compare_graded(
        left, right, ["blk"], {"name": 1, "city": 2}
    ).collect()
    got = {(r.left_id, r.right_id): (r.lvl_name, r.lvl_city) for r in out}
    assert got[(1, 10)] == (2, 1)
    assert got[(1, 20)] == (0, 0)
    assert got[(1, 30)] == (1, 2)
    # NULL on either side is level 0, not an error
    assert got[(2, 10)][1] == 0 and got[(2, 30)][1] == 0


def test_fs_score_graded_matches_python_recompute(spark):
    rows = [(i, i * 10, ln, lc) for i, (ln, lc) in
            enumerate([(2, 2), (2, 1), (1, 0), (0, 2), (0, 0), (1, 1)])]
    pairs = spark.createDataFrame(
        rows, "left_id long, right_id long, lvl_name int, lvl_city int"
    )
    out = {r.left_id: (r.weight, r.decision)
           for r in fs_score_graded(pairs, GRADED, upper=5.0, lower=0.0).collect()}
    for i, (ln, lc) in enumerate([(2, 2), (2, 1), (1, 0), (0, 2), (0, 0), (1, 1)]):
        w = _gw(ln, lc)
        assert out[i][0] == pytest.approx(w, abs=1e-6), (i, ln, lc)
        want = "link" if w >= 5.0 else ("non_link" if w <= 0.0 else "possible")
        assert out[i][1] == want
    # exact-everywhere links, disagree-everywhere doesn't
    assert out[0][1] == "link" and out[4][1] == "non_link"


def test_fs_score_graded_validates(spark):
    pairs = spark.createDataFrame([(1, 2, 0)], "left_id long, right_id long, lvl_name int")
    with pytest.raises(ValueError):
        fs_score_graded(pairs, {"name": [(0.9, 0.1)]}, upper=1.0, lower=0.0)  # 1 level
    with pytest.raises(ValueError):
        fs_score_graded(pairs, {"name": [(0.9, 0.1), (1.5, 0.1)]}, upper=1.0, lower=0.0)
    with pytest.raises(ValueError):
        fs_score_graded(pairs, {"name": [(0.9, 0.1), (0.1, 0.9)]}, upper=0.0, lower=1.0)


def test_survivorship_modal_tiebreak_and_nulls(spark):
    records = spark.createDataFrame(
        [
            (1, "Ann", "Rome", None),
            (2, "Ann", "Lyon", None),
            (3, "Anne", "Lyon", None),   # name: Ann 2-1; city: Lyon 2-1
            (10, "Bob", None, "x"),
            (11, "Rob", None, "y"),      # name tie 1-1 -> 'Bob' (lex min)
        ],
        "rec_id long, name string, city string, note string",
    )
    assignment = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "rec_id long, cluster long"
    )
    out = {r.cluster: r for r in
           survivorship(records, assignment, ["name", "city", "note"]).collect()}
    a, b = out[1], out[10]
    assert (a.name, a.city, a.note) == ("Ann", "Lyon", None)
    assert (a.canonical_id, a.cluster_size) == (1, 3)
    # tie on count -> lexicographically smallest value; all-null stays null
    assert (b.name, b.city) == ("Bob", None)
    assert (b.canonical_id, b.cluster_size) == (10, 2)


def test_survivorship_partition_independent(spark):
    import random

    rng = random.Random(7)
    recs = [(i, f"n{rng.randrange(3)}", f"c{rng.randrange(2)}") for i in range(200)]
    records = spark.createDataFrame(recs, "rec_id long, name string, city string")
    assignment = spark.createDataFrame(
        [(i, i % 17) for i in range(200)], "rec_id long, cluster long"
    )
    base = sorted(
        map(tuple, survivorship(records, assignment, ["name", "city"]).collect())
    )
    again = sorted(
        map(
            tuple,
            survivorship(
                records.repartition(13), assignment.repartition(3), ["name", "city"]
            ).collect(),
        )
    )
    assert base == again


def test_sorted_neighborhood_pairs_python_model(spark):
    """Window pairs vs a pure-Python sort replay, incl. duplicate keys
    (id tie-break), NULL-key exclusion, window truncation at the tail,
    and bucket-boundary pairs (records in DIFFERENT prefix buckets must
    still pair — the two-level rank is global)."""
    from omop2obo_spark.operators.er import sorted_neighborhood_pairs

    rows = [
        (1, "aa-smith"), (2, "ab-smith"), (3, "aa-smith"), (4, "zz-last"),
        (5, "ba-jones"), (6, "bb-jones"), (7, None), (8, "ab-smyth"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, bkey: string")
    for w in (1, 2, 3):
        ordered = sorted(((k, i) for i, k in rows if k is not None))
        want = set()
        for p in range(len(ordered)):
            for d in range(1, w + 1):
                if p + d < len(ordered):
                    (ka, a), (kb, b) = ordered[p], ordered[p + d]
                    want.add((a, b, ka, kb, d))
        got = {
            (r.a, r.b, r.key_a, r.key_b, r.rank_gap)
            for r in sorted_neighborhood_pairs(df, "bkey", window=w).collect()
        }
        assert got == want, w
    # partitioning independence
    g1 = {(r.a, r.b) for r in sorted_neighborhood_pairs(
        df.repartition(7), "bkey", window=2).collect()}
    g2 = {(r.a, r.b) for r in sorted_neighborhood_pairs(
        df.coalesce(1), "bkey", window=2).collect()}
    assert g1 == g2
    import pytest

    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "bkey", window=0)
