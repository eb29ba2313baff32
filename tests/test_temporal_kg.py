"""Temporal-KG operators (operators/temporal.py) and graph structure
operators (operators/hierarchy.py:triangle_counts/neighbor_jaccard) on
hand-computed fixtures. The oracle harness covers the same operators
end-to-end over the pipeline's triples; these pin the per-operator
semantics on graphs small enough to verify by eye."""

from __future__ import annotations

from datetime import datetime, timedelta

ORIGIN = "2026-01-01 00:00:00"


def _transcripts(spark, rows):
    """rows: (conv_id, turn_idx, rel_seconds)."""
    base = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(c, t, None, None, None, base + timedelta(seconds=s))
         for (c, t, s) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )


def test_triple_validity_intervals(spark):
    from omop2obo_spark.operators.temporal import triple_validity

    tr = _transcripts(spark, [("c1", 0, 10), ("c1", 1, 20), ("c2", 0, 500)])
    tp = _triples(
        spark,
        [
            ("c1", 0, "s", "p", "o"),
            ("c1", 1, "s", "p", "o"),
            ("c2", 0, "s", "p", "o"),
            ("c2", 0, "s2", "p", "o2"),
        ],
    )
    got = {
        (r.subj, r.pred, r.obj): (r.first_seen_s, r.last_seen_s, r.n_assertions)
        for r in triple_validity(tp, tr, origin=ORIGIN).collect()
    }
    assert got == {
        ("s", "p", "o"): (10, 500, 3),
        ("s2", "p", "o2"): (500, 500, 1),
    }


def test_graph_asof_explicit_and_midpoint(spark):
    from omop2obo_spark.operators.temporal import graph_asof, triple_validity

    tr = _transcripts(spark, [("c1", 0, 0), ("c1", 1, 100), ("c1", 2, 1000)])
    tp = _triples(
        spark,
        [
            ("c1", 0, "early", "p", "o"),
            ("c1", 1, "mid", "p", "o"),
            ("c1", 2, "late", "p", "o"),
        ],
    )
    v = triple_validity(tp, tr, origin=ORIGIN)
    assert {r.subj for r in graph_asof(v, cutoff_rel_s=100).collect()} == {"early", "mid"}
    # midpoint = 0 + (1000-0)//2 = 500 → late excluded
    assert {r.subj for r in graph_asof(v).collect()} == {"early", "mid"}
    assert {r.subj for r in graph_asof(v, cutoff_rel_s=0).collect()} == {"early"}


def test_entity_bursts_trailing_window(spark):
    from omop2obo_spark.operators.temporal import entity_bursts

    # one entity, hourly buckets 0..3 with counts 1,1,1,9:
    # bucket 3 has a full trailing window (sum 3) and 9*3 >= 3*3 → burst
    rows, triples = [], []
    counts = [1, 1, 1, 9]
    k = 0
    for bucket, n in enumerate(counts):
        for j in range(n):
            conv = f"c{k}"
            rows.append((conv, 0, bucket * 3600 + j))
            triples.append((conv, 0, f"m{k}", "omop2obo:hasExactMapping", "obo:X"))
            k += 1
    tr = _transcripts(spark, rows)
    tp = _triples(spark, triples)
    got = {
        int(r.bucket): (r.n_mentions, r.prev_sum, r.is_burst)
        for r in entity_bursts(tp, tr, origin=ORIGIN).collect()
    }
    assert got == {
        0: (1, None, False),
        1: (1, None, False),
        2: (1, None, False),
        3: (9, 3, True),
    }
    # non-mapping predicates are ignored
    tp2 = _triples(spark, [("c0", 0, "m", "omop2obo:hasEvidence", "e")])
    assert entity_bursts(tp2, tr, origin=ORIGIN).count() == 0


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for (a, b) in pairs], "ent_a string, ent_b string"
    )


def test_triangle_counts_known_graph(spark):
    from omop2obo_spark.operators.hierarchy import triangle_counts

    # triangle a-b-c plus pendant c-d
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = {
        r.ent: (r.degree, r.n_triangles, r.clustering)
        for r in triangle_counts(e).collect()
    }
    assert got == {
        "a": (2, 1, 1.0),
        "b": (2, 1, 1.0),
        "c": (3, 1, round(2 / 6, 6)),
        "d": (1, 0, 0.0),
    }


def test_neighbor_jaccard_known_graph(spark):
    from omop2obo_spark.operators.hierarchy import neighbor_jaccard

    # a and b share neighbor c; nbrs(a)={b,c}, nbrs(b)={a,c}, shared… compute:
    e = _edges(spark, [("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")])
    # nbrs(a)={c,d}, nbrs(b)={c,d} → shared 2, union 2 → jaccard 1.0
    # nbrs(c)={a,b}, nbrs(d)={a,b} → shared 2, jaccard 1.0
    got = {
        (r.ent_a, r.ent_b): (r.shared, r.jaccard)
        for r in neighbor_jaccard(e).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("c", "d"): (2, 1.0)}


def test_adamic_adar_hand_computed(spark):
    """AA weights vs hand arithmetic on a graph with one informative and
    one hub shared neighbor, plus the linked flag on a direct edge."""
    import math

    from omop2obo_spark.operators.hierarchy import adamic_adar

    # a-b direct edge; a and b also share neighbors c (deg 2: a,b) and
    # h (hub, deg 4: a,b,x,y).  c and h share neighbors a (deg 3) and
    # b (deg 3).  x and y share only hub h (deg 4).
    e = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "h"), ("b", "h"),
         ("h", "x"), ("h", "y")],
    )
    got = {
        (r.ent_a, r.ent_b): (r.shared, r.aa_score, r.linked)
        for r in adamic_adar(e).collect()
    }
    aa_ab = round(1 / math.log(2) + 1 / math.log(4), 6)
    aa_ch = round(2 / math.log(3), 6)
    aa_xy = round(1 / math.log(4), 6)
    ab3 = round(1 / math.log(3), 6)
    assert got[("a", "b")] == (2, aa_ab, True)
    assert got[("c", "h")] == (2, aa_ch, False)
    assert got[("x", "y")] == (1, aa_xy, False)
    # wedges through the hub h and through direct endpoints
    assert got[("a", "x")] == (1, aa_xy, False)
    assert got[("b", "x")] == (1, aa_xy, False)
    assert got[("a", "y")] == (1, aa_xy, False)
    assert got[("b", "y")] == (1, aa_xy, False)
    assert got[("a", "c")] == (1, ab3, True)
    assert got[("b", "c")] == (1, ab3, True)
    assert got[("a", "h")] == (1, ab3, True)
    assert got[("b", "h")] == (1, ab3, True)
    assert len(got) == 11


def test_triangle_join_is_single_direction(spark):
    """Plan shape: the ordered-edge enumeration never unions reversed
    edges before the wedge join — the canonical a<b input is joined
    as-is, so wedge volume is bounded by the oriented degree."""
    from omop2obo_spark.operators.hierarchy import triangle_counts

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    plan = triangle_counts(e)._jdf.queryExecution().optimizedPlan().toString()
    # two joins for wedges+closing plus one left join for the
    # zero-triangle vertices — no cartesian anywhere
    assert "Cartesian" not in plan


def test_cooccurrence_drift_halves(spark):
    from omop2obo_spark.operators.hierarchy import cooccurrence_drift

    P = "omop2obo:hasExactMapping"
    # conv e1 at t=0 (early), e2/e3 at t=100 (late); midpoint = 50
    tr = _transcripts(spark, [("e1", 0, 0), ("e2", 0, 100), ("e3", 0, 100)])
    tp = _triples(
        spark,
        [
            ("e1", 0, "m1", P, "a"), ("e1", 0, "m2", P, "b"),
            ("e2", 0, "m3", P, "a"), ("e2", 0, "m4", P, "b"),
            ("e3", 0, "m5", P, "a"), ("e3", 0, "m6", P, "c"),
        ],
    )
    got = {
        (r.ent_a, r.ent_b): (r.n_early, r.n_late, r.delta)
        for r in cooccurrence_drift(tp, tr, origin=ORIGIN).collect()
    }
    assert got == {("a", "b"): (1, 1, 0), ("a", "c"): (0, 1, 1)}


def test_resnik_similarity_common_ancestor_ic(spark):
    import math

    from omop2obo_spark.operators.hierarchy import resnik_similarity

    P = "omop2obo:hasExactMapping"
    # hierarchy: X,Y → S → R; Z → R. conv1 maps X,Y; conv2 maps Z.
    # N=3 assertions; rollup: S=2, R=3 → IC(S)=-ln(2/3), IC(R)=0.
    # co-mentioned pair (X,Y) shares {S, R} → resnik = IC(S).
    tp = _triples(
        spark,
        [
            ("c1", 0, "m1", P, "X"), ("c1", 0, "m2", P, "Y"),
            ("c2", 0, "m3", P, "Z"),
        ],
    )
    closure = spark.createDataFrame(
        [("X", "S"), ("X", "R"), ("Y", "S"), ("Y", "R"), ("S", "R"), ("Z", "R")],
        "ent string, anc string",
    )
    got = {
        (r.ent_a, r.ent_b): r.resnik
        for r in resnik_similarity(tp, closure).collect()
    }
    assert got == {("X", "Y"): round(-math.log(2 / 3), 6)}


def test_resnik_self_similarity_when_entity_outside_closure(spark):
    """A dbxref-only class absent from the parent forest still gets a
    reflexive self-ancestor, so a pair of co-mentioned copies of it (via
    two conversations) would score — and a pair with NO common ancestor
    is omitted rather than scored 0."""
    from omop2obo_spark.operators.hierarchy import resnik_similarity

    P = "omop2obo:hasExactMapping"
    tp = _triples(
        spark,
        [("c1", 0, "m1", P, "A"), ("c1", 0, "m2", P, "B")],
    )
    closure = spark.createDataFrame([("A", "R")], "ent string, anc string")
    # A and B co-mention but share no ancestor (B only has itself) → no row
    assert resnik_similarity(tp, closure).count() == 0


def test_label_propagation_two_triangles_bridge(spark):
    """Hand-rolled 3 rounds of synchronous min-tie LPA on two triangles
    joined by a bridge: each triangle converges to its own community."""
    from omop2obo_spark.operators.hierarchy import label_propagation

    e = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"),
         ("x", "y"), ("x", "z"), ("y", "z"),
         ("c", "x")],
    )
    got = {r.ent: r.community for r in label_propagation(e, iterations=3).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "c", "y": "c", "z": "c"}


def test_deterministic_walks_match_python_replay(spark):
    """Every hop must equal a pure-Python replay of the hash rule:
    sorted-neighbor[ md5(cur:step)[:15hex] mod degree ]."""
    import hashlib

    from omop2obo_spark.operators.hierarchy import deterministic_walks

    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")])
    nbrs = {"a": ["b", "c"], "b": ["a", "c"], "c": ["a", "b", "d"], "d": ["c"]}

    def replay(start, steps=3):
        cur, path = start, [start]
        for s in range(steps):
            idx = int(hashlib.md5(f"{cur}:{s}".encode()).hexdigest()[:15], 16) % len(nbrs[cur])
            cur = nbrs[cur][idx]
            path.append(cur)
        return "->".join(path)

    got = {r.start: r.path for r in deterministic_walks(e, walk_len=3).collect()}
    assert got == {v: replay(v) for v in nbrs}


def test_asof_join_null_timestamps_unmatched(spark):
    """NULL-ts probes keep NULL payload in BOTH directions (a NULL probe
    sorts at the partition head, where a following-frame window would
    otherwise see every state row); NULL-ts state rows never match."""
    from datetime import datetime

    from omop2obo_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 30)), (1, None)], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), "a"), (1, None, "ghost")],
        "k long, rts timestamp, v string",
    )
    for direction in ("backward", "forward"):
        got = {
            (r.k, r.ts): r.v
            for r in asof_join(
                left, right, "k", "k", "ts", "rts", ["v"], direction=direction
            ).collect()
        }
        assert got[(1, None)] is None, direction
        expected = "a" if direction == "backward" else None
        assert got[(1, datetime(2026, 1, 1, 10, 30))] == expected, direction


def test_range_join_rejects_nonpositive_bucket(spark):
    import pytest

    from omop2obo_spark.operators.temporal import range_join

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="bucket_sec"):
        range_join(df, df, "k", "k", "ts", "s", "e", bucket_sec=0)


def test_triple_validity_counts_distinct_turns(spark):
    """Same-turn duplicate assertions and duplicated transcript turn rows
    must not inflate n_assertions (distinct asserting turns)."""
    from omop2obo_spark.operators.temporal import triple_validity

    tr = _transcripts(spark, [("c1", 0, 10), ("c1", 0, 10), ("c1", 1, 20)])
    tp = _triples(
        spark,
        [
            ("c1", 0, "s", "p", "o"),
            ("c1", 0, "s", "p", "o"),
            ("c1", 1, "s", "p", "o"),
        ],
    )
    got = {r.subj: r.n_assertions for r in triple_validity(tp, tr, origin=ORIGIN).collect()}
    assert got == {"s": 2}


def test_resample_forward_fill_model(spark):
    """Grid regularization vs a hand-computed model: per-key bounds, last
    value within a bucket (ts winner, value tie-break), forward fill
    through empty buckets, integer micro grid."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from omop2obo_spark.operators.temporal import resample_forward_fill

    rows = [
        # key a: events at t=5s (v=1), 7s (v=2), 125s (v=9) with 60s buckets
        ("a", "2024-01-01 00:00:05", 1.0),
        ("a", "2024-01-01 00:00:07", 2.0),
        ("a", "2024-01-01 00:02:05", 9.0),
        # simultaneous events: larger value wins the (ts, value) struct max
        ("b", "2024-01-01 00:00:10", 3.0),
        ("b", "2024-01-01 00:00:10", 4.0),
    ]
    ev = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    got = {
        (r.k, r.bucket_us): r.v
        for r in resample_forward_fill(ev, "k", "ts", "v", 60).collect()
    }
    base = 1704067200_000_000  # 2024-01-01 00:00:00 UTC in micros
    assert got == {
        ("a", base): 2.0,                    # last of bucket 0 (t=7s)
        ("a", base + 60_000_000): 2.0,       # empty bucket forward-fills
        ("a", base + 120_000_000): 9.0,
        ("b", base): 4.0,                    # tie on ts -> larger value
    }
    # partitioning independence
    got_p = {
        (r.k, r.bucket_us): r.v
        for r in resample_forward_fill(ev.repartition(5), "k", "ts", "v", 60).collect()
    }
    assert got_p == got
    with _pytest.raises(ValueError, match="interval_sec"):
        resample_forward_fill(ev, "k", "ts", "v", 0)


def test_rolling_range_agg_hand_computed(spark):
    """RANGE-frame trailing window vs hand arithmetic, incl. timestamp
    ties (all peers share one frame — partitioning-independent) and the
    exact inclusive boundary at t − window."""
    import datetime as dt

    from omop2obo_spark.operators.temporal import rolling_range_agg

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: events at +0s, +10s, +10s (tie), +3610s, +3611s
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(seconds=10), 2.0),
        (3, 1, t0 + dt.timedelta(seconds=10), 4.0),
        (4, 1, t0 + dt.timedelta(seconds=3610), 8.0),
        (5, 1, t0 + dt.timedelta(seconds=3611), 16.0),
        # user 2: single event
        (6, 2, t0, 5.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, value: double"
    )
    want = {
        1: (1, 1.0),
        2: (3, 7.0),    # tie peers 2 and 3 share one frame
        3: (3, 7.0),
        4: (3, 14.0),   # frame [10s, 3610s]: the +10s pair is IN (inclusive bound)
        5: (2, 24.0),   # frame [11s, 3611s]: the +10s pair just aged out
        6: (1, 5.0),
    }
    for df in (e.repartition(7), e.coalesce(1)):
        got = {
            r.id: (r.n_win, r.sum_win)
            for r in rolling_range_agg(df, window_sec=3600).collect()
        }
        assert got == want
    import pytest

    with pytest.raises(ValueError):
        rolling_range_agg(e, window_sec=-1)


def test_scc_components_known_digraph(spark):
    """SCCs on a digraph with two nontrivial components, a bridge edge
    between them (reach without mutual reach), and chain singletons."""
    from omop2obo_spark.operators.hierarchy import scc_components

    e = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # 3-cycle {a,b,c}
            ("d", "e"), ("e", "d"),               # 2-cycle {d,e}
            ("c", "d"),                           # bridge: no SCC merge
            ("f", "g"),                           # chain singletons
        ],
        "src: string, dst: string",
    )
    got = {r.node: (r.scc_id, r.scc_size) for r in scc_components(e).collect()}
    assert got == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "d": ("d", 2), "e": ("d", 2),
        "f": ("f", 1), "g": ("g", 1),
    }


def test_cap_hub_adjacency_star_and_determinism(spark):
    """Degree cap on a star + pendant graph: the hub keeps exactly
    max_degree edges (md5-selected, deterministic), spokes keep theirs,
    original degrees ride along; capped degrees never exceed the cap;
    different salts draw different samples but identical salts are
    partitioning-independent."""
    from collections import Counter

    from omop2obo_spark.operators.hierarchy import cap_hub_adjacency

    spokes = [f"s{i:02d}" for i in range(10)]
    e = _edges(spark, [("hub", s) for s in spokes] + [("s00", "s01")])
    got = cap_hub_adjacency(e, max_degree=3).collect()
    kept = {(r.ent_a, r.ent_b) for r in got}
    deg = Counter()
    for a, b in kept:
        deg[a] += 1
        deg[b] += 1
    assert all(d <= 3 for d in deg.values())
    assert deg["hub"] == 3
    # original (uncapped) degrees attached: hub 10; s00/s01 2; others 1
    for r in got:
        for ent, d in [(r.ent_a, r.deg_a), (r.ent_b, r.deg_b)]:
            want = 10 if ent == "hub" else (2 if ent in ("s00", "s01") else 1)
            assert d == want, (ent, d)
    # determinism + partitioning independence
    again = {(r.ent_a, r.ent_b)
             for r in cap_hub_adjacency(e.repartition(9), max_degree=3).collect()}
    assert again == kept
    other = {(r.ent_a, r.ent_b)
             for r in cap_hub_adjacency(e, max_degree=3, salt="v2").collect()}
    assert other != kept  # independent draw (10 choose 3 — collision ~1e-2)
    import pytest

    with pytest.raises(ValueError):
        cap_hub_adjacency(e, max_degree=0)


def test_cap_hub_adjacency_noop_below_cap(spark):
    """A graph already under the cap passes through unchanged."""
    from omop2obo_spark.operators.hierarchy import cap_hub_adjacency

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    got = {(r.ent_a, r.ent_b, r.deg_a, r.deg_b)
           for r in cap_hub_adjacency(e, max_degree=5).collect()}
    assert got == {("a", "b", 2, 2), ("b", "c", 2, 2), ("a", "c", 2, 2)}


def test_personalized_pagerank_power_method(spark):
    """PPR vs a python power-method replay on a path graph, plus the
    personalization property: mass concentrates at the seed side."""
    import pytest

    from omop2obo_spark.operators.hierarchy import personalized_pagerank

    # path a-b-c-d-e, seed at a
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r.ent: r.rank
           for r in personalized_pagerank(e, ["a"], iterations=3).collect()}
    nodes = ["a", "b", "c", "d", "e"]
    deg = {"a": 1, "b": 2, "c": 2, "d": 2, "e": 1}
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["b", "d"], "d": ["c", "e"], "e": ["d"]}
    r = {v: (1.0 if v == "a" else 0.0) for v in nodes}
    for _ in range(3):
        r = {
            v: 0.15000000000000002 * (1.0 if v == "a" else 0.0)
            + 0.85 * sum(r[u] / deg[u] for u in adj[v])
            for v in nodes
        }
    for v in nodes:
        assert got[v] == pytest.approx(round(r[v], 9), abs=1e-9), v
    # personalization: closer to the seed -> more mass
    assert got["a"] > got["c"] > got["e"]
    # seeds absent from the graph raise no error, just spread no mass
    ghost = {r2.ent: r2.rank
             for r2 in personalized_pagerank(e, ["zz"], iterations=2).collect()}
    assert all(v == 0.0 for v in ghost.values())
    with pytest.raises(ValueError):
        personalized_pagerank(e, [])


def test_time_decayed_agg_python_model(spark):
    """Decayed count/sum vs a pure-Python exp replay: half-life
    semantics (weight exactly halves per half-life), NULL values count
    weight but no sum, partitioning independence."""
    import datetime as dt
    import math

    import pytest

    from omop2obo_spark.operators.temporal import time_decayed_agg

    t0 = dt.datetime(2026, 1, 10, 0, 0, 0)
    hl = 3600
    rows = [
        (1, t0, 8.0),                                   # age 0 -> w 1
        (1, t0 - dt.timedelta(seconds=hl), 8.0),        # w 0.5
        (1, t0 - dt.timedelta(seconds=2 * hl), 8.0),    # w 0.25
        (1, t0 - dt.timedelta(seconds=hl), None),       # weight, no sum
        (2, t0 - dt.timedelta(seconds=3 * hl), 4.0),    # w 0.125
    ]
    e = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    for df in (e.repartition(7), e.coalesce(1)):
        got = {r.key: (r.n, r.decayed_n, r.decayed_sum)
               for r in time_decayed_agg(df, half_life_s=hl).collect()}
        assert got[1][0] == 4
        assert got[1][1] == pytest.approx(1 + 0.5 + 0.25 + 0.5, abs=1e-6)
        assert got[1][2] == pytest.approx(8 * (1 + 0.5 + 0.25), abs=1e-6)
        assert got[2] == (1, round(round(math.exp(-math.log(2) * 3), 9), 4),
                          round(round(math.exp(-math.log(2) * 3), 9) * 4.0, 4))
    with pytest.raises(ValueError):
        time_decayed_agg(e, half_life_s=0)


def test_temporal_split_no_leakage_and_fracs(spark):
    """Every train timestamp precedes every val timestamp precedes
    every test timestamp (THE property of the split); fractions hit the
    quantile targets; NULL ts surfaces as 'unsplit'; guards."""
    import datetime as dt

    import pytest

    from omop2obo_spark.operators.temporal import temporal_split

    t0 = dt.datetime(2026, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=i)) for i in range(100)]
    rows.append((100, None))
    e = spark.createDataFrame(rows, "event_id: long, ts: timestamp")
    out = temporal_split(e, train_frac=0.8, val_frac=0.1).collect()
    by_split = {}
    for r in out:
        by_split.setdefault(r.split, []).append(r.ts)
    assert max(by_split["train"]) < min(by_split["val"])
    assert max(by_split["val"]) < min(by_split["test"])
    assert len(by_split["train"]) == 80   # boundary row (q at idx 79.2->interp)
    assert len(by_split["val"]) == 10
    assert len(by_split["test"]) == 10
    assert by_split["unsplit"] == [None]
    with pytest.raises(ValueError):
        temporal_split(e, train_frac=0.8, val_frac=0.3)


def test_degree_distribution_hand_computed(spark):
    """Histogram + CSN alpha vs hand arithmetic on a star+path graph."""
    import math

    import pytest

    from omop2obo_spark.operators.hierarchy import degree_distribution

    # star hub h with 3 spokes + path x-y: degrees h=3, spokes=1×3, x=1, y=1... 
    # x-y: x=1, y=1 -> degree 1 ×5, degree 3 ×1
    e = _edges(spark, [("h", "s1"), ("h", "s2"), ("h", "s3"), ("x", "y")])
    got = {r.degree: (r.n_nodes, r.share, r.alpha, r.n_nodes_total)
           for r in degree_distribution(e).collect()}
    n = 6
    s = 5 * math.log(1 / 0.5) + math.log(3 / 0.5)
    alpha = round(1.0 + n / s, 6)
    assert got[1] == (5, round(5 / 6, 6), alpha, 6)
    assert got[3] == (1, round(1 / 6, 6), alpha, 6)
    assert set(got) == {1, 3}


def test_series_autocorr_known_patterns(spark):
    """r vs numpy corrcoef on an alternating series (r ≈ −1), a trend
    (r > 0), and the dense-completion property (a silent gap bucket
    enters as 0 and shifts r)."""
    import datetime as dt

    import numpy as np
    import pytest

    from omop2obo_spark.operators.temporal import series_autocorr

    t0 = dt.datetime(2026, 1, 1)

    def mk(counts):
        rows = []
        for i, n in enumerate(counts):
            rows += [(len(rows) + j, t0 + dt.timedelta(hours=i)) for j in range(n)]
        return spark.createDataFrame(rows, "event_id: long, ts: timestamp")

    alt = [5, 1, 5, 1, 5, 1, 5, 1]
    out = series_autocorr(mk(alt), bucket_s=3600, lag=1).collect()[0]
    xs = np.array(alt, dtype=float)
    want = np.corrcoef(xs[1:], xs[:-1])[0, 1]
    assert out.n_buckets == 8 and out.lag == 1
    assert out.r == pytest.approx(round(want, 6), abs=1e-6)
    assert out.r < -0.9
    trend = [1, 2, 3, 4, 5, 6, 7, 8]
    r_t = series_autocorr(mk(trend), bucket_s=3600, lag=1).collect()[0].r
    assert r_t > 0.9
    # gap completion: hours 0,1,3 populated -> hour 2 enters as 0
    gap = mk([3, 3, 0, 3])
    g = series_autocorr(gap, bucket_s=3600, lag=1).collect()[0]
    assert g.n_buckets == 4
    xs = np.array([3, 3, 0, 3], dtype=float)
    assert g.r == pytest.approx(round(np.corrcoef(xs[1:], xs[:-1])[0, 1], 6), abs=1e-6)
    with pytest.raises(ValueError):
        series_autocorr(gap, lag=0)
