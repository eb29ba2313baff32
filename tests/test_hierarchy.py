"""Distributed ancestor closure (operators/hierarchy.py).

Ground truth: a naive Python BFS closure over the same edges — the model
the iterative-doubling implementation must match exactly, including
shortest-path depths on DAGs with multiple parents.
"""

from __future__ import annotations

from collections import deque

from omop2obo_spark.operators.hierarchy import ancestor_closure


def naive_closure(edges: list[tuple[str, str]]) -> set[tuple[str, str, int]]:
    parents: dict[str, set[str]] = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    out = set()
    for node in {c for c, _ in edges}:
        dist = {node: 0}
        q = deque([node])
        while q:
            cur = q.popleft()
            for p in parents.get(cur, ()):
                if p not in dist:
                    dist[p] = dist[cur] + 1
                    q.append(p)
        out |= {(node, anc, d) for anc, d in dist.items() if anc != node}
    return out


def run(spark, edges):
    df = spark.createDataFrame(edges, "uri string, parent_uri string")
    return {
        (r.uri, r.ancestor_uri, r.depth)
        for r in ancestor_closure(df).collect()
    }


def test_chain_and_dag_shortest_depths(spark):
    # chain a→b→c→d plus a shortcut a→c: depth(a,c) must be 1, not 2,
    # and depth(a,d) 2 via the shortcut, not 3 via the chain
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    assert run(spark, edges) == naive_closure(edges)
    got = dict(((u, a), d) for u, a, d in run(spark, edges))
    assert got[("a", "c")] == 1 and got[("a", "d")] == 2


def test_multi_parent_dag_and_duplicate_edges(spark):
    # e has two parents converging on a root; duplicate input edges collapse
    edges = [("e", "b"), ("e", "c"), ("b", "a"), ("c", "a"), ("e", "b")]
    assert run(spark, edges) == naive_closure(edges)


def test_deep_chain_needs_doubling(spark):
    # 17-deep chain: 1-step expansion would need 16 rounds; doubling
    # converges in ceil(log2(16)) + 1 = 5 — covered by max_rounds default
    edges = [(f"n{i}", f"n{i+1}") for i in range(16)]
    got = run(spark, edges)
    assert got == naive_closure(edges)
    assert ("n0", "n16", 16) in got


def test_empty_and_null_edges(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "b")], "uri string, parent_uri string"
    )
    assert ancestor_closure(df).count() == 0


def test_entity_cooccurrence_pmi(spark):
    """entity_cooccurrence vs a Python replay: pair counts from distinct
    per-conversation entity sets (duplicate mentions collapse), excluded
    predicates ignored, PMI = ln(c_ab*N/(c_a*c_b)) rounded to 6dp."""
    import math
    from collections import Counter
    from itertools import combinations

    from omop2obo_spark.operators.hierarchy import entity_cooccurrence

    P = "omop2obo:hasExactMapping"
    rows = [
        ("c1", 0, "t:m1", P, "obo:A"),
        ("c1", 1, "t:m2", P, "obo:B"),
        ("c1", 2, "t:m3", P, "obo:B"),            # dup mention collapses
        ("c2", 0, "t:m4", P, "obo:A"),
        ("c2", 1, "t:m5", P, "obo:B"),
        ("c3", 0, "t:m6", P, "obo:A"),
        ("c3", 1, "t:m7", P, "obo:C"),
        ("c4", 0, "t:m8", P, "obo:D"),
        ("c4", 1, "t:m9", "omop2obo:mentionOf", "obo:E"),  # excluded pred
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, obj string"
    )
    got = {(r.ent_a, r.ent_b): (r.n_convs, r.pmi) for r in entity_cooccurrence(tr).collect()}

    sets = {}
    for conv, _i, _s, pred, obj in rows:
        if pred == P:
            sets.setdefault(conv, set()).add(obj)
    n_total = len(sets)
    c = Counter(e for s in sets.values() for e in s)
    pc = Counter()
    for s in sets.values():
        for a, b in combinations(sorted(s), 2):
            pc[(a, b)] += 1
    exp = {
        k: (v, round(math.log(v * n_total / (c[k[0]] * c[k[1]])), 6))
        for k, v in pc.items()
    }
    assert got == exp
    assert ("obo:A", "obo:B") in got and got[("obo:A", "obo:B")][0] == 2


def test_sameas_bridge_cross_ont_only_with_hub_guard(spark):
    from omop2obo_spark.operators.hierarchy import sameas_bridge

    obo = "http://purl.obolibrary.org/obo/"
    rows = (
        # code shared hp<->mondo twice (two codes support the same pair)
        [(obo + "HP_1", "hp", "snomed:1"), (obo + "MONDO_1", "mondo", "snomed:1"),
         (obo + "HP_1", "hp", "umls:c9"), (obo + "MONDO_1", "mondo", "umls:c9")]
        # code shared within ONE ontology only -> no sameAs
        + [(obo + "HP_2", "hp", "snomed:2"), (obo + "HP_3", "hp", "snomed:2")]
        # three-ontology code -> all cross-ont pairs, ordered by ont
        + [(obo + "HP_4", "hp", "msh:d1"), (obo + "MONDO_4", "mondo", "msh:d1"),
           (obo + "CHEBI_4", "chebi", "msh:d1")]
        # hub code above max_group -> dropped entirely
        + [(obo + f"HP_{100 + i}", "hp", "umls:hub") for i in range(5)]
        + [(obo + "MONDO_9", "mondo", "umls:hub")]
    )
    dim = spark.createDataFrame(rows, "uri string, ont string, code string")
    got = {
        (r.subj, r.obj): r.n_shared_codes
        for r in sameas_bridge(dim, max_group=4).collect()
    }
    assert got == {
        ("obo:HP_1", "obo:MONDO_1"): 2,
        ("obo:CHEBI_4", "obo:HP_4"): 1,   # ont order: chebi < hp < mondo
        ("obo:CHEBI_4", "obo:MONDO_4"): 1,
        ("obo:HP_4", "obo:MONDO_4"): 1,
    }
    preds = {r.pred for r in sameas_bridge(dim, max_group=4).collect()}
    assert preds == {"owl:sameAs"}


def test_pagerank_matches_python_power_method(spark):
    from omop2obo_spark.operators.hierarchy import pagerank

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "ent_a string, ent_b string")
    got = {r.ent: r.rank for r in pagerank(df, damping=0.85, iterations=3).collect()}

    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({x for e in und for x in e})
    deg = {v: sum(1 for s, _ in und if s == v) for v in nodes}
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            s = sum(rank[u] / deg[u] for (u, w) in und if w == v)
            nxt[v] = (1.0 - 0.85) / n + 0.85 * s
        rank = nxt
    exp = {v: round(rank[v], 9) for v in nodes}
    assert set(got) == set(exp)
    for v in nodes:
        assert abs(got[v] - exp[v]) < 1e-9, (v, got[v], exp[v])
    # ranks form a probability distribution (no dangling mass loss)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_triple_diff_per_pred_added_removed(spark):
    from omop2obo_spark.operators.hierarchy import triple_diff

    before = spark.createDataFrame(
        [
            ("s1", "p_keep", "o1"),      # unchanged
            ("s2", "p_mixed", "o2"),     # removed
            ("s3", "p_mixed", "o3"),     # unchanged
            ("s4", "p_gone", "o4"),      # predicate disappears entirely
            ("s4", "p_gone", "o4"),      # duplicate row: sets, not bags
        ],
        "subj string, pred string, obj string",
    )
    after = spark.createDataFrame(
        [
            ("s1", "p_keep", "o1"),
            ("s3", "p_mixed", "o3"),
            ("s5", "p_mixed", "o5"),     # added under existing pred
            ("s6", "p_new", "o6"),       # brand-new predicate
        ],
        "subj string, pred string, obj string",
    )
    got = {r.pred: (r.n_added, r.n_removed) for r in triple_diff(before, after).collect()}
    assert got == {
        "p_keep": (0, 0),
        "p_mixed": (1, 1),
        "p_gone": (0, 1),
        "p_new": (1, 0),
    }


def test_k_hop_min_distance_multi_seed(spark):
    from omop2obo_spark.operators.hierarchy import k_hop

    #   a-b-c-d-e   f-g  (disconnected),  seeds {a, f}
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "g")]
    df = spark.createDataFrame(edges, "ent_a string, ent_b string")
    seeds = spark.createDataFrame([("a",), ("f",)], "ent string")
    got = {r.ent: r.hop for r in k_hop(df, seeds, k=2).collect()}
    assert got == {"a": 0, "f": 0, "b": 1, "g": 1, "c": 2}
    # k=0 returns just the seeds
    got0 = {r.ent: r.hop for r in k_hop(df, seeds, k=0).collect()}
    assert got0 == {"a": 0, "f": 0}


def test_propagate_sameas_infers_and_skips_asserted(spark):
    from omop2obo_spark.operators.hierarchy import propagate_sameas

    triples = spark.createDataFrame(
        [
            ("m1", "omop2obo:hasExactMapping", "obo:HP_1"),
            ("m2", "omop2obo:hasConstructorMapping", "obo:MONDO_2"),
            ("m2", "omop2obo:hasExactMapping", "obo:HP_2"),   # asserted both ways
            ("m3", "omop2obo:hasEvidence", "obo:HP_1"),       # non-mapping pred: ignored
        ],
        "subj string, pred string, obj string",
    )
    sameas = spark.createDataFrame(
        [("obo:HP_1", "owl:sameAs", "obo:MONDO_1"),
         ("obo:HP_2", "owl:sameAs", "obo:MONDO_2")],
        "subj string, pred string, obj string",
    )
    got = {(r.subj, r.pred, r.obj) for r in propagate_sameas(triples, sameas).collect()}
    assert got == {
        ("m1", "omop2obo:hasInferredMapping", "obo:MONDO_1"),
        # m2: HP_2->MONDO_2 suppressed (asserted), MONDO_2->HP_2 suppressed too
    }


def test_canonicalize_entities_rewrites_components(spark):
    from omop2obo_spark.operators.hierarchy import canonicalize_entities

    triples = spark.createDataFrame(
        [
            ("m1", "omop2obo:hasExactMapping", "obo:MONDO_1"),
            ("m1", "omop2obo:hasExactMapping", "obo:HP_1"),   # same entity → collapses
            ("m2", "omop2obo:hasExactMapping", "obo:CHEBI_9"),  # untouched
            ("obo:MONDO_1", "owl:sameAs", "obo:ZFA_1"),         # subj rewritten too
        ],
        "subj string, pred string, obj string",
    )
    sameas = spark.createDataFrame(
        [("obo:HP_1", "owl:sameAs", "obo:MONDO_1"),
         ("obo:MONDO_1", "owl:sameAs", "obo:ZFA_1")],  # chain: all → obo:HP_1
        "subj string, pred string, obj string",
    )
    got = {(r.subj, r.pred, r.obj) for r in canonicalize_entities(triples, sameas).collect()}
    assert got == {
        ("m1", "omop2obo:hasExactMapping", "obo:HP_1"),
        ("m2", "omop2obo:hasExactMapping", "obo:CHEBI_9"),
        ("obo:HP_1", "owl:sameAs", "obo:HP_1"),
    }


def test_hits_matches_python_model(spark):
    """HITS on a known directed graph vs a Python replay of the exact
    L1-normalized iteration; bipartite roles (pure sources have auth 0,
    pure sinks hub 0); partitioning-independent."""
    import pytest

    from omop2obo_spark.operators.hierarchy import hits

    edges = [
        ("d1", "c1"), ("d1", "c2"), ("d1", "c3"),
        ("d2", "c1"), ("d2", "c2"),
        ("d3", "c3"),
        ("c1", "c3"),  # non-bipartite edge: c1 is both hub and authority
    ]
    df = spark.createDataFrame(edges, "src string, dst string")

    def model(iters: int = 3):
        srcs = sorted({s for s, _ in edges})
        h = {s: 1.0 for s in srcs}
        a = {}
        for _ in range(iters):
            a = {}
            for s, d in edges:
                a[d] = a.get(d, 0.0) + h.get(s, 0.0)
            tot = sum(a.values())
            a = {k: v / tot for k, v in a.items()}
            h = {}
            for s, d in edges:
                h[s] = h.get(s, 0.0) + a.get(d, 0.0)
            tot = sum(h.values())
            h = {k: v / tot for k, v in h.items()}
        ents = set(h) | set(a)
        return {e: (round(h.get(e, 0.0), 9), round(a.get(e, 0.0), 9)) for e in ents}

    got = {r.ent: (r.hub, r.auth) for r in hits(df).collect()}
    want = model()
    assert set(got) == set(want)
    for ent in want:
        assert got[ent][0] == pytest.approx(want[ent][0], abs=2e-9), ent
        assert got[ent][1] == pytest.approx(want[ent][1], abs=2e-9), ent
    # pure sources never gain authority; pure sinks never gain hubness
    assert got["d1"][1] == 0.0 and got["d2"][1] == 0.0 and got["d3"][1] == 0.0
    assert got["c2"][0] == 0.0 and got["c3"][0] == 0.0
    # c1 has both roles in this graph
    assert got["c1"][0] > 0.0 and got["c1"][1] > 0.0

    got2 = {r.ent: (r.hub, r.auth) for r in hits(df.repartition(5)).collect()}
    assert got2 == got

    with pytest.raises(ValueError, match="iterations"):
        hits(df, iterations=0)


def test_cycle_members_detects_min_cycle_lengths(spark):
    from omop2obo_spark.operators.hierarchy import cycle_members

    # DAG part (x→y→z) plus two overlapping cycles: a→b→c→a (len 3) and
    # a→b→a (len 2). Min per node: a,b → 2 (the short cycle), c → 3.
    edges = [("x", "y"), ("y", "z"),
             ("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]
    df = spark.createDataFrame(edges, "uri string, parent_uri string")
    got = {(r.uri, r.cycle_len) for r in cycle_members(df).collect()}
    assert got == {("a", 2), ("b", 2), ("c", 3)}


def test_cycle_members_empty_on_dag(spark):
    from omop2obo_spark.operators.hierarchy import cycle_members

    edges = [("a", "b"), ("b", "c"), ("a", "c")]
    df = spark.createDataFrame(edges, "uri string, parent_uri string")
    assert cycle_members(df).count() == 0


def test_star_join_patterns_and_projection(spark):
    import pytest

    from omop2obo_spark.operators.hierarchy import star_join

    rows = [
        # s1 matches all three patterns; :maps is multi-valued → min obj
        ("s1", ":cat", "exact"), ("s1", ":maps", "B"), ("s1", ":maps", "A"),
        ("s1", ":of", "c1"),
        # s2 fails the pinned-literal pattern
        ("s2", ":cat", "fuzzy"), ("s2", ":maps", "C"), ("s2", ":of", "c2"),
        # s3 lacks :of entirely
        ("s3", ":cat", "exact"), ("s3", ":maps", "D"),
        # duplicate assertions collapse before aggregation
        ("s1", ":cat", "exact"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = star_join(
        t,
        required={":cat": "exact", ":maps": None, ":of": None},
        select={":maps": "cls", ":of": "conv"},
    )
    assert set(got.columns) == {"subj", "cls", "conv"}
    assert [tuple(r) for r in got.collect()] == [("s1", "A", "c1")]
    with pytest.raises(ValueError):
        star_join(t, required={}, select={})


def _closure_rows(df):
    return {(r.uri, r.ancestor_uri, r.depth) for r in df.collect()}


def test_delta_closure_equals_full_recompute(spark):
    from omop2obo_spark.operators.hierarchy import ancestor_closure_delta

    base_edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    new_edges = [("y", "a"), ("d", "e")]  # joins two components + extends chain
    base = ancestor_closure(spark.createDataFrame(base_edges, ["uri", "parent_uri"]))
    out = ancestor_closure_delta(
        base, spark.createDataFrame(new_edges, ["uri", "parent_uri"])
    )
    full = ancestor_closure(
        spark.createDataFrame(base_edges + new_edges, ["uri", "parent_uri"])
    )
    assert _closure_rows(out.select("uri", "ancestor_uri", "depth")) == _closure_rows(
        full
    )
    # is_new marks exactly the pairs absent from the base closure here
    base_pairs = {(u, a) for u, a, _ in _closure_rows(base)}
    for r in out.collect():
        assert r.is_new == ((r.uri, r.ancestor_uri) not in base_pairs)


def test_delta_closure_improves_depth_on_shortcut(spark):
    from omop2obo_spark.operators.hierarchy import ancestor_closure_delta

    # chain a->b->c->d (a reaches d at depth 3); shortcut a->c improves
    # a->d to 2 and a->c to 1 without adding any new pair
    base_edges = [("a", "b"), ("b", "c"), ("c", "d")]
    base = ancestor_closure(spark.createDataFrame(base_edges, ["uri", "parent_uri"]))
    out = ancestor_closure_delta(
        base, spark.createDataFrame([("a", "c")], ["uri", "parent_uri"])
    )
    rows = {(r.uri, r.ancestor_uri): (r.depth, r.is_new) for r in out.collect()}
    assert rows[("a", "c")] == (1, True)
    assert rows[("a", "d")] == (2, True)   # improved -> flagged
    assert rows[("a", "b")] == (1, False)  # untouched
    assert rows[("b", "d")] == (2, False)
    full = ancestor_closure(
        spark.createDataFrame(base_edges + [("a", "c")], ["uri", "parent_uri"])
    )
    assert {
        (u, a, d) for (u, a), (d, _) in rows.items()
    } == _closure_rows(full)


def test_delta_closure_noop_when_new_edges_add_nothing(spark):
    from omop2obo_spark.operators.hierarchy import ancestor_closure_delta

    base_edges = [("a", "b"), ("b", "c")]
    base = ancestor_closure(spark.createDataFrame(base_edges, ["uri", "parent_uri"]))
    # re-ingesting an existing edge changes nothing
    out = ancestor_closure_delta(
        base, spark.createDataFrame([("a", "b")], ["uri", "parent_uri"])
    )
    assert _closure_rows(out.select("uri", "ancestor_uri", "depth")) == _closure_rows(
        base
    )
    assert out.filter(out.is_new).count() == 0


def test_k_core_peels_tail_keeps_clique(spark):
    """4-clique + attached 3-node tail at k=2: the tail must peel away
    layer by layer (its outermost node first — requires >1 round), the
    clique survives with within-core degree 3."""
    from omop2obo_spark.operators.hierarchy import k_core

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tail = [("d", "x"), ("x", "y"), ("y", "z")]
    edges = spark.createDataFrame(clique + tail, "ent_a string, ent_b string")
    got = {r.ent: r.core_deg for r in k_core(edges, k=2).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k_core_empty_on_forest(spark):
    from omop2obo_spark.operators.hierarchy import k_core

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "ent_a string, ent_b string"
    )
    assert k_core(edges, k=2).count() == 0


def test_k_core_k3_inside_k2(spark):
    """Triangle + 4-clique sharing a node: at k=3 only the clique
    remains; at k=2 both survive."""
    from omop2obo_spark.operators.hierarchy import k_core

    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tri = [("d", "p"), ("p", "q"), ("q", "d")]
    edges = spark.createDataFrame(clique + tri, "ent_a string, ent_b string")
    at2 = {r.ent for r in k_core(edges, k=2).collect()}
    at3 = {r.ent for r in k_core(edges, k=3).collect()}
    assert at2 == {"a", "b", "c", "d", "p", "q"}
    assert at3 == {"a", "b", "c", "d"}


def test_k_core_raises_without_fixpoint(spark):
    """A long path at k=2 peels two endpoints per round; with too few
    rounds the loop must RAISE, never report interior path nodes as
    core members."""
    import pytest as _pt

    from omop2obo_spark.operators.hierarchy import k_core

    path = [(f"n{i}", f"n{i+1}") for i in range(12)]
    edges = spark.createDataFrame(path, "ent_a string, ent_b string")
    with _pt.raises(RuntimeError, match="fixpoint"):
        k_core(edges, k=2, max_rounds=3)
    # with enough rounds the same graph converges to the empty 2-core
    assert k_core(edges, k=2, max_rounds=20).count() == 0


def test_sssp_matches_dijkstra_model(spark):
    """Relaxation fixpoint equals a Python Dijkstra on a weighted graph
    with a tempting-but-wrong greedy hop (direct edge 5.0 vs two-hop
    1.0+1.5); unreachable nodes absent; negative weights rejected."""
    import heapq

    import pytest as _pt

    from omop2obo_spark.operators.hierarchy import sssp

    edges = [("a", "b", 1.0), ("b", "c", 1.5), ("a", "c", 5.0),
             ("c", "d", 0.5), ("x", "y", 1.0)]
    e = spark.createDataFrame(edges, "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "ent string")
    got = {r.ent: r.dist for r in sssp(e, seeds).collect()}

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist = {"a": 0.0}
    pq = [(0.0, "a")]
    while pq:
        dd, u = heapq.heappop(pq)
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got == {k: round(v, 9) for k, v in dist.items()}
    assert "x" not in got and "y" not in got
    assert got["c"] == 2.5 and got["d"] == 3.0

    neg = spark.createDataFrame([("a", "b", -1.0)], "src string, dst string, w double")
    with _pt.raises(ValueError, match="non-negative"):
        sssp(neg, seeds)


def test_sssp_raises_without_convergence(spark):
    import pytest as _pt

    from omop2obo_spark.operators.hierarchy import sssp

    chain = [(f"n{i}", f"n{i+1}", 1.0) for i in range(10)]
    e = spark.createDataFrame(chain, "src string, dst string, w double")
    seeds = spark.createDataFrame([("n0",)], "ent string")
    with _pt.raises(RuntimeError, match="converge"):
        sssp(e, seeds, max_rounds=3)
