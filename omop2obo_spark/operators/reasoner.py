"""Distributed KG reasoning: RDFS entailment, SHACL-lite validation,
and property-path evaluation over the triple store.

The reference resolves ontology semantics on the driver with rdflib —
one class at a time (/root/reference/omop2obo/utils/ontology_utils.py:229-266
walks ``subClassOf`` parents in a Python loop; dbxref/label lookups are
dict probes). Those semantics generalize to three KG-construction
operators a triple store at scale needs and rdflib cannot provide:

* :func:`rdfs_entail` — materialize the RDFS closure of an instance
  graph (the rho-df fragment: rules rdfs2/3/5/7/9/11 — domain, range,
  subPropertyOf transitivity + inheritance, subClassOf transitivity +
  type propagation; Munoz, Perez, Gutierrez, "Minimal deductive systems
  for RDF", 2007).
* :func:`shacl_validate` — SHACL-lite shape validation (minCount /
  maxCount / nodeKind / class targeting), emitting one row per
  violation, the QA gate a KG build runs before publishing.
* :func:`path_query` — SPARQL 1.1 property-path evaluation (sequence /
  alternation / Kleene star) over the edge table.

100 TB design (the WebPIE strategy, Urbani et al. 2010): RDFS is the
fragment whose ONLY recursion lives in the schema. ``subClassOf`` /
``subPropertyOf`` transitive closures are computed at schema scale
(10^3..10^6 dimension rows) with the iterative-doubling closure the
hierarchy tier already uses, then BROADCAST; every instance-level rule
is a single broadcast-join pass over the fact-scale triples — no
fixpoint, no repeated shuffle of instance data. The final dedup is the
one fact-scale shuffle, keyed on the full (subj, pred, obj) triple,
which is skew-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop2obo_spark.operators.hierarchy import ancestor_closure

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_SUBPROP = "rdfs:subPropertyOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"

_SCHEMA_PREDS = (RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE)


def split_schema(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a mixed triple table into (schema, instance) on predicate."""
    is_schema = F.col("pred").isin(*_SCHEMA_PREDS)
    return triples.filter(is_schema), triples.filter(~is_schema)


def rdfs_entail(
    instance: DataFrame,
    schema: DataFrame,
    max_rounds: int = 20,
) -> DataFrame:
    """Materialize the RDFS (rho-df) closure of ``instance`` under
    ``schema``.

    Both inputs are ``(subj, pred, obj)`` string triples; ``schema``
    holds the ``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` /
    ``rdfs:domain`` / ``rdfs:range`` rows, ``instance`` the
    ``rdf:type`` and plain property assertions.

    Returns distinct ``(subj, pred, obj, inferred)`` — the asserted
    triples plus everything rules rdfs2/3/5/7/9/11 derive, with
    ``inferred = false`` exactly for the asserted rows (an inferred
    triple that was also asserted reports false).

    Rule plan (each a broadcast join; no instance-side iteration):

    1. close ``subPropertyOf`` / ``subClassOf`` at schema scale
       (rdfs5/11, iterative doubling);
    2. rdfs7: rewrite every property assertion to all strict
       superproperties;
    3. rdfs2/3: apply domain/range over the rdfs7-expanded assertions
       (this is why 2 runs first — a superproperty's domain constrains
       a subproperty's subjects);
    4. rdfs9: propagate every type triple (asserted or derived in 3)
       to all strict superclasses.
    """
    inst = instance.select("subj", "pred", "obj")
    schema = schema.select("subj", "pred", "obj")

    sub_cls = ancestor_closure(
        schema.filter(F.col("pred") == RDFS_SUBCLASS).select(
            F.col("subj").alias("uri"), F.col("obj").alias("parent_uri")
        ),
        max_rounds=max_rounds,
    ).select(F.col("uri").alias("__cls"), F.col("ancestor_uri").alias("__sup"))
    sub_prp = ancestor_closure(
        schema.filter(F.col("pred") == RDFS_SUBPROP).select(
            F.col("subj").alias("uri"), F.col("obj").alias("parent_uri")
        ),
        max_rounds=max_rounds,
    ).select(F.col("uri").alias("__prp"), F.col("ancestor_uri").alias("__sup"))
    dom = schema.filter(F.col("pred") == RDFS_DOMAIN).select(
        F.col("subj").alias("__prp"), F.col("obj").alias("__cls")
    )
    rng = schema.filter(F.col("pred") == RDFS_RANGE).select(
        F.col("subj").alias("__prp"), F.col("obj").alias("__cls")
    )

    typed = inst.filter(F.col("pred") == RDF_TYPE)
    rel = inst.filter(F.col("pred") != RDF_TYPE)

    # rdfs7: (p subPropertyOf* q), (s p o) -> (s q o)
    rel7 = rel.join(F.broadcast(sub_prp), rel["pred"] == sub_prp["__prp"]).select(
        "subj", F.col("__sup").alias("pred"), "obj"
    )
    rel_all = rel.unionByName(rel7)

    # rdfs2/3 over the rdfs7-expanded assertions
    t_dom = rel_all.join(F.broadcast(dom), rel_all["pred"] == dom["__prp"]).select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("__cls").alias("obj")
    )
    t_rng = rel_all.join(F.broadcast(rng), rel_all["pred"] == rng["__prp"]).select(
        F.col("obj").alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.col("__cls").alias("obj"),
    )
    types_all = typed.unionByName(t_dom).unionByName(t_rng)

    # rdfs9: (c subClassOf* d), (s type c) -> (s type d)
    t_sup = types_all.join(
        F.broadcast(sub_cls), types_all["obj"] == sub_cls["__cls"]
    ).select("subj", "pred", F.col("__sup").alias("obj"))

    asserted = inst.unionByName(schema).withColumn("__inf", F.lit(0))
    derived = (
        rel7.unionByName(t_dom)
        .unionByName(t_rng)
        .unionByName(t_sup)
        .withColumn("__inf", F.lit(1))
    )
    return (
        asserted.unionByName(derived)
        .groupBy("subj", "pred", "obj")
        .agg(F.min("__inf").alias("__inf"))
        .select("subj", "pred", "obj", (F.col("__inf") == 1).alias("inferred"))
    )


def shacl_validate(instance: DataFrame, shapes: DataFrame) -> DataFrame:
    """SHACL-lite shape validation over an instance graph.

    ``shapes`` is the constraint dimension, one row per
    (shape, property) constraint:
    ``(shape_id, target_class, path, min_count, max_count, node_kind,
    value_class)`` — ``min_count``/``max_count`` nullable ints,
    ``node_kind`` in {'IRI', 'Literal', NULL}, ``value_class`` a class
    URI or NULL. Focus nodes are the subjects typed as ``target_class``
    (validate the rdfs_entail output to get subclass targeting — SHACL
    semantics validate the inferred graph).

    Node kind uses CURIE syntax: a value containing ``':'`` is an IRI,
    anything else a Literal.

    Returns one row per violation:
    ``(focus, shape_id, path, constraint, observed, expected)`` with
    ``constraint`` in {'minCount', 'maxCount', 'nodeKind', 'class'};
    ``observed`` is the offending count or value, ``expected`` the
    bound / kind / class.

    Scale shape: shapes and the typed-target dimension join broadcast;
    the one fact-scale shuffle is the (focus, shape, path) cardinality
    count, map-side combined. Value-class checks are a left_anti against
    the type table on the value key.
    """
    shp = F.broadcast(
        shapes.select(
            "shape_id",
            "target_class",
            "path",
            F.col("min_count").cast("long").alias("min_count"),
            F.col("max_count").cast("long").alias("max_count"),
            "node_kind",
            "value_class",
        )
    )
    typed = instance.filter(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("focus"), F.col("obj").alias("cls")
    )
    focus = typed.join(shp, typed["cls"] == shp["target_class"]).drop("cls")

    vals = instance.filter(F.col("pred") != RDF_TYPE).select(
        F.col("subj").alias("focus"),
        F.col("pred").alias("path"),
        F.col("obj").alias("value"),
    )

    # Cardinality: count values per (focus, shape, path); a left join so
    # zero-valued paths still produce a row for minCount.
    counted = (
        focus.join(vals, ["focus", "path"], "left")
        .groupBy(
            "focus", "shape_id", "path", "min_count", "max_count",
            "node_kind", "value_class",
        )
        .agg(F.count("value").alias("__n"))
    )
    v_min = counted.filter(
        F.col("min_count").isNotNull() & (F.col("__n") < F.col("min_count"))
    ).select(
        "focus",
        "shape_id",
        "path",
        F.lit("minCount").alias("constraint"),
        F.col("__n").cast("string").alias("observed"),
        F.col("min_count").cast("string").alias("expected"),
    )
    v_max = counted.filter(
        F.col("max_count").isNotNull() & (F.col("__n") > F.col("max_count"))
    ).select(
        "focus",
        "shape_id",
        "path",
        F.lit("maxCount").alias("constraint"),
        F.col("__n").cast("string").alias("observed"),
        F.col("max_count").cast("string").alias("expected"),
    )

    pairs = focus.join(vals, ["focus", "path"])
    is_iri = F.col("value").contains(":")
    v_kind = pairs.filter(
        F.col("node_kind").isNotNull()
        & (
            ((F.col("node_kind") == "IRI") & ~is_iri)
            | ((F.col("node_kind") == "Literal") & is_iri)
        )
    ).select(
        "focus",
        "shape_id",
        "path",
        F.lit("nodeKind").alias("constraint"),
        F.col("value").alias("observed"),
        F.col("node_kind").alias("expected"),
    )

    class_pairs = pairs.filter(F.col("value_class").isNotNull())
    typed_vals = typed.select(
        F.col("focus").alias("value"), F.col("cls").alias("value_class")
    ).distinct()
    v_class = class_pairs.join(
        typed_vals, ["value", "value_class"], "left_anti"
    ).select(
        "focus",
        "shape_id",
        "path",
        F.lit("class").alias("constraint"),
        F.col("value").alias("observed"),
        F.col("value_class").alias("expected"),
    )

    return (
        v_min.unionByName(v_max).unionByName(v_kind).unionByName(v_class).distinct()
    )


def path_query(
    triples: DataFrame,
    steps: list[dict],
    max_rounds: int = 20,
) -> DataFrame:
    """Evaluate a SPARQL 1.1 property path as a step sequence.

    ``steps`` is an ordered list of ``{"preds": [...], "star": bool}``:
    each step follows any predicate in ``preds`` (alternation ``p|q``);
    ``star`` makes the step Kleene-star (``(p|q)*`` — zero or more
    hops). Steps compose by sequence (``/``). The FIRST step must be
    non-star (a leading ``*`` makes every graph node a source; bind the
    source set first, as SPARQL engines require for bottom-up safety).

    Returns distinct ``(src, dst)`` — every pair connected by the path.

    Scale shape: non-star steps are one equi-join each on the frontier
    node. A star step closes ONLY its predicate subset (iterative
    doubling, O(log diameter) dimension-scale rounds when the starred
    predicate is hierarchy-like) and joins the frontier once against the
    closure; the zero-hop case is the frontier itself, no join. Frontier
    rows carry (src, cur) only — never triple payloads.
    """
    if not steps:
        raise ValueError("property path needs at least one step")
    if steps[0].get("star"):
        raise ValueError("first path step must be non-star (unbound source)")

    frontier: DataFrame | None = None
    for step in steps:
        preds = step["preds"]
        edges = triples.filter(F.col("pred").isin(*preds)).select(
            F.col("subj").alias("__from"), F.col("obj").alias("__to")
        )
        if step.get("star"):
            closure = ancestor_closure(
                edges.select(
                    F.col("__from").alias("uri"), F.col("__to").alias("parent_uri")
                ),
                max_rounds=max_rounds,
            ).select(
                F.col("uri").alias("__from"), F.col("ancestor_uri").alias("__to")
            )
            assert frontier is not None
            hopped = frontier.join(
                closure, frontier["cur"] == closure["__from"]
            ).select("src", F.col("__to").alias("cur"))
            frontier = frontier.unionByName(hopped).distinct()
        elif frontier is None:
            frontier = edges.select(
                F.col("__from").alias("src"), F.col("__to").alias("cur")
            ).distinct()
        else:
            frontier = (
                frontier.join(edges, frontier["cur"] == edges["__from"])
                .select("src", F.col("__to").alias("cur"))
                .distinct()
            )
    assert frontier is not None
    return frontier.select("src", F.col("cur").alias("dst")).distinct()
