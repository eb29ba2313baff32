"""OWL/XML → lexicon prep tool (sources/owl_prep.py).

Mirrors the reference's extraction semantics
(/root/reference/omop2obo/utils/ontology_utils.py:29-199): label /
definition / synonym / dbxref / exactmatch predicates matched by substring,
deprecated classes excluded, namespace filter on the class URI, all strings
lower-cased. The reference's own OWL fixture
(tests/data/ontologies/empty_hp_without_imports.owl) is an empty missing
blob, so the fixture here is a minimal RDF/XML document of the same shape
as OBO releases.
"""

from __future__ import annotations

import pytest

from omop2obo_spark.sources.owl_prep import (
    extract_hierarchy_edges,
    extract_lexicon_rows,
    owl_to_lexicon,
)

OWL_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0008181">
    <rdfs:label>Abetalipoproteinemia</rdfs:label>
    <obo:IAO_0000115>Inability to synthesize Apolipoprotein B.</obo:IAO_0000115>
    <oboInOwl:hasExactSynonym>ABL Neuropathy</oboInOwl:hasExactSynonym>
    <oboInOwl:hasDbXref>SNOMEDCT_US:190787008</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>UMLS:C0000744</oboInOwl:hasDbXref>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0100598">
    <rdfs:label>Pulmonary edema</rdfs:label>
    <oboInOwl:hasRelatedSynonym>Wet Lung</oboInOwl:hasRelatedSynonym>
    <rdfs:seeAlso rdf:resource="http://example.org/ignored"/>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/HP_0008181"/>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/MONDO_0000001"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/BFO_0000050"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/HP_0200999"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
  <rdf:Description rdf:about="http://purl.obolibrary.org/obo/HP_0200999">
    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
    <rdfs:label>Exact match carrier</rdfs:label>
    <oboInOwl:exactMatch>MESH:D000012</oboInOwl:exactMatch>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/HP_0100598"/>
  </rdf:Description>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0999999">
    <rdfs:label>Obsolete thing</rdfs:label>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/HP_0008181"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/MONDO_0000001">
    <rdfs:label>Other-namespace class</rdfs:label>
  </owl:Class>
  <owl:Axiom rdf:about="http://example.org/not-a-class">
    <rdfs:label>annotation axiom, no hp in uri</rdfs:label>
  </owl:Axiom>
</rdf:RDF>
"""


@pytest.fixture(scope="module")
def owl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("owl") / "mini_hp.owl"
    p.write_text(OWL_DOC)
    return str(p)


def test_extracts_all_kinds_lowercased(owl_file):
    rows = extract_lexicon_rows(owl_file, "hp")
    by_kind = {}
    for ont, kind, s, uri, subtype in rows:
        assert ont == "hp"
        by_kind.setdefault(kind, []).append((s, uri, subtype))
    hp1 = "http://purl.obolibrary.org/obo/HP_0008181"
    assert ("abetalipoproteinemia", hp1, None) in by_kind["label"]
    assert ("inability to synthesize apolipoprotein b.", hp1, None) in by_kind["definition"]
    assert ("abl neuropathy", hp1, "hasExactSynonym") in by_kind["synonym"]
    assert ("snomedct_us:190787008", hp1, "DbXref") in by_kind["dbxref"]
    assert ("umls:c0000744", hp1, "DbXref") in by_kind["dbxref"]
    # hasRelatedSynonym subtype preserved (predicate local name after '#')
    hp2 = "http://purl.obolibrary.org/obo/HP_0100598"
    assert ("wet lung", hp2, "hasRelatedSynonym") in by_kind["synonym"]
    # exactMatch → dbxref kind with ExactMatch subtype (ontology_utils.py:170-175)
    hp3 = "http://purl.obolibrary.org/obo/HP_0200999"
    assert ("mesh:d000012", hp3, "ExactMatch") in by_kind["dbxref"]


def test_deprecated_and_foreign_namespace_excluded(owl_file):
    rows = extract_lexicon_rows(owl_file, "hp")
    uris = {r[3] for r in rows}
    assert "http://purl.obolibrary.org/obo/HP_0999999" not in uris  # deprecated
    assert "http://purl.obolibrary.org/obo/MONDO_0000001" not in uris  # other ont
    assert "http://example.org/not-a-class" not in uris  # no 'hp' in URI... (filtered by class set)


def test_resource_objects_not_treated_as_strings(owl_file):
    rows = extract_lexicon_rows(owl_file, "hp")
    assert not any("example.org/ignored" in r[2] for r in rows)


def test_parquet_roundtrip_feeds_lexicon_dims(owl_file, tmp_path, spark):
    out = str(tmp_path / "hp_lexicon.parquet")
    n = owl_to_lexicon(owl_file, "hp", out)
    assert n > 0
    from omop2obo_spark.fixtures.generators import vocab_map_dict
    from omop2obo_spark.operators.linking import LexiconDims

    lex = spark.read.parquet(out)
    assert set(lex.columns) == {"ont", "kind", "norm_string", "uri", "subtype"}
    dims = LexiconDims.from_lexicon(lex, vocab_map_dict())
    dbx = {r.CODE for r in dims.dbxref.collect()}
    # normalization applied on the dim side: SNOMEDCT_US alias → snomed
    assert "snomed:190787008" in dbx
    labels = {r.LABEL for r in dims.labels.collect()}
    assert "abetalipoproteinemia" in labels


def test_extract_hierarchy_edges(owl_file):
    """subClassOf edges between kept classes only: deprecated subjects,
    foreign-namespace parents, and anonymous restriction parents (bnodes,
    no rdf:resource) are all excluded."""
    hp1 = "http://purl.obolibrary.org/obo/HP_0008181"
    hp2 = "http://purl.obolibrary.org/obo/HP_0100598"
    hp3 = "http://purl.obolibrary.org/obo/HP_0200999"
    edges = extract_hierarchy_edges(owl_file, "hp")
    assert (hp2, hp1) in edges
    assert (hp3, hp2) in edges
    subjects = {c for c, _ in edges}
    parents = {p for _, p in edges}
    assert "http://purl.obolibrary.org/obo/HP_0999999" not in subjects  # deprecated
    assert not any("MONDO" in p for p in parents)  # foreign namespace
    assert len(edges) == 2  # restriction parent contributed nothing


def test_edges_drive_distributed_closure(owl_file, tmp_path, spark):
    """OWL file → edge parquet → ancestor_closure: the end-to-end path a
    real deployment uses to build the broadcast closure dimension."""
    from omop2obo_spark.operators.hierarchy import ancestor_closure
    from omop2obo_spark.sources.owl_prep import write_edges_parquet

    out = str(tmp_path / "hp_edges.parquet")
    write_edges_parquet(extract_hierarchy_edges(owl_file, "hp"), out)
    closure = ancestor_closure(spark.read.parquet(out), "uri", "parent_uri")
    got = {(r.uri, r.ancestor_uri, r.depth) for r in closure.collect()}
    hp1 = "http://purl.obolibrary.org/obo/HP_0008181"
    hp2 = "http://purl.obolibrary.org/obo/HP_0100598"
    hp3 = "http://purl.obolibrary.org/obo/HP_0200999"
    assert got == {(hp2, hp1, 1), (hp3, hp2, 1), (hp3, hp1, 2)}
