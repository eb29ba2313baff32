"""Canonicalization goldens from the reference's own compile tests
(/root/reference/tests/test_data_utils.py:457-562)."""

from pyspark.sql import functions as F

from omop2obo_spark.fixtures import lexicon_df
from omop2obo_spark.operators.compile import (
    compile_exact_mappings,
    compile_mappings,
    compile_similarity_mappings,
)
from omop2obo_spark.operators.linking import LINK_VALUE_COLS

LINK_SCHEMA = (
    "mention_id string, LEVEL string, CODE string, CODE_COLUMN string, URI string, "
    "ONT_TYPE string, LABEL string, EVIDENCE string, MATCH_KIND string, "
    "MATCH_SUBTYPE string, src_rank int, tier_rank int"
)


def _labels(spark):
    return (
        lexicon_df(spark)
        .filter(F.col("kind") == "label")
        .select(F.col("uri").alias("URI"), F.col("norm_string").alias("LABEL"))
    )


def test_exact_compile_golden_abetalipoproteinemia(spark):
    # mirrors tests_aggregates_mapping_results_full_SimResults goldens
    links = spark.createDataFrame(
        [
            ("4098595", "concept", "snomed:190787008", "CONCEPT_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0008181", "HP", "abetalipoproteinemia",
             "CONCEPT_DBXREF_snomed:190787008", "dbxref", "DbXref", 0, 0),
            ("4098595", "concept", "abetalipoproteinemia", "CONCEPT_SOURCE_LABEL",
             "http://purl.obolibrary.org/obo/HP_0008181", "HP", "abetalipoproteinemia",
             "CONCEPT_SOURCE_LABEL:abetalipoproteinemia", "label", "LABEL", 0, 0),
        ],
        LINK_SCHEMA,
    )
    out = compile_exact_mappings(links, ["mention_id"]).collect()[0]
    assert out.AGG_URI == "HP_0008181"
    assert out.AGG_LABEL == "abetalipoproteinemia"
    assert out.AGG_MAPPING == "Automatic Exact - Concept"
    assert out.AGG_EVIDENCE == (
        "OBO_DbXref-OMOP_CONCEPT_CODE:snomed_190787008 | "
        "OBO_LABEL-OMOP_CONCEPT_LABEL:abetalipoproteinemia"
    )


def test_exact_compile_concept_beats_ancestor(spark):
    links = spark.createDataFrame(
        [
            ("m", "ancestor", "snomed:19242006", "ANCESTOR_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0002088", "HP", "abnormal lung morphology",
             "ANCESTOR_DBXREF_snomed:19242006", "dbxref", "DbXref", 0, 0),
            ("m", "concept", "snomed:190787008", "CONCEPT_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0008181", "HP", "abetalipoproteinemia",
             "CONCEPT_DBXREF_snomed:190787008", "dbxref", "DbXref", 0, 0),
        ],
        LINK_SCHEMA,
    )
    out = compile_exact_mappings(links, ["mention_id"]).collect()[0]
    assert out.AGG_URI == "HP_0008181"  # ancestor row dropped
    assert out.AGG_MAPPING == "Automatic Exact - Concept"


def test_exact_compile_ancestor_categories(spark):
    links = spark.createDataFrame(
        [
            ("m", "ancestor", "snomed:11263005", "ANCESTOR_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0011276", "HP", "vascular skin abnormality",
             "ANCESTOR_DBXREF_snomed:11263005", "dbxref", "DbXref", 0, 0),
            ("m", "ancestor", "msh:d012871", "ANCESTOR_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0000951", "HP", "abnormality of the skin",
             "ANCESTOR_DBXREF_msh:d012871", "dbxref", "DbXref", 1, 0),
        ],
        LINK_SCHEMA,
    )
    out = compile_exact_mappings(links, ["mention_id"]).collect()[0]
    # reference-exact: dbxref-only ancestor evidence lacks the
    # ANCESTOR_SYNONYM/ANCESTOR_LABEL markers, so the reference's
    # assigns_mapping_category any-not-in check (data_utils.py:537-541)
    # lands in the '- Concept' branch even for ancestor-level links
    assert out.AGG_MAPPING == "Automatic Constructor - Concept"
    assert out.AGG_URI == "HP_0011276 | HP_0000951"


def test_exact_compile_ancestor_category_requires_all_three_markers(spark):
    # the reference's '- Ancestor' branch is reachable only when the
    # compiled evidence carries ALL of ANCESTOR_CODE, ANCESTOR_LABEL and
    # ANCESTOR_SYNONYM (data_utils.py:537-541); a fully-evidenced
    # ancestor-only group (dbxref + label + synonym matches) gets it
    links = spark.createDataFrame(
        [
            ("m", "ancestor", "snomed:11263005", "ANCESTOR_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0011276", "HP", "vascular skin abnormality",
             "ANCESTOR_DBXREF_snomed:11263005", "dbxref", "DbXref", 0, 0),
            ("m", "ancestor", "vascular skin abnormality", "ANCESTOR_LABEL",
             "http://purl.obolibrary.org/obo/HP_0011276", "HP", "vascular skin abnormality",
             "ANCESTOR_LABEL:vascular skin abnormality", "label", "LABEL", 0, 1),
            ("m", "ancestor", "vascular skin abnormalities", "ANCESTOR_SYNONYM",
             "http://purl.obolibrary.org/obo/HP_0011276", "HP", "vascular skin abnormality",
             "ANCESTOR_SYNONYM:vascular skin abnormalities", "synonym", "hasExactSynonym", 0, 2),
        ],
        LINK_SCHEMA,
    )
    out = compile_exact_mappings(links, ["mention_id"]).collect()[0]
    assert out.AGG_MAPPING == "Automatic Exact - Ancestor"
    assert "ANCESTOR_CODE" in out.AGG_EVIDENCE
    assert "ANCESTOR_LABEL" in out.AGG_EVIDENCE
    assert "ANCESTOR_SYNONYM" in out.AGG_EVIDENCE


def test_sim_compile_one_short_circuit(spark):
    # scenario 1 (tests_filters_mapping_content_scenario1): a 1.0 match
    # suppresses everything else; single match → Manual Exact
    sim = spark.createDataFrame(
        [("m", "HP_0008181", 1.0, 1), ("m", "HP_0100598", 0.7, 2)],
        "mention_id string, sim_uri string, score double, rank int",
    )
    out = compile_similarity_mappings(sim, _labels(spark), ["mention_id"]).collect()[0]
    assert out.SIM_URI == "HP_0008181"
    assert out.SIM_LABEL == "abetalipoproteinemia"
    assert out.SIM_MAPPING == "Manual Exact - Concept Similarity"
    assert out.SIM_EVIDENCE == "CONCEPT_SIMILARITY:HP_0008181_1.0"


def test_sim_compile_threshold_keep_and_constructor(spark):
    # scenario 2 semantics at threshold 0.25: both ≥ threshold stay; two
    # matches → Automatic Constructor - Concept; evidence in rank order
    sim = spark.createDataFrame(
        [("m", "HP_0100310", 0.786, 1), ("m", "HP_0100309", 0.75, 2)],
        "mention_id string, sim_uri string, score double, rank int",
    )
    out = compile_similarity_mappings(sim, _labels(spark), ["mention_id"]).collect()[0]
    assert out.SIM_URI == "HP_0100310 | HP_0100309"
    assert out.SIM_MAPPING == "Automatic Constructor - Concept"
    assert out.SIM_EVIDENCE == (
        "CONCEPT_SIMILARITY:HP_0100310_0.786 | CONCEPT_SIMILARITY:HP_0100309_0.75"
    )


def test_full_outer_merge_exact_and_sim(spark):
    links = spark.createDataFrame(
        [
            ("m1", "concept", "snomed:190787008", "CONCEPT_SOURCE_CODE",
             "http://purl.obolibrary.org/obo/HP_0008181", "HP", "abetalipoproteinemia",
             "CONCEPT_DBXREF_snomed:190787008", "dbxref", "DbXref", 0, 0),
        ],
        LINK_SCHEMA,
    )
    sim = spark.createDataFrame(
        [("m2", "HP_0100598", 0.9, 1)],
        "mention_id string, sim_uri string, score double, rank int",
    )
    out = compile_mappings(links, sim, _labels(spark), ["mention_id"])
    rows = {r.mention_id: r for r in out.collect()}
    assert rows["m1"].AGG_MAPPING == "Automatic Exact - Concept" and rows["m1"].SIM_URI is None
    assert rows["m2"].SIM_MAPPING == "Manual Exact - Concept Similarity" and rows["m2"].AGG_URI is None
