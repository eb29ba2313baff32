"""Output-boundary exports: Excel cell clamp (P8), null→'' (P3), LABS
RESULT_TYPE fan-out (F10, /root/reference/main.py:127-139)."""

from pyspark.sql import functions as F

from omop2obo_spark.sources.export import (
    EXCEL_CELL_LIMIT,
    clamp_cells,
    explode_result_types,
)


def test_clamp_cells(spark):
    long = "x" * (EXCEL_CELL_LIMIT + 100)
    df = spark.createDataFrame([(1, long), (2, None)], "id long, v string")
    rows = {r.id: r.v for r in clamp_cells(df).collect()}
    assert len(rows[1]) == EXCEL_CELL_LIMIT
    assert rows[2] == ""


def test_explode_result_types(spark):
    df = spark.createDataFrame(
        [("m1", "Normal/Low/High"), ("m2", "Negative/Positive"), ("m3", "Plain")],
        "id string, RESULT_TYPE string",
    )
    out = explode_result_types(df)
    got = sorted((r.id, r.RESULT_TYPE) for r in out.collect())
    assert got == [
        ("m1", "High"), ("m1", "Low"), ("m1", "Normal"),
        ("m2", "Negative"), ("m2", "Positive"),
        ("m3", "Plain"),
    ]


def test_ntriple_lines_iri_literal_and_escaping(spark):
    from omop2obo_spark.sources.export import ntriple_lines

    triples = spark.createDataFrame(
        [
            ("transcript:c1:0:m1", "omop2obo:hasExactMapping", "obo:HP_0008181"),
            ("obo:HP_1", "owl:sameAs", "obo:MONDO_1"),
            ("transcript:c1:0:m1", "omop2obo:hasMappingCategory",
             'tricky "quoted" \\ back\nline\ttab'),
        ],
        "subj string, pred string, obj string",
    )
    lines = {r.line for r in ntriple_lines(triples).collect()}
    assert (
        "<https://w3id.org/omop2obo/transcript/c1:0:m1> "
        "<https://w3id.org/omop2obo/hasExactMapping> "
        "<http://purl.obolibrary.org/obo/HP_0008181> ." in lines
    )
    assert (
        "<http://purl.obolibrary.org/obo/HP_1> "
        "<http://www.w3.org/2002/07/owl#sameAs> "
        "<http://purl.obolibrary.org/obo/MONDO_1> ." in lines
    )
    lit = next(l for l in lines if "hasMappingCategory" in l)
    assert lit.endswith('"tricky \\"quoted\\" \\\\ back\\nline\\ttab" .')


def test_export_ntriples_roundtrip(spark, tmp_path):
    from omop2obo_spark.sources.export import export_ntriples

    triples = spark.createDataFrame(
        [("obo:A", "owl:sameAs", "obo:B")], "subj string, pred string, obj string"
    )
    out = str(tmp_path / "nt")
    export_ntriples(triples, out)
    got = spark.read.text(out).collect()
    assert len(got) == 1 and got[0].value.endswith("> .")


def test_atlas_concept_sets_layout_golden(spark, tmp_path):
    """Pin the Atlas concept-set JSON against a hand-written golden built
    from the reference's own template (n3c_mapping_conversion.py:92-133):
    field order, explicit nulls, .title()-cased name (incl. the
    after-digit/after-apostrophe capitalizations initcap would miss), the
    filename slug chain, URI lowering, and int-cast concept code."""
    import json

    from omop2obo_spark.sources.export import atlas_concept_sets, write_atlas_json

    mappings = spark.createDataFrame(
        [
            (254761, "cough at night / don't ignore | covid-19 sign",
             "49727002", "SNOMED", "Automatic Exact - Concept",
             "OBO_DbXRef_OMOP_1", "AND", "OBO: HP_0012735 | OBO: MONDO_0100096",
             "cough"),
            (22274, "neoplasm of uncertain behavior of larynx",
             "126692004", "SNOMED", "Automatic Constructor - Concept",
             "CONCEPT_SIMILARITY:0.75", "", "obo: HP_0002094", "neoplasm"),
        ],
        "CONCEPT_ID long, CONCEPT_NAME string, CONCEPT_CODE string, "
        "CONCEPT_VOCAB string, MAPPING_CATEGORY string, MAPPING_EVIDENCE string, "
        "ONTOLOGY_LOGIC string, ONTOLOGY_URI string, ONTOLOGY_LABEL string",
    )
    rows = {r.concept_id: r for r in atlas_concept_sets(mappings).collect()}

    # filename: reference slug order (lower -> ' | '->'|' -> '/'->'-' -> ' '->'_')
    assert rows[254761].filename == (
        "254761-cough_at_night_-_don't_ignore|covid-19_sign.json")
    assert rows[22274].filename == (
        "22274-neoplasm_of_uncertain_behavior_of_larynx.json")

    got = json.loads(rows[254761].atlas_json)
    exp = {"items": {
        "concept": {
            "CONCEPT_ID": 254761,
            # Python str.title(): capitalizes after '/', digit boundaries,
            # and apostrophes ("Don'T", "Covid-19") — reference quirk kept
            "CONCEPT_NAME": "cough at night / don't ignore | covid-19 sign".title(),
            "STANDARD_CONCEPT": None, "STANDARD_CONCEPT_CAPTION": None,
            "CONCEPT_CODE": 49727002, "DOMAIN_ID": None,
            "VOCABULARY_ID": "SNOMED"},
        "isExcluded": False, "includeDescendants": False, "includeMapped": True,
        "ONTOLOGY_CONCEPT_MAPPING_MEMBERS": {
            "identifiers": "obo:hp_0012735|obo:mondo_0100096",
            "labels": "cough"},
        "ONTOLOGY_CONCEPT_MAPPING_LOGIC": "AND",
        "MAPPING_CATEGORY": "Automatic Exact - Concept",
        "MAPPING_EVIDENCE": "OBO_DbXRef_OMOP_1"}}
    assert got == exp
    # field ORDER is part of the layout (json.dumps of the reference dict)
    assert list(got["items"]) == list(exp["items"])
    assert list(got["items"]["concept"]) == list(exp["items"]["concept"])

    # per-file writer reproduces the reference's one-file-per-concept tree
    out = str(tmp_path / "atlas")
    write_atlas_json(atlas_concept_sets(mappings), out, per_file=True)
    with open(f"{out}/22274-neoplasm_of_uncertain_behavior_of_larynx.json") as f:
        on_disk = json.load(f)
    assert on_disk["items"]["concept"]["CONCEPT_NAME"] == (
        "Neoplasm Of Uncertain Behavior Of Larynx")
    assert on_disk["items"]["ONTOLOGY_CONCEPT_MAPPING_MEMBERS"]["identifiers"] == (
        "obo:hp_0002094")

    # scale path: partitioned JSONL dataset, no per-file driver loop
    out2 = str(tmp_path / "atlas_jsonl")
    write_atlas_json(atlas_concept_sets(mappings), out2)
    back = spark.read.json(out2)
    assert back.count() == 2 and set(back.columns) >= {"filename", "atlas_json"}


def test_dot_lines_escaping_and_structure(spark):
    from omop2obo_spark.sources.export import dot_lines

    e = spark.createDataFrame(
        [('a"quote', "b\\slash", "x"), ("plain", "node", 'l"bl')],
        "ent_a: string, ent_b: string, lab: string",
    )
    rows = {r.sort_key: r.line for r in dot_lines(e, label_col="lab").collect()}
    lines = [rows[k] for k in sorted(rows)]
    assert lines[0] == "graph kg {"
    assert lines[-1] == "}"
    assert '  "a\\"quote" -- "b\\\\slash" [label="x"];' in lines
    assert '  "plain" -- "node" [label="l\\"bl"];' in lines
    # label-less mode
    bare = {r.sort_key: r.line for r in dot_lines(e).collect()}
    assert '  "plain" -- "node";' in bare.values()


def test_dot_lines_multi_edge_deterministic(spark):
    """Two edges with identical endpoints but different labels must get
    distinct sort keys (the rendered line is part of the key), so the
    byte-identical-file guarantee holds for multi-edge inputs."""
    from omop2obo_spark.sources.export import dot_lines

    e = spark.createDataFrame(
        [("a", "b", "x"), ("a", "b", "y")],
        "ent_a: string, ent_b: string, lab: string",
    )
    rows = dot_lines(e, label_col="lab").collect()
    keys = [r.sort_key for r in rows]
    assert len(keys) == len(set(keys)) == 4
    body = [rows_.line for rows_ in sorted(rows, key=lambda r: r.sort_key)][1:-1]
    assert body == sorted(body)  # label order is deterministic
