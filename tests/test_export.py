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
