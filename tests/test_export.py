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
