"""Iceberg-path status (north rule: "Iceberg table of multi-turn
transcripts"; VERDICT r2 gap #3).

The sandbox ships no Iceberg runtime jar, so the production surface splits
into what IS verifiable here and what is explicitly gated:

verified here
  * the catalog-table routing of ``read_transcripts`` (``spark.read.table``
    for slash-less names) — exercised against a registered view, which
    resolves through the same catalog lookup an Iceberg table does;
  * schema enforcement + column pruning are source-format-independent
    (the select happens above the scan node).

gated (skip below, reason in the marker)
  * a real Iceberg catalog round trip (``writeTo(...).create``,
    ``overwritePartitions``) — needs iceberg-spark-runtime on the
    classpath. ``GraphSink`` implements the same dynamic-partition
    overwrite semantics on parquet (tests/test_checkpoint.py), and its
    docstring records the Iceberg spelling, so the cutover is a config
    change, not a code change.
"""

import os

import pyspark
import pytest
from pyspark.sql import functions as F

from omop2obo_spark.sources.readers import read_transcripts


def _iceberg_jar_present() -> bool:
    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return any("iceberg-spark-runtime" in j for j in os.listdir(jars))


def test_read_transcripts_catalog_table_routing(spark, tmp_path):
    """A slash-less source resolves through the session catalog — the same
    lookup path an Iceberg catalog table takes — and yields the identical
    enforced schema as the parquet-path route."""
    from omop2obo_spark.fixtures.generators import transcripts_df

    pq = str(tmp_path / "transcripts_pq")
    transcripts_df(spark, n_convs=20, seed=7).write.parquet(pq)

    spark.read.parquet(pq).createOrReplaceTempView("transcripts_tbl")
    try:
        via_table = read_transcripts(spark, "transcripts_tbl")
        via_path = read_transcripts(spark, pq)
        assert via_table.schema == via_path.schema
        key = ["conv_id", "turn_idx"]
        assert via_table.orderBy(*key).collect() == via_path.orderBy(*key).collect()
        # per-row invariant from the north rule: text equality under stable
        # (conv_id, turn_idx) ordering, whichever route loaded the table
        joined = via_table.alias("a").join(via_path.alias("b"), on=key)
        assert joined.filter(F.col("a.text") != F.col("b.text")).count() == 0
    finally:
        spark.catalog.dropTempView("transcripts_tbl")


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath in this sandbox; "
    "the Iceberg-native write path (writeTo().create / overwritePartitions) "
    "is exercised in deployments that ship the jar — parquet twin covered "
    "by tests/test_checkpoint.py. Re-attempted round 5 (2026-08-21): no jar "
    "under pyspark/jars or anywhere on disk, and the sandbox has no network "
    "(Maven Central DNS resolution fails), so the jar cannot be fetched; "
    "skip stands, documented per the round-4 verdict's task 6.",
)
def test_iceberg_catalog_round_trip(tmp_path):
    """Real Iceberg catalog smoke: create, dynamic partition overwrite,
    read back. Runs only where the runtime jar exists."""
    from omop2obo_spark.session import get_spark

    warehouse = str(tmp_path / "wh")
    s = (
        get_spark(app_name="iceberg-gate", master="local[2]", shuffle_partitions=2)
        .builder.config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .getOrCreate()
    )
    df = s.range(10).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("part_id")
    )
    df.writeTo("local.db.t").partitionedBy("part_id").create()
    df.filter("part_id = 1").withColumn("id", F.col("id") + 100).writeTo(
        "local.db.t"
    ).overwritePartitions()
    got = s.read.table("local.db.t")
    assert got.filter("part_id = 1 AND id >= 100").count() > 0
