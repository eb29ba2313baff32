"""Source readers.

Spark-native equivalents of the reference's file loaders (SURVEY.md §2.1):
  * transcripts  — Iceberg table in production (``spark.read.table``),
    parquet path in the sandbox; schema enforced either way
  * MRCONSO/MRSTY — pipe-delimited RRF, positional columns
    (/root/reference/omop2obo/clinical_concept_annotator.py:158-185)
  * vocab map     — CSV with ' | '-packed aliases
    (clinical_concept_annotator.py:78-85)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omop2obo_spark.fixtures.generators import TRANSCRIPTS_SCHEMA

_TRANSCRIPT_COLS = [f.name for f in TRANSCRIPTS_SCHEMA.fields]


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcripts fact table.

    ``source`` is an Iceberg/catalog table name (no slash) or a parquet
    path. Only the contract columns are selected, so Parquet column
    pruning applies no matter how wide the physical table is.
    """
    df = spark.read.table(source) if "/" not in source else spark.read.parquet(source)
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_mrconso_rrf(spark: SparkSession, path: str) -> DataFrame:
    """MRCONSO.RRF → (CUI, LANG, SAB, CODE): positional cols 0, 1, 11, 13."""
    raw = spark.read.csv(path, sep="|", header=False)
    return raw.select(
        F.col("_c0").alias("CUI"),
        F.col("_c1").alias("LANG"),
        F.col("_c11").alias("SAB"),
        F.col("_c13").alias("CODE"),
    ).dropDuplicates()


def read_mrsty_rrf(spark: SparkSession, path: str) -> DataFrame:
    """MRSTY.RRF → (CUI, STY): positional cols 0, 3."""
    raw = spark.read.csv(path, sep="|", header=False)
    return raw.select(F.col("_c0").alias("CUI"), F.col("_c3").alias("STY")).dropDuplicates()


def read_vocab_map(spark: SparkSession, path: str) -> dict[str, str]:
    """source_code_vocab_map.csv → alias → canonical dict (exploded)."""
    df = spark.read.csv(path, header=True)
    cols = df.columns
    rows = (
        df.select(
            F.col(cols[0]).alias("primary"),
            F.explode(F.split(F.col(cols[1]), r" \| ")).alias("alias"),
        )
        .collect()
    )
    return {r.alias: r.primary for r in rows}


def read_lexicon(spark: SparkSession, source: str) -> DataFrame:
    """Ontology lexicon dimension (parquet path or table name)."""
    return spark.read.table(source) if "/" not in source else spark.read.parquet(source)
