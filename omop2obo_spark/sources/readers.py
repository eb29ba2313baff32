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


def read_transcripts_jsonl(
    spark: SparkSession, path: str, bad_records_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Read transcripts from JSON-lines export files (the interchange
    format most conversation dumps arrive in) with the contract schema
    enforced and malformed lines quarantined instead of killing the job.

    Returns ``(good, bad)``: ``good`` has the exact contract columns
    (PERMISSIVE mode — missing fields null, ``ts`` parsed from ISO-8601
    strings); ``bad`` carries the raw line of every record that failed to
    parse, for a dead-letter sink. The schema is supplied explicitly so
    Spark never runs an inference pass over the data (an extra full scan
    at 100 TB).
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField(bad_records_col, T.StringType()),
        ]
    )
    raw = spark.read.schema(schema).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", bad_records_col
    ).json(path)
    good = raw.filter(F.col(bad_records_col).isNull()).select(*_TRANSCRIPT_COLS)
    # the dead-letter frame must reference EVERY contract column, not just
    # the corrupt-record column: Spark re-parses JSON per consuming plan
    # with column pruning, and a type-mismatch row only counts as corrupt
    # when the mismatching field is actually parsed (also sidesteps
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN). The partial
    # parse is useful quarantine context anyway.
    bad = raw.filter(F.col(bad_records_col).isNotNull()).select(
        F.col(bad_records_col).alias("raw_line"), *_TRANSCRIPT_COLS
    )
    return good, bad
