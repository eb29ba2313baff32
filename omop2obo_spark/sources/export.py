"""Output-boundary compatibility exports.

The reference ships wide CSV mapping files and per-concept JSON exports
(SURVEY.md §2.1 S7/S9); these helpers reproduce that boundary:
  * ``export_wide_csv`` — single-header CSV with the reference's Excel cell
    clamp: every string cell truncated to 32,500 chars
    (/root/reference/omop2obo/utils/data_utils.py:617-620, P8) and nulls
    rendered as '' (P3 fillna, main.py:142)
  * ``export_json`` — line-delimited JSON (the N3C-style export surface,
    applications/N3C/n3c_mapping_conversion.py:116-140)
  * ``explode_result_types`` — the LABS RESULT_TYPE row fan-out
    (main.py:127-139, F10): rows whose result type is '/'-packed
    (``Normal/Low/High``) are duplicated per component
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXCEL_CELL_LIMIT = 32500


def clamp_cells(df: DataFrame) -> DataFrame:
    """Truncate every string column to the Excel cell limit, '' for null."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            cols.append(F.substring(F.coalesce(F.col(f.name), F.lit("")), 1, EXCEL_CELL_LIMIT).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def export_wide_csv(df: DataFrame, path: str) -> None:
    clamp_cells(df).coalesce(1).write.option("header", True).mode("overwrite").csv(path)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def explode_result_types(df: DataFrame, result_col: str = "RESULT_TYPE") -> DataFrame:
    """Fan out '/'-packed result types into one row per component; rows
    without the packed pattern pass through unchanged."""
    packed = F.col(result_col).isNotNull() & F.col(result_col).contains("/")
    parts = F.when(packed, F.split(F.col(result_col), "/")).otherwise(F.array(F.col(result_col)))
    return df.withColumn(result_col, F.explode(parts))
