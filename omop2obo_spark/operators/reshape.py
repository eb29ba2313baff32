"""Long/wide reshaping operators.

Spark-native equivalents of the reference's frame manipulations:
  * ``stack_columns``   <-> data_frame_subsetter
    (/root/reference/omop2obo/utils/data_utils.py:44-81)
  * ``unstack_columns`` <-> data_frame_supersetter (data_utils.py:84-117)
  * ``split_explode_columns`` <-> column_splitter (data_utils.py:120-156)

``split_explode_columns`` deliberately reproduces the reference's
cross-product-within-key semantics: each delimited column is exploded
independently and the results re-joined on the key, so splitting two
columns multiplies rows (the reference's own test expects 13 rows from 5:
tests/test_data_utils.py:122-134).
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stack_columns(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Wide → long: one output row per (key, value-of-col, col-name).

    Output columns: ``key, CODE, CODE_COLUMN, src_rank`` where ``src_rank``
    is the position of the source column in ``cols`` — the explicit
    ordering key that replaces pandas' implicit concat order (needed by
    order-preserving downstream aggregation; see SURVEY.md §4.2).

    Implemented as a generate-side explode of an array of structs — one
    pass over the input, no shuffle.
    """
    pairs = F.array(
        *[
            F.struct(
                F.col(c).cast("string").alias("CODE"),
                F.lit(c).alias("CODE_COLUMN"),
                F.lit(i).alias("src_rank"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        df.select(key, F.explode(pairs).alias("p"))
        .select(key, "p.CODE", "p.CODE_COLUMN", "p.src_rank")
        .dropDuplicates([key, "CODE", "CODE_COLUMN"])
    )


def unstack_columns(df: DataFrame, index: str, columns: str, values: str,
                    column_values: list[str] | None = None) -> DataFrame:
    """Long → wide (pivot). ``column_values`` (if known) avoids the extra
    distinct-collection job Spark otherwise runs to discover pivot values —
    always pass it at scale.

    A cell fed by two DIFFERENT values (same index+column, distinct value
    after the full-row dedup) raises at execution time, matching the
    reference's pandas ``pivot`` ValueError — a silent ``first()`` there
    would be partition-order-dependent and break byte-identical re-runs.
    """
    grouped = df.dropDuplicates().groupBy(index)
    pivoted = grouped.pivot(columns, column_values) if column_values else grouped.pivot(columns)
    cell = (
        F.when(
            F.countDistinct(F.col(values)) > 1,
            # cast the dead raise branch to the values column's own dtype —
            # casting to string would make CaseWhen coercion silently widen a
            # numeric pivot output to string
            F.raise_error(F.lit(
                "unstack_columns: duplicate entries for an (index, column) cell"
            )).cast(df.schema[values].dataType),
        )
        .otherwise(F.first(values, ignorenulls=True))
    )
    return pivoted.agg(cell)


def split_explode_columns(
    df: DataFrame, key: str, delimited_columns: list[str], delimiter: str = "|"
) -> DataFrame:
    """Explode each '|'-delimited column into rows, then re-join on key.

    Matches column_splitter exactly, including the within-key cross
    product across 2+ columns and post-split trimming. Each exploded
    branch is deduped before the join, like the reference's
    ``drop_duplicates`` per branch.

    NULL handling diverges deliberately: a NULL delimited cell keeps its
    key with a NULL value in that column (``explode_outer``). The
    reference crashes on NaN (``.strip()`` AttributeError) and a plain
    ``explode`` would silently erase the key from the whole output via
    the inner re-join — losing its non-NULL values in the OTHER columns.
    """
    branches = []
    for col in delimited_columns:
        exploded = (
            df.select(key, F.explode_outer(F.split(F.col(col).cast("string"), re.escape(delimiter), -1)).alias(col))
            .withColumn(col, F.trim(F.col(col)))
            .dropDuplicates([key, col])
        )
        branches.append(exploded)
    out = reduce(lambda a, b: a.join(b, on=key, how="inner"), branches)
    return out.dropDuplicates()
