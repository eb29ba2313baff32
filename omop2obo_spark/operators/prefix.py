"""Two-level bucketed prefix sum — the shared scaffold behind every
"global running total / global rank without a global sort" operator.

The naive spelling of a global cumulative is ``sum(...) OVER (ORDER BY k)``
or ``row_number() OVER (ORDER BY k)`` with no partition — Spark moves the
whole input to ONE task. The scalable shape used throughout this package:

1. each row is assigned a RANGE bucket ``__b`` that is monotone in the
   global order (hash-prefix buckets for hash order, value/quantile
   buckets for numeric order) — the caller owns this step, since the
   bucket function is what differs per operator;
2. per-bucket totals (a tiny ``n_buckets``-row dimension) get exclusive
   offsets via a window over the bucket id — single-partition by design,
   ``n_buckets`` rows only;
3. the offsets broadcast-join back and a WITHIN-bucket window (bounded to
   ~1/``n_buckets`` of the data) finishes the running total.

Consumers: ``kg_train.entity_index`` (dense ids), ``analysis.binary_auc``
(cumulative negatives below each score), ``pack.curriculum_order`` (global
training position), ``textstats.token_budget_mixture`` (per-source running
token totals). They MUST share this one implementation: a boundary or
frame bug fixed here propagates to all four, and each caller's DuckDB
oracle replays the same arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["bucket_offsets", "two_level_prefix"]


def bucket_offsets(
    keyed: DataFrame,
    weight_col: str | None = None,
    bucket_col: str = "__b",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exclusive per-bucket offsets ``(*group_cols, bucket_col, __off)``:
    ``__off`` = total weight (row count if ``weight_col`` is None) of all
    LOWER buckets within the group. The window over bucket ids runs on a
    single partition per group — intentional: it sees ``n_buckets`` rows,
    never data-scale input.
    """
    agg = (F.count("*") if weight_col is None else F.sum(weight_col)).alias("__bn")
    per_bucket = keyed.groupBy(*group_cols, bucket_col).agg(agg)
    w_dim = Window.partitionBy(*group_cols).orderBy(bucket_col)
    return per_bucket.select(
        *group_cols,
        bucket_col,
        (F.sum("__bn").over(w_dim) - F.col("__bn")).alias("__off"),
    )


def two_level_prefix(
    keyed: DataFrame,
    order_cols: Sequence[str | Column],
    out_col: str,
    weight_col: str | None = None,
    bucket_col: str = "__b",
    group_cols: Sequence[str] = (),
    inclusive: bool = False,
) -> DataFrame:
    """``keyed`` + ``out_col``: the global (per ``group_cols``) running
    total in ``(bucket, *order_cols)`` order, computed without a global
    sort.

    ``weight_col=None`` counts rows (``out_col`` is a 0-based rank when
    ``inclusive=False``, 1-based when True); otherwise sums the weight
    (exclusive = total strictly before this row, inclusive = through it).
    ``order_cols`` must make the within-bucket order total (tie-break on
    a key column) for the result to be a pure function of the data.

    The bucket assignment must be monotone in the target order and
    already present as ``bucket_col`` — see the module docstring.
    """
    offsets = bucket_offsets(keyed, weight_col, bucket_col, group_cols)
    w_in = Window.partitionBy(*group_cols, bucket_col).orderBy(*order_cols)
    joined = keyed.join(F.broadcast(offsets), on=[*group_cols, bucket_col])
    if weight_col is None:
        running: Column = F.row_number().over(w_in)
        last = F.lit(1)
    else:
        running = F.sum(weight_col).over(w_in)
        last = F.col(weight_col)
    cum = F.col("__off") + running - (F.lit(0) if inclusive else last)
    return joined.withColumn(out_col, cum).drop("__off")
