"""Order-preserving aggregation operators.

The reference's signature aggregation is ``' | '.join(unique_everseen(x))``
per group (/root/reference/omop2obo/utils/data_utils.py:159-183): concat of
*first-occurrence-deduped* values in input order. ``collect_list`` order is
nondeterministic after a shuffle, so every aggregation here carries explicit
ordering columns: we collect ``struct(<order cols>, value)``, sort the
array, project the value, and ``array_distinct`` (which keeps first
occurrence — the exact ``unique_everseen`` semantics).

``grouped_pivot_agg`` replaces the reference's data_frame_grouper
(data_utils.py:186-233) — a loop of per-group groupbys re-merged with outer
joins — with a single ``groupBy().pivot().agg()``: one shuffle instead of
2×#groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_concat_expr(value_col: str, order_cols: list[str], delimiter: str = " | ") -> Column:
    """Aggregate expression: first-occurrence-dedup concat in explicit order.

    NULL and empty-string values are dropped before collection (the
    reference operates on ''-filled frames where empties never reach the
    join output it aggregates).
    """
    v = F.col(value_col)
    pair = F.when(
        v.isNotNull() & (v != ""),
        F.struct(*[F.col(c) for c in order_cols], v.alias("__v")),
    )
    ordered = F.array_sort(F.collect_list(pair))
    vals = F.transform(ordered, lambda s: s["__v"])
    return F.array_join(F.array_distinct(vals), delimiter)


def ordered_concat_agg(
    df: DataFrame,
    key: str | list[str],
    agg_cols: list[str],
    order_cols: list[str],
    delimiter: str = " | ",
) -> DataFrame:
    """GroupBy ``key`` and ordered-concat every column in ``agg_cols``.

    One shuffle for all columns (the reference runs one groupby per column
    and outer-merges them back, data_utils.py:176-180).
    """
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(
        *[ordered_concat_expr(c, order_cols, delimiter).alias(c) for c in agg_cols]
    )


def grouped_pivot_agg(
    df: DataFrame,
    key: str,
    type_col: str,
    agg_cols: list[str],
    order_cols: list[str],
    type_values: list[str] | None = None,
    delimiter: str = " | ",
    rename_token: str = "ONT",
) -> DataFrame:
    """Pivot by ``type_col`` (e.g. ontology: HP/MONDO) and ordered-concat.

    Output columns follow the reference's naming: for each type value G and
    input column ``X_ONT_Y``, the output column is ``X_G_Y``
    (data_utils.py:222: ``x.replace('ONT', grp)``), except Spark pivot
    yields ``G_X_ONT_Y`` — we rename to the reference layout afterwards.
    A (key, type) combination with no input rows yields NULL, matching
    the reference's outer-merge NaN (differentially verified in
    tests/test_reference_differential_primitives.py) — the pivot's empty
    collect_list would otherwise surface as ''.

    Always pass ``type_values`` at scale to skip pivot-value discovery.
    """
    pivoted = (
        df.groupBy(key)
        .pivot(type_col, type_values)
        .agg(*[ordered_concat_expr(c, order_cols, delimiter).alias(c) for c in agg_cols])
    )
    # pivot emits `<grp>_<aggAlias>` for multi-agg pivots but just `<grp>`
    # for a single aggregate; rename to the reference's `<col with
    # ONT→grp>` convention in both shapes. Longest-suffix-first so one
    # agg name being a suffix of another (URI vs AGG_URI) can't misrename.
    renames: dict[str, str] = {}
    by_len = sorted(agg_cols, key=len, reverse=True)
    for c in pivoted.columns:
        if c == key:
            continue
        if len(agg_cols) == 1:
            renames[c] = agg_cols[0].replace(rename_token, c)
            continue
        for a in by_len:
            if c.endswith("_" + a):
                grp = c[: -(len(a) + 1)]
                renames[c] = a.replace(rename_token, grp)
                break
    out = pivoted.select(
        key,
        *[
            F.nullif(F.col(c), F.lit("")).alias(renames.get(c, c))
            for c in pivoted.columns
            if c != key
        ],
    )
    return out


AGG_STATE_COLS = ["n", "n_nonnull", "sum_v", "min_v", "max_v"]


def aggregate_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Mergeable per-key aggregate state ``(keys..., n, n_nonnull, sum_v,
    min_v, max_v)`` — the partial-aggregate algebra behind incremental
    materialized-view maintenance: states computed over disjoint slices
    of a table merge (:func:`merge_aggregate_states`) into exactly the
    state of their union, so a 100-TB rollup refreshes by aggregating
    ONLY the new partition and merging, never rescanning history.

    Sums are kept as exact long integers when the input is integral
    (cast to long) — float partial sums would make the merge order
    observable. Derived metrics (avg = sum/n) belong at read time, not
    in the state: avg is not mergeable, its ingredients are.
    """
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(v).alias("n_nonnull"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_aggregate_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two :func:`aggregate_state` frames over the same keys:
    counts/sums add, min/max combine, keys present in only one side pass
    through — ``merge(state(A), state(B)) == state(A UNION ALL B)``
    exactly (property-tested). One union + one map-side-combinable
    groupBy; at refresh time ``b`` is the delta and is usually tiny.
    """
    u = a.select(*keys, *AGG_STATE_COLS).unionByName(
        b.select(*keys, *AGG_STATE_COLS)
    )
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("n_nonnull").alias("n_nonnull"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str = "doc_id",
    descending: bool = True,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k rows per group for LOW-cardinality, fact-scale groups —
    the case ``Window.partitionBy(group)`` serializes (one task per
    group sorting millions of rows). Two-level formulation: stage 1
    takes top-k within each of ``salt_buckets`` deterministic md5 salt
    slices of every group (parallel, each slice ~1/buckets of the
    group); stage 2 re-ranks the surviving ``≤ groups·buckets·k`` rows
    (a bounded dimension). Exact: a global top-k row is top-k within
    its own slice, so stage 1 never drops a winner.

    The high-cardinality complement of
    :func:`~omop2obo_spark.operators.curate.group_quota_cap` (small
    groups → plain window there; few huge groups → this). Ties break by
    ``id_col``; NULL order values sort last and NULL groups are their
    own group. Output: the winning rows as (group, id, order value,
    grp_rank 1..k).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    from pyspark.sql.window import Window

    v = F.col(order_col)
    order = [
        v.desc_nulls_last() if descending else v.asc_nulls_last(),
        F.col(id_col).asc(),
    ]
    salt = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast("bigint"),
        F.lit(int(salt_buckets)),
    )
    stage1 = (
        df.select(group_col, id_col, order_col)
        .withColumn("__s", salt)
        .withColumn("__r1", F.row_number().over(Window.partitionBy(group_col, "__s").orderBy(*order)))
        .filter(F.col("__r1") <= int(k))
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        stage1.withColumn("grp_rank", F.row_number().over(w2))
        .filter(F.col("grp_rank") <= int(k))
        .select(group_col, id_col, order_col, "grp_rank")
    )
