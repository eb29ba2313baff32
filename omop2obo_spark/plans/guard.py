"""Physical-plan scale guards: programmatic access to the plan
properties this package's tests pin one by one (tests/test_plans.py),
exposed as a public API so PIPELINES can assert them too — a job that is
about to spend cluster-hours on 100 TB should fail in seconds on the
driver if its plan picked up a nested-loop join or a single-partition
global sort, not discover it as a straggler at 3 a.m.

``plan_report`` extracts the counts; ``assert_scale_safe`` turns them
into a budgeted assertion. Both read the *executed* plan string — under
AQE this is the initial physical plan (``isFinalPlan=false``); AQE can
only improve it (e.g. demote a planned SortMergeJoin to broadcast), so
a plan that passes here is a lower bound on what runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_report", "assert_scale_safe"]


def plan_report(df: DataFrame) -> dict[str, int]:
    """Count the scale-relevant physical operators in ``df``'s plan.

    Keys:
      * ``hash_exchanges`` — shuffles on a key (the normal kind; each one
        is corpus-wide data movement, so fewer is better)
      * ``range_exchanges`` — global sorts / range repartitions
      * ``single_partition_exchanges`` — EVERYTHING to one task; fine for
        an n_buckets-row dimension, fatal for a fact table
      * ``broadcast_joins`` / ``sort_merge_joins`` — join strategies
      * ``nested_loop_joins`` — BroadcastNestedLoopJoin + CartesianProduct:
        O(n*m) comparisons. Almost always a missing equi-condition — the
        one legitimate appearance is a 1-ROW broadcast totals cross join
        (the `crossJoin(F.broadcast(totals))` idiom used throughout this
        package), which callers budget with ``max_nested_loop_joins=1``
      * ``row_python_evals`` — row-at-a-time Python UDFs (BatchEvalPython);
        the slow path this package bans from fact-table plans
      * ``arrow_python_evals`` — Arrow-vectorized Python (pandas UDFs,
        mapInPandas/applyInPandas); the sanctioned escape hatch
      * ``codegen_spans`` — WholeStageCodegen regions (wider is better).
        Under AQE the INITIAL plan has not collapsed codegen stages yet,
        so this reads 0 before the first action — meaningful only with
        AQE off or on an executed plan; the other counts are unaffected
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "hash_exchanges": plan.count("Exchange hashpartitioning"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": (
            plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct")
        ),
        "row_python_evals": plan.count("BatchEvalPython"),
        "arrow_python_evals": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        "codegen_spans": plan.count("WholeStageCodegen"),
    }


def assert_scale_safe(
    df: DataFrame,
    max_single_partition_exchanges: int = 0,
    max_sort_merge_joins: int = 0,
    max_nested_loop_joins: int = 0,
    max_row_python_evals: int = 0,
    max_hash_exchanges: int | None = None,
) -> dict[str, int]:
    """Fail fast (AssertionError, with the offending counts AND the plan)
    if ``df``'s physical plan exceeds the given budgets.

    Defaults encode this package's contract: no single-partition
    exchanges, no sort-merge joins (dictionary joins must broadcast or
    salt), no nested-loop joins, no row-at-a-time Python. Operators with
    a legitimate exception budget it explicitly — e.g. the two-level
    prefix sum passes ``max_single_partition_exchanges=1`` for its
    n_buckets-row offset dimension. Returns the report on success so
    callers can log it.
    """
    rep = plan_report(df)
    budgets = {
        "single_partition_exchanges": max_single_partition_exchanges,
        "sort_merge_joins": max_sort_merge_joins,
        "nested_loop_joins": max_nested_loop_joins,
        "row_python_evals": max_row_python_evals,
    }
    if max_hash_exchanges is not None:
        budgets["hash_exchanges"] = max_hash_exchanges
    over = {k: (rep[k], v) for k, v in budgets.items() if rep[k] > v}
    if over:
        detail = ", ".join(f"{k}={got} > budget {b}" for k, (got, b) in over.items())
        plan = df._jdf.queryExecution().executedPlan().toString()
        raise AssertionError(f"plan exceeds scale budgets: {detail}\n{plan}")
    return rep


def scan_report(df: DataFrame) -> list[dict]:
    """Per-scan pushdown/pruning audit: one dict per file scan in
    ``df``'s physical plan with the pieces that decide 100-TB scan cost
    — ``pushed_filters`` (predicates the parquet reader skips row
    groups with), ``read_schema`` (the pruned column set; a scan
    reading every column for a 2-column projection is a plan bug), and
    ``partition_filters`` (partition pruning, incl. dynamic). The
    scan-level complement of :func:`plan_report`'s operator counts —
    tests pin "the filter reached the scan" instead of eyeballing
    ``.explain`` output.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for m in re.finditer(r"FileScan \w+ [^\n]*", plan):
        line = m.group(0)

        def field(name: str) -> str:
            f = re.search(name + r": \[([^\]]*)\]", line)
            return f.group(1) if f else ""

        rs = re.search(r"ReadSchema: struct<([^>]*)>", line)
        out.append(
            {
                "pushed_filters": field("PushedFilters"),
                "partition_filters": field("PartitionFilters"),
                "read_schema": rs.group(1) if rs else "",
            }
        )
    return out
