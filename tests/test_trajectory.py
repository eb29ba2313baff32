"""Unit + plan tests for the agent-trajectory operators.

Hand-built conversations with known trajectories pin the exact semantics
(sentinel transitions, run-length islands, chain contiguity, lift
arithmetic); the plan tests pin the physical shape — per-conversation
work must share one conv_id exchange and never self-join the fact
stream (except the bounded per-conv distinct set in cooccurrence).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from omop2obo_spark.operators.trajectory import (
    tool_cooccurrence,
    tool_retry_runs,
    tool_transitions,
    trajectory_stats,
)

ROWS = [
    # conv a: search, search, calc  -> retry run on search, ends assistant
    ("a", 0, "user", "hi", None, "2026-01-01 00:00:00"),
    ("a", 1, "tool", "s1", "search", "2026-01-01 00:00:01"),
    ("a", 2, "tool", "s2", "search", "2026-01-01 00:00:02"),
    ("a", 3, "tool", "c1", "calc", "2026-01-01 00:00:03"),
    ("a", 4, "assistant", "done", None, "2026-01-01 00:00:04"),
    # conv b: calc only, ends with an unnamed tool-role turn
    ("b", 0, "user", "hi", None, "2026-01-01 00:01:00"),
    ("b", 2, "tool", "c2", "calc", "2026-01-01 00:01:30"),
    ("b", 3, "tool", "x", None, "2026-01-01 00:01:40"),
    # conv c: no tool calls at all
    ("c", 0, "user", "hello", None, "2026-01-01 00:02:00"),
    ("c", 1, "assistant", "hey", None, "2026-01-01 00:02:05"),
]


@pytest.fixture(scope="module")
def tr(spark):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_tool_transitions_sentinels_and_probs(tr):
    got = {
        (r.from_tool, r.to_tool): (r.n_transitions, r.prob)
        for r in tool_transitions(tr).collect()
    }
    assert got == {
        ("__start__", "search"): (1, 0.5),
        ("__start__", "calc"): (1, 0.5),
        ("search", "search"): (1, 0.5),
        ("search", "calc"): (1, 0.5),
        ("calc", "__end__"): (2, 1.0),
    }


def test_tool_retry_runs_islands(tr):
    got = {r.tool: r.asDict() for r in tool_retry_runs(tr).collect()}
    assert got["search"] == {
        "tool": "search",
        "n_calls": 2,
        "n_runs": 1,
        "n_retry_runs": 1,
        "max_run_len": 2,
        "avg_run_len": 2.0,
    }
    # calc appears once in each of two conversations: two singleton runs,
    # never merged across conv boundaries
    assert got["calc"] == {
        "tool": "calc",
        "n_calls": 2,
        "n_runs": 2,
        "n_retry_runs": 0,
        "max_run_len": 1,
        "avg_run_len": 1.0,
    }


def test_retry_runs_not_merged_across_gap(spark):
    """search, calc, search is two search runs of length 1 — the islands
    arithmetic must not glue same-tool calls separated by another tool."""
    df = spark.createDataFrame(
        [("z", i, "tool", "t", t, "2026-01-01 00:00:0%d" % i)
         for i, t in enumerate(["search", "calc", "search"])],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.tool: r.asDict() for r in tool_retry_runs(df).collect()}
    assert got["search"]["n_runs"] == 2
    assert got["search"]["n_retry_runs"] == 0
    assert got["search"]["max_run_len"] == 1


def test_trajectory_stats_per_conv(tr):
    got = {r.conv_id: r.asDict() for r in trajectory_stats(tr).collect()}
    a = got["a"]
    assert (a["n_turns"], a["n_tool_calls"], a["n_distinct_tools"]) == (5, 3, 2)
    assert a["first_tool_idx"] == 1
    assert a["secs_to_first_tool"] == 1
    assert a["longest_tool_chain"] == 3  # turn_idx 1,2,3 all tool-role
    assert a["ends_with_tool"] is False
    b = got["b"]
    # the unnamed tool-role turn counts toward the chain but not n_tool_calls
    assert (b["n_tool_calls"], b["n_distinct_tools"]) == (1, 1)
    assert b["secs_to_first_tool"] == 30
    assert b["longest_tool_chain"] == 2  # turn_idx 2,3 contiguous
    assert b["ends_with_tool"] is True
    c = got["c"]
    assert c["n_tool_calls"] == 0
    assert c["first_tool_idx"] is None
    assert c["secs_to_first_tool"] is None
    assert c["longest_tool_chain"] == 0


def test_trajectory_chain_requires_contiguous_turn_idx(spark):
    """Tool-role turns at turn_idx 0 and 2 (hole at 1) are chains of 1."""
    df = spark.createDataFrame(
        [("g", 0, "tool", "x", "search", "2026-01-01 00:00:00"),
         ("g", 2, "tool", "y", "search", "2026-01-01 00:00:02")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert trajectory_stats(df).collect()[0].longest_tool_chain == 1


def test_tool_cooccurrence_lift(tr):
    got = {(r.tool_a, r.tool_b): r.asDict() for r in tool_cooccurrence(tr).collect()}
    # convs with a named tool call: a, b (n_convs=2); search in {a},
    # calc in {a,b}; both in {a} -> lift = 1*2/(1*2) = 1.0
    assert got == {
        ("calc", "search"): {
            "tool_a": "calc",
            "tool_b": "search",
            "n_both": 1,
            "n_a": 2,
            "n_b": 1,
            "lift": 1.0,
        }
    }


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_transitions_single_fact_exchange(tr):
    """The lag window is the only fact-sized shuffle; everything after
    operates on |tools|²-bounded streams. No join anywhere."""
    plan = _plan(tool_transitions(tr))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(conv_id") <= 2, plan


def test_retry_runs_shares_conv_exchange(tr):
    """Both row_number windows key on conv_id (one on (conv_id, tool)) —
    no join, and no more than the two window exchanges plus the bounded
    per-tool aggregate."""
    plan = _plan(tool_retry_runs(tr))
    assert "Join" not in plan, plan


def test_reply_latency_hand_values(spark):
    """Only direct user->assistant transitions count; deltas are exact
    epoch seconds; the median interpolates."""
    from omop2obo_spark.operators.transcript import reply_latency

    rows = [
        ("a", 0, "user", "q1", None, "2026-01-01 00:00:00"),
        ("a", 1, "assistant", "r1", None, "2026-01-01 00:00:03"),   # 3s
        ("a", 2, "user", "q2", None, "2026-01-01 00:00:10"),
        ("a", 3, "tool", "t", "search", "2026-01-01 00:00:11"),     # breaks pair
        ("a", 4, "assistant", "r2", None, "2026-01-01 00:00:12"),
        ("a", 5, "user", "q3", None, "2026-01-01 00:00:20"),
        ("a", 6, "assistant", "r3", None, "2026-01-01 00:00:27"),   # 7s
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = reply_latency(df).collect()[0]
    assert r.n_replies == 2
    assert (r.min_latency_s, r.max_latency_s) == (3, 7)
    assert r.avg_latency_s == 5.0 and r.p50_latency_s == 5.0


def test_trajectory_latency_non_monotone_ts_anchors_on_turn_order(spark):
    """A non-monotone feed (later turn, earlier ts) must not produce a
    negative latency: both ends of secs_to_first_tool anchor on turn
    order."""
    rows = [
        ("m", 0, "user", "q", None, "2026-01-01 00:01:40"),      # ts=100
        ("m", 1, "tool", "t", "search", "2026-01-01 00:08:20"),  # ts=500
        ("m", 5, "tool", "t2", "calc", "2026-01-01 00:00:50"),   # ts=50 (dirty)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = trajectory_stats(df).collect()[0]
    assert r.first_tool_idx == 1
    assert r.secs_to_first_tool == 400  # turn1.ts - turn0.ts, NOT min(ts)=50


@pytest.mark.parametrize("parts", [1, 13])
def test_trajectory_ops_partitioning_independent(spark, parts):
    """Every trajectory operator must emit identical rows at 1 and 13
    input partitions — windows, islands, and distinct-set joins cannot
    depend on physical layout."""
    rows = []
    tools = ["search", "calc", None, "sql"]
    for c in range(12):
        for i in range(8):
            role = ["user", "assistant", "tool"][(c + i) % 3]
            tool = tools[(c * 3 + i) % 4] if role == "tool" else None
            rows.append(
                (f"c{c}", i, role, f"t{c}-{i}", tool,
                 "2026-01-01 00:%02d:%02d" % (c, i))
            )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).repartition(parts)
    for op in (tool_transitions, tool_retry_runs, trajectory_stats, tool_cooccurrence):
        got = sorted(map(tuple, op(df).collect()))
        base = sorted(map(tuple, op(df.coalesce(1)).collect()))
        assert got == base, op.__name__
