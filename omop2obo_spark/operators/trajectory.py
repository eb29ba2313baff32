"""Agent-trajectory analytics over the ``tool`` column of transcripts.

The input table (conv_id, turn_idx, role, text, tool, ts) is an *agent*
transcript: some turns are tool invocations.  Before transcripts are used
as training data, a pipeline wants the behavioural shape of those
trajectories — which tools follow which (a Markov transition matrix over
tool calls), where agents thrash (consecutive same-tool retry runs),
how long a conversation runs before its first tool call, and which tools
co-occur in the same conversation more often than chance.

None of this exists in the reference (OMOP2OBO maps static concept
tables; see SURVEY.md §2.9 for the added-families rationale), but it is
exactly the per-conversation telemetry a 10^12-turn transcript corpus
needs before curation, and every operator here is expressible as native
window/aggregate plans:

Physical shape (asserted in tests/test_plans.py):
  * every operator's only wide exchange is the hash partition on
    ``conv_id`` (or on the bounded tool-pair key after per-conv
    reduction) — tool vocabularies are tiny, so all post-conv
    aggregations reduce to dimension-sized streams;
  * no UDFs, no ``collect``; the transition/retry windows and the
    aggregations share the conv_id partitioning, so Catalyst plans one
    shuffle for the fact stream per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

START = "__start__"
END = "__end__"


def _calls(transcripts: DataFrame) -> DataFrame:
    """Named tool invocations in trajectory order."""
    return transcripts.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )


def tool_transitions(transcripts: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-conversation tool
    sequences, with ``__start__`` / ``__end__`` sentinels.

    For a conversation whose named tool calls are t1..tk (by turn_idx),
    the transitions are (START,t1), (t1,t2), .., (tk,END).  Output one
    row per (from_tool, to_tool): ``n_transitions`` and ``prob`` — the
    row-normalized transition probability (6dp).

    Scale: the lag window is the only fact-sized shuffle; the
    (from,to) aggregation is over a |tools|² key space — dimension-sized
    however large the corpus.  At 10^12 turns the conv_id exchange is
    the same one every other per-conversation operator pays; nothing
    here is skew-prone because tool names are bounded-cardinality and
    the heavy aggregation happens map-side first.
    """
    calls = _calls(transcripts)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    steps = calls.select(
        F.coalesce(F.lag("tool").over(w), F.lit(START)).alias("from_tool"),
        F.col("tool").alias("to_tool"),
    )
    ends = (
        calls.groupBy("conv_id")
        .agg(F.max_by("tool", "turn_idx").alias("from_tool"))
        .select("from_tool", F.lit(END).alias("to_tool"))
    )
    counts = (
        steps.unionByName(ends)
        .groupBy("from_tool", "to_tool")
        .agg(F.count("*").alias("n_transitions"))
    )
    wf = Window.partitionBy("from_tool")
    return counts.select(
        "from_tool",
        "to_tool",
        "n_transitions",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(wf), 6).alias(
            "prob"
        ),
    )


def tool_retry_runs(transcripts: DataFrame) -> DataFrame:
    """Per-tool retry-loop profile from run-length encoding.

    A *run* is a maximal streak of consecutive tool calls (consecutive in
    the conversation's call order, not raw turn_idx) invoking the same
    tool; a run of length ≥ 2 is a retry loop — the classic agent-thrash
    signal.  Output one row per tool: ``n_calls``, ``n_runs``,
    ``n_retry_runs``, ``max_run_len``, ``avg_run_len`` (6dp).

    Islands trick: within a conversation, ``seq - seq_per_tool`` is
    constant exactly over a maximal same-tool streak, so two
    row_numbers over the SAME conv_id partitioning identify runs with
    no self-join.  The per-(conv,tool,island) reduce and the final
    per-tool aggregate are both map-side combinable.
    """
    calls = _calls(transcripts)
    w_all = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_tool = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    runs = (
        calls.select(
            "conv_id",
            "tool",
            (F.row_number().over(w_all) - F.row_number().over(w_tool)).alias("island"),
        )
        .groupBy("conv_id", "tool", "island")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("tool").agg(
        F.sum("run_len").cast("long").alias("n_calls"),
        F.count("*").alias("n_runs"),
        F.sum((F.col("run_len") >= 2).cast("long")).alias("n_retry_runs"),
        F.max("run_len").alias("max_run_len"),
        F.round(F.avg("run_len"), 6).alias("avg_run_len"),
    )


def trajectory_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation trajectory shape, one row per conv_id:

      * ``n_turns`` / ``n_tool_calls`` / ``n_distinct_tools``
      * ``first_tool_idx`` — turn_idx of the first named tool call
        (null when the conversation never calls a tool)
      * ``secs_to_first_tool`` — seconds from the conversation's first
        turn to its first tool call (null likewise)
      * ``longest_tool_chain`` — longest streak of contiguous
        (turn_idx-consecutive) tool-role turns; 0 when none
      * ``ends_with_tool`` — the final turn is a tool-role turn

    Two aggregations, both keyed on conv_id — the chain branch's islands
    window reuses the same partitioning, and the final join is
    conv_id-to-conv_id so AQE coalesces it onto the shared exchange.
    """
    base = transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
        F.count_distinct("tool").alias("n_distinct_tools"),
        F.min(F.when(F.col("tool").isNotNull(), F.col("turn_idx"))).alias(
            "first_tool_idx"
        ),
        # latency anchors on TURN ORDER at both ends (min_by, not min(ts)):
        # on a non-monotone feed min(ts) could come from a later turn and
        # even go negative — exactly the dirt normalize_turn_order repairs
        (
            F.min(
                F.when(
                    F.col("tool").isNotNull(),
                    F.struct(F.col("turn_idx"), F.col("ts")),
                )
            )["ts"].cast("long")
            - F.min(F.struct(F.col("turn_idx"), F.col("ts")))["ts"].cast("long")
        ).alias("secs_to_first_tool"),
        (F.max_by("role", "turn_idx") == "tool").alias("ends_with_tool"),
    )
    w_tool = Window.partitionBy("conv_id").orderBy("turn_idx")
    chains = (
        transcripts.filter(F.col("role") == "tool")
        .select(
            "conv_id",
            (F.col("turn_idx") - F.row_number().over(w_tool)).alias("island"),
        )
        .groupBy("conv_id", "island")
        .agg(F.count("*").alias("chain_len"))
        .groupBy("conv_id")
        .agg(F.max("chain_len").alias("longest_tool_chain"))
    )
    return base.join(chains, "conv_id", "left").select(
        "conv_id",
        "n_turns",
        "n_tool_calls",
        "n_distinct_tools",
        "first_tool_idx",
        "secs_to_first_tool",
        F.coalesce("longest_tool_chain", F.lit(0)).alias("longest_tool_chain"),
        "ends_with_tool",
    )


def tool_cooccurrence(transcripts: DataFrame) -> DataFrame:
    """Conversation-level tool co-occurrence with lift.

    For each unordered pair of distinct tools (a < b), count the
    conversations using both, and report
    ``lift = n_both * n_convs / (n_a * n_b)`` (6dp) where ``n_convs`` is
    the number of conversations with at least one named tool call.
    Lift > 1 means the tools travel together more than independence
    predicts — the signal for composite-skill trajectories.

    Scale: the per-conversation distinct set is at most |tools| rows, so
    the self-join on conv_id has bounded fan-out (≤ |tools|² per conv)
    and every aggregate after the first distinct is dimension-sized.
    The 1-row corpus total joins back by broadcast cross-join.
    """
    per_conv = _calls(transcripts).select("conv_id", "tool").distinct()
    tool_n = per_conv.groupBy("tool").agg(F.count("*").alias("n"))
    total = per_conv.select(F.count_distinct("conv_id").alias("n_convs"))
    pairs = (
        per_conv.alias("a")
        .join(per_conv.alias("b"), "conv_id")
        .filter(F.col("a.tool") < F.col("b.tool"))
        .groupBy(
            F.col("a.tool").alias("tool_a"), F.col("b.tool").alias("tool_b")
        )
        .agg(F.count("*").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(tool_n.withColumnsRenamed({"tool": "tool_a", "n": "n_a"})),
            "tool_a",
        )
        .join(
            F.broadcast(tool_n.withColumnsRenamed({"tool": "tool_b", "n": "n_b"})),
            "tool_b",
        )
        .join(F.broadcast(total))
        .select(
            "tool_a",
            "tool_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") * F.col("n_convs") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )
