"""Conversation-structure operators for agent-transcript corpora.

The input-table shape of this engine is multi-turn agent transcripts
(conv_id, turn_idx, role, text, tool, ts). Before any linking or corpus
curation, a real transcript pipeline validates STRUCTURE: are turns
contiguous, do roles alternate sensibly, how much of the conversation is
tool traffic, did it start with a user turn. These are the per-
conversation signals that gate a transcript into the training corpus.

Physical plan: one hash exchange on conv_id; the lag window and the
final aggregation share that partitioning, so Catalyst plans a single
shuffle (asserted in tests/test_plans.py). No UDFs, no collect_list of
whole turns — every signal is a conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation structural signals, one row per conv_id:

      * ``n_turns``, ``n_user`` / ``n_assistant`` / ``n_tool_role``
      * ``first_role`` / ``last_role`` (by turn_idx)
      * ``alternation_violations`` — consecutive turns with the same role
      * ``gap_violations`` — turn_idx not exactly prev + 1 (holes or dups)
      * ``tool_call_frac`` — fraction of turns with a non-null ``tool``
      * ``avg_turn_chars`` (6dp)
      * ``well_formed`` — starts with a user turn, contiguous turn_idx,
        and no same-role runs: the standard keep predicate; callers with
        different policy compose their own from the raw signals.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_idx = F.lag("turn_idx").over(w)
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.length("text").alias("__chars"),
        (prev_role == F.col("role")).cast("int").alias("__same_role"),
        F.when(prev_idx.isNotNull() & (F.col("turn_idx") != prev_idx + 1), 1)
        .otherwise(0)
        .alias("__gap"),
    )
    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool_role"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.max_by("role", "turn_idx").alias("last_role"),
        F.coalesce(F.sum("__same_role"), F.lit(0)).alias("alternation_violations"),
        F.sum("__gap").alias("gap_violations"),
        F.round(F.avg(F.col("tool").isNotNull().cast("double")), 6).alias("tool_call_frac"),
        F.round(F.avg("__chars"), 6).alias("avg_turn_chars"),
        F.min("turn_idx").alias("__first_idx"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_user",
        "n_assistant",
        "n_tool_role",
        "first_role",
        "last_role",
        "alternation_violations",
        "gap_violations",
        "tool_call_frac",
        "avg_turn_chars",
        (
            (F.col("first_role") == "user")
            & (F.col("alternation_violations") == 0)
            & (F.col("gap_violations") == 0)
            & (F.col("__first_idx") == 0)
        ).alias("well_formed"),
    )


def sft_spans(
    transcripts: DataFrame,
    trainable_roles: tuple[str, ...] = ("assistant",),
    sep: str = "\n",
) -> DataFrame:
    """Loss-mask spans for supervised fine-tuning: each turn's character
    interval ``[start_off, end_off)`` in the conversation rendered as the
    ``sep``-joined turn texts (ordered by turn_idx, null text rendered as
    the empty string), plus ``trainable`` — whether the turn's role is in
    ``trainable_roles``. This is the offsets table an SFT tokenizer uses
    to zero the loss on non-assistant spans without re-parsing the
    rendered text.

    Invariant (pinned in tests): ``rendered[start_off:end_off] == text``
    for every turn. Physical plan: one hash exchange on conv_id; the
    running offset is a native cumulative window sum — no UDFs, no
    collect_list of turn texts.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chars = F.coalesce(F.length("text"), F.lit(0))
    prior = F.coalesce(F.sum(chars + len(sep)).over(w), F.lit(0))
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        prior.cast("long").alias("start_off"),
        (prior + chars).cast("long").alias("end_off"),
        F.col("role").isin(*trainable_roles).alias("trainable"),
    )
