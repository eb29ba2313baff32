"""Conversation chunking: sliding windows of turns → training chunks.

A transcripts corpus is consumed by LLM training/retrieval as overlapping
windows of consecutive turns, not whole conversations.  ``chunk_turns``
produces one row per (conversation, window start): the turns
``[start, start+window)`` in turn order, concatenated with a separator.

Plan shape: one shuffle on ``conv_id`` (the groupBy), then chunk fan-out
happens inside the row via ``sequence``+``explode`` over the collected
turn array — native expressions end to end, no UDF.  Conversations are
bounded (thousands of turns at most), so the per-group array is small;
the 10^12-turn scale lives in the number of conversations, which
partitions cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_turns(
    transcripts: DataFrame,
    window: int = 3,
    stride: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Sliding turn windows per conversation.

    Output: ``(conv_id, chunk_idx, start_turn, n_turns, text)`` where
    ``text`` joins the window's turns (in ``turn_idx`` order) with
    ``sep``.  Window starts are ``0, stride, 2*stride, …`` up to the last
    turn; a trailing window may hold fewer than ``window`` turns.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window and stride must be positive, got {window}/{stride}")
    # NULL turn text renders as '' (same contract as transcript.sft_spans):
    # array_join would otherwise drop the element AND its separator,
    # desynchronizing chunk text from sft_spans' character offsets
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct("turn_idx", F.coalesce(F.col("text"), F.lit("")).alias("text"))
            )
        ),
        lambda x: x["text"],
    )
    per_conv = transcripts.groupBy("conv_id").agg(ordered.alias("turns"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("turns") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = per_conv.select(
        "conv_id", "turns", F.posexplode(starts).alias("chunk_idx", "start_turn")
    )
    piece = F.slice(F.col("turns"), F.col("start_turn") + 1, window)
    return exploded.select(
        "conv_id",
        "chunk_idx",
        "start_turn",
        F.size(piece).alias("n_turns"),
        F.array_join(piece, sep).alias("text"),
    )
