"""Mention detection over transcript text — stage 1 of the pipeline.

The reference has no mention detector (its input rows *are* the mentions);
this stage is what adapts its linking semantics to free text. Two mention
kinds, both found with native expressions (no Python in the scan path):

* **code mentions** — ``prefix:id`` tokens (``snomedct_us:190787008``,
  ``umls:c0000744``) extracted with ``regexp_extract_all``;
* **term mentions** — token n-grams (n ≤ max_term_tokens) joined against
  the broadcast dictionary of lower-cased labels+synonyms. The explode
  multiplies rows by ~4× tokens-per-turn but stays inside whole-stage
  codegen and is filtered immediately by the broadcast hash join — no
  shuffle touches the fact table. Longest-match-wins: a matched span
  strictly contained in another matched span of the same turn is dropped
  (so "nausea and vomiting" doesn't also emit "nausea").

Output schema (one row per mention):
    conv_id, turn_idx, mention_id, pos, kind ('code'|'term'), surface
``mention_id = conv_id:turn_idx:kind:pos`` — the stable subject key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CODE_PATTERN = r"\b([a-z][a-z0-9_.\-]*:[a-z0-9][a-z0-9.\-]*)"

MENTION_COLS = ["conv_id", "turn_idx", "mention_id", "pos", "kind", "surface"]


def _mention_id(kind: str):
    return F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"), F.lit(kind), F.col("pos"))


def detect_code_mentions(transcripts: DataFrame) -> DataFrame:
    """Extract ``prefix:id`` code tokens with their ordinal position."""
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(CODE_PATTERN), 1)).alias(
                "pos", "surface"
            ),
        )
        .withColumn("kind", F.lit("code"))
        .withColumn("mention_id", _mention_id("code"))
        .select(*MENTION_COLS)
    )


def detect_term_mentions(
    transcripts: DataFrame, term_dim: DataFrame, max_term_tokens: int = 4
) -> DataFrame:
    """Dictionary term mentions via n-gram generation + broadcast join.

    ``term_dim`` must have a single ``surface`` column of distinct
    lower-cased dictionary strings (labels + synonyms).
    """
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9']+"), lambda x: x != "")
    # all n-grams with start position and length, built as one nested
    # transform → flatten (single generate, no UDF)
    grams = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_term_tokens)),
            lambda n: F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(F.col("__toks")) - n, F.lit(-1))),
                lambda i: F.struct(
                    i.alias("pos"),
                    n.alias("len"),
                    F.array_join(F.slice(F.col("__toks"), i + 1, n), " ").alias("surface"),
                ),
            ),
        )
    )
    spans = (
        transcripts.withColumn("__toks", toks)
        .select("conv_id", "turn_idx", F.explode(grams).alias("g"))
        .select("conv_id", "turn_idx", "g.pos", "g.len", "g.surface")
    )
    matched = spans.join(F.broadcast(term_dim.select("surface").distinct()), on="surface", how="leftsemi")

    # longest-match-wins within a turn, via per-turn collect + higher-order
    # filter: a span survives unless another matched span of the same turn
    # strictly contains it. A self-anti-join here would broadcast the whole
    # matched-span set (driver-serial, unbounded with data) and recompute
    # the span-generation DAG twice; this is one small shuffle of matched
    # mentions only, with O(k²) work per turn for tiny k.
    per_turn = matched.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("pos", "len", "surface")).alias("ss")
    )
    survives = F.filter(
        F.col("ss"),
        lambda a: ~F.exists(
            F.col("ss"),
            lambda b: (b["pos"] <= a["pos"])
            & (b["pos"] + b["len"] >= a["pos"] + a["len"])
            & (b["len"] > a["len"]),
        ),
    )
    kept = per_turn.select(
        "conv_id", "turn_idx", F.explode(survives).alias("g")
    ).select("conv_id", "turn_idx", "g.pos", "g.len", "g.surface")
    return (
        kept.withColumn("kind", F.lit("term"))
        .withColumn("mention_id", _mention_id("term"))
        .select(*MENTION_COLS)
    )


def detect_mentions(
    transcripts: DataFrame, term_dim: DataFrame, max_term_tokens: int = 4
) -> DataFrame:
    """Union of code and term mentions."""
    return detect_code_mentions(transcripts).unionByName(
        detect_term_mentions(transcripts, term_dim, max_term_tokens)
    )
