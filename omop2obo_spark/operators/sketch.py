"""Count-min sketch: bounded-memory frequency estimation over unbounded
token streams.

The reference has no sketch operators (its corpora fit in pandas); this
extends the training-data tier alongside the HLL++ distinct and GK
quantile contracts (``q_sketch_distinct`` / ``q_sketch_quantile``). At
100 TB the exact token-frequency table is itself huge (billions of
distinct tokens) and every consumer that only needs "how often does THIS
token appear" or "what are the heavy hitters" pays the full vocabulary
shuffle; the CMS replaces it with a fixed ``depth x width`` grid of
counters that is

  * **map-side mergeable** — partial aggregation collapses each input
    partition to at most depth*width cells before the shuffle, so shuffle
    bytes are O(n_partitions * depth * width), independent of corpus size;
  * **one-sided** — estimates never undercount (every occurrence lands in
    all ``depth`` counters; collisions only add), so a heavy-hitter scan
    over the sketch has no false negatives;
  * **epsilon-bounded** — expected overcount per row is N/width and the
    row-minimum drives the error below ~2N/width with probability
    1 - 2^-depth (Markov per row, rows independent).

Every hash is md5-derived (first 15 hex chars -> signed-64 -> mod width),
so the sketch is deterministic and engine-portable: the DuckDB oracle
rebuilds the identical grid in ANSI SQL and the driver hash-compares
estimates exactly, not just the contract booleans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from omop2obo_spark.operators.textstats import tokens as word_tokens


def _cms_bucket(token: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket for a token: first 15 md5 hex chars (fits a
    signed 64-bit, always non-negative) mod width. SQL spelling:
    ``('0x' || substr(md5('cms' || row || '|' || tok), 1, 15))::BIGINT
    % width``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), token)), 1, 15), 16, 10)
    return h.cast("bigint") % F.lit(width)


def _probe_cells(token: Column, depth: int, width: int) -> Column:
    """Array of (row, bucket) probe cells for one token."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("row"),
                _cms_bucket(token, d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    toks: DataFrame, token_col: str = "tok", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch from a token stream: one narrow pass.

    Returns the OCCUPIED cells only — ``(row int, bucket bigint, c bigint)``,
    at most depth*width rows regardless of input size (absent cell == 0).
    The explode multiplies the stream by ``depth``, but hash-aggregate
    partial combine bounds what reaches the exchange at depth*width cells
    per input partition.
    """
    cells = toks.select(F.explode(_probe_cells(F.col(token_col), depth, width)).alias("cell"))
    return cells.groupBy(
        F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count("*").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate token: estimate = min over
    the ``depth`` probed counters (0 where the cell is unoccupied).

    The sketch is depth*width rows at most — always broadcast, so the
    probe join is map-side and candidates never shuffle.
    """
    probes = candidates.select(
        "*", F.explode(_probe_cells(F.col(token_col), depth, width)).alias("cell")
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("cell.row") == sketch["row"]) & (F.col("cell.bucket") == sketch["bucket"]),
        "left",
    )
    others = [c for c in candidates.columns if c != token_col]
    return joined.groupBy(token_col, *others).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0).cast("bigint"))).alias("cms_est")
    )


def heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Top-k token frequencies with the CMS estimate and its error
    contract alongside the exact count.

    Output per token: ``rank`` (by exact count desc, token asc),
    ``n_exact``, ``cms_est``, ``no_undercount`` (est >= exact — the CMS
    one-sided guarantee, structurally always true), ``within_eps``
    (est - exact <= ceil(2N/width), the probabilistic envelope pinned on
    deterministic input so the oracle asserts it).

    The exact side exists for the contract; a production heavy-hitter scan
    at 100 TB reads ONLY the sketch (depth*width cells) plus a candidate
    stream. Tokenization is shared verbatim with ``top_k_vocabulary``
    (``textstats.tokens``), so estimates are about the same stream the
    vocabulary operators count.
    """
    toks = docs.select(F.explode(word_tokens(F.col(text_col))).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    # bounded TakeOrdered (per-partition top-k, k rows to the driver), NOT a
    # full-vocabulary row_number window — same shape as top_k_vocabulary;
    # the rank window runs only over the k survivors.
    order = [F.desc("n_exact"), F.asc("tok")]
    topk = (
        exact.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select(F.col("tok").alias("token"), "rank", "n_exact")
    )
    est = cms_estimate(cms_build(toks, depth=depth, width=width), topk, depth=depth, width=width)
    # n_total from the exact aggregate, not a third corpus scan — the three
    # toks subtrees are not identical so ReuseExchange would not fire
    totals = exact.agg(F.sum("n_exact").alias("n_total"))
    bound = F.ceil(F.lit(2.0) * F.col("n_total") / F.lit(width)).cast("bigint")
    return (
        est.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "rank",
            "n_exact",
            "cms_est",
            (F.col("cms_est") >= F.col("n_exact")).alias("no_undercount"),
            ((F.col("cms_est") - F.col("n_exact")) <= bound).alias("within_eps"),
        )
        .orderBy("rank")
    )
