"""Probabilistic entity resolution: blocked comparison + Fellegi-Sunter
scoring.

The reference links clinical concepts to ontology classes through exact
keys and string similarity (/root/reference/omop2obo/
clinical_concept_annotator.py); a KG built from heterogeneous sources
also needs RECORD linkage — deciding whether two structured records
describe the same real-world entity. The canonical model is
Fellegi-Sunter (JASA 1969): each compared field contributes a log-odds
agreement weight ``log2(m/u)`` when it matches and a disagreement
weight ``log2((1-m)/(1-u))`` when it doesn't, where ``m`` is the
probability the field agrees on a true match and ``u`` on a random
non-match; the summed weight is thresholded into link / possible /
non-link. (The same decision model modern ER engines such as Splink
implement on SQL backends.)

Scale shape: candidate generation is ALWAYS a blocked equi-join — the
block key is the join key, so Catalyst plans a hash join and the
quadratic blow-up is bounded per block, never corpus-wide. Field
agreement and weight summation are pure projections (whole-stage
codegen); the decision needs no shuffle at all. Pair volume is
controlled by the blocking scheme, which `blocking_quality`
(operators/dedup.py) evaluates — the two operators compose into the
standard ER pipeline: block -> compare -> score -> (canonical_graph)
cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_compare(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    fields: list[str],
    id_col: str = "rec_id",
) -> DataFrame:
    """Blocked pairwise comparison.

    Equi-joins ``left`` x ``right`` on ``block_cols`` (the blocking
    scheme) and emits one row per candidate pair with a boolean
    ``agree_<field>`` per compared field (exact match after
    lower+trim; NULL on either side counts as disagreement).

    Returns ``(left_id, right_id, agree_f1, ..., agree_fn)``.
    """
    l = left.select(
        F.col(id_col).alias("left_id"),
        *[F.col(c).alias(f"__bl_{c}") for c in block_cols],
        *[F.col(c).alias(f"__l_{c}") for c in fields],
    )
    r = right.select(
        F.col(id_col).alias("right_id"),
        *[F.col(c).alias(f"__bl_{c}") for c in block_cols],
        *[F.col(c).alias(f"__r_{c}") for c in fields],
    )
    norm = lambda c: F.lower(F.trim(F.col(c).cast("string")))  # noqa: E731
    pairs = l.join(r, [f"__bl_{c}" for c in block_cols])
    return pairs.select(
        "left_id",
        "right_id",
        *[
            F.coalesce(norm(f"__l_{f}") == norm(f"__r_{f}"), F.lit(False)).alias(
                f"agree_{f}"
            )
            for f in fields
        ],
    )


def fs_score(
    pairs: DataFrame,
    params: dict[str, tuple[float, float]],
    upper: float,
    lower: float,
) -> DataFrame:
    """Fellegi-Sunter match weight + decision for compared pairs.

    ``pairs`` carries one ``agree_<field>`` boolean per field in
    ``params``; ``params[field] = (m, u)`` with ``0 < u < m < 1``.
    The pair weight is the sum of per-field log2 odds (agreement
    weights positive, disagreement weights negative), rounded to 6dp
    after summing 9dp-rounded field constants so any engine reproduces
    it. Decision: ``link`` when ``weight >= upper``, ``non_link`` when
    ``weight <= lower``, else ``possible``.

    Pure projection — no shuffle, no UDF; the per-field constants fold
    at plan time.
    """
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    weight = F.lit(0.0)
    for field, (m, u) in params.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"field {field!r}: need 0 < u < m < 1, got m={m}, u={u}"
            )
        agree_w = round(math.log2(m / u), 9)
        disagree_w = round(math.log2((1.0 - m) / (1.0 - u)), 9)
        weight = weight + F.when(
            F.col(f"agree_{field}"), F.lit(agree_w)
        ).otherwise(F.lit(disagree_w))
    scored = pairs.withColumn("weight", F.round(weight, 6))
    return scored.withColumn(
        "decision",
        F.when(F.col("weight") >= upper, F.lit("link"))
        .when(F.col("weight") <= lower, F.lit("non_link"))
        .otherwise(F.lit("possible")),
    )
