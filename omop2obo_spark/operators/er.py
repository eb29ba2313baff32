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

from pyspark.sql import DataFrame, Window
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


def block_compare_graded(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    fields: dict[str, int],
    id_col: str = "rec_id",
) -> DataFrame:
    """Blocked comparison with GRADED agreement levels per field.

    Like :func:`block_compare`, but each field emits an integer
    ``lvl_<field>`` instead of a boolean: 2 = exact match (after
    lower+trim), 1 = close (Levenshtein distance <= the field's
    threshold in ``fields``), 0 = disagree / either side NULL. This is
    the comparison-level model production linkers (Splink) use: a typo
    is evidence FOR a match, just weaker than an exact hit, and
    collapsing it to "disagree" throws that signal away.

    Scale shape: identical to :func:`block_compare` — one hash
    equi-join on the block key, then pure projections.
    ``F.levenshtein``'s threshold form abandons the DP row scan as soon
    as the bound is exceeded, so the O(len^2) edit-distance cost is
    only paid near the diagonal; it also only runs at all inside the
    blocked candidate set, never corpus-wide.
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

    def level(f: str, thresh: int) -> F.Column:
        a, b = norm(f"__l_{f}"), norm(f"__r_{f}")
        return (
            F.when(a.isNull() | b.isNull(), F.lit(0))
            .when(a == b, F.lit(2))
            # threshold form returns -1 when the distance exceeds thresh
            .when(F.levenshtein(a, b, thresh) >= 0, F.lit(1))
            .otherwise(F.lit(0))
        )

    pairs = l.join(r, [f"__bl_{c}" for c in block_cols])
    return pairs.select(
        "left_id",
        "right_id",
        *[level(f, t).alias(f"lvl_{f}") for f, t in fields.items()],
    )


def fs_score_graded(
    pairs: DataFrame,
    params: dict[str, list[tuple[float, float]]],
    upper: float,
    lower: float,
) -> DataFrame:
    """Fellegi-Sunter weight over GRADED comparison levels.

    ``params[field][lvl] = (m_lvl, u_lvl)``: the probability a true
    match (resp. a random non-match) lands in comparison level ``lvl``
    for that field; each field's weight is ``log2(m_lvl / u_lvl)`` of
    the level the pair actually hit (per-level m/u sum to 1 across
    levels in a calibrated model; only positivity is enforced here so
    partial parameterizations stay usable). Same constant-folding and
    rounding contract as :func:`fs_score` — pure projection, no
    shuffle.
    """
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    weight = F.lit(0.0)
    for field, levels in params.items():
        if len(levels) < 2:
            raise ValueError(f"field {field!r}: need >= 2 comparison levels")
        expr = None
        for lvl, (m, u) in enumerate(levels):
            if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
                raise ValueError(
                    f"field {field!r} level {lvl}: need m, u in (0, 1), "
                    f"got m={m}, u={u}"
                )
            w = round(math.log2(m / u), 9)
            cond = F.col(f"lvl_{field}") == lvl
            expr = F.when(cond, F.lit(w)) if expr is None else expr.when(cond, F.lit(w))
        weight = weight + expr.otherwise(F.lit(float("nan")))
    scored = pairs.withColumn("weight", F.round(weight, 6))
    return scored.withColumn(
        "decision",
        F.when(F.col("weight") >= upper, F.lit("link"))
        .when(F.col("weight") <= lower, F.lit("non_link"))
        .otherwise(F.lit("possible")),
    )


def survivorship(
    records: DataFrame,
    assignment: DataFrame,
    attrs: list[str],
    id_col: str = "rec_id",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Golden-record construction: one canonical row per entity cluster.

    After linkage resolves record pairs into clusters (``assignment``:
    ``(id_col, cluster_col)`` — e.g. :func:`~.dedup.dedup_clusters`
    over the ``decision = 'link'`` pairs), survivorship decides which
    attribute VALUES the merged entity keeps. Rule implemented: per
    attribute, the modal non-null value within the cluster, ties broken
    by the lexicographically smallest value (deterministic under any
    partitioning); all-null attributes stay null. Adds ``canonical_id``
    (min record id — the same representative convention the dedup tier
    uses) and ``cluster_size`` (distinct records merged).

    Output: ``(cluster, canonical_id, cluster_size, <attr>...)`` with
    attribute values as strings (the tall union needs one common type;
    callers re-cast typed columns).

    Scale shape: attributes are stacked TALL first, so vote counting is
    ONE ``groupBy(cluster, attr, value)`` and one window over
    ``(cluster, attr)`` regardless of attribute count — not one
    shuffle per attribute; the final re-widen is a conditional-agg
    ``groupBy(cluster)``, not a pivot job. Cluster id is the hash key
    everywhere, so skew follows cluster size, which upstream LSH/ER
    blocking already bounds.
    """
    stack_expr = "stack({}, {}) as (attr, value)".format(
        len(attrs),
        ", ".join(f"'{a}', cast(`{a}` as string)" for a in attrs),
    )
    tagged = records.join(assignment, id_col)
    tall = tagged.selectExpr(f"`{cluster_col}` as __cluster", stack_expr).filter(
        F.col("value").isNotNull()
    )
    counts = tall.groupBy("__cluster", "attr", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("__cluster", "attr").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    best = counts.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    golden = best.groupBy("__cluster").agg(
        *[
            F.max(F.when(F.col("attr") == a, F.col("value"))).alias(a)
            for a in attrs
        ]
    )
    meta = tagged.groupBy(F.col(cluster_col).alias("__cluster")).agg(
        F.min(id_col).alias("canonical_id"),
        F.countDistinct(id_col).alias("cluster_size"),
    )
    return (
        meta.join(golden, "__cluster", "left")
        .withColumnRenamed("__cluster", cluster_col)
        .select(cluster_col, "canonical_id", "cluster_size", *attrs)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    window: int = 3,
    id_col: str = "doc_id",
    bucket_prefix_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995): records sort by a blocking key and every pair within
    ``window`` positions becomes a candidate — the classic complement
    to equi-join blocking (`block_compare`) and LSH (`minhash_lsh_pairs`):
    equi-blocks miss near-miss keys at block boundaries, while a sorted
    neighborhood catches records whose keys are CLOSE but not equal
    (typo'd surnames, shifted dates). Candidate volume is exactly
    ``(n−1)·window``-bounded, independent of key skew.

    The global sort position comes from the shared
    :func:`~omop2obo_spark.operators.prefix.two_level_prefix` scaffold
    (never a single-partition window): rows bucket by the key's first
    ``bucket_prefix_len`` characters — monotone in key order, so bucket
    order concatenates to global key order — with (key, id) tie-break
    making the permutation a pure function of the data. Pairing is then
    an EQUI-join on rank offsets (rank + d for d in 1..window), the
    same skew-free offset-join shape as ``textstats.token_pmi``.

    Returns (a, b, key_a, key_b, rank_gap) with a/b in rank order (the
    lower-ranked record is ``a``). NULL keys are excluded. At web scale
    raise ``bucket_prefix_len`` so the prefix histogram spreads buckets.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from omop2obo_spark.operators.prefix import two_level_prefix

    keyed = (
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .withColumn("__b", F.substring(F.col("__k"), 1, bucket_prefix_len))
    )
    # both join sides consume the rank table; materialize it once so the
    # prefix scaffold (incl. its offset-dim window) doesn't run twice
    ranked = (
        two_level_prefix(keyed, [F.col("__k").asc(), F.col("id").asc()], "rank")
        .select("id", "__k", F.col("rank").cast("bigint").alias("rank"))
        .localCheckpoint(eager=True)
    )
    targets = ranked.select(
        F.col("id").alias("a"),
        F.col("__k").alias("key_a"),
        F.col("rank").alias("__ra"),
        F.explode(
            F.array(*[F.col("rank") + F.lit(d) for d in range(1, window + 1)])
        ).alias("rank"),
    )
    return (
        targets.join(ranked, on="rank")
        .select(
            "a",
            F.col("id").alias("b"),
            "key_a",
            F.col("__k").alias("key_b"),
            (F.col("rank") - F.col("__ra")).cast("int").alias("rank_gap"),
        )
    )
