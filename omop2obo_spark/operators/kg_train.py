"""KG-embedding training-data operators: deterministic negative sampling.

The reference stops at emitting the mapping table; a knowledge-graph
built at 10^12-turn scale is immediately training data for KG-embedding
models (TransE/DistMult-family), and every such trainer needs corrupted
("negative") triples sampled per positive. RNG-based corruption is
non-reproducible across runs/partitionings and un-oracle-able; this is
the hash-seeded formulation: negative ``i`` for a triple is a pure
function of (salt, subj, pred, obj, i), so shards can be regenerated
byte-identically and an independent SQL engine can replay the exact
selection.

Reference surface mirrored: none (beyond-reference training-pipeline
operator, same family as textstats.hash_split / weighted_sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omop2obo_spark.operators.prefix import two_level_prefix


def entity_index(entities: DataFrame, ent_col: str = "ent", n_buckets: int = 256) -> DataFrame:
    """Deterministic dense index over an entity dimension: each distinct
    entity gets ``idx`` in [0, N) equal to its rank in ``(md5(ent),
    ent)`` order — a pure function of the entity SET, independent of
    partitioning, insertion order, and engine.

    The naive spelling is one global ``row_number`` window — a
    single-partition sort of the whole dimension. This uses the shared
    :func:`~omop2obo_spark.operators.prefix.two_level_prefix` scaffold
    over md5-prefix RANGE buckets (monotone in the hash, so bucket order
    concatenates to global hash order; uniform because the hash is).
    """
    if not 1 <= n_buckets <= 256:
        raise ValueError(f"n_buckets must be in [1, 256], got {n_buckets}")
    h = F.md5(F.col(ent_col).cast("string"))
    bucket = F.floor(
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") * n_buckets) / F.lit(256)
    )
    keyed = entities.select(F.col(ent_col).alias("ent")).distinct().select(
        "ent", h.alias("__h"), bucket.alias("__b")
    )
    return two_level_prefix(keyed, ["__h", "ent"], "idx").select("ent", "idx")


def negative_sampling(
    triples: DataFrame,
    k: int = 2,
    salt: str = "neg0",
    n_buckets: int = 256,
    broadcast_entities: bool = True,
) -> DataFrame:
    """Per positive triple, ``k`` hash-seeded tail-corrupted negatives
    ``(subj, pred, neg_obj)``, filtered against the true triple set
    (no corrupted triple that happens to be asserted survives — the
    standard "filtered" protocol of the KG-embedding literature).

    Candidate ``i`` maps ``conv(md5(salt|subj|pred|obj|i)[:15], 16, 10)
    mod N`` into the dense entity index built from the distinct objects,
    so the draw is uniform over entities and fully deterministic. Slots
    whose candidate equals the positive's own object, or collides with
    any asserted (subj, pred, ·), are dropped rather than re-drawn —
    re-draw loops are data-dependent control flow that neither scales
    nor replays; with N >> k the loss is a vanishing fraction and the
    oracle can replay the drop exactly.

    Scale shape: the fact table is touched twice (candidate explode,
    truth anti-join). The entity index is dimension-scale and broadcast
    (``broadcast_entities=True``, the lexicon-join shape of the linking
    tiers — ontology vocabularies are bounded); at extreme entity
    cardinality set it False for a shuffle equi-join on the uniform
    ``cand_idx`` key. N reaches the plan through a 1-row broadcast
    cross-join, never a driver collect. The anti-join key (subj, pred,
    neg_obj) is hash-uniform by construction.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ents = entity_index(triples.select(F.col("obj").alias("ent")), n_buckets=n_buckets)
    n_dim = ents.agg(F.count("*").alias("__n_ent"))
    seed = F.concat(
        F.lit(salt + "|"),
        F.col("subj"), F.lit("|"), F.col("pred"), F.lit("|"), F.col("obj"),
        F.lit("|"), F.col("neg_i").cast("string"),
    )
    cands = (
        triples.select("subj", "pred", "obj").distinct()
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_i"))
        .crossJoin(F.broadcast(n_dim))
        .select(
            "subj", "pred", "obj", "neg_i",
            F.pmod(
                F.conv(F.substring(F.md5(seed), 1, 15), 16, 10).cast("bigint"),
                F.col("__n_ent"),
            ).alias("cand_idx"),
        )
    )
    ent_side = F.broadcast(ents) if broadcast_entities else ents
    negs = (
        cands.join(ent_side, cands.cand_idx == ents.idx)
        .select("subj", "pred", "obj", "neg_i", F.col("ent").alias("neg_obj"))
        .filter(F.col("neg_obj") != F.col("obj"))
    )
    truth = triples.select(
        F.col("subj").alias("t_subj"), F.col("pred").alias("t_pred"), F.col("obj").alias("t_obj")
    ).distinct()
    return negs.join(
        truth,
        (negs.subj == truth.t_subj)
        & (negs.pred == truth.t_pred)
        & (negs.neg_obj == truth.t_obj),
        "left_anti",
    )


def _embedding_component(x, d, salt: str):
    """Deterministic pseudo-embedding component in [-1, 1): the md5-uniform
    of (salt, entity/relation id, dimension), affinely mapped. A pure
    function of its inputs — reproducible across runs, partitionings, and
    engines, hence SQL-replayable."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), x.cast("string"), F.lit("|"), d.cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return (bucket.cast("double") + F.lit(0.5)) / F.lit(float(2**31)) - F.lit(1.0)


def transe_distance(subj, pred, obj, dim: int = 16, salt: str = "emb0"):
    """TransE L1 distance ``||e_s + w_p - e_o||_1`` over deterministic
    pseudo-embeddings (entities share the ``salt+'e|'`` space, relations
    ``salt+'r|'``). One unrolled native-HOF expression per row — zero
    shuffle, zero join, stays in codegen. Rounded to 9 decimals so the
    float-sum order difference between engines (<1e-13 on a <=3*dim sum)
    can never cross a comparison boundary.

    A production scorer would read LEARNED embeddings from an array
    column; the plan shape (per-row vector math) is identical — this
    deterministic init is what makes the operator oracle-checkable.
    """
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.round(
        F.aggregate(
            dims,
            F.lit(0.0),
            lambda acc, d: acc
            + F.abs(
                _embedding_component(subj, d, salt + "e|")
                + _embedding_component(pred, d, salt + "r|")
                - _embedding_component(obj, d, salt + "e|")
            ),
        ),
        9,
    )


def transe_scores(
    triples: DataFrame,
    k: int = 2,
    dim: int = 16,
    margin: float = 1.0,
    salt: str = "emb0",
    neg_salt: str = "neg0",
    n_buckets: int = 256,
) -> DataFrame:
    """One deterministic TransE scoring epoch: per distinct positive
    triple, its L1 distance, the mean distance of its k filtered
    hash-seeded negatives (:func:`negative_sampling`), and the mean
    margin-ranking loss ``max(0, margin + d_pos - d_neg)`` — the
    quality/convergence signal a KG-embedding training pipeline computes
    every epoch, here as a pure function of (salts, triple set).

    Output: (subj, pred, obj, pos_dist, n_neg, avg_neg_dist,
    avg_margin_loss); triples whose negatives were all dropped by the
    filtered protocol keep n_neg=0 with NULL means.

    Scale shape: distances are per-row codegen expressions (no UDF, no
    embedding shuffle); the only exchanges are negative_sampling's own
    plus one groupBy on the (subj, pred, obj) grain — hash-uniform keys.
    """
    pos = triples.select("subj", "pred", "obj").distinct()
    pos_d = pos.withColumn(
        "pos_dist", transe_distance(F.col("subj"), F.col("pred"), F.col("obj"), dim, salt)
    )
    negs = negative_sampling(triples, k=k, salt=neg_salt, n_buckets=n_buckets)
    neg_d = negs.withColumn(
        "neg_dist", transe_distance(F.col("subj"), F.col("pred"), F.col("neg_obj"), dim, salt)
    )
    loss = F.greatest(F.lit(0.0), F.lit(float(margin)) + F.col("pos_dist") - F.col("neg_dist"))
    agg = (
        neg_d.join(pos_d, ["subj", "pred", "obj"])
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count("*").alias("n_neg"),
            F.round(F.avg("neg_dist"), 9).alias("avg_neg_dist"),
            F.round(F.avg(loss), 9).alias("avg_margin_loss"),
        )
    )
    return pos_d.join(agg, ["subj", "pred", "obj"], "left").select(
        "subj", "pred", "obj", "pos_dist",
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("bigint").alias("n_neg"),
        "avg_neg_dist", "avg_margin_loss",
    )


def link_prediction_metrics(
    triples: DataFrame,
    k: int = 8,
    dim: int = 16,
    salt: str = "emb0",
    neg_salt: str = "neg0",
    n_buckets: int = 256,
    hits_at: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """Sampled link-prediction evaluation — the standard KG-embedding
    quality report: per predicate, MRR and Hits@N of each positive
    triple ranked against its ``k`` filtered hash-seeded negatives
    (:func:`negative_sampling`) under the :func:`transe_distance`
    scorer.

    Rank = 1 + #negatives strictly closer than the positive (the
    optimistic convention; distances are 9-dec-rounded on both engines,
    so "strictly closer" is an engine-stable comparison). Positives
    whose negatives were ALL dropped by the filtered protocol have no
    ranking signal and are excluded from the metrics but counted in
    ``n_skipped`` — silently ranking them 1 would inflate every metric.

    Output per pred: ``(pred, n_scored, n_skipped, avg_n_neg, mrr,
    hits1, hits3, ...)`` — one tiny row per relation type.

    Scale shape: inherits :func:`transe_scores`' physics — distances are
    per-row codegen expressions (no UDF, no embedding shuffle), the rank
    reduction is one groupBy on the (subj, pred, obj) grain, and the
    final per-pred rollup is map-side combinable.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pos = triples.select("subj", "pred", "obj").distinct()
    pos_d = pos.withColumn(
        "pos_dist", transe_distance(F.col("subj"), F.col("pred"), F.col("obj"), dim, salt)
    )
    negs = negative_sampling(triples, k=k, salt=neg_salt, n_buckets=n_buckets)
    neg_d = negs.withColumn(
        "neg_dist", transe_distance(F.col("subj"), F.col("pred"), F.col("neg_obj"), dim, salt)
    )
    ranked = (
        neg_d.join(pos_d, ["subj", "pred", "obj"])
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count("*").alias("n_neg"),
            F.sum(
                F.when(F.col("neg_dist") < F.col("pos_dist"), 1).otherwise(0)
            ).alias("n_closer"),
        )
        .withColumn("rank", F.lit(1) + F.col("n_closer"))
    )
    # positives with zero surviving negatives never reach `ranked` (inner
    # join); count them from the positive side instead
    skipped = pos_d.join(
        ranked.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "left_anti"
    ).groupBy("pred").agg(F.count("*").alias("n_skipped"))
    hit_cols = [
        F.round(
            F.avg(F.when(F.col("rank") <= h, 1.0).otherwise(0.0)), 9
        ).alias(f"hits{h}")
        for h in hits_at
    ]
    scored = ranked.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.round(F.avg("n_neg"), 9).alias("avg_n_neg"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 9).alias("mrr"),
        *hit_cols,
    )
    # full outer: a pred whose positives were ALL skipped still reports
    # (n_scored=0, n_skipped=n) instead of vanishing from the eval
    return scored.join(skipped, on="pred", how="full").select(
        "pred",
        F.coalesce(F.col("n_scored"), F.lit(0)).cast("long").alias("n_scored"),
        F.coalesce(F.col("n_skipped"), F.lit(0)).cast("long").alias("n_skipped"),
        "avg_n_neg",
        "mrr",
        *[f"hits{h}" for h in hits_at],
    )
