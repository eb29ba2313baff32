"""Context-window sequence packing: assign documents to fixed-token-budget
training sequences — the step between a curated corpus and an LLM
pretraining dataloader.

Greedy first-fit packing is inherently sequential (each decision depends
on the running remainder), so it cannot be expressed as a window
cumulative sum — ``floor(cumsum/budget)`` lets a pack straddle the budget
boundary.  The scalable form:

  1. hash-bucket documents (md5-prefix mod — engine-portable and
     deterministic, the same trick as ``textstats.hash_sample``);
  2. pack each bucket independently with a sequential greedy pass inside
     ``applyInPandas`` (the legitimate Pandas-UDF case: semantics the
     built-in operators genuinely cannot express).

Buckets are embarrassingly parallel and the result is a pure function of
(doc ids, token counts, budget, n_buckets) — independent of partitioning,
cluster size, or execution order — so a 100-TB packing run is resumable
and its oracle is replayable (DuckDB recursive CTE walking each bucket in
doc-id order).  Size ``n_buckets`` so one bucket's (id, token) pairs fit
an executor: ``applyInPandas`` materializes the group — at 10^12 docs use
~10^5 buckets, not 32.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from omop2obo_spark.operators.prefix import two_level_prefix

# Sizing target for the derived bucket count: one applyInPandas group
# materializes ~(id, bucket, tokens) per doc — a few dozen bytes — so
# 250k docs/bucket keeps a group in the tens of MB, far under executor
# memory, while still giving 4,000 buckets per 10^9 docs (ample
# parallelism headroom at any cluster size).
DOCS_PER_BUCKET = 250_000


def derive_pack_buckets(n_docs: int, docs_per_bucket: int = DOCS_PER_BUCKET) -> int:
    """Bucket count that bounds one sequential packing group's memory as a
    function of the corpus, not of caller tuning. Always ≥ 8 so small
    inputs still parallelize."""
    return max(8, math.ceil(max(n_docs, 1) / docs_per_bucket))

def _pack_schema(id_type: T.DataType) -> T.StructType:
    """Output schema for :func:`pack_sequences`; ``doc_id`` inherits the
    input id type — a hard-coded LongType would silently NULL every
    non-bigint key through the cast (string conv ids), breaking both the
    join-back and the sort that packing determinism rests on."""
    return T.StructType(
        [
            T.StructField("doc_id", id_type, False),
            T.StructField("bucket", T.LongType(), False),
            T.StructField("pack_idx", T.LongType(), False),
            T.StructField("n_tokens", T.LongType(), False),
        ]
    )


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic, engine-portable bucket id: md5-prefix mod."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    max_bucket_rows: int = 4 * DOCS_PER_BUCKET,
) -> DataFrame:
    """Greedy first-fit packing of docs into sequences of ≤ ``budget``
    tokens, per hash bucket, in ``id_col`` order.

    Output: ``(doc_id, bucket, pack_idx, n_tokens)`` — sequence identity
    is ``(bucket, pack_idx)``.  A doc larger than the budget gets a pack
    of its own (and overflows it — truncation is the caller's policy).

    ``n_buckets=None`` (the default) derives the bucket count from a
    ``docs.count()`` via :func:`derive_pack_buckets`, so the per-group
    memory bound holds without caller tuning — the one extra count job is
    an aggregate-pushdown parquet scan, noise next to the shuffle it
    sizes. Pass an explicit ``n_buckets`` when the layout must be
    replayable against a fixed oracle. Either way, a group that exceeds
    ``max_bucket_rows`` fails fast with an actionable error instead of
    silently OOMing the executor mid-``applyInPandas`` (hash skew on a
    pathological id distribution, or a caller-pinned bucket count far too
    small for the corpus).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets is None:
        n_buckets = derive_pack_buckets(docs.count())
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), n_buckets).alias("bucket"),
        # NULL token counts count as 0 — one NaN would otherwise poison
        # the greedy accumulator for the rest of the bucket
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_bucket_rows:
            raise ValueError(
                f"pack_sequences: bucket {pdf['bucket'].iat[0]} holds "
                f"{len(pdf)} docs > max_bucket_rows={max_bucket_rows}; "
                f"raise n_buckets (currently {n_buckets}) or leave it None "
                "to derive from corpus size"
            )
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        packs = []
        acc = 0
        idx = -1
        for t in pdf["n_tokens"]:
            if idx < 0 or acc + t > budget:
                idx += 1
                acc = 0
            acc += t
            packs.append(idx)
        pdf["pack_idx"] = pd.Series(packs, dtype="int64")
        return pdf[["doc_id", "bucket", "pack_idx", "n_tokens"]]

    return keyed.groupBy("bucket").applyInPandas(
        pack, _pack_schema(docs.schema[id_col].dataType)
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket packing efficiency: sequences, docs, token fill ratio —
    the metric that tells you whether the budget/corpus combination wastes
    context window.  One shuffle on (bucket, pack_idx) then on bucket."""
    per_pack = packed.groupBy("bucket", "pack_idx").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("pack_tokens")
    )
    return per_pack.groupBy("bucket").agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg(F.least(F.col("pack_tokens"), F.lit(budget)) / budget), 6).alias(
            "fill_ratio"
        ),
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard layout: every row gets a ``shard_id``
    (md5-prefix bucket of ``salt|key`` — engine-portable, stable across
    runs/partitionings) and a ``shard_pos`` (0-based row number within
    the shard, ordered by the key) — the reproducible output layout a
    training dataloader needs so that shard N, position P names the same
    example on every rebuild.

    Scale shape: one hash exchange on ``shard_id``; each window sorts
    only its own shard. Size ``n_shards`` so one shard fits an executor
    (~10^4-10^5 shards at 100 TB) — shards are the unit of both write
    parallelism and dataloader striping, so more shards is the natural
    direction; never run this with n_shards ≪ parallelism.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql.window import Window

    sid = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("bigint"),
        F.lit(n_shards),
    )
    # tiebreak duplicate keys on a content hash of the full row: row_number
    # over the key alone would break ties by partition arrival order, so a
    # rebuild could swap positions — (shard, pos) must name the same example
    # on every run. Full-duplicate rows remain interchangeable (identical).
    w = Window.partitionBy("shard_id").orderBy(
        F.col(key_col).asc(), F.md5(F.to_json(F.struct(*df.columns))).asc()
    )
    return (
        df.withColumn("shard_id", sid)
        .withColumn("shard_pos", F.row_number().over(w).cast("long") - 1)
    )


def curriculum_order(
    docs: DataFrame,
    order_col: str,
    key_col: str = "doc_id",
    n_buckets: int = 256,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Global 0-based training position of every row in ``(order_col,
    key_col)`` ascending order — curriculum ordering (easy-to-hard by a
    difficulty score) as a deterministic column, WITHOUT a global sort.

    The naive spelling is ``row_number() OVER (ORDER BY score)`` — a
    single-partition sort of the corpus. This is the two-level prefix sum
    (the :func:`~omop2obo_spark.operators.kg_train.entity_index` shape,
    generalized to an arbitrary numeric order): value-monotone range
    buckets, per-bucket counts broadcast as offsets, and a within-bucket
    row_number bounded to ~1/``n_buckets`` of the corpus. Equi-width
    buckets come from the corpus's own min/max (1-row broadcast bounds);
    for skewed scores pass ``boundaries`` (e.g. from
    ``layout.quantile_buckets``) to equi-populate the buckets instead.
    NULL scores are excluded (no defined position). Descending curricula:
    negate the score. Output: input columns + ``pos`` (bigint).

    Ties order by ``key_col``, so the result is a pure function of the
    data — partitioning- and engine-independent.
    """
    if not 1 <= n_buckets <= 100_000:
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    from omop2obo_spark.operators.layout import rank_bucket

    v = F.col(order_col).cast("double")
    clean = docs.filter(v.isNotNull())
    if boundaries is not None:
        keyed = clean.withColumn("__b", rank_bucket(v, boundaries))
    else:
        bounds = clean.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
        span = F.col("__hi") - F.col("__lo")
        b = F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                F.floor((v - F.col("__lo")) / span * n_buckets).cast("bigint"),
                F.lit(n_buckets - 1),
            )
        )
        keyed = (
            clean.crossJoin(F.broadcast(bounds))
            .withColumn("__b", b)
            .drop("__lo", "__hi")
        )
    return (
        two_level_prefix(keyed, [v.asc(), F.col(key_col).asc()], "pos")
        .withColumn("pos", F.col("pos").cast("bigint"))
        .drop("__b")
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    key_col: str = "doc_id",
    salt: str = "ep",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets ``pos``
    in [0, N) equal to its rank in ``(md5(salt|epoch|key), key)`` order —
    a different pseudorandom permutation per epoch, yet a pure function
    of (salt, epoch, key set): reproducible across runs, partitionings,
    and engines, so a crashed epoch resumes with the identical order and
    an independent engine can replay it.

    ``rand()``-based shuffles are none of those things, and a naive
    ``row_number() OVER (ORDER BY hash)`` is a single-partition sort of
    the corpus; this is the shared
    :func:`~omop2obo_spark.operators.prefix.two_level_prefix` scaffold
    over md5-prefix RANGE buckets (monotone in the hash, so bucket order
    concatenates to global hash order; uniform because the hash is).
    Duplicate keys get adjacent positions, tie-broken by the key itself.

    Compose with :func:`assign_shards` downstream (shuffle first, shard
    second) for per-epoch shard layouts.
    """
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    if not 1 <= n_buckets <= 256:
        raise ValueError(f"n_buckets must be in [1, 256], got {n_buckets}")
    h = F.md5(
        F.concat(F.lit(f"{salt}|{epoch}|"), F.col(key_col).cast("string"))
    )
    bucket = F.floor(
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") * n_buckets) / F.lit(256)
    )
    keyed = docs.select(*docs.columns, h.alias("__h"), bucket.alias("__b"))
    return (
        two_level_prefix(keyed, ["__h", key_col], "pos")
        .withColumn("pos", F.col("pos").cast("bigint"))
        .drop("__b", "__h")
    )


def length_bucket_stats(
    docs: DataFrame,
    n_buckets: int = 8,
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """Sequence-length bucketing audit for training-batch construction:
    assign every doc to one of ``n_buckets`` quantile length buckets
    (whitespace token count) and report, per bucket, how much padding a
    batch drawn from it wastes — ``padding_waste = n·max_tok − sum_tok``
    tokens, the cost of padding every member to the bucket's longest
    sequence. Length-grouped batching is the standard fix for padding
    blowup in LLM fine-tuning; this operator both derives the bucket
    boundaries and quantifies the residual waste per bucket.

    Bucket rule (pinned, engine-portable): boundaries are the exact
    interpolated i/n quantiles (i = 1..n−1) of the token counts;
    ``bucket = #{boundaries strictly below the doc's count}`` — ties at
    a boundary fall in the LOWER bucket. NULL text counts 0 tokens.

    Returns (bucket, n_docs, min_tok, max_tok, sum_tok, padding_waste,
    waste_pct) — waste_pct rounded 6dp, 0.0 for an all-empty bucket.

    Scale shape: one aggregate for the boundary vector (a 1-row dim
    crossJoin-broadcast back — never a global sort or single-partition
    window), then one groupBy over ``n_buckets`` keys with map-side
    combine. ``approx=True`` swaps the exact percentile for
    ``percentile_approx`` — the single-pass sketch path at 100 TB,
    error-bounded against exact in tests (same twin pattern as
    ``textstats.corpus_profile``).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from omop2obo_spark.operators.textstats import whitespace_token_count

    ntok = whitespace_token_count(
        F.coalesce(F.col(text_col), F.lit(""))
    ).cast("bigint")
    toks = docs.select(ntok.alias("__ntok"))
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    pct = F.percentile_approx if approx else F.percentile
    bounds = toks.agg(pct(F.col("__ntok"), probs).alias("__bs"))
    bucket = F.size(
        F.filter(F.col("__bs"), lambda x: F.col("__ntok") > x)
    ).cast("int")
    return (
        toks.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), F.col("__ntok"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("__ntok").alias("min_tok"),
            F.max("__ntok").alias("max_tok"),
            F.sum("__ntok").alias("sum_tok"),
        )
        .select(
            "bucket", "n_docs", "min_tok", "max_tok", "sum_tok",
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok")).alias("padding_waste"),
            F.when(F.col("max_tok") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok"))
                    / (F.col("n_docs") * F.col("max_tok")),
                    6,
                )
            )
            .alias("waste_pct"),
        )
    )
