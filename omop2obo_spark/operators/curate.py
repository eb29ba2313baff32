"""Corpus curation plan: the end-to-end training-data filter funnel.

Composes the corpus primitives (language ID, quality scoring, exact
dedup, MinHash-LSH near-dedup + connected-component resolution) into the
single keep/drop decision a pretraining-data pipeline runs over raw
documents, and reports per-stage survivor counts — the funnel metric
every data-curation run is judged by.

Scale shape: the language and quality stages are pure native column
expressions (whole-stage codegen, no shuffle); exact dedup shuffles once
on a 32-char hash; the near-dup stage shuffles band keys and shingles of
the surviving docs (never raw text), verifies only band-colliding pairs,
and resolves components over the confirmed-pair graph, which is orders of
magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omop2obo_spark.operators.dedup import (
    dedup_clusters,
    dedup_keep_canonical,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from omop2obo_spark.operators.textstats import lang_id, quality_features

FUNNEL_STAGES = ["s0_input", "s1_lang", "s2_quality", "s3_exact_dedup", "s4_near_dedup"]


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    max_punct_ratio: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 8,
    k: int = 3,
    jaccard_threshold: float = 0.2,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel and return ``(curated, funnel)``.

    ``curated`` keeps the input schema; ``funnel`` is
    ``(stage, n_docs)`` — one row per :data:`FUNNEL_STAGES` entry, the
    survivor count after that stage.  Quality thresholds compare the
    4-decimal-rounded ratios ``quality_features`` emits, so the decision
    is engine-portable (same rounding in the SQL oracle).

    The near-dedup stage is the full candidate→verify→resolve chain: LSH
    band collisions propose pairs, exact n-gram Jaccard ≥
    ``jaccard_threshold`` confirms them (aggressive banding over-proposes
    by design — un-verified candidates over-merge into hairball clusters),
    and connected components turn confirmed pairs into keep/drop groups.
    """
    cols = docs.columns

    s1 = lang_id(docs, text_col).filter(F.col("lang_pred") == lang).select(*cols)
    s2 = quality_features(s1, text_col).filter(
        (F.col("q_tokens") >= min_tokens)
        & (F.col("q_alpha_ratio") >= min_alpha_ratio)
        & (F.col("q_punct_ratio") <= max_punct_ratio)
    ).select(*cols)

    keep_exact = exact_dedup(s2, id_col, text_col).filter(
        F.col(id_col) == F.col("canonical_id")
    ).select(id_col)
    # materialize the exact-dedup survivors once: they feed LSH pair
    # generation, the keep-canonical anti-join, AND the funnel count —
    # and dedup_clusters below runs eager jobs over them anyway.
    # localCheckpoint (not persist) so there is no unpersist to forget;
    # blocks release when the plan is garbage collected.
    s3 = s2.join(keep_exact, on=id_col, how="left_semi").localCheckpoint(eager=True)

    cand = minhash_lsh_pairs(s3, id_col, text_col, n_hashes=n_hashes, bands=bands, k=k)
    pairs = ngram_jaccard_pairs(
        s3, pairs=cand, id_col=id_col, text_col=text_col, k=k,
        threshold=jaccard_threshold,
    ).select("a", "b")
    clusters = dedup_clusters(pairs)  # eager: iterates to fixpoint
    s4 = dedup_keep_canonical(s3, clusters, id_col)

    # one corpus scan covers the three stateless head counts (input /
    # lang-survivors / quality-survivors) via conditional aggregation —
    # counting s1 and s2 directly would re-run the lang+quality
    # expressions as two more full scans of the raw corpus. s3/s4 read
    # the checkpointed survivors, so their counts are cheap.
    pass_lang = F.col("lang_pred") == lang
    pass_quality = (
        (F.col("q_tokens") >= min_tokens)
        & (F.col("q_alpha_ratio") >= min_alpha_ratio)
        & (F.col("q_punct_ratio") <= max_punct_ratio)
    )
    head = quality_features(lang_id(docs, text_col), text_col).agg(
        F.count("*").alias("c0"),
        F.coalesce(F.sum(F.when(pass_lang, 1)), F.lit(0)).alias("c1"),
        F.coalesce(F.sum(F.when(pass_lang & pass_quality, 1)), F.lit(0)).alias("c2"),
    )
    funnel = head.selectExpr(
        "stack(3, 's0_input', cast(c0 as bigint), 's1_lang', cast(c1 as bigint),"
        " 's2_quality', cast(c2 as bigint)) as (stage, n_docs)"
    )
    for name, df in zip(FUNNEL_STAGES[3:], [s3, s4]):
        funnel = funnel.unionByName(
            df.agg(F.lit(name).alias("stage"), F.count("*").alias("n_docs"))
        )
    return s4, funnel


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate detection: lines (trimmed, lowercased)
    that appear in at least ``min_doc_frac`` of documents (and at least
    ``min_docs`` absolute) — headers, footers, cookie banners, license
    stubs. Returns ``(line, n_docs, doc_frac)``.

    One shuffle keyed on the line value (partial-aggregated distinct per
    doc first, so a line repeated inside one doc counts that doc once).
    The result is dimension-sized by construction: a line must recur
    across >= min_doc_frac of the corpus to qualify, so at most
    1/min_doc_frac distinct values per document survive on average —
    safe to broadcast back.
    """
    total = docs.count()
    lines = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    # one-arg lambda on purpose: F.trim itself has an
                    # optional 2nd param, so transform would pass (x, idx)
                    # and trim the index digits off every line
                    F.transform(F.split(F.lower(F.col(text_col)), "\n"), lambda x: F.trim(x)),
                    lambda x: x != "",
                )
            )
        ).alias("line"),
    )
    import math

    thresh = max(min_docs, math.ceil(total * min_doc_frac))
    return (
        lines.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= thresh)
        .withColumn("doc_frac", F.round(F.col("n_docs") / F.lit(total), 9))
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    boilerplate: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Strip every boilerplate line from every document, preserving the
    order and original (untrimmed) form of the surviving lines; documents
    whose every line is boilerplate keep an empty string.

    The boilerplate set is broadcast (dimension-sized per
    :func:`boilerplate_lines`) and applied with a native higher-order
    ``filter`` over the split lines — the corpus never shuffles and no
    Python runs per row. Matching uses the same normalization the
    detector used (trim + lowercase); empty lines inside the document are
    kept as formatting.
    """
    rows = [r.line for r in boilerplate.select("line").collect()]
    bp = F.lit(rows).cast("array<string>") if rows else F.array().cast("array<string>")
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda x: (F.trim(F.lower(x)) == "") | ~F.array_contains(bp, F.trim(F.lower(x))),
    )
    return docs.withColumn(text_col, F.array_join(kept, "\n"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Eval-set contamination detection: for every corpus document, the
    fraction of its token ``n``-gram occurrences that appear anywhere in
    the ``benchmark`` set — the standard n-gram-overlap decontamination
    test a pretraining corpus runs against held-out benchmarks before
    training (n=8..13 in common practice).

    Returns ``(id_col, n_grams, n_hits, contamination_frac)``; documents
    shorter than ``n`` tokens have zero grams and fraction 0.0.

    Scale shape: the benchmark's distinct n-gram vocabulary is
    dimension-sized (eval sets are tiny next to a pretraining corpus) and
    is broadcast, so the corpus-side gram stream joins without a
    shuffle; the only wide exchange is the final partial-aggregated
    groupBy on the document id. Both sides tokenize identically
    (lower + collapse whitespace), and no gram longer than the document
    is fabricated.
    """

    def grams(col: Column) -> Column:
        t = F.filter(
            F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "),
            lambda x: x != "",
        )
        idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - n + 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))

    bench_grams = (
        benchmark.select(F.explode(grams(F.col(text_col))).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = docs.select(
        F.col(id_col), F.explode_outer(grams(F.col(text_col))).alias("gram")
    )
    joined = corpus.join(F.broadcast(bench_grams), on="gram", how="left")
    return joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.sum("__hit"), F.lit(0))
            / F.greatest(F.count("gram"), F.lit(1)),
            9,
        ).alias("contamination_frac"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Sub-document exact deduplication: split every document into
    paragraphs, keep only the globally-first occurrence of each distinct
    paragraph (normalized: trim + lowercase + collapsed whitespace), and
    reassemble documents from their surviving paragraphs in original
    order — the paragraph-granularity exact-substring dedup that removes
    cross-document boilerplate and within-document repetition a whole-doc
    hash can't see ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022, at paragraph granularity).

    "First occurrence" is the lexicographically smallest ``(id_col,
    paragraph position)`` — deterministic under any partitioning.
    Whitespace-only paragraphs are structural formatting and are always
    kept. Documents whose every paragraph loses degrade to an empty
    string, never a dropped row.

    Returns the input columns with ``text_col`` rewritten plus
    ``n_paras`` / ``n_kept`` counts.

    Scale shape — deliberately NOT a window over the normalized
    paragraph: a corpus-wide footer would put billions of rows in one
    window partition (the classic boilerplate straggler). Instead the
    winner per distinct paragraph is a ``min(struct(id, pos))``
    aggregation — partial aggregation combines map-side, so the hottest
    paragraph contributes one row per input partition to the reduce —
    and winners join back on the skew-free ``(id, pos)`` key. Paragraph
    text rides only the final uniform reassembly shuffle on the document
    id. No driver materialization and no UDFs.
    """
    other = [c for c in docs.columns if c != text_col]
    # posexplode_outer: a NULL text splits to NULL and a plain posexplode
    # would drop the document row entirely — the docstring's "never a
    # dropped row" guarantee requires the outer variant (the doc degrades
    # to an empty string with zero paragraphs)
    paras = docs.select(
        *other, F.posexplode_outer(F.split(F.col(text_col), sep)).alias("__idx", "__para")
    ).withColumn(
        "__norm",
        F.trim(F.regexp_replace(F.lower("__para"), r"\s+", " ")),
    )
    winners = (
        paras.filter(F.col("__norm") != "")
        .groupBy("__norm")
        .agg(F.min(F.struct(F.col(id_col).alias("i"), F.col("__idx").alias("x"))).alias("__w"))
        .select(
            F.col("__w.i").alias("__w_id"),
            F.col("__w.x").alias("__w_idx"),
            F.lit(True).alias("__won"),
        )
    )
    kept = paras.join(
        winners,
        (F.col(id_col) == F.col("__w_id")) & (F.col("__idx") == F.col("__w_idx")),
        "left",
    ).withColumn("__keep", (F.col("__norm") == "") | F.col("__won").isNotNull())
    return (
        kept.groupBy(*other)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__keep"), F.struct("__idx", "__para"))
                        )
                    ),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias(text_col),
            F.count("__idx").alias("n_paras"),
            F.coalesce(F.sum(F.col("__keep").cast("long")), F.lit(0)).alias("n_kept"),
        )
        .select(*docs.columns, "n_paras", "n_kept")
    )


def mad_outlier_flags(
    docs: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    approx: bool = False,
    round_dp: int = 9,
) -> DataFrame:
    """Robust per-group outlier flagging by the modified z-score
    (Iglewicz-Hoaglin): per group, median ``med`` and median absolute
    deviation ``mad`` of ``value_col``; each row gets ``robust_z =
    0.6745 * |v - med| / mad`` and ``is_outlier = robust_z > k`` (their
    recommended k=3.5 is the default). Median/MAD survive the heavy-tail
    length and score distributions of web corpora where mean/stddev
    rules (mu + 3 sigma) are dragged by the very outliers they hunt.

    Degenerate groups (``mad = 0``: over half the group shares one
    value) yield ``robust_z`` NULL and ``is_outlier = false`` — no
    robust scale estimate means no evidence of outlierness; flagging
    every non-modal row would be the wrong failure mode for a filter
    that drops data. NULL values likewise get NULL z and false.

    ``approx=False`` (default) uses exact interpolated percentiles —
    the oracle-checkable twin (DuckDB ``quantile_cont`` interpolates
    identically). ``approx=True`` switches both quantiles to
    ``percentile_approx`` (GK sketch) — the 100-TB path: bounded memory
    per group, no per-group value buffering. Group keys are
    corpus-partition grain (source, language); two grouped aggregates +
    two broadcast joins back, the fact table never re-shuffles.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    pct = (
        (lambda c: F.percentile_approx(c, 0.5, 10_000))
        if approx
        else (lambda c: F.percentile(c, F.lit(0.5)))
    )

    def grouped(frame: DataFrame, agg: Column):
        return frame.groupBy(*gcols).agg(agg) if gcols else frame.agg(agg)

    def attach(frame: DataFrame, dim: DataFrame) -> DataFrame:
        # LEFT join: rows with a NULL group key (or a group absent from the
        # dim because every value was NULL) pass through with NULL z /
        # false, rather than vanishing from the output of a FLAGGING op
        return (
            frame.join(F.broadcast(dim), on=gcols, how="left")
            if gcols
            else frame.crossJoin(F.broadcast(dim))
        )

    med_dim = grouped(docs.filter(v.isNotNull()), pct(v).alias("__med"))
    with_med = attach(docs, med_dim)
    dev = F.abs(v - F.col("__med"))
    mad_dim = grouped(
        with_med.filter(v.isNotNull()),
        pct(F.abs(v - F.col("__med"))).alias("__mad"),
    )
    out = attach(with_med, mad_dim)
    z = F.when(
        v.isNotNull() & (F.col("__mad") > 0),
        F.round(F.lit(0.6745) * dev / F.col("__mad"), round_dp),
    )
    return (
        out.withColumn("robust_z", z)
        .withColumn(
            "is_outlier", F.coalesce(F.col("robust_z") > F.lit(float(k)), F.lit(False))
        )
        .drop("__med", "__mad")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling weights (DSIR, Xie et
    al., NeurIPS 2023): score every raw document by how much more likely
    its hashed-unigram bag is under the TARGET domain's distribution
    than under the raw corpus's own — the standard recipe for skimming
    domain-relevant pretraining data out of a web crawl without a model.

    Features are md5-bucketed unigrams (``n_buckets`` buckets, the
    hashing trick — same md5-prefix slots as ``hashed_embedding`` so any
    engine reproduces them bit-exactly). Both distributions get add-one
    smoothing over the bucket space; a document's weight is

        sum over tokens of  log p_target(bucket) - log p_raw(bucket)

    with per-bucket log-ratios rounded to 9dp and the sum to 6dp for
    engine portability. Returns ``(id_col, n_tok, weight)``; empty
    documents weigh 0.0.

    Scale shape: the only fact-scale work is one token explode feeding
    two map-side-combined aggregations (bucket counts collapse to
    ``n_buckets`` rows; the per-doc sum keys on the doc id). Bucket
    totals and log-ratios live in an ``n_buckets``-row dimension built
    with a dimension-scale cross-join (no driver collect) and broadcast
    back into the token stream.
    """
    from omop2obo_spark.operators.textstats import tokens

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    def bucketed(frame: DataFrame) -> DataFrame:
        return frame.select(
            F.col(id_col),
            F.explode_outer(tokens(F.col(text_col))).alias("token"),
        ).withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10)
            .cast("bigint")
            % n_buckets,
        )

    raw_tok = bucketed(docs)
    raw_counts = (
        raw_tok.filter(F.col("token").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("__cr"))
    )
    tgt_counts = (
        bucketed(target)
        .filter(F.col("token").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("__ct"))
    )
    # Every token maps to SOME raw bucket, so the raw-count dim covers
    # every bucket a document can hit; target-missing buckets smooth to 1.
    dim = raw_counts.join(tgt_counts, "bucket", "left").na.fill({"__ct": 0})
    totals = dim.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    ratios = dim.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("__ct") + 1) / (F.col("__tt") + F.lit(n_buckets)))
            - F.log((F.col("__cr") + 1) / (F.col("__tr") + F.lit(n_buckets))),
            9,
        ).alias("__lw"),
    )
    scored = raw_tok.join(F.broadcast(ratios), "bucket", "left")
    return scored.groupBy(id_col).agg(
        F.count("token").cast("long").alias("n_tok"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("token").isNotNull(), F.col("__lw"))), F.lit(0.0)),
            6,
        ).alias("weight"),
    )


def dsir_sample(
    weights: DataFrame,
    k: int,
    temperature: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """The resampling half of DSIR: draw ``k`` documents without
    replacement with probability proportional to exp(weight /
    temperature), via the Gumbel-top-k trick made deterministic — the
    Gumbel noise for a document is derived from the md5 of its id, so
    the same corpus yields the same sample in any engine and at any
    partitioning.

    Returns ``(id_col, weight, score, rank)`` for the k winners;
    ``score = weight / temperature + gumbel`` rounded to 6dp, ties
    broken on the id.

    Scale shape: scoring is a pure projection; the top-k is a
    TakeOrdered (never a global sort materialization) since k rows bound
    the result.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir|"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(float(2**32 + 2))
    gumbel = -F.log(-F.log(u))
    scored = weights.select(
        F.col(id_col),
        "weight",
        F.round(F.col("weight") / F.lit(float(temperature)) + gumbel, 6).alias(
            "score"
        ),
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — no global
    # sort materializes; the rank window then runs over k rows only.
    from pyspark.sql.window import Window

    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def winsorize(
    docs: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [``lower``, ``upper``] quantile band — the feature-hygiene step
    before quality-score aggregation or model features, where a handful
    of pathological documents (a 10-GB line, a scraped binary blob)
    would otherwise dominate any mean-based statistic downstream.
    The clipping counterpart of :func:`mad_outlier_flags` (which flags;
    this bounds).

    Appends ``<value_col>_wins`` (clipped, NULL stays NULL) plus
    ``clipped_low`` / ``clipped_high`` flags. Quantiles are exact
    interpolated percentiles by default (the oracle twin — DuckDB
    ``quantile_cont`` interpolates identically); ``approx=True`` swaps
    in ``percentile_approx`` for the bounded-memory 100-TB path.

    Scale shape: one grouped quantile aggregate (a group-cardinality
    dim broadcast back); the fact table never re-shuffles. NULL group
    keys form their own group and ARE clipped against their own
    quantiles (null-safe join back, matching group_quota_cap /
    neyman_sample semantics).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    probs = F.array(F.lit(float(lower)), F.lit(float(upper)))
    pct = (
        F.percentile_approx(v, probs, 10_000)
        if approx
        else F.percentile(v, probs)
    )
    dim = (
        docs.filter(v.isNotNull()).groupBy(*gcols).agg(pct.alias("__qs"))
        if gcols
        else docs.filter(v.isNotNull()).agg(pct.alias("__qs"))
    )
    if gcols:
        # null-safe join: groupBy keeps the NULL key as its own group, so
        # the join back must match it too — a plain equi-join would let
        # NULL-group rows pass through unclipped (groupe-quota/Neyman pin
        # the same "NULL groups are their own group" semantics)
        dim_a = dim.select(
            *[F.col(c).alias(f"__dk_{c}") for c in gcols], "__qs"
        )
        cond = None
        for c in gcols:
            eq = F.col(c).eqNullSafe(F.col(f"__dk_{c}"))
            cond = eq if cond is None else (cond & eq)
        joined = docs.join(F.broadcast(dim_a), on=cond, how="left").drop(
            *[f"__dk_{c}" for c in gcols]
        )
    else:
        joined = docs.crossJoin(F.broadcast(dim))
    lo = F.element_at(F.col("__qs"), 1)
    hi = F.element_at(F.col("__qs"), 2)
    return joined.select(
        *docs.columns,
        F.when(v.isNull(), F.lit(None).cast("double"))
        .otherwise(F.least(F.greatest(v, lo), hi))
        .alias(f"{value_col}_wins"),
        # NULL values (and NULL-key groups with no dim row) are pinned to
        # false — a NULL flag would slip through downstream `NOT clipped`
        # filters
        F.coalesce(v < lo, F.lit(False)).alias("clipped_low"),
        F.coalesce(v > hi, F.lit(False)).alias("clipped_high"),
    )


def group_quota_cap(
    docs: DataFrame,
    group_col: str,
    order_col: str,
    n_keep: int,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Per-group quota capping — "keep the best ``n_keep`` documents per
    domain/source" (the C4/RefinedWeb-style anti-monoculture stage: a
    handful of template-heavy hosts would otherwise dominate the kept
    corpus). Rows rank within their group by ``order_col`` (descending
    by default — higher is better), ties broken by ``id_col`` so the
    cut is a pure function of the data; appends ``grp_rank`` and a
    ``kept`` flag rather than dropping rows (callers filter, audits
    count).

    Scale shape: one window partitioned by the group key. Per-DOMAIN
    groups are high-cardinality and individually small, so partitions
    stay bounded — this is the window's legitimate use; for LOW-
    cardinality fact-scale groups (source/language) use the two-level
    prefix ops (:func:`~omop2obo_spark.operators.analysis.grouped_percent_rank`)
    instead. NULL group keys form their own group (pinned, matching
    groupBy semantics); NULL order values sort LAST either direction.
    """
    if n_keep < 1:
        raise ValueError(f"n_keep must be >= 1, got {n_keep}")
    from pyspark.sql.window import Window

    v = F.col(order_col)
    order = [
        v.desc_nulls_last() if descending else v.asc_nulls_last(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return docs.select(
        "*",
        F.row_number().over(w).alias("grp_rank"),
    ).withColumn("kept", F.col("grp_rank") <= int(n_keep))


def blocklist_filter(
    docs: DataFrame,
    blocklist: list[str],
    max_hits: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Wordlist filtering (the C4 "bad words" stage): count whole-word
    occurrences of each blocklist term (case-insensitive) and flag
    documents exceeding ``max_hits`` total. The list is compiled into
    ONE alternation regex with word boundaries — a single codegen
    ``regexp_count`` pass per row, no explode, no join, no Python.

    Appends ``n_blocked`` (total hits) and ``blocked`` (hits >
    ``max_hits``); NULL text counts 0 and passes. Terms are regex-
    escaped, so the list is plain words/phrases, not patterns.

    Scale shape: zero shuffle — pure projection over the scan. The
    compiled pattern is O(list size) per row; for very large lists
    (>10^4 terms) switch to the token-join shape of
    ``contamination_check`` instead.
    """
    import re as _re

    if not blocklist:
        raise ValueError("blocklist must be non-empty")

    def term_pat(t: str) -> str:
        # \b only works adjacent to word characters: a term ending in a
        # symbol ("c++") would get a boundary that can never match — so
        # anchor each side only when that side starts/ends with \w
        lead = r"\b" if _re.match(r"\w", t) else ""
        tail = r"\b" if _re.search(r"\w$", t) else ""
        return lead + _re.escape(t) + tail

    pat = "(?i)(?:" + "|".join(term_pat(t.lower()) for t in sorted(blocklist)) + ")"
    hits = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.regexp_count(F.col(text_col), F.lit(pat))
    )
    return docs.select(
        "*",
        hits.cast("long").alias("n_blocked"),
    ).withColumn("blocked", F.col("n_blocked") > int(max_hits))
