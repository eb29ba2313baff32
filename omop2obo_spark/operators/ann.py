"""Approximate-nearest-neighbor search over embedding columns.

Two strategies over an ``array<float>`` embedding column:
  * brute-force cosine top-k — the exactness baseline: broadcast the query
    set, one native ``zip_with``/``aggregate`` dot product per (query,
    candidate), window top-k. No UDF, no shuffle of the big side.
  * IVF (inverted-file) top-k — the scale path: pick C deterministic
    centroids, assign every vector to its nearest centroid (broadcast
    centroids), probe only the ``nprobe`` nearest centroid buckets per
    query. Cuts the candidate set by ~C/nprobe at the cost of recall.

Cosine here assumes unnormalized vectors (full formula); pre-normalized
embeddings short-circuit to the dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of ``vectors`` for each row of ``queries``.

    ``queries`` must be small (broadcast side); vectors scan stays local.
    Output: (query_id, vec_id, cos, rank), rank 1..k, self-match excluded
    when ids collide.
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    joined = vectors.join(F.broadcast(q), on=F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col, id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _nearest_assignments(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col, "centroid_id", cosine(F.col(vec_col), F.col("cvec")).alias("ccos")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF bucketing.

    ``kmeans_iters=0``: centroids = the ``n_centroids`` lowest-id vectors
    (TakeOrdered, no full sort) — fully SQL-expressible, used by the
    oracle-checked query. ``kmeans_iters>0``: refine those seeds with
    Lloyd's iterations, distributed — assignment is a broadcast join +
    window, the centroid update is posexplode → groupBy(centroid, dim
    position) → avg, and only the (n_centroids × dim) means table is
    collected per iteration (bounded by index size, never by data).
    Deterministic: seeds are id-ordered and ties break on centroid_id.

    Returns (centroids, assignments(vec_id, centroid_id)).
    """
    from pyspark.sql import types as T

    centroids = vectors.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    if kmeans_iters > 0:
        # centroid_id inherits the vector id type (string conv keys work
        # the same as the fixtures' long ids)
        cschema = T.StructType(
            [
                T.StructField("centroid_id", vectors.schema[id_col].dataType),
                T.StructField("cvec", T.ArrayType(T.DoubleType())),
            ]
        )
        # driver-side centroid map, bounded by index size (n_centroids)
        cur = {r.centroid_id: list(r.cvec) for r in centroids.collect()}
        for _ in range(kmeans_iters):
            assign = _nearest_assignments(vectors, centroids, id_col, vec_col)
            means = (
                vectors.join(assign, on=id_col)
                .select("centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
                .groupBy("centroid_id", "pos")
                # round the mean: float avg depends on partial-aggregation
                # order (partition layout), so an unrounded centroid is not
                # bit-stable across runs/retries; 9 decimals is far below any
                # meaningful cosine difference and far above the ~1e-13
                # reorder drift
                .agg(F.round(F.avg("x"), 9).alias("m"))
                .groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select(
                    "centroid_id",
                    F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
                )
            )
            # a centroid whose cluster emptied keeps its previous position
            # (groupBy only sees assigned rows) so the index never shrinks
            # below n_centroids
            cur.update({r.centroid_id: list(r.cvec) for r in means.collect()})
            centroids = vectors.sparkSession.createDataFrame(
                sorted(cur.items()), cschema
            )
    assignments = _nearest_assignments(vectors, centroids, id_col, vec_col)
    return centroids, assignments


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe the ``nprobe`` nearest
    centroid buckets per query, brute-force inside them. ``kmeans_iters``
    refines centroids with distributed Lloyd's (see :func:`ivf_assign`)."""
    centroids, assignments = ivf_assign(vectors, n_centroids, id_col, vec_col, kmeans_iters)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    qc = q.join(F.broadcast(centroids)).select(
        query_id_col, "centroid_id", "__qv", cosine(F.col("__qv"), F.col("cvec")).alias("ccos")
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    probes = qc.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= nprobe).select(
        query_id_col, "centroid_id", "__qv"
    )
    bucketed = vectors.join(assignments, on=id_col)
    cand = bucketed.join(
        F.broadcast(probes),
        on=(bucketed["centroid_id"] == probes["centroid_id"]) & (F.col(id_col) != F.col(query_id_col)),
    )
    scored = cand.select(
        query_id_col, id_col, F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|v| / 127``,
    ``q_i = floor(v_i / scale + 0.5)`` (half-up — spelled as ``floor``
    so every engine computes the identical double before truncating).
    Returns ``(id, qvec array<int>, scale double)`` with
    ``v_i ≈ q_i * scale`` and ``|q_i * scale - v_i| ≤ scale / 2``.

    The 100 TB rationale: a float32 embedding column is the dominant
    byte-weight of a vector corpus; int8 cuts scan + shuffle + cache
    bytes 4× while cosine ordering degrades only marginally (cosine is
    scale-invariant, so the per-vector scale never even needs to ship
    for ranking). All native expressions — no UDF, no shuffle.
    """
    mx = F.greatest(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
        ),
        F.lit(1e-12),
    )
    with_s = vectors.withColumn("__mx", mx)
    return with_s.select(
        id_col,
        F.transform(
            F.col(vec_col),
            lambda v: F.floor(v * 127.0 / F.col("__mx") + 0.5).cast("int"),
        ).alias("qvec"),
        (F.col("__mx") / 127.0).alias("scale"),
    )


def quantized_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors: quantize
    both sides (:func:`quantize_int8`), rank by the quantized cosine.
    Scales cancel in cosine, so ranking reads ONLY the int8 arrays —
    the scan that on a 100 TB corpus moves a quarter of the bytes of
    the float path. Output: (query_id, vec_id, qcos, rank).
    """
    qv = quantize_int8(vectors, id_col, vec_col)
    qq = quantize_int8(queries, query_id_col, vec_col).select(
        query_id_col, F.col("qvec").alias("__qq")
    )
    joined = qv.join(F.broadcast(qq), on=F.col(id_col) != F.col(query_id_col))
    as_d = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    scored = joined.select(
        query_id_col, id_col,
        F.round(cosine(as_d(F.col("qvec")), as_d(F.col("__qq"))), 6).alias("qcos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("qcos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[object, list[float]]]]:
    """Deterministic product-quantization codebooks: the vector dimension
    splits into ``m`` contiguous subspaces; subspace ``s``'s codewords
    are the ``s``-th subvectors of the ``n_codes`` lowest-id vectors
    (the same TakeOrdered seed rule as :func:`ivf_assign`, so the whole
    index is SQL-replayable — codes are labeled by seed id, dense
    numbering is never needed).

    Returns ``books[s] = [(code_id, subvector), ...]`` — a driver-side
    list bounded by INDEX size (m × n_codes × dim/m doubles), never by
    data; it is embedded into downstream plans as codegen literals, the
    same pattern as the IVF k-means centroid table.
    """
    if m <= 0 or n_codes <= 0:
        raise ValueError(f"m and n_codes must be positive, got {m}, {n_codes}")
    seeds = (
        vectors.orderBy(id_col)
        .limit(n_codes)
        .select(F.col(id_col).alias("code"), F.col(vec_col).alias("v"))
        .collect()
    )
    if not seeds:
        raise ValueError("pq_codebooks: empty vector table")
    dim = len(seeds[0]["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [(r["code"], [float(x) for x in r["v"][s * sub : (s + 1) * sub]]) for r in seeds]
        for s in range(m)
    ]


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def pq_encode(
    vectors: DataFrame,
    books: list[list[tuple[object, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` code labels — per subspace,
    the codeword minimizing squared L2 distance (ties on code id).
    Distances round to 9dp before the argmin so the selection boundary
    is engine-stable.

    Scale shape: ZERO shuffle — the codebooks are plan literals, the
    argmin is ``array_min`` over a literal struct array, and the output
    row is (id, m small codes): the 100 TB point of PQ is that the
    ranking scan then reads a few bytes per vector instead of the float
    array. Returns ``(id, code_0 .. code_{m-1})``.
    """
    m = len(books)
    sub = len(books[0][0][1])
    cols = [F.col(id_col)]
    for s, book in enumerate(books):
        subv = F.slice(F.col(vec_col), s * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(
                    F.round(_sq_l2(subv, F.array(*[F.lit(x) for x in cw])), 9).alias("d"),
                    F.lit(code).alias("c"),
                )
                for code, cw in book
            ]
        )
        cols.append(F.array_min(cands)["c"].alias(f"code_{s}"))
    return vectors.select(*cols)


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[object, list[float]]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: approximate squared L2 between
    a query and a coded vector is the sum over subspaces of the exact
    distance from the query's subvector to the vector's CODEWORD —
    queries stay float, the corpus is read as codes only.

    Scale shape: the fact side moves (id, s, code) — never embeddings;
    the per-(query, s, code) distance table is queries × m × n_codes
    rows, broadcast; one shuffle groups the m partial distances per
    (query, vec) and the top-k window reuses that partitioning
    (groupBy (query, vec) then window by query — same hash family, and
    output cardinality is already #queries × #vectors / selectivity).
    Output: (query_id, vec_id, adist, rank), rank 1..k ascending
    distance, self-matches excluded.
    """
    m = len(books)
    sub = len(books[0][0][1])
    enc = pq_encode(vectors, books, id_col, vec_col)
    enc_long = enc.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"code_{s}").alias("code"))
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select(id_col, F.col("e.s").alias("s"), F.col("e.code").alias("code"))
    entries = []
    for s, book in enumerate(books):
        qsub = F.slice(F.col(vec_col), s * sub + 1, sub)
        for code, cw in book:
            entries.append(
                F.struct(
                    F.lit(s).alias("s"),
                    F.lit(code).alias("code"),
                    F.round(_sq_l2(qsub, F.array(*[F.lit(x) for x in cw])), 9).alias("d"),
                )
            )
    dtab = queries.select(
        F.col(query_id_col), F.explode(F.array(*entries)).alias("e")
    ).select(query_id_col, F.col("e.s").alias("s"), F.col("e.code").alias("code"), F.col("e.d").alias("d"))
    scored = (
        enc_long.join(F.broadcast(dtab), on=["s", "code"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("d"), 6).alias("adist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Graded retrieval-quality metrics per query: nDCG@k, MRR@k, recall@k.

    ``ranked``: (query_id, item_id, rank) — rank 1..n per query, e.g. the
    output of :func:`brute_force_topk` / :func:`ivf_topk`.  ``qrels``:
    (query_id, item_id, rel) graded relevance judgments, rel > 0 meaning
    relevant.  Output one row per query_id present in ``ranked``:

      * ``n_rel`` — total relevant items judged for the query
      * ``n_ret_rel`` — relevant items retrieved within the top k
      * ``ndcg`` — DCG@k / IDCG@k with the rel/log2(rank+1) gain form
        (NULL when the query has no relevant judgment: undefined, never 0)
      * ``mrr`` — 1/rank of the first relevant retrieved item, 0.0 when
        none lands in the top k (the MRR@k convention)
      * ``recall`` — n_ret_rel / n_rel (NULL when n_rel = 0)

    All three are rounded to 6dp so engine float plans hash identically.

    Scale: the hits join shuffles both sides on the composite
    (query, item) key — never the item corpus by itself — and every
    aggregation after it is per-query.  The ideal-gain branch ranks each
    query's judgments with a bounded row_number window (judgment lists
    are per-query bounded in any real eval set).  The final join is
    query-keyed on both sides, co-partitioned with the aggregates; no
    collect, no UDF, nothing leaves the JVM.
    """
    on = [query_id_col, id_col]
    # duplicate judgments (merged assessor files) would fan out the hits
    # join and inflate every metric — resolve deterministically to the
    # max rel per (query, item) before anything else
    qrels = qrels.groupBy(*on).agg(F.max("rel").alias("rel"))
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(qrels.select(*on, "rel"), on=on, how="left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    )
    got = hits.groupBy(query_id_col).agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("__dcg"),
        F.max(F.when(F.col("rel") > 0, 1.0 / F.col("rank"))).alias("__rr"),
        F.sum((F.col("rel") > 0).cast("long")).alias("n_ret_rel"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("rel"), F.asc(id_col))
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("__i", F.row_number().over(w))
        .groupBy(query_id_col)
        .agg(
            F.sum(
                F.when(F.col("__i") <= k, F.col("rel") / F.log2(F.col("__i") + 1))
            ).alias("__idcg"),
            F.count("*").alias("n_rel"),
        )
    )
    return got.join(ideal, query_id_col, "left").select(
        query_id_col,
        F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
        "n_ret_rel",
        F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
        F.round(F.coalesce(F.col("__rr"), F.lit(0.0)), 6).alias("mrr"),
        F.round(F.col("n_ret_rel") / F.col("n_rel"), 6).alias("recall"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top: int | None = None,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings — the standard
    hybrid-search combiner (Cormack et al. 2009): per (query, item),
    ``rrf_score = Σ_lists 1/(k + rank)``. Items missing from a list
    simply contribute nothing (partial lists are the normal case when
    fusing lexical BM25 with vector cosine over overlapping corpora).

    Each input must carry (query_col, item_col, rank_col). Output:
    (query_id, item, rrf_score, n_lists, fused_rank) — score rounded
    6dp, fused rank by (rounded score desc, item asc) so the ranking is
    engine-portable; ``top`` truncates per query when given.

    Scale shape: a unionByName of already-top-k inputs (each list is
    query-bounded — k rows per query), one (query, item) aggregate with
    map-side combine, one per-query window over <= N·k rows. The fusion
    itself never touches the corpora.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(item_col).alias("item"),
            F.col(rank_col).alias("__r"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "item").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("__r"))), 6).alias("rrf_score"),
        F.count("*").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("item"))
    out = fused.withColumn("fused_rank", F.row_number().over(w))
    if top is not None:
        out = out.filter(F.col("fused_rank") <= int(top))
    return out


def rp_signs(in_dim: int, out_dim: int, salt: str = "rp") -> list[list[int]]:
    """±1 sign matrix for :func:`random_projection`, a pure function of
    (salt, i, j): ``+1`` iff the first hex digit of ``md5(salt|i|j)`` is
    even. Generated driver-side and baked into the plan as literals —
    the same matrix is reproducible in any engine (the oracle embeds
    the identical literals)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{salt}|{i}|{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    vectors: DataFrame,
    in_dim: int,
    out_dim: int = 8,
    salt: str = "rp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction by a deterministic
    ±1 sign matrix (Achlioptas 2003): ``p_j = Σ_i v_i·s_ij / sqrt(d')``.
    The cheap pre-step before ANN indexing / clustering when the input
    dimension is large: distances are preserved within (1±ε) whp while
    index build and scan costs drop by ``in_dim/out_dim``.

    The sign matrix comes from :func:`rp_signs` — md5-derived, baked in
    as plan literals, so the projection is a pure function of
    (salt, vector) and replayable by any engine.

    Output: (id, p0..p{out_dim-1}), each rounded 6dp.

    Scale shape: ZERO shuffle — a pure per-row projection inside
    whole-stage codegen (zip_with + left-fold per output coordinate);
    embeddings never move. Compose with brute/IVF/PQ top-k downstream.
    """
    if in_dim < 1 or out_dim < 1:
        raise ValueError(f"dims must be >= 1, got ({in_dim}, {out_dim})")
    signs = rp_signs(in_dim, out_dim, salt)
    # divide by the correctly-rounded sqrt (not multiply by its inverse)
    # so the oracle's `/ sqrt(d')` runs the identical double arithmetic
    root = float(out_dim) ** 0.5
    cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(s)) for s in signs[j]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(root),
            6,
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    return vectors.select(F.col(id_col).alias("id"), *cols)


def mine_hard_negatives(
    ranking: DataFrame,
    qrels: DataFrame,
    k_neg: int = 4,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Hard-negative mining for contrastive retriever training: per
    query, the ``k_neg`` TOP-RANKED items the retriever surfaced that
    are NOT relevant — the negatives that actually teach (random
    negatives are trivially separable; the retriever's own near-misses
    define its decision boundary). Each negative is paired with the
    query's best positive so the output is the (anchor, positive,
    negative) triplet shape a contrastive trainer consumes directly.

    Inputs: ``ranking`` (query, item, rank) from ANY retriever —
    brute/IVF/PQ cosine, BM25, or an RRF fusion; ``qrels`` (query,
    item, rel) with rel > 0 marking positives. Queries with no positive
    in qrels are dropped (no anchor pair exists).

    Output: (query_id, pos_item, neg_item, neg_rank, retriever_rank) —
    neg_rank 1..k_neg in retriever order.

    Scale shape: every input is query-bounded (top-k rows per query,
    bounded judgment lists); the positive filter is an anti-join on the
    composite (query, item) key and both windows run over ≤ k rows per
    query. Corpus tensors never enter this operator.
    """
    if k_neg < 1:
        raise ValueError(f"k_neg must be >= 1, got {k_neg}")
    pos_all = qrels.filter(F.col(rel_col) > 0).select(
        F.col(query_col).alias("query_id"), F.col(item_col).alias("item"),
        F.col(rel_col).alias("__rel"),
    )
    negs = (
        ranking.select(
            F.col(query_col).alias("query_id"),
            F.col(item_col).alias("item"),
            F.col(rank_col).alias("__rk"),
        )
        .join(pos_all.select("query_id", "item"), on=["query_id", "item"], how="left_anti")
    )
    w_neg = Window.partitionBy("query_id").orderBy("__rk", "item")
    negs = (
        negs.withColumn("neg_rank", F.row_number().over(w_neg))
        .filter(F.col("neg_rank") <= int(k_neg))
    )
    w_pos = Window.partitionBy("query_id").orderBy(F.desc("__rel"), F.asc("item"))
    best_pos = (
        pos_all.withColumn("__pr", F.row_number().over(w_pos))
        .filter(F.col("__pr") == 1)
        .select("query_id", F.col("item").alias("pos_item"))
    )
    return negs.join(best_pos, on="query_id").select(
        "query_id",
        "pos_item",
        F.col("item").alias("neg_item"),
        "neg_rank",
        F.col("__rk").alias("retriever_rank"),
    )
