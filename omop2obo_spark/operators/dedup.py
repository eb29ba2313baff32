"""Deduplication operators for large-scale text corpora.

Beyond the reference's row-level ``drop_duplicates`` (SURVEY.md §2.2 P2),
these are the corpus-level dedup primitives a training-data pipeline needs
at 100 TB. All are hash-based and engine-portable: every hash is md5 (same
function in Spark and DuckDB), so each operator has an exact SQL oracle.

  * exact_dedup          — hash-groupBy on normalized text
  * minhash_signatures / minhash_lsh_pairs — MinHash + banded LSH:
    shingle → per-seed min(md5(seed||shingle)) → band key → bucket join;
    only bucket-colliding pairs are verified (the classic scale path —
    candidate generation never compares all pairs)
  * simhash              — 64-bit sign-aggregated token-hash fingerprint
  * ngram_jaccard_pairs  — exact Jaccard over shingle sets for candidate
    pairs (used standalone at small scale, as LSH verifier at large scale)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalized_text(col: Column) -> Column:
    """Lower + collapse whitespace — the canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Map every doc to its canonical representative (min id per text hash).

    Output: (doc_id, canonical_id, text_hash, group_size). One shuffle on
    the 32-hex-char hash — never on the text itself.
    """
    hashed = docs.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("text_hash"))
    # NULL text means UNKNOWN content, not shared content: window-partition
    # on a per-doc fallback key so every NULL-text doc is its own singleton
    # group (text_hash itself stays NULL in the output) — otherwise all
    # NULL-text docs would share the NULL partition and all but one would
    # be dropped by keep-canonical
    grp = F.coalesce(F.col("text_hash"), F.concat(F.lit("null:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(grp)
    return (
        hashed.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select(id_col, "canonical_id", "text_hash", "group_size")
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Distinct token k-gram shingles of the normalized text.

    NULL text yields an EMPTY array (no content → nothing to compare):
    the naive expression would yield ``[NULL]``, whose md5 min-hash is
    all-NULL, and ``array_join`` skipping NULLs would then collapse every
    NULL-text doc's band keys to the same ``md5('')`` constant — making
    all NULL-text docs mutual LSH candidates (m²/2 spurious pairs, and
    silent data loss on the unverified cluster path)."""
    toks = F.filter(F.split(normalized_text(col), " "), lambda x: x != "")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.when(col.isNotNull(), F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _minhash_component(h: int, shingle: Column) -> Column:
    """Component h of the md5 min-hash family — the ONE hash definition
    shared by per-doc signatures and corpus-level signatures."""
    return F.md5(F.concat(F.lit(str(h) + "|"), shingle))


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: component h = min(md5(h || shingle)).

    md5-based so the signature is engine-portable and deterministic; min
    over hex strings is a valid uniform min-hash (lexicographic order on a
    uniform 128-bit hash).
    Output: (doc_id, sig array<string>[n_hashes]).
    """
    sh = docs.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle"))
    aggs = [
        F.min(_minhash_component(h, F.col("shingle"))).alias(f"h{h}")
        for h in range(n_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[F.col(f"h{h}") for h in range(n_hashes)]).alias("sig"))


def _minhash_band_keys(
    docs: DataFrame, id_col: str, text_col: str,
    n_hashes: int, bands: int, k: int, out_id: str,
) -> DataFrame:
    """(id, band, key) rows: the MinHash signature split into band hashes
    — the join key stream both self-LSH and cross-corpus LSH build on."""
    if bands <= 0 or n_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n_hashes, k)
    band_arr = F.array(
        *[
            F.md5(F.array_join(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), "|"))
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col).alias(out_id), F.posexplode(band_arr).alias("band", "key"))


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over MinHash.

    Signature is split into ``bands`` bands of ``n_hashes/bands`` rows;
    docs sharing any band hash become a candidate pair. Output:
    (a, b) with a < b, distinct. Verification (exact Jaccard) is the
    caller's choice — chain with :func:`ngram_jaccard_pairs`.
    """
    banded = _minhash_band_keys(docs, id_col, text_col, n_hashes, bands, k, "doc")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame | None = None,
    id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for (a, b) pairs.

    With ``pairs`` given, verifies only those (LSH candidates); without,
    generates candidates by shingle co-occurrence (shuffle on shingle —
    fine at test scale, LSH-prefiltered at 100 TB).
    Output: (a, b, jaccard) with jaccard >= threshold.
    """
    sh = docs.select(F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), k)).alias("shingle"))
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    if pairs is None:
        l, r = sh.alias("l"), sh.alias("r")
        inter = (
            l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.doc") < F.col("r.doc")))
            .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        la = sh.select(F.col("doc").alias("a"), "shingle")
        lb = sh.select(F.col("doc").alias("b"), "shingle")
        inter = (
            pairs.join(la, "a").join(lb, ["b", "shingle"])
            .groupBy("a", "b").agg(F.count("*").alias("inter"))
        )
    na = sizes.select(F.col("doc").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a").join(nb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """Sign-aggregated token-hash fingerprint (``bits`` ≤ 60).

    Token hash = first 15 hex chars of md5 (portable, fits a signed
    bigint — and exactly 60 bits wide, hence the cap: positions past 60
    would shift beyond the hash and come out constant-0, silently
    shrinking the effective fingerprint); bit b of the fingerprint is 1
    iff the sum over tokens of
    ±1(bit b set) is positive. One explode + one groupBy with ``bits``
    conditional sums — no UDF.

    Docs with no tokens (NULL/empty/whitespace text) emit no output row —
    there is nothing to fingerprint; join back to the corpus if you need
    them carried.
    """
    if not (1 <= bits <= 60):
        raise ValueError(f"bits must be in [1, 60] (60-bit token hash), got {bits}")
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda x: x != "")
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
    toks = toks.withColumn("th", h)
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(id_col, fp.cast("bigint").alias("simhash"))


def simhash_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    bits: int = 60,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
) -> DataFrame:
    """Candidate near-dup pairs from :func:`simhash` fingerprints at
    Hamming distance ≤ ``max_hamming`` — the pigeonhole banding that
    makes SimHash usable at scale: split the ``bits``-wide fingerprint
    into ``max_hamming + 1`` contiguous bands; any pair differing in at
    most ``max_hamming`` bits agrees EXACTLY on at least one band (k
    differing bits cannot touch all k+1 bands), so a per-band equi-join
    on (band_idx, band_value) finds every qualifying pair — never
    all-pairs — and an exact ``bit_count(xor)`` filter removes the false
    candidates. Output: ``(id_a, id_b, hamming)``, ``id_a < id_b``,
    distinct.

    Recall is exact (pigeonhole guarantees no misses), unlike MinHash
    banding's probabilistic recall. Skew: band width is
    ``bits // (k+1)`` — keep it ≥ 15 (the default 60/4) so band-value
    buckets stay fine-grained; near-constant corpora (boilerplate
    fingerprints) still hot-spot the matching band, the same boundary as
    every bucketed candidate join here (pre-drop exact dups first —
    identical fingerprints belong to :func:`exact_dedup`, not this).
    """
    if not 1 <= max_hamming < bits:
        raise ValueError(f"max_hamming must be in [1, {bits - 1}], got {max_hamming}")
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    offsets, widths, off = [], [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        offsets.append(off)
        widths.append(w)
        off += w
    bands = fps.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col(fp_col), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "fp", "b.band", "b.val")
    a = bands.select(
        F.col("band"), F.col("val"),
        F.col("id").alias("id_a"), F.col("fp").alias("fp_a"),
    )
    b = bands.select(
        F.col("band"), F.col("val"),
        F.col("id").alias("id_b"), F.col("fp").alias("fp_b"),
    )
    return (
        a.join(b, on=["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )


def _hyperplane_signs(bit: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane components from md5 — no RNG state, so
    the same (bit, dim) always yields the same plane on every executor and
    across runs (resume-safe)."""
    import hashlib

    return [
        1 if hashlib.md5(f"{bit}:{j}".encode()).digest()[0] % 2 == 0 else -1
        for j in range(dim)
    ]


def embedding_cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 8,
    band_bits: int = 4,
    bucketed: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos) with a < b and
    cosine ≥ ``threshold``.

    ``bucketed=False`` — exact all-pairs self-join (the oracle baseline;
    O(n²), only for verification scale).

    ``bucketed=True`` — the 100 TB path: random-hyperplane LSH. Each
    vector gets ``n_bits`` sign bits (dot product against deterministic
    ±1 hyperplanes, built once at plan time — native ``zip_with`` +
    ``aggregate``, no UDF); bits are split into bands of ``band_bits``;
    candidate pairs are vectors sharing any band value (shuffle keyed on
    the 2^band_bits-ary band bucket, never all-pairs), then verified with
    the exact cosine. Complements MinHash-LSH (token space) with the same
    band/bucket shape in embedding space. High-cosine pairs agree on most
    sign bits, so per-band collision probability rises with similarity;
    recall tunes via n_bits/band_bits exactly like MinHash bands.
    """
    # the norm is a per-VECTOR quantity: hoist it ahead of the pair join
    # (one aggregate per vector, not two per candidate pair) — the pair
    # stage then runs a single dot-product HOF. sqrt(agg(v*v)) of the same
    # array yields the same double either way, so results are bit-identical
    # to the inline formula the oracle replays. The kernels are the shared
    # ann.dot / ann.l2norm expressions — one implementation for the ANN and
    # dedup paths, so a numeric fix cannot drift between them.
    from omop2obo_spark.operators.ann import dot, l2norm

    a = vectors.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
        l2norm(F.col(vec_col)).alias("na"),
    )
    b = vectors.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
        l2norm(F.col(vec_col)).alias("nb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        6,
    )

    if not bucketed:
        return (
            a.join(b, on=F.col("a") < F.col("b"))
            .select("a", "b", cos.alias("cos"))
            .filter(F.col("cos") >= threshold)
        )

    if band_bits <= 0 or band_bits > n_bits or n_bits % band_bits != 0:
        # silent truncation here would drop trailing sign bits (or, with
        # band_bits > n_bits, produce zero bands → empty result)
        raise ValueError(f"band_bits ({band_bits}) must divide n_bits ({n_bits})")
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = [_hyperplane_signs(h, dim) for h in range(n_bits)]
    sign_bits = [
        (
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(s)) for s in planes[h]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int")
        for h in range(n_bits)
    ]
    n_bands = n_bits // band_bits
    band_keys = [
        F.concat_ws(
            "",
            F.lit(f"{band}_"),
            *[sign_bits[band * band_bits + i].cast("string") for i in range(band_bits)],
        )
        for band in range(n_bands)
    ]
    # candidate generation moves ONLY (band, id): the band self-join and
    # the (a, b) dedup shuffle ids, never embeddings — at 100 TB the
    # vector payload through those exchanges would dwarf the id stream.
    # Surviving unique pairs fetch each side's (vector, norm) by id join;
    # each unique pair then pays exactly one dot-product HOF.
    keyed = vectors.select(
        F.col(id_col), F.explode(F.array(*band_keys)).alias("band")
    )
    cand = (
        keyed.select("band", F.col(id_col).alias("a"))
        .join(keyed.select("band", F.col(id_col).alias("b")), on="band")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    pairs = cand.join(a, on="a").join(b, on="b")
    return pairs.select("a", "b", cos.alias("cos")).filter(F.col("cos") >= threshold)


def _cc_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One connected-components round over ``labels(node, component, ...)``:
    (a) min label over direct neighbors, (b) pointer jump (path-halving —
    component ← component's own label; labels always point at
    same-component nodes with smaller ids, so the jump is safe and
    monotone).  Extra columns (e.g. ``__old``) pass through untouched.
    Lazy — the caller decides where to materialize."""
    extra = [c for c in labels.columns if c not in ("node", "component")]
    lbl = labels.select("node", "component")
    neighbor_min = (
        edges.join(lbl, edges["dst"] == lbl["node"])
        .groupBy("src")
        .agg(F.min("component").alias("nbr_min"))
    )
    stepped = labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left").select(
        "node",
        *extra,
        F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
            "component"
        ),
    )
    # every component value is a node id present in `stepped`, so the
    # left join always matches; coalesce guards the invariant
    ptr = stepped.select(F.col("node").alias("pnode"), F.col("component").alias("pcomp"))
    return stepped.join(ptr, stepped["component"] == ptr["pnode"], "left").select(
        "node",
        *extra,
        F.coalesce(F.col("pcomp"), F.col("component")).alias("component"),
    )


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact union-find over a driver-resident edge list. Union-by-min
    keeps every root at its component's minimum id, so ``find(n)`` IS the
    canonical label. Path-halving keeps finds near-O(1)."""
    rows = edges.filter(F.col("src") < F.col("dst")).collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r.src, r.dst
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    from pyspark.sql.types import StructField, StructType

    node_type = edges.schema["src"].dataType
    schema = StructType(
        [StructField("doc_id", node_type), StructField("component", node_type)]
    )
    out = sorted((n, find(n)) for n in parent)
    return edges.sparkSession.createDataFrame(out, schema)


def dedup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    rounds_per_check: int = 2,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Resolve near-duplicate pairs into clusters: connected components
    over the undirected pair graph, labeling every doc with the minimum
    doc id reachable from it (the canonical representative a dedup
    pipeline keeps).

    Input: ``(a, b)`` pairs from :func:`minhash_lsh_pairs`,
    :func:`ngram_jaccard_pairs`, or :func:`embedding_cosine_pairs` —
    the step after candidate generation that turns pairwise evidence into
    keep/drop decisions (a near-dup of a near-dup is a dup).

    Algorithm: min-label propagation with pointer jumping (see
    :func:`_cc_round`).  The jump makes convergence O(log diameter)
    instead of O(diameter): without it a 330-node LSH hairball measured
    10 rounds; with it, 5.  ``rounds_per_check`` rounds run lazily
    between materializations: labels only ever decrease, so comparing a
    block's start labels (``__old``) against its end detects fixpoint
    exactly while halving the checkpoint/count actions — the driver reads
    one scalar per block (a ``limit(1)`` count, not a data collect).
    Measured on the sf0.1 fixture hairball: blocks of 2 beat blocks of
    3/4 (11.5s vs 18.4/43.3s loop wall) — Catalyst analysis cost grows
    superlinearly with the un-checkpointed plan depth, so deeper lazy
    blocks lose more to the optimizer than they save in actions.
    ``localCheckpoint`` per block keeps lineage O(1); ``max_iterations``
    bounds adversarial chains.

    Output: ``(doc_id, component)`` for every doc appearing in a pair;
    docs with no pair are their own singleton cluster and are omitted
    (union with the identity mapping if needed).

    Size cutover: the confirmed-pair graph is orders of magnitude smaller
    than the corpus, and when it fits on the driver
    (``driver_max_edges``, checked against the materialized edge count)
    an exact local union-find resolves it in one pass — each distributed
    round otherwise costs ~3 shuffles + an eager checkpoint + a driver
    scalar read regardless of data size (measured 48 s for a 565-edge
    graph vs <1 s local). Graphs past the cutover get the distributed
    O(log diameter) loop, which is the path that matters at 100 TB.
    """
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    rev = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    edges = fwd.union(rev).distinct().persist()
    try:
        if edges.count() <= driver_max_edges:
            return _driver_union_find(edges)
        labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
            "component", F.col("node")
        )
        labels = labels.localCheckpoint(eager=True)
        rounds = 0
        while rounds < max_iterations:
            block = labels.withColumn("__old", F.col("component"))
            for _ in range(min(rounds_per_check, max_iterations - rounds)):
                block = _cc_round(edges, block)
                rounds += 1
            block = block.localCheckpoint(eager=True)
            changed = block.filter(F.col("component") < F.col("__old")).limit(1).count()
            labels = block.drop("__old")
            if changed == 0:
                break
        return labels.select(F.col("node").alias("doc_id"), "component")
    finally:
        edges.unpersist()


def dedup_keep_canonical(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative per near-dup cluster: the component head
    (minimum doc id) plus every unclustered doc. Broadcast-joins the
    cluster labels (the pair graph ≪ corpus), so the corpus never
    shuffles.

    ``clusters`` is :func:`dedup_clusters` output, whose id column is
    always named ``doc_id`` regardless of the caller's ``id_col`` — the
    non-head ids are renamed to ``id_col`` for the anti-join."""
    non_heads = (
        clusters.filter(F.col("doc_id") != F.col("component"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(F.broadcast(non_heads), on=id_col, how="left_anti")


def dedup_against(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near: bool = False,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Incremental (crawl-refresh) dedup: drop new documents whose content
    already exists in an existing kept ``corpus`` — the primitive that
    lets each crawl round deduplicate against everything previously kept
    without re-running dedup over the full history.

    Exact phase (always): anti-join on the 32-char normalized-content
    hash; the corpus side pre-shrinks to its distinct hashes, text never
    shuffles. ``near=True`` adds cross-corpus banded MinHash: new-side
    band keys join corpus-side band keys (never all-pairs), colliding
    pairs are verified with exact n-gram Jaccard >= ``jaccard_threshold``
    and verified new docs are dropped by an id anti-join. Near mode
    requires the two id spaces to be disjoint (the Jaccard verify runs
    over their union keyed by id).

    Returns surviving ``new_docs`` rows, schema preserved.
    """
    h = F.md5(normalized_text(F.col(text_col)))
    ch = corpus.select(h.alias("__h")).distinct()
    kept = (
        new_docs.withColumn("__h", h)
        .join(ch, on="__h", how="left_anti")
        .drop("__h")
    )
    if not near:
        return kept
    # the exact-phase survivor lineage (anti-join incl. the corpus-wide
    # distinct over content hashes) feeds three consumers below — band
    # keys, the Jaccard-verify union, and the final anti-join; without a
    # materialization each re-executes the full pass. localCheckpoint
    # (house pattern, see curate_corpus): no unpersist to forget, blocks
    # release with the plan.
    kept = kept.localCheckpoint(eager=True)
    nb = _minhash_band_keys(kept, id_col, text_col, n_hashes, bands, k, "a")
    ob = _minhash_band_keys(corpus, id_col, text_col, n_hashes, bands, k, "b")
    cand = nb.join(ob, on=["band", "key"]).select("a", "b").distinct()
    union_docs = kept.select(
        F.col(id_col), F.col(text_col)
    ).unionByName(corpus.select(F.col(id_col), F.col(text_col)))
    ver = ngram_jaccard_pairs(
        union_docs, pairs=cand, id_col=id_col, text_col=text_col,
        k=k, threshold=jaccard_threshold,
    )
    dropped = ver.select(F.col("a").alias(id_col)).distinct()
    return kept.join(dropped, on=id_col, how="left_anti")


def prefix_filter_jaccard_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Exact set-similarity self-join with prefix filtering (the
    AllPairs/PPJoin candidate bound): every doc pair whose shingle-set
    Jaccard ≥ threshold, with NO approximation — the scale path for
    exact near-dup joins, replacing the full shingle co-occurrence
    self-join that :func:`ngram_jaccard_pairs` uses standalone.

    ``threshold`` is a rational (num, den) so the prefix length and the
    final verification are pure integer arithmetic — no float-boundary
    false negatives, bit-identical across engines.

    Why it prunes: order each doc's shingles by a single global total
    order (corpus frequency asc, shingle asc — rarest first). If
    J(A, B) ≥ t, the sets overlap in ≥ ⌈t·|A|⌉ elements, so A's first
    ``|A| − ⌈t·|A|⌉ + 1`` shingles (its *prefix*) must contain at least
    one shared element — pairs are generated only from prefix-token
    collisions, and the prefix is dominated by RARE tokens, so hot
    shingles ("the the the") never fan out.

    Scale shape: one shuffle to count shingle frequency (token-vocab
    scale), one doc-bounded window for the rank, a self-join whose key
    distribution is rare-token by construction (the anti-skew property
    is the point of the algorithm), then the candidate-verify join of
    :func:`ngram_jaccard_pairs`'s pairs mode. Output:
    (a, b, jaccard≥t, rounded 6dp).
    """
    num, den = int(threshold[0]), int(threshold[1])
    if num <= 0 or den <= 0 or num > den:
        raise ValueError(f"threshold must be a rational in (0, 1], got {threshold}")
    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
    w = Window.partitionBy("doc").orderBy("__f", "shingle")
    ranked = (
        sh.join(freq, "shingle")
        .withColumn("__rn", F.row_number().over(w))
        .join(sizes, "doc")
    )
    # prefix_len = n − ⌈t·n⌉ + 1, integer-exact: ⌈num·n/den⌉ = (num·n + den − 1) // den
    prefix_len = F.col("n") - F.floor(
        (F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den)
    ) + F.lit(1)
    prefix = ranked.filter(F.col("__rn") <= prefix_len).select("doc", "shingle")
    cand = (
        prefix.select(F.col("doc").alias("a"), "shingle")
        .join(prefix.select(F.col("doc").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    la = sh.select(F.col("doc").alias("a"), "shingle")
    lb = sh.select(F.col("doc").alias("b"), "shingle")
    inter = (
        cand.join(la, "a")
        .join(lb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("__i"))
    )
    na = sizes.select(F.col("doc").alias("a"), F.col("n").alias("__na"))
    nb = sizes.select(F.col("doc").alias("b"), F.col("n").alias("__nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .filter(
            F.col("__i") * F.lit(den)
            >= F.lit(num) * (F.col("__na") + F.col("__nb") - F.col("__i"))
        )
        .select(
            "a", "b",
            F.round(F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")), 6).alias("jaccard"),
        )
    )


def duplicate_span_removal(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring (duplicate-span) dedup: remove every token k-gram
    occurrence that repeats anywhere in the corpus EXCEPT its corpus-global
    first occurrence — the sub-document companion to :func:`exact_dedup`
    (whole doc) and ``paragraph_dedup`` (paragraph), in the spirit of
    suffix-array ExactSubstr dedup (Lee et al. 2022) re-expressed as a
    k-gram inverted index instead of a single-machine suffix array.

    Contract: tokens are whitespace-split; an occurrence ``(doc, pos)`` of
    a k-gram that occurs >1 time corpus-wide (including within one doc) is
    *non-canonical* unless it is the lexicographic ``(doc_id, pos)`` minimum
    for that gram; every token position covered by >=1 non-canonical
    occurrence is dropped; ``clean_text`` is the space-joined surviving
    tokens (whitespace-canonicalized; NULL/empty text yields ''). Docs with
    fewer than k tokens are untouched. Output:
    (id_col, n_tokens, n_removed, clean_text).

    Scale shape: gram strings never shuffle — occurrences move as
    (doc_id, pos, md5). Occurrence counting is a map-side-combined groupBy;
    only occurrences of *duplicated* grams (typically a small fraction)
    enter the row_number window that picks the canonical one, so the sort
    never sees the whole corpus. A pathological hot gram (mega-boilerplate)
    serializes in its window partition — the standard per-key boundary;
    upstream ``boilerplate_lines`` removal is the mitigation. Token
    reassembly shuffles each doc's surviving tokens once, grouped by the
    skew-free doc id.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("toks"),
    )

    occ = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("toks") >= k,
                F.sequence(F.lit(1), F.size("toks") - F.lit(k) + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        F.col("toks"),
    ).select(
        F.col(id_col),
        (F.col("i") - 1).alias("pos"),
        F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), k))).alias("gh"),
    )

    # map-side-combined duplicate-gram detection, THEN the canonical pick:
    # the window sort only ever sees occurrences of duplicated grams
    dup_gh = occ.groupBy("gh").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)
    w = Window.partitionBy("gh").orderBy(id_col, "pos")
    covered = (
        occ.join(dup_gh, "gh")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("tpos"),
        )
        .distinct()
    )

    tok_rows = toks.select(
        F.col(id_col), F.posexplode(F.col("toks")).alias("tpos", "tok")
    )
    reassembled = (
        tok_rows.join(covered, [id_col, "tpos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    totals = toks.select(F.col(id_col), F.size("toks").cast("bigint").alias("n_tokens"))
    return totals.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("n_tokens") - F.coalesce(F.col("kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Bloom pre-screen for incremental dedup
# ---------------------------------------------------------------------------


def _bloom_positions(hash_col: Column, m_bits: int, k_hashes: int) -> Column:
    """k bit positions for one content hash: md5('bf{j}|' || hash) first
    15 hex chars -> signed-64 (always non-negative) mod m_bits. Engine-
    portable; a NULL hash yields all-NULL positions (callers filter)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bf{j}|"), hash_col)), 1, 15), 16, 10
            ).cast("bigint")
            % F.lit(m_bits)
            for j in range(k_hashes)
        ]
    )


def bloom_build(
    corpus: DataFrame, m_bits: int = 1 << 20, k_hashes: int = 4, text_col: str = "text"
) -> DataFrame:
    """Bloom filter over the kept corpus's normalized content hashes, as a
    packed word table ``(bucket bigint, word bigint)`` — 32 bits per word,
    at most m_bits/32 rows regardless of corpus size.

    ``bit_or`` is associative/commutative, so the build is map-side
    mergeable: each input partition collapses to <= m_bits/32 rows before
    the shuffle — the same bounded-state shape as the CMS sketch. At 10^9
    kept docs, m_bits = 2^33 (1% FPR) packs to ~256M words (~3 GB); past
    the broadcast budget the probe join falls back to a shuffle on the
    bucket key, still never touching text. NULL-text rows contribute no
    bits (NULL hash -> NULL positions, filtered).
    """
    h = F.md5(normalized_text(F.col(text_col)))
    pos = (
        corpus.select(F.explode(_bloom_positions(h, m_bits, k_hashes)).alias("pos"))
        .filter(F.col("pos").isNotNull())
    )
    words = pos.select(
        F.floor(F.col("pos") / 32).cast("bigint").alias("bucket"),
        # shiftleft's amount arg must be a column here (F.shiftleft takes a
        # Python int only), so spell it in SQL
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("w"),
    )
    return words.groupBy("bucket").agg(F.bit_or("w").alias("word"))


def bloom_maybe_dup(
    new_docs: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max_bits: int = 1 << 28,
) -> DataFrame:
    """Per new doc, the Bloom membership verdict: ``(id_col, maybe_dup)``.

    maybe_dup is true iff ALL k probed bits are set — so an actual dup
    (whose positions were all set by the corpus build) can NEVER flag
    false: no false negatives, by construction. False positives are
    expected (rate ~ (set_fraction)^k) and harmless — they only route a
    doc to the exact verify. NULL-text docs flag false (no content to
    collide).

    The word table is force-broadcast only while ``m_bits`` stays within
    ``broadcast_max_bits`` (default 2^28 bits -> 8M words, ~100 MB);
    larger filters probe through a plain bucket-key join — the filter is
    the fixed small side, so AQE still picks broadcast when it actually
    fits, and the fallback degrades to one narrow shuffle of (id, bucket,
    mask) probes rather than a driver OOM from an 8-GB forced broadcast.
    """
    h = F.md5(normalized_text(F.col(text_col)))
    probes = (
        new_docs.select(
            F.col(id_col),
            F.explode(F.array_distinct(_bloom_positions(h, m_bits, k_hashes))).alias("pos"),
        )
        .filter(F.col("pos").isNotNull())
        .select(
            id_col,
            F.floor(F.col("pos") / 32).cast("bigint").alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
    )
    filt = F.broadcast(bloom) if m_bits <= broadcast_max_bits else bloom
    j = probes.join(filt, "bucket", "left")
    hit = (
        F.coalesce(F.col("word"), F.lit(0).cast("bigint")).bitwiseAND(F.col("mask")) != 0
    ).cast("int")
    flags = j.groupBy(id_col).agg((F.min(hit) == 1).alias("maybe_dup"))
    return (
        new_docs.select(id_col)
        .join(flags, id_col, "left")
        .select(id_col, F.coalesce("maybe_dup", F.lit(False)).alias("maybe_dup"))
    )


def dedup_against_bloom(
    new_docs: DataFrame,
    corpus: DataFrame,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max_bits: int = 1 << 28,
) -> DataFrame:
    """:func:`dedup_against` (exact phase), result-identical, with a Bloom
    pre-screen: only the maybe-dup fraction of the batch reaches the hash
    anti-join against the full corpus ledger.

    Why it matters at scale: a crawl-refresh batch is mostly NEW content;
    the plain anti-join shuffles every new doc's hash against the
    billions-row ledger each round, while the Bloom verdict is a
    broadcast/bucket probe against a fixed m_bits/32-word table, so the
    expensive join sees only true dups + the FPR-sized sliver. The Bloom
    no-false-negative guarantee makes the split lossless: definitely-new
    docs skip the verify because they CANNOT be in the corpus.
    """
    flags = bloom_maybe_dup(
        new_docs, bloom_build(corpus, m_bits, k_hashes, text_col), m_bits, k_hashes,
        id_col, text_col, broadcast_max_bits,
    )
    # both union branches consume this lineage — materialize once (house
    # localCheckpoint pattern, see dedup_against's near phase) or the
    # batch scan + probe pipeline re-executes per branch
    tagged = new_docs.join(flags, id_col).localCheckpoint(eager=True)
    definite = tagged.filter(~F.col("maybe_dup")).drop("maybe_dup")
    maybe = tagged.filter(F.col("maybe_dup")).drop("maybe_dup")
    return definite.unionByName(
        dedup_against(maybe, corpus, id_col=id_col, text_col=text_col)
    )


def semdedup(
    vectors: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster embeddings, then prune
    within-cluster cosine near-duplicates (Abbas et al. 2023,
    arXiv:2303.09540 — the method used to shrink LAION/web-text corpora).

    Clustering reuses :func:`omop2obo_spark.operators.ann.ivf_assign`
    (deterministic seeds = lowest-id vectors, optional Lloyd's
    refinement). Within each cluster, a row is a duplicate iff some
    LOWER-id cluster member has cosine >= ``threshold`` with it; the
    lowest such id is reported as ``dup_of``.  Keep-lowest-id is the same
    deterministic winner rule the exact/paragraph dedups use, and makes
    the operator engine-portable: cosine is rounded to 6dp before the
    threshold compare, so Spark and the SQL oracle agree at the boundary.

    Output: (id, centroid_id, dup_of, kept) — one row per input vector.

    Scale shape: the only data-sized shuffle keys embeddings by
    centroid_id (each cluster is processed independently — the SemDeDup
    partition structure). Per-cluster cost is |c|² dot products, so at
    corpus scale n_centroids grows with n to hold |c| ~ constant (the
    paper runs 50k clusters for 5B docs); the centroid table itself stays
    a broadcast dim. No all-pairs stage exists at any size.
    """
    from omop2obo_spark.operators.ann import cosine, ivf_assign

    _, assign = ivf_assign(vectors, n_centroids, id_col, vec_col, kmeans_iters)
    # three consumers (both pair sides + the final verdict select) — pin the
    # assignment once (house localCheckpoint pattern) or the broadcast-join +
    # window lineage re-executes per consumer
    v = (
        vectors.select(id_col, vec_col)
        .join(assign, on=id_col)
        .localCheckpoint(eager=True)
    )
    a = v.select(
        F.col(id_col).alias("a"), F.col("centroid_id"), F.col(vec_col).alias("va")
    )
    b = v.select(
        F.col(id_col).alias("b"), F.col("centroid_id"), F.col(vec_col).alias("vb")
    )
    dup = (
        a.join(b, on="centroid_id")
        .filter(F.col("a") > F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .groupBy("a")
        .agg(F.min("b").alias("dup_of"))
        .select(F.col("a").alias(id_col), "dup_of")
    )
    return (
        v.select(id_col, "centroid_id")
        .join(dup, on=id_col, how="left")
        .select(
            id_col,
            "centroid_id",
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def blocking_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Blocking-quality audit: how good is the banded-LSH candidate
    generator, measured against exact n-gram-Jaccard ground truth?

    The two standard entity-resolution blocking metrics:

      * reduction_ratio   = 1 - |candidates| / (n·(n-1)/2)
        (how much of the all-pairs quadratic the blocker avoided)
      * pair_completeness = |candidates ∩ truth| / |truth|
        (recall of true near-dup pairs — the number a dedup operator
        watches before trusting LSH parameters at full scale)

    Truth = all pairs with exact Jaccard >= ``threshold`` (generated by
    shingle co-occurrence — a quadratic-ish stage, so this operator is an
    EVALUATION harness to run on a bounded sample/partition; the
    candidate side is the production :func:`minhash_lsh_pairs` plan).
    Output: one row (n_docs, total_pairs, n_candidates, n_truth, n_hits,
    reduction_ratio, pair_completeness).
    """
    # both pair plans are consumed twice (their count aggregate + the hits
    # semi-join) — pin each once (house localCheckpoint pattern) or the
    # quadratic-ish truth join and the full LSH pipeline execute twice
    cand = minhash_lsh_pairs(
        docs, id_col, text_col, n_hashes, bands, k
    ).localCheckpoint(eager=True)
    truth = (
        ngram_jaccard_pairs(docs, None, id_col, text_col, k, threshold)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    hits = truth.join(cand, on=["a", "b"], how="left_semi")
    nd = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    nc = cand.agg(F.count("*").alias("n_candidates"))
    nt = truth.agg(F.count("*").alias("n_truth"))
    nh = hits.agg(F.count("*").alias("n_hits"))
    total = (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("bigint")
    return (
        nd.crossJoin(nc).crossJoin(nt).crossJoin(nh)
        .select(
            "n_docs",
            total.alias("total_pairs"),
            "n_candidates",
            "n_truth",
            "n_hits",
            F.round(1.0 - F.col("n_candidates") / total, 6).alias("reduction_ratio"),
            F.when(F.col("n_truth") == 0, F.lit(1.0))
            .otherwise(F.round(F.col("n_hits") / F.col("n_truth"), 6))
            .alias("pair_completeness"),
        )
    )


def corpus_overlap_estimate(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    n_hashes: int = 64,
    k: int = 3,
) -> DataFrame:
    """Corpus-level shingle-set overlap: MinHash Jaccard estimate between
    the UNION-of-shingles of two corpora — "how much does my new crawl
    overlap the training set" answered without materializing either
    distinct-shingle set into a join.

    A corpus's signature component h is min(md5(h || shingle)) over ALL
    its shingles (same per-doc hash family as :func:`minhash_signatures`,
    so one engine-portable hash definition serves both granularities);
    ``j_est`` is the fraction of matching components. One shuffle-free
    map + a k-column min-aggregate per corpus (the min is computed
    map-side per partition and combined — shingle streams never join,
    never shuffle beyond the 1-row combine), then a 1-row cross join.

    Output: one row (n_hashes, n_match, j_est 6dp). Standard error is
    sqrt(J(1-J)/n_hashes); callers wanting a tighter estimate raise
    n_hashes — cost is linear, still one pass.
    """

    def corpus_sig(docs: DataFrame, name: str) -> DataFrame:
        sh = docs.select(F.explode(shingles(F.col(text_col), k)).alias("shingle"))
        aggs = [
            F.min(_minhash_component(h, F.col("shingle"))).alias(f"{name}{h}")
            for h in range(n_hashes)
        ]
        return sh.agg(*aggs)
    a = corpus_sig(docs_a, "a")
    b = corpus_sig(docs_b, "b")
    # an empty/all-NULL-text corpus yields an all-NULL signature row; the
    # coalesce pins that to 0 matches -> j_est 0.0 (defined), instead of a
    # NULL j_est that silently drops out of caller threshold filters
    matches = sum(
        F.coalesce((F.col(f"a{h}") == F.col(f"b{h}")).cast("int"), F.lit(0))
        for h in range(n_hashes)
    )
    return (
        a.crossJoin(b)
        .select(matches.alias("__m"))
        .select(
            F.lit(n_hashes).alias("n_hashes"),
            F.col("__m").cast("long").alias("n_match"),
            F.round(F.col("__m") / F.lit(n_hashes), 6).alias("j_est"),
        )
    )


def edit_distance_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Exact edit-distance (Levenshtein) self-join: every pair of docs
    with ``ed(text_a, text_b) <= max_dist`` — the character-level
    similarity join next to the set-level ones
    (:func:`prefix_filter_jaccard_join` for Jaccard,
    :func:`minhash_lsh_pairs` for approximate). The reference's fuzzy
    tier is TF-IDF cosine (`/root/reference/omop2obo/string_similarity.py:206`);
    edit distance is the complementary string-metric join an
    entity-name / near-dup pipeline needs (typo variants, OCR noise).

    Candidate generation is the ED-Join / q-gram prefix filter, with NO
    approximation:

      * each string becomes occurrence-encoded q-grams ``(gram, occ)``
        — the i-th occurrence of a gram value is its own element, so an
        equi-join computes MULTISET intersection exactly;
      * one edit operation destroys at most ``q`` grams, so if
        ``ed(a,b) <= k`` the multisets share >= ``max(n_a, n_b) - k*q``
        elements; by the AllPairs prefix lemma the first
        ``k*q + 1`` elements of each string under one global total
        order must collide. We order elements rarest-first (corpus
        frequency asc, then value) so prefixes are dominated by RARE
        grams — hot grams never fan out, the anti-skew property;
      * strings too short for the bound to bite
        (``len <= q*(k+1) - 1``, i.e. fewer than ``k*q + 1`` grams
        after ``len - q + 1``) go through an explicit short block that
        pairs DISTINCT short VALUES (a true bounded dimension —
        ``<= |alphabet|^(q(k+1)-1)`` strings — even when short DOCS are
        a fact-scale population of repeated codes), verifies at value
        level, and expands verified value pairs back to doc ids with
        two equi-joins; a pair with one long partner is still covered
        by the long side's prefix, so ONLY both-short pairs need it;
      * verification is built-in ``levenshtein`` with the threshold
        argument (bails out of the DP once > k) on candidate pairs
        only — text bytes move only for candidates.

    Returns (a, b, dist) with a < b, dist <= max_dist. NULL texts are
    excluded (no distance is defined); empty strings participate (they
    are `short`). Lossless vs brute force — pinned in tests.

    Scale shape: one shuffle for gram frequency (vocab scale), one
    per-doc window for the prefix rank (doc-bounded groups), a
    rare-key-by-construction prefix self-join, then a candidate-sized
    verify join. Never an all-pairs product on the long population.
    """
    k = int(max_dist)
    if k < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    base = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        .filter(F.col("__t").isNotNull())
        .withColumn("__len", F.length("__t"))
    )
    short_max = q * (k + 1) - 1  # len - q + 1 - k*q < 1  <=>  len <= short_max

    # -- short×short block: pair DISTINCT short VALUES (the true
    # bounded-length dimension — ≤ |alphabet|^short_max strings — where
    # short DOCS can be a fact-scale population of repeated codes/names),
    # pre-verify at value level, then expand only verified value pairs
    # back to doc ids via two equi-joins
    shorts = base.filter(F.col("__len") <= F.lit(short_max))
    svals = shorts.select(F.col("__t"), F.col("__len")).distinct()
    va = svals.select(F.col("__t").alias("__va"), F.col("__len").alias("__la"))
    vb = svals.select(F.col("__t").alias("__vb"), F.col("__len").alias("__lb"))
    val_pairs = (
        va.join(F.broadcast(vb), on=F.col("__va") <= F.col("__vb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= F.lit(k))
        .filter(F.levenshtein(F.col("__va"), F.col("__vb"), k) >= 0)
        .select("__va", "__vb")
    )
    short_cand = (
        val_pairs.join(shorts.select(F.col("doc").alias("__x"), F.col("__t").alias("__va")), on="__va")
        .join(shorts.select(F.col("doc").alias("__y"), F.col("__t").alias("__vb")), on="__vb")
        .filter(F.col("__x") != F.col("__y"))
        .select(
            F.least(F.col("__x"), F.col("__y")).alias("a"),
            F.greatest(F.col("__x"), F.col("__y")).alias("b"),
        )
    )

    # -- prefix path for everything with >= 1 gram ----------------------
    grams = (
        base.filter(F.col("__len") >= F.lit(q))
        .select(
            "doc",
            "__len",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(__t) - {q} + 1),"
                    f" i -> substring(__t, i, {q}))"
                )
            ).alias("__pos", "gram"),
        )
        # occurrence number: i-th time this gram value appears in this doc
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("doc", "gram").orderBy("__pos")
            ),
        )
        .select("doc", "__len", "gram", "occ")
    )
    freq = grams.groupBy("gram", "occ").agg(F.count("*").alias("__f"))
    w = Window.partitionBy("doc").orderBy("__f", "gram", "occ")
    prefix = (
        grams.join(freq, on=["gram", "occ"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(k * q + 1))
        .select("doc", "__len", "gram", "occ")
    )
    pa = prefix.select(
        F.col("doc").alias("a"), F.col("__len").alias("__la"), "gram", "occ"
    )
    pb = prefix.select(
        F.col("doc").alias("b"), F.col("__len").alias("__lb"), "gram", "occ"
    )
    gram_cand = (
        pa.join(pb, on=["gram", "occ"])
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= F.lit(k))
        )
        .select("a", "b")
    )

    cand = short_cand.unionByName(gram_cand).distinct()

    # -- verify: threshold Levenshtein on candidates only ---------------
    ta = base.select(F.col("doc").alias("a"), F.col("__t").alias("__ta"))
    tb = base.select(F.col("doc").alias("b"), F.col("__t").alias("__tb"))
    return (
        cand.join(ta, on="a")
        .join(tb, on="b")
        .withColumn("dist", F.levenshtein(F.col("__ta"), F.col("__tb"), k))
        .filter(F.col("dist") >= 0)
        .select("a", "b", F.col("dist").cast("long").alias("dist"))
    )
