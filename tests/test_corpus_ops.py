"""Tests for the training-data corpus operators: dedup, ANN, text stats,
multimodal plumbing — run over the driver's sf0.001 testdata tables."""

import pytest
from pyspark.sql import functions as F

from omop2obo_spark.operators.ann import brute_force_topk, cosine, ivf_topk
from omop2obo_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    embedding_cosine_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from omop2obo_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_assets,
)
from omop2obo_spark.operators.textstats import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    whitespace_token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_finds_injected_duplicates(spark):
    d = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text"), (4, "hello world")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.canonical_id, r.group_size) for r in exact_dedup(d).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[4] == (1, 3)
    assert out[3] == (3, 1)


def test_minhash_lsh_catches_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again until dawn"
    near = base.replace("dawn", "dusk")
    far = "completely different content about spark shuffle partitions and joins"
    d = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(d, n_hashes=16, bands=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # verify with exact jaccard
    verified = ngram_jaccard_pairs(d, threshold=0.4)
    got = {(r.a, r.b): r.jaccard for r in verified.collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.5


def test_minhash_signature_deterministic(spark, docs):
    s1 = minhash_signatures(docs.limit(20)).orderBy("doc_id").collect()
    s2 = minhash_signatures(docs.limit(20).repartition(5)).orderBy("doc_id").collect()
    assert [r.sig for r in s1] == [r.sig for r in s2]


def test_simhash_similar_docs_close(spark):
    d = spark.createDataFrame(
        [(1, "spark shuffle partition join broadcast"),
         (2, "spark shuffle partition join broadcast extra"),
         (3, "quantum entanglement of bose einstein condensates")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.simhash for r in simhash(d).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(out[1], out[2]) < ham(out[1], out[3])


def test_brute_force_topk_self_similarity(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    for qid in (0, 1, 2):
        ranks = sorted(r.rank for r in rows if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5]
        assert all(-1.0 <= r.cos <= 1.0 for r in rows if r.query_id == qid)


def test_ivf_topk_recall_against_brute_force(spark, emb):
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    bf = brute_force_topk(emb, queries, k=3)
    ivf = ivf_topk(emb, queries, k=3, n_centroids=8, nprobe=4)
    bf_set = {(r.query_id, r.vec_id) for r in bf.collect()}
    ivf_set = {(r.query_id, r.vec_id) for r in ivf.collect()}
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_textstats_quality_and_tokens(spark, docs):
    out = quality_features(docs.limit(50)).collect()
    assert all(0 <= r.q_score <= 1.0001 for r in out)
    assert all(r.q_tokens > 0 for r in out)
    d = spark.createDataFrame([("hello, world! x2 done.",)], "text string")
    r = d.select(
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 4
    assert r.bpe == 8  # hello , world ! x 2 done .


def test_lang_id(spark):
    d = spark.createDataFrame(
        [(1, "the cat is in the house and that is fine"),
         (2, "der hund ist nicht in das haus und für immer"),
         (3, "zzz qqq xxx")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(d).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_fingerprint_order_sensitivity(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.set_fingerprint, r.rolling_fingerprint) for r in fingerprint(d).collect()}
    assert out[1][0] == out[2][0]      # set fingerprint ignores order
    assert out[1][1] != out[2][1]      # rolling hash is order-sensitive
    assert out[1][0] != out[3][0]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, n=30)
    feats = extract_features(assets, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 16 for r in rows)
    # deterministic across partitionings
    feats2 = extract_features(assets.repartition(7), dim=16)
    a = {r.asset_id: r.feature for r in rows}
    b = {r.asset_id: r.feature for r in feats2.collect()}
    assert a == b
    imgs = resize_images(assets, 8, 8).collect()
    assert all(len(bytes(r.media)) <= 64 and r.width == 8 for r in imgs)
    frames = sample_frames(assets).collect()
    assert frames and all(r.frame_idx >= 0 for r in frames)


def test_embedding_cosine_pairs_exact_and_bucketed(spark, emb):
    e = emb.select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
    )
    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_cosine_pairs(e, threshold=0.3, bucketed=False).collect()
    }
    assert exact, "threshold 0.3 must yield pairs on sf0.001 embeddings"
    assert all(a < b for (a, b) in exact)
    assert all(c >= 0.3 for c in exact.values())

    bucketed = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_cosine_pairs(
            e, threshold=0.3, bucketed=True, n_bits=8, band_bits=2
        ).collect()
    }
    # every bucketed pair is verified with the exact cosine → precision 1.0
    for k, v in bucketed.items():
        assert k in exact and abs(v - exact[k]) < 1e-9
    # banding with 4 bands of 2 bits keeps recall high at this threshold
    recall = len(bucketed) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_hyperplane_signs_deterministic():
    from omop2obo_spark.operators.dedup import _hyperplane_signs

    a = _hyperplane_signs(3, 16)
    assert a == _hyperplane_signs(3, 16)
    assert set(a) <= {-1, 1} and len(a) == 16
    assert a != _hyperplane_signs(4, 16)


def test_ivf_kmeans_refinement_deterministic_and_competitive(spark, emb):
    """Lloyd's refinement (distributed assignment + posexplode/avg update,
    bounded driver collect) must be deterministic across runs and must not
    lose recall vs the raw lowest-id seeds."""
    e = emb.select("vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"))
    queries = e.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(e, queries, k=3).collect()}

    def recall(iters):
        ivf = ivf_topk(e, queries, k=3, n_centroids=8, nprobe=4, kmeans_iters=iters)
        got = {(r.query_id, r.vec_id) for r in ivf.collect()}
        return len(bf & got) / len(bf), got

    r0, _ = recall(0)
    r2a, set_a = recall(2)
    r2b, set_b = recall(2)
    assert set_a == set_b           # deterministic across runs
    # refinement changes bucket shapes; recall stays competitive (individual
    # queries can shift buckets, so exact dominance over the seeds is not
    # guaranteed — bucket balance is what k-means buys)
    assert r0 >= 0.5 and r2a >= 0.6


def test_redact_pii_categories_and_order(spark):
    from omop2obo_spark.operators.textstats import redact_pii

    d = spark.createDataFrame(
        [(1, "mail a.b-c_d@ex-ample.org and 10.1.2.3 then 555-123-4567 and 123-45-6789"),
         (2, "no pii here"),
         (3, "two mails x@y.io z@w.co")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(d).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_ip, r1.n_phone, r1.n_ssn) == (1, 1, 1, 1)
    assert r1.redacted == "mail <EMAIL> and <IP> then <PHONE> and <SSN>"
    assert rows[2].redacted == "no pii here" and rows[2].n_email == 0
    assert rows[3].n_email == 2 and rows[3].redacted.count("<EMAIL>") == 2


def test_top_k_vocabulary_ranking(spark):
    from omop2obo_spark.operators.textstats import top_k_vocabulary

    d = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry apple"), (3, "banana")],
        "doc_id long, text string",
    )
    rows = [(r.token, r.n, r.rank) for r in top_k_vocabulary(d, k=2).collect()]
    # apple and banana tie at 3; tie breaks token-ascending
    assert rows == [("apple", 3, 1), ("banana", 3, 2)]


def test_dedup_clusters_chain_and_pointer_jumping(spark):
    # a 6-node path (worst case for plain propagation — pointer jumping
    # must still reach the fixpoint inside max_iterations), plus a
    # separate pair and a triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a long, b long",
    )
    from omop2obo_spark.operators.dedup import dedup_clusters

    expected = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # driver-side union-find path (graph under the cutover)
    got = {r.doc_id: r.component for r in dedup_clusters(pairs, max_iterations=5).collect()}
    assert got == expected
    # distributed propagation path (cutover forced to 0) must agree
    dist = {
        r.doc_id: r.component
        for r in dedup_clusters(pairs, max_iterations=5, driver_max_edges=0).collect()
    }
    assert dist == expected


def test_dedup_keep_canonical_drops_non_heads(spark):
    from omop2obo_spark.operators.dedup import dedup_clusters, dedup_keep_canonical

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 7, 10, 11)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    kept = dedup_keep_canonical(docs, dedup_clusters(pairs))
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7, 10]


def test_hash_sample_deterministic_and_rate(spark):
    from omop2obo_spark.operators.textstats import hash_sample

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r.doc_id for r in hash_sample(docs, 0.25).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, 0.25).collect())
    assert a == b  # pure function of the key
    assert 0.18 < len(a) / 2000 < 0.32  # concentration around the rate
    # monotone in rate: a lower-rate sample is a subset of a higher-rate one
    small = set(r.doc_id for r in hash_sample(docs, 0.1).collect())
    assert small <= set(a)
    import pytest

    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_curate_corpus_funnel_monotone(spark, docs):
    from omop2obo_spark.operators.curate import FUNNEL_STAGES, curate_corpus

    curated, funnel = curate_corpus(docs)
    rows = {r.stage: r.n_docs for r in funnel.collect()}
    assert list(rows) == FUNNEL_STAGES  # all stages present
    counts = [rows[s] for s in FUNNEL_STAGES]
    assert counts == sorted(counts, reverse=True)  # monotone non-increasing
    assert curated.count() == counts[-1]
    assert curated.columns == docs.columns  # schema preserved


def test_pack_sequences_greedy_semantics(spark):
    from omop2obo_spark.operators.pack import pack_sequences

    docs = spark.createDataFrame(
        [(1, 6), (2, 6), (3, 3), (4, 3), (5, 11)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r.pack_idx for r in
           pack_sequences(docs, budget=10, n_buckets=1).collect()}
    # greedy first-fit in id order: [6][6,3][3][11]; the oversized doc 5
    # gets a pack of its own (overflow allowed, caller truncates)
    assert out == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_pack_sequences_partitioning_independent(spark):
    from omop2obo_spark.operators.pack import pack_sequences, pack_stats

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens")
    )
    a = pack_sequences(docs, budget=64, n_buckets=4)
    b = pack_sequences(docs.repartition(13), budget=64, n_buckets=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    stats = {r.bucket: r for r in pack_stats(a, budget=64).collect()}
    assert sum(r.n_docs for r in stats.values()) == 300
    assert all(0 < r.fill_ratio <= 1.0 for r in stats.values())


def test_pack_sequences_derived_buckets_and_group_guard(spark):
    """n_buckets=None derives the bucket count from corpus size (memory
    bound holds without caller tuning); an over-full group fails fast with
    an actionable error instead of OOMing mid-applyInPandas."""
    import pytest
    from pyspark.errors import PythonException

    from omop2obo_spark.operators.pack import (
        DOCS_PER_BUCKET, derive_pack_buckets, pack_sequences)

    # the sizing formula: floor of 8, then linear in corpus size
    assert derive_pack_buckets(0) == 8
    assert derive_pack_buckets(DOCS_PER_BUCKET * 8) == 8
    assert derive_pack_buckets(DOCS_PER_BUCKET * 1000 + 1) == 1001
    assert derive_pack_buckets(10**12) == 4_000_000

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    # default derives (small input -> 8 buckets) and matches the explicit
    # spelling exactly — derivation must not change the layout
    derived = pack_sequences(docs, budget=16)
    explicit = pack_sequences(docs, budget=16, n_buckets=8)
    assert sorted(map(tuple, derived.collect())) == sorted(map(tuple, explicit.collect()))

    # OOM-shape guard: force every doc into one bucket with a tiny cap
    with pytest.raises(PythonException, match="max_bucket_rows"):
        pack_sequences(docs, budget=16, n_buckets=1, max_bucket_rows=50).collect()


def test_corpus_ops_null_and_empty_text_contract(spark):
    """Pin the degenerate-input contract: NULL text never crashes a task
    (the reference's row-wise code would raise; at 10^12 rows that is not
    an option) and never scores as content."""
    from omop2obo_spark.operators.dedup import exact_dedup, simhash
    from omop2obo_spark.operators.textstats import fingerprint, lang_id, quality_features

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "normal text here")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r for r in quality_features(docs).collect()}
    assert q[1].q_tokens is None and q[1].q_score == 0.2  # no length credit for NULL
    assert q[2].q_tokens == 0
    assert {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}[1] == "und"
    fp = {r.doc_id: r.set_fingerprint for r in fingerprint(docs).collect()}
    assert fp[1] is None and fp[2] == fp[3]  # empty and whitespace agree
    ex = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert ex[2].canonical_id == 2 and ex[3].canonical_id == 2  # "" groups
    assert ex[1].group_size == 1  # NULL text is its own group
    # token-less docs emit no simhash row (documented)
    assert [r.doc_id for r in simhash(docs, bits=8).collect()] == [4]


def test_null_text_docs_never_merge(spark):
    """TWO NULL-text docs: unknown content must not merge — each is its
    own exact-dedup singleton (text_hash stays NULL) and neither forms an
    LSH candidate pair (all-NULL signatures previously collapsed every
    band key to md5(''), pairing all NULL docs with each other)."""
    from omop2obo_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, ""), (5, "real text here")],
        "doc_id long, text string",
    )
    ex = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert ex[1].group_size == 1 and ex[2].group_size == 1
    assert ex[1].canonical_id == 1 and ex[2].canonical_id == 2
    assert ex[1].text_hash is None and ex[2].text_hash is None
    pairs = sorted((r.a, r.b) for r in minhash_lsh_pairs(docs).collect())
    # empty-string docs have IDENTICAL (empty) content — a true dup pair;
    # NULL docs must not appear in any pair
    assert pairs == [(3, 4)]


def test_simhash_rejects_bits_beyond_hash_width(spark):
    import pytest

    from omop2obo_spark.operators.dedup import simhash

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bits"):
        simhash(docs, bits=61)
    assert simhash(docs, bits=60).count() == 1


def test_pack_sequences_null_tokens_counted_as_zero(spark):
    from omop2obo_spark.operators.pack import pack_sequences

    docs = spark.createDataFrame(
        [(1, 6), (2, None), (3, 6), (4, 6)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: (r.pack_idx, r.n_tokens) for r in
           pack_sequences(docs, budget=10, n_buckets=1).collect()}
    # NULL → 0 tokens: doc 2 rides along in doc 1's pack
    assert out == {1: (0, 6), 2: (0, 0), 3: (1, 6), 4: (2, 6)}


def test_corpus_profile_approx_error_bounded(spark, docs):
    from omop2obo_spark.operators.textstats import corpus_profile

    exact = {r.source: r for r in corpus_profile(docs, approx=False).collect()}
    approx = {r.source: r for r in corpus_profile(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        assert a.n_docs == e.n_docs
        assert abs(a.n_distinct - e.n_distinct) <= max(3, 0.1 * e.n_distinct)  # HLL rsd=0.05
        # percentile_approx returns an actual data point near the quantile
        assert abs(a.p50_tokens - e.p50_tokens) <= max(2, 0.1 * e.p50_tokens)
        assert abs(a.p95_tokens - e.p95_tokens) <= max(2, 0.1 * e.p95_tokens)


def test_chunk_turns_windows_and_trailing(spark):
    from omop2obo_spark.operators.chunk import chunk_turns

    tr = spark.createDataFrame(
        [("c1", i, f"t{i}") for i in range(5)] + [("c2", 0, "solo")],
        "conv_id string, turn_idx int, text string",
    )
    rows = {(r.conv_id, r.chunk_idx): (r.start_turn, r.n_turns, r.text)
            for r in chunk_turns(tr, window=3, stride=2).collect()}
    assert rows[("c1", 0)] == (0, 3, "t0\nt1\nt2")
    assert rows[("c1", 1)] == (2, 3, "t2\nt3\nt4")
    assert rows[("c1", 2)] == (4, 1, "t4")  # trailing short window
    assert rows[("c2", 0)] == (0, 1, "solo")
    import pytest

    with pytest.raises(ValueError):
        chunk_turns(tr, window=0)


def test_dedup_clusters_empty_pairs(spark):
    from omop2obo_spark.operators.dedup import dedup_clusters, dedup_keep_canonical

    empty = spark.createDataFrame([], "a long, b long")
    assert dedup_clusters(empty).count() == 0
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    assert dedup_keep_canonical(docs, dedup_clusters(empty)).count() == 2


def test_repetition_signals_model_parity(spark):
    """repetition_signals vs a plain-Python model on crafted docs covering
    every branch: clean text, repeated lines, repeated n-grams, text
    shorter than n, and empty/whitespace-only docs."""
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import repetition_signals

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "spam line\nspam line\nspam line\nunique line"),
        (3, "buy now " * 8),          # heavy 3-gram + 5-gram repetition
        (4, "tiny"),                   # shorter than both n
        (5, "   \n  \n"),              # whitespace only → all zeros
        (6, "a b\nc d e f g h a b\na b"),
        # digit-edged lines: catches transform(F.trim) passing the element
        # INDEX as trim's optional 2nd arg (stripping index digits)
        (7, "1 repeated line 1\n1 repeated line 1\n0 other 2"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def model(text, tn=3, dn=5):
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        lc = Counter(lines)
        nl, dl = sum(lc.values()), len(lc)
        tc = sum(c * len(v) for v, c in lc.items())
        dc = sum((c - 1) * len(v) for v, c in lc.items())
        toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]

        def gc(n):
            return Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )

        g3, g5 = gc(tn), gc(dn)

        def frac(a, b):
            return a / b if b else 0.0

        return (
            frac(nl - dl, nl),
            frac(dc, tc),
            frac(max(g3.values()) if g3 else 0, sum(g3.values())),
            frac(sum(c for c in g5.values() if c > 1), sum(g5.values())),
        )

    got = {
        r.doc_id: (
            r.dup_line_frac,
            r.dup_line_char_frac,
            r.top_ngram_frac,
            r.dup_ngram_frac,
        )
        for r in repetition_signals(df).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    for doc_id, text in rows:
        want = model(text)
        assert got[doc_id] == pytest.approx(want, abs=1e-12), (doc_id, got[doc_id], want)
    # sanity on the intent: the spammy docs score high, clean text low
    assert got[2][0] >= 0.5 and got[3][3] > 0.8 and got[1][2] < 0.2


def test_boilerplate_detect_and_remove(spark):
    from omop2obo_spark.operators.curate import (
        boilerplate_lines,
        remove_boilerplate_lines,
    )

    rows = [
        (1, "Unique article one\nSubscribe To Our Newsletter!\nbody text 1"),
        (2, "another story\n  subscribe to our newsletter!  \nbody text 2"),
        (3, "subscribe to our newsletter!\nthird body"),
        (4, "rare shared line\nfourth body"),
        (5, "rare shared line\nfifth body\n\n  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # footer hits 3/5 = 0.6 of docs; 'rare shared line' only 2/5 = 0.4
    bp = boilerplate_lines(docs, min_doc_frac=0.5)
    got = {r.line: (r.n_docs, r.doc_frac) for r in bp.collect()}
    assert got == {"subscribe to our newsletter!": (3, 0.6)}

    cleaned = {r.doc_id: r.text for r in remove_boilerplate_lines(docs, bp).collect()}
    # order + untrimmed original form of survivors preserved; whitespace
    # lines kept as formatting; matching is trim+lowercase-insensitive
    assert cleaned[1] == "Unique article one\nbody text 1"
    assert cleaned[2] == "another story\nbody text 2"
    assert cleaned[3] == "third body"
    assert cleaned[4] == "rare shared line\nfourth body"
    assert cleaned[5] == "rare shared line\nfifth body\n\n  "

    # every-line-boilerplate doc degrades to empty string, not a dropped row
    solo = spark.createDataFrame(
        [(9, "subscribe to our newsletter!")], "doc_id int, text string"
    )
    assert remove_boilerplate_lines(solo, bp).collect()[0].text == ""

    # empty boilerplate set is the identity transform
    none = boilerplate_lines(docs, min_doc_frac=0.9)
    assert none.count() == 0
    same = {r.doc_id: r.text for r in remove_boilerplate_lines(docs, none).collect()}
    assert same == dict(rows)


def test_contamination_check_model(spark):
    """contamination_check vs hand-computed n-gram overlap fractions:
    exact containment, partial overlap, case/whitespace folding, repeated
    grams counted per occurrence, short/empty docs yielding zero grams."""
    from omop2obo_spark.operators.curate import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"), (101, "a b c")],
        "doc_id int, text string",
    )
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),  # exact: 7/7
        (2, "the quick brown cat sat on a mat today"),       # 1 of 7 grams hit
        (3, "completely different words in this document here"),  # 0 of 5
        (4, "too short"),                                     # <n tokens: 0 grams
        (5, ""),                                              # empty: 0 grams
        (6, "THE  Quick\tBrown   FOX jumps over the lazy dog"),  # folding: 7/7
        (7, "a b c a b c a b c"),                             # dup grams: 3/7
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_hits, r.contamination_frac)
        for r in contamination_check(docs, bench, n=3).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}  # no doc dropped
    assert got[1] == (7, 7, 1.0)
    assert got[2] == (7, 1, round(1 / 7, 9))
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (0, 0, 0.0)
    assert got[6] == (7, 7, 1.0)
    assert got[7] == (7, 3, round(3 / 7, 9))


def test_paragraph_dedup_keep_first(spark):
    """paragraph_dedup: globally-first occurrence wins (lexicographic
    (doc_id, position)), within-doc repeats collapse, whitespace-only
    paragraphs always survive as formatting, all-duplicate docs degrade
    to empty text, normalization is trim+lower+collapse-whitespace."""
    from omop2obo_spark.operators.curate import paragraph_dedup

    rows = [
        (1, "alpha body\n\nshared footer\n\nalpha body"),   # self-repeat collapses
        (2, "beta body\n\nShared   FOOTER"),                # loses footer to doc 1
        (3, "shared footer\n\n \n\ngamma body"),            # loses footer; blank kept
        (4, ""),                                            # empty doc survives
        (5, "shared footer"),                               # everything lost → ""
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.text, r.n_paras, r.n_kept) for r in paragraph_dedup(docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] == ("alpha body\n\nshared footer", 3, 2)
    assert got[2] == ("beta body", 2, 1)
    assert got[3] == (" \n\ngamma body", 3, 2)
    assert got[4] == ("", 1, 1)
    assert got[5] == ("", 1, 0)

    # determinism under partitioning: same result from 1 and 13 partitions
    one = {tuple(r) for r in paragraph_dedup(docs.coalesce(1)).collect()}
    many = {tuple(r) for r in paragraph_dedup(docs.repartition(13)).collect()}
    assert one == many == {(k, *v) for k, v in got.items()}


def test_stratified_sample_rates_and_determinism(spark):
    """stratified_sample vs a Python replay of the md5-prefix rule:
    rate 0 drops, 1.0 passes through once, integer rates repeat exactly,
    fractional rates add the extra copy for exactly the keys whose
    bucket falls under frac(r); unknown strata get default_rate."""
    import hashlib

    from omop2obo_spark.operators.textstats import stratified_sample

    rows = [(i, ["a", "b", "c", "d", "e"][i % 5]) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"a": 0.0, "b": 1.0, "c": 2.0, "d": 2.5, "e": 0.5}
    out = stratified_sample(docs, rates, salt="t1")
    got = {}
    for r in out.collect():
        got.setdefault((r.doc_id, r.source), []).append(r.copy_idx)

    def bucket(key):
        return int(hashlib.md5(f"t1|{key}".encode()).hexdigest()[:8], 16)

    import math
    for i, s in rows:
        r = rates[s]
        n = math.floor(r) + (1 if bucket(i) < (r - math.floor(r)) * 2**32 else 0)
        expect = list(range(1, n + 1)) if n else None
        assert got.get((i, s)) == expect, (i, s, r)
    # default_rate applies to strata absent from the map
    extra = spark.createDataFrame([(999, "unknown")], "doc_id long, source string")
    assert stratified_sample(extra, rates).count() == 1
    assert stratified_sample(extra, rates, default_rate=0.0).count() == 0
    # deterministic under partitioning
    again = {}
    for r in stratified_sample(docs.repartition(17), rates, salt="t1").collect():
        again.setdefault((r.doc_id, r.source), []).append(r.copy_idx)
    assert again == got
    with pytest.raises(ValueError):
        stratified_sample(docs, {"a": -1.0})


def test_unigram_logprob_score_python_replay(spark):
    """unigram_logprob_score vs an exact Python replay: same tokenizer,
    top-k vocabulary with (count desc, token asc) tie-break, 9dp-rounded
    log-probs, OOV floor 1/total, 6dp mean; empty/null docs score 0.0."""
    import math
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import unigram_logprob_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "zebra xylophone quark"),   # all OOV at small vocab_k
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tok, r.xent) for r in unigram_logprob_score(docs, vocab_k=4).collect()}

    tok = lambda s: [t for t in re.split(r"[^a-z0-9']+", (s or "").lower()) if t]
    counts = Counter(t for _, s in rows for t in tok(s))
    total = sum(counts.values())
    vocab = dict(
        (t, round(math.log(c / total), 9))
        for t, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    )
    oov = round(math.log(1.0 / total), 9)
    for i, s in rows:
        ts = tok(s)
        exp = round(-sum(vocab.get(t, oov) for t in ts) / len(ts), 6) if ts else 0.0
        assert got[i] == (len(ts), exp), (i, got[i], exp)
    # OOV-heavy doc must score strictly worse (higher xent) than prose
    assert got[3][1] > got[1][1]


def test_assign_shards_layout(spark):
    """assign_shards: md5-bucket shard ids replayed in Python, dense
    0-based key-ordered positions per shard, partitioning-independent."""
    import hashlib

    from omop2obo_spark.operators.pack import assign_shards

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = [(r.doc_id, r.shard_id, r.shard_pos) for r in assign_shards(docs, 7).collect()]
    exp_sid = lambda i: int(hashlib.md5(f"shard|{i}".encode()).hexdigest()[:8], 16) % 7
    shards = {}
    for doc_id, sid, pos in out:
        assert sid == exp_sid(doc_id)
        shards.setdefault(sid, []).append((pos, doc_id))
    for sid, rows in shards.items():
        rows.sort()
        # dense positions 0..n-1, ordered by doc_id
        assert [p for p, _ in rows] == list(range(len(rows)))
        assert [d for _, d in rows] == sorted(d for _, d in rows)
    assert sum(len(v) for v in shards.values()) == 300
    # deterministic under partitioning
    again = sorted(
        (r.doc_id, r.shard_id, r.shard_pos)
        for r in assign_shards(docs.repartition(11), 7).collect()
    )
    assert again == sorted(out)
    with pytest.raises(ValueError):
        assign_shards(docs, 0)


def test_hashed_embedding_python_replay(spark):
    """hashed_embedding vs an exact Python replay of the md5 slot/sign
    hashing; empty and null docs get the zero vector; deterministic under
    partitioning."""
    import hashlib
    import re

    from omop2obo_spark.operators.textstats import hashed_embedding

    rows = [
        (1, "the cat sat on the mat"),
        (2, "The CAT the cat"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: list(r.embedding) for r in hashed_embedding(docs, dim=16).collect()}

    def replay(s, dim=16):
        v = [0.0] * dim
        for t in re.split(r"[^a-z0-9']+", (s or "").lower()):
            if not t:
                continue
            hx = hashlib.md5(t.encode()).hexdigest()
            v[int(hx[:8], 16) % dim] += 1 if int(hx[8], 16) % 2 == 0 else -1
        return v

    assert set(got) == {1, 2, 3, 4}
    for i, s in rows:
        assert got[i] == replay(s), (i, got[i], replay(s))
    assert got[3] == [0.0] * 16 and got[4] == [0.0] * 16
    # repeated tokens accumulate (doc 2 has 'the' x2 and 'cat' x2)
    assert sum(abs(x) for x in got[2]) >= 2.0
    again = {r.doc_id: list(r.embedding)
             for r in hashed_embedding(docs.repartition(9), dim=16).collect()}
    assert again == got
    with pytest.raises(ValueError):
        hashed_embedding(docs, dim=0)


def test_dedup_against_exact_and_near(spark):
    """dedup_against: exact phase drops content already in the corpus
    (normalization-insensitive), near phase additionally drops
    band-colliding Jaccard-verified near-dups; unrelated docs survive."""
    from omop2obo_spark.operators.dedup import dedup_against

    base = "the quick brown fox jumps over the lazy dog again and again until dawn"
    corpus = spark.createDataFrame(
        [(1001, base), (1002, "some other long standing corpus document here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "The  QUICK brown fox jumps over the lazy dog again and again until dawn"),  # exact (normalized)
            (2, base.replace("dawn", "dusk")),   # near-dup of 1001
            (3, "completely fresh content about spark adaptive query execution"),
        ],
        "doc_id long, text string",
    )
    exact_kept = sorted(r.doc_id for r in dedup_against(new, corpus).collect())
    assert exact_kept == [2, 3]
    near_kept = sorted(
        r.doc_id
        for r in dedup_against(
            new, corpus, near=True, n_hashes=16, bands=8, jaccard_threshold=0.4
        ).collect()
    )
    assert near_kept == [3]
    # schema preserved
    assert dedup_against(new, corpus).columns == new.columns


def test_compression_ratio_band_pass(spark):
    """compression_ratio: repetitive text compresses far below prose,
    prose below random hex; empty/null docs score 0.0; raw_bytes is the
    UTF-8 length."""
    import hashlib

    from omop2obo_spark.operators.textstats import compression_ratio

    rand = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(40)
    )
    rows = [
        (1, "buy now " * 200),
        (2, "The patient presented with intermittent chest pain radiating to "
            "the left arm, relieved by rest, with no prior cardiac history. "
            "Examination found regular rhythm and clear lung fields today." * 3),
        (3, rand),
        (4, ""),
        (5, None),
        (6, "naïve café"),  # multibyte: raw_bytes > len(str)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert got[1].compress_ratio < 0.05
    assert got[1].compress_ratio < got[2].compress_ratio < got[3].compress_ratio
    assert got[3].compress_ratio > 0.5
    assert (got[4].raw_bytes, got[4].compress_ratio) == (0, 0.0)
    assert (got[5].raw_bytes, got[5].compress_ratio) == (0, 0.0)
    assert got[6].raw_bytes == len("naïve café".encode("utf-8"))
    # deterministic across partitionings
    again = {r.doc_id: r.compress_ratio for r in compression_ratio(docs.repartition(5)).collect()}
    assert again == {k: v.compress_ratio for k, v in got.items()}


def test_bpe_pair_counts_model(spark):
    from collections import Counter

    from omop2obo_spark.operators.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "THE THEME, the!"), (3, "x"), (4, None)],
        "doc_id long, text string",
    )
    got = [(r.pair, r.n, r.rank) for r in bpe_pair_counts(docs, k=5).collect()]

    words = []
    for t in ["the cat sat", "the theme, the!", "x", ""]:
        import re

        words += [w for w in re.split(r"[^a-z0-9']+", t.lower()) if len(w) >= 2]
    c = Counter(w[i : i + 2] for w in words for i in range(len(w) - 1))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(p, n, i + 1) for i, (p, n) in enumerate(exp)]
    assert got[0] == ("he", 4, 1)  # ties with 'th' broken by pair asc


def test_content_key_dedup_groups_identical_payloads(spark):
    from pyspark.sql import functions as F

    from omop2obo_spark.operators.multimodal import content_key_dedup

    assets = spark.range(10).select(
        F.col("id").alias("asset_id"),
        F.encode(F.pmod(F.col("id"), F.lit(3)).cast("string"), "utf-8").alias("media"),
    )
    rows = {r.asset_id: (r.canonical_id, r.group_size) for r in content_key_dedup(assets).collect()}
    # payload = id % 3 -> canonical is the smallest id in each residue class
    for i in range(10):
        assert rows[i] == (i % 3, 4 if i % 3 == 0 else 3)


def test_hash_split_weights_and_stability(spark):
    from pyspark.sql import functions as F

    from omop2obo_spark.operators.textstats import hash_split

    docs = spark.range(4000).select(F.col("id").alias("doc_id"))
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    # leak-free growth: a doc keeps its split when the corpus doubles
    small = {r.doc_id: r.split for r in hash_split(
        spark.range(2000).select(F.col("id").alias("doc_id")),
        {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    big = {r.doc_id: r.split for r in out.collect()}
    assert all(big[k] == v for k, v in small.items())

    import pytest as _pt
    with _pt.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.6})


def test_linear_quality_score_python_replay(spark):
    import hashlib
    import math
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import linear_quality_score

    texts = {1: "the cat sat on the mat", 2: "lorem ipsum dolor", 3: "", 4: None}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r.quality_score for r in linear_quality_score(docs, dim=8).collect()}

    w = [((int(hashlib.md5(f"w0|{j}".encode()).hexdigest()[:8], 16) % 2001) - 1000) / 1000.0
         for j in range(8)]
    for did, text in texts.items():
        toks = [t for t in re.split(r"[^a-z0-9']+", (text or "").lower()) if t]
        vec = Counter()
        for t in toks:
            slot = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 8
            sgn = 1 if int(hashlib.md5(t.encode()).hexdigest()[8], 16) % 2 == 0 else -1
            vec[slot] += sgn
        dot = sum(v * w[s] for s, v in vec.items())
        l1 = max(sum(abs(v) for v in vec.values()), 1.0)
        exp = round(1.0 / (1.0 + math.exp(-dot / l1)), 9)
        assert abs(got[did] - exp) < 1e-9, (did, got[did], exp)
    assert got[3] == 0.5 and got[4] == 0.5  # empty/null -> zero vector


def test_quantize_int8_roundtrip_error_bounded(spark, emb):
    from omop2obo_spark.operators.ann import quantize_int8

    v = emb.limit(50).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = quantize_int8(v)
    joined = v.join(q, "vec_id").select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.transform("qvec", lambda x: x.cast("double") * F.col("scale")),
                    lambda a, b: F.abs(a - b) / F.col("scale"),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("worst")
    ).collect()[0]
    # |q_i*scale - v_i| <= scale/2 (+ tiny float slack), and q stays in int8
    assert joined.worst <= 0.5 + 1e-9
    mx = q.select(
        F.max(F.aggregate("qvec", F.lit(0), lambda a, x: F.greatest(a, F.abs(x)))).alias("m")
    ).collect()[0].m
    assert mx <= 127


def test_quantized_topk_recall_against_brute_force(spark, emb):
    from omop2obo_spark.operators.ann import quantized_topk

    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = v.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    bf = brute_force_topk(v, queries, k=5)
    qt = quantized_topk(v, queries, k=5)
    bf_set = {(r.query_id, r.vec_id) for r in bf.collect()}
    qt_set = {(r.query_id, r.vec_id) for r in qt.collect()}
    recall = len(bf_set & qt_set) / len(bf_set)
    assert recall >= 0.8, f"int8 recall {recall}"


def test_prefix_filter_jaccard_join_equals_bruteforce(spark):
    """The prefix filter must be lossless: the exact pair set (and
    jaccard values) equal the brute-force all-pairs answer at several
    thresholds, including threshold-boundary pairs."""
    from fractions import Fraction

    from omop2obo_spark.operators.dedup import prefix_filter_jaccard_join

    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon eta",       # near-dup of 0
        2: "alpha beta gamma delta epsilon zeta",      # exact dup of 0
        3: "one two three four five six seven",
        4: "one two three four five six eight",        # near-dup of 3
        5: "unrelated text entirely different words",
        6: "alpha beta gamma",                          # short doc, 1 shingle
        7: "alpha beta gamma",                          # dup of 6
        8: "the the the the the common common tokens",  # hot tokens
        9: "the the the the the common common tokens!",
    }

    def grams(s):
        toks = [t for t in s.lower().split() if t]
        return {" ".join(toks[i:i + 3]) for i in range(0, max(len(toks) - 3, 0) + 1)}

    def brute(num, den):
        out = {}
        ids = sorted(texts)
        for i in ids:
            for j in ids:
                if i < j:
                    gi, gj = grams(texts[i]), grams(texts[j])
                    inter = len(gi & gj)
                    if inter and Fraction(inter, len(gi | gj)) >= Fraction(num, den):
                        out[(i, j)] = round(inter / len(gi | gj), 6)
        return out

    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    for num, den in [(1, 2), (4, 5), (1, 4), (1, 1)]:
        got = {
            (r.a, r.b): r.jaccard
            for r in prefix_filter_jaccard_join(docs, threshold=(num, den)).collect()
        }
        assert got == brute(num, den), f"threshold {num}/{den}"


def test_prefix_filter_jaccard_rejects_bad_threshold(spark):
    import pytest

    from omop2obo_spark.operators.dedup import prefix_filter_jaccard_join

    docs = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(docs, threshold=(3, 2))
    with pytest.raises(ValueError):
        prefix_filter_jaccard_join(docs, threshold=(0, 1))


def test_bpe_apply_static_merges_token_boundary_safe(spark):
    """Hand-walked merge chain: 'there' → '_the _re' (2 tokens) — the
    token-start marker must prevent the flat-string artifact where the
    'e' of a previous merge's output would fuse with a following 'r'
    ('another' must become _an _o _the _r, NOT merge across segments)."""
    from omop2obo_spark.operators.dedup import normalized_text  # noqa: F401 (style anchor)
    from omop2obo_spark.operators.textstats import bpe_apply

    docs = spark.createDataFrame(
        [(1, "there another interesting")], "doc_id int, text string"
    )
    row = bpe_apply(docs).collect()[0]
    # there→{_the,_re}=2, another→{_an,_o,_the,_r}=4, interesting→
    # {_in,_t,_er,_e,_s,_t,_in,_g}=8
    assert (row.n_words, row.n_chars, row.n_tokens) == (3, 23, 14)
    assert row.ratio == round(23 / 14, 6)

    # right-boundary regression: in 'more', (r,e) yields {_m,_o,_re}; the
    # later (o,r) merge must NOT match the prefix of segment '_re' (a
    # pattern without the trailing-space guard glued m,o,re into 'ore')
    row2 = bpe_apply(
        spark.createDataFrame([(1, "more")], "doc_id int, text string")
    ).collect()[0]
    assert row2.n_tokens == 3  # _m _o _re


def test_ivf_kmeans_string_ids_and_full_index(spark):
    """kmeans refinement works for non-long id columns (the rebuild schema
    inherits the input id type) and never shrinks the index: a centroid
    whose cluster empties keeps its previous position."""
    import math

    from omop2obo_spark.operators.ann import ivf_assign

    # 3 near-duplicate seeds (ids a0..a2) + one far cluster: after one
    # Lloyd round at most one of the duplicate seeds keeps members
    rows = [(f"a{i}", [1.0, 0.0, 0.0001 * i]) for i in range(3)]
    rows += [(f"b{i}", [0.0, 1.0, 0.01 * i]) for i in range(30)]
    vecs = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    centroids, assign = ivf_assign(
        vecs, n_centroids=3, id_col="vec_id", kmeans_iters=2
    )
    crows = centroids.collect()
    assert len(crows) == 3                      # index never shrinks
    assert {type(r.centroid_id) for r in crows} == {str}
    assert assign.count() == 33
    # deterministic across reruns
    again, _ = ivf_assign(vecs, n_centroids=3, id_col="vec_id", kmeans_iters=2)
    a = sorted((r.centroid_id, tuple(r.cvec)) for r in crows)
    b = sorted((r.centroid_id, tuple(r.cvec)) for r in again.collect())
    assert a == b
    assert all(all(not math.isnan(x) for x in r.cvec) for r in crows)


def test_redact_pii_null_text_counts_zero(spark):
    from omop2obo_spark.operators.textstats import redact_pii

    d = spark.createDataFrame(
        [(1, None), (2, "x@y.io")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in redact_pii(d).collect()}
    assert (rows[1].n_email, rows[1].n_ip, rows[1].n_phone, rows[1].n_ssn) == (0, 0, 0, 0)
    assert rows[1].redacted is None
    assert rows[2].n_email == 1


def test_compression_ratio_preserves_string_id_type(spark):
    from omop2obo_spark.operators.textstats import compression_ratio

    d = spark.createDataFrame(
        [("conv-1:0", "hello world " * 50), ("conv-2:3", "prose")],
        "conv_id string, text string",
    )
    got = {r.conv_id: r for r in compression_ratio(d, id_col="conv_id").collect()}
    assert set(got) == {"conv-1:0", "conv-2:3"}
    assert got["conv-1:0"].compress_ratio < 0.2


def test_dedup_keep_canonical_custom_id_col(spark):
    """dedup_clusters always labels its id column 'doc_id'; keep-canonical
    must still work for a corpus keyed by any other column name."""
    from omop2obo_spark.operators.dedup import dedup_keep_canonical

    docs = spark.createDataFrame(
        [("c1", "x"), ("c2", "x"), ("c9", "y")], "conv_id string, text string"
    )
    clusters = spark.createDataFrame(
        [("c1", "c1"), ("c2", "c1")], "doc_id string, component string"
    )
    kept = sorted(r.conv_id for r in dedup_keep_canonical(docs, clusters, "conv_id").collect())
    assert kept == ["c1", "c9"]


def test_curate_corpus_custom_id_col(spark):
    """The advertised id_col parameter must drive the whole funnel,
    including the near-dedup keep-canonical stage."""
    from omop2obo_spark.operators.curate import curate_corpus

    docs = spark.createDataFrame(
        [
            (f"c{i}", "the quick brown fox jumps over the lazy dog and runs away fast")
            for i in range(4)
        ]
        + [("c9", "the small green cat sat on the warm stone wall in the sun today")],
        "conv_id string, text string",
    )
    curated, funnel = curate_corpus(docs, id_col="conv_id", jaccard_threshold=0.9)
    kept = sorted(r.conv_id for r in curated.collect())
    # the four identical docs collapse via exact dedup to their head; c9 survives
    assert kept == ["c0", "c9"]
    stages = {r.stage: r.n_docs for r in funnel.collect()}
    assert stages["s0_input"] == 5 and stages["s4_near_dedup"] == 2


def test_pack_sequences_string_ids_preserved(spark):
    """String ids must survive packing (a hard cast to long would NULL
    them) and pack in lexicographic id order within each bucket."""
    from omop2obo_spark.operators.pack import pack_sequences

    docs = spark.createDataFrame(
        [("conv_a", 3), ("conv_b", 3), ("conv_c", 5)],
        "conv_id string, n_tokens long",
    )
    out = pack_sequences(docs, budget=6, id_col="conv_id", n_buckets=1).collect()
    by_id = {r.doc_id: (r.pack_idx, r.n_tokens) for r in out}
    assert set(by_id) == {"conv_a", "conv_b", "conv_c"}
    assert by_id["conv_a"][0] == 0 and by_id["conv_b"][0] == 0
    assert by_id["conv_c"][0] == 1


def test_assign_shards_duplicate_keys_deterministic(spark):
    """Duplicate key values must get stable positions across different
    input partitionings (content-hash tiebreak), so (shard, pos) names
    the same example on every rebuild."""
    from omop2obo_spark.operators.pack import assign_shards

    rows = [(i % 4, f"payload_{i}") for i in range(40)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").repartition(13)
    pos_a = {(r.doc_id, r.text): (r.shard_id, r.shard_pos) for r in assign_shards(a, 4).collect()}
    pos_b = {(r.doc_id, r.text): (r.shard_id, r.shard_pos) for r in assign_shards(b, 4).collect()}
    assert pos_a == pos_b


def test_top_k_vocabulary_document_frequency(spark):
    from omop2obo_spark.operators.textstats import top_k_vocabulary

    d = spark.createDataFrame(
        [(1, "foo foo foo bar"), (2, "foo baz")], "doc_id long, text string"
    )
    rows = {r.token: (r.n, r.df) for r in top_k_vocabulary(d, k=10).collect()}
    assert rows["foo"] == (4, 2)
    assert rows["bar"] == (1, 1)
    assert rows["baz"] == (1, 1)


def test_paragraph_dedup_null_text_row_survives(spark):
    """A NULL-text document must survive paragraph dedup as an empty
    string (posexplode_outer), never a dropped row."""
    from omop2obo_spark.operators.curate import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta\n\ngamma"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: (r.text, r.n_paras, r.n_kept) for r in paragraph_dedup(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[2] == ("", 0, 0)
    assert rows[1][0] == "alpha beta\n\ngamma"


def test_content_key_dedup_null_payload_singletons(spark):
    from omop2obo_spark.operators.multimodal import content_key_dedup

    assets = spark.createDataFrame(
        [(1, None), (2, None), (3, bytearray(b"xx")), (4, bytearray(b"xx"))],
        "asset_id long, media binary",
    )
    got = {r.asset_id: (r.canonical_id, r.group_size, r.content_key)
           for r in content_key_dedup(assets).collect()}
    assert got[1][0:2] == (1, 1) and got[2][0:2] == (2, 1)
    assert got[1][2] is None and got[2][2] is None
    assert got[3][0:2] == (3, 2) and got[4][0:2] == (3, 2)


def test_sample_frames_null_duration_and_payload(spark):
    """A NULL duration samples one frame; a NULL payload emits no frames —
    neither kills the task."""
    from omop2obo_spark.operators.multimodal import sample_frames

    assets = spark.createDataFrame(
        [
            ("a1", "video", None, bytearray(b"0123456789abcdef")),
            ("a2", "video", 3000, bytearray(b"0123456789abcdef")),
            ("a3", "video", 5000, None),
        ],
        "asset_id string, media_type string, duration_ms long, media binary",
    )
    rows = sample_frames(assets, every_ms=1000, max_frames=4).collect()
    per = {}
    for r in rows:
        per.setdefault(r.asset_id, []).append(r.frame_idx)
    assert per["a1"] == [0]
    assert sorted(per["a2"]) == [0, 1, 2]
    assert "a3" not in per


def test_weighted_sample_deterministic_and_proportional(spark):
    """Efraimidis–Spirakis sampling: partition-independent, excludes
    non-positive weights, and actually tracks the weights (a 10x-weighted
    doc class must dominate the sample)."""
    import pytest

    from omop2obo_spark.operators.textstats import weighted_sample

    docs = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(10.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    a = weighted_sample(docs, k=1000, weight_col="w")
    b = weighted_sample(docs.repartition(17), k=1000, weight_col="w")
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    heavy = sum(1 for r in rows_a if r[1] == 10.0)
    # E[heavy] ~ 878 of 1000 under A-Res with 10:1 weights; anything near
    # the unweighted 500 means the weights were ignored
    assert heavy > 750

    # zero/negative/null weights can never be sampled
    dirty = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "doc_id long, w double"
    )
    kept = {r.doc_id for r in weighted_sample(dirty, k=10, weight_col="w").collect()}
    assert kept == {1}
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(docs, k=0, weight_col="w")


def test_token_budget_mixture_semantics(spark):
    """Budget coverage, straddling-doc inclusion, dropped sources, and —
    the load-bearing claim — the bucketed two-level prefix sum is exactly
    the flat one-window-per-source spec."""
    import pytest

    from omop2obo_spark.operators.textstats import token_budget_mixture

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("books")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
        (F.col("id") % 50 + 5).alias("n_tokens"),
    )
    budgets = {"web": 300, "code": 777}
    out = token_budget_mixture(docs, budgets, n_buckets=256)
    rows = out.collect()

    # dropped-source rule
    assert {r.source for r in rows} <= set(budgets)
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    for src, rs in per_src.items():
        got = sum(r.n_tokens for r in rs)
        # coverage: kept tokens reach the budget (straddler included)...
        assert got >= budgets[src]
        # ...and the prefix rule holds row-by-row: cum BEFORE each kept
        # doc is under budget
        assert all(r.cum_tokens - r.n_tokens < budgets[src] for r in rs)
        # minimality: dropping the largest-cum doc goes under budget
        assert got - max(r.n_tokens for r in rs) < budgets[src]

    # bucketed == flat, and both partition-independent
    flat = token_budget_mixture(docs, budgets, n_buckets=1)
    repart = token_budget_mixture(docs.repartition(13), budgets, n_buckets=16)
    key = lambda df: sorted((r.doc_id, r.cum_tokens) for r in df.collect())
    assert key(out) == key(flat) == key(repart)

    with pytest.raises(ValueError, match="budgets must be >= 0"):
        token_budget_mixture(docs, {"web": -1})
    with pytest.raises(ValueError, match="n_buckets"):
        token_budget_mixture(docs, budgets, n_buckets=1000)


def test_bpe_train_differential_vs_pure_python(spark):
    """bpe_train (distributed: vocab-dim aggregates + literal segment
    replaces) must reproduce the classic Sennrich word-level BPE loop,
    implemented here independently in pure Python — same pretokenizer,
    same (count desc, '_a _b' string asc) argmax, same ≥2-count stop."""
    import re

    from omop2obo_spark.operators.textstats import bpe_train

    texts = [
        "the cat sat on the mat with the other cat",
        "a bat and a cat chatted; that bat批 sat!",
        "thats that — the theme of the thesis",
        "batter chatter matters, the fatter the better",
        "cats bats mats thats the pattern",
    ] * 3
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def py_bpe(texts, n_merges):
        words: dict[str, int] = {}
        for t in texts:
            for w in re.split(r"[^a-z0-9']+", t.lower()):
                if len(w) >= 2:
                    words[w] = words.get(w, 0) + 1
        segs = {w: tuple(w) for w in words}
        out = []
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for w, f in words.items():
                s = segs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
            if not counts:
                break
            top = max(counts.values())
            if top < 2:
                break
            a, b = min((p for p, n in counts.items() if n == top),
                       key=lambda p: f"_{p[0]} _{p[1]}")
            out.append((a, b, top))
            for w, s in segs.items():
                ns, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                segs[w] = tuple(ns)
        return out

    expected = py_bpe(texts, 15)
    assert len(expected) >= 10  # corpus must be rich enough to be a real test
    got = bpe_train(docs, n_merges=15, checkpoint_every=4)
    assert got == expected
    # partition-independent
    assert bpe_train(docs.repartition(7), n_merges=15) == expected


def test_unicode_clean_vectors_and_idempotence(spark):
    from omop2obo_spark.operators.textstats import unicode_clean

    rows = [
        # NFC: e + combining acute composes; zero-width and soft hyphen drop
        (1, "café zero​width so­ft"),
        # control chars drop, tab run collapses, CRLF normalizes
        (2, "a\x00\x07b\t\tc\r\nd\re"),
        # 4 newlines -> paragraph break; spaces around newlines strip; trim
        (3, "  lead \n \n\n\n mid  end  "),
        (4, None),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.clean_text, r.changed) for r in unicode_clean(df).collect()}
    assert got[1] == ("café zero" + "width so" + "ft", True)
    assert got[2] == ("ab c\nd\ne", True)
    assert got[3] == ("lead\n\nmid end", True)
    assert got[4] == (None, False)
    assert got[5] == ("already clean", False)

    # idempotence: cleaning clean text is the identity
    once = unicode_clean(df).select("doc_id", F.col("clean_text").alias("text"))
    twice = {r.doc_id: r.clean_text for r in unicode_clean(once).collect()}
    assert twice == {k: v for k, (v, _) in got.items()}
    assert unicode_clean(once).filter("changed").count() == 0


def test_unicode_clean_no_shuffle_plan(spark):
    from omop2obo_spark.operators.textstats import unicode_clean

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = unicode_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bigram_logprob_score_python_replay(spark):
    import math
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import bigram_logprob_score

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat",
        3: "mat the on sat cat the",  # same unigrams as 1, scrambled order
        4: "zzz",                     # single token -> 0 bigrams
        5: "",                        # empty -> 0 bigrams
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {r.doc_id: (r.n_big, r.xent2) for r in
           bigram_logprob_score(df, vocab_k=4, bigram_k=3, lam=0.7).collect()}

    def tok(s):
        return [t for t in re.split(r"[^a-z0-9']+", s.lower()) if t]

    uni = Counter(t for s in texts.values() for t in tok(s))
    total = sum(uni.values())
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:4])
    bigs = Counter(
        (a, b) for s in texts.values() for a, b in zip(tok(s), tok(s)[1:])
    )
    top_big = dict(sorted(bigs.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    ctx = Counter()
    for (a, _b), n in bigs.items():
        ctx[a] += n

    expected = {}
    for d, s in texts.items():
        ts = tok(s)
        prs = list(zip(ts, ts[1:]))
        if not prs:
            expected[d] = (0, 0.0)
            continue
        lps = []
        for a, b in prs:
            pb = top_big.get((a, b), 0) / ctx[a] if (a, b) in top_big else 0.0
            pu = vocab.get(b, 0) / total if b in vocab else 1.0 / total
            lps.append(round(math.log(0.7 * pb + 0.3 * pu), 9))
        expected[d] = (len(prs), round(-sum(lps) / len(lps), 6))
    assert got == expected
    # scrambled doc must score strictly worse than its in-order twin
    assert got[3][1] > got[1][1]


def test_bigram_logprob_rejects_bad_lambda(spark):
    from omop2obo_spark.operators.textstats import bigram_logprob_score

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bigram_logprob_score(df, lam=1.0)


def _pq_fixture(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    # two tight clusters + noise so ADC ranking is meaningful
    base = np.vstack([
        rng.normal(0.0, 0.05, (20, 8)) + np.array([1, 0, 0, 0, 1, 0, 0, 0]),
        rng.normal(0.0, 0.05, (20, 8)) + np.array([0, 1, 0, 0, 0, 1, 0, 0]),
    ])
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_numpy_replay(spark):
    import numpy as np

    from omop2obo_spark.operators.ann import pq_codebooks, pq_encode

    rows, df = _pq_fixture(spark)
    books = pq_codebooks(df, m=4, n_codes=8)
    got = {r.vec_id: [r[f"code_{s}"] for s in range(4)] for r in pq_encode(df, books).collect()}

    vecs = dict(rows)
    for vid, v in vecs.items():
        for s in range(4):
            subv = np.array(v[s * 2 : (s + 1) * 2])
            cands = sorted(
                (round(float(np.sum((subv - np.array(cw)) ** 2)), 9), code)
                for code, cw in books[s]
            )
            assert got[vid][s] == cands[0][1], (vid, s)


def test_pq_topk_adc_replay_and_recall(spark):
    import numpy as np

    from omop2obo_spark.operators.ann import brute_force_topk, pq_codebooks, pq_topk

    rows, df = _pq_fixture(spark)
    books = pq_codebooks(df, m=4, n_codes=8)
    queries = df.filter("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    got = pq_topk(df, queries, books, k=5).collect()

    # ADC replay: every reported distance equals sum of subspace distances
    # to the ENCODED codeword
    vecs = dict(rows)
    enc = {}
    for vid, v in vecs.items():
        enc[vid] = []
        for s in range(4):
            subv = np.array(v[s * 2 : (s + 1) * 2])
            cands = sorted(
                (round(float(np.sum((subv - np.array(cw)) ** 2)), 9), code)
                for code, cw in books[s]
            )
            enc[vid].append(cands[0][1])
    cw_by = {(s, code): np.array(cw) for s in range(4) for code, cw in books[s]}
    for r in got:
        q = np.array(vecs[r.query_id])
        expect = sum(
            round(float(np.sum((q[s * 2 : (s + 1) * 2] - cw_by[(s, enc[r.vec_id][s])]) ** 2)), 9)
            for s in range(4)
        )
        assert abs(r.adist - round(expect, 6)) < 1e-9

    # recall vs exact cosine: clustered fixture must mostly agree
    exact = brute_force_topk(df, queries, k=5).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    pq = {}
    for r in got:
        pq.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & pq[q]) / 5 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_pq_encode_zero_shuffle_and_dim_guard(spark):
    from omop2obo_spark.operators.ann import pq_codebooks, pq_encode

    _rows, df = _pq_fixture(spark)
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(df, m=3)
    books = pq_codebooks(df, m=2, n_codes=4)
    plan = pq_encode(df, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_temperature_mixture_budgets_and_selection(spark):
    import hashlib
    import math

    from omop2obo_spark.operators.textstats import temperature_mixture

    rows = []
    for i in range(60):
        rows.append((i, "big", 100))       # 6000 tokens
    for i in range(60, 70):
        rows.append((i, "small", 100))     # 1000 tokens
    rows.append((70, "empty", 0))          # zero-token source drops
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {r.doc_id for r in temperature_mixture(df, total_budget=2000, alpha=0.5,
                                                 n_buckets=8).collect()}

    # python replay of the budget rule + the hash-prefix selection
    totals = {"big": 6000, "small": 1000}
    w = {s: math.sqrt(t) for s, t in totals.items()}
    denom = sum(w[s] for s in sorted(w))
    budgets = {s: int(math.floor(round(2000 * w[s] / denom, 6))) for s in w}
    expected = set()
    for src in budgets:
        docs = [r for r in rows if r[1] == src]
        docs.sort(key=lambda r: (hashlib.md5(f"mix0|{r[0]}".encode()).hexdigest(), r[0]))
        cum = 0
        for d in docs:
            if cum < budgets[src]:
                expected.add(d[0])
            cum += d[2]
    assert got == expected
    # alpha=0.5 upweights the small domain above its 1/7 natural share
    small_kept = sum(1 for d in got if 60 <= d < 70)
    assert small_kept / 10 > len([d for d in got if d < 60]) / 60


def test_temperature_mixture_guards(spark):
    from omop2obo_spark.operators.textstats import temperature_mixture

    df = spark.createDataFrame([(1, "a", 0)], "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError, match="positive token total"):
        temperature_mixture(df, total_budget=100)
    df2 = spark.createDataFrame([(1, "a", 5)], "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError):
        temperature_mixture(df2, total_budget=0)


def test_weighted_sample_per_group_stratified_topk(spark):
    """Per-group A-Res sampling: exactly k winners inside every group,
    winners are the k smallest es_keys of THAT group (verified against a
    Python replay of the shared key formula), partitioning-independent,
    and dirty weights are excluded before ranking."""
    import hashlib
    import math

    import pytest

    from omop2obo_spark.operators.textstats import weighted_sample_per_group

    docs = spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    out = weighted_sample_per_group(docs, k=25, weight_col="w", group_cols=["grp"])
    rows = sorted((r.grp, r.doc_id) for r in out.collect())
    # identical under a different physical partitioning
    out2 = weighted_sample_per_group(
        docs.repartition(13), k=25, weight_col="w", group_cols=["grp"]
    )
    assert rows == sorted((r.grp, r.doc_id) for r in out2.collect())

    # Python replay of the es_key: the winners per group are the 25
    # smallest (round(-ln(u)/w, 9), doc_id) pairs of that group
    def es_key(doc_id: int, w: float) -> float:
        bucket = int(hashlib.md5(f"w0|{doc_id}".encode()).hexdigest()[:8], 16)
        u = (bucket + 0.5) / float(2**32)
        return round(-math.log(u) / w, 9)

    expect: dict[str, list[tuple[float, int]]] = {}
    for i in range(900):
        expect.setdefault(f"g{i % 3}", []).append((es_key(i, i % 7 + 1), i))
    want = sorted(
        (g, did) for g, ks in expect.items() for _, did in sorted(ks)[:25]
    )
    assert rows == want

    # dirty weights never win; k validation
    dirty = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 0.0), (3, "a", None), (4, "b", 2.0)],
        "doc_id long, grp string, w double",
    )
    kept = {
        (r.grp, r.doc_id)
        for r in weighted_sample_per_group(
            dirty, k=10, weight_col="w", group_cols=["grp"]
        ).collect()
    }
    assert kept == {("a", 1), ("b", 4)}
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_per_group(dirty, k=0, weight_col="w", group_cols=["grp"])


def test_duplicate_span_removal_model_parity(spark):
    """Exact substring dedup vs an independent Python model: corpus-first
    occurrence kept, later (cross- and within-doc) repeats removed,
    overlapping spans merged, short/NULL docs untouched, and the result is
    partitioning-independent."""
    import re

    import pytest

    from omop2obo_spark.operators.dedup import duplicate_span_removal

    k = 3
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        # cross-doc repeat of "quick brown fox" (doc 1 pos 1 is canonical)
        (2, "a quick brown fox appeared again today"),
        # within-doc repeat: "x y z ... x y z"
        (3, "x y z q r s x y z"),
        # overlapping duplicated grams with doc 1's tail
        (4, "over the lazy dog indeed over the lazy cat"),
        (5, "too short"),
        (6, None),
        (7, ""),
        # identical twin docs: doc 8 canonical, doc 9 fully removed
        (8, "p q r p q r p q r"),
        (9, "p q r p q r p q r"),
    ]

    def model(pairs):
        toks = {
            d: [t for t in re.split(r"\s+", txt or "") if t] for d, txt in pairs
        }
        occ: dict[tuple, list] = {}
        for d, ts in sorted(toks.items()):
            for i in range(len(ts) - k + 1):
                occ.setdefault(tuple(ts[i : i + k]), []).append((d, i))
        covered: dict[int, set] = {d: set() for d in toks}
        for g, sites in occ.items():
            if len(sites) > 1:
                for d, p in sorted(sites)[1:]:
                    covered[d].update(range(p, p + k))
        return {
            d: (
                len(ts),
                len(ts) - sum(1 for i in range(len(ts)) if i not in covered[d]),
                " ".join(t for i, t in enumerate(ts) if i not in covered[d]),
            )
            for d, ts in toks.items()
        }

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in duplicate_span_removal(docs, k=k).collect()
    }
    assert got == model(rows)
    # spot-check the semantics the model encodes
    assert got[1][1] == 0                       # canonical doc untouched
    assert "quick brown fox" not in got[2][2]   # cross-doc repeat removed
    assert got[3][1] == 3 and got[3][2] == "x y z q r s"  # within-doc repeat
    assert got[5] == (2, 0, "too short")        # < k tokens untouched
    assert got[6] == (0, 0, "") and got[7] == (0, 0, "")
    # twin docs: doc 8 keeps only the first occurrence of its own repeated
    # grams ("p q r"), doc 9 (every gram non-canonical) is fully removed
    assert got[8] == (9, 6, "p q r") and got[9] == (9, 9, "")

    # partitioning independence
    got2 = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in duplicate_span_removal(docs.repartition(7), k=k).collect()
    }
    assert got2 == got

    with pytest.raises(ValueError, match="k must be"):
        duplicate_span_removal(docs, k=1)


def test_curriculum_order_matches_global_sort(spark):
    """Two-level prefix-sum curriculum position == the naive global
    row_number, under equi-width AND quantile boundaries, with skewed
    scores, ties broken by key, NULLs excluded, partitioning-independent."""
    from omop2obo_spark.operators.layout import quantile_buckets
    from omop2obo_spark.operators.pack import curriculum_order

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # 90% of mass at small scores, ties everywhere, a long tail
        F.when(F.col("id") < 1800, (F.col("id") % 7).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("score"),
    )
    with_null = docs.union(
        spark.createDataFrame([(99999, None)], "doc_id long, score double")
    )

    rows = sorted(
        (r.pos, r.doc_id)
        for r in curriculum_order(with_null, "score").collect()
    )
    want = [
        (i, d)
        for i, (s, d) in enumerate(
            sorted((r.score, r.doc_id) for r in docs.collect())
        )
    ]
    assert rows == want                      # exact global order, NULL dropped
    assert len(rows) == 2000

    # quantile boundaries give the identical positions (order is order)
    bounds = quantile_buckets(docs, "score", bits=4)
    rows_q = sorted(
        (r.pos, r.doc_id)
        for r in curriculum_order(docs, "score", boundaries=bounds).collect()
    )
    assert rows_q == want

    # partitioning independence
    rows_p = sorted(
        (r.pos, r.doc_id)
        for r in curriculum_order(docs.repartition(13), "score", n_buckets=5).collect()
    )
    assert rows_p == want

    with pytest.raises(ValueError, match="n_buckets"):
        curriculum_order(docs, "score", n_buckets=0)


def test_curriculum_order_constant_score(spark):
    """A constant score column (span 0) degrades to key order, not a crash."""
    from omop2obo_spark.operators.pack import curriculum_order

    df = spark.createDataFrame([(3, 1.0), (1, 1.0), (2, 1.0)], "doc_id long, score double")
    got = sorted((r.pos, r.doc_id) for r in curriculum_order(df, "score").collect())
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_epoch_shuffle_permutation_and_determinism(spark):
    """epoch_shuffle is a bijection onto [0, N), equals the naive global
    hash-order row_number, differs across epochs, and is independent of
    input partitioning."""
    import hashlib

    from omop2obo_spark.operators.pack import epoch_shuffle

    docs = spark.range(0, 500).select(F.col("id").cast("string").alias("doc_id"))

    def naive(epoch):
        keys = [f"{i}" for i in range(500)]
        ranked = sorted(keys, key=lambda k: (hashlib.md5(f"ep|{epoch}|{k}".encode()).hexdigest(), k))
        return {k: i for i, k in enumerate(ranked)}

    got0 = {r.doc_id: r.pos for r in epoch_shuffle(docs, 0).collect()}
    assert got0 == naive(0)                      # exact engine-replayable rank
    assert sorted(got0.values()) == list(range(500))  # bijection

    got1 = {r.doc_id: r.pos for r in epoch_shuffle(docs, 1).collect()}
    assert got1 == naive(1)
    assert got1 != got0                          # epochs permute differently

    got_p = {
        r.doc_id: r.pos
        for r in epoch_shuffle(docs.repartition(7), 0, n_buckets=5).collect()
    }
    assert got_p == got0                         # partitioning-independent

    with pytest.raises(ValueError, match="epoch"):
        epoch_shuffle(docs, -1)


def test_mad_outlier_flags_model_parity(spark):
    """Per-group modified z-score vs a pure-Python median/MAD model,
    including the mad=0 degenerate group, NULL values, and the
    ungrouped (whole-corpus) spelling."""
    import statistics

    from omop2obo_spark.operators.curate import mad_outlier_flags

    rows = [
        # group a: spread values + one whopping outlier
        *[("a", f"a{i}", float(v)) for i, v in enumerate([10, 12, 11, 13, 9, 300])],
        # group b: constant (mad = 0) plus one different value
        *[("b", f"b{i}", 5.0) for i in range(5)],
        ("b", "b9", 50.0),
        # NULL value
        ("a", "a_null", None),
        # NULL group key: flagging op must pass it through, not drop it
        (None, "n0", 7.0),
    ]
    df = spark.createDataFrame(rows, "src string, doc_id string, v double")
    got = {
        r.doc_id: (r.robust_z, r.is_outlier)
        for r in mad_outlier_flags(df, "v", ["src"], k=3.5).collect()
    }

    a_vals = [10.0, 12.0, 11.0, 13.0, 9.0, 300.0]
    med = statistics.median(a_vals)
    mad = statistics.median(abs(x - med) for x in a_vals)
    for i, v in enumerate(a_vals):
        z = round(0.6745 * abs(v - med) / mad, 9)
        assert got[f"a{i}"] == (z, z > 3.5)
    assert got["a5"][1] is True                  # 300 flagged
    assert got["a0"][1] is False
    # mad=0 group: no scale estimate -> NULL z, never flagged
    assert got["b9"] == (None, False)
    assert got["b0"] == (None, False)
    assert got["a_null"] == (None, False)
    assert got["n0"] == (None, False)            # NULL group key kept
    assert len(got) == len(rows)                 # nothing dropped

    # ungrouped spelling runs and flags the same extreme point
    flat = {r.doc_id: r.is_outlier for r in mad_outlier_flags(df, "v", k=3.5).collect()}
    assert flat["a5"] is True

    # approx twin agrees on this small input (sketch is exact here)
    ap = {
        r.doc_id: r.is_outlier
        for r in mad_outlier_flags(df, "v", ["src"], k=3.5, approx=True).collect()
    }
    assert ap == {k: o for k, (_, o) in got.items()}

    with pytest.raises(ValueError, match="k must be"):
        mad_outlier_flags(df, "v", k=0)


def test_simhash_pairs_pigeonhole_vs_brute_force(spark):
    """Banded Hamming join finds EXACTLY the pairs brute-force xor
    bit_count finds at the threshold (pigeonhole recall is exact, the
    verify filter kills false candidates), and is partitioning-
    independent."""
    from itertools import combinations

    from omop2obo_spark.operators.dedup import simhash_pairs

    # hand-built 12-bit fingerprints with known Hamming structure
    fps_rows = [
        (1, 0b000000000000),
        (2, 0b000000000001),   # d(1,2)=1
        (3, 0b000000000111),   # d(1,3)=3, d(2,3)=2
        (4, 0b111100000000),   # d(1,4)=4 -> excluded at k=3
        (5, 0b000000000111),   # identical to 3: d=0
        (6, 0b101010101010),
    ]
    fps = spark.createDataFrame(fps_rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(fps, max_hamming=3, bits=12).collect()
    }
    want = {
        (a, b): bin(fa ^ fb).count("1")
        for (a, fa), (b, fb) in combinations(fps_rows, 2)
        if bin(fa ^ fb).count("1") <= 3
    }
    assert got == want
    assert (1, 2) in got and (3, 5) in got and got[(3, 5)] == 0
    assert (1, 4) not in got

    got_p = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(fps.repartition(7), max_hamming=3, bits=12).collect()
    }
    assert got_p == got

    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(fps, max_hamming=0, bits=12)


def test_simhash_pairs_end_to_end_near_dup_text(spark):
    """simhash -> simhash_pairs over real text: a one-token edit stays
    within the Hamming ball, unrelated text falls outside it."""
    from omop2obo_spark.operators.dedup import simhash, simhash_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("today", "tonight")),       # near-dup
            (3, "completely different content about molecular biology and gene expression patterns"),
        ],
        "doc_id long, text string",
    )
    fps = simhash(docs, bits=48)
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(fps, max_hamming=6, bits=48).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------


def test_bm25_search_matches_python_model(spark):
    import math
    import re

    from omop2obo_spark.operators.textstats import bm25_search

    texts = {
        1: "spark joins data with hash join strategies",
        2: "the cat sat on the mat",
        3: "hash hash hash everywhere hash",
        4: "data data spark data pipelines move data",
        5: None,
        6: "",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    terms, k1, b = ["hash", "data", "spark"], 1.2, 0.75

    tok = {
        d: [x for x in re.split(r"[^a-z0-9']+", (t or "").lower()) if x]
        for d, t in texts.items()
    }
    n = len(texts)
    avgdl = sum(len(v) for v in tok.values()) / n
    want = {}
    for d, toks in tok.items():
        s, m = 0.0, 0
        for t in set(terms):
            tf = toks.count(t)
            if not tf:
                continue
            dfreq = sum(1 for v in tok.values() if t in v)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
            m += 1
        if m:
            want[d] = (m, round(s, 6))

    got = {
        r["doc_id"]: (r["n_matched_terms"], r["score"], r["rank"])
        for r in bm25_search(df, terms, k=10).collect()
    }
    assert set(got) == set(want)
    for d, (m, s) in want.items():
        assert got[d][0] == m and got[d][1] == pytest.approx(s, abs=1e-6), d
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [d for d, _ in ranked] == [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][2])]


def test_bm25_topk_truncation_and_plan(spark):
    from omop2obo_spark.operators.textstats import bm25_search

    rows = [(i, "common word here") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(df, ["common"], k=5)
    assert [r["rank"] for r in out.collect()] == [1, 2, 3, 4, 5]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-prune semantic dedup)
# ---------------------------------------------------------------------------


def test_semdedup_matches_within_cluster_brute_force(spark, emb):
    """The pruned set must equal a brute-force replay: for each vector,
    dup_of = min lower-id SAME-CLUSTER neighbor with rounded cos >= t."""
    from omop2obo_spark.operators.ann import ivf_assign
    from omop2obo_spark.operators.dedup import semdedup

    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    ).filter(F.col("vec_id") < 300)
    out = {r.vec_id: (r.centroid_id, r.dup_of, r.kept)
           for r in semdedup(vecs, n_centroids=4, threshold=0.4).collect()}

    _, assign = ivf_assign(vecs, n_centroids=4)
    cid = {r.vec_id: r.centroid_id for r in assign.collect()}
    import math
    ev = {r.vec_id: list(r.embedding) for r in vecs.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert set(out) == set(ev)
    for i in sorted(ev):
        lower = [j for j in ev
                 if j < i and cid[j] == cid[i]
                 and round(cos(ev[i], ev[j]), 6) >= 0.4]
        want_dup = min(lower) if lower else None
        got_cid, got_dup, got_kept = out[i]
        assert got_cid == cid[i]
        assert got_dup == want_dup, f"vec {i}: dup_of {got_dup} != {want_dup}"
        assert got_kept == (want_dup is None)


def test_semdedup_kept_set_has_no_remaining_close_lower_pair(spark, emb):
    """Global invariant: among kept vectors, no within-cluster pair has
    cos >= threshold (the dedup actually deduplicated)."""
    from omop2obo_spark.operators.dedup import semdedup
    from omop2obo_spark.operators.ann import cosine

    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    ).filter(F.col("vec_id") < 300)
    verdicts = semdedup(vecs, n_centroids=4, threshold=0.4)
    kept = verdicts.filter("kept").join(vecs, "vec_id")
    a = kept.select(F.col("vec_id").alias("a"), F.col("centroid_id"),
                    F.col("embedding").alias("va"))
    b = kept.select(F.col("vec_id").alias("b"), F.col("centroid_id"),
                    F.col("embedding").alias("vb"))
    close = (
        a.join(b, "centroid_id").filter("a > b")
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter("cos >= 0.4")
    )
    assert close.count() == 0


# ---------------------------------------------------------------------------
# Blocking-quality audit (reduction ratio / pair completeness)
# ---------------------------------------------------------------------------


def test_blocking_quality_hand_computed(spark):
    """Metrics must equal a hand replay of LSH candidates + exact truth."""
    from omop2obo_spark.operators.dedup import (
        blocking_quality, minhash_lsh_pairs, ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base.replace("kappa", "lambda")),
        (3, base),
        (4, "totally different words about spark adaptive query execution"),
        (5, "yet another unrelated document mentioning shuffle partitions"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = blocking_quality(d, n_hashes=8, bands=8, k=3, threshold=0.3).collect()[0]

    cand = {(r.a, r.b) for r in
            minhash_lsh_pairs(d, n_hashes=8, bands=8, k=3).collect()}
    truth = {(r.a, r.b) for r in
             ngram_jaccard_pairs(d, None, k=3, threshold=0.3).collect()}
    hits = truth & cand

    assert got.n_docs == 5 and got.total_pairs == 10
    assert got.n_candidates == len(cand)
    assert got.n_truth == len(truth)
    assert got.n_hits == len(hits)
    assert got.reduction_ratio == round(1.0 - len(cand) / 10, 6)
    assert got.pair_completeness == (
        1.0 if not truth else round(len(hits) / len(truth), 6)
    )
    # identical docs 1 and 3 are a truth pair and single-row bands must
    # catch them (identical signature -> identical every band)
    assert (1, 3) in truth and (1, 3) in cand


def test_blocking_quality_empty_truth_is_complete(spark):
    from omop2obo_spark.operators.dedup import blocking_quality

    d = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    got = blocking_quality(d, n_hashes=8, bands=8, k=3, threshold=0.9).collect()[0]
    assert got.n_truth == 0 and got.pair_completeness == 1.0


def test_semdedup_partition_independent(spark, emb):
    """Verdicts must not depend on physical layout: deterministic seeds,
    window tie-breaks, and 6dp rounding make the output identical at any
    partition count."""
    from omop2obo_spark.operators.dedup import semdedup

    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    ).filter(F.col("vec_id") < 300)

    def run(nparts):
        rows = semdedup(vecs.repartition(nparts), n_centroids=4, threshold=0.4).collect()
        return sorted((r.vec_id, r.centroid_id, r.dup_of, r.kept) for r in rows)

    assert run(3) == run(17)


def test_semdedup_plan_shape(spark, emb):
    """Scale-shape guard: the pair stage must be the centroid-keyed
    shuffle join (2 SMJs: pair join + verdict join) with no nested-loop,
    no single-partition exchange, and no Python eval anywhere — the
    SemDeDup contract that every cluster is an independent unit of work."""
    from omop2obo_spark.operators.dedup import semdedup
    from omop2obo_spark.plans.guard import assert_scale_safe

    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )
    rep = assert_scale_safe(
        semdedup(vecs, n_centroids=8, threshold=0.4),
        max_sort_merge_joins=2,
    )
    assert rep["nested_loop_joins"] == 0
    assert rep["row_python_evals"] == 0 and rep["arrow_python_evals"] == 0


def test_retrieval_metrics_hand_computed(spark):
    """nDCG/MRR/recall against hand arithmetic, incl. the edge rows: a
    query with no relevant retrieved (mrr 0), a query with no judgments
    at all (ndcg/recall NULL, n_rel 0), and ideal truncation at k."""
    import math

    from omop2obo_spark.operators.ann import retrieval_metrics

    ranked = spark.createDataFrame(
        # q1: retrieved items 10,11,12 at ranks 1..3
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         # q2: two retrieved, none relevant
         (2, 10, 1), (2, 11, 2),
         # q3: no qrels for this query at all
         (3, 10, 1)],
        "query_id int, vec_id int, rank int",
    )
    qrels = spark.createDataFrame(
        # q1: rel(10)=3, rel(12)=1, plus an unretrieved rel(99)=2
        [(1, 10, 3), (1, 12, 1), (1, 99, 2),
         # q2: only item 99 relevant (not retrieved)
         (2, 99, 1)],
        "query_id int, vec_id int, rel int",
    )
    got = {r.query_id: r.asDict() for r in retrieval_metrics(ranked, qrels, k=2).collect()}

    # q1 at k=2: DCG = 3/log2(2) + 0 = 3.0; ideal order rel desc = [3,2],
    # IDCG = 3/log2(2) + 2/log2(3); recall = 1 relevant of 3 total
    idcg = 3.0 + 2.0 / math.log2(3.0)
    q1 = got[1]
    assert q1["n_rel"] == 3 and q1["n_ret_rel"] == 1
    assert q1["ndcg"] == round(3.0 / idcg, 6)
    assert q1["mrr"] == 1.0
    assert q1["recall"] == round(1 / 3, 6)

    q2 = got[2]
    assert q2["n_rel"] == 1 and q2["n_ret_rel"] == 0
    assert (q2["ndcg"], q2["mrr"], q2["recall"]) == (0.0, 0.0, 0.0)

    q3 = got[3]
    assert q3["n_rel"] == 0 and q3["n_ret_rel"] == 0
    assert q3["ndcg"] is None and q3["recall"] is None
    assert q3["mrr"] == 0.0


def test_corpus_overlap_estimate_identical_and_disjoint(spark):
    """Identical corpora estimate J=1 exactly (all mins match); disjoint
    shingle sets estimate near 0; estimate stays within 4 standard
    errors of exact Jaccard on a half-overlap construction."""
    import math

    from omop2obo_spark.operators.dedup import corpus_overlap_estimate

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta token%d" % i) for i in range(30)],
        "doc_id long, text string",
    )
    same = corpus_overlap_estimate(a, a, n_hashes=32).collect()[0]
    assert same.n_match == 32 and same.j_est == 1.0

    b = spark.createDataFrame(
        [(i, "omega%d psi%d chi%d phi%d upsilon%d" % (i, i, i, i, i)) for i in range(30)],
        "doc_id long, text string",
    )
    diff = corpus_overlap_estimate(a, b, n_hashes=32).collect()[0]
    assert diff.j_est <= 0.2

    half = a.filter("doc_id < 15").unionByName(b.filter("doc_id >= 15"))
    est = corpus_overlap_estimate(a, half, n_hashes=64).collect()[0].j_est
    # exact J of the shingle sets, computed naively in python
    from omop2obo_spark.operators.dedup import shingles
    import pyspark.sql.functions as F
    sa = {r.g for r in a.select(F.explode(shingles(F.col("text"), 3)).alias("g")).distinct().collect()}
    sh = {r.g for r in half.select(F.explode(shingles(F.col("text"), 3)).alias("g")).distinct().collect()}
    j = len(sa & sh) / len(sa | sh)
    assert abs(est - j) <= 4 * math.sqrt(j * (1 - j) / 64)


def test_top_p_vocabulary_inclusion_and_ties(spark):
    """The crossing token is included; count ties break by token order;
    a peaked group truncates hard while a flat group keeps everything."""
    import pytest as _pt

    from omop2obo_spark.operators.textstats import top_p_vocabulary

    counts = spark.createDataFrame(
        # peaked: a=6, b=2, c=1, d=1 (total 10)
        [("g1", "a", 6), ("g1", "b", 2), ("g1", "c", 1), ("g1", "d", 1),
         # flat with a count tie: z/x both 1 -> token order decides ranks
         ("g2", "z", 1), ("g2", "x", 1)],
        "src string, token string, n long",
    )
    got = {(r.src, r.token): r.asDict()
           for r in top_p_vocabulary(counts, "src", p=0.7).collect()}
    # g1: a (0.6 cum) kept; b crosses 0.7 at cum 0.8 -> kept; c would start at 0.8 >= 0.7 -> out
    assert ("g1", "a") in got and ("g1", "b") in got
    assert ("g1", "c") not in got and ("g1", "d") not in got
    assert got[("g1", "b")]["rank"] == 2 and got[("g1", "b")]["cum_share"] == 0.8
    # g2: x (token < z) rank 1 cum 0.5 kept; z starts at 0.5 < 0.7 -> kept
    assert got[("g2", "x")]["rank"] == 1 and got[("g2", "z")]["rank"] == 2
    with _pt.raises(ValueError):
        top_p_vocabulary(counts, "src", p=0.0)


def test_retrieval_metrics_duplicate_qrels_resolved(spark):
    """Duplicate judgment rows must not fan out the hits join: metrics
    equal the deduplicated (max-rel) qrels run."""
    from omop2obo_spark.operators.ann import retrieval_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id int, vec_id int, rank int"
    )
    dup = spark.createDataFrame(
        [(1, 10, 3), (1, 10, 3), (1, 10, 1), (1, 99, 2)],
        "query_id int, vec_id int, rel int",
    )
    clean = spark.createDataFrame(
        [(1, 10, 3), (1, 99, 2)], "query_id int, vec_id int, rel int"
    )
    a = retrieval_metrics(ranked, dup, k=2).collect()[0].asDict()
    b = retrieval_metrics(ranked, clean, k=2).collect()[0].asDict()
    assert a == b
    assert a["n_rel"] == 2 and a["n_ret_rel"] == 1 and a["ndcg"] <= 1.0


def test_corpus_overlap_empty_corpus_defined_zero(spark):
    from omop2obo_spark.operators.dedup import corpus_overlap_estimate

    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = corpus_overlap_estimate(a, empty, n_hashes=16).collect()[0]
    assert r.n_match == 0 and r.j_est == 0.0


def test_top_p_and_retrieval_partitioning_independent(spark):
    from omop2obo_spark.operators.ann import retrieval_metrics
    from omop2obo_spark.operators.textstats import top_p_vocabulary

    counts = spark.createDataFrame(
        [(f"g{i % 4}", f"tok{j}", (i * 7 + j) % 13 + 1)
         for i in range(16) for j in range(9)],
        "src string, token string, n long",
    )
    a = sorted(map(tuple, top_p_vocabulary(counts.coalesce(1), "src", p=0.6).collect()))
    b = sorted(map(tuple, top_p_vocabulary(counts.repartition(11), "src", p=0.6).collect()))
    assert a == b

    ranked = spark.createDataFrame(
        [(q, i, r + 1) for q in range(6) for r, i in enumerate(range(q, q + 7))],
        "query_id int, vec_id int, rank int",
    )
    qrels = spark.createDataFrame(
        [(q, (q * 3 + j) % 11, j % 4) for q in range(6) for j in range(5)],
        "query_id int, vec_id int, rel int",
    )
    a = sorted(map(tuple, retrieval_metrics(ranked.coalesce(1), qrels.coalesce(1), k=5).collect()))
    b = sorted(map(tuple, retrieval_metrics(ranked.repartition(9), qrels.repartition(7), k=5).collect()))
    assert a == b


from tests.conftest import py_levenshtein as _py_levenshtein


def test_edit_distance_join_equals_bruteforce(spark):
    """The ED-Join prefix filter must be lossless: pair set + distances
    equal the O(n²) brute force at k = 0..3, across a corpus that
    exercises every candidate path — long strings (gram prefix), short
    strings incl. empty (bounded short block), exact dups, NULL text
    (excluded), and hot repeated grams (occurrence encoding)."""
    import itertools
    import random

    from omop2obo_spark.operators.dedup import edit_distance_join

    rng = random.Random(7)
    rows = [(i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 12))))
            for i in range(60)]
    rows += [(100, "kitten"), (101, "sitting"), (102, "flaw"), (103, "lawn"),
             (104, "abcabcabc"), (105, "abcabcabc"), (106, ""), (107, "ab"),
             (108, None), (109, "aaaaaaaaaa"), (110, "aaaaabaaaa")]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    present = [(i, t) for i, t in rows if t is not None]
    for k in (0, 1, 2, 3):
        got = {(r.a, r.b, r.dist) for r in edit_distance_join(docs, max_dist=k).collect()}
        want = {
            (a, b, _py_levenshtein(ta, tb))
            for (a, ta), (b, tb) in itertools.combinations(present, 2)
            if _py_levenshtein(ta, tb) <= k
        }
        assert got == want, f"k={k}"


def test_edit_distance_join_partitioning_independent(spark):
    from omop2obo_spark.operators.dedup import edit_distance_join

    rows = [(i, f"prefix-{i % 7}-suffix") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    a = {(r.a, r.b, r.dist)
         for r in edit_distance_join(docs.repartition(13), max_dist=2).collect()}
    b = {(r.a, r.b, r.dist)
         for r in edit_distance_join(docs.coalesce(1), max_dist=2).collect()}
    assert a == b and a


def test_edit_distance_join_rejects_bad_params(spark):
    import pytest

    from omop2obo_spark.operators.dedup import edit_distance_join

    docs = spark.createDataFrame([(0, "abc")], "doc_id int, text string")
    with pytest.raises(ValueError):
        edit_distance_join(docs, max_dist=-1)
    with pytest.raises(ValueError):
        edit_distance_join(docs, q=0)


def test_length_bucket_stats_python_model(spark):
    """Exact-quantile bucket boundaries + padding-waste vs a pure-Python
    type-7 replay, incl. boundary ties (pinned to the lower bucket)."""
    from omop2obo_spark.operators.pack import length_bucket_stats

    texts = ["w " * n for n in [0, 1, 1, 2, 3, 5, 5, 5, 8, 13, 21, 34]]
    docs = spark.createDataFrame(
        [(i, t.strip() if t else "") for i, t in enumerate(texts)],
        "doc_id: long, text: string",
    )
    ntoks = sorted(len([w for w in t.split() if w]) for t in texts)

    def q7(p):
        h = (len(ntoks) - 1) * p
        lo = int(h)
        return ntoks[lo] + (h - lo) * (ntoks[min(lo + 1, len(ntoks) - 1)] - ntoks[lo])

    n_b = 4
    bounds = [q7(i / n_b) for i in range(1, n_b)]
    model = {}
    for v in ntoks:
        b = sum(v > x for x in bounds)
        model.setdefault(b, []).append(v)
    want = {}
    for b, vs in model.items():
        waste = len(vs) * max(vs) - sum(vs)
        pct = 0.0 if max(vs) == 0 else round(waste / (len(vs) * max(vs)), 6)
        want[b] = (len(vs), min(vs), max(vs), sum(vs), waste, pct)
    got = {
        r.bucket: (r.n_docs, r.min_tok, r.max_tok, r.sum_tok, r.padding_waste, r.waste_pct)
        for r in length_bucket_stats(docs, n_buckets=n_b).collect()
    }
    assert got == want


def test_length_bucket_stats_approx_twin_and_guards(spark):
    import pytest

    from omop2obo_spark.operators.pack import length_bucket_stats

    docs = spark.createDataFrame(
        [(i, "t " * (i % 50)) for i in range(300)], "doc_id: long, text: string"
    )
    exact = length_bucket_stats(docs, n_buckets=4).collect()
    approx = length_bucket_stats(docs, n_buckets=4, approx=True).collect()
    # the sketch path must cover every doc and stay close on totals
    assert sum(r.n_docs for r in approx) == sum(r.n_docs for r in exact) == 300
    assert sum(r.sum_tok for r in approx) == sum(r.sum_tok for r in exact)
    with pytest.raises(ValueError):
        length_bucket_stats(docs, n_buckets=1)
    # all-empty corpus: single bucket, zero waste, pinned 0.0 pct
    empty = spark.createDataFrame([(0, ""), (1, None)], "doc_id: long, text: string")
    rows = length_bucket_stats(empty, n_buckets=2).collect()
    assert [(r.bucket, r.n_docs, r.padding_waste, r.waste_pct) for r in rows] == [(0, 2, 0, 0.0)]


def test_doc_keywords_python_model(spark):
    """TF-IDF keyword scores vs a pure-Python smooth-idf replay, incl.
    tie-break by term and NULL text (zero tokens, no rows)."""
    import math

    from omop2obo_spark.operators.textstats import doc_keywords

    texts = {
        0: "spark spark hash data common common",
        1: "hash data common rare",
        2: "common common common",
        3: None,
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id: long, text: string")
    n = len(texts)  # countDistinct(doc_id) counts the NULL-text doc too
    tf = {}
    for d, t in texts.items():
        for w in (t or "").lower().split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    want = {}
    for d in texts:
        scored = sorted(
            (
                (round(c * (math.log((n + 1) / (df[w] + 1)) + 1.0), 6), w, c)
                for (dd, w), c in tf.items()
                if dd == d
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for r, (s, w, c) in enumerate(scored, 1):
            want[(d, w)] = (c, s, r)
    got = {
        (r.id, r.term): (r.tf, r.score, r.kw_rank)
        for r in doc_keywords(docs, k=2).collect()
    }
    assert got == want
    assert not any(i == 3 for i, _ in got)


def test_rrf_fuse_hand_arithmetic(spark):
    """RRF fusion vs hand 1/(k+rank) sums: overlap, partial lists,
    multi-query isolation, top truncation, guards."""
    import pytest

    from omop2obo_spark.operators.ann import rrf_fuse

    la = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id: long, item: long, rank: int",
    )
    lb = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 20, 2)],
        "query_id: long, item: long, rank: int",
    )
    got = {
        (r.query_id, r.item): (r.rrf_score, r.n_lists, r.fused_rank)
        for r in rrf_fuse([la, lb], k=60).collect()
    }
    assert got == {
        (1, 11): (round(1 / 62 + 1 / 61, 6), 2, 1),  # both lists
        (1, 10): (round(1 / 61, 6), 1, 2),
        (1, 12): (round(1 / 62, 6), 1, 3),           # tie with 10 broken by item? no:
                                                     # 1/61 > 1/62 so 10 outranks 12
        (2, 20): (round(1 / 61 + 1 / 62, 6), 2, 1),
    }
    top1 = rrf_fuse([la, lb], k=60, top=1).collect()
    assert sorted((r.query_id, r.item) for r in top1) == [(1, 11), (2, 20)]
    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([la], k=0)


def test_token_pmi_python_model(spark):
    """Skip-gram PMI vs a pure-Python replay of the pinned distribution
    (offset pairs, unordered values, slot marginals), incl. window=1,
    min_count filtering, and NULL text."""
    import math
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import token_pmi

    texts = {
        0: "the quick brown fox the quick",
        1: "quick brown quick brown",
        2: "solo",
        3: None,
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id: long, text: string")
    for w, mc in [(1, 1), (2, 1), (2, 2)]:
        pairs = Counter()
        for t in texts.values():
            toks = [x for x in re.split(r"[^a-z0-9']+", (t or "").lower()) if x]
            for i, a in enumerate(toks):
                for d in range(1, w + 1):
                    if i + d < len(toks):
                        b = toks[i + d]
                        pairs[tuple(sorted((a, b)))] += 1
        total = sum(pairs.values())
        slots = Counter()
        for (a, b), c in pairs.items():
            slots[a] += c
            slots[b] += c
        want = {
            (a, b): (c, round(math.log(c * 4.0 * total / (slots[a] * slots[b])), 6))
            for (a, b), c in pairs.items()
            if c >= mc
        }
        got = {
            (r.tok_a, r.tok_b): (r.n_pairs, r.pmi)
            for r in token_pmi(docs, window=w, min_count=mc).collect()
        }
        assert got == want, (w, mc)


def test_winsorize_python_model(spark):
    """Grouped winsorization vs a pure-Python type-7 quantile replay,
    incl. NULL values (NULL result, false flags), a NULL group key, and
    the approx twin covering every row."""
    import pytest

    from omop2obo_spark.operators.curate import winsorize

    groups = {
        "a": [1.0, 2.0, 3.0, 4.0, 100.0],
        "b": [10.0, 10.0, 10.0],
    }
    rows = [(f"{g}{i}", g, v) for g, vs in groups.items() for i, v in enumerate(vs)]
    rows += [("n0", "a", None)]
    # NULL group key: its own group (null-safe join back) — 10 ones plus
    # one extreme, so the 0.9 quantile clips the outlier
    null_grp = [1.0] * 10 + [1000.0]
    rows += [(f"g{i}", None, v) for i, v in enumerate(null_grp)]
    df = spark.createDataFrame(rows, "id: string, grp: string, value: double")

    def q7(vals, p):
        vals = sorted(vals)
        h = (len(vals) - 1) * p
        lo = int(h)
        return vals[lo] + (h - lo) * (vals[min(lo + 1, len(vals) - 1)] - vals[lo])

    want = {}
    for rid, g, v in rows:
        if v is None:
            want[rid] = (None, False, False)
        else:
            vals = null_grp if g is None else groups[g]
            lo, hi = q7(vals, 0.1), q7(vals, 0.9)
            want[rid] = (min(max(v, lo), hi), v < lo, v > hi)
    got = {
        r.id: (r.value_wins, r.clipped_low, r.clipped_high)
        for r in winsorize(df, "value", ["grp"], lower=0.1, upper=0.9).collect()
    }
    for rid, exp in want.items():
        g = got[rid]
        if exp[0] is None:
            assert g[0] is None and g[1:] == exp[1:], (rid, g)
        else:
            assert abs(g[0] - exp[0]) < 1e-9 and g[1:] == (exp[1], exp[2]), (rid, g)
    # NULL group key forms its own group: the 1000.0 outlier is clipped
    # high against the NULL group's own 0.9 quantile
    assert got["g10"][2] is True and got["g10"][0] < 1000.0
    # approx twin: same row count, clip flags consistent with exact at
    # this tiny size (sketch is exact for small groups)
    approx = winsorize(df, "value", ["grp"], lower=0.1, upper=0.9, approx=True)
    assert approx.count() == len(rows)
    with pytest.raises(ValueError):
        winsorize(df, "value", lower=0.9, upper=0.1)


def test_random_projection_numpy_model_and_distance_preservation(spark):
    """JL projection vs a numpy replay of the identical sign matrix,
    plus the point of the operator: pairwise distances in the projected
    space correlate with full-dim distances on a seeded sample."""
    import numpy as np

    from omop2obo_spark.operators.ann import random_projection, rp_signs

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id: long, embedding: array<float>",
    )
    out_dim = 4
    got = {r.id: [r[f"p{j}"] for j in range(out_dim)]
           for r in random_projection(df, in_dim=16, out_dim=out_dim).collect()}
    S = np.array(rp_signs(16, out_dim), dtype="float64")      # (out, in)
    want = (vecs.astype("float64") @ S.T) / np.sqrt(out_dim)
    for i in range(40):
        assert np.allclose(got[i], np.round(want[i], 6), atol=1e-6), i
    # distance preservation — the actual JL claim: the projected/full
    # squared-distance RATIO is unbiased with relative error ~sqrt(2/d')
    # (correlation would be the wrong metric here: isotropic gaussian
    # distances concentrate, so d_full barely varies). Checked at 8
    # output dims: E[ratio]≈1, mean |ratio-1| ≲ 0.5.
    got8 = {r.id: [r[f"p{j}"] for j in range(8)]
            for r in random_projection(df, in_dim=16, out_dim=8).collect()}
    proj = np.array([got8[i] for i in range(40)])
    d_full = ((vecs[:20, None, :].astype("float64")
               - vecs[None, :20, :].astype("float64")) ** 2).sum(-1)
    d_proj = ((proj[:20, None, :] - proj[None, :20, :]) ** 2).sum(-1)
    iu = np.triu_indices(20, 1)
    ratio = d_proj[iu] / d_full[iu]
    assert 0.8 < ratio.mean() < 1.2, ratio.mean()
    assert np.abs(ratio - 1).mean() < 0.6, np.abs(ratio - 1).mean()
    import pytest

    with pytest.raises(ValueError):
        random_projection(df, in_dim=16, out_dim=0)


def test_group_quota_cap_rank_and_ties(spark):
    import pytest

    from omop2obo_spark.operators.curate import group_quota_cap

    rows = [
        ("x", 1, 30.0), ("x", 2, 30.0), ("x", 3, 10.0), ("x", 4, None),
        ("y", 5, 7.0),
        (None, 6, 1.0), (None, 7, 2.0),
    ]
    df = spark.createDataFrame(rows, "grp: string, doc_id: long, score: double")
    got = {r.doc_id: (r.grp_rank, r.kept)
           for r in group_quota_cap(df, "grp", "score", n_keep=2).collect()}
    assert got == {
        1: (1, True), 2: (2, True),   # tie broken by id
        3: (3, False), 4: (4, False),  # NULL score sorts last
        5: (1, True),
        7: (1, True), 6: (2, True),    # NULL group is its own group
    }
    asc = {r.doc_id: r.grp_rank
           for r in group_quota_cap(df, "grp", "score", 2, descending=False).collect()}
    assert asc[3] == 1 and asc[4] == 4  # NULLs still last ascending
    with pytest.raises(ValueError):
        group_quota_cap(df, "grp", "score", 0)


def test_blocklist_filter_whole_word_and_guards(spark):
    import pytest

    from omop2obo_spark.operators.curate import blocklist_filter

    rows = [
        (1, "Bad WORD here and badword joined"),   # 'word' hits once (case-
                                                    # insensitive); 'badword' is
                                                    # not a whole-word match
        (2, "word word word"),
        (3, None),
        (4, "clean text entirely"),
        (5, "a c++ token with+plus (word)"),        # punctuation boundaries
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: (r.n_blocked, r.blocked)
           for r in blocklist_filter(df, ["word", "c++"], max_hits=1).collect()}
    assert got[1] == (1, False)
    assert got[2] == (3, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    # escaped term 'c++' matches literally (boundary only on the word-char
    # side); 'word' in parens also hits; 'with+plus' must NOT hit
    assert got[5] == (2, True)
    with pytest.raises(ValueError):
        blocklist_filter(df, [])


def test_mine_hard_negatives_hand_computed(spark):
    """Triplet construction vs hand expectations: positives excluded
    from negatives, retriever order kept, best positive by (rel desc,
    item), queries without positives dropped, k_neg truncation."""
    import pytest

    from omop2obo_spark.operators.ann import mine_hard_negatives

    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4),
         (2, 20, 1), (2, 21, 2),
         (3, 30, 1)],                       # query 3 has no positives
        "query_id: long, item: long, rank: int",
    )
    qrels = spark.createDataFrame(
        [(1, 11, 3), (1, 13, 1),            # 11 is best positive (rel 3)
         (2, 99, 2)],                       # positive outside the ranking
        "query_id: long, item: long, rel: int",
    )
    got = {
        (r.query_id, r.neg_item): (r.pos_item, r.neg_rank, r.retriever_rank)
        for r in mine_hard_negatives(ranking, qrels, k_neg=2).collect()
    }
    assert got == {
        (1, 10): (11, 1, 1),   # rank-1 item was NOT relevant -> hardest negative
        (1, 12): (11, 2, 3),   # 11 and 13 are positives, skipped
        (2, 20): (99, 1, 1),
        (2, 21): (99, 2, 2),
    }
    with pytest.raises(ValueError):
        mine_hard_negatives(ranking, qrels, k_neg=0)


def test_trigram_logprob_score_python_replay(spark):
    """Trigram xent vs a pure-Python replay of the pinned model
    (top-k tables, exact context totals, 3-way interpolation), plus the
    ladder property: clause-shuffled text that keeps word pairs scores
    WORSE than the coherent original under the trigram term."""
    import math
    import re
    from collections import Counter

    from omop2obo_spark.operators.textstats import trigram_logprob_score

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: base, 1: base, 2: base,
        3: "over the quick dog jumps the brown fox lazy again",  # scrambled
        4: "xy",                                                  # 1 token
        5: None,
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id: long, text: string")
    lam3, lam2, lam1 = 0.5, 0.25, 0.25
    vk, bk, tk = 10, 20, 30

    def toks(s):
        return [x for x in re.split(r"[^a-z0-9']+", (s or "").lower()) if x]

    uni = Counter()
    big = Counter()
    tri = Counter()
    for s in texts.values():
        ts = toks(s)
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
        tri.update(zip(ts, ts[1:], ts[2:]))
    total = sum(uni.values())
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vk])
    topb = dict(sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:bk])
    topt = dict(sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:tk])
    ctx2 = Counter()
    for (p, c), n in big.items():
        ctx2[p] += n
    ctx3 = Counter()
    for (a, b, c), n in tri.items():
        ctx3[(a, b)] += n

    def xent(s):
        ts = toks(s)
        lps = []
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            pt = topt.get((a, b, c), 0) / ctx3[(a, b)] if (a, b, c) in topt else 0.0
            pb = topb.get((b, c), 0) / ctx2[b] if (b, c) in topb else 0.0
            pu = vocab[c] / total if c in vocab else 1.0 / total
            lps.append(round(math.log(lam3 * pt + lam2 * pb + lam1 * pu), 9))
        if not lps:
            return 0, 0.0
        return len(lps), round(-sum(lps) / len(lps), 6)

    got = {
        r.doc_id: (r.n_tri, r.xent3)
        for r in trigram_logprob_score(
            docs, vocab_k=vk, bigram_k=bk, trigram_k=tk, lam3=lam3, lam2=lam2
        ).collect()
    }
    for d, s in texts.items():
        assert got[d] == xent(s), d
    # the ladder property: scrambled text scores strictly worse
    assert got[3][1] > got[0][1]
    import pytest

    with pytest.raises(ValueError):
        trigram_logprob_score(docs, lam3=0.9, lam2=0.2)


def test_neyman_sample_allocation_python_model(spark):
    """Allocation n_h ∝ N_h·σ_h vs a statistics-module replay, exact
    sample sizes, determinism across partitionings, degenerate strata
    (single row, zero variance, NULL stratum, NULL values)."""
    import hashlib
    import statistics

    import pytest

    from omop2obo_spark.operators.textstats import neyman_sample

    groups = {
        "wide": [float(v) for v in range(40)],          # big N, big sd
        "tight": [50.0 + (i % 3) * 0.1 for i in range(40)],  # big N, tiny sd
        "small": [0.0, 100.0],                           # tiny N, huge sd
        "flat": [7.0] * 10,                              # sd 0 -> alloc 0
        "solo": [3.0],                                   # single row -> sd 0
    }
    rows, k = [], 0
    for g, vs in groups.items():
        for v in vs:
            rows.append((k, g, v))
            k += 1
    rows.append((k, None, 5.0)); k += 1
    rows.append((k, "wide", None)); k += 1
    df = spark.createDataFrame(rows, "doc_id: long, src: string, x: double")
    out = neyman_sample(df, "src", "x", total_n=30, key_col="doc_id").collect()

    import math as _m
    N = {g: len(vs) for g, vs in groups.items()}
    N["wide"] += 1          # the NULL-value row still counts in N
    N["__null__"] = 1
    sd = {g: (statistics.stdev(vs) if len(vs) >= 2 else 0.0) for g, vs in groups.items()}
    sd["__null__"] = 0.0
    den = sum(N[g] * sd[g] for g in N)
    want_alloc = {
        g: min(N[g], _m.floor(round(30.0 * N[g] * sd[g] / den, 6))) for g in N
    }
    got_alloc = {}
    for r in out:
        got_alloc.setdefault(r.stratum, set()).add((r.alloc_n, r.stratum_n))
    for g, a in got_alloc.items():
        assert a == {(want_alloc[g], N[g])}, g
    from collections import Counter

    sizes = Counter(r.stratum for r in out)
    for g, n in want_alloc.items():
        assert sizes.get(g, 0) == n, g       # EXACT sizes, not binomial
    assert "flat" not in sizes and "solo" not in sizes
    # selection = first alloc_n keys in md5 order (python replay, one stratum)
    wide_keys = [i for i, (kk, g, v) in enumerate(rows) if g == "wide"]
    order = sorted(
        (hashlib.md5(f"ney0|{r[0]}".encode()).hexdigest(), r[0])
        for r in rows if r[1] == "wide"
    )
    want_keys = {kk for _, kk in order[: want_alloc["wide"]]}
    assert {r.key for r in out if r.stratum == "wide"} == want_keys
    again = neyman_sample(df.repartition(11), "src", "x", 30).collect()
    assert {(r.key, r.pos) for r in again} == {(r.key, r.pos) for r in out}
    with pytest.raises(ValueError):
        neyman_sample(df, "src", "x", 0)


def test_script_profile_counts_and_dominance(spark):
    """Script counts vs unicodedata ground truth on mixed-script text;
    dominance tie-break (alphabetically last), 'und' for scriptless and
    NULL docs, digits/punct in no script."""
    from omop2obo_spark.operators.textstats import script_profile

    rows = [
        (0, "hello мир 你好 مرحبا"),         # latin 5, cyr 3, han 2, ar 5
        (1, "12345 !!! ..."),                  # scriptless -> und
        (2, None),                             # NULL -> und
        (3, "αβ ab"),                          # greek 2 latin 2 tie -> latin
        (4, "Ελληνικά"),                       # pure greek
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r for r in script_profile(df).collect()}
    assert (got[0].n_latin, got[0].n_cyrillic, got[0].n_han, got[0].n_arabic) == (5, 3, 2, 5)
    # latin/arabic tie at 5 -> alphabetically last wins -> latin
    assert got[0].dominant_script == "latin"
    assert got[1].dominant_script == "und" and got[1].script_ratio == 0.0
    assert got[2].dominant_script == "und" and got[2].n_script_chars == 0
    assert got[3].dominant_script == "latin"
    assert got[4].dominant_script == "greek" and got[4].script_ratio == 1.0


def test_lexical_richness_hand_computed(spark):
    """TTR and corpus-hapax ratio vs hand counts: hapax is CORPUS-level
    (a token unique in one doc but repeated in another is not hapax),
    empty/NULL docs pinned to zero."""
    from omop2obo_spark.operators.textstats import lexical_richness

    rows = [
        (0, "alpha beta beta gamma"),     # 4 tokens, 3 types
        (1, "alpha delta"),               # alpha repeats across docs
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.id: (r.n_tokens, r.n_types, r.ttr, r.hapax_ratio)
           for r in lexical_richness(df).collect()}
    # corpus freq: alpha 2, beta 2, gamma 1, delta 1
    assert got[0] == (4, 3, 0.75, 0.25)          # hapax in doc0: gamma (1/4)
    assert got[1] == (2, 2, 1.0, 0.5)            # hapax: delta
    assert got[2] == (0, 0, 0.0, 0.0)
    assert got[3] == (0, 0, 0.0, 0.0)


def test_zipf_fit_recovers_known_slope(spark):
    """OLS on a synthetic corpus with exact Zipf counts n(r) = C·r^−1
    must recover slope ≈ −1 (and a numpy polyfit replay agrees)."""
    import math

    import numpy as np
    import pytest

    from omop2obo_spark.operators.textstats import zipf_fit

    # tokens w1..w30 with counts round(300/r): an explicit Zipf corpus
    words = []
    for r in range(1, 31):
        words += [f"w{r:02d}"] * round(300 / r)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id: long, text: string"
    )
    out = zipf_fit(docs, top_k=30).collect()[0]
    counts = sorted([round(300 / r) for r in range(1, 31)], reverse=True)
    xs = np.log(np.arange(1, 31, dtype=float))
    ys = np.log(np.array(counts, dtype=float))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert out.k == 30
    assert out.slope == pytest.approx(round(slope, 6), abs=1e-6)
    assert out.intercept == pytest.approx(round(intercept, 6), abs=1e-6)
    assert -1.1 < out.slope < -0.9
    with pytest.raises(ValueError):
        zipf_fit(docs, top_k=1)
