"""DuckDB-SQL mirror of the TF-IDF cosine-similarity tier (W1/W2).

The similarity math is deterministic arithmetic end-to-end — smooth idf
``ln((1+N)/(1+df))+1`` fit over query ∪ ontology corpus, raw tf, l2 norms,
cosine, top-10 with 0.25 floor, per-URI max, exact 75th-percentile cut —
so it has an exact SQL oracle once scores are rounded identically on both
sides (operators/similarity.py rounds to 9 decimals before the top-k cut
precisely so engine summation-order drift cannot flip a tie).

Ontology-side inputs (corpus rows, their n-gram term frequencies and
document frequencies) are deterministic and tiny → precomputed here in
Python (same helpers the Spark driver path uses) and inlined as VALUES.
Query-side preprocessing (ascii-fold → stopword strip → lower → tokenize →
lemma) and all frequency/weight/cosine math run in portable SQL.
"""

from __future__ import annotations

from collections import Counter

from omop2obo_spark.fixtures import lexicon_data as L
from omop2obo_spark.functions.text import (
    _LEMMA_EXCEPTIONS,
    _STOPWORD_PATTERN,
    py_preprocess,
)
from omop2obo_spark.operators.similarity import ngrams


def _q(v) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def ont_corpus_rows() -> list[tuple[int, str, list[str]]]:
    """(rid, short_id, tokens) — same enumeration order as
    similarity.build_ont_corpus over fixtures.lexicon_df (insertion order
    of the lexicon rows: label, definition, synonyms per concept)."""
    rows = []
    rid = 0
    for _ont, sid, label, definition, syns, _dbxs, _anc in L.CONCEPTS:
        for s in [label.lower(), definition.lower()] + [sy.lower() for sy, _t in syns]:
            rows.append((rid, sid, py_preprocess(s)))
            rid += 1
    return rows


def lemma_case_sql(var: str) -> str:
    """SQL CASE replicating functions.text lemma (exceptions + rules)."""
    whens = " ".join(
        f"WHEN {var} = {_q(k)} THEN {_q(v)}" for k, v in sorted(_LEMMA_EXCEPTIONS.items())
    )
    return f"""CASE {whens}
        WHEN length({var}) > 4 AND {var} LIKE '%ies'
            THEN substr({var}, 1, length({var}) - 3) || 'y'
        WHEN length({var}) > 3 AND ({var} LIKE '%shes' OR {var} LIKE '%ches'
             OR {var} LIKE '%xes' OR {var} LIKE '%zes' OR {var} LIKE '%sses')
            THEN substr({var}, 1, length({var}) - 2)
        WHEN length({var}) > 3 AND {var} LIKE '%s'
             AND NOT ({var} LIKE '%ss' OR {var} LIKE '%us' OR {var} LIKE '%is')
            THEN substr({var}, 1, length({var}) - 1)
        ELSE {var} END"""


def ont_tf_df_values() -> tuple[str, str, int]:
    """(ont_tf VALUES, ont_df VALUES, corpus size) — the ontology-side
    per-row n-gram term frequencies and document frequencies, inlined as
    SQL VALUES. ONE builder shared by the standalone W1/W2 oracle below
    and the integrated kg pipeline oracle (kg_oracle._sim_tier_ctes):
    a drifted copy of this enumeration silently de-synchronizes the two
    oracles' idf bases."""
    corpus = ont_corpus_rows()
    tf_rows = []
    df_counter: Counter[str] = Counter()
    for rid, sid, toks in corpus:
        grams = ngrams(toks)
        for g, tf in Counter(grams).items():
            tf_rows.append((rid, sid, g, tf))
        for g in set(grams):
            df_counter[g] += 1
    ont_tf_v = ", ".join(
        f"({rid}, {_q(sid)}, {_q(g)}, {tf})" for rid, sid, g, tf in tf_rows
    )
    ont_df_v = ", ".join(f"({_q(g)}, {n})" for g, n in sorted(df_counter.items()))
    return ont_tf_v, ont_df_v, len(corpus)


def preprocess_toks_sql(text_expr: str) -> str:
    """The query-side preprocessing chain (ascii-fold → whitespace collapse
    → stopword strip → lower → tokenize → lemma) as one SQL expression —
    shared by both oracles; must stay in lock-step with
    functions.text.preprocess_tokens_expr."""
    return f"""list_transform(
               list_filter(
                   string_split_regex(
                       lower(regexp_replace(
                           regexp_replace(regexp_replace({text_expr}, '[^\\x00-\\x7F]', '', 'g'),
                                          '\\s+', ' ', 'g'),
                           {_q(_STOPWORD_PATTERN)}, '', 'g')),
                       '\\W+'),
                   x -> x <> ''),
               t -> {lemma_case_sql("t")})"""


def span_branches_sql(src: str, alias_prefix: str = "u") -> str:
    """1/2/3-gram span enumeration over ``src(toks)`` — the SQL twin of
    operators.similarity.ngrams, shared by both oracles."""
    return "\n    UNION ALL\n".join(
        f"""    SELECT toks, array_to_string(toks[i:i+{n - 1}], ' ') AS gram
    FROM {src}, UNNEST(range(1, greatest(len(toks) - {n} + 2, 1))) AS {alias_prefix}{n}(i)
    WHERE len(toks) >= {n}"""
        for n in range(1, 4)
    )


def tfidf_similarity_sql(max_doc_id: int = 30, top_n: int = 10,
                         floor: float = 0.25, percentile: float = 0.75) -> str:
    """Full W1/W2 oracle over the injected query set (see
    __spark_entry__.q_tfidf_similarity for the Spark twin)."""
    ont_tf_v, ont_df_v, n_ont = ont_tf_df_values()

    near = L.near_miss_labels()
    near_arr = "[" + ", ".join(_q(x) for x in near) + "]"
    n_near = len(near)

    span_branches = span_branches_sql("ddocs")

    return f"""
WITH qraw AS (
    SELECT doc_id::VARCHAR AS mention_id,
           CASE WHEN doc_id % 3 = 0
                THEN array_to_string((string_split_regex(text, '\\s+'))[1:8], ' ')
                ELSE 'patient note ' || ({near_arr})[(doc_id % {n_near}) + 1]
           END AS text
    FROM documents WHERE doc_id < {max_doc_id}
),
qtok AS (
    SELECT mention_id,
           {preprocess_toks_sql("text")} AS toks
    FROM qraw
),
qtok2 AS (SELECT * FROM qtok WHERE len(toks) > 0),
ddocs AS (SELECT DISTINCT toks FROM qtok2),
nq AS (SELECT count(*) AS n FROM ddocs),
dspans AS (
{span_branches}
),
dgrams AS (SELECT toks, gram, count(*) AS tf FROM dspans GROUP BY toks, gram),
qdf AS (
    SELECT gram, count(*) AS dfq
    FROM (SELECT DISTINCT toks, gram FROM dgrams) GROUP BY gram
),
ont_tf AS (SELECT * FROM (VALUES {ont_tf_v}) AS t(rid, sid, gram, tf)),
ont_df AS (SELECT * FROM (VALUES {ont_df_v}) AS t(gram, dfo)),
alldf AS (
    SELECT coalesce(q.gram, o.gram) AS gram,
           coalesce(q.dfq, 0) + coalesce(o.dfo, 0) AS df
    FROM qdf q FULL OUTER JOIN ont_df o ON q.gram = o.gram
),
idf AS (
    SELECT gram, ln((1.0 + nq.n + {n_ont}) / (1.0 + df)) + 1.0 AS idf
    FROM alldf, nq
),
ovec AS (
    SELECT o.rid, o.sid, o.gram, o.tf * idf.idf AS w
    FROM ont_tf o JOIN idf USING (gram)
),
onorm AS (SELECT rid, sqrt(sum(w * w)) AS nrm FROM ovec GROUP BY rid),
qvec AS (
    SELECT q.mention_id, g.gram, g.tf * idf.idf AS w
    FROM qtok2 q JOIN dgrams g USING (toks) JOIN idf USING (gram)
),
qn AS (SELECT mention_id, sqrt(sum(w * w)) AS nrm FROM qvec GROUP BY mention_id),
dots AS (
    SELECT q.mention_id, o.rid, o.sid, sum(q.w * o.w) AS dp
    FROM qvec q JOIN ovec o USING (gram)
    GROUP BY q.mention_id, o.rid, o.sid
),
scored AS (
    SELECT d.mention_id, d.rid, d.sid,
           round(d.dp / (qn.nrm * onorm.nrm), 9) AS score
    FROM dots d JOIN qn USING (mention_id) JOIN onorm USING (rid)
),
topk AS (
    SELECT mention_id, sid, score FROM (
        SELECT *, row_number() OVER (PARTITION BY mention_id
                       ORDER BY score DESC, rid ASC) AS rk
        FROM scored
    ) WHERE rk <= {top_n} AND score >= {floor}
),
per_uri AS (
    SELECT mention_id, sid AS sim_uri, max(score) AS score
    FROM topk GROUP BY mention_id, sid
),
pct AS (
    SELECT mention_id, quantile_cont(score, {percentile}) AS p
    FROM per_uri GROUP BY mention_id
),
kept AS (
    SELECT u.mention_id, u.sim_uri, round(u.score, 3) AS score
    FROM per_uri u JOIN pct USING (mention_id)
    WHERE u.score >= pct.p
)
SELECT mention_id, sim_uri, score,
       row_number() OVER (PARTITION BY mention_id
                          ORDER BY score DESC, sim_uri ASC) AS rank
FROM kept
"""
