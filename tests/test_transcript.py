"""Conversation-structure stats (operators/transcript.py)."""

from __future__ import annotations

import pytest

from omop2obo_spark.operators.transcript import conversation_stats


def test_conversation_stats_signals(spark):
    rows = [
        # c1: textbook well-formed user/assistant alternation
        ("c1", 0, "user", "hi", None),
        ("c1", 1, "assistant", "hello!", None),
        ("c1", 2, "user", "bye", None),
        # c2: same-role run + a turn-idx gap + tool turns
        ("c2", 0, "user", "q", None),
        ("c2", 1, "assistant", "a", "search"),
        ("c2", 2, "assistant", "b", "search"),
        ("c2", 4, "user", "c", None),
        # c3: starts with assistant at idx 1 (no turn 0)
        ("c3", 1, "assistant", "unprompted", None),
        # c4: single user turn — trivially well-formed
        ("c4", 0, "user", "solo", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {r.conv_id: r.asDict() for r in conversation_stats(df).collect()}

    c1 = got["c1"]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"], c1["n_tool_role"]) == (3, 2, 1, 0)
    assert (c1["first_role"], c1["last_role"]) == ("user", "user")
    assert (c1["alternation_violations"], c1["gap_violations"]) == (0, 0)
    assert c1["tool_call_frac"] == 0.0 and c1["well_formed"] is True

    c2 = got["c2"]
    assert c2["alternation_violations"] == 1          # assistant, assistant
    assert c2["gap_violations"] == 1                  # 2 -> 4
    assert c2["tool_call_frac"] == 0.5                # 2 of 4 turns
    assert c2["well_formed"] is False

    c3 = got["c3"]
    assert c3["first_role"] == "assistant" and c3["well_formed"] is False
    assert c3["gap_violations"] == 0                  # single turn, no pairs

    c4 = got["c4"]
    assert c4["well_formed"] is True and c4["n_turns"] == 1
    assert c4["avg_turn_chars"] == 4.0


def test_conversation_stats_partitioning_independent(spark):
    rows = [(f"c{i % 5}", j, ["user", "assistant"][j % 2], "t" * (j + 1), None)
            for i in range(5) for j in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    a = sorted(map(tuple, conversation_stats(df).collect()))
    b = sorted(map(tuple, conversation_stats(df.repartition(7)).collect()))
    assert a == b


def test_sft_spans_offsets_reconstruct_text(spark):
    """sft_spans: [start_off, end_off) slices of the sep-joined rendering
    must reproduce every turn's text exactly; null text renders as '';
    trainable marks exactly the trainable_roles turns."""
    from omop2obo_spark.operators.transcript import sft_spans

    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi! how can I help?"),
        ("c1", 2, "user", ""),                 # empty turn
        ("c1", 3, "assistant", "still here"),
        ("c2", 0, "user", None),               # null text
        ("c2", 1, "assistant", "answer"),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r.conv_id, r.turn_idx): r for r in sft_spans(tr).collect()}

    rendered = {}
    for conv in ("c1", "c2"):
        texts = [t[3] if t[3] is not None else "" for t in rows if t[0] == conv]
        rendered[conv] = "\n".join(texts)
    for conv_id, idx, role, text in rows:
        r = out[(conv_id, idx)]
        assert rendered[conv_id][r.start_off:r.end_off] == (text or "")
        assert r.trainable == (role == "assistant")
    # spans are contiguous: next start = prev end + len(sep)
    assert out[("c1", 1)].start_off == out[("c1", 0)].end_off + 1
    assert out[("c1", 2)].start_off == out[("c1", 1)].end_off + 1


def test_chunk_turns_null_text_renders_empty(spark):
    """NULL turn text renders as '' with its separator preserved (the
    sft_spans contract) — array_join would otherwise silently drop the
    element and desynchronize chunk text from span offsets."""
    from omop2obo_spark.operators.chunk import chunk_turns

    tr = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, None), ("c1", 2, "b")],
        "conv_id string, turn_idx int, text string",
    )
    rows = {r.chunk_idx: r for r in chunk_turns(tr, window=3, stride=2).collect()}
    assert rows[0].text == "a\n\nb"
    assert rows[0].n_turns == 3


def test_preference_pairs_construction(spark):
    """DPO pair mining: same-prompt responses pair best-vs-worst by score,
    margin is strict, ties break on (conv, turn), single-response and
    all-equal groups emit nothing, NULL scores/prompts excluded."""
    from pyspark.sql import functions as F

    from omop2obo_spark.operators.transcript import preference_pairs

    rows = [
        # prompt P1 asked in three conversations, replies of length 2/6/10
        ("c1", 0, "user", "P1", None), ("c1", 1, "assistant", "xx", None),
        ("c2", 0, "user", "P1", None), ("c2", 1, "assistant", "yyyyyy", None),
        ("c3", 0, "user", "P1", None), ("c3", 1, "assistant", "z" * 10, None),
        # prompt P2: two equal-length replies -> no preference, no pair
        ("c4", 0, "user", "P2", None), ("c4", 1, "assistant", "aa", None),
        ("c5", 0, "user", "P2", None), ("c5", 1, "assistant", "bb", None),
        # prompt P3: single response -> no pair
        ("c6", 0, "user", "P3", None), ("c6", 1, "assistant", "only", None),
        # NULL prompt and a response with NULL text (NULL score) -> excluded
        ("c7", 0, "user", None, None), ("c7", 1, "assistant", "ghost", None),
        ("c8", 0, "user", "P1", None), ("c8", 1, "assistant", None, None),
        # tool turn after prompt: not a response role, ignored
        ("c9", 0, "user", "P1", None), ("c9", 1, "tool", "t" * 99, None),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = preference_pairs(tr, F.length("text")).collect()
    assert len(got) == 1
    p = got[0]
    assert p.prompt == "P1" and p.n_responses == 3
    assert (p.chosen_conv, p.chosen, p.chosen_score) == ("c3", "z" * 10, 10.0)
    assert (p.rejected_conv, p.rejected, p.rejected_score) == ("c1", "xx", 2.0)

    # margin strictly greater: 8.0 margin excludes the 10-vs-2 pair
    assert preference_pairs(tr, F.length("text"), margin=8.0).count() == 0
    assert preference_pairs(tr, F.length("text"), margin=7.9).count() == 1

    # score ties break deterministically on (conv, turn): P2 with margin<0
    # would pair, chosen = greater conv id — pin via margin=-1
    tie = preference_pairs(tr, F.length("text"), margin=-1.0).collect()
    p2 = [r for r in tie if r.prompt == "P2"][0]
    assert (p2.chosen_conv, p2.rejected_conv) == ("c5", "c4")

    # partitioning independence
    got_p = preference_pairs(tr.repartition(7), F.length("text")).collect()
    assert sorted(map(tuple, got_p)) == sorted(map(tuple, got))


# ---------------------------------------------------------------------------
# context_spans
# ---------------------------------------------------------------------------


def _brute_context(turn_tokens: list[int], budget: int) -> list[tuple[int, int]]:
    """(n_ctx_turns, ctx_tokens) per turn by direct scan."""
    out = []
    for i in range(len(turn_tokens)):
        total, n = 0, 0
        for j in range(i - 1, -1, -1):
            if total + turn_tokens[j] > budget:
                break
            total += turn_tokens[j]
            n += 1
        out.append((n, total))
    return out


def test_context_spans_matches_bruteforce(spark):
    from omop2obo_spark.operators.transcript import context_spans

    texts = [
        "one two three",              # 3 tokens
        "a b c d e f g h",            # 8
        "",                           # 0 — free rider
        "x " * 5,                     # 5
        None,                         # 0 — NULL text
        "w1 w2 w3 w4 w5 w6 w7",       # 7
        "solo",                       # 1
    ]
    rows = [("c1", i, t) for i, t in enumerate(texts)] + [
        ("c2", 0, "only turn in this conversation"),
        ("c2", 1, "q r s"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    for budget in (0, 3, 8, 11, 100):
        got = {
            (r["conv_id"], r["turn_idx"]): (r["n_ctx_turns"], r["ctx_tokens"])
            for r in context_spans(df, budget=budget).collect()
        }
        toks1 = [len([w for w in (t or "").split() if w]) for t in texts]
        want = {("c1", i): v for i, v in enumerate(_brute_context(toks1, budget))}
        want[("c2", 0)] = (0, 0)
        want[("c2", 1)] = _brute_context([5, 3], budget)[1]
        assert got == want, (budget, got, want)


def test_context_spans_half_open_span_and_budget_bound(spark):
    from omop2obo_spark.operators.transcript import context_spans

    rows = [("c", i, "t " * (i + 1)) for i in range(10)]  # turn i has i+1 tokens
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = context_spans(df, budget=7).collect()
    for r in out:
        assert r["ctx_tokens"] <= 7
        assert r["first_ctx_turn_idx"] == r["turn_idx"] - r["n_ctx_turns"]
        # maximality: one more preceding turn would blow the budget
        if r["n_ctx_turns"] < r["turn_idx"]:
            prev_tokens = r["first_ctx_turn_idx"]  # turn j has j+1 tokens
            assert r["ctx_tokens"] + prev_tokens > 7


def test_context_spans_single_shuffle_no_join(spark):
    from omop2obo_spark.operators.transcript import context_spans

    df = spark.createDataFrame(
        [("c", 0, "a b"), ("c", 1, "c")], "conv_id string, turn_idx int, text string"
    )
    plan = context_spans(df, budget=4)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# topic_segments
# ---------------------------------------------------------------------------


def test_topic_segments_matches_python_model(spark):
    import re

    from omop2obo_spark.operators.transcript import topic_segments

    texts = [
        "book a flight to paris tomorrow morning",
        "paris flight tomorrow yes book it",          # same topic
        "what is the capital of mongolia",             # shift
        "mongolia capital is ulaanbaatar",             # same topic
        "",                                            # empty -> jacc 0 vs prev
        "",                                            # empty vs empty -> 1.0
        "completely different subject now entirely",   # shift
    ]
    rows = [("c1", i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r["turn_idx"]: (r["jacc_prev"], r["is_boundary"], r["segment_id"])
        for r in topic_segments(df, threshold=0.15).collect()
    }

    def tset(t):
        return {x for x in re.split(r"[^a-z0-9']+", t.lower()) if x}

    seg = -1
    for i, t in enumerate(texts):
        if i == 0:
            j = None
        else:
            a, b = tset(t), tset(texts[i - 1])
            j = 1.0 if not (a | b) else round(len(a & b) / len(a | b), 6)
        boundary = j is None or j < 0.15
        if boundary:
            seg += 1
        gj, gb, gs = got[i]
        assert gb == boundary and gs == seg, (i, got[i], (j, boundary, seg))
        assert (gj is None) == (j is None)
        if j is not None:
            assert gj == pytest.approx(j, abs=1e-6)
    # sanity: the intended shape actually happened
    assert got[0][1] and got[2][1] and got[6][1]
    assert not got[1][1] and not got[3][1] and not got[5][1]


def test_topic_segments_one_shuffle_no_join(spark):
    from omop2obo_spark.operators.transcript import topic_segments

    df = spark.createDataFrame(
        [("c", 0, "a b"), ("c", 1, "a b")], "conv_id string, turn_idx int, text string"
    )
    plan = topic_segments(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # one hash exchange (+AQE read)


# ---------------------------------------------------------------------------
# resolve_pronouns
# ---------------------------------------------------------------------------


def test_resolve_pronouns_recency_and_gap(spark):
    from omop2obo_spark.operators.transcript import resolve_pronouns

    transcripts = spark.createDataFrame(
        [
            ("c1", 0, "patient has headache today"),
            ("c1", 1, "tell me more about it"),        # -> headache (turn 0)
            ("c1", 2, "also noted severe anemia"),
            ("c1", 3, "is that treatable"),            # -> anemia (turn 2)
            ("c1", 4, "ok"),
            ("c1", 5, "ok"),
            ("c1", 6, "and what about it now"),        # gap 4 > max_gap 3: dropped
            ("c2", 0, "does it hurt"),                 # no prior mention: dropped
            ("c2", 1, "there is fatigue and headache"),
            ("c2", 2, "this seems chronic"),           # -> headache (last by pos)
        ],
        "conv_id string, turn_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [
            ("c1", 0, 2, "headache"),
            ("c1", 2, 3, "anemia"),
            ("c2", 1, 2, "fatigue"),
            ("c2", 1, 4, "headache"),
        ],
        "conv_id string, turn_idx int, pos int, surface string",
    )
    out = {
        (r.conv_id, r.turn_idx): (r.pronoun, r.antecedent_turn, r.antecedent)
        for r in resolve_pronouns(transcripts, mentions, max_gap=3).collect()
    }
    assert out == {
        ("c1", 1): ("it", 0, "headache"),
        ("c1", 3): ("that", 2, "anemia"),
        ("c2", 2): ("this", 1, "headache"),
    }


def test_resolve_pronouns_single_exchange_plan(spark):
    """Anchor aggregate + backward window reuse one conv_id exchange."""
    from omop2obo_spark.operators.transcript import resolve_pronouns

    transcripts = spark.createDataFrame(
        [("c1", 0, "a headache"), ("c1", 1, "it hurts")],
        "conv_id string, turn_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [("c1", 0, 1, "headache")], "conv_id string, turn_idx int, pos int, surface string"
    )
    plan = resolve_pronouns(transcripts, mentions)._jdf.queryExecution().executedPlan().toString()
    # no python UDF, no cartesian anywhere in the plan
    assert "BatchEvalPython" not in plan and "Cartesian" not in plan


def test_normalize_turn_order_dedup_reindex_flags(spark):
    """Winner = earliest ts then smallest text; survivors re-index
    contiguously; was_dup marks collided keys, was_gap audits original
    holes (incl. a conversation not starting at 0)."""
    import pyspark.sql.functions as F

    from omop2obo_spark.operators.transcript import normalize_turn_order

    rows = [
        # conv a: turn 0 duplicated (retry at later ts), hole at 2
        ("a", 0, "user", "orig", None, "2026-01-01 00:00:00"),
        ("a", 0, "user", "retry orig", None, "2026-01-01 00:00:10"),
        ("a", 1, "assistant", "r", None, "2026-01-01 00:00:01"),
        ("a", 3, "user", "after-hole", None, "2026-01-01 00:00:03"),
        # conv b: starts at 2; same-ts duplicate resolved by text order
        ("b", 2, "user", "bbb", None, "2026-01-01 00:01:00"),
        ("b", 2, "user", "aaa", None, "2026-01-01 00:01:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.conv_id, r.turn_idx): r.asDict() for r in normalize_turn_order(df).collect()}
    assert len(out) == 4
    a0 = out[("a", 0)]
    assert a0["text"] == "orig" and a0["was_dup"] is True and a0["was_gap"] is False
    assert a0["new_turn_idx"] == 0
    a1 = out[("a", 1)]
    assert a1["was_dup"] is False and a1["was_gap"] is False and a1["new_turn_idx"] == 1
    a3 = out[("a", 3)]
    assert a3["was_gap"] is True and a3["new_turn_idx"] == 2
    b2 = out[("b", 2)]
    assert b2["text"] == "aaa"  # ts tie -> smallest text wins
    assert b2["was_dup"] is True and b2["was_gap"] is True and b2["new_turn_idx"] == 0


def test_normalize_turn_order_partitioning_independent(spark):
    """The min-struct winner and re-index are identical at 1 and 13
    input partitions."""
    import pyspark.sql.functions as F

    from omop2obo_spark.operators.transcript import normalize_turn_order

    rows = [
        ("c%d" % (i % 5), i % 7, "user", "t%d" % (i % 3), None,
         "2026-01-01 00:%02d:%02d" % (i % 60, (i * 7) % 60))
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    one = sorted(map(tuple, normalize_turn_order(df.coalesce(1)).collect()))
    many = sorted(map(tuple, normalize_turn_order(df.repartition(13)).collect()))
    assert one == many
