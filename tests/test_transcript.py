"""Conversation-structure stats (operators/transcript.py)."""

from __future__ import annotations

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
