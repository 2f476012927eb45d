"""Conversation-level assembly (operators/transcripts.py): chat-template
rendering, SFT pair extraction, role-sequence validation, conversation
stats. The DuckDB oracles cover engine parity on the synthetic corpus;
these tests pin exact rendered text, window content, and flag semantics on
a hand-built fixture (including a tool turn and an out-of-order input)."""

from __future__ import annotations

from datetime import datetime, timezone

from rdfcmap_spark.operators import transcripts

_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _turns(spark):
    rows = [
        # conv A: valid agent trace, deliberately out of turn order
        ("A", 2, "tool", "searched the docs", "search", _TS.replace(minute=2)),
        ("A", 0, "user", "find the spec", "", _TS),
        ("A", 1, "assistant", "let me search", "", _TS.replace(minute=1)),
        ("A", 3, "assistant", "here it is", "", _TS.replace(minute=3)),
        # conv B: starts with assistant, tool directly after user, double user
        ("B", 0, "assistant", "hello", "", _TS),
        ("B", 1, "user", "hi", "", _TS.replace(minute=1)),
        ("B", 2, "tool", "rogue call", "search", _TS.replace(minute=2)),
        ("B", 3, "user", "first", "", _TS.replace(minute=3)),
        ("B", 4, "user", "second", "", _TS.replace(minute=4)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(5)


def test_chat_render_exact(spark):
    out = {r["conv_id"]: r for r in transcripts.chat_render(_turns(spark)).collect()}
    assert out["A"]["n_turns"] == 4
    assert out["A"]["text"] == (
        "<|user|>find the spec\n"
        "<|assistant|>let me search\n"
        "<|tool:search|>searched the docs\n"
        "<|assistant|>here it is"
    )
    assert out["B"]["text"].startswith("<|assistant|>hello\n<|user|>hi\n<|tool:search|>rogue call")


def test_sft_pairs_window_and_k(spark):
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in transcripts.sft_pairs(_turns(spark), k=2).collect()
    }
    # assistant turns at idx>=1: A1, A3; B has none past idx 0
    assert set(out) == {("A", 1), ("A", 3)}
    assert out[("A", 1)]["prompt"] == "<|user|>find the spec"
    assert out[("A", 1)]["completion"] == "let me search"
    # k=2 window: turns 1 and 2 only, not turn 0
    assert out[("A", 3)]["prompt"] == (
        "<|assistant|>let me search\n<|tool:search|>searched the docs"
    )


def test_role_check_flags(spark):
    out = {r["conv_id"]: r for r in transcripts.role_check(_turns(spark)).collect()}
    a, b = out["A"], out["B"]
    assert a["role_seq"] == "uata"
    assert (a["starts_with_user"], a["tool_ok"], a["no_consecutive_user"], a["valid"]) == (1, 1, 1, 1)
    assert b["role_seq"] == "autuu"
    assert (b["starts_with_user"], b["tool_ok"], b["no_consecutive_user"], b["valid"]) == (0, 0, 0, 0)


def test_conv_stats(spark):
    out = {r["conv_id"]: r for r in transcripts.conv_stats(_turns(spark)).collect()}
    a = out["A"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool_calls"]) == (4, 1, 2, 1)
    assert a["total_chars"] == sum(map(len, ["find the spec", "let me search", "searched the docs", "here it is"]))
    assert a["duration_secs"] == 180
    assert out["B"]["duration_secs"] == 240


def test_tool_transitions(spark):
    rows = [
        # conv C: search -> fetch -> search; conv D: fetch only
        ("C", 0, "user", "q", "", _TS),
        ("C", 1, "tool", "r1", "search", _TS),
        ("C", 3, "tool", "r2", "fetch", _TS),  # gap in turn_idx is fine
        ("C", 5, "tool", "r3", "search", _TS),
        ("C", 6, "assistant", "a", "", _TS),
        ("D", 0, "tool", "r", "fetch", _TS),
        ("D", 1, "tool", "", None, _TS),  # null tool name: not a call
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    out = {
        (r["prev_tool"], r["tool"]): r["n_transitions"]
        for r in transcripts.tool_transitions(df).collect()
    }
    assert out == {
        ("<start>", "search"): 1,
        ("search", "fetch"): 1,
        ("fetch", "search"): 1,
        ("<start>", "fetch"): 1,
    }


def test_truncate_to_budget_suffix(spark):
    # per-turn cost = words + 1 (role tag); conv A tail-first:
    # t3 "here it is" = 4, t2 "searched the docs" = 4, t1 = 4, t0 = 4
    out = transcripts.truncate_to_budget(_turns(spark), budget=8).collect()
    kept = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # A: t3 (4) + t2 (4) = 8 <= 8; adding t1 would be 12 -> exactly the
    # maximal suffix {3, 2}
    assert {k for k in kept if k[0] == "A"} == {("A", 3), ("A", 2)}
    assert kept[("A", 3)]["n_tokens"] == 4 and kept[("A", 3)]["cum_tokens"] == 4
    assert kept[("A", 2)]["cum_tokens"] == 8
    # budget smaller than the last turn alone -> conversation contributes 0
    none = transcripts.truncate_to_budget(_turns(spark), budget=2).collect()
    assert [r for r in none if r["conv_id"] == "A"] == []


def test_conv_dup_groups_string_ids(spark):
    base = " ".join(f"w{i:02d}" for i in range(40))
    other = " ".join(f"x{i:02d}" for i in range(12))
    rows = []
    for conv, turn0, turn1 in [
        ("c1", base, base),
        ("c2", base, base),  # byte-identical rendered conversation
        ("c3", base, base + " extra"),  # one appended token: Jaccard ~0.99
        ("c4", other, "completely different content about unrelated things"),
    ]:
        rows += [
            (conv, 0, "user", turn0, "", _TS),
            (conv, 1, "assistant", turn1, "", _TS.replace(minute=1)),
        ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    out = {r["doc_id"]: r["canonical_id"] for r in transcripts.conv_dup_groups(df).collect()}
    assert out["c1"] == "c1" and out["c2"] == "c1"  # exact collapse, lexicographic min
    assert out["c3"] == "c1"  # near-dup joins the component
    assert out["c4"] == "c4"  # singleton maps to itself


def test_conv_quality_gate(spark):
    out = {r["conv_id"]: r for r in transcripts.conv_quality(_turns(spark)).collect()}
    a, b = out["A"], out["B"]
    # A: valid roles, 4 turns, 53 chars, no empties -> keep
    assert (a["role_valid"], a["turns_ok"], a["chars_ok"], a["empty_ok"], a["keep"]) == (1, 1, 1, 1, 1)
    # B: invalid role sequence kills it despite ok sizes
    assert (b["role_valid"], b["keep"]) == (0, 0)
    # bounds exercise: a 1-turn conversation with empty text fails turns/chars/empty
    extra = spark.createDataFrame(
        [("E", 0, "user", "", "", _TS)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    e = transcripts.conv_quality(extra).collect()[0]
    assert (e["turns_ok"], e["chars_ok"], e["empty_ok"], e["keep"]) == (0, 0, 0, 0)
    assert e["n_empty"] == 1


def test_partition_invariance(spark):
    t = _turns(spark)
    one = transcripts.chat_render(t.coalesce(1)).collect()
    many = transcripts.chat_render(t.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_entity_pmi_hand_computed(spark):
    """3 conversations, 4 entities; pair counts and PMI checked by hand."""
    import math

    from rdfcmap_spark.operators.transcripts import entity_pmi

    rows = [
        ("A", 0, "user", "«alpha» relates to «beta».", "", _TS),
        ("B", 0, "user", "«alpha» relates to «beta». «alpha» relates to «gamma».", "", _TS),
        ("C", 0, "user", "«gamma» relates to «delta».", "", _TS),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    got = {(r["ent_a"], r["ent_b"]): r for r in entity_pmi(turns).collect()}
    assert set(got) == {
        ("alpha", "beta"),
        ("alpha", "gamma"),
        ("beta", "gamma"),
        ("delta", "gamma"),
    }
    ab = got[("alpha", "beta")]
    assert (ab["n_pair"], ab["n_a"], ab["n_b"]) == (2, 2, 2)
    assert ab["pmi"] == round(math.log(2 * 3 / (2 * 2)), 6)
    ag = got[("alpha", "gamma")]
    assert (ag["n_pair"], ag["pmi"]) == (1, round(math.log(3 / 4), 6))
    dg = got[("delta", "gamma")]
    assert (dg["n_pair"], dg["n_a"], dg["n_b"]) == (1, 1, 2)
    assert dg["pmi"] == round(math.log(3 / 2), 6)


def test_entity_timeline_hand_computed(spark):
    from datetime import datetime

    rows = [
        ("A", 0, "user", "«alpha» relates to «beta».", "", _TS),
        ("A", 1, "user", "«alpha» relates to «gamma».", "", _TS.replace(minute=5)),
        ("B", 0, "user", "«beta» relates to «gamma».", "", _TS.replace(hour=1)),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    out = {r["ent"]: r for r in transcripts.entity_timeline(turns).collect()}
    assert set(out) == {"alpha", "beta", "gamma"}
    a = out["alpha"]
    assert (a["n_mentions"], a["n_convs"], a["n_turns"]) == (2, 1, 2)
    assert a["first_ts"].replace(tzinfo=None) == datetime(2026, 1, 1, 0, 0)
    assert a["last_ts"].replace(tzinfo=None) == datetime(2026, 1, 1, 0, 5)
    b = out["beta"]
    assert (b["n_mentions"], b["n_convs"], b["n_turns"]) == (2, 2, 2)
    assert b["last_ts"].replace(tzinfo=None) == datetime(2026, 1, 1, 1, 0)
    g = out["gamma"]
    assert g["first_ts"].replace(tzinfo=None) == datetime(2026, 1, 1, 0, 5)


def test_pronoun_antecedents_recency(spark):
    rows = [
        # turn 0 mentions alpha (subj) then beta (obj) — beta is most recent
        ("A", 0, "user", "«alpha» relates to «beta».", "", _TS),
        # two pronouns, no mentions of its own -> binds to beta
        ("A", 1, "assistant", "ok note that it works.", "", _TS.replace(minute=1)),
        # pronoun + fresh mentions; antecedent still from EARLIER turns (beta)
        ("A", 2, "user", "«gamma» relates to «delta». and this too.", "", _TS.replace(minute=2)),
        # binds to delta (turn 2's object, most recent prior mention)
        ("A", 3, "user", "they said so.", "", _TS.replace(minute=3)),
        # pronoun at turn 0 of its conversation: unresolved (NULL antecedent)
        ("B", 0, "user", "this is odd.", "", _TS),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(4)
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in transcripts.pronoun_antecedents(turns).collect()
    }
    assert set(out) == {("A", 1), ("A", 2), ("A", 3), ("B", 0)}
    assert (out[("A", 1)]["n_pronouns"], out[("A", 1)]["antecedent"]) == (2, "beta")
    assert (out[("A", 2)]["n_pronouns"], out[("A", 2)]["antecedent"]) == (1, "beta")
    assert (out[("A", 3)]["n_pronouns"], out[("A", 3)]["antecedent"]) == (1, "delta")
    assert out[("B", 0)]["antecedent"] is None


def test_turn_latency_hand_computed(spark):
    out = {r["conv_id"]: r for r in transcripts.turn_latency(_turns(spark)).collect()}
    # conv A (sorted by turn_idx): gaps of 60s between each of 4 turns -> 3 gaps
    a = out["A"]
    assert a["n_gaps"] == 3 and a["sum_gap_us"] == 3 * 60_000_000
    assert a["max_gap_us"] == 60_000_000
    # assistant turns at idx 1 and 3 -> two assistant gaps of 60s each
    assert a["n_assistant_gaps"] == 2 and a["sum_assistant_gap_us"] == 2 * 60_000_000
    assert a["mean_gap_secs"] == 60.0
    # conv B: 5 turns, 4 gaps of 60s; only the idx-0 assistant turn has NO gap
    b = out["B"]
    assert b["n_gaps"] == 4 and b["n_assistant_gaps"] == 0
    assert b["sum_assistant_gap_us"] == 0


def test_dialog_acts_ladder(spark):
    rows = [
        ("C", 0, "user", "What is the boiling point?", "", _TS),
        ("C", 1, "assistant", "It is 100 C", "", _TS),
        ("C", 2, "user", "show me the table", "", _TS),
        ("C", 3, "assistant", "```python\nprint(1)\n```", "", _TS),
        ("C", 4, "user", "could you elaborate", "", _TS),   # interrogative lead, no '?'
        ("C", 5, "user", "CREATE the index now", "", _TS),  # case-insensitive imperative
        ("C", 6, "user", "what``` about this", "", _TS),    # any fence marker -> code
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["turn_idx"]: r["act"] for r in transcripts.dialog_acts(df).collect()}
    assert got == {
        0: "question", 1: "statement", 2: "command", 3: "code",
        4: "question", 5: "command", 6: "code",
    }
