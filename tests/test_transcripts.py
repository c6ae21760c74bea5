"""Conversation reassembly + windowing: stable ordering, window
coverage/overlap math, short-conversation and no-role edge cases."""

from __future__ import annotations

from binlogsub_spark.functions.transcripts import (
    assemble_transcripts,
    conversation_windows,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string"
    )


def test_assemble_stable_order_and_stats(spark):
    df = _turns(
        spark,
        [
            ("c1", 3, "assistant", "three"),
            ("c1", 1, "user", "one"),
            ("c1", 2, "assistant", "two"),
            ("c2", 7, "user", "only"),
        ],
    )
    rows = {r["conv_id"]: r for r in assemble_transcripts(df).collect()}
    assert rows["c1"]["transcript"] == "user: one\nassistant: two\nassistant: three"
    assert rows["c1"]["n_turns"] == 3 and rows["c1"]["last_turn_idx"] == 3
    assert rows["c1"]["n_chars"] == len("one") + len("two") + len("three")
    assert rows["c2"]["transcript"] == "user: only" and rows["c2"]["last_turn_idx"] == 7


def test_assemble_without_role_column(spark):
    df = spark.createDataFrame(
        [("c", 2, "b"), ("c", 1, "a")], "conv_id string, turn_idx long, text string"
    )
    r = assemble_transcripts(df).collect()[0]
    assert r["transcript"] == "a\nb"  # bare text lines, no 'None: ' prefix


def test_windows_coverage_overlap_and_tail(spark):
    # 10 turns, window 4, overlap 1 -> starts 1,4,7,10; start 10 adds no
    # new turn (window [7-10] already ends at 10) and must be dropped
    rows = [("c", i, "u", f"t{i}") for i in range(1, 11)]
    out = conversation_windows(
        _turns(spark, rows), window_turns=4, overlap=1
    ).collect()
    got = sorted(
        (r["window_idx"], r["start_turn_idx"], r["end_turn_idx"], r["n_turns"])
        for r in out
    )
    assert got == [(0, 1, 4, 4), (1, 4, 7, 4), (2, 7, 10, 4)]
    # every turn covered, consecutive windows share exactly `overlap`
    covered = set()
    for _, s, e, _n in got:
        covered |= set(range(s, e + 1))
    assert covered == set(range(1, 11))
    # rendered window text is the slice in order
    w0 = next(r for r in out if r["window_idx"] == 0)
    assert w0["text"] == "u: t1\nu: t2\nu: t3\nu: t4"


def test_windows_short_conversation_single_window(spark):
    rows = [("c", 1, "u", "a"), ("c", 2, "u", "b")]
    out = conversation_windows(
        _turns(spark, rows), window_turns=8, overlap=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["window_idx"], r["start_turn_idx"], r["end_turn_idx"], r["n_turns"]) == (
        0, 1, 2, 2,
    )


def test_windows_exact_multiple_no_overlap(spark):
    rows = [("c", i, "u", str(i)) for i in range(1, 13)]
    out = conversation_windows(
        _turns(spark, rows), window_turns=4, overlap=0
    ).collect()
    got = sorted((r["start_turn_idx"], r["end_turn_idx"]) for r in out)
    assert got == [(1, 4), (5, 8), (9, 12)]
    import pytest

    with pytest.raises(ValueError):
        conversation_windows(_turns(spark, rows), window_turns=4, overlap=4)


def test_windows_no_shuffle_after_agg(spark):
    """The explode+slice runs on the aggregation output in place: exactly
    one exchange (the groupBy) in the plan, no join."""
    rows = [("c%d" % c, i, "u", "x") for c in range(5) for i in range(1, 9)]
    out = conversation_windows(_turns(spark, rows), window_turns=4, overlap=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # groupBy partial/final pair at most


def test_loss_spans_index_into_rendered_transcript(spark):
    """Every turn's (span_start, span_end) slices exactly its text out of
    the assembled transcript; assistant turns are unmasked."""
    from binlogsub_spark.functions.transcripts import (
        assemble_transcripts,
        loss_spans,
    )

    rows = [
        ("c1", 1, "user", "hello there"),
        ("c1", 2, "assistant", "hi! how can I help?"),
        ("c1", 3, "tool", "{\"result\": 42}"),
        ("c1", 4, "assistant", "the answer is 42"),
        ("c2", 1, "user", "solo"),
    ]
    df = _turns(spark, rows)
    rendered = {
        r["conv_id"]: r["transcript"]
        for r in assemble_transcripts(df).collect()
    }
    for r in loss_spans(df).collect():
        text = dict(((c, t), x) for c, t, _ro, x in rows)[(r["conv_id"], r["turn_idx"])]
        assert rendered[r["conv_id"]][r["span_start"]:r["span_end"]] == text
        role = dict(((c, t), ro) for c, t, ro, _x in rows)[(r["conv_id"], r["turn_idx"])]
        assert r["masked"] == (role != "assistant")
