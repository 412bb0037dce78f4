"""Conversation assembly: merge, trim, render, and drop semantics."""
from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.conversations import (
    assemble_conversations)


def _assemble(spark, rows):
    df = spark.createDataFrame(rows, ["cid", "pos", "role", "content"])
    out = assemble_conversations(df, conv_col="cid", order_cols=["pos"],
                                 role_col="role", content_col="content")
    return {r["cid"]: r.asDict() for r in out.collect()}


def test_merge_trim_render(spark):
    rows = [
        # c1: assistant lead dropped, two same-role user rows merged,
        # trailing user turn dropped
        (1, 1, "assistant", "hello"),
        (1, 2, "user", "hi"),
        (1, 3, "user", "there"),
        (1, 4, "assistant", "yes"),
        (1, 5, "user", "dangling"),
        # c2: already canonical
        (2, 1, "user", "q"),
        (2, 2, "assistant", "a"),
    ]
    got = _assemble(spark, rows)
    c1 = got[1]
    assert c1["rendered"] == "<|user|>hi there<|assistant|>yes"
    assert c1["n_events"] == 5          # pre-trim event count
    assert c1["n_turns"] == 2
    assert c1["n_user_turns"] == 1 and c1["n_assistant_turns"] == 1
    assert c1["n_tokens"] == 3          # "hi there" + "yes"
    assert got[2]["rendered"] == "<|user|>q<|assistant|>a"


def test_single_role_conversation_dropped(spark):
    rows = [(1, 1, "user", "a"), (1, 2, "user", "b"),
            (2, 1, "assistant", "x"),
            (3, 1, "user", "q"), (3, 2, "assistant", "a")]
    got = _assemble(spark, rows)
    assert set(got) == {3}


def test_order_cols_break_ties_deterministically(spark):
    # same role throughout one turn; merge order follows order_cols
    rows = [(1, 3, "user", "c"), (1, 1, "user", "a"), (1, 2, "user", "b"),
            (1, 4, "assistant", "ok")]
    got = _assemble(spark, rows)
    assert got[1]["rendered"] == "<|user|>a b c<|assistant|>ok"


def test_alternation_guaranteed_after_merge(spark):
    rows = []
    roles = ["assistant", "assistant", "user", "user", "assistant",
             "user", "assistant", "assistant"]
    for i, r in enumerate(roles):
        rows.append((1, i, r, f"t{i}"))
    got = _assemble(spark, rows)
    # merged: a(0,1) u(2,3) a(4) u(5) a(6,7) → trim leading assistant
    assert got[1]["rendered"] == ("<|user|>t2 t3<|assistant|>t4"
                                  "<|user|>t5<|assistant|>t6 t7")
    assert got[1]["n_turns"] == 4
    assert got[1]["n_events"] == 8
