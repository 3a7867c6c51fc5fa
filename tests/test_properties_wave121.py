"""Wave-121 properties: chat1's planted-violation coverage and lint
consistency; trunc1's conservation and monotonicity laws."""

from __future__ import annotations

from angelo_bravo_etl_task_spark.queries_wave121 import (
    chat1_template_lint,
    trunc1_context_budget,
)


def test_chat1_all_violation_classes_fire(spark, sf_dir):
    r = chat1_template_lint(spark, sf_dir).collect()[0]
    assert r["n_repeat_role"] > 0
    assert r["n_bad_ending"] > 0
    assert r["n_empty_turn"] > 0
    # the %23 corruption breaks alternation AND the ending in the same
    # convs — the two counters must agree exactly by construction
    assert r["n_repeat_role"] == r["n_bad_ending"]
    # Every conv is valid or fires >=1 of {repeat_role, empty_turn}
    # (bad_ending only co-fires with repeat_role by construction), so the
    # sum covers n_convs from below; it may exceed it only by the overlap
    # between the two classes (a naturally whitespace-only doc inside a
    # %23 conv counts in both — possible under data regeneration, so the
    # exact disjoint identity is NOT asserted; ADVICE r9).
    covered = r["n_valid"] + r["n_repeat_role"] + r["n_empty_turn"]
    assert covered >= r["n_convs"]
    assert covered <= r["n_convs"] + min(r["n_repeat_role"], r["n_empty_turn"])
    assert r["n_valid"] > r["n_convs"] // 2, "valid must be the majority"
    assert r["first_repeat_conv"] == 0  # conv 0 is %23 == 0
    assert r["first_empty_conv"] == 29


def test_trunc1_conservation_and_monotonicity(spark, sf_dir):
    rows = sorted(
        trunc1_context_budget(spark, sf_dir).collect(),
        key=lambda r: r["budget"],
    )
    assert len(rows) == 3
    total = rows[0]["tokens_kept"] + rows[0]["tokens_lost"]
    for r in rows:
        # kept + lost = corpus token count, at every budget
        assert r["tokens_kept"] + r["tokens_lost"] == total, r
    # larger budget -> fewer truncated docs, fewer lost tokens
    for a, b in zip(rows, rows[1:]):
        assert a["n_truncated"] >= b["n_truncated"]
        assert a["tokens_lost"] >= b["tokens_lost"]
        assert a["tokens_kept"] <= b["tokens_kept"]
    # the median budget must truncate roughly half the docs (>0 anyway)
    assert rows[1]["n_truncated"] > 0
