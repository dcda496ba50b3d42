"""Temporal join operators: as-of join semantics (vs hand-computed
expected, tie/no-match cases) and interval-join exactness (vs the
brute-force containment product), plus plan guards proving both stay
equi-join-shaped (no CartesianProduct / nested-loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_comparison_tool_spark import synth
from pdf_ocr_comparison_tool_spark.operators import temporal
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_semantics(spark):
    # key 1: touches at 10, 20; probes at 5 (no match), 20 (tie -> 20),
    # 25 (latest prior = 20). key 2: touch only AFTER the probe.
    left = spark.createDataFrame(
        [(1, 5, 100), (1, 20, 101), (1, 25, 102), (2, 7, 103)],
        "k long, t long, probe_id long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7.0), (1, 20, 8.0), (2, 9, 9.0)],
        "k long, t long, payload double",
    )
    out = temporal.asof_join(left, right, key="k", ts="t", tiebreak=("probe_id",))
    got = {r["probe_id"]: r["payload"] for r in out.collect()}
    assert got == {100: None, 101: 8.0, 102: 8.0, 103: None}
    assert out.count() == left.count()  # left outer: every probe kept


def test_asof_join_rejects_ambiguous_right(spark):
    left = spark.createDataFrame([(1, 5)], "k long, t long")
    right = spark.createDataFrame([(1, 3, 1)], "k long, t long, t2 long")
    bad = right.withColumnRenamed("t2", "t3").withColumnRenamed("t3", "t2")
    import pytest

    with pytest.raises(ValueError):
        temporal.asof_join(left, right.select("k", "t"), key="k", ts="t")
    with pytest.raises(ValueError):
        temporal.asof_join(
            left.withColumn("t2", F.lit(0)), bad, key="k", ts="t"
        )


def test_interval_join_exact_vs_brute(spark):
    # intervals spanning multiple buckets + touching bounds; the
    # bucketed plan must reproduce the brute containment product
    # exactly (incl. closed bounds) with zero duplicate pairs
    pts = spark.createDataFrame(
        [(1, 0), (1, 3600), (1, 7200), (1, 9999), (2, 50)],
        "k long, p long",
    )
    ivl = spark.createDataFrame(
        [(1, 0, 7200, 10), (1, 3600, 3600, 11), (2, 60, 100, 12)],
        "k long, s long, e long, ivl_id long",
    )
    out = temporal.interval_join(
        pts, ivl, key="k", pt="p", start="s", end="e", bucket_sec=3600
    )
    got = sorted((r["p"], r["ivl_id"]) for r in out.collect())
    brute = sorted(
        (p, i)
        for (kp, p) in [(1, 0), (1, 3600), (1, 7200), (1, 9999), (2, 50)]
        for (ki, s, e, i) in [(1, 0, 7200, 10), (1, 3600, 3600, 11), (2, 60, 100, 12)]
        if kp == ki and s <= p <= e
    )
    assert got == brute
    assert len(got) == len(set(got))  # no bucket-induced duplicates


def test_temporal_plans_stay_equi_join(spark):
    events = synth.load_table(spark, SF_DIR, "events")
    for df in (
        temporal.last_touch_attribution(events),
        temporal.session_error_attribution(events),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_session_errors_accounting(spark):
    """Every non-error session appears exactly once; total attributed
    errors never exceeds the error-event count; zero-error sessions
    carry an explicit 0."""
    from pdf_ocr_comparison_tool_spark.operators.reports import events_sessions

    events = synth.load_table(spark, SF_DIR, "events")
    out = temporal.session_error_attribution(events).cache()
    sessions = events_sessions(events.filter(F.col("event_type") != "error"))
    assert out.count() == sessions.count()
    n_err_events = events.filter(F.col("event_type") == "error").count()
    attributed = out.agg(F.sum("n_errors")).collect()[0][0]
    assert attributed <= n_err_events
    assert out.filter(F.col("n_errors") == 0).count() > 0
    out.unpersist()
