"""Gap sessionization + as-of join semantics on hand-built frames."""

import datetime as dt

from pyspark.sql import functions as F

from logai_spark.operators.features import sessionize_by_gap
from logai_spark.operators.joins import asof_join


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundaries(spark):
    # gaps: 60s (same session at gap=60? strictly-greater -> same),
    # 61s (new session), then a second user interleaved
    rows = [
        (1, _ts(0, 0), 10),
        (1, _ts(1, 0), 11),   # gap 60 == 60 -> same session (strict >)
        (1, _ts(2, 1), 12),   # gap 61 > 60 -> new session
        (2, _ts(0, 30), 20),
        (2, _ts(59, 0), 21),  # gap way over -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize_by_gap(
        df, key_cols=["user_id"], ts_col="ts", gap_secs=60,
        tiebreak_cols=["event_id"],
    )
    got = {r.event_id: r.session_seq for r in out.collect()}
    assert got == {10: 1, 11: 1, 12: 2, 20: 1, 21: 2}


def test_sessionize_deterministic_tiebreak(spark):
    # two events at the identical timestamp: ordering (and the lag chain)
    # must follow the tiebreak column, not partition luck
    t = _ts(5)
    rows = [(1, t, 2), (1, t, 1), (1, _ts(10), 3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sessionize_by_gap(
        df, key_cols=["user_id"], ts_col="ts", gap_secs=60,
        tiebreak_cols=["event_id"],
    ).orderBy("session_seq", "event_id")
    got = [(r.event_id, r.session_seq) for r in out.collect()]
    assert got == [(1, 1), (2, 1), (3, 2)]


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(10), 101), (1, _ts(20), 102), (2, _ts(5), 200)],
        "k long, ts timestamp, ev long",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 7), (1, _ts(15), 8)], "k long, ts timestamp, v long"
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", value_cols=["v"],
        right_ts_out="v_ts", tiebreak_cols=["ev"],
    )
    got = {r.ev: (r.v, r.v_ts) for r in out.collect()}
    assert got[100] == (None, None)          # nothing at-or-before
    assert got[101] == (7, _ts(10))          # equal ts matches (inclusive)
    assert got[102] == (8, _ts(15))          # latest prior wins
    assert got[200] == (None, None)          # key with no right rows


def test_asof_preserves_left_rowcount_and_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts(i), i, f"p{i}") for i in range(8)],
        "k long, ts timestamp, ev long, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 1.5)], "k long, ts timestamp, score double"
    )
    out = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["score"])
    assert out.count() == 8
    assert set(out.columns) == {"k", "ts", "ev", "payload", "score"}
    matched = out.filter(F.col("score").isNotNull()).count()
    assert matched == 5  # events at minutes 3..7


def test_asof_rejects_colliding_value_col(spark):
    left = spark.createDataFrame([(1, _ts(0), 5)], "k long, ts timestamp, v long")
    right = spark.createDataFrame([(1, _ts(0), 6)], "k long, ts timestamp, v long")
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"])


def test_asof_plan_single_shuffle(spark):
    """The union pattern must plan as ONE exchange on the join keys —
    no range join, no cartesian."""
    left = spark.createDataFrame(
        [(1, _ts(i), i) for i in range(4)], "k long, ts timestamp, ev long"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 9)], "k long, ts timestamp, v long"
    )
    out = asof_join(left, right, on=["k"], ts_col="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # hashpartitioning on the key appears once (window shuffle), not per-side
    assert plan.count("Exchange hashpartitioning") <= 1


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(10), 101), (1, _ts(40), 102)],
        "k long, ts timestamp, ev long",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 7)], "k long, ts timestamp, v long"
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", value_cols=["v"],
        tolerance_secs=600,  # 10 minutes freshness
    )
    got = {r.ev: r.v for r in out.collect()}
    assert got[100] is None        # before any right row
    assert got[101] == 7           # 60s old: fresh
    assert got[102] is None        # 31min old: stale -> nulled
    assert "_asof_right_ts" not in out.columns  # internal col dropped

    # with right_ts_out requested, the stale match's ts is nulled too
    out2 = asof_join(
        left, right, on=["k"], ts_col="ts", value_cols=["v"],
        right_ts_out="vts", tolerance_secs=600,
    )
    g2 = {r.ev: (r.v, r.vts) for r in out2.collect()}
    assert g2[101] == (7, _ts(9)) and g2[102] == (None, None)
