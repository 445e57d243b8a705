"""Feature-extractor invariants, mirroring the reference's test strategy
(/root/reference/tests/logai/information_extraction/test_feature_extractor.py:
sum(counts)==n_rows, groups unique, bucket alignment)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.operators.features import (
    chrono_split,
    counter_vector,
    dedup_with_counts,
    feature_vector_mean,
    session_windows,
    sliding_windows,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()


def test_counter_vector_sums_to_rows(spark, events):
    cv = counter_vector(events, ["event_type"], "ts", "5 minutes")
    agg = cv.agg(F.sum("counts")).first()[0]
    assert agg == events.count()


def test_counter_vector_buckets_aligned(spark, events):
    cv = counter_vector(events, [], "ts", "5 minutes")
    bad = cv.filter(F.unix_timestamp("timestamp") % 300 != 0).count()
    assert bad == 0


def test_counter_vector_groups_unique(spark, events):
    cv = counter_vector(events, ["event_type", "user_id"])
    assert cv.count() == cv.select("event_type", "user_id").distinct().count()


def test_sliding_windows_shapes(spark, events):
    ev = events.select("user_id", F.col("event_id").alias("seq"),
                       F.col("event_type").alias("logline"))
    w = sliding_windows(ev, 5, ["user_id"], "seq", exclude_smaller_windows=True)
    sizes = w.select(F.size("window_lines").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [5]
    # per user: n - (k-1) full windows
    per_user = ev.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    got = w.groupBy("user_id").count().toPandas().set_index("user_id")["count"]
    for uid, n in per_user.items():
        assert got.get(uid, 0) == max(n - 4, 0)


def test_sliding_windows_step(spark, events):
    ev = events.select("user_id", F.col("event_id").alias("seq"),
                       F.col("event_type").alias("logline"))
    w1 = sliding_windows(ev, 4, ["user_id"], "seq", step=1).count()
    w2 = sliding_windows(ev, 4, ["user_id"], "seq", step=2).count()
    assert 0 < w2 <= (w1 + ev.select("user_id").distinct().count()) // 2


def test_sliding_window_next_line(spark):
    pdf = pd.DataFrame({
        "span": ["a"] * 5, "seq": range(5),
        "logline": [f"l{i}" for i in range(5)],
    })
    df = spark.createDataFrame(pdf)
    w = sliding_windows(df, 2, ["span"], "seq", with_next_line=True).toPandas()
    w = w.sort_values("seq").reset_index(drop=True)
    assert w["window_text"].tolist() == ["l0 l1", "l1 l2", "l2 l3", "l3 l4"]
    assert w["next_logline"].tolist() == ["l2", "l3", "l4", None]


def test_session_windows(spark, events):
    ev = events.select(F.col("user_id").alias("span_id"),
                       F.col("event_type").alias("logline"),
                       F.col("event_id").alias("seq"))
    s = session_windows(ev, order_col="seq")
    assert s.count() == ev.select("span_id").distinct().count()
    assert s.agg(F.sum("session_len")).first()[0] == ev.count()


def test_dedup_with_counts(spark, events):
    d = dedup_with_counts(events, ["user_id", "event_type"], ts_col="ts")
    assert d.agg(F.sum("counts")).first()[0] == events.count()


def test_feature_vector_mean(spark):
    pdf = pd.DataFrame({
        "k": ["a", "a", "b"],
        "features": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
    })
    out = feature_vector_mean(spark.createDataFrame(pdf), ["k"]).toPandas()
    got = {r["k"]: r["features"] for _, r in out.iterrows()}
    assert list(got["a"]) == [2.0, 3.0]
    assert list(got["b"]) == [5.0, 6.0]


def test_chrono_split_fraction(spark, events):
    out = chrono_split(events, "ts", ["event_type"], 0.7)
    frac = (
        out.groupBy("event_type")
        .agg((F.sum(F.col("is_train").cast("int")) / F.count(F.lit(1))).alias("f"))
        .toPandas()["f"]
    )
    assert ((frac > 0.6) & (frac < 0.8)).all()


def test_pack_sequences_greedy(spark):
    from logai_spark.operators.features import pack_sequences

    rows = [
        # source a: sizes 50, 60, 80, 90 with budget 120 ->
        # [50+60]=110, [80]=80 (80+90>120), [90]
        ("a", 1, 50), ("a", 2, 60), ("a", 3, 80), ("a", 4, 90),
        # source b: oversized doc gets its own pack, then packing resumes
        ("b", 1, 200), ("b", 2, 10), ("b", 3, 10),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_sequences(
        df, budget=120, group_cols=["source"], order_cols=["doc_id"]
    )
    got = {(r.source, r.doc_id): r.pack_id for r in out.collect()}
    assert got[("a", 1)] == 1 and got[("a", 2)] == 1
    assert got[("a", 3)] == 2 and got[("a", 4)] == 3
    assert got[("b", 1)] == 1          # oversized first doc -> pack 1 alone
    assert got[("b", 2)] == 2 and got[("b", 3)] == 2
    # every pack except possibly per-group tails respects the budget when
    # its members are not individually oversized
    from pyspark.sql import functions as F
    sums = (
        out.filter(F.col("n_tokens") <= 120)
        .groupBy("source", "pack_id").agg(F.sum("n_tokens").alias("s"))
    )
    assert sums.filter(F.col("s") > 120).count() == 0
