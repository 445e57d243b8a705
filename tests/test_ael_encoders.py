"""AEL parser + categorical encoders."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.functions.encoders import label_encode, one_hot_encode, ordinal_encode
from logai_spark.parse.ael import AELConfig, ael_parse


@pytest.fixture(scope="module")
def logs(spark):
    lines = (
        ["send packet 17 to host-a", "send packet 42 to host-b", "send packet 9 to host-c"]
        + ["connection closed"] * 2
        + ["disk temp 88 critical", "disk temp 91 critical"]
    )
    return spark.createDataFrame(pd.DataFrame({"logline": lines})).cache()


def test_ael_merges_within_bins(spark, logs):
    out = ael_parse(logs, config=AELConfig(rex=[r"\d+"])).toPandas()
    t = dict(zip(out["logline"], out["template"]))
    # numeric rex masks digits; 'send packet <*> to host-X' differ in 1/5
    # tokens -> merged to a single template with a second wildcard
    assert t["send packet 17 to host-a"] == t["send packet 42 to host-b"]
    assert t["send packet 17 to host-a"].startswith("send packet <*> to")
    assert t["connection closed"] == "connection closed"
    assert t["disk temp 88 critical"] == t["disk temp 91 critical"] == "disk temp <*> critical"
    assert out["template_id"].notna().all()


def test_ael_no_rex_bins_by_token_count(spark, logs):
    out = ael_parse(logs, config=AELConfig()).toPandas()
    assert set(out["template"]) >= {"connection closed"}
    assert len(out) == logs.count()


def test_label_encode(spark):
    df = spark.createDataFrame(pd.DataFrame({"Action": ["b", "a", "b", "c"]}))
    out = label_encode(df, ["Action"]).toPandas()
    m = dict(zip(out["Action"], out["Action_categorical"]))
    assert m == {"a": 0, "b": 1, "c": 2}


def test_ordinal_encode(spark):
    df = spark.createDataFrame(pd.DataFrame({"Level": ["WARN", "INFO", "WARN"]}))
    out = ordinal_encode(df, ["Level"]).toPandas()
    m = dict(zip(out["Level"], out["Level-categorical"]))
    assert m == {"INFO": 0.0, "WARN": 1.0}


def test_one_hot_encode(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["x", "y", "x"]}))
    out = one_hot_encode(df, ["k"]).toPandas().sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "k-0", "k-1"]
    assert out.loc[0, "k-0"] == 1 and out.loc[0, "k-1"] == 0
    assert out.loc[2, "k-0"] == 0 and out.loc[2, "k-1"] == 1
