"""Thunderbird openset support: grok-format load, label derivation
(thunderbird_preprocessor.py:30-36), per-node spans, end-to-end workflow."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.plans.openset_workflow import OpenSetADConfig, run_openset_ad
from logai_spark.preprocess_opensets import thunderbird_preprocess
from logai_spark.sources.readers import load_openset


@pytest.fixture(scope="module")
def tbird_log(tmp_path_factory):
    """Synthetic log in the public Thunderbird format: alert tag, epoch id,
    date, node, month day time, node-addr, free text. Nodes dn1/dn2 cycle a
    3-step grammar; dn3 contains tagged alert lines."""
    lines = []
    eid = 1131566461
    msgs = ["session opened for user root", "session closed for user root",
            "synchronized to time server"]
    for node in ("dn1", "dn2", "dn3"):
        for i in range(60):
            tag = "ALERT" if node == "dn3" and i % 7 == 0 else "-"
            m = msgs[i % 3]
            lines.append(
                f"{tag} {eid} 2005.11.09 {node} Nov 9 12:01:{i % 60:02d} "
                f"{node}/{node} daemon[{1000 + i}]: {m}"
            )
            eid += 1
    p = tmp_path_factory.mktemp("tbird") / "Thunderbird_180.log"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_thunderbird_load_and_labels(spark, tbird_log):
    df = thunderbird_preprocess(load_openset(spark, "thunderbird", tbird_log))
    assert df.count() == 180
    per_node = {
        r["span_id"]: r["n"]
        for r in df.filter(F.col("labels") == 1)
        .groupBy("span_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_node == {"dn3": 9}  # ceil(60/7) tagged lines, only on dn3
    # timestamp parsed at SECOND granularity (Date + Time, reference
    # config semantics '%Y.%m.%d %H:%M:%S') so intra-day order survives
    assert df.filter(F.col("timestamp").isNull()).count() == 0
    assert df.select("timestamp").distinct().count() == 60  # one per second


def test_thunderbird_workflow_end_to_end(spark, tbird_log):
    cfg = OpenSetADConfig(
        dataset="thunderbird", filepath=tbird_log, window_size=3,
        detector="forecast_next_event", forecast_g=2,
    )
    out = run_openset_ad(spark, cfg)
    m = out["metrics"].collect()[0]
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] > 0
    assert out["scored"].count() > 0
