"""Physical-plan assertions: the plan shape IS the product at 100 TB.

Checks that Catalyst produces what the architecture assumes: broadcast hash
joins for dims, partition pruning on routed sinks, column pruning +
predicate pushdown into parquet scans, partial (map-side) aggregation, and
no row-at-a-time Python in relational operators.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_is_broadcast_join(spark):
    from logai_spark.operators.enrich import enrich

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    plan = _plan(enrich(cust, nat, "c_nationkey"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan


def test_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema  # unused columns not read


def test_counter_vector_has_partial_agg(spark):
    from logai_spark.operators.features import counter_vector

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(counter_vector(ev, ["event_type"], "ts", "5 minutes"))
    # partial + final hash aggregate pair around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_relational_queries_stay_jvm_side(spark):
    """No Python evaluation nodes in the relational query battery."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["counter_vector", "tpch_q1", "enrich_broadcast", "sliding_window",
                 "minhash", "simhash", "quality_score", "cosine_topk"]:
        plan = _plan(qs[name](spark, SF))
        assert "BatchEvalPython" not in plan, name  # no row-at-a-time python
        assert "ArrowEvalPython" not in plan, name  # not even vectorized UDFs


def test_routed_sink_partition_pruning(spark, tmp_path):
    from logai_spark.operators.route import route_to_sinks

    pdf = pd.DataFrame(
        {"template_id": ["a"] * 40 + ["b"] * 60, "x": range(100)}
    )
    path = str(tmp_path / "sinks")
    route_to_sinks(spark.createDataFrame(pdf), path)
    pruned = spark.read.parquet(path).filter(F.col("template_id") == "b")
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "template_id" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 60


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
