"""balanced_shards (operators/shards.py): distributed cumulative-sum shard
assignment — correctness vs a single-node replay, balance, and invariance
to input partitioning."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from logai_spark.operators.shards import balanced_shards


def _fixture(spark, n=200):
    rows = [Row(doc_id=i, n_tokens=(i * 37) % 91 + 1) for i in range(n)]
    return spark.createDataFrame(rows)


def _replay(rows, k):
    total = sum(r["n_tokens"] for r in rows)
    out, cum = {}, 0
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        out[r["doc_id"]] = min(k - 1, cum * k // total)
        cum += r["n_tokens"]
    return out


def test_matches_single_node_replay(spark):
    df = _fixture(spark)
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(df, 8, buckets=7).collect()
    }
    assert got == _replay(df.collect(), 8)


def test_balance_and_contiguity(spark):
    df = _fixture(spark, 500)
    out = balanced_shards(df, 10, buckets=13).collect()
    per = {}
    for r in out:
        per.setdefault(r["shard"], []).append(r)
    assert set(per) == set(range(10))
    sizes = {s: sum(r["n_tokens"] for r in rs) for s, rs in per.items()}
    total = sum(sizes.values())
    max_row = max(r["n_tokens"] for r in out)
    # each shard within one max row size of the ideal budget
    assert all(abs(sz - total / 10) <= max_row for sz in sizes.values())
    # shards are contiguous in doc order
    bounds = sorted((min(r["doc_id"] for r in rs), max(r["doc_id"] for r in rs), s)
                    for s, rs in per.items())
    for (lo1, hi1, _), (lo2, hi2, _) in zip(bounds, bounds[1:]):
        assert hi1 < lo2


def test_invariant_to_partitioning_and_bucket_count(spark):
    df = _fixture(spark, 300)
    a = {r["doc_id"]: r["shard"]
         for r in balanced_shards(df, 6, buckets=3).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in balanced_shards(df.repartition(17), 6, buckets=11).collect()}
    assert a == b


def test_custom_order(spark):
    # order by descending size, tie-broken by id: largest docs land in
    # shard 0 first
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=t) for i, t in [(1, 5), (2, 50), (3, 5), (4, 40)]]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(
            df, 2, order_exprs=[F.desc("n_tokens"), F.asc("doc_id")], buckets=2
        ).collect()
    }
    # order: 2(50), 4(40), 1(5), 3(5); total=100 -> cum_before*2//100:
    # 2 -> 0, 4 -> 1, 1 -> 1, 3 -> 1
    assert got == {2: 0, 4: 1, 1: 1, 3: 1}
