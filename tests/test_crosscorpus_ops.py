"""Round-4 training-corpus ops: cross-corpus near-dup flagging,
SemDeDup-style embedding dedup, CCNet perplexity bucketing, and
token-budget selection. Semantics vs single-node replays plus the plan
shapes that must survive a 100x scale-up (no cartesian, no single-task
global window over the corpus)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from logai_spark.functions.selection import token_budget_select
from logai_spark.functions.similarity import semantic_dedup
from logai_spark.functions.textops import cross_near_dup, perplexity_buckets

FLUENT = "the quick brown fox jumps over the lazy dog near the old river bank"


def test_cross_near_dup_flags_ref_collisions(spark):
    ref = spark.createDataFrame(
        [(100, FLUENT), (101, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (0, FLUENT),                                        # exact copy
            (1, FLUENT + " tonight"),                           # near copy
            (2, "completely unrelated words about cooking pasta sauce"),
            (3, "hi"),                                          # < shingle_n tokens
            (4, None),                                          # NULL text
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ref_dup"] for r in cross_near_dup(new, ref).collect()}
    assert got[0] is True and got[1] is True
    assert got[2] is False
    # no MinHash evidence -> never flagged, but still present in the output
    assert got[3] is False and got[4] is False
    assert set(got) == {0, 1, 2, 3, 4}


def test_cross_near_dup_plan_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, FLUENT + f" {i}") for i in range(20)], "doc_id long, text string"
    )
    plan = (
        cross_near_dup(docs, docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_semantic_dedup_keeps_earliest_per_neighborhood(spark):
    base = [1.0] + [0.0] * 7
    other = [0.0] * 7 + [1.0]
    rows = [
        (0, base),          # earliest of the duplicate pair -> kept
        (1, base),          # identical, later id -> removed
        (2, other),         # orthogonal -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(df, dim=8, threshold=0.9).collect()
    }
    assert got == {0: True, 1: False, 2: True}


def test_perplexity_buckets_head_vs_tail(spark):
    # 12 fluent docs sharing every bigram + 4 gibberish docs with unique,
    # never-repeated bigrams: the fluent docs must all out-score the
    # gibberish under the corpus bigram LM, so no fluent doc lands in a
    # worse bucket than any gibberish doc.
    rows = [(i, FLUENT) for i in range(12)]
    rows += [
        (100 + j, f"zz{j}a qq{j}b xx{j}c vv{j}d ww{j}e") for j in range(4)
    ]
    rows.append((999, "one"))  # < 2 tokens -> drops out
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df).collect()
    assert {r["doc_id"] for r in out} == {i for i in range(12)} | {100, 101, 102, 103}
    rank = {"head": 0, "middle": 1, "tail": 2}
    fluent_worst = max(rank[r["bucket"]] for r in out if r["doc_id"] < 12)
    gibberish_best = min(rank[r["bucket"]] for r in out if r["doc_id"] >= 100)
    assert fluent_worst <= gibberish_best
    assert any(r["bucket"] == "head" for r in out)
    assert all(r["bucket"] == "tail" for r in out if r["doc_id"] >= 100)


def test_perplexity_buckets_scored_reuse(spark):
    """Passing a persisted bigram_lm_score output (the keep_best(clusters=)
    reuse pattern) must give identical buckets to the self-contained form."""
    from logai_spark.functions.textops import bigram_lm_score

    df = spark.createDataFrame(
        [(i, FLUENT + f" {i % 3}") for i in range(30)], "doc_id long, text string"
    )
    scored = bigram_lm_score(df).persist()
    try:
        a = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df).collect()}
        b = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(df, scored=scored).collect()
        }
        assert a == b
    finally:
        scored.unpersist()


def test_perplexity_buckets_no_global_sort(spark):
    df = spark.createDataFrame(
        [(i, FLUENT + f" {i % 5}") for i in range(40)], "doc_id long, text string"
    )
    plan = (
        perplexity_buckets(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the cuts come from an aggregate, never a corpus-wide sort/window
    assert "Window" not in plan
    assert "CartesianProduct" not in plan  # the 1-row cut join must broadcast


def _budget_fixture(spark, n=120):
    rows = [
        Row(doc_id=i, n_tokens=(i * 13) % 50 + 5, quality=((i * 7) % 40) / 40.0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _budget_replay(rows, budget):
    # prefix semantics: the inclusive running sum is monotone, so the first
    # straddler and everything ordered after it are excluded
    kept, cum = set(), 0
    for r in sorted(rows, key=lambda r: (-r["quality"], r["doc_id"])):
        if cum + r["n_tokens"] > budget:
            break
        cum += r["n_tokens"]
        kept.add(r["doc_id"])
    return kept


def test_token_budget_matches_replay(spark):
    df = _budget_fixture(spark)
    got = {r["doc_id"] for r in token_budget_select(df, budget=900).collect()}
    assert got == _budget_replay(df.collect(), 900)
    assert sum(
        r["n_tokens"] for r in df.collect() if r["doc_id"] in got
    ) <= 900


def test_token_budget_invariant_to_partitioning(spark):
    df = _budget_fixture(spark, 200)
    a = {r["doc_id"] for r in token_budget_select(df, budget=1500, buckets=3).collect()}
    b = {
        r["doc_id"]
        for r in token_budget_select(
            df.repartition(17), budget=1500, buckets=11
        ).collect()
    }
    assert a == b and a


def test_token_budget_plan_no_single_task_window(spark):
    df = _budget_fixture(spark, 200)
    plan = (
        token_budget_select(df, budget=1500, buckets=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-side window must be PARTITIONED by the frozen range id
    # ("Window [...], [_range#N], [...]"); the only unpartitioned window
    # runs over the tiny (#buckets)-row offsets table, which must reach
    # the corpus as a broadcast, never a shuffle or nested loop
    assert "], [_range#" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
