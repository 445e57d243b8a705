import pytest

from logai_spark.functions.selection import dsir_select


def _corpora(spark):
    target = spark.createDataFrame(
        [(100 + i, "spark shuffle partition join broadcast executor stage") for i in range(4)],
        "doc_id long, text string",
    )
    raw_rows = [
        (0, "spark shuffle partition join broadcast plan"),   # target-like
        (1, "join broadcast executor stage shuffle spark"),   # target-like
        (2, "recipe flour sugar butter oven bake cake"),      # off-topic
        (3, "piano violin concerto orchestra symphony"),      # off-topic
        (4, "executor stage spark shuffle partition join"),   # target-like
        (5, ""),                                              # empty
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return raw, target


def test_dsir_selects_target_like_docs(spark):
    raw, target = _corpora(spark)
    picked = dsir_select(raw, target, k=3, buckets=512)
    ids = {r["doc_id"] for r in picked.collect()}
    assert ids == {0, 1, 4}


def test_dsir_scores_ordered_and_deterministic(spark):
    raw, target = _corpora(spark)
    a = [(r["doc_id"], r["dsir_score"]) for r in dsir_select(raw, target, 6, buckets=512).collect()]
    b = [(r["doc_id"], r["dsir_score"]) for r in dsir_select(raw, target, 6, buckets=512).collect()]
    assert a == b and len(a) == 6
    scores = [s for _, s in a]
    assert scores == sorted(scores, reverse=True)
    # off-topic docs score below every target-like doc
    by_id = dict(a)
    assert max(by_id[2], by_id[3]) < min(by_id[0], by_id[1], by_id[4])


def test_dsir_gumbel_deterministic_per_seed(spark):
    raw, target = _corpora(spark)
    s1 = {r["doc_id"] for r in dsir_select(raw, target, 3, buckets=512, gumbel=True, seed=7).collect()}
    s2 = {r["doc_id"] for r in dsir_select(raw, target, 3, buckets=512, gumbel=True, seed=7).collect()}
    assert s1 == s2
    cols = dsir_select(raw, target, 3, buckets=512, gumbel=True, seed=7).columns
    assert cols == ["doc_id", "dsir_score", "dsir_key"]


def test_dsir_plan_broadcasts_model(spark):
    """The log-ratio model join must broadcast (bucket-bounded table);
    the raw corpus must never be on the build side of anything."""
    raw, target = _corpora(spark)
    plan = (
        dsir_select(raw, target, 3, buckets=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------- quality classifier


def _labeled(spark):
    pos_rows = [
        (100 + i, "spark shuffle partition join broadcast executor stage", 1)
        for i in range(4)
    ]
    neg_rows = [
        (200, "recipe flour sugar butter oven bake cake", 0),
        (201, "piano violin concerto orchestra symphony", 0),
        (202, "flour butter cake oven sugar bake recipe", 0),
    ]
    return spark.createDataFrame(
        pos_rows + neg_rows, "doc_id long, text string, label int"
    )


def test_quality_classifier_separates_classes(spark):
    from logai_spark.functions.selection import quality_classifier

    raw, _ = _corpora(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in quality_classifier(raw, _labeled(spark), buckets=512).collect()
    }
    assert len(out) == 6
    for i in (0, 1, 4):   # target-like docs score positive -> kept
        assert out[i]["nb_keep"] is True and out[i]["nb_score"] > 0
    for i in (2, 3):      # off-topic docs score negative -> dropped
        assert out[i]["nb_keep"] is False and out[i]["nb_score"] < 0


def test_quality_classifier_empty_doc_gets_prior(spark):
    import math

    from logai_spark.functions.selection import quality_classifier

    raw, _ = _corpora(spark)
    out = {
        r["doc_id"]: r["nb_score"]
        for r in quality_classifier(raw, _labeled(spark), buckets=512).collect()
    }
    prior = math.floor(math.log((4 + 1) / (3 + 1)) * 10000 + 0.5) / 10000
    assert out[5] == prior


def test_quality_classifier_deterministic_and_broadcast_plan(spark):
    from logai_spark.functions.selection import quality_classifier

    raw, _ = _corpora(spark)
    a = sorted(
        (r["doc_id"], r["nb_score"])
        for r in quality_classifier(raw, _labeled(spark), buckets=512).collect()
    )
    b = sorted(
        (r["doc_id"], r["nb_score"])
        for r in quality_classifier(raw, _labeled(spark), buckets=512).collect()
    )
    assert a == b
    plan = (
        quality_classifier(raw, _labeled(spark), buckets=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
