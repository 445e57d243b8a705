"""Physical-plan regression gates: the properties that make these operators
scale must stay visible in explain() output — a silent planner regression to
a cartesian product or a lost pushdown is a 100x cliff at web scale."""

import contextlib
import io
import re

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize(
    "name",
    ["embedding_near_dup", "ngram_jaccard", "lsh_dup_pairs"],
)
def test_dedup_family_never_cartesian(spark, qs, name):
    p = _plan(qs[name](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


@pytest.mark.parametrize("name", ["enrich_broadcast", "label_spans"])
def test_dim_joins_broadcast(spark, qs, name):
    assert "BroadcastHashJoin" in _plan(qs[name](spark, SF))


def test_scan_filter_pushdown(spark, qs):
    p = _plan(qs["tpch_q1"](spark, SF))
    m = re.search(r"PushedFilters: \[(.*?)\]", p)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1)


def test_scan_column_pruning(spark, qs):
    p = _plan(qs["token_count"](spark, SF))
    m = re.search(r"ReadSchema: struct<(.*?)>", p)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}  # 2-col projection reaches the scan


def test_cosine_topk_broadcasts_queries(spark, qs):
    """Exact top-k is a deliberate broadcast-queries x scan nested loop —
    the scan side must be the streamed side (BuildRight on the tiny query
    set), never a shuffle."""
    p = _plan(qs["cosine_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p and "BuildRight" in p


def test_masked_pairs_no_cartesian_and_broadcast_dim(spark, qs):
    """Masked-pair generation: the event-type dim join must broadcast and
    nothing may degrade to a cross product."""
    p = _plan(qs["masked_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_semantic_vocab_ranks_without_global_window(spark):
    """semantic_vocab must rank the token vocabulary via the range-partitioned
    distributed_order_ids path: every window over the counts table has to be
    partitioned by the materialized _range id — an unpartitioned
    row_number() over (cnt desc, token) funnels a web-scale vocab (10^6+
    tokens) through ONE task."""
    from logai_spark.functions.vectorizers import semantic_vocab

    df = spark.range(200).selectExpr(
        "concat('tok', id % 7, ' tok', id % 3, ' x', id % 11) as logline"
    )
    p = _plan(semantic_vocab(df))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs, "expected a ranking window in the vocab plan"
    for s in specs:
        if "cnt" in s:  # the window that orders by frequency
            assert s.strip().startswith("_range"), (
                f"vocab ranking window is not partitioned by _range: {s}"
            )


def test_sessionize_single_keyed_shuffle(spark, qs):
    """Gap sessionization: the lag window and the running-sum window must
    share ONE hashpartitioning(user_id) exchange (plus the final agg's own
    exchange on the same key) — never a global (empty-key) window."""
    p = _plan(qs["sessionize"](spark, SF))
    assert "SinglePartition" not in p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs
    for s in specs:
        assert s.strip().startswith("user_id"), f"unkeyed window: {s}"


def test_asof_join_no_range_join(spark, qs):
    """The as-of join must plan as union + keyed window: no cartesian, no
    nested-loop range join, and at most one extra exchange beyond the
    right-side pre-aggregation."""
    p = _plan(qs["asof_join"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert specs and all(s.strip().startswith("user_id") for s in specs)


def test_incremental_dedup_anti_join_shape(spark, qs):
    """Snapshot dedup must be a hash/sort anti join on the fingerprint —
    never a nested loop over the snapshot."""
    p = _plan(qs["incremental_dedup"](spark, SF))
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_row_local_text_ops_zero_exchange(spark, qs):
    """repetition_stats and pii_redact are row-local: the only exchange
    allowed in their plans is the final presentation sort's range partition
    (rangepartitioning), never a hashpartitioning shuffle."""
    for name in ("repetition_stats", "pii_redact"):
        p = _plan(qs[name](spark, SF))
        assert "hashpartitioning" not in p, name


def test_text_normalize_zero_exchange(spark, qs):
    """The normalize chain is one row-local codegen projection — any
    exchange in its plan means a rule fell out of the narrow pipeline."""
    p = _plan(qs["text_normalize"](spark, SF))
    assert "hashpartitioning" not in p


def test_boilerplate_hot_set_broadcasts(spark, qs):
    """The hot-line removal join must broadcast the (bounded) hot-line
    set, never shuffle the exploded corpus against it; nothing in the
    plan may degrade to a nested loop."""
    p = _plan(qs["boilerplate_rm"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_keep_best_no_cartesian_no_window(spark, qs):
    """Retention is a partial-aggregatable struct max per cluster: no
    window over cluster members, and the LSH candidate path never
    degrades to an all-pairs join."""
    p = _plan(qs["keep_best"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_simhash_pairs_single_equi_join(spark, qs):
    """Banded SimHash pairing must stay ONE hash equi-join on the band
    key — never a cartesian/nested-loop, and no join-back for signatures
    (they ride the band table)."""
    p = _plan(qs["simhash_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_html_extract_zero_exchange(spark, qs):
    """HTML extraction is one row-local codegen projection chain: any
    exchange means a regex pass fell out of the narrow pipeline."""
    p = _plan(qs["html_extract"](spark, SF))
    assert "hashpartitioning" not in p


def test_paragraph_dedup_never_shuffles_text(spark, qs):
    """paragraph_dedup inherits the span_dedup machinery: the keeper
    election must shuffle paragraph hashes, and nothing may degrade to a
    nested loop."""
    p = _plan(qs["paragraph_dedup"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_window_dedup_text_stays_out_of_aggregates(spark, qs):
    """The session-9 rewrite contract: dropped positions fold via a
    collect_set of INTS and the text is rebuilt by filtering the original
    row's unit array — the old shape's per-doc re-sort of collected unit
    text (array_sort over collect_list of (pos, unit) structs) must never
    reappear in any _window_dedup consumer or boilerplate_rm."""
    for name in ("paragraph_dedup", "span_dedup", "substring_dedup",
                 "boilerplate_rm"):
        p = _plan(qs[name](spark, SF))
        assert "collect_set" in p, name
        assert "array_sort(collect_list" not in p, name


def test_frontier_and_bm25_window_group_limits(spark, qs):
    """Hot-group caps must compile to WindowGroupLimit (partial map-side
    limits BEFORE the exchange): crawl_frontier's per-domain cap and
    bm25's top-k both rely on it, and neither may degrade to a loop join."""
    for name in ("crawl_frontier", "bm25_topk"):
        p = _plan(qs[name](spark, SF))
        assert "WindowGroupLimit" in p, name
        assert "CartesianProduct" not in p, name


def test_phrase_search_one_broadcast_no_smj(spark, qs):
    """Phrase terms broadcast into the postings; the only joins are the
    tiny-term broadcast — never a sort-merge, never a cartesian — and the
    count-distinct-free agg keeps the shuffle count at the (id,start)
    partial agg + final orderBy."""
    p = _plan(qs["phrase_search"](spark, SF))
    # formatted output names each node in the tree AND the detail section,
    # so pin the tree line count (exactly one broadcast join node)
    assert len(re.findall(r"\+- BroadcastHashJoin", p)) == 1
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    # no two-phase distinct expand (the count(*)==m rewrite)
    assert "Expand" not in p


def test_domain_hits_broadcasts_score_vectors(spark, qs):
    """Every HITS half-iteration joins the |domains|-sized score vector by
    BROADCAST; the edge table is the only shuffled side. The oracle-row
    plan is lineage-truncated by the per-iteration checkpoints, so the
    full-iteration shape is pinned on an UNcheckpointed build."""
    p = _plan(qs["domain_hits"](spark, SF))
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p

    from pyspark.sql import Row

    from logai_spark.functions.webgraph import domain_hits

    edges = spark.createDataFrame(
        [Row(src="a", dst="b", n_links=1), Row(src="b", dst="c", n_links=2)]
    )
    full = _plan(domain_hits(edges, iters=2, checkpoint=False))
    assert "SortMergeJoin" not in full
    assert "CartesianProduct" not in full
    # 2 score joins per iteration x 2 iters + 2 left rebuilds x 2 + assembly
    assert len(re.findall(r"BroadcastHashJoin", full.split("\n\n")[0])) >= 5


def test_compression_ratio_zero_shuffle(spark, qs):
    """Row-local Arrow UDF: no exchange other than the scan layout — the
    plan must contain no hash/range exchange at all (ArrowEvalPython only)."""
    p = _plan(qs["compression_ratio"](spark, SF))
    assert "hashpartitioning" not in p
    assert "ArrowEvalPython" in p
