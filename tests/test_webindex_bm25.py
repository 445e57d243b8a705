"""BM25 ranked retrieval + crawl-frontier scheduling."""

import math

from logai_spark.functions.frontier import crawl_frontier
from logai_spark.functions.webindex import bm25_topk


DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "spark spark spark tuning guide"),
    (3, "a completely unrelated cooking recipe"),
    (4, "cluster tuning for spark shuffles"),
    (5, "the cooking cluster"),
]
QUERIES = [(10, "spark cluster"), (20, "cooking")]


def _bm25_reference(k1=1.2, b=0.75):
    """Independent per-(query, doc) scores, straight from the formula."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, q in QUERIES:
        for d, words in toks.items():
            s = 0.0
            for term in dict.fromkeys(q.split()):
                tf = words.count(term)
                if not tf:
                    continue
                df = sum(term in w for w in toks.values())
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
            if s > 0:
                out[(qid, d)] = math.floor(s * 10000 + 0.5) / 10000
    return out


def test_bm25_matches_formula(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, qs, k=10).collect()
    }
    assert got == _bm25_reference()


def test_bm25_topk_and_rank_order(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    rows = bm25_topk(docs, qs, k=2).orderBy("query_id", "rank").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
    # doc 2 has tf=3 for 'spark' but no 'cluster'; docs 1 and 4 match both
    assert {r.doc_id for r in by_q[10]} <= {1, 2, 4}


def test_bm25_no_match_query_absent(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame([(1, "zzz qqq")], ["query_id", "query"])
    assert bm25_topk(docs, qs).count() == 0


def test_bm25_empty_doc_counts_in_n_with_dl_zero(spark):
    """Empty/blank docs count in N with dl=0 (the plain-split reference
    definition): adding one empty doc changes N (hence idf and avgdl) but
    never contributes a (doc, token) pair (ADVICE-r4: tokenize_expr on ''
    yields [''] which silently counted dl=1)."""
    docs = spark.createDataFrame(DOCS + [(6, ""), (7, "   ")], ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(docs, qs, k=10).collect()
    }

    import math
    toks = {d: t.lower().split() for d, t in DOCS}
    toks[6] = []
    toks[7] = []
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    exp = {}
    for qid, q in QUERIES:
        for d, words in toks.items():
            s = 0.0
            for term in dict.fromkeys(q.split()):
                tf = words.count(term)
                if not tf:
                    continue
                df = sum(term in w for w in toks.values())
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(words) / avgdl))
            if s > 0:
                exp[(qid, d)] = math.floor(s * 10000 + 0.5) / 10000
    assert got == exp


def test_bm25_corpus_never_shuffles_unmatched_tokens(spark):
    """The corpus never shuffles: the broadcast vocab join sits BELOW the
    (id, token) aggregation, so every corpus explode in the executed plan
    feeds a BroadcastHashJoin before any exchange, and at most two corpus
    tokenize passes exist (pair table + df consumer; the N/avgdl stats
    scan is size-only, no explode). ADVICE-r4: previously three corpus
    tokenizes each fed a corpus-wide groupBy shuffle."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    out = bm25_topk(docs, qs, k=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints Final AND Initial sections — grade the final
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("explode(filter(split(") == 1
    assert "ReusedExchange" in final  # df consumer reuses the pairs exchange
    assert "SortMergeJoin" not in final and "CartesianProduct" not in final
    # structural pin: the corpus explode is immediately consumed by the
    # broadcast vocab probe (same codegen stage, BHJ directly above the
    # Generate) — no unmatched token reaches an exchange
    import re
    m = re.search(r"explode\(filter\(split\(", final)
    pre = final[: m.start()].splitlines()[-3:]
    assert any("BroadcastHashJoin" in ln for ln in pre), pre


def test_bm25_plan_broadcasts_and_window_limit(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qs = spark.createDataFrame(QUERIES, ["query_id", "query"])
    plan = bm25_topk(docs, qs, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


URLS = [
    ("http://a.com/3",),
    ("http://a.com/1",),
    ("http://a.com/2",),
    ("http://b.org/x",),
    ("http://b.org/y",),
]


def test_frontier_slots_and_default_delay(spark):
    urls = spark.createDataFrame(URLS, ["url"])
    rows = crawl_frontier(urls, delay_ms=500).collect()
    got = {r.url: (r.domain, r.slot, r.fetch_at_ms) for r in rows}
    assert got["http://a.com/1"] == ("a.com", 0, 0)
    assert got["http://a.com/2"] == ("a.com", 1, 500)
    assert got["http://a.com/3"] == ("a.com", 2, 1000)
    assert got["http://b.org/x"] == ("b.org", 0, 0)
    assert got["http://b.org/y"] == ("b.org", 1, 500)


def test_frontier_priority_cap_and_custom_delay(spark):
    urls = spark.createDataFrame(
        [(u, p) for (u,), p in zip(URLS, [1, 9, 5, 2, 7])], ["url", "prio"]
    )
    delays = spark.createDataFrame([("a.com", 100)], ["domain", "delay_ms"])
    rows = crawl_frontier(
        urls, delay_ms=500, max_per_domain=2, delays=delays, priority_col="prio"
    ).collect()
    got = {r.url: (r.slot, r.fetch_at_ms) for r in rows}
    # a.com: prio 9 (/1) then 5 (/2); /3 (prio 1) dropped by the cap
    assert got["http://a.com/1"] == (0, 0)
    assert got["http://a.com/2"] == (1, 100)
    assert "http://a.com/3" not in got
    # b.org: prio 7 (/y) first, default delay
    assert got["http://b.org/y"] == (0, 0)
    assert got["http://b.org/x"] == (1, 500)


def test_frontier_plan_window_group_limit(spark):
    urls = spark.createDataFrame(URLS, ["url"])
    plan = (
        crawl_frontier(urls, max_per_domain=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_surt_canonicalization(spark):
    from logai_spark.functions.webindex import surt_expr

    df = spark.createDataFrame(
        [
            ("http://www.Example.com/A?q=1",),
            ("HTTPS://sub.Example.com",),
            ("http://example.com/p#frag",),
        ],
        ["url"],
    )
    got = [r.s for r in df.select(surt_expr("url").alias("s")).collect()]
    assert got == [
        "com,example)/a?q=1",
        "com,example,sub)/",
        "com,example)/p",
    ]


def test_cdx_index_sorted_and_digested(spark):
    import hashlib

    from logai_spark.functions.webindex import cdx_index

    pages = spark.createDataFrame(
        [
            ("http://www.b.com/x", 2, "v2"),
            ("http://a.org/", 1, "v1"),
            ("http://www.b.com/x", 1, "v1"),
        ],
        ["url", "warc_ts", "html"],
    )
    rows = cdx_index(pages).collect()
    assert [(r.surt, r.ts) for r in rows] == [
        ("com,b)/x", 1),
        ("com,b)/x", 2),
        ("org,a)/", 1),
    ]
    assert rows[0].digest == hashlib.md5(b"v1").hexdigest()
    assert rows[1].digest == hashlib.md5(b"v2").hexdigest()


def test_cdx_index_range_shards_globally_sorted(spark):
    from logai_spark.functions.webindex import cdx_index

    pages = spark.createDataFrame(
        [(f"http://d{i:03d}.net/p", i, f"c{i}") for i in range(40)],
        ["url", "warc_ts", "html"],
    )
    idx = cdx_index(pages, n_shards=4)
    parts = idx.rdd.glom().map(lambda rows: [r.surt for r in rows]).collect()
    nonempty = [p for p in parts if p]
    assert len(nonempty) >= 2
    for p in nonempty:
        assert p == sorted(p)
    flat = [s for p in nonempty for s in p]
    assert flat == sorted(flat)  # shard ranges don't overlap


def test_host_stats(spark):
    from logai_spark.functions.webgraph import host_stats

    pages = spark.createDataFrame(
        [
            ("http://a.com/1", "aaaa", "en"),
            ("http://a.com/1", "bb", "de"),     # recrawl, different lang
            ("http://a.com/2", "cccccc", "en"),
            ("http://b.org/x", "dd", "fr"),
        ],
        ["url", "text", "lang"],
    )
    got = {r.domain: r for r in host_stats(pages).collect()}
    a = got["a.com"]
    assert (a.n_pages, a.n_urls, a.text_chars) == (3, 2, 12)
    assert a.top_lang == "en" and a.top_lang_share == 0.6667
    assert a.mean_chars == 4.0
    b = got["b.org"]
    assert (b.n_pages, b.n_urls, b.top_lang) == (1, 1, "fr")
