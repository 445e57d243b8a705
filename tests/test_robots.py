"""robots.txt parsing + URL filtering."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from logai_spark.functions.robots import robots_filter, robots_rules


def _robots(spark):
    return spark.createDataFrame(
        [
            Row(
                domain="a.com",
                robots_txt=(
                    "# politeness\n"
                    "User-agent: googlebot\n"
                    "Disallow: /google-only\n"
                    "\n"
                    "User-agent: *\n"
                    "Disallow: /private\n"
                    "Disallow: /tmp/\n"
                    "Disallow:\n"  # empty = allow all, must be ignored
                ),
            ),
            Row(
                domain="b.org",
                robots_txt=(
                    # stacked UA lines: the run includes *, so rules apply
                    "User-agent: googlebot\nUser-agent: *\nDisallow: /x\n"
                ),
            ),
            Row(domain="c.net", robots_txt="User-agent: bing\nDisallow: /\n"),
        ]
    )


def test_robots_rules_star_sections_only(spark):
    rules = {(r.domain, r.prefix) for r in robots_rules(_robots(spark)).collect()}
    assert rules == {
        ("a.com", "/private"),
        ("a.com", "/tmp/"),
        ("b.org", "/x"),
        # c.net's section names bing only -> no * rules
        # a.com's googlebot-only /google-only excluded
    }


def test_robots_filter_drops_and_flags(spark):
    rules = robots_rules(_robots(spark))
    urls = spark.createDataFrame(
        [
            Row(url="http://a.com/private/doc1"),  # blocked (prefix)
            Row(url="http://a.com/public/doc2"),   # passes
            Row(url="http://a.com/tmp/x"),          # blocked
            Row(url="http://a.com/tmpfile"),        # NOT blocked (/tmp/ needs slash)
            Row(url="http://b.org/x"),              # blocked (exact prefix)
            Row(url="http://c.net/anything"),       # bing-only rules -> passes
            Row(url="http://unknown.io/whatever"),  # no rules -> passes
        ]
    )
    kept = {r.url for r in robots_filter(urls, rules).collect()}
    assert kept == {
        "http://a.com/public/doc2",
        "http://a.com/tmpfile",
        "http://c.net/anything",
        "http://unknown.io/whatever",
    }
    flagged = {
        r.url: r.robots_blocked
        for r in robots_filter(urls, rules, action="flag").collect()
    }
    assert flagged["http://a.com/private/doc1"] is True
    assert flagged["http://unknown.io/whatever"] is False


def test_robots_filter_bare_domain_url_matches_root_rule(spark):
    rules = robots_rules(
        spark.createDataFrame(
            [Row(domain="d.io", robots_txt="User-agent: *\nDisallow: /\n")]
        )
    )
    urls = spark.createDataFrame(
        [Row(url="http://d.io"), Row(url="http://d.io/page")]
    )
    assert robots_filter(urls, rules).count() == 0  # bare URL counts as "/"


def test_robots_delays_star_sections_only(spark):
    from pyspark.sql import Row

    from logai_spark.functions.robots import robots_delays

    robots = spark.createDataFrame(
        [
            Row(
                domain="a.com",
                robots_txt=(
                    "User-agent: googlebot\nCrawl-delay: 99\n\n"
                    "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
                ),
            ),
            Row(
                domain="b.com",
                robots_txt=(
                    "User-agent: *\nCrawl-delay: oops\n\n"
                    "User-agent: bot\nUser-agent: *\nCrawl-delay: 1\n"
                    "\nUser-agent: *\nCrawl-delay: 4\n"
                ),
            ),
            Row(domain="c.com", robots_txt="User-agent: *\nDisallow: /y\n"),
        ],
        ["domain", "robots_txt"],
    )
    got = {r.domain: r.delay_ms for r in robots_delays(robots).collect()}
    # a.com: star section 2.5s -> 2500ms (googlebot's 99 ignored)
    # b.com: 'oops' ignored; max(1s, 4s) = 4000ms
    # c.com: no Crawl-delay -> absent
    assert got == {"a.com": 2500, "b.com": 4000}


def test_robots_delays_feed_frontier(spark):
    from pyspark.sql import Row

    from logai_spark.functions.frontier import crawl_frontier
    from logai_spark.functions.robots import robots_delays, robots_filter, robots_rules

    robots = spark.createDataFrame(
        [
            Row(
                domain="a.com",
                robots_txt="User-agent: *\nDisallow: /private\nCrawl-delay: 2\n",
            )
        ],
        ["domain", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [("http://a.com/private/x",), ("http://a.com/2",), ("http://a.com/1",)],
        ["url"],
    )
    allowed = robots_filter(urls, robots_rules(robots))
    sched = crawl_frontier(allowed, delay_ms=1000, delays=robots_delays(robots))
    got = {r.url: (r.slot, r.fetch_at_ms) for r in sched.collect()}
    assert got == {
        "http://a.com/1": (0, 0),
        "http://a.com/2": (1, 2000),
    }


def test_robots_filter_host_case_and_port_insensitive(spark):
    """RFC 3986: scheme and host compare case-insensitively, and the rules
    table keys on the bare (port-less) domain — so 'HTTP://A.com/private'
    and 'http://a.com:8080/private' must both hit a.com's Disallow rules
    (the fail-open bypass ADVICE-r4 verified live)."""
    rules = robots_rules(_robots(spark))
    urls = spark.createDataFrame(
        [
            Row(url="HTTP://A.com/private/doc"),   # upper scheme + host
            Row(url="http://A.COM/tmp/x"),          # upper host only
            Row(url="http://a.com:8080/private/y"), # explicit port
            Row(url="http://a.com/PRIVATE/z"),      # path stays case-SENSITIVE
        ]
    )
    kept = {r.url for r in robots_filter(urls, rules).collect()}
    assert kept == {"http://a.com/PRIVATE/z"}


def test_robots_filter_rule_domain_case_insensitive(spark):
    rules = robots_rules(
        spark.createDataFrame(
            [Row(domain="E.IO", robots_txt="User-agent: *\nDisallow: /no\n")]
        )
    )
    urls = spark.createDataFrame([Row(url="http://e.io/no/1"), Row(url="http://e.io/ok")])
    assert {r.url for r in robots_filter(urls, rules).collect()} == {"http://e.io/ok"}


def test_robots_sitemaps_directive(spark):
    from logai_spark.functions.robots import robots_sitemaps

    robots = spark.createDataFrame(
        [
            (
                "a.net",
                "User-agent: *\nDisallow: /x\n"
                "Sitemap: http://a.net/s.xml\n"
                "sitemap: http://a.net/s.xml\n"  # case + duplicate
                "Sitemap: /relative.xml\n"  # not absolute -> ignored
                "Sitemap: https://cdn.example/a.xml # trailing comment\n",
            ),
            ("b.net", "User-agent: *\nDisallow: /\n"),  # no directive
            ("c.net", None),
        ],
        ["domain", "robots_txt"],
    )
    got = {(r["domain"], r["sitemap_url"]) for r in robots_sitemaps(robots).collect()}
    assert got == {
        ("a.net", "http://a.net/s.xml"),
        ("a.net", "https://cdn.example/a.xml"),
    }


def test_rfc9309_rules_and_wildcards(spark):
    from logai_spark.functions.robots import (
        robots_filter_rfc9309,
        robots_rules_rfc9309,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.net",
                "User-agent: *\n"
                "Disallow: /d/\n"
                "Allow: /d/pub/\n"
                "Disallow: /*.tmp$\n",
            ),
            ("b.net", "User-agent: bing\nDisallow: /\n"),  # no star section
            (
                "c.net",
                "User-agent: *\nAllow: /a\nDisallow: /a\nDisallow: /b*x\n",
            ),
        ],
        ["domain", "robots_txt"],
    )
    rules = robots_rules_rfc9309(robots)
    got = {
        (r.domain, r.pattern, r.is_allow, r.regex)
        for r in rules.collect()
    }
    assert ("a.net", "/d/", False, "^/d/") in got
    assert ("a.net", "/d/pub/", True, "^/d/pub/") in got
    assert ("a.net", "/*.tmp$", False, r"^/.*\.tmp$") in got
    assert ("c.net", "/b*x", False, "^/b.*x") in got
    assert not any(d == "b.net" for d, *_ in got)

    urls = spark.createDataFrame(
        [
            (1, "http://a.net/d/secret"),       # blocked: /d/
            (2, "http://a.net/d/pub/ok"),       # allow override (longer)
            (3, "http://a.net/file.tmp"),       # blocked: wildcard + $
            (4, "http://a.net/file.tmp.bak"),   # $ anchor -> passes
            (5, "http://c.net/a"),              # tie /a vs /a -> allow wins
            (6, "http://c.net/b123x"),          # blocked: /b*x
            (7, "http://c.net/b123xyz"),        # prefix match -> blocked
            (8, "http://b.net/anything"),       # no star rules -> passes
            (9, "http://nowhere.org/x"),        # no rules at all -> passes
        ],
        ["id", "url"],
    )
    flagged = robots_filter_rfc9309(urls, rules, action="flag")
    got = {r.id: r.robots_blocked for r in flagged.collect()}
    assert got == {
        1: True, 2: False, 3: True, 4: False,
        5: False, 6: True, 7: True, 8: False, 9: False,
    }
    kept = robots_filter_rfc9309(urls, rules).count()
    assert kept == 5


def test_rfc9309_corpus_never_shuffles(spark):
    from logai_spark.functions.robots import (
        robots_filter_rfc9309,
        robots_rules_rfc9309,
    )

    robots = spark.createDataFrame(
        [("a.net", "User-agent: *\nDisallow: /x*y$\n")],
        ["domain", "robots_txt"],
    )
    urls = spark.range(100).select(
        F.concat(F.lit("http://a.net/x"), F.col("id"), F.lit("y")).alias("url")
    )
    plan = (
        robots_filter_rfc9309(urls, robots_rules_rfc9309(robots))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # any sort-merge join must be internal to the BOUNDED rules build
    # (robots-table columns only) — never against the url corpus
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "url" not in line, line
