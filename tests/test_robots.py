"""robots.txt parsing + URL filtering."""

from __future__ import annotations

from pyspark.sql import Row

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
