"""sitemap.xml parsing (functions/sitemaps.py)."""

import pytest

from logai_spark.functions.sitemaps import (
    sitemap_entries,
    synth_sitemap_rows,
    synth_sitemap_xml,
)


def _corpus(spark, n):
    rows = [(f"d{i}.example", synth_sitemap_xml(i)) for i in range(n)]
    return spark.createDataFrame(rows, ["domain", "sitemap_xml"])


def test_entries_match_fixture_params(spark):
    got = {tuple(r) for r in sitemap_entries(_corpus(spark, 9)).collect()}
    exp = {t for i in range(9) for t in synth_sitemap_rows(i)}
    assert got == exp


def test_cdata_entities_defaults(spark):
    xml = (
        "<urlset>"
        " <url><loc><![CDATA[http://a.example/x?p=1&amp;q=2]]></loc></url>"
        " <url><loc> http://a.example/y </loc>"
        "<priority>0.9</priority></url>"
        " <url><lastmod>2024-01-01</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    df = spark.createDataFrame([("a.example", xml)], ["domain", "sitemap_xml"])
    rows = {r["loc"]: r for r in sitemap_entries(df).collect()}
    assert set(rows) == {"http://a.example/x?p=1&q=2", "http://a.example/y"}
    assert rows["http://a.example/x?p=1&q=2"]["priority"] == 0.5  # default
    assert rows["http://a.example/y"]["priority"] == 0.9


def test_null_xml_and_index_files(spark):
    df = spark.createDataFrame(
        [("a.example", None), ("d3.example", synth_sitemap_xml(3))],
        ["domain", "sitemap_xml"],
    )
    rows = sitemap_entries(df).collect()
    assert all(r["domain"] == "d3.example" for r in rows)
    assert {r["kind"] for r in rows} == {"sitemap"}
    assert all(r["priority"] is None for r in rows)


def test_zero_shuffle_plan(spark):
    """The parse is a row-local projection: no exchange in the plan."""
    plan = sitemap_entries(_corpus(spark, 4))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_feeds_crawl_frontier(spark):
    from pyspark.sql import functions as F

    from logai_spark.functions.frontier import crawl_frontier

    urls = (
        sitemap_entries(_corpus(spark, 5))
        .filter(F.col("kind") == "url")
        .select(F.col("loc").alias("url"), "priority")
    )
    sched = crawl_frontier(urls, priority_col="priority")
    assert sched.count() == urls.count()
    first = sched.filter("slot = 0").count()
    assert first == urls.select(F.expr("parse_url(url, 'HOST')")).distinct().count()
