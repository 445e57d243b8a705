"""WAT metadata sink + parse: the third member of Common Crawl's
WARC/WAT/WET triple (sources/warc.py write_wat/parse_wat). Envelope is
computed as zero-shuffle codegen (to_json over regexp extraction); the
writer only frames records."""

import json

from pyspark.sql import functions as F

from logai_spark.sources.warc import parse_wat, read_warc, write_wat


def _pages(spark):
    rows = [
        (
            "https://a.com/1",
            "2024-01-01 00:00:01",
            b'<html><head><title>One</title></head>'
            b'<body><a href="https://b.com/x">x</a>'
            b'<a href="https://c.com/y">y</a></body></html>',
        ),
        (
            "https://a.com/2",
            "2024-01-01 00:00:02",
            b"<html><head></head><body>no links</body></html>",
        ),
        ("https://a.com/3", "2024-01-01 00:00:03", None),  # NULL html
    ]
    return spark.createDataFrame(
        rows, "url string, ts string, html binary"
    ).select("url", F.col("ts").cast("timestamp").alias("warc_ts"), "html")


def test_wat_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wat")
    manifest = write_wat(_pages(spark).repartition(2), out).collect()
    assert sum(m.n_records for m in manifest) == 3
    paths = sorted(m.wet_file for m in manifest)
    assert all(p.endswith(".warc.wat.gz") for p in paths)
    back = parse_wat(read_warc(spark, paths, rec_types=("metadata",)))
    got = {r.url: r for r in back.collect()}
    assert got["https://a.com/1"].title == "One"
    assert got["https://a.com/1"].links == ["https://b.com/x", "https://c.com/y"]
    assert got["https://a.com/2"].title == ""
    assert got["https://a.com/2"].links == []
    # NULL html degrades to empty metadata, the row survives
    assert got["https://a.com/3"].title == ""
    assert got["https://a.com/3"].links == []
    assert got["https://a.com/1"].warc_ts.second == 1


def test_wat_envelope_is_published_shape(spark, tmp_path):
    out = str(tmp_path / "wat")
    paths = sorted(
        m.wet_file for m in write_wat(_pages(spark), out).collect()
    )
    rec = (
        read_warc(spark, paths, rec_types=("metadata",))
        .filter(F.col("url") == "https://a.com/1")
        .first()
    )
    env = json.loads(bytes(rec.html).decode())
    hm = env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    assert hm["Head"]["Title"] == "One"
    assert [l["url"] for l in hm["Links"]] == [
        "https://b.com/x",
        "https://c.com/y",
    ]


def test_wat_plan_is_exchange_free(spark):
    # the envelope projection must be pure codegen on the scan side
    df = _pages(spark)
    thin = df.select(
        "url", "warc_ts",
        __import__(
            "logai_spark.sources.warc", fromlist=["wat_payload_expr"]
        ).wat_payload_expr("html").alias("wat"),
    )
    plan = thin._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
