"""Web-page text extraction: the byte-identity invariant (BASELINE.json
input_hint) and generator determinism."""

from pyspark.sql import functions as F

from logai_spark.sources.webpages import (
    extract_text_reference,
    extract_text_udf,
    make_page,
    synth_webpages,
)


def test_generator_is_deterministic():
    a = make_page(42, 123)
    b = make_page(42, 123)
    assert a == b
    assert make_page(43, 123) != a


def test_extractor_reference_behavior():
    html = b"<html><head><script>drop me</script><style>.x{}</style></head>" \
           b"<body><p>hello &amp; world</p>\n<p>  spaced   out </p></body></html>"
    assert extract_text_reference(html) == "hello & world\nspaced out"


def test_udf_byte_identity_per_url(spark):
    pages = synth_webpages(spark, 300, seed=7)
    recomputed = pages.withColumn("text2", extract_text_udf()(F.col("html")))
    assert recomputed.filter(F.col("text") != F.col("text2")).count() == 0


def test_table_stable_across_partitionings(spark):
    a = synth_webpages(spark, 200, seed=1, partitions=2).select("url", "text", "lang")
    b = synth_webpages(spark, 200, seed=1, partitions=9).select("url", "text", "lang")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema(spark):
    df = synth_webpages(spark, 10)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"
