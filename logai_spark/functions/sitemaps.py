"""sitemap.xml -> URL discovery rows (the crawl-frontier seeding stage).

Production crawlers seed and refresh their frontier from sitemaps
(sitemaps.org protocol; robots.txt `Sitemap:` lines point at them).
:func:`sitemap_entries` parses a corpus of (domain, sitemap_xml) rows into
one row per `<url>` entry — loc, lastmod, changefreq, priority — plus
`<sitemap>` rows from index files (kind='sitemap') so a driver loop can
fetch nested sitemaps. The output feeds :func:`frontier.crawl_frontier`
directly (loc -> url, priority -> priority).

Scale shape: sitemaps are domain-bounded documents (the protocol caps one
file at 50k URLs / 50 MB), exactly like robots.txt — so the parse is a
row-local codegen projection: explode(split on closing tags) + regexp
extraction, ZERO shuffles, the corpus never moves. No Python, no XML
library: the sitemap protocol constrains documents to a flat fixed tag
set, which Java-regex extraction handles exactly (documented contract:
plain `<url>`/`<sitemap>` tags; `<![CDATA[..]]>` wrapping and the five
XML entities in `<loc>` are unescaped; anything without a `<loc>` is
dropped).

Reference surface: builder-brief web-pipeline extension; salesforce/logai
has no crawl analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# one fragment per entry: split AFTER each closing tag so every fragment
# holds at most one <url>..</url> or <sitemap>..</sitemap> body
_SPLIT_RE = r"(?<=</url>)|(?<=</sitemap>)"
_LOC_RE = r"(?s)<loc>\s*(?:<!\[CDATA\[)?\s*(.*?)\s*(?:\]\]>)?\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<]*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"<changefreq>\s*([^<]*?)\s*</changefreq>"
_PRIORITY_RE = r"<priority>\s*([^<]*?)\s*</priority>"


def _xml_unescape(col):
    """The five predefined XML entities, &amp; LAST so '&amp;lt;' becomes
    '&lt;' (the literal four characters), not '<'."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_entries(
    sitemaps: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(domain, sitemap_xml) -> one row per entry:
    (domain, kind 'url'|'sitemap', loc, lastmod, changefreq, priority).

    lastmod stays the raw W3C-datetime string (callers pick their parse —
    frontier scheduling only compares it ordinally, which W3C datetime
    supports lexicographically); priority is DOUBLE (protocol default 0.5
    when the tag is absent from a <url> entry, NULL on <sitemap> entries);
    changefreq NULL when absent. Entries without <loc> are dropped."""
    blk = F.col("_blk")
    loc = F.regexp_extract(blk, _LOC_RE, 1)
    # the governing tag is whichever of <url>/<sitemap> opens LAST in the
    # fragment (earlier occurrences belong to split-away predecessors)
    url_at = F.instr(blk, "<url>")
    smap_at = F.instr(blk, "<sitemap>")
    kind = F.when(url_at > smap_at, F.lit("url")).otherwise(F.lit("sitemap"))
    pr = F.regexp_extract(blk, _PRIORITY_RE, 1)
    return (
        sitemaps.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.split(F.coalesce(F.col(xml_col), F.lit("")), _SPLIT_RE)).alias(
                "_blk"
            ),
        )
        .filter((url_at > 0) | (smap_at > 0))
        .filter(loc != "")
        .select(
            "domain",
            kind.alias("kind"),
            _xml_unescape(loc).alias("loc"),
            F.nullif(F.regexp_extract(blk, _LASTMOD_RE, 1), F.lit("")).alias(
                "lastmod"
            ),
            F.nullif(F.regexp_extract(blk, _CHANGEFREQ_RE, 1), F.lit("")).alias(
                "changefreq"
            ),
            F.when(
                kind == "url",
                F.coalesce(pr.try_cast("double"), F.lit(0.5)),
            ).alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic fixture
# ---------------------------------------------------------------------------

_FREQS = ("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")


def synth_sitemap_xml(domain_id: int, n_urls: int = 12) -> str:
    """Deterministic sitemap for domain ``domain_id``. Every 4th domain is
    a sitemapindex; url entries cycle optional-tag presence, CDATA
    wrapping and &amp; entities so the parser's branches are all
    exercised."""
    if domain_id % 4 == 3:
        entries = "".join(
            f" <sitemap>\n  <loc>http://d{domain_id}.example/s{j}.xml</loc>\n"
            f"  <lastmod>2024-0{1 + j % 9}-1{j % 10}</lastmod>\n </sitemap>\n"
            for j in range(3 + domain_id % 3)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            f"{entries}</sitemapindex>"
        )
    rows = []
    for j in range(n_urls):
        path = f"/p{j}?a={j}&amp;b={domain_id}" if j % 3 == 0 else f"/page/{j}"
        loc = f"http://d{domain_id}.example{path}"
        if j % 5 == 4:
            loc = f"<![CDATA[{loc}]]>"
        parts = [f"  <loc>{loc}</loc>"]
        if j % 2 == 0:
            parts.append(f"  <lastmod>2024-0{1 + j % 9}-0{1 + j % 9}</lastmod>")
        if j % 3 == 0:
            parts.append(f"  <changefreq>{_FREQS[j % 7]}</changefreq>")
        if j % 4 != 1:
            parts.append(f"  <priority>0.{(j + domain_id) % 10}</priority>")
        rows.append(" <url>\n" + "\n".join(parts) + "\n </url>\n")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"{''.join(rows)}</urlset>"
    )


def synth_sitemap_rows(domain_id: int, n_urls: int = 12):
    """Oracle-side expected entries for :func:`synth_sitemap_xml`, computed
    from the SAME parameters but independently of the parser."""
    if domain_id % 4 == 3:
        return [
            (
                f"d{domain_id}.example",
                "sitemap",
                f"http://d{domain_id}.example/s{j}.xml",
                f"2024-0{1 + j % 9}-1{j % 10}",
                None,
                None,
            )
            for j in range(3 + domain_id % 3)
        ]
    out = []
    for j in range(n_urls):
        path = f"/p{j}?a={j}&b={domain_id}" if j % 3 == 0 else f"/page/{j}"
        out.append(
            (
                f"d{domain_id}.example",
                "url",
                f"http://d{domain_id}.example{path}",
                f"2024-0{1 + j % 9}-0{1 + j % 9}" if j % 2 == 0 else None,
                _FREQS[j % 7] if j % 3 == 0 else None,
                float(f"0.{(j + domain_id) % 10}") if j % 4 != 1 else 0.5,
            )
        )
    return out
