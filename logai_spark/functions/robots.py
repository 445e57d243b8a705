"""robots.txt rules -> URL filter (the crawl-politeness curation stage).

Production web pipelines (RefinedWeb §3.1, Dolma) honor robots exclusions
when (re)using crawl data. Two operators:

- :func:`robots_rules` — parse a robots corpus (domain, robots_txt) into
  (domain, prefix) Disallow rules for ``User-agent: *`` sections. The
  1994 prefix semantics, deliberately: no ``*``/``$`` wildcards, no
  Allow-overrides (documented contract; wildcard rules pass through as
  literal prefixes that match nothing, the conservative-for-us direction).
  Parsing is Spark-native: posexplode lines, a per-domain window assigns
  each line to its governing User-agent BLOCK (a maximal run of
  consecutive ``User-agent:`` lines), the block's star flag is one
  partial agg, and Disallow lines join it back. Windows partition by
  DOMAIN — robots files are KBs, so no hot partition exists by
  construction.
- :func:`robots_filter` — drop (or flag) corpus URLs whose path starts
  with any of their domain's disallow prefixes. Rules fold to ONE array
  row per domain (collect_list, bounded by robots-file size) and
  broadcast; the probe is ``exists(rules, p -> startswith(path, p))`` —
  pure codegen, the corpus never shuffles (same shape as the URL
  blocklist stage).

Reference surface: builder-brief web-pipeline extension; salesforce/logai
has no crawl-politeness analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from logai_spark.functions.textops import url_domain_expr

# Scheme/host are case-insensitive per RFC 3986; the PATH is not — so the
# scheme prefix here tolerates case without lowercasing the captured path.
PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$"


def _star_blocks(
    robots: DataFrame, domain_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared section parser: returns (marked_lines, star_blocks) where
    marked_lines = (domain, pos, line, block) with every line assigned to
    its governing User-agent BLOCK, and star_blocks = the (domain, block)
    pairs whose UA set includes ``*``."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(text_col, r"\r?\n")).alias("pos", "line"),
    ).select(
        "domain",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    )
    is_ua = F.lower("line").startswith("user-agent:")
    ua_val = F.trim(F.expr("substring(line, 12)"))
    w = Window.partitionBy("domain").orderBy("pos")
    marked = lines.select(
        "domain",
        "pos",
        "line",
        is_ua.alias("_ua"),
        (is_ua & (ua_val == "*")).alias("_star"),
    ).withColumn(
        # a UA line NOT preceded by a UA line opens a new block; block id =
        # running count of openers, so every line maps to the governing
        # block above it (block 0 = header lines before any UA section)
        "block",
        F.sum(
            (F.col("_ua") & ~F.coalesce(F.lag("_ua").over(w), F.lit(False)))
            .cast("int")
        ).over(w),
    )
    star_blocks = (
        marked.filter("_ua")
        .groupBy("domain", "block")
        .agg(F.max(F.col("_star").cast("int")).alias("_s"))
        .filter(F.col("_s") == 1)
        .select("domain", "block")
    )
    return marked, star_blocks


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, prefix) Disallow rules from ``User-agent: *`` sections.
    Lines are trimmed and matched case-insensitively on the directive
    name; empty Disallow values (= allow all) are dropped."""
    marked, star_blocks = _star_blocks(robots, domain_col, text_col)
    disallow = marked.filter(
        F.lower("line").startswith("disallow:")
    ).select(
        "domain",
        "block",
        F.trim(F.expr("substring(line, 10)")).alias("prefix"),
    ).filter(F.col("prefix") != "")
    return disallow.join(star_blocks, ["domain", "block"]).select(
        "domain", "prefix"
    ).distinct()


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    action: str = "drop",
    flag_col: str = "robots_blocked",
) -> DataFrame:
    """Remove (``action='drop'``) or flag (``action='flag'``) rows whose
    URL path falls under a Disallow prefix of its domain. One broadcast
    LEFT join on the domain + a codegen exists() probe — the corpus never
    shuffles; URLs on domains with no rules pass."""
    # Host matching is case-insensitive and port-blind (RFC 3986): lowercase
    # BOTH sides so 'HTTP://A.com/x' cannot bypass a.com's Disallow rules,
    # and reuse url_domain_expr (lowercased host, :port stripped) so the
    # key agrees with crawl_frontier / the domain-blocklist stages.
    per_domain = rules.groupBy(
        F.lower("domain").alias("_rdom")  # never shadow a caller column
    ).agg(F.collect_list("prefix").alias("_rules"))
    host = url_domain_expr(F.col(url_col))
    path = F.coalesce(F.regexp_extract(F.col(url_col), PATH_RE, 1), F.lit(""))
    blocked = F.when(
        F.col("_rules").isNull(), F.lit(False)
    ).otherwise(
        F.exists(
            "_rules",
            lambda p: F.startswith(
                F.when(path == "", F.lit("/")).otherwise(path), p
            ),
        )
    )
    j = urls.join(
        F.broadcast(per_domain), host == per_domain["_rdom"], "left"
    ).drop("_rdom")
    if action == "flag":
        return j.withColumn(flag_col, blocked).drop("_rules")
    return j.filter(~blocked).drop("_rules")


def _rule_regex_expr(pattern):
    """Translate a robots path pattern (RFC 9309 §2.2.2-2.2.3: literal
    prefix, ``*`` = any run, trailing ``$`` = end anchor) to a Java regex —
    pure codegen over the BOUNDED rules table, never the corpus."""
    ends = F.endswith(pattern, F.lit("$"))
    core = F.when(
        ends, F.substring(pattern, F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    # escape regex metachars except '*' (translated below); '$' inside the
    # pattern is literal once the trailing anchor is stripped
    esc = F.regexp_replace(core, r"[.\\+?(){}\[\]|^$]", r"\\$0")
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def robots_rules_rfc9309(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, pattern, is_allow, plen, regex) — the RFC 9309 rule set
    for ``User-agent: *`` sections: both Allow and Disallow lines, with
    the pattern's regex translation (``*`` any-run, trailing ``$``
    anchor) and its octet length ``plen`` for longest-match precedence.
    Same Spark-native section parser as :func:`robots_rules` (which keeps
    the deliberately conservative 1994 prefix contract); this is the
    standards-compliant variant for pipelines that must honor Allow
    overrides."""
    marked, star_blocks = _star_blocks(robots, domain_col, text_col)
    def _directive(prefix: str, is_allow: bool) -> DataFrame:
        return marked.filter(
            F.lower("line").startswith(prefix)
        ).select(
            "domain",
            "block",
            F.trim(F.expr(f"substring(line, {len(prefix) + 1})")).alias("pattern"),
            F.lit(is_allow).alias("is_allow"),
        )

    rules = (
        _directive("disallow:", False)
        .unionByName(_directive("allow:", True))
        .filter(F.col("pattern") != "")
    )
    return (
        rules.join(star_blocks, ["domain", "block"])
        .select("domain", "pattern", "is_allow")
        .distinct()
        .select(
            "domain",
            "pattern",
            "is_allow",
            F.length("pattern").alias("plen"),
            _rule_regex_expr(F.col("pattern")).alias("regex"),
        )
    )


def robots_filter_rfc9309(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    action: str = "drop",
    flag_col: str = "robots_blocked",
) -> DataFrame:
    """RFC 9309 URL filter: among the URL's domain rules whose pattern
    matches its path, the LONGEST pattern wins; on a length tie Allow
    wins (§2.2.2). Same scale shape as :func:`robots_filter` — rules fold
    to one bounded array row per domain and BROADCAST, the probe is a
    codegen filter/array_max over the struct array; the corpus never
    shuffles. ``regexp_like`` compiles per (row, rule) since patterns ride
    the rule structs — bounded by robots-file size, and only rows on
    domains that HAVE rules pay it (NULL-rules rows short-circuit)."""
    per_domain = rules.groupBy(
        F.lower("domain").alias("_rdom")
    ).agg(
        F.collect_list(F.struct("regex", "is_allow", "plen")).alias("_rules")
    )
    host = url_domain_expr(F.col(url_col))
    raw_path = F.coalesce(F.regexp_extract(F.col(url_col), PATH_RE, 1), F.lit(""))
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    matching = F.filter(
        "_rules", lambda r: F.regexp_like(path, r["regex"])
    )
    chosen = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                r["plen"].alias("plen"),
                r["is_allow"].cast("int").alias("a"),
            ),
        )
    )
    blocked = F.when(F.col("_rules").isNull(), F.lit(False)).otherwise(
        (F.size(matching) > 0) & (chosen["a"] == 0)
    )
    j = urls.join(
        F.broadcast(per_domain), host == per_domain["_rdom"], "left"
    ).drop("_rdom")
    if action == "flag":
        return j.withColumn(flag_col, blocked).drop("_rules")
    return j.filter(~blocked).drop("_rules")


def robots_delays(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, delay_ms) from ``Crawl-delay:`` lines in ``User-agent: *``
    sections — the nonstandard-but-ubiquitous politeness directive
    (seconds, fractional allowed). Non-numeric values are ignored; a
    domain stating several star-section delays keeps the LARGEST (the
    conservative reading). Feed the result straight into
    :func:`logai_spark.functions.frontier.crawl_frontier` as its
    ``delays`` table — rules gate WHAT may be fetched, delays pace WHEN."""
    marked, star_blocks = _star_blocks(robots, domain_col, text_col)
    delays = (
        marked.filter(F.lower("line").startswith("crawl-delay:"))
        .select(
            "domain",
            "block",
            (F.trim(F.expr("substring(line, 13)")).try_cast("double") * 1000)
            .try_cast("long")
            .alias("delay_ms"),
        )
        .filter(F.col("delay_ms").isNotNull() & (F.col("delay_ms") >= 0))
    )
    return (
        delays.join(star_blocks, ["domain", "block"])
        .groupBy("domain")
        .agg(F.max("delay_ms").alias("delay_ms"))
    )


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(domain, sitemap_url) from ``Sitemap:`` lines — the discovery hook
    that links robots.txt to :func:`logai_spark.functions.sitemaps
    .sitemap_entries`. Per the sitemaps.org protocol the directive is
    GLOBAL (independent of any User-agent section), takes an absolute
    URL, and may repeat; relative or schemeless values are ignored (the
    protocol requires absolute). Row-local explode+filter plus one
    bounded distinct — robots files are domain-bounded KBs."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")).alias(
            "_line"
        ),
    ).select(
        "domain", F.trim(F.regexp_replace("_line", r"#.*$", "")).alias("_line")
    )
    url = F.trim(F.expr("substring(_line, 9)"))
    return (
        lines.filter(F.lower("_line").startswith("sitemap:"))
        .select("domain", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"))
        .distinct()
    )
