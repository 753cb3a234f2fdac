"""URL normalization & per-domain curation over the pages table.

Common-Crawl-style pipelines dedup by normalized URL and cap documents
per registrable domain (C4/RefinedWeb recipe) before any content-level
stage, because URL-level ops are O(rows) pure-Column work while content
dedup shuffles payloads. Everything here is JVM-side regex/string
Columns — one scan, and the per-domain cap is a single window keyed by
a column with natural cardinality (domains), so the shuffle is the
minimal one the semantics require. A pathological single-domain crawl
would skew that window; the cap itself is the mitigation (rank > cap
rows are dropped on the spot, and at real scale the window can be
preceded by the same salted two-stage pattern as pipeline/link.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host (path case preserved),
    fragment stripped, the scheme's OWN default port removed (:80 for
    http, :443 for https — http://host:443 is a real non-default port
    and must survive), trailing-slash-only-path removed. Deterministic
    string surgery — no parser dependency."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host, keep the rest as-is
    head = F.lower(F.regexp_extract(no_frag, r"^([^/]*//[^/:?#]+)", 1))
    tail = F.regexp_replace(no_frag, r"^[^/]*//[^/:?#]+", "")
    tail = (
        F.when(head.startswith("http://"),
               F.regexp_replace(tail, r"^:80(?=/|$)", ""))
        .when(head.startswith("https://"),
              F.regexp_replace(tail, r"^:443(?=/|$)", ""))
        .otherwise(tail)
    )
    tail = F.regexp_replace(tail, r"^/$", "")
    return F.concat(head, tail)


_TRACKING_RE = "^(utm_|fbclid|gclid|msclkid)"


def canonicalize_url(url: Column) -> Column:
    """Full crawl-dedup canonicalization: normalize_url's surgery
    (fragment, case, default port, trailing slash) PLUS query-string
    handling — tracking parameters (utm_*, fbclid, gclid, msclkid)
    dropped, surviving parameters sorted lexicographically so
    ?b=2&a=1 and ?a=1&b=2 collapse to one key. Pure-Column split /
    filter / array_sort / join — no UDF, no shuffle; this is the key
    expression a URL-level dedup groups by before any content stage
    touches payloads."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = normalize_url(F.regexp_replace(no_frag, r"\?.*$", ""))
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    ))
    return F.when(
        F.size(params) > 0,
        F.concat(base, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(base)


def host_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def domain_of(url: Column) -> Column:
    """Registrable-domain heuristic: the last two labels of the host
    (a public-suffix list is a deployment lookup table broadcast into
    this same expression; the container ships none)."""
    return F.regexp_extract(host_of(url), r"([^.]+\.[^.]+)$", 1)


def host_link_graph(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links): the hyperlink host graph
    extracted from raw page HTML — the web-graph construction step a
    Common-Crawl pipeline runs before any host-level ranking. href
    values come out of the decoded bytes with one JVM-side
    regexp_extract_all (no Python in the loop); hrefs without an
    absolute scheme://host (relative links, mailto:, javascript:)
    yield an empty host and are dropped. Plan: one page scan + explode
    + one groupBy keyed by the host PAIR — hosts are bounded
    cardinality vs pages, so the aggregate output is graph-sized, and
    the map-side combine collapses each page's repeated links before
    the shuffle. Head-host skew (everyone links to the same CDN) is
    the same salted two-stage pattern as pipeline/link.py when it
    bites; lowercase-host canonicalization rides in host_of."""
    hrefs = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"),
        F.lit(r'href="([^"]*)"'), 1,
    )
    return (
        pages.select(
            host_of(F.col(url_col)).alias("src_host"),
            F.explode(hrefs).alias("_href"),
        )
        .select("src_host", host_of(F.col("_href")).alias("dst_host"))
        .where(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(domain, n_pages, n_hosts) — the audit aggregate behind cap
    decisions. One partial-aggregating groupBy."""
    return (
        pages.select(
            domain_of(F.col(url_col)).alias("domain"),
            host_of(F.col(url_col)).alias("_host"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count_distinct("_host").alias("n_hosts"),
        )
    )


def cap_per_domain(
    pages: DataFrame, max_pages: int, url_col: str = "url"
) -> DataFrame:
    """Keep at most `max_pages` pages per registrable domain,
    deterministically (rank by normalized URL — reruns and repartitions
    keep the same survivors). Adds the `domain` column."""
    from pyspark.sql import Window

    norm = normalize_url(F.col(url_col))
    w = Window.partitionBy("domain").orderBy("_norm_url")
    return (
        pages.withColumn("domain", domain_of(F.col(url_col)))
        .withColumn("_norm_url", norm)
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= max_pages)
        .drop("_rank", "_norm_url")
    )
