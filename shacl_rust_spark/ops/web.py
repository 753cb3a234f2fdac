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


def url_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_variants, kept_url): URL-level duplicate
    groups — canonicalize_url as the grouping key, deterministic
    survivor = lexicographically smallest raw variant, only groups
    with ≥2 variants emitted (the dedup decision table a crawl
    pipeline joins back as an anti-join). One scan + one groupBy on
    the canonical key; the agg output is bounded by duplicate groups,
    tiny next to the frontier, and both aggregates combine
    map-side."""
    return (
        pages.select(
            F.col(url_col).alias("url"),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("url").alias("kept_url"),
        )
        .where(F.col("n_variants") > 1)
    )


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


def anchor_text_terms(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    top_k: int = 5,
) -> DataFrame:
    """(dst_host, term, n_anchors, rank): anchor-text terms aggregated
    per link TARGET host — the classic web-search relevance signal
    (anchor text describes the page it points AT, not the page it sits
    on), and at corpus scale the cheapest per-host description table a
    KG pipeline gets for free from the crawl. One JVM-side
    regexp_extract_all pulls whole <a> tags out of the decoded bytes;
    href-host and anchor text come off each exploded tag with two more
    regexes (no Python anywhere). Terms are lower-cased
    whitespace-split anchor words; the aggregate is keyed by
    (dst_host, term) — bounded by hosts × vocabulary, graph-sized, so
    map-side combine collapses per-page repeats before the shuffle.
    The top-k cut is one window per dst_host ordered by
    (n_anchors desc, term asc) — deterministic; CDN-style head hosts
    skewing the window get the same salted two-stage treatment as
    pipeline/link.py when it bites."""
    from pyspark.sql import Window

    tags = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"),
        F.lit(r'<a href="[^"]*"[^>]*>[^<]*</a>'), 0,
    )
    anchors = (
        pages.select(F.explode(tags).alias("_tag"))
        .select(
            host_of(
                F.regexp_extract("_tag", r'href="([^"]*)"', 1)
            ).alias("dst_host"),
            F.regexp_extract("_tag", r">([^<]*)</a>", 1)
            .alias("_anchor"),
        )
        .where(F.col("dst_host") != "")
    )
    counts = (
        anchors.select(
            "dst_host",
            F.explode(
                F.split(F.trim(F.lower(F.col("_anchor"))), " +")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n_anchors"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n_anchors"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def crawl_schedule(
    pages: DataFrame, delay_ms: int = 1000, url_col: str = "url"
) -> DataFrame:
    """(host, url, wave, scheduled_ms): per-host politeness scheduling
    — the fetch planner every crawler runs before hitting the network.
    URLs of one host are serialized `delay_ms` apart (wave = 0-based
    position within the host, ordered by URL so reruns schedule
    identically); different hosts proceed in parallel, which is
    exactly the one window partitionBy(host) this compiles to — the
    shuffle key is the natural parallelism unit of polite crawling.
    No global sequence column on purpose: a total fetch order is a
    SinglePartition sort (olap_zorder's documented cut); writers
    instead partition output by wave and let each wave's files be
    fetched concurrently."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("url")
    return (
        pages.select(
            F.col(url_col).alias("url"),
            host_of(F.col(url_col)).alias("host"),
        )
        .withColumn(
            "wave", (F.row_number().over(w) - 1).cast("bigint")
        )
        .withColumn(
            "scheduled_ms",
            (F.col("wave") * F.lit(delay_ms)).cast("bigint"),
        )
    )


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """urls(url) × rules(host, path_prefix, allow) →
    (url, host, matched_prefix, allowed): RFC 9309 robots.txt rule
    matching — among the url's host's rules whose path_prefix is a
    string prefix of the url path, the LONGEST wins; on equal length
    Allow beats Disallow; a url with no matching rule (or no rules at
    all) is allowed. The rules frame is the parsed per-host robots
    corpus — millions of rows at crawl scale but tiny next to the URL
    frontier, so it broadcasts: one broadcast left join keyed by host,
    then one window per url picks the winning rule
    (matched desc, prefix length desc, allow desc, prefix asc —
    fully deterministic). Root path normalizes to '/' so bare
    http://host matches '/' rules. Output is a DECISION TABLE keyed
    by DISTINCT url (made explicit with dropDuplicates): a frontier
    with repeated urls collapses here — consumers needing per-row
    verdicts join this table back on url."""
    from pyspark.sql import Window

    path = F.regexp_replace(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""
    )
    u = urls.select(
        "url",
        host_of(F.col("url")).alias("host"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("_path"),
    ).dropDuplicates(["url"])
    j = u.join(F.broadcast(rules), "host", "left").withColumn(
        "_matched",
        F.col("path_prefix").isNotNull()
        & F.col("_path").startswith(F.col("path_prefix")),
    )
    w = Window.partitionBy("url").orderBy(
        F.desc("_matched"),
        F.desc(F.length(F.coalesce("path_prefix", F.lit("")))),
        F.desc(F.coalesce("allow", F.lit(False))),
        F.asc("path_prefix"),
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url", "host",
            F.when(F.col("_matched"), F.col("path_prefix"))
            .alias("matched_prefix"),
            F.when(
                F.col("_matched"),
                F.col("allow").cast("int"),
            ).otherwise(F.lit(1)).alias("allowed"),
        )
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


def extract_structured_data(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, item_type, item_name, price): schema.org structured data
    lifted from embedded <script type="application/ld+json"> blocks —
    the Web Data Commons recipe, and the highest-precision triple
    source a Common-Crawl KG pipeline has (publishers annotate their
    own entities). One regexp_extract pulls the first JSON-LD block
    out of the decoded bytes; typed fields come off with JVM-side
    get_json_object path expressions (no Python JSON parsing in the
    scan). Pages without a block drop out via the NULL filter. One
    scan, zero shuffles; at corpus scale this is a pure map stage that
    pipelines into whatever aggregate consumes it. Full multi-block /
    @graph expansion belongs to the RDF layer (rdf/jsonld.py) — this
    is the flat-scan fast path for the common single-entity page."""
    block = F.regexp_extract(
        F.decode(F.col(html_col), "UTF-8"),
        r'<script type="application/ld\+json">([^<]*)</script>', 1,
    )
    return (
        pages.select(F.col(url_col).alias("url"), block.alias("_j"))
        .where(F.col("_j") != "")
        .select(
            "url",
            F.get_json_object("_j", "$['@type']").alias("item_type"),
            F.get_json_object("_j", "$.name").alias("item_name"),
            F.get_json_object("_j", "$.offers.price").cast("bigint")
            .alias("price"),
        )
    )


def sitemap_discovery(
    pages: DataFrame,
    frontier: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """(host, loc): URLs found in sitemap <loc> entries that are NOT
    already in the crawl frontier — the discovery step a crawler runs
    on every sitemap fetch. One regexp_extract_all over the decoded
    bytes, a distinct, and a LEFT ANTI join against the frontier
    keyed by the full URL (the frontier side is the big one at crawl
    scale; the anti join shuffles both on the URL key once — or rides
    an existing frontier bucketing, the olap_bucketed_join contract).
    Relative <loc> values (no scheme://host) are dropped — sitemaps
    require absolute URLs."""
    locs = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"),
        F.lit(r"<loc>([^<]*)</loc>"), 1,
    )
    found = (
        pages.select(F.explode(locs).alias("loc"))
        .where(host_of(F.col("loc")) != "")
        .dropDuplicates(["loc"])
    )
    return found.join(
        frontier.select(F.col("url").alias("loc")), "loc", "left_anti"
    ).select(host_of(F.col("loc")).alias("host"), "loc")


def resolve_redirects(
    redirects: DataFrame, max_doublings: int = 16
) -> DataFrame:
    """(url, final_url, hops): follow an HTTP redirect map (url ->
    target, at most one outgoing edge per url) to its terminal —
    the canonical-URL resolution a crawler runs before frontier
    insertion and dedup.

    Chain-following is the textbook pointer-jumping problem: a naive
    per-hop join needs L rounds for length-L chains, so this runs
    POINTER DOUBLING — each round joins the current pointer table with
    itself (f(x) <- f(f(x)), hops added), reaching terminals in
    ceil(log2 L) rounds. Every round is one equi-join shuffled on the
    pointer key, checkpointed so the lineage stays flat; at 10^12 urls
    that's ~40 shuffles for chains up to a trillion hops — chains in
    real crawl data are < 30 hops, i.e. 5 rounds. Rows whose pointer
    has no outgoing edge are terminal; a redirect CYCLE never
    terminates and is cut off at max_doublings with resolved=false
    (browsers give up after ~20 hops for the same reason).
    """
    cur = (
        redirects.select(
            F.col("url").cast("string").alias("url"),
            F.col("target").cast("string").alias("ptr"),
            F.lit(1).alias("hops"),
            F.lit(False).alias("done"),
        )
        .where(F.col("url").isNotNull() & F.col("ptr").isNotNull())
        .dropDuplicates(["url"])
        .localCheckpoint(eager=True)
    )
    base = cur.select(F.col("url").alias("j_url"),
                      F.col("ptr").alias("j_ptr"),
                      F.col("hops").alias("j_hops"))
    for _ in range(max_doublings):
        # done rows point at a terminal (ptr has no out-edge) — the
        # left join keeps them fixed, so one loop handles both.
        nxt = (
            cur.join(base, cur["ptr"] == base["j_url"], "left")
            .select(
                "url",
                F.coalesce("j_ptr", "ptr").alias("ptr"),
                (F.col("hops")
                 + F.coalesce("j_hops", F.lit(0))).alias("hops"),
                F.col("j_url").isNull().alias("done"),
            )
            .localCheckpoint(eager=True)
        )
        # base doubles too: f(f(x)) composed with itself next round
        base = nxt.select(F.col("url").alias("j_url"),
                          F.col("ptr").alias("j_ptr"),
                          F.col("hops").alias("j_hops"))
        cur = nxt
        if cur.where(~F.col("done")).isEmpty():
            break
    return cur.select(
        "url",
        F.col("ptr").alias("final_url"),
        F.col("hops").cast("long").alias("hops"),
        F.col("done").alias("resolved"),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key: host labels
    reversed and comma-joined, then ')' and the path — the CDX index
    sort key web archives use so one registrable domain's records are
    contiguous (test,example)/page. Pure Column string surgery."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    path = F.regexp_replace(
        F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
        r"#.*$", "")
    return F.concat(
        F.concat_ws(",", F.reverse(F.split(host, r"\."))),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )
