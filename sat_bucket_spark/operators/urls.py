"""URL-level filtering for crawl corpora (C4/CCNet/RefinedWeb lineage).

Before any text is read, a crawl pipeline drops documents whose URL alone
disqualifies them: non-web schemes, blocklisted domains, raw-IP hosts,
machine-generated deep paths and query-string explosions, and URLs whose
own text carries blocked terms. All row-local Column expressions — the
cheapest filter in the pipeline, so it runs first.

Reference scope: beyond sat-bucket; the rule set is the public common core
of the C4 / CCNet / RefinedWeb cleaning recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.parallel import ensure_parallelism

__all__ = [
    "host_link_edges",
    "normalize_url_expr",
    "url_dedup",
    "url_host_expr",
    "url_quality_flags",
]

DEFAULT_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def url_host_expr(url: Column | str) -> Column:
    """Lower-cased host part of a URL ('' when there is no scheme://host)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def normalize_url_expr(
    url: Column | str,
    drop_param_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
    strip_www: bool = False,
) -> Column:
    """Canonical form of a URL — the key URL-level dedup groups on.

    The same page is crawled under dozens of spellings; grouping on the
    raw string misses them all. Canonicalization (all Column expressions,
    portable to a SQL oracle):

    - fragment dropped (never sent to the server);
    - scheme and host lowercased; the scheme's default port (``:80`` for
      http, ``:443`` for https) dropped; optional leading ``www.`` strip;
    - path: duplicate slashes collapsed, trailing slashes dropped (the
      root path becomes empty, so ``http://h/`` == ``http://h``);
    - query: parameters whose NAME starts with any ``drop_param_prefixes``
      entry (tracking noise: utm_*, fbclid, …) removed, the survivors
      SORTED (param order is not semantic), ``?`` dropped when none
      survive.

    Percent-encoding normalization is out of scope (it needs a decode
    table; the common crawl dup classes above dominate). Inputs without a
    ``scheme://host`` pass through as ``trim(url)`` unchanged.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/+$", "")
    qs = F.when(
        F.length(pathq) > F.length(F.regexp_extract(pathq, r"^([^?]*)", 1)),
        F.substring(
            pathq,
            F.length(F.regexp_extract(pathq, r"^([^?]*)", 1)) + 2,
            F.lit(1 << 30),
        ),
    ).otherwise(F.lit(""))

    def _keep(p: Column) -> Column:
        name = F.substring_index(p, "=", 1)
        cond = p != ""
        for pref in drop_param_prefixes:
            cond = cond & ~name.startswith(pref)
        return cond

    params = F.array_sort(F.filter(F.split(qs, "&"), _keep))
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    rebuilt = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when((scheme == "") | (host == ""), u).otherwise(rebuilt)


def url_dedup(
    df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
    out: str = "norm_url",
    drop_param_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
    strip_www: bool = False,
) -> DataFrame:
    """Keep-first URL-level dedup: one survivor per canonical URL.

    The cheapest dedup in a crawl pipeline — it runs on the URL string
    alone, BEFORE any payload is parsed or shipped. Returns every input
    row with ``(norm_url, n_copies, kept)``; ``kept`` marks EXACTLY ONE
    row per group — the minimum ``id_col`` (keep-min-id, like every
    keep-first operator in this suite), with the raw URL string breaking
    id ties. Ties are the common case here, not a corner: crawl
    pipelines derive ``id_col`` from a content hash, and the same page
    fetched under two spellings of one canonical URL hashes identically
    — a min-id-only flag would mark BOTH copies kept and the dedup
    would pass its most typical duplicate straight through (caught by
    the bench funnel's URL gate). One shuffle, keyed on the canonical
    URL (the rank sort rides the same exchange).
    """
    from pyspark.sql import Window

    norm = normalize_url_expr(
        F.col(url_col),
        drop_param_prefixes=drop_param_prefixes,
        strip_www=strip_www,
    )
    w = Window.partitionBy(out)
    w_rank = Window.partitionBy(out).orderBy(F.col(id_col), F.col(url_col))
    return (
        df.withColumn(out, norm)
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("kept", F.row_number().over(w_rank) == 1)
    )


def host_link_edges(
    df: "DataFrame",
    url_col: str = "url",
    links_col: str = "links",
) -> "DataFrame":
    """Distinct host-level link edges ``(src_host, dst_host)`` from a page
    table with an outgoing-links array (``htmltext.html_links``).

    Self-edges (intra-site navigation) and rows with an unparseable host
    on either side are dropped — the result is the crawl's host graph,
    ready for ``graph.pagerank(directed=True)`` (link authority) or
    ``graph.connected_components`` (mirror-farm discovery). All Column
    expressions (explode + regexp), JVM-side; the DISTINCT is the only
    shuffle and is bounded by the host-pair cardinality, not page count.
    """
    exploded = df.select(
        url_host_expr(F.col(url_col)).alias("src_host"),
        F.explode(links_col).alias("__link"),  # generators can't nest in exprs
    )
    return (
        exploded.select(
            "src_host", url_host_expr(F.col("__link")).alias("dst_host")
        )
        .where(
            (F.col("src_host") != "")
            & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .distinct()
    )


def url_quality_flags(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = (),
    blocked_terms: tuple[str, ...] = (),
    max_path_depth: int = 8,
    max_query_len: int = 256,
    max_url_len: int = 2048,
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Per-rule URL filter flags plus the combined ``keep``.

    Rules (each an ``ok_*`` boolean so rejections are attributable):

    - ``ok_scheme``: http/https only;
    - ``ok_domain``: host is not a blocked domain nor a subdomain of one
      (suffix match on ``.domain``);
    - ``ok_not_ip``: host is not a raw IPv4 literal (crawler traps and
      misconfigured vhosts serve duplicate junk from bare IPs);
    - ``ok_path_depth``: at most ``max_path_depth`` ``/``-segments after
      the host (calendar/facet explosions live deep);
    - ``ok_query_len``: query string at most ``max_query_len`` chars
      (session ids, tracking blobs);
    - ``ok_url_len``: whole URL at most ``max_url_len`` chars;
    - ``ok_terms``: the lower-cased URL contains none of
      ``blocked_terms``.

    Scale: pure row-local expressions, no shuffle; the blocked lists fold
    into the plan as literals (keep them list-sized — thousands of
    entries belong in a broadcast-joined table instead). ``passthrough``
    names input columns to carry into the output unchanged (composed
    pipelines keep the gate row-local instead of re-scan self-joining).
    """
    u = F.col(url_col)
    lu = F.lower(u)
    host = url_host_expr(u)
    # strip scheme://host, then the query/fragment, leaving the path
    rest = F.regexp_replace(u, _HOST_RE, "")
    path = F.regexp_extract(rest, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    ok_scheme = lu.startswith("http://") | lu.startswith("https://")
    ok_domain = F.lit(True)
    for d in blocked_domains:
        dl = d.lower()
        ok_domain = ok_domain & (host != dl) & ~host.endswith("." + dl)
    ok_not_ip = ~host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != F.lit("")))
    ok_path_depth = depth <= F.lit(max_path_depth)
    ok_query_len = F.length(query) <= F.lit(max_query_len)
    ok_url_len = F.length(u) <= F.lit(max_url_len)
    ok_terms = F.lit(True)
    for t in blocked_terms:
        ok_terms = ok_terms & ~lu.contains(t.lower())

    return ensure_parallelism(df).select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        u.alias(url_col),
        ok_scheme.alias("ok_scheme"),
        ok_domain.alias("ok_domain"),
        ok_not_ip.alias("ok_not_ip"),
        ok_path_depth.alias("ok_path_depth"),
        ok_query_len.alias("ok_query_len"),
        ok_url_len.alias("ok_url_len"),
        ok_terms.alias("ok_terms"),
    ).withColumn(
        "keep",
        F.col("ok_scheme")
        & F.col("ok_domain")
        & F.col("ok_not_ip")
        & F.col("ok_path_depth")
        & F.col("ok_query_len")
        & F.col("ok_url_len")
        & F.col("ok_terms"),
    )
