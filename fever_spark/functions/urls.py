"""URL canonicalization as native Spark SQL expressions (JVM-side, no UDF).

Reproduces the reference's four probe shapes
(/root/reference/processing/bloom_handler.go:181-235):

    full URL   http://foo.bar.de:123/baz   (qualified if "://" present,
                                            else "http://" + host + url)
    host       foo.bar.de                  (the raw HTTP Host header)
    host+path  foo.bar.de:123/baz          (parsed Host incl. port + path)
    path       /baz

``parse_url`` is Catalyst's built-in (whole-stage-codegen'd); the only
subtlety is that Spark's HOST part excludes the port while Go's ``url.Host``
includes it, so host+path is reconstructed by stripping the scheme instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def full_url(host: Column, url: Column) -> Column:
    """bloom_handler.go:184-189: already-qualified URLs pass through, others
    get scheme+host prepended."""
    return F.when(url.contains("://"), url).otherwise(
        F.concat(F.lit("http://"), F.coalesce(host, F.lit("")), F.coalesce(url, F.lit(""))))


def url_path(full: Column) -> Column:
    """Path component (Go's u.Path, query string excluded). try_parse_url:
    the reference tolerates unparseable URLs by skipping the event
    (bloom_handler.go:192-197); ANSI parse_url would fail the whole job."""
    return F.try_parse_url(full, F.lit("PATH"))


def host_path(full: Column) -> Column:
    """Go's u.Host + u.Path — host INCLUDING port, then path. Strip
    "scheme://" and any userinfo ("user:pass@"), then cut at the first of
    '?' or '#' (Go's url.Parse drops userinfo from u.Host,
    bloom_handler.go:199)."""
    after_scheme = F.regexp_replace(full, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    no_userinfo = F.regexp_replace(after_scheme, r"^[^/@?#]*@", "")
    return F.regexp_extract(no_userinfo, r"^([^?#]*)", 1)


def probe_columns(host: Column, url: Column) -> dict[str, Column]:
    """All four probe strings for an (http_host, http_url) pair."""
    fu = full_url(host, url)
    return {
        "host": host,
        "url": fu,
        "hostpath": host_path(fu),
        "path": url_path(fu),
    }


def page_url_probes(url: Column) -> dict[str, Column]:
    """Probe shapes for the pages table's already-qualified ``url`` column:
    host (without scheme/port), full url, host+path, path."""
    return {
        "host": F.try_parse_url(url, F.lit("HOST")),
        "url": url,
        "hostpath": host_path(url),
        "path": url_path(url),
    }


# --------------------------------------------------------- canonicalization

# Tracking parameters dropped during canonicalization: the utm_* family plus
# the common click ids. Key comparison is case-insensitive.
TRACKING_PARAM_PREFIX = "utm_"
TRACKING_PARAMS = ("gclid", "fbclid", "ref")


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup of a web crawl — entirely JVM
    codegen (regexp + array ops, no UDF). Contract:

    - fragment removed;
    - scheme and host (incl. userinfo/port section) lowercased — path and
      query keep their case (paths are case-sensitive per RFC 3986);
    - default ports stripped (http://…:80, https://…:443);
    - tracking query params removed (``utm_*``, gclid, fbclid, ref),
      remaining params kept in original order; an emptied query drops '?';
    - single trailing slash on the path stripped
      (https://a.example/x/ == https://a.example/x, and bare
      https://a.example/ == https://a.example).

    Crawl dedup normalizes harder than fever's probe shapes (above) —
    those must stay byte-faithful to bloom_handler.go's matching; this is
    the training-pipeline key."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    prefix = F.regexp_extract(no_frag,
                              r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    prefix_lc = F.lower(prefix)
    prefix_norm = F.regexp_replace(
        F.regexp_replace(prefix_lc, r"^(http://.*):80$", "$1"),
        r"^(https://.*):443$", "$1")
    rest = F.substr(no_frag, F.length(prefix) + 1)
    path = F.substring_index(rest, "?", 1)
    query = F.when(rest.contains("?"),
                   F.substr(rest, F.length(path) + 2)).otherwise(F.lit(""))

    def _keep(p: Column) -> Column:
        key = F.lower(F.substring_index(p, "=", 1))
        return ~(key.startswith(TRACKING_PARAM_PREFIX)
                 | key.isin(*TRACKING_PARAMS))

    clean_q = F.array_join(F.filter(F.split(query, "&"), _keep), "&")
    path_norm = F.regexp_replace(path, r"/$", "")
    return F.concat(
        prefix_norm, path_norm,
        F.when(clean_q != "", F.concat(F.lit("?"), clean_q)).otherwise(F.lit("")))


def url_dedup_groups(df, url_col: str = "url", id_col: str = "doc_id"):
    """(canonical_url, n_dups, keep_id): dedup groups under canonical_url —
    one hash shuffle keyed by the canonical string, min-id canonical keep.
    The URL-level pass that runs BEFORE content dedup in a crawl pipeline
    (same crawl fetched via http/https, with/without tracking params)."""
    return (df.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                      F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min(id_col).alias("keep_id")))


# --------------------------------------------------------- domain filtering


def host_suffixes(url: Column, max_labels: int = 6) -> Column:
    """array<string> of the URL host's dot-suffixes, longest first:
    a.b.example.com → [a.b.example.com, b.example.com, example.com, com]
    (capped at ``max_labels`` labels — registrable domains are shallow).
    Pure JVM: split + transform + slice; the join key generator for
    suffix-matched blocklists."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    labels = F.split(host, r"\.")
    # cap by keeping the SHORTEST max_labels suffixes: blocklist entries
    # are mostly shallow registrable domains, so a deep host
    # (a.b.c.d.e.f.bad.tld) must still emit 'bad.tld' — start positions
    # run from size-max_labels+1 .. size, not 1 .. max_labels. Position 1
    # (the FULL host) is always prepended on top of the cap so an exact
    # deep-hostname blocklist entry keeps matching too; dedup via
    # array_distinct for shallow hosts where 1 is already in range.
    first = F.greatest(F.lit(1), F.size(labels) - F.lit(max_labels) + 1)
    starts = F.array_distinct(F.concat(
        F.array(F.lit(1)),
        F.sequence(first, F.greatest(F.size(labels), F.lit(1)))))
    return F.filter(
        F.transform(starts,
                    lambda i: F.array_join(F.slice(labels, i, F.size(labels)),
                                           ".")),
        lambda s: s != "")


def is_blocked_domain(url: Column, blocklist) -> Column:
    """True when the URL's host falls under any blocklisted domain,
    SUBDOMAINS INCLUDED — the C4-style URL-level filter (bad domains,
    boilerplate hosts) that runs before content ever parses.

    ``blocklist`` is an iterable of domains; it becomes a literal array in
    the plan and the check is ``arrays_overlap`` with the row's host
    suffixes (the full host + up to ``max_labels`` shortest suffixes, ≤7
    entries at the default) — pure whole-stage codegen, ZERO shuffle, zero join, zero
    Python, never a regex alternation that grows with the list. Literal
    arrays are the right shape for real blocklists (the public ones are
    thousands of entries, kilobytes of plan); for a million-domain list,
    join ``host_suffixes`` exploded against a broadcast domain table
    instead."""
    arr = F.array(*[F.lit(d.lower()) for d in blocklist])
    return F.arrays_overlap(host_suffixes(url), arr)


def filter_blocked_domains(df, blocklist, url_col: str = "url",
                           keep: bool = False):
    """Rows whose URL host is NOT under a blocklisted domain (or with
    ``keep=True``, only the blocked rows). One codegen filter on the scan
    — see is_blocked_domain for the plan shape."""
    hit = is_blocked_domain(F.col(url_col), blocklist)
    return df.filter(hit if keep else ~F.coalesce(hit, F.lit(False)))
