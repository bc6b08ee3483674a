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
