"""URL hygiene for web-corpus governance (the RefinedWeb/C4/CCNet intake
stage): canonicalize scraped URLs and bucket them by registrable domain,
so dedup keys, domain-mix reports, and blocklist filters all see one
spelling per resource. Pure JVM expressions (lower/regexp) — these run in
the scan stage of a 100 TB crawl with zero Python.

No gmall-flink counterpart; extends the LLM training-data suite. The SQL
twins in queries/llm_pipeline mirror each rule 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, drop query string and
    fragment, strip the scheme's OWN default port (http:80 / https:443 —
    a non-default port is a different resource and stays), drop one
    trailing slash after a non-empty path segment (the root slash and
    pathological empty segments stay). Deliberately conservative —
    anything beyond these rules (utm-param whitelists, IDN, scheme
    upgrades) changes identity and belongs in policy, not the
    canonicalizer. A string with no ``//`` authority (mailto:, data:,
    relative paths) is returned UNCHANGED — applying host/path rules to
    it would mangle the scheme, and such strings aren't web resources
    this pipeline dedups."""
    c = F.col(url) if isinstance(url, str) else url
    # split at the authority boundary so each rule acts on one component:
    # scheme://host[:port] is case-insensitive by RFC 3986; the path is not
    head = F.regexp_extract(c, r"^([^/?#]*//[^/?#]*)", 1)
    rest = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    # the authority carries no / ? #, so the default-port rule anchors on
    # its trailing label — greedy .* lets userinfo (user:pass@host:443)
    # keep its own colons while the FINAL :port still strips; [^:] blocks
    # a degenerate empty port (host::80). A non-default port for the
    # scheme is a different resource and stays.
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://.*[^:]):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://.*[^:]):443$", r"$1")
    # path side: drop query+fragment, then one trailing slash after a
    # non-empty segment (the root slash and empty segments stay — the
    # segment pattern cannot reach into the // authority, already split)
    rest = F.regexp_replace(rest, r"[?#].*$", "")
    rest = F.regexp_replace(rest, r"(/[^/]+)/$", r"$1")
    return F.when(F.length(head) == 0, c).otherwise(F.concat(head, rest))


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL (userinfo and port stripped)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[^/]*//(?:[^/@?#]*@)?([^/:?#@]*)", 1))


def registered_domain(url: Column | str) -> Column:
    """Registrable-domain heuristic: the last two host labels
    (example.com from www.a.example.com). The honest stand-in for a
    public-suffix-list lookup — the PSL is a data file, not an
    algorithm; production swaps it in as a broadcast map join keyed on
    this column without touching the plan shape."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)
