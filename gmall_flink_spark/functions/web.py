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
    """Canonical URL: lowercase scheme+host, strip a default port
    (:80/:443), drop query string and fragment, drop one trailing slash
    from a non-root path. Deliberately conservative — anything beyond
    these rules (utm-param whitelists, IDN, scheme upgrades) changes
    identity and belongs in policy, not the canonicalizer."""
    c = F.col(url) if isinstance(url, str) else url
    # scheme://host[:port] is case-insensitive by RFC 3986; the path is not
    head = F.regexp_extract(c, r"^([^/]*//[^/]*)", 1)
    rest = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    canon = F.concat(F.lower(head), rest)
    canon = F.regexp_replace(canon, r"^(https?://[^/:]*):(?:80|443)(/|$)", r"$1$2")
    canon = F.regexp_replace(canon, r"[?#].*$", "")
    return F.regexp_replace(canon, r"(.)/$", r"$1")


def url_host(url: Column | str) -> Column:
    """Lowercased host of a URL (port stripped)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[^/]*//([^/:?#]*)", 1))


def registered_domain(url: Column | str) -> Column:
    """Registrable-domain heuristic: the last two host labels
    (example.com from www.a.example.com). The honest stand-in for a
    public-suffix-list lookup — the PSL is a data file, not an
    algorithm; production swaps it in as a broadcast map join keyed on
    this column without touching the plan shape."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)
