"""URL and PII functions for the web-pages corpus.

A Common-Crawl-style pipeline needs to bucket documents by host/domain
(for per-site rate caps and host-level dedup) and to scrub obvious PII
before a corpus ships. Everything here is pure Column algebra over Java
regexes chosen from the common Java-regex/RE2 subset, so each function
has an exact DuckDB twin for the oracle and the whole scan stays in one
codegen'd JVM stage — no Python, no shuffle, 100 TB-safe.

Reference parity note: the reference engine (SedonaDB) has no URL/text
surface — these extend the engine for the training-data pipeline the
north rule targets (web pages keyed by url).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, functions as F

# --------------------------------------------------------------------------
# URL parsing
# --------------------------------------------------------------------------
# Hand-rolled regexes rather than Spark's parse_url(): parse_url is
# Hive-compatible but has no DuckDB equivalent, and the oracle needs the
# exact same extraction on both engines.

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased hostname (userinfo and port stripped), '' if absent."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_port(url: Column) -> Column:
    """Explicit port as int, NULL when none is present."""
    p = F.regexp_extract(url, _PORT_RE, 1)
    return F.when(p != "", p.cast("int"))


def url_path(url: Column) -> Column:
    """Path component ('' for scheme://host with no slash)."""
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    """Query string without the '?', '' if absent."""
    return F.regexp_extract(url, _QUERY_RE, 1)


def url_domain(url: Column) -> Column:
    """Registrable-domain approximation: last two dot-labels of the host.

    A full public-suffix list is data, not code; at corpus scale the
    2-label cut is the standard cheap proxy (documents '.co.uk'-style
    hosts as a known approximation).
    """
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def normalize_url(url: Column) -> Column:
    """Canonical URL for url-level dedup:

    - scheme and host lowercased (path/query case preserved)
    - fragment dropped
    - default ports (:80 for http, :443 for https) dropped
    - ``utm_*`` tracking parameters dropped, separators re-tidied
    - trailing '?' dropped

    The same 6-step regex chain runs in the DuckDB oracle.
    """
    # 1. drop fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase the scheme://host[:port] prefix only
    prefix = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(F.lower(prefix), rest)
    # 3. default ports (no lookahead — RE2/oracle compatibility: the
    # optional tail group substitutes '' when absent in both dialects)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#].*)?$", r"$1$2")
    # 4. utm_* params — anchored to a '?'/'&' separator so a non-tracking
    #    param whose NAME merely contains 'utm_' (e.g. ?xutm_a=1) survives;
    #    the (...)+ eats a run of consecutive utm params in one pass
    u = F.regexp_replace(u, r"([?&])(utm_[A-Za-z_]*=[^&#]*&)+", r"$1")
    u = F.regexp_replace(u, r"[?&]utm_[A-Za-z_]*=[^&#]*", "")
    # 5. '?&' left when the first param was dropped but others remain
    u = F.regexp_replace(u, r"\?&", "?")
    # 6. trailing '?' when every param was dropped
    u = F.regexp_replace(u, r"\?$", "")
    return u


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-ish phone: optional +, then 9..15 digits with separators
PHONE_RE = r"\+?[0-9][0-9 ()\-]{7,13}[0-9]"


def pii_counts(text: Column) -> Dict[str, Column]:
    """Match counts per PII class (emails / IPv4 / phone-shaped runs)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_ipv4": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace PII with typed placeholders.

    Order matters and is part of the contract: emails first (their local
    parts can contain digits), then IPv4 (so the phone rule cannot eat
    dotted quads), then phone-shaped digit runs.
    """
    t = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, IPV4_RE, "<IP>")
    t = F.regexp_replace(t, PHONE_RE, "<PHONE>")
    return t
