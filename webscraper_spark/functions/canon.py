"""URL canonicalization — pure JVM column expressions (whole-stage codegen).

north_rule mandates: lowercase host, strip fragments and default ports, sort
query params. The reference's entire "canonicalization" is
`gsub('https://home.mobile.de/','').gsub('#ses','')`
(/root/reference/app/controllers/car_dealers_controller.rb:31); this
generalizes it. Native expressions (not UDFs) keep the hot path inside
codegen — at 10^10 URLs this runs on every outlink of every wave.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped,
    fragment stripped, query params sorted bytewise, empty path -> '/'.
    Non-URL strings pass through trimmed (defensive at corpus scale)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    authority = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.when(
        ((scheme == "https") & authority.endswith(":443")) | ((scheme == "http") & authority.endswith(":80")),
        F.regexp_replace(authority, ":[0-9]+$", ""),
    ).otherwise(authority)
    path = F.regexp_extract(u, _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, _URL_RE, 4)  # includes leading '?', '' if none
    q = F.when(
        F.length(rawq) > 1,
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(F.substring(rawq, 2, 1 << 30), "&")), "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, q)
    return F.when(scheme == "", u).otherwise(canon)


def url_host(url: Column) -> Column:
    """Host of an (ideally canonical) URL; '' for non-URLs."""
    return F.regexp_replace(F.lower(F.regexp_extract(url, _URL_RE, 2)), ":[0-9]+$", "")


def url_path(url: Column) -> Column:
    p = F.regexp_extract(url, _URL_RE, 3)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_hash(url: Column) -> Column:
    """64-bit identity used by the seen-set / bloom layers."""
    return F.xxhash64(url)


# ---------------------------------------------------------------------------
# Arrow engine — same semantics, one compiled-regex match per URL.
# The native expressions above re-evaluate the URL regex once per extracted
# component (~8 matches/URL); at outlink-expansion volume (millions of links
# per wave) that is the hot spot. Python's re matches ONCE and slices every
# group from the single Match. Equality with the native engine is enforced
# by test_canon.test_arrow_engine_matches_native.
# ---------------------------------------------------------------------------

import re as _re

import pandas as _pd
from pyspark.sql import functions as _F
from pyspark.sql import types as _T

_URL_RE_PY = _re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$")
_PORT_RE_PY = _re.compile(r":[0-9]+$")


def _canon_host_py(u: str) -> tuple[str, str]:
    u = u.strip(" ")  # F.trim strips spaces only
    m = _URL_RE_PY.match(u)
    if not m:
        return u, ""
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    if (scheme == "https" and auth.endswith(":443")) or (scheme == "http" and auth.endswith(":80")):
        auth = _PORT_RE_PY.sub("", auth)
    host = _PORT_RE_PY.sub("", auth)
    path = m.group(3) or "/"
    if path == "":
        path = "/"
    q = m.group(4) or ""
    q = "?" + "&".join(sorted(q[1:].split("&"))) if len(q) > 1 else ""
    return f"{scheme}://{auth}{path}{q}", host


@_F.pandas_udf(_T.StructType([_T.StructField("url", _T.StringType()), _T.StructField("host", _T.StringType())]))
def canon_host_arrow(raw: _pd.Series) -> _pd.DataFrame:
    pairs = [(None, None) if u is None else _canon_host_py(u) for u in raw]
    return _pd.DataFrame(pairs, columns=["url", "host"])


# ---------------------------------------------------------------------------
# Registered-domain extraction (public-suffix-style)
# ---------------------------------------------------------------------------

# Stand-in for the Mozilla Public Suffix List (the real list ships ~9k
# rules and updates weekly; the operator only needs the mechanism — at
# deployment the set is swapped for the full PSL, same plan shape). Keys
# are TWO-LABEL public suffixes; every one-label TLD is implicitly a
# public suffix.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)


def registered_domain(host: Column) -> Column:
    """The registrable domain of a hostname: the public suffix plus one
    label ('www.shop.example.co.uk' -> 'example.co.uk',
    'a.b.example.com' -> 'example.com').

    Politeness, budgets, and spam scoring must key on the REGISTRABLE
    domain, not the hostname — one site fans out over countless
    subdomains (s1.example.com, s2.example.com...), and host-keyed
    politeness would hammer the one origin behind them with
    per-subdomain budgets. Pure codegen: grab the last two / three
    labels with anchored regexes, pick three when the last two are a
    two-level public suffix. Hosts with fewer labels than the rule
    needs (bare TLDs, 'localhost') pass through unchanged.
    """
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_two_level = F.lower(last2).isin(*TWO_LEVEL_SUFFIXES)
    return F.when(is_two_level & (last3 != ""), last3).otherwise(
        F.when(last2 != "", last2).otherwise(host)
    )


# Tracking parameters stripped by strip_tracking_params — the same set
# urlfilter.TRACKING_RE flags (its 'keep:strip_tracking' verdict is the
# signal; this is the canonicalization it asks for). Public lists
# (AdGuard's $removeparam rules) run to hundreds of entries; the set here
# is the documented mechanism-sized stand-in, like urlfilter's blocklist.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref|mc_eid)="


def strip_tracking_params(url: Column) -> Column:
    """URL with tracking query parameters removed, all codegen.

    Split the query string on '&', drop parameters whose NAME matches
    TRACKING_PARAM_RE, rejoin; the '?' disappears when nothing survives
    and the fragment is preserved verbatim. Parameter ORDER of the
    survivors is preserved (this composes with canonicalize_url, which
    sorts them). URLs without a query pass through unchanged — the whole
    expression is JVM-side (higher-order filter + array_join), so it
    belongs in the same scan-fused projection as canonicalize_url."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    frag = F.regexp_extract(url, r"(#.*)$", 1)
    kept = F.filter(
        F.split(query, "&"), lambda p: ~p.rlike(TRACKING_PARAM_RE)
    )
    newq = F.array_join(kept, "&")
    return F.concat(
        base,
        F.when((query != "") & (newq != ""), F.concat(F.lit("?"), newq)).otherwise(F.lit("")),
        frag,
    )
