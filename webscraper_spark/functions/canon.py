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
