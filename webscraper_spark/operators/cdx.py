r"""CDX capture index: SURT url keys + per-record index rows over WARC.

Web archives pair every WARC shard with a CDX(J) index — one line per
captured record, keyed by the SURT form of the URL (Sort-friendly URI
Reordering Transform: host labels reversed and comma-joined so that a
lexicographic sort clusters a registered domain with all its subdomains
and paths). Common Crawl publishes exactly this shape (`cdx-*.gz` next
to the WARC segments); replayers binary-search it. The reference app
has no archive indexing (it fetches live pages and forgets them —
`/root/reference/app/controllers/cars_controller.rb:131` just `visit`s);
this is the S13 source/sink row in SURVEY §2.1, completing the S12 WARC
source with the lookup side of the format.

SURT subset implemented (the documented core of the public spec):
  - scheme and fragment stripped, everything lowercased
  - one leading `www.` label dropped (standard canonicalization step)
  - host labels reversed and comma-joined; an explicit `:port` survives
    attached after the reversed host (``com,example:8080)``)
  - query parameters sorted bytewise (Common Crawl urlkey behavior);
    empty path renders as ``/``

Scale notes: `surt_key` is a pure codegen expression (regexp + array
ops, no Python); `build_cdx_index` is one narrow projection over the
record stream plus a global range-partitioned sort — exactly the shuffle
the CDX contract requires (the artifact IS a sorted file), and Spark's
`orderBy` does it with sampling-based range partitioning, so at 100 TB
each output partition is an independently sorted CDX shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key(url) -> Column:
    """SURT urlkey expression: `https://www.Example.com:8080/A/b?z=1&a=2`
    -> `com,example:8080)/a/b?a=2&z=1`. Pure built-in functions."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")  # scheme
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    host = F.regexp_replace(F.regexp_extract(hostport, r"^([^:]*)", 1), r"^www\.", "")
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev_host,
        port,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def build_cdx_index(records: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WARC record rows (sources/warc.py `read_warc` shape) -> sorted CDX
    index rows. One row per `response` record:

      urlkey    SURT key (the sort key of the index)
      timestamp WARC-Date digits (CDX 14-digit convention)
      url       original capture URL
      digest    md5 hex of the raw payload bytes
      length    payload byte length
      warc_file_id / rec_pos   locator of the record in the archive
      cdxj      the assembled CDXJ line (urlkey + ts + fixed-order JSON)

    Globally sorted by (urlkey, timestamp, warc_file_id, rec_pos) — the
    binary-searchable file contract.
    """
    resp = records.filter(F.col("rec_type") == "response")
    ts = F.regexp_replace(F.col("warc_date"), r"[^0-9]", "")
    idx = resp.select(
        surt_key(F.col("url")).alias("urlkey"),
        ts.alias("timestamp"),
        F.col("url"),
        F.md5(F.col(payload_col)).alias("digest"),
        F.length(F.col(payload_col)).cast("long").alias("length"),
        F.col("warc_file_id"),
        F.col("rec_pos"),
    )
    idx = idx.withColumn(
        "cdxj",
        F.concat(
            F.col("urlkey"), F.lit(" "), F.col("timestamp"),
            F.lit(' {"url": "'), F.col("url"),
            F.lit('", "digest": "'), F.col("digest"),
            F.lit('", "length": '), F.col("length").cast("string"),
            F.lit(', "file": '), F.col("warc_file_id").cast("string"),
            F.lit(', "pos": '), F.col("rec_pos").cast("string"), F.lit("}"),
        ),
    )
    return idx.orderBy("urlkey", "timestamp", "warc_file_id", "rec_pos")
