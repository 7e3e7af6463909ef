"""URL canonicalization for web-corpus pipelines.

Not in the reference (which has no web-page layer); this is the standard
Common-Crawl-pipeline normalization applied before URL-keyed dedup and
before using the url as the page's node identity (the north-rule KGX node
`url:<...>`): one crawl of the same page under `HTTP://Example.COM:80/a/`
and `http://example.com/a/?utm_source=x` must collapse to one key.

Pure column expressions (JVM-side regex, no UDFs), deterministic, and
engine-portable — the oracle replays every rule in SQL.

Rules (the common subset of WHATWG canonicalization + crawl practice):
- scheme and host lowercased (path/query case is significant, kept);
- fragment dropped;
- default ports stripped (http:80, https:443);
- empty path → '/';
- query parameters split on '&', tracking params dropped (utm_*, fbclid,
  gclid), the rest SORTED for order-insensitivity, empty query dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?i): crawls carry case-variant tracking params (UTM_SOURCE=) that must
# collapse the same as lowercase ones — param NAMES are matched
# case-insensitively, values are untouched
TRACKING_PARAM_REGEX = r"(?i)^(utm_[^=]*|fbclid|gclid)(=.*)?$"

_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def normalize_url(col: Column) -> Column:
    """Canonical URL string; non-URL values (no scheme) pass through."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RX, 1))
    rest = F.regexp_replace(u, _SCHEME_RX, "")
    # authority may be EMPTY (file:///etc/hosts): the host pattern must
    # accept zero chars and the path pattern must not require a host, or
    # every empty-authority URL collapses to 'scheme:///'
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.when(scheme == "http", F.regexp_replace(hostport, r":80$", "")).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query comes from the PRE-FRAGMENT slice: a '?' whose first appearance
    # is inside the fragment ('http://x/p#/route?y=1' — hash-route SPA URLs
    # are common in crawls) is part of the fragment, not a query
    query = F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, qpart)
    return F.when(scheme == "", col).otherwise(canon)
