"""URL canonicalization — the key-normalization step web-scale corpus
pipelines dedupe on (a crawl sees the same page as http/https, with
and without tracking params, fragments, default ports, and param
orders; CCNet/RefinedWeb-style dedup keys on the canonical form).

Pure Column ops (regexp + array transforms, whole-stage codegen): at
corpus scale this runs inside the scan projection with zero Python.

Canonical form:
  - scheme and host lowercased
  - default ports stripped (:80 for http, :443 for https)
  - fragment stripped
  - tracking params dropped (utm_*, gclid, fbclid, ref)
  - remaining query params sorted lexicographically
  - trailing slashes stripped from a non-root path (all of them —
    single-strip would not be idempotent)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ^scheme://authority(path)(?query)(#fragment)$ splitter
_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

#: params dropped entirely (name= prefix match, case-sensitive like
#: the trackers emit them)
_TRACKING = r"^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url``; null for strings that do not
    parse as scheme://authority... URLs."""
    scheme = F.lower(F.regexp_extract(url, _RE, 1))
    authority = F.lower(F.regexp_extract(url, _RE, 2))
    path = F.regexp_extract(url, _RE, 3)
    query = F.regexp_extract(url, _RE, 4)

    host = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.substring(authority, F.lit(1), F.length(authority) - 3),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.substring(authority, F.lit(1), F.length(authority) - 4),
    ).otherwise(authority)

    # strip ALL trailing slashes (a single-strip rule is not
    # idempotent: canon("//") would change again on a second pass —
    # caught by the hypothesis idempotence property); an all-slash
    # path collapses to the root "/"
    stripped = F.regexp_replace(path, "/+$", "")
    path_norm = F.when(path == "", path).when(
        stripped == "", F.lit("/")
    ).otherwise(stripped)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
    )
    query_norm = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path_norm, query_norm))
