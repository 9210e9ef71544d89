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
  - RFC 3986 §6.2.2 percent-encoding normalization (round 8): an
    escape of an UNRESERVED character (ALPHA / DIGIT / - . _ ~)
    decodes to the character; every other escape keeps its canonical
    hex case (uppercase in path/query; lowercase in the host, where
    the later case-fold wins — documented below). Without this,
    ``/a%2Fb`` and ``/a%2fb``, or ``/%7Euser`` and ``/~user``, survive
    dedup as distinct keys.
  - optional IDN folding (``fold_idn=True``): non-ASCII hosts encode
    to punycode (RFC 3490 ToASCII via Python's idna codec) so
    ``http://bücher.example`` and ``http://xn--bcher-kva.example``
    share a key. The fold is a Pandas UDF applied ONLY to rows whose
    host has non-ASCII bytes (a codegen rlike gate) — the ASCII hot
    path never leaves the JVM. Off by default: the DuckDB oracle
    cannot replay punycode, and on all-ASCII hosts the result is
    identical either way.

Host-vs-hex case interaction: the host is pct-normalized FIRST (so a
decoded %41 exists before the case fold) and lowercased AFTER, which
leaves retained host escapes lowercase ("%2f"). RFC 3986 prefers
uppercase hex but ALSO lowercase hosts; one of the two must win for
the composition to be idempotent, and the case-fold winning matches
how registries compare reg-names. Path/query escapes stay uppercase.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ^scheme://authority(path)(?query)(#fragment)$ splitter
_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

#: params dropped entirely (name= prefix match, case-sensitive like
#: the trackers emit them)
_TRACKING = r"^(utm_[^=]*|gclid|fbclid|ref)="


def pct_normalize(col: Column) -> Column:
    """RFC 3986 §6.2.2.1/§6.2.2.2 percent-encoding normalization of one
    URL component: decode escapes of unreserved characters, uppercase
    the hex of every escape that must stay. Idempotent (decoded chars
    contain no '%'; retained escapes re-pass unchanged).

    Pure codegen: split on '%', then each later piece's first two
    chars are the escape hex — transform + conv + char, no UDF. A '%'
    NOT followed by two hex digits is not a valid escape and passes
    through untouched (lenient, like crawlers must be). Components
    with no '%' at all — the overwhelming majority of a crawl —
    short-circuit past the split/transform entirely behind one
    contains() check (the gate's synthetic mix is a quarter escaped,
    so the gate barely moves; an unescaped corpus skips the whole
    array pipeline).
    """
    parts = F.split(col, "%", -1)

    def fix(p: Column, i: Column) -> Column:
        hex2 = F.upper(F.substring(p, 1, 2))
        code = F.conv(hex2, 16, 10).cast("int")
        tail = F.substring(p, 3, 2147483647)
        unreserved = (
            ((code >= 48) & (code <= 57))
            | ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | code.isin(45, 46, 95, 126)
        )
        fixed = F.when(
            ~p.rlike("^[0-9A-Fa-f]{2}"), F.concat(F.lit("%"), p)
        ).when(unreserved, F.concat(F.char(code), tail)).otherwise(
            F.concat(F.lit("%"), hex2, tail)
        )
        return F.when(i == 0, p).otherwise(fixed)

    return F.when(~col.contains("%"), col).otherwise(
        F.array_join(F.transform(parts, fix), "")
    )


def _idn_fold_udf():
    """Pandas UDF: host -> punycode (IDNA ToASCII per label); a label
    the codec rejects passes through unchanged (lenient). Defined
    lazily so importing this module never touches the UDF machinery."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def fold(hosts):
        def one(h):
            if h is None:
                return None
            try:
                return h.encode("idna").decode("ascii")
            except (UnicodeError, ValueError):
                return h

        return hosts.map(one)

    # explicit eval type: `from __future__ import annotations` turns
    # hints into strings, which defeats pandas_udf's inference
    return pandas_udf(fold, "string", PandasUDFType.SCALAR)


def canonical_url(url: Column, fold_idn: bool = False) -> Column:
    """The canonical form of ``url``; null for strings that do not
    parse as scheme://authority... URLs."""
    scheme = F.lower(F.regexp_extract(url, _RE, 1))
    # pct-normalize BEFORE the case fold (see module docstring)
    authority = F.lower(pct_normalize(F.regexp_extract(url, _RE, 2)))
    path = pct_normalize(F.regexp_extract(url, _RE, 3))
    query = F.regexp_extract(url, _RE, 4)

    host = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.substring(authority, F.lit(1), F.length(authority) - 3),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.substring(authority, F.lit(1), F.length(authority) - 4),
    ).otherwise(authority)

    if fold_idn:
        fold = _idn_fold_udf()
        # only non-ASCII hosts pay the Python round-trip
        host = F.when(host.rlike(r"[^\x00-\x7F]"), fold(host)).otherwise(host)

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
            F.transform(F.split(query, "&", -1), pct_normalize),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
    )
    query_norm = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path_norm, query_norm))
