"""URL canonicalization — the key for the URL-seen set.

The reference delegates request dedup to Scrapy's fingerprinter
(``REQUEST_FINGERPRINTER_IMPLEMENTATION = "2.7"``, reference
``project/settings.py:94``): SHA1 over the canonicalized method+URL.
We reproduce the observable contract (same canonical URL => duplicate)
with an explicitly documented canonical form:

1. strip surrounding whitespace;
2. drop the ``#fragment``;
3. lowercase the scheme and the host(:port);
4. drop the default port (``:80`` for http, ``:443`` for https);
5. empty path becomes ``/``;
6. query parameters are sorted bytewise (``a=2&b=1`` == ``b=1&a=2``);
   an empty query drops its ``?``.

Two implementations, same contract, with a parity test in
``tests/test_canonical.py``:

- :func:`canonicalize_url_col` — pure Catalyst Column expression
  (regexp + sort_array); stays JVM-side / whole-stage-codegen, the hot
  path for 10^10-row frontiers.
- :func:`canonicalize_url` — pure-Python mirror used by the oracle
  crawler and by driver-side seed prep.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")


def canonicalize_url(url: str) -> str:
    """Pure-Python canonicalizer (oracle / driver-side use)."""
    u = url.strip()
    u = u.split("#", 1)[0]
    m = _SCHEME_RE.match(u)
    if not m:
        return u  # not an absolute http(s)-style URL: pass through
    scheme = m.group(1).lower()
    rest = u[m.end():]
    if "?" in rest:
        base, query = rest.split("?", 1)
    else:
        base, query = rest, None
    slash = base.find("/")
    if slash == -1:
        hostport, path = base, ""
    else:
        hostport, path = base[:slash], base[slash:]
    hostport = hostport.lower()
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    if not path:
        path = "/"
    if query:
        query = "&".join(sorted(query.split("&")))
        return f"{scheme}://{hostport}{path}?{query}"
    return f"{scheme}://{hostport}{path}"


def canonicalize_url_col(url: Column) -> Column:
    """Catalyst-native canonicalizer — identical contract, JVM-side.

    No Python is executed per row: at 10^10 frontier rows this stays in
    whole-stage codegen, so the seen-set key derivation is free relative
    to the shuffle it feeds.
    """
    u = F.trim(url)
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path_q = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_query = F.concat_ws("&", F.sort_array(F.split(query, "&")))
    out = F.when(
        scheme == "",
        u,  # not absolute: pass through (contract step 0)
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            _strip_default_port(scheme, hostport),
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_query)),
        )
    )
    return out


def _strip_default_port(scheme: Column, hostport: Column) -> Column:
    return (
        F.when(
            (scheme == F.lit("http")) & hostport.endswith(":80"),
            F.substring(hostport, 1, F.length(hostport) - 3),
        )
        .when(
            (scheme == F.lit("https")) & hostport.endswith(":443"),
            F.substring(hostport, 1, F.length(hostport) - 4),
        )
        .otherwise(hostport)
    )


def host_of(url: Column) -> Column:
    """Host (lowercased, without port) of an absolute URL — JVM-side."""
    rest = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    return F.lower(F.regexp_extract(rest, r"^([^/:?#]*)", 1))


def host_of_py(url: str) -> str:
    u = url.strip()
    m = _SCHEME_RE.match(u)
    rest = u[m.end():] if m else u
    host = re.split(r"[/:?#]", rest, 1)[0]
    return host.lower()


def url_hash(url: Column) -> Column:
    """xxhash64 of the canonical URL — the 64-bit seen-set key."""
    return F.xxhash64(canonicalize_url_col(url))
