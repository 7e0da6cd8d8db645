"""robots.txt gating — RFC 9309 allow/deny per (host, path).

The reference has robots obedience COMMENTED OUT (reference
``project/settings.py:22``), i.e. it does not obey robots; the
north_rule requires the gate in our engine anyway. It is therefore
flag-gated (``CrawlParams.obey_robots``), default off so
crawl-equivalence tests against the reference-semantics oracle run
ungated, and on for the robots tests.

Rules live in a ``robots_rules`` table ``(host, path_prefix, allow,
crawl_delay)`` — pre-parsed once per host (parsing robots.txt bodies is
a one-time per-host cost, out of the wave hot path). Gating is pure
Catalyst: broadcast-join rules on host, pattern-match, most-specific
(longest-pattern, RFC 9309 §2.2.2) match wins, no rule => allow.
Patterns support the REP wildcards: ``*`` matches any byte sequence
and a trailing ``$`` anchors the end of the path; plain prefixes keep
the cheap ``startswith`` path and wildcard rules compile to an
anchored regex inside Catalyst (the rules table is tiny + broadcast,
so per-rule regex evaluation is off the scale-critical axis). On an
equal-specificity tie we take deny — a deliberate conservative
deviation from the RFC's allow-SHOULD, mirrored in the oracle. A
nullable per-host ``crawl_delay`` override (prefix '/') feeds the
politeness budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)


def url_path(url_col):
    return F.regexp_replace(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")


def _pattern_regex_col():
    """Compile a REP pattern column to an anchored Java regex: strip a
    trailing ``$`` end-anchor flag, escape regex metacharacters in the
    body (mid-pattern ``$`` is literal per REP practice), turn ``*``
    into ``.*``, re-anchor. Pure Catalyst — runs once per (tiny,
    broadcast) rules row."""
    ends = F.col("path_prefix").endswith("$")
    body = F.when(
        ends, F.expr("substring(path_prefix, 1, length(path_prefix) - 1)")
    ).otherwise(F.col("path_prefix"))
    esc = F.regexp_replace(body, r"([.\\+?(){}\[\]|^$])", r"\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), star, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def apply_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Adds ``robots_allowed: boolean`` and ``robots_delay: double``
    (nullable host-level override) to frontier rows."""
    wild = F.col("path_prefix").contains("*") | F.col("path_prefix").endswith("$")
    r = rules.select(
        F.col("host").alias("_rhost"),
        "path_prefix",
        wild.alias("_rwild"),
        _pattern_regex_col().alias("_rregex"),
        F.col("allow").alias("_rallow"),
        F.col("crawl_delay").alias("_rdelay"),
    )
    matches = F.when(
        F.col("_rwild"), F.regexp(F.col("_path"), F.col("_rregex"))
    ).otherwise(F.col("_path").startswith(F.col("path_prefix")))
    j = frontier.withColumn("_path", url_path(F.col("url"))).join(
        F.broadcast(r),
        (F.col("host") == F.col("_rhost")) & matches,
        "left",
    )
    # most specific (longest pattern) match decides — RFC 9309 §2.2.2
    # octet-count specificity; ties broken by (allow asc) so an explicit
    # deny beats an equally-specific allow (conservative)
    w = Window.partitionBy("url").orderBy(
        F.length(F.col("path_prefix")).desc_nulls_last(), F.col("_rallow").asc_nulls_last()
    )
    best = (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .withColumn("robots_allowed", F.coalesce(F.col("_rallow"), F.lit(True)))
    )
    # host-level delay override comes from the '/' rule of that host —
    # aggregated to ONE row per host (max = politest), so a malformed
    # rules table with several '/' rules cannot fan out frontier rows
    # and corrupt admission counts. corpus/oracle.py mirrors the max.
    delays = (
        rules.filter(F.col("path_prefix") == "/")
        .groupBy(F.col("host").alias("_dhost"))
        .agg(F.max("crawl_delay").alias("robots_delay"))
    )
    return (
        best.join(F.broadcast(delays), F.col("host") == F.col("_dhost"), "left")
        .drop("_rhost", "path_prefix", "_rwild", "_rregex",
              "_rallow", "_rdelay", "_rk", "_path", "_dhost")
    )


def pattern_regex_py(prefix: str) -> tuple[str, bool]:
    """(anchored regex, is_wildcard) for a REP pattern — the Python
    mirror of :func:`_pattern_regex_col`, used by the SQL oracle
    builder so engine and oracle compile patterns identically."""
    import re

    wild = "*" in prefix or prefix.endswith("$")
    ends = prefix.endswith("$")
    body = prefix[:-1] if ends else prefix
    rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if ends else "")
    return rx, wild


def pattern_matches_py(prefix: str, path: str) -> bool:
    """Pure-Python mirror of the Catalyst pattern match (oracle side):
    plain prefixes via startswith, REP wildcards via the anchored
    regex."""
    import re

    rx, wild = pattern_regex_py(prefix)
    if wild:
        return re.search(rx, path) is not None
    return path.startswith(prefix)


def robots_allowed_py(rules: list[dict], host: str, url: str) -> bool:
    """Pure-Python mirror for the oracle."""
    import re

    path = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "", url)
    matches = [
        r for r in rules
        if r["host"] == host and pattern_matches_py(r["path_prefix"], path)
    ]
    if not matches:
        return True
    best = sorted(matches, key=lambda r: (-len(r["path_prefix"]), r["allow"]))[0]
    return bool(best["allow"])
