"""robots.txt gating — longest-prefix allow/deny per (host, path).

The reference has robots obedience COMMENTED OUT (reference
``project/settings.py:22``), i.e. it does not obey robots; the
north_rule requires the gate in our engine anyway. It is therefore
flag-gated (``CrawlParams.obey_robots``), default off so
crawl-equivalence tests against the reference-semantics oracle run
ungated, and on for the robots tests.

Rules live in a ``robots_rules`` table ``(host, path_prefix, allow,
crawl_delay)`` — pre-parsed once per host (parsing robots.txt bodies is
a one-time per-host cost, out of the wave hot path). Gating is pure
Catalyst: broadcast-join rules on host, prefix-match, longest matching
prefix wins, no rule => allow. A nullable per-host ``crawl_delay``
override (prefix '/') feeds the politeness budget.
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


def apply_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Adds ``robots_allowed: boolean`` and ``robots_delay: double``
    (nullable host-level override) to frontier rows."""
    r = rules.select(
        F.col("host").alias("_rhost"),
        "path_prefix",
        F.col("allow").alias("_rallow"),
        F.col("crawl_delay").alias("_rdelay"),
    )
    j = frontier.withColumn("_path", url_path(F.col("url"))).join(
        F.broadcast(r),
        (F.col("host") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("path_prefix")),
        "left",
    )
    # longest matching prefix decides; ties broken by (allow asc) so an
    # explicit deny beats an equally-specific allow (conservative)
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
        .drop("_rhost", "path_prefix", "_rallow", "_rdelay", "_rk", "_path", "_dhost")
    )


def robots_allowed_py(rules: list[dict], host: str, url: str) -> bool:
    """Pure-Python mirror for the oracle."""
    import re

    path = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "", url)
    matches = [
        r for r in rules
        if r["host"] == host and path.startswith(r["path_prefix"])
    ]
    if not matches:
        return True
    best = sorted(matches, key=lambda r: (-len(r["path_prefix"]), r["allow"]))[0]
    return bool(best["allow"])
