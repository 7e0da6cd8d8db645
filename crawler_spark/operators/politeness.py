"""Per-host politeness admission — the Scrapy scheduler, as a Window rank.

The reference bounds per-host load with the Scrapy downloader's
per-domain concurrency (defaults 8/domain, 16 global — commented knobs
at reference ``project/settings.py:25-33``) plus ad-hoc ``time.sleep(1)``
between seed sections (``ahhyzb_zhaobiao.py:23`` etc.). Our equivalent:
each wave lasts ``wave_seconds`` of virtual time, and a host with
``crawl_delay`` d may serve ``max(1, floor(wave_seconds/d))`` requests
per wave. Admission is a deterministic top-B-per-host rank — the
"priority queue materialized via Window-over-host rank" of the
north_rule — ordered by ``(discovered_wave, url)`` so the crawl order
is a pure function of the input, never of partitioning.

Scale note (the part that must survive 10^10 frontier rows): a naive
``Window.partitionBy(host)`` ranks EVERY pending row of a host on one
task — a skewed host (80% of the frontier, see
``webgen.bench_spec``) serializes the wave. We therefore run two-phase
top-k: phase 1 ranks within ``(host, salt)`` — 2-level parallel, skew
split S ways — and keeps at most B rows per (host, salt); phase 2 ranks
the ≤ S·B survivors per host exactly. Result is identical to the naive
rank (proof: the true top-B of a host is contained in the union of its
per-salt top-Bs), but the heavy pass is salt-parallel.

Second scale guard: a host whose PENDING COUNT is within budget admits
every row — rank ≤ budget is a tautology — so ranking it is wasted
work, and in the admit-everything regime (generous crawl_delay, hot
host) phase 2 would sort the whole hot host in ONE task: a serial
bottleneck no core count fixes. ``admit_per_host`` therefore counts
rows per host first (tiny agg) and only rank-gates the hosts that
actually exceed their budget; phase 2's exact sort then touches at
most S·B rows per over-budget host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# politeness budget as a column over crawl_delay
def host_budget(wave_seconds: float, crawl_delay: Column) -> Column:
    return F.greatest(F.lit(1), F.floor(F.lit(wave_seconds) / crawl_delay)).cast("int")


def admit_per_host(
    frontier: DataFrame,
    budget_col: str = "budget",
    n_salts: int = 16,
    order_cols: tuple[str, ...] = ("discovered_wave", "url"),
) -> DataFrame:
    """Split a frontier into admitted (rank <= budget) and deferred rows.

    Input must carry ``host`` and ``budget_col``. Returns the input plus
    ``admitted: boolean`` (and drops helper columns). Deterministic: the
    rank order is a total order (url is unique per frontier).
    """
    order = [F.col(c).asc() for c in order_cols]

    # under-budget shortcut: one row per pending host (tiny agg). The
    # broadcast hint is right up to ~10^6 distinct hosts; a 10^8-host
    # deployment drops the hint and pays a host-partitioned SMJ whose
    # exchange the phase-2 window then reuses.
    counts = F.broadcast(
        frontier.groupBy(F.col("host").alias("_chost"))
        .agg(F.count("*").alias("_hn"))
    )

    # phase 1: per-(host, salt) local top-B — breaks host skew S ways.
    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    pruned = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .withColumn("_survivor", F.col("_r1") <= F.col(budget_col))
        .join(counts, F.col("host") == F.col("_chost"))
        .drop("_chost")
    )
    # a host with _hn <= budget admits everything: every row survives
    # phase 1 (each (host,salt) group holds <= _hn <= budget rows), so
    # no loser exists and rank <= budget holds for all — skip the sort.
    easy = (
        pruned.filter(F.col("_hn") <= F.col(budget_col))
        .withColumn("admitted", F.lit(True))
        .drop("_r1", "_survivor", "_salt", "_hn")
    )

    # phase 2: exact rank over the ≤ S·B survivors of each OVER-BUDGET
    # host only.
    hard = pruned.filter(F.col("_hn") > F.col(budget_col))
    w2 = Window.partitionBy("host").orderBy(*order)
    survivors = (
        hard.filter(F.col("_survivor"))
        .withColumn("_r2", F.row_number().over(w2))
        .withColumn("admitted", F.col("_r2") <= F.col(budget_col))
        .drop("_r1", "_r2", "_survivor", "_salt", "_hn")
    )
    losers = (
        hard.filter(~F.col("_survivor"))
        .withColumn("admitted", F.lit(False))
        .drop("_r1", "_survivor", "_salt", "_hn")
    )
    return easy.unionByName(survivors).unionByName(losers)


def pop_order(admitted: DataFrame, wave: int, seq_base: int) -> DataFrame:
    """Deterministic pop sequence for crawl-order equivalence tests
    (SURVEY.md §2.2 E2). Only used at test scale (single window over one
    wave's admitted rows — bounded by the sum of host budgets, not by
    frontier size), gated by CrawlParams.record_order."""
    w = Window.orderBy("host", "discovered_wave", "url")
    return admitted.select(
        (F.row_number().over(w) + F.lit(seq_base)).alias("pop_seq"),
        F.lit(wave).alias("wave"),
        "url",
    )
