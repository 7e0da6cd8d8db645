"""Query registry, part 3: web-graph analytics and sketch operators.

A crawl engine at 10^10-URL scale feeds two downstream consumers the
reference never had but any production crawl does: link-graph analytics
(which hosts matter → crawl prioritisation) and cheap cardinality
sketches (how many distinct URLs/users did we see, without a
count-distinct shuffle over the full set).  Three operators:

- ``docs_link_pagerank`` — power-iteration PageRank over a
  deterministic synthetic link graph derived from ``documents``
  (doc ``i`` links to ``(31*i + c) % N`` for ``c ∈ {1..1+i%3}`` —
  irregular out-degree, so the stationary ranks discriminate).  All
  arithmetic is SCALED INTEGER (rank mass = 10^15) so the Spark plan
  and the DuckDB oracle agree bit-exactly — no float summation-order
  hazard.  Five unrolled iterations; each is one equi-join on ``src``
  plus one groupBy on ``dst`` — the textbook distributed-PageRank
  shape (at cluster scale: bucket ``edges`` by ``src`` once, so the
  per-iteration join is co-partitioned and only the small rank vector
  shuffles; checkpoint the rank vector every few iterations to cut
  lineage — at N=500..5000 neither is needed).

- ``events_distinct_kmv`` — K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al. 2002): keep the k=64 smallest values of a
  64-bit-ish hash of the key; estimate D ≈ (k-1)·H/h_(k).  The hash is
  the first 15 hex chars of md5 (60 bits — identical in Spark's
  ``conv(substring(md5(x),1,15),16,10)`` and DuckDB's
  ``('0x'||substr(md5(x),1,15))::BIGINT``), so the estimate itself is
  deterministic and hash-graded, alongside the exact distinct for
  comparison.  The k-smallest pass is TakeOrderedAndProject (per-
  partition partial top-k, no global sort) — at 100 TB this is the
  sketch you run instead of count(distinct) when the answer feeds a
  planner, not a report.

- ``events_funnel_conversion`` — ordered funnel (view → click →
  purchase) per user: first view, first click strictly after it,
  first purchase strictly after that.  Sequential-dependency funnels
  are NOT a single conditional aggregate; each stage needs the prior
  stage's timestamp, so the plan is three groupBys joined on
  ``user_id`` — one shuffle key throughout, so AQE/Catalyst reuses the
  exchange.  Timestamps exported as exact epoch micros (TIMESTAMP_NTZ
  → timestamp cast under the session's UTC zone, mirror of
  ``epoch_us`` in DuckDB).

Reference parity note: the reference (anxiangyipiao/crawler) has no
graph or sketch operators — these belong to the "training-data /
web-scale pipeline" extension family mandated by the task brief, same
grading contract as §2.4 of SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import q, t

# --- PageRank constants (shared literal contract with the SQL oracle) ------
PR_SCALE = 1_000_000_000_000_000  # total rank mass, scaled integer
PR_ITERS = 5
PR_FANOUT = (1, 2, 3)  # doc i -> (31*i + c) % N
PR_MULT = 31

# --- the ONE normative copy of the deterministic link-graph edge rule ------
# doc i -> (31*i + c) % n for c in 1..(1 + i % 3), self-loops dropped.
# Shared (Spark + SQL) by docs_link_pagerank, docs_host_degree_stats,
# docs_graph_triangles and frontier_priority_scores so the rule cannot
# drift between any query and its oracle (round-4 advice: four
# independent byte-identical copies existed).

# SQL fragment: two CTE bodies (compose as `WITH {SQL_LINK_EDGES}, ...`);
# the alias `d` is local to the fragment.
SQL_LINK_EDGES = f"""
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    edges AS (
      SELECT d.doc_id AS src,
             (d.doc_id * {PR_MULT} + c.c) % (SELECT n FROM nn) AS dst
      FROM documents d CROSS JOIN (VALUES {", ".join(f"({c})" for c in PR_FANOUT)}) c(c)
      WHERE c.c <= 1 + d.doc_id % 3
        AND (d.doc_id * {PR_MULT} + c.c) % (SELECT n FROM nn) <> d.doc_id
    )"""


def link_edges(docs: DataFrame, n: int) -> DataFrame:
    """Spark twin of ``SQL_LINK_EDGES``: (src, dst) edge DataFrame over
    ``docs`` (needs a ``doc_id`` column); ``n`` is the corpus size
    scalar. Derived, never materialised — Catalyst folds the arithmetic."""
    c = F.explode(F.array(*[F.lit(x) for x in PR_FANOUT])).alias("c")
    return (
        docs.select(F.col("doc_id").alias("src"), c)
        .filter(F.col("c") <= 1 + F.col("src") % 3)
        .withColumn("dst", (F.col("src") * PR_MULT + F.col("c")) % F.lit(n))
        .filter(F.col("dst") != F.col("src"))
        .select("src", "dst")
    )


def _pr_oracle_sql() -> str:
    """Unrolled 5-iteration integer PageRank as a DuckDB CTE chain.

    r_{k+1}(v) = (0.15·SCALE)//N + (85 · Σ_{u→v} r_k(u)//deg(u)) // 100
    — every op is BIGINT, so it matches the Spark plan bit-exactly.
    """
    head = f"""
    WITH {SQL_LINK_EDGES},
    nodes AS (SELECT doc_id AS id FROM documents),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    ew AS (SELECT edges.src, edges.dst, deg.deg FROM edges JOIN deg ON deg.src = edges.src),
    r0 AS (SELECT id, {PR_SCALE} // (SELECT n FROM nn) AS r FROM nodes)
    """
    its = []
    for k in range(1, PR_ITERS + 1):
        its.append(
            f""",
    r{k} AS (
      SELECT nodes.id,
             CAST({PR_SCALE * 15 // 100} // (SELECT n FROM nn)
                  + (85 * coalesce(sum(p.r // ew.deg), 0)) // 100
                  AS BIGINT) AS r
      FROM nodes
      LEFT JOIN ew ON ew.dst = nodes.id
      LEFT JOIN r{k - 1} p ON p.id = ew.src
      GROUP BY nodes.id
    )"""
        )
    tail = f"""
    SELECT id AS doc_id, r AS rank_scaled FROM r{PR_ITERS} ORDER BY doc_id
    """
    return head + "".join(its) + tail


@q(
    "docs_link_pagerank",
    _pr_oracle_sql(),
    "web-graph PageRank, 5 power iterations in exact scaled-int64 arithmetic",
)
def docs_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n = d.count()  # one scalar; the oracle's (SELECT count(*)) twin
    nodes = d.select(F.col("doc_id").alias("id"))
    edges = link_edges(d, n)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # The edge+degree table is read once per iteration: persist it so the
    # deg groupBy runs once, not five times. At cluster scale the same
    # table is bucketed by src so each iteration's join is co-partitioned
    # and only the N-row rank vector moves.
    ew = edges.join(deg, "src").persist()

    base = PR_SCALE * 15 // 100 // n
    ranks = nodes.select("id", F.lit(PR_SCALE // n).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(ranks, ew.src == ranks.id)
            .select("dst", F.expr("r div deg").alias("cb"))
            .groupBy("dst")
            .agg(F.expr("(85 * sum(cb)) div 100").alias("inmass"))
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id", (F.lit(base) + F.coalesce(F.col("inmass"), F.lit(0))).alias("r")
        )
    return ranks.select(
        F.col("id").alias("doc_id"), F.col("r").alias("rank_scaled")
    ).orderBy("doc_id")


# --- KMV sketch -------------------------------------------------------------
KMV_K = 64
KMV_DOMAIN = float(1 << 60)  # 15 hex chars of md5


@q(
    "events_distinct_kmv",
    f"""
    WITH h AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    kmv AS (
      SELECT max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS k_used
      FROM (SELECT h FROM h ORDER BY h LIMIT {KMV_K})
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
    SELECT k_used, kth_hash,
           CAST(floor((k_used - 1) * {KMV_DOMAIN!r} / kth_hash) AS BIGINT) AS est_kmv,
           exact_distinct
    FROM kmv, ex
    """,
    "KMV distinct-count sketch (k smallest md5-60bit hashes), deterministic",
)
def events_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    h = e.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    ).distinct()
    # k smallest hashes: sort+limit compiles to TakeOrderedAndProject —
    # per-partition partial top-k, no global sort, no full shuffle.
    kmv = (
        h.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("k_used"))
    )
    ex = e.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return kmv.crossJoin(ex).select(
        "k_used",
        "kth_hash",
        F.floor((F.col("k_used") - 1) * F.lit(KMV_DOMAIN) / F.col("kth_hash"))
        .cast("bigint")
        .alias("est_kmv"),
        "exact_distinct",
    )


@q(
    "events_funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           epoch_us(v.t1) AS view_us,
           epoch_us(c.t2) AS click_us,
           epoch_us(p.t3) AS purchase_us
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    ORDER BY v.user_id
    """,
    "sequential funnel view->click->purchase; stage k anchored after stage k-1",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    us = lambda col: F.unix_micros(F.col(col).cast("timestamp"))  # noqa: E731
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            us("t1").alias("view_us"),
            us("t2").alias("click_us"),
            us("t3").alias("purchase_us"),
        )
        .orderBy("user_id")
    )
