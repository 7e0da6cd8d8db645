"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full crawl wave loop (frontier +
politeness + Bloom dedup + Arrow parsing) over the deterministic
virtual web, returning the extracted items DataFrame.

``queries()`` / ``oracle_sql()`` — the operator registry of
``crawler_spark/plans/queries*.py``: each implemented operator from
SURVEY.md §2 (plus the training-data pipeline families) as a
(spark_fn, DuckDB-oracle-SQL) pair. As of round 2 EVERY entry carries
an oracle: the iterative crawl loop's oracle is a SELECT over the
golden parquet materialized from the pure-Python reference crawler
(jobs/make_crawl_golden.py; bit-exactness additionally pinned by
tests/test_crawl_e2e.py), and IVF probing has a full centroid-ranking
SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from crawler_spark.plans import queries as q1  # noqa: F401 (registers)
    from crawler_spark.plans import queries_docs as q2  # noqa: F401
    from crawler_spark.plans import queries_graph as q3  # noqa: F401
    from crawler_spark.plans import queries_pipeline as q4  # noqa: F401
    from crawler_spark.plans import queries_quality as q5  # noqa: F401
    from crawler_spark.plans.queries import QUERIES

    return QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["crawl_wave_loop"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in _registry().items() if spec.sql is not None}
