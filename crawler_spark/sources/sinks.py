"""Item sinks — the reference's feed-export/pipeline stage (E7).

The reference's item pipeline is a pass-through stub
(``project/pipelines.py:12-13``) with UTF-8 feed export configured
(``FEED_EXPORT_ENCODING = "utf-8"``, ``project/settings.py:96``): items
end up as UTF-8 JSON. Our equivalents:

- :func:`write_items_json` — JSON lines, UTF-8 (Spark's default JSON
  writer is UTF-8; Chinese payloads round-trip losslessly, asserted in
  tests/test_sinks.py).
- :func:`write_items_partitioned` — the warehouse sink: parquet
  partitioned by ``(source, publish_date)``, which is the pruning key
  for downstream queries ("all items of site X in date range D" touches
  only those directories). At 100 TB the date partition bounds file
  count per source per day; source keeps per-site compaction
  independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_publish_date(items: DataFrame) -> DataFrame:
    return items.withColumn("publish_date", F.to_date("publish_time"))


def write_items_json(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    items.write.mode(mode).json(path)


def write_items_partitioned(items: DataFrame, path: str, mode: str = "append") -> None:
    (
        with_publish_date(items)
        .repartition("source", "publish_date")  # one writer group per partition dir
        .write.mode(mode)
        .partitionBy("source", "publish_date")
        .parquet(path)
    )
