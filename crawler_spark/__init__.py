"""crawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference Scrapy project
(``anxiangyipiao/crawler``, studied in SURVEY.md) as idiomatic Spark:

- a distributed URL frontier with a partitioned-Bloom URL-seen set
  (exact anti-join confirm) replacing Scrapy's in-memory RFPDupeFilter
  (reference: ``project/settings.py:94``),
- a per-host politeness scheduler expressed as a Window-over-host rank
  replacing the Scrapy scheduler/downloader concurrency envelope
  (reference: ``project/settings.py:25-33``),
- vectorized Arrow pandas UDFs for list-page and detail-page parsing
  replacing per-response XPath callbacks
  (reference: ``project/spiders/*.py``),
- a driver-side fetch-wave loop with parquet+manifest durable state and
  checkpoint resume (the reference has no persistence at all),
- plus the large-scale training-data operators (dedup families,
  similarity search, text analysis, multimodal plumbing) a web-scale
  corpus pipeline needs downstream of the crawl.

Nothing in here is ported code: the reference is a single-process Scrapy
project; this package is DataFrame-first and designed for a
1000-executor cluster even though it is tested on local[32].
"""

__version__ = "0.1.0"
