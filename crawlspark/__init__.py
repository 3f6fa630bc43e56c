"""crawlspark — a PySpark-native incremental crawl/analytics engine.

A from-scratch reimplementation of the *capabilities* of
joelverhagen/CatalogCrawler (cursor-driven incremental crawling with
deterministic visit order, commit-atomic progress, bounded parallel
fan-out, skew-aware sharding, and incremental aggregation) re-expressed
as idiomatic PySpark DataFrame plans over parquet tables, plus the
frontier/politeness/seen-set machinery a web-scale crawl needs
(BASELINE.json north_star).

Layout:
  sources/    table storage: epoch-manifest parquet tables (Iceberg-like
              atomic commits without the Iceberg runtime)
  functions/  scalar/vectorized column functions (url parsing, html→text
              extraction, hashing, time formatting)
  operators/  relational operators (cursor filters, ordered top-K,
              politeness dequeue, bloom seen-set, dedup, similarity,
              text analysis)
  plans/      multi-step dataflows (catalog crawl, web crawl epochs,
              incremental reports, checkpoint state)
  streaming/  structured-streaming variants of the incremental reports
"""

__version__ = "0.1.0"

from crawlspark.session import get_spark  # noqa: F401
