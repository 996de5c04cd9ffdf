"""deltalake_poc_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
Anhnguyenk835/deltalake_poc reference (a CDC lakehouse POC:
Debezium/Kafka -> Delta Lake audit + snapshot tables + analytics)
as a brand-new, idiomatic PySpark engine:

- ``tables``    — versioned parquet tables with a JSON transaction log
                  (append/overwrite/MERGE/DELETE, time travel, change
                  data feed, history, optimize, vacuum, restore).
                  Replaces Delta Lake, which the reference relies on.
- ``cdc``       — Debezium envelope parsing and batch CDC apply
                  (audit append + per-key dedup + upsert/delete).
- ``streaming`` — Structured Streaming wrappers (micro-batch apply,
                  incrementally refreshed materialized views).
- ``analytics`` — the reference's analytics query library
                  (notebook + RisingWave MV queries), Spark-first.
- ``pipeline``  — large-scale training-data ops: dedup (exact,
                  MinHash-LSH, SimHash, n-gram Jaccard, embedding),
                  similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"
