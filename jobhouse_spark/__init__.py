"""jobhouse_spark — a PySpark-native analytics/lakehouse engine.

Re-expresses the capability surface of the reference job-market
lakehouse (finnoio/jobhouse, see SURVEY.md) Spark-first:

- ``session``    — tuned SparkSession factory (UTC, AQE, Arrow).
- ``tables``     — loaders for the driver's synthetic parquet tables.
- ``queries``    — the SURVEY §2.B operator registry: every declared
                   operator as a (Spark DataFrame fn, DuckDB oracle SQL)
                   pair the differential harness iterates.
- ``operators``  — composed operators Spark lacks natively (as-of join,
                   sessionization, top-k per group, CDC latest-per-key).
- ``sources``    — bronze gzip-JSONL raw layer (reference
                   src/storage/raw_layer.py parity) + REST-replay source.
- ``functions``  — vector math (cosine), text analysis (lang-id, quality,
                   tokens, fingerprints) as JVM-side column expressions.
- ``streaming``  — Structured Streaming jobs with batch-equivalent
                   formulations for oracle checking.
"""

__version__ = "0.1.0"
