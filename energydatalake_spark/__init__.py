"""energydatalake_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing surface of the
reference energy data lake (ashishsalunkhe/energydatalake), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Parquet
columnar storage, Structured Streaming for the incremental file-queue
pipelines, and Pandas-UDF-backed operators only where built-ins cannot
express the semantics (none of the reference's own operators need that;
only optional parity oracles do).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffle).
- ``io``         schema-enforced readers, writers, file-queue archival.
- ``operators``  relational/temporal operators (SURVEY.md §2 inventory).
- ``text``       LLM-data-pipeline text ops (stats, lang-id, dedup).
- ``similarity`` embedding similarity search (brute-force + LSH).
- ``multimodal`` binary media columns: decode/feature plumbing (stubs).
- ``streaming``  Structured Streaming variants of the batch pipelines.
- ``pipelines``  the six reference pipelines, config-driven, local dirs.
- ``plans``      query registry backing ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
