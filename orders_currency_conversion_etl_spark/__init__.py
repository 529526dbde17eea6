"""PySpark-native analytics engine with the capabilities of
Vladoverx/orders-currency-conversion-etl (reference read-only at /root/reference).

The reference is an Airflow ETL implementing one flagship dataflow:
incremental ingest -> exchange-rate enrichment join -> derived-column
computation -> idempotent multi-sink write
(reference: dags/order_currency_conversion_dag.py, dags/order_generator_dag.py).

This package re-expresses that dataflow — and the wider relational +
LLM-data-pipeline query surface mandated by SURVEY.md §2 — as idiomatic
Spark DataFrame programs: declarative plans optimized by Catalyst,
broadcast joins for small dimensions, decimal-exact money arithmetic,
and zero row-at-a-time Python in the hot path.

Layout:
    session.py    SparkSession factory (pinned timezone, AQE, tuned shuffle)
    schemas.py    explicit StructTypes for every table (no inference)
    sources/      table catalog over parquet, rates/currencies sources, JDBC
    operators/    flagship conversion, incremental anti-join, generator,
                  dedup, similarity, text analysis, multimodal
    plans/        the named relational query surface (agg/window/join/setop)
    streaming/    Structured Streaming variants (watermark + windowed aggs)
"""

__version__ = "0.1.0"
