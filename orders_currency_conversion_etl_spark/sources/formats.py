"""Multi-format ingest/egress: CSV, JSON Lines, ORC (parquet is the
catalog's native path in catalog.py).

The reference ingests exactly two formats — Postgres rows over JDBC
and JSON over HTTP (order_currency_conversion_dag.py:44-56, 87-95) —
but a lake-facing engine must read whatever lands in the bucket. One
rule everywhere: the schema is DECLARED, never inferred. Schema
inference is a full extra pass over the data (fatal at 100 TB) and
non-deterministic under sampling; every reader here takes the
catalog's authoritative StructType instead.

Scale notes per format:
- CSV/JSON are row-oriented and uncompressed-column-blind: no column
  pruning, no predicate pushdown, no min/max skipping. They are fine
  as INGEST formats (splittable → parallel scan) but every query-side
  table should be rewritten to parquet/ORC; `to_parquet` is that
  one-hop conversion, partitioned by a column when given.
- mode="FAILFAST" on the text formats: a malformed row is a data bug
  we want surfaced at read time, not a silent NULL row (PERMISSIVE)
  corrupting aggregates downstream.
- timestamps round-trip through an explicit ISO pattern so a
  CSV-written table reads back bit-identical regardless of session
  timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_TEXT_OPTS = {"mode": "FAILFAST", "timestampFormat": TS_FMT}


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.options(header=True, **_TEXT_OPTS).schema(schema).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.options(**_TEXT_OPTS).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC is self-describing + columnar: pruning/pushdown work as on
    # parquet, no schema argument needed.
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(header=True, timestampFormat=TS_FMT).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(timestampFormat=TS_FMT).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def to_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """The ingest one-hop: land row-oriented data as query-ready
    parquet, optionally directory-partitioned for partition pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
