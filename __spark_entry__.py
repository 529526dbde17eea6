"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``orders_currency_conversion_etl_spark``; this
module only adapts the package's query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the repo importable for THIS process and for Spark's Python
# workers (the pyspark daemon inherits PYTHONPATH at first-UDF time;
# driver-side sys.path alone is invisible to workers when the driver
# runs from another cwd).
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
if _REPO_ROOT not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import DataFrame, SparkSession

from orders_currency_conversion_etl_spark.plans import registry

# Importing submodules for their @query registration side effects.
from orders_currency_conversion_etl_spark.plans import relational  # noqa: F401
from orders_currency_conversion_etl_spark.plans import relational_ext  # noqa: F401
from orders_currency_conversion_etl_spark.plans import analytics  # noqa: F401
from orders_currency_conversion_etl_spark.plans import reports  # noqa: F401
from orders_currency_conversion_etl_spark.plans import behavior  # noqa: F401
from orders_currency_conversion_etl_spark.plans import graph  # noqa: F401
from orders_currency_conversion_etl_spark.operators import (  # noqa: F401
    curation as _curation,
    dedup as _dedup,
    merge as _merge,
    mixing as _mixing,
    similarity as _similarity,
    skew as _skew,
    text as _text,
    multimodal as _multimodal,
)
from orders_currency_conversion_etl_spark.functions import pandas_fn as _pandas_fn  # noqa: F401
from orders_currency_conversion_etl_spark.streaming import attribution as _attribution  # noqa: F401
from orders_currency_conversion_etl_spark.streaming import events_stream as _events_stream  # noqa: F401

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from orders_currency_conversion_etl_spark.session import tune_existing

    tune_existing(spark)
    return registry.QUERIES["flagship_conversion"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return dict(registry.ORACLES)
