"""Seeded order synthesis (the reference's generator DAG, Spark-native).

Mirrors reference: dags/order_generator_dag.py:62-71 — n random orders
with UUID ids, synthetic emails, a random recent order_date, a uniform
amount in [10, 1000), and a random currency — but fully deterministic:
``spark.range`` + seeded ``F.rand`` column expressions instead of
unseeded ``random``/``uuid`` (SURVEY §7.3 determinism requirement).

Distributed by construction: ``spark.range(n)`` partitions the id space
across executors; no driver-side loop, no data movement at any size.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.rates import CURRENCY_ALPHABET


def _uuid_like(col) -> F.Column:
    """Deterministic UUID-format string from a unique id: md5 hex laid
    out 8-4-4-4-12. Replaces ``uuid.uuid4()`` (reference:
    dags/order_generator_dag.py:66) for reproducible golden tests."""
    h = F.md5(col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def generate_orders(
    spark: SparkSession,
    n: int = 5000,
    seed: int = 42,
    base_time: dt.datetime = dt.datetime(2026, 1, 1),
    currencies: tuple[str, ...] = CURRENCY_ALPHABET,
) -> DataFrame:
    """n synthetic source orders in the FIXTURES.md A1 shape."""
    base = spark.range(n)  # partitioned id space, no driver materialization
    ncur = len(currencies)
    letter_idx = (F.rand(seed + 1) * 26).cast("int") + 1
    letters = F.array(*[F.lit(c) for c in "abcdefghijklmnopqrstuvwxyz"])
    return base.select(
        _uuid_like(F.col("id")).alias("order_id"),
        # email f"{letter}{digits}@example.com" (reference: order_generator_dag.py:67)
        F.concat(
            F.element_at(letters, letter_idx),
            ((F.rand(seed + 2) * 9000).cast("int") + 1000).cast("string"),
            F.lit("@example.com"),
        ).alias("customer_email"),
        # order_date within [base_time - 7d, base_time) (reference: :68)
        (
            F.lit(base_time).cast("timestamp")
            - F.make_interval(secs=(F.rand(seed + 3) * 7 * 86400))
        ).alias("order_date"),
        # uniform 10.00-1000.00 rounded to cents (reference: :69)
        F.round(F.rand(seed + 4) * 990 + 10, 2).cast("decimal(12,2)").alias("amount"),
        F.element_at(
            F.array(*[F.lit(c) for c in currencies]),
            (F.rand(seed + 5) * ncur).cast("int") + 1,
        ).alias("currency"),
        F.lit(base_time).cast("timestamp").alias("created_at"),
        F.lit(None).cast("timestamp").alias("processed_at"),
    )
