"""MERGE / upsert over immutable file storage.

The reference mutates rows in place (``UPDATE orders SET processed_at``,
reference: dags/order_currency_conversion_dag.py:143-150). Parquet is
immutable, so the Spark-native shape is copy-on-write MERGE — the same
contract Delta/Iceberg implement under ``MERGE INTO``:

    new_target = (target rows with no source match, unchanged)
              ∪ (matched rows, updated)
              ∪ (source rows with no target match, inserted)

One full-outer join on the key computes all three classes in a single
shuffle. At 100 TB the practical refinements are: partition-prune the
target to only partitions the source touches (join source against the
partition column first), and bucket both sides by the key so the join
is shuffle-free — both are layout decisions, not plan changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import catalog


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Copy-on-write MERGE: source rows win on key collision, target
    rows survive otherwise. Both inputs must share a schema."""
    cols = target.columns
    assert source.columns == cols, "merge requires identical schemas"
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    picked = [
        F.when(F.col(f"s.{key}").isNotNull(), F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in cols
    ]
    return joined.select(*picked)


_MERGE_ORACLE = """
WITH target AS (
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price
    FROM orders WHERE o_orderkey % 3 = 0
), source AS (
    SELECT o_orderkey, 'U' AS o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DECIMAL(18,2)) AS price
    FROM orders WHERE o_orderkey % 2 = 0
)
SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price
FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
"""


@query("merge_upsert_orders", _MERGE_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo: target = orders with key%3=0, source = updated rows
    with key%2=0. Result covers all three MERGE classes (update,
    keep, insert) deterministically."""
    o = catalog.load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") + 1).cast("decimal(18,2)").alias("price"),
    )
    return merge_upsert(target, source, key="o_orderkey")
