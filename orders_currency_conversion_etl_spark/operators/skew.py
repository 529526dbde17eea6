"""Skew-mitigation: salted joins.

When one join key carries a disproportionate share of rows (hot
currency, hot customer), the hash-partitioned join sends that key's
whole population to a single reducer — the classic straggler. Salting
splits the hot key S ways:

- fact side: ``salt = some_unique_col % S`` (deterministic here; any
  uniform per-row value works);
- dim side: replicated S times via explode;
- join on ``(key, salt)`` — every reducer gets 1/S of the hot key.

AQE's skew-join handles this automatically for sort-merge joins at
runtime (enabled in session.py); the explicit form below is for
aggregations-after-join and for engines/plans AQE doesn't cover, and
is semantics-preserving: salted_join(a, b) == join(a, b) exactly.

The registered query aggregates revenue by order status — 3 distinct
keys over the whole orders table is maximal skew — through a salted
join against a status-description dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import catalog

N_SALTS = 16

#: tiny dimension: status code -> description (inlined both engines)
STATUS_DIM = (("F", "fulfilled"), ("O", "open"), ("P", "pending"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key``, hot keys split ``n_salts``
    ways. ``salt_source`` is any fact column with uniform-ish values
    (a unique id works best). dim grows n_salts x — only viable for
    small dims, which is exactly when key skew on the fact side is the
    bottleneck."""
    salted_fact = fact.withColumn(
        "_salt", (F.col(salt_source) % n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, on=[key, "_salt"], how=how).drop("_salt")


def _dim_sql_values() -> str:
    rows = ", ".join(f"('{k}', '{v}')" for k, v in STATUS_DIM)
    return f"(VALUES {rows}) AS dim(o_orderstatus, status_desc)"


_SALTED_ORACLE = f"""
SELECT o.o_orderstatus,
       dim.status_desc,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
FROM orders o JOIN {_dim_sql_values()} ON o.o_orderstatus = dim.o_orderstatus
GROUP BY o.o_orderstatus, dim.status_desc
"""


@query("join_salted_skew", _SALTED_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by status through a 16-way salted join (3 hot keys split
    across 48 (key, salt) partitions instead of 3). The oracle is the
    unsalted join — proving the rewrite is semantics-preserving."""
    orders = catalog.load_table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(list(STATUS_DIM), "o_orderstatus string, status_desc string")
    joined = salted_join(orders, dim, key="o_orderstatus", salt_source="o_orderkey")
    return joined.groupBy("o_orderstatus", "status_desc").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("revenue"),
    )
