"""Decision-support analytics: multi-way join reports (TPC-H Q3/Q10
shape), single-pass column profiling, deterministic stratified
sampling, and IQR outlier detection.

The reference pipeline computes no reports (SURVEY §2.5: zero GROUP
BYs in either DAG) — these are EXT surface exercising the classic
warehouse shapes a user of the engine runs over the fixture tables.

Scale notes (the part that matters at 100 TB):
- Q3/Q10 are selective-filter → shuffle-join → agg → top-k. The
  segment/date/returnflag filters are pushed into the parquet scans
  (asserted for this family in tests/test_plan_quality.py), customer
  and nation broadcast, and the final ORDER BY + LIMIT compiles to
  TakeOrderedAndProject — per-partition heaps, no global sort.
- the profiler is ONE scan: every per-column metric is an aggregate
  of the same pass; count(distinct) over many columns expands via
  Spark's Expand operator (rows × columns before the partial agg) —
  the documented scale path is approx_count_distinct, kept exact here
  for DuckDB parity.
- stratified sampling uses a *portable deterministic hash* (md5 →
  integer bucket), not rand(): the sample is reproducible across
  engines, retries, and partitionings — which is what you want when
  the sample feeds a training run. It is also embarrassingly
  parallel: a per-row predicate, no shuffle at all.
- the IQR outlier filter is agg-to-one-row + broadcast cross join +
  filter: two passes over orders, no shuffle wider than the 1-row
  quantile frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text_fn import hex_to_long_sql
from ..sources import catalog
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load_table(spark, sf_dir, name)


#: revenue term shared by Q3/Q10 — cast to DECIMAL *before* SUM so the
#: total is exact and independent of accumulation order (SURVEY §4.3).
_REV_SQL = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))"


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )


# --------------------------------------------------------------------------
# Shipping priority (TPC-H Q3 shape): 3-way join, agg, top-k
# --------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", _Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped high-value orders for one market segment.

    Plan at scale: customer(filtered to 1/5 segment) broadcasts into
    orders, the result shuffle-joins lineitem on orderkey, and the
    top-10 is TakeOrderedAndProject. The l_orderkey tiebreak makes the
    LIMIT boundary deterministic for the oracle compare.
    """
    cutoff = F.lit("1997-06-01").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Returned-item reporting (TPC-H Q10 shape): 4-way join, agg, top-k
# --------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey,
       c.c_name,
       CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("tpch_q10_returned_items", _Q10_ORACLE)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in one quarter.

    orders is pre-filtered to the quarter (partition-prunable on a
    date-partitioned lake), lineitem to returnflag='R'; customer and
    nation are broadcast dims, so the only big shuffle is the
    lineitem⋈orders orderkey exchange.
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Column profiler: one scan → per-column null/distinct stats
# --------------------------------------------------------------------------

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column_name,"
    f" COUNT(*) - COUNT({c}) AS n_null,"
    f" COUNT(DISTINCT {c}) AS n_distinct"
    " FROM documents"
    for c in _DOC_COLS
)


@query("profile_columns", _PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of `documents`: null count + cardinality
    per column, in a SINGLE pass (one wide aggregate, then stack() to
    long form) — vs. the oracle's 5 scans. The multi-count(distinct)
    plans via Expand; swap in approx_count_distinct at 100 TB where a
    ±2% cardinality is profile-grade anyway."""
    d = _t(spark, sf_dir, "documents")
    aggs = []
    for c in _DOC_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    wide = d.agg(*aggs)
    stack = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in _DOC_COLS)
    return wide.selectExpr(
        f"stack({len(_DOC_COLS)}, {stack}) AS (column_name, n_null, n_distinct)"
    )


# --------------------------------------------------------------------------
# Deterministic stratified sample (portable hash bucket per stratum)
# --------------------------------------------------------------------------

#: per-mille keep rate per order status — the sampling design.
_STRATA = {"F": 100, "O": 100, "P": 500}

#: md5 of the key → first 4 hex chars → int → bucket in [0, 1000).
#: Valid in BOTH engines (functions/text_fn.py builds the hex parse
#: from substr/instr arithmetic), so the oracle reproduces the exact
#: same sample — impossible with rand()/TABLESAMPLE.
_BUCKET_SQL = (
    "(" + hex_to_long_sql("substr(md5(CAST(o_orderkey AS STRING)), 1, 4)", 4) + " % 1000)"
)
_BUCKET_SQL_DUCK = _BUCKET_SQL.replace("AS STRING", "AS VARCHAR")

_KEEP_CASE = (
    "CASE o_orderstatus "
    + " ".join(f"WHEN '{s}' THEN {pm}" for s, pm in _STRATA.items())
    + " ELSE 0 END"
)

_STRATified_ORACLE = f"""
SELECT o_orderkey, o_orderstatus,
       CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice
FROM orders
WHERE {_BUCKET_SQL_DUCK} < {_KEEP_CASE}
"""


@query("sample_stratified_hash", _STRATified_ORACLE)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample of orders: keep 10% of F/O rows and 50% of the
    rare P stratum, selected by md5-bucket of the key. Reproducible
    across engines/retries/partitionings and shuffle-free (pure per-row
    predicate) — `df.sampleBy` gives neither guarantee."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.expr(f"{_BUCKET_SQL} < {_KEEP_CASE}"))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("totalprice"),
        )
    )


# --------------------------------------------------------------------------
# IQR outlier detection (quantile frame + broadcast cross join)
# --------------------------------------------------------------------------

_IQR_ORACLE = """
WITH q AS (
    SELECT event_type,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
    FROM events
    GROUP BY event_type
)
SELECT e.event_id,
       e.event_type,
       CAST(e.value AS DECIMAL(18,4)) AS value
FROM events e
JOIN q ON e.event_type = q.event_type
WHERE e.value > q.q3 + 1.5 * (q.q3 - q.q1)
"""


@query("outlier_events_iqr", _IQR_ORACLE)
def outlier_events_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise Tukey-fence outliers on the heavy-tailed event value:
    exact linear-interpolated quartiles per event_type (Spark
    `percentile` ≡ DuckDB percentile_cont) reduced to a handful of
    rows, broadcast back onto the fact, filter. At 100 TB swap the
    exact percentile for approx_percentile(…, accuracy) — same plan
    shape, single-pass sketch instead of a per-group sort."""
    e = _t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    return (
        e.join(F.broadcast(q), "event_type")
        .filter(F.col("value") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        .select(
            "event_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").alias("value"),
        )
    )


# --------------------------------------------------------------------------
# Promo revenue share (TPC-H Q14 shape): conditional agg over a join
# --------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT CAST(
         CAST(100.0 AS DOUBLE) * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM({_REV_SQL}) AS DOUBLE)
       AS DECIMAL(18,8)) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
"""


@query("tpch_q14_promo_revenue", _Q14_ORACLE)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one month's revenue from promo parts: conditional
    aggregation over a fact-dim join. part broadcasts (it is a dim);
    the month filter is pushed into the lineitem scan so only ~1/80 of
    the fact is read on a date-partitioned lake. Both SUMs are exact
    DECIMAL; the ratio is one deterministic DOUBLE division at the end.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(_revenue()).cast("double")
            )
            .cast("decimal(18,8)")
            .alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH o AS (
    SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio
    FROM orders
), stats AS (
    SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio,
           COUNT(*) AS n_in_bucket
    FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.prio, s.n_in_bucket
FROM o JOIN stats s ON o.prio IS NOT DISTINCT FROM s.prio
"""


@query("join_null_safe", _NULLSAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: unspecified priority maps to NULL, and the
    NULL bucket must still join to its stats row — plain `=` would
    silently drop it (NULL = NULL is NULL). Spark's `<=>` stays a
    hash-joinable equality key (BroadcastHashJoin here), NOT a theta
    join: null-safe equality hashes like any other key."""
    o = _t(spark, sf_dir, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    left = o.select("o_orderkey", prio.alias("prio"))
    stats = o.groupBy(prio.alias("prio")).agg(F.count(F.lit(1)).alias("n_in_bucket"))
    return left.join(
        F.broadcast(stats), left["prio"].eqNullSafe(stats["prio"])
    ).select(left["o_orderkey"], left["prio"], stats["n_in_bucket"])


# --------------------------------------------------------------------------
# Local-supplier revenue (TPC-H Q5 shape): six-table join
# --------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n.n_name,
       CAST(SUM({_REV_SQL}) AS DECIMAL(38,4)) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@query("tpch_q5_local_supplier_revenue", _Q5_ORACLE)
def tpch_q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders where customer and supplier share a nation,
    per nation of one region — the classic six-table join.

    Join-order reasoning at scale: region filters nation (a handful of
    rows) which filters customer; customer, supplier, nation, region
    all broadcast; so the ONLY shuffle is lineitem⋈orders on orderkey.
    The supplier join carries the extra c_nationkey = s_nationkey
    residual — still a hash join on s_suppkey with the nation match as
    a post-probe filter. Catalyst + AQE derive this order from the
    declared plan; nothing is hand-scheduled.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("decimal(38,4)").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Late-shipment order counts (TPC-H Q4 shape): EXISTS => semi-join + agg
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o.o_orderpriority
"""


@query("tpch_q4_late_orders", _Q4_ORACLE)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped more than 90 days after
    the order date, counted by priority. The correlated EXISTS is
    written as an explicit left-semi join — the exact plan Catalyst
    de-correlates EXISTS into, but stated declaratively: one shuffle on
    orderkey, semi-join short-circuits on first match (no fact-fact
    row blow-up), then a 5-group aggregate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# OLS trend per group via exact aggregate sums
# --------------------------------------------------------------------------

_REGR_ORACLE = """
WITH pts AS (
    SELECT n.n_name AS nation,
           CAST(datediff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
           CAST(floor(o.o_totalprice) AS BIGINT) AS y
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
), s AS (
    SELECT nation, COUNT(*) AS n_orders,
           SUM(CAST(x AS DECIMAL(38,0))) AS sx,
           SUM(CAST(y AS DECIMAL(38,0))) AS sy,
           SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
           SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
    FROM pts GROUP BY nation
)
SELECT nation, n_orders,
       (CAST(n_orders AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n_orders AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS price_per_day_slope
FROM s
"""


@query("regression_price_drift", _REGR_ORACLE)
def regression_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS slope of order price over time — regression as a
    distributed aggregate.

    Built-in regr_slope accumulates floating covariances whose value
    depends on partition merge order — not reproducible across runs,
    let alone engines. Here x (days since epoch date) and y (floored
    price) are integers, the four moment sums are exact DECIMALs
    (mergeable in any order), and only the final closed-form division
    runs in DOUBLE — bit-identical everywhere. One shuffle (custkey
    join), one partial+final agg; the slope math is free.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pts = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
            F.floor("o_totalprice").cast("bigint").alias("y"),
        )
    )
    s = pts.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    nd = F.col("n_orders").cast("double")
    return s.select(
        "nation",
        "n_orders",
        (
            (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("price_per_day_slope"),
    )


# --------------------------------------------------------------------------
# Conversion funnel over the event stream
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH steps AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
           MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS stage_signup,
       SUM(CASE WHEN t_view  > t_signup THEN 1 ELSE 0 END) AS stage_view,
       SUM(CASE WHEN t_view  > t_signup AND t_click > t_view THEN 1 ELSE 0 END) AS stage_click,
       SUM(CASE WHEN t_view  > t_signup AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END)
         AS stage_purchase
FROM steps
"""


@query("funnel_user_conversion", _FUNNEL_ORACLE)
def funnel_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup→view→click→purchase: a user
    advances a stage only if the next step's FIRST occurrence is
    strictly after the previous step's (NULL timestamps fail the
    comparison, dropping the user — standard tri-state funnel logic).

    One shuffle on user_id, conditional MIN per step in a single pass
    (never one scan per stage), then a one-row rollup. At 100 TB the
    events table is the only big input and it is touched exactly once.
    """
    e = _t(spark, sf_dir, "events")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    steps = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    reached_view = F.col("t_view") > F.col("t_signup")
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        cnt(F.col("t_signup").isNotNull()).alias("stage_signup"),
        cnt(reached_view).alias("stage_view"),
        cnt(reached_click).alias("stage_click"),
        cnt(reached_purchase).alias("stage_purchase"),
    )


# --------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis top-k)
# --------------------------------------------------------------------------

ES_SAMPLE_K = 100

#: 52-bit md5-uniform per doc — 13 hex chars parse exactly into a
#: double-representable integer, so u = (v+1)/2^52 ∈ (0, 1] is the
#: same double on both engines.
_ES_V = hex_to_long_sql("substr(md5(CAST(doc_id AS STRING)), 1, 13)", 13)
_ES_V_DUCK = _ES_V.replace("AS STRING", "AS VARCHAR")

_ES_ORACLE = rf"""
WITH keyed AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           ln(CAST(({_ES_V_DUCK}) + 1 AS DOUBLE) / 4503599627370496.0)
             / len(string_split_regex(trim(text), '\s+')) AS k
    FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS INT) AS sample_rank
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {ES_SAMPLE_K}
"""


@query("sample_weighted_es", _ES_ORACLE)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis):
    every doc draws a deterministic md5-uniform u and the k docs with
    the largest u^(1/weight) — equivalently largest ln(u)/weight —
    are the sample, weight = token count (long docs oversampled in
    proportion).

    This is THE distributed shape for weighted sampling without
    replacement: one scan computing a per-row key, then top-k — which
    Spark compiles to TakeOrderedAndProject (per-partition heaps of k,
    merged on the driver), so there is no shuffle and no global sort
    at any corpus size. The rank column is a window over the k
    SELECTED rows only (one tiny task), not the corpus.

    Parity: u is exact (52-bit integer / 2^52 — both doubles
    bit-identical); ln carries ≤1 ulp cross-engine noise, which only
    matters if two keys coincide within ~1e-16 relative — md5-distinct
    u values make that vanishingly improbable, and the (key, doc_id)
    sort breaks exact ties deterministically. The key itself is never
    output.
    """
    d = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    u = (F.expr(_ES_V) + 1).cast("double") / F.lit(4503599627370496.0)
    keyed = d.withColumn("k", F.log(u) / F.col("n_tokens"))
    topk = keyed.orderBy(F.col("k").desc(), "doc_id").limit(ES_SAMPLE_K)
    w = Window.orderBy(F.col("k").desc(), "doc_id")
    return (
        topk.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "source", "n_tokens", "sample_rank")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split (stratified by construction)
# --------------------------------------------------------------------------

_SPLIT_BUCKET = hex_to_long_sql("substr(md5(CAST(doc_id AS STRING)), 1, 4)", 4)
_SPLIT_BUCKET_DUCK = _SPLIT_BUCKET.replace("AS STRING", "AS VARCHAR")

_SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN ({_SPLIT_BUCKET_DUCK}) % 100 < 80 THEN 'train'
            WHEN ({_SPLIT_BUCKET_DUCK}) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@query("split_train_val_test", _SPLIT_ORACLE)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by md5-bucket of doc_id —
    deterministic (same doc always lands in the same split, across
    engines, retries, repartitions, and corpus growth: adding docs
    never moves an existing one between splits, which rand()-based
    splitting cannot promise). Stratification across sources comes for
    free since the hash is independent of source. Shuffle-free per-row
    projection; at 100 TB this is a zero-cost column, typically used
    as a partition key for the sink write.
    """
    bucket = F.expr(_SPLIT_BUCKET) % 100
    return catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


# --------------------------------------------------------------------------
# Deterministic corpus shuffle + balanced shard assignment
# --------------------------------------------------------------------------

N_SHARDS = 8

_SHARD_KEY = hex_to_long_sql("substr(md5(CAST(concat('shard|', doc_id) AS STRING)), 1, 8)")
_ORDER_KEY = hex_to_long_sql("substr(md5(CAST(concat('order|', doc_id) AS STRING)), 1, 8)")
_SHARD_KEY_DUCK = _SHARD_KEY.replace("AS STRING", "AS VARCHAR")
_ORDER_KEY_DUCK = _ORDER_KEY.replace("AS STRING", "AS VARCHAR")

_SHUFFLE_ORACLE = f"""
SELECT doc_id, source,
       CAST(({_SHARD_KEY_DUCK}) % {N_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
            PARTITION BY ({_SHARD_KEY_DUCK}) % {N_SHARDS}
            ORDER BY ({_ORDER_KEY_DUCK}), doc_id) AS INT) AS pos
FROM documents
"""


@query("corpus_shuffle_shards", _SHUFFLE_ORACLE)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic corpus shuffle into balanced training
    shards — the step between curation and the shard writer: training
    wants documents in pseudo-random order, decorrelated from crawl /
    source order, and reproducibly so (same corpus + salts => the same
    shard files byte-for-byte, across engines, retries, and
    partitionings — rand() gives none of that).

    shard = md5('shard|'||doc_id) % {N_SHARDS}; within-shard position
    ranks a second, independent md5 key, so shard membership and
    training order are uncorrelated. One shuffle (the per-shard
    window). At 100 TB the same two columns drive the sink directly:
    repartition(shard) + sortWithinPartitions(pos) + partitioned
    write — no global sort ever exists, and shard sizes concentrate
    at n/{N_SHARDS} (multinomial, ~±0.1% at 1e9 docs)."""
    d = catalog.load_table(spark, sf_dir, "documents").select("doc_id", "source")
    shard = (F.expr(_SHARD_KEY) % N_SHARDS).cast("int")
    w = Window.partitionBy("shard").orderBy(F.expr(_ORDER_KEY), F.col("doc_id"))
    return (
        d.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "source", "shard", "pos")
    )

