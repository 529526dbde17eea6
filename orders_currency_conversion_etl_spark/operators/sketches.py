"""Mergeable-sketch state: persisted HLL sketches for incremental
distinct counts.

The reference has no approximate surface (its pipeline is exact
row-at-a-time pandas — `/root/reference/dags/order_currency_conversion_dag.py:105-114`);
this is EXT, the capability class that makes distinct-count analytics
viable at 100 TB: a COUNT(DISTINCT user_id) dashboard that rescans the
fact table is a full shuffle per refresh, while a persisted per-day
HLL sketch table is |days| rows of ~4 KB binary state that answers any
window by UNIONING sketches — no fact scan at all.

Spark primitives (Datasketches, built into Spark 3.5+/4.x):
    hll_sketch_agg(col)     -- build state (map-side partial, mergeable)
    hll_union_agg(sk)       -- merge states (also valid as a window agg)
    hll_sketch_estimate(sk) -- read out the distinct estimate

Algebraic law the whole architecture rests on — and the thing the
tests pin EXACTLY, not approximately: HLL registers merge by max, so
    estimate(union(sketch(part_1) ... sketch(part_n)))
 == estimate(sketch(whole))          for ANY partitioning, any order.
That is what makes the state incrementally maintainable: appending a
day = one O(1) union, reshuffling history = no-op.

Estimates vs exact: the registered rolling query has NO DuckDB oracle
(DuckDB's HLL is a different implementation — cross-engine hashes
can't match; the driver records the weaker rows-only check, same as
the other approx twins). The exact twin lives in-registry as
`dau_wau_rolling` (plans/behavior.py); tests/test_sketches.py bounds
the sketch error against the exact rollup at <2% (lgK=12 on ~1e3
cardinalities is near-exact).

Scale notes (100 TB):
- sketch build: one pass, map-side partial aggregation (the agg is
  commutative/associative) — exactly the cost of the A1 hash agg;
- rolling window: runs over the |days|-row sketch table, never the
  facts; a year of state is ~1.5 MB;
- lgK=12 (4 KB, ±1.6% at high cardinality) is the Spark default —
  raise lg_k for tighter error, linearly more state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import query
from ..sources import catalog

ROLLING_DAYS = 7


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted incremental state: one HLL sketch of user_id per
    event day. Appending a new day touches only that day's partition."""
    ev = catalog.load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    return ev.groupBy("day").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))


@query("agg_hll_rolling_distinct", None)  # rows-only: engine-specific sketch
def agg_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from the sketch table alone.

    The window union runs over |days| rows of binary state — the fact
    table is scanned exactly once (to build the state) no matter how
    many windows are asked. Exact twin: `dau_wau_rolling`; the sketch
    answer tracks it within ~2% (tests/test_sketches.py) at 1/shuffle
    of the cost — the exact rollup must re-dedup (day, user) per
    window, the sketch path unions 7 registers.

    The frame is a CALENDAR-day range — ordering on a day ordinal with
    rangeBetween, not rowsBetween over present rows — so a gap day in
    the events (no traffic) shrinks the union to the days actually
    inside the 7-day window, matching `dau_wau_rolling`'s date_sub
    spine semantics exactly."""
    daily = daily_user_sketches(spark, sf_dir).withColumn(
        "day_ord", F.datediff("day", F.lit("1970-01-01"))
    )
    w = Window.orderBy("day_ord").rangeBetween(-(ROLLING_DAYS - 1), 0)
    rolled = daily.select(
        "day", F.expr("hll_union_agg(sk)").over(w).alias("u")
    )
    return rolled.select(
        "day",
        F.expr("hll_sketch_estimate(u)").alias("est_users_7d"),
    )


def union_estimate(sketches: DataFrame, sk_col: str = "sk") -> int:
    """Merge all sketch rows to one global distinct estimate (the
    incremental-refresh read path: O(|state|), no fact access)."""
    return sketches.agg(
        F.expr(f"hll_sketch_estimate(hll_union_agg({sk_col}))").alias("est")
    ).first()["est"]
