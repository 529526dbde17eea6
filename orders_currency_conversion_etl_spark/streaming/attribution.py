"""Stream-stream interval join: click → purchase attribution.

The missing piece of the streaming surface after windowed aggs
(events_stream.py) and arbitrary state (stateful.py): joining two
streams on key + event-time interval. Spark buffers both sides in the
state store; the watermarks plus the interval condition bound how long
a click waits for its purchase — state is dropped as soon as
``click.ts + 1 hour`` falls behind the purchase watermark, which is
what keeps an infinite stream's state finite at any scale.

The batch twin (registered below) runs the identical join condition on
the static table with a DuckDB oracle; the streaming test
(tests/test_attribution_stream.py) asserts the stream converges to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import catalog

ATTRIBUTION_WINDOW = "1 hour"
WATERMARK = "2 hours"


def attribute_purchases(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Join condition shared by batch and streaming (the Catalyst plan
    is the same; streaming adds state + watermark bookkeeping)."""
    c = clicks.alias("c")
    p = purchases.alias("p")
    return c.join(
        p,
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def split_streams(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One source, two watermarked branches (clicks / purchases)."""
    clicks = events.filter(F.col("event_type") == "click").withWatermark("ts", WATERMARK)
    purchases = events.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", WATERMARK
    )
    return clicks, purchases


_ATTRIBUTION_ORACLE = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id AS user_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


@query("join_interval_attribution", _ATTRIBUTION_ORACLE)
def join_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: every purchase
    within an hour of a same-user click."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return attribute_purchases(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


_ATTR_WINDOWED_ORACLE = """
WITH att AS (
    SELECT p.event_id AS purchase_id,
           c.user_id AS user_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
)
SELECT time_bucket(INTERVAL 1 HOUR, purchase_ts) AS bucket_start,
       COUNT(*) AS n_attributions,
       COUNT(DISTINCT purchase_id) AS n_purchases,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(purchase_value AS DECIMAL(18,6))) AS DECIMAL(38,6))
           AS attributed_value
FROM att GROUP BY bucket_start
"""


@query("attribution_windowed_stats", _ATTR_WINDOWED_ORACLE)
def attribution_windowed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rollup OF the stream-stream interval join — the batch
    twin of `attributed → tumbling-window agg`, the chained-stateful
    shape Spark 3.5+ supports in streaming (interval join followed by
    a windowed aggregation, both bounded by the same watermark).
    attributed_value credits each (click, purchase) pair — a purchase
    reachable from k clicks is counted k times, the standard
    every-touch attribution convention; n_purchases counts it once.

    Scale: the join shuffles both sides on user_id; the rollup re-uses
    the joined stream with one more exchange on the hour bucket whose
    cardinality is tiny (≤ hours in the retention window), then the
    decimal sum is exact and order-free.
    """
    ev = catalog.load_table(spark, sf_dir, "events")
    att = attribute_purchases(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return att.groupBy(
        F.window("purchase_ts", "1 hour").getField("start").alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_attributions"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("purchase_value").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("attributed_value"),
    )
