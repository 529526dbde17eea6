"""HLL sketch state: the exact merge law, error bounds vs the exact
twin, and the incremental-refresh equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.operators import sketches
from orders_currency_conversion_etl_spark.sources import catalog

from tests.conftest import SF_SMOKE


def _events(spark):
    return catalog.load_table(spark, SF_SMOKE, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )


def test_union_of_parts_equals_sketch_of_whole_exactly(spark):
    """The mergeability law — EXACT equality, not tolerance: HLL
    registers merge by max, so any partitioning of the input produces
    identical merged state. This is what makes the per-day table an
    incrementally maintainable view of the all-time distinct count."""
    ev = _events(spark)
    whole = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
    ).first()[0]
    via_days = sketches.union_estimate(sketches.daily_user_sketches(spark, SF_SMOKE))
    via_random_parts = sketches.union_estimate(
        ev.groupBy(F.pmod(F.xxhash64("user_id"), F.lit(13)).alias("p")).agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk")
        )
    )
    assert whole == via_days == via_random_parts


def test_daily_estimates_track_exact_counts(spark):
    ev = _events(spark)
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    daily = sketches.daily_user_sketches(spark, SF_SMOKE).select(
        "day", F.expr("hll_sketch_estimate(sk)").alias("est")
    )
    for r in daily.collect():
        assert abs(r["est"] - exact[r["day"]]) <= max(2, 0.02 * exact[r["day"]]), r["day"]


def test_rolling_query_tracks_exact_rolling_distinct(spark):
    ev = _events(spark).distinct()
    spine = ev.select("day").distinct().alias("s")
    exact = {
        r["day"]: r["n"]
        for r in spine.join(
            ev.alias("e"),
            (F.col("e.day") <= F.col("s.day"))
            & (F.col("e.day") >= F.date_sub(F.col("s.day"), sketches.ROLLING_DAYS - 1)),
        )
        .groupBy(F.col("s.day").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rolled = sketches.agg_hll_rolling_distinct(spark, SF_SMOKE).collect()
    assert len(rolled) == len(exact)
    for r in rolled:
        e = exact[r["day"]]
        assert abs(r["est_users_7d"] - e) <= max(2, 0.02 * e), (r["day"], r["est_users_7d"], e)


def test_incremental_append_equals_rebuild(spark):
    """Refresh path: state(all days) == union(state(old days), state(new
    day)) — appending is one merge, never a rebuild."""
    daily = sketches.daily_user_sketches(spark, SF_SMOKE).cache()
    last_day = daily.agg(F.max("day")).first()[0]
    old = daily.filter(F.col("day") < F.lit(last_day))
    new = daily.filter(F.col("day") == F.lit(last_day))
    assert sketches.union_estimate(daily) == sketches.union_estimate(old.union(new))
    daily.unpersist()
