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


def test_streaming_foreachbatch_maintains_sketch_state(spark, tmp_path):
    """The refresh loop end-to-end on a real stream: each micro-batch's
    per-day sketches are MERGED into a persisted state table
    (hll_union_agg over old state + batch partials); after the stream
    drains, the state answers with exactly the batch-built estimates —
    the merge law under incremental arrival, not just static
    partitioning."""
    import os as _os

    from pyspark.sql import functions as F  # noqa: F811
    from orders_currency_conversion_etl_spark.streaming.events_stream import (
        read_events_stream,
        stage_events_as_stream_source,
    )

    stage = _os.path.join(tmp_path, "stage")
    state_dir = _os.path.join(tmp_path, "sketch_state")
    stage_events_as_stream_source(spark, SF_SMOKE, stage)
    stream = read_events_stream(spark, stage, files_per_trigger=3)

    def merge_batch(batch_df, batch_id):
        fresh = batch_df.groupBy(F.to_date("ts").alias("day")).agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk")
        )
        if _os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in _os.listdir(state_dir)
        ):
            old = batch_df.sparkSession.read.parquet(state_dir)
            merged = (
                old.unionByName(fresh)
                .groupBy("day")
                .agg(F.expr("hll_union_agg(sk)").alias("sk"))
            )
        else:
            merged = fresh
        tmp_out = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp_out)
        final = batch_df.sparkSession.read.parquet(tmp_out)
        final.write.mode("overwrite").parquet(state_dir)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", _os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = spark.read.parquet(state_dir).select(
        "day", F.expr("hll_sketch_estimate(sk)").alias("est")
    )
    batch = sketches.daily_user_sketches(spark, SF_SMOKE).select(
        "day", F.expr("hll_sketch_estimate(sk)").alias("est")
    )
    got = {r["day"]: r["est"] for r in state.collect()}
    want = {r["day"]: r["est"] for r in batch.collect()}
    assert got == want  # EXACT: register-max merge is arrival-order-free


def test_rolling_window_uses_calendar_days_not_present_rows(spark, tmp_path):
    """ADVICE r5 (medium): a rowsBetween(-6, 0) frame spans the last 7
    PRESENT days, silently diverging from the documented 7-calendar-day
    semantics whenever the events table has a gap day (no traffic).
    Pin the rangeBetween fix with a gappy fixture: days 1-3, then a
    4-day outage, then days 8-9 — the window at day 8 must cover only
    days {2,3,8}, NOT reach back to day 1."""
    import datetime
    import os as _os

    rows = []
    eid = 0
    for day, users in [
        (1, [1, 2, 3]),
        (2, [3, 4]),
        (3, [5]),
        # days 4-7: outage, no events at all
        (8, [6, 7]),
        (9, [8]),
    ]:
        for u in users:
            eid += 1
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, day, 12, 0, 0),
                    u,
                    "view",
                    1.0,
                    "{}",
                )
            )
    from orders_currency_conversion_etl_spark import schemas

    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, schemas.EVENTS).write.mode("overwrite").parquet(
        _os.path.join(sf_dir, "events.parquet")
    )

    got = {
        r["day"]: r["est_users_7d"]
        for r in sketches.agg_hll_rolling_distinct(spark, sf_dir).collect()
    }
    # calendar-window exact distincts (cardinalities this small are
    # exact under HLL lgK=12):
    by_day = {
        1: {1, 2, 3},
        2: {3, 4},
        3: {5},
        8: {6, 7},
        9: {8},
    }
    want = {
        datetime.date(2024, 1, d): len(
            set().union(*(by_day.get(x, set()) for x in range(d - 6, d + 1)))
        )
        for d in by_day
    }
    assert got == want


def test_mg_summaries_respect_capacity_and_bound(spark):
    """Misra-Gries invariants on the real stream: (1) every partition
    emits at most MG_CAPACITY rows; (2) merged weight understates the
    true count by at most n/(CAPACITY+1) summed over partitions —
    the guarantee that makes candidate containment provable."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        MG_CAPACITY,
        _hh_stream,
        _mg_partition_summaries,
    )

    stream = _hh_stream(spark, SF_SMOKE)
    n_parts = stream.rdd.getNumPartitions()
    summaries = _mg_partition_summaries(stream).cache()
    # (1): survivors bounded by capacity x partitions (+ one n_p
    # sentinel row per partition, key=-1)
    assert summaries.filter(F.col("key") != -1).count() <= MG_CAPACITY * n_parts
    merged = {r["key"]: r["w"] for r in summaries.groupBy("key").agg(
        F.sum("w").alias("w")).collect()}
    exact = {r["key"]: r["n"] for r in stream.groupBy("key").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = sum(exact.values())
    # (3): the sentinel rows sum to exactly n — the merge recovers the
    # global stream size without a second pass
    assert merged.pop(-1) == n
    slack = n / (MG_CAPACITY + 1) + 1
    for k, c in exact.items():
        assert merged.get(k, 0) >= c - slack, (k, c, merged.get(k, 0))
    summaries.unpersist()


def test_heavy_hitters_candidates_contain_true_topk(spark):
    """End-to-end: the exact recount over MG candidates equals the
    exact top-k computed with no sketch at all."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        HH_TOPK,
        _hh_stream,
        heavy_hitters_mg,
    )

    got = [(r["key"], r["n"]) for r in heavy_hitters_mg(spark, SF_SMOKE).collect()]
    want = [
        (r["key"], r["n"])
        for r in _hh_stream(spark, SF_SMOKE)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(HH_TOPK)
        .collect()
    ]
    assert got == want
    # the constructed stream really is skewed: top key carries ~n/2
    n = sum(r[1] for r in want)
    assert want[0][0] == 1 and want[0][1] > 5 * want[1][1]


def test_hh_candidate_prune_is_tight_and_sufficient(spark):
    """The error-band prune must (a) keep every true top-k key and
    (b) actually prune: far fewer candidates than raw survivors."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        HH_TOPK,
        _hh_candidates,
        _hh_stream,
        _mg_partition_summaries,
    )

    stream = _hh_stream(spark, SF_SMOKE)
    summaries = _mg_partition_summaries(stream)
    cand = {r["key"] for r in _hh_candidates(spark, summaries).collect()}
    true_topk = {
        r["key"]
        for r in stream.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(HH_TOPK)
        .collect()
    }
    assert true_topk <= cand  # sufficiency: no true heavy hitter pruned
    n_survivors = summaries.filter(F.col("key") != -1).select("key").distinct().count()
    assert len(cand) < n_survivors  # the prune does real work


def test_streaming_foreachbatch_maintains_mg_state(spark, tmp_path):
    """MG mergeability under incremental arrival: each micro-batch's
    partition summaries are SUMMED into a persisted state table and
    re-pruned to capacity (merging MG summaries and re-decrementing is
    itself a valid MG sketch of the concatenated stream); after the
    stream drains, the exact recount over the state's candidates
    equals the no-sketch exact top-k of the whole stream."""
    import os as _os

    from orders_currency_conversion_etl_spark.operators.sketches import (
        HH_TOPK,
        MG_CAPACITY,
        _hh_stream,
        _mg_partition_summaries,
    )

    stream_df = _hh_stream(spark, SF_SMOKE)
    stage = _os.path.join(tmp_path, "stage")
    stream_df.repartition(6).write.mode("overwrite").parquet(stage)
    state_dir = _os.path.join(tmp_path, "mg_state")

    src = (
        spark.readStream.schema("key bigint")
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
    )

    def merge_batch(batch_df, batch_id):
        fresh = _mg_partition_summaries(batch_df)
        if _os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in _os.listdir(state_dir)
        ):
            old = batch_df.sparkSession.read.parquet(state_dir)
            merged = old.unionByName(fresh).groupBy("key").agg(
                F.sum("w").alias("w")
            )
        else:
            merged = fresh.groupBy("key").agg(F.sum("w").alias("w"))
        tmp_out = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp_out)
        batch_df.sparkSession.read.parquet(tmp_out).write.mode(
            "overwrite"
        ).parquet(state_dir)

    q = (
        src.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", _os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = spark.read.parquet(state_dir)
    # state is a valid merged summary: sentinel mass == true n, and
    # every true top-k key is a candidate with full MG weight bound
    n_true = stream_df.count()
    assert state.filter(F.col("key") == -1).agg(F.sum("w")).first()[0] == n_true
    cand = state.filter((F.col("key") != -1) & (F.col("w") > 0)).select("key")
    got = [
        (r["key"], r["n"])
        for r in stream_df.join(F.broadcast(cand), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(HH_TOPK)
        .collect()
    ]
    want = [
        (r["key"], r["n"])
        for r in stream_df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(HH_TOPK)
        .collect()
    ]
    assert got == want
    assert MG_CAPACITY > 0  # capacity constant stays importable/used


def test_segment_overlap_covers_all_pairs_within_bound(spark):
    """Inclusion-exclusion overlap: one row per unordered segment pair,
    every estimate inside the documented bound, and the exact values
    match a direct computation."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        hll_segment_overlap,
    )

    rows = hll_segment_overlap(spark, SF_SMOKE).collect()
    ev = catalog.load_table(spark, SF_SMOKE, "events").select("event_type", "user_id").distinct()
    types = sorted(r["event_type"] for r in ev.select("event_type").distinct().collect())
    users = {}
    for t in types:
        users[t] = {r["user_id"] for r in ev.filter(F.col("event_type") == t).collect()}
    want = {
        (a, b): len(users[a] & users[b])
        for i, a in enumerate(types)
        for b in types[i + 1:]
        if users[a] & users[b]
    }
    got = {(r["type_a"], r["type_b"]): r["exact_overlap"] for r in rows}
    assert got == want
    assert all(r["within_bound"] for r in rows)


def test_mg_flat_batch_at_capacity_boundary_not_wiped(spark):
    """r6 review regression: with cut taken one position too high, a
    batch of exactly capacity+1 equal-count keys wiped the WHOLE
    summary (undercount > n_p/(cap+1)). The corrected (cap+1)-th-
    largest cut must keep survivors and respect the bound."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        _mg_partition_summaries,
    )

    cap = 4
    # one partition, 5 distinct keys x 3 occurrences each (flat), then
    # one extra heavy key so the summary has something provable to keep
    rows = [(k,) for k in range(1, cap + 2) for _ in range(3)] + [(99,)] * 12
    stream = spark.createDataFrame(rows, "key bigint").repartition(1)
    s = _mg_partition_summaries(stream, capacity=cap)
    got = {r["key"]: r["w"] for r in s.collect()}
    n_p = got.pop(-1)
    assert n_p == len(rows)
    assert 0 < len(got) <= cap  # not wiped, capacity respected
    # the heavy key must survive with the MG bound intact
    assert got.get(99, 0) >= 12 - n_p / (cap + 1)


# --------------------------------------------------------------------------
# Quantile histograms (mergeable-summary family #3)
# --------------------------------------------------------------------------


def test_qs_bin_ladder_matches_reference_formula(spark):
    """The portable CASE ladder computes exactly floor-log2 + 4
    mantissa bits: cross-check every bin/edge/width against the plain
    Python formula over a boundary-dense probe set (powers of two,
    +/-1 neighbours, sub-16 singletons)."""
    probes = sorted(
        {c for e in range(0, 41) for c in ((1 << e) - 1, 1 << e, (1 << e) + 1)}
        | set(range(0, 20))
        | {37, 1000, 123456, 49997859}
    )
    probes = [c for c in probes if c >= 0]

    def ref_bin(c):
        if c < 16:
            return c
        e = c.bit_length() - 1
        return 16 * e + (c >> (e - 4)) - 16

    def ref_edge(b):
        if b < 16:
            return b
        e, m = divmod(b, 16)
        return (16 + m) << (e - 4)

    df = spark.createDataFrame([(c,) for c in probes], "c bigint")
    rows = df.select(
        "c",
        F.expr(sketches._qs_bin_sql("c")).alias("bin"),
    ).collect()
    for r in rows:
        if r["c"] < (1 << 41):
            assert r["bin"] == ref_bin(r["c"]), r["c"]
    bins = sorted({ref_bin(c) for c in probes if c < (1 << 41)})
    bdf = spark.createDataFrame([(b,) for b in bins], "b bigint")
    erows = bdf.select(
        "b",
        F.expr(sketches._qs_edge_sql("b")).alias("edge"),
        F.expr(sketches._qs_width_sql(sketches._qs_edge_sql("b"))).alias("w"),
    ).collect()
    for r in erows:
        assert r["edge"] == ref_edge(r["b"]), r["b"]
        # width bridges to the NEXT occupiable value, including across
        # octaves; bin 15's successor is cents=16 (bins 16..63 are an
        # unoccupied gap in the ID space — IDs jump to 64 at e=4).
        nxt = r["b"] + 1
        if nxt <= 16:
            expected_next = nxt
        else:
            e, m = divmod(nxt, 16)
            expected_next = (16 + m) << (e - 4)
        assert r["edge"] + r["w"] == expected_next, r["b"]


def test_qs_histograms_merge_by_sum_partition_invariant(spark):
    """The merge law: histogram state built per arbitrary partition and
    summed per-bin equals the state of the whole — EXACT equality (the
    same law test the HLL family pins)."""
    o = catalog.load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr(sketches._QS_CENTS).alias("cents"),
    )
    binned = o.select("day", F.expr(sketches._qs_bin_sql("cents")).alias("bin"))
    whole = {
        (r["day"], r["bin"]): r["c"]
        for r in binned.groupBy("day", "bin").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    parts = (
        binned.withColumn("p", F.pmod(F.xxhash64("bin", "day"), F.lit(7)))
        .groupBy("p", "day", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("day", "bin")
        .agg(F.sum("c").alias("c"))
    )
    merged = {(r["day"], r["bin"]): r["c"] for r in parts.collect()}
    assert whole == merged
    state = {
        (r["day"], r["bin"]): r["c"]
        for r in sketches.daily_price_histograms(spark, SF_SMOKE).collect()
    }
    assert state == whole


def test_qs_rolling_estimates_satisfy_rank_law(spark):
    """The rank law, per day and per quantile: est <= true rank-r value
    < est + bin_width — i.e. the reported bin CONTAINS the exact
    discrete quantile. Checked via the registered accuracy query
    (within_bound must be TRUE on every row) AND independently against
    a driver-side exact recompute."""
    rows = sketches.quantile_sketch_accuracy(spark, SF_SMOKE).collect()
    assert rows and all(r["within_bound"] for r in rows)
    # independent exact recompute for a handful of days
    o = catalog.load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.expr(sketches._QS_CENTS).alias("cents"),
    )
    est = {r["day"]: r for r in sketches.quantile_sketch_rolling(spark, SF_SMOKE).collect()}
    data = o.collect()
    by_day = {}
    for r in data:
        by_day.setdefault(r["day"], []).append(r["cents"])
    import datetime as dt

    for day in sorted(est)[:5] + sorted(est)[-3:]:
        vals = sorted(
            c
            for d, cs in by_day.items()
            for c in cs
            if 0 <= (day - d).days <= sketches.QS_ROLLING_DAYS - 1
        )
        n = len(vals)
        assert est[day]["n_7d"] == n
        for p in (50, 95, 99):
            r = (p * n + 99) // 100
            exact = vals[r - 1]
            lo = est[day][f"est_p{p}_cents"]
            assert lo <= exact, (day, p)
            # recover width from edge
            w = 1 if lo < 16 else 1 << (lo.bit_length() - 1 - 4)
            assert exact < lo + w, (day, p)


def test_qs_rolling_uses_calendar_days_not_present_rows(spark, tmp_path):
    """A gap day must shrink the window to the days actually inside it
    (the HLL calendar-frame lesson, pinned for this family too)."""
    import datetime as dt

    rows = [
        (1, 1, "O", "1-URGENT", dt.datetime(2024, 1, 1), 100.00),
        (2, 1, "O", "1-URGENT", dt.datetime(2024, 1, 2), 200.00),
        # gap: Jan 3-9 absent
        (3, 1, "O", "1-URGENT", dt.datetime(2024, 1, 10), 400.00),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_orderpriority string, o_orderdate timestamp, o_totalprice double",
    )
    p = str(tmp_path / "orders.parquet")
    df.write.parquet(p)
    est = {
        r["day"]: r
        for r in sketches.quantile_sketch_rolling(spark, str(tmp_path)).collect()
    }
    # Jan 10's 7-day window covers Jan 4-10: ONLY the 400.00 order.
    d10 = dt.date(2024, 1, 10)
    assert est[d10]["n_7d"] == 1
    lo = est[d10]["est_p50_cents"]
    w = 1 if lo < 16 else 1 << (lo.bit_length() - 1 - 4)
    assert lo <= 40000 < lo + w
    # Jan 2's window covers Jan 1-2: both orders; p50 rank=1 -> 100.00.
    d2 = dt.date(2024, 1, 2)
    assert est[d2]["n_7d"] == 2
    lo2 = est[d2]["est_p50_cents"]
    w2 = 1 if lo2 < 16 else 1 << (lo2.bit_length() - 1 - 4)
    assert lo2 <= 10000 < lo2 + w2


def test_streaming_foreachbatch_maintains_quantile_histogram_state(spark, tmp_path):
    """r7 VERDICT ask #8: the quantile-histogram state under the same
    incremental cadence the HLL family has (the reference's hourly
    refresh, order_currency_conversion_dag.py:14). Each micro-batch of
    orders is binned to per-(day, bin) counts and MERGED into a
    persisted state table via merge_histogram_states; after the stream
    drains, the state is BIT-IDENTICAL to the batch build (per-bin SUM
    is commutative/associative — arrival order cannot matter), and the
    rolling p50/p95/p99 read off the streamed state equals the
    registered query's output exactly."""
    import os as _os

    from orders_currency_conversion_etl_spark.streaming.orders_stream import (
        read_orders_stream,
        stage_orders_as_stream_source,
    )

    stage = _os.path.join(tmp_path, "stage")
    state_dir = _os.path.join(tmp_path, "qs_state")
    stage_orders_as_stream_source(spark, SF_SMOKE, stage, n_files=4)
    stream = read_orders_stream(spark, stage)

    def merge_batch(batch_df, batch_id):
        fresh = (
            batch_df.select(
                F.col("o_orderdate").cast("date").alias("day"),
                F.expr(sketches._QS_CENTS).alias("cents"),
            )
            .select("day", F.expr(sketches._qs_bin_sql("cents")).alias("bin"))
            .groupBy("day", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        if _os.path.isdir(state_dir) and any(
            f.endswith(".parquet") for f in _os.listdir(state_dir)
        ):
            old = batch_df.sparkSession.read.parquet(state_dir)
            merged = sketches.merge_histogram_states(old, fresh)
        else:
            merged = fresh
        tmp_out = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp_out)
        final = batch_df.sparkSession.read.parquet(tmp_out)
        final.write.mode("overwrite").parquet(state_dir)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", _os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(state_dir)
    batch = sketches.daily_price_histograms(spark, SF_SMOKE)
    got = {(r["day"], r["bin"]): r["c"] for r in streamed.collect()}
    want = {(r["day"], r["bin"]): r["c"] for r in batch.collect()}
    assert got == want  # EXACT: per-bin SUM merge is arrival-order-free

    roll_stream = {
        r["day"]: (r["n_7d"], r["est_p50_cents"], r["est_p95_cents"], r["est_p99_cents"])
        for r in sketches._qs_rolling_from_state(streamed).collect()
    }
    roll_batch = {
        r["day"]: (r["n_7d"], r["est_p50_cents"], r["est_p95_cents"], r["est_p99_cents"])
        for r in sketches.quantile_sketch_rolling(spark, SF_SMOKE).collect()
    }
    assert roll_stream == roll_batch
