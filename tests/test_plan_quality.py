"""Physical-plan assertions: the properties that decide whether a query
survives a 100x scale-up — broadcast vs shuffle joins, predicate
pushdown into the parquet scan, partial aggregation, partition pruning,
shuffle-free bucketed joins."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.plans.relational import (
    agg_pricing_summary,
    filter_composite_predicates,
    topk_expensive_orders,
)
from orders_currency_conversion_etl_spark.plans import reports  # noqa: F401 — @query registration
from orders_currency_conversion_etl_spark.plans import behavior  # noqa: F401 — @query registration
from orders_currency_conversion_etl_spark.plans import graph  # noqa: F401 — @query registration
from orders_currency_conversion_etl_spark.plans.registry import QUERIES
from orders_currency_conversion_etl_spark.sources import catalog, sinks

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_flagship_is_shuffle_free_broadcast_join(spark):
    """The flagship conversion must be scan -> broadcast join -> project:
    no shuffle exchange anywhere (rates are ~25 rows)."""
    plan = _plan(QUERIES["flagship_conversion"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_filters_push_into_parquet_scan(spark):
    plan = _plan(filter_composite_predicates(spark, SF))
    assert "PushedFilters: [" in plan
    # at least one concrete predicate reached the scan
    assert "IsNotNull" in plan.split("PushedFilters:")[1][:400] or "GreaterThan" in plan


def test_aggregation_is_partial_then_final(spark):
    """Map-side combine: two HashAggregate nodes (partial + final) with
    one exchange between them; hot path inside whole-stage codegen."""
    df = agg_pricing_summary(spark, SF)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2
    df.collect()  # AQE finalizes the physical plan only on execution
    final_plan = _plan(df)
    # "*(n) HashAggregate" = the operator runs inside WholeStageCodegen
    assert "*(" in final_plan and "isFinalPlan=true" in final_plan


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition top-k then merge), never a global sort."""
    plan = _plan(topk_expensive_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection over the 7-column orders table must scan
    only those columns."""
    df = catalog.load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    plan = _plan(df)
    scan = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in scan and "o_custkey" in scan
    assert "o_totalprice" not in scan and "o_orderpriority" not in scan


def test_partition_pruning_reads_only_matching_dirs(spark):
    orders = catalog.load_table(spark, SF, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders_part")
        sinks.write_partitioned(orders, path, ["o_orderstatus"])
        back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
        plan = _plan(back)
        pf = plan.split("PartitionFilters:")[1][:200]
        assert "o_orderstatus" in pf and "= F" in pf
        # and the data actually matches
        assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_has_no_shuffle(spark):
    orders = catalog.load_table(spark, SF, "orders")
    customer = catalog.load_table(spark, SF, "customer")
    with tempfile.TemporaryDirectory() as d:
        sinks.write_bucketed(
            orders.withColumn("k", F.col("o_custkey")),
            spark, "orders_bkt", os.path.join(d, "o"), "k", 8,
        )
        sinks.write_bucketed(
            customer.withColumn("k", F.col("c_custkey")),
            spark, "customer_bkt", os.path.join(d, "c"), "k", 8,
        )
        try:
            # disable broadcast so the test exercises the bucketed path:
            # without bucketing this join would need two exchanges
            with_conf = spark.conf
            old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = spark.table("orders_bkt").join(spark.table("customer_bkt"), "k")
                plan = _plan(j)
                assert "SortMergeJoin" in plan
                assert "Exchange hashpartitioning" not in plan
                assert j.count() > 0
            finally:
                with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_bkt")
            spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_limit_pushed_to_scan_side(spark):
    """LIMIT without ORDER BY stays a LocalLimit above the scan — no
    shuffle, no global coordination (SURVEY P3)."""
    df = catalog.load_table(spark, SF, "orders").limit(100)
    plan = _plan(df)
    # single-stage CollectLimit (or Local+Global pair on multi-part
    # scans) — in no case a hash exchange
    assert "CollectLimit" in plan or ("GlobalLimit" in plan and "LocalLimit" in plan)
    assert "Exchange hashpartitioning" not in plan


def test_q3_report_plan_broadcasts_dims_and_takes_ordered(spark):
    """The Q3-shape report must broadcast the filtered customer dim,
    push both date filters into the scans, and compile its top-10 to
    TakeOrderedAndProject (never a global sort)."""
    from orders_currency_conversion_etl_spark.plans.analytics import (
        tpch_q3_shipping_priority,
    )

    plan = _plan(tpch_q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    pushed = plan.split("PushedFilters:", 1)[1]
    assert "GreaterThan" in pushed or "LessThan" in pushed


def test_stratified_sample_is_shuffle_free(spark):
    """The hash-bucket sample is a pure per-row predicate: no exchange
    of any kind in the plan."""
    from orders_currency_conversion_etl_spark.plans.analytics import (
        sample_stratified_hash,
    )

    plan = _plan(sample_stratified_hash(spark, SF))
    assert "Exchange" not in plan


def test_profiler_is_single_scan(spark):
    """One wide aggregate = one pass over documents (the oracle needs
    five); the plan must contain exactly one parquet scan."""
    from orders_currency_conversion_etl_spark.plans.analytics import profile_columns

    plan = _plan(profile_columns(spark, SF))
    assert plan.count("Scan parquet") == 1


def test_q5_six_table_join_broadcasts_all_dims(spark):
    """The six-table join must broadcast every dimension (customer,
    supplier, nation, region) so the lineitem⋈orders orderkey exchange
    is the only shuffle join in the plan."""
    from orders_currency_conversion_etl_spark.plans.analytics import (
        tpch_q5_local_supplier_revenue,
    )

    plan = _plan(tpch_q5_local_supplier_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q6_filters_reach_parquet_scan(spark):
    """Q6 is the pure scan query: all three predicates must appear in
    PushedFilters and the ReadSchema must exclude unused columns."""
    plan = _plan(QUERIES["tpch_q6_forecast_revenue"](spark, SF))
    pushed = plan.split("PushedFilters:")[1][:600]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    scan = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in scan and "l_orderkey" not in scan


def test_q19_disjunctive_stays_hash_join(spark):
    """The OR-of-ANDs predicate must not defeat the equi-key: the plan
    is a broadcast HASH join with a residual filter, never a
    nested-loop."""
    plan = _plan(QUERIES["tpch_q19_disjunctive_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q18_having_filter_feeds_semi_join(spark):
    """The >300-qty key set must broadcast into a LEFT SEMI join so
    lineitem is filtered before the wide joins."""
    plan = _plan(QUERIES["tpch_q18_large_volume_customers"](spark, SF))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q17_window_rewrite_single_lineitem_scan(spark):
    """The correlated-subquery rewrite must touch lineitem ONCE: the
    per-part average is a window over the joined rows, not a second
    scan + re-join."""
    plan = _plan(QUERIES["tpch_q17_small_qty_revenue"](spark, SF))
    assert plan.count("Scan parquet") - plan.lower().count("scan parquet [p_") <= 2
    opt = _optimized(QUERIES["tpch_q17_small_qty_revenue"](spark, SF))
    assert opt.lower().count("lineitem.parquet") <= 1


def test_q7_single_wide_shuffle(spark):
    """Q7's only hash-partitioned exchanges are the lineitem⋈orders
    orderkey join and the final small agg — every dimension join is a
    broadcast."""
    plan = _plan(QUERIES["tpch_q7_volume_shipping"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 3


def test_q22_anti_join_and_broadcast_scalar(spark):
    """The never-ordered predicate must be a broadcast LEFT ANTI join;
    the average-balance scalar is a broadcast 1-row frame."""
    plan = _plan(QUERIES["tpch_q22_dormant_customers"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q15_revenue_agg_feeds_broadcast_max_probe(spark):
    """The quarterly revenue aggregate is computed once; the = MAX
    probe joins against a broadcast 1-row max, not a re-aggregation
    wrapped in a global window."""
    plan = _plan(QUERIES["tpch_q15_top_supplier"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q16_distinct_agg_is_two_phase(spark):
    """COUNT(DISTINCT suppkey) must expand to partial/final aggregates
    (dedup then count), not funnel rows to one task."""
    plan = _plan(QUERIES["tpch_q16_supplier_variety"](spark, SF))
    assert plan.count("HashAggregate") >= 3
    assert "BroadcastHashJoin" in plan


def test_scd2_two_windows_one_shuffle(spark):
    """Change-detection (lag) and interval-close (lead/row_number) both
    partition by o_custkey — Catalyst must reuse the child distribution
    and plan exactly ONE hash exchange."""
    plan = _plan(QUERIES["scd2_priority_history"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_dq_rowlocal_checks_share_one_scan(spark):
    """The three row-local checks are conditional aggregates of a single
    pass; only the referential check adds a (broadcast) join."""
    plan = _plan(QUERIES["dq_expectations_orders"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # one scan for rowlocal + one for the anti-join probe + customer dim
    assert plan.count("FileScan parquet") <= 3


def test_time_rollup_is_single_scan_expand(spark):
    """GROUPING SETS must compile to one parquet scan + one Expand —
    three grains for the price of one pass."""
    plan = _plan(QUERIES["events_time_rollup_sets"](spark, SF))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1


def test_supplier_share_reuses_rollup_partitioning(spark):
    """The percent-of-total window must run over the aggregated rollup:
    lineitem is scanned exactly once."""
    plan = _plan(QUERIES["supplier_share_of_nation"](spark, SF))
    assert plan.count("FileScan parquet") <= 3  # lineitem + supplier + nation


def test_join_strategy_hints_are_honored(spark):
    """The engine exposes Spark's join-strategy knobs: an explicit
    SHUFFLE_HASH hint must override the default sort-merge choice for
    a large-large join (and MERGE must force it back)."""
    o = catalog.load_table(spark, SF, "orders")
    li = catalog.load_table(spark, SF, "lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shj = li.join(
            o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey
        )
        assert "ShuffledHashJoin" in _plan(shj)
        smj = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        assert "SortMergeJoin" in _plan(smj)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime bloom-filter join pruning — the 100 TB semi-join
    pushdown: a selective dim-side filter builds a bloom filter that is
    applied to the fact side BEFORE the shuffle, cutting shuffle input
    to ~the matching fraction. Catalyst only injects it when the
    application side is genuinely large (empirically: fires at the
    local sf1, not at sf0.1 — the right behavior, small scans gain
    nothing from a bloom pass), so this runs against the bench's sf1
    fixtures and skips when they haven't been generated
    (scripts/make_sf1.py)."""
    import pytest

    sf1 = os.path.join(os.path.dirname(__file__), "..", ".localdata", "sf1")
    if not os.path.isdir(sf1):
        pytest.skip("local sf1 fixtures not generated (scripts/make_sf1.py)")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = catalog.load_table(spark, sf1, "lineitem").hint("shuffle_hash")
        o = (
            catalog.load_table(spark, sf1, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .hint("shuffle_hash")
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan, "bloom filter must be built on the filtered side"
        assert "might_contain" in plan, "bloom filter must be applied to the fact side"
        # built from the SELECTIVE side's key
        assert "o_orderkey" in plan.split("bloom_filter_agg")[1][:120]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_semdedup_pairing_is_equi_join_on_cluster(spark):
    """dedup_semantic_clustered's pairing must be an equi-join keyed on
    the cluster id (the bounded-candidate guarantee) — never a nested
    loop — and the checkpointed assignment leaves only the two
    pairing-side exchanges in the final plan."""
    from orders_currency_conversion_etl_spark.operators.dedup import (
        dedup_semantic_clustered,
    )

    plan = _plan(dedup_semantic_clustered(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the pairing join keys on cid on both sides (SMJ or shuffled hash)
    assert "SortMergeJoin [cid" in plan or "ShuffledHashJoin [cid" in plan
    # assignment materialized once: no Window (argmin) survives into
    # the pairing plan, and the only exchanges feed the self-join
    assert "Window" not in plan
    assert plan.count("Exchange") <= 4


def test_zorder_stats_plan_broadcasts_bounds_single_agg_shuffle(spark):
    """layout_zorder_stats: the normalization bounds (a 1-row aggregate)
    must come in via a broadcast join — never a shuffled join against
    the fat side — and the bucket rollup is the plan's ONLY hash
    exchange, partial-aggregated map-side. The z-key itself must be a
    pure projection (no UDF, no extra exchange)."""
    from orders_currency_conversion_etl_spark.operators.layout import (
        layout_zorder_stats,
    )

    plan = _plan(layout_zorder_stats(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the bucket agg
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hilbert_stats_plan_broadcasts_bounds_single_agg_shuffle(spark):
    """layout_hilbert_stats: same contract as the Morton twin — bounds
    broadcast, one hash exchange (the bucket agg) — plus the constraint
    that motivated the per-level-Project rewrite: the 16-level fold must
    stay a LINEAR chain of projections (inlining it into one expression
    tree grows ~3^16 nodes and OOMs the driver — measured)."""
    from orders_currency_conversion_etl_spark.operators.layout import (
        layout_hilbert_stats,
    )

    df = layout_hilbert_stats(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # linearity guard: the whole executed plan stays small
    assert len(plan) < 200_000


def test_hll_rolling_plan_single_fact_shuffle(spark):
    """agg_hll_rolling_distinct: the fact table is shuffled ONCE (the
    per-day sketch agg, partial map-side); the rolling union then runs
    over |days| rows — its single-partition window sort is over state,
    not facts, which is the entire point of the sketch table."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        agg_hll_rolling_distinct,
    )

    plan = _plan(agg_hll_rolling_distinct(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1  # day sketch agg
    assert "partial_hll_sketch_agg" in plan or "ObjectHashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    """heavy_hitters_mg: the exact recount must probe a BROADCAST of
    the merged candidate set (bounded by CAPACITY x partitions rows at
    any corpus size) — a shuffled join here would reintroduce the
    |distinct keys| exchange the sketch exists to avoid. Exactly two
    hash exchanges total: merging the per-partition summaries and the
    final recount agg."""
    from orders_currency_conversion_etl_spark.operators.sketches import (
        heavy_hitters_mg,
    )

    plan = _plan(heavy_hitters_mg(spark, SF))
    assert "BroadcastHashJoin" in plan
    # Executed work: the recount agg exchange + the (cached) summary
    # merge feeding the candidate prune. Everything under the cache's
    # InMemoryTableScan is already-materialized lineage, not a third
    # executed shuffle — cut there, the same convention as the
    # PageRank loop-body dump.
    executed = plan.split("InMemoryTableScan", 1)[0]
    assert executed.count("Exchange hashpartitioning") <= 2
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    # the ONLY python surface is the MG mapInPandas pass (it prints
    # once per branch that shows the cached summary lineage)
    assert 1 <= plan.count("MapInPandas") <= 2
    assert executed.count("MapInPandas") == 0  # recount side is pure JVM
    assert "BatchEvalPython" not in plan


def test_pagerank_materialized_reads_no_fact_table(spark, tmp_path, monkeypatch):
    """pagerank_parts_materialized: once the graph is materialized, the
    query's lineage must touch ONLY the graph tables — a lineitem scan
    would mean the fact derivation silently re-ran."""
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_CACHE", str(tmp_path))
    from orders_currency_conversion_etl_spark.plans.graph import (
        build_graph_edges,
        pagerank_parts_materialized,
    )

    import os as _os

    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.plans.graph import _pagerank_step

    path = build_graph_edges(spark, SF)
    # The query's own result plan is truncated by the in-loop
    # localCheckpoint, so asserting on it is vacuous (r6 ADVICE).
    # Reconstruct the UNcheckpointed loop input exactly as the read
    # path builds it — parquet graph tables + one _pagerank_step —
    # and require that ITS full lineage never reaches the fact table:
    contrib_src = spark.read.parquet(_os.path.join(path, "contrib"))
    deg = spark.read.parquet(_os.path.join(path, "deg"))
    n = deg.count()
    ranks0 = deg.select(F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank"))
    step = _pagerank_step(contrib_src, ranks0, n)
    analyzed = step._jdf.queryExecution().analyzed().toString()
    assert "lineitem" not in analyzed
    # and the end-to-end query still runs green off the same cache:
    df = pagerank_parts_materialized(spark, SF)
    assert df.count() > 0


def test_ivf_materialized_scan_is_dynamically_pruned(spark, tmp_path, monkeypatch):
    """knn_ivf_materialized: the index is written partitioned by cid,
    and the in-cell scan must carry a DYNAMIC partition-pruning filter
    injected from the broadcast query side — the corpus read touches
    1/n_cells of the files, which is the entire point of laying the
    index out by cell."""
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", str(tmp_path))
    from orders_currency_conversion_etl_spark.operators.similarity import (
        knn_ivf_materialized,
    )

    plan = _plan(knn_ivf_materialized(spark, SF))
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan


def test_lsh_materialized_scan_is_dynamically_pruned(spark, tmp_path, monkeypatch):
    """knn_lsh_materialized: the index is written partitioned by
    bucket, and the probe join must carry a DYNAMIC partition-pruning
    filter injected from the broadcast probe side — each query reads
    its B+1 probed bucket partitions, not the corpus (the same
    operating mode test_ivf_materialized_scan_is_dynamically_pruned
    pins for cells)."""
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", str(tmp_path))
    from orders_currency_conversion_etl_spark.operators.similarity import (
        knn_lsh_materialized,
    )

    plan = _plan(knn_lsh_materialized(spark, SF))
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan


def test_incremental_at_scale_never_broadcasts_sink(spark):
    """VERDICT r8 ask #4 + r15 ask #2: the scale form of the J3
    anti-join must not broadcast the sink keyset (fact-sized at
    100 TB) — shuffled hash anti-join on the key, no plan-level
    broadcast anywhere — and since r16 it must carry the Bloom-bypass
    routing on the executed path: an Arrow-batched membership test
    (ArrowEvalPython, never BatchEvalPython) splitting the source into
    a definitely-unprocessed branch that bypasses the exchange and a
    might-match branch that enters the exact anti-join — visible as a
    Union over exactly one join."""
    plan = _plan(QUERIES["incremental_unprocessed_at_scale"](spark, SF))
    assert "ShuffledHashJoin" in plan
    assert "LeftAnti" in plan
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    # the bloom wiring is ON the executed path, not library shelf-ware
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Union" in plan
    assert plan.count("ShuffledHashJoin") == 1  # bypass branch is join-free


def test_bucketed_anti_join_steady_state_has_no_shuffle(spark):
    """The J3 100 TB steady-state claim, demonstrated instead of argued
    (operators/incremental.py docstring: source and sink both bucketed
    by the key -> every incremental batch anti-joins bucket-to-bucket
    with no exchange at all). Builds both sides bucketed, asserts the
    LEFT ANTI plan is exchange-free, and checks the result equals the
    plain-parquet anti-join row set exactly."""
    from orders_currency_conversion_etl_spark.operators.incremental import unprocessed

    orders = catalog.load_table(spark, SF, "orders").withColumn(
        "order_id", F.col("o_orderkey")
    )
    sink = orders.filter(F.col("o_orderkey") % 10 >= 8).select("order_id")
    expected = {r.order_id for r in unprocessed(orders, sink, key="order_id").collect()}

    with tempfile.TemporaryDirectory() as d:
        sinks.write_bucketed(orders, spark, "inc_src_bkt", os.path.join(d, "s"), "order_id", 8)
        sinks.write_bucketed(sink, spark, "inc_sink_bkt", os.path.join(d, "k"), "order_id", 8)
        try:
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                out = spark.table("inc_src_bkt").join(
                    spark.table("inc_sink_bkt"), on="order_id", how="left_anti"
                )
                plan = _plan(out)
                assert "Exchange" not in plan, plan  # neither hash nor broadcast
                got = {r.order_id for r in out.collect()}
                assert got == expected and len(got) > 0
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS inc_src_bkt")
            spark.sql("DROP TABLE IF EXISTS inc_sink_bkt")


def test_scan_spread_is_noop_when_scan_already_parallel(spark, tmp_path):
    """Pin the load_table_parallel no-op-at-scale claim (r11, VERDICT
    r10 ask #7): the round-robin spread exists only for tiny scans.
    When the input already carries >= defaultParallelism partitions —
    always true at 100 TB, where maxPartitionBytes yields thousands of
    tasks — the RoundRobin exchange must be ABSENT from the plan."""
    from orders_currency_conversion_etl_spark.sources import catalog as cat

    target = spark.sparkContext.defaultParallelism
    # stage a many-file copy of documents under the table layout so the
    # REAL entry point runs its guard against it
    cat.load_table(spark, SF, "documents").repartition(target + 4).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    # tiny fixture files get bin-packed below target by openCostInBytes;
    # pin scan partitioning to one-per-file so the scan genuinely
    # arrives "already parallel" (at 100 TB maxPartitionBytes does this
    # for free — thousands of tasks)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.files.openCostInBytes", "4096")
        many = cat.load_table_parallel(spark, str(tmp_path), "documents")
        assert many.rdd.getNumPartitions() >= target
        plan_many = many._jdf.queryExecution().optimizedPlan().toString()
        assert "RoundRobinPartitioning" not in plan_many
        assert "Repartition" not in plan_many
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    # and the small-scan case DOES spread (the guard's other branch)
    small = cat.load_table_parallel(spark, SF, "documents")
    plan_small = small._jdf.queryExecution().optimizedPlan().toString()
    assert small.rdd.getNumPartitions() >= target
    assert "Repartition" in plan_small or "RoundRobinPartitioning" in plan_small


def test_container_header_queries_are_single_stage_no_shuffle(spark):
    """r12: multimodal_webp_dims / multimodal_ogg_info synthesize and
    parse on the same executor row — one narrow scan into one
    mapInPandas stage, zero exchanges at any scale."""
    from orders_currency_conversion_etl_spark.operators import multimodal  # noqa: F401

    from orders_currency_conversion_etl_spark.operators import archive  # noqa: F401

    for name in (
        "multimodal_webp_dims",
        "multimodal_ogg_info",
        # r13 additions: same synthesize-and-parse-in-place shape
        "multimodal_mp4_dims",
        "archive_zip_members",
        "archive_tar_members",
        "multimodal_tiff_dims",
        "archive_warc_records",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "Exchange" not in plan, (name, plan[:600])
        assert "MapInPandas" in plan, (name, plan[:600])


def test_r15_registrations_have_scale_correct_plans(spark):
    """The four r15-registered queries' plan shapes: the two archive
    walks and the row-group manifest are single-stage mapInPandas
    scans with ZERO Exchange (embarrassingly parallel at any SF);
    queue_source_roundtrip's only Exchange is its final groupBy —
    one shuffle keyed on the aggregation key, nothing accidental."""
    from orders_currency_conversion_etl_spark import staged_r15

    fns = {n: f for n, _s, f in staged_r15.STAGED}
    for name in ("archive_gzip_members", "archive_warc_gz_index"):
        plan = _plan(fns[name](spark, SF))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        assert "MapInPandas" in plan
    plan = _plan(fns["lake_rowgroup_stats"](spark, SF))
    assert "Exchange hashpartitioning" not in plan, plan
    plan = _plan(fns["queue_source_roundtrip"](spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
