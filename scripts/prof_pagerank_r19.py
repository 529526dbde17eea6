"""r19 measurement (guide §1): decompose pagerank_parts at sf0.1 and A/B
the candidate restructurings from VERDICT r18 asks #1 and #4, paired and
interleaved in fresh sessions.

Variants (each is the FULL query, end-to-end through the noop sink):
  v0       current registry query (collect_set edge build, deg via
           groupBy(src) [shuffle], broadcast-join contrib, lazy contrib
           persist, localCheckpoint per iteration)
  vsym     deg derived from the dst-partitioned edge cache via
           groupBy(dst) — ZERO exchange by the symmetry of the edge set
           (outdeg(x) == indeg(x) because (s,d) in E <=> (d,s) in E)
  veager   vsym + contrib_src.count() before the loop so iteration 1
           plans against a materialized cache (VERDICT ask #4 retry)
  vunroll  vsym + the 3 iterations composed into ONE lazy plan (no
           localCheckpoint): 1 action instead of 6 jobs
  vsj      self-join edge build (distinct (okey,pkey) pairs routed
           through repartition(okey), SMJ self-join) + vsym degrees —
           the VERDICT ask #1 shape, no collect_set anywhere

Usage: python scripts/prof_pagerank_r19.py [reps] [sf_dir]
Prints one JSON line per rep per variant; interleave externally by
running variants inside one process round-robin (done here).
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = "/root/repo"
sys.path.insert(0, repo)

import __spark_entry__  # noqa: F401, E402

from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.plans import graph, registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402
from orders_currency_conversion_etl_spark.sources import catalog  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _edges_v0(spark):
    li = catalog.load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    return (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition("dst")
        .distinct()
    )


def _edges_selfjoin(spark):
    li = (
        catalog.load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .repartition("dst")
        .distinct()
    )


def _run_variant(spark, edges_fn, deg_mode, eager, unroll):
    """Full pagerank computation; returns (total_s, phases dict)."""
    t0 = time.perf_counter()
    edges = edges_fn(spark).persist()
    if deg_mode == "src":
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    else:  # symmetry: indeg == outdeg, dst-partitioned -> no exchange
        deg = (
            edges.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("outdeg"))
            .select(F.col("dst").alias("src"), "outdeg")
            .persist()
        )
    n = deg.count()
    t_deg = time.perf_counter()
    ranks = deg.select(F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank"))
    contrib = edges.join(F.broadcast(deg), "src").persist()
    if eager:
        contrib.count()
    t_contrib = time.perf_counter()
    if unroll:
        for _ in range(graph.ITERATIONS):
            ranks = graph._pagerank_step(contrib, ranks, n)
    else:
        for _ in range(graph.ITERATIONS):
            ranks = graph._pagerank_step(contrib, ranks, n).localCheckpoint(eager=True)
    out = ranks.select("node", F.col("rank").cast("decimal(18,12)").alias("rank"))
    noop(out)
    t_end = time.perf_counter()
    for df in (contrib, deg, edges):
        df.unpersist()
    return round(t_end - t0, 3), {
        "deg_count": round(t_deg - t0, 3),
        "contrib": round(t_contrib - t_deg, 3),
        "iters+noop": round(t_end - t_contrib, 3),
    }


VARIANTS = {
    "v0_registry": None,  # the shipped query, timed via registry
    "vold": (_edges_v0, "src", False, False),  # r18 shape: deg via groupBy(src)
    "vsym": (_edges_v0, "sym", False, False),
    "veager": (_edges_v0, "sym", True, False),
    "vunroll": (_edges_v0, "sym", False, True),
    "vsj": (_edges_selfjoin, "sym", False, False),
}


def main() -> None:
    spark = get_spark("prof-pagerank-r19")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # warmup: run the registry query once (JIT + codegen)
    noop(registry.QUERIES["pagerank_parts"](spark, SF))
    spark.catalog.clearCache()

    results: dict[str, list] = {k: [] for k in VARIANTS}
    for rep in range(REPS):
        for name, spec in VARIANTS.items():
            spark.catalog.clearCache()
            if spec is None:
                t0 = time.perf_counter()
                noop(registry.QUERIES["pagerank_parts"](spark, SF))
                total, phases = round(time.perf_counter() - t0, 3), {}
            else:
                total, phases = _run_variant(spark, *spec)
            results[name].append({"total": total, **phases})
            print(
                json.dumps({"rep": rep, "variant": name, "total": total, **phases}),
                flush=True,
            )
    print(
        json.dumps(
            {
                "summary": {
                    k: round(min(r["total"] for r in v), 3) for k, v in results.items()
                },
                "load": round(os.getloadavg()[0], 2),
                "sf_dir": SF,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
