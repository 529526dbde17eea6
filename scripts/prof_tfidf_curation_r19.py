"""r19 measurement (guide §1): A/B the tfidf single-scan fix (VERDICT
r18 ask #3) and the curation size-gated broadcast anti-join (ask #5),
paired and interleaved in one session.

tfidf variants:
  t0  registry query (tf lineage consumed twice -> corpus scanned,
      tokenized and exploded twice; zero ReusedExchange)
  t1  tf persisted; n_sources + idf + scored all read the cache ->
      ONE corpus scan

curation variants:
  c0  registry query (final anti-join is SMJ: both sides exchanged)
  c1  dups persisted + counted; anti-join broadcasts dups under a
      size gate (count known exactly at plan time)
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = "/root/repo"
sys.path.insert(0, repo)

import __spark_entry__  # noqa: F401, E402

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from orders_currency_conversion_etl_spark.operators import curation, dedup  # noqa: E402
from orders_currency_conversion_etl_spark.functions.text_fn import token_shingles  # noqa: E402
from orders_currency_conversion_etl_spark.operators.text import (  # noqa: E402
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    CONTAMINATION_BLOCKLIST,
    quality_score_col,
    with_tokens,
)
from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402
from orders_currency_conversion_etl_spark.sources import catalog  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def tfidf_v1(spark):
    from orders_currency_conversion_etl_spark.operators.text import _docs

    tok = (
        with_tokens(_docs(spark, SF))
        .select("source", F.explode("toks").alias("raw"))
        .select("source", F.lower(F.col("raw")).alias("term"))
    )
    tf = (
        tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_sources = tf.select("source").distinct().count()  # materializes tf
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(idf, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_sources)) / F.col("df"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "source",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("tfidf").cast("decimal(18,6)").alias("tfidf"),
            F.col("rn").cast("int").alias("rn"),
        )
    )
    noop(out)
    tf.unpersist()


def curation_v1(spark):
    """curation_pipeline_lsh with dups persisted+counted and the final
    anti-join broadcast under the gate."""
    d = with_tokens(catalog.load_table_parallel(spark, SF, "documents"))
    d = d.filter(quality_score_col() >= curation.QUALITY_THRESHOLD)
    wmin = Window.partitionBy(F.md5("text"))
    d = (
        d.withColumn("_min_id", F.min("doc_id").over(wmin))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id")
    )
    blocked = F.array(*[F.lit(s) for s in CONTAMINATION_BLOCKLIST])
    clean = (
        d.withColumn("shingles", F.array_distinct(token_shingles("toks", k=3)))
        .filter(F.size(F.array_intersect("shingles", blocked)) == 0)
        .select("doc_id", "toks", "shingles")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    sig = clean.withColumn("hashes", dedup._hashes_col()).select(
        "doc_id", *dedup._minhash_cols()
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{b * dedup.LSH_ROWS + r}") for r in range(dedup.LSH_ROWS)],
            ).alias("band_val"),
        )
        for b in range(dedup.LSH_BANDS)
    ]
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("band"))
        .select(
            "doc_id",
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_val").alias("band_val"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = clean.alias("sa"), clean.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    union = F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles")) - inter
    dups = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(inter.cast("double") / union >= dedup.JACCARD_T)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_dups = dups.count()
    dup_side = F.broadcast(dups) if n_dups <= 2_000_000 else dups
    survivors = clean.join(dup_side, "doc_id", "left_anti")

    n_chunks = F.ceil(
        F.greatest(F.size("toks") - F.lit(CHUNK_TOKENS - CHUNK_STRIDE), F.lit(1))
        / F.lit(float(CHUNK_STRIDE))
    ).cast("int")
    chunks = survivors.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_i", "chunk_idx"),
    )
    piece = F.slice("toks", F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    out = chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("chunk_len"),
    )
    noop(out)
    for df in (dups, bands, clean):
        df.unpersist()


def main() -> None:
    spark = get_spark("prof-tfidf-curation-r19")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in ("tfidf_top_terms_per_source", "curation_pipeline_lsh"):
        noop(registry.QUERIES[name](spark, SF))
    spark.catalog.clearCache()

    variants = {
        "t0": lambda: noop(registry.QUERIES["tfidf_top_terms_per_source"](spark, SF)),
        "t1": lambda: tfidf_v1(spark),
        "c0": lambda: noop(registry.QUERIES["curation_pipeline_lsh"](spark, SF)),
        "c1": lambda: curation_v1(spark),
    }
    results: dict[str, list] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            results[name].append(dt)
            print(json.dumps({"rep": rep, "variant": name, "total": dt}), flush=True)
    print(
        json.dumps(
            {
                "summary": {k: min(v) for k, v in results.items()},
                "load": round(os.getloadavg()[0], 2),
                "sf_dir": SF,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
