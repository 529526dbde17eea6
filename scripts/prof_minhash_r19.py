"""r19 measurement (guide §1/§4): the dedup family's per-shingle base
hash parses 8 hex chars with 8 instr/substr chains per shingle
(functions/text_fn.hex_to_long_sql — portable SQL shared with the
DuckDB oracle). Spark has `conv(hex, 16, 10)`, one builtin call; the
ORACLE string stays the portable form, only the Spark-side expression
changes, so this is legal iff the VALUES are identical.

Variants (full dedup_minhash_lsh, noop sink, interleaved):
  m0     registry (digit-expansion base hash)
  mconv  conv()-based base hash
  mfold  digit-expansion + single-pass aggregate() fold computing all
         16 band minima in one traversal of the hash array (vs 16
         array_min(transform(...)) passes)
Prints a value-equality check (hashes arrays, exceptAll both ways)
before timing.
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

from orders_currency_conversion_etl_spark.operators import dedup  # noqa: E402
from orders_currency_conversion_etl_spark.plans import registry  # noqa: E402
from orders_currency_conversion_etl_spark.session import get_spark  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

CONV_HASH_SQL = "CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _pairs_with(spark, hashes_sql: str, fold: bool):
    """dedup_minhash_lsh with a pluggable base-hash / minhash form."""
    sh = dedup._shared(
        dedup._docs_shingled(spark, SF).select("doc_id", "shingles")
    )
    hashes = F.expr(f"transform(shingles, s -> {hashes_sql})")
    if not fold:
        sig = sh.withColumn("hashes", hashes).select(
            "doc_id", "shingles", *dedup._minhash_cols(dedup.MINHASH_K)
        )
    else:
        params = dedup._minhash_params(dedup.MINHASH_K)
        prime = dedup.MINHASH_PRIME
        init = ", ".join(
            "'m{i}', CAST({p} AS BIGINT)".format(i=i, p=prime) for i in range(len(params))
        )
        upd = ", ".join(
            "'m{i}', least(acc.m{i}, ({a} * h + {b}) % {p})".format(i=i, a=a, b=b, p=prime)
            for i, (a, b) in enumerate(params)
        )
        fold_expr = (
            f"aggregate(hashes, named_struct({init}), "
            f"(acc, h) -> named_struct({upd}))"
        )
        sig = (
            sh.withColumn("hashes", hashes)
            .withColumn("_mh", F.expr(fold_expr))
            .select(
                "doc_id",
                "shingles",
                *[F.col(f"_mh.m{i}").alias(f"mh{i}") for i in range(len(params))],
            )
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
    bands = dedup._shared(
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("band")).select(
            "doc_id",
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_val").alias("band_val"),
        )
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
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    union = F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles")) - inter
    jac = inter.cast("double") / union
    return (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= dedup.JACCARD_T)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def main() -> None:
    spark = get_spark("prof-minhash-r19")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # value equality of the two base hashes over the real shingles
    sh = dedup._docs_shingled(spark, SF).select("doc_id", "shingles")
    both = sh.select(
        "doc_id",
        F.expr(f"transform(shingles, s -> {dedup._BASE_HASH_SQL})").alias("h_old"),
        F.expr(f"transform(shingles, s -> {CONV_HASH_SQL})").alias("h_new"),
    )
    n_diff = both.filter(F.col("h_old") != F.col("h_new")).count()
    print(json.dumps({"conv_vs_expansion_mismatch_rows": n_diff}), flush=True)

    noop(registry.QUERIES["dedup_minhash_lsh"](spark, SF))
    spark.catalog.clearCache()

    variants = {
        "m0": lambda: noop(registry.QUERIES["dedup_minhash_lsh"](spark, SF)),
        "mconv": lambda: noop(_pairs_with(spark, CONV_HASH_SQL, fold=False)),
        "mfold": lambda: noop(_pairs_with(spark, dedup._BASE_HASH_SQL, fold=True)),
        "mconvfold": lambda: noop(_pairs_with(spark, CONV_HASH_SQL, fold=True)),
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
