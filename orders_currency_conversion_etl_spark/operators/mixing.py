"""Source mixing under a token budget — the "data mixture" operator.

Pretraining runs don't take a corpus as-is: they specify target
mixture weights per source (web 50%, code 20%, ...) and a total token
budget, then sample each source to hit its share. This operator does
that in two passes:

  pass 1  per-source available tokens (one hash agg, 20 groups)
  pass 2  per-row keep/drop by deterministic md5 bucket against the
          source's computed keep-rate (map-side; the 20-row rate table
          broadcasts)

The keep decision is a *portable deterministic hash* of doc_id — the
same property as sample_stratified_hash in plans/analytics.py: the
sample is reproducible across engines, retries, and partitionings, and
oversampling a source beyond its availability just caps at keep-all
(rate clamps to 1).

At 100 TB: pass 1 is a map-side-combined agg producing one tiny row
per source; pass 2 is shuffle-free (broadcast rate table + per-row
predicate). Nothing about the shape changes with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_fn import hex_to_long_sql
from ..plans.registry import query
from ..sources import catalog

#: Heavy sources get 10% of the budget each; the remaining 16 share
#: the rest uniformly. Weights sum to 1.
HEAVY_SOURCES = ("src0", "src1", "src2", "src3")
HEAVY_W = 0.1
LIGHT_W = (1.0 - len(HEAVY_SOURCES) * HEAVY_W) / 16.0

#: Fraction of total corpus tokens the mixture may spend.
BUDGET_FRAC = 0.5

_HEAVY_LIST = ", ".join(f"'{s}'" for s in HEAVY_SOURCES)
_WEIGHT_SQL = f"CASE WHEN source IN ({_HEAVY_LIST}) THEN {HEAVY_W!r} ELSE {LIGHT_W!r} END"

#: md5(doc_id) → 16-bit bucket, identical in both engines.
_BUCKET16 = hex_to_long_sql("substr(md5(CAST(doc_id AS STRING)), 1, 4)", 4)

_MIX_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens
    FROM documents
), avail AS (
    SELECT source, SUM(n_tokens) AS avail_tokens FROM toks GROUP BY source
), rates AS (
    SELECT source,
           CAST(floor(least(CAST(1.0 AS DOUBLE),
                ({_WEIGHT_SQL}) * ({BUDGET_FRAC!r} * (SELECT SUM(avail_tokens) FROM avail))
                / avail_tokens) * 65536) AS BIGINT) AS keep_thresh
    FROM avail
)
SELECT t.doc_id, t.source, t.n_tokens
FROM toks t JOIN rates r ON t.source = r.source
WHERE {_BUCKET16.replace("AS STRING", "AS VARCHAR")} < r.keep_thresh
"""


@query("mix_sources_token_budget", _MIX_ORACLE)
def mix_sources_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample each source to its mixture share of a 50%-of-corpus token
    budget; sources whose share exceeds their availability keep
    everything (rate clamps to 1 → threshold 65536 keeps all buckets).
    """
    toks = (
        catalog.load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        )
    )
    avail = toks.groupBy("source").agg(F.sum("n_tokens").alias("avail_tokens"))
    grand = avail.agg(F.sum("avail_tokens").alias("grand_total"))
    weight = F.expr(_WEIGHT_SQL)
    rates = (
        avail.crossJoin(F.broadcast(grand))
        .select(
            "source",
            F.floor(
                F.least(
                    F.lit(1.0).cast("double"),
                    weight * (F.lit(BUDGET_FRAC) * F.col("grand_total")) / F.col("avail_tokens"),
                )
                * 65536
            )
            .cast("bigint")
            .alias("keep_thresh"),
        )
    )
    return (
        toks.join(F.broadcast(rates), "source")
        .filter(F.expr(_BUCKET16) < F.col("keep_thresh"))
        .select("doc_id", "source", "n_tokens")
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixing (multilingual-pretraining upsampling)
# --------------------------------------------------------------------------

#: Temperature exponent: weights ∝ share^ALPHA. α<1 flattens the
#: distribution — rare sources are upsampled relative to their natural
#: share (the standard multilingual-pretraining rebalancing trick).
ALPHA = 0.7

_TEMP_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens
    FROM documents
), avail AS (
    SELECT source, SUM(n_tokens) AS avail_tokens FROM toks GROUP BY source
), grand AS (
    SELECT SUM(avail_tokens) AS grand_total FROM avail
), sh AS (
    SELECT source, avail_tokens,
           CAST(floor(pow(CAST(avail_tokens AS DOUBLE) / CAST((SELECT grand_total FROM grand) AS DOUBLE),
                          {ALPHA!r}) * 1e12) AS BIGINT) AS spow_fp
    FROM avail
), den AS (
    SELECT SUM(spow_fp) AS den FROM sh
), rates AS (
    SELECT source,
           CAST(floor(least(CAST(1.0 AS DOUBLE),
                (CAST(spow_fp AS DOUBLE) / CAST((SELECT den FROM den) AS DOUBLE))
                * ({BUDGET_FRAC!r} * CAST((SELECT grand_total FROM grand) AS DOUBLE))
                / CAST(avail_tokens AS DOUBLE)) * 65536) AS BIGINT) AS keep_thresh
    FROM sh
)
SELECT t.doc_id, t.source, t.n_tokens
FROM toks t JOIN rates r ON t.source = r.source
WHERE {_BUCKET16.replace("AS STRING", "AS VARCHAR")} < r.keep_thresh
"""


@query("mix_sources_temperature", _TEMP_ORACLE)
def mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing with temperature-scaled weights
    w_i ∝ (avail_i / total)^α instead of a fixed weight table — α<1
    upsamples rare sources (the multilingual-pretraining rebalancing
    standard). Same two-pass shape as mix_sources_token_budget: tiny
    per-source stats, then a shuffle-free broadcast + md5-bucket
    predicate over the corpus.

    Parity: the repo's floor fixed-point convention (same as
    kmeans_embeddings / embedding_quantize_int8): each share^α is
    folded to floor(pow(...)*1e12) AS BIGINT on both engines. JVM and
    libm pow can differ by up to 1 ulp (~2e-4 at the 1e12 grid), so
    the floors match unless the true value lands within ~1e-4 of an
    integer boundary (~1e-7 chance per source) — overwhelmingly likely
    rather than guaranteed, the same accepted bound as the
    kmeans_embeddings convention. No decimal rounding step is used
    (Spark rounds a double→DECIMAL cast from the exact binary
    expansion while DuckDB rounds the shortest repr, so a DECIMAL pin
    is engine-divergent near 1e-12 boundaries). The
    normalizing sum is an exact BIGINT sum (< 2e13 « 2^53, so its
    double cast is also exact); every later operand is an identical
    double on both engines and the floor'd 16-bit threshold matches.
    """
    toks = (
        catalog.load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        )
    )
    avail = toks.groupBy("source").agg(F.sum("n_tokens").alias("avail_tokens"))
    grand = avail.agg(F.sum("avail_tokens").alias("grand_total"))
    sh = avail.crossJoin(F.broadcast(grand)).select(
        "source",
        "avail_tokens",
        "grand_total",
        F.floor(
            F.pow(
                F.col("avail_tokens").cast("double") / F.col("grand_total").cast("double"),
                F.lit(ALPHA),
            )
            * F.lit(1e12)
        )
        .cast("bigint")
        .alias("spow_fp"),
    )
    den = sh.agg(F.sum("spow_fp").alias("den"))
    rates = sh.crossJoin(F.broadcast(den)).select(
        "source",
        F.floor(
            F.least(
                F.lit(1.0).cast("double"),
                (F.col("spow_fp").cast("double") / F.col("den").cast("double"))
                * (F.lit(BUDGET_FRAC) * F.col("grand_total").cast("double"))
                / F.col("avail_tokens").cast("double"),
            )
            * 65536
        )
        .cast("bigint")
        .alias("keep_thresh"),
    )
    return (
        toks.join(F.broadcast(rates), "source")
        .filter(F.expr(_BUCKET16) < F.col("keep_thresh"))
        .select("doc_id", "source", "n_tokens")
    )
