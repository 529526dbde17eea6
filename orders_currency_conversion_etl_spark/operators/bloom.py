"""Bloom-filter semi-join pruning (r15) — cut a fact table's shuffle
volume BEFORE a sort-merge join when the dim side is too big to
broadcast as rows but its KEY SET fits a few-MB bitmap.

This is the pattern behind Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, SPARK-32268) and
every warehouse's join pruning: at 100 TB the expensive part of
`fact JOIN dim` is shuffling the fact rows that will NOT match. A
broadcast hash join avoids the shuffle but needs the dim's ROWS to fit
on every executor; a Bloom bitmap needs ~10 bits per KEY at 1% false
positives — an order of magnitude smaller than the keys themselves
(no 64-bit values, no hash-table overhead) — so it extends the
"broadcast something" range by ~10x: 10^8 dim keys = a 120 MB
hash-join build side, but a 12 MB bitmap. The pruned fact then
shuffles only matching rows (+ the fp fraction) into the real join,
which still produces EXACT results — Bloom filters have no false
negatives, so pruning is semantics-free.

Execution split (the heavy-hitters pattern from operators/sketches.py):
the per-row hashing runs JVM-SIDE under whole-stage codegen — one
``md5`` per key parsed into two independent 32-bit halves (h1, h2),
double-hashed to k positions as ``h1 + i*h2 mod m`` (Kirsch &
Mitzenmacher 2006: two independent hashes suffice for all k) — and
Python only does vectorized numpy BIT arithmetic per Arrow batch: the
build ORs per-partition bitmaps (one m/8-byte array per partition,
reduced to one), the probe tests k bits per row against a broadcast
bitmap. No per-row Python hashing anywhere.

md5 is used for PORTABILITY (same reason the Misra-Gries and sample
operators use it): the bitmap is a persistable artifact and any engine
that can md5 can rebuild or probe it — no dependence on Spark's
internal xxhash seeds across versions.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bloom_params(n_keys: int, fpp: float = 0.01) -> "tuple[int, int]":
    """Standard sizing -> (num_bits, k): m = -n ln p / (ln 2)^2 rounded
    up to a byte multiple, k = (m/n) ln 2 clamped to [1, 16]."""
    if n_keys <= 0:
        raise ValueError("bloom_params needs n_keys > 0")
    if not (0.0 < fpp < 1.0):
        raise ValueError("bloom_params needs 0 < fpp < 1")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, min(16, round(m / n_keys * math.log(2))))
    return m, k


def _h1h2(key: Column) -> "list[Column]":
    """One JVM-side md5 per key -> two independent 32-bit halves.
    Whole-stage-codegen'd; the SAME derivation must be used by build
    and probe (both call this), or membership breaks."""
    digest = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("__bloom_h1"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("__bloom_h2"),
    ]


def _positions(h1: np.ndarray, h2: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """(rows, k) bit positions via double hashing — pure numpy."""
    i = np.arange(k, dtype=np.uint64)
    # uint64 arithmetic wraps mod 2^64, then mod m: positions stay
    # uniform because h1/h2 are uniform on 32 bits and m << 2^32
    return (
        h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
    ) % np.uint64(num_bits)


def build_bloom(df: DataFrame, key_col: str, num_bits: int, k: int) -> bytes:
    """Distributed bitmap build: stage 1 folds each partition's keys
    into ONE m/8-byte bitmap row (numpy bitwise, per Arrow batch);
    stage 2 ORs the per-partition bitmaps on a single reducer. Driver
    receives exactly one bitmap — O(m/8) bytes, independent of row
    count. Cost: one scan + one md5 per key + a #partitions-row
    shuffle of bitmaps."""
    if num_bits % 8:
        raise ValueError("num_bits must be a byte multiple")
    # NULL keys never equi-join, so they do not belong in the bitmap —
    # and md5(NULL) is NULL, which Arrow would deliver as NaN and
    # NaN.astype(uint64) is platform-dependent garbage (a portability
    # hole for a persistable artifact). Filter them out explicitly.
    hashed = df.where(F.col(key_col).isNotNull()).select(*_h1h2(F.col(key_col)))
    bitmap_schema = T.StructType([T.StructField("bitmap", T.BinaryType())])

    def _fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(num_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = _positions(
                pdf["__bloom_h1"].to_numpy(), pdf["__bloom_h2"].to_numpy(),
                num_bits, k,
            ).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    partials = hashed.mapInPandas(_fold, schema=bitmap_schema)

    def _reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(num_bits // 8, dtype=np.uint8)
        for pdf in batches:
            for raw in pdf["bitmap"]:
                bm |= np.frombuffer(bytes(raw), dtype=np.uint8)
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    rows = partials.coalesce(1).mapInPandas(_reduce, schema=bitmap_schema).collect()
    return bytes(rows[0]["bitmap"]) if rows else bytes(num_bits // 8)


def broadcast_bitmap(spark, bitmap: bytes):
    """Ship a bitmap to executors once; the CALLER owns the lifetime —
    call ``bc.unpersist()`` (or ``destroy()``) after the downstream
    action completes. :func:`prune_with_bloom` accepts the result, so
    iterative callers (a loop over many dims) reuse/retire broadcasts
    explicitly instead of accumulating executor-side copies."""
    return spark.sparkContext.broadcast(bitmap)


def _as_broadcast(spark, bitmap, num_bits: int):
    """Wrap-and-validate shared by the two probe-side operators.
    Size is checked BEFORE broadcasting so a mis-sized bytes argument
    raises without leaking an executor-resident broadcast (r16 review:
    the failure path must not accumulate exactly the copies the
    caller-owned-lifetime API exists to prevent)."""
    from pyspark.broadcast import Broadcast

    if isinstance(bitmap, Broadcast):
        nbytes = len(bitmap.value)
        if nbytes * 8 != num_bits:
            raise ValueError(
                f"bitmap is {nbytes * 8} bits, num_bits says {num_bits}"
            )
        return bitmap
    if len(bitmap) * 8 != num_bits:
        raise ValueError(
            f"bitmap is {len(bitmap) * 8} bits, num_bits says {num_bits}"
        )
    return broadcast_bitmap(spark, bitmap)


def _membership_udf(bc, num_bits: int, k: int):
    """k vectorized bit lookups per Arrow batch against a broadcast
    bitmap. Input h1/h2 must come from non-NULL keys (md5(NULL) is
    NULL -> NaN -> undefined uint64 cast); callers guard with an
    isNotNull filter BEFORE this projection."""

    @F.pandas_udf(T.BooleanType())
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        pos = _positions(h1.to_numpy(), h2.to_numpy(), num_bits, k)
        hits = (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hits.all(axis=1))

    return _might_contain


def prune_with_bloom(
    fact: DataFrame, key_col: str, bitmap, num_bits: int, k: int
) -> DataFrame:
    """Filter ``fact`` to rows whose key MIGHT be in the bitmap —
    exact-join-safe (no false negatives) scan-side pruning to run
    BEFORE the real join's shuffle. The bitmap rides to executors as a
    broadcast variable (one copy per executor, not per task); hashing
    is the JVM md5 derivation shared with :func:`build_bloom`, and the
    membership test is k vectorized bit lookups per Arrow batch.
    NULL-key rows are dropped (a NULL never matches an equi/semi join,
    so pruning them is exactness-preserving and mirrors the build's
    NULL filter).

    ``bitmap`` may be raw ``bytes`` (a broadcast is created whose
    lifetime is the SESSION's — fine for one-shot queries) or an
    existing :func:`broadcast_bitmap` result, which the caller owns
    and should ``unpersist()`` after the action completes (the r15
    ADVICE finding: iterative callers must not accumulate copies)."""
    import uuid

    bc = _as_broadcast(fact.sparkSession, bitmap, num_bits)

    # collision-free temp names: a caller column literally named __bh1
    # must survive the projection untouched
    tag = uuid.uuid4().hex[:8]
    c1, c2 = f"__bh1_{tag}", f"__bh2_{tag}"
    h1, h2 = _h1h2(F.col(key_col))
    return (
        fact.where(F.col(key_col).isNotNull())
        .withColumn(c1, h1)
        .withColumn(c2, h2)
        .where(_membership_udf(bc, num_bits, k)(F.col(c1), F.col(c2)))
        .drop(c1, c2)
    )


def anti_join_with_bloom_bypass(
    source: DataFrame,
    sink_keys: DataFrame,
    key: str,
    bitmap,
    num_bits: int,
    k: int,
    join_hint: "str | None" = "shuffle_hash",
) -> DataFrame:
    """``source LEFT ANTI JOIN sink_keys`` with Bloom-bypass routing —
    the anti-join twin of semi-join pruning. A Bloom filter has no
    false negatives, so a source row whose key FAILS the membership
    test is definitely absent from the sink and belongs in the output
    WITHOUT touching the join: it never enters the exchange. Only the
    "might match" fraction (true matches + the fp sliver) shuffles
    into the exact anti-join. NULL-key rows route to the bypass branch
    too (NULL = NULL is false under SQL equality, so a plain left-anti
    always keeps them — exactness preserved).

    Semantics: byte-identical rows to ``source.join(sink_keys, key,
    "left_anti")`` for any bitmap built over the sink's keys
    (tests/test_bloom.py pins this on real tables, fp-heavy bitmaps
    included).

    Cost shape at 100 TB: the source is scanned by BOTH branches (two
    parquet scans with identical pushdown/pruning — sequential reads),
    buying a shuffle that carries only the matching fraction. With a
    steady-state backlog where <20 % of source keys are already
    processed, the exchange drops 80 %+ of its rows (measured:
    BLOOM_AB_r15.json, 71-98 % across 20 %→0.2 % selectivities) —
    rows into the exchange are what become network bytes on a real
    cluster. On a single node shuffle is memcpy and the extra scan +
    Arrow stage can LOSE wall-clock (same artifact, stated in its
    protocol); that is why callers gate this behind a size heuristic
    (see :func:`operators.incremental.unprocessed_at_scale`) instead
    of applying it unconditionally.

    PRECONDITION: ``source`` must be deterministic under re-execution
    (file/table scans, deterministic transforms). The split evaluates
    the source in independent subtrees, so a non-deterministic source
    (``df.sample``, an ``F.rand()``-derived filter, a ``LIMIT`` over
    an unordered shuffle) can draw DIFFERENT rows per branch and lose
    or duplicate rows vs the plain anti-join — the same rule Spark
    itself applies to reused non-deterministic subplans. Persist such
    a source first (not viable at 100 TB — restructure instead)."""
    import uuid

    bc = _as_broadcast(source.sparkSession, bitmap, num_bits)
    might = _membership_udf(bc, num_bits, k)
    tag = uuid.uuid4().hex[:8]
    c1, c2 = f"__bh1_{tag}", f"__bh2_{tag}"
    h1, h2 = _h1h2(F.col(key))

    nonnull = source.where(F.col(key).isNotNull()).withColumn(c1, h1).withColumn(c2, h2)
    flagged = nonnull.withColumn(f"__might_{tag}", might(F.col(c1), F.col(c2)))
    definitely_new = flagged.where(~F.col(f"__might_{tag}")).drop(
        c1, c2, f"__might_{tag}"
    )
    maybe = flagged.where(F.col(f"__might_{tag}")).drop(c1, c2, f"__might_{tag}")
    null_rows = source.where(F.col(key).isNull())

    right = sink_keys.hint(join_hint) if join_hint else sink_keys
    survivors = maybe.join(right, on=key, how="left_anti")
    return definitely_new.unionByName(survivors).unionByName(null_rows)


def bloom_semi_join(
    fact: DataFrame, dim: DataFrame, key_col: str, fpp: float = 0.01,
    n_keys: "int | None" = None,
) -> DataFrame:
    """The composed pattern: size a bitmap from the dim's key count
    (counted if not given), build it distributively, prune the fact,
    then finish with the EXACT semi join — the join now shuffles only
    matching fact rows plus the fp fraction. Use when the dim's rows
    exceed the broadcast threshold but ~10 bits/key fits executor
    memory; below the threshold Spark's own broadcast semi join is
    already optimal (and AQE picks it without help).

    Dim-side cost: ONE scan for the bitmap build plus one for the
    closing join (left_semi deduplicates its right side itself, so no
    distinct() shuffle is added), plus an optional counting scan when
    ``n_keys`` is not supplied — pass it when the caller already knows
    the cardinality (a catalog stat, a previous count) to stay at two."""
    keys = dim.select(key_col)
    if n_keys is None:
        # count what actually enters the bitmap: build_bloom filters
        # NULLs out, so a NULL dim key must not inflate the sizing
        # (r15 ADVICE: the n_keys contract is 'non-NULL dim key count')
        n_keys = keys.where(F.col(key_col).isNotNull()).distinct().count()
    if n_keys == 0:
        return fact.where(F.lit(False))
    num_bits, k = bloom_params(n_keys, fpp)
    bitmap = build_bloom(keys, key_col, num_bits, k)
    pruned = prune_with_bloom(fact, key_col, bitmap, num_bits, k)
    return pruned.join(keys, key_col, "left_semi")
