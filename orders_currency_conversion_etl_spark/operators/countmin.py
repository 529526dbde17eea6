"""Count-min sketch (r15) — mergeable point-frequency state for ANY
key, completing the sketch family's coverage triangle:

- HLL (`sketches.py`): how many DISTINCT keys — no per-key answers;
- Misra-Gries (`sketches.py`): WHICH keys are the top-k — nothing
  about keys outside the summary;
- count-min (here): "how often did THIS key occur", for every key,
  with a one-sided guarantee: estimate >= true ALWAYS (structural —
  counters only ever add), and each row's overcount is eps*N in
  expectation at width w = ceil(e/eps) (Cormode & Muthukrishnan 2005).
  HONEST CAVEAT on the depth bound: the textbook "<= true + eps*N with
  probability 1 - delta at d = ceil(ln 1/delta)" multiplies
  per-row failure probabilities, which requires the d row hashes to be
  independent; this implementation derives all rows from ONE md5 via
  double hashing (h1 + i*h2 mod w), so two keys agreeing on
  (h1 mod w, h2 mod w) collide on EVERY row at once and the formal
  product argument does not apply. In practice the md5 halves behave
  uniformly and the CI accuracy gate measures the real error on a
  planted zipf stream (<=5% of keys over the eps*N band at the d
  sized for delta=1%) — but a caller needing the PROVABLE delta bound
  should build d grids with d independent key salts and take the
  elementwise min.

Why it matters at 100 TB: the grid is w*d int64 counters — a few
hundred KB — however many rows or distinct keys flow through. Build it
once per day/partition of a corpus, persist the grids, and answer
"frequency of key X over any date range" by element-wise ADDING the
grids (commutative + associative, so partition- and order-invariant)
and taking one min-over-rows lookup; no re-scan of the data. The same
property makes the distributed build exact: per-partition grids fold
locally (numpy, per Arrow batch) and a single reducer SUMS them — the
result is byte-identical to a single-partition build (pinned).

Execution split mirrors ``operators/bloom.py`` (whose JVM md5
double-hash derivation this module shares): hashing runs JVM-side
under whole-stage codegen; Python does only vectorized numpy
scatter-adds per Arrow batch. md5 keeps persisted grids PORTABLE
across engines and Spark versions, the same policy as the sample /
heavy-hitter / bloom keys.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import _h1h2, _positions
from .sketches import mg_reduce


def cm_params(eps: float, delta: float) -> "tuple[int, int]":
    """Standard sizing -> (width, depth): w = ceil(e/eps) counters per
    row, d = ceil(ln(1/delta)) rows."""
    if not (0.0 < eps < 1.0) or not (0.0 < delta < 1.0):
        raise ValueError("cm_params needs 0 < eps < 1 and 0 < delta < 1")
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def build_countmin(df: DataFrame, key_col: str, width: int, depth: int) -> np.ndarray:
    """Distributed (depth, width) int64 grid: stage 1 scatter-adds each
    partition's keys into a local grid (numpy ``np.add.at`` per Arrow
    batch), stage 2 SUMS the per-partition grids on one reducer. The
    driver receives exactly one grid — O(depth*width*8) bytes,
    independent of row count. Counter positions are the bloom module's
    JVM-side md5 double-hash: row i probes column
    (h1 + i*h2) mod width."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    if depth > 16:
        raise ValueError("depth > 16 exceeds the double-hash derivation's design range")
    # NULL keys: md5(NULL) is NULL -> NaN in Arrow -> undefined uint64
    # cast. A NULL is not a key occurrence; drop it (the bloom policy).
    hashed = df.where(F.col(key_col).isNotNull()).select(*_h1h2(F.col(key_col)))
    grid_schema = T.StructType([T.StructField("grid", T.BinaryType())])

    def _fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid = np.zeros((depth, width), dtype=np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = _positions(
                pdf["__bloom_h1"].to_numpy(), pdf["__bloom_h2"].to_numpy(),
                width, depth,
            )  # (rows, depth) columns per row of the grid
            for d in range(depth):
                np.add.at(grid[d], pos[:, d].astype(np.int64), 1)
        if any_rows:
            yield pd.DataFrame({"grid": [grid.tobytes()]})

    partials = hashed.mapInPandas(_fold, schema=grid_schema)

    def _reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            for raw in pdf["grid"]:
                grid += np.frombuffer(bytes(raw), dtype=np.int64).reshape(depth, width)
        yield pd.DataFrame({"grid": [grid.tobytes()]})

    rows = partials.coalesce(1).mapInPandas(_reduce, schema=grid_schema).collect()
    if not rows:
        return np.zeros((depth, width), dtype=np.int64)
    return (
        np.frombuffer(bytes(rows[0]["grid"]), dtype=np.int64)
        .reshape(depth, width)
        .copy()
    )


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise ADD — the mergeable-state operation. Grids built
    over disjoint row sets merge into exactly the grid a single build
    over the union would produce."""
    if a.shape != b.shape:
        raise ValueError(f"grid shapes differ: {a.shape} vs {b.shape}")
    return a + b


def cm_estimate(grid: np.ndarray, keys: "list") -> "list[int]":
    """Point-frequency estimates (min over rows) for the given keys —
    driver-side, O(depth) per key. Hashing replays the JVM derivation
    in Python (md5 hex halves), so estimates agree with grids built by
    :func:`build_countmin` byte-for-byte FOR INT AND STRING KEYS —
    the supported key types. (Python ``str()`` and Spark's string cast
    diverge on booleans ('True' vs 'true') and floats ('0.1' vs
    Spark's formatting), so hash keys must be ints or strings; cast
    upstream if needed.)"""
    import hashlib

    depth, width = grid.shape
    out = []
    for key in keys:
        digest = hashlib.md5(str(key).encode()).hexdigest()
        h1, h2 = int(digest[:8], 16), int(digest[8:16], 16)
        est = min(
            int(grid[i, (h1 + i * h2) % width]) for i in range(depth)
        )
        out.append(est)
    return out


def detect_hot_keys_sketched(
    df: DataFrame,
    key: str,
    frac_threshold: float = 0.05,
    max_keys: int = 32,
    depth: int = 5,
    strict_max_keys: bool = False,
) -> list:
    """Hot-key detection in ONE bounded-memory pass — the count-min
    consumer (VERDICT r15 ask #3), drop-in for
    :func:`operators.skew.detect_hot_keys`'s exact groupBy form.

    Why: the exact detector's pre-aggregation is one shuffle of
    |distinct keys| rows — fine when keys are modest, but at 100 TB a
    fact can carry billions of distinct keys and the aggregate itself
    becomes fact-sized. This version never aggregates by key at all:
    each partition folds, IN THE SAME SCAN, (a) a count-min grid
    (numpy scatter-add per Arrow batch) and (b) a Misra-Gries
    candidate summary with capacity max(max_keys, ceil(1/t)); the
    driver ADDs the grids, unions the candidates, and keeps candidates
    whose grid estimate exceeds t*N (N = one grid row's sum — the
    total arrives free, no extra count scan).

    Guarantee (what salting needs): NO FALSE NEGATIVES above the
    threshold. A key with global share STRICTLY greater than t (the
    same strict boundary as the exact detector's ``_n > t * total``)
    has, by pigeonhole, share > t in at least one partition, so it
    survives that partition's Misra-Gries (capacity >= ceil(1/t) keeps
    everything with partition share > 1/(C+1)); the count-min estimate
    only OVER-counts, so it clears the strict t*N bar. A key at
    EXACTLY t*N may be dropped by either detector — callers needing
    the closed boundary should lower t one notch.
    The returned list is truncated to max(max_keys, ceil(1/t)) — the
    raised cap (not bare max_keys) so the at-most-floor(1/t) truly-hot
    keys always fit; a truncation false negative would additionally
    need that many DISTINCT cold keys each overcounted past a hot
    key's estimate, which the eps = t/4 width makes a
    multiple-independent-overcount event, not a boundary case.
    Consequence for the drop-in contract: when frac_threshold <
    1/max_keys the result can EXCEED max_keys (the exact detector
    hard-caps at max_keys and silently drops hot keys in that regime
    — this one refuses to by default). Callers needing the exact
    detector's hard output bound pass ``strict_max_keys=True`` (an
    explicit opt-in, ADVICE r17: a parameter named max_keys that is
    not a hard bound surprises drop-in callers) — that truncates the
    estimate-ranked list at bare max_keys, accepting the same
    silent hot-key drop the exact form has in that regime.
    Alternatively raise frac_threshold so ceil(1/t) <= max_keys; at
    the defaults (t=0.05, max_keys=32) the cap is max_keys exactly
    and the flag is moot.
    False positives (near-threshold keys promoted by the eps*N
    overcount) merely salt a cold key — semantics-preserving by
    construction, the documented one-sided tolerance. The candidate
    SET may vary with partitioning (Misra-Gries survivors do); the
    guaranteed-hot keys are present under every partitioning (pinned
    in tests/test_countmin.py), and the salted join's RESULT is
    partitioning-invariant regardless.

    Keys: any orderable Spark type; NULLs dropped (a NULL never
    equi-joins, so salting it is a no-op anyway). Estimates use each
    candidate's JVM-computed (h1, h2) captured in the same scan — no
    Python-side hash replay, so any key type works.
    """
    if not (0.0 < frac_threshold < 1.0):
        raise ValueError("frac_threshold must be in (0, 1)")
    # width from eps = frac_threshold/4: the overcount band eps*N sits
    # well under the t*N bar, so promotion noise stays near-threshold
    width = math.ceil(math.e / (frac_threshold / 4.0))
    capacity = max(max_keys, int(math.ceil(1.0 / frac_threshold)))
    key_type = df.schema[key].dataType
    hashed = df.where(F.col(key).isNotNull()).select(
        F.col(key), *_h1h2(F.col(key))
    )
    out_schema = T.StructType(
        [
            T.StructField("grid", T.BinaryType()),
            T.StructField("cand_val", T.ArrayType(key_type)),
            T.StructField("cand_h1", T.ArrayType(T.LongType())),
            T.StructField("cand_h2", T.ArrayType(T.LongType())),
        ]
    )

    def _fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid = np.zeros((depth, width), dtype=np.int64)
        counts: dict = {}
        hashes: dict = {}
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h1 = pdf["__bloom_h1"].to_numpy()
            h2 = pdf["__bloom_h2"].to_numpy()
            pos = _positions(h1, h2, width, depth)
            for d in range(depth):
                np.add.at(grid[d], pos[:, d].astype(np.int64), 1)
            # batched Misra-Gries over vectorized per-batch counts
            # (value_counts, not a per-row loop), reduced by the shared
            # one-step order-statistic cut (sketches.mg_reduce — the
            # same bound-preserving decrement the heavy-hitters
            # operator uses; one copy of the subtle math, not two)
            vc = pdf[key].value_counts()
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            firsts = pdf.drop_duplicates(subset=[key])
            for v, a, b in zip(
                firsts[key], firsts["__bloom_h1"], firsts["__bloom_h2"]
            ):
                if v not in hashes:
                    hashes[v] = (int(a), int(b))
            counts = mg_reduce(counts, capacity)
            # prune hashes to the MG survivors: without this the dict
            # grows with every distinct key the partition ever saw,
            # breaking the bounded-memory contract at exactly the
            # billions-of-keys scale this detector exists for (r16
            # review). An evicted key that re-enters counts later
            # re-captures its hash from that batch's firsts.
            hashes = {v: hashes[v] for v in counts}
        if any_rows:
            cand = list(counts)
            yield pd.DataFrame(
                {
                    "grid": [grid.tobytes()],
                    "cand_val": [cand],
                    "cand_h1": [[hashes[v][0] for v in cand]],
                    "cand_h2": [[hashes[v][1] for v in cand]],
                }
            )

    rows = hashed.mapInPandas(_fold, schema=out_schema).collect()
    if not rows:
        return []
    grid = np.zeros((depth, width), dtype=np.int64)
    cands: dict = {}
    for r in rows:
        grid += np.frombuffer(bytes(r["grid"]), dtype=np.int64).reshape(depth, width)
        for v, a, b in zip(r["cand_val"], r["cand_h1"], r["cand_h2"]):
            cands.setdefault(v, (a, b))
    total = int(grid[0].sum())
    bar = frac_threshold * total
    scored = []
    for v, (a, b) in cands.items():
        est = min(int(grid[d, (a + d * b) % width]) for d in range(depth))
        if est > bar:
            scored.append((est, v))
    scored.sort(key=lambda t: (-t[0], str(t[1])))
    # Truncate at `capacity` (= max(max_keys, ceil(1/t))), NOT raw
    # max_keys: at most floor(1/t) keys can hold a share strictly
    # above t, so the raised cap always has room for every truly-hot
    # key even when frac_threshold < 1/max_keys — truncation at bare
    # max_keys could let overcount-promoted cold keys displace a hot
    # one in the estimate ranking (ADVICE r16). strict_max_keys is the
    # documented opt-in back to the exact detector's hard bound
    # (ADVICE r17), which re-accepts that displacement risk.
    cap = max_keys if strict_max_keys else capacity
    return [v for _est, v in scored[:cap]]
