"""Enforceable near-dup recall: the planted-duplicate CI gate (the
dedup analogue of test_ann_recall.py).

Seeded planted corpora make detection quality deterministic, so the
measured banding S-curve can be pinned: if a refactor of the shingle,
hash, or banding code silently degrades recall — or breaks the
verification filter that guarantees precision — this fails.

Measured reference points (DEDUP_EVAL.json, sf0.1, n=200/band):
  4x4 banding: recall 0.935 at j~0.84, 0.555 at j~0.645
  8x3 banding: recall 1.00  at j~0.84, 0.92  at j~0.645
  both track the analytic expectation within a few points.
Thresholds below have margin and run on the sf0.01 corpus.
"""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as entry_mod

from orders_currency_conversion_etl_spark.operators import dedup_bench as db
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def planted_strong(spark, tmp_path_factory):
    """frac=0.03: true trigram Jaccard ~0.84 — the strong-dup band."""
    out = str(tmp_path_factory.mktemp("dedup_strong"))
    path, truth = db.make_planted_docs(SF_SMOKE, out, n_pairs=80, replace_frac=0.03)
    return out, truth, _jaccards(path, truth)


@pytest.fixture(scope="module")
def planted_mid(spark, tmp_path_factory):
    """frac=0.08: true trigram Jaccard ~0.64 — the zone the shipped
    4x4 S-curve half-misses and the 8x3 banding exists for."""
    out = str(tmp_path_factory.mktemp("dedup_mid"))
    path, truth = db.make_planted_docs(SF_SMOKE, out, n_pairs=80, replace_frac=0.08)
    return out, truth, _jaccards(path, truth)


def _jaccards(path, truth):
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    return np.array([db.shingle_jaccard(texts[a], texts[b]) for a, b in truth])


def _found(spark, name, sf_dir):
    rows = entry_mod.queries()[name](spark, sf_dir).collect()
    return {(r["doc_a"], r["doc_b"]) for r in rows}


def test_minhash_lsh_strong_dup_recall(spark, planted_strong):
    out, truth, js = planted_strong
    detectable = [p for p, j in zip(truth, js) if j >= 0.5]
    rec = db.pair_recall(_found(spark, "dedup_minhash_lsh", out), detectable)
    assert rec >= 0.85  # analytic ~0.94 at j~0.84


def test_minhash_lsh_hr_recovers_mid_band(spark, planted_mid):
    """The reason dedup_minhash_lsh_hr exists: at j~0.64 the 4x4
    banding drops ~45% of true dups; the 8x3 banding must hold >= 0.8
    and strictly dominate the 4x4 on the same corpus."""
    out, truth, js = planted_mid
    detectable = [p for p, j in zip(truth, js) if j >= 0.5]
    rec44 = db.pair_recall(_found(spark, "dedup_minhash_lsh", out), detectable)
    rec83 = db.pair_recall(_found(spark, "dedup_minhash_lsh_hr", out), detectable)
    assert rec83 >= 0.8  # analytic ~0.92 at j~0.64
    assert rec83 > rec44
    assert rec83 - rec44 >= 0.15


def test_minhash_verification_guarantees_precision(spark, planted_mid):
    """Every emitted pair must truly clear the Jaccard threshold —
    candidates below T that leak past verification are a correctness
    bug, not a recall trade (precision is 1.0 by construction)."""
    out, truth, js = planted_mid
    for name in ("dedup_minhash_lsh", "dedup_minhash_lsh_hr"):
        found = _found(spark, name, out)
        below = [p for p, j in zip(truth, js) if j < 0.48]  # margin off T=0.5
        leaked = [p for p in below if p in found]
        assert not leaked, f"{name} emitted sub-threshold pairs: {leaked}"


def test_simhash_strong_dup_recall(spark, planted_strong):
    out, truth, _ = planted_strong
    rec = db.pair_recall(_found(spark, "dedup_simhash", out), truth)
    assert rec >= 0.9  # measured 0.99 at sf0.1
