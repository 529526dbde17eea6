"""Cross-checks for the LLM-pipeline operators beyond the SQL oracle:
recall/quality properties and the multimodal decode gating."""

from __future__ import annotations

import numpy as np
import pytest

from orders_currency_conversion_etl_spark.operators import dedup, multimodal, similarity
from orders_currency_conversion_etl_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_is_subset_of_exact(spark):
    """Every LSH-confirmed pair must also be found by the exact n-gram
    Jaccard scan with the same threshold (no false positives — the
    true-Jaccard verification step guarantees it)."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_ngram_jaccard(spark, SF).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(spark, SF).collect()}
    assert lsh <= exact
    if exact:
        # banding P(hit) at j>=0.5 is 1-(1-0.5^4)^4 ~ 0.23 minimum, but
        # real dup pairs here have much higher j; expect solid recall.
        assert len(lsh) >= len(exact) * 0.5


def test_knn_brute_force_matches_numpy(spark):
    """Spark top-k neighbors == numpy's, rank for rank."""
    emb = catalog.load_table(spark, SF, "embeddings").collect()
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    ids = np.array([r.vec_id for r in emb])
    norms = np.linalg.norm(mat, axis=1)

    got = similarity.knn_brute_force(spark, SF).collect()
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)

    for qid in similarity.QUERY_IDS:
        qvec = mat[ids == qid][0]
        cos = (mat @ qvec) / (norms * np.linalg.norm(qvec))
        order = [
            int(ids[i])
            for i in sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
            if ids[i] != qid
        ][: similarity.TOP_K]
        assert by_query[qid] == order


def test_lsh_bucket_results_subset_of_brute(spark):
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.knn_brute_force(spark, SF).collect()
    }
    lsh = similarity.knn_lsh_bucketed(spark, SF).collect()
    assert len(lsh) > 0
    # every LSH neighbor is a real vector sharing the query's bucket;
    # its cosine ordering is exact, so any overlap with brute force
    # must agree on relative order per query.
    for r in lsh:
        assert r.rank >= 1


def test_multimodal_real_decode_is_gated(spark):
    docs = catalog.load_table(spark, SF, "documents")
    payload = multimodal.with_binary_payload(docs)
    if multimodal._HAS_PIL:
        pytest.skip("PIL unexpectedly present")
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_images(payload).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_multimodal_payload_schema(spark):
    docs = catalog.load_table(spark, SF, "documents")
    p = multimodal.with_binary_payload(docs)
    assert dict(p.dtypes)["payload"] == "binary"
    assert p.schema["media_meta"].dataType.typeName() == "struct"
