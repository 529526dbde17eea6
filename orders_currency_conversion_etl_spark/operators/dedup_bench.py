"""Planted-duplicate benchmark for the near-dup dedup family — the
dedup analogue of ann_bench.py's planted-neighbor harness.

The registered dedup queries are exact-oracled (the banding, hashing
and verification MECHANICS are proven), but their recall on organic
data is unfalsifiable: how many true near-dups does banded MinHash
LSH miss, and does SimHash byte-blocking hold its Hamming budget?
This module plants near-duplicates with a controlled corruption level
so detection quality is measurable against known ground truth:

- :func:`make_planted_docs` appends, for each sampled base document,
  a mutant with a seeded fraction of its tokens replaced by random
  vocabulary tokens. Token replacement degrades bigram-shingle
  Jaccard predictably (each replaced token kills up to two shingles),
  so a replace fraction maps to a true-Jaccard band, and the planted
  (base, mutant) pairs ARE the ground truth.
- the eval (scripts/eval_dedup_planted.py) runs the REGISTERED
  queries unchanged against the planted directory — the corpus is a
  drop-in documents.parquet — and measures recall of planted pairs
  vs the analytic banding expectation P(candidate) = 1-(1-j^r)^b,
  plus the candidate-pair cost the banding exists to bound.
- tests/test_dedup_recall.py pins the tuned thresholds as a CI gate.

Precision needs no harness: the shipped pipelines verify every
candidate with exact Jaccard/Hamming before emitting, so every output
pair is a true pair by construction; the open quality question is
recall and candidate cost, which is what this measures.
"""

from __future__ import annotations

import os

import numpy as np

_SEED = 11


def make_planted_docs(
    sf_dir: str,
    out_dir: str,
    n_pairs: int = 200,
    replace_frac: float = 0.15,
    seed: int = _SEED,
) -> tuple[str, list[tuple[int, int]]]:
    """Write ``<out_dir>/documents.parquet`` = the sf_dir documents
    plus ``n_pairs`` planted near-duplicates; return (path, truth
    pairs [(base_id, mutant_id), ...] with base_id < mutant_id).

    Mutants replace a seeded ``replace_frac`` of token positions with
    tokens drawn from the corpus vocabulary (length preserved — the
    realistic paraphrase/boilerplate-drift shape, and the one that
    stresses shingle overlap rather than length ratios). Base docs are
    sampled evenly across the id range, restricted to docs with >= 20
    tokens so one replacement can't crater the Jaccard band."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    data = tbl.to_pydict()
    ids = data["doc_id"]
    texts = data["text"]
    n = len(ids)

    rng = np.random.default_rng(seed)
    vocab = sorted({t for tx in texts[:500] for t in tx.split()})

    eligible = [i for i in range(n) if len(texts[i].split()) >= 20]
    stride = max(1, len(eligible) // n_pairs)
    base_idx = [eligible[(i * stride + 3) % len(eligible)] for i in range(n_pairs)]
    seen: set[int] = set()
    base_idx = [i for i in base_idx if not (i in seen or seen.add(i))][:n_pairs]

    next_id = max(ids) + 1
    truth: list[tuple[int, int]] = []
    new = {k: list(v) for k, v in data.items()}
    for i in base_idx:
        toks = texts[i].split()
        k = max(1, int(round(replace_frac * len(toks))))
        prng = np.random.default_rng((ids[i] * 1_000_003 + seed) & 0x7FFFFFFF)
        pos = prng.choice(len(toks), size=k, replace=False)
        mut = list(toks)
        for p in pos:
            mut[p] = vocab[int(prng.integers(0, len(vocab)))]
        for col in new:
            if col == "doc_id":
                new[col].append(next_id)
            elif col == "text":
                new[col].append(" ".join(mut))
            elif col == "n_chars":
                new[col].append(len(" ".join(mut)))
            else:
                new[col].append(data[col][i])
        truth.append((ids[i], next_id))
        next_id += 1

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(pa.table(new, schema=tbl.schema), path)
    return path, truth


def shingle_jaccard(a: str, b: str, k: int = 3) -> float:
    """Driver-side exact shingle Jaccard with THE ENGINE'S shingle
    definition (functions.text_fn.token_shingles: distinct space-joined
    token k-grams, k=3) — used to bucket planted pairs into true-
    Jaccard bands. Getting k wrong here silently mislabels the bands:
    a token-replace fraction p kills up to k shingles per hit, so
    trigram Jaccard sits well below bigram Jaccard at the same p."""
    def sh(t: str) -> set[str]:
        toks = t.split()
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def banding_expectation(j: float, rows: int = 4, bands: int = 4) -> float:
    """P(LSH candidate) = 1 - (1 - j^rows)^bands."""
    return 1.0 - (1.0 - j**rows) ** bands


def pair_recall(found_pairs: set[tuple[int, int]], truth: list[tuple[int, int]]) -> float:
    if not truth:
        return 0.0
    hit = sum(1 for p in truth if p in found_pairs)
    return hit / len(truth)
