"""Targeted sf10 fixtures for the LSH scaling watch (VERDICT r5 ask #6).

`dedup_minhash_lsh` (2.47× at 3× data) and `knn_lsh_bucketed` (2.03×)
were the only mildly superlinear survivors of the r5 sf3 screen; one
more decade decides whether band/plane collision growth needs a
parameter fix. Only their two input tables are needed, so this
replicates `documents` and `embeddings` to 100× sf0.1 (≈500k docs /
200k vectors) instead of paying a full sf10 build.

Reuses make_sf1's stride/permute/jitter machinery — same replica
semantics (key-shifted copies, per-replica text permutation and
embedding jitter, so near-dup structure grows realistically instead
of producing 100 exact clones of every doc).
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

import make_sf1 as m

DST = os.path.join(os.path.dirname(m.DST), "sf10_lsh")
REPLICAS = 100


def main() -> None:
    m.REPLICAS = REPLICAS
    tmp = DST + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    try:
        for name, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
            src = pq.read_table(os.path.join(m.SRC, f"{name}.parquet"))
            strides = {name: m._stride(src, key)}
            big = m._replicate(name, src, strides)
            rows_per_group = max(1, big.num_rows // 64)
            pq.write_table(big, os.path.join(tmp, f"{name}.parquet"), row_group_size=rows_per_group)
            print(name, src.num_rows, "->", big.num_rows, flush=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(DST, ignore_errors=True)
    os.rename(tmp, DST)


if __name__ == "__main__":
    main()
