"""Targeted sf10 fixtures (fourth scaling decade), built as needed
rather than a full sf10 (a full build is mostly tables nothing at this
decade reads).

r5 origin (VERDICT r5 ask #6): `dedup_minhash_lsh` (2.47x at 3x data)
and `knn_lsh_bucketed` (2.03x) were the only mildly superlinear
survivors of the r5 sf3 screen, so `documents` and `embeddings` were
replicated to 100x sf0.1 (~500k docs / 200k vectors).

r9 (VERDICT r8 ask #5): the materialized-state family needs the same
decade — `pagerank_parts_materialized` reads graph state built from
`lineitem`/`part`, `quantile_sketch_accuracy` reads histogram state
built from `orders` — so those tables are replicated too (plus no
`supplier` table: only its key stride is needed for lineitem's FK
shift, read from sf0.1 directly).

Reuses make_sf1's stride/permute/jitter machinery — same replica
semantics (key-shifted copies, per-replica text permutation and
embedding jitter, so near-dup structure grows realistically instead
of producing 100 exact clones of every doc).

    python scripts/make_sf10_subset.py            # all sf10 tables
    python scripts/make_sf10_subset.py documents  # just one
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

import make_sf1 as m

DST = os.path.join(os.path.dirname(m.DST), "sf10_lsh")
REPLICAS = 100

#: replicated tables and the parent tables whose strides their FK
#: shifts need (strides always computed from the sf0.1 source).
TABLES = ("documents", "embeddings", "part", "orders", "lineitem")
STRIDE_PARENTS = ("documents", "embeddings", "part", "orders", "supplier", "customer")


def main() -> None:
    m.REPLICAS = REPLICAS
    only = set(sys.argv[1:]) or set(TABLES)
    os.makedirs(DST, exist_ok=True)

    strides = {}
    for name in STRIDE_PARENTS:
        src = pq.read_table(os.path.join(m.SRC, f"{name}.parquet"))
        strides[name] = m._stride(src, m.PRIMARY[name])

    for name in TABLES:
        if name not in only:
            continue
        src = pq.read_table(os.path.join(m.SRC, f"{name}.parquet"))
        big = m._replicate(name, src, strides)
        rows_per_group = max(1, big.num_rows // 64)
        tmp = os.path.join(DST, f"{name}.parquet.tmp")
        pq.write_table(big, tmp, row_group_size=rows_per_group)
        os.replace(tmp, os.path.join(DST, f"{name}.parquet"))
        print(name, src.num_rows, "->", big.num_rows, flush=True)


if __name__ == "__main__":
    main()
