"""Generate local sf1 bench fixtures by 10x-replicating the driver's
sf0.1 testdata with referential-integrity-preserving key shifts.

/root/testdata is read-only and sfs above 0.1 don't exist there, so the
sf1 scaling evidence (BENCH sf0.1 vs sf1 — VERDICT r2 "Next round" #3)
needs locally generated data:  python scripts/make_sf1.py
writes /root/repo/.localdata/sf1/*.parquet (gitignored).

Scaling model (TPC-H-style: more entities, same per-entity shape):
- region/nation: fixed (like TPC-H).
- customer/supplier/part/orders/lineitem/events: 10 replicas; replica 0
  is byte-identical to sf0.1, replicas 1-9 shift every key column by
  r * stride where stride = max(key) + 1 of the parent table, so joins
  keep their selectivity (each order still matches exactly one
  customer, each lineitem one order/part/supplier, each user the same
  event history). Dates/timestamps are left alone: a 10x corpus over
  the same time range is a 10x event rate, which is what scaling means
  for the windowed/sessionized queries.
- documents: keys shift AND replica texts get a seeded per-document
  token permutation. Without it every replica is an exact copy and the
  dedup pair space grows quadratically (100x pairs at 10x corpus) —
  that benchmarks the fixture, not the operator. Permuted replicas
  keep token/length/quality distributions while staying non-duplicate.
- embeddings: keys shift AND replicas get seeded N(0, 0.01) jitter per
  component — same geometry, no artificial 10-way exact ties in the
  kNN/kmeans paths.

Row groups: written 32 per table so a byte-range split can parallelize
single-file scans (sf0.1 files are one row group — the "1-task scan"
rig artifact SCALE.md documents).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
REPLICAS = 10

#: table -> columns shifted by that table's OWN primary-key stride
PRIMARY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

#: table -> {column: parent table whose stride applies}
FOREIGN = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"user_id": "customer"},
}


def _stride(table: pa.Table, key: str) -> int:
    return int(pc.max(table[key]).as_py()) + 1


def _replicate(name: str, table: pa.Table, strides: dict[str, int]) -> pa.Table:
    shifts: dict[str, int] = {}
    if name in PRIMARY:
        shifts[PRIMARY[name]] = strides[name]
    for col, parent in FOREIGN.get(name, {}).items():
        shifts[col] = strides[parent]
    chunks = [table]
    for r in range(1, REPLICAS):
        cols = []
        for field in table.schema:
            col = table[field.name]
            if field.name in shifts:
                col = pc.add(col, pa.scalar(r * shifts[field.name], type=field.type))
            cols.append(col)
        replica = pa.Table.from_arrays(cols, schema=table.schema)
        if name == "documents":
            replica = _permute_texts(replica, r)
        elif name == "embeddings":
            replica = _jitter_embeddings(replica, r)
        chunks.append(replica)
    return pa.concat_tables(chunks)


def _permute_texts(t: pa.Table, r: int) -> pa.Table:
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        toks = text.split()
        rng = np.random.default_rng((doc_id * 1_000_003 + r) & 0x7FFFFFFF)
        out.append(" ".join(np.array(toks, dtype=object)[rng.permutation(len(toks))]))
    return t.set_column(t.schema.get_field_index("text"), "text", pa.array(out, pa.string()))


def _jitter_embeddings(t: pa.Table, r: int) -> pa.Table:
    embs = t["embedding"].to_pylist()
    ids = t["vec_id"].to_pylist()
    out = []
    for vec_id, e in zip(ids, embs):
        rng = np.random.default_rng((vec_id * 1_000_003 + r) & 0x7FFFFFFF)
        v = np.asarray(e, dtype=np.float32) + rng.normal(0, 0.01, len(e)).astype(np.float32)
        out.append(v.tolist())
    return t.set_column(
        t.schema.get_field_index("embedding"),
        "embedding",
        pa.array(out, t.schema.field("embedding").type),
    )


def main() -> None:
    # Write into a sibling temp dir and rename at the end: a partial
    # failure (OOM, disk full) must not leave DST present-but-broken,
    # or every later `os.path.isdir(DST)` check would skip regeneration
    # and bench against corrupt fixtures.
    import shutil

    tmp = DST + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    try:
        strides = {
            name: _stride(pq.read_table(os.path.join(SRC, f"{name}.parquet"), columns=[key]), key)
            for name, key in PRIMARY.items()
        }
        for name in ("region", "nation"):
            src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
            pq.write_table(src, os.path.join(tmp, f"{name}.parquet"))
            print(name, src.num_rows, "(copied)")
        for name in ("customer", "supplier", "part", "orders", "lineitem",
                     "events", "documents", "embeddings"):
            src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
            big = _replicate(name, src, strides)
            rows_per_group = max(1, big.num_rows // 32)
            pq.write_table(big, os.path.join(tmp, f"{name}.parquet"), row_group_size=rows_per_group)
            print(name, src.num_rows, "->", big.num_rows)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(DST, ignore_errors=True)
    os.rename(tmp, DST)


if __name__ == "__main__":
    main()
