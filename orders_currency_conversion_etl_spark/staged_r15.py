"""Registration-ready r15 queries — staged late r13, NOT imported by
``__spark_entry__`` (the r14 rotation window is exactly filled by the
due r9 staleness cohort; see the PRIORITY_WINDOW planning comment).

At r15: (1) import this module's :func:`register_all` in
``__spark_entry__`` alongside the other registering imports and call
it, (2) add the four names to ``ROTATION_R15_NEW`` in the window and
make the anchor trim PERMANENT, not one-round: steady-state rotation
arithmetic (pinned in ``tests/test_staged_r15.py``) is
``non_anchor_names <= (50 - len(ANCHORS)) * 5`` — at 200 names and 12
anchors the budget is 188/190, and registering these four makes 12
anchors infeasible (192 > 190). Dropping to 10 anchors gives
40 x 5 = 200 >= 192 with headroom for one more small registration
round; the two demoted anchors just join the normal rotation (they are
re-greened at r15 itself, so their next due round is r20). r15 window:
10 anchors + 4 new + the 36-name r10 cohort = 50 exactly.
(3) regenerate
the registry-keyed artifacts (oracle sweeps, CODEGEN_AUDIT,
PARTITION_INVARIANCE, PLANCHECK_BROADCASTS — scripts/oracle_sweep.py,
audit_codegen.py, audit_partition_invariance.py, audit_broadcasts.py),
(4) record extras introduction
baselines for the four names on THAT session's rig (the
`bench_extras` pattern — deliberately not recorded on the late-r13
rig, which measured ~30-40% slow; see DRIFT_AB_r13_rig2.json). Every query here is ALREADY
value-exact against its oracle in ``tests/test_staged_r15.py``, so
registration is a bookkeeping change, not a correctness risk; all four
were additionally spot-verified value-exact at sf0.1 (the sweep scale)
through the same registered-then-finalized machinery, late r13.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators import archive as ar
from .operators.layout import _LAKE_ROWGROUP_ORACLE, lake_rowgroup_stats
from .sources import catalog

# ------------------------------------------------------------------
# 1. archive_gzip_members — the RFC 1952 multi-member walk, oracled
#    (the r13 library surface's registration; the zip/tar query shape)
# ------------------------------------------------------------------

GZIP_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("members", T.IntegerType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("named_members", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
    ]
)

# One FNAME'd manifest member + one anonymous member per 64-byte chunk;
# uncompressed totals recompute from strlen (compressed sizes are
# deliberately NOT reported — deflate output is not SQL-derivable).
GZIP_MEMBERS_ORACLE = """
SELECT doc_id,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS members,
       CAST(strlen(text) + strlen(CAST(doc_id AS VARCHAR)) AS BIGINT)
           AS total_bytes,
       CAST(1 AS INT) AS named_members,
       'manifest.txt' AS first_name
FROM documents
"""


def archive_gzip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip multi-member enumeration, oracled: per document, pack the
    text into a deterministic record-per-member stream (one FNAME'd
    manifest + anonymous 64-byte chunk members) and walk it back
    through :func:`operators.archive.gzip_members` — header-field
    parsing, per-member CRC32+ISIZE trailer verification and the
    member-boundary inflate are all under the value hash. One
    mapInPandas stage, no shuffle at any scale. The honest O(payload)
    note and its side-car amortization: operators/archive.py."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                blocks = [("manifest.txt", str(int(doc_id)).encode())] + [
                    (None, raw[i * 64 : (i + 1) * 64])
                    for i in range((len(raw) + 63) // 64)
                ]
                listed = ar.gzip_members(ar.build_gzip_members(blocks))
                rows.append(
                    (
                        doc_id,
                        len(listed),
                        sum(m["uncompressed_size"] for m in listed),
                        sum(1 for m in listed if m["name"] is not None),
                        listed[0]["name"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GZIP_MEMBERS_SCHEMA.fields]
            )

    return base.mapInPandas(_roundtrip, schema=GZIP_MEMBERS_SCHEMA)


# ------------------------------------------------------------------
# 2. archive_warc_gz_index — the .cdx side-car build, oracled
# ------------------------------------------------------------------

WARC_GZ_IDX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("records", T.IntegerType()),
        T.StructField("members", T.IntegerType()),
        T.StructField("responses", T.IntegerType()),
        T.StructField("total_block_bytes", T.LongType()),
        T.StructField("last_uri", T.StringType()),
    ]
)

WARC_GZ_IDX_ORACLE = """
SELECT doc_id,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS records,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS members,
       CAST((strlen(text) + 63) // 64 AS INT) AS responses,
       CAST(strlen(text) + strlen(CAST(doc_id AS VARCHAR)) AS BIGINT)
           AS total_block_bytes,
       CASE WHEN strlen(text) = 0 THEN NULL
            ELSE 'https://corpus.local/' || CAST(doc_id AS VARCHAR) || '/'
                 || CAST((strlen(text) - 1) // 64 AS VARCHAR)
       END AS last_uri
FROM documents
"""


def archive_warc_gz_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The side-car index build, oracled: per document, write the text
    as a record-per-member ``.warc.gz`` crawl segment (Common Crawl's
    layout) and enumerate it ONCE through
    :func:`operators.archive.warc_gz_index` — gzip member walk, WARC
    record parse and the member<->record pairing all under the value
    hash (compressed offsets/sizes are reported to callers but not
    compared: deflate byte counts are not SQL-derivable)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                blocks = [
                    (None, ar.build_warc([("warcinfo", None, str(int(doc_id)).encode())]))
                ] + [
                    (
                        None,
                        ar.build_warc(
                            [
                                (
                                    "response",
                                    f"https://corpus.local/{int(doc_id)}/{i}",
                                    raw[i * 64 : (i + 1) * 64],
                                )
                            ]
                        ),
                    )
                    for i in range((len(raw) + 63) // 64)
                ]
                idx = ar.warc_gz_index(ar.build_gzip_members(blocks))
                resp = [e for e in idx if e["warc_type"] == "response"]
                rows.append(
                    (
                        doc_id,
                        len(idx),
                        1 + max(e["member"] for e in idx),
                        len(resp),
                        sum(e["content_length"] for e in idx),
                        resp[-1]["target_uri"] if resp else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_GZ_IDX_SCHEMA.fields]
            )

    return base.mapInPandas(_index, schema=WARC_GZ_IDX_SCHEMA)


# ------------------------------------------------------------------
# 3. queue_source_roundtrip — the native data source end-to-end
# ------------------------------------------------------------------

QUEUE_SOURCE_ORACLE = """
SELECT CAST(o_orderkey % 2 AS INT) AS partition,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS total_price
FROM orders
GROUP BY 1
"""


def queue_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders written INTO a queue through the native
    ``df.write.format("orders_queue")`` writer (driver-commit offset
    assignment) and read back through the native reader (engine-
    visible offsets, arrow record batches), then aggregated per queue
    partition — the whole Python DataSource surface under one exact
    oracle. Eager staging in a scratch dir (the flagship_queue_drain
    pattern); at scale the identical plan runs against a persistent
    broker volume."""
    from .streaming.file_queue import _scratch_dir
    from .streaming.queue_source import register_queue_source

    register_queue_source(spark)
    q = _scratch_dir("queue_source_rt_")
    orders = catalog.load_table(spark, sf_dir, "orders")
    (
        orders.withColumn(
            "partition", (F.col("o_orderkey") % 2).cast("int")
        )
        .repartition(4)
        .write.format("orders_queue")
        .mode("append")
        .option("path", q)
        .save()
    )
    back = spark.read.format("orders_queue").option("path", q).load()
    return back.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total_price"),
    )


# ------------------------------------------------------------------
# The r15 registration list (lake_rowgroup_stats lives in layout.py)
# ------------------------------------------------------------------

STAGED: "list[tuple[str, str, object]]" = [
    ("archive_gzip_members", GZIP_MEMBERS_ORACLE, archive_gzip_members),
    ("archive_warc_gz_index", WARC_GZ_IDX_ORACLE, archive_warc_gz_index),
    ("lake_rowgroup_stats", _LAKE_ROWGROUP_ORACLE, lake_rowgroup_stats),
    ("queue_source_roundtrip", QUEUE_SOURCE_ORACLE, queue_source_roundtrip),
]


def register_all() -> None:
    """Apply the registry decorator to every staged query — the ONE
    call the r15 session adds (plus the window edit; module docstring
    has the full checklist)."""
    from .plans.registry import query

    for name, sql, fn in STAGED:
        query(name, sql)(fn)
