"""r17 queries — staged early r15, ACTIVATED at r17 (``__spark_entry__``
imports this module and calls :func:`register_all`, 206 -> 208 names;
the r16 window was exactly filled: 10 anchors + the 2 staged_r16 names
+ the 38-name r11 cohort).

Window math (the staged_r15/staged_r16 convention): the r17 due cohort
is the 38-name r12 bucket, leaving exactly ``50 - 10 - 38 = 2`` slots —
these two queries. Capacity after registration: 208 names, non-anchor
198 <= (50 - 10) * 5 = 200. Remaining headroom by round: r18 has 2
slots (r13 cohort is 38), r19 and r20 have ZERO (the r14/r15 buckets
are 40 non-anchor names each) — so any r18+ registration beyond two
more names requires retiring a query or widening the window.

At r17: (1) import this module's :func:`register_all` in
``__spark_entry__`` next to the staged_r15/staged_r16 calls, (2) add
``ROTATION_R17_NEW = [n for n, _s, _f in staged_r17.STAGED]`` and set
``PRIORITY_WINDOW = ANCHORS + ROTATION_R17_NEW + ROTATION_R17_REVALIDATE``
(the r12 cohort, recompute from CORRECTNESS_r01..r16 + the active r16
window), (3) regenerate the registry-keyed artifacts, (4) record extras
introduction baselines, (5) update tests/test_staged_r17.py from its
pre-registration pins to steady-state pins (the r15 rewrite is the
model).

Both queries are value-exact against their oracles TODAY through the
registration machinery (``tests/test_staged_r17.py``), and were
SPOT-VERIFIED VALUE-EXACT AT SF1 in the r16 session (VERDICT r15 ask
#8; artifact ``ORACLE_SWEEP_sf1_staged_r17.json``: video_dims 7.1 s,
warc_gz_fetch 20.5 s on local[32]) — the r17 registration is pure
bookkeeping with zero scale surprises.

What they register:

* ``multimodal_video_dims`` — the unified video-container dispatch
  (:func:`operators.multimodal.video_dims`): per document, synthesize
  MP4 / AVI / MKV cycling on ``doc_id % 3`` and walk the header back.
  This is the first DRIVER-hard signal for the AVI and MKV walks
  (``multimodal_mp4_dims`` covers only the ISO-BMFF branch) and for
  the sniffing dispatch itself. All three fixtures pin
  ``duration_ms = 1000 * k`` with container-specific encodings (MP4:
  ``k x timescale`` ticks; AVI: ``50k`` frames at 20 ms; MKV: float64
  ``1000k`` ticks at the default 1 ns-us TimestampScale), so one SQL
  expression oracles every branch. Scale shape: one mapInPandas stage,
  O(header) per payload, no shuffle at any scale.

* ``archive_warc_gz_fetch`` — the ranged random-access HALF of the
  side-car pattern (the r15 ``archive_warc_gz_index`` registration is
  the build half): per document, write the record-per-member
  ``.warc.gz`` segment, build the CDX side-car AS A PLAN
  (:func:`operators.archive.build_warc_gz_index_df`), prune it to
  every third response record, and serve ONLY those members through
  :func:`operators.archive.fetch_warc_gz_records_df` — the
  index-filter-before-join, the JVM-side binary ``substr`` slice and
  the member-only inflate are all under the value hash (the fetched
  block BYTES are re-measured on the Spark side, so a short or padded
  fetch mismatches). Scale shape: index build is one pass per segment;
  the fetch joins pruned-index-to-segments and ships member-sized
  slices across Arrow, never whole segments.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators import archive as ar
from .operators import multimodal as mm
from .sources import catalog

# ------------------------------------------------------------------
# 1. multimodal_video_dims — the MP4/AVI/MKV dispatch, oracled
# ------------------------------------------------------------------

VIDEO_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

# Every container stripe encodes duration_ms = 1000 * k with
# k = 1 + strlen % 120, so one expression covers all three branches;
# the container label is the dispatch's own report (ftyp brand / "avi"
# / EBML DocType).
VIDEO_DIMS_ORACLE = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'isom'
            WHEN 1 THEN 'avi'
            ELSE CASE WHEN strlen(text) % 2 = 0
                      THEN 'webm' ELSE 'matroska' END
       END AS container,
       CAST(1 + strlen(text) % 640 AS INT) AS width,
       CAST(1 + (strlen(text) // 7) % 480 AS INT) AS height,
       CAST(1000 * (1 + strlen(text) % 120) AS BIGINT) AS duration_ms
FROM documents
"""


def multimodal_video_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified video dims through :func:`multimodal.video_dims`: MP4
    (version-0/1 mvhd+tkhd on a length stripe, largesize moov on a
    fifth stripe, leading zero-dims audio trak), AVI (RIFF hdrl walk
    with a JUNK sub-chunk), MKV (webm/matroska DocType, leading audio
    TrackEntry, streamed unknown-size Segment on a third stripe) —
    every branch's parse under one value hash."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                n = len(text)
                w, h, k = 1 + n % 640, 1 + (n // 7) % 480, 1 + n % 120
                if doc_id % 3 == 0:
                    ts = 90_000 if n % 2 else 48_000
                    payload = mm.encode_mp4_header(
                        "isom", w, h, k * ts, ts,
                        version=n % 2, large_moov=(n % 5 == 0),
                    )
                elif doc_id % 3 == 1:
                    payload = mm.encode_avi_header(w, h, 50 * k, 20_000)
                else:
                    payload = mm.encode_mkv_header(
                        "webm" if n % 2 == 0 else "matroska",
                        w, h, 1000.0 * k,
                        unknown_size_segment=(n % 3 == 0),
                    )
                container, gw, gh, dur = mm.video_dims(payload)
                rows.append((doc_id, container, gw, gh, dur))
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_DIMS_SCHEMA.fields]
            )

    return base.mapInPandas(_dims, schema=VIDEO_DIMS_SCHEMA)


# ------------------------------------------------------------------
# 2. archive_warc_gz_fetch — ranged random access via the side-car
# ------------------------------------------------------------------

WARC_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType()),
        T.StructField("n_fetched", T.LongType()),
        T.StructField("bytes_fetched", T.LongType()),
        T.StructField("last_uri", T.StringType()),
    ]
)

# Segment layout (the staged_r15 index fixture): member 0 = warcinfo
# (seq 0), member i+1 = response over text block i (seq i+1, 64-byte
# blocks). The fetch stripe is seq % 3 == 0 among responses, i.e.
# seqs {3, 6, ...} = blocks {2, 5, ...}: with n = ceil(len/64) blocks,
# that is n // 3 fetches, all 64 bytes except the final block (size
# ((len-1) % 64) + 1) when n % 3 == 0. Docs with fewer than 3 blocks
# fetch nothing and drop out.
WARC_FETCH_ORACLE = """
WITH d AS (
    SELECT doc_id,
           strlen(text) AS len,
           (strlen(text) + 63) // 64 AS n
    FROM documents
)
SELECT doc_id AS segment_id,
       CAST(n // 3 AS BIGINT) AS n_fetched,
       CAST(64 * (n // 3)
            - CASE WHEN n % 3 = 0 THEN 63 - ((len - 1) % 64) ELSE 0 END
            AS BIGINT) AS bytes_fetched,
       'https://corpus.local/' || CAST(doc_id AS VARCHAR) || '/'
           || CAST(3 * (n // 3) - 1 AS VARCHAR) AS last_uri
FROM d
WHERE n >= 3
"""


def _segments_df(docs: DataFrame) -> DataFrame:
    """(segment_id, payload): the record-per-member .warc.gz fixture —
    one warcinfo member + one response member per 64-byte text block
    (identical synthesis to the registered archive_warc_gz_index)."""
    seg_schema = T.StructType(
        [
            T.StructField("segment_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                rows.append((doc_id, ar.build_gzip_members(blocks)))
            yield pd.DataFrame(rows, columns=["segment_id", "payload"])

    return docs.select("doc_id", "text").mapInPandas(_build, schema=seg_schema)


def archive_warc_gz_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random access through the side-car AS A PLAN: build the index
    (one full pass), prune to every third response, fetch ONLY those
    members via the JVM-substr + member-inflate path, and re-measure
    the returned block bytes Spark-side — a fetch that returned wrong
    or truncated blocks mismatches ``bytes_fetched``."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    segs = _segments_df(docs)
    index = ar.build_warc_gz_index_df(segs, "segment_id", "payload")
    wanted = index.where(
        (F.col("warc_type") == "response") & (F.col("seq") % 3 == 0)
    )
    fetched = ar.fetch_warc_gz_records_df(segs, wanted)
    return fetched.groupBy("segment_id").agg(
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum(F.octet_length("block")).alias("bytes_fetched"),
        F.max_by("target_uri", "seq").alias("last_uri"),
    )


STAGED = [
    ("multimodal_video_dims", VIDEO_DIMS_ORACLE, multimodal_video_dims),
    ("archive_warc_gz_fetch", WARC_FETCH_ORACLE, archive_warc_gz_fetch),
]


def register_all() -> None:
    """Apply the registry decorator to every staged query — the ONE
    call the r17 session adds (plus the window edit; module docstring
    has the full checklist)."""
    from .plans.registry import query

    for name, sql, fn in STAGED:
        query(name, sql)(fn)
