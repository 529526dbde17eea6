"""Registration-ready r16 queries — staged r14, NOT imported by
``__spark_entry__`` (the r14 window is the full r9 cohort; the r15
window is exactly 10 anchors + the four staged_r15 names + the 36-name
r10 cohort). r16's window has slack: 10 anchors + the 38-name r11
cohort = 48, leaving exactly 2 slots — this module holds both.

Capacity check (same arithmetic as tests/test_staged_r15.py): after
the r15 registration the registry is 204 names / 10 anchors → 194
non-anchors against the (50-10)*5 = 200 budget; registering these two
at r16 gives 196 ≤ 200. Activation checklist = staged_r15.py's module
docstring (import + window entry + artifact regeneration + a quiet-rig
extras introduction baseline).

Every query here is value-exact against its oracle TODAY
(tests/test_staged_r16.py, the registered-then-finalized machinery).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.gif_codec import decode_gif, encode_gif
from .sources import catalog

# ------------------------------------------------------------------
# multimodal_gif_decode — the pure LZW tier (r14, VERDICT r13 ask #7)
# ------------------------------------------------------------------

GIF_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("pixels_md5", T.StringType()),
    ]
)

# Width is a multiple of 4 and the palette has exactly 4 entries whose
# RGB bytes are the first 12 ascii-hex chars of md5(text); pixel p maps
# to palette[p % 4], so the decoded stream is the 12-char block
# repeated w*h/4 times — SQL-reconstructable, making the md5 prove the
# LZW decode + (de)interlace + palette map byte-for-byte (dims/mode
# alone would pass on the header-only gif_dims walk).
GIF_DECODE_ORACLE = """
SELECT doc_id,
       CAST(4 * (1 + doc_id % 6) AS INT) AS width,
       CAST(3 + doc_id % 11 AS INT) AS height,
       'RGB' AS mode,
       md5(repeat(substr(md5(text), 1, 12),
                  (4 * (1 + doc_id % 6)) * (3 + doc_id % 11) // 4))
           AS pixels_md5
FROM documents
"""


def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 GIF pixel decode with zero native deps: synthesize a real
    GIF89a per document executor-side — 4-color global palette keyed
    on md5(text), real LZW compression, odd doc_ids interlaced, every
    third stream carrying a NETSCAPE extension — then decode through
    the pure codec (:mod:`operators.gif_codec`) and emit the
    decoded-pixel md5. Pinned DIRECTLY to :func:`decode_gif` (not the
    PIL-preferring :func:`decode_image_pixels` dispatch): the query's
    purpose is verifying the codec itself, the PNG/JPEG convention.
    One mapInPandas stage, embarrassingly parallel, no shuffle at any
    scale. Reference parity: none (the reference has no media
    surface); north-star EXT like the PNG/JPEG tiers."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.lit(4) * (F.lit(1) + F.col("doc_id") % 6)).cast("int").alias("w"),
        (F.lit(3) + F.col("doc_id") % 11).cast("int").alias("h"),
        F.substring(F.md5(F.col("text")), 1, 12).alias("pal12"),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h, pal12 in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["pal12"]
            ):
                w, h = int(w), int(h)
                idx = bytes(p % 4 for p in range(w * h))
                gif = encode_gif(
                    w,
                    h,
                    idx,
                    pal12.encode("ascii"),
                    interlace=bool(doc_id % 2),
                    loop_extension=(doc_id % 3 == 0),
                )
                gw, gh, mode, rgb = decode_gif(gif)
                rows.append(
                    (doc_id, gw, gh, mode, hashlib.md5(rgb).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_DECODE_SCHEMA.fields]
            )

    return base.mapInPandas(_roundtrip, schema=GIF_DECODE_SCHEMA)


# ------------------------------------------------------------------
# multimodal_png_palette_decode — the r14 PNG matrix tier: palette
# colortype + Adam7 interlace + sub-byte depth under one value hash
# ------------------------------------------------------------------

# Same reconstruction convention as the GIF oracle: 4-entry palette
# from md5(text)'s first 12 ascii-hex chars, pixel p -> palette[p % 4]
# with w % 4 == 0 — so the decoded RGB stream is the 12-char block
# repeated w*h/4 times. Encodes at bitdepth 2 (4 palette slots exactly)
# with Adam7 on odd doc_ids and filter cycling on doc_id % 5 != 0:
# the md5 proves inflate + unfilter + sub-byte unpack + deinterlace +
# palette map byte-for-byte.
PNG_PALETTE_ORACLE = """
SELECT doc_id,
       CAST(4 * (1 + doc_id % 6) AS INT) AS width,
       CAST(3 + doc_id % 11 AS INT) AS height,
       'RGB' AS mode,
       md5(repeat(substr(md5(text), 1, 12),
                  (4 * (1 + doc_id % 6)) * (3 + doc_id % 11) // 4))
           AS pixels_md5
FROM documents
"""


def multimodal_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 palette/interlace PNG decode with zero native deps (r14 —
    the full-matrix :func:`multimodal.decode_png`): synthesize a REAL
    colortype-3 bitdepth-2 PNG per document executor-side (4-color
    PLTE keyed on md5(text), Adam7 on odd doc_ids, cycling scanline
    filters on most), decode through the pure codec, emit the
    decoded-pixel md5. Pinned DIRECTLY to :func:`multimodal.decode_png`
    (the codec-verification convention — not the PIL-preferring
    dispatch). One mapInPandas stage, no shuffle at any scale."""
    from .operators.multimodal import decode_png, encode_png

    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.lit(4) * (F.lit(1) + F.col("doc_id") % 6)).cast("int").alias("w"),
        (F.lit(3) + F.col("doc_id") % 11).cast("int").alias("h"),
        F.substring(F.md5(F.col("text")), 1, 12).alias("pal12"),
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, w, h, pal12 in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["pal12"]
            ):
                w, h = int(w), int(h)
                idx = bytes(p % 4 for p in range(w * h))
                png = encode_png(
                    w,
                    h,
                    idx,
                    cycle_filters=(doc_id % 5 != 0),
                    colortype=3,
                    bitdepth=2,
                    palette=pal12.encode("ascii"),
                    interlace=bool(doc_id % 2),
                )
                gw, gh, mode, rgb = decode_png(png)
                rows.append(
                    (doc_id, gw, gh, mode, hashlib.md5(rgb).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_DECODE_SCHEMA.fields]
            )

    return base.mapInPandas(_roundtrip, schema=GIF_DECODE_SCHEMA)


STAGED: "list[tuple[str, str, object]]" = [
    ("multimodal_gif_decode", GIF_DECODE_ORACLE, multimodal_gif_decode),
    ("multimodal_png_palette_decode", PNG_PALETTE_ORACLE, multimodal_png_palette_decode),
]


def register_all() -> None:
    """Apply the registry decorator to every staged query — the one
    call the r16 session adds alongside the window entry."""
    from .plans.registry import query

    for name, sql, fn in STAGED:
        query(name, sql)(fn)
