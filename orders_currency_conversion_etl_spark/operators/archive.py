"""Archive-container enumeration (r13, VERDICT r12 ask #8): ZIP
central-directory walk, header-only — the commonest raw form of
web-scale text dumps (Common-Crawl-style corpus drops, wiki exports)
arrives as archives, and a curation pipeline's FIRST pass is "what's
in here" without extracting anything.

Pattern: the archive bytes live in an opaque ``binary`` column (the
multimodal posture, operators/multimodal.py); enumeration runs as an
Arrow-batched ``mapInPandas`` and reads ONLY the end-of-central-
directory record plus the central directory itself — for a 1 GiB
member-heavy zip that is a few KiB of trailing bytes, so at 100 TB the
enumeration cost is O(members), never O(payload). On an object store
the EOCD-first layout is exactly why zip listing works with two ranged
GETs; here payloads are already column values so the walk is in-memory.

The PARSER is an original struct walk (PKWARE APPNOTE layout: EOCD
``PK\\x05\\x06``, central file header ``PK\\x01\\x02``); the registered
query's FIXTURE is built with stdlib ``zipfile`` — building with the
library and parsing with the independent walk keeps the verification
honest (the WAV/mu-law pattern, operators/multimodal.py).

Reference parity: none — the reference is tabular-only
(BASELINE.json:6); EXT north-star surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.registry import query
from ..sources import catalog

_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"


def zip_members(payload: bytes) -> list[dict]:
    """Central-directory walk -> one dict per member:
    ``{name, compressed_size, uncompressed_size, method, offset}``.
    Reads the EOCD record (scanned backward through the maximal
    65 557-byte comment tail, per APPNOTE 4.3.16) and the central
    directory only — local headers and member data are never touched.
    The EOCD entry count must match the walked count (a truncated or
    spliced directory fails loudly). ZIP64 archives are honestly
    gated: the 0xFFFF/0xFFFFFFFF sentinel values raise
    NotImplementedError naming the gap."""
    tail_start = max(0, len(payload) - (22 + 65535))
    eocd = payload.rfind(_EOCD_SIG, tail_start)
    if eocd < 0 or eocd + 22 > len(payload):
        raise ValueError("not a ZIP payload (no end-of-central-directory record)")
    n_total, cd_size, cd_off = struct.unpack("<HII", payload[eocd + 10 : eocd + 20])
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        raise NotImplementedError("ZIP64 archives not supported (EOCD64 locator walk)")
    pos, end = cd_off, cd_off + cd_size
    if end > len(payload):
        raise ValueError("ZIP central directory overruns the payload")
    members: list[dict] = []
    while pos + 4 <= end and payload[pos : pos + 4] == _CDH_SIG:
        if pos + 46 > end:
            raise ValueError("truncated ZIP central file header")
        # APPNOTE 4.3.12 central file header, fields after the sig:
        # made-by, needed, flags, method, time, date, crc, csize,
        # usize, name/extra/comment lens, disk, internal, external,
        # local-header offset.
        (
            _made,
            _need,
            _flags,
            method,
            _time,
            _date,
            _crc,
            csize,
            usize,
            name_len,
            extra_len,
            comment_len,
            _disk,
            _internal,
            _external,
            local_off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", payload[pos + 4 : pos + 46])
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            raise NotImplementedError("ZIP64 member sizes not supported")
        name = payload[pos + 46 : pos + 46 + name_len].decode("utf-8", "replace")
        members.append(
            {
                "name": name,
                "compressed_size": csize,
                "uncompressed_size": usize,
                "method": method,
                "offset": local_off,
            }
        )
        pos += 46 + name_len + extra_len + comment_len
    if len(members) != n_total:
        raise ValueError(
            f"ZIP central directory walked {len(members)} entries, "
            f"EOCD declares {n_total}"
        )
    return members


def build_zip(members: "list[tuple[str, bytes]]") -> bytes:
    """Deterministic stdlib-zipfile archive: fixed DOS timestamp
    (1980-01-01), ZIP_STORED, members in argument order — so the same
    inputs always produce byte-identical archives (the fixture half;
    :func:`zip_members` is the independent parse half)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in members:
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


ZIP_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("members", T.IntegerType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
    ]
)

# One manifest member (the doc_id rendered as text) plus one member per
# 64-byte chunk of the utf-8 text — every reported number recomputes
# from the text length in SQL.
_ZIP_MEMBERS_ORACLE = """
SELECT doc_id,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS members,
       CAST(strlen(text) + strlen(CAST(doc_id AS VARCHAR)) AS BIGINT)
           AS total_bytes,
       'manifest.txt' AS first_name,
       CASE WHEN strlen(text) = 0 THEN 'manifest.txt'
            ELSE 'part' || lpad(CAST((strlen(text) - 1) // 64 AS VARCHAR), 4, '0')
                 || '.txt'
       END AS last_name
FROM documents
"""


@query("archive_zip_members", _ZIP_MEMBERS_ORACLE)
def archive_zip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP enumeration, driver-oracled (r13, VERDICT r12 ask #8): per
    document, pack the text into a deterministic stdlib-built archive
    (a manifest member plus 64-byte chunk members), then enumerate it
    back through the independent central-directory walk and report
    member count, total uncompressed bytes and the first/last member
    names — EOCD location, count cross-check, per-entry field reads
    and name decoding all under the value hash. One mapInPandas stage:
    build and parse share the executor row, no shuffle at any scale
    (the multimodal_webp_dims shape)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                parts = [("manifest.txt", str(int(doc_id)).encode())] + [
                    (f"part{i:04d}.txt", raw[i * 64 : (i + 1) * 64])
                    for i in range((len(raw) + 63) // 64)
                ]
                listed = zip_members(build_zip(parts))
                rows.append(
                    (
                        doc_id,
                        len(listed),
                        sum(m["uncompressed_size"] for m in listed),
                        listed[0]["name"],
                        listed[-1]["name"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "members", "total_bytes", "first_name", "last_name"],
            )

    return base.mapInPandas(_roundtrip, schema=ZIP_MEMBERS_SCHEMA)


# --------------------------------------------------------------------------
# TAR (r13, the second half of VERDICT r12 ask #8): USTAR header walk.
# Unlike ZIP there is no central directory — enumeration is a linear
# walk of 512-byte headers, SEEKING past member data (O(members) reads
# on a seekable store; the data blocks themselves are never touched).
# --------------------------------------------------------------------------


def tar_members(payload: bytes) -> list[dict]:
    """USTAR/pax header walk -> one dict per member:
    ``{name, size, typeflag, offset}`` (offset = where the member's
    data blocks start). Each 512-byte header's checksum is verified
    (the field itself counted as spaces, per POSIX); the archive ends
    at two consecutive zero blocks. GNU longname/longlink (typeflags
    L/K) and pax extended headers (x/g) are honestly gated — plain
    USTAR names cover the fixture space and the common corpus-dump
    case."""
    members: list[dict] = []
    pos = 0
    while pos + 512 <= len(payload):
        block = payload[pos : pos + 512]
        if block == b"\x00" * 512:
            if payload[pos + 512 : pos + 1024] == b"\x00" * 512:
                return members
            raise ValueError("single zero block without end-of-archive twin")
        stored = block[148:156]
        try:
            stored_sum = int(stored.split(b"\x00")[0].strip() or b"0", 8)
        except ValueError:
            raise ValueError("malformed tar checksum field") from None
        actual = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if stored_sum != actual:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos} "
                f"(stored {stored_sum}, computed {actual})"
            )
        typeflag = chr(block[156]) if block[156] else "0"
        if typeflag in ("L", "K", "x", "g"):
            raise NotImplementedError(
                "GNU longname/longlink and pax extended headers not supported "
                "(plain USTAR member names only)"
            )
        name = block[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = block[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        size = int(block[124:136].split(b"\x00")[0].strip() or b"0", 8)
        members.append(
            {"name": name, "size": size, "typeflag": typeflag, "offset": pos + 512}
        )
        pos += 512 + ((size + 511) // 512) * 512
    raise ValueError("tar archive truncated (no end-of-archive marker)")


def build_tar(members: "list[tuple[str, bytes]]") -> bytes:
    """Deterministic stdlib-tarfile archive: epoch mtime, zero
    uid/gid, empty uname/gname, members in argument order — the
    fixture half; :func:`tar_members` is the independent parse half."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


TAR_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("members", T.IntegerType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
    ]
)

# Same member arithmetic as the ZIP twin — so the two walks are
# cross-checked against one oracle shape.
_TAR_MEMBERS_ORACLE = """
SELECT doc_id,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS members,
       CAST(strlen(text) + strlen(CAST(doc_id AS VARCHAR)) AS BIGINT)
           AS total_bytes,
       'manifest.txt' AS first_name,
       CASE WHEN strlen(text) = 0 THEN 'manifest.txt'
            ELSE 'part' || lpad(CAST((strlen(text) - 1) // 64 AS VARCHAR), 4, '0')
                 || '.txt'
       END AS last_name
FROM documents
"""


@query("archive_tar_members", _TAR_MEMBERS_ORACLE)
def archive_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAR enumeration, driver-oracled (r13): the ZIP query's exact
    twin over the USTAR walk — per document, pack the text into a
    deterministic stdlib-built tar (manifest member + 64-byte chunk
    members) and enumerate it back through the independent header
    walk: checksum verification, octal size reads, data-block seek
    arithmetic and the end-of-archive detection are all under the
    value hash (a wrong size read desynchronizes every subsequent
    header, so corruption cannot pass silently). One mapInPandas
    stage, no shuffle at any scale."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                parts = [("manifest.txt", str(int(doc_id)).encode())] + [
                    (f"part{i:04d}.txt", raw[i * 64 : (i + 1) * 64])
                    for i in range((len(raw) + 63) // 64)
                ]
                listed = tar_members(build_tar(parts))
                rows.append(
                    (
                        doc_id,
                        len(listed),
                        sum(m["size"] for m in listed),
                        listed[0]["name"],
                        listed[-1]["name"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "members", "total_bytes", "first_name", "last_name"],
            )

    return base.mapInPandas(_roundtrip, schema=TAR_MEMBERS_SCHEMA)


# --------------------------------------------------------------------------
# WARC (r13, the archival-corpora capstone of VERDICT r12 ask #8): the
# ISO 28500 Web ARChive walk. WARC is the native container of web-scale
# crawl corpora (Common Crawl ships ~100 TB crawls as WARC), so "what's
# in this crawl segment" — record counts, types, block sizes, target
# URIs — is the FIRST query a training-data pipeline runs, before any
# text extraction. Like TAR it is a linear record walk with no central
# directory: parse each record's header block, then SEEK past
# Content-Length bytes of payload — O(records) header reads, the
# payload blocks themselves never touched.
# --------------------------------------------------------------------------

_WARC_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


def warc_records(payload: bytes) -> list[dict]:
    """ISO 28500 record walk -> one dict per record:
    ``{offset, warc_type, content_length, target_uri}`` (``target_uri``
    is None for records without a ``WARC-Target-URI`` header, e.g.
    ``warcinfo``). Each record is a version line (WARC/1.0 or 1.1), a
    named-field block terminated by an empty CRLF line, exactly
    ``Content-Length`` bytes of block data, then the mandatory
    CRLF CRLF record boundary — a wrong Content-Length desynchronizes
    the walk onto bytes that are not a version line, so corruption
    fails loudly instead of under-counting. Field names are matched
    case-insensitively per the spec; header continuation lines
    (obs-fold, leading SP/TAB) are honestly gated with
    NotImplementedError — crawl writers emit single-line fields."""
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"truncated WARC version line at offset {pos}")
        if payload[pos:eol] not in _WARC_VERSIONS:
            raise ValueError(
                f"expected a WARC/1.x version line at offset {pos}, "
                f"got {payload[pos:eol][:20]!r}"
            )
        hdr_pos = eol + 2
        content_length = None
        warc_type = None
        target_uri = None
        while True:
            eol = payload.find(b"\r\n", hdr_pos)
            if eol < 0:
                raise ValueError(f"truncated WARC header block at offset {hdr_pos}")
            line = payload[hdr_pos:eol]
            if line == b"":
                break  # end of the named-field block
            if line[:1] in (b" ", b"\t"):
                raise NotImplementedError(
                    "WARC header continuation lines (obs-fold) not supported"
                )
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            key = name.strip().lower()
            val = value.strip()
            if key == b"content-length":
                if not val.isdigit():
                    raise ValueError(f"non-numeric WARC Content-Length {val!r}")
                content_length = int(val)
            elif key == b"warc-type":
                warc_type = val.decode("utf-8", "replace")
            elif key == b"warc-target-uri":
                target_uri = val.decode("utf-8", "replace")
            hdr_pos = eol + 2
        if content_length is None:
            raise ValueError(f"WARC record at offset {pos} missing Content-Length")
        if warc_type is None:
            raise ValueError(f"WARC record at offset {pos} missing WARC-Type")
        block_start = eol + 2
        block_end = block_start + content_length
        if block_end + 4 > n:
            raise ValueError(
                f"WARC block at offset {block_start} overruns the payload "
                f"(Content-Length {content_length})"
            )
        if payload[block_end : block_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"missing CRLFCRLF record boundary at offset {block_end} "
                "(wrong Content-Length or spliced record)"
            )
        records.append(
            {
                "offset": pos,
                "warc_type": warc_type,
                "content_length": content_length,
                "target_uri": target_uri,
            }
        )
        pos = block_end + 4
    return records


def build_warc(records: "list[tuple[str, str | None, bytes]]") -> bytes:
    """Deterministic WARC writer: fixed WARC-Date (1980-01-01, the
    build_zip epoch), record IDs derived from the record index, fields
    in a fixed order, members in argument order — same inputs, byte-
    identical archive. Each record is ``(warc_type, target_uri_or_None,
    block_bytes)``. The fixture half; :func:`warc_records` is the
    independent parse half (the walk never assumes this field order or
    these IDs — it matches names case-insensitively)."""
    out = bytearray()
    for i, (warc_type, target_uri, block) in enumerate(records):
        out += b"WARC/1.0\r\n"
        out += b"WARC-Type: " + warc_type.encode() + b"\r\n"
        out += (
            b"WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-%012d>\r\n"
            % i
        )
        out += b"WARC-Date: 1980-01-01T00:00:00Z\r\n"
        if target_uri is not None:
            out += b"WARC-Target-URI: " + target_uri.encode() + b"\r\n"
        out += b"Content-Length: %d\r\n" % len(block)
        out += b"\r\n"
        out += block
        out += b"\r\n\r\n"
    return bytes(out)


WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("records", T.IntegerType()),
        T.StructField("responses", T.IntegerType()),
        T.StructField("total_block_bytes", T.LongType()),
        T.StructField("first_uri", T.StringType()),
        T.StructField("last_uri", T.StringType()),
    ]
)

# One warcinfo record (block = the doc_id rendered as text) plus one
# response record per 64-byte chunk of the utf-8 text, each with a
# deterministic target URI — every reported value recomputes from the
# text length in SQL (the ZIP/TAR oracle shape, extended with the URI
# columns so the header FIELD reads are under the hash too).
_WARC_RECORDS_ORACLE = """
SELECT doc_id,
       CAST(1 + (strlen(text) + 63) // 64 AS INT) AS records,
       CAST((strlen(text) + 63) // 64 AS INT) AS responses,
       CAST(strlen(text) + strlen(CAST(doc_id AS VARCHAR)) AS BIGINT)
           AS total_block_bytes,
       CASE WHEN strlen(text) = 0 THEN NULL
            ELSE 'https://corpus.local/' || CAST(doc_id AS VARCHAR) || '/0'
       END AS first_uri,
       CASE WHEN strlen(text) = 0 THEN NULL
            ELSE 'https://corpus.local/' || CAST(doc_id AS VARCHAR) || '/'
                 || CAST((strlen(text) - 1) // 64 AS VARCHAR)
       END AS last_uri
FROM documents
"""


@query("archive_warc_records", _WARC_RECORDS_ORACLE)
def archive_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC enumeration, driver-oracled (r13): per document, write the
    text into a deterministic crawl-segment-shaped archive (one
    warcinfo record + one response record per 64-byte chunk, each with
    a synthetic target URI), then enumerate it back through the
    independent record walk and report record/response counts, total
    block bytes and the first/last response URIs — version-line
    checks, case-insensitive field reads, Content-Length seek
    arithmetic and the CRLFCRLF boundary verification all under the
    value hash (a wrong Content-Length desynchronizes every subsequent
    record, so corruption cannot pass silently). One mapInPandas
    stage, no shuffle at any scale (the archive_zip_members shape)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                recs: list[tuple[str, "str | None", bytes]] = [
                    ("warcinfo", None, str(int(doc_id)).encode())
                ] + [
                    (
                        "response",
                        f"https://corpus.local/{int(doc_id)}/{i}",
                        raw[i * 64 : (i + 1) * 64],
                    )
                    for i in range((len(raw) + 63) // 64)
                ]
                listed = warc_records(build_warc(recs))
                resp = [r for r in listed if r["warc_type"] == "response"]
                rows.append(
                    (
                        doc_id,
                        len(listed),
                        len(resp),
                        sum(r["content_length"] for r in listed),
                        resp[0]["target_uri"] if resp else None,
                        resp[-1]["target_uri"] if resp else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "records",
                    "responses",
                    "total_block_bytes",
                    "first_uri",
                    "last_uri",
                ],
            )

    return base.mapInPandas(_roundtrip, schema=WARC_RECORDS_SCHEMA)


# --------------------------------------------------------------------------
# Multi-member gzip (RFC 1952) — the transport wrapping of WARC in the
# wild: Common Crawl writes ONE gzip member PER WARC RECORD so readers
# can seek to a member boundary (from a .cdx index) and inflate a
# single record. Library surface this round (the r13 rotation window
# is full at 50); registration with an exact oracle is the queued r14
# slot. Honesty about scale: unlike ZIP (central directory) and TAR
# (size-field seeks), gzip member boundaries are only discoverable by
# INFLATING — the walk is O(payload), which is exactly why production
# crawl stores ship side-car offset indexes; enumerate once, persist
# the offsets (the layout-manifest pattern, operators/layout.py).
# --------------------------------------------------------------------------

_GZIP_MAGIC = b"\x1f\x8b"


def gzip_members(payload: bytes) -> list[dict]:
    """RFC 1952 multi-member walk -> one dict per member:
    ``{offset, compressed_size, uncompressed_size, name}``. Parses the
    10-byte fixed header plus the optional FEXTRA/FNAME/FCOMMENT/FHCRC
    fields, inflates the deflate stream (zlib, raw window) to locate
    the member end, then verifies BOTH trailer fields — CRC32 and
    ISIZE (mod 2^32) — so a corrupt byte anywhere in the member fails
    loudly instead of desynchronizing the walk. ``name`` is the FNAME
    field (latin-1 per the RFC) or None."""
    import zlib

    members: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        start = pos
        if payload[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(f"not a gzip member at offset {pos}")
        if pos + 10 > n:
            raise ValueError(f"truncated gzip header at offset {pos}")
        cm, flg = payload[pos + 2], payload[pos + 3]
        if cm != 8:
            raise ValueError(f"unsupported gzip compression method {cm}")
        if flg & 0xE0:
            raise ValueError(f"reserved gzip FLG bits set at offset {pos}")
        pos += 10
        if flg & 0x04:  # FEXTRA
            if pos + 2 > n:
                raise ValueError("truncated gzip FEXTRA length")
            xlen = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2 + xlen
        name = None
        if flg & 0x08:  # FNAME, zero-terminated latin-1
            zero = payload.find(b"\x00", pos)
            if zero < 0:
                raise ValueError("unterminated gzip FNAME field")
            name = payload[pos:zero].decode("latin-1")
            pos = zero + 1
        if flg & 0x10:  # FCOMMENT
            zero = payload.find(b"\x00", pos)
            if zero < 0:
                raise ValueError("unterminated gzip FCOMMENT field")
            pos = zero + 1
        if flg & 0x02:  # FHCRC
            pos += 2
        if pos > n:
            raise ValueError(f"gzip optional fields overrun the payload at {start}")
        d = zlib.decompressobj(-zlib.MAX_WBITS)
        try:
            data = d.decompress(payload[pos:])
        except zlib.error as e:
            raise ValueError(f"corrupt deflate stream at offset {pos}: {e}") from None
        if not d.eof:
            raise ValueError(f"truncated deflate stream at offset {pos}")
        trailer_pos = n - len(d.unused_data)
        if trailer_pos + 8 > n:
            raise ValueError(f"truncated gzip trailer at offset {trailer_pos}")
        crc = int.from_bytes(payload[trailer_pos : trailer_pos + 4], "little")
        isize = int.from_bytes(payload[trailer_pos + 4 : trailer_pos + 8], "little")
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError(f"gzip CRC32 mismatch in member at offset {start}")
        if isize != (len(data) & 0xFFFFFFFF):
            raise ValueError(f"gzip ISIZE mismatch in member at offset {start}")
        pos = trailer_pos + 8
        members.append(
            {
                "offset": start,
                "compressed_size": pos - start,
                "uncompressed_size": len(data),
                "name": name,
            }
        )
    return members


def build_gzip_members(blocks: "list[tuple[str | None, bytes]]") -> bytes:
    """Deterministic member-per-block gzip stream (mtime=0, fixed
    compression level, optional FNAME) — the Common-Crawl record-per-
    member layout; the fixture half of :func:`gzip_members`."""
    import gzip
    import io

    out = bytearray()
    for name, data in blocks:
        buf = io.BytesIO()
        with gzip.GzipFile(
            filename=name or "", fileobj=buf, mode="wb", compresslevel=6, mtime=0
        ) as gf:
            gf.write(data)
        out += buf.getvalue()
    return bytes(out)


def warc_gz_records(payload: bytes) -> list[dict]:
    """Enumerate a ``.warc.gz`` crawl segment: walk the gzip members,
    inflate each, and parse each member's content as WARC records —
    returning the flat record list with each record's ``member``
    (gzip member index) and member ``offset`` attached. The
    record-per-member contract is NOT assumed: a member holding
    several concatenated records is walked through the same
    :func:`warc_records` parse."""
    import zlib

    records: list[dict] = []
    for i, m in enumerate(gzip_members(payload)):
        raw = payload[m["offset"] : m["offset"] + m["compressed_size"]]
        data = _gunzip_single(raw)
        for rec in warc_records(data):
            rec = dict(rec)
            rec["member"] = i
            rec["member_offset"] = m["offset"]
            records.append(rec)
    return records


def _gunzip_single(member: bytes) -> bytes:
    import gzip
    import io

    with gzip.GzipFile(fileobj=io.BytesIO(member)) as gf:
        return gf.read()
