"""Broker-side filesystem shim (r14, VERDICT r13 ask #4): the queue's
MAINTENANCE paths — retention / GC / age floors / low-watermark
markers / checkpoint parsing / offset listings — route through this
module, which dispatches on the path's scheme. Plain paths take the
os-level fast path (the POSIX broker-volume deployment, a Kafka data
dir's shape); scheme'd paths (``hdfs://``, ``s3a://``, ``file://``,
...) go through the Hadoop FileSystem API of the active SparkSession —
the same machinery :func:`file_queue._segment_paths` already uses for
reads — so consumer-progress-driven retention, lag reports and GC run
against any Hadoop-supported store end-to-end.

What deliberately does NOT route here: the atomic-publish trio
(:func:`file_queue.queue_append`'s no-replace hard link,
:func:`file_queue.queue_compact`'s in-place segment swap,
:func:`file_queue.queue_publish_batch`'s replace). Those require an
atomic rename/link with immediate read visibility that object stores
do not provide (S3 rename is copy+delete), so they stay os-level and
now FAIL LOUDLY on a remote scheme instead of half-working — the same
division Kafka makes: broker data on a real filesystem, consumers and
admin tooling anywhere.

Every operation here is maintenance-metadata sized (directory
listings, single small files, deletes); none sits on a data path, so
the py4j round-trips are per-CALL constants, not per-row costs.
"""

from __future__ import annotations

import os
import re

_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/")

#: Schemes whose write primitive is a single PUT (the store's atomic
#: unit — readers see the old or the new object, never a partial) and
#: whose rename is a non-atomic copy+delete. Everything else is a real
#: filesystem where the opposite holds: rename is atomic, in-place
#: truncate-and-write is not.
_OBJECT_STORE_SCHEMES = {
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
    "cos", "swift",
}


def _scheme(path: str) -> str:
    return path.split(":", 1)[0].lower() if _SCHEME.match(path) else ""


def is_remote(path: str) -> bool:
    """True when the path names a Hadoop filesystem scheme (including
    ``file:`` — routing it through the FS branch is what lets the
    tests exercise the remote code path against local disk)."""
    return bool(_SCHEME.match(path))


def _fs(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"path {path!r} has a filesystem scheme but no active "
            "SparkSession provides the Hadoop FileSystem — start a "
            "session or use a plain local path"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def isdir(path: str) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    fs, jpath, _ = _fs(path)
    return bool(fs.exists(jpath)) and bool(fs.getFileStatus(jpath).isDirectory())


def list_dir(path: str) -> "list[str]":
    """Child NAMES of a directory ([] when it does not exist) — the
    os.listdir analogue."""
    if not is_remote(path):
        try:
            return os.listdir(path)
        except (FileNotFoundError, NotADirectoryError):
            # a stray regular file where a directory is expected is the
            # same "nothing to maintain" case as an absent directory
            # (the pre-r14 os.path.isdir guards no-op'd on both)
            return []
    fs, jpath, _ = _fs(path)
    if not fs.exists(jpath):
        return []
    # Hadoop's listStatus on a FILE returns the file's own status —
    # which would surface a stray regular file as its own child and
    # break the local/remote parity this module promises (local branch:
    # NotADirectoryError -> []). Same "nothing to maintain" answer here.
    if not fs.getFileStatus(jpath).isDirectory():
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def delete(path: str) -> None:
    """Delete one file (non-recursive)."""
    if not is_remote(path):
        os.remove(path)
        return
    fs, jpath, _ = _fs(path)
    fs.delete(jpath, False)


def mtime(path: str) -> float:
    """Modification time in epoch seconds (Hadoop reports millis)."""
    if not is_remote(path):
        return os.path.getmtime(path)
    fs, jpath, _ = _fs(path)
    return fs.getFileStatus(jpath).getModificationTime() / 1000.0


def read_text(path: str) -> str:
    """Whole small file as UTF-8 text; FileNotFoundError when absent
    (both branches — callers catch it uniformly)."""
    if not is_remote(path):
        with open(path) as fh:
            return fh.read()
    fs, jpath, jvm = _fs(path)
    if not fs.exists(jpath):
        raise FileNotFoundError(path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(path: str, text: str) -> None:
    """Whole-file marker write, READ-atomic on every branch: a
    concurrent reader sees the complete old text or the complete new
    text, never empty/partial (``_low_watermark`` parses these markers
    and a partial read would fall back to floor 0 — exactly the
    corruption the marker exists to prevent).

    Local: tmp + os.replace. Object stores (s3a/gs/abfs/...): a single
    PUT via FS create — the store's atomic unit; rename there is
    copy+delete, which is WORSE. Real remote filesystems (hdfs://,
    file://, viewfs://...): create(overwrite=True) truncates the live
    file in place, so instead write a dot-named temp sibling and rename
    it into place (atomic on HDFS and local), with the
    FileContext OVERWRITE form for filesystems whose plain rename
    refuses an existing destination."""
    if not is_remote(path):
        import uuid

        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(path)}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, jpath, jvm = _fs(path)
    if _scheme(path) in _OBJECT_STORE_SCHEMES:
        out = fs.create(jpath, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return
    import uuid

    jtmp = jvm.org.apache.hadoop.fs.Path(
        jpath.getParent(), f".{jpath.getName()}.tmp-{uuid.uuid4().hex}"
    )
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        if not fs.rename(jtmp, jpath):
            # HDFS's FileSystem.rename refuses an existing destination;
            # FileContext.rename(..., Rename.OVERWRITE) is its atomic
            # replace form.
            _rename_overwrite(jvm, fs, jtmp, jpath)
    except Exception:
        fs.delete(jtmp, False)
        raise


def _rename_overwrite(jvm, fs, jsrc, jdst) -> None:
    """FileContext.rename with Rename.OVERWRITE (atomic replace on
    HDFS/local). py4j varargs need an explicit Java array."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    gw = spark.sparkContext._gateway
    rename_enum = jvm.org.apache.hadoop.fs.Options.Rename
    opts = gw.new_array(rename_enum, 1)
    opts[0] = rename_enum.OVERWRITE
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri(), fs.getConf()
    )
    fc.rename(jsrc, jdst, opts)


def require_local(path: str, op: str) -> None:
    """Guard for the atomic-publish trio: a remote scheme (other than
    ``file:``, which maps to local disk) cannot honor the no-replace
    link / in-place swap contract — fail loudly up front instead of
    corrupting offsets halfway."""
    if is_remote(path) and not path.startswith("file:"):
        raise NotImplementedError(
            f"{op} needs atomic rename/link semantics and runs on the "
            f"broker volume (local/NFS/HDFS-mounted path); got remote "
            f"path {path!r}. Retention, GC, lag and offset listings DO "
            "support remote schemes — see streaming/fsio.py."
        )


def strip_file_scheme(path: str) -> str:
    """``file:///x`` / ``file:/x`` -> ``/x`` for os-level operations on
    paths that are local disk behind a scheme. A ``file://`` URI with a
    remote authority (``file://host/p``) or no path component at all
    (``file://x``) raises ValueError loudly — silently dropping the
    host would point the broker at a DIFFERENT machine's path."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        if rest.startswith("/"):
            return rest  # empty authority: file:///p -> /p
        host, sep, p = rest.partition("/")
        if not sep:
            raise ValueError(
                f"malformed file:// URI (authority but no path): {path!r}"
            )
        if host not in ("", "localhost"):
            raise ValueError(
                f"file:// URI with remote authority {host!r} is not local "
                f"disk — unsupported here: {path!r}"
            )
        return "/" + p
    if path.startswith("file:"):
        return path[len("file:"):]
    return path
