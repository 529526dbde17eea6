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
        except FileNotFoundError:
            return []
    fs, jpath, _ = _fs(path)
    if not fs.exists(jpath):
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
    """Whole-file marker write. Local: tmp + os.replace (atomic).
    Remote: FS create(overwrite) — visible on close(), which is a
    single PUT on object stores (their atomic unit) and an atomic
    create on HDFS; markers are single small files precisely so this
    is the only write primitive retention needs."""
    if not is_remote(path):
        import uuid

        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(path)}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, jpath, _ = _fs(path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


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
    paths that are local disk behind a scheme."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        # file://host/p is not supported; file:///p -> /p
        return rest if rest.startswith("/") else "/" + rest.split("/", 1)[1]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path
