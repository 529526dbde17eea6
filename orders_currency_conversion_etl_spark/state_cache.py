"""Shared protocol for materialized engine state (graph edges, ANN
index): fingerprinted cache paths + atomic temp-dir materialization.

One implementation, two call sites (plans/graph.py, operators/
similarity.py) — extracted in r6 after review found the two copies
already drifting. The protocol:

- the cache path embeds the SOURCE's mtime+size (and an md5 of the
  dataset dir), so regenerated testdata can never be served stale
  state — staleness is unreachable by construction, not read-repaired;
- writes land in ``<path>.tmp`` and are renamed into place only after
  a ``_DONE`` marker is created, so a killed build can never leave a
  half-materialization a later run trusts (the make_sf1 lesson);
- the default root lives under the repo's gitignored ``.localdata``
  (state stays inside the workspace, with the fixtures it derives
  from), overridable per-cache via an env var.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fingerprint_path(sf_dir: str, source_table: str, env_var: str, subdir: str, prefix: str) -> str:
    """Deterministic cache location for ``sf_dir``'s state derived from
    ``source_table`` (e.g. ``lineitem``): root from ``env_var`` or
    ``.localdata/<subdir>``, leaf ``<prefix>_<dirtag>_<mtime>_<size>``."""
    root = os.environ.get(env_var) or os.path.join(_REPO_ROOT, ".localdata", subdir)
    src = os.path.join(sf_dir, f"{source_table}.parquet")
    if os.path.isdir(src):
        parts = sorted(os.listdir(src))
        probe = os.path.join(src, parts[-1]) if parts else src
    else:
        probe = src
    st = os.stat(probe)
    # md5, not hash(): str hashing is per-process randomized, which
    # would defeat cross-process cache reuse.
    dir_tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(root, f"{prefix}_{dir_tag}_{int(st.st_mtime)}_{st.st_size}")


def is_materialized(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_DONE"))


def materialize(path: str, write_parts: Callable[[str], None]) -> str:
    """Idempotently build the state at ``path``: no-op if its ``_DONE``
    marker exists, else call ``write_parts(tmp_dir)`` and atomically
    rename the finished temp dir into place."""
    if is_materialized(path):
        return path
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    try:
        write_parts(tmp)
        os.makedirs(os.path.join(tmp, "_DONE"))
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return path
