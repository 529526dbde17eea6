"""Fingerprint-tie the committed sweep artifacts to the live registry
(r10, VERDICT r9 ask #7).

The r9 de-registration of agg_hll_rolling_distinct briefly left stale
184-name sweep files describing a DIFFERENT 184 than the registry —
caught by hand then, by CI now: a committed "N/N pass" artifact must
cover exactly the queries a reader would assume it covers.

Contract per artifact:
- ORACLE_SWEEP_sf0.01.json / ORACLE_SWEEP_sf0.1.json: name set ==
  the full live registry, zero fails.
- ORACLE_SWEEP_sf1.json: name set == registry minus the documented
  SF1_SKIP exclusions (scripts/oracle_sweep.py — O(n^2) exactness
  baselines that refuse sf1 inputs by design + the uncollectable
  simhash full-matrix, whose sf1 evidence is its own digest sweep).
"""

from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import __spark_entry__ as entry_mod  # noqa: E402

from oracle_sweep import SF1_SKIP  # noqa: E402


def _artifact_names(fname: str) -> set[str]:
    path = os.path.join(_ROOT, fname)
    assert os.path.exists(path), f"{fname} missing — run scripts/oracle_sweep.py"
    with open(path) as f:
        data = json.load(f)
    assert data["n_fail"] == 0, f"{fname} records {data['n_fail']} failing queries"
    return set(data["results"])


def test_full_scale_sweeps_cover_exact_registry():
    registry = set(entry_mod.queries())
    for fname in ("ORACLE_SWEEP_sf0.01.json", "ORACLE_SWEEP_sf0.1.json"):
        names = _artifact_names(fname)
        assert names == registry, (
            f"{fname} out of sync with the registry — "
            f"stale: {sorted(names - registry)}, missing: {sorted(registry - names)}; "
            "regenerate with scripts/oracle_sweep.py"
        )


def test_sf1_sweep_covers_registry_minus_documented_skips():
    registry = set(entry_mod.queries())
    assert SF1_SKIP <= registry, (
        f"SF1_SKIP names not in the registry: {sorted(SF1_SKIP - registry)}"
    )
    names = _artifact_names("ORACLE_SWEEP_sf1.json")
    expected = registry - SF1_SKIP
    assert names == expected, (
        "ORACLE_SWEEP_sf1.json out of sync — "
        f"stale: {sorted(names - expected)}, missing: {sorted(expected - names)}; "
        "regenerate with SPARK_GRAFT_SWEEP_DIR=.localdata/sf1 "
        "SPARK_GRAFT_SWEEP_SKIP=SF1 python scripts/oracle_sweep.py ORACLE_SWEEP_sf1.json"
    )
