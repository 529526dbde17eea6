"""The post-r18 retirement policy (SCALE.md §Registration budget) is
executable the day it is needed: every named candidate still satisfies
the four criteria, so a future session retires by bookkeeping instead
of re-litigation. If a candidate stops qualifying (twin de-registered,
guard lifted, driver evidence gone) this fails and the policy table
must be re-decided."""

from __future__ import annotations

import glob
import json
import os
import re

_ROOT = os.path.join(os.path.dirname(__file__), "..")

#: candidate -> registered scale-path twins (SCALE.md policy table)
CANDIDATES = {
    "knn_brute_force": ["knn_lsh_bucketed", "knn_ivf_materialized"],
    "dedup_embedding_cosine": ["dedup_semantic_clustered"],
    "dedup_simhash": ["dedup_minhash_lsh"],
}


def _green_rounds(name: str) -> "list[int]":
    rounds = []
    for f in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        row = json.load(open(f)).get(name)
        if row is None:
            continue
        if (
            row.get("rows_match")
            and row.get("schema_match")
            and (row.get("hash_match") is not False)
            and not row.get("err")
        ):
            rounds.append(rnd)
    return rounds


def test_retirement_candidates_remain_eligible():
    import sys

    import __spark_entry__ as mod

    sys.path.insert(0, os.path.join(_ROOT, "scripts"))
    import oracle_sweep as sweep

    live = set(mod.queries())
    for cand, twins in CANDIDATES.items():
        # candidate still registered (not yet retired)
        assert cand in live, f"{cand} already gone — drop it from the policy"
        # criterion 1: every named twin is registered
        for t in twins:
            assert t in live, f"{cand}'s twin {t} is not registered"
        # criterion 2: >= 2 green driver rows banked
        greens = _green_rounds(cand)
        assert len(greens) >= 2, (cand, greens)
        # criterion 3: absent from the sf1 sweep by size guard
        assert cand in sweep.SF1_SKIP, cand


def test_budget_is_exactly_full_after_r18():
    """The arithmetic the policy exists for: the r18 registration
    landed and the registry is frozen at 210 = 10 anchors + the
    200-name rotation budget — EXACTLY full, zero slots for r19/r20."""
    import __spark_entry__ as mod

    total = len(mod.queries())
    assert total == 210
    assert total - len(mod.ANCHORS) == (50 - len(mod.ANCHORS)) * 5
