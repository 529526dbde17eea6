"""The COMPLETE remaining rotation horizon (r17-r20) is pinned in
__spark_entry__ — this test re-derives every cohort from the committed
CORRECTNESS records plus the pinned r17/r18 windows and fails on any
drift, so no future session can silently break the 5-round staleness
invariant.

ADVICE r15 fix: rounds with a committed CORRECTNESS record are derived
FROM the record, never assumed green — a red driver row now fails this
test loudly instead of being papered over by the replay. Only the
ACTIVE round's window (whose record does not exist until the driver
runs at round end) is assumed; the moment its record lands, the
assumption is replaced by the recorded truth."""

from __future__ import annotations

import glob
import json
import os
import re

_ROOT = os.path.join(os.path.dirname(__file__), "..")

#: The round this tree is being built in. Bump at each round's
#: registration/window flip (r18 flipped the window to
#: ANCHORS + ROTATION_R18_NEW + ROTATION_R18_REVALIDATE).
ACTIVE_ROUND = 18


def _records() -> "tuple[dict, int]":
    """(newest-green map, newest recorded round) from every committed
    CORRECTNESS_r*.json."""
    newest: dict = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.load(open(f)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, max_round


def test_rotation_horizon_pins_are_derivable_and_complete():
    import __spark_entry__ as mod

    newest, recorded_max = _records()
    anchors = mod.ANCHORS

    # Every recorded round speaks for itself (the r15 records already
    # flow in via _records). Only the active round's window may be
    # assumed green — and once ITS record exists, a red row fails here.
    if recorded_max < ACTIVE_ROUND:
        for n in mod.PRIORITY_WINDOW:
            newest[n] = max(newest.get(n, 0), ACTIVE_ROUND)
    else:
        red = [
            n for n in mod.PRIORITY_WINDOW if newest.get(n, 0) < ACTIVE_ROUND
        ]
        assert not red, (
            f"CORRECTNESS_r{ACTIVE_ROUND} exists but these window names "
            f"have no green row — the pinned r19/r20 cohorts must be "
            f"re-derived in-session: {red}"
        )

    # replay the pinned future windows forward from the active round
    # (r18 moved out of the replay when it became active: its window is
    # the live PRIORITY_WINDOW, covered by the assumption/record logic
    # above, and its registrations are already in mod.queries(). No
    # staged rounds remain — the registry is frozen at 210 and r19/r20
    # are pure revalidation.)
    pool = list(mod.queries())  # 210 after the r18 registration
    windows = {
        19: mod.ROTATION_R19_REVALIDATE,
        20: mod.ROTATION_R20_REVALIDATE,
    }
    for rnd in (19, 20):
        rotation = windows[rnd]
        # window sums to exactly 50 with the permanent 10 anchors
        assert len(anchors) + len(rotation) == 50, rnd
        assert len(set(rotation)) == len(rotation), rnd
        assert not (set(rotation) & set(anchors)), rnd
        # the revalidation cohort is exactly the names turning 5 rounds
        # old: newest green == rnd - 5
        expected = sorted(
            n for n in pool if newest.get(n, 0) == rnd - 5 and n not in anchors
        )
        assert sorted(rotation) == expected, (rnd, set(rotation) ^ set(expected))
        for n in list(anchors) + list(rotation):
            newest[n] = rnd

    # after r20 the whole 210-name board is fresh: nothing older than r16
    assert len(pool) == 210
    stale = {n: r for n, r in ((n, newest.get(n, 0)) for n in pool) if r < 16}
    assert not stale, stale
