"""The COMPLETE remaining rotation horizon (r17-r20) is pinned in
__spark_entry__ — this test re-derives every cohort from the committed
CORRECTNESS record plus the pinned r15/r16/r17/r18 windows and fails
on any drift, so no future session can silently break the 5-round
staleness invariant."""

from __future__ import annotations

import glob
import json
import os
import re

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _newest_green() -> dict:
    newest: dict = {}
    for f in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") is not False)
                and not row.get("err")
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_rotation_horizon_pins_are_derivable_and_complete():
    import __spark_entry__ as mod
    from orders_currency_conversion_etl_spark import (
        staged_r16,
        staged_r17,
        staged_r18,
    )

    newest = _newest_green()
    anchors = mod.ANCHORS
    live = list(mod.queries())

    # replay the pinned windows forward (greens assumed, the standing
    # pre-computation convention since r13)
    for n in mod.PRIORITY_WINDOW:
        newest[n] = 15
    pool = list(live)
    windows = {
        16: [x for x, *_ in staged_r16.STAGED] + mod.ROTATION_R16_REVALIDATE,
        17: [x for x, *_ in staged_r17.STAGED] + mod.ROTATION_R17_REVALIDATE,
        18: [x for x, *_ in staged_r18.STAGED] + mod.ROTATION_R18_REVALIDATE,
        19: mod.ROTATION_R19_REVALIDATE,
        20: mod.ROTATION_R20_REVALIDATE,
    }
    staged_by_round = {16: staged_r16, 17: staged_r17, 18: staged_r18}
    for rnd in (16, 17, 18, 19, 20):
        rotation = windows[rnd]
        # window sums to exactly 50 with the permanent 10 anchors
        assert len(anchors) + len(rotation) == 50, rnd
        assert len(set(rotation)) == len(rotation), rnd
        assert not (set(rotation) & set(anchors)), rnd
        if rnd in staged_by_round:
            staged = [x for x, *_ in staged_by_round[rnd].STAGED]
            pool += staged
            # the revalidation half is exactly the names turning 5
            # rounds old: newest green == rnd - 5
            expected = sorted(n for n in pool if newest.get(n, 0) == rnd - 5)
            got = sorted(set(rotation) - set(staged))
            assert got == expected, (rnd, set(got) ^ set(expected))
        else:
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
