"""The r17 registrations (staged_r17.py, ACTIVATED at r17 via
``staged_r17.register_all()`` in ``__spark_entry__``): the unified
MP4/AVI/MKV video-dims dispatch and the WARC.gz ranged-fetch half of
the side-car pattern, value-exact through the LIVE registry machinery —
exactly what the driver runs.

History: before r17 the registration tests here pinned the
PRE-registration state (names absent from the registry, window
precomputation); that era's pins are preserved in git history. The
activation flipped them to the steady-state form, the
test_staged_r15.py / test_staged_r16.py model."""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r17
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"

STAGED_NAMES = [n for n, _sql, _fn in staged_r17.STAGED]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as mod  # registers the full 210-name registry

    return mod


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_registered_query_value_exact(spark, entry_mod, name):
    """Each r17-registered query remains value-exact against its
    FINALIZED oracle through the live registry path (boundary casts on
    both engines) — the same compare the driver's hash gate replays."""
    assert name in registry.QUERIES  # registered by __spark_entry__
    finalized = entry_mod.oracle_sql()[name]
    compare_query(spark, SF, registry.QUERIES[name], finalized)


def test_register_all_is_idempotent(entry_mod):
    """register_all() re-applies dict assignments; a second call must
    not grow the registry or change the registered objects."""
    before = dict(registry.QUERIES)
    staged_r17.register_all()
    assert set(registry.QUERIES) == set(before)
    for n in STAGED_NAMES:
        assert n in registry.QUERIES and n in registry.ORACLES


def test_r17_registration_landed(entry_mod):
    """The two r17 names are registered and carried by the pinned
    ROTATION_R17_NEW list (the r17 window itself retired at the r18
    flip; it went 50/50 green in CORRECTNESS_r17.json)."""
    q = entry_mod.queries()
    for n in STAGED_NAMES:
        assert n in q, f"{n} missing from the registry"
    assert sorted(entry_mod.ROTATION_R17_NEW) == sorted(STAGED_NAMES)


def test_r17_window_was_sound(entry_mod):
    """The RETIRED r17 window (historical form, the test_staged_r16
    model): 10 anchors + 2 registrations + the full 38-name r12
    staleness cohort = 50 unique registered names, pairwise disjoint,
    with the capacity inside the 5-round budget."""
    mod = entry_mod
    assert len(mod.ANCHORS) == 10
    cohort = mod.ROTATION_R17_REVALIDATE
    assert len(cohort) == 38 == len(set(cohort))
    live = set(mod.queries())
    assert set(cohort) <= live
    r17_window = mod.ANCHORS + mod.ROTATION_R17_NEW + cohort
    assert len(r17_window) == 50 == len(set(r17_window))
    assert len(live) - len(mod.ANCHORS) <= (50 - len(mod.ANCHORS)) * 5


def test_video_dims_dispatch_branches_loud():
    """The dispatch refuses non-video payloads loudly, and each branch
    reports its own container label (the fixture contract the oracle
    leans on)."""
    from orders_currency_conversion_etl_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="unrecognized video container"):
        mm.video_dims(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    mp4 = mm.encode_mp4_header("isom", 8, 6, 3000, 1000, version=0)
    assert mm.video_dims(mp4) == ("isom", 8, 6, 3000)
    avi = mm.encode_avi_header(8, 6, 150, 20_000)
    assert mm.video_dims(avi) == ("avi", 8, 6, 3000)
    mkv = mm.encode_mkv_header("webm", 8, 6, 3000.0)
    assert mm.video_dims(mkv) == ("webm", 8, 6, 3000)
