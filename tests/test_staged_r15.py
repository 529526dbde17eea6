"""The r15 registrations (staged late r13 in staged_r15.py, ACTIVATED
at r15 via ``staged_r15.register_all()`` in ``__spark_entry__``) stay
value-exact against their oracles through the LIVE registry machinery —
exactly what the driver runs. The window/capacity pins below encode the
post-registration arithmetic: registry 204, anchors permanently 10,
r15 window = 10 anchors + 4 new + the 36-name r10 cohort = 50.

History: before r15 these tests pinned the PRE-registration state
(staged names absent from the registry, 12 anchors, capacity proof that
registering under 12 anchors would overflow the 5-round budget). That
era's pins are preserved in git history; the activation flipped them to
the steady-state form here.
"""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r15
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"

STAGED_NAMES = [n for n, _sql, _fn in staged_r15.STAGED]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as mod  # registers the full 204-name registry

    return mod


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_registered_query_value_exact(spark, entry_mod, name):
    """Each r15-registered query remains value-exact against its
    FINALIZED oracle through the live registry path (boundary casts on
    both engines) — the same compare the driver's hash gate replays."""
    assert name in registry.QUERIES  # registered by __spark_entry__
    finalized = entry_mod.oracle_sql()[name]
    compare_query(spark, SF, registry.QUERIES[name], finalized)


def test_register_all_is_idempotent(entry_mod):
    """register_all() re-applies dict assignments; a second call (e.g.
    a test importing staged_r15 after __spark_entry__) must not grow
    the registry or change the registered objects' behavior."""
    before = dict(registry.QUERIES)
    staged_r15.register_all()
    assert set(registry.QUERIES) == set(before)
    for n in STAGED_NAMES:
        assert n in registry.QUERIES and n in registry.ORACLES


def test_r15_registration_landed_and_greened(entry_mod):
    """The four r15 names are registered, went through the r15 window
    (ROTATION_R15_NEW matches the slate name-for-name), got GREEN
    driver rows in the committed CORRECTNESS_r15.json, and are
    scheduled for revalidation at r20 per the pinned horizon."""
    import json
    import os

    q = entry_mod.queries()
    for n in STAGED_NAMES:
        assert n in q, f"{n} missing from the registry"
    assert sorted(entry_mod.ROTATION_R15_NEW) == sorted(STAGED_NAMES)
    rec = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r15.json"))
    )
    for n in STAGED_NAMES:
        row = rec[n]
        assert row["rows_match"] and row["schema_match"] and not row["err"], n
        assert n in entry_mod.ROTATION_R20_REVALIDATE  # due again r20


def test_r15_window_archive_is_sound(entry_mod):
    """The ARCHIVED r15 window lists (kept as module constants for the
    horizon replay): 10 anchors (the two pinned demotions permanent) +
    4 registrations + the full 36-name r10 staleness cohort = 50
    unique registered names, pairwise disjoint."""
    mod = entry_mod
    assert len(mod.ANCHORS) == 10
    demoted = {"agg_pricing_summary", "generate_orders_seeded"}
    assert not (demoted & set(mod.ANCHORS))  # trim is permanent
    live = set(mod.queries())
    assert demoted <= live  # demoted, not de-registered
    cohort = mod.ROTATION_R15_REVALIDATE
    assert len(cohort) == 36 == len(set(cohort))
    assert set(cohort) <= live
    r15_window = mod.ANCHORS + mod.ROTATION_R15_NEW + cohort
    assert len(r15_window) == 50 == len(set(r15_window))


def test_rotation_capacity_arithmetic(entry_mod):
    """The 5-round staleness invariant needs non_anchor_names <=
    (window - anchors) * 5. Post-registration: 194 <= 200 at the
    permanent 10 anchors — with the proof that the old 12-anchor form
    would NOT fit (192 > 190), i.e. the trim was forced, not cosmetic.
    This test fails the moment someone grows the registry past the
    anchors' budget, so the capacity decision can never be skipped
    silently."""
    mod = entry_mod
    window = 50
    anchors = len(mod.ANCHORS)
    non_anchor = len(mod.queries()) - anchors
    budget = (window - anchors) * 5
    assert non_anchor <= budget, (
        f"{non_anchor} non-anchor names exceed the {budget}-name rotation "
        f"budget at {anchors} anchors — shrink ANCHORS or de-register"
    )
    # the permanent trim was forced: 12 anchors cannot hold this registry
    total = len(mod.queries())
    assert total - 12 > (window - 12) * 5
