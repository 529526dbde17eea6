"""The staged r15 registrations (staged_r15.py) are value-exact against
their oracles TODAY, through the exact machinery registration will
apply — each test registers the query with the real decorator (boundary
casts), compares via the driver-replica harness against the FINALIZED
oracle, then removes the entry so the live registry (and the artifact-
sync pins keyed to it) is untouched."""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r15
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize(
    "name", [n for n, _sql, _fn in staged_r15.STAGED]
)
def test_staged_query_value_exact(spark, name):
    sql, fn = next(
        (s, f) for n, s, f in staged_r15.STAGED if n == name
    )
    assert name not in registry.QUERIES  # really unregistered today
    registry.query(name, sql)(fn)
    try:
        # finalize THIS oracle exactly as finalized_oracles() would,
        # without touching its registry-wide cache (these tests must
        # leave the live registry and its caches untouched)
        import duckdb

        con = duckdb.connect()
        try:
            for t in registry.ORACLE_TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{registry.SCHEMA_PROBE_DIR}/{t}.parquet')"
                )
            cols = [
                (r[0], r[1]) for r in con.execute("DESCRIBE " + sql).fetchall()
            ]
        finally:
            con.close()
        finalized = registry._wrap_oracle(sql, cols)
        compare_query(spark, SF, registry.QUERIES[name], finalized)
    finally:
        del registry.QUERIES[name]
        del registry.ORACLES[name]
    assert name not in registry.QUERIES


def test_staged_names_are_planned_in_the_window_comment():
    """The rotation plan in __spark_entry__ must keep naming the r15
    path while these stay staged — a stale plan is how a window
    overflow happens."""
    import __spark_entry__ as mod
    import inspect

    src = inspect.getsource(mod)
    assert "r15" in src and "ROTATION_R13_NEW" in src
    for n, _sql, _fn in staged_r15.STAGED:
        assert n not in mod.queries(), f"{n} registered before its window"


def test_r14_window_precomputation_is_sound():
    """The r14 window is ACTIVE (flipped early r14, exactly as
    pre-computed late r13): 12 anchors + the full 38-name r9 staleness
    cohort, 50 unique registered names, nothing else — zero slots for
    new registrations, which is why the staged queries wait for r15."""
    import __spark_entry__ as mod

    cohort = mod.ROTATION_R14_REVALIDATE
    assert len(cohort) == 38 == len(set(cohort))
    live = set(mod.queries())
    assert set(cohort) <= live
    assert mod.PRIORITY_WINDOW == mod.ANCHORS + cohort
    assert len(mod.PRIORITY_WINDOW) == 50 == len(set(mod.PRIORITY_WINDOW))
    assert not (set(cohort) & set(mod.ANCHORS))


def test_r15_window_precomputation_is_sound():
    """The pre-written r15 window (late r14): 10 anchors (the two
    named demotions applied) + the four staged registrations + the
    full 36-name r10 staleness cohort = 50 exactly. The cohort must be
    registered names, disjoint from the anchors and from the ACTIVE
    r14 window (so nothing in it gets a newer green row before r15),
    and the NEW list must equal the staged_r15 slate name-for-name."""
    import __spark_entry__ as mod

    new = mod.ROTATION_R15_NEW
    cohort = mod.ROTATION_R15_REVALIDATE
    assert sorted(new) == sorted(n for n, _s, _f in staged_r15.STAGED)
    assert len(cohort) == 36 == len(set(cohort))
    live = set(mod.queries())
    assert set(cohort) <= live
    assert not (set(cohort) & set(mod.PRIORITY_WINDOW))
    demoted = {"agg_pricing_summary", "generate_orders_seeded"}
    assert demoted <= set(mod.ANCHORS)  # still anchors at r14
    anchors_r15 = [a for a in mod.ANCHORS if a not in demoted]
    assert len(anchors_r15) + len(new) + len(cohort) == 50
    # and the names sit where the plan says they sit
    assert not (set(new) & live)  # staged, not yet registered


def test_rotation_capacity_arithmetic():
    """The 5-round staleness invariant is only satisfiable while
    non-anchor registry names fit the rotation budget
    (window - anchors) * 5. Today: 188 <= 190. Registering the 4
    staged queries under 12 permanent anchors would break this
    (192 > 190) — which is why the staged plan makes the r15 anchor
    trim to 10 PERMANENT (budget 200). This test fails the moment
    someone grows the registry past the current anchors' budget, so
    the capacity decision can never be skipped silently."""
    import __spark_entry__ as mod

    window = 50
    anchors = len(mod.ANCHORS)
    non_anchor = len(mod.queries()) - anchors
    budget = (window - anchors) * 5
    assert non_anchor <= budget, (
        f"{non_anchor} non-anchor names exceed the {budget}-name rotation "
        f"budget at {anchors} anchors — shrink ANCHORS or de-register"
    )
    # and the staged registration is only feasible with the planned trim
    staged_total = non_anchor + len(staged_r15.STAGED)
    assert staged_total > budget  # documents WHY the trim is needed
    assert staged_total <= (window - 10) * 5  # 10 anchors suffice
