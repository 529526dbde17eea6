"""The staged r17 registrations (staged_r17.py) are value-exact against
their oracles TODAY, through the exact machinery registration will
apply — each test registers the query with the real decorator (boundary
casts), compares via the driver-replica harness against the FINALIZED
oracle, then removes the entry so the live registry (and the artifact-
sync pins keyed to it) is untouched. Window/capacity pins encode the
PRE-registration state; at r17 rewrite them steady-state (the
test_staged_r15.py r15 rewrite is the model)."""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r17
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", [n for n, _sql, _fn in staged_r17.STAGED])
def test_staged_r17_query_value_exact(spark, name):
    sql, fn = next((s, f) for n, s, f in staged_r17.STAGED if n == name)
    assert name not in registry.QUERIES  # really unregistered today
    registry.query(name, sql)(fn)
    try:
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


def test_staged_r17_not_registered_before_window():
    import __spark_entry__ as mod

    for n, _sql, _fn in staged_r17.STAGED:
        assert n not in mod.queries(), f"{n} registered before its window"


def test_r17_capacity_arithmetic():
    """The r17 slate must fit the window and the 5-round budget: the
    r12 due cohort is 38 names, leaving exactly 2 slots; capacity
    after registration is 206 + 2 - 10 = 198 <= 200. This test fails
    if the slate grows past the slots or the budget."""
    import __spark_entry__ as mod

    staged = [n for n, _s, _f in staged_r17.STAGED]
    assert len(staged) == 2 == len(set(staged))
    # staged_r16 registered at r16: queries() already carries it
    live_after_r16 = len(mod.queries())
    after_r17 = live_after_r16 + len(staged)
    assert after_r17 - len(mod.ANCHORS) <= (50 - len(mod.ANCHORS)) * 5
    # the r17 window: 10 anchors + 2 new + the 38-name r12 cohort
    assert len(mod.ANCHORS) + len(staged) + 38 == 50


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
