"""The staged r18 registrations (staged_r18.py) are value-exact against
their oracles TODAY, through the exact machinery registration will
apply — registered with the real decorator (boundary casts), compared
via the driver-replica harness against the FINALIZED oracle, then
removed so the live registry stays untouched. Capacity pins encode the
PRE-registration state; at r18 rewrite them steady-state (the
test_staged_r15.py r15 rewrite is the model). NOTE: these two names
spend the LAST free rotation slots of the build's horizon (post-r18
budget is exactly 200/200)."""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r18
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", [n for n, _sql, _fn in staged_r18.STAGED])
def test_staged_r18_query_value_exact(spark, name):
    sql, fn = next((s, f) for n, s, f in staged_r18.STAGED if n == name)
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


def test_staged_r18_not_registered_before_window():
    import __spark_entry__ as mod

    for n, _sql, _fn in staged_r18.STAGED:
        assert n not in mod.queries(), f"{n} registered before its window"


def test_r18_capacity_arithmetic():
    """The r18 slate fills the budget EXACTLY: r13 due cohort is 38
    names -> 2 slots; after registration non-anchor is 200/200 and
    r19/r20 have zero slots. This test fails if anything tries to grow
    the slate or the registry past that."""
    import __spark_entry__ as mod

    staged = [n for n, _s, _f in staged_r18.STAGED]
    assert len(staged) == 2 == len(set(staged))
    # the pinned window list must track STAGED today, not mid-r18-flip
    # (the rotation-horizon replay derives r18 from STAGED, so drift
    # in ROTATION_R18_NEW would otherwise surface only in the round
    # with zero recovery slots)
    assert sorted(mod.ROTATION_R18_NEW) == sorted(staged)
    # staged_r17 registered at r17: queries() already carries it
    live_after_r17 = len(mod.queries())
    after_r18 = live_after_r17 + len(staged)
    assert after_r18 == 210
    assert after_r18 - len(mod.ANCHORS) == (50 - len(mod.ANCHORS)) * 5


def test_audio_info_dispatch_branches_loud():
    """Each branch reports its own codec label, and non-audio bytes
    are loud (the fixture contract the oracle leans on)."""
    from orders_currency_conversion_etl_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="unrecognized audio container"):
        mm.audio_info(b"\x89PNG\r\n\x1a\n")
    assert mm.audio_info(mm.encode_wav(44100, [0, 1], 1, "mulaw"))[0] == "mulaw"
    assert mm.audio_info(mm.encode_ogg_id_page("opus", 2, 48000)) == ("opus", 2, 48000)
    assert mm.audio_info(mm.encode_flac_header(2, 32000)) == ("flac", 2, 32000)
    assert mm.audio_info(mm.encode_mp3_header(1, 44100, id3_size=9)) == ("mp3", 1, 44100)


def test_image_dims_fixture_helpers_parse():
    """The hand-rolled ICO/BMP/PNM fixture bytes parse through the
    REAL dispatch with the documented quirks: 256-as-zero ICO bytes,
    negative top-down BMP height, netpbm comment skip, HEIF thumbnail
    skip."""
    from orders_currency_conversion_etl_spark import staged_r18 as s
    from orders_currency_conversion_etl_spark.operators import multimodal as mm

    assert mm.image_dims(s._ico_bytes(256, 256)) == (256, 256, "RGBA")
    assert mm.image_dims(s._ico_bytes(7, 9)) == (7, 9, "RGBA")
    assert mm.image_dims(s._bmp_bytes(5, 4, 8, topdown=True)) == (5, 4, "P")
    assert mm.image_dims(s._pnm_bytes(4, 11, 3)) == (11, 3, "1")
    assert mm.image_dims(s._pnm_bytes(5, 11, 3)) == (11, 3, "L")
    assert mm.image_dims(s._pnm_bytes(6, 11, 3)) == (11, 3, "RGB")
    assert mm.image_dims(mm.encode_heif_header("avif", [(1, 1), (8, 6)])) == (8, 6, "RGB")
