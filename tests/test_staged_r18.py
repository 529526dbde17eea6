"""The r18 registrations (staged_r18.py, ACTIVATED at r18 via
``staged_r18.register_all()`` in ``__spark_entry__``): the unified
WAV/OGG/FLAC/MP3 audio-info dispatch and the PNM/ICO/BMP/HEIF
image-dims families, value-exact through the LIVE registry machinery —
exactly what the driver runs. These two names spent the LAST free
rotation slots of the build's horizon: the registry is now frozen at
210 and the budget is exactly 200/200 (tests/test_retirement_policy.py
pins the only escape hatch).

History: before r18 the registration tests here pinned the
PRE-registration state (names absent from the registry, window
precomputation); that era's pins are preserved in git history. The
activation flipped them to the steady-state form, the
test_staged_r15.py / test_staged_r16.py / test_staged_r17.py model."""

from __future__ import annotations

import pytest

from orders_currency_conversion_etl_spark import staged_r18
from orders_currency_conversion_etl_spark.plans import registry

from oracle_harness import compare_query

SF = "/root/testdata/sf0.01"

STAGED_NAMES = [n for n, _sql, _fn in staged_r18.STAGED]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as mod  # registers the full 210-name registry

    return mod


@pytest.mark.parametrize("name", STAGED_NAMES)
def test_registered_query_value_exact(spark, entry_mod, name):
    """Each r18-registered query remains value-exact against its
    FINALIZED oracle through the live registry path (boundary casts on
    both engines) — the same compare the driver's hash gate replays."""
    assert name in registry.QUERIES  # registered by __spark_entry__
    finalized = entry_mod.oracle_sql()[name]
    compare_query(spark, SF, registry.QUERIES[name], finalized)


def test_register_all_is_idempotent(entry_mod):
    """register_all() re-applies dict assignments; a second call must
    not grow the registry or change the registered objects."""
    before = dict(registry.QUERIES)
    staged_r18.register_all()
    assert set(registry.QUERIES) == set(before)
    for n in STAGED_NAMES:
        assert n in registry.QUERIES and n in registry.ORACLES


def test_r18_registration_landed_in_the_window(entry_mod):
    """The two staged names are registered AND sit in the active
    driver window exactly where the early-r15 plan put them — directly
    after the anchors, before the revalidation cohort."""
    q = entry_mod.queries()
    for n in STAGED_NAMES:
        assert n in q, f"{n} missing from the registry"
    assert sorted(entry_mod.ROTATION_R18_NEW) == sorted(STAGED_NAMES)
    window = list(q)[:50]
    assert window == (
        entry_mod.ANCHORS
        + entry_mod.ROTATION_R18_NEW
        + entry_mod.ROTATION_R18_REVALIDATE
    )


def test_r18_window_is_sound(entry_mod):
    """The ACTIVE r18 window: 10 anchors + 2 registrations + the full
    38-name r13 staleness cohort = 50 unique registered names, pairwise
    disjoint, with the post-registration capacity landing EXACTLY at
    the 5-round budget (210 - 10 = 200 == (50 - 10) * 5)."""
    mod = entry_mod
    assert len(mod.ANCHORS) == 10
    cohort = mod.ROTATION_R18_REVALIDATE
    assert len(cohort) == 38 == len(set(cohort))
    live = set(mod.queries())
    assert set(cohort) <= live
    assert mod.PRIORITY_WINDOW == (
        mod.ANCHORS + mod.ROTATION_R18_NEW + cohort
    )
    assert len(mod.PRIORITY_WINDOW) == 50 == len(set(mod.PRIORITY_WINDOW))
    # the budget is EXACTLY full — r19/r20 have zero slots
    assert len(live) - len(mod.ANCHORS) == (50 - len(mod.ANCHORS)) * 5


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
