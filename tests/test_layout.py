"""Z-order layout: Morton-key math, bucket locality, and the thing the
whole op exists for — measured file pruning of a selective scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from orders_currency_conversion_etl_spark.operators import layout
from orders_currency_conversion_etl_spark.sources import catalog

from tests.conftest import SF_SMOKE


def _morton_ref(x: int, y: int) -> int:
    """Pure-Python reference interleave (bit-at-a-time, no magic)."""
    z = 0
    for i in range(layout.BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_bitwise_reference(spark):
    # Values chosen to exercise every spread step: 0, max, alternating
    # bit patterns, and a few mid-range points.
    pts = [
        (0, 0),
        (65535, 65535),
        (0xAAAA, 0x5555),
        (1, 2),
        (12345, 54321),
        (40000, 1),
    ]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    # Identity normalization: bounds rows pin mn=0, mx=65535 exactly.
    df = df.union(spark.createDataFrame([(0, 0), (65535, 65535)], df.schema))
    out = {
        (r["x"], r["y"]): r["_zkey"]
        for r in layout.morton_key(df, "x", "y").collect()
    }
    for x, y in pts:
        assert out[(x, y)] == _morton_ref(x, y), (x, y)


def test_constant_column_does_not_divide_by_zero(spark):
    df = spark.createDataFrame([(7, 1), (7, 2), (7, 3)], "x bigint, y bigint")
    rows = layout.morton_key(df, "x", "y").collect()
    assert len(rows) == 3
    assert all(r["_zkey"] >= 0 for r in rows)


def test_bucket_locality_bounded_rectangles(spark):
    """Each top-6-bit z-bucket pins the top 3 bits of BOTH dims, so the
    per-bucket span of either column is <= 1/8 of its global range
    (plus normalization rounding slack)."""
    stats = layout.layout_zorder_stats(spark, SF_SMOKE).collect()
    li = catalog.load_table(spark, SF_SMOKE, "lineitem")
    g = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    part_range = g[1] - g[0]
    supp_range = g[3] - g[2]
    assert len(stats) > 16  # the curve actually spreads the data
    for r in stats:
        assert r["max_part"] - r["min_part"] <= part_range / 8 + 2
        assert r["max_supp"] - r["min_supp"] <= supp_range / 8 + 2


def test_zorder_write_prunes_files_vs_roundrobin(spark, tmp_path):
    """The measured claim: a selective 2-D predicate draws its matching
    rows from strictly fewer files under the z-ordered layout than
    under a size-balanced round-robin layout of the same data."""
    li = catalog.load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zdir = os.path.join(tmp_path, "zordered")
    rdir = os.path.join(tmp_path, "roundrobin")
    layout.write_zordered(li, "l_partkey", "l_suppkey", zdir, n_files)
    li.repartition(n_files).write.mode("overwrite").parquet(rdir)

    bounds = li.agg(F.min("l_partkey"), F.max("l_partkey"),
                    F.min("l_suppkey"), F.max("l_suppkey")).first()
    # ~1/8 of each dimension -> a 1/64 cell of the 2-D space.
    plo, phi = bounds[0], bounds[0] + (bounds[1] - bounds[0]) // 8
    slo, shi = bounds[2], bounds[2] + (bounds[3] - bounds[2]) // 8
    pred = (
        (F.col("l_partkey").between(plo, phi))
        & (F.col("l_suppkey").between(slo, shi))
    )

    z_touched = layout.files_touched(spark.read.parquet(zdir).filter(pred))
    r_touched = layout.files_touched(spark.read.parquet(rdir).filter(pred))
    n_match_z = spark.read.parquet(zdir).filter(pred).count()
    n_match_r = spark.read.parquet(rdir).filter(pred).count()

    assert n_match_z == n_match_r > 0  # same data, same answer
    assert r_touched == n_files  # scattered layout: every file has matches
    assert z_touched <= n_files // 2  # clustered layout: concentrated
    # Single-column predicate must also prune (the advantage over a
    # plain compound sort, which would only help the sort prefix —
    # check the NON-prefix dimension, suppkey).
    supp_only = F.col("l_suppkey").between(slo, shi)
    z_supp = layout.files_touched(spark.read.parquet(zdir).filter(supp_only))
    assert z_supp < n_files


def test_registered_query_hash_matches_oracle(spark):
    import __spark_entry__ as entry_mod
    from tests.oracle_harness import compare_query

    compare_query(
        spark,
        SF_SMOKE,
        entry_mod.queries()["layout_zorder_stats"],
        entry_mod.oracle_sql()["layout_zorder_stats"],
    )


# ---------------------------------------------------------------------------
# Property tests: the magic-number spread chain equals the bit-at-a-time
# definition for every representable input (pure Python mirror of
# _SPREAD_STEPS — the Spark-side equivalence is pinned above on a fixed
# batch, so one sampled bridge + an exhaustive-ish property closes the
# chain: definition == magic numbers == Spark == DuckDB oracle).
# ---------------------------------------------------------------------------

from hypothesis import given, strategies as st  # noqa: E402


def _spread_magic(x: int) -> int:
    for shift, mask in layout._SPREAD_STEPS:
        x = (x | (x << shift)) & mask
    return x


@given(st.integers(min_value=0, max_value=layout.MAX_CELL),
       st.integers(min_value=0, max_value=layout.MAX_CELL))
def test_spread_chain_equals_bitwise_definition(x, y):
    assert _spread_magic(x) | (_spread_magic(y) << 1) == _morton_ref(x, y)


@given(st.integers(min_value=0, max_value=layout.MAX_CELL - 1),
       st.integers(min_value=0, max_value=layout.MAX_CELL))
def test_zkey_monotone_per_dimension(x, other):
    """With one dimension fixed, the z-key is strictly monotone in the
    other — the property that turns a 1-D range predicate into a
    bounded set of z-ranges (the pruning guarantee)."""
    assert _morton_ref(x, other) < _morton_ref(x + 1, other)
    assert _morton_ref(other, x) < _morton_ref(other, x + 1)


def test_manifest_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    """Manifest-driven file skipping: the pruned read lists only
    overlapping files (cheaper than any in-file pruning — skipped files
    cost no task and no footer read) yet returns exactly the rows of a
    full scan + filter. Composes with the z-ordered layout: both
    clustered dimensions prune."""
    li = catalog.load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zdir = os.path.join(tmp_path, "zordered")
    layout.write_zordered(li, "l_partkey", "l_suppkey", zdir, n_files)

    manifest = layout.build_file_manifest(
        spark, zdir, ["l_partkey", "l_suppkey"]
    ).cache()
    assert manifest.count() == n_files
    assert manifest.agg(F.sum("n_rows")).first()[0] == li.count()

    bounds = li.agg(F.min("l_partkey"), F.max("l_partkey"),
                    F.min("l_suppkey"), F.max("l_suppkey")).first()
    for col, lo, hi in [
        ("l_partkey", bounds[0], bounds[0] + (bounds[1] - bounds[0]) // 8),
        ("l_suppkey", bounds[2], bounds[2] + (bounds[3] - bounds[2]) // 8),
    ]:
        pruned = layout.read_pruned(spark, manifest, col, lo, hi)
        full = spark.read.parquet(zdir).filter(F.col(col).between(lo, hi))
        assert pruned.count() == full.count() > 0
        n_read = pruned.select(F.input_file_name()).distinct().count()
        assert n_read < n_files, col  # files actually skipped at plan time

    # Disjoint range: zero rows, schema intact.
    empty = layout.read_pruned(spark, manifest, "l_partkey", bounds[1] + 10, bounds[1] + 20)
    assert empty.count() == 0
    assert set(empty.columns) == set(li.columns)
    manifest.unpersist()


# ---------------------------------------------------------------------------
# Hilbert curve
# ---------------------------------------------------------------------------

def _hilbert_inv(d: int, bits: int = layout.BITS) -> tuple[int, int]:
    """Reference d->xy (standard inverse walk), for round-trip tests."""
    x = y = 0
    s = 1
    while s < (1 << bits):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return x, y


@given(st.integers(min_value=0, max_value=(1 << (2 * layout.BITS)) - 1))
def test_hilbert_roundtrip_and_adjacency(d):
    """xy(d) -> d round-trips exactly, and consecutive curve positions
    are grid-adjacent (Manhattan distance 1) — the locality property
    that makes Hilbert clustering seam-free."""
    x, y = _hilbert_inv(d)
    assert layout.hilbert_ref(x, y) == d
    if d + 1 < (1 << (2 * layout.BITS)):
        x2, y2 = _hilbert_inv(d + 1)
        assert abs(x2 - x) + abs(y2 - y) == 1


def test_hilbert_spark_matches_reference(spark):
    import random

    random.seed(11)
    pts = [(random.randint(0, 65535), random.randint(0, 65535)) for _ in range(64)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    # Identity normalization via pinned extremes (as in the Morton test).
    df = df.union(spark.createDataFrame([(0, 0), (65535, 65535)], df.schema))
    out = {
        (r["x"], r["y"]): r["_hkey"]
        for r in layout.hilbert_key(df, "x", "y").collect()
    }
    for x, y in pts:
        assert out[(x, y)] == layout.hilbert_ref(x, y), (x, y)


def test_hilbert_bucket_locality_bounded_rectangles(spark):
    """Top-6-bit Hilbert buckets are the 64 depth-3 cells — each an
    exact 1/8 x 1/8 square, so per-bucket spans are bounded just like
    the Morton buckets."""
    stats = layout.layout_hilbert_stats(spark, SF_SMOKE).collect()
    li = catalog.load_table(spark, SF_SMOKE, "lineitem")
    g = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    assert len(stats) > 16
    for r in stats:
        assert r["max_part"] - r["min_part"] <= (g[1] - g[0]) / 8 + 2
        assert r["max_supp"] - r["min_supp"] <= (g[3] - g[2]) / 8 + 2


def test_hilbert_query_hash_matches_oracle(spark):
    import __spark_entry__ as entry_mod
    from tests.oracle_harness import compare_query

    compare_query(
        spark,
        SF_SMOKE,
        entry_mod.queries()["layout_hilbert_stats"],
        entry_mod.oracle_sql()["layout_hilbert_stats"],
    )


def test_hilbert_write_prunes_like_zorder(spark, tmp_path):
    hdir = os.path.join(tmp_path, "hilbert")
    li = catalog.load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    n_files = 16
    layout.write_hilbert_ordered(li, "l_partkey", "l_suppkey", hdir, n_files)
    b = li.agg(F.min("l_partkey"), F.max("l_partkey"),
               F.min("l_suppkey"), F.max("l_suppkey")).first()
    for col, lo, hi in [
        ("l_partkey", b[0], b[0] + (b[1] - b[0]) // 8),
        ("l_suppkey", b[2], b[2] + (b[3] - b[2]) // 8),
    ]:
        touched = layout.files_touched(
            spark.read.parquet(hdir).filter(F.col(col).between(lo, hi))
        )
        assert touched < n_files, col


def test_rowgroup_manifest_footer_truth(spark, tmp_path):
    """Late r13: the footer-only row-group walk reports exactly what
    DuckDB's parquet_metadata() reads from the same footers — counts,
    byte sizes, min/max renderings and null counts — for a multi-file,
    multi-row-group layout with nulls."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orders_currency_conversion_etl_spark.operators.layout import (
        rowgroup_manifest,
    )

    for fi in range(2):
        ids = list(range(fi * 100, fi * 100 + 100))
        vals = [None if i % 7 == 0 else i * 2 for i in ids]
        pq.write_table(
            pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())}),
            str(tmp_path / f"f{fi}.parquet"),
            row_group_size=32,
        )
    got = {
        (r["file"], r["row_group"]): r
        for r in rowgroup_manifest(spark, str(tmp_path), ["k", "v"]).collect()
    }
    assert len(got) == 2 * 4  # ceil(100/32) groups per file

    con = duckdb.connect()
    ref = con.execute(
        "SELECT regexp_extract(file_name, '[^/]+$') AS f, row_group_id, "
        "path_in_schema, num_values, stats_null_count, "
        "stats_min_value, stats_max_value, row_group_num_rows "
        f"FROM parquet_metadata('{tmp_path}/*.parquet')"
    ).fetchall()
    assert len(ref) == 2 * 4 * 2  # x2 columns
    for f, rg, col, nvals, nulls, mn, mx, nrows in ref:
        row = got[(f, rg)]
        assert row["n_rows"] == nrows == nvals
        assert row[f"{col}_nulls"] == nulls
        assert row[f"{col}_min"] == str(mn)
        assert row[f"{col}_max"] == str(mx)

    # asking for a column the schema lacks is loud, not silently null
    with pytest.raises(Exception, match="not in parquet schema"):
        rowgroup_manifest(spark, str(tmp_path), ["nope"]).collect()

    with pytest.raises(ValueError, match="no parquet files"):
        rowgroup_manifest(spark, str(tmp_path / "empty"), ["k"])


def test_lake_rowgroup_stats_matches_oracle(spark):
    """Late r13 (r15 registration candidate): the deterministic-write +
    footer-walk query agrees value-for-value with its first-principles
    SQL oracle at sf0.1 (10 full 512-row groups + a remainder)."""
    import duckdb

    from orders_currency_conversion_etl_spark.operators.layout import (
        _LAKE_ROWGROUP_ORACLE,
        lake_rowgroup_stats,
    )

    sf = "/root/testdata/sf0.1"
    got = sorted(
        (
            (r["row_group"], r["n_rows"], r["doc_id_min"], r["doc_id_max"],
             r["n_chars_min"], r["n_chars_max"])
            for r in lake_rowgroup_stats(spark, sf).collect()
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ref = sorted(tuple(t) for t in con.execute(_LAKE_ROWGROUP_ORACLE).fetchall())
    assert got == ref
    assert len(got) >= 2  # really multi-row-group


def test_read_pruned_rowgroups(spark, tmp_path):
    """Late r13: the row-group-granular read path — the surviving-plan
    math is minimal (only overlapping groups selected), the pruned
    read equals the full-scan filter, and an empty overlap yields an
    empty, schema-stable result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orders_currency_conversion_etl_spark.operators.layout import (
        read_pruned_rowgroups,
        rowgroup_manifest,
        surviving_rowgroups,
    )

    # two files x 100 sorted rows x 32-row groups: k in [0,100) / [100,200)
    for fi in range(2):
        ids = list(range(fi * 100, fi * 100 + 100))
        pq.write_table(
            pa.table({"k": pa.array(ids, pa.int64()),
                      "v": pa.array([i * 2 for i in ids], pa.int64())}),
            str(tmp_path / f"f{fi}.parquet"),
            row_group_size=32,
        )
    mf = rowgroup_manifest(spark, str(tmp_path), ["k"]).cache()

    # [40, 70] overlaps f0's groups 1 ([32,63]) and 2 ([64,95]) only
    plan = surviving_rowgroups(mf, "k", 40, 70)
    assert plan == {"f0.parquet": [1, 2]}

    got = read_pruned_rowgroups(spark, str(tmp_path), mf, "k", 40, 70)
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [
        (k, 2 * k) for k in range(40, 71)
    ]

    # straddling both files
    plan2 = surviving_rowgroups(mf, "k", 90, 110)
    assert plan2 == {"f0.parquet": [2, 3], "f1.parquet": [0]}
    got2 = read_pruned_rowgroups(spark, str(tmp_path), mf, "k", 90, 110)
    assert got2.count() == 21

    # no overlap: empty result, stable schema, zero tasks planned
    assert surviving_rowgroups(mf, "k", 500, 600) == {}
    empty = read_pruned_rowgroups(spark, str(tmp_path), mf, "k", 500, 600)
    assert empty.count() == 0
    assert empty.columns == ["k", "v"]
    mf.unpersist()


def test_rowgroup_pruning_never_touches_skipped_groups(spark, tmp_path):
    """VERDICT r15 ask #7: the lake_rowgroup_stats consumer path must
    PROVE the skip — not just return correct rows. Fixture: a sorted
    4-group file whose group 0 data pages are overwritten with junk
    (footer left intact). The footer-only manifest still builds, a
    full scan of the file fails on the poisoned pages (the poison is
    real), and read_pruned_rowgroups over a range that excludes group
    0 succeeds with exact rows — a skipped row group costs no page
    read and no decode, the 100 TB claim stated in the docstring."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orders_currency_conversion_etl_spark.operators.layout import (
        read_pruned_rowgroups,
        rowgroup_manifest,
        surviving_rowgroups,
    )

    path = str(tmp_path / "poisoned.parquet")
    ids = list(range(128))
    pq.write_table(
        pa.table({"k": pa.array(ids, pa.int64()),
                  "v": pa.array([i * 3 for i in ids], pa.int64())}),
        path,
        row_group_size=32,
    )
    # poison group 0's column chunks in place; the footer (file tail)
    # and every other group's pages are untouched
    md = pq.ParquetFile(path).metadata
    rg0 = md.row_group(0)
    with open(path, "r+b") as f:
        for ci in range(rg0.num_columns):
            col = rg0.column(ci)
            start = col.data_page_offset
            if col.dictionary_page_offset is not None:
                start = min(start, col.dictionary_page_offset)
            f.seek(start)
            f.write(b"\xff" * col.total_compressed_size)

    # sanity: the poison is real — a whole-file read fails
    with pytest.raises(Exception):
        pq.read_table(path)

    # footer-only manifest still builds (proves it reads no pages)
    mf = rowgroup_manifest(spark, path, ["k"])
    assert mf.count() == 4

    # [40, 100] overlaps groups 1-3 only; the pruned read never opens
    # group 0's pages, so it succeeds despite the poison
    plan = surviving_rowgroups(mf, "k", 40, 100)
    assert plan == {"poisoned.parquet": [1, 2, 3]}
    got = read_pruned_rowgroups(spark, path, mf, "k", 40, 100)
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [
        (k, 3 * k) for k in range(40, 101)
    ]

    # and a range REACHING group 0 fails loudly — no silent skip of
    # data the plan says must be read
    with pytest.raises(Exception):
        read_pruned_rowgroups(spark, path, mf, "k", 0, 40).collect()
