"""Regression: join_asof_rates at exact half-cent boundaries.

The round-4 sf0.1 oracle sweep caught 4 of 161k rows where the old
``CAST(amount/rate AS DECIMAL(12,2))`` resolved an exact-half-cent
quotient differently on Spark (shortest-repr BigDecimal HALF_UP) and
DuckDB (double*100 rounding). The fix is exact scaled-integer half-up
arithmetic on both engines; this test pins it on a CONSTRUCTED fixture
where every row sits exactly on the boundary, instead of relying on
which keys happen to hit it at a given scale factor.

Boundary construction: EUR's 1996 rate is exactly 1.04 (base 1.0,
2%/year drift), so amount_cents * 25/26 is an exact half-cent whenever
amount_cents ≡ 13 (mod 26) — e.g. 0.13 EUR/1.04 = 12.5 cents, 0.39 →
37.5. Half-up must give 13 and 38 cents on BOTH engines.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__  # noqa: F401  (registers every query)

from orders_currency_conversion_etl_spark.plans.registry import QUERIES
from tests.oracle_harness import compare_query


def _stage_fixture(tmp_path) -> str:
    """orders = the constructed boundary rows; the other 9 tables are
    symlinked from sf0.001 (duck_connection registers all views
    eagerly; the query itself reads only orders)."""
    _write_orders(os.path.join(tmp_path, "orders.parquet"))
    for name in (
        "region nation customer supplier part lineitem events documents embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{name}.parquet",
            os.path.join(tmp_path, f"{name}.parquet"),
        )
    return str(tmp_path)


def _write_orders(path: str) -> None:
    # o_orderkey % 25 == 0 -> currency EUR (alphabet index 0)
    rows = [
        # exact half-cent boundaries under rate 1.04 (cents ≡ 13 mod 26)
        (25, 1, "F", 0.13, dt.datetime(1996, 6, 1), "1-URGENT"),
        (50, 2, "F", 0.39, dt.datetime(1996, 6, 1), "1-URGENT"),
        (75, 3, "O", 260.13, dt.datetime(1996, 6, 1), "2-HIGH"),
        # same cents, rate 1.0 exactly (1994) — quotient is integral cents
        (100, 4, "F", 0.13, dt.datetime(1994, 6, 1), "3-MEDIUM"),
        # pre-history date -> NULL rate -> coalesce(1.0) path
        (125, 5, "F", 0.13, dt.datetime(1990, 6, 1), "3-MEDIUM"),
        # a non-EUR row for good measure (USD, index 1)
        (26, 6, "F", 123.45, dt.datetime(1997, 6, 1), "4-NOT SPECIFIED"),
    ]
    cols = list(zip(*rows))
    table = pa.table(
        {
            "o_orderkey": pa.array(cols[0], pa.int64()),
            "o_custkey": pa.array(cols[1], pa.int64()),
            "o_orderstatus": pa.array(cols[2], pa.string()),
            "o_totalprice": pa.array(cols[3], pa.float64()),
            "o_orderdate": pa.array(cols[4], pa.timestamp("us")),
            "o_orderpriority": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, path)


def test_asof_half_cent_boundary_matches_oracle(spark, tmp_path):
    sf_dir = _stage_fixture(tmp_path)
    from orders_currency_conversion_etl_spark.plans import registry

    compare_query(
        spark,
        sf_dir,
        QUERIES["join_asof_rates"],
        registry.finalized_oracles()["join_asof_rates"],
    )


def test_asof_half_cent_rounds_half_up(spark, tmp_path):
    """The convention itself (not just parity): 12.5 cents -> 13."""
    sf_dir = _stage_fixture(tmp_path)
    out = {
        r.order_id: str(r.amount_eur)
        for r in QUERIES["join_asof_rates"](spark, sf_dir).collect()
    }
    assert out["25"] == "0.13"  # 12.5 cents, half-up
    assert out["50"] == "0.38"  # 37.5 cents, half-up
    assert out["75"] == "250.13"  # 26013/1.04 = 25012.5 cents
    assert out["100"] == "0.13"  # rate exactly 1.0
    assert out["125"] == "0.13"  # NULL rate -> 1.0 passthrough


def test_asof_lookup_matches_union_strategy(spark):
    """r18 opt: join_asof_rates switched from asof_join_union to
    asof_join_lookup (broadcast probe — the small-right-side plan).
    Pin the two strategies row-identical on a fixture that exercises
    every boundary: exact-date match, between-dates, before-first-date
    (NULL fill), after-last-date, and a left key absent from the right
    side entirely."""
    import datetime as dt

    from pyspark.sql import functions as F

    from orders_currency_conversion_etl_spark.operators.asof import (
        asof_join_lookup,
        asof_join_union,
    )

    left = spark.createDataFrame(
        [
            ("EUR", dt.datetime(1995, 6, 1), 1),
            ("EUR", dt.datetime(1994, 1, 1), 2),   # exact date match
            ("EUR", dt.datetime(1990, 1, 1), 3),   # before first -> NULL
            ("EUR", dt.datetime(2030, 1, 1), 4),   # after last
            ("XXX", dt.datetime(1995, 6, 1), 5),   # key missing on right
        ],
        "cur string, t timestamp, k int",
    )
    right = spark.createDataFrame(
        [
            ("EUR", 1.0, dt.datetime(1994, 1, 1)),
            ("EUR", 1.2, dt.datetime(1996, 1, 1)),
            ("USD", 0.9, dt.datetime(1994, 1, 1)),
        ],
        "cur string, rate double, rate_date timestamp",
    )
    kwargs = dict(by="cur", left_on="t", right_on="rate_date", value_cols=["rate", "rate_date"])
    a = asof_join_union(left, right, **kwargs)
    b = asof_join_lookup(left, right, **kwargs)
    assert sorted(a.columns) == sorted(b.columns)
    cols = a.columns
    ra = sorted(tuple(r) for r in a.select(*cols).collect())
    rb = sorted(tuple(r) for r in b.select(*cols).collect())
    assert ra == rb and len(ra) == 5
