"""Cross-engine guarantees for the compared-boundary array flattening.

CORRECTNESS_r04's only red row (``embedding_quantize_int8``) was a
harness-shape failure: an ``array<int>`` output column is unhashable
inside the driver's ``pandas.sort_values`` canonicalization.  The fix
serializes every ArrayType output column to canonical JSON text on BOTH
engines (``registry.boundary_cast`` Spark-side, ``registry._wrap_oracle``
DuckDB-side).  These tests pin the guarantee that the two engines'
JSON texts are byte-identical for the element types the registry can
produce, and that the previously-failing query now survives the exact
pandas canonicalization path the driver uses.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  (registers every query)
from orders_currency_conversion_etl_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _spark_json(spark, sql_literal: str) -> str:
    df = spark.sql(f"SELECT {sql_literal} AS v")
    return registry.boundary_cast(df).collect()[0][0]


def _duck_json(duck_literal: str, duck_type: str) -> str:
    con = duckdb.connect()
    try:
        sql = registry._wrap_oracle(
            f"SELECT {duck_literal} AS v", [("v", duck_type)]
        )
        return con.execute(sql).fetchone()[0]
    finally:
        con.close()


def test_int_array_json_identical_across_engines(spark):
    s = _spark_json(spark, "array(1, -5, 0, 2147483647)")
    d = _duck_json("[1, -5, 0, 2147483647]::INTEGER[]", "INTEGER[]")
    assert s == d == "[1,-5,0,2147483647]"


def test_bigint_array_json_identical_across_engines(spark):
    s = _spark_json(spark, "array(9007199254740993L, -1L)")
    d = _duck_json("[9007199254740993, -1]::BIGINT[]", "BIGINT[]")
    assert s == d == "[9007199254740993,-1]"


def test_string_array_json_identical_across_engines(spark):
    s = _spark_json(spark, "array('a', 'b \"quoted\"', '')")
    d = _duck_json("['a', 'b \"quoted\"', '']::VARCHAR[]", "VARCHAR[]")
    assert s == d == '["a","b \\"quoted\\"",""]'


def test_null_elements_json_identical_across_engines(spark):
    s = _spark_json(spark, "array(1, CAST(NULL AS INT), 3)")
    d = _duck_json("[1, NULL, 3]::INTEGER[]", "INTEGER[]")
    assert s == d == "[1,null,3]"


def test_decimal_array_goes_through_double(spark):
    # Fractional element types route through DOUBLE[] on both sides so
    # the JSON text comes from the same float64 bits.
    s = _spark_json(spark, "array(CAST(1.5 AS DECIMAL(12,2)), CAST(2.25 AS DECIMAL(12,2)))")
    d = _duck_json("[1.50, 2.25]::DECIMAL(12,2)[]", "DECIMAL(12,2)[]")
    assert s == d == "[1.5,2.25]"


def test_quantize_int8_survives_driver_canonicalization(spark):
    """The r4 failure, replayed: build the registered query's output and
    push it through the driver's canonicalization shape
    (``sort_values`` over every column) — must not raise."""
    df = registry.QUERIES["embedding_quantize_int8"](spark, SF)
    assert [f.dataType.simpleString() for f in df.schema.fields if f.name == "q_emb"] == [
        "string"
    ]
    pdf = pd.DataFrame(df.collect(), columns=df.columns)
    pdf.sort_values(by=sorted(pdf.columns))  # r4 died here with TypeError


def test_quantize_int8_matches_oracle(spark):
    from tests.oracle_harness import compare_query

    compare_query(
        spark,
        SF,
        registry.QUERIES["embedding_quantize_int8"],
        registry.finalized_oracles()["embedding_quantize_int8"],
    )
