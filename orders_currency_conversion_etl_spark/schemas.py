"""Explicit StructTypes for every table the engine touches.

The reference declares all schemas in DDL (reference:
init/postgres-1/init.sql:1-9, init/postgres-2/init.sql:1-11) and never
infers; we mirror that discipline — parquet scans get schema-on-read
validation and the flagship's money columns are DecimalType, not float
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Flagship dataflow tables (reference-shaped, SURVEY §1.3 / FIXTURES.md A) ---

# reference: init/postgres-1/init.sql:1-9
ORDERS_SRC = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),  # UUID in reference; Spark has no UUID type
        T.StructField("customer_email", T.StringType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("amount", T.DecimalType(12, 2), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("processed_at", T.TimestampType(), True),  # NULL = unprocessed
    ]
)

# reference: dags/order_currency_conversion_dag.py:53-65 (normalized EUR-base map)
EXCHANGE_RATES = T.StructType(
    [
        T.StructField("currency", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), False),  # units of currency per 1 EUR
        T.StructField("rate_date", T.DateType(), True),
    ]
)

# reference: init/postgres-2/init.sql:1-11
ORDERS_EUR = T.StructType(
    [
        T.StructField("order_id", T.StringType(), False),
        T.StructField("customer_email", T.StringType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("original_amount", T.DecimalType(12, 2), True),
        T.StructField("original_currency", T.StringType(), True),
        T.StructField("amount_eur", T.DecimalType(12, 2), True),
        T.StructField("exchange_rate", T.DecimalType(16, 6), True),
        T.StructField("exchange_rate_date", T.TimestampType(), True),
    ]
)

# --- Driver-provided synthetic tables (TESTDATA.md / FIXTURES.md B) ---

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON object string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
