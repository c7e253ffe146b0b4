"""Schema registry: explicit ``StructType`` per table (SURVEY.md §1.2).

The reference enforces schemas at every boundary — 9-field StructType on
CSV read (spark_etl_job.py:20-31), all-columns-REQUIRED BigQuery loads
(spark-bq-dag.py:64-120), re-declared projection schemas on scan-back
(ml_project.py:55-67). Our engine centralizes that discipline here:
every source reads with an explicit schema (no inference pass — one
fewer full file scan, a real cost at 100 TB), and sinks validate
NOT-NULL contracts before writing (io/sinks.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference input schema (spark_etl_job.py:20-31) --------------------
FOOTBALL_RESULTS = T.StructType(
    [
        T.StructField("date", T.StringType(), True),
        T.StructField("home_team", T.StringType(), True),
        T.StructField("away_team", T.StringType(), True),
        T.StructField("home_score", T.IntegerType(), True),
        T.StructField("away_score", T.IntegerType(), True),
        T.StructField("tournament", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("neutral", T.BooleanType(), True),
    ]
)

# --- Star-schema outputs (spark_etl_job.py:74-78; spark-bq-dag.py DDL) ---
STAR_FACTS = T.StructType(
    [
        T.StructField("date_id", T.LongType(), False),
        T.StructField("game_id", T.LongType(), False),
        T.StructField("home_score", T.IntegerType(), False),
        T.StructField("away_score", T.IntegerType(), False),
    ]
)
STAR_DATE_DIM = T.StructType(
    [
        T.StructField("date_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
    ]
)
STAR_GAME_DIM = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("home_team", T.StringType(), False),
        T.StructField("away_team", T.StringType(), False),
        T.StructField("tournament", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("country", T.StringType(), False),
        T.StructField("neutral", T.BooleanType(), False),
    ]
)

# --- Driver testdata tables (TESTDATA.md / FIXTURES.md §B) ---------------
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
        T.StructField("props", T.StringType(), True),
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

TESTDATA_TABLES: dict[str, T.StructType] = {
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

# Tables small enough to always broadcast in joins (dims). At 100 TB the
# fact tables (lineitem/orders/events/documents) scale; these stay tiny.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}
