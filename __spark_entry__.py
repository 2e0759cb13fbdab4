"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship query (frontier-pop shape over sf0.001).
``queries``   — one callable per implemented operator from SURVEY.md §2
                (crawl-engine operator analogs + training-data pipeline ops),
                all defined in ``crawlspark.queries`` / ``crawlspark.textops``.
``oracle_sql``— matching DuckDB ANSI-SQL strings; keys without an oracle are
                non-SQL-expressible ops checked rows-only by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier priority-pop + politeness-shaped query over
    sf0.001 — top-priority order batch joined to its customer 'host' dim with
    a per-host admission cap, the engine's signature plan
    (crawlspark.plans.epoch)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    w_host = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderpriority"), F.asc("o_orderdate"), F.asc("o_orderkey"))
    admitted = (orders
                .withColumn("host_rank", F.row_number().over(w_host))
                .filter(F.col("host_rank") <= 3)   # per-host politeness cap
                .join(F.broadcast(customer.select("c_custkey", "c_mktsegment")),
                      F.col("o_custkey") == F.col("c_custkey"))
                .orderBy(F.asc("o_orderpriority"), F.asc("o_orderdate"),
                         F.asc("o_orderkey"))
                .limit(200)
                .select("o_orderkey", "o_custkey", "o_orderpriority",
                        "c_mktsegment", "host_rank"))
    return admitted


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawlspark.queries import QUERIES

    try:
        from crawlspark.textops import QUERIES as TEXT_QUERIES
    except ImportError:
        TEXT_QUERIES = {}
    return {**QUERIES, **TEXT_QUERIES}


def oracle_sql() -> dict[str, str]:
    from crawlspark.queries import ORACLE_SQL

    try:
        from crawlspark.textops import ORACLE_SQL as TEXT_ORACLE
    except ImportError:
        TEXT_ORACLE = {}
    return {**ORACLE_SQL, **TEXT_ORACLE}
