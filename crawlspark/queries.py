"""Driver-contract operator queries (SURVEY.md §2 query keys).

Each entry maps one operator family of the reference crawler onto the
TPC-H-ish driver testdata (TESTDATA.md) as an idiomatic DataFrame query, with
a matching ANSI-SQL oracle string for DuckDB in ``ORACLE_SQL``. Column names
and rounding are aligned on both sides because the driver compares
(row count, schema, order-insensitive value hash) per query.

Conventions:
  * timestamps are emitted as formatted strings (Spark is session-UTC,
    DuckDB is naive-UTC; strings compare exactly),
  * double aggregates are rounded (2 or 4 dp) on both sides,
  * every top-k/limit query carries a total order with a unique tie-break.

Reference file:line citations are in each docstring so parity with the
reference's operator inventory is checkable (SURVEY.md §2 tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn
    return deco


TS = "yyyy-MM-dd HH:mm:ss"
TS_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


# =========================================================================
# §2.1 scans / sources / sinks
# =========================================================================

@q("scan_frontier", """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderkey LIMIT 500
""")
def scan_frontier(spark, sf):
    """S1: paginated source scan with pushed filter + projection
    (ref: GraphQL page scan, src/infrastructure/github_api.py:188-214)."""
    return (_t(spark, sf, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .select("o_orderkey", "o_custkey",
                    F.round("o_totalprice", 2).alias("totalprice"))
            .orderBy("o_orderkey").limit(500))


@q("strata_filter", """
SELECT o_orderkey, o_orderpriority
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
ORDER BY o_orderpriority, o_orderkey LIMIT 300
""")
def strata_filter(spark, sf):
    """S2: priority-stratum membership (ref: ordered search-query strata,
    src/infrastructure/github_api.py:221-462)."""
    return (_t(spark, sf, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select("o_orderkey", "o_orderpriority")
            .orderBy("o_orderpriority", "o_orderkey").limit(300))


@q("point_lookup", """
SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice,2) AS totalprice
FROM orders WHERE o_orderkey = 4242
""")
def point_lookup(spark, sf):
    """S3: point lookup by id (ref: SELECT ... WHERE repo_id = $1,
    src/infrastructure/database.py:81-90)."""
    return (_t(spark, sf, "orders")
            .filter(F.col("o_orderkey") == 4242)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    F.round("o_totalprice", 2).alias("totalprice")))


@q("lookup_by_name", """
SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE c_name = concat('Customer#', lpad(CAST(100 AS VARCHAR), 9, '0'))
ORDER BY c_custkey
""")
def lookup_by_name(spark, sf):
    """S4: lookup by constructed name (ref: full_name = owner/name equality,
    src/infrastructure/database.py:108-118; concat C3)."""
    return (_t(spark, sf, "customer")
            .filter(F.col("c_name") == F.concat(
                F.lit("Customer#"), F.lpad(F.lit("100"), 9, "0")))
            .select("c_custkey", "c_name", "c_mktsegment")
            .orderBy("c_custkey"))


@q("paginated_scan", """
SELECT o_orderkey, round(o_totalprice,2) AS totalprice
FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
""")
def paginated_scan(spark, sf):
    """S5: ORDER BY ... LIMIT/OFFSET pagination
    (ref: src/infrastructure/database.py:273-298).

    Native offset+limit (Spark >= 3.4) plans as a global limit over
    TakeOrderedAndProject — each partition contributes at most
    offset+limit rows, then one merge. The alternative (row_number over an
    unpartitioned Window) funnels EVERY row through a single task and dies
    at 100x scale."""
    return (_t(spark, sf, "orders")
            .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
            .orderBy("o_orderkey")
            .offset(100).limit(50))


@q("stale_topk", f"""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, event_type
FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
ORDER BY ts ASC, event_id ASC LIMIT 20
""")
def stale_topk(spark, sf):
    """S6: oldest-first recrawl candidates — TakeOrderedAndProject
    (ref: WHERE crawled_at < $1 ORDER BY crawled_at LIMIT $2,
    src/infrastructure/database.py:315-332)."""
    return (_t(spark, sf, "events")
            .filter(F.col("ts") < "2024-01-03 00:00:00")
            .select("event_id", F.date_format("ts", TS_US).alias("ts_str"),
                    "event_type")
            .orderBy(F.asc("ts"), F.asc("event_id")).limit(20))


@q("upsert_merge", """
WITH target AS (
  SELECT user_id, event_id, value FROM events
  WHERE event_id < 5000 QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
), source AS (
  SELECT user_id, event_id, value FROM events
  WHERE event_id >= 5000 QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
)
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       coalesce(s.event_id, t.event_id) AS event_id,
       round(coalesce(s.value, t.value), 2) AS value
FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
ORDER BY user_id
""")
def upsert_merge(spark, sf):
    """S7/S8: batch upsert — MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT,
    emulated as full-outer coalesce (ref: COPY+staging+ON CONFLICT merge,
    src/infrastructure/database.py:174-271).

    r6: latest-per-user via max(struct(event_id, value)) aggregate instead of
    a row_number window — map-side partial aggregation collapses each side to
    one row per user before its shuffle, and both sides come out hash-
    partitioned on user_id so the full-outer join adds no exchange. Identical
    result: rn=1 under event_id DESC is the struct maximum (event_id is
    unique per user — driver-data invariant the window version already
    relied on for determinism)."""
    # (r6b measured negative result: a shared spread_scan ahead of the two
    # filtered branches lost 0.6s -> 1.4-2.6s at the 10x replica — same
    # reasoning as dedup_seen: cheap partial aggs, expensive row exchange.)
    ev = _t(spark, sf, "events")

    def latest(df):
        return (df.groupBy("user_id")
                .agg(F.max(F.struct("event_id", "value")).alias("_w"))
                .select("user_id", F.col("_w.event_id").alias("event_id"),
                        F.col("_w.value").alias("value")))

    t = latest(ev.filter(F.col("event_id") < 5000)).alias("t")
    s = latest(ev.filter(F.col("event_id") >= 5000)).alias("s")
    return (t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full_outer")
            .select(
                F.coalesce(F.col("s.user_id"), F.col("t.user_id")).alias("user_id"),
                F.coalesce(F.col("s.event_id"), F.col("t.event_id")).alias("event_id"),
                F.round(F.coalesce(F.col("s.value"), F.col("t.value")), 2).alias("value"))
            .orderBy("user_id"))


@q("export_csv", """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_iso,
       coalesce(o_orderstatus, '') AS status
FROM orders ORDER BY o_orderkey LIMIT 1000
""")
def export_csv(spark, sf):
    """S9: CSV export projection — None->'', datetime->isoformat
    (ref: src/infrastructure/database.py:546-573)."""
    return (_t(spark, sf, "orders")
            .select("o_orderkey",
                    F.date_format("o_orderdate", TS).alias("o_orderdate_iso"),
                    F.coalesce(F.col("o_orderstatus"), F.lit("")).alias("status"))
            .orderBy("o_orderkey").limit(1000))


@q("export_json", """
SELECT o_orderkey, to_json(struct_pack(o_orderkey := o_orderkey,
                                       o_custkey := o_custkey)) AS js
FROM orders ORDER BY o_orderkey LIMIT 500
""")
def export_json(spark, sf):
    """S10: JSON export serialization (ref: database.py:575-601; C7)."""
    return (_t(spark, sf, "orders")
            .select("o_orderkey",
                    F.to_json(F.struct("o_orderkey", "o_custkey")).alias("js"))
            .orderBy("o_orderkey").limit(500))


# =========================================================================
# §2.2 projections / filters / predicates
# =========================================================================

@q("project_fields", """
SELECT event_id, json_extract_string(props, '$.k') AS k_str
FROM events ORDER BY event_id LIMIT 500
""")
def project_fields(spark, sf):
    """F1/C7: nested-field projection from JSON payload (ref: GraphQL field
    projection + owner.login flattening, github_api.py:193-210,688-743)."""
    return (_t(spark, sf, "events")
            .select("event_id",
                    F.get_json_object("props", "$.k").alias("k_str"))
            .orderBy("event_id").limit(500))


@q("filter_stars", """
SELECT event_type, count(*) AS n
FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type
""")
def filter_stars(spark, sf):
    """F2: positive-metric admission filter (ref: stars>0,
    github_api.py:552)."""
    return (_t(spark, sf, "events").filter(F.col("value") > 0)
            .groupBy("event_type").agg(F.count("*").alias("n"))
            .orderBy("event_type"))


@q("range_pred", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
""")
def range_pred(spark, sf):
    """F4: conjunctive range predicates (TPC-H Q6 shape; ref: star/date-range
    strata, github_api.py:224-246,303-321)."""
    li = _t(spark, sf, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1995-01-01")
                      & (F.col("l_shipdate") < "1996-01-01")
                      & F.col("l_discount").between(0.02, 0.04)
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))


@q("cat_pred", """
SELECT c_mktsegment, count(*) AS n FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
def cat_pred(spark, sf):
    """F5: categorical equality/IN strata (ref: language/topic strata,
    github_api.py:251-300)."""
    return (_t(spark, sf, "customer")
            .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
            .groupBy("c_mktsegment").agg(F.count("*").alias("n"))
            .orderBy("c_mktsegment"))


@q("text_pred", """
SELECT lang, count(*) AS n FROM documents
WHERE text LIKE '%spark%' GROUP BY lang ORDER BY lang
""")
def text_pred(spark, sf):
    """F6: text containment strata (ref: '"awesome"' description search,
    github_api.py:408-415)."""
    return (_t(spark, sf, "documents")
            .filter(F.col("text").contains("spark"))
            .groupBy("lang").agg(F.count("*").alias("n")).orderBy("lang"))


@q("updated_since", """
SELECT count(*) AS n FROM events WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
""")
def updated_since(spark, sf):
    """F8: updated_since incremental filter (ref: WHERE updated_at > $1,
    database.py:282-288)."""
    return (_t(spark, sf, "events")
            .filter(F.col("ts") > "2024-01-10 00:00:00")
            .agg(F.count("*").alias("n")))


@q("err_classify", """
SELECT CASE WHEN lower(text) LIKE '%slow%' THEN 'restricted'
            WHEN lower(text) LIKE '%merge%' THEN 'retryable'
            ELSE 'fatal' END AS err_class,
       count(*) AS n
FROM documents GROUP BY err_class ORDER BY err_class
""")
def err_classify(spark, sf):
    """F10: keyword-list error classification (ref: 'ip allow list' /
    'saml_failure' classification, github_api.py:113-139,659-676; C10)."""
    d = _t(spark, sf, "documents")
    cls = (F.when(F.lower(F.col("text")).rlike("slow"), "restricted")
           .when(F.lower(F.col("text")).rlike("merge"), "retryable")
           .otherwise("fatal"))
    return (d.select(cls.alias("err_class"))
            .groupBy("err_class").agg(F.count("*").alias("n"))
            .orderBy("err_class"))


# =========================================================================
# §2.3 joins & set membership
# =========================================================================

@q("semi_join", """
SELECT count(*) AS n FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
""")
def semi_join(spark, sf):
    """J1: existence semi-join (ref: WHERE repo_id = ANY($1),
    database.py:92-106)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 5000)
    return (o.join(c, o.o_custkey == c.c_custkey, "left_semi")
            .agg(F.count("*").alias("n")))


@q("anti_join", """
SELECT count(*) AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def anti_join(spark, sf):
    """J2: new-rows anti-join — the core dedup primitive
    (ref: created = batch_ids - existing, use_cases.py:196-203)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .agg(F.count("*").alias("n")))


@q("dedup_seen", """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) = 1
ORDER BY user_id
""")
def dedup_seen(spark, sf):
    """J3: first-seen dedup — keep earliest arrival per key
    (ref: seen_repo_ids in-memory set, github_api.py:548-555).

    r6: row_number window -> min(struct(ts, event_id)) AGGREGATE. The window
    form shuffles and sorts every event row; the aggregate form collapses to
    one row per user map-side before the shuffle (guide §2.3 "aggregate
    before you shuffle") and needs no sort. Identical result: rn=1 under
    (ts ASC, event_id ASC) is exactly the lexicographic struct minimum, and
    every output column derives from that (ts, event_id) pair."""
    # (r6b measured negative result: spread_scan here — parallelizing the
    # map-side partial aggregate — LOST 0.5s -> 0.8-2.3s at the 10x replica;
    # the struct-min partial agg is ~100ns/row, far cheaper than exchanging
    # the 1M raw rows. spread_scan only pays where per-row compute is
    # hash/regex/fold-heavy — see textops._minhash_band_candidates.)
    return (_t(spark, sf, "events")
            .groupBy("user_id")
            .agg(F.min(F.struct("ts", "event_id")).alias("_w"))
            .select("user_id", F.col("_w.event_id").alias("event_id"),
                    F.date_format("_w.ts", TS_US).alias("ts_str"))
            .orderBy("user_id"))


@q("fk_join", """
SELECT n.n_name, count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""")
def fk_join(spark, sf):
    """J4: FK equi-join chain (ref: issues.repo_id -> repositories FK,
    migrations/001_initial_schema.sql:41,68)."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("n_name"))


@q("mv_stats", """
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
       count(DISTINCT o.o_orderstatus) AS n_status
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey ORDER BY c.c_custkey
""")
def mv_stats(spark, sf):
    """J5: materialized-view stats — multi-way LEFT JOIN + COUNT DISTINCT
    (ref: repository_stats MV, SCHEMA_EVOLUTION.md:209-229).

    (r6 measured negative result, reverted: pre-aggregating orders per
    o_custkey before the join — guide §2.3's usual move — ran 1.45s vs
    1.18s for this shape at sf1.0. The customer side broadcasts, so the
    join is shuffle-free either way, and the pre-agg's count-distinct
    Expand pays a second aggregation pass over nearly as many rows as the
    joined stream; keep join-then-aggregate.)"""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (c.join(o, o.o_custkey == c.c_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders"),
                 F.countDistinct("o_orderstatus").alias("n_status"))
            .orderBy("c_custkey"))


@q("newer_wins", """
WITH t AS (SELECT user_id, min(ts) AS ts, min(value) AS value FROM events GROUP BY user_id),
     s AS (SELECT user_id, max(ts) AS ts, max(value) AS value FROM events GROUP BY user_id)
SELECT t.user_id,
       strftime(CASE WHEN t.ts < s.ts THEN s.ts ELSE t.ts END,
                '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       round(CASE WHEN t.ts < s.ts THEN s.value ELSE t.value END, 2) AS value
FROM t JOIN s ON t.user_id = s.user_id
ORDER BY t.user_id
""")
def newer_wins(spark, sf):
    """J6: conditional newer-wins merge — MERGE WHEN MATCHED AND
    t.updated_at < s.updated_at THEN UPDATE (ref: SCHEMA_EVOLUTION.md:94-110)."""
    ev = _t(spark, sf, "events")
    t = ev.groupBy("user_id").agg(F.min("ts").alias("t_ts"),
                                  F.min("value").alias("t_value"))
    s = ev.groupBy("user_id").agg(F.max("ts").alias("s_ts"),
                                  F.max("value").alias("s_value"))
    j = t.join(s, "user_id")
    newer = F.col("t_ts") < F.col("s_ts")
    return (j.select(
        "user_id",
        F.date_format(F.when(newer, F.col("s_ts")).otherwise(F.col("t_ts")),
                      TS_US).alias("ts_str"),
        F.round(F.when(newer, F.col("s_value")).otherwise(F.col("t_value")), 2)
        .alias("value"))
        .orderBy("user_id"))


# =========================================================================
# §2.4 aggregations
# =========================================================================

@q("count_all", """
SELECT (SELECT count(*) FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1995-06-01') AS n,
       (SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') FROM events) AS max_ts
""")
def count_all(spark, sf):
    """A1 + A3 in one driver row: COUNT(*) with predicate (ref:
    database.py:300-313) and MAX timestamp (ref: SELECT MAX(crawled_at),
    database.py:616-618). Merged (like F7-inside-F4, O5-inside-S5) to keep
    the registry inside the driver's 50-row window while freeing a slot for
    dedup_phash; both are single-row partial-agg scans, and the crossJoin
    of two 1-row aggregates is a no-op at any scale."""
    n = (_t(spark, sf, "lineitem")
         .filter(F.col("l_shipdate") > "1995-06-01")
         .agg(F.count("*").alias("n")))
    mx = (_t(spark, sf, "events")
          .agg(F.date_format(F.max("ts"), TS_US).alias("max_ts")))
    return n.crossJoin(mx)


@q("epoch_counters", """
SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
       count(*) AS processed,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS created,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS updated
FROM orders GROUP BY day ORDER BY day
""")
def epoch_counters(spark, sf):
    """A4: per-epoch running counters, partial+final agg pattern
    (ref: records_processed/created/updated, use_cases.py:86-100)."""
    return (_t(spark, sf, "orders")
            .groupBy(F.date_format(F.date_trunc("day", "o_orderdate"),
                                   "yyyy-MM-dd").alias("day"))
            .agg(F.count("*").alias("processed"),
                 F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
                 .alias("created"),
                 F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
                 .alias("updated"))
            .orderBy("day"))


@q("windowed_agg", """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY window_start, event_type
ORDER BY window_start, event_type
""")
def windowed_agg(spark, sf):
    """Tumbling event-time window aggregation — the batch-checkable form of
    the engine's streaming per-host discovery-rate operator
    (crawlspark.streaming.ingest.host_discovery_rates; Structured Streaming
    adds withWatermark on the same plan). Integer cents avoid float-sum
    nondeterminism across engines."""
    return (_t(spark, sf, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("sum_cents"))
            .select(F.date_format("w.start", TS).alias("window_start"),
                    "event_type", "n_events", "sum_cents")
            .orderBy("window_start", "event_type"))


@q("json_props", """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       count(*) AS n, min(event_id) AS first_event
FROM events
GROUP BY k HAVING count(*) > 20 ORDER BY k
""")
def json_props(spark, sf):
    """C7: JSON metadata parse (ref: crawl_jobs.metadata JSONB,
    migrations/001_initial_schema.sql:168, serialized database.py:377,415,
    parsed :459) — from_json into a typed struct, then relational ops."""
    schema = "k BIGINT"
    return (_t(spark, sf, "events")
            .withColumn("j", F.from_json("props", schema))
            .groupBy(F.col("j.k").alias("k"))
            .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event"))
            .filter(F.col("n") > 20)
            .orderBy("k"))


@q("session_window", """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
""")
def session_window(spark, sf):
    """Session windows (30-min inactivity gap) per user — Spark's native
    F.session_window vs a gaps-and-islands oracle. In streaming this same
    plan runs under withWatermark; no watermark needed in batch. (The
    reference has no event-time ops; this is engine surface beyond it,
    SURVEY.md §2.8 note.)"""
    return (_t(spark, sf, "events")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.date_format("w.start", TS_US).alias("session_start"),
                    "n_events")
            .orderBy("user_id", "session_start"))


@q("rollup_counts", """
SELECT coalesce(o_orderpriority, 'ALL') AS stratum,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY stratum, status
""")
def rollup_counts(spark, sf):
    """§2.4 note: hierarchical subtotal aggregation (ROLLUP) — free from
    Spark once the plan is declarative; partial aggregation applies to every
    grouping set."""
    return (_t(spark, sf, "orders")
            .rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"))
            .select(F.coalesce("o_orderpriority", F.lit("ALL")).alias("stratum"),
                    F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    "n")
            .orderBy("stratum", "status"))


@q("strata_card", """
SELECT o_orderpriority AS stratum, count(*) AS n
FROM orders GROUP BY stratum ORDER BY stratum
""")
def strata_card(spark, sf):
    """A5: per-stratum cardinality (ref: repositoryCount per search query,
    github_api.py:192,527)."""
    return (_t(spark, sf, "orders")
            .groupBy(F.col("o_orderpriority").alias("stratum"))
            .agg(F.count("*").alias("n")).orderBy("stratum"))


@q("budget_usage", """
SELECT user_id,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS used_cents,
       CAST(floor(sum(CAST(round(value * 100, 0) AS BIGINT)) / 10.0) AS BIGINT) AS usage_bp,
       (sum(CAST(round(value * 100, 0) AS BIGINT)) >= 100000) AS exhausted
FROM events GROUP BY user_id ORDER BY user_id
""")
def budget_usage(spark, sf):
    """A6: budget usage percentage + exhaustion flag (ref: RateLimitInfo
    usage_percentage/is_exhausted, src/domain/entities.py:186-194)."""
    return (_t(spark, sf, "events")
            .groupBy("user_id")
            .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("used_cents"))
            .select("user_id", "used_cents",
                    F.floor(F.col("used_cents") / 10.0).cast("long").alias("usage_bp"),
                    (F.col("used_cents") >= 100000).alias("exhausted"))
            .orderBy("user_id"))


# =========================================================================
# §2.5 sorts / limits / top-k / window
# =========================================================================

@q("priority_pop", """
SELECT o_orderkey, o_orderpriority,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate
FROM orders
ORDER BY o_orderpriority ASC, o_orderdate ASC, o_orderkey ASC LIMIT 100
""")
def priority_pop(spark, sf):
    """O1: the frontier pop — global (priority, seq) TakeOrderedAndProject
    (ref: strata processed strictly in order, github_api.py:462,570-581).

    r6: sort on the RAW o_orderdate (exactly the oracle's ORDER BY) and
    date_format only the 100 surviving rows — the r5 plan sorted on the
    formatted string, so every input row paid the formatter before the
    top-k heap. Same selected set: the oracle itself orders by the raw
    column, and the fixture's order dates are day-granular so the formatted
    ordering never disagreed with the raw one."""
    # (r6b measured negative result: spread_scan before the top-k lost
    # 0.25s -> 1.4-2.9s at the 10x replica — the single-task top-100 heap
    # pass is cheaper than exchanging all 1.5M rows.)
    return (_t(spark, sf, "orders")
            .select("o_orderkey", "o_orderpriority", "o_orderdate")
            .orderBy(F.asc("o_orderpriority"), F.asc("o_orderdate"),
                     F.asc("o_orderkey"))
            .limit(100)
            .select("o_orderkey", "o_orderpriority",
                    F.date_format("o_orderdate", TS).alias("odate")))


@q("latest_per_group", """
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
""")
def latest_per_group(spark, sf):
    """O2/O3: latest row per group (ref: ORDER BY started_at DESC LIMIT 1 per
    job_type, database.py:430-442).

    r6: row_number window -> max(struct(ts, event_id, event_type))
    aggregate, same conversion as dedup_seen (map-side partial agg, no
    per-partition sort; measured 1.24s -> 0.91s at sf1.0, rows identical).
    event_type rides in the struct but is only compared when (ts, event_id)
    ties — impossible under the driver data's unique event_id."""
    return (_t(spark, sf, "events")
            .groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("_w"))
            .select("user_id", F.col("_w.event_id").alias("event_id"),
                    F.date_format("_w.ts", TS_US).alias("ts_str"),
                    F.col("_w.event_type").alias("event_type"))
            .orderBy("user_id"))


@q("topk_stars", """
SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 5
""")
def topk_stars(spark, sf):
    """O4: top-k by metric (ref: top-5 by stars, ci_crawler.py:101-107)."""
    return (_t(spark, sf, "part")
            .select("p_partkey", "p_name",
                    F.round("p_retailprice", 2).alias("price"))
            .orderBy(F.desc("p_retailprice"), F.asc("p_partkey")).limit(5))


# =========================================================================
# §2.6 set ops
# =========================================================================

@q("union_strata", """
SELECT o_orderpriority, count(*) AS n FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'
) GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def union_strata(spark, sf):
    """§2.6: frontier-strata union (ref: fallback query extension,
    github_api.py:588-604)."""
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderpriority")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderpriority")
    return (a.unionAll(b).groupBy("o_orderpriority")
            .agg(F.count("*").alias("n")).orderBy("o_orderpriority"))


# =========================================================================
# §2.7 scalar function suite
# =========================================================================

@q("scalar_suite", """
SELECT event_id,
       concat(event_type, '/', CAST(user_id AS VARCHAR)) AS full_name,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_iso,
       length(props) AS props_len,
       substr(event_type, 1, 3) AS short_type,
       CAST(floor(date_part('epoch', ts)) - floor(date_part('epoch', TIMESTAMP '2024-01-01 00:00:00')) AS BIGINT) AS secs_since,
       upper(replace(event_type, 'e', '_')) AS sanitized
FROM events ORDER BY event_id LIMIT 200
""")
def scalar_suite(spark, sf):
    """C1-C11 scalar functions in one projection: concat_ws (C3), isoformat
    (C8), length, substring truncation (C9), duration seconds (C11),
    sanitization replace (C4).

    r6: take the top-200 by event_id FIRST (raw columns only), then run the
    scalar projection over 200 rows — the r5 plan evaluated every formatter/
    regex for all input rows below the top-k (Catalyst pushes projections
    toward the scan, so it will not defer them for you). event_id is unique
    (driver-data invariant), so the selected set is unchanged; the trailing
    orderBy re-establishes presentation order."""
    return (_t(spark, sf, "events")
            .select("event_id", "event_type", "user_id", "ts", "props")
            .orderBy("event_id").limit(200)
            .select(
                "event_id",
                F.concat_ws("/", F.col("event_type"),
                            F.col("user_id").cast("string")).alias("full_name"),
                F.date_format("ts", TS_US).alias("ts_iso"),
                F.length("props").alias("props_len"),
                F.substring("event_type", 1, 3).alias("short_type"),
                (F.unix_timestamp("ts")
                 - F.unix_timestamp(F.lit("2024-01-01 00:00:00")
                                    .cast("timestamp"))).alias("secs_since"),
                F.upper(F.regexp_replace("event_type", "e", "_"))
                .alias("sanitized"))
            .orderBy("event_id"))
