"""Export sinks + table stats (S9/S10/A7 in SURVEY.md §2.1/§2.4).

Reference behavior reproduced:
  * CSV export with None->'' and timestamps as ISO strings
    (/root/reference/src/infrastructure/database.py:546-573)
  * JSON export with type coercion (database.py:575-601)
  * table stats: per-table counts + latest crawl timestamp + storage bytes
    (database.py:603-627: COUNT loop, MAX(crawled_at), pg_database_size)

Spark-first: the exports are ``df.write`` jobs (distributed, one file per
partition; ``single_file=True`` coalesces for tooling parity with the
reference's one-file artifact), and stats come from the snapshot manifest +
parquet footers — no full scans for row counts at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ISO_US = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _stringify_timestamps(df: DataFrame, fmt: str = ISO_US) -> DataFrame:
    """Timestamps -> ISO strings (the reference's isoformat coercion,
    database.py:565-569)."""
    for f in df.schema.fields:
        if f.dataType.simpleString().startswith("timestamp"):
            df = df.withColumn(f.name, F.date_format(f.name, fmt))
    return df


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink: None->'' (emptyValue/nullValue), header, ISO timestamps —
    byte-parity with the reference's csv.DictWriter output rules
    (database.py:556-573)."""
    out = _stringify_timestamps(df)
    if single_file:
        out = out.coalesce(1)
    (out.write.mode("overwrite")
     .option("header", "true")
     .option("nullValue", "")
     .option("emptyValue", "")
     .csv(path))


def export_json(df: DataFrame, path: str, single_file: bool = False,
                array_file: bool = False) -> None:
    """JSON-lines sink with ISO timestamp coercion (database.py:575-601;
    the reference writes a JSON array — JSONL is the distributed-native
    equivalent, one object per row). ``array_file=True`` additionally rewrites
    the part files into ONE ``data.json`` array file for byte-level tooling
    parity with the reference's artifact — a line-streaming driver-side
    rewrite (never loads the dataset into memory), for export sizes that
    belong on one machine anyway."""
    out = _stringify_timestamps(df)
    if single_file or array_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)
    if array_file:
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("part-") and f.endswith(".json"))
        tmp = os.path.join(path, ".data.json.tmp")
        with open(tmp, "w") as dst:
            dst.write("[")
            first = True
            for p in parts:
                with open(p) as src:
                    for line in src:
                        line = line.strip()
                        if not line:
                            continue
                        dst.write(("\n  " if first else ",\n  ") + line)
                        first = False
            dst.write("\n]\n")
        os.replace(tmp, os.path.join(path, "data.json"))


def table_stats(spark: SparkSession, store) -> DataFrame:
    """Per-table stats from the snapshot manifest + parquet footers only —
    the A7/`pg_database_size` analog without scanning data. Row counts come
    from footer metadata (num_rows), bytes from file sizes."""
    import pyarrow.parquet as pq

    snap = store.snapshot()
    rows = []
    for name, files in sorted(snap.tables.items()):
        n_rows = 0
        n_bytes = 0
        for rel in files:
            p = os.path.join(store.root, rel)
            n_bytes += os.path.getsize(p)
            n_rows += pq.ParquetFile(p).metadata.num_rows
        rows.append((name, len(files), n_rows, n_bytes))
    return spark.createDataFrame(
        rows, "table string, n_files int, n_rows long, n_bytes long")


def health_check(spark: SparkSession, store) -> dict:
    """Composed operational status — the reference's health-check surface
    (/root/reference/src/main.py:233-273 -> use_cases.py:296-356: per-component
    dict of db stats + active job + latest rate-limit). Ours: snapshot
    position, per-table stats (footer metadata only, no scans), the last
    crawl_jobs row (distinguishes completed/failed per T11), and the current
    politeness-budget availability summary."""
    snap = store.snapshot()
    last_epoch = int(snap.meta.get("last_epoch", -1))

    tables = {r["table"]: {"n_files": int(r["n_files"]),
                           "n_rows": int(r["n_rows"]),
                           "n_bytes": int(r["n_bytes"])}
              for r in table_stats(spark, store).collect()}

    last_job = None
    jobs = store.read(spark, "crawl_jobs")
    if jobs is not None:
        # A failed epoch that is later retried leaves BOTH a 'failed' and a
        # 'completed' row with the same (epoch, job_id) — break the tie
        # deterministically with 'completed' first (asc: completed < failed),
        # so a recovered run reports healthy, never a stale 'degraded'.
        rows = (jobs.orderBy(F.desc("epoch"), F.desc("job_id"),
                             F.asc("status"))
                .limit(1).collect())
        if rows:
            last_job = rows[0].asDict()

    budgets_summary = None
    budgets = store.read(spark, "politeness_budget")
    if budgets is not None:
        agg = budgets.agg(
            F.count("*").alias("n_hosts"),
            F.sum("tokens").alias("tokens_total"),
            F.sum(F.when(F.col("backoff_until_epoch") > last_epoch, 1)
                  .otherwise(0)).alias("n_backed_off")).collect()[0]
        budgets_summary = {k: int(v) for k, v in agg.asDict().items()}

    status = "healthy"
    if snap.commit_id < 0:
        status = "uninitialized"
    elif last_job is not None and last_job.get("status") == "failed":
        status = "degraded"
    return {
        "status": status,
        "snapshot": {"commit_id": snap.commit_id, "last_epoch": last_epoch,
                     "remaining_total": sum(
                         int(v) for v in
                         snap.meta.get("remaining_by_priority", {}).values())},
        "tables": tables,
        "last_job": last_job,
        "budgets": budgets_summary,
        "latest_crawl_ts": latest_crawl_ts(spark, store),
    }


def latest_crawl_ts(spark: SparkSession, store):
    """MAX(fetched_at) over crawl_log via parquet footer column statistics
    (max per row group), falling back to a scan only if stats are absent."""
    import pyarrow.parquet as pq

    best = None
    for p in store.files("crawl_log"):
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx.get("fetched_at")
        if ci is None:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                v = st.max
                best = v if best is None or v > best else best
    if best is not None:
        return best
    log = store.read(spark, "crawl_log")
    if log is None:
        return None
    row = log.agg(F.max("fetched_at").alias("m")).collect()[0]
    return row["m"]
