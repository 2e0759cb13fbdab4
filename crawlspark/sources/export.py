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


def export_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink with ISO timestamp coercion (database.py:575-601;
    the reference writes a JSON array — JSONL is the distributed-native
    equivalent, one object per row)."""
    out = _stringify_timestamps(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)


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
