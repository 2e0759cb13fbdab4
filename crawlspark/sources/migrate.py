"""DDL / migration executor (S11 in SURVEY.md §2.1).

Reference behavior reproduced: ``.sql`` migration files executed in sorted
filename order (/root/reference/src/infrastructure/database.py:537-544,
driven by main.py:104-114 and use_cases.py:264-280), each applied exactly
once. The reference tracks application implicitly (CREATE TABLE IF NOT
EXISTS); we track it explicitly — applied filenames are recorded in the
snapshot meta, so re-running the runner is idempotent and the schema history
is visible in the commit log (the Iceberg-style answer to a migrations
table).

Statements run through ``spark.sql`` against the session catalog. On a real
cluster with a metastore + Iceberg these are ``CREATE TABLE ... USING
iceberg PARTITIONED BY (bucket(N, host_hash))``; offline the same runner
executes view/table DDL against the in-memory catalog — the runner is
backend-agnostic on purpose.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..tables import SnapshotStore


def split_statements(sql_text: str) -> list[str]:
    """Split a migration file into statements on ';', dropping '--' line
    comments and blanks (the reference feeds whole files to asyncpg, which
    does the same internally)."""
    lines = []
    for line in sql_text.splitlines():
        stripped = line.split("--", 1)[0]
        lines.append(stripped)
    stmts = [s.strip() for s in "\n".join(lines).split(";")]
    return [s for s in stmts if s]


def run_migrations(spark: SparkSession, store: SnapshotStore,
                   migrations_dir: str) -> list[str]:
    """Execute pending ``.sql`` files in sorted order; returns the filenames
    applied this call. Already-applied files (recorded in snapshot meta under
    ``migrations_applied``) are skipped, so the runner is idempotent; the
    applied list is committed atomically AFTER all pending files succeed —
    a failing statement leaves the recorded schema version unchanged."""
    snap = store.snapshot()
    applied = list(snap.meta.get("migrations_applied", []))
    ran: list[str] = []
    for fn in sorted(os.listdir(migrations_dir)):
        if not fn.endswith(".sql") or fn in applied:
            continue
        with open(os.path.join(migrations_dir, fn)) as fh:
            for stmt in split_statements(fh.read()):
                spark.sql(stmt)
        ran.append(fn)
    if ran:
        store.commit(epoch=int(snap.meta.get("last_epoch", -1)),
                     meta={**snap.meta,
                           "migrations_applied": applied + ran})
    return ran
