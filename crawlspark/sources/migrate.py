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
    comments and blanks. Quote-aware: '--' and ';' inside single-quoted
    literals (with '' escaping) or double-quoted identifiers are content,
    not syntax — `INSERT ... VALUES ('a;b -- not a comment')` survives."""
    stmts: list[str] = []
    buf: list[str] = []
    in_str: str | None = None
    i, n = 0, len(sql_text)
    while i < n:
        ch = sql_text[i]
        if in_str:
            buf.append(ch)
            if ch == in_str:
                if in_str == "'" and i + 1 < n and sql_text[i + 1] == "'":
                    buf.append("'")   # doubled-quote escape stays inside
                    i += 2
                    continue
                in_str = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
            i += 1
            continue
        if ch == "-" and sql_text.startswith("--", i):
            nl = sql_text.find("\n", i)
            i = n if nl < 0 else nl   # keep the newline as separator
            continue
        if ch == ";":
            s = "".join(buf).strip()
            if s:
                stmts.append(s)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s:
        stmts.append(s)
    return stmts


def _catalog_objects(spark: SparkSession) -> set[str]:
    """Catalog objects across ALL databases (db-qualified), plus unqualified
    temp views. Enumerating only the current database would make drift
    healing blind to objects a migration created elsewhere."""
    out: set[str] = set()
    for db in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(db.name):
            if t.namespace:  # permanent object: qualify with its database
                out.add(".".join(t.namespace).lower() + "." + t.name.lower())
            else:            # temp view: no namespace, session-global name
                out.add(t.name.lower())
    return out


def _is_idempotent_ddl(stmt: str) -> bool:
    """True for statements safe to re-execute during drift healing: CREATE
    [OR REPLACE] [TABLE|VIEW|...] (the IF NOT EXISTS / OR REPLACE forms are
    no-ops or converge on re-run). DML (INSERT seeds, UPDATE, ...) must NOT
    be healed — replaying it in every new session would duplicate data."""
    head = stmt.lstrip().split(None, 1)[0].upper() if stmt.strip() else ""
    return head == "CREATE"


def run_migrations(spark: SparkSession, store: SnapshotStore,
                   migrations_dir: str) -> list[str]:
    """Execute pending ``.sql`` files in sorted order; returns the filenames
    newly recorded this call. Already-applied files (recorded in snapshot
    meta under ``migrations_applied``) are skipped, so the runner is
    idempotent; the applied list is committed atomically AFTER all pending
    files succeed — a failing statement leaves the recorded schema version
    unchanged.

    Catalog-drift healing: the DDL lands in the (ephemeral) session catalog
    while the applied record is durable, so in a NEW session the two can
    disagree. Each applied file therefore also records the catalog objects
    it created (``migrations_objects`` meta); a recorded file whose objects
    are missing from the current catalog is re-executed (the DDL is
    idempotent CREATE IF NOT EXISTS) WITHOUT being re-recorded — meta stays
    history, the catalog converges."""
    snap = store.snapshot()
    applied = list(snap.meta.get("migrations_applied", []))
    objects = {k: list(v)
               for k, v in snap.meta.get("migrations_objects", {}).items()}
    ran: list[str] = []
    healed = False
    existing = _catalog_objects(spark)
    for fn in sorted(os.listdir(migrations_dir)):
        if not fn.endswith(".sql"):
            continue
        with open(os.path.join(migrations_dir, fn)) as fh:
            stmts = split_statements(fh.read())
        if fn in applied:
            objs = objects.get(fn)
            if objs is None or all(o in existing for o in objs):
                continue   # catalog agrees with the record — skip
            if not all(_is_idempotent_ddl(s) for s in stmts):
                # healing would replay DML (e.g. seed INSERTs) every new
                # session; leave the drift for the operator to resolve
                raise RuntimeError(
                    f"migration {fn!r} was applied but its catalog objects "
                    f"are missing, and the file contains non-CREATE "
                    f"statements that cannot be safely re-executed; "
                    f"recreate the objects manually or split the DML into "
                    f"its own migration")
        for stmt in stmts:
            spark.sql(stmt)
        now = _catalog_objects(spark)
        created = sorted(now - existing)
        existing = now
        if fn in applied:
            healed = True   # re-applied for drift; keep the history row
            objects[fn] = sorted(set(objects.get(fn, [])) | set(created))
        else:
            objects[fn] = created
            ran.append(fn)
    if ran or healed:
        store.commit(epoch=int(snap.meta.get("last_epoch", -1)),
                     meta={**snap.meta,
                           "migrations_applied": applied + ran,
                           "migrations_objects": objects})
    return ran
