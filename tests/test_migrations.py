"""S11 DDL/migration executor: sorted order, idempotent re-run, atomic
version recording (ref: database.py:537-544, main.py:104-114)."""

from __future__ import annotations

import os

import pytest

from crawlspark.sources.migrate import run_migrations, split_statements
from crawlspark.tables import SnapshotStore


def test_split_statements_drops_comments():
    sql = """
    -- header comment
    CREATE TEMPORARY VIEW a AS SELECT 1 AS x;  -- trailing
    ;
    CREATE TEMPORARY VIEW b AS SELECT 2 AS x
    """
    stmts = split_statements(sql)
    assert len(stmts) == 2
    assert stmts[0].startswith("CREATE TEMPORARY VIEW a")


def test_run_migrations_sorted_idempotent(spark, tmp_path):
    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "002_second.sql").write_text(
        "CREATE TEMPORARY VIEW mig_b AS SELECT x + 1 AS y FROM mig_a;")
    (mdir / "001_first.sql").write_text(
        "CREATE TEMPORARY VIEW mig_a AS SELECT 41 AS x;")
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})

    ran = run_migrations(spark, store, str(mdir))
    assert ran == ["001_first.sql", "002_second.sql"]  # sorted order
    assert spark.sql("SELECT y FROM mig_b").collect()[0]["y"] == 42

    # idempotent: second run applies nothing, meta unchanged
    assert run_migrations(spark, store, str(mdir)) == []
    assert store.snapshot().meta["migrations_applied"] == [
        "001_first.sql", "002_second.sql"]

    # a later migration lands alone
    (mdir / "003_third.sql").write_text(
        "CREATE TEMPORARY VIEW mig_c AS SELECT 3 AS z;")
    assert run_migrations(spark, store, str(mdir)) == ["003_third.sql"]


def test_run_migrations_failure_records_nothing(spark, tmp_path):
    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_bad.sql").write_text("CREATE SYNTAX ERROR HERE;")
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})
    with pytest.raises(Exception):
        run_migrations(spark, store, str(mdir))
    assert "migrations_applied" not in store.snapshot().meta


def test_shipped_initial_schema_parses(spark, tmp_path):
    """The repo's migrations/001_initial_schema.sql applies cleanly (tables
    land in the session catalog) and records a schema version."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})
    ran = run_migrations(spark, store, os.path.join(repo, "migrations"))
    assert ran == ["001_initial_schema.sql"]
    cols = {f.name for f in spark.table("crawl_jobs").schema.fields}
    assert {"job_id", "status", "error_message"} <= cols
    for t in ("crawl_frontier", "url_seen", "crawl_log", "crawl_jobs",
              "politeness_budget", "robots"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_drift_healing_reexecutes_ddl_only(spark, tmp_path):
    """A recorded migration whose catalog objects vanished (new session) is
    re-executed — but only when every statement is idempotent CREATE DDL."""
    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_view.sql").write_text(
        "CREATE TEMPORARY VIEW mig_heal AS SELECT 7 AS x;")
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})
    assert run_migrations(spark, store, str(mdir)) == ["001_view.sql"]
    assert spark.sql("SELECT x FROM mig_heal").collect()[0]["x"] == 7

    # simulate a new session: the durable record survives, the catalog lost
    # the object
    spark.catalog.dropTempView("mig_heal")
    ran = run_migrations(spark, store, str(mdir))
    assert ran == []  # healed, not re-recorded (meta stays history)
    assert spark.sql("SELECT x FROM mig_heal").collect()[0]["x"] == 7
    assert store.snapshot().meta["migrations_applied"] == ["001_view.sql"]
    spark.catalog.dropTempView("mig_heal")


def test_drift_healing_refuses_dml(spark, tmp_path):
    """A drifted migration containing DML (seed INSERTs) must NOT be silently
    replayed — replaying it every new session would duplicate the seed data."""
    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_seed.sql").write_text(
        "CREATE TABLE IF NOT EXISTS mig_seed_t (x INT) USING parquet;\n"
        "INSERT INTO mig_seed_t VALUES (1);")
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})
    try:
        assert run_migrations(spark, store, str(mdir)) == ["001_seed.sql"]
        n0 = spark.table("mig_seed_t").count()
        assert n0 == 1

        spark.sql("DROP TABLE mig_seed_t")  # drift: object gone, record kept
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="non-CREATE"):
            run_migrations(spark, store, str(mdir))
    finally:
        spark.sql("DROP TABLE IF EXISTS mig_seed_t")


def test_catalog_objects_are_db_qualified(spark, tmp_path):
    """Objects created in another database are recorded db-qualified, so
    cross-db migrations heal against the right namespace."""
    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_otherdb.sql").write_text(
        "CREATE DATABASE IF NOT EXISTS mig_other;\n"
        "CREATE TABLE IF NOT EXISTS mig_other.t1 (x INT) USING parquet;")
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(epoch=-1, meta={"last_epoch": -1})
    try:
        assert run_migrations(spark, store, str(mdir)) == ["001_otherdb.sql"]
        objs = store.snapshot().meta["migrations_objects"]["001_otherdb.sql"]
        assert "mig_other.t1" in objs
    finally:
        spark.sql("DROP TABLE IF EXISTS mig_other.t1")
        spark.sql("DROP DATABASE IF EXISTS mig_other")
