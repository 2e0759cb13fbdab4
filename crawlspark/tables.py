"""Atomic snapshot table store — the offline stand-in for Iceberg.

No Iceberg runtime jars are available in this sandbox (no network), so the
engine's table layer is an explicit snapshot log over parquet files with the
same guarantees the design relies on:

* **atomic multi-table commit** — one epoch's outputs (crawl_log, url_seen,
  retries, metrics, budgets, seen_filter, crawl_jobs) become visible together
  or not at all (the commit is a single ``os.rename`` of a manifest file);
* **snapshot isolation / time travel** — readers resolve a commit id to a
  complete file list per table;
* **resume from last committed snapshot** — a crashed epoch leaves only
  unreferenced staged files, which readers never see (north_rule resumability;
  reference analog: crawl_jobs.last_cursor checkpointing,
  /root/reference/src/application/use_cases.py:68-74,103-117).

On a real cluster this class is swapped for Iceberg ``MERGE INTO`` / snapshot
reads; the engine only uses the four methods below, so the swap is config-only
(SURVEY.md §7 M0).

Commit manifest ``_log/commit-%012d.json``::

    {"commit_id": 3, "epoch": 2, "tables": {"crawl_log": ["crawl_log/ab...parquet", ...]},
     "meta": {...}}

Each manifest carries the **complete** file list of every live table (like an
Iceberg manifest list), so a reader needs exactly one manifest.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Snapshot:
    commit_id: int
    epoch: int
    tables: dict  # name -> list[str] (paths relative to store root)
    meta: dict
    # relpath -> {col: [min, max], "__schema__": sig, "__empty__": bool} —
    # per-file column bounds + schema fingerprint recorded at stage time
    # (Iceberg manifest column stats / schema tracking), used for
    # scan-planning file skips and schema-evolution detection; absence of a
    # file/col entry means "no information" (the file is always read, with
    # the plain first-footer schema), so old manifests stay valid.
    stats: dict = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.stats is None:
            object.__setattr__(self, "stats", {})


_EMPTY = Snapshot(commit_id=-1, epoch=-1, tables={}, meta={})


class CommitConflictError(RuntimeError):
    """A commit planned against a snapshot that is no longer current
    (optimistic-concurrency failure — see SnapshotStore.commit)."""


def _schema_sig(schema) -> str:
    """Short stable fingerprint of a Spark schema (names + types, ordered).
    Two files with the same fingerprint are read-compatible without schema
    merging; distinct fingerprints among a table's live files mean the
    table evolved and the reader must union schemas."""
    import hashlib
    blob = ";".join(f"{f.name}:{f.dataType.simpleString()}"
                    for f in schema.fields)
    return hashlib.md5(blob.encode()).hexdigest()[:12]


def _needs_merge_schema(sigs: "list[str | None]") -> bool:
    """Whether a set of files must be read with mergeSchema, from their
    recorded schema fingerprints (None = pre-feature file, fingerprint
    unknown). {None, sig} is NOT evidence of two schemas — discarding None
    keeps the single-footer fast path for tables with pre-feature files —
    but a lone unknown among known-identical sigs still forces the merge:
    unknown means unknown, not same. All-unknown reverts to the plain read
    (the pre-feature behavior)."""
    known = {s for s in sigs if s is not None}
    return len(known) > 1 or (len(known) == 1 and any(s is None for s in sigs))


def _file_stats(path: str, cols: tuple | list) -> dict:
    """Min/max per requested numeric column from the parquet footer (row
    group statistics — already computed by the writer, so collection is one
    footer read, no data scan). Columns without footer stats are omitted."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if md.num_rows == 0:
        # an empty part file (common under fixed shuffle partitioning on
        # small epochs) can never satisfy any predicate — mark it so pruned
        # reads skip it outright
        return {"__empty__": True}
    idx = {md.schema.column(j).name: j for j in range(md.num_columns)}
    out: dict = {}
    for c in cols:
        j = idx.get(c)
        if j is None:
            continue
        lo = hi = None
        ok = True
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(j).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and isinstance(lo, (int, float)) and isinstance(hi, (int, float)):
            out[c] = [lo, hi]
    return out


class SnapshotStore:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(os.path.join(self.root, "_log"), exist_ok=True)
        # stats collected by stage(stats_cols=...) awaiting their commit;
        # commit() moves entries for files it references into the manifest
        self._pending_stats: dict[str, dict] = {}

    # -- log ----------------------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.root, "_log")

    def _commit_path(self, commit_id: int) -> str:
        return os.path.join(self._log_dir(), f"commit-{commit_id:012d}.json")

    def commits(self) -> list[int]:
        out = []
        for f in os.listdir(self._log_dir()):
            if f.startswith("commit-") and f.endswith(".json"):
                out.append(int(f[len("commit-"):-len(".json")]))
        return sorted(out)

    def snapshot(self, commit_id: int | None = None) -> Snapshot:
        ids = self.commits()
        if not ids:
            return _EMPTY
        cid = ids[-1] if commit_id is None else commit_id
        with open(self._commit_path(cid)) as fh:
            d = json.load(fh)
        return Snapshot(commit_id=d["commit_id"], epoch=d["epoch"],
                        tables=d["tables"], meta=d.get("meta", {}),
                        stats=d.get("stats", {}))

    # -- staging ------------------------------------------------------------

    def stage(self, df: "DataFrame", name: str,
              stats_cols: tuple | list | None = None) -> list[str]:
        """Write a DataFrame's parquet files under the table dir WITHOUT
        registering them. Returns store-relative paths for a later commit.
        Invisible to readers until the commit manifest lands.

        ``stats_cols`` records per-file min/max bounds for those columns in
        the NEXT commit's manifest (read from the parquet footers the writer
        already produced — no extra scan). Readers passing ``where=`` to
        :meth:`read`/:meth:`files` then skip files whose bounds cannot
        match — the Iceberg manifest-stats scan-planning step, which is what
        keeps an epoch-windowed crawl_log query O(window) instead of
        O(history) at 10^5 epochs."""
        tdir = os.path.join(self.root, name)
        os.makedirs(tdir, exist_ok=True)
        tmp = os.path.join(tdir, f".stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        # schema fingerprint per staged file (driver-side, no extra I/O):
        # lets the read path detect schema evolution across a table's live
        # files and union schemas only then (Iceberg tracks schema in table
        # metadata for the same reason — plain parquet read takes the FIRST
        # file's schema and silently drops columns added later)
        sig = _schema_sig(df.schema)
        out = []
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                dst = f"{uuid.uuid4().hex}-{f}"
                os.rename(os.path.join(tmp, f), os.path.join(tdir, dst))
                rel = f"{name}/{dst}"
                out.append(rel)
                entry = self._pending_stats.setdefault(rel, {})
                entry["__schema__"] = sig
                if stats_cols:
                    entry.update(
                        _file_stats(os.path.join(tdir, dst), stats_cols))
        # best-effort cleanup of _SUCCESS etc.
        for f in os.listdir(tmp):
            os.remove(os.path.join(tmp, f))
        os.rmdir(tmp)
        return out

    def stage_pandas(self, pdf, name: str, schema=None) -> list[str]:
        """Stage a pandas DataFrame directly via pyarrow (driver-side small
        tables: budgets, seen_filter buckets, crawl_jobs rows)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tdir = os.path.join(self.root, name)
        os.makedirs(tdir, exist_ok=True)
        dst = f"{uuid.uuid4().hex}-part-0.parquet"
        table = (pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
                 if schema is not None
                 else pa.Table.from_pandas(pdf, preserve_index=False))
        pq.write_table(table, os.path.join(tdir, dst))
        return [f"{name}/{dst}"]

    # -- commit -------------------------------------------------------------

    def commit(self, epoch: int, appends: dict | None = None,
               replaces: dict | None = None, meta: dict | None = None,
               require_base: int | None = None) -> Snapshot:
        """Atomically publish staged files. ``appends[name]`` extends the
        table's file list; ``replaces[name]`` swaps it wholesale (small state
        tables: politeness budgets). One rename = all-or-nothing.

        ``require_base`` is optimistic concurrency (the Iceberg
        base-snapshot validation): when set, the commit refuses to land if
        the store's current commit_id no longer equals it — i.e. someone
        committed between this writer's planning snapshot and now. Wholesale
        REPLACE+meta writers (maintenance that rewrites a whole table or a
        meta map from a planning snapshot, e.g. compact_frontier_strata)
        must pass it: without the check a concurrent append/commit's rows
        and meta advances would be silently clobbered by the stale plan
        (r6, ADVICE item 1)."""
        cur = self.snapshot()
        if require_base is not None and cur.commit_id != require_base:
            raise CommitConflictError(
                f"commit planned against snapshot {require_base} but the "
                f"store is now at {cur.commit_id}; replan from the current "
                "snapshot (a concurrent commit landed in between)")
        tables = {k: list(v) for k, v in cur.tables.items()}
        for name, files in (appends or {}).items():
            tables.setdefault(name, [])
            tables[name] = tables[name] + list(files)
        for name, files in (replaces or {}).items():
            tables[name] = list(files)
        # stats lifecycle follows the file list: carry forward bounds of
        # files still live, adopt pending bounds of newly referenced files,
        # drop bounds of files replaced away
        live = {f for fs in tables.values() for f in fs}
        stats = {f: v for f, v in cur.stats.items() if f in live}
        for f in list(self._pending_stats):
            if f in live:
                stats[f] = self._pending_stats.pop(f)
            elif not os.path.exists(os.path.join(self.root, f)):
                # staged file vanished without ever being referenced (vacuumed
                # orphan / external delete) — its bounds can never be adopted,
                # so keeping the entry is a slow driver-memory leak
                del self._pending_stats[f]
        cid = cur.commit_id + 1
        payload = {"commit_id": cid, "epoch": epoch, "tables": tables,
                   "meta": meta or {}, "stats": stats}
        tmp = os.path.join(self._log_dir(), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = self._commit_path(cid)
        if os.path.exists(final):  # concurrent committer lost the race
            os.remove(tmp)
            raise RuntimeError(f"commit {cid} already exists")
        os.rename(tmp, final)
        return Snapshot(commit_id=cid, epoch=epoch, tables=tables,
                        meta=meta or {}, stats=stats)

    # -- maintenance --------------------------------------------------------

    def compact(self, spark: "SparkSession", name: str,
                target_files: int = 1,
                sort_cols: list[str] | None = None,
                small_file_bytes: int | None = None) -> int:
        """Small-file compaction — the Iceberg ``rewrite_data_files`` analog.
        An append-per-epoch table accumulates one file set per commit (a
        10^5-epoch crawl would put 10^5 files behind every scan); compaction
        rewrites files into ``target_files`` files (optionally clustered by
        ``sort_cols``, e.g. host_hash for per-host locality) and commits the
        swap as a normal REPLACE. Snapshot isolation makes it safe under
        concurrent readers: old manifests still reference the old files,
        which stay on disk until :meth:`vacuum`.

        With ``small_file_bytes`` set, compaction is INCREMENTAL (Iceberg's
        bin-pack): only files smaller than the threshold are absorbed;
        already-compacted large files keep their exact paths and are never
        re-read or rewritten. That keeps per-epoch maintenance O(new small
        files) instead of O(table) — the difference between a bounded
        maintenance job and rewriting a 100 TB crawl_log every few epochs.
        ``small_file_bytes=None`` rewrites the whole table (one-off
        re-clustering). Returns the number of files compacted away
        (0 = nothing to do)."""
        snap = self.snapshot()
        rels = snap.tables.get(name, [])
        if small_file_bytes is None:
            absorb, keep = list(rels), []
        else:
            absorb, keep = [], []
            for r in rels:
                size = os.path.getsize(os.path.join(self.root, r))
                (absorb if size < small_file_bytes else keep).append(r)
        if len(absorb) <= target_files:
            return 0
        # guard: a file whose path is tracked in snapshot meta (the
        # stratum-pruned frontier) cannot be absorbed — the meta reference
        # would dangle and a later vacuum would delete the file it points at
        meta_blob = json.dumps(snap.meta)
        if any(rel in meta_blob for rel in absorb):
            raise ValueError(
                f"table {name!r} has file paths referenced in snapshot meta "
                "(file-level partition pruning); compact it per partition, "
                "not wholesale")
        raw_sigs = [snap.stats.get(r, {}).get("__schema__") for r in absorb]
        reader = (spark.read.option("mergeSchema", "true")
                  if _needs_merge_schema(raw_sigs) else spark.read)
        df = reader.parquet(*[os.path.join(self.root, r) for r in absorb])
        df = df.repartition(target_files)
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        # keep tracking whatever bounds the absorbed files carried, so
        # compaction never silently disables manifest-stats pruning
        tracked = sorted({c for r in absorb
                          for c in snap.stats.get(r, {})
                          if not c.startswith("__")})
        staged = self.stage(df, name, stats_cols=tracked or None)
        self.commit(epoch=snap.epoch, replaces={name: keep + staged},
                    meta=snap.meta)
        return len(absorb)

    def compact_bucketed(self, spark: "SparkSession", name: str,
                         key: str | None = None,
                         n_buckets: int | None = None) -> int:
        """Re-bucket maintenance for a key-hash-bucketed table (the map
        :func:`merge_into` and :func:`crawlspark.operators.recrawl.forget_urls`
        scope their rewrites by): absorb files appended since the last
        bucketing ("loose" files — e.g. the epoch loop's per-epoch url_seen
        appends) into their buckets' file-sets. INCREMENTAL: only buckets
        that actually receive loose rows are rewritten; every other bucket
        keeps its exact files. The first call performs the one-time full
        bucketing. Cost is O(loose rows + touched buckets), never O(table) —
        the property that makes per-epoch maintenance viable at 10^10 rows.
        On Iceberg this is ``rewrite_data_files`` on a bucket-partitioned
        table. Returns the number of loose files absorbed."""
        from pyspark.sql import functions as F

        snap = self.snapshot()
        bucket_map, loose = bucket_state(snap, name)
        rels = snap.tables.get(name, [])
        spec = snap.meta.get("bucket_spec", {}).get(name)
        if key is None or n_buckets is None:
            if spec is None and rels:
                raise ValueError(
                    f"table {name!r} has no recorded bucket_spec; pass "
                    "key/n_buckets for the initial bucketing")
            if spec is not None:
                key, n_buckets = spec["key"], int(spec["n"])
        elif spec is not None and (spec["key"] != key
                                   or int(spec["n"]) != int(n_buckets)):
            raise ValueError(
                f"table {name!r} is bucketed as {spec}; re-bucketing with "
                "different params requires a fresh full bucketing (drop the "
                "spec first)")
        if not rels or (bucket_map is not None and not loose):
            return 0
        bucket_of = F.pmod(F.xxhash64(F.col(key)),
                           F.lit(n_buckets)).cast("int")
        if bucket_map is None:
            slice_df = self.read(spark, name)
            old_map: dict = {}
            absorbed = list(rels)
        else:
            # schema evolution: loose appends may carry a newer schema than
            # the bucketed files — union by name with nulls for columns a
            # side lacks, the same semantics as read()'s mergeSchema path
            evolved = self.needs_merge(name)
            reader = (spark.read.option("mergeSchema", "true")
                      if evolved else spark.read)
            loose_df = reader.parquet(
                *[os.path.join(self.root, f) for f in loose])
            touched = sorted(int(r["_b"]) for r in
                             loose_df.select(bucket_of.alias("_b"))
                             .distinct().collect())
            tfiles = [os.path.join(self.root, f)
                      for b in touched for f in bucket_map.get(str(b), [])]
            slice_df = (loose_df.unionByName(
                            reader.parquet(*tfiles),
                            allowMissingColumns=evolved)
                        if tfiles else loose_df)
            old_map = {k: list(v) for k, v in bucket_map.items()}
            absorbed = loose
        slice_df = slice_df.persist()
        present = sorted(int(r["_b"]) for r in
                         slice_df.select(bucket_of.alias("_b")).distinct()
                         .collect())
        tracked = sorted({c for r in rels
                          for c in snap.stats.get(r, {})
                          if not c.startswith("__")}) or None
        new_map = dict(old_map)
        for b in present:
            new_map[str(b)] = self.stage(
                slice_df.filter(bucket_of == b), name, stats_cols=tracked)
        slice_df.unpersist()
        files = [f for b in sorted(new_map, key=int) for f in new_map[b]]
        all_buckets: dict = snap.meta.get("merge_buckets", {})
        specs: dict = snap.meta.get("bucket_spec", {})
        self.commit(epoch=snap.epoch, replaces={name: files},
                    meta={**snap.meta,
                          "merge_buckets": {**all_buckets, name: new_map},
                          "bucket_spec": {**specs,
                                          name: {"key": key,
                                                 "n": int(n_buckets)}}})
        return len(absorbed)

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete data files not referenced by any of the last ``keep_last``
        commit manifests, plus the older manifests themselves — the Iceberg
        ``expire_snapshots`` analog. Time travel keeps working across the
        retained commits; anything older is gone. Also reclaims orphans from
        crashed epochs (staged files whose commit never landed). Single
        writer only: never run concurrently with an in-flight stage+commit,
        whose not-yet-referenced files would look like orphans. Returns the
        deleted store-relative paths."""
        ids = self.commits()
        if not ids:
            return []
        keep_ids = ids[-max(1, keep_last):]
        live: set[str] = set()
        for cid in keep_ids:
            for files in self.snapshot(cid).tables.values():
                live.update(files)
        deleted: list[str] = []
        for entry in sorted(os.listdir(self.root)):
            tdir = os.path.join(self.root, entry)
            if entry == "_log" or not os.path.isdir(tdir):
                continue
            for f in sorted(os.listdir(tdir)):
                rel = f"{entry}/{f}"
                path = os.path.join(tdir, f)
                if f.startswith(".stage-") and os.path.isdir(path):
                    # a crash during stage() before the rename loop leaves
                    # the whole temp dir behind; its files are by definition
                    # unreferenced (paths are only recorded after rename)
                    import shutil
                    shutil.rmtree(path)
                    deleted.append(rel)
                elif rel not in live and f.endswith(".parquet"):
                    os.remove(path)
                    deleted.append(rel)
        for cid in ids:
            if cid not in keep_ids:
                os.remove(self._commit_path(cid))
        # pending-stats entries follow their files: a staged-but-never-
        # committed file just reclaimed above (or removed by any earlier
        # means) must not leave its bounds entry behind, or a long-lived
        # store instance leaks driver memory one orphan at a time
        for rel in list(self._pending_stats):
            if not os.path.exists(os.path.join(self.root, rel)):
                del self._pending_stats[rel]
        return deleted

    # -- read ---------------------------------------------------------------

    def files(self, name: str, commit_id: int | None = None,
              where: tuple | None = None) -> list[str]:
        """Table file list at a snapshot. ``where=(col, lo, hi)`` (either
        bound may be None) drops files whose recorded [min, max] bounds for
        ``col`` cannot intersect the interval — manifest-stats scan
        planning. Files without recorded bounds are always kept, so the
        prune is purely an optimization: the caller still applies the same
        predicate row-wise and gets identical results with or without it."""
        snap = self.snapshot(commit_id)
        rels = snap.tables.get(name, [])
        if where is not None:
            col, lo, hi = where
            kept = []
            for r in rels:
                st = snap.stats.get(r, {})
                if st.get("__empty__"):
                    continue
                b = st.get(col)
                if b is not None and ((hi is not None and b[0] > hi)
                                      or (lo is not None and b[1] < lo)):
                    continue
                kept.append(r)
            rels = kept
        return [os.path.join(self.root, f) for f in rels]

    def needs_merge(self, name: str, commit_id: int | None = None) -> bool:
        """Whether reads of this table's live files must union schemas —
        the SAME decision rule as compact()'s (``_needs_merge_schema`` over
        the raw per-file fingerprints, None for pre-feature files), exposed
        so every read/rewrite path agrees about evolution. Before r6 the
        read paths gated on ``schema_variants() > 1`` (known sigs only),
        so a pre-feature file with an evolved schema was plain-read
        (columns silently dropped) yet merge-read by compact() —
        inconsistent results for the same file set (ADVICE item 2)."""
        snap = self.snapshot(commit_id)
        sigs = [snap.stats.get(r, {}).get("__schema__")
                for r in snap.tables.get(name, [])]
        return _needs_merge_schema(sigs)

    def schema_variants(self, name: str,
                        commit_id: int | None = None) -> int:
        """Number of distinct schema fingerprints among a table's live
        files (recorded at stage time). 0 = no fingerprints (pre-feature
        files only), 1 = homogeneous, >1 = the table's schema evolved and
        reads must union schemas."""
        snap = self.snapshot(commit_id)
        sigs = set()
        for r in snap.tables.get(name, []):
            st = snap.stats.get(r)
            if st and "__schema__" in st:
                sigs.add(st["__schema__"])
        return len(sigs)

    def read(self, spark: "SparkSession", name: str,
             commit_id: int | None = None,
             where: tuple | None = None) -> "DataFrame | None":
        """Read a table at a snapshot; None if no files survive. ``where``
        skips files by manifest bounds (see :meth:`files`) — the caller must
        still filter rows (kept files may hold out-of-range rows too).

        Schema evolution: when the live files carry >1 recorded schema
        fingerprint the read unions schemas (``mergeSchema`` — columns
        added later read as null in older files, Iceberg's add/drop-column
        semantics); a homogeneous table keeps the plain single-footer read,
        so evolution support costs nothing until a table actually evolves."""
        fs = self.files(name, commit_id, where=where)
        if not fs:
            return None
        if self.needs_merge(name, commit_id):
            return spark.read.option("mergeSchema", "true").parquet(*fs)
        return spark.read.parquet(*fs)


def bucket_state(snap: Snapshot, name: str) -> tuple[dict | None, list[str]]:
    """(bucket_map, loose_files) for a table: the per-bucket file-sets
    recorded in snapshot meta ``merge_buckets[name]`` (None if the table
    was never bucketed) plus any files appended since the map was last
    written — the epoch loop appends url_seen rows without re-bucketing,
    so every scoped reader/writer must treat those "loose" files as
    touching EVERY bucket until :meth:`SnapshotStore.compact_bucketed`
    absorbs them."""
    m = snap.meta.get("merge_buckets", {}).get(name)
    files = snap.tables.get(name, [])
    if m is None:
        return None, list(files)
    mapped = {f for fs in m.values() for f in fs}
    return m, [f for f in files if f not in mapped]


def dedup_updates(updates: "DataFrame", key: str,
                  newer_col: str | None = None) -> "DataFrame":
    """One winner per key within an updates batch (newest when ordered,
    arbitrary-first otherwise) — a map-side partial aggregation, same shape
    as operators.dedup.supersede. This is the MERGE skew story at 100 TB: a
    hot key holding half the update batch collapses to ONE candidate per map
    partition BEFORE the shuffle (partial_max_by), so the reduce side of the
    dedup receives at most n_map_partitions rows for the hot key and the
    downstream anti-join runs on already-unique keys (no skewed side left
    for AQE to split, though AQE skew-join remains on as the backstop).
    Asserted in tests/test_merge_skew.py."""
    from pyspark.sql import functions as F

    if newer_col is not None:
        cols = updates.columns
        return (updates.groupBy(key)
                .agg(F.max_by(F.struct(*cols), F.col(newer_col))
                     .alias("_w"))
                .select("_w.*"))
    return updates.dropDuplicates([key])


def merge_into(spark: "SparkSession", store: SnapshotStore, name: str,
               updates: "DataFrame", key: str,
               newer_col: str | None = None,
               n_buckets: int | None = None) -> None:
    """S7 batch upsert: ``MERGE INTO <name> USING updates ON t.key = s.key
    WHEN MATCHED [AND t.newer_col < s.newer_col] THEN UPDATE *
    WHEN NOT MATCHED THEN INSERT *`` — the reference's staging+ON CONFLICT
    merge (/root/reference/src/infrastructure/database.py:174-271; the
    conditional form is the newer-wins merge, SCHEMA_EVOLUTION.md:94-110).

    Emulated on the parquet snapshot backend as: (updates that win) UNION
    (target rows not superseded), committed as an atomic table replace. On
    Iceberg this function is one ``MERGE INTO`` statement; the join below is
    the exact distributed plan Iceberg would run (shuffle on the key, AQE
    skew-safe), so the emulation carries the same scale shape.

    ``n_buckets`` makes the merge PARTITION-SCOPED (the Iceberg
    bucket-partitioned MERGE): the table is maintained as ``pmod(
    xxhash64(key), n_buckets)`` bucket file-sets (mapping recorded in
    snapshot meta ``merge_buckets``), and a merge rewrites ONLY buckets
    containing updated keys — untouched buckets keep their exact files. At
    100 TB that is the difference between rewriting the whole table per
    merge batch and rewriting a few buckets. The first bucketed merge on an
    existing unbucketed table performs the one-time full bucketing rewrite;
    thereafter every merge is scoped. Both the matched-row check and the
    anti-join read only the touched buckets' files (the bucket is a pure
    function of the key, so matches cannot live elsewhere)."""
    from pyspark.sql import functions as F

    updates = dedup_updates(updates, key, newer_col)
    snap = store.snapshot()

    def drop_stale(updates, target):
        """Drop updates NOT newer than their matched target row. The target
        version is max(newer_col) per key — one row per key reaches the
        join (partial-agg map-side), so the check stays well-defined even
        if a transient duplicate key exists (contract: appends never
        duplicate a merged table's keys; merges are the mutation path)."""
        t_keyed = (target.groupBy(key)
                   .agg(F.max(newer_col).alias("_t_newer")))
        return (updates.join(t_keyed, key, "left")
                .filter(F.col("_t_newer").isNull()
                        | (F.col(newer_col) > F.col("_t_newer")))
                .drop("_t_newer"))

    if n_buckets is None:
        target = store.read(spark, name)
        if target is not None and newer_col is not None:
            updates = drop_stale(updates, target)
        if target is None:
            merged = updates
        else:
            kept = target.join(updates.select(key), key, "left_anti")
            merged = kept.unionByName(updates)
        store.commit(epoch=int(snap.meta.get("last_epoch", -1)),
                     replaces={name: store.stage(merged, name)},
                     meta=snap.meta)
        return

    bucket_of = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    all_buckets: dict = snap.meta.get("merge_buckets", {})
    bucket_files, loose = bucket_state(snap, name)

    if bucket_files is None:
        # first bucketed merge: one-time full bucketing rewrite (merge via
        # the plain path semantics, then split the result by bucket)
        target = store.read(spark, name)
        if target is not None and newer_col is not None:
            updates = drop_stale(updates, target)
        merged = updates if target is None else (
            target.join(updates.select(key), key, "left_anti")
            .unionByName(updates))
        merged = merged.persist()
        present = sorted(int(r["_b"]) for r in
                         merged.select(bucket_of.alias("_b")).distinct()
                         .collect())
        new_map: dict = {}
        files: list[str] = []
        for b in present:
            fs = store.stage(merged.filter(bucket_of == b), name)
            new_map[str(b)] = fs
            files.extend(fs)
        merged.unpersist()
    else:
        # scoped path: updates touch a known set of buckets; read, merge and
        # rewrite only those — plus any loose files appended since the last
        # bucketing (they can hold ANY bucket's keys, so the matched-row
        # check must see them and their rows get re-homed into buckets here)
        updates = updates.persist()
        touched = sorted(int(r["_b"]) for r in
                         updates.select(bucket_of.alias("_b")).distinct()
                         .collect())
        tfiles = [os.path.join(store.root, f)
                  for b in touched for f in bucket_files.get(str(b), [])]
        tfiles += [os.path.join(store.root, f) for f in loose]
        target_t = spark.read.parquet(*tfiles) if tfiles else None
        if target_t is not None and newer_col is not None:
            updates = drop_stale(updates, target_t)
        merged = updates if target_t is None else (
            target_t.join(updates.select(key), key, "left_anti")
            .unionByName(updates))
        merged = merged.persist()
        # rewrite: the updates' buckets, plus buckets whose rows were
        # sitting in loose files (they must land somewhere bucketed).
        # Touched buckets REPLACE their file-set (their mapped files were
        # fully read into the slice); untouched buckets only had loose rows
        # in the slice, so the re-homed rows APPEND to their existing set.
        write_buckets = (sorted(set(touched) | {
            int(r["_b"]) for r in merged.select(bucket_of.alias("_b"))
            .distinct().collect()}) if loose else touched)
        new_map = {k: list(v) for k, v in bucket_files.items()}
        for b in write_buckets:
            staged = store.stage(merged.filter(bucket_of == b), name)
            if b in touched:
                new_map[str(b)] = staged
            else:
                new_map[str(b)] = new_map.get(str(b), []) + staged
        merged.unpersist()
        updates.unpersist()
        files = [f for b in sorted(new_map, key=int) for f in new_map[b]]

    specs: dict = snap.meta.get("bucket_spec", {})
    store.commit(epoch=int(snap.meta.get("last_epoch", -1)),
                 replaces={name: files},
                 meta={**snap.meta,
                       "merge_buckets": {**all_buckets, name: new_map},
                       "bucket_spec": {**specs,
                                       name: {"key": key,
                                              "n": int(n_buckets)}}})


def upsert_row(spark: "SparkSession", store: SnapshotStore, name: str,
               row: dict, key: str, newer_col: str | None = None) -> None:
    """S8 single-row upsert convenience — the degenerate one-row batch
    through :func:`merge_into` (ref: single ON CONFLICT DO UPDATE,
    database.py:120-172). Schema follows the existing table when present."""
    target = store.read(spark, name)
    if target is not None:
        updates = spark.createDataFrame([row], schema=target.schema)
    else:
        updates = spark.createDataFrame([row])
    merge_into(spark, store, name, updates, key, newer_col=newer_col)
