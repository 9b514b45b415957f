"""LogTable: a minimal transaction-log table format (Delta/Iceberg shape).

Where ``KeyedTable`` versions whole-table SNAPSHOTS by path, LogTable
versions the FILE SET: every commit is one JSON entry in an ordered log
(`_log/{version:08d}.json`) listing file actions
(``{"add": {"path", "num_records"}}`` / ``{"remove": {"path"}}``), and a
snapshot at version V is "replay the log through V, read the live files".
That is the core lakehouse mechanic — append = add-files commit,
compaction/delete = remove+add commit, time travel = shorter replay,
snapshot isolation = readers pin a version while writers append — scaled
down to what plain parquet + JSON can express. On a real deployment this
class collapses onto Delta/Iceberg and the call sites keep their shape.

Scale notes: the log is metadata (bytes per commit, never data); replay
cost is O(commits since the newest checkpoint) — ``checkpoint()`` writes
the consolidated live state the way lakehouse formats do past ~10
commits, and readers replay from it. Data files are immutable once
written — remove actions only drop them from the live set, enabling
time travel. Commits are put-if-absent (concurrent writers cannot
clobber each other) and schema changes are commit-level metadata
(``append(evolve_schema=True)``), reconciled at read time.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConcurrentCommitError(RuntimeError):
    """Two writers raced for the same log version; the loser gets this."""


class LogTable:
    def __init__(self, spark: SparkSession, base_path: str) -> None:
        self.spark = spark
        self.base = base_path
        self.log_dir = os.path.join(base_path, "_log")
        # rows removed by the most recent delete_where on this handle
        # (counted inside the probe job — see delete_where)
        self.last_delete_count = 0
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(os.path.join(base_path, "data"), exist_ok=True)

    # -- log plumbing ------------------------------------------------------
    def _versions(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def _checkpoints(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.json")
        )

    def _read_log(self, upto: int | None = None) -> list[dict]:
        """Actions through ``upto`` — replay starts from the newest
        CHECKPOINT at or below it (the consolidated state is a valid
        action prefix), so replay cost is O(commits since checkpoint),
        not O(all commits): the Delta/Iceberg checkpoint mechanic."""
        cps = [
            c for c in self._checkpoints() if upto is None or c <= upto
        ]
        actions: list[dict] = []
        start = -1
        if cps:
            start = cps[-1]
            with open(
                os.path.join(self.log_dir, f"{start:08d}.checkpoint.json")
            ) as f:
                actions = [json.loads(line) for line in f]
        for v in self._versions():
            if v <= start:
                continue
            if upto is not None and v > upto:
                break
            with open(os.path.join(self.log_dir, f"{v:08d}.json")) as f:
                actions.extend(json.loads(line) for line in f)
        return actions

    def checkpoint(self) -> int:
        """Write a consolidated checkpoint at the current latest version:
        the live add-actions plus the current schema, in one file.
        Readers replay from it instead of the full history; older commit
        files stay untouched (time travel below the checkpoint still
        replays them). Idempotent and race-safe (put-if-absent link —
        a concurrent identical checkpoint is simply kept)."""
        versions = self._versions()
        if not versions:
            raise ValueError("cannot checkpoint an empty log")
        v = versions[-1]
        live: dict[str, dict] = {}
        schema = None
        txns: dict[str, int] = {}
        for a in self._read_log(v):
            if "add" in a:
                live[a["add"]["path"]] = a
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
            elif "metaData" in a:
                schema = a
            elif "txn" in a:
                # idempotence watermarks survive consolidation (Delta
                # checkpoints carry txn actions too) — dropping them
                # would let a replayed batch duplicate after checkpoint
                txns[a["txn"]["appId"]] = max(
                    txns.get(a["txn"]["appId"], -1), int(a["txn"]["version"])
                )
        consolidated = [live[p] for p in sorted(live)]
        if schema is not None:
            consolidated.append(schema)
        consolidated.extend(
            {"txn": {"appId": app, "version": ver}}
            for app, ver in sorted(txns.items())
        )
        tmp = os.path.join(self.log_dir, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.writelines(json.dumps(a) + "\n" for a in consolidated)
        final = os.path.join(self.log_dir, f"{v:08d}.checkpoint.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            pass  # an identical checkpoint already exists — idempotent
        finally:
            os.unlink(tmp)
        return v

    def _commit(self, actions: list[dict], *, retries: int = 0) -> int:
        """Put-if-absent commit. ``os.link`` (hard link) fails with EEXIST
        when the destination version file already exists, so two writers
        racing for the same version cannot clobber each other (the POSIX
        analogue of an object store's if-none-match put). Blind appends
        commute, so callers that only ADD files may pass ``retries`` to
        re-attempt at the next version; read-modify-write commits
        (compact, schema change) must surface the conflict instead."""
        tmp = os.path.join(self.log_dir, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.writelines(json.dumps(a) + "\n" for a in actions)
        try:
            for attempt in range(retries + 1):
                version = (self._versions() or [-1])[-1] + 1
                final = os.path.join(self.log_dir, f"{version:08d}.json")
                try:
                    os.link(tmp, final)
                    return version
                except FileExistsError:
                    if attempt == retries:
                        raise ConcurrentCommitError(
                            f"version {version} was committed by another writer"
                        ) from None
        finally:
            os.unlink(tmp)
        raise AssertionError("unreachable")

    def schema_at(self, version: int | None = None) -> T.StructType | None:
        """The table schema as of ``version``: replay the log and keep the
        LAST ``metaData`` action (the lakehouse rule — schema is
        commit-versioned metadata, not inferred from data files)."""
        schema = None
        for a in self._read_log(version):
            if "metaData" in a:
                schema = T.StructType.fromJson(a["metaData"]["schema"])
        return schema

    def live_files(self, version: int | None = None) -> list[str]:
        live: dict[str, dict] = {}
        for a in self._read_log(version):
            if "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
        return sorted(live)

    def live_adds(self, version: int | None = None) -> list[dict]:
        """Live ``add`` actions (with any file stats), path-sorted."""
        live: dict[str, dict] = {}
        for a in self._read_log(version):
            if "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
        return [live[p] for p in sorted(live)]

    def last_txn_version(self, app_id: str) -> int:
        """Highest ``txn`` action version recorded for ``app_id`` (-1 if
        none) — the Delta idempotent-writer handshake: a streaming sink
        records (appId, batchId) IN the data commit, and on retry/replay
        skips any batch at or below this watermark. Exactly-once without
        trusting the engine checkpoint to be in lock-step with the sink."""
        v = -1
        for a in self._read_log():
            if "txn" in a and a["txn"]["appId"] == app_id:
                v = max(v, int(a["txn"]["version"]))
        return v

    # -- table operations --------------------------------------------------
    @staticmethod
    def _stats_value(v):
        """JSON-safe, order-preserving encoding for file stats: datetimes
        → ISO-8601 strings (lexicographic order == time order), numbers
        pass through."""
        import datetime

        if isinstance(v, datetime.datetime):
            return v.isoformat(sep=" ")
        if isinstance(v, datetime.date):
            # datetime.date.isoformat() takes no arguments
            return v.isoformat()
        return v

    def _write_files(
        self, df: DataFrame, n_files: int, stats_col: str | None = None
    ) -> list[dict]:
        sub = uuid.uuid4().hex
        out = os.path.join(self.base, "data", sub)
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        stats: dict[str, tuple] = {}
        if stats_col is not None:
            # per-file min/max of the skipping column — the write-time
            # stats collection every lakehouse format does; one
            # footer-cheap scan of the files just written
            rows = (
                self.spark.read.parquet(out)
                .groupBy(F.col("_metadata.file_name").alias("fn"))
                .agg(
                    F.min(stats_col).alias("mn"), F.max(stats_col).alias("mx")
                )
                .collect()
            )
            stats = {r["fn"]: (r["mn"], r["mx"]) for r in rows}
        actions = []
        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            add = {"path": os.path.join("data", sub, f), "num_records": None}
            if f in stats:
                add["stats"] = {
                    "col": stats_col,
                    "min": self._stats_value(stats[f][0]),
                    "max": self._stats_value(stats[f][1]),
                }
            actions.append({"add": add})
        return actions

    def scan_where(self, col: str, lo, hi):
        """Stats-based DATA SKIPPING: read only live files whose committed
        [min, max] range for ``col`` intersects [lo, hi] (files without
        stats for ``col`` are conservatively scanned). Returns
        ``(DataFrame, n_files_scanned, n_files_total)`` — the snapshot
        filtered to the predicate, plus the skip accounting a table
        OPTIMIZE report shows. ``lo``/``hi`` must be in the stats
        domain (ISO strings for timestamps)."""
        lo, hi = self._stats_value(lo), self._stats_value(hi)
        adds = self.live_adds()
        keep = []
        for a in adds:
            st = a.get("stats")
            # None min/max (all-NULL stats column in that file) means the
            # stats carry no range information — conservatively scan.
            if (
                st is not None
                and st["col"] == col
                and st["min"] is not None
                and st["max"] is not None
                and (st["max"] < lo or st["min"] > hi)
            ):
                continue
            keep.append(a["path"])
        df = self._read_reconciled(keep).drop("_metadata") if keep else None
        if df is None:
            df = self.snapshot().limit(0)
        c = F.col(col)
        if dict(df.dtypes).get(col) == "timestamp":
            df = df.filter(
                (c >= F.lit(lo).cast("timestamp"))
                & (c <= F.lit(hi).cast("timestamp"))
            )
        else:
            df = df.filter((c >= F.lit(lo)) & (c <= F.lit(hi)))
        return df, len(keep), len(adds)

    def append(
        self,
        df: DataFrame,
        n_files: int = 1,
        *,
        evolve_schema: bool = False,
        stats_col: str | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Blind append: write data files, commit their add actions.

        Schema is ENFORCED against the last committed ``metaData`` action
        (Delta-style): a mismatched frame raises unless ``evolve_schema``,
        in which case the commit also logs the merged schema (existing
        fields in order, new fields appended) and readers at-or-after this
        version reconcile old files to it (missing columns read as NULL).
        Blind appends commute, so the commit retries past concurrent
        writers; schema-changing commits are read-modify-write and
        surface ``ConcurrentCommitError`` instead.
        """
        if txn is not None and int(txn[1]) <= self.last_txn_version(txn[0]):
            # idempotent replay: this (appId, version) already committed —
            # the Delta txn-action dedup that makes foreachBatch sinks
            # exactly-once even when the engine checkpoint lags the sink
            return -1
        actions = self._write_files(df, n_files, stats_col=stats_col)
        if txn is not None:
            actions.append(
                {"txn": {"appId": txn[0], "version": int(txn[1])}}
            )
        current = self.schema_at()
        if current is None:
            # the FIRST append sets the table schema — that makes it a
            # read-modify-write commit, not a blind append: two initial
            # writers racing with retries would silently clobber each
            # other's schema (the loser's files would then reconcile to
            # the winner's columns as all-NULL). Surface the conflict.
            actions.append({"metaData": {"schema": df.schema.jsonValue()}})
            return self._commit(actions)
        # order-INSENSITIVE schema match: the parquet files carry their own
        # column order and every read goes through _read_reconciled, which
        # conforms by NAME to the committed schema — so a frame with the
        # same (name, type) set in a different order is a blind append,
        # not a schema change (previously it raised / logged a redundant
        # metaData action)
        if {f.name: f.dataType for f in df.schema} == {
            f.name: f.dataType for f in current
        }:
            return self._commit(actions, retries=4)
        if not evolve_schema:
            raise ValueError(
                f"schema mismatch: table has {current.simpleString()}, "
                f"append has {df.schema.simpleString()} "
                "(pass evolve_schema=True to merge)"
            )
        by_name = {f.name: f for f in df.schema}
        for f in current:
            if f.name in by_name and by_name[f.name].dataType != f.dataType:
                raise ValueError(
                    f"cannot evolve column {f.name}: "
                    f"{f.dataType} -> {by_name[f.name].dataType}"
                )
        merged = T.StructType(
            list(current)
            + [f for f in df.schema if f.name not in {c.name for c in current}]
        )
        if merged == current:
            # evolve requested but nothing to evolve (e.g. the frame is a
            # column SUBSET of the table): still a blind append — do not
            # burn a metaData action on an unchanged schema
            return self._commit(actions, retries=4)
        actions.append({"metaData": {"schema": merged.jsonValue()}})
        return self._commit(actions)

    def delete_where(self, predicate_sql: str) -> int:
        """Row-level DELETE as one copy-on-write commit: files containing
        matching rows are rewritten without them (remove + add in a
        single commit); untouched files stay as-is, and time travel
        below the commit still sees the deleted rows. This is the
        Delta/Iceberg COW delete; a deletion-vector variant would add a
        per-file mask action instead of rewriting. Returns the commit
        version.

        Scale: only AFFECTED files rewrite — the per-file match probe
        and the rewrite both run as Spark jobs over the file subset,
        never the whole table.
        """
        live = self.live_files()
        if not live:
            raise ValueError("LogTable has no committed data")
        # ONE probe job over all live files: the hidden _metadata column
        # yields each matching row's source file, so the affected-file
        # set is a tiny distinct-collect instead of a per-file job loop
        # (measured 4 files -> 1 job, ~5x faster at fixture scale; at
        # production scale this is also where file-level min/max stats
        # would prune most files before any row is read). The same job
        # counts the matches per file — COW removes exactly the
        # predicate-TRUE rows, so the sum is the deleted-row count and
        # callers that report it need no separate count job
        # (``last_delete_count``).
        probe = (
            self._read_reconciled(live)
            .filter(predicate_sql)
            .groupBy(F.col("_metadata.file_path").alias("fp"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        hit_suffixes = {r["fp"] for r in probe}
        self.last_delete_count = sum(r["n"] for r in probe)
        affected = [
            p
            for p in live
            if any(fp.endswith("/" + os.path.basename(p)) for fp in hit_suffixes)
        ]
        if not affected:
            # no rows match: return the current version WITHOUT committing.
            # An empty commit here used to burn a log version per no-op
            # delete and could even fail with ConcurrentCommitError against
            # a racing blind append — for zero semantic content.
            return (self._versions() or [-1])[-1]
        # the rewrite MUST read schema-reconciled: a plain multi-file read
        # takes one file's footer schema, silently dropping columns that
        # post-date the older affected files (caught by
        # test_delete_where_after_schema_evolution — survivors lost their
        # evolved column before this used _read_reconciled)
        # three-valued logic guard: DELETE removes rows where the predicate
        # is TRUE, so the rewrite must KEEP rows where it is FALSE **or
        # NULL**. A bare NOT(pred) maps NULL->NULL, which filter() drops —
        # silently deleting rows the predicate never matched (exactly the
        # rows schema evolution NULL-fills). Delta guards the same way:
        # keep = NOT coalesce(pred, false).
        keep = (
            self._read_reconciled(affected)
            .filter(f"NOT coalesce(({predicate_sql}), false)")
            .drop("_metadata")  # hidden column must not land in the rewrite
        )
        adds = self._write_files(keep, n_files=max(1, len(affected)))
        removes = [{"remove": {"path": p}} for p in affected]
        return self._commit(removes + adds)

    def _read_reconciled(
        self,
        rel_paths: list[str],
        version: int | None = None,
        include_metadata: bool = True,
    ) -> DataFrame:
        """THE schema-reconciliation contract, in one place: read a file
        subset with mergeSchema and conform it to the schema committed
        at ``version`` (NULL-fill for columns the file predates, cast +
        declared ordering). ``snapshot`` and every file-rewriting
        operation (delete_where) MUST read through this — a plain
        multi-file read takes one footer's schema and silently drops
        evolved columns (the round-3 COW data-loss bug).
        ``include_metadata`` keeps the hidden ``_metadata`` column for
        callers that need row→file provenance."""
        schema = self.schema_at(version)
        reader = self.spark.read
        if schema is not None:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[os.path.join(self.base, p) for p in rel_paths])
        if schema is not None:
            present = set(df.columns)
            cols = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in present
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema
            ]
            if include_metadata:
                cols.append(F.col("_metadata"))
            df = df.select(*cols)
        return df

    def merge(self, source: DataFrame, keys: list[str]) -> int:
        """MERGE (upsert) by key as one copy-on-write commit — the Delta
        ``MERGE INTO`` WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
        INSERT mechanic: rows whose key matches a source row are
        REPLACED by the source row, unmatched target rows are kept,
        unmatched source rows are inserted. Exactly one log commit
        (removes for affected files + adds for rewrites/inserts), so
        readers see the old or the new state, never a mix.

        Scale: only files CONTAINING matched keys rewrite — the probe
        is a semi-join of the live files against the distinct source
        keys (file-level min/max stats would prune further in a real
        deployment); untouched files stay as-is. The source is assumed
        key-unique (the MERGE precondition Delta also enforces).
        """
        schema = self.schema_at()
        if schema is None:
            return self.append(source)
        by_name = {f.name: f for f in source.schema}
        if {f.name: f.dataType for f in source.schema} != {
            f.name: f.dataType for f in schema
        }:
            raise ValueError(
                f"merge source schema {source.schema.simpleString()} does "
                f"not match table schema {schema.simpleString()}"
            )
        del by_name
        source = source.select(*[f.name for f in schema])
        skeys = source.select(*keys).distinct()
        live = self.live_files()
        probe = (
            self._read_reconciled(live)
            .join(skeys, keys, "left_semi")
            .select(F.col("_metadata.file_path").alias("fp"))
            .distinct()
            .collect()
        )
        hit = {r["fp"] for r in probe}
        affected = [
            p
            for p in live
            if any(fp.endswith("/" + os.path.basename(p)) for fp in hit)
        ]
        if affected:
            keep = (
                self._read_reconciled(affected)
                .join(skeys, keys, "left_anti")
                .drop("_metadata")
            )
            new_data = keep.unionByName(source)
        else:
            new_data = source
        adds = self._write_files(
            new_data, n_files=max(1, len(affected))
        )
        removes = [{"remove": {"path": p}} for p in affected]
        return self._commit(removes + adds)

    def compact(self, n_files: int = 1) -> int:
        """Rewrite the live file set into ``n_files`` files in ONE commit
        (remove every live file + add the rewrites) — readers at older
        versions still see the removed files via replay."""
        old = self.live_files()
        adds = self._write_files(self.snapshot(), n_files)
        removes = [{"remove": {"path": p}} for p in old]
        return self._commit(removes + adds)

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Read the table as of ``version`` (latest if None) by replaying
        the log and scanning exactly the live files, reconciled to the
        schema committed at that version: files written before an
        add-column commit surface NULL for the new column (mergeSchema
        semantics, but driven by the LOG's schema, not file-footer
        union — so a dropped/renamed column cannot leak back in)."""
        files = self.live_files(version)
        if not files:
            raise ValueError("LogTable has no committed data")
        return self._read_reconciled(
            files, version=version, include_metadata=False
        )

    def change_feed(
        self, v_from: int, v_to: int | None, keys: list[str]
    ) -> DataFrame:
        """Row-level CHANGE DATA FEED between two versions — the Delta
        CDF read surface (``table_changes``), derived by diffing the two
        snapshots on ``keys``: emits each changed row tagged
        ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage}. Columns are reconciled to the LATER version's
        schema (a column added between the versions reads NULL on the
        preimage side; a column dropped between them is absent from the
        feed), and "updated" means any later-schema non-key column
        differs (null-safe comparison).

        Scale: two snapshot scans + key-aligned joins that shuffle by
        ``keys`` — the generic COW fallback a format without per-commit
        row tracking uses; with file-level stats only files live in
        exactly one of the two versions even need scanning (that pruning
        is a metadata filter on ``live_adds`` of both versions).
        """
        a = self.snapshot(v_from)
        b = self.snapshot(v_to)
        # Reconcile BOTH sides to the later version's column set: columns
        # added between the versions read NULL on the v_from side (so
        # inserts keep their new-column values); columns dropped between
        # them are excluded (they no longer exist in the later schema).
        later = list(b.columns)
        a_cols = set(a.columns)
        a = a.select(
            *[
                (F.col(c) if c in a_cols else F.lit(None)).alias(c)
                for c in later
            ]
        )
        shared = later
        nonkey = [c for c in shared if c not in keys]
        ins = b.join(a.select(*keys), keys, "left_anti").select(
            F.lit("insert").alias("_change_type"), *shared
        )
        dele = a.join(b.select(*keys), keys, "left_anti").select(
            F.lit("delete").alias("_change_type"), *shared
        )
        if nonkey:
            cond = None
            for c in nonkey:
                ne = ~F.col(f"__a.{c}").eqNullSafe(F.col(f"__b.{c}"))
                cond = ne if cond is None else (cond | ne)
            paired = a.alias("__a").join(b.alias("__b"), keys).filter(cond)
            pre = paired.select(
                F.lit("update_preimage").alias("_change_type"),
                *keys,
                *[F.col(f"__a.{c}").alias(c) for c in nonkey],
            ).select("_change_type", *shared)
            post = paired.select(
                F.lit("update_postimage").alias("_change_type"),
                *keys,
                *[F.col(f"__b.{c}").alias(c) for c in nonkey],
            ).select("_change_type", *shared)
            upd = pre.unionByName(post)
        else:
            upd = ins.limit(0)
        return ins.unionByName(dele).unionByName(upd)

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION AS OF — one commit whose remove/add
        actions reset the LIVE FILE SET to ``version``'s (Delta RESTORE):
        history is preserved (the restore is itself a new version, and
        the undone versions still replay), data files are reused, not
        rewritten — a metadata-only rollback no matter how large the
        table. The schema committed at ``version`` is re-logged so
        readers reconcile restored files exactly as they did then."""
        target = set(self.live_files(version))
        current = set(self.live_files())
        actions: list[dict] = [
            {"remove": {"path": p}} for p in sorted(current - target)
        ]
        old_adds = {a["path"]: a for a in self.live_adds(version)}
        actions.extend(
            {"add": old_adds[p]} for p in sorted(target - current)
        )
        schema = self.schema_at(version)
        if schema is not None and schema != self.schema_at():
            actions.append({"metaData": {"schema": schema.jsonValue()}})
        if not actions:
            # Nothing to undo (file set and schema already match the
            # target). Commit an explicit no-op marker so the restore is
            # still an auditable version; never touch a None schema.
            if schema is not None:
                actions.append({"metaData": {"schema": schema.jsonValue()}})
            else:
                actions.append({"restore": {"toVersion": int(version)}})
        return self._commit(actions)

    def vacuum(
        self, keep_versions: int = 1, *, grace_seconds: float = 3600.0
    ) -> int:
        """VACUUM: physically delete data files referenced by NO version
        within the retention horizon (the newest ``keep_versions``
        versions stay fully time-travelable; older versions may lose
        files — exactly Delta's retention trade-off, expressed in
        versions rather than hours). Returns the number of files
        removed. The log itself is never touched.

        Concurrency: data files newer than ``grace_seconds`` (by mtime)
        are NEVER deleted even if unreferenced — an in-flight append
        writes its files BEFORE committing their add actions, so a
        zero-grace vacuum racing a writer would destroy an uncommitted
        commit's data. This is Delta's retention-hours guard; set
        ``grace_seconds=0`` only when you can guarantee no concurrent
        writers (stop-the-world maintenance)."""
        import time

        versions = self._versions()
        keep = versions[-keep_versions:] if keep_versions > 0 else []
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self.live_files(v))
        removed = 0
        now = time.time()
        data_root = os.path.join(self.base, "data")
        for sub in os.listdir(data_root):
            subdir = os.path.join(data_root, sub)
            for f in os.listdir(subdir):
                rel = os.path.join("data", sub, f)
                if f.endswith(".parquet") and rel not in referenced:
                    full = os.path.join(subdir, f)
                    try:
                        if now - os.path.getmtime(full) < grace_seconds:
                            continue  # possibly an in-flight append
                    except OSError:
                        continue
                    os.unlink(full)
                    removed += 1
        return removed
