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
cost is O(commits) driver-side JSON — the same trade lakehouse formats
make (they checkpoint the log past ~10 commits; ``checkpoint`` here would
be a straightforward extension). Data files are immutable once written —
remove actions only drop them from the live set, enabling time travel.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class LogTable:
    def __init__(self, spark: SparkSession, base_path: str) -> None:
        self.spark = spark
        self.base = base_path
        self.log_dir = os.path.join(base_path, "_log")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(os.path.join(base_path, "data"), exist_ok=True)

    # -- log plumbing ------------------------------------------------------
    def _versions(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json")
        )

    def _read_log(self, upto: int | None = None) -> list[dict]:
        actions: list[dict] = []
        for v in self._versions():
            if upto is not None and v > upto:
                break
            with open(os.path.join(self.log_dir, f"{v:08d}.json")) as f:
                actions.extend(json.loads(line) for line in f)
        return actions

    def _commit(self, actions: list[dict]) -> int:
        version = (self._versions() or [-1])[-1] + 1
        # atomic rename = the commit point (object stores: put-if-absent)
        tmp = os.path.join(self.log_dir, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.writelines(json.dumps(a) + "\n" for a in actions)
        os.rename(tmp, os.path.join(self.log_dir, f"{version:08d}.json"))
        return version

    def live_files(self, version: int | None = None) -> list[str]:
        live: dict[str, dict] = {}
        for a in self._read_log(version):
            if "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
        return sorted(live)

    # -- table operations --------------------------------------------------
    def _write_files(self, df: DataFrame, n_files: int) -> list[dict]:
        sub = uuid.uuid4().hex
        out = os.path.join(self.base, "data", sub)
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        return [
            {
                "add": {
                    "path": os.path.join("data", sub, f),
                    "num_records": None,
                }
            }
            for f in sorted(os.listdir(out))
            if f.endswith(".parquet")
        ]

    def append(self, df: DataFrame, n_files: int = 1) -> int:
        """Blind append: write data files, commit their add actions."""
        return self._commit(self._write_files(df, n_files))

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
        the log and scanning exactly the live files."""
        files = self.live_files(version)
        if not files:
            raise ValueError("LogTable has no committed data")
        return self.spark.read.parquet(
            *[os.path.join(self.base, p) for p in files]
        )
