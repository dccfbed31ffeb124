"""Snapshot-committed parquet tables (miniature Iceberg model).

The target deployment stores tiers as Iceberg tables; this sandbox has no
Iceberg runtime jars, so the engine ships a faithful miniature of the same
snapshot protocol over plain parquet, behind one class that a real Iceberg
catalog could replace 1:1:

* every commit writes data files under ``data/<uuid>/`` then atomically
  publishes a JSON manifest ``_manifests/snapshot-<n>.json`` listing the
  file-set of that snapshot (append = parent files + new, overwrite = new
  only) plus commit metadata;
* ``HEAD`` is an atomically renamed pointer file -> crash-safe commits,
  readers never observe partial writes;
* snapshots are immutable -> time travel (``read(snapshot_id=...)``) and
  checkpoint/resume (a pipeline stage is "done" iff a snapshot with its
  config fingerprint exists).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------
    def _head_path(self) -> str:
        return os.path.join(self.manifest_dir, "HEAD")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._head_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.manifest_dir,
                               f"snapshot-{snapshot_id}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        head = self.current_snapshot_id()
        out = []
        sid = head
        while sid is not None:
            m = self._manifest(sid)
            out.append(m)
            sid = m.get("parent")
        return list(reversed(out))

    def find_snapshot(self, **meta) -> dict | None:
        """Newest snapshot whose metadata contains all given key/values."""
        for m in reversed(self.snapshots() if self.current_snapshot_id()
                          is not None else []):
            if all(m.get("meta", {}).get(k) == v for k, v in meta.items()):
                return m
        return None

    # -- commit --------------------------------------------------------------
    def _commit(self, files: list[str], meta: dict, parent: int | None) -> int:
        sid = (parent + 1) if parent is not None else 0
        manifest = {
            "snapshot_id": sid,
            "parent": parent,
            "files": files,
            "committed_at": time.time(),
            "meta": meta,
        }
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, os.path.join(self.manifest_dir,
                                    f"snapshot-{sid}.json"))
        tmp_head = os.path.join(self.manifest_dir, f".tmp-head-{uuid.uuid4().hex}")
        with open(tmp_head, "w") as f:
            f.write(str(sid))
        os.rename(tmp_head, self._head_path())
        return sid

    def _write_data(self, df: DataFrame) -> str:
        d = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(d)
        return d

    def append(self, df: DataFrame, **meta) -> int:
        d = self._write_data(df)
        parent = self.current_snapshot_id()
        files = (self._manifest(parent)["files"] if parent is not None else [])
        return self._commit(files + [d], meta, parent)

    def overwrite(self, df: DataFrame, **meta) -> int:
        d = self._write_data(df)
        return self._commit([d], meta, self.current_snapshot_id())

    def merge_buckets(self, spark: SparkSession, df: DataFrame,
                      keys: list[str], **meta) -> int:
        """MERGE-INTO-equivalent upsert keyed on ``keys``: new rows replace
        matching rows of the current snapshot (copy-on-write, like Iceberg
        MERGE)."""
        cur = self.read(spark)
        if cur is None:
            return self.overwrite(df, **meta)
        remaining = cur.join(df.select(*keys).distinct(), keys, "left_anti")
        merged = remaining.unionByName(df)
        return self.overwrite(merged, **meta)

    # -- read ----------------------------------------------------------------
    def read(self, spark: SparkSession,
             snapshot_id: int | None = None) -> DataFrame | None:
        sid = snapshot_id if snapshot_id is not None \
            else self.current_snapshot_id()
        if sid is None:
            return None
        files = self._manifest(sid)["files"]
        if not files:
            return None
        return spark.read.parquet(*files)

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        sid = snapshot_id if snapshot_id is not None \
            else self.current_snapshot_id()
        if sid is None:
            return []
        out = []
        for d in self._manifest(sid)["files"]:
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".parquet"):
                    out.append(os.path.join(d, fn))
        return out
