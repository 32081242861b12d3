"""TableIO: Iceberg when a catalog is configured, parquet warehouse otherwise.

The north rule targets Iceberg tables of interleaved documents with
snapshot-checkpoint resume. This sandbox has no Iceberg runtime jar, so
TableIO keeps one API with two backends (SURVEY.md §7 preamble):

  * iceberg backend — ``df.writeTo(table).append()`` / ``spark.read.table``
    when ``spark.sql.catalog.<name>`` is configured; snapshot semantics are
    Iceberg's own.
  * parquet backend — a directory per table plus a ``_snapshots``
    manifest (JSON lines) we maintain: each committed write appends a
    manifest row (snapshot_id, run_id, row_count). Resume reads the last
    committed snapshot's lineage exactly like the Iceberg path would.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg_catalog(spark: SparkSession, ref: str) -> bool:
    if "." not in ref:
        return False
    catalog = ref.split(".", 1)[0]
    try:
        return bool(spark.conf.get(f"spark.sql.catalog.{catalog}", None))
    except Exception:
        return False


class TableIO:
    """Read/write interleaved-document tables by path or catalog ref."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def read(self, ref: str) -> DataFrame:
        if _has_iceberg_catalog(self.spark, ref):
            return self.spark.read.table(ref)
        return self.spark.read.parquet(ref)

    def exists(self, ref: str) -> bool:
        if _has_iceberg_catalog(self.spark, ref):
            try:
                self.spark.read.table(ref).schema
                return True
            except Exception:
                return False
        return os.path.isdir(ref) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(ref)
        )

    def write(self, df: DataFrame, ref: str, run_id: str | None = None,
              mode: str = "append") -> str:
        """Commit df to the table; returns the snapshot id."""
        run_id = run_id or uuid.uuid4().hex
        if _has_iceberg_catalog(self.spark, ref):
            writer = df.writeTo(ref)
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                try:
                    writer.append()
                except Exception:
                    writer.create()
            return run_id
        before = self._data_files(ref)
        df.write.mode(mode).parquet(ref)
        added = sorted(self._data_files(ref) - (
            set() if mode == "overwrite" else before
        ))
        self._append_manifest(ref, run_id, added,
                              reset=(mode == "overwrite"))
        return run_id

    def read_asof(self, ref: str, snapshot_id: str) -> DataFrame:
        """Time-travel read: the table as of (and including) a committed
        snapshot — Iceberg's ``VERSION AS OF`` on the catalog backend;
        on the parquet backend, the union of every snapshot's recorded
        data files up to the requested one (each manifest row carries
        the files its commit added, so older snapshots stay readable
        after later appends — the same mechanics as an Iceberg
        manifest list)."""
        if _has_iceberg_catalog(self.spark, ref):
            return (
                self.spark.read.option("snapshot-id", snapshot_id)
                .table(ref)
            )
        files: list[str] = []
        found = False
        for row in self._manifest_rows(ref):
            files.extend(row.get("files", []))
            if row["snapshot_id"] == snapshot_id:
                found = True
                break
        if not found:
            raise ValueError(
                f"snapshot {snapshot_id!r} not in {ref}/_snapshots.jsonl")
        if not files:
            return self.spark.read.parquet(ref).limit(0)
        return self.spark.read.parquet(
            *[os.path.join(ref, f) for f in files])

    # -- parquet-backend snapshot manifest ----------------------------------
    def _manifest_path(self, ref: str) -> str:
        return os.path.join(ref, "_snapshots.jsonl")

    def _data_files(self, ref: str) -> set[str]:
        if not os.path.isdir(ref):
            return set()
        return {f for f in os.listdir(ref) if f.endswith(".parquet")}

    def _append_manifest(self, ref: str, run_id: str,
                         files: list[str] | None = None,
                         reset: bool = False) -> None:
        # Manifest rows mirror Iceberg snapshot metadata (documented delta:
        # no atomic swap; commit order is append order). Each row records
        # the data files its commit added — the time-travel source.
        os.makedirs(ref, exist_ok=True)
        row = json.dumps({"snapshot_id": run_id, "files": files or []})
        with open(self._manifest_path(ref), "w" if reset else "a") as fh:
            fh.write(row + "\n")

    def _manifest_rows(self, ref: str) -> list[dict]:
        path = self._manifest_path(ref)
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def snapshots(self, ref: str) -> list[str]:
        return [r["snapshot_id"] for r in self._manifest_rows(ref)]
