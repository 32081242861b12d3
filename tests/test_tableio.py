"""TableIO snapshot manifest: commit tracking + time-travel reads
(parquet backend — the sandbox has no Iceberg jar; the catalog branch
maps 1:1 onto `VERSION AS OF` / option("snapshot-id"))."""

from __future__ import annotations

import pytest


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_snapshot_append_and_time_travel(spark, tmp_path):
    from pdf_extract_spark.sources.tableio import TableIO

    io = TableIO(spark)
    ref = str(tmp_path / "docs_table")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, t string")
    b = spark.createDataFrame([(3, "c")], "doc_id long, t string")

    s1 = io.write(a, ref, run_id="s1")
    s2 = io.write(b, ref, run_id="s2")
    assert io.snapshots(ref) == ["s1", "s2"]

    # current read sees both commits; as-of s1 sees only the first
    assert _ids(io.read(ref)) == [1, 2, 3]
    assert _ids(io.read_asof(ref, s1)) == [1, 2]
    assert _ids(io.read_asof(ref, s2)) == [1, 2, 3]

    with pytest.raises(ValueError):
        io.read_asof(ref, "nope")


def test_snapshot_overwrite_resets_history(spark, tmp_path):
    from pdf_extract_spark.sources.tableio import TableIO

    io = TableIO(spark)
    ref = str(tmp_path / "docs_table")
    io.write(spark.createDataFrame([(1, "a")], "doc_id long, t string"),
             ref, run_id="s1")
    io.write(spark.createDataFrame([(9, "z")], "doc_id long, t string"),
             ref, run_id="s2", mode="overwrite")
    # overwrite starts a fresh history: old snapshot ids are gone and
    # the new snapshot covers exactly the replacement data
    assert io.snapshots(ref) == ["s2"]
    assert _ids(io.read(ref)) == [9]
    assert _ids(io.read_asof(ref, "s2")) == [9]
    with pytest.raises(ValueError):
        io.read_asof(ref, "s1")
