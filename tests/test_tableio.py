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


def test_run_pipeline_input_asof(spark, tmp_path):
    """--input-asof: a pipeline run over snapshot s1 extracts exactly
    the docs committed in s1, even after a later append."""
    from pdf_extract_spark.plans.pipeline import run_pipeline
    from pdf_extract_spark.sources.corpus import corpus_dataframe
    from pdf_extract_spark.sources.tableio import TableIO

    io = TableIO(spark)
    in_ref = str(tmp_path / "docs_in")
    corpus = corpus_dataframe(spark, 6)
    first = corpus.filter("doc_id < 'doc00000003'")
    rest = corpus.filter("doc_id >= 'doc00000003'")
    n_first = first.count()
    assert 0 < n_first < 6
    io.write(first, in_ref, run_id="s1")
    io.write(rest, in_ref, run_id="s2")

    out_ref = str(tmp_path / "docs_out")
    summary = run_pipeline(spark, in_ref, out_ref, input_asof="s1")
    got = {r.doc_id for r in spark.read.parquet(out_ref).collect()}
    assert got == {r.doc_id for r in first.collect()}
    assert summary["n_docs"] == n_first
