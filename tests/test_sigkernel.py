"""Bit-identity of the vectorized signature kernel (functions/sigkernel)
against the HOF-fragment oracle form — the equality chain the dedup tier
rests on: kernel == Catalyst HOF == DuckDB oracle. A drift of a single
hash value here would silently change every LSH band key, so the pin is
exact (arrays element-for-element, not set-wise)."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

#: adversarial docs: unicode (BMP + astral codepoints), repeated
#: shingles, single-space runs, long tokens.  All have >= 3 tokens so
#: the HOF form is ANSI-safe (element_at never goes out of bounds).
EDGE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a b c"),
    (3, "répété répété répété répété accentué"),
    (4, "euro € sign and astral 😀 emoji tokens here"),
    (5, "x  y   z  w"),  # multi-space runs -> empty tokens dropped
    (6, " ".join(["tok%d" % (i % 7) for i in range(300)])),
    (7, "αβγ δεζ ηθι κλμ νξο"),
    (8, "samesame " * 40 + "tail end token"),
]

#: short docs (< w tokens) exercise the fewer-than-w window join; the
#: ANSI HOF form would throw on these, so they pin kernel == DuckDB.
SHORT_DOCS = [(11, "solo"), (12, "two tokens"), (13, "")]


def _collect(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_kernel_matches_hof_on_corpus(spark):
    from pdf_extract_spark.functions.sigkernel import (
        hof_signature_frame,
        signature_frame,
    )
    from pdf_extract_spark.operators.dedup import SHINGLE_W, _docs

    docs = _docs(spark, SF_DIR)
    cols = ["doc_id", "sh", "n_sh"] + [f"mh{j}" for j in range(8)] + [
        "simhash"]
    fast = _collect(
        signature_frame(docs, SHINGLE_W, minhash=True, simhash=True), cols)
    slow = _collect(
        hof_signature_frame(docs, SHINGLE_W, minhash=True, simhash=True),
        cols)
    assert len(fast) == len(slow) > 0
    assert fast == slow


def test_kernel_matches_hof_on_edge_docs(spark):
    from pdf_extract_spark.functions.sigkernel import (
        hof_signature_frame,
        signature_frame,
    )

    docs = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    cols = ["doc_id", "sh", "n_sh"] + [f"mh{j}" for j in range(8)] + [
        "simhash"]
    fast = _collect(signature_frame(docs, 3, minhash=True, simhash=True),
                    cols)
    slow = _collect(hof_signature_frame(docs, 3, minhash=True, simhash=True),
                    cols)
    assert fast == slow


def test_kernel_matches_duckdb_on_short_docs(spark):
    """Docs shorter than w tokens: the single window joins the available
    tokens (DuckDB's out-of-range list index is NULL, concat_ws skips
    it).  The Spark HOF form is ANSI-strict here, so the pin is kernel
    == DuckDB — which is the pair the driver's gate actually compares."""
    from pdf_extract_spark.functions import sqlkit as K
    from pdf_extract_spark.functions.sigkernel import signature_frame

    docs = spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
    fast = [
        (r[0], sorted(r[1]), *r[2:])
        for r in _collect(signature_frame(docs, 3, minhash=True),
                          ["doc_id", "sh", "n_sh", "mh0", "mh7"])
    ]
    con = duckdb.connect()
    rows = ", ".join("(%d, '%s')" % (i, t) for i, t in SHORT_DOCS)
    sh = K.shingle_hashes("text", 3, K.DUCK)
    got = con.sql(f"""
        with documents(doc_id, text) as (values {rows}),
        s as (select doc_id, {sh} as sh from documents),
        z as (select doc_id, sh, {K.asize('sh', K.DUCK)} as n_sh from s)
        select doc_id, sh, n_sh,
               {K.minhash('sh', 0, K.DUCK)} as mh0,
               {K.minhash('sh', 7, K.DUCK)} as mh7
        from z order by doc_id
    """).fetchall()
    # sh compares as a SET: DuckDB list_distinct does not preserve
    # first-occurrence order (registered queries only ever reduce sh
    # order-insensitively; the ORDER pin is kernel == Spark HOF above)
    want = sorted((r[0], sorted(r[1]), r[2], r[3], r[4]) for r in got)
    assert fast == want


def test_polyhash_strings_matches_bytes_twin():
    """On pure-ASCII input codepoints == bytes, so the string kernel and
    the byte block-Horner twin must agree at every length."""
    import numpy as np

    from pdf_extract_spark.functions.sigkernel import polyhash_strings
    from pdf_extract_spark.functions.sqlkit import polyhash_bytes

    cases = ["", "a", "abc xyz", "q" * 1023, "r s t " * 700, "Z" * 70000]
    got = polyhash_strings(cases)
    want = np.array([polyhash_bytes(c.encode()) for c in cases])
    assert (got == want).all()


def test_null_text_yields_null_signature(spark):
    from pdf_extract_spark.functions.sigkernel import signature_frame

    docs = spark.createDataFrame(
        [(1, "three token doc"), (2, None)], "doc_id long, text string")
    rows = {r.doc_id: r for r in signature_frame(
        docs, 3, minhash=True, simhash=True).collect()}
    assert rows[2].sh is None and rows[2].n_sh is None
    assert rows[2].mh0 is None and rows[2].simhash is None
    assert rows[1].sh and rows[1].n_sh == len(rows[1].sh)
