"""Vectorized shingle/MinHash/SimHash signature kernel (Arrow + numpy).

The dedup tier's hashing — w-token shingling, polynomial shingle hashes,
min-wise signatures, simhash fingerprints — was originally expressed as
Catalyst higher-order-function lambdas (functions/sqlkit.py fragments).
Those fragments remain the cross-engine ORACLE definition (DuckDB replays
them bit-for-bit), but Spark does NOT whole-stage-codegen HOF lambdas: the
per-character fold runs on the interpreted expression path, costing
~50-70 KB/s/core (r4 VERDICT, measured) — unusable at 100 TB where the
hashing kernel IS the dedup pipeline.

This module is the execution path: one ``mapInPandas`` over the corpus
computes, per Arrow batch, every signature column in numpy —

  * shingle hashes: all distinct shingle strings of the batch are encoded
    ONCE as a UTF-32 codepoint array (``ascii``/``substring`` in both
    engines are codepoint-based — probed, including astral planes) and
    hashed with a segment-wise Horner dot product against a precomputed
    power table (`np.add.reduceat` over per-char terms);
  * min-wise hashes: 8 affine maps + ``np.minimum.reduceat`` per doc;
  * simhash: per-bit ±1 votes via one (n_hashes, 32) bit matrix +
    ``np.add.reduceat``.

Bit-identity with the HOF fragments is pinned by
tests/test_sigkernel.py on the real corpus plus adversarial synthetic
docs (unicode, hash-colliding shingles, short docs); the DuckDB oracles
in operators/dedup.py therefore keep checking this path end-to-end.

Scale shape: the kernel is a NARROW Arrow map over the scan — no shuffle,
no driver involvement, ~GB/s/core instead of KB/s/core. Downstream
(banding, candidate equi-joins, jaccard verify) stays pure Catalyst.

The reference engine has no dedup surface (SURVEY.md §2.9); this module
is part of the training-data-pipeline extension from the build brief.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import sqlkit as K
from .sqlkit import SPARK

N_MINHASH = len(K.MINHASH_PARAMS)

#: power table BASE^k mod PRIME, ascending; grown on demand (shingles are
#: short strings, so a few KB covers everything)
_POWS: np.ndarray | None = None


def _pow_table(n: int) -> np.ndarray:
    global _POWS
    if _POWS is None or len(_POWS) < n:
        size = max(n, 4096)
        t = np.empty(size, dtype=np.int64)
        t[0] = 1
        for k in range(1, size):
            t[k] = (t[k - 1] * K.BASE) % K.PRIME
        _POWS = t
    return _POWS


def polyhash_strings(strings: list[str]) -> np.ndarray:
    """Polynomial hash of each string — the numpy twin of the
    ``sqlkit.polyhash`` SQL fragment (fold ``acc*31 + codepoint`` mod
    PRIME), vectorized over the whole list: one UTF-32 decode of the
    concatenated blob, per-char term = code * BASE^(L-1-i) mod PRIME,
    one ``reduceat`` per segment.

    Overflow-safe in int64: code < 2^21, power < 2^30 → term < 2^51;
    terms are reduced mod PRIME (< 2^30) before the segment sum, so a
    sum of L terms needs L < 2^33 chars — far past any shingle."""
    m = len(strings)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=m)
    total = int(lens.sum())
    out = np.zeros(m, dtype=np.int64)
    if total == 0:
        return out
    blob = "".join(strings)
    codes = np.frombuffer(
        blob.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent at global position g inside segment k: ends[k] - 1 - g
    exp = np.repeat(ends - 1, lens) - np.arange(total, dtype=np.int64)
    pw = _pow_table(int(lens.max()))
    terms = (codes * pw[exp]) % K.PRIME
    nonempty = lens > 0
    sums = np.add.reduceat(terms, starts[nonempty])
    out[nonempty] = sums % K.PRIME
    return out


def _doc_shingles(text: str, w: int, distinct: bool = True,
                  pad_short: bool = True) -> list[str]:
    """w-token shingle strings — the Python twin of
    ``sqlkit.token_shingles(tokens(text))``: split on single spaces,
    drop empties, windows of w.  ``distinct`` keeps first occurrences
    only (the set-semantics default every dedup consumer uses);
    ``distinct=False`` keeps every window in positional order (the
    exact-substring marking path).  ``pad_short`` controls docs shorter
    than w tokens: the full join as the single shingle (set semantics)
    vs no windows at all (positional semantics — a doc without a full
    w-gram has nothing to mark)."""
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    if n < w:
        wins = [" ".join(toks)] if pad_short else []
    elif n == w:
        wins = [" ".join(toks)]
    else:
        wins = [" ".join(toks[i:i + w]) for i in range(n - w + 1)]
    return list(dict.fromkeys(wins)) if distinct else wins


def batch_signatures(
    texts: list[str | None], w: int,
    want_minhash: bool, want_simhash: bool,
    distinct: bool = True, pad_short: bool = True,
) -> tuple[list, list, list[np.ndarray] | None, np.ndarray | None]:
    """Signatures for one batch of documents.

    Returns ``(sh_lists, n_sh, minhash_cols, simhash)`` where entries
    for None texts are None (matching the HOF fragments: every
    expression of a NULL text is NULL). ``minhash_cols`` is a list of
    N_MINHASH arrays aligned to the non-null compaction — callers use
    the returned sh_lists' None positions to re-expand.
    ``distinct=False`` keeps every window in positional order (see
    :func:`_doc_shingles`); min-wise values are unaffected by
    duplicates, but simhash votes are set-semantics — callers wanting
    simhash must keep ``distinct=True``."""
    shingles: list[str] = []
    counts: list[int] = []
    nn_idx: list[int] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        nn_idx.append(i)
        u = _doc_shingles(t, w, distinct, pad_short)
        shingles.extend(u)
        counts.append(len(u))
    hashes = polyhash_strings(shingles)

    n = len(texts)
    sh_lists: list = [None] * n
    n_sh: list = [None] * n
    # per-doc dedupe of hash VALUES (distinct shingles may collide),
    # preserving first-occurrence order — array_distinct semantics.
    # (positional mode keeps every window's hash as-is)
    uniq_parts: list[np.ndarray] = []
    off = 0
    for k, i in enumerate(nn_idx):
        c = counts[k]
        hv = hashes[off:off + c]
        if distinct:
            hv = pd.unique(hv)
        off += c
        uniq_parts.append(hv)
        sh_lists[i] = hv.tolist()
        n_sh[i] = len(hv)

    mh_cols = None
    sim = None
    if want_minhash or want_simhash:
        # reduceat segments must be non-empty: signature consumers use
        # set semantics where every doc has >= 1 shingle
        assert distinct and pad_short, \
            "minhash/simhash require distinct set semantics"
    if (want_minhash or want_simhash) and uniq_parts:
        flat = np.concatenate(uniq_parts)
        seg_lens = np.fromiter((len(p) for p in uniq_parts),
                               dtype=np.int64, count=len(uniq_parts))
        starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
        if want_minhash:
            mh_cols = []
            for a, b in K.MINHASH_PARAMS:
                vals = (a * flat + b) % K.PRIME
                mh_cols.append(np.minimum.reduceat(vals, starts))
        if want_simhash:
            shifts = np.arange(K.SIMHASH_BITS, dtype=np.int64)
            contrib = (((flat[:, None] >> shifts) & 1) * 2 - 1)
            votes = np.add.reduceat(contrib, starts, axis=0)
            sim = ((votes > 0).astype(np.int64) << shifts).sum(axis=1)
    elif want_minhash:
        mh_cols = [np.empty(0, dtype=np.int64)] * N_MINHASH
    return sh_lists, n_sh, mh_cols, sim


def signature_frame(docs: DataFrame, w: int,
                    minhash: bool = True,
                    simhash: bool = False,
                    distinct: bool = True,
                    pad_short: bool = True) -> DataFrame:
    """``doc_id, sh, n_sh[, mh0..mh7][, simhash]`` for a ``doc_id, text``
    frame, computed by the vectorized kernel as a narrow Arrow map over
    the scan. Values are bit-identical to the HOF-fragment form
    (:func:`hof_signature_frame`) — pinned by tests — so every DuckDB
    oracle built from sqlkit fragments keeps verifying this path."""
    fields = [docs.schema["doc_id"],
              StructField("sh", ArrayType(LongType()), True),
              StructField("n_sh", IntegerType(), True)]
    if minhash:
        fields += [StructField(f"mh{j}", LongType(), True)
                   for j in range(N_MINHASH)]
    if simhash:
        fields.append(StructField("simhash", LongType(), True))
    schema = StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [None if t is None or (isinstance(t, float))
                     else t for t in pdf["text"]]
            sh_lists, n_sh, mh_cols, sim = batch_signatures(
                texts, w, minhash, simhash, distinct, pad_short)
            out = {"doc_id": pdf["doc_id"],
                   "sh": pd.Series(sh_lists, dtype="object"),
                   "n_sh": pd.array(n_sh, dtype="Int32")}
            nn = [i for i, t in enumerate(texts) if t is not None]
            if minhash:
                for j in range(N_MINHASH):
                    col = pd.array([None] * len(texts), dtype="Int64")
                    if mh_cols is not None and len(nn):
                        col[nn] = mh_cols[j]
                    out[f"mh{j}"] = col
            if simhash:
                col = pd.array([None] * len(texts), dtype="Int64")
                if sim is not None and len(nn):
                    col[nn] = sim
                out["simhash"] = col
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(gen, schema)


def hof_signature_frame(docs: DataFrame, w: int,
                        minhash: bool = True,
                        simhash: bool = False) -> DataFrame:
    """The ORACLE form: the same signature columns built from the
    Catalyst higher-order-function fragments (interpreted, KB/s/core —
    test scale only). The DuckDB oracles replay exactly these
    fragments; tests/test_sigkernel.py pins kernel == HOF, closing the
    kernel → HOF → DuckDB equality chain."""
    sh = K.shingle_hashes("text", w, SPARK)
    out = docs.select("doc_id", F.expr(sh).alias("sh")).withColumn(
        "n_sh", F.expr(K.asize("sh", SPARK)))
    if minhash:
        out = out.select(
            "*", *[F.expr(K.minhash("sh", j, SPARK)).alias(f"mh{j}")
                   for j in range(N_MINHASH)])
    if simhash:
        out = out.withColumn("simhash", F.expr(K.simhash("sh", SPARK)))
    return out
