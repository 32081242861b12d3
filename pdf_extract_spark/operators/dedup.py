"""Document deduplication operators for the training-data pipeline.

Five dedup families over the ``documents`` table, each a pure-DataFrame
operator (Catalyst higher-order array expressions, zero Python UDFs) with a
bit-identical DuckDB oracle built from the same fragment builders
(functions/sqlkit.py).

Scale design (100 TB / 10^12 docs):
  * exact           — one hash-aggregate shuffle on md5(normalized text);
                      map-side partial agg, AQE-coalesced. O(n).
  * minhash_lsh     — signatures computed INSIDE the scan stage (JVM
                      codegen); only (band_idx, band_key) equi-join
                      shuffles — the standard MinHash-LSH band trick, so
                      candidate generation is O(n·bands) not O(n²).
  * simhash         — 32-bit fingerprints in-scan; banded equi-join on
                      8-bit sub-keys (pigeonhole: hamming ≤ 3 pairs must
                      share one of 4 bands) then exact hamming verify.
  * ngram_jaccard   — exact verification operator; the all-pairs form here
                      is the small-scale oracle-checkable variant with a
                      lossless size-ratio prefilter (|A∩B|/|A∪B| ≥ τ ⟹
                      min(|A|,|B|) ≥ τ·max(|A|,|B|)). At scale it runs on
                      LSH candidates only (dedup_minhash_lsh verifies with
                      the same jaccard expression).
  * embedding_cosine — near-dup by cosine ≥ τ; all-pairs at test scale,
                      label-bucketed (IVF-style) at scale — see
                      operators/similarity.py.

The reference engine has no dedup surface (SURVEY.md §2.9); this module is
the training-data-pipeline extension from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import sqlkit as K
from ..functions.sqlkit import DUCK, SPARK
from ..runtime import ensure_parallel_scan, track_cache

SHINGLE_W = 3          # w-token shingling
JACCARD_TAU = 0.8      # near-dup verification threshold
N_MINHASH = 8          # signature length
LSH_BANDS = 2          # 2 bands x 4 rows: P(candidate | j=0.95) ≈ 0.97
LSH_ROWS = N_MINHASH // LSH_BANDS
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = 4      # 4 x 8-bit bands; pigeonhole-complete for ≤ 3 flips
COSINE_TAU = 0.45


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the test tables are single small parquet files → a single input
    # partition; hashing is CPU-bound, so spread rows across the cluster
    # first (a ~KB/row shuffle, repaid ~cores× on the hash stage).
    # GATED: a production-scale scan is already parallel, and an
    # unconditional repartition would insert a full shuffle of the
    # corpus for nothing (Connect-safe gate — see runtime.py).
    return ensure_parallel_scan(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on md5 of the normalized text.

    Output: one row per document with its duplicate-group representative
    (min doc_id sharing the hash) and group size. A single hash-aggregate
    shuffle; at 10^12 docs the group-by key is the 128-bit digest, evenly
    distributed — no skew by construction."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("text_md5")
    )
    groups = docs.groupBy("text_md5").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("group_size")
    )
    return (
        docs.join(groups, "text_md5")
        .select(
            "doc_id", "rep_id", "group_size",
            (F.col("doc_id") != F.col("rep_id")).alias("is_dup"),
        )
    )


def exact_duplicates_oracle() -> str:
    return """
        with h as (
            select doc_id, md5(lower(trim(text))) as text_md5 from documents
        ), g as (
            select text_md5, min(doc_id) as rep_id,
                   cast(count(*) as bigint) as group_size
            from h group by text_md5
        )
        select h.doc_id, g.rep_id, g.group_size,
               h.doc_id <> g.rep_id as is_dup
        from h join g using (text_md5)
    """


# ---------------------------------------------------------------------------
# n-gram jaccard (exact all-pairs with lossless size prefilter)
# ---------------------------------------------------------------------------

def _shingled(spark: SparkSession, sf_dir: str,
              reuse: bool = False) -> DataFrame:
    """Distinct shingle-hash array per doc, computed by the VECTORIZED
    kernel (functions/sigkernel.py: one narrow Arrow map, numpy
    segment-Horner hashing — bit-identical to the HOF fragments the
    DuckDB oracles replay, pinned by tests/test_sigkernel.py).  The
    interpreted HOF form cost 26-194 s per benched query at sf0.1
    (r4 VERDICT, reproduced); the kernel is the 100 TB path.

    ``reuse=True`` persists the frame: the LSH operators reference it
    from 3-4 plan branches (band self-join sides + verify joins) and
    Spark recomputes common subplans per branch.  Cache lifetime is
    caller-owned: the persist is registered with runtime.track_cache,
    and harnesses release between queries."""
    from ..functions.sigkernel import signature_frame

    out = signature_frame(_docs(spark, sf_dir), SHINGLE_W, minhash=False)
    return track_cache(out) if reuse else out


_SHINGLED_CTE_DUCK = f"""
    shingled as (
        select doc_id, {K.shingle_hashes('text', SHINGLE_W, DUCK)} as sh
        from documents
    ), sized as (
        select doc_id, sh, {K.asize('sh', DUCK)} as n_sh from shingled
    )
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs w-shingle jaccard ≥ τ (exact). The size-ratio prefilter is
    lossless, cutting candidate pairs before the set intersection; at real
    scale this operator only ever runs on LSH candidates."""
    s = _shingled(spark, sf_dir, reuse=True)
    a, b = s.alias("a"), s.alias("b")
    jac = K.jaccard("a.sh", "b.sh", "a.n_sh", "b.n_sh", SPARK)
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least("a.n_sh", "b.n_sh")
               >= JACCARD_TAU * F.greatest("a.n_sh", "b.n_sh")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.expr(jac).alias("jacc"),
        )
        .filter(F.col("jacc") >= JACCARD_TAU)
    )


def ngram_jaccard_pairs_oracle() -> str:
    jac = K.jaccard("a.sh", "b.sh", "a.n_sh", "b.n_sh", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK}
        select a.doc_id as doc_id_a, b.doc_id as doc_id_b, {jac} as jacc
        from sized a join sized b
          on a.doc_id < b.doc_id
         and least(a.n_sh, b.n_sh) >= {JACCARD_TAU} * greatest(a.n_sh, b.n_sh)
        where {jac} >= {JACCARD_TAU}
    """


# ---------------------------------------------------------------------------
# set containment (prefix-filtered containment join, PPJoin-style)
# ---------------------------------------------------------------------------

#: containment threshold as an exact rational (4/5 = 0.8): the probe
#: count must be integer-exact in BOTH engines, so no float τ anywhere
#: in candidate generation
CONTAIN_NUM, CONTAIN_DEN = 4, 5
CONTAIN_TAU = CONTAIN_NUM / CONTAIN_DEN


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-substring detection: pairs with max-direction shingle
    containment |A∩B| / min(|A|,|B|) ≥ τ — the duplicates jaccard
    misses when one document CONTAINS the other (quote farms, page
    aggregations, boilerplate-wrapped mirrors: |A∩B|/|A∪B| shrinks with
    the size gap, |A∩B|/|A| does not).

    Candidate generation is a LOSSLESS prefix filter (the PPJoin-family
    trick, public knowledge): order every document's shingles by global
    document frequency (rarest first, shingle hash as the total
    tie-break), and probe with the first ``n - ⌈τ·n⌉ + 1`` of them.  If
    |A∩B| ≥ τ·min(|A|,|B|), then — taking A as the smaller side —
    fewer than ``(1-τ)·|A| + 1`` of A's shingles are missing from B,
    so at least one probe of A hits B's inverted index.  Completeness
    needs no assumption about WHICH subset probes; choosing the
    globally rarest minimizes the index fan-out.

    A second LOSSLESS prune, PPJoin's positional filter, runs before
    the exact verify: every occurrence carries its rank in the doc's
    frequency-sorted shingle order, and a candidate pair's overlap is
    bounded by ``1 + min(|A|-i, |B|-j)`` for a shared shingle at ranks
    (i, j) — all further common shingles sit after it on both sides.
    For a TRUE pair the first common shingle lies inside A's probe
    prefix (that is the prefix-filter theorem), so the best bound over
    the pair's probe hits is ≥ ⌈τ·min⌉ and the prune keeps it; dense
    corpora shed ~99% of candidates here (measured sf0.1: 181k → the
    verify set) before paying any set intersection.

    Scale shape: one explode (scan-local), one hash-agg for document
    frequencies, one window over doc_id for the occurrence rank, one
    equi-join probe⋈index on the shingle hash, a pair-keyed hash-agg
    for the positional bound, then the exact verify on survivors —
    O(n·probes) with no quadratic stage.  A corpus-hot shingle
    (df ~ n) inflates the index side of its join key, but hot shingles
    are by construction never chosen as probes for any doc that has a
    rarer alternative; residual skew lands in AQE's skew-join split.
    The DuckDB oracle replays the identical plan, so losslessness is
    cross-checked: any pruned true pair would hash-mismatch the verify
    output (and tests pin equality against the unfiltered brute
    force)."""
    from pyspark.sql.window import Window

    s = _shingled(spark, sf_dir, reuse=True)
    occ = s.select("doc_id", "n_sh", F.explode("sh").alias("h"))
    freq = occ.groupBy("h").agg(F.count("*").alias("df"))
    # every occurrence ranked within its doc (rarest first, hash as
    # total tie-break); probe count = n - ⌈τ·n⌉ + 1, integer-exact:
    # ⌈4n/5⌉ = (4n+4) DIV 5
    win = Window.partitionBy("doc_id").orderBy("df", "h")
    # persisted: pos feeds BOTH the probe side (filtered prefix) and
    # the index side of the candidate join — without it the explode +
    # document-frequency agg + rank window execute once per branch
    pos = track_cache(
        occ.join(freq, "h")
        .withColumn("rn", F.row_number().over(win))
        .select("doc_id", "n_sh", "h", "rn")
    )
    probes = pos.filter(F.col("rn") <= F.expr(
        f"n_sh - ((({CONTAIN_NUM} * n_sh + {CONTAIN_DEN - 1})"
        f" DIV {CONTAIN_DEN})) + 1"))
    p, x = probes.alias("p"), pos.alias("x")
    hits = (
        p.join(x, "h")
        .filter(F.col("p.doc_id") != F.col("x.doc_id"))
        .select(
            F.least("p.doc_id", "x.doc_id").alias("doc_id_a"),
            F.greatest("p.doc_id", "x.doc_id").alias("doc_id_b"),
            (F.lit(1) + F.least(
                F.col("p.n_sh") - F.col("p.rn"),
                F.col("x.n_sh") - F.col("x.rn"))).alias("bound"),
            F.least("p.n_sh", "x.n_sh").alias("m"),
        )
    )
    cand = (
        hits.groupBy("doc_id_a", "doc_id_b")
        .agg(F.max("bound").alias("ub"), F.max("m").alias("m"))
        .filter(F.col("ub") >= F.expr(
            f"({CONTAIN_NUM} * m + {CONTAIN_DEN - 1}) DIV {CONTAIN_DEN}"))
        .select("doc_id_a", "doc_id_b")
    )
    cont = K.containment("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", SPARK)
    sh = s.select("doc_id", "sh", "n_sh")
    return (
        cand.join(sh.alias("sa"), cand["doc_id_a"] == F.col("sa.doc_id"))
        .join(sh.alias("sb"), cand["doc_id_b"] == F.col("sb.doc_id"))
        .select("doc_id_a", "doc_id_b", F.expr(cont).alias("containment"))
        .filter(F.col("containment") >= CONTAIN_TAU)
    )


def containment_pairs_oracle() -> str:
    cont = K.containment("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK},
        occ as (select doc_id, n_sh, unnest(sh) as h from sized),
        freq as (select h, count(*) as df from occ group by h),
        pos as (
            select o.doc_id, o.n_sh, o.h,
                   row_number() over (partition by o.doc_id
                                      order by f.df, o.h) as rn
            from occ o join freq f using (h)
        ),
        probes as (
            select * from pos
            where rn <= n_sh
                        - (({CONTAIN_NUM} * n_sh + {CONTAIN_DEN - 1})
                           // {CONTAIN_DEN}) + 1
        ),
        hits as (
            select least(p.doc_id, x.doc_id) as doc_id_a,
                   greatest(p.doc_id, x.doc_id) as doc_id_b,
                   1 + least(p.n_sh - p.rn, x.n_sh - x.rn) as bound,
                   least(p.n_sh, x.n_sh) as m
            from probes p join pos x using (h)
            where p.doc_id <> x.doc_id
        ),
        cand as (
            select doc_id_a, doc_id_b
            from hits
            group by doc_id_a, doc_id_b
            having max(bound) >= ({CONTAIN_NUM} * max(m)
                                  + {CONTAIN_DEN - 1}) // {CONTAIN_DEN}
        )
        select cand.doc_id_a, cand.doc_id_b, {cont} as containment
        from cand
        join sized sa on cand.doc_id_a = sa.doc_id
        join sized sb on cand.doc_id_b = sb.doc_id
        where {cont} >= {CONTAIN_NUM} / {CONTAIN_DEN}
    """


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _explode_bands(sig: DataFrame, carry: list[str]) -> DataFrame:
    """(carry..., band_idx, band_key) — one row per (doc, LSH band) from
    a signature frame with mh0..mh{N-1} columns. Explode (not a union of
    per-band selects) so the upstream signature kernel executes ONCE:
    a union re-runs every non-persisted parent branch per band."""
    structs = F.array(*[
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.concat_ws(",", *[
                f"mh{j}" for j in range(bi * LSH_ROWS, (bi + 1) * LSH_ROWS)
            ]).alias("band_key"),
        )
        for bi in range(LSH_BANDS)
    ])
    return (
        sig.select(*carry, F.explode(structs).alias("bk"))
        .select(*carry, "bk.band_idx", "bk.band_key")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures → banded LSH candidate join → exact jaccard
    verify ≥ τ.

    The candidate join is an equi-join on (band_idx, band_key): at 10^12
    docs this is the only shuffle, keyed by a near-uniform 4-minhash
    concatenation — no O(n²) stage anywhere.  Signatures come from the
    vectorized kernel (one Arrow map; persisted because the frame feeds
    both self-join sides AND the verify join)."""
    from ..functions.sigkernel import signature_frame

    s = track_cache(signature_frame(
        _docs(spark, sf_dir), SHINGLE_W, minhash=True))
    bands = _explode_bands(s, ["doc_id"])
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    sh = s.select("doc_id", "sh", "n_sh")
    jac = K.jaccard("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", SPARK)
    return (
        cand.join(sh.alias("sa"), cand["doc_id_a"] == F.col("sa.doc_id"))
        .join(sh.alias("sb"), cand["doc_id_b"] == F.col("sb.doc_id"))
        .select("doc_id_a", "doc_id_b", F.expr(jac).alias("jacc"))
        .filter(F.col("jacc") >= JACCARD_TAU)
    )


def minhash_lsh_pairs_oracle() -> str:
    mh_cols = ", ".join(
        f"{K.minhash('sh', j, DUCK)} as mh{j}" for j in range(N_MINHASH)
    )
    band_rows = " union all ".join(
        "select doc_id, {bi} as band_idx, concat_ws(',', {cols}) as band_key"
        " from sig".format(
            bi=bi,
            cols=", ".join(
                f"mh{j}" for j in range(bi * LSH_ROWS, (bi + 1) * LSH_ROWS)
            ),
        )
        for bi in range(LSH_BANDS)
    )
    jac = K.jaccard("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK},
        sig as (select doc_id, sh, n_sh, {mh_cols} from sized),
        bands as ({band_rows}),
        cand as (
            select distinct a.doc_id as doc_id_a, b.doc_id as doc_id_b
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
             and a.doc_id < b.doc_id
        )
        select cand.doc_id_a, cand.doc_id_b, {jac} as jacc
        from cand
        join sized sa on cand.doc_id_a = sa.doc_id
        join sized sb on cand.doc_id_b = sb.doc_id
        where {jac} >= {JACCARD_TAU}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit simhash over the shingle-hash set, computed
    in-kernel (functions/sigkernel.py: the per-bit ±1 votes are one
    numpy bit-matrix ``reduceat`` inside the same Arrow map that hashes
    the shingles) — a NARROW plan with zero shuffle, where the previous
    explode + 32-conditional-sum hash aggregate shuffled every shingle
    hash on doc_id. Values match the fold-based DuckDB oracle
    bit-for-bit (pinned in tests/test_sigkernel.py)."""
    from ..functions.sigkernel import signature_frame

    return signature_frame(
        _docs(spark, sf_dir), SHINGLE_W, minhash=False, simhash=True
    ).select("doc_id", "simhash")


def simhash_fingerprints_oracle() -> str:
    return f"""
        with {_SHINGLED_CTE_DUCK}
        select doc_id, {K.simhash('sh', DUCK)} as simhash from sized
    """


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ 3, via 4×8-bit banded join.

    Pigeonhole: ≤ 3 differing bits cannot touch all 4 bands, so the banded
    equi-join is recall-complete for the threshold — the scalable version
    of the quadratic hamming scan, same plan shape as MinHash-LSH."""
    # persisted: fp feeds BOTH sides of the band self-join — without it
    # the shingle explode + 32-vote aggregate runs twice per doc (the
    # same reason minhash_lsh_pairs persists its signature frame).
    # track_cache registers it for harness-side release (no leak in a
    # long-lived session).
    fp = track_cache(simhash_fingerprints(spark, sf_dir))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.expr(f"(simhash DIV {1 << (8 * bi)}) % 256")
                .alias("band_key"),
            )
            for bi in range(SIMHASH_BANDS)
        ]
    )
    bands = fp.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bk")
    ).select("doc_id", "simhash", "bk.band_idx", "bk.band_key")
    ham = K.hamming("a.simhash", "b.simhash", SPARK)
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            # bigint on BOTH engines: Spark bit_count is int32, DuckDB's
            # TINYINT — an aligned declared type is part of the contract
            F.expr(ham).cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


def simhash_pairs_oracle() -> str:
    band_rows = " union all ".join(
        f"select doc_id, simhash, {bi} as band_idx,"
        f" ((simhash // {1 << (8 * bi)}) % 256) as band_key from fp"
        for bi in range(SIMHASH_BANDS)
    )
    ham = K.hamming("a.simhash", "b.simhash", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK},
        fp as (select doc_id, {K.simhash('sh', DUCK)} as simhash from sized),
        bands as ({band_rows})
        select distinct a.doc_id as doc_id_a, b.doc_id as doc_id_b,
               cast({ham} as bigint) as hamming
        from bands a join bands b
          on a.band_idx = b.band_idx and a.band_key = b.band_key
         and a.doc_id < b.doc_id
        where {ham} <= {SIMHASH_MAX_HAMMING}
    """


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ τ on float64-cast vectors.

    All-pairs here (oracle-checkable); the scale path is the IVF-bucketed
    join in operators/similarity.py (same cosine expression)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr(K.as_double_array("embedding", SPARK)).alias("v")
    )
    cos = K.cosine("a.v", "b.v", SPARK)
    return (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.expr(cos).alias("cos"),
        )
        .filter(F.col("cos") >= COSINE_TAU)
    )


def embedding_neardup_pairs_oracle() -> str:
    cos = K.cosine("a.v", "b.v", DUCK)
    return f"""
        with e as (
            select vec_id, {K.as_double_array('embedding', DUCK)} as v
            from embeddings
        )
        select a.vec_id as vec_id_a, b.vec_id as vec_id_b, {cos} as cos
        from e a join e b on a.vec_id < b.vec_id
        where {cos} >= {COSINE_TAU}
    """


# ---------------------------------------------------------------------------
# incremental dedup (new ingest batch vs existing corpus)
# ---------------------------------------------------------------------------

#: synthetic batch split for the test tables: every 10th doc is "new"
INCR_BATCH_MOD = 10


def incremental_pairs_against_sketch(new_docs: DataFrame,
                                     sketch: DataFrame) -> DataFrame:
    """Ingest-time dedup core: near-dup pairs between a NEW batch (raw
    ``doc_id, text`` rows) and a corpus SKETCH (materialized banded
    signature rows — :func:`write_sketch_table` output).

    The corpus side is ONLY a scan of the sketch table: no shingle or
    minhash expression touches it (plan-asserted in
    tests/test_plan_shapes.py) — the signatures were computed once at
    ingest.  Per-batch cost is O(batch·bands) hashing on the new side
    plus one band equi-join against the bucketed table; the carried
    shingle sets make the jaccard verify join-local (no join back to
    the corpus).  A pair colliding in several bands computes its
    (deterministic) jaccard per collision and dedups after — cheaper
    than a pre-verify distinct, which would shuffle the candidate set
    twice."""
    nb = banded_signatures(new_docs).select(
        F.col("doc_id").alias("new_id"),
        F.col("sh").alias("new_sh"),
        F.col("n_sh").alias("new_n_sh"),
        "band_idx", "band_key",
    )
    corp = corpus_rename(sketch)
    jac = K.jaccard("new_sh", "corpus_sh", "new_n_sh", "corpus_n_sh", SPARK)
    return (
        nb.join(corp, ["band_idx", "band_key"])
        .select("new_id", "corpus_id", F.expr(jac).alias("jacc"))
        .filter(F.col("jacc") >= JACCARD_TAU)
        .distinct()
    )


def incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup: near-dup pairs between a NEW batch and the
    existing corpus — the filter a streaming ingest pipeline runs
    before appending to a 10^12-doc table.

    The corpus side reads the MATERIALIZED bucketed sketch table
    (written once per session by :func:`ensure_sketch_table`), so each
    ingest pays only its own batch's hashing — never a corpus re-hash.
    The test split is synthetic (doc_id % 10 == 0 is "new"); the split
    filters land on the sketch scan / documents scan respectively."""
    table = ensure_sketch_table(spark, sf_dir)
    sketch = spark.table(table).filter(
        F.col("doc_id") % INCR_BATCH_MOD != 0)
    new_docs = _docs(spark, sf_dir).filter(
        F.col("doc_id") % INCR_BATCH_MOD == 0)
    return incremental_pairs_against_sketch(new_docs, sketch)


def incremental_dedup_pairs_oracle() -> str:
    mh_cols = ", ".join(
        f"{K.minhash('sh', j, DUCK)} as mh{j}" for j in range(N_MINHASH)
    )
    band_rows = " union all ".join(
        "select doc_id, is_new, {bi} as band_idx,"
        " concat_ws(',', {cols}) as band_key from sig".format(
            bi=bi,
            cols=", ".join(
                f"mh{j}" for j in range(bi * LSH_ROWS, (bi + 1) * LSH_ROWS)
            ),
        )
        for bi in range(LSH_BANDS)
    )
    jac = K.jaccard("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK},
        sig as (
            select doc_id, sh, n_sh,
                   (doc_id % {INCR_BATCH_MOD} = 0) as is_new, {mh_cols}
            from sized
        ),
        bands as ({band_rows}),
        cand as (
            select distinct a.doc_id as new_id, b.doc_id as corpus_id
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
            where a.is_new and not b.is_new
        )
        select cand.new_id, cand.corpus_id, {jac} as jacc
        from cand
        join sized sa on cand.new_id = sa.doc_id
        join sized sb on cand.corpus_id = sb.doc_id
        where {jac} >= {JACCARD_TAU}
    """


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over the near-dup pair graph)
# ---------------------------------------------------------------------------

def _lsh_pairs_ctes_duck() -> str:
    """DuckDB CTE chain producing the verified MinHash-LSH pair graph
    (``pairs(src, dst)``) — the same banded-candidate + exact-jaccard
    verify that ``minhash_lsh_pairs`` runs in Spark, so the cluster
    oracles check the actual scale-path edge source bit-for-bit."""
    mh_cols = ", ".join(
        f"{K.minhash('sh', j, DUCK)} as mh{j}" for j in range(N_MINHASH)
    )
    band_rows = " union all ".join(
        "select doc_id, {bi} as band_idx, concat_ws(',', {cols}) as band_key"
        " from sig".format(
            bi=bi,
            cols=", ".join(
                f"mh{j}" for j in range(bi * LSH_ROWS, (bi + 1) * LSH_ROWS)
            ),
        )
        for bi in range(LSH_BANDS)
    )
    jac = K.jaccard("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", DUCK)
    return f"""
        sig as (select doc_id, sh, n_sh, {mh_cols} from sized),
        bands as ({band_rows}),
        cand as (
            select distinct a.doc_id as doc_id_a, b.doc_id as doc_id_b
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
             and a.doc_id < b.doc_id
        ),
        pairs as (
            select cand.doc_id_a as src, cand.doc_id_b as dst
            from cand
            join sized sa on cand.doc_id_a = sa.doc_id
            join sized sb on cand.doc_id_b = sb.doc_id
            where {jac} >= {JACCARD_TAU}
        )
    """

def star_contraction_labels(sym: DataFrame, max_rounds: int = 32,
                            rounds_out: list | None = None) -> DataFrame:
    """Connected-component labels by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond" — the published shared-nothing CC algorithm; public
    knowledge, no reference counterpart: the reference never clusters).

    ``sym`` is the symmetric edge frame (src, dst) without self-loops.
    Returns (doc_id, label) where label = the component's minimum
    doc_id — the same labeling min-label propagation produced, but in
    O(log² n) rounds instead of O(diameter): a 10^6-long chain
    converges in ~a dozen rounds, so no rounds-cap caveat ("hitting the
    cap leaves a finer partition") is needed.

    Each round is two contraction phases, each one hash-agg shuffle +
    one equi-join shuffle keyed on node id; per-round
    ``localCheckpoint`` keeps lineage flat.  Both phases strictly
    preserve component connectivity, so the fixed point is one star per
    component rooted at its minimum node.

    If ``rounds_out`` is given, the number of rounds run is appended —
    the round-count test uses it to pin the logarithmic behavior.
    """
    # canonical directed form: every undirected edge once, as (hi, lo)
    edges = (
        sym.filter(F.col("src") > F.col("dst"))
        .select("src", "dst").distinct().localCheckpoint()
    )
    # node set from the CHECKPOINTED edges, not from sym: sym is the
    # caller's lazy (and expensive — full LSH pipeline) plan, and since
    # it is symmetric without self-loops every node survives the
    # canonicalization above.  Reading sym here would re-execute the
    # whole pair plan a second time at the final labels join.
    first = edges.select(F.col("src").alias("doc_id"))
    nodes = first.union(
        edges.select(F.col("dst").alias("doc_id"))
    ).distinct()
    prev: tuple | None = None
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # -- large-star: every node v larger than a neighbor u is
        # re-pointed at m = min(Γ(u) ∪ {u}); each undirected edge is
        # emitted exactly once, from its smaller endpoint's group
        und = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = und.groupBy("src").agg(F.min("dst").alias("mv"))
        edges = (
            und.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(
                F.col("dst").alias("src"),
                F.least(F.col("src"), F.col("mv")).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        # -- small-star: edges now all point big→small; each node's
        # smaller neighbors (and the node itself) attach to their min
        mins2 = edges.groupBy("src").agg(F.min("dst").alias("mv"))
        edges = (
            edges.join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("mv").alias("dst"))
            .union(mins2.select("src", F.col("mv").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        # fixed point = the star forest reproduces itself: compare the
        # edge set by (count, order-independent hash) in one agg pass
        sig = edges.agg(
            F.count("*").alias("n"),
            # xor-fold, not sum: order-independent and cannot overflow
            # under ANSI mode
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"),
                       F.lit(0)).alias("chk"),
        ).collect()[0]
        cur = (sig["n"], sig["chk"])
        if cur == prev:
            break
        prev = cur
    if rounds_out is not None:
        rounds_out.append(rounds)
    # at the fixed point each non-root points at its component root;
    # roots (and isolated nodes, if any edge-less nodes were passed)
    # label themselves
    return (
        nodes.join(edges.withColumnRenamed("src", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("dst", "doc_id").alias("label"))
    )


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels (doc_id, label) over the jaccard pair
    graph via :func:`star_contraction_labels`.

    Edge source is ``minhash_lsh_pairs`` — the O(n·bands) banded
    candidate join with exact-jaccard verify — NOT the all-pairs theta
    join (``ngram_jaccard_pairs``), which is the small-scale exactness
    oracle only. Both apply the identical jaccard ≥ τ verify, so at any
    scale where LSH recall is complete the labelings coincide; at 10^12
    docs only the LSH plan survives."""
    edges = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return star_contraction_labels(sym)


def duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters: one row per duplicate component (id, size,
    extrema)."""
    return _cc_labels(spark, sf_dir).groupBy(
        F.col("label").alias("cluster_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step: the surviving document set after near-dedup —
    every unclustered doc plus the canonical (min-doc_id) member of each
    duplicate cluster. At scale this is the filter a training-data
    pipeline runs before tokenization: a left-anti join of the corpus
    against the non-canonical members. No forced broadcast — on a
    near-dup-heavy corpus the loser set is a large fraction of the
    corpus, so AQE decides broadcast-vs-shuffle by measured size."""
    labels = _cc_labels(spark, sf_dir)
    losers = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def dedup_keep_canonical_oracle() -> str:
    return f"""
        with recursive {_SHINGLED_CTE_DUCK},
        {_lsh_pairs_ctes_duck()},
        edges as (
            select src, dst from pairs
            union all
            select dst, src from pairs
        ),
        nodes as (select distinct src as doc_id from edges),
        reach(doc_id, label) as (
            select doc_id, doc_id from nodes
            union
            select e.src, r.label from edges e join reach r on e.dst = r.doc_id
        ),
        lab as (select doc_id, min(label) as cluster_id from reach group by doc_id)
        select d.doc_id from documents d
        left join lab on d.doc_id = lab.doc_id
        where lab.doc_id is null or lab.cluster_id = d.doc_id
    """


def duplicate_clusters_oracle() -> str:
    return f"""
        with recursive {_SHINGLED_CTE_DUCK},
        {_lsh_pairs_ctes_duck()},
        edges as (
            select src, dst from pairs
            union all
            select dst, src from pairs
        ),
        nodes as (select distinct src as doc_id from edges),
        reach(doc_id, label) as (
            select doc_id, doc_id from nodes
            union
            select e.src, r.label from edges e join reach r on e.dst = r.doc_id
        ),
        lab as (select doc_id, min(label) as cluster_id from reach group by doc_id)
        select cluster_id, cast(count(*) as bigint) as n_docs,
               min(doc_id) as min_doc, max(doc_id) as max_doc
        from lab group by cluster_id
    """


# ---------------------------------------------------------------------------
# bucketed sketch materialization: the candidate join without its shuffle
# ---------------------------------------------------------------------------


def banded_signatures(docs: DataFrame) -> DataFrame:
    """The ingest-time sketch rows for a ``doc_id, text`` frame: one row
    per (doc, LSH band) carrying the distinct shingle-hash set, its
    size, and the band key — the SINGLE definition of the MinHash
    banding that every consumer (bucketed sketch write, incremental
    batch join, streaming stream-static join) shares, so a sketch
    written at ingest time joins bit-identically against signatures
    computed in-plan.

    Signatures come from the vectorized Arrow kernel and the bands from
    one explode — the whole frame is a single narrow pass over the
    input (the old HOF-expression + per-band-union form ran the
    interpreted hash chain once per band)."""
    from ..functions.sigkernel import signature_frame

    sig = signature_frame(docs, SHINGLE_W, minhash=True)
    return _explode_bands(sig, ["doc_id", "sh", "n_sh"])


def corpus_rename(bands: DataFrame) -> DataFrame:
    """Rename sketch rows to the ``corpus_*`` side of an
    ingest-vs-corpus join — the ONE definition shared by the batch
    incremental join (:func:`incremental_pairs_against_sketch`) and the
    streaming stream-static join (``streaming.windows``), so a sketch
    schema change cannot drift the two consumers apart."""
    return bands.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("sh").alias("corpus_sh"),
        F.col("n_sh").alias("corpus_n_sh"),
        "band_idx", "band_key",
    )


def write_sketch_table(spark: SparkSession, docs: DataFrame, table: str,
                       path: str, buckets: int = 64) -> None:
    """Materialize the banded MinHash sketch as a BUCKETED, sorted
    table: ``bucketBy(buckets, band_idx, band_key)`` co-locates every
    band bucket, so the LSH candidate self-join — the single biggest
    shuffle in near-dedup at 10^12 docs — runs with NO Exchange on
    either side (Spark's bucketed SortMergeJoin reads both sides
    pre-partitioned and pre-sorted).  Signatures are computed ONCE at
    ingest; every later dedup pass (self-join via
    :func:`sketch_table_pairs`, incremental batch join via
    :func:`incremental_pairs_against_sketch`, streaming stream-static
    join via ``streaming.windows.corpus_sketch_from_table``) reads this
    table instead of re-hashing the corpus.

    Rows carry the shingle set alongside the band key (2 bands → 2×
    storage) so the jaccard verify needs no extra join back to the
    corpus — the post-candidate work is scan-local."""
    (
        banded_signatures(docs).write.format("parquet")
        .bucketBy(buckets, "band_idx", "band_key")
        .sortBy("band_idx", "band_key")
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def append_to_sketch_table(spark: SparkSession, new_docs: DataFrame,
                           table: str, buckets: int = 64) -> None:
    """The accept step of incremental ingest: after a new batch passes
    :func:`incremental_pairs_against_sketch` (or its duplicates are
    resolved), append the batch's banded signatures to the sketch table
    so the NEXT ingest — batch or streaming — sees these docs as corpus.
    This completes the sketch lifecycle: write once at bootstrap,
    append per accepted batch, never re-hash the corpus.

    The append declares the same bucket spec as the bootstrap write
    (Spark refuses mismatched bucketing on an existing table, so drift
    is an error, not silent corruption). Each append adds one file per
    touched bucket; the bucketed self-join stays Exchange-free below
    the join — Spark reads multi-file buckets co-located (it may
    re-sort within a partition, never reshuffle). Periodic compaction
    of many-append tables is ordinary parquet file management."""
    (
        banded_signatures(new_docs).write.format("parquet")
        .bucketBy(buckets, "band_idx", "band_key")
        .sortBy("band_idx", "band_key")
        .mode("append")
        .saveAsTable(table)
    )


#: session-memoized sketch tables: (app id, abs sf_dir) -> table name
_SKETCH_TABLES: dict[tuple[str, str], str] = {}


def ensure_sketch_table(spark: SparkSession, sf_dir: str,
                        buckets: int = 8) -> str:
    """Write-once-per-session sketch materialization for a test-scale
    ``sf_dir`` — the harness-facing stand-in for the ingest-time write
    a production table gets when documents are appended.  Registered
    queries (dedup_sketch_pairs, dedup_incremental) call this so one
    check_oracle / bench session hashes the corpus exactly once, then
    every dedup pass reads the bucketed table."""
    import os
    import re
    import tempfile

    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no context handle — key by session
        app = str(id(spark))
    key = (app, os.path.abspath(sf_dir))
    got = _SKETCH_TABLES.get(key)
    if got is not None and spark.catalog.tableExists(got):
        return got
    # tag carries a digest of the FULL path: two corpora that share a
    # basename (/a/corpus vs /b/corpus) must not collide on one table
    # name / warehouse path, or the second overwrite silently serves
    # the wrong corpus' signatures to the first corpus' memo entry
    import hashlib

    abs_dir = os.path.abspath(sf_dir)
    digest = hashlib.sha1(abs_dir.encode()).hexdigest()[:10]
    tag = re.sub(r"\W+", "_", os.path.basename(abs_dir)) + "_" + digest
    table = f"pdfx_sketch_{tag}"
    path = os.path.join(tempfile.gettempdir(), f"pdfx_sketch_{tag}")
    write_sketch_table(spark, _docs(spark, sf_dir), table, path,
                       buckets=buckets)
    _SKETCH_TABLES[key] = table
    return table


#: two-batch ingest split for the registered lifecycle query:
#: doc_id % 10 == 5 arrives first (batch 1), % 10 == 0 second (batch 2);
#: everything else is the bootstrap corpus
INGEST_B1, INGEST_B2 = 5, 0


def ingest_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full incremental-ingest lifecycle as ONE registered,
    oracle-pinned query: bootstrap the bucketed sketch from the standing
    corpus, probe ingest batch 1 against it, APPEND batch 1's
    signatures, then probe batch 2 against the grown sketch — so a
    batch-2 document duplicating a batch-1 document is caught even
    though neither was in the bootstrap corpus.  This is the loop a
    production ingest runs forever: the corpus is hashed exactly once,
    each batch pays only its own hashing (r4 VERDICT stretch item 7).

    Emits (new_id, corpus_id, jacc, phase): phase 'b1' rows matched the
    bootstrap corpus, 'b2' rows matched bootstrap ∪ batch 1.  Batch-1
    probes are materialized (localCheckpoint) BEFORE the append — a
    lazy plan would re-list the table's files after the append and see
    its own batch as corpus."""
    import hashlib
    import os
    import tempfile

    docs = _docs(spark, sf_dir)
    mod = F.col("doc_id") % INCR_BATCH_MOD
    old = docs.filter((mod != INGEST_B1) & (mod != INGEST_B2))
    b1 = docs.filter(mod == INGEST_B1)
    b2 = docs.filter(mod == INGEST_B2)

    digest = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    table = f"pdfx_ingest_{digest}"
    path = os.path.join(tempfile.gettempdir(), table)
    # overwrite-then-append keeps repeated invocations deterministic:
    # every call rebuilds the bootstrap state before its single append
    write_sketch_table(spark, old, table, path, buckets=8)
    p1 = incremental_pairs_against_sketch(
        b1, spark.table(table)
    ).withColumn("phase", F.lit("b1")).localCheckpoint()
    append_to_sketch_table(spark, b1, table, buckets=8)
    p2 = incremental_pairs_against_sketch(
        b2, spark.table(table)
    ).withColumn("phase", F.lit("b2"))
    return p1.unionByName(p2)


def ingest_lifecycle_oracle() -> str:
    mh_cols = ", ".join(
        f"{K.minhash('sh', j, DUCK)} as mh{j}" for j in range(N_MINHASH)
    )
    band_rows = " union all ".join(
        "select doc_id, ph, {bi} as band_idx,"
        " concat_ws(',', {cols}) as band_key from sig".format(
            bi=bi,
            cols=", ".join(
                f"mh{j}" for j in range(bi * LSH_ROWS, (bi + 1) * LSH_ROWS)
            ),
        )
        for bi in range(LSH_BANDS)
    )
    jac = K.jaccard("sa.sh", "sb.sh", "sa.n_sh", "sb.n_sh", DUCK)
    return f"""
        with {_SHINGLED_CTE_DUCK},
        sig as (
            select doc_id, sh, n_sh,
                   case when doc_id % {INCR_BATCH_MOD} = {INGEST_B1} then 1
                        when doc_id % {INCR_BATCH_MOD} = {INGEST_B2} then 2
                        else 0 end as ph,
                   {mh_cols}
            from sized
        ),
        bands as ({band_rows}),
        cand as (
            select distinct a.doc_id as new_id, b.doc_id as corpus_id,
                   a.ph as new_ph
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
            where (a.ph = 1 and b.ph = 0)
               or (a.ph = 2 and b.ph in (0, 1))
        )
        select cand.new_id, cand.corpus_id, {jac} as jacc,
               case when cand.new_ph = 1 then 'b1' else 'b2' end as phase
        from cand
        join sized sa on cand.new_id = sa.doc_id
        join sized sb on cand.corpus_id = sb.doc_id
        where {jac} >= {JACCARD_TAU}
    """


def cap_band_buckets(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Skew control for the LSH candidate join: drop band buckets with
    more than ``max_bucket`` members before the self-join.

    At web scale a single degenerate band key — empty documents,
    templated boilerplate, crawler error pages — can hold millions of
    docs, and the self-join then materializes k²/2 candidate pairs from
    ONE key: the classic hot-key stage that stalls a 1000-executor job
    on a single task. Production LSH dedup caps the bucket (the
    pigeonhole still gives every near-dup pair LSH_BANDS chances to
    collide in a non-degenerate band, and truly giant buckets are
    better handled by exact dedup — their members are near-identical
    by construction).

    The cap is a windowed count over (band_idx, band_key) — on the
    bucketed sketch table the window's partitioning matches the bucket
    spec, so it adds NO Exchange (plan-asserted). Recall tradeoff is
    explicit: callers opt in with ``max_band_bucket``; the registered
    oracle queries run uncapped."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("band_idx", "band_key")
    return (
        bands.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_bucket_n") <= max_bucket)
        .drop("_bucket_n")
    )


def sketch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of the sketch-table self-join: materialize the
    bucketed sketch (once per session), then the zero-Exchange banded
    candidate join + jaccard verify.  Produces exactly the
    minhash_lsh_pairs row set — the oracle reuses that SQL — but with
    the corpus hashed once at write time instead of per query."""
    return sketch_table_pairs(spark, ensure_sketch_table(spark, sf_dir))


def sketch_table_pairs(spark: SparkSession, table: str,
                       max_band_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs from a bucketed sketch table: the banded
    candidate equi-join runs bucket-to-bucket (zero Exchange below the
    join — asserted by tests/test_plan_shapes.py), then the exact
    jaccard verify on the carried shingle sets.

    ``max_band_bucket`` opts into hot-bucket skew control
    (:func:`cap_band_buckets`); the windowed count rides the table's
    bucketing, so the capped plan is still Exchange-free below the
    join."""
    from ..functions import sqlkit as K
    from ..functions.sqlkit import SPARK

    t = spark.table(table)
    if max_band_bucket is not None:
        t = cap_band_buckets(t, max_band_bucket)
    jac = K.jaccard("a.sh", "b.sh", "a.n_sh", "b.n_sh", SPARK)
    return (
        t.alias("a")
        .join(t.alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.expr(jac).alias("jacc"),
        )
        .filter(F.col("jacc") >= JACCARD_TAU)
        .distinct()
    )
