"""Similarity search over an embedding column (`array<float>`).

Two operators, both pure Catalyst expressions (sequential float64 folds —
see functions/sqlkit.py for why that cross-checks bit-identically against
the DuckDB oracle):

  * brute-force cosine top-k — the exactness baseline. The query set is
    broadcast against the corpus (queries ≪ corpus), so the corpus side
    never shuffles: scan → broadcast-nested-loop → per-query top-k via a
    rank window partitioned by query id. At 10^12 vectors the window
    shuffles only (n_queries × corpus_partition) candidate rows after a
    partial per-partition top-k (Spark's TakeOrderedAndProject handles the
    global top-k when k is small).
  * IVF top-k — the scale path: vectors are pre-assigned to coarse cells
    (the table's `label` column stands in for a k-means coarse quantizer,
    which at production scale is trained offline and broadcast). The search
    joins queries to ONLY their own cell's vectors — an equi-join on the
    cell id that prunes the candidate set by ~n_cells× before any distance
    math runs.

No counterpart in the reference engine (SURVEY.md §2.9) — training-data
pipeline extension from the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import sqlkit as K
from ..functions.sqlkit import DUCK, SPARK
from ..runtime import track_cache

TOP_K = 5
QUERY_STRIDE = 83  # query set = vec_id % 83 == 0 (deterministic, tiny)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label",
        F.expr(K.as_double_array("embedding", SPARK)).alias("v"),
    )


def _topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the deterministic query subset."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    cos = K.cosine("q.v", "c.v", SPARK)
    scored = (
        F.broadcast(q.alias("q"))
        .join(emb.alias("c"), F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
            F.expr(cos).alias("cos"),
        )
    )
    return _topk(scored)


def ann_bruteforce_topk_oracle() -> str:
    cos = K.cosine("q.v", "c.v", DUCK)
    return f"""
        with e as (
            select vec_id, label, {K.as_double_array('embedding', DUCK)} as v
            from embeddings
        ), scored as (
            select q.vec_id as query_id, c.vec_id as cand_id, {cos} as cos
            from e q join e c on q.vec_id % {QUERY_STRIDE} = 0
                             and q.vec_id <> c.vec_id
        ), ranked as (
            select query_id, cand_id, cos,
                   cast(row_number() over (
                       partition by query_id
                       order by cos desc, cand_id asc) as int) as rank
            from scored
        )
        select query_id, cand_id, cos, rank from ranked
        where rank <= {TOP_K}
    """


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style top-k: candidates restricted to the query's coarse cell.

    The cell equi-join replaces the all-pairs nested loop — this is the
    plan that survives 10^12 vectors (shuffle keyed by cell id; skewed
    cells split by AQE)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    cos = K.cosine("q.v", "c.v", SPARK)
    scored = (
        F.broadcast(q.alias("q"))
        .join(
            emb.alias("c"),
            (F.col("q.label") == F.col("c.label"))
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
            F.expr(cos).alias("cos"),
        )
    )
    return _topk(scored)


def ann_ivf_topk_oracle() -> str:
    cos = K.cosine("q.v", "c.v", DUCK)
    return f"""
        with e as (
            select vec_id, label, {K.as_double_array('embedding', DUCK)} as v
            from embeddings
        ), scored as (
            select q.vec_id as query_id, c.vec_id as cand_id, {cos} as cos
            from e q join e c on q.vec_id % {QUERY_STRIDE} = 0
                             and q.label = c.label
                             and q.vec_id <> c.vec_id
        ), ranked as (
            select query_id, cand_id, cos,
                   cast(row_number() over (
                       partition by query_id
                       order by cos desc, cand_id asc) as int) as rank
            from scored
        )
        select query_id, cand_id, cos, rank from ranked
        where rank <= {TOP_K}
    """


# ---------------------------------------------------------------------------
# SRP-LSH: sign-random-projection near-dup (label-free scale path)
# ---------------------------------------------------------------------------

SRP_BITS = 16
SRP_ROWS = 4
SRP_BANDS = SRP_BITS // SRP_ROWS
SRP_COS_TAU = 0.45  # same verify threshold as dedup_embedding_cosine


def _srp_bit(v: str, j: int, d: str) -> str:
    """Bit j of the sign-random-projection signature: sign of dot(v,
    h_j) where hyperplane h_j[i] = ±1 comes from a deterministic
    integer mix of (dimension i, plane j) — identical arithmetic in
    both engines, so the oracle cross-checks the exact signature. The
    mixed value's 16th bit is used (the low bit of a linear form is
    just parity(i+j) — correlated, not pseudo-random)."""
    mix = K.intdiv(f"(i * 2654435761 + {(j + 1) * 40503})", "65536", d)
    lam = (f"i -> {K.at(v, 'i', d)} * "
           f"(1.0 - 2.0 * cast(({mix}) % 2 as double))")
    prods = K.xform(K.seq1(K.asize(v, d), d), lam, d)
    proj = K.fold(prods, "cast(0.0 as double)", "(acc, x) -> acc + x", d)
    return f"(case when {proj} >= 0 then 1 else 0 end)"


def _srp_band_key(v: str, bi: int, d: str) -> str:
    terms = " + ".join(
        f"({_srp_bit(v, bi * SRP_ROWS + r, d)} * {1 << r})"
        for r in range(SRP_ROWS)
    )
    return f"({terms})"


def srp_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH banding + exact cosine
    verify — the scale sibling of ``dedup_embedding_cosine`` that needs
    NO precomputed cell labels (ann_ivf's coarse quantizer): candidate
    generation is a banded equi-join on 4-bit signature bands, O(n·bands)
    like MinHash-LSH, then the same cosine ≥ τ verify. Recall is
    probabilistic by construction (banding trades recall for the
    elimination of the O(n²) stage); the oracle mirrors the bands
    exactly so the cross-check is deterministic.

    Perf note: the signature is 16 interpreted Catalyst folds per row —
    chosen because sequential float64 folds cross-check bit-identically
    against DuckDB (the text_fingerprint tradeoff). At production scale
    the signature step becomes one Arrow-batched numpy matmul
    (vectors @ signs.T > 0) with the SAME banding plan downstream."""
    # cache lifetime is caller-owned (runtime.track_cache): harnesses
    # release between queries, so repeated invocations don't accumulate
    emb = track_cache(_emb(spark, sf_dir).select("vec_id", "v"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.expr(_srp_band_key("v", bi, SPARK)).alias("band_key"),
            )
            for bi in range(SRP_BANDS)
        ]
    )
    bands = emb.select(
        "vec_id", F.explode(band_structs).alias("bk")
    ).select("vec_id", "bk.band_idx", "bk.band_key")
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_key"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
        )
        .distinct()
    )
    cos = K.cosine("ea.v", "eb.v", SPARK)
    return (
        cand.join(emb.alias("ea"), cand["vec_id_a"] == F.col("ea.vec_id"))
        .join(emb.alias("eb"), cand["vec_id_b"] == F.col("eb.vec_id"))
        .select("vec_id_a", "vec_id_b", F.expr(cos).alias("cos"))
        .filter(F.col("cos") >= SRP_COS_TAU)
    )


def srp_neardup_pairs_oracle() -> str:
    band_rows = " union all ".join(
        f"select vec_id, {bi} as band_idx,"
        f" {_srp_band_key('v', bi, DUCK)} as band_key from e"
        for bi in range(SRP_BANDS)
    )
    cos = K.cosine("ea.v", "eb.v", DUCK)
    return f"""
        with e as (
            select vec_id, {K.as_double_array('embedding', DUCK)} as v
            from embeddings
        ),
        bands as ({band_rows}),
        cand as (
            select distinct a.vec_id as vec_id_a, b.vec_id as vec_id_b
            from bands a join bands b
              on a.band_idx = b.band_idx and a.band_key = b.band_key
             and a.vec_id < b.vec_id
        )
        select cand.vec_id_a, cand.vec_id_b, {cos} as cos
        from cand
        join e ea on cand.vec_id_a = ea.vec_id
        join e eb on cand.vec_id_b = eb.vec_id
        where {cos} >= {SRP_COS_TAU}
    """


def srp_signatures_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-path SRP signature stage: one Arrow-batched numpy
    matmul per batch (``vectors @ signs.T >= 0``) producing the SAME
    16-bit signatures as the Catalyst fold form (identical deterministic
    hyperplanes; equality is regression-tested). Downstream banding is
    unchanged — at 10^12 vectors this replaces 16 interpreted folds per
    row with one BLAS call per batch."""
    import numpy as np
    import pandas as pd

    def sig_batches(batches):
        signs_cache: dict[int, "np.ndarray"] = {}

        def signs_for(d: int) -> "np.ndarray":
            s = signs_cache.get(d)
            if s is None:
                i = np.arange(1, d + 1, dtype=np.int64)[:, None]
                j = np.arange(SRP_BITS, dtype=np.int64)[None, :]
                bit = ((i * 2654435761 + (j + 1) * 40503) // 65536) % 2
                s = (1.0 - 2.0 * bit).astype(np.float64)  # (d, bits)
                signs_cache[d] = s
            return s

        for b in batches:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in b["embedding"]]
            )
            proj = vecs @ signs_for(vecs.shape[1])
            bits = (proj >= 0).astype(np.int64)
            sig = (bits << np.arange(SRP_BITS, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({"vec_id": b["vec_id"], "srp_sig": sig})

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select("vec_id", "embedding").mapInPandas(
        sig_batches, schema="vec_id long, srp_sig long"
    )


def srp_signatures_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fold-form signatures as one integer per vector (test surface
    for fast-path equivalence)."""
    emb = _emb(spark, sf_dir)
    sig = " + ".join(
        f"({_srp_bit('v', j, SPARK)} * {1 << j})" for j in range(SRP_BITS)
    )
    return emb.select("vec_id", F.expr(sig).cast("long").alias("srp_sig"))


# ---------------------------------------------------------------------------
# trained IVF: sampled k-means coarse quantizer, no precomputed labels
# ---------------------------------------------------------------------------

IVF_K = 8            # coarse cells
IVF_SAMPLE_STRIDE = 5   # training sample = vec_id % stride == 0 (bounded)
IVF_NPROBE = 2       # probed cells per query
IVF_QSCALE = 1024    # quantization: round(x * 2^10) — power of two, exact


def _qv(v: str, d: str) -> str:
    """Quantize a double array to bigints: every subsequent k-means sum
    is EXACT integer math, so centroid training is order-independent and
    replays bit-identically in the DuckDB oracle (float group-sums would
    differ by engine-internal addition order). Scaling by a power of two
    keeps the multiply exact; round() matches across engines
    (half-away-from-zero in both)."""
    return K.xform(v, f"x -> cast(round(x * {IVF_QSCALE}) as bigint)", d)


def _l2q(a: str, b: str, d: str) -> str:
    """Integer squared-L2 between quantized vectors (sequential fold)."""
    diff = f"({K.at(a, 'i', d)} - {K.at(b, 'i', d)})"
    sq = K.xform(K.seq1(K.asize(a, d), d), f"i -> {diff} * {diff}", d)
    return K.fold(sq, "cast(0 as bigint)", "(acc, x) -> acc + x", d)


def _centroid_update(d: str) -> str:
    """Rounded integer mean array of a group's ``qv`` column: fold the
    collected list with elementwise adds (exact), divide by the count,
    round back to bigint — the Lloyd update, engine-identical."""
    lst = K.agg_list("qv", d)
    zeros = K.xform(K.at(lst, "1", d), "x -> cast(0 as bigint)", d)
    return K.fold(lst, zeros, f"(acc, q) -> {K.zipadd('acc', 'q', d)}", d)


def _assign_cte(src: str, cent: str, out_cols: str, rn_cap: int,
                d: str, extra_where: str = "") -> str:
    """Nearest-centroid(s) assignment: cross join the tiny centroid table
    (Spark broadcasts it), rank by integer L2 with cell as tie-break."""
    return f"""(
        select {out_cols}, cell from (
            select s.vec_id as vec_id, s.qv as qv, c.cell as cell,
                   row_number() over (
                       partition by s.vec_id
                       order by {_l2q('s.qv', 'c.qv', d)} asc, c.cell asc
                   ) as rn
            from {src} s cross join {cent} c {extra_where}
        ) t where rn <= {rn_cap}
    )"""


def _kmeans_ctes(d: str, table: str) -> str:
    """Shared WITH-prefix: quantized vectors, the deterministic sample,
    and 2 unrolled Lloyd iterations ending at ``cent2`` — used by both
    the trained-IVF search and the full assignment query."""
    vd = K.as_double_array("embedding", d)
    centroid = _centroid_update(d)
    mean = K.xform("sum_arr", "s -> cast(round((s * 1.0) / cnt) as bigint)", d)
    lloyd = ""
    prev = "cent0"
    for it in (1, 2):
        lloyd += f""",
        a{it} as {_assign_cte('samp', prev, 'vec_id, qv', 1, d)},
        c{it}s as (
            select cell, {centroid} as sum_arr, count(*) as cnt
            from a{it} group by cell
        ),
        cent{it} as (select cell, {mean} as qv from c{it}s)"""
        prev = f"cent{it}"
    return f"""e as (
            select vec_id, {vd} as v, {_qv(vd, d)} as qv from {table}
        ),
        samp as (select vec_id, qv from e where vec_id % {IVF_SAMPLE_STRIDE} = 0),
        cent0 as (
            select cell, qv from (
                select cast(row_number() over (order by vec_id) as int) - 1
                           as cell,
                       qv
                from samp
            ) t where cell < {IVF_K}
        ){lloyd}"""


def _ivf_trained_sql(d: str, table: str) -> str:
    """The whole trained-IVF pipeline as ONE dialect-parameterized SQL
    text: sampled k-means (2 unrolled Lloyd iterations on a deterministic
    sample, exact integer math throughout) → full-corpus cell assignment
    → multi-probe top-k. The Spark query and the DuckDB oracle are the
    same text modulo dialect, so the quantizer itself is oracle-checked,
    not just the final search."""
    cos = K.cosine("qe.v", "ce.v", d)
    return f"""
        with {_kmeans_ctes(d, table)},
        cells as {_assign_cte('e', 'cent2', 'vec_id', 1, d)},
        probe as {_assign_cte('e', 'cent2', 'vec_id', IVF_NPROBE, d,
                              f'where s.vec_id % {QUERY_STRIDE} = 0')},
        scored as (
            select p.vec_id as query_id, x.vec_id as cand_id, {cos} as cos
            from probe p
            join cells x on x.cell = p.cell and x.vec_id <> p.vec_id
            join e qe on qe.vec_id = p.vec_id
            join e ce on ce.vec_id = x.vec_id
        ),
        ranked as (
            select query_id, cand_id, cos,
                   cast(row_number() over (
                       partition by query_id
                       order by cos desc, cand_id asc) as int) as rank
            from scored
        )
        select query_id, cand_id, cos, rank from ranked
        where rank <= {TOP_K}
    """


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer — no precomputed
    ``label`` column (the gap ann_ivf_topk documents): sampled k-means
    fit in-plan (bounded sample, tiny centroid table that Spark
    broadcasts on every assignment join), nearest-centroid cell
    assignment in-scan, ``IVF_NPROBE``-cell probe per query.

    Scale shape: the Lloyd iterations touch only the sample (at 10^12
    vectors the stride becomes a fixed-size sample, same plan); the
    full-corpus pass is one broadcast nested-loop against ``IVF_K``
    rows — scan-local, no shuffle keyed on anything bigger than the
    final candidate join."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("ivf_embeddings_src")
    return spark.sql(_ivf_trained_sql(SPARK, "ivf_embeddings_src"))


def ann_ivf_trained_oracle() -> str:
    return _ivf_trained_sql(DUCK, "embeddings")


def _kmeans_assign_sql(d: str, table: str) -> str:
    """Full-corpus k-means cluster assignment under the trained
    quantizer: (vec_id, cell, l2q) — nearest centroid with the exact
    integer squared-L2 it won at."""
    return f"""
        with {_kmeans_ctes(d, table)}
        select vec_id, cell, l2q from (
            select s.vec_id as vec_id, c.cell as cell,
                   {_l2q('s.qv', 'c.qv', d)} as l2q,
                   row_number() over (
                       partition by s.vec_id
                       order by {_l2q('s.qv', 'c.qv', d)} asc, c.cell asc
                   ) as rn
            from e s cross join cent2 c
        ) t where rn = 1
    """


def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form: every embedding's trained-k-means cluster — the
    corpus-partitioning step topic/route pipelines run after training a
    coarse quantizer (the same ``cent2`` table the trained-IVF search
    probes, so assignments and search cells agree by construction).

    Scale shape: the Lloyd chain touches only the deterministic sample;
    the full pass is one broadcast nested loop against IVF_K rows, one
    per-vector rank over IVF_K candidates — scan-local, no shuffle of
    the corpus."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("kmeans_embeddings_src")
    return spark.sql(_kmeans_assign_sql(SPARK, "kmeans_embeddings_src"))


def embedding_kmeans_assign_oracle() -> str:
    return _kmeans_assign_sql(DUCK, "embeddings")
