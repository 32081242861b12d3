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
