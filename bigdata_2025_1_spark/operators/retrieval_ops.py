"""Retrieval-composition operators: reciprocal rank fusion (RRF) — the
standard way to combine rankings from heterogeneous retrievers (BM25 +
dense, or here: cosine vs raw inner product) without score calibration.

RRF(d) = Σ_r 1/(K + rank_r(d)) over retrievers r, K=60 (Cormack et al.).
Ranks are integers (row_number with a deterministic tiebreak), so the
fused score is the same IEEE double in any engine — fusion needs NO
cross-engine float trust beyond identical arithmetic on identical ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import vectors as V
from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query

RRF_K = 60
N_PROBES = 25  # probe set (vec_id < 25): smaller than ann_topk's 50 —
# every (probe, corpus) pair is ranked TWICE here
TOP_K = 5
_DIM = 64

_SQL_DOT = V.sql_dot_scaled("qa.embedding", "qb.embedding", _DIM)
_SQL_NORM = V.sql_dot_scaled("embedding", "embedding", _DIM)


@query(
    "rrf_rank_fusion",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, embedding, {_SQL_NORM} AS nsq FROM embeddings
    ), pairs AS (
      SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
             {_SQL_DOT} AS dot_i,
             {_SQL_DOT}::DOUBLE / (sqrt(qa.nsq::DOUBLE) * sqrt(qb.nsq::DOUBLE)) AS cosine
      FROM norms qa JOIN norms qb
        ON qa.vec_id < {N_PROBES} AND qa.vec_id <> qb.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS r_cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_i DESC, neighbor_id) AS r_dot
      FROM pairs
    ), fused AS (
      SELECT query_id, neighbor_id,
             1.0 / ({RRF_K} + r_cos) + 1.0 / ({RRF_K} + r_dot) AS rrf,
             CAST(r_cos AS INT) AS r_cos, CAST(r_dot AS INT) AS r_dot
      FROM ranked
    )
    SELECT query_id, neighbor_id, rrf, r_cos, r_dot
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, neighbor_id) AS rk
          FROM fused)
    WHERE rk <= {TOP_K}
    ORDER BY query_id, rrf DESC, neighbor_id
    """,
)
def rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion of two retrievers over the same probe set:
    cosine similarity (normalized) and raw inner product (magnitude-
    sensitive) rank every candidate independently; the fused top-5 per
    probe favors candidates BOTH rankings place high. This is the
    composition layer a hybrid search pipeline puts above its ANN
    retrievers (swap either ranking for BM25/SRP/IVF lists unchanged).

    Determinism: both ranks are row_number over exact int64 scores
    (scaled dot; cosine's ordering is pinned by the same ints) with
    neighbor_id tiebreaks; rrf = two double divisions on small ints,
    identical both engines.

    Scale shape: probes broadcast against the corpus (no corpus
    shuffle); the double window runs behind ONE query_id exchange —
    fusing R retrievers adds windows, not shuffles. At real scale each
    retriever contributes only its own top-N list (tiny) and fusion
    joins those lists — this query fuses FULL rankings to keep the
    oracle total."""
    emb = load(spark, sf_dir, "embeddings")
    norms = spread(emb).select(
        "vec_id", "embedding", V.norm_sq_scaled(F.col("embedding")).alias("nsq")
    )
    probes = norms.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    corpus = norms.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nsq").alias("c_nsq"),
    )
    dot_i = V.dot_scaled(F.col("q_emb"), F.col("c_emb"))
    cosine = V.cosine_from_scaled(dot_i, F.col("q_nsq"), F.col("c_nsq"))
    pairs = (
        corpus.join(F.broadcast(probes), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot_i.alias("dot_i"),
            cosine.alias("cosine"),
        )
    )
    by_q = Window.partitionBy("query_id")
    r_cos = F.row_number().over(by_q.orderBy(F.desc("cosine"), "neighbor_id"))
    r_dot = F.row_number().over(by_q.orderBy(F.desc("dot_i"), "neighbor_id"))
    fused = pairs.select(
        "query_id",
        "neighbor_id",
        r_cos.alias("r_cos_l"),
        r_dot.alias("r_dot_l"),
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.lit(1.0) / (F.lit(RRF_K) + F.col("r_cos_l"))
            + F.lit(1.0) / (F.lit(RRF_K) + F.col("r_dot_l"))
        ).alias("rrf"),
        F.col("r_cos_l").cast("int").alias("r_cos"),
        F.col("r_dot_l").cast("int").alias("r_dot"),
    )
    rk = F.row_number().over(by_q.orderBy(F.desc("rrf"), "neighbor_id"))
    return (
        fused.withColumn("rk", rk)
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rrf", "r_cos", "r_dot")
        .orderBy("query_id", F.desc("rrf"), "neighbor_id")
    )
