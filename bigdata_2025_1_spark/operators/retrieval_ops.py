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


SQ_SHORTLIST = 64
_SQL_SCALED = V.sql_scaled_e9("embedding", _DIM)


@query(
    "ann_sq8_topk",
    oracle=f"""
    WITH coded AS MATERIALIZED (
      SELECT vec_id, embedding,
             {_SQL_NORM} AS nsq,
             list_max([abs(embedding[i]::DOUBLE) for i in range(1, {_DIM + 1})]) AS s,
             CASE WHEN list_max([abs(embedding[i]::DOUBLE) for i in range(1, {_DIM + 1})]) = 0
                  THEN [0.0::DOUBLE for i in range(1, {_DIM + 1})]
                  ELSE [ROUND(127 * embedding[i]::DOUBLE /
                              list_max([abs(embedding[j]::DOUBLE) for j in range(1, {_DIM + 1})]))
                        for i in range(1, {_DIM + 1})]
             END AS codes
      FROM embeddings
    ), scored AS (
      SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
             qb.s * CAST(list_dot_product(qa.codes, qb.codes) AS BIGINT) AS approx
      FROM coded qa JOIN coded qb
        ON qa.vec_id < {N_PROBES} AND qa.vec_id <> qb.vec_id
    ), short AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY approx DESC, neighbor_id) AS srk
            FROM scored)
      WHERE srk <= {SQ_SHORTLIST}
    ), rer AS (
      SELECT s.query_id, s.neighbor_id,
             {V.sql_dot_scaled('qa.embedding', 'qb.embedding', _DIM)}::DOUBLE
               / (sqrt(qa.nsq::DOUBLE) * sqrt(qb.nsq::DOUBLE)) AS cosine
      FROM short s
      JOIN coded qa ON qa.vec_id = s.query_id
      JOIN coded qb ON qb.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM rer)
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) ANN: each vector compresses to 64 int8
    codes + one float scale (max-abs per vector, 4× smaller than
    float32); the scoring scan ranks by ``scale_x · Σ q_code·x_code``
    (query-side constants drop out of a per-query ranking), then exact
    cosine re-ranks the top-64 shortlist. This is FAISS's SQ family —
    the third compression point next to PQ (``ann_pq_adc_topk``, 32×,
    codebook lookups) and IVF (partition pruning): SQ8 keeps a cheap
    in-register integer dot and near-exact recall at modest compression.

    Determinism: codes are round(127·x/maxabs) on identical doubles in
    both engines (zero-vectors guard to all-0 codes); the integer dot is
    exact (≤ 64·127² ≪ 2⁵³ even as DuckDB doubles); the approx score is
    ONE double multiply of (scale × int); the re-rank is the exact
    int64-scaled cosine used by every ANN twin. All JVM higher-order
    exprs — no UDF anywhere.

    Scale shape: probes broadcast; the corpus scan reads codes+scale
    only; raw embeddings are joined back just for shortlist rows."""
    emb = load(spark, sf_dir, "embeddings")
    absed = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    s = F.array_max(absed)
    codes = F.when(
        s == 0, F.transform(F.col("embedding"), lambda x: F.lit(0.0))
    ).otherwise(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(F.lit(127) * x.cast("double") / s),
        )
    )
    coded = spread(emb).select(
        "vec_id",
        "embedding",
        V.norm_sq_scaled(F.col("embedding")).alias("nsq"),
        s.alias("s"),
        codes.alias("codes"),
    ).persist()
    probes = coded.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("q_codes")
    )
    corpus = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("codes").alias("c_codes"),
        F.col("s").alias("c_s"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("q_codes"), F.col("c_codes"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    scored = corpus.join(
        F.broadcast(probes), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", (F.col("c_s") * idot).alias("approx"))
    ws = Window.partitionBy("query_id").orderBy(F.desc("approx"), "neighbor_id")
    short = (
        scored.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= SQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qa = coded.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nsq").alias("q_nsq"),
    )
    cb = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nsq").alias("c_nsq"),
    )
    cosine = V.cosine_from_scaled(
        V.dot_scaled(F.col("q_emb"), F.col("c_emb")), F.col("q_nsq"), F.col("c_nsq")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        short.join(F.broadcast(qa), "query_id")
        .join(cb, "neighbor_id")
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )
