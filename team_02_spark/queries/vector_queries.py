"""Vector/similarity-search queries over `embeddings` (SURVEY.md §2.4
J5, north-star "similarity search").

q_knn_topk is the exact, oracle-checked baseline (5 probe vectors vs
the whole corpus); q_knn_lsh is the 100 TB path (hyperplane-bucketed,
multi-probe) — probabilistic recall → rows-only. Cosines are computed
in double on both sides (see functions/vectors.dot) and rounded to 6dp
before ranking so rank order can't flip on last-ulp noise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.functions.vectors import cosine, l2_norm
from team_02_spark.operators.dedup import near_dedup_embedding
from team_02_spark.operators.similarity import knn_classify, knn_lsh
from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t
from team_02_spark.util import ensure_parallelism

# Cosine in portable SQL: unnest both fixed-length lists positionally,
# accumulate in double. DuckDB's generate_subscripts/list arithmetic:
# we use list_transform over an index range — identical sequential
# double accumulation to Spark's aggregate().
_COS_SQL = """
    list_sum(list_transform(range(1, 65),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (SQRT(list_sum(list_transform(range(1, 65),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
     * SQRT(list_sum(list_transform(range(1, 65),
        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))
"""


@query(
    "q_knn_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               ROUND({_COS_SQL}, 6) AS score
        FROM embeddings c, q
        WHERE c.vec_id <> q.vec_id
    )
    SELECT q_id, c_id, score, rnk FROM (
        SELECT q_id, c_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY score DESC, c_id) AS INT) AS rnk
        FROM scored
    ) r WHERE rnk <= 10
    """,
)
def q_knn_topk(spark, sf_dir):
    """J5 baseline: exact cosine top-10 for 5 probe vectors. The probe
    set is broadcast; the corpus streams map-side; one window per probe
    keeps k."""
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = (
        ensure_parallelism(emb).join(F.broadcast(probes), F.col("vec_id") != F.col("q_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("q_id", F.col("vec_id").alias("c_id"), "score", "rnk")
    )


@query("q_knn_lsh")  # rows-only: LSH bucket recall is probabilistic
def q_knn_lsh(spark, sf_dir):
    """J5 scale path: random-hyperplane LSH (8 planes, multi-probe)
    prunes the corpus per probe; exact cosine re-ranks candidates."""
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return knn_lsh(probes, emb, 10, dim=64)


@query("q_knn_classify")  # rows-only: composite ML op
def q_knn_classify(spark, sf_dir):
    """U6: KNN classifier (k=5, majority vote) — the engine's
    distributed stand-in for the reference's KNeighborsClassifier
    (reference src/main.py:106-109)."""
    emb = t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 20)
    return knn_classify(probes, corpus, k=5)


@query(
    "q_vector_norms",
    oracle="""
    SELECT vec_id,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 6) AS comp_sum,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
)
def q_vector_norms(spark, sf_dir):
    """Vector scalar ops: L2 norm, component sum, dimensionality —
    JVM higher-order functions, no UDF."""
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 6).alias("l2"),
        F.round(
            F.aggregate(
                F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("comp_sum"),
        F.size("embedding").cast("int").alias("dim"),
    )


@query("q_dedup_embedding")  # rows-only: LSH bucket recall is probabilistic
def q_dedup_embedding(spark, sf_dir):
    """M4 embedding form: cosine ≥ 0.95 near-dup removal via
    random-hyperplane buckets + exact verify."""
    emb = t(spark, sf_dir, "embeddings")
    return near_dedup_embedding(emb.select("vec_id", "embedding")).select("vec_id")
