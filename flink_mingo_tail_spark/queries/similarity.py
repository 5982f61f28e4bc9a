"""Similarity-search queries over the `embeddings` table
(array<float> column; SURVEY.md §2B north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.similarity import (
    SQL_COSINE,
    hyperplane_tables,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    rounded_cosine,
    train_ivf_centroids,
)
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread

N_QUERIES = 5  # vec_id < 5 are the demo query vectors
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    e = spread(load_table(spark, sf_dir, "embeddings"))
    # float -> double promotion is exact; all math then runs in double in
    # both engines (oracle casts with ::DOUBLE[]).
    return e.withColumn("embedding", F.col("embedding").cast("array<double>"))


_COS_AB = SQL_COSINE.format(a="q.qv", b="c.embedding")


@query(
    "q76_knn_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, c.vec_id, round({_COS_AB}, 6) AS cos_sim
        FROM e c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def q76_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k (brute force baseline): broadcast the 5 query
    vectors, one corpus scan, window top-k. All vector math is a
    sequential zip_with/aggregate fold => bit-reproducible; cosine
    rounded to 6dp for the cross-engine hash."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return knn_bruteforce(queries, e, TOP_K)


@query(
    "q76b_knn_gemm",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, c.vec_id, {_COS_AB} AS cos_sim
        FROM e c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, rank FROM ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def q76b_knn_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-k as q76, scored by Arrow-batched numpy GEMM
    (operators/similarity.knn_bruteforce_gemm) — the vectorized
    production path for brute-force scoring at real dims/batch sizes.
    Output is (query_id, vec_id, rank) only: ranks are invariant to the
    ~1e-15 fold-vs-BLAS accumulation difference (adjacent-cosine
    spacing is ~1e-3), raw scores are not — so the hash checks the GEMM
    path end-to-end without floating-point fragility."""
    from flink_mingo_tail_spark.operators.similarity import knn_bruteforce_gemm

    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return knn_bruteforce_gemm(queries, e, TOP_K).select("query_id", "vec_id", "rank")


@query(
    "q77_embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({SQL_COSINE.format(a="a.embedding", b="b.embedding")}, 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round({SQL_COSINE.format(a="a.embedding", b="b.embedding")}, 6) >= 0.45
    ORDER BY vec_a, vec_b
    """,
)
def q77_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold — the
    brute-force all-pairs variant (correctness oracle for the LSH path;
    at production scale q78's bucketing replaces the O(n²) pair space)."""
    e = _emb(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    cos = rounded_cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )


@query("q78_knn_lsh", oracle=None)
def q78_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH (8 tables
    × 6 bits) with Hamming-1 multi-probe — the scale path: bucket
    equi-joins instead of all-pairs. No SQL oracle — approximate by
    construction; recall vs the exact q76 answer is asserted in
    tests/test_similarity.py."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    tables = hyperplane_tables(n_tables=8, n_bits=6, dim=64, seed=42)
    return knn_lsh(queries, e, TOP_K, tables, multiprobe=True)


@query(
    "q68_embedding_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scaled AS (
        SELECT vec_id,
               127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
        FROM e
    )
    SELECT e.vec_id,
           round(scaled.scale, 6) AS scale,
           array_to_string(list_transform(e.v, x -> round(x * scaled.scale)::BIGINT), ',')
               AS q8
    FROM e JOIN scaled ON e.vec_id = scaled.vec_id
    ORDER BY e.vec_id
    """,
)
def q68_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    absmax scale) — the storage/bandwidth staple before ANN serving: a
    pure narrow map (zero shuffle, one corpus pass) that cuts vector
    bytes 4x. Quantized array serialized to a string for the
    cross-engine hash (pandas exports arrays differently per engine);
    scale rounded to 6dp for float parity."""
    e = _emb(spark, sf_dir)
    scale = F.lit(127.0) / F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    return (
        e.select("vec_id", F.col("embedding").alias("v"), scale.alias("_s"))
        .select(
            "vec_id",
            F.round(F.col("_s"), 6).alias("scale"),
            F.array_join(
                F.transform(F.col("v"), lambda x: F.round(x * F.col("_s")).cast("long")), ","
            ).alias("q8"),
        )
        .orderBy("vec_id")
    )


@query("q79_knn_ivf", oracle=None)
def q79_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF cells (spherical k-means coarse
    quantizer, 8 cells, nprobe=3) — the partition-prunable scale path:
    one cell key per corpus row, probe join touches nprobe/k_cells of
    the data. No SQL oracle — approximate by construction; recall vs the
    exact q76 answer is asserted in tests/test_similarity.py."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    centroids = train_ivf_centroids(e, k_cells=8, n_iter=2)
    return knn_ivf(queries, e, TOP_K, centroids, nprobe=4)
