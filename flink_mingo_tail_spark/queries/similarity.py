"""Similarity-search queries over the `embeddings` table
(array<float> column; SURVEY.md §2B north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.similarity import (
    IVF_MEAN_SCALE,
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


_LSH_N_TABLES, _LSH_N_BITS, _LSH_DIM = 8, 6, 64
_LSH_TABLES = hyperplane_tables(n_tables=_LSH_N_TABLES, n_bits=_LSH_N_BITS, dim=_LSH_DIM, seed=42)


def _lsh_plane_values() -> str:
    """The seeded hyperplanes as SQL VALUES rows (tbl, bit, pl). repr()
    prints the shortest round-trip decimal, so DuckDB parses the exact
    same float64 bits Spark folds into codegen via F.lit."""
    rows = []
    for t, planes in enumerate(_LSH_TABLES):
        for j, p in enumerate(planes):
            lits = ",".join(repr(float(x)) for x in p)
            rows.append(f"({t},{j},[{lits}]::DOUBLE[])")
    return ",\n    ".join(rows)


@query(
    "q78_knn_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes(tbl, bit, pl) AS (VALUES
    {_lsh_plane_values()}),
    cb AS (
        SELECT e.vec_id, p.tbl,
               CAST(sum(CASE WHEN list_dot_product(e.v, p.pl) > 0
                             THEN CAST(1 AS BIGINT) << p.bit ELSE 0 END) AS BIGINT) AS bucket
        FROM e CROSS JOIN planes p
        GROUP BY e.vec_id, p.tbl
    ),
    qb AS (SELECT vec_id AS query_id, tbl, bucket FROM cb WHERE vec_id < {N_QUERIES}),
    probes AS (
        SELECT query_id, tbl, bucket FROM qb
        UNION ALL
        SELECT query_id, tbl, xor(bucket, CAST(1 AS BIGINT) << j) AS bucket
        FROM qb CROSS JOIN unnest(range(0, {_LSH_N_BITS})) AS t(j)
    ),
    cand AS (
        SELECT DISTINCT p.query_id, c.vec_id
        FROM probes p JOIN cb c ON c.tbl = p.tbl AND c.bucket = p.bucket
        WHERE c.vec_id <> p.query_id
    ),
    scored AS (
        SELECT cand.query_id, cand.vec_id,
               round({SQL_COSINE.format(a="q.v", b="c.v")}, 6) AS cos_sim
        FROM cand
        JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def q78_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH (8 tables
    × 6 bits) with Hamming-1 multi-probe — the scale path: bucket
    equi-joins instead of all-pairs. The oracle replays the SAME
    bucketing in DuckDB: the hyperplanes are seeded constants embedded
    as literals, sign bits agree across engines (|dot| ~ O(1), fold
    drift ~1e-15), and the re-rank cosine is rounded like q76. Recall vs
    the exact q76 answer is additionally asserted in
    tests/test_similarity.py."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return knn_lsh(queries, e, TOP_K, _LSH_TABLES, multiprobe=True)


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


_IVF_K, _IVF_NPROBE, _IVF_ITER, _IVF_SEED = 8, 4, 2, 42


def _ivf_oracle_sql() -> str:
    """Replay train_ivf_centroids + knn_ivf in DuckDB, bit-exactly:

    * init = k rows with smallest md5(vec_id || seed) (same hex ordering);
    * assignment = argmax cosine, cell-id tiebreak (scale-invariant, so
      centroids are never normalized);
    * per-dim means = scaled-long exact sums (the q104 pattern) — the
      integer sum is order-independent, so the centroid doubles are
      bit-identical across engines;
    * 2 Lloyd iterations unrolled as CTEs, then probe nprobe cells and
      re-rank by rounded cosine.
    """
    cos_vc = SQL_COSINE.format(a="e.v", b="c.cv")
    assign = (
        "SELECT vec_id, v, cell FROM (\n"
        "        SELECT e.vec_id, e.v, c.cell,\n"
        "               row_number() OVER (PARTITION BY e.vec_id\n"
        f"                                  ORDER BY {cos_vc} DESC, c.cell) AS rn\n"
        "        FROM e CROSS JOIN cl{prev} c{extra}\n"
        "    ) WHERE rn {cond}"
    )
    iters = []
    for i in (1, 2):
        iters.append(
            f"""a{i} AS (
    {assign.format(prev=i - 1, extra="", cond="= 1")}
    ),
    m{i} AS (
        SELECT cell, i AS pos,
               CAST(sum(CAST(round(v[i] * {IVF_MEAN_SCALE}) AS BIGINT)) AS BIGINT) AS s,
               count(*) AS n
        FROM a{i}, unnest(range(1, len(v) + 1)) AS t(i)
        GROUP BY cell, i
    ),
    c{i} AS (
        SELECT c{i - 1}.cell, c{i - 1}.pos,
               CASE WHEN m{i}.s IS NULL THEN c{i - 1}.cval
                    ELSE m{i}.s / (m{i}.n * {IVF_MEAN_SCALE}.0) END AS cval
        FROM c{i - 1} LEFT JOIN m{i} ON m{i}.cell = c{i - 1}.cell AND m{i}.pos = c{i - 1}.pos
    ),
    cl{i} AS (SELECT cell, list(cval ORDER BY pos) AS cv FROM c{i} GROUP BY cell)"""
        )
    body = ",\n    ".join(iters)
    n = _IVF_ITER
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    init AS (
        SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR || '{_IVF_SEED}')) - 1 AS cell, v
        FROM e
        ORDER BY md5(vec_id::VARCHAR || '{_IVF_SEED}')
        LIMIT {_IVF_K}
    ),
    c0 AS (
        SELECT cell, i AS pos, v[i] AS cval
        FROM init, unnest(range(1, len(v) + 1)) AS t(i)
    ),
    cl0 AS (SELECT cell, list(cval ORDER BY pos) AS cv FROM c0 GROUP BY cell),
    {body},
    af AS (
    {assign.format(prev=n, extra="", cond="= 1")}
    ),
    qp AS (
        SELECT vec_id AS query_id, v AS qv, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos_vc} DESC, c.cell) AS rn
            FROM e CROSS JOIN cl{n} c
            WHERE e.vec_id < {N_QUERIES}
        ) WHERE rn <= {_IVF_NPROBE}
    ),
    scored AS (
        SELECT q.query_id, a.vec_id,
               round({SQL_COSINE.format(a="q.qv", b="a.v")}, 6) AS cos_sim
        FROM qp q JOIN af a USING (cell)
        WHERE a.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """


@query("q79_knn_ivf", oracle=_ivf_oracle_sql())
def q79_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF cells (spherical k-means coarse
    quantizer, 8 cells, nprobe=4) — the partition-prunable scale path:
    one cell key per corpus row, probe join touches nprobe/k_cells of
    the data. The oracle replays the full training loop in DuckDB (see
    _ivf_oracle_sql); recall vs the exact q76 answer is additionally
    asserted in tests/test_similarity.py."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    centroids = train_ivf_centroids(e, k_cells=_IVF_K, n_iter=_IVF_ITER, seed=_IVF_SEED)
    return knn_ivf(queries, e, TOP_K, centroids, nprobe=_IVF_NPROBE)
