"""Similarity search over embedding columns (north-star extension,
SURVEY.md §2B "near-dup / similarity search").

Two tiers, same API:

* ``knn_bruteforce`` — exact cosine top-k. The small-query-set baseline:
  broadcast the queries, scan the corpus once, per-partition top-k via a
  window. Correct at any scale when the query set is small (the corpus
  is never collected).
* ``knn_lsh`` — random-hyperplane LSH (sign-bit buckets). The 100 TB
  path: corpus hashed once to integer buckets, candidate set = bucket
  (+ optional multi-probe Hamming-1 neighbors), exact cosine re-rank
  only within candidates. Hyperplanes are seeded → deterministic plans.

All vector math is Catalyst array expressions (`zip_with` + `aggregate`
fold — sequential, hence bit-reproducible); no UDF in either path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def rounded_cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine comparison: double-fold drift is
    ~1e-15 for 64-dim vectors, so 6 digits is collision-safe."""
    return F.round(cosine(a, b), digits)


SQL_COSINE = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * "
    "sqrt(list_dot_product({b}, {b})))"
)


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine (desc), id-tiebroken.

    Plan shape: broadcast-nested-loop of a SMALL query set against the
    corpus scan, then TopK per query via window — one pass over the
    corpus, no corpus-side shuffle of vectors.

    r15 norm-carrying (the r14 pair-join lever): each side's L2 norm is
    computed once per VECTOR before the pair join — the in-place
    rounded_cosine evaluated three 64-dim folds per (query, corpus)
    PAIR, two of which are per-vector constants. The carried norms are
    the identical l2_norm subtree and the division keeps cosine()'s
    operand order (nq * nc), so scores are bit-identical; the quadratic
    pair term drops to one dot + one divide."""
    qn = queries.withColumn("_nq", l2_norm(F.col(query_vec)))
    cn = corpus.withColumn("_nc", l2_norm(F.col(corpus_vec)))
    joined = cn.crossJoin(F.broadcast(qn)).filter(F.col(corpus_id) != F.col(query_id))
    scored = joined.select(
        query_id,
        corpus_id,
        F.round(
            dot(F.col(query_vec), F.col(corpus_vec)) / (F.col("_nq") * F.col("_nc")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def knn_bruteforce_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, scored with Arrow-batched numpy GEMM.

    The vectorized production form of ``knn_bruteforce``: the (small)
    query set is collected ONCE into a dim×Q float64 matrix shipped in
    the task closure (the same bounded-collect contract as IVF
    centroids); each corpus Arrow batch computes a (batch × Q) score
    block with one BLAS matmul instead of per-row expression folds —
    10-100× per element at production dims/batch sizes. Ranking uses
    the UNROUNDED scores: BLAS accumulation order differs from the
    sequential fold by ~1e-15, far below adjacent-cosine spacing, so
    ranks (the hashed output) are fold/GEMM-invariant while raw scores
    are not; callers needing displayable scores should round.
    """
    import pandas as pd

    q_rows = queries.select(query_id, query_vec).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)  # Q × dim
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            c_mat = np.array(pdf[corpus_vec].tolist(), dtype=np.float64)  # B × dim
            c_norm = np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = (c_mat / c_norm) @ q_unit.T  # B × Q cosine block
            b = len(pdf)
            yield pd.DataFrame(
                {
                    query_id: np.repeat(q_ids, b),
                    corpus_id: np.tile(pdf[corpus_id].to_numpy(), len(q_ids)),
                    "cos_sim": sims.T.reshape(-1),
                }
            )

    scored = corpus.select(corpus_id, corpus_vec).mapInPandas(
        score, schema=f"{query_id} long, {corpus_id} long, cos_sim double"
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.filter(F.col(corpus_id) != F.col(query_id))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def hyperplanes(n_bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-bit LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def hyperplane_tables(n_tables: int, n_bits: int, dim: int, seed: int = 42) -> list[np.ndarray]:
    """L independent hyperplane sets (multi-table LSH). Recall for a
    neighbor with per-bit agreement p is 1-(1-p^b)^L — tune L up for
    recall, b up for selectivity; memory/shuffle cost scales with L."""
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((n_bits, dim)) for _ in range(n_tables)]


LSH_TARGET_OCCUPANCY = 8  # rows per bucket the auto rule aims at


def auto_n_bits(
    n_rows: int,
    target_occupancy: int = LSH_TARGET_OCCUPANCY,
    min_bits: int = 2,
    max_bits: int = 30,
) -> int:
    """The SCALE.md n_bits ∝ log(n) occupancy rule, as code (the
    round-10 verdict's knob, codified the way round 9 codified k∝n):
    pick the smallest b with ``2**b * target_occupancy >= n_rows``,
    i.e. ``b = ceil(log2(n / target_occupancy))`` — so expected bucket
    occupancy stays at ``target_occupancy`` as the corpus grows and the
    per-bucket candidate volume (occupancy² per bucket, n·occupancy
    total) stays corpus-LINEAR instead of quadratic at fixed b. Pure
    integer arithmetic off one existing count — no floating log, no
    retune at 100× scale. Clamped to [min_bits, max_bits]: bucket ids
    must fit a BIGINT shift and a 1-bit hash is never selective.

    Measured on the sf0.1 fixture (SCALE.md round-10 n_bits table):
    6→8→10 bits traded candidate share 0.90→0.56→0.24 at recall
    1.0→0.95→0.86 vs the dense election — this rule picks along that
    curve from the corpus count alone."""
    if n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    if target_occupancy <= 0:
        raise ValueError(f"target_occupancy must be positive, got {target_occupancy}")
    b = max(0, (-(-n_rows // target_occupancy) - 1)).bit_length()
    return min(max_bits, max(min_bits, b))


def lsh_tables_for(
    n_rows: int,
    n_tables: int,
    dim: int,
    seed: int = 42,
    n_bits: int | None = None,
    target_occupancy: int = LSH_TARGET_OCCUPANCY,
) -> list[np.ndarray]:
    """``hyperplane_tables`` with the ``n_bits=None`` auto mode: derive
    the bit width from the corpus count via :func:`auto_n_bits`. Same
    seed + same resolved width => bit-identical planes to an explicit
    call (property-pinned in tests/test_similarity.py), so oracle
    queries registered at an explicit width and auto-sized production
    callers share one construction path."""
    bits = auto_n_bits(n_rows, target_occupancy) if n_bits is None else n_bits
    return hyperplane_tables(n_tables=n_tables, n_bits=bits, dim=dim, seed=seed)


def lsh_bucket(vec: Column | str, planes: np.ndarray) -> Column:
    """Integer LSH bucket: bit j = sign(vec · plane_j). Pure expressions —
    the plane components are literals folded into codegen.

    r14 optimization: the expression is built as ONE SQL string (one
    py4j round-trip) instead of per-component ``F.lit`` trees — the
    literal-tree spelling cost ~2.7 s of driver-side construction per
    8-table key build (thousands of py4j calls for the plane
    components; measured construct walls in OPTIMIZATION_r14.md) while
    the parsed form is ~0.3 s and bit-identical: double literals
    round-trip through repr + the D suffix, the per-bit sign terms and
    ascending weighted sum are the same fold. ``vec`` may be a column
    NAME (preferred — enables the single-expr path); Column inputs keep
    working via their SQL spelling."""
    vec_sql = f"`{vec}`" if isinstance(vec, str) else _col_sql(vec)
    planes_sql = "array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in pl) + ")" for pl in planes
    ) + ")"
    weights_sql = "array(" + ", ".join(str(1 << j) for j in range(len(planes))) + ")"
    return F.expr(
        f"aggregate(zip_with(transform({planes_sql}, pl -> CASE WHEN "
        f"aggregate(zip_with({vec_sql}, pl, (x, y) -> x * y), 0.0D, (a, x) -> a + x)"
        f" > 0D THEN 1 ELSE 0 END), {weights_sql}, (b, w) -> b * w),"
        f" 0, (a, x) -> a + x)"
    )


def _col_sql(col: Column) -> str:
    """SQL text of a simple column reference (the only Column form the
    LSH builders receive — attribute names, possibly dotted)."""
    name = col._jc.toString()  # noqa: SLF001 — py4j Column, no public accessor
    return ".".join(f"`{part}`" for part in name.split("."))


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _nearest_cells(vec: Column, centroids: np.ndarray) -> Column:
    """Array of struct(negcos, cell) sorted ascending — element 0 is the
    max-cosine cell. Ranking by cosine (not raw dot) makes the
    assignment invariant to centroid scaling, so centroids can stay
    EXACT rationals (scaled-long means) with no float-fragile
    normalization step — the property the DuckDB oracle replication of
    q79 relies on. Centroid components are literals folded into codegen;
    tie-break on cell id keeps assignment deterministic."""
    scored = F.array(
        *[
            F.struct(
                (-cosine(vec, _lit_vec(c))).alias("negcos"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_sort(scored)


IVF_MEAN_SCALE = 1_000_000  # fixed-point scale for exact centroid means

# Above this k the literal-fold assignment (_nearest_cells) stops being
# the right physical plan: it embeds k x dim double literals plus k
# cosine folds in ONE projection, and whole-stage codegen blows past
# the JVM's 64KB method limit into interpreted fallback. The
# broadcast-join path trades that for one map-side-combinable argmin
# aggregate (verdict round 6 item 8).
LITERAL_ASSIGN_MAX_K = 16


def assign_cells_join(
    corpus: DataFrame,
    centroids: np.ndarray,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    out: str = "_cell",
) -> DataFrame:
    """Argmax-cosine cell assignment via a BROADCAST JOIN — the large-k
    twin of ``_nearest_cells`` (property-tested identical at small k).

    The centroid matrix ships as a broadcast k-row frame instead of
    codegen literals; each corpus row scores k cells and an argmin over
    struct(negcos, cell) picks the winner with the same cosine
    expression and the same cell-id tiebreak as the literal path, so
    the two strategies are bit-equal. Physical shape: broadcast
    nested-loop join (k rows / corpus row, never materialized wider
    than the map task) + hash aggregate keyed by ``corpus_id`` whose
    partial phase collapses every group to one row map-side — the wire
    moves n one-row groups, not n*k. Returns (corpus_id, corpus_vec,
    out); first(corpus_vec) is value-deterministic because all k rows
    of a group carry the same vector.
    """
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, cv array<double>",
    )
    scored = corpus.select(corpus_id, corpus_vec).crossJoin(F.broadcast(cent))
    return scored.groupBy(corpus_id).agg(
        F.first(corpus_vec).alias(corpus_vec),
        F.min(
            F.struct(
                (-cosine(F.col(corpus_vec), F.col("cv"))).alias("negcos"),
                F.col("cell").alias("cell"),
            )
        )
        .getField("cell")
        .alias(out),
    )


def sample_threshold_hex(fraction: float) -> str:
    """8-hex-digit threshold such that ``substr(md5(x), 1, 8) <
    threshold`` keeps ~``fraction`` of uniformly-hashed rows. Lowercase
    hex strings of equal length compare lexicographically as numbers,
    and Spark and DuckDB produce identical lowercase md5 hex — so the
    SAME predicate string selects the SAME rows in both engines."""
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    # clamp: a fraction within 2^-33 of 1 rounds to 2^32, whose hex is
    # the 9-char '100000000' — the 8-char lexicographic compare would
    # then keep only hashes starting '0' (~6% of rows) instead of ~100%
    return format(min(int(round(fraction * (1 << 32))), (1 << 32) - 1), "08x")


def train_sample_predicate(corpus_id: str, seed: int, fraction: float) -> Column:
    """Deterministic hash-sample membership test (Spark side); the
    DuckDB twin is ``substr(md5(id::VARCHAR || ':s:<seed>'), 1, 8) <
    '<hex>'``. Salted differently from the init-row hash so the two
    pseudo-random draws are independent."""
    h = F.md5(F.concat(F.col(corpus_id).cast("string"), F.lit(f":s:{seed}")))
    return F.substring(h, 1, 8) < F.lit(sample_threshold_hex(fraction))


def auto_size_training(
    n_rows: int,
    target_cell_size: int = 1024,
    target_sample_rows: int = 262_144,
) -> tuple[int, float]:
    """The SCALE.md k∝n / fraction∝n sizing rule, as code: given the
    corpus row count, return ``(k_cells, sample_fraction)`` with
    ``k = ceil(n / target_cell_size)`` (bounds every SemDeDup/IVF cell,
    so the Σ|cell|² pair space stays LINEAR in n instead of quadratic
    at fixed k) and ``fraction = target_sample_rows / n`` (Lloyd
    training cost independent of corpus size; centroids are statistics,
    not an index). Pure arithmetic — callers pass an existing count."""
    if n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    k = max(1, -(-n_rows // target_cell_size))
    frac = min(1.0, target_sample_rows / n_rows)
    return k, frac


def train_ivf_centroids(
    corpus: DataFrame,
    k_cells: int | None,
    n_iter: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    assign_method: str = "auto",
    sample_fraction: float | None = 1.0,
    target_cell_size: int = 1024,
    target_sample_rows: int = 262_144,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained with DataFrame ops.

    Init: the k_cells rows with the smallest md5(id || seed) — a
    deterministic pseudo-random sample that costs one TakeOrdered (no
    full shuffle). Each Lloyd iteration is one corpus pass: a codegen'd
    argmax-cosine assignment (no UDF) + a (cell, dim) grouped mean via
    posexplode — both distributed aggs; only the k_cells x dim centroid
    matrix ever reaches the driver.

    ``sample_fraction`` < 1 is the 100 TB path (round-7 verdict #4):
    centroids are STATISTICS, not an index, so Lloyd iterations run on
    a deterministic md5-hash sample (``train_sample_predicate``) while
    the caller's assignment pass still covers the full corpus. The
    sample is a stable function of the data — same rows in any engine,
    any partitioning — so the DuckDB oracle replays sampled training
    bit-exactly too. Full-corpus training (the default) keeps the q79
    replay contract unchanged.

    Determinism contract (cross-engine, see q79's oracle): centroids are
    never L2-normalized — argmax-cosine is scale-invariant, so the
    normalization would only introduce sqrt/rounding drift. Per-dim
    means use the scaled-long exact-sum pattern (same as q104):
    sum(round(v * S) :: long) / (n * S) is bit-identical in Spark,
    Python, and DuckDB because the integer sum is order-independent and
    the final division is one IEEE op on identical operands.

    ``k_cells=None`` / ``sample_fraction=None`` activate the measured
    k∝n / fraction∝n sizing rule (SCALE.md round-8 attribution): one
    cheap ``count()`` of the id column sizes both via
    ``auto_size_training`` — equal, by property test, to passing the
    same values explicitly. Explicit values keep the q79/q171 replay
    contracts byte-identical."""
    if k_cells is None or sample_fraction is None:
        n_rows = corpus.select(corpus_id).count()
        auto_k, auto_frac = auto_size_training(
            n_rows, target_cell_size=target_cell_size,
            target_sample_rows=target_sample_rows,
        )
        if k_cells is None:
            k_cells = auto_k
        if sample_fraction is None:
            sample_fraction = auto_frac
    train = corpus
    if sample_fraction != 1.0:
        train = corpus.filter(train_sample_predicate(corpus_id, seed, sample_fraction))
    sample = (
        train.select(
            F.col(corpus_vec),
            F.md5(F.concat(F.col(corpus_id).cast("string"), F.lit(str(seed)))).alias("_h"),
        )
        .orderBy("_h")
        .limit(k_cells)
        .select(corpus_vec)
        .collect()
    )
    if assign_method not in ("auto", "literal", "join"):
        raise ValueError(f"assign_method must be auto|literal|join, got {assign_method!r}")
    method = (
        ("literal" if k_cells <= LITERAL_ASSIGN_MAX_K else "join")
        if assign_method == "auto"
        else assign_method
    )
    centroids = np.array([r[0] for r in sample], dtype=np.float64)
    for _ in range(n_iter):
        # literal-fold at small k (zero-shuffle narrow pass), broadcast
        # join + map-side argmin at large k (codegen stays bounded);
        # identical assignments either way (test_similarity property)
        if method == "literal":
            assigned = train.withColumn(
                "_cell", _nearest_cells(F.col(corpus_vec), centroids)[0]["cell"]
            )
        else:
            assigned = assign_cells_join(
                train, centroids, corpus_id=corpus_id, corpus_vec=corpus_vec, out="_cell"
            )
        stats = (
            assigned.select("_cell", F.posexplode(corpus_vec).alias("_pos", "_val"))
            .groupBy("_cell", "_pos")
            .agg(
                F.sum(F.round(F.col("_val") * IVF_MEAN_SCALE, 0).cast("long")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new = centroids.copy()  # empty cells keep their previous centroid
        for r in stats:
            new[r._cell][r._pos] = r._s / (r._n * float(IVF_MEAN_SCALE))
        centroids = new
    return centroids


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: every corpus
    vector belongs to exactly ONE cell (vs L keys/row for multi-table
    LSH — IVF trades recall knobs for minimal corpus amplification);
    queries probe their nprobe nearest cells; exact cosine re-rank only
    within probed cells.

    At scale the corpus side is a narrow map producing one small int
    key; the candidate join is an equi-join on that key, so AQE splits
    any hot cell. For a stored 100 TB corpus, write it partitioned by
    cell (``df.write.partitionBy("cell")``) and the probe join becomes
    partition-PRUNED reads — only nprobe/k_cells of the bytes are ever
    scanned, which bucket-keyed LSH cannot do with L keys per row."""
    # r15 norm-carrying: per-vector norms computed once before the
    # candidate join (same l2_norm subtree, same operand order as
    # cosine() — bit-identical; one dot per candidate pair, not three).
    corpus_c = corpus.withColumn(
        "cell", _nearest_cells(F.col(corpus_vec), centroids)[0]["cell"]
    ).withColumn("_nc", l2_norm(F.col(corpus_vec)))
    probes = F.slice(_nearest_cells(F.col(query_vec), centroids), 1, nprobe)
    q_probes = queries.select(
        F.col(query_id),
        F.col(query_vec),
        l2_norm(F.col(query_vec)).alias("_nq"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell"),
    )
    joined = corpus_c.join(F.broadcast(q_probes), "cell").filter(
        F.col(corpus_id) != F.col(query_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        F.round(
            dot(F.col(query_vec), F.col(corpus_vec)) / (F.col("_nq") * F.col("_nc")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    tables: list[np.ndarray],
    multiprobe: bool = True,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "qv",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: bucket the corpus once
    per table (narrow map, L int keys per row), equi-join queries to
    corpus on (table, bucket), exact cosine re-rank within candidates.

    Recall comes from two standard knobs: L independent tables
    (1-(1-p^b)^L) and Hamming-1 multi-probe on the query side (b extra
    probes per table — query-side only, so corpus storage stays L keys).
    At scale this is the IVF-style sublinear path: the join touches only
    colliding buckets, the shuffle key is a small int pair, and skewed
    buckets split under AQE."""
    n_bits = len(tables[0])
    corpus_b = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(corpus_vec, planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select(corpus_id, corpus_vec, "tb.table", "tb.bucket")
    # r15 norm-carrying: one norm per corpus (table, bucket) row, reused
    # across every colliding probe (bit-identical; see knn_bruteforce).
    corpus_b = corpus_b.withColumn("_nc", l2_norm(F.col(corpus_vec)))

    # Two-step probe fan-out (SCALE.md round-11 codegen-floor fix):
    # materialize the base bucket per table, then explode the Hamming
    # variants off the materialized COLUMN — the one-struct-array form
    # copies the (n_bits x dim)-literal bucket expression into every
    # branch (1.7 MiB task binaries measured).
    q_base = queries.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(query_vec, planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select(query_id, query_vec, "tb.table", "tb.bucket")
    variants = [F.col("bucket")]
    if multiprobe:
        variants += [F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)]
    q_probes = q_base.select(
        query_id,
        query_vec,
        l2_norm(F.col(query_vec)).alias("_nq"),
        "table",
        F.explode(F.array(*variants)).alias("bucket"),
    )

    joined = corpus_b.join(F.broadcast(q_probes), ["table", "bucket"]).filter(
        F.col(corpus_id) != F.col(query_id)
    )
    scored = joined.select(
        query_id,
        corpus_id,
        F.round(
            dot(F.col(query_vec), F.col(corpus_vec)) / (F.col("_nq") * F.col("_nc")), 6
        ).alias("cos_sim"),
    ).dropDuplicates([query_id, corpus_id])
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    m_subspaces: int,
    k_sub: int,
    n_iter: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> list[np.ndarray]:
    """Per-subspace spherical k-means codebooks for product quantization.

    The D-dim vector splits into ``m_subspaces`` contiguous slices; each
    slice gets its own ``k_sub``-centroid quantizer trained by the same
    deterministic Lloyd loop as the IVF coarse quantizer (shared
    md5-ordered init rows, exact scaled-long means — the q79
    determinism contract, so a DuckDB oracle can replay training
    bit-for-bit). Returns ``m_subspaces`` arrays of (k_sub, D/m).

    Scale note: this trains subspace-by-subspace (m small corpus passes
    per iteration) because it REUSES the proven single-quantizer loop;
    at 100 TB fuse the m assignments into one pass per iteration (the
    ENCODE step below already does exactly that fusion) and pass
    ``sample_fraction`` < 1 to train on the deterministic md5-hash
    sample — codebooks are statistics, not indexes. The knob forwards
    to ``train_ivf_centroids``, so the sample (one predicate on the
    row id) is the SAME row set for every subspace — exactly the
    pre-filtered-corpus semantics the parity test pins."""
    dim = len(corpus.select(corpus_vec).first()[0])
    assert dim % m_subspaces == 0, f"dim {dim} not divisible by {m_subspaces}"
    sub = dim // m_subspaces
    books: list[np.ndarray] = []
    for m in range(m_subspaces):
        sliced = corpus.select(
            F.col(corpus_id), F.slice(F.col(corpus_vec), m * sub + 1, sub).alias(corpus_vec)
        )
        books.append(
            train_ivf_centroids(
                sliced, k_cells=k_sub, n_iter=n_iter,
                corpus_id=corpus_id, corpus_vec=corpus_vec, seed=seed,
                sample_fraction=sample_fraction,
            )
        )
    return books


def pq_encode(corpus: DataFrame, books: list[np.ndarray], corpus_vec: str = "embedding") -> DataFrame:
    """ONE corpus pass -> compact PQ codes: per subspace, the argmax-
    cosine codebook cell (same `_nearest_cells` ranking as IVF, so the
    assignment is deterministic and oracle-replayable). Output replaces
    the D-float vector with m small ints — the 100 TB point of PQ: the
    similarity scan then reads m bytes/row instead of 4·D."""
    sub = books[0].shape[1]
    codes = F.array(
        *[
            _nearest_cells(F.slice(F.col(corpus_vec), m * sub + 1, sub), book)[0]["cell"]
            for m, book in enumerate(books)
        ]
    )
    return corpus.withColumn("pq_codes", codes).drop(corpus_vec)


def pq_reconstruct(codes_col: Column, books: list[np.ndarray]) -> Column:
    """Codebook lookup + concat: codes -> the reconstructed D-vector.
    Codebooks ride as literal arrays folded into codegen (k_sub x D/m
    doubles — kilobytes), so reconstruction is a per-row element_at,
    no join and no shuffle."""
    parts = [
        F.element_at(F.array(*[_lit_vec(c) for c in book]), codes_col[m] + 1)
        for m, book in enumerate(books)
    ]
    return F.concat(*parts)


def knn_pq_adc(
    queries: DataFrame,
    encoded: DataFrame,
    corpus: DataFrame,
    k: int,
    books: list[np.ndarray],
    shortlist: int,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ codes, two stages:

    1. **ADC scan** — score every code row by cosine(query,
       reconstruction): the scan touches only (id, m codes); the exact
       vector table is NOT read. Broadcast queries, window
       top-``shortlist`` per query.
    2. **Exact re-rank** — join the shortlist back to the true vectors
       (per-query point lookups, shortlist·|Q| rows) and emit the exact
       cosine top-k.

    This is the production IVF-PQ shape: the memory/IO-bound stage runs
    over m bytes/row, and full vectors are fetched for a fixed small
    candidate set. Every score is deterministic (exact-rational
    codebooks, fixed-order folds, 6-digit rounding), so a DuckDB oracle
    replays the whole pipeline bit-for-bit — shortlist boundary ties
    break on the id column in both engines."""
    from pyspark.sql import Window

    # r15: reconstruct (and take the norm) once per CORPUS ROW before
    # the pair join — the post-join spelling re-ran pq_reconstruct (an
    # m x dsub literal transform) and its norm once per (query, corpus)
    # PAIR. Same expression over the same codes, projected earlier →
    # values bit-identical; the query norm is likewise carried once per
    # query (cosine()'s operand order kept: nq * nr).
    recon = pq_reconstruct(F.col("pq_codes"), books)
    enc_r = encoded.withColumn("_rv", recon).withColumn("_nr", l2_norm(F.col("_rv")))
    qn = queries.withColumn("_nq", l2_norm(F.col(query_vec)))
    adc = (
        enc_r.join(F.broadcast(qn), F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            F.round(
                dot(F.col(query_vec), F.col("_rv")) / (F.col("_nq") * F.col("_nr")), 6
            ).alias("adc_cos"),
        )
    )
    w1 = Window.partitionBy(query_id).orderBy(F.desc("adc_cos"), corpus_id)
    cand = adc.withColumn("__r", F.row_number().over(w1)).filter(F.col("__r") <= shortlist)
    rer = (
        cand.select(query_id, corpus_id)
        .join(corpus.select(corpus_id, corpus_vec), corpus_id)
        .join(F.broadcast(qn), query_id)
        .select(
            query_id,
            corpus_id,
            F.round(
                dot(F.col(query_vec), F.col(corpus_vec))
                / (F.col("_nq") * l2_norm(F.col(corpus_vec))),
                6,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), corpus_id)
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def knn_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    cell_centroids: np.ndarray,
    books: list[np.ndarray],
    nprobe: int,
    shortlist: int,
    query_id: str = "query_id",
    query_vec: str = "qv",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the composed production ANN shape. The corpus is encoded
    ONCE into (cell, pq_codes) — one coarse IVF cell (partition-prunable
    storage key) plus the PQ code word; at query time:

    1. probe ``nprobe`` nearest cells (IVF pruning: only
       nprobe/k_cells of the encoded rows are touched — with the
       encoded table written ``partitionBy("cell")``, partition-pruned
       reads);
    2. ADC-score the probed rows from CODES ONLY (cosine vs the PQ
       reconstruction) and keep a per-query shortlist;
    3. exact re-rank of the shortlist against the true vectors.

    Pure composition of the tested pieces (`_nearest_cells` cell
    assignment, `pq_encode`, `pq_reconstruct`), so the scan-byte story
    multiplies: nprobe/k_cells of the rows x m codes instead of 4·D
    vector bytes. Deterministic end to end like its parents; recall is
    gated in tests/test_similarity.py."""
    from pyspark.sql import Window

    encoded = pq_encode(
        corpus.withColumn("cell", _nearest_cells(F.col(corpus_vec), cell_centroids)[0]["cell"]),
        books,
        corpus_vec=corpus_vec,
    )
    probes = F.slice(_nearest_cells(F.col(query_vec), cell_centroids), 1, nprobe)
    q_probes = queries.select(
        F.col(query_id),
        F.col(query_vec),
        l2_norm(F.col(query_vec)).alias("_nq"),
        F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell"),
    )
    # r15: reconstruction + norm once per encoded row, query norm once
    # per probe row (see knn_pq — bit-identical, one dot per pair).
    recon = pq_reconstruct(F.col("pq_codes"), books)
    enc_r = encoded.withColumn("_rv", recon).withColumn("_nr", l2_norm(F.col("_rv")))
    adc = (
        enc_r.join(F.broadcast(q_probes), "cell")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            corpus_id,
            F.round(
                dot(F.col(query_vec), F.col("_rv")) / (F.col("_nq") * F.col("_nr")), 6
            ).alias("adc_cos"),
        )
    )
    w1 = Window.partitionBy(query_id).orderBy(F.desc("adc_cos"), corpus_id)
    cand = adc.withColumn("__r", F.row_number().over(w1)).filter(F.col("__r") <= shortlist)
    qn = queries.withColumn("_nq", l2_norm(F.col(query_vec)))
    rer = (
        cand.select(query_id, corpus_id)
        .join(corpus.select(corpus_id, corpus_vec), corpus_id)
        .join(F.broadcast(qn), query_id)
        .select(
            query_id,
            corpus_id,
            F.round(
                dot(F.col(query_vec), F.col(corpus_vec))
                / (F.col("_nq") * l2_norm(F.col(corpus_vec))),
                6,
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), corpus_id)
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def lsh_keys(df: DataFrame, id_col: str, vec_col: str, tables: list[np.ndarray]) -> DataFrame:
    """(id, tbl, bucket) — one sign-LSH bucket per table per row (L
    integer keys per row, the storage/index side of multi-table LSH).
    Plane components fold into codegen as literals; one narrow map."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(vec_col, planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "tb.tbl", "tb.bucket")


def lsh_probe_keys(
    df: DataFrame, id_col: str, vec_col: str, tables: list[np.ndarray], n_bits: int
) -> DataFrame:
    """(id, tbl, bucket) with Hamming-1 multi-probe: the base bucket
    plus every single-bit flip — (n_bits + 1) · L keys per row, the
    PROBE side of the join (fan the probes out on the bounded side
    only). Two-step construction: the base bucket materializes per
    table FIRST, then the XOR variants explode off the materialized
    COLUMN — folding the variants into one struct array would copy the
    (n_bits × dim)-literal bucket expression into every branch
    (measured 1.7 MiB task binaries and a multi-second codegen floor;
    SCALE.md round-11)."""
    base = lsh_keys(df, id_col, vec_col, tables)
    return base.select(
        id_col,
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)],
            )
        ).alias("bucket"),
    )
