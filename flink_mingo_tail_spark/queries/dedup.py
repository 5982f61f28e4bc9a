"""Deduplication queries over `documents` / `events` (north-star
extension operators; SURVEY.md §2B table "exact dedup / near-dup").

The reference's own dedup is the streaming quorum gate
(MongoDBOplogSource.java:116-128, covered by q62 + streaming/quorum.py);
this module is the batch training-data-pipeline family: exact dedup of
replayed deliveries, content-hash dedup, MinHash+LSH near-dup candidate
generation, SimHash fingerprints, and exact n-gram Jaccard verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import (
    lsh_band_keys,
    md5_long,
    minhash_from_hashes,
    minhash_signature,
    shingle_hashes,
    signature_agreement,
    simhash,
    sql_lsh_band_keys,
    sql_md5_long,
    sql_minhash_signature,
    sql_simhash_bits,
    sql_token_hashes,
    tokens,
    word_shingles,
)
from flink_mingo_tail_spark.operators.ranks import global_row_number
from flink_mingo_tail_spark.operators.semantic_index import DEFAULT_N_TABLES
from flink_mingo_tail_spark.operators.skew import pin_width
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread

MINHASH_K = 8
ROWS_PER_BAND = 4  # 2 bands of 4 => candidate iff est. jaccard^4 collision in a band


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    df = load_table(spark, sf_dir, name)
    # spread(): single-file corpora otherwise serialize the signature
    # computations on one core (see tables.spread)
    return spread(df) if name == "documents" else df


@query(
    "q70_exact_dedup_replay",
    oracle="""
    WITH delivered AS (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events WHERE user_id % 7 = 0   -- replayed at-least-once deliveries
    )
    SELECT count(*) AS n_delivered,
           count(DISTINCT event_id) AS n_unique,
           count(*) - count(DISTINCT event_id) AS n_dups_removed
    FROM delivered
    """,
)
def q70_exact_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of an at-least-once redelivery stream (the batch twin
    of the reference's dedup need: replica fan-in delivers every op
    replicaDepth times, MongoDBOplogSource.java:116-128). Hash-groupBy
    on the op id — the O(n) scalable exact-dedup plan."""
    e = _t(spark, sf_dir, "events")
    delivered = e.unionByName(e.filter(F.col("user_id") % 7 == 0))
    return delivered.agg(
        F.count("*").alias("n_delivered"),
        F.countDistinct("event_id").alias("n_unique"),
        (F.count("*") - F.countDistinct("event_id")).alias("n_dups_removed"),
    )


@query(
    "q71_content_hash_dedup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, md5(lower(trim(text))) AS content_hash FROM documents
    )
    SELECT doc_id, content_hash,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY content_hash)
                THEN TRUE ELSE FALSE END AS is_keeper
    FROM hashed
    ORDER BY doc_id
    """,
)
def q71_content_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup with deterministic keeper election
    (min doc_id per normalized-text md5 group). At 100 TB this is one
    shuffle on a 128-bit key — the standard first pass of any corpus
    dedup pipeline."""
    d = _t(spark, sf_dir, "documents")
    hashed = d.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return hashed.select(
        "doc_id",
        "content_hash",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
    ).orderBy("doc_id")


_SQL_TOKS = "string_split(text, ' ')"
_SQL_SIG = sql_minhash_signature(f"list_distinct({_SQL_TOKS})", MINHASH_K)


@query(
    "q72_minhash_signature",
    oracle=f"""
    SELECT doc_id, array_to_string({_SQL_SIG}, ',') AS sig
    FROM documents
    ORDER BY doc_id
    LIMIT 300
    """,
)
def q72_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8) over unigram token sets — per-row array
    folds only, zero shuffle; md5-based permutations so the oracle
    reproduces the exact signature values."""
    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature(F.array_distinct(tokens(F.col("text"))), MINHASH_K)
    return (
        d.select("doc_id", F.array_join(sig.cast("array<string>"), ",").alias("sig"))
        .orderBy("doc_id")
        .limit(300)
    )


@query(
    "q73_minhash_lsh_dedup",
    oracle=f"""
    WITH sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents
    ), banded AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM sigs
    ), band_rep AS (
        SELECT band, min(doc_id) AS rep FROM banded GROUP BY band
    )
    SELECT b.doc_id,
           min(r.rep) AS cluster_rep,
           min(r.rep) < b.doc_id AS is_near_dup
    FROM banded b JOIN band_rep r ON b.band = r.band
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def q73_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup clustering: band the signatures (2 bands × 4
    rows), elect min(doc_id) per band bucket as representative, assign
    each doc to its smallest representative; docs whose representative
    precedes them are near-duplicates to drop.

    This is deliberately NOT the all-pairs-within-bucket formulation: on
    a near-duplicate-heavy corpus candidate pairs are quadratic in
    bucket size (measured: 55 s and millions of pairs at sf0.1), while
    representative election is linear — two hash aggregates and one
    equi-join on the band key. One-pass single-linkage approximation of
    the dup clusters (exact pair verification for a bounded slice is
    q75). That is the shape that survives 100 TB."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    # Stage the md5 base hashes in their own projection: the k affine
    # min-folds then share ONE hashing pass (k transform lambdas each
    # embedding md5 cannot be unified by codegen across lambda scopes).
    hashed = d.select(
        "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
    )
    sigs = hashed.select(
        "doc_id", minhash_from_hashes(F.col("hs"), MINHASH_K).alias("sig")
    )
    banded = sigs.select(
        "doc_id", F.explode(lsh_band_keys(F.col("sig"), ROWS_PER_BAND, MINHASH_K)).alias("band")
    )
    # Window-min instead of agg + join-back: one shuffle of `banded` on
    # the band key and the signatures are computed once. The join
    # formulation materializes a rep-per-distinct-band side that is
    # corpus-sized at scale (unbroadcastable at 100 TB) and re-derives
    # the signature subtree for it (no exchange reuse: 2x the hashing).
    w = Window.partitionBy("band")
    return (
        banded.withColumn("rep", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("rep").alias("cluster_rep"))
        .select(
            "doc_id", "cluster_rep", (F.col("cluster_rep") < F.col("doc_id")).alias("is_near_dup")
        )
        .orderBy("doc_id")
    )


def dedup_component_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) under the transitive closure of q73's LSH
    candidate graph — the shared q73b/q237 construction: min-label
    propagation + pointer jumping over the (doc, band-rep) star edges
    (operators/cluster.py)."""
    from flink_mingo_tail_spark.operators.cluster import connected_components

    d = _t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
    )
    sigs = hashed.select("doc_id", minhash_from_hashes(F.col("hs"), MINHASH_K).alias("sig"))
    banded = sigs.select(
        "doc_id", F.explode(lsh_band_keys(F.col("sig"), ROWS_PER_BAND, MINHASH_K)).alias("band")
    )
    w = Window.partitionBy("band")
    edges = (
        banded.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("rep") < F.col("doc_id"))
        .select(F.col("doc_id").alias("src"), F.col("rep").alias("dst"))
        .distinct()
    )
    comp = connected_components(edges)
    return (
        d.select("doc_id")
        .join(comp, d.doc_id == comp.node, "left")
        .select("doc_id", F.coalesce("component", F.col("doc_id")).alias("component"))
    )


@query(
    "q73b_dedup_components",
    oracle=f"""
    WITH RECURSIVE sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents
    ), banded AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM sigs
    ), band_rep AS (
        SELECT band, min(doc_id) AS rep FROM banded GROUP BY band
    ), edges AS (
        SELECT DISTINCT b.doc_id AS a, r.rep AS b
        FROM banded b JOIN band_rep r ON b.band = r.band
        WHERE r.rep < b.doc_id
    ), sym AS (
        SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ), reach(src, dst) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ), comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           coalesce(c.component, d.doc_id) < d.doc_id AS is_dup
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def q73b_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE transitive dup clusters over the LSH candidate graph
    (operators/cluster.py): q73's band election is one-hop single
    linkage (doc → min rep among its own buckets); chained buckets
    (A~B in band 1, B~C in band 2) only merge under the transitive
    closure, which is what corpus dedup actually keeps/drops by.

    Spark side: iterative min-label propagation + pointer jumping over
    the (doc, band-rep) star edges — O(log d) rounds of two shuffles
    each. Oracle: DuckDB recursive-CTE reachability closure (exact but
    quadratic-in-component — oracle-only; the Spark plan is the one
    that scales)."""
    comp = dedup_component_frame(spark, sf_dir)
    return comp.withColumn("is_dup", F.col("component") < F.col("doc_id")).orderBy(
        "doc_id"
    )


@query(
    "q74_simhash",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, {sql_token_hashes(_SQL_TOKS)} AS h FROM documents
    )
    SELECT doc_id, {sql_simhash_bits('h')} AS simhash16
    FROM hashed
    ORDER BY doc_id
    LIMIT 300
    """,
)
def q74_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (majority vote per bit over distinct
    token hashes) — pure per-row expressions; near-dup search then
    reduces to small-radius Hamming joins on an integer column."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", simhash(tokens(F.col("text")), 16).alias("simhash16"))
        .orderBy("doc_id")
        .limit(300)
    )


@query(
    "q75_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents WHERE doc_id < 120
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def q75_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (unigram) Jaccard similarity via the inverted-index
    join: explode distinct tokens, count co-occurrences, |A∩B|/(|A|+|B|-|A∩B|).
    Integer counts + a single division => bit-exact across engines.

    Scale shape: the token join is the inverted index — cost bounded by
    posting-list sizes, and in production runs AFTER LSH blocking (q73)
    restricts the pair space; the doc_id<120 bound here keeps the
    demonstrative all-pairs variant small."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    toks = d.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


_DECON_N = 4  # n-gram width; probe set = doc_id % 100 == 0 (stand-in benchmark)


@query(
    "q75b_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS ln
        FROM documents
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, ln - {_DECON_N - 2}),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM toks WHERE ln >= {_DECON_N}
    ), probe AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0
    ), hits AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN probe p ON gr.g = p.g
        WHERE gr.doc_id % 100 <> 0
    )
    SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 100 <> 0
    ORDER BY d.doc_id
    """,
)
def q75b_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag corpus docs sharing any
    4-gram with the eval/benchmark set (here the deterministic
    doc_id%100==0 slice stands in for the benchmark corpus). The
    standard pre-training hygiene pass (the 13-gram overlap rule of
    GPT-3/PaLM appendix fame, narrowed to 4 for the synthetic vocab).

    Scale shape: corpus n-grams are built in-expression (no
    pre-materialization), the probe set is benchmark-sized and
    broadcast, so the corpus side is ONE pass + a broadcast left-semi
    join — no shuffle of the 100 TB side; dedup of hit doc_ids is the
    only corpus-keyed aggregate and it is count-bounded by the corpus
    doc count."""
    d = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    toks = d.select("doc_id", t.alias("t"), F.size(t).alias("ln"))
    gram_expr = F.expr(
        "transform(sequence(1, ln - 3), i -> concat_ws(' ', "
        "element_at(t, i), element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))"
    )
    grams = toks.filter(F.col("ln") >= _DECON_N).select(
        "doc_id", F.explode(gram_expr).alias("g")
    )
    probe = grams.filter(F.col("doc_id") % 100 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(probe), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        d.filter(F.col("doc_id") % 100 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", F.coalesce("__hit", F.lit(False)).alias("contaminated"))
        .orderBy("doc_id")
    )


@query(
    "q119_minhash_jaccard_estimate",
    oracle=f"""
    WITH sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents WHERE doc_id < 120
    ), toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents WHERE doc_id < 120
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS exact_jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.4
    )
    SELECT p.doc_a, p.doc_b,
           len(list_filter(range(1, {MINHASH_K + 1}), i -> x.sig[i] = y.sig[i])) AS n_agree,
           len(list_filter(range(1, {MINHASH_K + 1}), i -> x.sig[i] = y.sig[i]))
               / {float(MINHASH_K)} AS est_jaccard,
           p.exact_jaccard
    FROM pairs p
    JOIN sigs x ON x.doc_id = p.doc_a
    JOIN sigs y ON y.doc_id = p.doc_b
    ORDER BY p.doc_a, p.doc_b
    """,
)
def q119_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-QA calibration: for genuinely-similar pairs (exact unigram
    Jaccard >= 0.4 on the bounded doc_id<120 slice), compare the MinHash
    ESTIMATE (fraction of agreeing signature components, k=8) against
    the exact Jaccard — the measurement a pipeline owner runs before
    trusting LSH thresholds on a new corpus.

    Cross-engine exactness: n_agree is an integer; est_jaccard = n/8 is
    a dyadic rational (bit-exact as a double); exact_jaccard is a single
    int/int division, the identical IEEE op in both engines (same idiom
    as q75). Scale shape: the estimator itself is a per-pair array zip
    over already-materialized signatures — in production it samples
    LSH-candidate pairs (q73's output), never all pairs; the all-pairs
    exact join here is oracle-sized by the doc_id bound."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    toks = d.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    pairs = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("exact_jaccard"))
        .filter(F.col("exact_jaccard") >= 0.4)
    )
    sigs = d.select(
        "doc_id",
        minhash_from_hashes(
            shingle_hashes(F.array_distinct(tokens(F.col("text")))), MINHASH_K
        ).alias("sig"),
    )
    x = sigs.alias("x")
    y = sigs.alias("y")
    n_agree = F.size(
        F.filter(F.zip_with(F.col("x.sig"), F.col("y.sig"), lambda p, q: p == q), lambda m: m)
    )
    return (
        pairs.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_agree.alias("n_agree"),
            (n_agree / F.lit(float(MINHASH_K))).alias("est_jaccard"),
            "exact_jaccard",
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q117_incremental_dedup",
    oracle=f"""
    WITH inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7),
    idx AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
    exact AS (
        SELECT DISTINCT i.doc_id
        FROM inc i JOIN (SELECT DISTINCT md5(text) AS ch FROM idx) x
          ON md5(i.text) = x.ch
    ),
    inc_b AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM (SELECT doc_id, {sql_minhash_signature("list_distinct(string_split(text, ' '))", MINHASH_K)} AS sig FROM inc)
    ),
    idx_b AS (
        SELECT DISTINCT unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM (SELECT {sql_minhash_signature("list_distinct(string_split(text, ' '))", MINHASH_K)} AS sig FROM idx)
    ),
    near AS (
        SELECT DISTINCT b.doc_id FROM inc_b b JOIN idx_b USING (band)
    )
    SELECT i.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS status
    FROM inc i
    LEFT JOIN exact e ON e.doc_id = i.doc_id
    LEFT JOIN near n ON n.doc_id = i.doc_id
    ORDER BY i.doc_id
    """,
)
def q117_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (daily-ingest) dedup: classify each INCOMING doc
    (the deterministic doc_id%10==7 slice stands in for today's batch)
    against the EXISTING corpus — 'exact_dup' on content-hash match,
    'near_dup' on any shared MinHash-LSH band key, else 'new'. This is
    the shape a continuously-growing corpus actually runs: only the
    incoming slice is hashed fresh each day.

    Scale shape: both probes are left-semi equi-joins keyed by content
    hash / band key. In production the index side is the PERSISTED hash
    and band tables (written once, partitioned by key prefix), so the
    daily cost is one pass over the small incoming slice plus
    partition-pruned index lookups; here both sides derive in-query
    from the same fixture. No all-pairs comparison anywhere."""
    d = _t(spark, sf_dir, "documents")
    inc = d.filter(F.col("doc_id") % 10 == 7)
    idx = d.filter(F.col("doc_id") % 10 != 7)

    exact = (
        inc.select("doc_id", F.md5("text").alias("ch"))
        .join(idx.select(F.md5("text").alias("ch")).distinct(), "ch", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__exact", F.lit(True))
    )

    def bands(df: DataFrame) -> DataFrame:
        hashed = df.select(
            "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
        )
        sig = hashed.select("doc_id", minhash_from_hashes(F.col("hs"), MINHASH_K).alias("sig"))
        return sig.select(
            "doc_id", F.explode(lsh_band_keys(F.col("sig"), ROWS_PER_BAND, MINHASH_K)).alias("band")
        )

    near = (
        bands(inc)
        .join(bands(idx).select("band").distinct(), "band", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    return (
        inc.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__exact"), "exact_dup")
            .when(F.col("__near"), "near_dup")
            .otherwise("new")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q154 — exact set-similarity self-join (AllPairs/PPJoin prefix filtering)
# ---------------------------------------------------------------------------

_SSJ_BIGRAMS = """
    s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))
               AS st
      FROM documents
    )
"""


@query(
    "q154_set_similarity_join",
    oracle=f"""
    WITH {_SSJ_BIGRAMS},
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.st, b.st)) AS inter,
             len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS un
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(a.st) > 0 AND len(b.st) > 0
    )
    SELECT doc_a, doc_b, inter, un,
           CAST(round(inter * 1000000.0 / un) AS BIGINT) AS jacc_micro
    FROM p WHERE inter * 2 >= un
    ORDER BY doc_a, doc_b
    """,
)
def q154_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join: every document pair whose bigram
    sets have Jaccard >= 0.5, via AllPairs/PPJoin prefix filtering
    (Bayardo et al. WWW'07; Xiao et al. VLDB'08) — the lossless exact
    complement of the probabilistic MinHash-LSH path (q73).

    Candidate generation: bigrams are globally ordered rarest-first
    (ascending document frequency, bigram text as tie-break); each
    document keeps only its PREFIX of length |s| - ceil(tau*|s|) + 1
    under that order. If J(A,B) >= tau then |A∩B| >= ceil(tau*|A|), and
    removing the prefix leaves only ceil(tau*|A|) - 1 elements, so some
    prefix element of A lies in A∩B (and symmetrically for B under the
    SAME global order) — prefix-prefix equi-join misses no true pair.
    A pair-level length filter (2*min >= max for tau=0.5) prunes
    further before verification. The verify step recomputes the EXACT
    intersection from the full sets, so false candidates only cost
    time, never correctness — which is why the oracle can be the
    unblocked all-pairs spelling.

    Scale shape: exact-duplicate sets are COLLAPSED before the join
    (md5 over the sorted bigram list), so the prefix equi-join runs
    over DISTINCT sets only — on duplicate-heavy corpora the naive
    join's candidate count grows with the square of the copy
    multiplicity inside every prefix bucket (the 10x probe corpus
    wedged exactly this way before the collapse, SCALE.md), while the
    collapsed join is invariant to it; identical-set pairs (J = 1
    closed-form, no verification) and rep-match expansions are emitted
    afterwards and are output-bound. The only corpus-wide shuffles are
    the bigram-frequency aggregate and the prefix equi-join on single
    bigram keys (AQE skew handling applies); nothing all-pairs ever
    materializes. NOTE on this fixture: a 916-bigram vocabulary makes
    even rare prefixes collide broadly (like q140's corpus, SCALE.md)
    — at real corpus vocabularies the rarest-first prefix is what
    makes this sublinear.
    """
    return _ssj_impl(spark, sf_dir, 1, 2)


def _ssj_impl(spark: SparkSession, sf_dir: str, tau_num: int, tau_den: int) -> DataFrame:
    """Shared AllPairs/PPJoin body for q154 (tau = 0.5, the correctness
    anchor) and q154b (tau = 0.7, the bounded-output bench citizen).
    Precondition 2*tau_num >= tau_den (size ratio <= 2) keeps the
    {lb-1, lb, lb+1} length-band explode lossless."""
    if 2 * tau_num < tau_den:
        raise ValueError("set-similarity join requires tau >= 0.5 for the length-band explode")
    # single-token documents have EMPTY bigram sets; a pair of them would
    # hit union = 0 (a 0/0 Jaccard) — exclude empty sets outright. The
    # filter is spelled on the RAW token count, not size(st): sz > 0 ⟺
    # size(shingles) > 0 ⟺ size(tokens) >= 2 (word_shingles is empty iff
    # the doc has < n tokens; array_distinct of a nonempty array is
    # nonempty), and a filter on size(st) gets predicate-pushed BELOW the
    # projection that computes st, re-evaluating the whole tokenize +
    # shingle + distinct chain once in the filter and again in the
    # project (measured: 2.75 s -> 0.72 s for the keyed chain at sf0.1).
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.size(tokens(F.col("text"))) >= 2)
        .select(
            "doc_id", F.array_distinct(word_shingles(tokens(F.col("text")), 2)).alias("st")
        )
    )
    docs = d.withColumn("sz", F.size("st"))
    # DUPLICATE COLLAPSE: real corpora (and the id-shifted probe corpus,
    # SCALE.md) are exact-duplicate-heavy, and identical sets would
    # multiply every prefix bucket — candidates grow with the SQUARE of
    # the copy count. Join DISTINCT sets only; identical-set pairs are
    # emitted closed-form (J = 1) and rep-level matches re-expand to
    # member pairs afterwards. Both expansions are output-bound.
    # All downstream shuffle keys are LONGS, not strings (round-7 A/B:
    # 1.35x wall at sf0.1): the set key is min(doc_id) of the identical-
    # set group (exact — no hash-collision risk), computed with the same
    # one shuffle on the content hash the groupBy spelling used.
    keyed = docs.withColumn(
        "skey", F.md5(F.concat_ws("\x1f", F.sort_array("st")))
    ).withColumn("rep", F.min("doc_id").over(Window.partitionBy("skey")))
    # MATERIALIZE the keyed frame once (r14): it feeds four downstream
    # branches (members twice, sets, the identical-pair emit) and
    # differential column pruning makes the branch subtrees
    # non-identical, so ReuseExchange never fires — the pre-checkpoint
    # plan re-ran the tokenize + shingle + md5 + skey-window chain for
    # every branch (17 documents scans, plans/r14/q154b_*_before.txt).
    # One localCheckpoint (the cluster.py/graph.py loop idiom) computes
    # the chain once; at 100 TB this replaces O(branches) corpus scans
    # with one scan + one bounded materialization of (rep, doc_id, st,
    # sz) — the same bytes ONE branch already shuffled.
    keyed = keyed.select("rep", "doc_id", "st", "sz").localCheckpoint()
    members = keyed.select("rep", "doc_id")
    sets = keyed.filter(F.col("doc_id") == F.col("rep")).select("rep", "st", "sz")
    tok = sets.select("rep", "sz", F.explode("st").alias("bg"))
    dfreq = tok.groupBy("bg").agg(F.count("*").alias("df"))
    # Dense int gram dictionary in rarest-first order: gid = exact
    # global rank under (df, bg) via the two-level prefix pattern
    # (operators/ranks — the vocab frame is corpus-scale at 100 TB, so
    # no single-partition window here either). gid replaces the string
    # bigram as join key AND element type: the prefix equi-join probes
    # and the verify arrays move ints instead of strings.
    gids = global_row_number(dfreq, F.col("df"), F.col("bg"), out="gid").select("bg", "gid")
    ranked = tok.join(gids, "bg").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("rep").orderBy("gid")),
    )
    # Same materialize-once treatment (r14): ranked feeds isets AND the
    # prefix frame (which self-joins, doubling again) — without it the
    # explode + dfreq-join + gid-rank + rep-window chain re-runs per
    # branch. bg is dropped first: downstream only needs the int gid.
    ranked = ranked.select("rep", "sz", "gid", "pos").localCheckpoint()
    # full sets as SORTED int arrays for the verify intersects — same
    # ranked frame the prefixes come from, one extra shuffle on the
    # long rep key
    isets = ranked.groupBy("rep").agg(F.sort_array(F.collect_list("gid")).alias("ids"))
    # prefix length |s| - ceil(tau*|s|) + 1 with ceil done in integers
    prefix_len = F.col("sz") - F.expr(
        f"CAST(ceil({tau_num} * sz / {tau_den}.0) AS INT)"
    ) + F.lit(1)
    # lb = floor(log2(sz)) via bin-string length — EXACT integer, no
    # float log. J >= 1/2 forces a size ratio <= 2, so matching sizes
    # differ by at most one lb step: the b side emits {lb-1, lb, lb+1}
    # and (gid, lb) becomes the join key — ~6x the key cardinality of
    # gid alone, which both splits the hot prefix buckets that AQE's
    # byte-based skew split cannot see (join output is quadratic in a
    # bucket while its INPUT bytes stay tiny) and prunes cross-size
    # false candidates before they exist.
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "rep", "sz", "gid", "pos", F.expr("length(bin(sz)) - 1").alias("lb")
    )
    a = prefix.alias("a")
    b = prefix.select(
        "rep", "sz", "gid", "pos",
        F.explode(
            F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)
        ).alias("lb"),
    ).alias("b")
    # PPJoin positional filter: a shared prefix gram at positions
    # (pa, pb) caps the achievable overlap at 1 + min(sa-pa, sb-pb);
    # J >= tau needs overlap >= ceil(tau/(1+tau) * (sa+sb)) — for
    # tau = num/den that is ceil(num*(sa+sb) / (num+den)), computed in
    # exact int64 (ceil(a/b) = (a+b-1) div b). The FIRST shared gram
    # under the global order always satisfies the cap for a true pair,
    # so filtering each joined row is lossless (Xiao et al. VLDB'08).
    nd = tau_num + tau_den
    alpha = F.expr(f"({tau_num} * (a.sz + b.sz) + {nd - 1}) div {nd}")
    ubound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
    )
    cand = (
        a.join(b, (F.col("a.gid") == F.col("b.gid")) & (F.col("a.lb") == F.col("b.lb")))
        .filter(F.col("a.rep") < F.col("b.rep"))
        # length filter: J >= tau needs tau*max(|A|,|B|) <= min(|A|,|B|)
        .filter(
            F.least(F.col("a.sz"), F.col("b.sz")) * tau_den
            >= F.greatest(F.col("a.sz"), F.col("b.sz")) * tau_num
        )
        .filter(ubound >= alpha)
        .select(F.col("a.rep").alias("ka"), F.col("b.rep").alias("kb"))
        .distinct()
    )
    # The verify stage is CPU-bound (array_intersect per candidate),
    # but its shuffle inputs are byte-small, so AQE coalesces it to a
    # handful of partitions and the intersects serialize (measured:
    # 38.5 s on 3 post-coalesce tasks vs ~6 s wide at 1x, SCALE.md).
    # pin_width (operators/skew.py) is the hoisted idiom: an explicit
    # user repartition is exempt from AQE coalescing, pinning the
    # verify joins at full cluster width.
    rep_pairs = (
        pin_width(pin_width(cand, "ka")
        .join(isets.select(F.col("rep").alias("ka"), F.col("ids").alias("sa")), "ka"), "kb")
        .join(isets.select(F.col("rep").alias("kb"), F.col("ids").alias("sb")), "kb")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("un", F.size("sa") + F.size("sb") - F.col("inter"))
        .filter(F.col("inter") * tau_den >= F.col("un") * tau_num)
        .select("ka", "kb", "inter", "un")
    )
    # expand rep matches to member pairs (distinct sets => doc ids differ)
    cross = (
        rep_pairs.join(members.select(F.col("rep").alias("ka"), F.col("doc_id").alias("ida")), "ka")
        .join(members.select(F.col("rep").alias("kb"), F.col("doc_id").alias("idb")), "kb")
        .select(
            F.least("ida", "idb").alias("doc_a"),
            F.greatest("ida", "idb").alias("doc_b"),
            "inter",
            "un",
        )
    )
    # identical-set pairs: J = 1 by construction, no verification needed
    same = (
        members.alias("a")
        .join(members.alias("b"), "rep")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .join(sets.select("rep", "sz"), "rep")
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("sz").alias("inter"),
            F.col("sz").alias("un"),
        )
    )
    return (
        cross.unionByName(same)
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "un",
            F.round(F.col("inter") * F.lit(1000000.0) / F.col("un"), 0)
            .cast("long")
            .alias("jacc_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q154b_set_similarity_tau07",
    oracle=f"""
    WITH {_SSJ_BIGRAMS},
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.st, b.st)) AS inter,
             len(a.st) + len(b.st) - len(list_intersect(a.st, b.st)) AS un
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(a.st) > 0 AND len(b.st) > 0
    )
    SELECT doc_a, doc_b, inter, un,
           CAST(round(inter * 1000000.0 / un) AS BIGINT) AS jacc_micro
    FROM p WHERE inter * 10 >= un * 7
    ORDER BY doc_a, doc_b
    """,
)
def q154b_set_similarity_tau07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q154 at tau = 0.7 — the BENCH-FAIR twin of the tau = 0.5
    correctness anchor (round-6 verdict: q154 was 37% of headline wall
    purely because tau = 0.5 on a copy-heavy corpus emits quadratically
    many true pairs, so the bench measured pair EMISSION, not the
    join). At tau = 0.7 the prefix length drops from ~|s|/2 to ~3|s|/10
    (candidate volume is quadratic in prefix density) and the surviving
    pair set is near-dup-only, so wall time tracks the candidate
    generation + verify plan — the thing the bench should gate. Same
    _ssj_impl code path, so the tau = 0.5 anchor keeps proving the
    shared plan's correctness at the widest threshold.
    """
    return _ssj_impl(spark, sf_dir, 7, 10)


# ---------------------------------------------------------------------------
# q172 — repeated-substring span dedup (round-7 verdict #4)
# ---------------------------------------------------------------------------

_SPAN_K = 5             # repeated-span granularity: k-token shingles
_SPAN_POS = 1 << 20     # pos field width in the packed (doc_id, pos) key


@query(
    "q172_repeated_span_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), sh AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(ts[i:i+{_SPAN_K}-1], ' ')) AS h,
             CASE WHEN i >= {_SPAN_POS} THEN error('q172: pos out of packing domain')
                  ELSE doc_id * {_SPAN_POS} + i END AS packed
      FROM toks, unnest(range(1, len(ts) - {_SPAN_K} + 2)) AS t(i)
      WHERE len(ts) >= {_SPAN_K}
    ), firsts AS (
      SELECT h, min(packed) AS first_packed FROM sh GROUP BY h
    ), rep AS (
      SELECT s.doc_id, s.pos
      FROM sh s JOIN firsts f USING (h)
      WHERE s.packed > f.first_packed
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos > coalesce(max(pos + {_SPAN_K} - 1) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                  THEN 1 ELSE 0 END AS is_new
      FROM rep
    ), grp AS (
      SELECT doc_id, pos,
             CAST(sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_id
      FROM marked
    )
    SELECT doc_id, span_id,
           min(pos) AS span_start,
           max(pos) + {_SPAN_K} - 1 AS span_end,
           max(pos) + {_SPAN_K} - min(pos) AS n_tokens
    FROM grp GROUP BY doc_id, span_id
    ORDER BY doc_id, span_start
    """,
)
def q172_repeated_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-substring span detection — the distributed approximation
    of suffix-array span dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every {k}-token
    shingle occurrence that is NOT the global first occurrence of its
    content (first = smallest packed (doc_id, pos) — the keep-first
    rule) marks its k tokens as repeated; overlapping-or-adjacent
    marked windows within a document merge into MAXIMAL spans
    (interval union via the running prev-max-end window). Output: one
    row per maximal repeated span (doc, start, end, token count) —
    exactly the byte ranges a span-level dedup pass would cut, covering
    both cross-document and intra-document repetition uniformly.

    Determinism / exactness: occurrences are keyed by md5 of the
    shingle text (the q71 precedent) and ordered by the packed long
    doc_id * 2^20 + pos — the pos domain is ENFORCED per row
    (raise_error / error()), doc_id < 2^43 is a documented fixture
    bound. Both engines run the identical integer pipeline, so spans
    hash-match exactly.

    Scale: one shingle explode (corpus-linear), ONE shuffle on the
    shingle hash for first-occurrence election (map-side-combinable
    min), one equi-join back on the hash, then per-document windows
    whose frames are bounded by document length. Nothing all-pairs,
    nothing driver-side; the suffix-array global sort this
    approximates is replaced by the hash group-by, which is the form
    that survives 100 TB (fixed-k shingles catch every repeat of
    length >= k; spans reassemble the long ones).
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= _SPAN_K
    )
    guarded_pos = F.when(
        F.col("pos") >= _SPAN_POS,
        F.expr("raise_error('q172: pos out of packing domain')").cast("long"),
    ).otherwise(F.col("pos"))
    sh = (
        toks.select(
            "doc_id", F.posexplode(word_shingles(F.col("ts"), _SPAN_K)).alias("pos0", "g")
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), F.md5("g").alias("h"))
        .withColumn("packed", F.col("doc_id") * _SPAN_POS + guarded_pos)
    )
    firsts = sh.groupBy("h").agg(F.min("packed").alias("first_packed"))
    rep = (
        sh.join(firsts, "h")
        .filter(F.col("packed") > F.col("first_packed"))
        .select("doc_id", "pos")
    )
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = rep.withColumn(
        "is_new",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + _SPAN_K - 1).over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grp = marked.withColumn("span_id", F.sum("is_new").over(w_run))
    return (
        grp.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(_SPAN_K - 1)).alias("span_end"),
            (F.max("pos") + F.lit(_SPAN_K) - F.min("pos")).alias("n_tokens"),
        )
        .orderBy("doc_id", "span_start")
    )


# ---------------------------------------------------------------------------
# q197 — exact containment join (quote / subset detection, C-PPJoin style)
# ---------------------------------------------------------------------------

_CONT_NUM, _CONT_DEN = 4, 5  # tau = 0.8


@query(
    "q197_containment_join",
    oracle=f"""
    WITH {_SSJ_BIGRAMS},
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.st, b.st)) AS inter,
             len(a.st) AS sz_a
      FROM s a JOIN s b ON a.doc_id <> b.doc_id
      WHERE len(a.st) > 0 AND len(b.st) > 0
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           CAST(sz_a AS BIGINT) AS sz_a,
           CAST(round(inter * 1000000.0 / sz_a) AS BIGINT) AS cont_micro
    FROM p WHERE inter * {_CONT_DEN} >= {_CONT_NUM} * sz_a
    ORDER BY doc_a, doc_b
    """,
)
def q197_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT directed containment join: every ordered document pair
    (a, b) where >= 80% of a's bigram set lies inside b's —
    quote/excerpt/subset detection, the ASYMMETRIC sibling of q154's
    Jaccard join (a tweet quoted inside an article has tiny Jaccard but
    containment ~1; symmetric similarity can never find it).

    Prefix filtering adapts to containment one-sidedly (C-PPJoin):
    under the global rarest-first gram order, if |A ∩ B| >= ceil(tau
    |A|) then A's prefix of length |A| - ceil(tau |A|) + 1 must hit B
    (pigeonhole) — but ONLY the contained side can be prefix-pruned;
    the containing side has no length bound (B may be arbitrarily
    large), so b probes with its FULL gram list, i.e. the candidate
    join is A-prefix x inverted-index(B), bounded by sum over grams of
    prefix_df * df — which the rarest-first order minimizes (prefixes
    concentrate in the df tail). No length bands apply (containment
    has no size-ratio bound, unlike Jaccard >= 0.5).

    Exact-duplicate sets are collapsed to a representative before the
    join (q154's lesson: identical sets square every prefix bucket on
    duplicate-heavy corpora); identical-set member pairs are contained
    both ways by definition (closed form, output-bound), and rep-level
    matches re-expand to member pairs afterwards. The verify step
    recomputes the exact intersection from full int-gram arrays, so
    candidates only cost time, never correctness — the oracle is the
    unblocked all-pairs spelling.
    """
    # raw-token-count filter, not size(st) — same pushdown-duplication
    # avoidance as _ssj_impl (sz > 0 ⟺ size(tokens) >= 2, exact)
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.size(tokens(F.col("text"))) >= 2)
        .select(
            "doc_id", F.array_distinct(word_shingles(tokens(F.col("text")), 2)).alias("st")
        )
    )
    docs = d.withColumn("sz", F.size("st"))
    keyed = docs.withColumn(
        "skey", F.md5(F.concat_ws("\x1f", F.sort_array("st")))
    ).withColumn("rep", F.min("doc_id").over(Window.partitionBy("skey")))
    members = keyed.select("rep", "doc_id")
    sets = keyed.filter(F.col("doc_id") == F.col("rep")).select("rep", "st", "sz")
    tok = sets.select("rep", "sz", F.explode("st").alias("bg"))
    dfreq = tok.groupBy("bg").agg(F.count("*").alias("df"))
    gids = global_row_number(dfreq, F.col("df"), F.col("bg"), out="gid").select(
        "bg", "gid"
    )
    ranked = tok.join(gids, "bg").withColumn(
        "pos", F.row_number().over(Window.partitionBy("rep").orderBy("gid"))
    )
    isets = ranked.groupBy("rep").agg(
        F.sort_array(F.collect_list("gid")).alias("ids"),
        F.first("sz").alias("sz"),
    )
    # contained-side prefix: |s| - ceil(tau*|s|) + 1 in exact integers
    prefix_len = (
        F.col("sz")
        - F.expr(f"CAST(ceil({_CONT_NUM} * sz / {_CONT_DEN}.0) AS INT)")
        + F.lit(1)
    )
    aprobe = ranked.filter(F.col("pos") <= prefix_len).select(
        F.col("rep").alias("ra"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
        "gid",
    )
    ball = ranked.select(
        F.col("rep").alias("rb"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
        "gid",
    )
    # PPJoin prunes before the pair-dedup shuffle: (1) length —
    # |A∩B| <= |B|, so containment needs sz_b >= ceil(tau*sz_a); (2)
    # position — grams are sorted by gid on both sides, so a match at
    # (pos_a, pos_b) bounds the remaining overlap by 1 + min(sz_a -
    # pos_a, sz_b - pos_b). On this fixture's 931-gram vocabulary the
    # raw candidate stream measured 14.1M rows at sf0.1 and the two
    # filters cut it to 8.4M before the distinct (SCALE.md).
    need = F.expr(f"CAST(ceil({_CONT_NUM} * sz_a / {_CONT_DEN}.0) AS INT)")
    cand = (
        aprobe.join(ball, "gid")
        .filter(F.col("ra") != F.col("rb"))
        .filter(F.col("sz_b") * _CONT_DEN >= _CONT_NUM * F.col("sz_a"))
        .filter(
            1 + F.least(F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b"))
            >= need
        )
        .select("ra", "rb")
        .distinct()
    )
    ia = isets.select(
        F.col("rep").alias("ra"), F.col("ids").alias("ids_a"), F.col("sz").alias("sz_a")
    )
    ib = isets.select(F.col("rep").alias("rb"), F.col("ids").alias("ids_b"))
    rep_pairs = (
        cand.join(ia, "ra")
        .join(ib, "rb")
        .withColumn("inter", F.size(F.array_intersect("ids_a", "ids_b")).cast("long"))
        .filter(F.col("inter") * _CONT_DEN >= _CONT_NUM * F.col("sz_a"))
        .select("ra", "rb", "inter", F.col("sz_a").cast("long").alias("sz_a"))
    )
    # rep-level matches expand to member pairs: every copy of group a is
    # contained in every copy of group b (identical sets per group)
    ma = members.select(F.col("rep").alias("ra"), F.col("doc_id").alias("doc_a"))
    mb = members.select(F.col("rep").alias("rb"), F.col("doc_id").alias("doc_b"))
    cross_group = rep_pairs.join(ma, "ra").join(mb, "rb").select(
        "doc_a", "doc_b", "inter", "sz_a"
    )
    # identical-set members contain each other exactly (both directions)
    twins = (
        members.alias("x")
        .join(
            members.alias("y"),
            (F.col("x.rep") == F.col("y.rep"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .join(
            sets.select(
                F.col("rep").alias("trep"), F.col("sz").cast("long").alias("sz_a")
            ),
            F.col("x.rep") == F.col("trep"),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("sz_a").alias("inter"),
            "sz_a",
        )
    )
    return (
        cross_group.unionByName(twins)
        .select(
            "doc_a", "doc_b", "inter", "sz_a",
            F.expr(
                "CAST(round(inter * 1000000.0 / sz_a) AS BIGINT)"
            ).alias("cont_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q200 — cross-source contamination matrix (pairwise 4-gram overlap)
# ---------------------------------------------------------------------------


@query(
    "q200_source_overlap_matrix",
    oracle="""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    g AS (
      SELECT DISTINCT source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram
      FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
    ),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
    p AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT p.src_a, p.src_b, p.inter,
           CAST(round(p.inter * 1000000.0 / (sa.n + sb.n - p.inter)) AS BIGINT)
             AS jacc_micro
    FROM p
    JOIN sz sa ON sa.source = p.src_a
    JOIN sz sb ON sb.source = p.src_b
    ORDER BY p.src_a, p.src_b
    """,
)
def q200_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: exact pairwise 4-gram-set
    Jaccard between every pair of sources — the mixture-level twin of
    document dedup (q73/q154 find duplicate DOCUMENTS; this finds
    duplicated CONTENT FLOWS between shards/feeds, the signal behind
    "these two crawls re-scraped each other" and benchmark-contamination
    audits at the corpus level, cf. q75b's per-document check).

    Scale shape: the distinct (source, gram) frame is one aggregate,
    bounded by |sources| x gram vocabulary; the pair join is keyed on
    the GRAM, and every gram's contribution to the join output is at
    most |sources|^2 rows — so the full matrix costs
    O(vocab x sources^2) regardless of corpus row count, and the final
    Jaccard is 190 rows of exact int64 arithmetic. No document-level
    pair space exists anywhere.
    """
    d = _t(spark, sf_dir, "documents")
    # r14 optimization: the distinct (source, gram) frame feeds three
    # branches (per-source sizes + both pair-join sides); lazily each
    # re-ran the corpus explode + distinct shuffle. Materialize the
    # vocabulary-bounded frame once.
    g = (
        d.select(
            "source",
            F.explode(word_shingles(tokens(F.col("text")), 4)).alias("gram"),
        )
        .distinct()
        .localCheckpoint()
    )
    sz = g.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = g.select(F.col("source").alias("src_a"), "gram")
    b = g.select(F.col("source").alias("src_b"), "gram")
    p = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        p.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            F.expr(
                "CAST(round(inter * 1000000.0 / (na + nb - inter)) AS BIGINT)"
            ).alias("jacc_micro"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# q209 — per-document shingle novelty (first-occurrence share, round 9)
# ---------------------------------------------------------------------------

_NOV_K = 5  # novelty granularity: 5-token shingles (q172's span size)


@query(
    "q209_doc_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(ts[i:i+{_NOV_K}-1], ' ')) AS h
      FROM toks, unnest(range(1, len(ts) - {_NOV_K} + 2)) AS t(i)
      WHERE len(ts) >= {_NOV_K}
    ), first AS (
      SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(round(CAST(sum(CASE WHEN first.first_doc = sh.doc_id
                                    THEN 1 ELSE 0 END) * 1000000 AS DOUBLE)
                      / count(*)) AS BIGINT) AS novel_micro
    FROM sh JOIN first ON first.h = sh.h
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
)
def q209_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a document's DISTINCT 5-token
    shingles whose global first occurrence (minimum doc_id — ingestion
    order) is in this document. The incremental-curation signal that
    q172 (which CUTS repeated spans) and q73 (which pairs near-dups)
    both imply but neither reports: a near-zero novelty share marks a
    document that adds nothing the corpus hasn't already seen — the
    cheap screen a 100 TB pipeline runs before admitting a new crawl
    snapshot.

    Shape: one corpus-linear shingle explode (per-doc DISTINCT via
    array_distinct before exploding), the md5 shingle key shrinking
    shuffle width exactly as q172's span election does; ONE shuffle on
    the shingle hash elects min(doc_id) per shingle (map-side
    combinable); the join back rides the same key. The novelty share is
    an exact integer ratio — ×10⁶ CAST to DOUBLE before the one IEEE
    division (house rule). Documents under 5 tokens have no shingles
    and are absent in both engines."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), _NOV_K))
        ).alias("s"),
    ).select("doc_id", F.md5("s").alias("h"))
    # r14 optimization: first-occurrence election as a min() window over
    # the shingle hash instead of a groupBy + join-back — the join
    # spelling re-ran the corpus explode for its second leg (no
    # ReuseExchange across differentially-pruned branches) and paid a
    # second shuffle on h. One shuffle, one source read, same election.
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.withColumn("first_doc", F.min("doc_id").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr(
                "CAST(round(CAST(n_novel * 1000000 AS DOUBLE) / n_shingles) AS BIGINT)"
            ).alias("novel_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q212 — SimHash Hamming near-pairs via bit-band blocking (round 9)
# ---------------------------------------------------------------------------

_SH_BITS = 32   # wider than q74's 16: 8-bit bands keep buckets sparse
_SH_BANDS = 4   # 4 bands x 8 bits: pigeonhole-complete for hamming <= 3
_SH_HAM = 3


@query(
    "q212_simhash_hamming_pairs",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, {sql_token_hashes(_SQL_TOKS)} AS h FROM documents
    ), fp AS (
        SELECT doc_id, {sql_simhash_bits('h', _SH_BITS)} AS sh FROM hashed
    ), bands AS (
        SELECT doc_id, sh, u.band, (sh >> (8 * u.band)) & 255 AS bits
        FROM fp, unnest(range(0, {_SH_BANDS})) AS u(band)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sh AS sha, b.sh AS shb
        FROM bands a JOIN bands b
          ON b.band = a.band AND b.bits = a.bits AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sha, shb)) <= {_SH_HAM}
    ORDER BY doc_a, doc_b
    """,
)
def q212_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate PAIRS from SimHash fingerprints — the search
    step the q74 docstring promises ("near-dup search then reduces to
    small-radius Hamming joins"): all document pairs whose fingerprints
    differ in ≤ 3 bits, found WITHOUT an all-pairs comparison. Blocking
    is the pigeonhole split of the fingerprint into 4 disjoint bands:
    two fingerprints within Hamming distance 3 differ in at most 3
    bands, so they agree EXACTLY on at least one — a candidate pair iff
    some band's bits collide. Recall is 100% by construction (vs q73's
    probabilistic MinHash bands); precision is restored by the exact
    popcount filter on the xor.

    The fingerprint is 32-bit (q74's operator at width 32, same
    majority-vote construction): band width SETS bucket occupancy, and
    4-bit bands over q74's 16-bit prints give only 16 buckets per band
    — measured 22.8 s at sf0.1 from quadratic within-bucket candidates
    — while 8-bit bands give 256, collapsing the candidate volume ~16×
    at identical recall. Plan: fingerprints are one corpus-linear
    projection; the 4-way band explode is a constant fan-out;
    candidates come from an equi-join on (band, bits) — at 100 TB the
    same join keys more band bits (e.g. 16 bands of 4 over a 64-bit
    fingerprint), keeping per-bucket occupancy bounded like q73's. The
    popcount is integer-exact in both engines (bit_count over xor);
    Spark spells xor with ^, DuckDB with xor() — same values."""
    d = _t(spark, sf_dir, "documents")
    fp = d.select("doc_id", simhash(tokens(F.col("text")), _SH_BITS).alias("sh"))
    bands = fp.select(
        "doc_id",
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(_SH_BANDS - 1))).alias("band"),
    ).withColumn("bits", F.expr("shiftright(sh, 8 * band) & 255"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bits") == F.col("a.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sha"),
            F.col("b.sh").alias("shb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(sha ^ shb) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH_HAM)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q213 — winnowing fingerprints (MOSS-style local-min selection, round 9)
# ---------------------------------------------------------------------------

_WIN_K = 4  # gram size (tokens)
_WIN_W = 5  # winnowing window (grams)

# identical hash spelling in both engines (md5_long's SQL twins)
_WIN_GH_SPARK = (
    f"transform(sequence(1, size(ts) - {_WIN_K - 1}),"
    f" i -> CAST(conv(substring(md5(concat_ws(' ', slice(ts, i, {_WIN_K}))), 1, 15),"
    f" 16, 10) AS BIGINT))"
)
_WIN_GH_DUCK = (
    f"list_transform(range(1, len(ts) - {_WIN_K} + 2),"
    f" i -> ('0x' || substr(md5(array_to_string(ts[i:i+{_WIN_K}-1], ' ')), 1, 15))::BIGINT)"
)


@query(
    "q213_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), gh AS (
      SELECT doc_id, {_WIN_GH_DUCK} AS hs
      FROM toks WHERE len(ts) >= {_WIN_K + _WIN_W - 1}
    ), fps AS (
      SELECT DISTINCT doc_id,
             list_min(hs[j:j+{_WIN_W}-1]) AS fp
      FROM gh, unnest(range(1, len(hs) - {_WIN_W} + 2)) AS u(j)
    )
    SELECT doc_id, fp FROM fps ORDER BY doc_id, fp
    """,
)
def q213_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    MOSS algorithm): hash every {_WIN_K}-token gram, slide a
    {_WIN_W}-gram window, keep each window's MINIMUM hash — the
    local-min selection that guarantees any shared substring of
    ≥ k+w-1 tokens yields at least one IDENTICAL fingerprint in both
    documents (a positional guarantee MinHash sampling cannot give),
    at ~2/(w+1) of the gram density. The plagiarism/exact-excerpt
    detector that complements q73 (probabilistic near-dup), q172
    (global span election) and q209 (novelty): joining this frame on
    fp IS the excerpt-overlap join.

    Pure per-row array expressions build gram hashes and window minima
    (one codegen'd projection, no shuffle until the final distinct);
    the exploded (doc_id, fp) frame is corpus-linear with ~2/(w+1)
    density. Both engines hash with the identical md5-prefix spelling
    (operators/dedup.md5_long and its documented SQL twin), so the
    60-bit fingerprints are bit-equal. Documents shorter than k+w-1
    tokens have no full window and are absent in both engines."""
    d = _t(spark, sf_dir, "documents")
    gh = d.select(
        "doc_id", tokens(F.col("text")).alias("ts")
    ).filter(F.size("ts") >= _WIN_K + _WIN_W - 1).select(
        "doc_id", F.expr(_WIN_GH_SPARK).alias("hs")
    )
    fps = gh.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(hs) - {_WIN_W - 1}),"
                f" j -> array_min(slice(hs, j, {_WIN_W})))"
            )
        ).alias("fp"),
    ).distinct()
    return fps.orderBy("doc_id", "fp")


# ---------------------------------------------------------------------------
# q218 — LSH candidate quality eval: recall/precision vs exact Jaccard (r9)
# ---------------------------------------------------------------------------

_EVAL_MAXID = 120  # q75's demonstrative all-pairs bound
# tau = 0.8 as the exact integer inequality 5·|∩| >= 4·|∪| — no floats
_EVAL_TAU_NUM, _EVAL_TAU_DEN = 5, 4


@query(
    "q218_lsh_recall_eval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents WHERE doc_id < {_EVAL_MAXID}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM toks a JOIN toks b
        ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), exact AS (
      SELECT doc_a, doc_b
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE {_EVAL_TAU_NUM} * n_common
            >= {_EVAL_TAU_DEN} * (sa.n + sb.n - n_common)
    ), sigs AS (
      SELECT doc_id, {_SQL_SIG} AS sig FROM documents
      WHERE doc_id < {_EVAL_MAXID}
    ), banded AS (
      SELECT doc_id,
             unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
      FROM sigs
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.doc_id < b.doc_id
    ), m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
             (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
             (SELECT CAST(count(*) AS BIGINT)
              FROM exact e JOIN cand c
                ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b) AS n_hit
    )
    SELECT n_exact, n_cand, n_hit,
           CASE WHEN n_exact = 0 THEN NULL ELSE
             CAST(round(CAST(n_hit * 1000000 AS DOUBLE) / n_exact) AS BIGINT)
           END AS recall_micro,
           CASE WHEN n_cand = 0 THEN NULL ELSE
             CAST(round(CAST(n_hit * 1000000 AS DOUBLE) / n_cand) AS BIGINT)
           END AS precision_micro
    FROM m
    """,
)
def q218_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality evaluation of the MinHash-LSH blocking scheme
    (q73's k=8 signatures, 2 bands × 4 rows) against EXACT unigram
    Jaccard ≥ 0.8 ground truth on q75's bounded subset — the measure-
    don't-guess loop every production dedup pipeline runs before
    trusting a banding configuration: recall says what the blocker
    MISSES (pairs the exact join finds but no band collides),
    precision says what it WASTES (candidates the verifier will
    reject). Banding theory gives P(candidate) = 1-(1-j^4)^2; this
    query measures the realized operating point on real text.

    Ground truth uses the exact integer inequality 5·|∩| ≥ 4·|∪| (no
    floating-point threshold), the same inverted-index join as q75;
    candidates replay q73's exact signature/banding spelling, so both
    engines compute identical pair sets and the three counts reduce to
    one row. The demonstrative all-pairs bound (doc_id < 120) is q75's
    policy — in production this eval runs on a hash-sample of the
    corpus at the same bound."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _EVAL_MAXID)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    exact = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(
            F.lit(_EVAL_TAU_NUM) * F.col("n_common")
            >= F.lit(_EVAL_TAU_DEN) * (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
        )
        .select("doc_a", "doc_b")
    )
    sig = minhash_signature(F.array_distinct(tokens(F.col("text"))), MINHASH_K)
    banded = d.select(
        "doc_id",
        F.explode(lsh_band_keys(sig, ROWS_PER_BAND, MINHASH_K)).alias("band"),
    )
    ba, bb = banded.alias("ba"), banded.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    n_hit = exact.join(cand, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_exact",
            "n_cand",
            "n_hit",
            F.expr(
                "CASE WHEN n_exact = 0 THEN NULL ELSE"
                " CAST(round(CAST(n_hit * 1000000 AS DOUBLE) / n_exact) AS BIGINT) END"
            ).alias("recall_micro"),
            F.expr(
                "CASE WHEN n_cand = 0 THEN NULL ELSE"
                " CAST(round(CAST(n_hit * 1000000 AS DOUBLE) / n_cand) AS BIGINT) END"
            ).alias("precision_micro"),
        )
    )


# ---------------------------------------------------------------------------
# q226 — composed curation pipeline: quality -> exact dedup -> LSH near-dup
#        -> decontaminate -> per-source budget cut (round 11)
# ---------------------------------------------------------------------------

_PIPE_EVAL_MOD = 100   # id % 100 == 0 is the held-out eval slice (q75b/q224)
_PIPE_BUDGET = 300     # per-source token budget (q190's knob, pipeline-sized)
_PIPE_STOPS = "['the','a','and','of','to','is']"  # q118's English sanity list
# The pipeline's near-dup stage bands at 1 band x 8 rows (collision
# prob J^8) instead of q73's 2 x 4 (J^4 per band): q73 is the HIGH-
# RECALL candidate generator; a destructive pipeline stage that DROPS
# training data wants the high-PRECISION shape. Same signatures, same
# election — only the band split differs.
_PIPE_ROWS_PER_BAND = MINHASH_K  # all 8 rows in one band


# Shared SQL core for q226/q227: the full staged WITH-chain ending in
# a per-doc `verdict` CTE (doc_id, source, n_toks, reason).
_PIPE_CORE_SQL = f"""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(text, ' ') AS t
        FROM documents
    ), sig AS (
        SELECT doc_id, source, lang, n_chars, text,
               CAST(len(t) AS BIGINT) AS n_toks,
               len(list_distinct(t)) AS n_distinct,
               len(list_intersect(list_distinct(t), {_PIPE_STOPS})) AS n_stop
        FROM d
    ), s1 AS (
        SELECT *,
               CASE WHEN doc_id % {_PIPE_EVAL_MOD} = 0 THEN 'eval_holdout'
                    WHEN n_toks < 15 THEN 'too_short'
                    WHEN n_toks > 5000 THEN 'too_long'
                    WHEN CAST(n_distinct AS DOUBLE) / n_toks < 0.2 THEN 'repetitive'
                    WHEN lang = 'en' AND n_stop < 1 THEN 'no_stopwords'
                    END AS r1
        FROM sig
    ), surv1 AS (
        SELECT *, md5(lower(trim(text))) AS content_hash
        FROM s1 WHERE r1 IS NULL
    ), s2 AS (
        SELECT *, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY content_hash)
                       THEN 'exact_dup' END AS r2
        FROM surv1
    ), surv2 AS (
        SELECT * FROM s2 WHERE r2 IS NULL
    ), sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig
        FROM surv2
    ), banded AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', _PIPE_ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM sigs
    ), band_rep AS (
        SELECT band, min(doc_id) AS rep FROM banded GROUP BY band
    ), nd AS (
        SELECT b.doc_id FROM banded b JOIN band_rep r ON b.band = r.band
        GROUP BY b.doc_id HAVING min(r.rep) < b.doc_id
    ), surv3 AS (
        SELECT s.* FROM surv2 s WHERE s.doc_id NOT IN (SELECT doc_id FROM nd)
    ), grams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        FROM d WHERE len(t) >= 4
    ), probe AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {_PIPE_EVAL_MOD} = 0
    ), cont AS (
        SELECT DISTINCT gr.doc_id
        FROM grams gr JOIN probe p ON gr.g = p.g
        JOIN surv2 s ON s.doc_id = gr.doc_id
    ), surv4 AS (
        SELECT s.* FROM surv3 s WHERE s.doc_id NOT IN (SELECT doc_id FROM cont)
    ), packed AS (
        SELECT doc_id,
               CAST(coalesce(sum(n_toks) OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM surv4
    ), ob AS (
        SELECT doc_id FROM packed WHERE cum_before >= {_PIPE_BUDGET}
    ), verdict AS (
    SELECT s1.doc_id, s1.source, s1.n_toks,
           coalesce(s1.r1,
                    CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' END,
                    CASE WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END,
                    CASE WHEN ct.doc_id IS NOT NULL THEN 'contaminated' END,
                    CASE WHEN ob.doc_id IS NOT NULL THEN 'over_budget' END,
                    'kept') AS reason
    FROM s1
    LEFT JOIN (SELECT doc_id FROM s2 WHERE r2 IS NOT NULL) ex ON ex.doc_id = s1.doc_id
    LEFT JOIN nd ON nd.doc_id = s1.doc_id
    LEFT JOIN cont ct ON ct.doc_id = s1.doc_id
    LEFT JOIN ob ON ob.doc_id = s1.doc_id
    )
"""


def curation_verdict(
    spark: SparkSession, sf_dir: str, *, persist_stage_boundary: bool = False
) -> DataFrame:
    """The COMPOSED curation pipeline — the end-to-end shape a real
    100 TB training-data run executes, as ONE lazy plan with per-stage
    reason codes: eval holdout -> quality filter (q118's rules) ->
    exact content-hash dedup (q71's keeper election) -> MinHash-LSH
    near-dup (q73's representative election) -> 4-gram decontamination
    vs the eval slice (q75b) -> per-source token-budget cut in quality
    order (q190). Every stage operates on the SURVIVORS of the stages
    before it (a near-dup loser whose band representative was itself
    quality-dropped is NOT dropped; the budget counts only tokens that
    made it through), so the reason codes are mutually exclusive by
    construction and the output is a per-doc audit trail: doc_id,
    source, first-failing-stage reason, keep.

    The stages compose as ONE plan over a shared quality/hash frame:
    the per-doc stage-1 frame is computed once (localCheckpoint of the
    narrow id/count/hash/reason rows — round 14; the earlier all-lazy
    spelling re-ran its scan+tokenize+md5 chain in every stage branch,
    19 scans), survivor frames are filters/joins over it, and only the
    two token consumers (minhash signatures, 4-gram build) re-read the
    text (plan-pinned scan count + cartesian-free in
    tests/test_plans.py). No collect, no temp table.
    ``persist_stage_boundary=True`` is the 100 TB
    knob the docstring used to only describe: it persists the exact-dedup
    survivor frame (surv2 — the subtree every later stage re-reads:
    near-dup signatures, decontamination restriction, budget gate, and
    the final verdict join all branch off it), cutting the recompute
    tail at the one boundary where the DAG fans out. Classification is
    IDENTICAL in both modes (persist is a caching hint, not a plan
    semantic — proven by tests/test_dedup_pipeline's parity test, which
    also holds the q227 shared-plan contract in both modes).

    Scale shape per stage: quality is pure expressions on one pass;
    exact dedup is one shuffle on the 128-bit hash; near-dup is q73's
    linear representative election (never all-pairs); decontamination
    is a broadcast semi-join of corpus grams against the bounded eval
    gram set; the budget cut is q190's bounded-frame grouped prefix
    sum (no single-partition window). Reason-code precedence is a
    coalesce over left joins on doc_id — flag frames are disjoint, so
    join order never matters."""
    from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum

    from flink_mingo_tail_spark.operators.quality import quality_reason

    # spread() the single-file test scan: all three map-heavy branches
    # (quality/hash stage frame, MinHash signatures, 4-gram build) read
    # it and serialize on its one partition otherwise — 4.48 s -> 3.24 s
    # at sf0.1; scale-gated inside spread()
    d = spread(_t(spark, sf_dir, "documents"))
    t = tokens(F.col("text"))
    # r14 optimization: the quality/hash stage frame (s1) feeds every
    # downstream branch — exact-dedup window, survivor semi-joins,
    # budget gate, final verdict join — and the all-lazy formulation
    # re-ran its scan + tokenize + md5 chain per branch (19 document
    # scans, plans/r14/q226_*_before.txt). One localCheckpoint of the
    # NARROW per-doc frame (ids, counts, hash, reason — deliberately
    # not the token arrays: materializing those measured slower than
    # re-tokenizing the two places that need tokens) computes it once.
    n_toks = F.size(t)
    # one shared spelling with streaming/curation_ingest (operators/quality)
    r1 = quality_reason(F.col("doc_id"), t, F.col("lang"), _PIPE_EVAL_MOD)
    s1 = d.select(
        "doc_id",
        "source",
        "n_chars",
        n_toks.cast("long").alias("n_toks"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
        r1.alias("r1"),
    ).localCheckpoint()
    surv1 = s1.filter(F.col("r1").isNull())

    w_hash = Window.partitionBy("content_hash")
    s2 = surv1.withColumn("keeper", F.min("doc_id").over(w_hash))
    ex_ids = s2.filter(F.col("doc_id") != F.col("keeper")).select("doc_id")
    surv2 = s2.filter(F.col("doc_id") == F.col("keeper")).select(
        "doc_id", "source", "n_chars", "n_toks"
    )
    if persist_stage_boundary:
        # the stage-2/3 boundary: every downstream branch (near-dup
        # sigs, decontamination restriction, budget gate, verdict join)
        # re-reads surv2 — one bounded persist cuts the recompute tail
        # without touching classification (narrow columns, O(survivors))
        surv2 = surv2.persist()

    # near-dup: q73's representative election, restricted to survivors
    hashed = d.select(
        "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
    )
    sigs = hashed.join(surv2.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", minhash_from_hashes(F.col("hs"), MINHASH_K).alias("sig")
    )
    banded = sigs.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), _PIPE_ROWS_PER_BAND, MINHASH_K)).alias("band"),
    )
    w_band = Window.partitionBy("band")
    nd_ids = (
        banded.withColumn("rep", F.min("doc_id").over(w_band))
        .groupBy("doc_id")
        .agg(F.min("rep").alias("cluster_rep"))
        .filter(F.col("cluster_rep") < F.col("doc_id"))
        .select("doc_id")
    )
    # decontamination: computed against surv2 (NOT surv3) — whether a
    # doc shares an eval gram is independent of OTHER docs' survival,
    # and the final coalesce precedence assigns 'near_dup' first, so
    # the output is set-identical while the plan tree stays SHALLOW:
    # nd_ids and cont_ids are sibling branches off surv2, not a chain
    # (each chained anti-join would replay the whole upstream subtree —
    # the 50-scan plan this formulation replaces; see the plan pin).
    toks_f = d.select("doc_id", t.alias("t"), F.size(t).alias("ln"))
    gram_expr = F.expr(
        "transform(sequence(1, ln - 3), i -> concat_ws(' ', "
        "element_at(t, i), element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))"
    )
    grams = toks_f.filter(F.col("ln") >= 4).select("doc_id", F.explode(gram_expr).alias("g"))
    probe = grams.filter(F.col("doc_id") % _PIPE_EVAL_MOD == 0).select("g").distinct()
    cont_ids = (
        grams.join(surv2.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(probe), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    surv4 = surv2.join(nd_ids, "doc_id", "left_anti").join(
        cont_ids, "doc_id", "left_anti"
    )

    # budget cut: q190's packed-key grouped prefix sum over survivors
    value = F.when(
        (F.col("doc_id") < 0)
        | (F.col("doc_id") >= F.lit(1 << 34))
        | (F.col("n_chars") < 0)
        | (F.col("n_chars") >= F.lit(1 << 29)),
        F.expr("raise_error('q226: packed order key domain exceeded')").cast("long"),
    ).otherwise((-F.col("n_chars")) * F.lit(1 << 34) + F.col("doc_id"))
    p = grouped_prefix_sum(
        surv4,
        ["source"],
        value,
        {"cum_before": F.col("n_toks")},
        width=1 << 34,
        inclusive=False,
    )
    ob_ids = p.filter(F.col("cum_before") >= _PIPE_BUDGET).select("doc_id")

    flag = F.lit(True)
    out = (
        s1.select("doc_id", "source", "n_toks", "r1")
        .join(ex_ids.withColumn("__ex", flag), "doc_id", "left")
        .join(nd_ids.withColumn("__nd", flag), "doc_id", "left")
        .join(cont_ids.withColumn("__ct", flag), "doc_id", "left")
        .join(ob_ids.withColumn("__ob", flag), "doc_id", "left")
    )
    reason = F.coalesce(
        F.col("r1"),
        F.when(F.col("__ex"), "exact_dup"),
        F.when(F.col("__nd"), "near_dup"),
        F.when(F.col("__ct"), "contaminated"),
        F.when(F.col("__ob"), "over_budget"),
        F.lit("kept"),
    )
    return out.select("doc_id", "source", "n_toks", reason.alias("reason"))


@query(
    "q226_curation_pipeline",
    oracle=_PIPE_CORE_SQL
    + """
    SELECT doc_id, source, reason, (reason = 'kept') AS keep
    FROM verdict
    ORDER BY doc_id
    """,
)
def q226_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc audit-trail view of :func:`curation_verdict` (the full
    pipeline docstring lives there): doc_id, source, first-failing-
    stage reason, keep."""
    v = curation_verdict(spark, sf_dir)
    return v.select(
        "doc_id", "source", "reason", (F.col("reason") == "kept").alias("keep")
    ).orderBy("doc_id")


@query(
    "q227_curation_report",
    oracle=_PIPE_CORE_SQL
    + """
    SELECT source, reason,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_toks
    FROM verdict
    GROUP BY source, reason
    ORDER BY source, reason
    """,
)
def q227_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter-rate DASHBOARD over the composed pipeline — the
    per-source x per-stage rollup (doc and token counts) every real
    curation run publishes alongside the packed output: which sources
    lose how much to which stage, and how many tokens actually survive
    to training. Shares :func:`curation_verdict`'s single lazy plan
    with q226 (one code path, two views — the q221/score_batch_novelty
    discipline), so the dashboard can never drift from the per-doc
    audit trail it summarizes. Integer counts and token sums — exact
    across engines; output is bounded by |sources| x |stages|."""
    v = curation_verdict(spark, sf_dir)
    return (
        v.groupBy("source", "reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_toks"),
        )
        .orderBy("source", "reason")
    )


# ---------------------------------------------------------------------------
# q230 — bounded edit-distance confirm over LSH-blocked candidates
# ---------------------------------------------------------------------------

# Near-dup verdict: dist <= max_len/_LEV_REL_DEN (20% of the longer
# doc, spelled _LEV_REL_DEN*dist <= max_len so the rule is
# integer-exact) AND dist <= _LEV_CAP.
# The absolute cap is the compute bound: Spark's levenshtein(l, r, cap)
# runs the banded DP — O(cap * len) instead of O(len^2) per pair — and
# returns -1 beyond the cap, which the oracle mirrors with a CASE.
_LEV_CAP = 128
_LEV_REL_DEN = 5  # relative threshold: dist <= max_len / 5 (20%)


@query(
    "q230_edit_distance_near_dup",
    oracle=f"""
    WITH sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents
    ), banded AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', MINHASH_K, MINHASH_K)}) AS band
        FROM sigs
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
    ), sized AS (
        SELECT doc_a, doc_b,
               greatest(length(ta.text), length(tb.text)) AS max_len,
               abs(length(ta.text) - length(tb.text)) AS len_gap,
               ta.text AS text_a, tb.text AS text_b
        FROM cand
        JOIN documents ta ON cand.doc_a = ta.doc_id
        JOIN documents tb ON cand.doc_b = tb.doc_id
    ), confirmed AS (
        SELECT doc_a, doc_b, max_len,
               CASE WHEN levenshtein(text_a, text_b) > {_LEV_CAP} THEN -1
                    ELSE levenshtein(text_a, text_b) END AS dist
        FROM sized
        WHERE {_LEV_REL_DEN} * len_gap <= max_len AND len_gap <= {_LEV_CAP}
    )
    SELECT doc_a, doc_b, CAST(max_len AS BIGINT) AS max_len,
           CAST(dist AS BIGINT) AS dist,
           (dist >= 0 AND {_LEV_REL_DEN} * dist <= max_len) AS is_dup
    FROM confirmed
    ORDER BY doc_a, doc_b
    """,
)
def q230_edit_distance_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level fuzzy dedup at DOCUMENT granularity — the one
    near-dup modality the family did not yet cover (shingle Jaccard =
    q73/q75, SimHash = q74/q212, embedding = q170/q217b, perceptual =
    q225; q140's ED-Join prefix filter handles SHORT strings where a
    small absolute distance bound makes bigram counting sound, which a
    relative 20%-of-553-chars bound does not): LSH proposes, EDIT
    DISTANCE disposes. Candidates come from the high-precision
    1-band x 8-row MinHash split (the q226 rule: a destructive /
    per-pair-expensive stage wants the J^8 collision curve, not q73's
    high-recall 2x4), then each surviving pair is confirmed by bounded
    Levenshtein: near-dup iff dist <= 20% of the longer doc AND
    dist <= ``_LEV_CAP``.

    Two compute bounds keep the confirm stage honest at scale: (1) the
    length prefilter ``5*|len_a-len_b| <= max_len AND |len_a-len_b| <=
    cap`` is fused BEFORE the distance call (edit distance >= length
    gap, so a pair failing it can never confirm — no DP is ever run on
    a hopeless pair); (2) the distance itself is Spark's
    ``levenshtein(l, r, threshold)`` banded DP — O(cap*len) per pair,
    not O(len^2) — returning -1 beyond the cap (the oracle mirrors the
    -1 with a CASE). At 100 TB: candidates are band-equi-join bounded
    (n_bits ∝ log n via the shared auto rule), the texts ride the band
    shuffle once per side, and per-pair cost is linear in doc length.
    Fixture note: like q140/q212, the synthetic near-identical corpus
    makes TRUE pairs quadratic-ish in SF, so this is a probe-only
    query under the q212 bench policy (curves in SCALE.md)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hashed = d.select(
        "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
    )
    sigs = hashed.select("doc_id", minhash_from_hashes(F.col("hs"), MINHASH_K).alias("sig"))
    banded = sigs.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), MINHASH_K, MINHASH_K)).alias("band"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sized = (
        cand.join(d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")), "doc_a")
        .join(d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "text_a",
            "text_b",
            F.greatest(F.length("text_a"), F.length("text_b")).cast("long").alias("max_len"),
            F.abs(F.length("text_a") - F.length("text_b")).alias("len_gap"),
        )
        .filter(
            (_LEV_REL_DEN * F.col("len_gap") <= F.col("max_len"))
            & (F.col("len_gap") <= _LEV_CAP)
        )
    )
    return (
        sized.select(
            "doc_a",
            "doc_b",
            "max_len",
            F.levenshtein("text_a", "text_b", _LEV_CAP).cast("long").alias("dist"),
        )
        .withColumn(
            "is_dup",
            (F.col("dist") >= 0) & (_LEV_REL_DEN * F.col("dist") <= F.col("max_len")),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q237 — leakage-aware train/val/test split (cluster-level assignment)
# ---------------------------------------------------------------------------

_SPLIT_MOD = 10  # md5 % 10: 0 -> test, 1 -> val, 2..9 -> train (80/10/10)


@query(
    "q237_leakage_aware_split",
    # the components CTE chain is q73b's oracle verbatim (the shared
    # Spark construction is dedup_component_frame)
    oracle=f"""
    WITH RECURSIVE sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents
    ), banded AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM sigs
    ), band_rep AS (
        SELECT band, min(doc_id) AS rep FROM banded GROUP BY band
    ), edges AS (
        SELECT DISTINCT b.doc_id AS a, r.rep AS b
        FROM banded b JOIN band_rep r ON b.band = r.band
        WHERE r.rep < b.doc_id
    ), sym AS (
        SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ), reach(src, dst) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ), comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ), assigned AS (
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS component,
               ('0x' || substr(md5(concat('split:',
                    CAST(coalesce(c.component, d.doc_id) AS VARCHAR))), 1, 15))::BIGINT
                 % {_SPLIT_MOD} AS cmod,
               ('0x' || substr(md5(concat('split:',
                    CAST(d.doc_id AS VARCHAR))), 1, 15))::BIGINT
                 % {_SPLIT_MOD} AS nmod
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, component,
           CASE cmod WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END AS split,
           CASE nmod WHEN 0 THEN 'test' WHEN 1 THEN 'val' ELSE 'train' END
             AS naive_split,
           (max(CASE WHEN nmod = 0 THEN 0 WHEN nmod = 1 THEN 1 ELSE 2 END)
              OVER (PARTITION BY component)
            <> min(CASE WHEN nmod = 0 THEN 0 WHEN nmod = 1 THEN 1 ELSE 2 END)
              OVER (PARTITION BY component)) AS naive_would_leak
    FROM assigned
    ORDER BY doc_id
    """,
)
def q237_leakage_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-AWARE train/val/test split: assignment is hashed from
    the document's NEAR-DUP COMPONENT (q73b's transitive clusters via
    the shared :func:`dedup_component_frame`), never from the document
    itself — so a near-duplicate pair can never straddle the train/test
    boundary, the eval-contamination mode a doc-level hash split
    silently creates. The ``naive_split`` column is that doc-level
    hash, and ``naive_would_leak`` marks every doc whose cluster the
    naive rule would have SPLIT across sets — the measured argument
    (doc-level split leaks on this fixture) rides in the output.

    Determinism: both assignments are salted md5-long mod {_SPLIT_MOD}
    over decimal id strings (0 test / 1 val / else train — 80/10/10 in
    expectation); the leak audit compares the component's min/max naive
    code, an integer window over the component key. Scale shape:
    components are O(log d) rounds of keyed shuffles
    (operators/cluster.py); everything after is one hash and two
    component-partitioned window aggregates — the same frame dedup
    already shuffles. The production rule "split AFTER near-dup
    clustering, hash the CLUSTER id" costs nothing beyond the dedup
    pass the pipeline already runs."""
    comp = dedup_component_frame(spark, sf_dir)
    code = F.pmod(
        md5_long(F.concat(F.lit("split:"), F.col("component").cast("string"))),
        F.lit(_SPLIT_MOD),
    )
    ncode = F.pmod(
        md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(_SPLIT_MOD),
    )

    def label(c):
        return F.when(c == 0, "test").when(c == 1, "val").otherwise("train")

    nclass = F.when(F.col("nmod") == 0, 0).when(F.col("nmod") == 1, 1).otherwise(2)
    w = Window.partitionBy("component")
    return (
        comp.select("doc_id", "component", code.alias("cmod"), ncode.alias("nmod"))
        .withColumn("__nc", nclass)
        .select(
            "doc_id",
            "component",
            label(F.col("cmod")).alias("split"),
            label(F.col("nmod")).alias("naive_split"),
            (F.max("__nc").over(w) != F.min("__nc").over(w)).alias("naive_would_leak"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q244 — standing-index compaction (round 12)
# ---------------------------------------------------------------------------


@query(
    "q244_index_compaction",
    oracle=f"""
    WITH d AS (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) AS n FROM documents),
    b AS (SELECT CAST(count(DISTINCT band) AS BIGINT) AS n FROM (
        SELECT unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM (SELECT {sql_minhash_signature("list_distinct(string_split(text, ' '))", MINHASH_K)} AS sig
              FROM documents))),
    v AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
    SELECT * FROM (
        SELECT 'bands' AS tbl, CAST(3 * b.n AS BIGINT) AS rows_before,
               b.n AS rows_after FROM b
        UNION ALL
        SELECT 'buckets', CAST(2 * {DEFAULT_N_TABLES} * v.n AS BIGINT),
               CAST({DEFAULT_N_TABLES} * v.n AS BIGINT) FROM v
        UNION ALL
        SELECT 'content', CAST(3 * d.n AS BIGINT), d.n FROM d
        UNION ALL
        SELECT 'vectors', CAST(2 * v.n AS BIGINT), v.n FROM v
    ) ORDER BY tbl
    """,
)
def q244_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing-index COMPACTION — the maintenance operator the
    membership-only append contract has pointed at since round 9
    ("compact with an occasional overwrite rebuild if the index churns
    heavily", operators/dedup.build_dedup_index): replayed or
    overlapping ingest batches re-insert content hashes / band keys /
    (tbl, bucket, vid) rows already present, which costs index bytes
    and probe-join fan-in but never correctness. ``compact_dedup_index``
    / ``compact_semantic_index`` rewrite each table as its DISTINCT row
    set via a tmp-sibling swap (Spark cannot overwrite a directory it
    reads), preserving hive sharding and the manifest.

    This driver row manufactures a deterministic worst-case churn —
    the full corpus indexed once then appended verbatim twice (text
    index), the full embedding set appended verbatim once (semantic
    index) — compacts, and reports per-table (rows_before, rows_after).
    The oracle derives both counts from first principles: distinct
    hashes / bands / DEFAULT_N_TABLES·|vectors| bucket keys (the table
    count interpolated from operators/semantic_index, never a bare
    literal), times the append multiplicity. Probe-verdict invariance across compaction is pinned
    separately in tests/test_index_compaction.py.

    Scale shape: compaction is one distinct + rewrite per table —
    shuffle keyed on the index key, embarrassingly shard-parallel, run
    in a maintenance window: verdicts are identical on either side of
    the swap (same key set), but the rename-aside → rename-in sequence
    has a brief missing-directory window on non-atomic filesystems, and
    the swap order + asserted FS booleans guarantee a crash never loses
    the canonical table (_swap_rewrite_distinct). Scratch bounded,
    deleted before return (q204 policy)."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.dedup import (
        build_dedup_index,
        compact_dedup_index,
    )
    from flink_mingo_tail_spark.operators.semantic_index import (
        build_semantic_index,
        compact_semantic_index,
    )

    d = _t(spark, sf_dir, "documents")
    e = (
        spread(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    tmp = tempfile.mkdtemp(prefix="fmts-compact-q244-")
    try:
        text_path, sem_path = f"{tmp}/dedup_index", f"{tmp}/sem_index"
        build_dedup_index(d, text_path, mode="overwrite")
        build_dedup_index(d, text_path, mode="append")
        build_dedup_index(d, text_path, mode="append")
        build_semantic_index(e, sem_path, expanded=False)
        build_semantic_index(e, sem_path, expanded=False, mode="append")
        stats = {
            **compact_dedup_index(spark, text_path),
            **compact_semantic_index(spark, sem_path),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(t, int(b), int(a)) for t, (b, a) in sorted(stats.items())],
        "tbl string, rows_before long, rows_after long",
    ).orderBy("tbl")


# ---------------------------------------------------------------------------
# q252 — Bloom membership audit (round 13)
# ---------------------------------------------------------------------------

from flink_mingo_tail_spark.operators.dedup import (  # noqa: E402
    BLOOM_BITS_PER_KEY,
    BLOOM_K,
    bloom_bits,
    bloom_m_bits,
    bloom_probe,
)


def _bloom_bits_cte(src: str = "ik") -> str:
    """mm → irows → ibits: the Bloom BIT-ARRAY build's DuckDB replay in
    ONE spelling (round-14 extraction — previously spelled per-oracle
    in q252/q254): auto-width ``mm`` from ``src``'s key count, k salted
    md5-long positions per key, OR-folded into 32-bit slots. Mirrors
    operators/dedup.bloom_bits + bloom_m_bits bit-exactly."""
    hashes = [sql_md5_long("ch", salt=j) for j in range(BLOOM_K)]
    idx_union = "\n        UNION ALL ".join(
        f"SELECT ({h}) % (SELECT m FROM mm) AS idx FROM {src}" for h in hashes
    )
    return f"""mm AS (
        SELECT CAST(1 AS BIGINT) << length(bin({BLOOM_BITS_PER_KEY} * count(*) - 1)) AS m
        FROM {src}
    ), irows AS (
        {idx_union}
    ), ibits AS (
        SELECT CAST(idx // 32 AS INT) AS slot,
               bit_or(CAST(1 AS BIGINT) << CAST(idx % 32 AS INT)) AS bits
        FROM irows GROUP BY 1
    )"""


def _bloom_probe_cte(src: str, hit_alias: str = "hit") -> str:
    """prows → pj → bh: the probe side's (slot, mask) projection and
    bool_and fold against ``ibits``, in ONE spelling (q252/q254).
    Mirrors operators/dedup.bloom_probe bit-exactly (a missing slot is
    a definite miss — the left-join NULL)."""
    hashes = [sql_md5_long("ch", salt=j) for j in range(BLOOM_K)]
    probe_union = "\n        UNION ALL ".join(
        f"SELECT doc_id, ({h}) % (SELECT m FROM mm) AS idx FROM {src}" for h in hashes
    )
    return f"""prows AS (
        {probe_union}
    ), pj AS (
        SELECT doc_id, CAST(idx // 32 AS INT) AS slot,
               CAST(1 AS BIGINT) << CAST(idx % 32 AS INT) AS mask
        FROM prows
    ), bh AS (
        SELECT doc_id,
               bool_and(b.bits IS NOT NULL AND (b.bits & pj.mask) = pj.mask)
                 AS {hit_alias}
        FROM pj LEFT JOIN ibits b ON b.slot = pj.slot
        GROUP BY doc_id
    )"""


def _bloom_oracle() -> str:
    return f"""
    WITH ik AS (
        SELECT DISTINCT md5(text) AS ch FROM documents WHERE doc_id % 10 <> 7
    ), {_bloom_bits_cte()}, pr AS (
        -- the incoming slice, plus replayed index members re-keyed
        -- NEGATIVE so they can never collide with a genuine incoming
        -- doc_id at any corpus size (ADVICE r13): the fixture has no
        -- cross-slice exact text dup below sf0.1, so true membership
        -- hits are planted deterministically (doc_id % 20 = 0 docs
        -- re-arriving)
        SELECT doc_id, md5(text) AS ch FROM documents WHERE doc_id % 10 = 7
        UNION ALL
        SELECT -doc_id - 1, md5(text) FROM documents
        WHERE doc_id % 20 = 0 AND doc_id % 10 <> 7
    ), {_bloom_probe_cte('pr', hit_alias='bloom_hit')}, eh AS (
        SELECT DISTINCT p.doc_id FROM pr p JOIN ik ON ik.ch = p.ch
    )
    SELECT bh.doc_id AS doc_id, bh.bloom_hit AS bloom_hit,
           eh.doc_id IS NOT NULL AS exact_hit,
           bh.bloom_hit AND eh.doc_id IS NULL AS false_positive
    FROM bh LEFT JOIN eh ON eh.doc_id = bh.doc_id
    ORDER BY bh.doc_id
    """


@query("q252_bloom_membership_audit", oracle=_bloom_oracle())
def q252_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter MEMBERSHIP sketch for the exact-dedup state, with
    its false-positive rate measured against the exact answer — the
    broadcastable tier below the standing content-hash index: the
    whole index compresses to ≤ m/32 (slot, bits) rows (kilobytes at
    any corpus size under the auto-width rule), so a probe batch tests
    membership with NO shuffle of the index side; bloom-positive
    survivors then confirm against the exact table, cutting the
    semi-join's probe side to hit-rate x batch. The sketch is
    DETERMINISTIC and engine-portable: k={BLOOM_K} salted md5-long bit
    positions per key, 32-bit slots OR-folded by a bounded groupBy,
    m auto-sized to the next power of two holding {BLOOM_BITS_PER_KEY}
    bits/key (bloom_m_bits — the auto_n_bits discipline, constant
    expected FP as the corpus grows; replayed in SQL as
    1 << length(bin(4n-1))). The q117 convention: index side is
    doc_id % 10 != 7, probes are the incoming slice.

    Output per probe doc: bloom verdict, exact verdict, and the
    false-positive flag (bloom-hit while exact-miss) — bloom misses
    are NEVER false negatives (a Bloom filter has none), pinned by the
    oracle row-for-row. Scale shape: one pass over index keys (3 int
    positions each) + a ≤ m/32-row broadcast + a probe-bounded
    groupBy; nothing index-sized ever moves. Ref parity: the quorum
    state-hygiene discipline (SURVEY §2A A6) applied to membership
    sketching; no reference twin."""
    d = _t(spark, sf_dir, "documents")
    # r14 optimization: ik feeds three consumers (width count, sketch
    # build, exact semi-join) and pr two (bloom probe, exact probe) —
    # materialize each md5 pass once.
    ik = (
        d.filter(F.col("doc_id") % 10 != 7)
        .select(F.md5(F.col("text")).alias("ch"))
        .distinct()
        .localCheckpoint()
    )
    m_bits = bloom_m_bits(ik.count())
    bloom = bloom_bits(ik, "ch", m_bits)
    # incoming slice + deterministically replayed index members (the
    # fixture has no cross-slice exact text dup below sf0.1 — q120's
    # injection pattern plants true membership hits)
    pr = (
        d.filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", F.md5(F.col("text")).alias("ch"))
        .unionByName(
            d.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") % 10 != 7))
            .select(
                # negative re-key: replayed probes can NEVER collide
                # with a genuine incoming doc_id at any corpus size
                # (a fixed +1M offset would at >1M docs — ADVICE r13)
                (-F.col("doc_id") - 1).alias("doc_id"),
                F.md5(F.col("text")).alias("ch"),
            )
        )
        .localCheckpoint()
    )
    bh = bloom_probe(pr, bloom, id_col="doc_id", key_col="ch", m_bits=m_bits)
    eh = (
        pr.join(ik, "ch", "left_semi")
        .select("doc_id")
        .withColumn("__e", F.lit(True))
    )
    return (
        bh.join(eh, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("__e"), F.lit(False)).alias("exact_hit"),
            (F.col("bloom_hit") & F.col("__e").isNull()).alias("false_positive"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q253 — persisted incremental Bloom index (probe-then-merge, round 13)
# ---------------------------------------------------------------------------

from flink_mingo_tail_spark.operators.dedup import (  # noqa: E402
    build_bloom_index,
    probe_bloom_index,
)

_BLOOM_ING_BATCHES = 3  # simulated arrival batches (doc_id % 3)


def _bloom_index_oracle() -> str:
    hashes = [sql_md5_long("ch", salt=j) for j in range(BLOOM_K)]
    pos_union = "\n        UNION ALL ".join(
        f"SELECT doc_id, b, ({h}) % (SELECT m FROM mm) AS idx FROM d" for h in hashes
    )
    return f"""
    WITH d AS (
        SELECT doc_id, doc_id % {_BLOOM_ING_BATCHES} AS b, md5(text) AS ch
        FROM documents
    ), n0 AS (
        SELECT count(DISTINCT ch) AS n FROM d WHERE b = 0
    ), mm AS (
        SELECT CAST(1 AS BIGINT) << length(bin({BLOOM_BITS_PER_KEY} * n - 1)) AS m
        FROM n0
    ), pos AS (
        {pos_union}
    ), firstb AS (
        SELECT idx, min(b) AS fb FROM pos GROUP BY idx
    ), hit AS (
        SELECT p.doc_id
        FROM pos p JOIN firstb f ON f.idx = p.idx
        GROUP BY p.doc_id
        HAVING bool_and(f.fb < p.b)
    )
    SELECT dd.doc_id AS doc_id, h.doc_id IS NOT NULL AS bloom_hit
    FROM (SELECT DISTINCT doc_id FROM d) dd
    LEFT JOIN hit h ON h.doc_id = dd.doc_id
    ORDER BY dd.doc_id
    """


@query("q253_bloom_index_incremental", oracle=_bloom_index_oracle())
def q253_bloom_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED incremental form of q252's Bloom membership sketch
    — the standing-index family's zero-churn tier: documents arrive in
    {_BLOOM_ING_BATCHES} batches (doc_id % {_BLOOM_ING_BATCHES}); each
    batch probes the stored ≤ m/32-row bit frame AS OF BATCH START
    (broadcast — no index-sized data moves, q247's loop at kilobyte
    state), then OR-merges its own keys in via the crash-safe swap
    (operators/dedup.build_bloom_index mode='append'). Unlike the
    hash/band/bucket indexes, appends never grow the table (bitwise OR
    into a fixed array) and a replayed batch is exactly idempotent (OR
    is idempotent) — there is nothing to compact, ever. The trade: the
    FP rate drifts up past the width's design load, detected by
    comparing the manifest width to bloom_m_bits(members) — and a
    bloom hit is a CANDIDATE (q252's measured FP rate), confirmed
    against the exact index when precision matters.

    The oracle replays the bit array itself: every key's k salted
    md5-long positions, first-setting batch per position, hit iff ALL
    the probe's positions were set by a STRICTLY EARLIER batch — so
    even the false positives match row-for-row (the sketch is
    deterministic and engine-portable). Width auto-sizes from batch
    0's distinct-key count and the manifest pins it thereafter.

    Scale shape: per batch, k int positions per key, one kilobyte
    broadcast join, one bounded OR-merge rewrite. Ref parity: the
    reference's standing-state discipline (SURVEY §2A A6/A7) at the
    cheapest possible state representation; no reference twin."""
    import shutil
    import tempfile

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(_BLOOM_ING_BATCHES)).alias("b"),
        F.md5(F.col("text")).alias("ch"),
    )
    tmp = tempfile.mkdtemp(prefix="fmts-bloomidx-q253-")
    rows: list[tuple[int, bool]] = []
    try:
        path = f"{tmp}/bloom_index"
        for b in range(_BLOOM_ING_BATCHES):
            batch = d.filter(F.col("b") == b)
            if b == 0:
                rows.extend(
                    (r.doc_id, False) for r in batch.select("doc_id").collect()
                )
                build_bloom_index(
                    batch.select("ch").distinct(), path, key_col="ch"
                )
            else:
                rows.extend(
                    (r.doc_id, r.bloom_hit)
                    for r in probe_bloom_index(
                        batch, path, id_col="doc_id", key_col="ch"
                    ).collect()
                )
                build_bloom_index(
                    batch.select("ch"), path, key_col="ch", mode="append"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, bloom_hit boolean"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q254 — Bloom LOAD audit: realized fill vs predicted vs measured FP
# ---------------------------------------------------------------------------


def _bloom_load_oracle() -> str:
    return f"""
    WITH ik AS (
        SELECT DISTINCT md5(text) AS ch FROM documents WHERE doc_id % 10 <> 7
    ), {_bloom_bits_cte()}, load AS (
        SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS n_set FROM ibits
    ), npr AS (
        -- non-member probes: the incoming slice minus any exact member
        SELECT doc_id, md5(text) AS ch FROM documents
        WHERE doc_id % 10 = 7
          AND md5(text) NOT IN (SELECT ch FROM ik)
    ), {_bloom_probe_cte('npr')}
    SELECT (SELECT CAST(m AS BIGINT) FROM mm) AS m_bits,
           CAST({BLOOM_K} AS BIGINT) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM ik) AS n_members,
           (SELECT n_set FROM load) AS n_set_bits,
           CAST(round((SELECT n_set FROM load) * 1000.0
                      / (SELECT m FROM mm)) AS BIGINT) AS fill_milli,
           CAST(round(pow((SELECT n_set FROM load) * 1.0 / (SELECT m FROM mm),
                          {BLOOM_K}) * 1000000) AS BIGINT) AS predicted_fp_micro,
           (SELECT CAST(count(*) AS BIGINT) FROM bh) AS n_nonmember_probes,
           (SELECT CAST(count(*) AS BIGINT) FROM bh WHERE hit) AS nonmember_hits,
           CASE WHEN (SELECT count(*) FROM bh) > 0 THEN
             CAST(round((SELECT count(*) FROM bh WHERE hit) * 1000000.0
                        / (SELECT count(*) FROM bh)) AS BIGINT)
           END AS measured_fp_micro
    """


@query("q254_bloom_load_audit", oracle=_bloom_load_oracle())
def q254_bloom_load_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom tier's MEASUREMENT loop (q245/q249's role for the
    hash-band indexes): one row reporting the sketch's realized state —
    member count, set-bit count, fill ratio (milli), the
    fill^k-predicted false-positive rate (micro), and the FP rate
    actually MEASURED against known non-members. This is the number a
    production ingest checks between batches to decide when the fixed
    width has drifted past its design load and the index needs a
    re-widen rebuild (build_bloom_index's one-way-ness trade) — the
    auto_n_bits discipline's a-posteriori check, the measure-don't-
    guess loop the whole index family follows.

    Prediction vs measurement on the fixture: fill ≈ 0.48 at the
    4-bits/key design load (n=450 keys in m=2048), predicting
    fill³ ≈ 11% FP; the measured slice sits within sampling noise of
    it (the oracle pins BOTH numbers bit-exactly — the sketch and the
    probes are deterministic in either engine).

    Scale shape: one pass over the distinct index keys, a ≤ m/32-row
    aggregate for the fill, a probe-bounded broadcast join for the
    measured rate. Everything after the key scan is kilobyte-sized."""
    d = _t(spark, sf_dir, "documents")
    # r14 optimization: the distinct index-key frame feeds three
    # consumers (the width count, the sketch build, the non-member
    # anti-join) — materialize the md5+distinct pass once.
    ik = (
        d.filter(F.col("doc_id") % 10 != 7)
        .select(F.md5(F.col("text")).alias("ch"))
        .distinct()
        .localCheckpoint()
    )
    n_members = ik.count()
    m_bits = bloom_m_bits(n_members)
    bloom = bloom_bits(ik, "ch", m_bits).persist()
    n_set = int(
        bloom.agg(F.sum(F.expr("bit_count(bits)")).cast("long")).head()[0]
    )
    npr = (
        d.filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", F.md5(F.col("text")).alias("ch"))
        .join(ik, "ch", "left_anti")
    )
    bh = bloom_probe(npr, bloom, id_col="doc_id", key_col="ch", m_bits=m_bits)
    # one agg job for both counts (round-13 review)
    probes_row = bh.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("bloom_hit").cast("long")).alias("h"),
    ).head()
    n_probes, n_hits = int(probes_row.n), int(probes_row.h or 0)
    bloom.unpersist()
    fill = n_set / m_bits

    def away(v: float) -> int:
        # DuckDB round() is half-AWAY-from-zero; Python round() is
        # banker's — a .5 on the grid would silently diverge the engines
        # (round-13 review). All values here are non-negative.
        import math

        return int(math.floor(v + 0.5))

    return spark.createDataFrame(
        [(
            m_bits,
            BLOOM_K,
            n_members,
            n_set,
            away(n_set * 1000.0 / m_bits),
            away(fill**BLOOM_K * 1_000_000),
            n_probes,
            n_hits,
            away(n_hits * 1_000_000.0 / n_probes) if n_probes else None,
        )],
        "m_bits long, k long, n_members long, n_set_bits long, fill_milli long, "
        "predicted_fp_micro long, n_nonmember_probes long, nonmember_hits long, "
        "measured_fp_micro long",
    )


# ---------------------------------------------------------------------------
# q255 — two-tier Bloom-prefiltered standing-index probe (round 14)
# ---------------------------------------------------------------------------


def _bloom_prefilter_oracle() -> str:
    return f"""
    WITH inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7),
    idx AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
    ik AS (SELECT DISTINCT md5(text) AS ch FROM idx),
    {_bloom_bits_cte()},
    pr AS (SELECT doc_id, md5(text) AS ch FROM inc),
    {_bloom_probe_cte('pr', hit_alias='bloom_pos')},
    exact AS (
        SELECT DISTINCT i.doc_id
        FROM inc i JOIN ik ON md5(i.text) = ik.ch
    ),
    inc_b AS (
        SELECT doc_id, unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM (SELECT doc_id, {sql_minhash_signature("list_distinct(string_split(text, ' '))", MINHASH_K)} AS sig FROM inc)
    ),
    idx_b AS (
        SELECT DISTINCT unnest({sql_lsh_band_keys('sig', ROWS_PER_BAND, MINHASH_K)}) AS band
        FROM (SELECT {sql_minhash_signature("list_distinct(string_split(text, ' '))", MINHASH_K)} AS sig FROM idx)
    ),
    near AS (
        SELECT DISTINCT b.doc_id FROM inc_b b JOIN idx_b USING (band)
    )
    SELECT i.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS status,
           bh.bloom_pos AS bloom_pos
    FROM inc i
    LEFT JOIN exact e ON e.doc_id = i.doc_id
    LEFT JOIN near n ON n.doc_id = i.doc_id
    JOIN bh ON bh.doc_id = i.doc_id
    ORDER BY i.doc_id
    """


@query("q255_bloom_prefilter_probe", oracle=_bloom_prefilter_oracle())
def q255_bloom_prefilter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TWO-TIER standing-index probe as a driver row (round-14
    verdict #4, proven in the correctness gate rather than only in
    tests): the incoming slice (q117's doc_id%10==7 convention) is
    classified by probe_dedup_index with ``bloom_prefilter=True`` — the
    batch's distinct content hashes first test against the kilobyte
    Bloom bit frame (broadcast, ZERO index-side shuffle), and only
    bloom-positive hashes reach the exact (shard, ch) semi-join, so the
    index-side shuffle touches ~(hit + FP) of the batch instead of all
    of it. Output per incoming doc: the classification (which the
    oracle replays through the DIRECT banding/hash SQL — proving the
    two-tier path changes NOTHING) and the raw ``bloom_pos`` verdict
    (replayed bit-exactly through the shared _bloom_bits_cte /
    _bloom_probe_cte spellings, so even false positives must match).
    A Bloom miss is definitive — every 'exact_dup' row necessarily
    carries bloom_pos=TRUE, pinned row-for-row by the oracle.

    Scale shape: the scratch index build is fixture plumbing (q244's
    class — production probes a standing index); the probe itself is
    one kilobyte broadcast + a hit-rate-bounded semi-join + the
    unchanged band probe. Ref parity: SURVEY §2A A6/A7 state
    discipline; the two-tier composition has no reference twin."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.dedup import (
        build_bloom_index,
        build_dedup_index,
        probe_bloom_index,
        probe_dedup_index,
    )

    d = _t(spark, sf_dir, "documents")
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    tmp = tempfile.mkdtemp(prefix="fmts-bloom2t-q255-")
    try:
        path = f"{tmp}/didx"
        build_dedup_index(idx_side, path, mode="overwrite")
        build_bloom_index(
            idx_side.select(F.md5(F.col("text")).alias("ch")).distinct(),
            f"{path}/bloom",
            key_col="ch",
        )
        status = probe_dedup_index(incoming, path, bloom_prefilter=True)
        bl = probe_bloom_index(
            incoming.select(F.md5(F.col("text")).alias("ch")).distinct(),
            f"{path}/bloom",
            id_col="ch",
            key_col="ch",
        )
        per_doc = (
            incoming.select("doc_id", F.md5(F.col("text")).alias("ch"))
            .join(bl, "ch")
            .select("doc_id", F.col("bloom_hit").alias("bloom_pos"))
        )
        rows = [
            (r.doc_id, r.status, r.bloom_pos)
            for r in status.join(per_doc, "doc_id")
            .orderBy("doc_id")
            .collect()  # bounded: the incoming slice; materialized
            # before the scratch index is removed (q253's pattern)
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, status string, bloom_pos boolean"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q256/q257 — duplicated token spans (substring-level exact dedup, round 14)
# ---------------------------------------------------------------------------

from flink_mingo_tail_spark.operators.dedup import (  # noqa: E402
    DEFAULT_SPAN_L,
    duplicated_token_spans,
)

# Shared oracle spellings for the span family (q256/q257/q258/q259) —
# DuckDB list slices are 1-based inclusive: toks[i : i+L-1] is the
# L-token window at start i.


def _sql_span_windows(src: str = "t", where: str = "") -> str:
    """(doc_id, pos, h) window keys of ``src`` (a CTE with doc_id +
    toks) — the dHash-style one-spelling rule for the span window pass
    (mirrors operators/dedup._span_windows bit-exactly)."""
    return (
        f"""SELECT doc_id, i AS pos,
               md5(list_aggregate(toks[i:i+{DEFAULT_SPAN_L}-1], 'string_agg', ' ')) AS h
        FROM {src}, unnest(range(1, len(toks) - {DEFAULT_SPAN_L} + 2)) AS u(i){where}"""
    )


def _sql_span_islands(
    src: str, out: str = "perdoc", count_col: str = "n_dup_spans",
    sum_col: str = "dup_tokens",
) -> str:
    """isl → spans → {out}: the gaps-and-islands merge of marked window
    starts into maximal spans plus the per-doc rollup — one spelling
    (mirrors operators/dedup._merge_span_islands)."""
    return f"""isl AS (
        SELECT doc_id, pos,
               sum(CASE WHEN prev IS NULL OR pos - prev > {DEFAULT_SPAN_L}
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM (SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM {src})
    ), spans AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) AS e
        FROM isl GROUP BY doc_id, island
    ), {out} AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS {count_col},
               CAST(sum(e - s + {DEFAULT_SPAN_L}) AS BIGINT) AS {sum_col}
        FROM spans GROUP BY doc_id
    )"""


_DUP_SPAN_CTES = f"""t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ), w AS (
        {_sql_span_windows()}
    ), dup AS (
        SELECT h FROM w GROUP BY h HAVING count(*) > 1
    ), marked AS (
        SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)
    ), {_sql_span_islands('marked')}"""


@query(
    "q256_duplicated_spans",
    oracle=f"""
    WITH {_DUP_SPAN_CTES}
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_toks,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           coalesce(p.dup_tokens, 0) AS dup_tokens,
           CAST(round(coalesce(p.dup_tokens, 0) * 1000000.0 / len(t.toks))
                AS BIGINT) AS dup_frac_micro
    FROM t LEFT JOIN perdoc p USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q256_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup — the span detector whole-document
    hashing cannot cover: a long token span repeated ANYWHERE in the
    corpus (boilerplate headers, licenses, templated paragraphs — or
    self-repetition inside one document) is memorizable training
    content even when no two documents are duplicates. Every
    {DEFAULT_SPAN_L}-token window is keyed by md5 of its joined
    tokens; windows whose key occurs more than once are duplicated;
    per document, overlapping/adjacent duplicated windows merge into
    MAXIMAL spans (gaps-and-islands), and the output reports span
    count, duplicated-token mass, and its micro-fraction of the doc.

    The detector's resolution is exact at >= {DEFAULT_SPAN_L} tokens:
    every maximal duplicated span at least that long is found in full
    (all its windows collide), shorter repeats are below the floor by
    design (operators/dedup.duplicated_token_spans).

    Scale shape: one narrow pass emits one md5 per token position (the
    text itself never duplicates into the shuffle), one groupBy finds
    key multiplicity, one semi-join marks positions — both corpus-
    sized shuffles keyed on the hash, the honest distributed shape —
    and the island merge is a per-doc window over the marked subset
    only. Ref parity: no reference twin (the reference has no
    relational operators); the training-data rule follows the exact
    substring-dedup practice the dedup family's SURVEY row cites."""
    d = _t(spark, sf_dir, "documents")
    spans = duplicated_token_spans(d)
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(
            F.col("span_end") - F.col("span_start") + F.lit(DEFAULT_SPAN_L)
        ).alias("dup_tokens"),
    )
    return (
        d.select("doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_toks"))
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                * F.lit(1000000.0)
                / F.col("n_toks")
            )
            .cast("long")
            .alias("dup_frac_micro"),
        )
        .orderBy("doc_id")
    )


@query(
    "q257_dup_span_rollup",
    oracle=f"""
    WITH {_DUP_SPAN_CTES}
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(p.doc_id) AS BIGINT) AS n_docs_with_dups,
           CAST(sum(len(t.toks)) AS BIGINT) AS total_tokens,
           CAST(sum(coalesce(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
           CAST(round(sum(coalesce(p.dup_tokens, 0)) * 1000000.0
                      / sum(len(t.toks))) AS BIGINT) AS dup_frac_micro
    FROM t LEFT JOIN perdoc p USING (doc_id)
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def q257_dup_span_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene report over q256's spans: per source, how much of
    the token mass sits inside duplicated >= {DEFAULT_SPAN_L}-token
    spans — the number a curation pipeline tracks per ingest source to
    spot boilerplate-heavy feeds (a source whose dup fraction climbs is
    shipping templated content even if document-level dedup stays
    quiet). Same detector, one extra groupBy on the source dimension."""
    d = _t(spark, sf_dir, "documents")
    perdoc = (
        duplicated_token_spans(d)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + F.lit(DEFAULT_SPAN_L)
            ).alias("dup_tokens")
        )
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
        )
        .join(perdoc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.col("dup_tokens")).alias("n_docs_with_dups"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0))).alias("dup_tokens"),
            F.round(
                F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0)))
                * F.lit(1000000.0)
                / F.sum("n_toks")
            )
            .cast("long")
            .alias("dup_frac_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q258 — span trim plan: remove all-but-first occurrences (round 14)
# ---------------------------------------------------------------------------


@query(
    "q258_span_trim_plan",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), w AS (
        {_sql_span_windows()}
    ), dup AS (
        SELECT h FROM w GROUP BY h HAVING count(*) > 1
    ), marked AS (
        SELECT w.doc_id, w.pos, w.h FROM w JOIN dup USING (h)
    ), removable AS (
        -- the kept occurrence per duplicated key is the earliest
        -- (doc_id, pos); every later occurrence is removable
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
            FROM marked
        ) WHERE rn > 1
    ), {_sql_span_islands('removable', count_col='n_trim_spans', sum_col='trim_tokens')}
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_toks,
           coalesce(p.n_trim_spans, 0) AS n_trim_spans,
           coalesce(p.trim_tokens, 0) AS trim_tokens,
           CAST(len(t.toks) - coalesce(p.trim_tokens, 0) AS BIGINT) AS kept_tokens
    FROM t LEFT JOIN perdoc p USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q258_span_trim_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE form of q256: for every duplicated
    {DEFAULT_SPAN_L}-token window key, ONE occurrence is kept — the
    globally earliest (doc_id, pos), the same deterministic earliest-
    witness election the dedup family uses everywhere (q73's window-min
    rule) — and every other occurrence is marked removable; removable
    windows merge into maximal trim spans per document and the output
    is the TRIM PLAN: spans to cut, token mass removed, tokens kept.
    This is the exact-substring-dedup practice for training corpora
    (cut repeated boilerplate once the corpus-wide copy is kept) as a
    deterministic, engine-portable plan rather than a destructive
    rewrite — downstream can apply it or veto it per source.

    Election note: a row_number over (h ORDER BY doc_id, pos) in BOTH
    engines makes the kept copy unique and deterministic even when a
    key repeats inside one document. Trim-mass caveat (shared with the
    practice it models): a removable span may overlap a KEPT window in
    the same document, so trim_tokens is the plan's upper bound —
    applying a cut re-checks the kept occurrence survives.

    Scale shape: q256's passes plus one more groupBy on the window key
    (the election) — still nothing but hash-keyed shuffles and a
    per-doc window over the marked subset. Ref parity: no reference
    twin; extends the SURVEY dedup row's exact family."""
    from pyspark.sql.window import Window

    from flink_mingo_tail_spark.operators.dedup import (
        _merge_span_islands,
        _span_windows,
    )

    d = _t(spark, sf_dir, "documents")
    L = DEFAULT_SPAN_L
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    w = _span_windows(d, id_col="doc_id", text_col="text", span_l=L)
    # r14 optimization: row_number > 1 alone selects all-but-first
    # occurrences of every duplicated key (a singleton key only ever
    # gets rn = 1), so the separate multiplicity aggregate + semi-join
    # — which re-ran the whole window-key build for its second leg —
    # is redundant. One shuffle on h, source touched once.
    by_key = Window.partitionBy("h").orderBy("doc_id", "pos")
    removable = (
        w.withColumn("rn", F.row_number().over(by_key))
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos")
    )
    perdoc = (
        _merge_span_islands(removable, id_col="doc_id", span_l=L)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trim_spans"),
            F.sum(
                F.col("span_end") - F.col("span_start") + F.lit(L)
            ).alias("trim_tokens"),
        )
    )
    return (
        t.select("doc_id", F.size("toks").cast("long").alias("n_toks"))
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            F.coalesce(F.col("n_trim_spans"), F.lit(0)).alias("n_trim_spans"),
            F.coalesce(F.col("trim_tokens"), F.lit(0)).alias("trim_tokens"),
            (F.col("n_toks") - F.coalesce(F.col("trim_tokens"), F.lit(0))).alias(
                "kept_tokens"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q259 — standing span index: incremental substring dedup (round 14)
# ---------------------------------------------------------------------------


@query(
    "q259_span_index_probe",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), iw AS (
        SELECT DISTINCT h FROM (
            {_sql_span_windows(where=" WHERE doc_id % 10 <> 7")}
        )
    ), pw AS (
        {_sql_span_windows(where=" WHERE doc_id % 10 = 7")}
    ), marked AS (
        SELECT pw.doc_id, pw.pos FROM pw JOIN iw USING (h)
    ), {_sql_span_islands('marked')}
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_toks,
           coalesce(p.n_dup_spans, 0) AS n_dup_spans,
           coalesce(p.dup_tokens, 0) AS dup_tokens
    FROM t LEFT JOIN perdoc p USING (doc_id)
    WHERE t.doc_id % 10 = 7
    ORDER BY t.doc_id
    """,
)
def q259_span_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q256's detector in its INCREMENTAL standing form (the growing
    direction every dedup modality in this engine gets): the admitted
    corpus's window keys persist as a sharded standing table
    (operators/dedup.build_span_index — one row per corpus token, the
    family's biggest index, which is exactly what distributed
    substring dedup costs since suffix structures don't shard), and
    each incoming batch (q117's doc_id%10==7 convention) reports the
    maximal spans it shares with the STANDING corpus via an O(batch-
    tokens) membership semi-join on (shard, h) + the islands merge —
    never re-scanning corpus text. Output per incoming doc: token
    count, standing-dup span count, standing-dup token mass.

    Scale shape: probe cost rides the batch (its windows), index cost
    is the one-time build + membership appends; the semi-join is
    hash-keyed against the hive-sharded key set with the probe-side
    shard computed from the key (partition pruning for selective
    batches). Ref parity: SURVEY §2A A6/A7 standing-state discipline
    applied to the substring modality; no reference twin."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.dedup import (
        build_span_index,
        probe_span_index,
    )

    d = _t(spark, sf_dir, "documents")
    idx_side = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    tmp = tempfile.mkdtemp(prefix="fmts-spanidx-q259-")
    try:
        path = f"{tmp}/sidx"
        build_span_index(idx_side, path, mode="overwrite")
        perdoc = (
            probe_span_index(incoming, path)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_dup_spans"),
                F.sum(
                    F.col("span_end") - F.col("span_start") + F.lit(DEFAULT_SPAN_L)
                ).alias("dup_tokens"),
            )
        )
        rows = [
            (r.doc_id, r.n_toks, r.n_dup_spans, r.dup_tokens)
            for r in incoming.select(
                "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_toks")
            )
            .join(perdoc, "doc_id", "left")
            .select(
                "doc_id",
                "n_toks",
                F.coalesce(F.col("n_dup_spans"), F.lit(0)).alias("n_dup_spans"),
                F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            )
            .orderBy("doc_id")
            .collect()  # bounded: the incoming slice; materialized
            # before the scratch index is removed (q253's pattern)
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, n_toks long, n_dup_spans long, dup_tokens long"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q261 — span index occupancy/layout audit (round 14)
# ---------------------------------------------------------------------------


@query(
    "q261_span_index_audit",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), keys AS (
        SELECT DISTINCT h FROM ({_sql_span_windows()})
    ), occ AS (
        SELECT ({sql_md5_long('h')}) % 16 AS shard,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM keys GROUP BY 1
    )
    SELECT CAST(shard AS BIGINT) AS shard, n_keys,
           CAST(round(n_keys * 1000.0 / (SELECT sum(n_keys) FROM occ))
                AS BIGINT) AS share_milli
    FROM occ
    ORDER BY shard
    """,
)
def q261_span_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span index family's MEASUREMENT loop (q245/q249/q254's role
    for the substring modality): the distinct window-key population's
    shard distribution — per shard, key count and milli share of the
    table. md5 sharding should be uniform (≈ 62-63 milli per shard at
    16 shards); the wired a-posteriori check that the layout the probe
    semi-join prunes against actually spreads. Derived IN-QUERY from
    the corpus (bench-citizen shape: one narrow pass + a 16-row
    rollup); operators/dedup.audit_span_index runs the identical
    rollup off a PERSISTED index between ingest batches, tested EQUAL
    to this derivation (the q245/audit_semantic_index twin pattern)."""
    d = _t(spark, sf_dir, "documents")
    from flink_mingo_tail_spark.operators.dedup import _index_shard, _span_windows

    keys = (
        _span_windows(d, id_col="doc_id", text_col="text", span_l=DEFAULT_SPAN_L)
        .select("h")
        .distinct()
    )
    occ = (
        keys.select(_index_shard(F.col("h"), 16).alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    )
    total = occ.agg(F.sum("n_keys").alias("t"))
    return (
        occ.crossJoin(F.broadcast(total))
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_keys",
            F.round(F.col("n_keys") * F.lit(1000.0) / F.col("t"))
            .cast("long")
            .alias("share_milli"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q262 — span trim APPLY: the rewritten corpus (round 14)
# ---------------------------------------------------------------------------


@query(
    "q262_span_trim_apply",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), w AS (
        {_sql_span_windows()}
    ), dup AS (
        SELECT h FROM w GROUP BY h HAVING count(*) > 1
    ), marked AS (
        SELECT w.doc_id, w.pos, w.h FROM w JOIN dup USING (h)
    ), removable AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
            FROM marked
        ) WHERE rn > 1
    ), {_sql_span_islands('removable', count_col='n_trim_spans', sum_col='trim_tokens')},
    tok AS (
        SELECT doc_id, i AS pos, toks[i] AS tok
        FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    ), kept AS (
        SELECT k.doc_id, k.pos, k.tok FROM tok k
        LEFT JOIN spans s
          ON s.doc_id = k.doc_id
         AND k.pos BETWEEN s.s AND s.e + {DEFAULT_SPAN_L} - 1
        WHERE s.doc_id IS NULL
    ), ka AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS kept_text,
               CAST(count(*) AS BIGINT) AS n_kept_tokens
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(ka.kept_text, '') AS kept_text,
           coalesce(ka.n_kept_tokens, 0) AS n_kept_tokens
    FROM t LEFT JOIN ka USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def q262_span_trim_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q258's plan APPLIED — the destructive step, as a deterministic
    distributed rewrite rather than a driver loop: every token inside a
    removable trim span (all-but-the-earliest occurrence of each
    duplicated {DEFAULT_SPAN_L}-token window key, islands-merged) is
    dropped and each document's survivors re-assemble in position
    order. Output per doc: the trimmed text and its token count — an
    empty string for a document the plan empties entirely (every
    window a later occurrence). This is the corpus a substring-
    deduplicated training run actually reads; q258 stays the dry-run
    report for per-source veto.

    Scale shape: q258's passes, then one posexplode of the corpus
    tokens (corpus-token rows, narrow), an equi-keyed anti-join
    against the per-doc span ranges (spans are few per doc — the range
    predicate rides the doc_id equi key), and a per-doc
    sort-and-concat re-assembly (array_sort over collect_list — one
    aggregation, no window). Ref parity: no reference twin."""
    from pyspark.sql.window import Window

    from flink_mingo_tail_spark.operators.dedup import (
        _merge_span_islands,
        _span_windows,
    )

    d = _t(spark, sf_dir, "documents")
    L = DEFAULT_SPAN_L
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    w = _span_windows(d, id_col="doc_id", text_col="text", span_l=L)
    # r14 optimization: row_number > 1 alone selects all-but-first
    # occurrences of every duplicated key (a singleton key only ever
    # gets rn = 1), so the separate multiplicity aggregate + semi-join
    # — which re-ran the whole window-key build for its second leg —
    # is redundant. One shuffle on h, source touched once.
    by_key = Window.partitionBy("h").orderBy("doc_id", "pos")
    removable = (
        w.withColumn("rn", F.row_number().over(by_key))
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos")
    )
    spans = _merge_span_islands(removable, id_col="doc_id", span_l=L)
    tok = t.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tok.join(
        spans,
        (tok.doc_id == spans.doc_id)
        & (tok.pos >= spans.span_start)
        & (tok.pos <= spans.span_end + F.lit(L - 1)),
        "left_anti",
    )
    ka = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("kept_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept_tokens"),
    )
    return (
        t.select("doc_id")
        .join(ka, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
            F.coalesce(F.col("n_kept_tokens"), F.lit(0)).alias("n_kept_tokens"),
        )
        .orderBy("doc_id")
    )
