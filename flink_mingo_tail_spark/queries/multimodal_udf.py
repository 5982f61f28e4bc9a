"""Multimodal-column queries (q94/q95) and the UDF/UDAF/UDTF surface
(q96-q98; SURVEY.md §2B "UDF / UDAF / UDTF surface").

UDF queries exist to prove the slow-path machinery (Arrow-batched
pandas_udf / applyInPandas / UDTF), not as the preferred plan — every
one of them has a pure-Catalyst equivalent that the oracle SQL mirrors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from flink_mingo_tail_spark.operators.multimodal import (
    extract_features,
    extract_features_arrow,
    synthesize_media,
)
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


@query(
    "q94_multimodal_metadata",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               CAST(sha256(text) AS BLOB) AS payload,
               CASE WHEN doc_id % 2 = 0 THEN ((doc_id % 8 + 1) * 64)::INT END AS width,
               CASE WHEN doc_id % 2 = 0 THEN ((doc_id % 4 + 1) * 64)::INT END AS height,
               CASE WHEN doc_id % 2 = 1 THEN ((doc_id % 30 + 1) * 1000)::INT END AS duration_ms
        FROM documents
    )
    SELECT kind,
           count(*) AS n,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_payload_bytes,
           CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
           CAST(sum(CAST(duration_ms AS BIGINT)) AS BIGINT) AS total_duration_ms
    FROM media
    GROUP BY kind
    ORDER BY kind
    """,
)
def q94_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed multimodal envelope (binary payload + metadata struct,
    operators/multimodal.py): metadata-only aggregation never touches the
    payload bytes — column pruning keeps the 100 TB blob column on disk."""
    media = synthesize_media(_t(spark, sf_dir, "documents"))
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_payload_bytes"),
            F.sum(F.col("meta.width").cast("long") * F.col("meta.height")).alias("total_pixels"),
            F.sum(F.col("meta.duration_ms").cast("long")).alias("total_duration_ms"),
        )
        .orderBy("kind")
    )


@query(
    "q95_multimodal_features",
    # The fake featurizer is a 16-bin byte histogram over the payload,
    # and the payload is the 64 ASCII bytes of sha256(text) hex: digits
    # '0'-'9' (bytes 48-57) land in bin 3, letters 'a'-'f' (97-102) in
    # bin 6, every other bin is 0. So the whole feature vector reduces
    # to ONE count (the digit count d): f3 = d/64, f6 = (64-d)/64 —
    # exact 6-decimal binary fractions, so round() is identity and both
    # engines print identical shortest-round-trip strings.
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               length(regexp_replace(sha256(text), '[^0-9]', '', 'g')) AS d
        FROM documents
    ), f AS (
        SELECT media_id, kind,
               round(d / 64.0, 6) AS f3,
               round((64 - d) / 64.0, 6) AS f6
        FROM media
    )
    SELECT media_id, kind,
           16 AS feature_dim,
           round(f3 * f3 + f6 * f6, 6) AS feature_sqnorm,
           concat('0.0,0.0,0.0,', f3::VARCHAR, ',0.0,0.0,', f6::VARCHAR,
                  ',0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0') AS feature_csv
    FROM f
    ORDER BY media_id
    """,
)
def q95_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → feature vector via Arrow-batched mapInPandas
    (deterministic fake featurizer; real Spark plumbing — see
    operators/multimodal.py). The oracle computes the same histogram
    closed-form from the sha256 hex alphabet (see comment above);
    determinism and batch-shape are asserted in tests/test_multimodal.py."""
    media = synthesize_media(spread(_t(spark, sf_dir, "documents")))
    feats = extract_features(media)
    # The raw array<double> column is banned from query outputs (the
    # driver's pandas canonicalizer crashes on unhashable lists — the
    # round-1 q26b red row); serialize it plus summary scalars instead.
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("feature_dim"),
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x), 6).alias(
            "feature_sqnorm"
        ),
        F.array_join(F.transform("feature", lambda x: F.round(x, 6).cast("string")), ",").alias(
            "feature_csv"
        ),
    ).orderBy("media_id")


@query(
    "q96_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity > 40
    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount
    LIMIT 1000
    """,
)
def q96_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow series in/out). Per-row double
    multiplication is IEEE-identical to the oracle's SQL arithmetic —
    and this stays the *demonstration* path: the same expression as a
    built-in column op is what production plans should use."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 40)
        .select(
            "l_orderkey",
            "l_linenumber",
            net_price(F.col("l_extendedprice"), F.col("l_discount")).alias("net_price"),
            "l_extendedprice",
            "l_discount",
        )
        # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem;
        # the raw inputs join the sort so the LIMIT membership is engine-stable.
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .limit(1000)
        .drop("l_extendedprice", "l_discount")
    )


@query(
    "q113_scalar_py_udf",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 5000 THEN 'platinum'
                WHEN c_acctbal >= 0 THEN 'standard'
                ELSE 'delinquent' END AS tier,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    ORDER BY c_custkey
    """,
)
def q113_scalar_py_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar Python UDF (§2B UDF family row 1) — the
    DEMONSTRATION form only: per-row Python is the slow path, kept to a
    small dimension table. Production plans use the identical CASE
    expression (the oracle) or the vectorized pandas_udf (q96). Integer
    cents keep the double → int mapping exact in both engines."""
    from pyspark.sql.functions import udf

    @udf("string")
    def tier(bal: float) -> str:
        if bal >= 5000:
            return "platinum"
        if bal >= 0:
            return "standard"
        return "delinquent"

    @udf("long")
    def cents(bal: float) -> int:
        # mirror SQL round-half-away-from-zero, not Python banker's rounding
        import math

        return int(math.floor(bal * 100 + 0.5)) if bal >= 0 else -int(math.floor(-bal * 100 + 0.5))

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", tier("c_acctbal").alias("tier"), cents("c_acctbal").alias("bal_cents")
    ).orderBy("c_custkey")


@query(
    "q97_grouped_udaf",
    oracle="""
    SELECT l_returnflag,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))
             / (100.0 * sum(CAST(l_quantity AS BIGINT))) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q97_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via applyInPandas (quantity-weighted
    mean price, exact scaled-integer arithmetic inside numpy int64)."""

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(pdf["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        qty = pdf["l_quantity"].to_numpy().astype(np.int64)
        # Per-row product fits int64 (cents<=1e7 * qty<=50); the SUM does
        # not at scale — accumulate in Python arbitrary-precision ints,
        # then convert once, mirroring the oracle's exact HUGEINT sum →
        # single cast-to-double → one IEEE division.
        int_sum = sum((cents * qty).tolist())
        qty_sum = sum(qty.tolist())
        value = float(int_sum) / (100.0 * float(qty_sum))
        return pd.DataFrame({"l_returnflag": [pdf["l_returnflag"].iloc[0]], "weighted_avg_price": [value]})

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(weighted, schema="l_returnflag string, weighted_avg_price double")
        .orderBy("l_returnflag")
    )


@query(
    "q98_udtf_tokenize",
    oracle="""
    SELECT doc_id,
           unnest(toks) AS token,
           unnest(generate_series(1, len(toks))) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50)
    ORDER BY doc_id, pos
    """,
)
def q98_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one output row per token with its
    1-based position, applied laterally per input row."""

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1

    prepare_session(spark)
    spark.udtf.register("fmts_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_small"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM docs_small d, LATERAL fmts_tokenize(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


@query(
    "q145_arrow_native_features",
    # Same closed-form oracle as q95 (see the bin derivation there): the
    # payload is sha256 hex, so the 16-bin byte histogram collapses to
    # the digit count d — bin 3 = d/64, bin 6 = (64-d)/64. The Arrow
    # path must land on bit-identical values to the pandas path, so the
    # two queries intentionally share one oracle.
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               length(regexp_replace(sha256(text), '[^0-9]', '', 'g')) AS d
        FROM documents
    ), f AS (
        SELECT media_id, kind,
               round(d / 64.0, 6) AS f3,
               round((64 - d) / 64.0, 6) AS f6
        FROM media
    )
    SELECT media_id, kind,
           16 AS feature_dim,
           round(f3 * f3 + f6 * f6, 6) AS feature_sqnorm,
           concat('0.0,0.0,0.0,', f3::VARCHAR, ',0.0,0.0,', f6::VARCHAR,
                  ',0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0') AS feature_csv
    FROM f
    ORDER BY media_id
    """,
)
def q145_arrow_native_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → feature vector via ``mapInArrow`` — the
    zero-pandas Arrow-native batch path (operators/multimodal.py
    ``extract_features_arrow``). Versus q95's mapInPandas: for binary
    columns the pandas bridge builds one Python bytes object per row
    before the featurizer runs; the Arrow path bins the batch's payload
    bytes directly from the value buffer in two vectorized numpy ops.
    Same output contract as q95, bit-identical values (equivalence
    asserted in tests/test_multimodal.py)."""
    media = synthesize_media(spread(_t(spark, sf_dir, "documents")))
    feats = extract_features_arrow(media)
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("feature_dim"),
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x), 6).alias(
            "feature_sqnorm"
        ),
        F.array_join(F.transform("feature", lambda x: F.round(x, 6).cast("string")), ",").alias(
            "feature_csv"
        ),
    ).orderBy("media_id")


@query(
    "q150_arrow_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price_arrow
    FROM lineitem
    WHERE l_quantity <= 2
    ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount
    LIMIT 1000
    """,
)
def q150_arrow_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native scalar UDF (Spark 4.1 ``arrow_udf``): pyarrow.Array
    in/out via pyarrow.compute — completing the Python-integration
    matrix alongside the row UDF (q113), pandas_udf (q96), grouped-agg
    UDAF (q97), UDTF (q98), mapInPandas (q95), and mapInArrow (q145).
    Versus pandas_udf the worker skips the Arrow→pandas Series
    round-trip entirely; ``pc.multiply``/``pc.subtract`` are IEEE
    doubles, bit-identical to the oracle's SQL arithmetic. Same policy
    note as q96: in production this expression belongs in a built-in
    column op; the UDF exists to prove the machinery."""
    # pyarrow is imported at module level: arrow_udf resolves the
    # pa.Array type hints via get_type_hints against module globals
    # (function-local imports leave them unresolvable under
    # `from __future__ import annotations`).
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("double")
    def net_price_arrow(price: pa.Array, discount: pa.Array) -> pa.Array:
        return pc.multiply(price, pc.subtract(pa.scalar(1.0), discount))

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") <= 2)
        .select(
            "l_orderkey",
            "l_linenumber",
            net_price_arrow(F.col("l_extendedprice"), F.col("l_discount")).alias(
                "net_price_arrow"
            ),
            "l_extendedprice",
            "l_discount",
        )
        # (l_orderkey, l_linenumber) is not unique in the synthetic
        # lineitem; raw inputs join the sort so LIMIT membership is
        # engine-stable (same guard as q96).
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .limit(1000)
        .drop("l_extendedprice", "l_discount")
    )


# ---------------------------------------------------------------------------
# q225 — perceptual-hash near-dup on the binary payload column (round 11)
# ---------------------------------------------------------------------------

from flink_mingo_tail_spark.operators.multimodal import (  # noqa: E402
    DHASH_BITS,
    dhash_arrow,
    synthesize_media_variants,
)
from flink_mingo_tail_spark.operators.perceptual_index import (  # noqa: E402
    DEFAULT_N_BANDS,
    DEFAULT_PH_HAM,
)

# One spelling with the standing index (operators/perceptual_index.py):
# 4 bands x 8 bits over the 32-bit dHash (q212's contract), verdict at
# Hamming <= 3 — pigeonhole-complete because d<=3 differs in <=3 of 4
# disjoint bands.
_PH_BANDS = DEFAULT_N_BANDS
_PH_HAM = DEFAULT_PH_HAM
_PH_GROUP = 5   # synthetic near-dup group size (planted variants)

_PH_SQL_PAYLOAD = (
    f"CASE WHEN doc_id % {_PH_GROUP} = 0 THEN sha256(CAST(doc_id // {_PH_GROUP} AS VARCHAR)) "
    f"ELSE substr(sha256(CAST(doc_id // {_PH_GROUP} AS VARCHAR)), 1, (doc_id % {_PH_GROUP}) * 3 + 10) "
    f"|| 'z' || substr(sha256(CAST(doc_id // {_PH_GROUP} AS VARCHAR)), (doc_id % {_PH_GROUP}) * 3 + 12) END"
)


def sql_dhash(src: str, id_cols: str, out: str = "ph", h_col: str = "h") -> str:
    """The dHash bit fold's DuckDB replay, in ONE spelling (round-14
    extraction — previously spelled verbatim in five oracles:
    q225/q228's shared core, q246, q247, q248, q249): byte j vs byte
    j+1 of the payload stream sets bit j-1, summed into a BIGINT —
    bit-exact with the engine's buffer-level mapInArrow dHash
    (operators/multimodal.dhash_arrow). Returns the SELECT body for a
    CTE: ``{out}`` per ``{id_cols}`` from payload column ``{h_col}``
    of ``{src}``."""
    return (
        f"""SELECT {id_cols},
               CAST(sum(CASE WHEN ascii(substr({h_col}, j, 1)) > ascii(substr({h_col}, j + 1, 1))
                             THEN CAST(1 AS BIGINT) << (j - 1) ELSE 0 END)
                    AS BIGINT) AS {out}
        FROM {src} CROSS JOIN unnest(range(1, {DHASH_BITS + 1})) AS t(j)
        GROUP BY {id_cols}"""
    )


# Shared SQL core for q225/q228 (no WITH keyword — q228 prepends WITH
# RECURSIVE for the reachability closure): payload replay -> dHash ->
# bands -> exact-filtered near-dup `pairs`.
_PH_CORE_SQL = f"""m AS (
        SELECT doc_id AS media_id, {_PH_SQL_PAYLOAD} AS h
        FROM documents
    ), dh AS (
        {sql_dhash('m', 'media_id')}
    ), bands AS (
        SELECT media_id, ph, u.band, (ph >> (8 * u.band)) & 255 AS bits
        FROM dh, unnest(range(0, {_PH_BANDS})) AS u(band)
    ), cand AS (
        SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
               a.ph AS pha, b.ph AS phb
        FROM bands a JOIN bands b
          ON b.band = a.band AND b.bits = a.bits AND a.media_id < b.media_id
    ), pairs AS (
        SELECT media_a, media_b,
               CAST(bit_count(xor(pha, phb)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(pha, phb)) <= {_PH_HAM}
    )"""


@query(
    "q225_perceptual_hash_near_dup",
    oracle="WITH " + _PH_CORE_SQL + """
    SELECT media_a, media_b, hamming FROM pairs
    ORDER BY media_a, media_b
    """,
)
def q225_perceptual_hash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs on the MULTIMODAL binary
    column — the dedup modality the text families can't cover: dHash
    fingerprints (adjacent-byte comparisons, the classic image dHash
    with the decode step stubbed per operators/multimodal.py) computed
    BUFFER-LEVEL via mapInArrow (q145's path: one contiguous uint8 view
    per batch, no per-row Python objects), then q212's pigeonhole
    Hamming banding: 4 disjoint 8-bit bands of the 32-bit hash, a
    candidate iff >=1 band collides (100% recall at d <= 3 by
    pigeonhole), precision restored by the exact popcount filter.

    The fixture corpus plants real near-dup structure (q120's
    deterministic-injection pattern): groups of 5 consecutive ids
    share a base payload with one-byte member perturbations, so
    within-group pairs sit at d <= 4 and every (canonical, variant)
    pair at d <= 2 is guaranteed caught — pinned structurally in
    tests/test_multimodal.py. The oracle replays the payload bytes AND
    the hash bit-exactly in SQL (ascii comparisons over the same
    sha256 hex stream — the engine-grid doctrine for the Arrow path).

    Scale shape: hashing is one narrow corpus pass through the Arrow
    batcher (payload pruned away after — the 100 TB blob column never
    shuffles); candidates come from an equi-join on (band, bits) int
    pairs with occupancy bounded by band width (at 100 TB: widen the
    hash to 64 bits / 8 bands, the q212 rule, via auto-style width
    selection); popcount is integer-exact in both engines."""
    return perceptual_near_dup_pairs(spark, sf_dir).orderBy("media_a", "media_b")


def perceptual_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q225's pair frame (unordered) — shared by the pair view (q225)
    and the transitive cluster election (q228), one code path."""
    media = synthesize_media_variants(
        _t(spark, sf_dir, "documents"), group_size=_PH_GROUP
    )
    # both self-join legs consume the fingerprints — materialize the
    # narrow (media_id, ph) frame once so the Arrow-boundary dHash pass
    # (and the payload synthesis feeding it) runs a single time
    fp = dhash_arrow(media).select("media_id", "ph").localCheckpoint()
    bands = fp.select(
        "media_id",
        "ph",
        F.explode(F.sequence(F.lit(0), F.lit(_PH_BANDS - 1))).alias("band"),
    ).withColumn("bits", F.expr("shiftright(ph, 8 * band) & 255"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bits") == F.col("a.bits"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.ph").alias("pha"),
            F.col("b.ph").alias("phb"),
        )
        .distinct()
    )
    return cand.select(
        "media_a",
        "media_b",
        F.expr("CAST(bit_count(pha ^ phb) AS BIGINT)").alias("hamming"),
    ).filter(F.col("hamming") <= _PH_HAM)


@query(
    "q228_perceptual_dup_components",
    oracle="WITH RECURSIVE " + _PH_CORE_SQL + """
    , sym AS (
        SELECT media_a AS a, media_b AS b FROM pairs
        UNION SELECT media_b, media_a FROM pairs
    ), reach(src, dst) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM sym)
        UNION
        SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
    ), comp AS (
        SELECT src AS media_id, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT d.doc_id AS media_id,
           coalesce(c.component, d.doc_id) AS component,
           coalesce(c.component, d.doc_id) < d.doc_id AS is_dup
    FROM documents d LEFT JOIN comp c ON c.media_id = d.doc_id
    ORDER BY media_id
    """,
)
def q228_perceptual_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE transitive near-dup clusters over the perceptual-hash pair
    graph — q73b's closure applied to the multimodal modality: q225
    emits PAIRS (A~B at d<=3, B~C at d<=3), but corpus dedup keeps or
    drops by the transitive CLUSTER (A,B,C together even when d(A,C)
    > 3), with min media_id as the canonical representative. Spark
    side: iterative min-label propagation + pointer jumping
    (operators/cluster.py — O(log diameter) rounds of two key-
    partitioned shuffles, O(V) state). Oracle: DuckDB recursive-CTE
    reachability (exact but quadratic-in-component — oracle-only; the
    Spark plan is the one that scales). Isolated media (no near-dup
    pair) are their own singleton components via the left join."""
    pairs = perceptual_near_dup_pairs(spark, sf_dir)
    from flink_mingo_tail_spark.operators.cluster import connected_components

    edges = pairs.select(F.col("media_a").alias("src"), F.col("media_b").alias("dst"))
    comp = connected_components(edges)
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))
    return (
        d.join(comp, d.media_id == comp.node, "left")
        .select(
            "media_id",
            F.coalesce("component", F.col("media_id")).alias("component"),
        )
        .withColumn("is_dup", F.col("component") < F.col("media_id"))
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# q247 — perceptual standing-index probe (round 13; verdict "missing #1")
# ---------------------------------------------------------------------------

_PHIDX_BATCHES = 3  # simulated arrival batches (media_id % 3)


@query(
    "q247_perceptual_index_probe",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id, doc_id % {_PHIDX_BATCHES} AS b,
               {_PH_SQL_PAYLOAD} AS h
        FROM documents
    ), dh AS (
        {sql_dhash('m', 'media_id, b')}
    ), hit AS (
        SELECT DISTINCT a.media_id
        FROM dh a JOIN dh e ON e.b < a.b
        WHERE bit_count(xor(a.ph, e.ph)) <= {_PH_HAM}
    )
    SELECT d.media_id AS media_id, h.media_id IS NOT NULL AS perceptual_hit
    FROM dh d LEFT JOIN hit h ON h.media_id = d.media_id
    ORDER BY d.media_id
    """,
)
def q247_perceptual_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q225's perceptual near-dup run the way a PRODUCTION ingest loop
    runs it — against a PERSISTED dHash band standing index
    (operators/perceptual_index.py) instead of re-deriving the banding
    per pass: media arrive in {_PHIDX_BATCHES} simulated batches
    (media_id % {_PHIDX_BATCHES}); each batch hashes buffer-level via
    mapInArrow, probes the persisted (shard, band, bits) table AS OF
    BATCH START (batch 0 bootstraps an empty index — nothing is a dup),
    confirms candidates with the exact popcount against the ``ph``
    carried in the band row, then appends its own fingerprints.

    The oracle replays the payload AND the dHash bit-exactly (q225's
    engine-grid spelling) but applies the PURE Hamming rule — exists an
    EARLIER-batch fingerprint within Hamming {_PH_HAM} — with no
    banding at all: with ham < n_bands the pigeonhole argument makes
    the banded candidate set recall-complete and the popcount confirm
    makes it precise, so the standing-index verdict must equal the
    dense rule row-for-row (an independent derivation, stronger than
    replaying the bands; the same contract is pinned per-band in
    tests/test_perceptual_index.py).

    Scale shape: per batch the work is O(batch) band rows equi-joined
    against the standing table with the batch side broadcast; occupancy
    is bounded by band width; the blob column never leaves the Arrow
    hasher. Appends are membership-monotone (replay-idempotent).
    Ref parity: extends the reference's standing-state discipline
    (SURVEY §2A A6/A7) to the perceptual modality; no reference twin."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.perceptual_index import (
        build_perceptual_index,
        probe_perceptual_index,
    )

    media = synthesize_media_variants(
        _t(spark, sf_dir, "documents"), group_size=_PH_GROUP
    )
    # the batch loop filters fp 2x per batch — hash once, not 2B times
    fp = dhash_arrow(media).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="fmts-phidx-q247-")
    rows: list[tuple[int, bool]] = []
    try:
        path = f"{tmp}/ph_index"
        for b in range(_PHIDX_BATCHES):
            batch = fp.filter(F.pmod(F.col("media_id"), F.lit(_PHIDX_BATCHES)) == b)
            if b == 0:
                rows.extend(
                    (r.media_id, False) for r in batch.select("media_id").collect()
                )
                build_perceptual_index(batch, path, mode="overwrite")
            else:
                rows.extend(
                    (r.media_id, r.perceptual_hit)
                    for r in probe_perceptual_index(
                        batch, path, broadcast_side="probe"
                    ).collect()
                )
                build_perceptual_index(batch, path, mode="append")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "media_id long, perceptual_hit boolean"
    ).orderBy("media_id")


@query(
    "q249_perceptual_occupancy_audit",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id, {_PH_SQL_PAYLOAD} AS h
        FROM documents
    ), dh AS (
        {sql_dhash('m', 'media_id')}
    ), bands AS (
        SELECT media_id, u.band, (ph >> (8 * u.band)) & 255 AS bits
        FROM dh, unnest(range(0, {_PH_BANDS})) AS u(band)
    ), occ AS (
        SELECT band, bits, CAST(count(*) AS BIGINT) AS n
        FROM bands GROUP BY band, bits
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_occ,
           CAST(round(CAST(sum(n) AS DOUBLE) * 1000 / count(*)) AS BIGINT)
             AS mean_occ_milli,
           CAST(sum(n * n) AS BIGINT) AS sum_sq
    FROM occ GROUP BY band ORDER BY band
    """,
)
def q249_perceptual_occupancy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q245's occupancy measurement applied to the PERCEPTUAL index —
    run off the PERSISTED band table (operators/perceptual_index.
    audit_perceptual_index: one narrow scan of {{path}}/bands, no
    re-hashing): per band position, live (bits) bucket count, max/mean
    occupancy (milli grid) and Σn², the candidate-pair mass the band
    equi-join materializes. This is the number that decides when the
    q212 rule fires (widen the hash / the bands when a bucket crowds);
    at 8-bit bands occupancy is corpus/256 per band in expectation, and
    the planted variant groups concentrate mass measurably above it.

    The driver row builds the index in scratch over the full media
    corpus and audits it; the oracle replays payload → dHash → band
    explosion → the same two-level rollup entirely in SQL. Scratch
    bounded + deleted (q204 policy). Scale shape: the audit is one
    count shuffle bounded by live buckets (≤ n_bands·2^band_bits rows)
    + an n_bands-row rollup — runnable between ingest batches."""
    import shutil
    import tempfile

    from flink_mingo_tail_spark.operators.perceptual_index import (
        audit_perceptual_index,
        build_perceptual_index,
    )

    media = synthesize_media_variants(
        _t(spark, sf_dir, "documents"), group_size=_PH_GROUP
    )
    tmp = tempfile.mkdtemp(prefix="fmts-phaudit-q249-")
    try:
        path = f"{tmp}/ph_index"
        build_perceptual_index(dhash_arrow(media), path)
        rows = audit_perceptual_index(spark, path).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "band int, n_buckets long, max_occ long, mean_occ_milli long, sum_sq long"
    ).orderBy("band")


# ---------------------------------------------------------------------------
# q250 — cross-modal dup agreement (text LSH vs perceptual hash)
# ---------------------------------------------------------------------------


def _modality_agreement_oracle() -> str:
    from flink_mingo_tail_spark.queries.dedup import (
        _SQL_SIG,
        MINHASH_K,
        ROWS_PER_BAND,
    )
    from flink_mingo_tail_spark.operators.dedup import sql_lsh_band_keys

    tbands = sql_lsh_band_keys("sig", ROWS_PER_BAND, MINHASH_K)
    return f"""
    WITH {_PH_CORE_SQL},
    sigs AS (
        SELECT doc_id, {_SQL_SIG} AS sig FROM documents
    ), tbanded AS (
        SELECT doc_id, unnest({tbands}) AS band FROM sigs
    ), band_rep AS (
        SELECT band, min(doc_id) AS rep FROM tbanded GROUP BY band
    ), td AS (
        SELECT b.doc_id FROM tbanded b JOIN band_rep r ON b.band = r.band
        GROUP BY b.doc_id HAVING min(r.rep) < b.doc_id
    ), pd AS (
        SELECT DISTINCT media_b AS doc_id FROM pairs
    )
    SELECT td.doc_id IS NOT NULL AS text_dup,
           pd.doc_id IS NOT NULL AS perceptual_dup,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d
    LEFT JOIN td ON td.doc_id = d.doc_id
    LEFT JOIN pd ON pd.doc_id = d.doc_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("q250_modality_dup_agreement", oracle=_modality_agreement_oracle())
def q250_modality_dup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup AGREEMENT matrix — the QA view that tells a
    curation pipeline whether its modalities are redundant or
    complementary: per document, (a) the TEXT near-dup flag under
    q73's MinHash-LSH representative election (an earlier doc shares a
    band) and (b) the PERCEPTUAL near-dup flag under q225's dHash rule
    (an earlier media payload within Hamming {_PH_HAM}) — both
    'earlier-witness' semantics, so the two flags are directly
    comparable — rolled up to the 2×2 (text_dup, perceptual_dup)
    contingency counts. A large text-only cell means payload variants
    carry rewritten text; a large perceptual-only cell means the text
    pipeline misses media-level duplication — each asymmetry is a
    concrete reason the composed ingest (q248) runs BOTH stages.

    Scale shape: one corpus pass per modality (MinHash signatures /
    Arrow dHash), two band-key shuffles bounded by live buckets, a
    4-cell rollup; no pair list is materialized on the text side (the
    q73 election shape) and the perceptual pair frame is band-bounded.
    """
    from pyspark.sql import Window

    from flink_mingo_tail_spark.operators.dedup import (
        lsh_band_keys,
        minhash_from_hashes,
        shingle_hashes,
        tokens,
    )
    from flink_mingo_tail_spark.queries.dedup import MINHASH_K, ROWS_PER_BAND

    d = _t(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", shingle_hashes(F.array_distinct(tokens(F.col("text")))).alias("hs")
    )
    banded = hashed.select(
        "doc_id",
        F.explode(
            lsh_band_keys(minhash_from_hashes(F.col("hs"), MINHASH_K), ROWS_PER_BAND, MINHASH_K)
        ).alias("band"),
    )
    w = Window.partitionBy("band")
    td = (
        banded.withColumn("rep", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("rep").alias("rep"))
        .filter(F.col("rep") < F.col("doc_id"))
        .select("doc_id")
        .withColumn("__td", F.lit(True))
    )
    pd_flag = (
        perceptual_near_dup_pairs(spark, sf_dir)
        .select(F.col("media_b").alias("doc_id"))
        .distinct()
        .withColumn("__pd", F.lit(True))
    )
    return (
        d.select("doc_id")
        .join(td, "doc_id", "left")
        .join(pd_flag, "doc_id", "left")
        .groupBy(
            F.coalesce(F.col("__td"), F.lit(False)).alias("text_dup"),
            F.coalesce(F.col("__pd"), F.lit(False)).alias("perceptual_dup"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("text_dup", "perceptual_dup")
    )
