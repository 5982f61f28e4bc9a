"""Model-adjacent distributed computations: power-law fits and an
iterative-classifier training step — the "small ML inside the engine"
layer (q165's k-means Lloyd step and q174's grouped OLS are the
existing members of this family; these extend it to log-domain fits
and logistic regression).

Cross-engine determinism doctrine for this module: unlike stats.py
(which admits NO libm transcendentals), these operators genuinely need
log/exp. Transcendentals are not IEEE-correctly-rounded, so the two
engines may differ by ~1 ulp — the fix is the PER-ROW ROUNDING pattern
(rounded_cosine's argument): every transcendental result is rounded to
a coarse fixed grid (1e-6 of a log, 1e-3 of a probability) BEFORE
entering any sum, making the summands bit-identical integers in both
engines; all aggregation is then exact int64 and the final statistic
is one identical IEEE expression. A 1-ulp input drift only matters if
the true value sits within ~1e-10 of a grid boundary — negligible at
any corpus size we can hash-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import md5_long, tokens
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q195 — Zipf slope per source (power-law fit of the term-frequency curve)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100  # fit over each source's top-N terms


@query(
    "q195_zipf_slope",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY source, tok
    ), ranked AS (
      SELECT source, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, tok) AS rnk
      FROM tf QUALIFY rnk <= {_ZIPF_TOP}
    ), pts AS (
      SELECT source,
             CAST(round(ln(rnk) * 1000000.0) AS BIGINT) AS lx,
             CAST(round(ln(cnt) * 1000000.0) AS BIGINT) AS ly
      FROM ranked
    ), agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(lx) AS BIGINT) AS slx,
             CAST(sum(ly) AS BIGINT) AS sly,
             CAST(sum(lx * ly) AS BIGINT) AS slxy,
             CAST(sum(lx * lx) AS BIGINT) AS slxx
      FROM pts GROUP BY source
    )
    SELECT source, m,
           CAST(round((m * CAST(slxy AS DOUBLE) - CAST(slx AS DOUBLE) * sly)
                      * 1000000.0
                      / (m * CAST(slxx AS DOUBLE) - CAST(slx AS DOUBLE) * slx))
             AS BIGINT) AS slope_micro
    FROM agg
    ORDER BY source
    """,
)
def q195_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf (power-law) slope of each source's term-frequency curve:
    OLS of log(freq) on log(rank) over the top-100 terms. Natural text
    sits near slope -1; a source whose slope is far off (too flat =
    boilerplate/spam vocabulary, too steep = template repetition) is a
    curation red flag — this is the corpus-level quality twin of q82's
    per-document score.

    The term-frequency frame is one hash aggregate (vocabulary-bounded,
    never row-bounded); the per-source top-100 is a window over that
    frame partitioned BY SOURCE (q30's top-k-per-group shape — bounded
    by per-source vocabulary, the documented safe window). The fit
    itself runs on 100 points per source: each log is rounded to a
    1e-6 grid before summation (module doctrine), so the OLS moments
    are exact int64 and the closed-form slope is the identical IEEE
    expression in both engines.
    """
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("tok"))
    ranked = tf.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _ZIPF_TOP
    )
    pts = ranked.select(
        "source",
        F.round(F.log(F.col("rnk").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("lx"),
        F.round(F.log(F.col("cnt").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("ly"),
    )
    return (
        pts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("lx").cast("long").alias("slx"),
            F.sum("ly").cast("long").alias("sly"),
            F.sum(F.col("lx") * F.col("ly")).cast("long").alias("slxy"),
            F.sum(F.col("lx") * F.col("lx")).cast("long").alias("slxx"),
        )
        .select(
            "source",
            "m",
            F.expr(
                "CAST(round((m * CAST(slxy AS DOUBLE) - CAST(slx AS DOUBLE) * sly)"
                " * 1000000.0"
                " / (m * CAST(slxx AS DOUBLE) - CAST(slx AS DOUBLE) * slx))"
                " AS BIGINT)"
            ).alias("slope_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q196 — two Newton/IRLS steps of logistic regression per event type
# ---------------------------------------------------------------------------


@query(
    "q196_logistic_irls_step",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CAST(round(value) AS BIGINT) AS x,
             CAST(user_id % 2 AS BIGINT) AS y
      FROM events
    ), s1 AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(2 * y - 1) AS BIGINT) AS u0,
             CAST(sum(x * (2 * y - 1)) AS BIGINT) AS u1
      FROM t GROUP BY event_type
    ), b1 AS (
      SELECT event_type, n,
             2.0 * (CAST(sxx AS DOUBLE) * u0 - CAST(sx AS DOUBLE) * u1)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b0,
             2.0 * (CAST(n AS DOUBLE) * u1 - CAST(sx AS DOUBLE) * u0)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b1
      FROM s1
    ), r AS (
      SELECT t.event_type, t.x, t.y, b1.b0, b1.b1, b1.n,
             CAST(round(1000.0 / (1.0 + exp(-(b1.b0 + b1.b1 * CAST(t.x AS DOUBLE)))))
               AS BIGINT) AS pk
      FROM t JOIN b1 ON b1.event_type = t.event_type
    ), s2 AS (
      SELECT event_type, any_value(b0) AS b0, any_value(b1) AS b1,
             any_value(n) AS n,
             CAST(sum(pk * (1000 - pk)) AS BIGINT) AS a00,
             CAST(sum(pk * (1000 - pk) * x) AS BIGINT) AS a01,
             CAST(sum(pk * (1000 - pk) * x * x) AS BIGINT) AS a11,
             CAST(sum(1000 * y - pk) AS BIGINT) AS g0,
             CAST(sum((1000 * y - pk) * x) AS BIGINT) AS g1
      FROM r GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(round((b0 + 1000.0 * (CAST(a11 AS DOUBLE) * g0 - CAST(a01 AS DOUBLE) * g1)
                       / (CAST(a00 AS DOUBLE) * a11 - CAST(a01 AS DOUBLE) * a01))
                      * 1000000.0) AS BIGINT) AS b0_micro,
           CAST(round((b1 + 1000.0 * (CAST(a00 AS DOUBLE) * g1 - CAST(a01 AS DOUBLE) * g0)
                       / (CAST(a00 AS DOUBLE) * a11 - CAST(a01 AS DOUBLE) * a01))
                      * 1000000000.0) AS BIGINT) AS b1_nano
    FROM s2
    ORDER BY event_type
    """,
)
def q196_logistic_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO Newton/IRLS steps of a per-group logistic regression
    (y = user-parity label, x = event value), trained entirely with
    DataFrame aggregates — the distributed-trainer pattern: each step
    is ONE corpus pass producing a handful of moment statistics per
    group; the driver-side state is the (k-groups x 2) coefficient
    frame, broadcast back for the next pass. q165 (k-means Lloyd) and
    q174 (grouped OLS) are this family's closed-form members; logistic
    IRLS adds the iterative/transcendental case.

    Step 1 from beta = 0 is CLOSED FORM (p = 1/2, W = I/4), so it needs
    no exp at all: beta1 = 2 M^-1 u over exact integer moments. Step 2
    evaluates p_i = sigmoid(b0 + b1 x_i) per row and ROUNDS it to a
    1e-3 grid before the weighted moments (module doctrine — exp is
    not correctly rounded, the grid absorbs the ulp), making every
    step-2 aggregate exact int64; the 2x2 Newton solve is the
    identical IEEE expression in both engines. int64 holds while
    sum(w x^2) = 2.5e5 * x^2 * n fits — x <= 500 here, so n per group
    up to ~1.4e11 rows; past that both engines fail loudly (ANSI
    overflow), never silently.
    """
    t = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value"), 0).cast("long").alias("x"),
        (F.col("user_id") % 2).cast("long").alias("y"),
    )
    s1 = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.lit(2) * F.col("y") - 1).cast("long").alias("u0"),
        F.sum(F.col("x") * (F.lit(2) * F.col("y") - 1)).cast("long").alias("u1"),
    )
    # step 2's moments depend on the row only through (x, y), so the
    # second pass aggregates the corpus to the distinct-(event_type, x,
    # y) frame first (domain-bounded: |x-grid| * 2 rows per group) and
    # reweights each moment by cnt — exact int64 sums are identical,
    # while exp() runs once per DOMAIN VALUE instead of once per row
    # and the broadcast join touches only the tiny frame
    tc = t.groupBy("event_type", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    b1 = s1.select(
        "event_type",
        "n",
        F.expr(
            "2.0 * (CAST(sxx AS DOUBLE) * u0 - CAST(sx AS DOUBLE) * u1)"
            " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        ).alias("b0"),
        F.expr(
            "2.0 * (CAST(n AS DOUBLE) * u1 - CAST(sx AS DOUBLE) * u0)"
            " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        ).alias("b1"),
    )
    r = tc.join(F.broadcast(b1), "event_type").withColumn(
        "pk",
        F.expr(
            "CAST(round(1000.0 / (1.0 + exp(-(b0 + b1 * CAST(x AS DOUBLE)))))"
            " AS BIGINT)"
        ),
    )
    wgt = F.col("pk") * (F.lit(1000) - F.col("pk"))
    res = F.lit(1000) * F.col("y") - F.col("pk")
    s2 = r.groupBy("event_type").agg(
        F.any_value("b0").alias("b0"),
        F.any_value("b1").alias("b1"),
        F.any_value("n").cast("long").alias("n"),
        F.sum(wgt * F.col("cnt")).cast("long").alias("a00"),
        F.sum(wgt * F.col("x") * F.col("cnt")).cast("long").alias("a01"),
        F.sum(wgt * F.col("x") * F.col("x") * F.col("cnt"))
        .cast("long")
        .alias("a11"),
        F.sum(res * F.col("cnt")).cast("long").alias("g0"),
        F.sum(res * F.col("x") * F.col("cnt")).cast("long").alias("g1"),
    )
    return s2.select(
        "event_type",
        "n",
        F.expr(
            "CAST(round((b0 + 1000.0 * (CAST(a11 AS DOUBLE) * g0 - CAST(a01 AS DOUBLE) * g1)"
            " / (CAST(a00 AS DOUBLE) * a11 - CAST(a01 AS DOUBLE) * a01))"
            " * 1000000.0) AS BIGINT)"
        ).alias("b0_micro"),
        F.expr(
            "CAST(round((b1 + 1000.0 * (CAST(a00 AS DOUBLE) * g1 - CAST(a01 AS DOUBLE) * g0)"
            " / (CAST(a00 AS DOUBLE) * a11 - CAST(a01 AS DOUBLE) * a01))"
            " * 1000000000.0) AS BIGINT)"
        ).alias("b1_nano"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q198 — distributed PCA: two power-iteration steps for the top component
# ---------------------------------------------------------------------------

_PCA_S = 1_000_000  # fixed-point scale for vector components


@query(
    "q198_pca_power_iteration",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, i - 1 AS pos,
             CAST(round(embedding[i] * {_PCA_S}) AS BIGINT) AS xq
      FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
           unnest(range(1, len(embedding) + 1)) AS t(i)
    ), s1 AS (
      SELECT vec_id, CAST(sum(xq * 125000) AS BIGINT) // {_PCA_S} AS s
      FROM e GROUP BY vec_id
    ), w1 AS (
      SELECT pos, CAST(sum(e.xq * s1.s) AS BIGINT) AS w
      FROM e JOIN s1 USING (vec_id) GROUP BY pos
    ), m1 AS (SELECT max(abs(w)) AS mx FROM w1),
    v1 AS (
      SELECT pos, CAST(round(CAST(w AS DOUBLE) * {_PCA_S} / mx) AS BIGINT) AS v
      FROM w1 CROSS JOIN m1
    ), s2 AS (
      SELECT vec_id, CAST(sum(e.xq * v1.v) AS BIGINT) // {_PCA_S} AS s
      FROM e JOIN v1 USING (pos) GROUP BY vec_id
    ), w2 AS (
      SELECT pos, CAST(sum(e.xq * s2.s) AS BIGINT) AS w
      FROM e JOIN s2 USING (vec_id) GROUP BY pos
    ), m2 AS (SELECT max(abs(w)) AS mx FROM w2)
    SELECT pos, CAST(round(CAST(w AS DOUBLE) * {_PCA_S} / mx) AS BIGINT) AS v_micro
    FROM w2 CROSS JOIN m2
    ORDER BY pos
    """,
)
def q198_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix via TWO distributed power-iteration steps — the PCA
    building block of embedding diagnostics (anisotropy checks,
    whitening, ABTT postprocessing), run without ever materializing
    the d x d covariance: each step is Xv (one keyed aggregate over
    the exploded (vec_id, pos, xq) frame) followed by X'(Xv) (a second
    aggregate grouped the other way) — O(n d) rows shuffled, never
    O(d^2) per row, and only the d-row direction frame leaves a stage.

    EXACT integer pipeline, no transcendentals and no per-row rounding
    loss anywhere: components quantize once to 1e6 fixed point, every
    dot product is an int64 sum, each step rescales by an integer
    floor-div (`//` / `div` — identical semantics both engines) and
    renormalizes by max|w| (order-independent, unlike an L2 norm's
    sum-of-doubles), so both engines walk bit-identical integer states
    and the two divisions per step are identical IEEE ops. Start
    vector is uniform 0.125 = 1/sqrt(64), exact in binary.
    """
    prepare_session(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # r14 optimization: the exploded (vec_id, pos, xq) frame feeds all
    # four matvec aggregates and the lazy spelling re-ran the scan +
    # explode + quantize chain per use (12 scans in the plan,
    # plans/r14/q198_*_before.txt); materialize it once. w1/w2 are
    # d-row frames each read twice (renormalizer + rescale) whose
    # recompute would re-run a corpus join+aggregate — checkpoint both.
    e = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: F.round(x * _PCA_S, 0).cast("long"))
        ).alias("pos", "xq"),
    ).localCheckpoint()
    s1 = e.groupBy("vec_id").agg(
        F.expr(f"CAST(sum(xq * 125000) AS BIGINT) div {_PCA_S}").alias("s")
    )
    w1 = (
        e.join(s1, "vec_id")
        .groupBy("pos")
        .agg(F.sum(F.col("xq") * F.col("s")).cast("long").alias("w"))
    ).localCheckpoint()
    m1 = w1.agg(F.max(F.abs(F.col("w"))).alias("mx"))
    v1 = w1.crossJoin(F.broadcast(m1)).select(
        "pos",
        F.expr(f"CAST(round(CAST(w AS DOUBLE) * {_PCA_S} / mx) AS BIGINT)").alias("v"),
    )
    s2 = (
        e.join(F.broadcast(v1), "pos")
        .groupBy("vec_id")
        .agg(F.expr(f"CAST(sum(xq * v) AS BIGINT) div {_PCA_S}").alias("s"))
    )
    w2 = (
        e.join(s2, "vec_id")
        .groupBy("pos")
        .agg(F.sum(F.col("xq") * F.col("s")).cast("long").alias("w"))
    ).localCheckpoint()
    m2 = w2.agg(F.max(F.abs(F.col("w"))).alias("mx"))
    return (
        w2.crossJoin(F.broadcast(m2))
        .select(
            "pos",
            F.expr(
                f"CAST(round(CAST(w AS DOUBLE) * {_PCA_S} / mx) AS BIGINT)"
            ).alias("v_micro"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# q199 — Heaps' law fit per source (vocabulary growth vs tokens seen)
# ---------------------------------------------------------------------------


@query(
    "q199_heaps_law",
    oracle="""
    WITH tok AS (
      SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), per_doc AS (
      SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_toks
      FROM tok GROUP BY source, doc_id
    ), firsts AS (
      SELECT source, min(doc_id) AS first_doc
      FROM tok GROUP BY source, tok
    ), new_types AS (
      SELECT source, first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_new
      FROM firsts GROUP BY source, first_doc
    ), d AS (
      SELECT p.source, p.doc_id, p.n_toks, coalesce(n.n_new, 0) AS n_new
      FROM per_doc p LEFT JOIN new_types n
        ON n.source = p.source AND n.doc_id = p.doc_id
    ), c AS (
      SELECT source, doc_id,
             CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
               AS cum_toks,
             CAST(sum(n_new) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
               AS cum_types
      FROM d
    ), pts AS (
      SELECT source,
             CAST(round(ln(cum_toks) * 1000000.0) AS BIGINT) AS lx,
             CAST(round(ln(cum_types) * 1000000.0) AS BIGINT) AS ly
      FROM c
    ), agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(lx) AS BIGINT) AS slx,
             CAST(sum(ly) AS BIGINT) AS sly,
             CAST(sum(lx * ly) AS BIGINT) AS slxy,
             CAST(sum(lx * lx) AS BIGINT) AS slxx
      FROM pts GROUP BY source
    )
    SELECT source, m,
           CAST(round((m * CAST(slxy AS DOUBLE) - CAST(slx AS DOUBLE) * sly)
                      * 1000000.0
                      / (m * CAST(slxx AS DOUBLE) - CAST(slx AS DOUBLE) * slx))
             AS BIGINT) AS beta_micro
    FROM agg
    ORDER BY source
    """,
)
def q199_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent per source: the log-log slope of distinct
    vocabulary size against tokens seen, measured at each document
    boundary in doc_id order. Natural text grows types ~ tokens^0.5;
    a source whose exponent collapses toward 0 is template/duplicate-
    heavy (vocabulary saturates), one near 1 is noise — the
    vocabulary-growth twin of q195's frequency-curve slope, and a
    cheap corpus-health signal a curation pipeline tracks per shard.

    The per-(source, token) first-occurrence doc is ONE hash aggregate
    (vocabulary-bounded); new-type counts land on their first document,
    and both cumulative curves are per-source prefix sums over the
    per-DOCUMENT frame — bounded by document count per source, with the
    window partitioned BY SOURCE (never corpus-wide; for a trillion-doc
    source the same two sums run through operators/ranks.
    grouped_prefix_sum — this fixture-scale spelling keeps the SQL twin
    line-for-line). Logs round to the 1e-6 grid before the OLS moments
    (module doctrine), so the fit is exact int64 + one identical IEEE
    expression.
    """
    d = _t(spark, sf_dir, "documents")
    # n_toks per doc is the token-array length — split() never yields an
    # empty array for non-null text, so size() equals the exploded row
    # count exactly and the per_doc branch needs no explode and no shuffle
    # (the NULL-text guard mirrors unnest's drop of NULL arrays).
    per_doc = d.where(F.col("text").isNotNull()).select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
    )
    tok = d.select(
        "source", "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    firsts = tok.groupBy("source", "tok").agg(F.min("doc_id").alias("first_doc"))
    new_types = firsts.groupBy(
        "source", F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    dd = per_doc.join(new_types, ["source", "doc_id"], "left").select(
        "source",
        "doc_id",
        "n_toks",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = dd.select(
        "source",
        F.sum("n_toks").over(w).cast("long").alias("cum_toks"),
        F.sum("n_new").over(w).cast("long").alias("cum_types"),
    )
    pts = c.select(
        "source",
        F.round(F.log(F.col("cum_toks").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("lx"),
        F.round(F.log(F.col("cum_types").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("ly"),
    )
    return (
        pts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum("lx").cast("long").alias("slx"),
            F.sum("ly").cast("long").alias("sly"),
            F.sum(F.col("lx") * F.col("ly")).cast("long").alias("slxy"),
            F.sum(F.col("lx") * F.col("lx")).cast("long").alias("slxx"),
        )
        .select(
            "source",
            "m",
            F.expr(
                "CAST(round((m * CAST(slxy AS DOUBLE) - CAST(slx AS DOUBLE) * sly)"
                " * 1000000.0"
                " / (m * CAST(slxx AS DOUBLE) - CAST(slx AS DOUBLE) * slx))"
                " AS BIGINT)"
            ).alias("beta_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q201 — A-ES weighted sampling without replacement (top-k per stratum)
# ---------------------------------------------------------------------------

_AES_K = 5        # sample size per stratum
_AES_SALTS = 32   # local top-k fan-in width (the scale knob)


@query(
    "q201_weighted_sample_aes",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             CAST(round(
               ln(CAST(CAST(concat('0x', substr(md5('aes:' || doc_id::VARCHAR), 1, 8))
                    AS BIGINT) + 1 AS DOUBLE) / 4294967297.0)
               / n_chars * 1000000000.0) AS BIGINT) AS lk_nano
      FROM documents WHERE n_chars > 0
    ), ranked AS (
      SELECT source, doc_id, n_chars, lk_nano,
             row_number() OVER (PARTITION BY source
                                ORDER BY lk_nano DESC, doc_id) AS rnk
      FROM keyed QUALIFY rnk <= {_AES_K}
    )
    SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, lk_nano
    FROM ranked
    ORDER BY source, rnk
    """,
)
def q201_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=5 per source, by the
    Efraimidis-Spirakis A-ES scheme: each row draws u from its own
    md5 hash and ranks by key u^(1/w) (equivalently ln(u)/w) — the
    top-k keys ARE a weighted sample without replacement (here w =
    n_chars: longer documents proportionally likelier). Deterministic
    end to end: u is an exact rational of the hash, the single ln
    rounds to a 1e-9 grid before ranking (module doctrine), and ties
    break by doc_id — re-running a 100 TB job reproduces the SAME
    sample, the property RNG-based sampling cannot give.

    The top-k-per-stratum is computed WITHOUT a stratum-sized window
    task: a salted local pass takes the top k within each of 32
    hash-salt slices of a source (window partitioned by (source,
    salt)), and the global pass re-ranks only the <= 32k survivors per
    source — exact (any global top-k row is top-k within its slice),
    with per-task state bounded by slice size at any corpus scale. The
    oracle is the unsalted single-window spelling; salting is
    invisible to the result.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = d.select(
        "source",
        "doc_id",
        "n_chars",
        # the +1'd hash CASTs to DOUBLE before the decimal literal
        # divides it (house decimal-literal rule; Spark ANSI would
        # otherwise evaluate BIGINT / DECIMAL in decimal arithmetic)
        F.expr(
            "CAST(round("
            " ln(CAST(CAST(conv(substring(md5(concat('aes:', CAST(doc_id AS STRING))), 1, 8),"
            "           16, 10) AS BIGINT) + 1 AS DOUBLE) / 4294967297.0)"
            " / n_chars * 1000000000.0) AS BIGINT)"
        ).alias("lk_nano"),
        F.pmod(F.xxhash64("doc_id"), F.lit(_AES_SALTS)).alias("salt"),
    )
    w_local = Window.partitionBy("source", "salt").orderBy(
        F.col("lk_nano").desc(), F.col("doc_id")
    )
    survivors = (
        keyed.withColumn("lrnk", F.row_number().over(w_local))
        .filter(F.col("lrnk") <= _AES_K)
        .drop("lrnk", "salt")
    )
    w_global = Window.partitionBy("source").orderBy(
        F.col("lk_nano").desc(), F.col("doc_id")
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rnk") <= _AES_K)
        .select("source", "rnk", "doc_id", "n_chars", "lk_nano")
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# q203 — conditional bigram entropy per source (text predictability)
# ---------------------------------------------------------------------------


@query(
    "q203_conditional_entropy",
    oracle="""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT source, t[i] AS a, t[i+1] AS b
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ), cab AS (
      SELECT source, a, b, CAST(count(*) AS BIGINT) AS c_ab
      FROM bg GROUP BY source, a, b
    ), ca AS (
      SELECT source, a, CAST(sum(c_ab) AS BIGINT) AS c_a
      FROM cab GROUP BY source, a
    ), terms AS (
      SELECT cab.source,
             cab.c_ab,
             CAST(round(cab.c_ab * (ln(cab.c_ab) - ln(ca.c_a)) * 1000000.0)
               AS BIGINT) AS term
      FROM cab JOIN ca ON ca.source = cab.source AND ca.a = cab.a
    )
    SELECT source,
           CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
           CAST(round(CAST(-sum(term) AS DOUBLE) / sum(c_ab)) AS BIGINT)
             AS h_micro_nats
    FROM terms GROUP BY source
    ORDER BY source
    """,
)
def q203_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional word-bigram entropy H(next | current) per source, in
    micro-nats — the predictability of a source's text: templated or
    machine-generated feeds sit near 0 (next word determined by the
    previous), natural prose runs several nats. Pairs with q129's
    marginal token-length entropy and q175's model-based NLL as the
    information-theoretic corner of the corpus-QA battery.

    H(B|A) = -(1/N) * sum over bigrams of c_ab * (ln c_ab - ln c_a),
    which needs only the distinct-bigram count frame (vocabulary^2
    bounded, never row count): one hash aggregate to (source, a, b),
    a second to the (source, a) margins, one equi-join, then each
    term's single transcendental difference rounds to the 1e-6 grid
    before the exact int64 sum (module doctrine). The final division
    is one identical IEEE op per source.
    """
    d = _t(spark, sf_dir, "documents")
    bg = (
        d.select("source", tokens(F.col("text")).alias("t"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array()"
                    " ELSE transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS a, t[i+1] AS b))"
                    " END"
                )
            ).alias("p"),
        )
        .select("source", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    cab = bg.groupBy("source", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    # the (source, a) margin is a window sum over the distinct-bigram
    # frame — same values as the old re-aggregate + join-back, but cab
    # (and its corpus explode) is computed ONCE with a single consumer
    terms = cab.withColumn(
        "c_a",
        F.sum("c_ab").over(Window.partitionBy("source", "a")).cast("long"),
    ).select(
        "source",
        "c_ab",
        F.expr(
            "CAST(round(c_ab * (ln(CAST(c_ab AS DOUBLE)) - ln(CAST(c_a AS DOUBLE)))"
            " * 1000000.0) AS BIGINT)"
        ).alias("term"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.sum("c_ab").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(round(CAST(-sum(term) AS DOUBLE) / sum(c_ab)) AS BIGINT)"
            ).alias("h_micro_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q205 — per-document bigram perplexity under a corpus-trained LM (round 9)
# ---------------------------------------------------------------------------


@query(
    "q205_bigram_perplexity",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS a, t[i+1] AS b
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ), dcnt AS (
      SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, a, b
    ), cab AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c_ab FROM dcnt GROUP BY a, b
    ), ca AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a
    ), v AS (
      SELECT CAST(count(DISTINCT b) AS BIGINT) AS vsz FROM cab
    )
    SELECT dcnt.doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(round(
             CAST(sum(cnt * CAST(round(
               ln(CAST(ca.c_a + v.vsz AS DOUBLE) / (cab.c_ab + 1)) * 1000000.0)
               AS BIGINT)) AS DOUBLE) / sum(cnt)) AS BIGINT) AS nll_micro_nats
    FROM dcnt
    JOIN cab ON cab.a = dcnt.a AND cab.b = dcnt.b
    JOIN ca ON ca.a = dcnt.a
    CROSS JOIN v
    GROUP BY dcnt.doc_id
    ORDER BY dcnt.doc_id
    """,
)
def q205_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood (micro-nats/bigram)
    under an add-one-smoothed bigram model trained on the WHOLE corpus
    — the classic LM-based quality filter (CCNet/KenLM-style): text far
    from the corpus distribution (boilerplate, other languages, noise)
    scores high and gets cut. Complements q175's fixed character model
    (here the model is induced from the data itself) and q203's
    corpus-level entropy (here each DOCUMENT is scored).

    NLL(doc) = (1/N_d) * sum over doc bigram types of
    cnt * ln((c_a + V) / (c_ab + 1)) — add-one smoothing keeps unseen
    continuations finite and every factor a corpus-level integer.

    Scale shape: the per-doc bigram-type frame is corpus-linear with
    tiny rows; the model frames (c_ab, c_a, V) are vocabulary²-bounded
    — never row-bounded — so the two model joins broadcast at any
    corpus size once the vocabulary saturates (Heaps' law, q199). The
    single transcendental rounds to the 1e-6 grid per DISTINCT (a, b)
    BEFORE the exact int64 cnt-weighted sum (module doctrine), and the
    per-doc division is one IEEE op on identical operands."""
    # spread() the single-file test scan under the bigram explode (the
    # query's map-heavy stage) — 1.68 s -> 1.34 s at sf0.1; scale-gated
    d = spread(_t(spark, sf_dir, "documents"))
    bg = (
        d.select("doc_id", tokens(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array()"
                    " ELSE transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS a, t[i+1] AS b))"
                    " END"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    # r14 optimization: dcnt feeds the model derivation AND the scoring
    # join, cab feeds three branches (c_a, V, scoring) — materialize
    # each once instead of re-running the corpus explode + aggregate
    # per branch.
    dcnt = bg.groupBy("doc_id", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint()
    cab = dcnt.groupBy("a", "b").agg(
        F.sum("cnt").cast("long").alias("c_ab")
    ).localCheckpoint()
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    v = cab.agg(F.countDistinct("b").cast("long").alias("vsz"))
    scored = (
        dcnt.join(cab, ["a", "b"])
        .join(ca, ["a"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "cnt",
            F.expr(
                "cnt * CAST(round("
                "ln(CAST(c_a + vsz AS DOUBLE) / (c_ab + 1)) * 1000000.0) AS BIGINT)"
            ).alias("term"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(round(CAST(sum(term) AS DOUBLE) / sum(cnt)) AS BIGINT)"
            ).alias("nll_micro_nats"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q211 — multinomial Naive-Bayes source classifier, confusion matrix (round 9)
# ---------------------------------------------------------------------------


@query(
    "q211_naive_bayes_confusion",
    oracle="""
    WITH dtok AS (
      SELECT doc_id, source AS actual, tok, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, source, tok
    ), csw AS (
      SELECT actual AS s, tok, CAST(sum(cnt) AS BIGINT) AS c
      FROM dtok GROUP BY actual, tok
    ), ts AS (
      SELECT s, CAST(sum(c) AS BIGINT) AS tt FROM csw GROUP BY s
    ), v AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz FROM csw
    ), pri AS (
      SELECT source AS s, CAST(count(*) AS BIGINT) AS ns FROM documents
      GROUP BY source
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
    ), words AS (
      SELECT DISTINCT tok FROM csw
    ), model AS (
      SELECT ts.s, w.tok, coalesce(csw.c, 0) AS c0, ts.tt
      FROM words w CROSS JOIN ts
      LEFT JOIN csw ON csw.s = ts.s AND csw.tok = w.tok
    ), cost AS (
      SELECT d.doc_id, d.actual, m.s,
             CAST(sum(d.cnt * CAST(round(
               ln(CAST(m.tt + v.vsz AS DOUBLE) / (m.c0 + 1)) * 1000000.0)
               AS BIGINT)) AS BIGINT)
             + CAST(round(ln(CAST(n.nd AS DOUBLE) / pri.ns) * 1000000.0)
               AS BIGINT) AS nll
      FROM dtok d
      JOIN model m ON m.tok = d.tok
      JOIN pri ON pri.s = m.s
      CROSS JOIN v CROSS JOIN n
      GROUP BY d.doc_id, d.actual, m.s, pri.ns, n.nd
    ), pred AS (
      SELECT doc_id, actual, s AS pred,
             row_number() OVER (PARTITION BY doc_id ORDER BY nll, s) AS rnk
      FROM cost QUALIFY rnk = 1
    )
    SELECT actual, pred, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY actual, pred
    ORDER BY actual, pred
    """,
)
def q211_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one multinomial Naive Bayes trained on (source → tokens),
    self-classified, reported as the sources×sources confusion matrix —
    the distributed form of the fastText-style source/quality router
    (q193's learned sibling: q193 scores with FIXED hashed weights,
    this TRAINS the weights from the corpus in two aggregates). The
    confusion matrix is the curation artifact: an off-diagonal block
    says two sources are stylistically interchangeable (candidate for
    mixture re-weighting, q109), a strong diagonal says source labels
    carry real signal.

    Shapes, biggest first: the doc-term frame is corpus-linear and its
    model join fans out by |sources| (a fixed small constant); the
    model scaffold (every word × every source, zero counts restored —
    absent words must still pay the smoothed ln(T+V) penalty) is
    vocab×sources-bounded; the argmin window rides |sources| rows per
    document. Training is two map-side-combinable aggregates. Per-
    (word, source) logs round to the 1e-6 grid before the exact
    cnt-weighted int64 sum (module doctrine); the class-prior term is
    one more rounded log, added as an exact int."""
    d = _t(spark, sf_dir, "documents")
    dtok = (
        d.select(
            "doc_id",
            F.col("source").alias("actual"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("doc_id", "actual", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    csw = dtok.groupBy(F.col("actual").alias("s"), "tok").agg(
        F.sum("cnt").cast("long").alias("c")
    )
    ts = csw.groupBy("s").agg(F.sum("c").cast("long").alias("tt"))
    v = csw.agg(F.countDistinct("tok").cast("long").alias("vsz"))
    pri = d.groupBy(F.col("source").alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    words = csw.select("tok").distinct()
    model = (
        words.crossJoin(F.broadcast(ts))
        .join(csw, ["s", "tok"], "left")
        .select("s", "tok", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c0"), "tt")
    )
    cost = (
        dtok.join(model, "tok")
        .join(F.broadcast(pri), "s")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(nd))
        .groupBy("doc_id", "actual", "s", "ns", "nd")
        .agg(
            F.expr(
                "CAST(sum(cnt * CAST(round("
                "ln(CAST(tt + vsz AS DOUBLE) / (c0 + 1)) * 1000000.0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("tok_nll")
        )
        .select(
            "doc_id",
            "actual",
            "s",
            F.expr(
                "tok_nll + CAST(round(ln(CAST(nd AS DOUBLE) / ns) * 1000000.0)"
                " AS BIGINT)"
            ).alias("nll"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("nll", "s")
    pred = (
        cost.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("actual", F.col("s").alias("pred"))
    )
    return (
        pred.groupBy("actual", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("actual", "pred")
    )


# ---------------------------------------------------------------------------
# q216 — Kneser-Ney bigram model: per-source NLL (round 9)
# ---------------------------------------------------------------------------

# interpolated KN probability over columns c_ab/c_a/n1a/n1b/bt — the
# identical text in Spark SQL and DuckDB; every int operand CASTs to
# DOUBLE before a decimal literal touches it (house rule)
_KN_P = (
    "((greatest(CAST(c_ab AS DOUBLE) - 0.75, CAST(0 AS DOUBLE))"
    " + 0.75 * CAST(n1a AS DOUBLE) * (CAST(n1b AS DOUBLE) / bt)) / c_a)"
)


@query(
    "q216_kneser_ney_nll",
    oracle=f"""
    WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT source, t[i] AS a, t[i+1] AS b
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ), scnt AS (
      SELECT source, a, b, CAST(count(*) AS BIGINT) AS cnt
      FROM bg GROUP BY source, a, b
    ), cab AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c_ab FROM scnt GROUP BY a, b
    ), ca AS (
      SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a
    ), n1a AS (
      SELECT a, CAST(count(*) AS BIGINT) AS n1a FROM cab GROUP BY a
    ), n1b AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n1b FROM cab GROUP BY b
    ), bt AS (
      SELECT CAST(count(*) AS BIGINT) AS bt FROM cab
    ), model AS (
      SELECT cab.a, cab.b,
             CAST(round(ln({_KN_P}) * 1000000.0) AS BIGINT) AS lp
      FROM cab JOIN ca ON ca.a = cab.a
               JOIN n1a ON n1a.a = cab.a
               JOIN n1b ON n1b.b = cab.b
               CROSS JOIN bt
    )
    SELECT scnt.source,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           CAST(round(CAST(-sum(cnt * lp) AS DOUBLE) / sum(cnt)) AS BIGINT)
             AS kn_nll_micro
    FROM scnt JOIN model ON model.a = scnt.a AND model.b = scnt.b
    GROUP BY scnt.source
    ORDER BY scnt.source
    """,
)
def q216_kneser_ney_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean NLL under an interpolated Kneser-Ney bigram
    model (d = 0.75) trained on the whole corpus — the smoothing that
    actually ships in n-gram LM filters (KenLM/CCNet): where q205's
    add-one flattens probability onto raw counts, KN discounts every
    observed bigram by a fixed d and backs off to the CONTINUATION
    probability N1+(·,b)/|bigrams| — "how many contexts does b follow"
    — so boilerplate tokens that appear often in ONE context stop
    looking probable in all of them. Sources whose text the KN model
    finds surprising are the cross-entropy outliers a curation pass
    quarantines.

    P(b|a) = (max(c_ab − d, 0) + d·N1+(a,·)·(N1+(·,b)/B)) / c_a: every
    factor is an integer count off the SAME vocab²-bounded distinct-
    bigram frame (N1+ margins are row counts of it; B its total), so
    the model costs three hash aggregates beyond q205's. The single ln
    per distinct bigram rounds to the 1e-6 grid before the exact
    cnt-weighted int64 sums; scoring joins ride (a, b) exactly as
    q205. Per-source output (sources-bounded), one IEEE division
    each."""
    d = _t(spark, sf_dir, "documents")
    bg = (
        d.select("source", tokens(F.col("text")).alias("t"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array()"
                    " ELSE transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS a, t[i+1] AS b))"
                    " END"
                )
            ).alias("p"),
        )
        .select("source", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    scnt = bg.groupBy("source", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cab = scnt.groupBy("a", "b").agg(F.sum("cnt").cast("long").alias("c_ab"))
    ca = cab.groupBy("a").agg(F.sum("c_ab").cast("long").alias("c_a"))
    n1a = cab.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("n1a"))
    n1b = cab.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    bt = cab.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    model = (
        cab.join(ca, "a")
        .join(n1a, "a")
        .join(n1b, "b")
        .crossJoin(F.broadcast(bt))
        .select(
            "a",
            "b",
            F.expr(f"CAST(round(ln({_KN_P}) * 1000000.0) AS BIGINT)").alias("lp"),
        )
    )
    return (
        scnt.join(model, ["a", "b"])
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(round(CAST(-sum(cnt * lp) AS DOUBLE) / sum(cnt)) AS BIGINT)"
            ).alias("kn_nll_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q231 — DSIR-style importance scoring (hashed n-gram domain selection)
# ---------------------------------------------------------------------------

_DSIR_B = 2048        # hashed feature buckets
_DSIR_TARGET = "src0"  # in-fixture stand-in for the target domain slice
_DSIR_TOP = 128        # selection budget


@query(
    "q231_dsir_importance",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             ({{md5l}}) % {_DSIR_B} AS h
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ), ct AS (
      SELECT h, CAST(count(*) AS BIGINT) AS c_t FROM tok
      WHERE source = '{_DSIR_TARGET}' GROUP BY h
    ), cc AS (
      SELECT h, CAST(count(*) AS BIGINT) AS c_c FROM tok GROUP BY h
    ), n AS (
      SELECT CAST((SELECT count(*) FROM tok WHERE source = '{_DSIR_TARGET}') AS BIGINT) AS n_t,
             CAST((SELECT count(*) FROM tok) AS BIGINT) AS n_c
    ), model AS (
      SELECT cc.h,
             CAST(round(ln(CAST(coalesce(ct.c_t, 0) + 1 AS DOUBLE)
                           * (n.n_c + {_DSIR_B})
                           / (CAST(cc.c_c + 1 AS DOUBLE) * (n.n_t + {_DSIR_B})))
                        * 1000000.0) AS BIGINT) AS lr_micro
      FROM cc LEFT JOIN ct ON cc.h = ct.h CROSS JOIN n
    ), scored AS (
      SELECT tok.doc_id, tok.source,
             CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(model.lr_micro) AS BIGINT) AS logw_micro
      FROM tok JOIN model ON tok.h = model.h
      GROUP BY tok.doc_id, tok.source
    )
    SELECT doc_id, source, n_toks, logw_micro,
           CAST(row_number() OVER (ORDER BY logw_micro DESC, doc_id) AS BIGINT) AS rank
    FROM scored
    ORDER BY logw_micro DESC, doc_id
    LIMIT {_DSIR_TOP}
    """.format(md5l="('0x' || substr(md5(tok), 1, 15))::BIGINT"),
)
def q231_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    — the published recipe for "give me raw-corpus documents that look
    like my target domain": estimate target and corpus distributions
    over HASHED n-gram features (here unigrams into ``_DSIR_B``
    buckets, the q193 hashing trick, so both models are fixed-size
    regardless of vocabulary), score every document by its importance
    log-weight log p_target(x)/p_corpus(x) = Σ_tokens lr(h(tok)), and
    keep the top ``_DSIR_TOP``. The fixture's ``{_DSIR_TARGET}`` slice
    stands in for the target domain; with a real target corpus only the
    model CTE's input changes.

    Determinism is the q205 micro-nats grid: each bucket's smoothed
    log-ratio ln((c_t+1)(N_c+B) / ((c_c+1)(N_t+B))) is rounded to
    integer micro-nats ONCE, per-document scores are then pure integer
    sums — order-independent, exact across engines. (DSIR proper
    resamples with Gumbel noise; the deterministic top-k is the
    RNG-free equivalent the audit trail wants, same as q135/q151.)

    Scale shape: the model is at most B = {_DSIR_B} rows — broadcast to
    the token stream (one scan of the corpus to build counts, one to
    score; both map-side-combinable hash aggregates). Selection is
    TakeOrdered (top-k per partition then a k-sized driver merge),
    never a global sort. At 100 TB the model build is a metadata-cheap
    side pass and re-scoring against a NEW target domain reuses the
    cached corpus counts — only the target CTE recomputes."""
    prepare_session(spark)
    # spread(): the token explode + md5 runs twice (counts pass,
    # scoring join) off the single-partition test scan — 1.59 s ->
    # 1.34 s at sf0.1; scale-gated
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).select(
        "doc_id", "source", F.pmod(md5_long(F.col("tok")), F.lit(_DSIR_B)).alias("h")
    )
    # ONE counts pass builds both models: c_c per bucket plus the
    # target-slice c_t as a filtered count in the same hash aggregate
    # (c_t = 0 where the old left join found no target row — identical
    # through the +1 smoothing), and the totals n_c/n_t are the B-row
    # frame's own sums — 3 corpus scans fold into this single one.
    counts = (
        tok.groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_c"),
            F.count_if(F.col("source") == _DSIR_TARGET).cast("long").alias("c_t"),
        )
        # at most _DSIR_B rows; materialized once so the totals pass and
        # the model projection don't each re-run the corpus explode
        .localCheckpoint()
    )
    n = counts.agg(
        F.sum("c_c").cast("long").alias("n_c"),
        F.sum("c_t").cast("long").alias("n_t"),
    )
    model = counts.crossJoin(F.broadcast(n)).select(
        "h",
        F.round(
            F.log(
                (F.col("c_t") + 1).cast("double")
                * (F.col("n_c") + _DSIR_B)
                / ((F.col("c_c") + 1).cast("double") * (F.col("n_t") + _DSIR_B))
            )
            * 1000000.0
        )
        .cast("long")
        .alias("lr_micro"),
    )
    scored = (
        tok.join(F.broadcast(model), "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("lr_micro").cast("long").alias("logw_micro"),
        )
    )
    top = scored.orderBy(F.col("logw_micro").desc(), "doc_id").limit(_DSIR_TOP)
    # rank the bounded top-k slice only (W is _DSIR_TOP rows — the
    # single-partition window never sees the corpus)
    w = Window.orderBy(F.col("logw_micro").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).orderBy("rank")
