"""Corpus-indexing & cluster-assignment queries (north-star extension).

The retrieval-side half of a training-data pipeline: once a corpus is
deduped and quality-filtered, it gets *indexed* — inverted token index
for lexical search, global n-gram statistics for contamination/vocab
work, per-source accounting for mixture weighting, and embedding →
centroid assignment for semantic clustering (the SemDeDup/cluster-
balance shape). Reference scope: the reference engine feeds an
Elasticsearch full-text index (ElasticsearchEmbeddedNodeSink.java:47-66)
— building the inverted index IS its sink's job; here it is a
first-class relational operator instead.

Scale notes (100 TB):

* the inverted index is ONE explode + ONE hash-shuffle on token;
  partial aggregation (ObjectHashAggregate) combines map-side, so the
  shuffle carries (token, partial-postings), not raw (token, doc_id)
  rows. Hot tokens (stopwords) make posting lists unbounded — the
  production guard is the same df cutoff used here (drop df < k keeps
  the long tail; a df *ceiling* or per-token top-k window caps the
  head; postings shard by (token, bucket) beyond that).
* n-gram counting is explode → partial+final count: the classic
  word-count shape, shuffle carries one row per *distinct* gram per
  partition.
* centroid assignment trains nothing on the driver: per-dimension
  means are a (label, pos) hash aggregate — k×dim rows total — and the
  reassembled centroid table (k rows) broadcasts to the scoring join,
  so the corpus side is a single narrow pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import tokens
from flink_mingo_tail_spark.operators.similarity import SQL_COSINE, cosine, dot, l2_norm
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return spread(load_table(spark, sf_dir, "documents"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return e.withColumn("embedding", F.col("embedding").cast("array<double>"))


_MIN_DF = 2  # drop hapax tokens: the long-tail guard (see module notes)


@query(
    "q100_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS doc_freq,
           string_agg(doc_id, ',' ORDER BY doc_id) AS postings
    FROM toks
    GROUP BY token
    HAVING count(*) >= {_MIN_DF}
    ORDER BY token
    LIMIT 400
    """,
)
def q100_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted token index: token -> document frequency + sorted
    posting list (serialized; the driver contract forbids array
    outputs). Distinct-per-doc tokens exploded once, one shuffle on
    token with map-side partial collect; df cutoff bounds the output."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("postings"),
        )
        .filter(F.col("doc_freq") >= _MIN_DF)
        .orderBy("token")
        .limit(400)
    )


@query(
    "q101_top_trigrams",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t, len(string_split(text, ' ')) AS ln
        FROM documents
    ), grams AS (
        SELECT unnest(list_transform(range(1, ln - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
        FROM toks WHERE ln >= 3
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n
    FROM grams
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 100
    """,
)
def q101_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k word trigrams — the corpus-statistics pass behind
    contamination checks and vocabulary building. Grams are built
    in-expression (no materialization); count is the word-count shape
    with full partial aggregation; ties broken by gram for a stable
    top-k."""
    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    toks = d.select(t.alias("t"), F.size(t).alias("ln"))
    gram_expr = F.expr(
        "transform(sequence(1, ln - 2), i -> concat_ws(' ', "
        "element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))"
    )
    return (
        toks.filter(F.col("ln") >= 3)
        .select(F.explode(gram_expr).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(100)
    )


@query(
    "q102_source_stats",
    oracle="""
    WITH toks AS (
        SELECT source, lang, n_chars, len(string_split(text, ' ')) AS n_toks
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_chars) AS BIGINT) / count(*) AS avg_chars,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens
    FROM toks
    GROUP BY source
    ORDER BY source
    """,
)
def q102_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus accounting (doc/char/token counts, language
    spread) — the bookkeeping behind data-mixture weighting. One hash
    aggregate; distinct-lang is a tiny per-group set. Long sums are
    exact; avg is a single final IEEE division of exact integers."""
    d = _docs(spark, sf_dir)
    return (
        d.select("source", "lang", "n_chars", F.size(tokens(F.col("text"))).alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
            F.sum("n_toks").alias("total_tokens"),
        )
        .orderBy("source")
    )


_BUCKET = 100  # histogram bucket width in chars


@query(
    "q103_length_histogram",
    oracle=f"""
    SELECT CAST(floor(n_chars / {_BUCKET}) AS BIGINT) * {_BUCKET} AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q103_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (fixed-width buckets) — the length
    profile every corpus cut (truncation, packing, filter thresholds)
    is read off. Pure map + tiny hash aggregate; bucket count is
    bounded by max(n_chars)/width regardless of corpus size."""
    d = _docs(spark, sf_dir)
    bucket = (F.floor(F.col("n_chars") / _BUCKET) * _BUCKET).cast("long")
    return (
        d.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )


_CENT_SCALE = 1_000_000  # fixed-point scale for exact centroid means


@query(
    "q104_centroid_assign",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ), ex AS (
        SELECT vec_id, label, i AS pos, emb[i] AS v
        FROM e, unnest(range(1, len(emb) + 1)) AS t(i)
    ), cent AS (
        SELECT label, pos,
               CAST(sum(CAST(round(v * {_CENT_SCALE}) AS BIGINT)) AS BIGINT)
                   / (count(*) * {_CENT_SCALE}.0) AS c
        FROM ex GROUP BY label, pos
    ), cv AS (
        SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round({SQL_COSINE.format(a="e.emb", b="cv.cv")}, 5) AS cos_to_centroid
    FROM e JOIN cv USING (label)
    ORDER BY vec_id
    """,
)
def q104_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding -> cluster-centroid assignment score (SemDeDup /
    cluster-balance shape): per-label elementwise mean centroid, then
    each vector's cosine to its own centroid — low scores are cluster
    outliers, near-1 ties are semantic duplicates.

    Determinism: per-dimension means use the scaled-long exact-sum
    pattern (functions/deterministic.py) so centroids are bit-identical
    across engines; the cosine is a sequential fold on both sides.
    Scale: the (label, pos) aggregate is k*dim rows AFTER map-side
    partial aggregation (the posexplode row amplification never crosses
    the wire), the centroid table k rows -> broadcast join; the corpus
    pass is narrow. (A 64-wide one-agg-per-dim variant was measured
    ~1.4x SLOWER at sf0.1 — per-row array extraction x64 + a 65-buffer
    agg loses to explode + tight hash agg — so this shape is kept.)"""
    e = _emb(spark, sf_dir)
    ex = e.select("vec_id", "label", F.posexplode("embedding").alias("pos0", "v"))
    cent = ex.groupBy("label", "pos0").agg(
        (
            F.sum(F.round(F.col("v") * _CENT_SCALE, 0).cast("long"))
            / (F.count(F.lit(1)) * F.lit(float(_CENT_SCALE)))
        ).alias("c")
    )
    cv = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    # r15: carry each centroid's L2 norm in the broadcast frame (the r14
    # norm-carrying lever): the in-place cosine() evaluated THREE 64-dim
    # folds per corpus row, two of which (norm of cv, and cv's dot with
    # itself inside it) are per-LABEL constants. ncv is the identical
    # l2_norm subtree over the same cv values, and the division tree
    # round(dot/(ne*ncv), 5) matches cosine()'s operand order — values
    # bit-identical, one dot + one per-row norm instead of three folds
    # on the corpus-sized term.
    cvn = cv.withColumn("ncv", l2_norm(F.col("cv")))
    return (
        e.join(F.broadcast(cvn), "label")
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("embedding"), F.col("cv"))
                / (l2_norm(F.col("embedding")) * F.col("ncv")),
                5,
            ).alias("cos_to_centroid"),
        )
        .orderBy("vec_id")
    )


_PACK_BUDGET = 600  # token budget per packed sequence bin
_PACK_SHARDS = 16  # independent packing shards (see scale note)


@query(
    "q105_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, doc_id % {_PACK_SHARDS} AS pack_shard,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
    ), cum AS (
        SELECT doc_id, pack_shard, n_toks,
               CAST(sum(n_toks) OVER (PARTITION BY pack_shard ORDER BY doc_id) AS BIGINT) AS cum_toks
        FROM toks
    )
    SELECT doc_id, pack_shard, CAST(n_toks AS BIGINT) AS n_toks,
           CAST((cum_toks - n_toks) // {_PACK_BUDGET} AS BIGINT) AS bin
    FROM cum
    ORDER BY doc_id
    """,
)
def q105_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed token-budget bins (the
    pre-training batch-packing pass). Docs are packed in doc_id order by
    running token total; a doc's bin is its starting offset / budget.

    Scale shape: packing needs NO global order — bins only have to be
    dense within a shard — so the running sum is windowed over
    ``doc_id % {_PACK_SHARDS}`` shards, keeping parallelism at the
    shard count instead of a single global-sort task. At 100 TB the
    shard key becomes hash(doc_id) % (executors*4) and each bin id is
    (shard, local_bin); packing quality is identical."""
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    t = tokens(F.col("text"))
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("pack_shard"),
        F.size(t).cast("long").alias("n_toks"),
    )
    w = Window.partitionBy("pack_shard").orderBy("doc_id")
    cum = toks.withColumn("cum_toks", F.sum("n_toks").over(w))
    return cum.select(
        "doc_id",
        "pack_shard",
        "n_toks",
        F.floor((F.col("cum_toks") - F.col("n_toks")) / _PACK_BUDGET).alias("bin"),
    ).orderBy("doc_id")


@query(
    "q106_split_assign",
    oracle="""
    WITH assigned AS (
        SELECT lang, len(string_split(text, ' ')) AS n_toks,
               CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 1 THEN 'val'
                    WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 2 THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
)
def q106_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-independent hash
    (98/1/1): the split a doc lands in is a pure function of its id, so
    re-runs, backfills and multi-team pipelines agree without
    coordination. Zero shuffle for the assignment; one tiny aggregate
    here to audit the split balance."""
    from flink_mingo_tail_spark.operators.dedup import md5_long

    d = _docs(spark, sf_dir)
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 1, F.lit("val")).when(bucket < 2, F.lit("test")).otherwise(F.lit("train"))
    )
    return (
        d.select(split.alias("split"), "lang", F.size(tokens(F.col("text"))).alias("n_toks"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


_CHUNK = 40  # tokens per chunk
_STRIDE = 30  # chunk stride (overlap = _CHUNK - _STRIDE)


@query(
    "q107_chunk_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS ln
        FROM documents WHERE doc_id < 100
    ), starts AS (
        SELECT doc_id, t, s
        FROM toks, unnest(range(1, greatest(ln - {_CHUNK - 1}, 1) + 1, {_STRIDE})) AS r(s)
    )
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(t[s:s + {_CHUNK - 1}]) AS BIGINT) AS n_chunk_toks,
           array_to_string(t[s:s + {_CHUNK - 1}], ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
)
def q107_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size {chunk}, stride {stride})
    — the retrieval/RAG indexing pass and the long-doc training cut.
    Chunk starts are generated in-expression (sequence + explode), the
    slice itself never copies the full token array more than once, and
    the whole pass is narrow (no shuffle; the ORDER BY exists for the
    oracle hash only). Trailing sub-stride tails beyond the last full
    window start are the documented convention of the sliding cut."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    t = tokens(F.col("text"))
    toks = d.select("doc_id", t.alias("t"), F.size(t).alias("ln"))
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(F.expr(f"sequence(1, greatest(ln - {_CHUNK - 1}, 1), {_STRIDE})")).alias("s"),
    )
    return starts.select(
        "doc_id",
        F.expr(f"(s - 1) div {_STRIDE}").cast("long").alias("chunk_idx"),
        F.expr(f"size(slice(t, s, {_CHUNK}))").cast("long").alias("n_chunk_toks"),
        F.expr(f"concat_ws(' ', slice(t, s, {_CHUNK}))").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


_BM25_TERMS = ("spark", "join", "window")  # fixed lexical query
_BM25_K1 = 1.2
_BM25_B = 0.75


def _sql_bm25_term(t: str) -> str:
    """One term's BM25 contribution — written in EXACTLY the operation
    order the Spark expression uses, so both engines execute the same
    IEEE double sequence (int tf/df/dl; ln of the same double)."""
    tf = f"len(list_filter(string_split(s.text, ' '), x -> x = '{t}'))"
    idf = f"ln((st.n_docs - st.df_{t} + 0.5) / (st.df_{t} + 0.5) + 1.0)"
    norm = (
        f"({tf} * {_BM25_K1 + 1}) / "
        f"({tf} + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * (s.dl / (st.sum_dl / st.n_docs))))"
    )
    return f"{idf} * ({norm})"


@query(
    "q121_bm25_scoring",
    oracle=f"""
    WITH stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl,
               {', '.join(
                   f"CAST(sum(CASE WHEN list_contains(string_split(text, ' '), '{t}') "
                   f"THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in _BM25_TERMS)}
        FROM documents
    ), s AS (
        SELECT doc_id, text, len(string_split(text, ' ')) AS dl FROM documents
    )
    SELECT s.doc_id,
           {', '.join(
               f"len(list_filter(string_split(s.text, ' '), x -> x = '{t}')) AS tf_{t}"
               for t in _BM25_TERMS)},
           CAST(round(({' + '.join(_sql_bm25_term(t) for t in _BM25_TERMS)}) * 1000000.0)
                AS BIGINT) AS bm25_micro
    FROM s CROSS JOIN stats st
    WHERE {' + '.join(
        f"len(list_filter(string_split(s.text, ' '), x -> x = '{t}'))" for t in _BM25_TERMS)} > 0
    ORDER BY bm25_micro DESC, s.doc_id
    LIMIT 20
    """,
)
def q121_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval scoring (k1=1.2, b=0.75) for a fixed
     3-term query over the corpus — the ranking function the reference
    delegates to its Elasticsearch sink
    (ElasticsearchEmbeddedNodeSink.java:47-66), expressed as a
    first-class relational operator: corpus stats (N, total length,
    per-term document frequency) reduce to ONE broadcast row, every
    per-doc term frequency is an in-expression array count, and the
    final top-20 is a TakeOrderedAndProject — a single corpus pass plus
    a one-row broadcast join, no shuffle of the corpus.

    Cross-engine exactness: tf/df/dl/N are integers and the score
    arithmetic is written in the identical operation order in both
    engines, but Spark's `log` (JDK Math.log) and DuckDB's `ln` differ
    in the LAST ULP on some inputs (observed: 1.1729162160062332 vs
    ...34) — so the emitted score is the micro-scaled long
    `round(bm25 * 1e6)`, and the top-20 ordering uses that same scaled
    value with doc_id tie-breaks, making rank and output bit-stable
    across engines (the scaled-long idiom q79/q104 established)."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("sum_dl"),
        *[
            F.sum(F.array_contains(toks, t).cast("int")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    s = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))
    scored = s.crossJoin(F.broadcast(stats))

    def tf(t: str):
        return F.size(F.filter(F.col("toks"), lambda x: x == t))

    def term_score(t: str):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        norm = (tf(t) * F.lit(_BM25_K1 + 1)) / (
            tf(t)
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + F.lit(_BM25_B) * (F.col("dl") / (F.col("sum_dl") / F.col("n_docs")))
            )
        )
        return idf * norm

    bm25 = term_score(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        bm25 = bm25 + term_score(t)
    any_tf = tf(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        any_tf = any_tf + tf(t)
    return (
        scored.select(
            "doc_id",
            *[tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
            F.round(bm25 * F.lit(1000000.0)).cast("long").alias("bm25_micro"),
            any_tf.alias("__any"),
        )
        .filter(F.col("__any") > 0)
        .drop("__any")
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(20)
    )


_COOC_VOCAB = 40  # df-ranked vocabulary cap: bounds pair fan-out to V(V-1)/2 per doc


@query(
    "q126_token_cooccurrence",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ), dfq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
    ), vocab AS (
        SELECT token, c FROM dfq ORDER BY c DESC, token LIMIT {_COOC_VOCAB}
    ), vt AS (
        SELECT t.doc_id, t.token, v.c FROM toks t JOIN vocab v USING (token)
    ), pairs AS (
        SELECT a.token AS t1, b.token AS t2, a.c AS c1, b.c AS c2,
               CAST(count(*) AS BIGINT) AS c12
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2, 3, 4
    ), nd AS (SELECT count(*) AS n FROM documents)
    SELECT t1, t2, c12, c1, c2,
           CAST(round((1000.0 * (nd.n * c12)) / (c1 * c2)) AS BIGINT) AS lift_x1000
    FROM pairs, nd
    ORDER BY c12 DESC, t1, t2
    LIMIT 50
    """,
)
def q126_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence with lift (PMI's argument, kept rational) —
    the phrase-mining / collocation pass of a corpus pipeline.

    Scale shape: the quadratic pair explosion is bounded up front by a
    df-ranked vocabulary cap (top-V, V=_COOC_VOCAB, broadcast), so
    each doc contributes at most V(V-1)/2 pairs; pairs are generated
    IN-EXPRESSION from the per-doc sorted vocab-token set (array
    lambdas — no self-join of the exploded token table), leaving only
    word-count-shaped shuffles. Lift is emitted as the integer
    `round(1000·N·c12 / (c1·c2))`: all products are FP-exact (< 2^53)
    and the single division is correctly rounded, so both engines
    produce the identical long."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
    dfq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    vocab = dfq.orderBy(F.desc("c"), "token").limit(_COOC_VOCAB)
    vt = toks.join(F.broadcast(vocab.select("token")), "token")
    per_doc = (
        vt.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("token")).alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(ts) - 1), i -> "
        "transform(sequence(i + 1, size(ts)), j -> "
        "struct(element_at(ts, i) AS t1, element_at(ts, j) AS t2))))"
    )
    c12 = (
        per_doc.select(F.explode(pair_expr).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n"))
    v1 = vocab.select(F.col("token").alias("t1"), F.col("c").alias("c1"))
    v2 = vocab.select(F.col("token").alias("t2"), F.col("c").alias("c2"))
    lift = (F.lit(1000.0) * (F.col("n") * F.col("c12"))) / (F.col("c1") * F.col("c2"))
    return (
        c12.join(F.broadcast(v1), "t1")
        .join(F.broadcast(v2), "t2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "t1",
            "t2",
            "c12",
            "c1",
            "c2",
            F.round(lift, 0).cast("long").alias("lift_x1000"),
        )
        .orderBy(F.desc("c12"), "t1", "t2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q165 — one k-means Lloyd iteration (assign to nearest seed, re-center)
# ---------------------------------------------------------------------------

_KM_K = 8           # seed centroids = embeddings of vec_id 0..7
_KM_QD = 10_000     # fixed-point scale for assignment distances
_KM_QC = 1_000_000  # fixed-point scale for re-centered means


@query(
    "q165_kmeans_lloyd_step",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), seed AS (
      SELECT vec_id AS cid, emb AS semb FROM e WHERE vec_id < {_KM_K}
    ), dist AS (
      SELECT e.vec_id, seed.cid,
             CAST(list_sum(list_transform(list_zip(e.emb, seed.semb),
                 p -> (CAST(round(p[1] * {_KM_QD}) AS BIGINT)
                       - CAST(round(p[2] * {_KM_QD}) AS BIGINT))
                    * (CAST(round(p[1] * {_KM_QD}) AS BIGINT)
                       - CAST(round(p[2] * {_KM_QD}) AS BIGINT)))) AS BIGINT) AS d
      FROM e CROSS JOIN seed
    ), assign AS (
      SELECT vec_id, first(cid ORDER BY d, cid) AS cid FROM dist GROUP BY vec_id
    ), ex AS (
      SELECT a.cid, i AS pos, e.emb[i] AS v
      FROM assign a JOIN e USING (vec_id), unnest(range(1, len(e.emb) + 1)) AS t(i)
    ), mean_q AS (
      SELECT cid, pos,
             CAST(round(CAST(sum(CAST(round(v * {_KM_QC}) AS BIGINT)) AS DOUBLE)
                        / count(*)) AS BIGINT) AS mq
      FROM ex GROUP BY cid, pos
    ), seed_q AS (
      SELECT cid, i AS pos, CAST(round(semb[i] * {_KM_QC}) AS BIGINT) AS sq
      FROM seed, unnest(range(1, len(semb) + 1)) AS t(i)
    ), n AS (
      SELECT cid, count(*) AS n_assigned FROM assign GROUP BY cid
    )
    SELECT m.cid, n.n_assigned,
           CAST(sum(m.pos * m.mq) AS BIGINT) AS centroid_fp,
           CAST(sum((m.mq - s.sq) * (m.mq - s.sq)) AS BIGINT) AS shift_sq
    FROM mean_q m JOIN seed_q s USING (cid, pos) JOIN n USING (cid)
    GROUP BY m.cid, n.n_assigned
    ORDER BY m.cid
    """,
)
def q165_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus:
    assign every vector to its nearest of k=8 seed centroids (the
    embeddings of vec_id 0..7 — a deterministic stand-in for k-means++
    output), then re-center each cluster — the building block iterative
    clustering repeats to a fixed point, exercised once so the oracle
    stays SQL-expressible.

    Determinism without floats: assignment distances are squared L2
    over 1e4-quantized dims — EXACT int64 arithmetic (|q| <= 2e4 =>
    per-term < 1.6e9, x64 dims < 2^37), so the argmin (ties broken by
    centroid id via min(struct(d, cid))) is bit-free of rounding-order
    effects; re-centered means use the scaled-long exact-sum pattern.

    Scale: seeds are a k-row BROADCAST to the distance pass (one
    narrow corpus scan, k folds per row, no shuffle); assignment is a
    map-side-combinable min-struct aggregate keyed by vec_id ONLY in
    name — it is per-row after the broadcast join, so the only real
    shuffles are the (cid, pos) mean aggregate (k*dim groups) and the
    k-row final join. Identical shape at 1000 executors.
    """
    e = _emb(spark, sf_dir)
    seed = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("semb")
    )
    qd = lambda c: F.round(c * _KM_QD, 0).cast("long")  # noqa: E731
    # r14 (guide §2.1/§3): the groupBy(vec_id) argmin + join-back
    # spelling shuffled the corpus TWICE (k-fold row explosion through
    # the aggregate, then a corpus-corpus equi-join to recover the
    # embedding) and re-ran the whole assignment subtree a third time
    # for the per-cluster count (12 scans / 34 Exchange in the before
    # plan). The k seeds now enter as ONE broadcast row holding the
    # (cid, semb) struct array, and the argmin is computed per row:
    # array_min over struct(d, cid) is the same (d, cid) lexicographic
    # order as min(struct(d, cid)), and d is the identical exact-int64
    # fold, so the assignment is bit-identical. One corpus scan, no
    # corpus shuffle before the (cid, pos) mean aggregate.
    seeds1 = seed.agg(
        F.array_sort(F.collect_list(F.struct("cid", "semb"))).alias("seeds")
    )
    dseed = lambda s: F.aggregate(  # noqa: E731
        F.zip_with(
            F.col("embedding"), s.getField("semb"),
            lambda x, y: (qd(x) - qd(y)) * (qd(x) - qd(y)),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    ec = e.crossJoin(F.broadcast(seeds1)).select(
        F.array_min(
            F.transform(
                "seeds",
                lambda s: F.struct(
                    dseed(s).alias("d"), s.getField("cid").alias("cid")
                ),
            )
        )
        .getField("cid")
        .alias("cid"),
        "embedding",
    )
    ex = ec.select("cid", F.posexplode("embedding").alias("pos0", "v"))
    # fixed-dimension embedding column (the fixture/ANN-family schema
    # contract): the per-(cid, pos) row count IS the cluster member
    # count, so n_assigned rides out of the SAME aggregate instead of a
    # third corpus pass over a recomputed assignment frame.
    mean_q = ex.groupBy("cid", "pos0").agg(
        F.round(
            F.sum(F.round(F.col("v") * _KM_QC, 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            0,
        )
        .cast("long")
        .alias("mq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    seed_q = seed.select(
        "cid", F.posexplode("semb").alias("pos0", "sv")
    ).select("cid", "pos0", F.round(F.col("sv") * _KM_QC, 0).cast("long").alias("sq"))
    return (
        mean_q.join(seed_q, ["cid", "pos0"])
        .groupBy("cid")
        .agg(
            F.max("cnt").alias("n_assigned"),
            F.sum((F.col("pos0") + 1) * F.col("mq")).alias("centroid_fp"),
            F.sum((F.col("mq") - F.col("sq")) * (F.col("mq") - F.col("sq"))).alias("shift_sq"),
        )
        .select("cid", "n_assigned", "centroid_fp", "shift_sq")
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# q176 — temperature-weighted source mixture resample
# ---------------------------------------------------------------------------


@query(
    "q176_mixture_resample",
    oracle="""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
             list_reduce(
                 list_prepend(CAST(0 AS DOUBLE),
                              list(sqrt(CAST(n_s AS DOUBLE)) ORDER BY source)),
                 (acc, x) -> acc + x) AS sum_w
      FROM s
    ), r AS (
      SELECT source, n_s,
             CAST(least(1000000.0, round(1000000.0
                  * (CAST(n_total AS DOUBLE) / 2.0)
                  * sqrt(CAST(n_s AS DOUBLE))
                  / (sum_w * CAST(n_s AS DOUBLE)))) AS BIGINT) AS th_ppm
      FROM s CROSS JOIN tot
    ), adm AS (
      SELECT d.source
      FROM documents d JOIN r USING (source)
      WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000 < th_ppm
    ), c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_sampled FROM adm GROUP BY source
    )
    SELECT r.source, r.n_s, r.th_ppm, COALESCE(c.n_sampled, 0) AS n_sampled
    FROM r LEFT JOIN c USING (source)
    ORDER BY r.source
    """,
)
def q176_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced source mixture (the alpha=0.5 domain
    rebalancing of multilingual/multi-source training sets, XLM-R
    style): target share of source s is sqrt(n_s)/sum(sqrt(n_s)) of a
    half-corpus budget, realized as a DETERMINISTIC per-source
    admission threshold on the doc-id hash (the q135 retry-stable
    idiom — rerunning admits the identical doc set, no RNG state).
    Output audits requested rate vs achieved take per source.

    Scale: per-source counts are one map-combinable aggregate; the
    temperature weights fold over the |sources|-row frame (source-
    ordered, both engines); admission is a narrow broadcast-join
    predicate over the corpus — no shuffle of the data being sampled.
    Exactness: thresholds are integer ppm computed from identical
    IEEE trees (sqrt is correctly rounded), membership is an integer
    hash compare, so the sampled set — not just its size — is
    bit-reproducible across engines and runs."""
    from flink_mingo_tail_spark.operators.dedup import md5_long

    d = _docs(spark, sf_dir)
    stats = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = stats.agg(
        F.sum("n_s").alias("n_total"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("source", "n_s"))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["n_s"].cast("double")),
        ).alias("sum_w"),
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.least(
                F.lit(1000000.0),
                F.round(
                    F.lit(1e6)
                    * (F.col("n_total").cast("double") / 2.0)
                    * F.sqrt(F.col("n_s").cast("double"))
                    / (F.col("sum_w") * F.col("n_s").cast("double")),
                    0,
                ),
            )
            .cast("long")
            .alias("th_ppm"),
        )
    )
    adm = d.join(F.broadcast(rates), "source").filter(
        md5_long(F.col("doc_id").cast("string")) % 1000000 < F.col("th_ppm")
    )
    counts = adm.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        rates.join(counts, "source", "left")
        .select(
            "source",
            "n_s",
            "th_ppm",
            F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q178 — BPE merge-pair counting (tokenizer-induction inner loop)
# ---------------------------------------------------------------------------

@query(
    "q178_bpe_merge_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM words WHERE length(w) >= 2 GROUP BY w
    ), pairs AS (
      SELECT substr(w, CAST(i AS INT), 1) AS a,
             substr(w, CAST(i AS INT) + 1, 1) AS b, cnt
      FROM wc, unnest(range(1, length(w))) AS r(i)
    )
    SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY a, b
    ORDER BY pair_count DESC, a, b
    LIMIT 50
    """,
)
def q178_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting pass of byte-pair-encoding tokenizer induction:
    adjacent-symbol pair frequencies over the corpus, weighted by word
    frequency — the top pair is the next BPE merge. (The apply step
    folds the winning pair into the symbol inventory and re-runs this
    count; each iteration is this same query over the re-segmented
    vocabulary.)

    The classic BPE speedup is built in: pairs are counted over the
    DISTINCT-word frame weighted by word count, so the pair explode
    touches |vocabulary| rows, not |corpus tokens| — on a 100 TB crawl
    the vocabulary is millions of rows while the token stream is
    trillions. Two word-count-shaped aggregates (word freq, then pair
    freq), both map-side combinable; the per-word pair expansion is an
    in-expression array lambda, nothing materializes.
    """
    d = _docs(spark, sf_dir)
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(w) - 1),"
        " i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"
    )
    return (
        wc.select(F.explode(pair_expr).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q182 — positional phrase search (the positional-index probe plan)
# ---------------------------------------------------------------------------

_PHRASE = ("fast", "table")


@query(
    "q182_phrase_search",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
      SELECT doc_id, i, t[CAST(i AS INT)] AS term
      FROM d, unnest(range(1, len(t) + 1)) AS r(i)
    ),
    a AS (SELECT doc_id, i FROM pos WHERE term = '{_PHRASE[0]}'),
    b AS (SELECT doc_id, i FROM pos WHERE term = '{_PHRASE[1]}')
    SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM a JOIN b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    GROUP BY a.doc_id
    ORDER BY doc_id
    """,
)
def q182_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("fast table") via positional postings:
    per-term (doc_id, position) lists equi-joined on
    (doc_id, pos + 1 = pos) adjacency — the probe plan of a positional
    inverted index (q100 builds the non-positional form; production
    persists this layout so the scan below becomes an index lookup).

    The term filter lands BEFORE the explode output is shuffled: each
    posting stream carries only the phrase's terms, so the adjacency
    join's key space is the phrase's document frequency, not corpus
    positions. Both sides shuffle on doc_id once; phrase extension to
    k terms chains k-1 such joins, each narrowing the candidate set.
    """
    d = _docs(spark, sf_dir)
    pos = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("i", "term")
    )
    # posexplode is 0-based; the oracle's range() is 1-based — adjacency
    # (i_b = i_a + 1) is offset-invariant, so no correction is needed.
    # Both posting streams derive from ONE plan — alias each side
    # explicitly so the join condition resolves against distinct
    # relations instead of leaning on Spark's self-join fixup (which
    # logs "Constructing trivially true equals predicate" and is
    # version-fragile — round-7 verdict #3).
    a = (
        pos.filter(F.col("term") == _PHRASE[0])
        .select("doc_id", F.col("i").alias("ia"))
        .alias("a")
    )
    b = (
        pos.filter(F.col("term") == _PHRASE[1])
        .select("doc_id", F.col("i").alias("ib"))
        .alias("b")
    )
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.ib") == F.col("a.ia") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q184 — reciprocal-rank fusion of lexical and semantic retrieval
# ---------------------------------------------------------------------------

_RRF_K = 60      # the standard RRF damping constant (Cormack et al. SIGIR'09)
_RRF_TOP = 50    # per-system list depth


@query(
    "q184_rrf_fusion",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), lex AS (
      SELECT doc_id,
             CAST(len(list_filter(toks, t -> t = 'spark')) +
                  len(list_filter(toks, t -> t = 'join')) +
                  len(list_filter(toks, t -> t = 'window')) AS BIGINT) AS score
      FROM d
      ORDER BY score DESC, doc_id LIMIT {_RRF_TOP}
    ), lexr AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM lex
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
    ), q AS (
      SELECT embedding AS qv FROM e WHERE vec_id = 0
    ), sem AS (
      SELECT c.vec_id AS doc_id,
             round({SQL_COSINE.format(a="q.qv", b="c.embedding")}, 6) AS cos_sim
      FROM e c CROSS JOIN q WHERE c.vec_id <> 0
      ORDER BY cos_sim DESC, doc_id LIMIT {_RRF_TOP}
    ), semr AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r FROM sem
    )
    SELECT coalesce(lexr.doc_id, semr.doc_id) AS doc_id,
           CAST(coalesce(lexr.r, 0) AS BIGINT) AS lex_rank,
           CAST(coalesce(semr.r, 0) AS BIGINT) AS sem_rank,
           CAST(round((coalesce(1.0 / ({_RRF_K} + lexr.r), 0.0)
                     + coalesce(1.0 / ({_RRF_K} + semr.r), 0.0)) * 1000000.0)
             AS BIGINT) AS rrf_micro
    FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
    ORDER BY rrf_micro DESC, doc_id
    """,
)
def q184_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval systems — the lexical
    (BM25-family term-count) list and the semantic (embedding-cosine)
    list — rrf(d) = sum over systems of 1/(k + rank_s(d)), the standard
    ensemble step between sparse and dense retrieval.

    Scale shape: each leg is a corpus pass ending in a
    TakeOrderedAndProject (top-{_RRF_TOP}); ranking then runs on the
    {_RRF_TOP}-row lists (the documented tiny-frame window exception —
    bounded by the LIMIT, not the corpus), and the fusion join is
    list-sized. The 1/(k+r) terms are IEEE divisions of exact ints,
    summed in the same written order in both engines, micro-rounded.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    score = sum(
        F.size(F.filter(toks, lambda t: t == F.lit(term)))
        for term in ("spark", "join", "window")
    ).cast("long")
    lex = (
        d.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_TOP)
    )
    lexr = lex.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("score"), "doc_id")).alias("rl"),
    )
    e = _emb(spark, sf_dir)
    # r15 norm-carrying (the q104/r14 lever): the query vector's norm is
    # constant across the corpus — compute it once in the 1-row broadcast
    # frame. Same l2_norm subtree, same operand order as cosine(qv, emb)
    # → bit-identical, two 64-dim folds per corpus row instead of three.
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), l2_norm(F.col("embedding")).alias("nq")
    )
    sem = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("qv"), F.col("embedding"))
                / (F.col("nq") * l2_norm(F.col("embedding"))),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(_RRF_TOP)
    )
    semr = sem.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("cos_sim"), "doc_id")).alias("rs"),
    )
    fused = lexr.join(semr, "doc_id", "full_outer")
    return fused.select(
        "doc_id",
        F.coalesce(F.col("rl"), F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce(F.col("rs"), F.lit(0)).cast("long").alias("sem_rank"),
        F.round(
            (
                F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rl")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rs")), F.lit(0.0))
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("rrf_micro"),
    ).orderBy(F.desc("rrf_micro"), "doc_id")


# ---------------------------------------------------------------------------
# q185 — BPE merge application (round 2 of tokenizer induction)
# ---------------------------------------------------------------------------

_BPE_WC = """
    words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM words WHERE length(w) >= 2 GROUP BY w
    )
"""


@query(
    "q185_bpe_merge_apply",
    oracle=f"""
    WITH {_BPE_WC},
    pairs1 AS (
      SELECT substr(w, CAST(i AS INT), 1) AS a,
             substr(w, CAST(i AS INT) + 1, 1) AS b, cnt
      FROM wc, unnest(range(1, length(w))) AS r(i)
    ), top1 AS (
      SELECT a, b FROM pairs1 GROUP BY a, b
      ORDER BY sum(cnt) DESC, a, b LIMIT 1
    ), seg AS (
      SELECT replace('|' || array_to_string(string_split(w, ''), '|'),
                     '|' || a || '|' || b, '|' || a || b) AS s, cnt
      FROM wc CROSS JOIN top1
    ), syms AS (
      SELECT string_split(s, '|') AS ss, cnt FROM seg
    ), pairs2 AS (
      -- ss[1] is the empty pre-separator field; symbols are ss[2..]
      SELECT ss[CAST(i AS INT)] AS a, ss[CAST(i AS INT) + 1] AS b, cnt
      FROM syms, unnest(range(2, len(ss))) AS r(i)
    )
    SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM pairs2 GROUP BY a, b
    ORDER BY pair_count DESC, a, b
    LIMIT 50
    """,
)
def q185_bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 2 of BPE tokenizer induction: take round 1's winning merge
    pair (q178's argmax), APPLY it to the symbol inventory, and recount
    adjacent pairs over the merged segmentation — the apply+recount
    step that, iterated, yields the full merge table.

    Merge application is a single string replace over the
    '|'-prefixed symbol spelling ('hello' -> '|h|e|l|l|o'): replacing
    '|a|b' with '|ab' left-to-right non-overlapping IS greedy BPE merge
    order ('aaa' with merge (a,a) -> [aa, a]), and the leading '|' on
    every symbol makes a mid-symbol false match impossible while round-1
    symbols are single characters (later rounds would need the
    boundary-aware spelling — this query pins round 2 exactly).

    Scale shape: both counting passes ride the DISTINCT-word frame
    weighted by word count (the q178 invariance); the winning pair is a
    one-row broadcast crossJoin; merge apply + re-segmentation are
    in-expression string ops, nothing materializes per token.
    """
    d = _docs(spark, sf_dir)
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pair_expr = F.expr(
        "transform(sequence(1, length(w) - 1),"
        " i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"
    )
    top1 = (
        wc.select(F.explode(pair_expr).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
        .orderBy(F.desc("c"), "a", "b")
        .limit(1)
        .select("a", "b")
    )
    seg = wc.crossJoin(F.broadcast(top1)).select(
        F.expr(
            "replace('|' || concat_ws('|', split(w, '')),"
            " '|' || a || '|' || b, '|' || a || b)"
        ).alias("s"),
        "cnt",
    )
    # a fully-merged word ('ab' -> '|ab') has ONE symbol and no pairs;
    # Spark's sequence(2, 1) would step DOWNWARD (the q154 gotcha), so
    # single-symbol rows are filtered out before the transform
    pairs2 = F.expr(
        "transform(sequence(2, size(split(s, '[|]')) - 1),"
        " i -> struct(split(s, '[|]')[i - 1] AS a, split(s, '[|]')[i] AS b))"
    )
    return (
        seg.filter(F.size(F.split("s", "[|]")) >= 3)
        .select(F.explode(pairs2).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q188 — multi-round BPE training (the merge table, 3 rounds unrolled)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3

# greedy left-to-right merge fold, spelled once per engine. The DuckDB
# fold seeds list_reduce with a prepended empty VARCHAR[] (it has no
# explicit init); both folds implement the same recurrence, so the
# resulting segmentations are equal element-wise.
_DUCK_FOLD = (
    "list_reduce("
    "list_prepend([]::VARCHAR[], list_transform(syms, s -> [s])),"
    "(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m{r}.a AND x[1] = m{r}.b"
    " THEN list_append(acc[1:-2], m{r}.a || m{r}.b)"
    " ELSE list_concat(acc, x) END)"
)
_SPARK_FOLD = (
    "aggregate(syms, CAST(array() AS array<string>),"
    "(acc, s) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = a AND s = b"
    " THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))"
    " ELSE concat(acc, array(s)) END)"
)


def _bpe_rounds_oracle(n_rounds: int) -> str:
    parts = [
        """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM words WHERE length(w) >= 2 GROUP BY w
    ), seg0 AS (
      SELECT string_split(w, '') AS syms, cnt FROM wc
    )"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""
    , p{r} AS (
      SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
             CAST(sum(cnt) AS BIGINT) AS c
      FROM seg{r - 1}, unnest(range(1, len(syms))) AS r(i)
      GROUP BY 1, 2
    ), m{r} AS (
      SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1
    ), seg{r} AS (
      SELECT {_DUCK_FOLD.format(r=f"{r}")} AS syms, cnt
      FROM seg{r - 1} CROSS JOIN m{r}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, a, b, c AS pair_count FROM m{r}"
        for r in range(1, n_rounds + 1)
    )
    parts.append(f"""
    SELECT CAST(round AS BIGINT) AS round, a, b, pair_count
    FROM ({unions})
    ORDER BY round""")
    return "".join(parts)


@query("q188_bpe_train_rounds", oracle=_bpe_rounds_oracle(_BPE_ROUNDS))
def q188_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, {_BPE_ROUNDS} merge rounds unrolled: each
    round counts adjacent symbol pairs over the current segmentation,
    takes the argmax as the round's merge, and re-segments by a greedy
    left-to-right fold — the output IS the (ordered) merge table, the
    artifact a tokenizer trainer persists.

    Unlike q185's string-replace spelling (sound only while symbols are
    single characters), the re-segmentation here is an explicit array
    fold — acc ends with `a` and next is `b` => replace the tail with
    the merged symbol — which is exact at ANY symbol width, so rounds
    compose indefinitely; DuckDB replays the identical fold via
    list_reduce. Per round: one vocabulary-frame pair aggregate + a
    1-row broadcast of the winning merge + a narrow fold pass — the
    corpus (token stream) is touched exactly once, in the initial word
    count. Extending to production round counts keeps this exact shape
    per round (a driver loop over the same three steps, q79's
    train-loop pattern).
    """
    d = _docs(spark, sf_dir)
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    seg = wc.select(F.split("w", "").alias("syms"), "cnt")
    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        top = (
            seg.filter(F.size("syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
        )
        merges.append(
            top.select(
                F.lit(r).cast("long").alias("round"),
                "a",
                "b",
                F.col("c").alias("pair_count"),
            )
        )
        seg = seg.crossJoin(F.broadcast(top)).select(
            F.expr(_SPARK_FOLD).alias("syms"), "cnt"
        )
        if r < _BPE_ROUNDS:
            # r14 optimization: materialize the re-segmentation between
            # rounds (graph.py's loop idiom). Lazy chaining doubles the
            # plan per round — round r's argmax subtree re-derives
            # every earlier round's fold AND its pair aggregate, so the
            # unrolled plan held 2^rounds copies of the vocabulary
            # frame. The checkpointed frame is vocabulary-sized.
            seg = seg.localCheckpoint()
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# q232 — tokenizer fertility per source (BPE fit-by-domain eval)
# ---------------------------------------------------------------------------


def _bpe_fertility_oracle(n_rounds: int) -> str:
    parts = [
        """
    WITH words AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), swc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
      FROM words GROUP BY source, w
    ), wc AS (
      SELECT w, CAST(sum(cnt) AS BIGINT) AS cnt FROM swc GROUP BY w
    ), seg0 AS (
      SELECT w, string_split(w, '') AS syms, cnt FROM wc
    )"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""
    , p{r} AS (
      SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
             CAST(sum(cnt) AS BIGINT) AS c
      FROM seg{r - 1}, unnest(range(1, len(syms))) AS r(i)
      GROUP BY 1, 2
    ), m{r} AS (
      SELECT a, b FROM p{r} ORDER BY c DESC, a, b LIMIT 1
    ), seg{r} AS (
      SELECT w, {_DUCK_FOLD.format(r=f"{r}")} AS syms, cnt
      FROM seg{r - 1} CROSS JOIN m{r}
    )"""
        )
    parts.append(f"""
    SELECT swc.source,
           CAST(sum(swc.cnt) AS BIGINT) AS n_words,
           CAST(sum(swc.cnt * length(swc.w)) AS BIGINT) AS n_chars,
           CAST(sum(swc.cnt * len(seg{n_rounds}.syms)) AS BIGINT) AS n_bpe_tokens,
           CAST(round(CAST(sum(swc.cnt * len(seg{n_rounds}.syms)) AS DOUBLE)
                      * 1000.0 / sum(swc.cnt)) AS BIGINT) AS tokens_per_word_milli,
           CAST(round(CAST(sum(swc.cnt * length(swc.w)) AS DOUBLE)
                      * 1000.0 / sum(swc.cnt * len(seg{n_rounds}.syms))) AS BIGINT)
             AS chars_per_token_milli
    FROM swc JOIN seg{n_rounds} ON swc.w = seg{n_rounds}.w
    GROUP BY swc.source
    ORDER BY swc.source""")
    return "".join(parts)


@query("q232_bpe_fertility_by_source", oracle=_bpe_fertility_oracle(_BPE_ROUNDS))
def q232_bpe_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by domain — the published fit metric for a
    tokenizer/corpus pairing (tokens per word, chars per token): train
    the q188 merge table on the whole corpus ({_BPE_ROUNDS} rounds,
    byte-identical argmax chain), segment the DISTINCT-word vocabulary
    once with the final merges, then roll the per-source word counts
    over the segmented lengths. Sources whose text the learned merges
    compress poorly (high tokens/word, low chars/token) are the ones a
    production run flags for tokenizer retraining or re-weighting —
    the eval companion to q229's mixing and q231's selection.

    Scale shape: the token stream is touched ONCE (the per-source word
    count); training and segmentation ride the distinct-vocabulary
    frame (q178's invariance), and the final rollup joins per-source
    counts to per-word segment lengths on the word key — vocabulary-
    sized, never corpus-sized. Single-char words skip training's pair
    counts automatically (no adjacent pairs) but still count 1 symbol
    in fertility, so the metric covers the full corpus. Milli-grid
    divisions only at the final two columns; all sums integer-exact."""
    d = _docs(spark, sf_dir)
    # r14 optimization: the per-(source, word) count feeds BOTH the
    # global vocabulary (training) and the final rollup — lazily it
    # re-ran the corpus token pass twice; materialized once it is the
    # single corpus-sized touch the docstring promises (the frame
    # itself is vocabulary x sources, bounded).
    swc = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    wc = swc.groupBy("w").agg(F.sum("cnt").cast("long").alias("cnt"))
    seg = wc.select("w", F.split("w", "").alias("syms"), "cnt")
    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    for r in range(1, _BPE_ROUNDS + 1):
        top = (
            seg.filter(F.size("syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .select("a", "b")
        )
        seg = seg.crossJoin(F.broadcast(top)).select(
            "w", F.expr(_SPARK_FOLD).alias("syms"), "cnt"
        )
        if r < _BPE_ROUNDS:
            # q188's loop fix: without the inter-round materialization
            # the unrolled lazy plan held 2^rounds vocabulary subtrees.
            seg = seg.localCheckpoint()
    lens = seg.select("w", F.size("syms").cast("long").alias("n_syms"))
    rolled = (
        swc.join(lens, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_syms")).cast("long").alias("n_bpe_tokens"),
        )
    )
    return rolled.select(
        "source",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.expr(
            "CAST(round(CAST(n_bpe_tokens AS DOUBLE) * 1000.0 / n_words) AS BIGINT)"
        ).alias("tokens_per_word_milli"),
        F.expr(
            "CAST(round(CAST(n_chars AS DOUBLE) * 1000.0 / n_bpe_tokens) AS BIGINT)"
        ).alias("chars_per_token_milli"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q206 — query-likelihood retrieval with Dirichlet smoothing (round 9)
# ---------------------------------------------------------------------------

_QL_MU = 2000  # Dirichlet smoothing mass (standard default)


def _ql_term_sql(t: str) -> str:
    # identical text in Spark SQL and DuckDB over columns tf_t/cf_t/ctot/dl;
    # cf + 1 keeps the ln argument positive even for a term absent from
    # the corpus (where raw QL is undefined), and the int operand CASTs
    # to DOUBLE before any decimal literal touches it (house rule)
    return (
        f"CAST(round(ln((tf_{t} + {_QL_MU}.0 * (CAST(cf_{t} + 1 AS DOUBLE) / ctot))"
        f" / (dl + {_QL_MU})) * 1000000.0) AS BIGINT)"
    )


@query(
    "q206_query_likelihood_dirichlet",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ctot,
             {', '.join(
                 f"CAST(sum(len(list_filter(string_split(text, ' '), x -> x = '{t}'))) "
                 f"AS BIGINT) AS cf_{t}" for t in _BM25_TERMS)}
      FROM documents
    ), s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             {', '.join(
                 f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) "
                 f"AS BIGINT) AS tf_{t}" for t in _BM25_TERMS)}
      FROM documents WHERE len(string_split(text, ' ')) > 0
    )
    SELECT doc_id, {', '.join(f"tf_{t}" for t in _BM25_TERMS)},
           ({' + '.join(_ql_term_sql(t) for t in _BM25_TERMS)}) AS ql_micro
    FROM s CROSS JOIN stats
    ORDER BY ql_micro DESC, doc_id
    LIMIT 20
    """,
)
def q206_query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (µ=2000) for
    the same fixed 3-term query as q121 — the language-modeling school
    of lexical ranking next to BM25's probabilistic-IR school:
    score(q, d) = Σ_t ln((tf_t + µ·P(t|C)) / (|d| + µ)), with the
    collection model P(t|C) = (cf_t + 1)/ctot. Unlike BM25 the score is
    defined for EVERY document (smoothing fills zero-tf terms from the
    collection), so no tf>0 filter exists and the top-20 ranking also
    exercises the all-negative-score ordering path.

    Same single-pass shape as q121: corpus statistics (total tokens,
    per-term collection frequencies) reduce to ONE broadcast row; each
    per-doc tf is an in-expression array count; the top-20 is a
    TakeOrderedAndProject. Each term's ln rounds to the 1e-6 grid
    before the exact int sum of the three terms (module doctrine), and
    ordering uses the scaled long with doc_id tie-breaks."""
    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    # SQL-text lambdas, not Python ones: several Python-built
    # higher-order lambdas inside ONE aggregate can collide on their
    # NamedLambdaVariable and mis-bind the comparison (observed as a
    # CAST_INVALID_INPUT on a token string); the parser allocates fresh
    # variables per SQL string
    stats = d.agg(
        F.sum(F.size(toks)).cast("long").alias("ctot"),
        *[
            F.expr(
                f"CAST(sum(size(filter(split(text, ' '), x -> x = '{t}'))) AS BIGINT)"
            ).alias(f"cf_{t}")
            for t in _BM25_TERMS
        ],
    )
    s = (
        d.select("doc_id", toks.alias("tk"), F.size(toks).cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            "ctot",
            *[F.col(f"cf_{t}") for t in _BM25_TERMS],
            *[
                F.expr(f"CAST(size(filter(tk, x -> x = '{t}')) AS BIGINT)").alias(
                    f"tf_{t}"
                )
                for t in _BM25_TERMS
            ],
        )
    )
    ql = F.expr(" + ".join(_ql_term_sql(t) for t in _BM25_TERMS)).alias("ql_micro")
    return (
        s.select("doc_id", *[f"tf_{t}" for t in _BM25_TERMS], ql)
        .orderBy(F.col("ql_micro").desc(), "doc_id")
        .limit(20)
    )
