"""Streaming curation ingest — the incremental twin of q226's composed
batch pipeline (queries/dedup.curation_verdict).

Every micro-batch runs the same staged verdict the batch pipeline
runs, but against STANDING state instead of the whole corpus:

  1. quality gate       operators/quality.quality_reason — the one
                        shared spelling with q226 (stateless)
  2. exact / near dup   operators/dedup.probe_dedup_index against the
                        persisted content-hash + LSH-band index AS OF
                        BATCH START (O(batch) membership semi-joins);
                        with ``perceptual_index_path`` set, also the
                        PERCEPTUAL-DUP stage: quality passers carrying
                        a binary ``payload`` column are dHashed
                        buffer-level (operators/multimodal.dhash_arrow)
                        and probed against the GROWING persisted band
                        index (operators/perceptual_index — pigeonhole
                        band equi-join + exact popcount), reason
                        'perceptual_dup'; passers' fingerprints append
                        after commit — q247's loop, in place;
                        with ``semantic_dup_index_path`` set, also the
                        SEMANTIC-DUP stage: the GROWING corpus-side
                        sign-LSH index (expanded=False — plain keys
                        stored, the bounded batch fans its Hamming-1
                        probes), exact-cosine re-rank at
                        DEFAULT_SEM_DUP_TAU — q242's incremental
                        SemDeDup, reason 'semantic_dup'; quality
                        passers' embeddings append after commit;
                        with ``span_index_path`` set, also the
                        BOILERPLATE stage: passers whose standing-span
                        dup mass (operators/dedup.probe_span_index —
                        maximal >= span_l-token spans shared with the
                        admitted corpus) reaches ``span_dup_frac`` of
                        their tokens, reason 'boilerplate' — the
                        substring modality's q248-style stage; passers'
                        window keys append after commit
  3. decontamination    word 4-grams vs the PRE-BUILT eval gram set
                        (static broadcast side — the eval set is fixed
                        before ingest begins, as in production), and —
                        when a semantic index path is supplied and the
                        batch carries an ``embedding`` column — the
                        SEMANTIC stage: operators/semantic_index's
                        persisted sign-LSH eval index (expanded=True,
                        fan-out paid once at build), probed with plain
                        L-key hashes per batch row and re-ranked with
                        the exact 6-digit cosine at DEFAULT_SEM_TAU —
                        q224's flagging, standing-index form (q240's
                        equivalence proof). Reason 'contaminated_semantic'.
  4. budget cut         per-source running token totals accumulated
                        across committed batches + a within-batch
                        grouped prefix in q226's quality order
                        (n_chars DESC, doc_id)

Batch-vs-state granularity follows dedup_ingest/novelty_ingest: two
documents in the same batch do not discount each other in the dup
stages (the index is probed as of batch start), while the budget stage
IS ordered within the batch — budget is a prefix rule, not a
membership rule.

One further divergence from the batch pipeline, inherited from the
standing-index family rather than arrival order: the exact-dup hash is
``md5(text)`` over RAW text (probe_dedup_index's contract, shared with
q117/dedup_ingest), while q226 canonicalizes with
``md5(lower(trim(text)))``. On pre-normalized corpora (this fixture,
or anything that ran q67's normalization first) the two agree
everywhere; on raw text, run normalization upstream of ingest or
rebuild the index with a canonicalized text column — the knob is the
text expression fed to the index, not this module.

Index admission (what feeds the standing dup state): every
quality-passing document's content hash and band keys are appended
after the batch's classification commits — including documents the
batch itself flagged as dups (an exact dup's text is byte-identical to
its keeper's, so its hash/bands add no new members; a near-dup doc's
single 1x8 band is by definition already present). Membership-only
semantics make the append replay-idempotent without reconstructing the
crashed attempt's verdicts (novelty_ingest's stance).

Budget state is NOT a separate store: the per-source totals are
re-derived at batch start from the COMMITTED classification outputs
(reason in ('kept', 'over_budget') — the prefix counts every doc that
reached the budget stage, exactly q226's cum_before semantics). One
source of truth; a crashed attempt's partial output directory is never
read because only directories bearing _SUCCESS are summed.

Restart semantics (the dedup_ingest contract): classification commits
FIRST (atomic per-batch directory overwrite + _SUCCESS), the index
append runs LAST; a replayed batch whose output already committed
short-circuits to re-running only the idempotent append.

Reference parity: the reference engine's streaming surface is the CDC
quorum path (MongoDBOplogSource.java); this module is north-star
extension in the same family as streaming/dedup_ingest.py and
streaming/novelty_ingest.py, composing them into the full curation
shape a 100 TB ingest actually runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from flink_mingo_tail_spark.operators.dedup import (
    _SPAN_MANIFEST_SCHEMA,
    _read_index_manifest,
    build_bloom_index,
    build_dedup_index,
    build_span_index,
    compact_dedup_index,
    compact_span_index,
    maybe_rewiden_bloom_index,
    probe_dedup_index,
    probe_span_index,
    tokens,
    word_shingles,
)
from flink_mingo_tail_spark.operators.multimodal import dhash_arrow
from flink_mingo_tail_spark.operators.perceptual_index import (
    build_perceptual_index,
    compact_perceptual_index,
    probe_perceptual_index,
)
from flink_mingo_tail_spark.operators.quality import quality_reason
from flink_mingo_tail_spark.operators.ranks import grouped_prefix_sum
from flink_mingo_tail_spark.operators.semantic_index import (
    DEFAULT_SEM_DUP_TAU,
    DEFAULT_SEM_TAU,
    build_semantic_index,
    compact_semantic_index,
    probe_semantic_index,
)

DEFAULT_EVAL_MOD = 100   # doc_id % 100 == 0 is the held-out slice (q226's knob)
DEFAULT_BUDGET = 300     # per-source token budget (q226's knob)
DEFAULT_ROWS_PER_BAND = 8  # 1x8 high-precision split (q226's destructive-stage rule)
_GRAM_N = 4              # decontamination gram width (q75b/q226)

_OUT_SCHEMA = "doc_id long, source string, n_toks long, reason string"


def _hadoop_fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    return jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001


def _path_exists(spark: SparkSession, path: str) -> bool:
    jpath, fs = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def committed_batch_dirs(spark: SparkSession, output_path: str) -> dict[int, str]:
    """{batch_id: dir} for every ingest_batch=* directory bearing a
    _SUCCESS marker. A crashed attempt's partial directory has no
    marker and is never read."""
    jpath, fs = _hadoop_fs(spark, output_path)
    if not fs.exists(jpath):
        return {}
    out: dict[int, str] = {}
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("ingest_batch=")):
            continue
        full = str(status.getPath().toString())
        if fs.exists(spark._jvm.org.apache.hadoop.fs.Path(f"{full}/_SUCCESS")):  # noqa: SLF001
            out[int(name.split("=", 1)[1])] = full
    return out


def _manifest_or_none(spark: SparkSession, index_path: str):
    """Manifest dict, or None before bootstrap — existence-checked first
    so the pre-bootstrap probe doesn't log a JVM FileNotFound stack."""
    if not _path_exists(spark, f"{index_path}/manifest"):
        return None
    return _read_index_manifest(spark, index_path)


def estimated_dup_ratio(spark: SparkSession, table_path: str) -> float:
    """Cheap index-churn estimate: rows / distinct-rows on ONE shard of
    a standing-index table — O(index / n_shards) work, not a full scan.
    Shard 0 is representative by construction: churn comes from
    replayed/overlapping batch appends, which re-insert the WHOLE
    batch's keys, and md5 sharding spreads any batch uniformly across
    shards, so every shard sees the same duplicate multiplicity in
    expectation. An EMPTY shard 0 implies a tiny index (uniform
    sharding puts ~1/n_shards of the rows there), so the estimate
    falls back to the whole table rather than silently reporting 1.0
    for an index whose churn all sits in other shards; an unsharded
    table is likewise measured whole (ADVICE r13). Returns 1.0 for a
    missing/empty table (nothing to compact)."""
    if not _path_exists(spark, table_path):
        return 1.0
    try:
        df = spark.read.parquet(table_path)
    except AnalysisException:
        # zero-row write: the directory exists but holds no parquet
        # footers to infer a schema from — nothing to compact
        return 1.0

    def _ratio(frame) -> float | None:
        # one job for both counts (round-13 review): rows + distinct
        row = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(c) for c in frame.columns]).alias("d"),
        ).head()
        return None if row.n == 0 else row.n / row.d

    if "shard" in df.columns:
        est = _ratio(df.filter(F.col("shard") == 0))
        if est is not None:
            return est
    return _ratio(df) or 1.0


def build_eval_semantic_index(
    embeddings: DataFrame,
    path: str,
    *,
    eval_mod: int = DEFAULT_EVAL_MOD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the held-out eval slice's sign-LSH semantic index — the
    static embedding-side decontamination probe, built once before
    ingest begins (build_eval_gram_set's twin for the semantic stage).
    ``expanded=True``: the Hamming-1 fan-out is paid here, on the
    bounded eval side, so every future batch hashes plain L keys."""
    build_semantic_index(
        embeddings.filter(F.col(id_col) % eval_mod == 0),
        path,
        id_col=id_col,
        vec_col=vec_col,
        expanded=True,
    )


def build_eval_gram_set(
    docs: DataFrame,
    path: str,
    *,
    eval_mod: int = DEFAULT_EVAL_MOD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the DISTINCT word 4-grams of the held-out eval slice —
    the static decontamination probe side, built once before ingest."""
    (
        docs.filter(F.col(id_col) % eval_mod == 0)
        .select(F.explode(word_shingles(tokens(F.col(text_col)), _GRAM_N)).alias("g"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def classify_batch(
    batch_df: DataFrame,
    index_path: str,
    eval_grams: DataFrame,
    prior_totals: DataFrame,
    *,
    budget: int = DEFAULT_BUDGET,
    eval_mod: int = DEFAULT_EVAL_MOD,
    semantic_index_path: str | None = None,
    sem_tau: float = DEFAULT_SEM_TAU,
    semantic_dup_index_path: str | None = None,
    sem_dup_tau: float = DEFAULT_SEM_DUP_TAU,
    perceptual_index_path: str | None = None,
    bloom_prefilter: bool = False,
    span_index_path: str | None = None,
    span_dup_frac: float = 0.5,
) -> DataFrame:
    """The per-batch verdict (doc_id, source, n_toks, reason) against
    state as of batch start. ``prior_totals`` is (source, prior_toks) —
    tokens already counted toward each source's budget by earlier
    committed batches. With ``semantic_index_path`` (the STATIC
    eval-side decontamination index) and/or ``semantic_dup_index_path``
    (the GROWING corpus-side SemDeDup index, q242's direction) set, the
    batch MUST carry an ``embedding`` column (nullable — a doc without
    one simply can't hit semantically, q224's honest partially-embedded
    shape) and quality passers are additionally probed against the
    persisted indexes. With ``perceptual_index_path`` (the GROWING
    dHash band index, q247's direction) set, the batch MUST carry a
    binary ``payload`` column (nullable — same honest-partial shape);
    quality passers' payloads are fingerprinted and probed, reason
    'perceptual_dup' between the text-dup and semantic-dup stages. No
    writes, no collects (one bounded persist on the flagged frame — see
    inline note); exposed so the q234/q241/q248 driver twins hash
    exactly this code path."""
    spark = batch_df.sparkSession
    needs_emb = semantic_index_path is not None or semantic_dup_index_path is not None
    if needs_emb and "embedding" not in batch_df.columns:
        raise ValueError(
            "a semantic index path is set but the batch has no 'embedding' column "
            "— join the embeddings onto the stream upstream of ingest"
        )
    needs_payload = perceptual_index_path is not None
    if needs_payload and "payload" not in batch_df.columns:
        raise ValueError(
            "a perceptual index path is set but the batch has no 'payload' column "
            "— join the media payloads onto the stream upstream of ingest"
        )
    t = tokens(F.col("text"))
    cols = [
        F.col("doc_id"),
        F.col("source"),
        F.col("n_chars"),
        F.col("text"),
        F.size(t).cast("long").alias("n_toks"),
        quality_reason(F.col("doc_id"), t, F.col("lang"), eval_mod).alias("r1"),
    ]
    if needs_emb:
        cols.insert(4, F.col("embedding"))
    if needs_payload:
        cols.insert(4, F.col("payload"))
    s1 = batch_df.select(*cols)
    surv1 = s1.filter(F.col("r1").isNull())

    if _manifest_or_none(spark, index_path) is None:
        # bootstrap: no index yet (first batch) — nothing is a dup
        probed = surv1.select("doc_id", F.lit("new").alias("status"))
    else:
        # bloom_prefilter=True routes the exact-membership probe through
        # the kilobyte Bloom sibling at {index_path}/bloom (two-tier:
        # only bloom-positive hashes reach the exact semi-join) — the
        # ingest body guarantees the sibling exists and covers the
        # content table before any probe runs; classification is
        # identical either way (no Bloom false negatives)
        probed = probe_dedup_index(
            surv1, index_path, bloom_prefilter=bloom_prefilter
        ).select("doc_id", "status")

    grams = surv1.select(
        "doc_id", F.explode(word_shingles(tokens(F.col("text")), _GRAM_N)).alias("g")
    )
    cont_ids = (
        grams.join(F.broadcast(eval_grams), "g", "left_semi").select("doc_id").distinct()
    )

    # ONE flagged frame feeds both the budget branch and the final
    # verdict, persisted so the index semi-joins and the gram broadcast
    # join run once per batch, not once per consumer (Catalyst does not
    # CSE across join branches; review round-11). The cache is bounded
    # (O(batch) narrow rows) and reclaimed by the ContextCleaner once
    # the batch's frames go out of scope.
    flagged = (
        surv1.drop("text")
        .join(probed, "doc_id", "left")
        .join(cont_ids.withColumn("__ct", F.lit(True)), "doc_id", "left")
    )
    if span_index_path is not None and _path_exists(
        spark, f"{span_index_path}/manifest"
    ):
        # BOILERPLATE stage (round 14): quality passers whose standing-
        # span dup mass (operators/dedup.probe_span_index — maximal
        # spans shared with the admitted corpus AS OF BATCH START)
        # reaches span_dup_frac of their tokens. Catches templated/
        # boilerplate-heavy documents that survive whole-document and
        # near dedup because their novel remainder keeps the signature
        # distinct.
        span_l = _read_index_manifest(spark, span_index_path, _SPAN_MANIFEST_SCHEMA)[
            "span_l"
        ]
        bp_ids = (
            probe_span_index(surv1, span_index_path)
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.col("span_end") - F.col("span_start") + F.lit(span_l)
                ).alias("__dupt")
            )
            .join(surv1.select("doc_id", "n_toks"), "doc_id")
            .filter(F.col("__dupt") >= F.lit(span_dup_frac) * F.col("n_toks"))
            .select("doc_id")
            .withColumn("__bp", F.lit(True))
        )
        flagged = flagged.join(bp_ids, "doc_id", "left")
    else:
        # stage off, or bootstrap (no index yet) — nothing is boilerplate
        flagged = flagged.withColumn("__bp", F.lit(None).cast("boolean"))
    embedded = (
        surv1.filter(F.col("embedding").isNotNull()).select("doc_id", "embedding")
        if needs_emb
        else None
    )
    if needs_payload and _path_exists(spark, f"{perceptual_index_path}/manifest"):
        pd_ids = (
            probe_perceptual_index(
                dhash_arrow(
                    surv1.filter(F.col("payload").isNotNull()).select(
                        F.col("doc_id").alias("media_id"), "payload"
                    )
                ),
                perceptual_index_path,
                broadcast_side="probe",  # the batch is the bounded side
            )
            .filter(F.col("perceptual_hit"))
            .select(F.col("media_id").alias("doc_id"))
            .withColumn("__pd", F.lit(True))
        )
        flagged = flagged.join(pd_ids, "doc_id", "left")
    else:
        # stage off, or bootstrap (no index yet) — nothing is a dup
        flagged = flagged.withColumn("__pd", F.lit(None).cast("boolean"))
    if semantic_dup_index_path is not None and _path_exists(
        spark, f"{semantic_dup_index_path}/manifest"
    ):
        sd_ids = (
            probe_semantic_index(
                embedded,
                semantic_dup_index_path,
                id_col="doc_id",
                tau=sem_dup_tau,
                broadcast_side="probe",  # the batch is the bounded side
            )
            .filter(F.col("semantic_hit"))
            .select("doc_id")
            .withColumn("__sd", F.lit(True))
        )
        flagged = flagged.join(sd_ids, "doc_id", "left")
    else:
        # stage off, or bootstrap (no index yet) — nothing is a dup
        flagged = flagged.withColumn("__sd", F.lit(None).cast("boolean"))
    if semantic_index_path is not None:
        sem_ids = (
            probe_semantic_index(
                embedded,
                semantic_index_path,
                id_col="doc_id",
                tau=sem_tau,
                broadcast_side="index",  # eval index is the bounded side
            )
            .filter(F.col("semantic_hit"))
            .select("doc_id")
            .withColumn("__sem", F.lit(True))
        )
        flagged = flagged.join(sem_ids, "doc_id", "left")
    else:
        flagged = flagged.withColumn("__sem", F.lit(None).cast("boolean"))
    if needs_emb:
        flagged = flagged.drop("embedding")
    if needs_payload:
        flagged = flagged.drop("payload")
    flagged = flagged.persist()
    gate = flagged.filter(
        (F.col("status") == "new")
        & F.col("__bp").isNull()
        & F.col("__pd").isNull()
        & F.col("__sd").isNull()
        & F.col("__ct").isNull()
        & F.col("__sem").isNull()
    ).select("doc_id", "source", "n_chars", "n_toks")
    # within-batch prefix in q226's quality order; prior batches' totals
    # join in as a per-source offset (broadcast: |sources| rows)
    value = F.when(
        (F.col("doc_id") < 0)
        | (F.col("doc_id") >= F.lit(1 << 34))
        | (F.col("n_chars") < 0)
        | (F.col("n_chars") >= F.lit(1 << 29)),
        F.expr("raise_error('curation_ingest: packed order key domain exceeded')").cast(
            "long"
        ),
    ).otherwise((-F.col("n_chars")) * F.lit(1 << 34) + F.col("doc_id"))
    p = grouped_prefix_sum(
        gate,
        ["source"],
        value,
        {"cum_before": F.col("n_toks")},
        width=1 << 34,
        inclusive=False,
    )
    ob_ids = (
        p.join(F.broadcast(prior_totals), "source", "left")
        .filter(
            F.col("cum_before") + F.coalesce(F.col("prior_toks"), F.lit(0)) >= budget
        )
        .select("doc_id")
    )
    reason = F.coalesce(
        F.col("r1"),
        F.when(F.col("status") == "exact_dup", "exact_dup"),
        F.when(F.col("status") == "near_dup", "near_dup"),
        F.when(F.col("__bp"), "boilerplate"),
        F.when(F.col("__pd"), "perceptual_dup"),
        F.when(F.col("__sd"), "semantic_dup"),
        F.when(F.col("__ct"), "contaminated"),
        F.when(F.col("__sem"), "contaminated_semantic"),
        F.when(F.col("__ob"), "over_budget"),
        F.lit("kept"),
    )
    return (
        s1.select("doc_id", "source", "n_toks", "r1")
        .join(
            flagged.select("doc_id", "status", "__bp", "__pd", "__sd", "__ct", "__sem"),
            "doc_id",
            "left",
        )
        .join(ob_ids.withColumn("__ob", F.lit(True)), "doc_id", "left")
        .select("doc_id", "source", "n_toks", reason.alias("reason"))
    )


def prior_budget_totals(
    spark: SparkSession, output_path: str, *, before_batch: int | None = None
) -> DataFrame:
    """(source, prior_toks) summed over committed batch outputs — every
    doc that reached the budget stage (kept OR over_budget) counts,
    q226's cum_before semantics."""
    dirs = committed_batch_dirs(spark, output_path)
    paths = [p for b, p in dirs.items() if before_batch is None or b < before_batch]
    if not paths:
        return spark.createDataFrame([], "source string, prior_toks long")
    return (
        spark.read.schema(_OUT_SCHEMA)
        .parquet(*paths)
        .filter(F.col("reason").isin("kept", "over_budget"))
        .groupBy("source")
        .agg(F.sum("n_toks").cast("long").alias("prior_toks"))
    )


def make_curation_ingest_batch_fn(
    index_path: str,
    eval_grams_path: str,
    output_path: str,
    *,
    budget: int = DEFAULT_BUDGET,
    eval_mod: int = DEFAULT_EVAL_MOD,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    semantic_index_path: str | None = None,
    sem_tau: float = DEFAULT_SEM_TAU,
    semantic_dup_index_path: str | None = None,
    sem_dup_tau: float = DEFAULT_SEM_DUP_TAU,
    sem_dup_n_bits: int | None = 6,
    perceptual_index_path: str | None = None,
    auto_compact_ratio: float | None = None,
    bloom_prefilter: bool = False,
    span_index_path: str | None = None,
    span_dup_frac: float = 0.5,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body, exposed for direct replay testing (the
    dedup_ingest convention).

    ``bloom_prefilter`` maintains a Bloom membership sibling at
    ``{index_path}/bloom`` covering the content table's hashes, and
    routes every batch's exact-dup probe through it (two-tier: the
    kilobyte bit frame broadcasts, only bloom-positive hashes reach the
    exact semi-join — q252's production shape). The sibling is
    bootstrapped (or BACKFILLED, when the knob is enabled on an index
    that predates it) from the content table in one pass, appended
    per batch after classification commits, and re-widened from the
    content table when its fill ratio drifts past the design load
    (maybe_rewiden_bloom_index — q254's trigger, checked each batch on
    the kilobyte frame). A crash between the content append and the
    bloom append converges through the committed-batch replay path the
    other indexes use (the appends are idempotent: DISTINCT rows /
    bitwise OR). Classification is invariant to the knob (no Bloom
    false negatives — parity-pinned in tests/test_dedup_index.py).

    ``sem_dup_n_bits`` is the growing semantic-dup index's bucket width
    at BOOTSTRAP (later appends inherit the manifest width). The
    default 6 is the q242/q246 oracle spelling (_LSH_N_BITS); a
    PRODUCTION ingest should pass ``None`` to auto-size from the first
    batch's embedded-passer count via the codified occupancy rule
    (operators/similarity.auto_n_bits) — at fixed width 6 a
    10^5-row-per-trigger stream packs ~n/64 vectors per bucket per
    table and the probe's candidate mass goes quadratic (measured:
    the round-13 batch-size amortization probe stalled exactly here
    before this knob existed; SCALE.md round-13).

    ``auto_compact_ratio`` wires the compaction CADENCE onto the
    operators q244/q245 provide: after each batch's index appends, the
    churn is estimated on one sampled shard of the dedup index's
    content table (``estimated_dup_ratio`` — O(index/n_shards), not a
    full scan); when rows/distinct reaches the threshold, every wired
    standing index is compacted before the next batch runs. Between
    foreachBatch invocations IS the maintenance window the compaction
    contract asks for — no probe can race the swap because the stream
    serializes batch bodies. Classification is invariant across an
    auto-triggered compaction (same key SET before and after — pinned
    in tests/test_curation_ingest.py). RECOMMENDED DEFAULT: 1.3 —
    measured, not guessed (SCALE.md round-14: at steady 2x replay
    churn over 50 sf0.1 batches, ratio 1.3 cut total ingest wall to
    0.78x and final index bytes to 0.30x of the cadence-off run; the
    off-run's per-batch wall GROWS 7 → 32 s with accumulated churn +
    part files, the on-run's stays bounded).

    ``span_index_path`` wires the substring modality's stage
    (operators/dedup.build_span_index / probe_span_index): quality
    passers whose standing-span dup mass reaches ``span_dup_frac`` of
    their tokens are flagged 'boilerplate' (after the text-dup stages,
    before decontamination), and passers' window keys append after the
    batch commits — q260's loop.
    """

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_dir = f"{output_path}/ingest_batch={batch_id}"
        # Schema gate BEFORE the replay short-circuit: the replay path
        # skips classify_batch (whose readable ValueError covers the
        # first run), but append_quality_passers still references the
        # embedding/payload columns when the matching index is wired —
        # a schema drift must fail with the same readable error on BOTH
        # paths, not as a raw AnalysisException mid-replay (ADVICE
        # round 12).
        needs_emb = (
            semantic_index_path is not None or semantic_dup_index_path is not None
        )
        if needs_emb and "embedding" not in batch_df.columns:
            raise ValueError(
                "a semantic index path is set but the batch has no 'embedding' "
                "column — join the embeddings onto the stream upstream of ingest"
            )
        if perceptual_index_path is not None and "payload" not in batch_df.columns:
            raise ValueError(
                "a perceptual index path is set but the batch has no 'payload' "
                "column — join the media payloads onto the stream upstream of ingest"
            )

        def append_quality_passers() -> None:
            t = tokens(F.col("text"))
            passers = batch_df.filter(
                quality_reason(F.col("doc_id"), t, F.col("lang"), eval_mod).isNull()
            )
            if passers.limit(1).count() == 0:
                return
            manifest = _manifest_or_none(spark, index_path)
            if manifest is None:  # bootstrap (first committed batch)
                build_dedup_index(
                    passers, index_path, rows_per_band=rows_per_band, mode="overwrite"
                )
            else:
                build_dedup_index(passers, index_path, mode="append", **manifest)
            if bloom_prefilter:
                # the Bloom sibling tracks the content table it filters
                # for: bootstrap/backfill reads the (already distinct)
                # content table whole; steady state appends just this
                # batch's hashes, then the kilobyte fill check decides
                # whether the width drifted past its design load
                bpath = f"{index_path}/bloom"
                if not _path_exists(spark, f"{bpath}/manifest"):
                    build_bloom_index(
                        spark.read.parquet(f"{index_path}/content").select("ch"),
                        bpath,
                        key_col="ch",
                        mode="overwrite",
                    )
                else:
                    build_bloom_index(
                        passers.select(F.md5(F.col("text")).alias("ch")).distinct(),
                        bpath,
                        key_col="ch",
                        mode="append",
                    )
                    maybe_rewiden_bloom_index(
                        spark,
                        bpath,
                        spark.read.parquet(f"{index_path}/content").select("ch"),
                    )
            if span_index_path is not None:
                # the growing span index admits the same population:
                # every quality passer's window keys, appended AFTER the
                # batch's classification commits (membership-monotone,
                # replay-idempotent — the family rule)
                sboot = not _path_exists(spark, f"{span_index_path}/manifest")
                build_span_index(
                    passers,
                    span_index_path,
                    mode="overwrite" if sboot else "append",
                )
            if perceptual_index_path is not None:
                # the growing perceptual index admits the same population:
                # every quality passer with a payload, fingerprinted and
                # appended AFTER the batch's classification commits
                # (membership-monotone, replay-safe — q247's loop, in
                # place). Emptiness is checked on the RAW payload column
                # so the Arrow dHash pass runs once per batch, inside the
                # build, never a second time just to count (round-13
                # review).
                with_payload = passers.filter(F.col("payload").isNotNull()).select(
                    F.col("doc_id").alias("media_id"), "payload"
                )
                if with_payload.limit(1).count() > 0:
                    pboot = not _path_exists(
                        spark, f"{perceptual_index_path}/manifest"
                    )
                    build_perceptual_index(
                        dhash_arrow(with_payload),
                        perceptual_index_path,
                        mode="overwrite" if pboot else "append",
                    )
            if semantic_dup_index_path is None:
                return
            # the growing semantic-dup index admits the same population:
            # every quality passer with an embedding, appended AFTER the
            # batch's classification commits (membership-monotone, so the
            # replay path can redo it blindly — q242's loop, in place)
            emb = passers.filter(F.col("embedding").isNotNull()).select(
                "doc_id", F.col("embedding")
            )
            if emb.limit(1).count() == 0:
                return
            boot = not _path_exists(spark, f"{semantic_dup_index_path}/manifest")
            build_semantic_index(
                emb,
                semantic_dup_index_path,
                id_col="doc_id",
                # bootstrap resolves the width (None = auto-size from
                # THIS batch's count); appends inherit the manifest's
                # resolved width — build_semantic_index's contract
                n_bits=sem_dup_n_bits if boot else None,
                expanded=False,
                mode="overwrite" if boot else "append",
            )

        def maybe_compact() -> None:
            # auto-compaction cadence: one sampled-shard churn estimate
            # per batch; compact EVERY wired index in the inter-batch
            # maintenance window when it trips (membership-only key
            # sets, so verdicts are invariant across the swap)
            if auto_compact_ratio is None:
                return
            if _manifest_or_none(spark, index_path) is None:
                return  # pre-bootstrap: nothing to estimate or compact
            # a parked .compact.aside/.compact.old means a prior
            # compaction crashed mid-swap and THIS loop's appends may
            # since have recreated the table with only recent rows —
            # force the reconciling rewrite now (_swap_rewrite's
            # reconcile-by-append entry folds the parked copy back in)
            # instead of waiting for a ratio that a near-empty recreated
            # table will never trip (round-13 review)
            parked = any(
                _path_exists(spark, f"{base}/{tbl}.compact.{sib}")
                for base, tbls in (
                    (index_path, ("content", "bands")),
                    (semantic_dup_index_path, ("buckets", "vectors")),
                    (perceptual_index_path, ("bands",)),
                    (span_index_path, ("windows",)),
                )
                if base is not None
                for tbl in tbls
                for sib in ("aside", "old")
            )
            if not parked and (
                estimated_dup_ratio(spark, f"{index_path}/content")
                < auto_compact_ratio
            ):
                return
            compact_dedup_index(spark, index_path)
            if semantic_dup_index_path is not None and _path_exists(
                spark, f"{semantic_dup_index_path}/manifest"
            ):
                compact_semantic_index(spark, semantic_dup_index_path)
            if perceptual_index_path is not None and _path_exists(
                spark, f"{perceptual_index_path}/manifest"
            ):
                compact_perceptual_index(spark, perceptual_index_path)
            if span_index_path is not None and _path_exists(
                spark, f"{span_index_path}/manifest"
            ):
                compact_span_index(spark, span_index_path)

        if _path_exists(spark, f"{batch_dir}/_SUCCESS"):
            # replay of a committed batch: the saved verdicts are
            # authoritative; only the (idempotent) index append is redone
            append_quality_passers()
            maybe_compact()
            return
        if (
            bloom_prefilter
            and _manifest_or_none(spark, index_path) is not None
            and not _path_exists(spark, f"{index_path}/bloom/manifest")
        ):
            # knob enabled on an index that predates the Bloom sibling:
            # backfill from the content table BEFORE the first probe
            build_bloom_index(
                spark.read.parquet(f"{index_path}/content").select("ch"),
                f"{index_path}/bloom",
                key_col="ch",
                mode="overwrite",
            )
        eval_grams = spark.read.parquet(eval_grams_path)
        prior = prior_budget_totals(spark, output_path, before_batch=batch_id)
        verdict = classify_batch(
            batch_df,
            index_path,
            eval_grams,
            prior,
            budget=budget,
            eval_mod=eval_mod,
            semantic_index_path=semantic_index_path,
            sem_tau=sem_tau,
            semantic_dup_index_path=semantic_dup_index_path,
            sem_dup_tau=sem_dup_tau,
            perceptual_index_path=perceptual_index_path,
            bloom_prefilter=bloom_prefilter,
            span_index_path=span_index_path,
            span_dup_frac=span_dup_frac,
        )
        verdict.write.mode("overwrite").parquet(batch_dir)
        append_quality_passers()
        maybe_compact()

    return ingest


def start_curation_ingest_stream(
    docs_stream: DataFrame,
    index_path: str,
    eval_grams_path: str,
    output_path: str,
    checkpoint_dir: str,
    *,
    budget: int = DEFAULT_BUDGET,
    eval_mod: int = DEFAULT_EVAL_MOD,
    semantic_index_path: str | None = None,
    sem_tau: float = DEFAULT_SEM_TAU,
    semantic_dup_index_path: str | None = None,
    sem_dup_tau: float = DEFAULT_SEM_DUP_TAU,
    sem_dup_n_bits: int | None = 6,
    perceptual_index_path: str | None = None,
    auto_compact_ratio: float | None = None,
    bloom_prefilter: bool = False,
    span_index_path: str | None = None,
    span_dup_frac: float = 0.5,
    trigger_available_now: bool = True,
):
    """Wire the ingest body into a checkpointed foreachBatch stream
    (dedup_ingest's scheduled-run shape)."""
    writer = (
        docs_stream.writeStream.foreachBatch(
            make_curation_ingest_batch_fn(
                index_path,
                eval_grams_path,
                output_path,
                budget=budget,
                eval_mod=eval_mod,
                semantic_index_path=semantic_index_path,
                sem_tau=sem_tau,
                semantic_dup_index_path=semantic_dup_index_path,
                sem_dup_tau=sem_dup_tau,
                sem_dup_n_bits=sem_dup_n_bits,
                perceptual_index_path=perceptual_index_path,
                auto_compact_ratio=auto_compact_ratio,
                bloom_prefilter=bloom_prefilter,
                span_index_path=span_index_path,
                span_dup_frac=span_dup_frac,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
