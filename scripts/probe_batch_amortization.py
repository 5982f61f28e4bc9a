"""Batch-size amortization probe for the streaming curation ingest.

SCALE.md has claimed since round 12 that q241/q242/q246's ~10-16 s per
100-row fixture batch measures the local[32] SCHEDULING FLOOR (a fixed
number of Spark jobs per trigger: probes, joins, appends), not the
operator — and that production batch sizes amortize it. This probe
MEASURES that claim in one session: the full-config ingest body (text
dup index + eval gram set + eval semantic index + growing semantic-dup
index + growing perceptual index — q246+q248's union) is driven with
3 batches at each of several batch sizes, built by replicating the
sf0.1 documents corpus with shifted ids (eval_mod residues preserved;
text perturbed per replica so content hashes differ; embeddings reused
per original id; payloads synthesized post-shift).

Per size it reports each batch's wall and the mean of the
post-bootstrap batches (batch 0 additionally pays the one-time index
builds). The claim holds if wall grows FAR sub-linearly in batch rows:
e.g. 1000x the rows in far less than 1000x the wall.

Usage: python scripts/probe_batch_amortization.py [--bloom] [sizes...]
Defaults: 100 1000 10000 100000. Prints one JSON line per size.
``--bloom`` enables the round-14 two-tier Bloom prefilter on the
exact-dup probe (bloom_prefilter=True) so its delta can be measured
against the direct run at the same sizes.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_mingo_tail_spark.operators.multimodal import (  # noqa: E402
    synthesize_media_variants,
)
from flink_mingo_tail_spark.session import build_session  # noqa: E402
from flink_mingo_tail_spark.streaming.curation_ingest import (  # noqa: E402
    build_eval_gram_set,
    build_eval_semantic_index,
    make_curation_ingest_batch_fn,
)
from flink_mingo_tail_spark.tables import load_table, spread  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_BATCHES = 3
ID_STRIDE = 10_000_000  # multiple of eval_mod=100: residues preserved


def replicated_docs(spark, total_rows: int):
    d = spread(load_table(spark, SF_DIR, "documents"))
    base_n = d.count()
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).head()
    assert hi - lo + 1 == base_n, "probe assumes contiguous doc_ids"
    n_rep = -(-total_rows // base_n)
    reps = spark.range(n_rep).withColumnRenamed("id", "k")
    docs = (
        d.crossJoin(reps)
        .withColumn("seq", (F.col("k") * base_n + F.col("doc_id") - F.lit(lo)))
        .filter(F.col("seq") < total_rows)
        .withColumn("doc_id", F.col("doc_id") + F.col("k") * ID_STRIDE)
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" rep"), F.col("k").cast("string"))
        )
    )
    e = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    docs = docs.join(
        e, F.pmod(docs.doc_id, F.lit(ID_STRIDE)) == e.vec_id, "left"
    ).drop("vec_id")
    # Rotate each replica's embedding by k positions: verbatim-copied
    # vectors collapse the sign-LSH buckets (2000 distinct vectors
    # across 300k rows -> every bucket holds ~100 copies -> the
    # candidate-pair mass goes quadratic, a synthesis artifact the
    # dedup family documents for its copy corpora). Rotation preserves
    # the norm and scatters replicas across buckets, keeping occupancy
    # at realistic levels so the probe measures the OPERATOR's growth,
    # not the artifact's.
    dim = 64
    docs = docs.withColumn(
        "embedding",
        F.when(
            F.col("embedding").isNotNull(),
            F.expr(
                f"concat(slice(embedding, CAST(k % {dim} AS INT) + 1,"
                f" {dim} - CAST(k % {dim} AS INT)),"
                f" slice(embedding, 1, CAST(k % {dim} AS INT)))"
            ),
        ),
    )
    media = synthesize_media_variants(
        docs.select(F.col("doc_id"), F.col("text"))
    ).select(F.col("media_id").alias("doc_id"), "payload")
    return docs.join(media, "doc_id")


def run_size(spark, batch_rows: int, bloom_prefilter: bool = False) -> dict:
    docs = replicated_docs(spark, batch_rows * N_BATCHES).persist()
    docs.count()  # materialize input so ingest timing excludes synthesis
    tmp = tempfile.mkdtemp(prefix=f"fmts-amort-{batch_rows}-")
    try:
        d_orig = spread(load_table(spark, SF_DIR, "documents"))
        e_orig = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        build_eval_gram_set(d_orig, f"{tmp}/eval_grams")
        build_eval_semantic_index(e_orig, f"{tmp}/sem_index")
        ingest = make_curation_ingest_batch_fn(
            f"{tmp}/index",
            f"{tmp}/eval_grams",
            f"{tmp}/out",
            semantic_index_path=f"{tmp}/sem_index",
            semantic_dup_index_path=f"{tmp}/semdup_index",
            # the production config: auto-size the growing index's bucket
            # width from the bootstrap batch (at fixed width 6 a 10^5-row
            # batch packs ~n/64 vectors per bucket and the candidate mass
            # goes quadratic — this probe found that, see the knob's doc)
            sem_dup_n_bits=None,
            perceptual_index_path=f"{tmp}/ph_index",
            # --bloom: route the exact-dup probe through the kilobyte
            # Bloom sibling (two-tier, round-14) to measure its delta
            # against the direct semi-join at production batch sizes
            bloom_prefilter=bloom_prefilter,
        )
        walls = []
        for b in range(N_BATCHES):
            batch = docs.filter(
                (F.col("seq") >= b * batch_rows) & (F.col("seq") < (b + 1) * batch_rows)
            ).drop("seq", "k")
            t0 = time.monotonic()
            ingest(batch, b)
            walls.append(round(time.monotonic() - t0, 2))
        post = walls[1:]
        return {
            "batch_rows": batch_rows,
            "bloom_prefilter": bloom_prefilter,
            "walls_s": walls,
            "mean_post_bootstrap_s": round(sum(post) / len(post), 2),
        }
    finally:
        docs.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    bloom = "--bloom" in args
    sizes = [int(a) for a in args if a != "--bloom"] or [100, 1_000, 10_000, 100_000]
    spark = build_session()
    for size in sizes:
        print(json.dumps(run_size(spark, size, bloom_prefilter=bloom)), flush=True)


if __name__ == "__main__":
    main()
