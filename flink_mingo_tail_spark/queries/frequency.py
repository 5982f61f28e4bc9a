"""Frequency-analysis queries over the document corpus.

Heavy hitters with bounded executor memory and corpus-vs-target
importance weighting — the frequency-side operations an LLM training-
data pipeline runs on raw text (frequent-n-gram audits, DSIR-style
mixture reweighting). Reference parity: the reference engine
(JaiHirsch/flink-mingo-tail) has no batch analytics surface; these
extend the declared engine the same way the dedup/similarity families
do (SURVEY.md §2C).

Cross-engine determinism: heavy-hitter output is EXACT (candidate
generation is a guaranteed superset, the verify pass recounts exactly),
and every emitted number is an integer count or a micro-scaled long, so
the driver's value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.dedup import tokens, word_shingles
from flink_mingo_tail_spark.operators.heavyhitters import exact_heavy_hitters
from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table, spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return spread(load_table(spark, sf_dir, "documents"))


#: phi = 1/K_HH: report every bigram covering >= 1/750 of all bigram
#: occurrences. MG capacity 1024 >= K keeps candidate generation lossless.
_HH_K = 750
_HH_CAP = 1024

_BIGRAM_SQL = """
    t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t)
"""


@query(
    "q153_heavy_hitters",
    oracle=f"""
    WITH {_BIGRAM_SQL},
    tot AS (SELECT count(*) AS n_total FROM b)
    SELECT bigram, count(*) AS cnt, (SELECT n_total FROM tot) AS n_total
    FROM b GROUP BY bigram
    HAVING count(*) * {_HH_K} >= (SELECT n_total FROM tot)
    ORDER BY cnt DESC, bigram
    """,
)
def q153_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi=1/750 heavy-hitter word bigrams via two-pass
    distributed Misra-Gries (operators/heavyhitters.py).

    Scale shape: pass 1 summarizes each partition to <= 1024 rows in
    O(capacity) memory — the shuffle after it moves summaries, not the
    domain — and pass 2 exact-counts only broadcast candidates. The
    naive groupBy the oracle runs is exactly what this avoids: at 100 TB
    the bigram domain is billions of keys and the full-domain shuffle
    (plus O(distinct-per-partition) map-side hash state) dominates; here
    shuffle volume is bounded by capacity x partitions regardless of
    domain size. Output is EXACT, so the oracle is the naive spelling.
    """
    d = _docs(spark, sf_dir)
    occurrences = d.select(
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bigram")
    )
    hh = exact_heavy_hitters(occurrences, "bigram", k=_HH_K, capacity=_HH_CAP)
    return hh.select("bigram", "cnt", "n_total").orderBy(F.col("cnt").desc(), "bigram")
