"""Zone-map skip measurement: the empirical payoff of write layouts.

q112 profiles the Morton code's locality; `bucketing.write_sorted`
lays files out by a sort key. This test closes the loop the docstrings
promise: write the SAME rows in three layouts, build the per-file
zone map, and measure how many files a min/max footer check skips for
a rectangle predicate — single-column sort prunes only its own column,
Morton prunes BOTH.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_mingo_tail_spark.operators.zonemap import morton_sql, skip_stats, zone_map
from flink_mingo_tail_spark.tables import load_table

from .conftest import SF_SMOKE

N_FILES = 8


def _layouts(spark, tmp_path):
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars", "text")
    base = str(tmp_path)
    d.withColumn("h", F.md5(F.col("doc_id").cast("string"))).repartitionByRange(
        N_FILES, "h"
    ).drop("h").write.parquet(base + "/shuffled")
    d.repartitionByRange(N_FILES, "doc_id").sortWithinPartitions("doc_id").write.parquet(
        base + "/by_docid"
    )
    (
        d.withColumn("z", F.expr(morton_sql("doc_id", "n_chars")))
        .repartitionByRange(N_FILES, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.parquet(base + "/zorder")
    )
    return base, d.count()


def test_zone_map_covers_every_file_and_row(spark, tmp_path):
    base, n_rows = _layouts(spark, tmp_path)
    zm = zone_map(spark, base + "/by_docid", ["doc_id", "n_chars"])
    rows = zm.collect()
    assert len(rows) == N_FILES
    assert sum(r["n_rows"] for r in rows) == n_rows
    # per-file stats are genuine bounds
    for r in rows:
        assert r["doc_id_min"] <= r["doc_id_max"]
        assert r["n_chars_min"] <= r["n_chars_max"]


def test_skipping_follows_the_layout(spark, tmp_path):
    base, _ = _layouts(spark, tmp_path)

    def skips(layout):
        zm = zone_map(spark, f"{base}/{layout}", ["doc_id", "n_chars"])
        _, s_id = skip_stats(zm, "doc_id", 100, 149)
        _, s_nc = skip_stats(zm, "n_chars", 100, 199)
        return s_id, s_nc

    sh_id, sh_nc = skips("shuffled")
    so_id, so_nc = skips("by_docid")
    zo_id, zo_nc = skips("zorder")

    # hash-shuffled: every file spans ~the full domain — nothing skips
    assert sh_id <= 1 and sh_nc <= 1
    # single-column sort: near-perfect on its own column, blind on the other
    assert so_id >= N_FILES - 3
    assert so_nc <= 1
    # Morton: BOTH dimensions prune — the property neither other layout has
    assert zo_id >= 2 and zo_nc >= 2
    assert min(zo_id, zo_nc) > min(so_id, so_nc)
    assert min(zo_id, zo_nc) > min(sh_id, sh_nc)
