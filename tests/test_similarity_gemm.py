"""GEMM-scored brute-force kNN (q76b) must produce exactly the same
neighbor ranking as the expression-fold path (q76)."""

from __future__ import annotations

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()


def test_gemm_ranks_equal_fold_ranks(spark):
    fold = REGISTRY["q76_knn_bruteforce"].fn(spark, SF_ORACLE)
    gemm = REGISTRY["q76b_knn_gemm"].fn(spark, SF_ORACLE)
    f = [(r.query_id, r.vec_id, r.rank) for r in fold.collect()]
    g = [(r.query_id, r.vec_id, r.rank) for r in gemm.collect()]
    assert f == g
