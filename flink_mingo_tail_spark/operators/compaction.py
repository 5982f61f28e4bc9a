"""Small-file compaction for parquet directories (write-path maintenance).

Streaming sinks and incremental batch appends fragment tables into
thousands of small files (every micro-batch of the CDC pipeline appends
one file per partition — the reference's per-record ES flush has the
same pathology one level down). Small files poison the read path at
scale: each costs a namenode/liststore round-trip, a footer read, and a
task-scheduling slot, so a 100 TB table in 1 MB pieces is ~10^8 files
and unplannable. Compaction is the standing maintenance job that
bin-packs a fragmented directory into ~target-size files.

Sizing comes from the files Spark actually scanned (``df.inputFiles``)
rather than a separate listing, so the operator composes with partition
pruning: compact one hive partition by pointing it at that partition's
directory. The rewrite is one narrow round-robin shuffle
(``repartition(n)``) — even output sizes, full parallelism; ``coalesce``
is deliberately NOT the default because it merges without a shuffle and
inherits upstream skew (one fat input partition → one fat output file),
but it is exposed for the reduce-only case where avoiding the shuffle
matters more than evenness.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
    use_coalesce: bool = False,
) -> dict:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~``target_file_bytes``
    files. Returns ``{"files_before", "bytes_total", "files_after"}``.

    Writes to a NEW directory (never in place): the swap-after-write
    pattern keeps readers consistent — at scale the final move is a
    metastore location flip or an atomic manifest commit, not a file
    juggle."""
    df = spark.read.parquet(src_dir)
    paths = [urlparse(p).path for p in df.inputFiles()]
    bytes_total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    n = max(1, math.ceil(bytes_total / target_file_bytes))
    out = df.coalesce(n) if use_coalesce else df.repartition(n)
    out.write.mode("overwrite").parquet(dst_dir)
    after = spark.read.parquet(dst_dir)
    return {
        "files_before": len(paths),
        "bytes_total": bytes_total,
        "files_after": len(after.inputFiles()),
    }
