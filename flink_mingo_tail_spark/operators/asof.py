"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native as-of join (SURVEY.md §2B "as-of join"). This is the
shuffle-once formulation: tag both sides, UNION them, and run a single
`last(..., ignorenulls=True)` window per key — one shuffle on the key,
no per-group pandas, no driver loop. Compare with `pd.merge_asof` via
``applyInPandas``: that would move every group through Arrow/Python. At
100 TB the union+window plan stays entirely in Tungsten and scales with
the key cardinality.

Tie rule: right rows sorting at the same timestamp as a left row ARE
eligible (<= semantics); among equal timestamps the largest tiebreaker
wins. Both engines in the oracle comparison use the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    left_tiebreak: str,
    right_tiebreak: str,
) -> DataFrame:
    """Return `left` plus, per row, the latest `right_values` columns among
    right rows with ``right[right_time] <= left[left_time]`` on `key`.

    Right-value columns are suffixed ``_asof`` in the output.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal times => <= semantics
        F.col(left_tiebreak).alias("__tie"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
    )
    tagged_right = right.select(
        F.col(key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).alias("__tie"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__l"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"{v}_asof")
            for v in right_values
        ],
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in lcols]
    return filled.filter(F.col("__side") == 1).select(
        *out_cols, *[f"{v}_asof" for v in right_values]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    left_tiebreak: str,
    right_tiebreak: str,
) -> DataFrame:
    """Forward as-of: per left row, the EARLIEST right row at-or-after
    it on `key` (``right[right_time] >= left[left_time]``) — the
    attribution/next-event direction (click → next purchase), mirror of
    :func:`asof_join`. Same shuffle-once union+window plan, with the
    frame flipped to ``[current row, unbounded following]`` and a
    ``first(..., ignorenulls)`` fill; left rows sort BEFORE right at
    equal timestamps so same-instant right rows are eligible, and among
    equal-time right rows the smallest tiebreaker wins.

    Right-value columns are suffixed ``_next`` in the output.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),  # left sorts before right at equal times => >= semantics
        F.col(left_tiebreak).alias("__tie"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_values],
    )
    tagged_right = right.select(
        F.col(key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.col(right_tiebreak).alias("__tie"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__l"),
        *[F.col(v).alias(f"__r_{v}") for v in right_values],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        "__side",
        "__l",
        *[
            F.first(f"__r_{v}", ignorenulls=True).over(w).alias(f"{v}_next")
            for v in right_values
        ],
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in lcols]
    return filled.filter(F.col("__side") == 0).select(
        *out_cols, *[f"{v}_next" for v in right_values]
    )
