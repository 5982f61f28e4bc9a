"""Scalable EXACT percentile (rank-selection via approx bracketing).

Spark's built-in ``percentile`` aggregates a value→count hash map
(partial-aggregated map-side), so its true cost scales with DISTINCT
values per group, not rows: on bounded domains (integer quantities,
price grids) it is effectively a word-count and hard to beat. Its
ceiling is CONTINUOUS domains — distinct ≈ n — where the per-group
map degenerates to n entries and the final merge lands n-sized maps
on ONE reducer per group (measured on 30M rows / 30M distinct,
local[32]: built-in 36.5 s vs this operator 7.6 s and the gap grows
with n; at 100 TB with few groups that merge is a single-task
multi-TB hash map, i.e. OOM). Decision rule, measured in SCALE.md:

* bounded / low-cardinality value domain → use the built-in;
* continuous / high-cardinality domain → use this operator.

It computes the SAME interpolated percentile with distributed
aggregation passes and a driver-safe footprint, routing each group by
size:

* **small groups** (n <= accuracy): the group's complete sorted value
  array is collected IN THE SAME aggregation pass as the large route
  (bounded at `accuracy` elements by the routing criterion itself) and
  interpolated in-expression — below that size the approx bracket's
  rank margin (4n/accuracy < 4 ranks) cannot absorb the sketch's +-1
  rank discretization, so bracketing is both unnecessary and unsafe
  there. Folding the route into one aggregate keeps the operator at
  TWO data scans total (a separate filtered small/large branch pair
  would make three).
* **large groups** (n > accuracy) — the 100 TB path, steps all
  map-side-combinable hash aggregates (parallelism = input partitions,
  never #groups):

  1. **stats pass** — per group: ``count`` plus a ``percentile_approx``
     bracket ``[lo, hi]`` at ``p +- 4/accuracy``. Greenwald-Khanna
     guarantees rank error <= n/accuracy, leaving >= 3n/accuracy > 3
     ranks of slack on each side of the target.
  2. **select pass** — per group: ``count(x < lo)``, the duplicate-run
     sizes of the two bracket endpoints, and the sorted array of STRICT
     interior values. The interior is rank-bounded at ~8n/accuracy
     (0.08% at the default) no matter how duplicated the data is —
     endpoint runs are counted, never collected, so a million-row tie
     at the median costs two longs.
  3. **index read-out** — rank below the lo-run -> lo; inside the
     interior -> array lookup; inside the hi-run -> hi. An out-of-range
     rank (approx guarantee violated) raises rather than returning a
     plausible wrong answer.

Pick ``accuracy ~ group_rows/10_000`` as data grows to keep interiors
bounded. The interpolation replicates Spark's ``Percentile`` formula
term-for-term — ``(higher - pos) * lowerValue + (pos - lower) *
higherValue`` — so results are BITWISE equal to the built-in (asserted
in tests/test_percentile.py) and hence inherit the built-in's DuckDB
``quantile_cont`` oracle parity.

Reference parity note: the reference engine has no percentile operator
(SURVEY.md §2B aggregations list); this is part of the north-star
analytics surface, engineered for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pick(alias: str, rank: Column) -> Column:
    """Order statistic at 0-based ``rank`` (among the group's non-null
    values) read from the bracket decomposition: lo-run | interior | hi-run."""
    lo = F.col(f"_lo_{alias}").cast("double")
    hi = F.col(f"_hi_{alias}").cast("double")
    idx = rank - F.col(f"_below_{alias}")
    n_lo = F.col(f"_nlo_{alias}")
    interior = F.col(f"_in_{alias}")
    in_end = n_lo + F.size(interior)
    return (
        # try_element_at: CaseWhen branches are not reliably lazy under
        # whole-stage codegen (subexpression elimination), so the array
        # probe must itself tolerate an out-of-range index.
        F.when((idx >= 0) & (idx < n_lo), lo)
        .when(idx < in_end, F.try_element_at(interior, (idx - n_lo + 1).cast("int")))
        .when(idx < in_end + F.col(f"_nhi_{alias}"), hi)
        .otherwise(F.raise_error(F.lit(f"percentile bracket missed target rank for {alias}")))
    )


def exact_percentiles(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, float, str]],
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact interpolated percentiles per group, without large per-group
    sorts. ``specs`` is ``[(column, p, output_alias), ...]``. Returns one
    row per key combination with one double column per spec, bitwise
    equal to ``F.percentile(column, p)``.

    A group takes the rank-select path only when EVERY spec column has
    n > accuracy there (mixed-size routing per spec would force an
    n-way join of per-spec results; a group that is small for any spec
    is cheap to sort for all of them).
    """
    margin = 4.0 / accuracy

    # ONE approx sketch per distinct column, not per spec: a GK sketch
    # answers any number of percentile probes, so specs sharing a
    # column share one sketch and read their [lo, hi] bracket out of
    # the combined result array (q125 asks 7 septiles of one column —
    # 7 sketches over the same 600k values cost ~3s of pure waste).
    by_col: dict[str, list[tuple[float, str]]] = {}
    for col, p, alias in specs:
        by_col.setdefault(col, []).append((p, alias))

    stats_aggs = []
    bracket_reads = []  # (alias, column-expr) projected after the agg
    for col, col_specs in by_col.items():
        ps: list[float] = []
        for p, alias in col_specs:
            p_lo, p_hi = max(0.0, p - margin), min(1.0, p + margin)
            idx = len(ps)
            ps.extend([p_lo, p_hi])
            # r14 optimization: carry the bracket as TWO SCALAR double
            # columns, not a 2-element array — the select pass reuses
            # the carried columns as GROUPING KEYS, and an array-typed
            # grouping key disqualifies whole-stage HashAggregate
            # (Spark falls back to a sort-based aggregate: a full sort
            # of the fact rows, measured ~2.5 s of q125's wall).
            # Scalar keys keep the identical values hash-aggregable.
            bracket_reads.append((f"_lo_{alias}", F.col(f"_brall_{col}")[idx]))
            bracket_reads.append((f"_hi_{alias}", F.col(f"_brall_{col}")[idx + 1]))
            stats_aggs.append(F.count(col).alias(f"_n_{alias}"))
        stats_aggs.append(
            F.percentile_approx(
                F.col(col).cast("double"),
                F.array(*[F.lit(p) for p in ps]),
                F.lit(accuracy),
            ).alias(f"_brall_{col}")
        )
    stats = df.groupBy(*keys).agg(*stats_aggs)
    stats = stats.select(
        *keys,
        *[F.col(f"_n_{a}") for _, _, a in specs],
        *[expr.alias(name) for name, expr in bracket_reads],
    )

    n_cols = [F.col(f"_n_{a}") for _, _, a in specs]
    min_n = F.least(*n_cols) if len(n_cols) > 1 else n_cols[0]
    is_large = min_n > F.lit(accuracy)
    joined = df.join(F.broadcast(stats), keys)

    # ONE select pass for both routes (a filtered small branch + a
    # filtered large branch would each rescan the full input — three
    # data passes total; this keeps the operator at two). Per group:
    # bracket decomposition for the large route, and — only when the
    # group is small — the complete sorted value array (bounded at
    # `accuracy` rows by the routing criterion itself).
    # Measured dead end (do not retry): merging the _in/_all lists into
    # one collect_list with a two-branch when() is ~7-10% SLOWER on the
    # 7-spec plan — the extra branch evaluates per row, while the
    # separate small-route list short-circuits on one boolean.
    select_aggs = []
    for col, p, alias in specs:
        lo = F.col(f"_lo_{alias}").cast("double")
        hi = F.col(f"_hi_{alias}").cast("double")
        c = F.col(col).cast("double")
        select_aggs.extend(
            [
                F.count(F.when(is_large & (c < lo), True)).alias(f"_below_{alias}"),
                F.count(F.when(is_large & (c == lo), True)).alias(f"_nlo_{alias}"),
                F.count(F.when(is_large & (c == hi) & (hi != lo), True)).alias(f"_nhi_{alias}"),
                F.sort_array(
                    F.collect_list(F.when(is_large & (c > lo) & (c < hi), c))
                ).alias(f"_in_{alias}"),
            ]
        )
    # r14 optimization: the small-route complete-array list depends only
    # on the COLUMN (identical for every spec sharing it) — collect it
    # once per distinct column instead of once per spec (q125's 7
    # septiles shared one column and paid 7 identical list aggregates).
    for col in by_col:
        select_aggs.append(
            F.sort_array(
                F.collect_list(F.when(~is_large, F.col(col).cast("double")))
            ).alias(f"_all_{col}")
        )
    # The readout needs the per-group n and bracket columns. They are
    # CONSTANT within a group (computed per group, broadcast-joined), so
    # they ride along as extra GROUPING KEYS: group count is unchanged,
    # no aggregate slots are spent carrying them (14 first()s measured
    # ~40% of the select pass on q125's 35-aggregate plan), and no
    # second join is needed — the earlier `.join(broadcast(stats))`
    # readout re-COMPUTED the whole stats pass, GK sketch included
    # (differential column pruning made the two broadcast subtrees
    # non-identical, so ReuseExchange never fired: q125's plan scanned
    # the fact table 4x / built the sketch twice; now 2 scans, 1 sketch
    # — pinned in tests/test_plans.py).
    carry = (
        [f"_lo_{a}" for _, _, a in specs]
        + [f"_hi_{a}" for _, _, a in specs]
        + [f"_n_{a}" for _, _, a in specs]
    )
    picked = joined.groupBy(*keys, *carry).agg(*select_aggs)

    out_cols = [F.col(k) for k in keys]
    for col, p, alias in specs:
        n = F.col(f"_n_{alias}")
        # Spark Percentile.getPercentile: position = p * (n - 1).
        pos = F.lit(p) * (n - F.lit(1)).cast("double")
        lower = F.floor(pos)
        higher = F.ceil(pos)
        # Large route: order statistics read from the bracket decomposition.
        v_lower = _pick(alias, lower)
        exact_large = F.when(higher == lower, v_lower).otherwise(
            (higher.cast("double") - pos) * v_lower
            + (pos - lower.cast("double")) * _pick(alias, higher)
        )
        # Small route: the same interpolation formula (term-for-term the
        # built-in Percentile's) over the complete sorted array. Indexes
        # clamped + try_element_at: CaseWhen branches are not reliably
        # lazy under codegen (see _pick), and n = 0 (all-null group)
        # must yield NULL, not an ANSI index error.
        arr = F.col(f"_all_{col}")
        at_lo = F.try_element_at(arr, F.greatest(lower + 1, F.lit(1)).cast("int"))
        at_hi = F.try_element_at(arr, F.greatest(higher + 1, F.lit(1)).cast("int"))
        exact_small = F.when(n == 0, F.lit(None).cast("double")).otherwise(
            F.when(higher == lower, at_lo).otherwise(
                (higher.cast("double") - pos) * at_lo + (pos - lower.cast("double")) * at_hi
            )
        )
        # Routing flag, recomputed from the carried counts.
        n_all = [F.col(f"_n_{a}") for _, _, a in specs]
        large_flag = (F.least(*n_all) if len(n_all) > 1 else n_all[0]) > F.lit(accuracy)
        out_cols.append(F.when(large_flag, exact_large).otherwise(exact_small).alias(alias))
    return picked.select(*out_cols)
