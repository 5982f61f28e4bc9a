"""LSH ANN quality: recall of q78 (approximate) vs q76 (exact top-k).

The LSH path has no SQL oracle (approximate by construction), so this
test is its correctness gate: with 8-bit sign-LSH + Hamming-1 multiprobe
on 64-dim near-random vectors, candidate buckets cover a large share of
true neighbors; we assert a conservative floor and exactness of the
scores it does return.
"""

from __future__ import annotations

from flink_mingo_tail_spark.queries import load_registry

from .conftest import SF_ORACLE

REGISTRY = load_registry()


def test_lsh_recall_vs_bruteforce(spark):
    exact = REGISTRY["q76_knn_bruteforce"].fn(spark, SF_ORACLE).collect()
    approx = REGISTRY["q78_knn_lsh"].fn(spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    approx_scores = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
        approx_scores[(r.query_id, r.vec_id)] = r.cos_sim

    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f} ({hits}/{total})"

    # Scores for returned pairs must equal the exact cosine (re-rank is exact).
    exact_scores = {(r.query_id, r.vec_id): r.cos_sim for r in exact}
    for key, score in approx_scores.items():
        if key in exact_scores:
            assert score == exact_scores[key], f"score drift for {key}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF gate (q79 has no SQL oracle): nprobe=4 of 8 cells on this
    corpus measures 0.68 recall; assert a conservative floor, plus exact
    re-rank scores for every pair IVF does return."""
    exact = REGISTRY["q76_knn_bruteforce"].fn(spark, SF_ORACLE).collect()
    approx = REGISTRY["q79_knn_ivf"].fn(spark, SF_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    approx_scores = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
        approx_scores[(r.query_id, r.vec_id)] = r.cos_sim

    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f} ({hits}/{total})"

    exact_scores = {(r.query_id, r.vec_id): r.cos_sim for r in exact}
    for key, score in approx_scores.items():
        if key in exact_scores:
            assert score == exact_scores[key], f"score drift for {key}"

    # Full k rows per query: probed cells always hold >= k candidates here.
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), f"rank gaps for query {q}"


def test_lsh_returns_k_per_query(spark):
    approx = REGISTRY["q78_knn_lsh"].fn(spark, SF_ORACLE).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), f"rank gaps for query {q}"


def test_pq_adc_recall_vs_bruteforce(spark):
    """q152 (PQ + ADC + exact re-rank) recall gate vs exact q76:
    8x16 spherical sub-quantizers with a 100-candidate shortlist
    measured 0.84 recall@5 at both test SFs on these near-orthogonal
    synthetic vectors; gate a conservative 0.6 floor. Returned scores
    must equal the exact cosine (the re-rank stage is exact)."""
    exact = REGISTRY["q76_knn_bruteforce"].fn(spark, SF_ORACLE).collect()
    approx = REGISTRY["q152_pq_adc_knn"].fn(spark, SF_ORACLE).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets: dict = {}
    approx_scores = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
        approx_scores[(r.query_id, r.vec_id)] = r.cos_sim

    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert recall >= 0.6, f"PQ/ADC recall collapsed: {recall:.2f} ({hits}/{total})"

    exact_scores = {(r.query_id, r.vec_id): r.cos_sim for r in exact}
    for key, score in approx_scores.items():
        if key in exact_scores:
            assert score == exact_scores[key], f"score drift for {key}"


def test_pq_encoded_table_is_narrow(spark):
    """The PQ point at 100 TB: the candidate scan reads codes, not
    vectors. pq_encode must DROP the embedding column, and the codes
    must be m small ints within the codebook range."""
    from flink_mingo_tail_spark.operators.similarity import pq_encode, train_pq_codebooks
    from flink_mingo_tail_spark.queries.similarity import _emb

    e = _emb(spark, SF_ORACLE)
    books = train_pq_codebooks(e, m_subspaces=8, k_sub=16, n_iter=1, seed=42)
    enc = pq_encode(e, books)
    assert "embedding" not in enc.columns and "pq_codes" in enc.columns
    rows = enc.select("pq_codes").limit(50).collect()
    for r in rows:
        assert len(r.pq_codes) == 8
        assert all(0 <= c < 16 for c in r.pq_codes)


def test_ivfpq_composition_recall(spark):
    """IVF-PQ (coarse cell pruning + codes-only ADC + exact re-rank)
    must keep useful recall while touching only nprobe/k_cells of the
    encoded rows. Composition of tested pieces; gate is looser than
    pure PQ because cell pruning can evict true neighbors the ADC
    stage never sees."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        knn_ivfpq,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from flink_mingo_tail_spark.queries.similarity import _emb

    e = _emb(spark, SF_ORACLE)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cells = train_ivf_centroids(e, k_cells=8, n_iter=2, seed=42)
    books = train_pq_codebooks(e, m_subspaces=8, k_sub=16, n_iter=2, seed=42)
    approx = knn_ivfpq(q, e, 5, cells, books, nprobe=4, shortlist=100).collect()

    exact = REGISTRY["q76_knn_bruteforce"].fn(spark, SF_ORACLE).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(exact_sets[qid] & approx_sets.get(qid, set())) for qid in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.4, f"IVF-PQ recall collapsed: {hits}/{total}"
    # scores are exact cosines (re-rank stage)
    exact_scores = {(r.query_id, r.vec_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert r.cos_sim == exact_scores[(r.query_id, r.vec_id)]


def test_semdedup_kept_set_is_independent_at_tau(spark):
    """q170 invariant: if two kept rows in one cell had cosine >= tau,
    the larger-id one would have been dropped — so the kept set is an
    independent set at the (rounded) threshold within every cell; and
    every dropped row has at least one smaller-id >= tau neighbor."""
    import itertools
    import math

    from flink_mingo_tail_spark.queries.similarity import _SEMDEDUP_TAU

    kept_rows = REGISTRY["q170_semdedup_prune"].fn(spark, SF_ORACLE).collect()
    kept = {r.vec_id for r in kept_rows}

    from flink_mingo_tail_spark.tables import load_table

    all_rows = load_table(spark, SF_ORACLE, "embeddings").collect()
    by_cell: dict[int, list] = {}
    for r in all_rows:
        by_cell.setdefault(r.label, []).append(r)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    dropped_with_witness = set()
    for cell in by_cell.values():
        cell.sort(key=lambda r: r.vec_id)
        for a, b in itertools.combinations(cell, 2):  # a.vec_id < b.vec_id
            c = cos([float(x) for x in a.embedding], [float(x) for x in b.embedding])
            if c >= _SEMDEDUP_TAU:
                assert not (a.vec_id in kept and b.vec_id in kept), (
                    f"kept pair ({a.vec_id},{b.vec_id}) cos={c}"
                )
                dropped_with_witness.add(b.vec_id)

    dropped = {r.vec_id for r in all_rows} - kept
    assert dropped == dropped_with_witness, (
        "dropped set must equal rows having a smaller-id >= tau neighbor"
    )


def test_assign_cells_join_equals_literal_path(spark):
    """Large-k assignment twin (verdict round-6 #8): the broadcast-join
    argmin must assign every vector to the SAME cell as the
    literal-fold path, and training must be invariant to the strategy."""
    import numpy as np
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        _nearest_cells,
        assign_cells_join,
        train_ivf_centroids,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    cents = train_ivf_centroids(e, k_cells=8, n_iter=1, seed=42)
    lit = {
        r.vec_id: r.cell
        for r in e.select(
            "vec_id", _nearest_cells(F.col("embedding"), cents)[0]["cell"].alias("cell")
        ).collect()
    }
    joined = {
        r.vec_id: r._cell
        for r in assign_cells_join(e, cents).select("vec_id", "_cell").collect()
    }
    assert lit == joined

    # full training runs bit-identically under either strategy
    c_lit = train_ivf_centroids(e, k_cells=8, n_iter=2, seed=42, assign_method="literal")
    c_join = train_ivf_centroids(e, k_cells=8, n_iter=2, seed=42, assign_method="join")
    assert np.array_equal(c_lit, c_join)


def test_assign_cells_join_large_k_smoke(spark):
    """k=128 — the regime the literal path is wrong for (k x dim
    literals blow codegen): the join path must still assign every
    vector to a valid cell, exactly one per vector."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        assign_cells_join,
        train_ivf_centroids,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    cents = train_ivf_centroids(e, k_cells=128, n_iter=1, seed=42)  # auto => join
    assert cents.shape[0] == 128
    a = assign_cells_join(e, cents)
    n = e.count()
    assert a.count() == n
    cells = a.agg(F.min("_cell"), F.max("_cell")).first()
    assert 0 <= cells[0] and cells[1] <= 127


def test_sampled_training_equals_manual_subset_training(spark):
    """sample_fraction parity (round-7 verdict #4): training with the
    built-in deterministic hash-sample must be BIT-IDENTICAL to
    training at fraction=1.0 on a corpus pre-filtered by the same
    predicate — i.e. the knob is exactly "run Lloyd on the md5 sample",
    nothing else. With that, the DuckDB replay contract (q79) extends
    to the sampled path for free."""
    import numpy as np
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        train_ivf_centroids,
        train_sample_predicate,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    frac = 0.25
    sampled_knob = train_ivf_centroids(
        e, k_cells=8, n_iter=2, seed=42, sample_fraction=frac
    )
    manual_subset = e.filter(train_sample_predicate("vec_id", 42, frac))
    n_sub = manual_subset.count()
    assert 8 <= n_sub < e.count()  # a real subset, big enough to init
    sampled_manual = train_ivf_centroids(manual_subset, k_cells=8, n_iter=2, seed=42)
    assert np.array_equal(sampled_knob, sampled_manual)

    # and the sample genuinely changes the statistics vs full training
    full = train_ivf_centroids(e, k_cells=8, n_iter=2, seed=42)
    assert not np.array_equal(sampled_knob, full)


def test_auto_sizing_rule_pure_arithmetic():
    """auto_size_training IS the SCALE.md k∝n / fraction∝n rule."""
    from flink_mingo_tail_spark.operators.similarity import auto_size_training

    # k = ceil(n / target_cell_size), fraction = min(1, target/n)
    assert auto_size_training(1, 1024, 100) == (1, 1.0)
    assert auto_size_training(1024, 1024, 100) == (1, 100 / 1024)
    assert auto_size_training(1025, 1024, 100) == (2, 100 / 1025)
    k, frac = auto_size_training(10**12, 1024, 262_144)
    assert k == -(-(10**12) // 1024) and 0 < frac < 1e-6
    import pytest

    with pytest.raises(ValueError):
        auto_size_training(0)


def test_auto_sized_training_equals_explicit(spark):
    """k_cells=None / sample_fraction=None must train bit-identically
    to passing the auto-derived values explicitly (round-8 verdict #3:
    the sizing rule becomes executable without changing the replay
    contract of any explicit-value caller)."""
    import numpy as np
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        auto_size_training,
        train_ivf_centroids,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    n = e.count()
    # knobs chosen so BOTH auto paths are non-trivial on the fixture:
    # several cells, and a genuine sub-1.0 training fraction
    cell, target = max(1, n // 6), max(8, n // 4)
    auto = train_ivf_centroids(
        e, k_cells=None, n_iter=1, seed=42, sample_fraction=None,
        target_cell_size=cell, target_sample_rows=target,
    )
    k, frac = auto_size_training(n, target_cell_size=cell, target_sample_rows=target)
    assert k >= 2 and 0.0 < frac < 1.0
    explicit = train_ivf_centroids(
        e, k_cells=k, n_iter=1, seed=42, sample_fraction=frac
    )
    assert np.array_equal(auto, explicit)


def test_sample_threshold_hex_bounds():
    from flink_mingo_tail_spark.operators.similarity import sample_threshold_hex

    assert sample_threshold_hex(0.25) == "40000000"
    assert sample_threshold_hex(0.5) == "80000000"
    # fractions within 2^-33 of 1 round to 2^32 = 9 hex chars; the
    # threshold must clamp to the max 8-char value, not silently turn
    # the lexicographic compare into a ~6% sample (round-8 advice)
    assert sample_threshold_hex(1.0 - 2.0**-40) == "ffffffff"
    assert len(sample_threshold_hex(1.0 - 2.0**-40)) == 8
    import pytest

    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            sample_threshold_hex(bad)


def test_ivf_cell_partitioned_layout_prunes_probe_reads(spark, tmp_path):
    """knn_ivf's docstring promises that a corpus WRITTEN partitioned by
    cell turns the probe join into partition-PRUNED reads (only
    nprobe/k_cells of the bytes scanned). Cash that claim on real
    files: write the assigned corpus with partitionBy("cell"), probe
    two cells, and assert both the plan's partition filter and the
    actual file set shrink accordingly."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        assign_cells_join,
        train_ivf_centroids,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    cents = train_ivf_centroids(e, k_cells=8, n_iter=1, seed=42)
    assigned = assign_cells_join(e, cents, out="cell")
    out = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cell").parquet(out)

    stored = spark.read.parquet(out)
    probed = stored.filter(F.col("cell").isin(1, 3))
    # planning-time pruning: the cell predicate becomes a PARTITION
    # filter on the scan (directories never listed into the read) and
    # leaves NO post-scan data filter behind. (inputFiles() reflects the
    # unpruned base relation, so the plan string is the evidence.)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [cell" in scan_line and "IN (1,3)" in scan_line
    assert "DataFilters: []" in scan_line
    # row parity with the in-memory assignment
    expect = assigned.filter(F.col("cell").isin(1, 3)).count()
    assert probed.count() == expect


def test_sampled_pq_codebooks_equal_manual_subset(spark):
    """train_pq_codebooks(sample_fraction=f) must equal training at
    fraction 1.0 on the same pre-filtered corpus — every subspace sees
    the SAME md5-hash sample (one predicate on the row id)."""
    import numpy as np
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        train_pq_codebooks,
        train_sample_predicate,
    )
    from flink_mingo_tail_spark.tables import load_table

    e = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    frac = 0.25
    knob = train_pq_codebooks(e, m_subspaces=4, k_sub=8, n_iter=1, sample_fraction=frac)
    manual = train_pq_codebooks(
        e.filter(train_sample_predicate("vec_id", 42, frac)),
        m_subspaces=4, k_sub=8, n_iter=1,
    )
    assert len(knob) == len(manual) == 4
    for a, b in zip(knob, manual):
        assert np.array_equal(a, b)


def test_auto_n_bits_rule_properties():
    """Hypothesis: the n_bits ∝ log(n) occupancy rule's invariants hold
    for any corpus size — 2^b buckets cover n at <= target average
    occupancy, one bit fewer would not (unless clamped), and the
    planes produced for an auto width are bit-identical to an explicit
    call at the same width (same seed => same construction path)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_mingo_tail_spark.operators.similarity import (
        auto_n_bits,
        hyperplane_tables,
        lsh_tables_for,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=10**14),
        occ=st.integers(min_value=1, max_value=10**6),
    )
    def check(n, occ):
        b = auto_n_bits(n, target_occupancy=occ)
        assert 2 <= b <= 30
        if b < 30:
            assert (2**b) * occ >= n          # buckets cover the corpus
        if b > 2:
            assert (2 ** (b - 1)) * occ < n   # and b is minimal
    check()

    # auto width == explicit width => bit-identical hyperplanes
    auto = lsh_tables_for(500, n_tables=3, dim=16, seed=7)  # 500/8 -> 6 bits
    explicit = hyperplane_tables(n_tables=3, n_bits=6, dim=16, seed=7)
    assert len(auto) == len(explicit) == 3
    for a, b in zip(auto, explicit):
        assert np.array_equal(a, b)


def test_mutual_blocked_auto_n_bits(spark):
    """q217b's auto knob pin: mutual_knn_blocked(n_bits=None) must be
    bit-identical to the explicit call at the width the rule derives
    (auto_n_bits of the 250-row probe half => 5 bits at sf0.001) —
    identical resolved width + seed means identical planes, buckets,
    candidates and elected pairs, so wiring the knob in cannot drift
    the oracle-registered query (which stays at the explicit seeded
    6-bit tables; checked too whenever the derived width coincides)."""
    from flink_mingo_tail_spark.operators.similarity import auto_n_bits
    from flink_mingo_tail_spark.queries.similarity import (
        _LSH_N_BITS,
        mutual_knn_blocked,
    )

    n_probe = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .filter("vec_id % 2 = 0")
        .count()
    )
    derived = auto_n_bits(n_probe)
    auto_rows = mutual_knn_blocked(spark, SF_ORACLE, n_bits=None).collect()
    explicit_rows = mutual_knn_blocked(spark, SF_ORACLE, n_bits=derived).collect()
    assert auto_rows == explicit_rows
    if derived == _LSH_N_BITS:
        registered = REGISTRY["q217b_mutual_knn_blocked"].fn(spark, SF_ORACLE).collect()
        assert auto_rows == registered


def test_auto_sizing_rule_properties():
    """Hypothesis: the k∝n / fraction∝n rule's invariants hold for any
    corpus size — k cells cover n at <= target_cell_size average, one
    fewer would not; the sample never exceeds target or the corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_mingo_tail_spark.operators.similarity import auto_size_training

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=10**14),
        cell=st.integers(min_value=1, max_value=10**7),
        target=st.integers(min_value=1, max_value=10**9),
    )
    def check(n, cell, target):
        k, frac = auto_size_training(n, target_cell_size=cell, target_sample_rows=target)
        assert k >= 1 and k * cell >= n          # k cells cover the corpus
        assert k == 1 or (k - 1) * cell < n      # and k is minimal
        assert 0.0 < frac <= 1.0
        # bit-exact construction (frac * n can exceed target by an ulp
        # in float arithmetic, so the spec is pinned, not re-derived)
        assert frac == min(1.0, target / n)
        if n <= target:
            assert frac == 1.0                   # small corpus: train on all

    check()


def test_mutual_knn_blocked_recall_vs_exact(spark):
    """q217b (LSH-blocked mutual best match) recall gate vs the exact
    dense election q217 — the q218 measure-don't-guess pattern applied
    to the blocking that replaces the registry's one quadratic plan.
    Measured 0.92 at sf0.001 / 0.90 at sf0.01; conservative floor 0.8.
    Also pins that blocked pairs agreeing with exact pairs carry the
    SAME cosine (the election layer is verbatim, only the candidate
    space shrinks)."""
    exact = REGISTRY["q217_mutual_knn_pairs"].fn(spark, SF_ORACLE).collect()
    blocked = REGISTRY["q217b_mutual_knn_blocked"].fn(spark, SF_ORACLE).collect()
    e = {(r.vec_a, r.vec_b): r.cos_sim for r in exact}
    b = {(r.vec_a, r.vec_b): r.cos_sim for r in blocked}
    hits = set(e) & set(b)
    recall = len(hits) / len(e)
    assert recall >= 0.8, f"blocked mutual-match recall collapsed: {recall:.2f}"
    # Precision gate (ADVICE round-11): elected blocked pairs are NOT a
    # subset of the exact election — argmax over a reduced candidate
    # set can elect a different partner. Measured 0.90 at sf0.001
    # (13 spurious of 133); conservative floor 0.7.
    precision = len(hits) / len(b)
    assert precision >= 0.7, f"blocked mutual-match precision collapsed: {precision:.2f}"
    for pair in hits:  # same pair => same rounded cosine
        assert e[pair] == b[pair], pair


def test_auto_sized_semdedup_pair_space_stays_linear(spark):
    """The k∝n auto-sizing rule run END-TO-END through the real
    SemDeDup front half (train with k_cells=None/sample_fraction=None,
    assign every row): the within-cell candidate-pair space Σ|cell|²
    must grow ~linearly with the corpus and max-cell occupancy must
    hold near target_cell_size — the property that keeps q171 off the
    quadratic cliff at 100 TB. Measured at sf0.1 ×10: pair ratio 10.04,
    max cell 1019→1140 (SCALE.md round-10); conservative pins here."""
    from pyspark.sql import functions as F

    from flink_mingo_tail_spark.operators.similarity import (
        assign_cells_join,
        train_ivf_centroids,
    )
    from flink_mingo_tail_spark.session import prepare_session
    from flink_mingo_tail_spark.tables import load_table, spread

    prepare_session(spark)
    target = 64
    base = (
        spread(load_table(spark, SF_ORACLE, "embeddings"))
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding")
    )
    stats = {}
    for mult in (1, 10):
        corpus = base
        for i in range(1, mult):
            corpus = corpus.union(
                base.select((F.col("vec_id") + i * 10**7).alias("vec_id"), "embedding")
            )
        cents = train_ivf_centroids(
            corpus, k_cells=None, sample_fraction=None, target_cell_size=target
        )
        occ = (
            assign_cells_join(corpus, cents, out="cell")
            .groupBy("cell")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.sum(F.col("count") * F.col("count")).alias("sumsq"),
            )
            .first()
        )
        stats[mult] = (len(cents), int(occ["mx"]), int(occ["sumsq"]))
    k1, _, sq1 = stats[1]
    k10, mx10, sq10 = stats[10]
    assert k10 >= 9 * k1, stats  # k grew with n (the rule's whole point)
    assert sq10 / sq1 <= 30, stats  # ~linear pair space (quadratic would be 100x)
    assert mx10 <= 5 * target, stats  # occupancy held near target, not 10x


def test_hard_negatives_never_share_anchor_label(spark):
    """q222 semantic invariant: a returned negative's label must differ
    from its anchor's label (the label filter is the operator's whole
    contract), every anchor gets exactly k rows, and ranks are 1..k."""
    from flink_mingo_tail_spark.queries.similarity import _HN_ANCHORS, _HN_K

    e = REGISTRY["q222_hard_negative_mining"].fn(spark, SF_ORACLE)
    anchors = {
        r.vec_id: r.label
        for r in (
            spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
            .select("vec_id", "label")
            .collect()
        )
    }
    rows = e.collect()
    per_anchor = {}
    for r in rows:
        assert r.label != anchors[r.anchor_id], r
        per_anchor.setdefault(r.anchor_id, []).append(r.rank)
    assert len(per_anchor) == _HN_ANCHORS
    for ranks in per_anchor.values():
        assert sorted(ranks) == list(range(1, _HN_K + 1))


def test_semantic_decontaminate_recall_vs_dense(spark):
    """q224 recall gate vs the DENSE semantic election (every corpus
    embedding scored against every eval vector, no blocking) — the
    q218/q217b measure-don't-guess pattern. Unlike q217b's argmax,
    q224's flagging is monotone in the candidate set, so blocked hits
    must be a SUBSET of dense hits (precision 1.0 by construction —
    asserted, not assumed) and only recall needs a floor. Measured
    0.89 at sf0.001 / 0.95 at sf0.01; conservative floor 0.8."""
    import duckdb

    from flink_mingo_tail_spark.queries.similarity import _EVAL_MOD, _SEM_TAU

    blocked = {
        r.doc_id
        for r in REGISTRY["q224_semantic_decontaminate"].fn(spark, SF_ORACLE).collect()
        if r.semantic_hit
    }
    dense = {
        row[0]
        for row in duckdb.sql(
            f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM read_parquet('{SF_ORACLE}/embeddings.parquet')),
            ev AS (SELECT v AS evv FROM e WHERE vec_id % {_EVAL_MOD} = 0),
            co AS (SELECT vec_id AS ci, v AS cv FROM e WHERE vec_id % {_EVAL_MOD} <> 0)
            SELECT DISTINCT ci FROM co CROSS JOIN ev
            WHERE round(list_dot_product(cv, evv)
                  / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(evv, evv))), 6)
                  >= CAST({_SEM_TAU} AS DOUBLE)
            """
        ).fetchall()
    }
    assert blocked <= dense, f"spurious semantic hits: {blocked - dense}"
    recall = len(blocked) / len(dense)
    assert recall >= 0.8, f"blocked decontamination recall collapsed: {recall:.2f}"


def test_semantic_decontaminate_invariants(spark):
    """q224 semantic pins: eval-slice ids never appear in the output,
    every corpus doc appears exactly once, reason is consistent with
    the two hit flags, and contaminated == semantic OR ngram."""
    from flink_mingo_tail_spark.queries.similarity import _EVAL_MOD

    rows = REGISTRY["q224_semantic_decontaminate"].fn(spark, SF_ORACLE).collect()
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert len(rows) == n_docs - n_docs // _EVAL_MOD
    assert len({r.doc_id for r in rows}) == len(rows)
    expected_reason = {
        (True, True): "both",
        (True, False): "semantic",
        (False, True): "ngram",
        (False, False): "clean",
    }
    for r in rows:
        assert r.doc_id % _EVAL_MOD != 0, r
        assert r.reason == expected_reason[(r.semantic_hit, r.ngram_hit)], r
        assert r.contaminated == (r.semantic_hit or r.ngram_hit), r
