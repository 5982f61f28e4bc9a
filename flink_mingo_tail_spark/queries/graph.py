"""Graph queries over the order network: PageRank and BFS reach.

The graph: the customer–supplier interaction network implied by the
TPC-H-ish fixtures — one undirected-as-two-directed edge per distinct
(customer, supplier) pair that ever traded (orders ⋈ lineitem). Node
ids are disambiguated arithmetically: customer c ↦ 2c, supplier s ↦
2s+1 (parity = side of the bipartite graph), so the edge list stays a
pure long column pair with no string keys.

Both queries run a FIXED number of integer-exact rounds
(operators/graph.py) and the DuckDB oracle unrolls the same rounds as
chained CTEs — same joins, same integer division, bit-identical longs.
A recursive CTE cannot express these (the recursive term needs a
per-round aggregate), so unrolling is also the honest ANSI-SQL form.

Reference parity: the reference engine has no graph surface; this is
north-star extension in the same family as connected components
(operators/cluster.py, q73b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_mingo_tail_spark.queries import query
from flink_mingo_tail_spark.session import prepare_session
from flink_mingo_tail_spark.tables import load_table

_PR_ITERS = 5
_BFS_HOPS = 3
_SEED_MOD = 100  # customers with c_custkey % _SEED_MOD == 0 seed the BFS

# shared oracle prefix: the bipartite trade graph as directed edges
_SQL_EDGES = """
    e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT 2 * c AS src, 2 * s + 1 AS dst FROM e0
      UNION
      SELECT 2 * s + 1 AS src, 2 * c AS dst FROM e0
    )
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    return pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst")).union(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )


def _pagerank_oracle() -> str:
    """Unroll _PR_ITERS integer-PageRank rounds as chained CTEs."""
    rounds = []
    for i in range(1, _PR_ITERS + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(i{i}.inflow, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT l.dst, CAST(sum(r.rank // l.outdeg) AS BIGINT) AS inflow
        FROM links l JOIN r{i - 1} r ON r.node = l.src
        GROUP BY l.dst
      ) i{i} ON i{i}.dst = n.node
    )""")
    return f"""
    WITH {_SQL_EDGES},
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    links AS (SELECT e.src, e.dst, od.outdeg FROM edges e JOIN od USING (src)),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    {','.join(rounds)}
    SELECT node AS nid,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           rank AS rank_x1m
    FROM r{_PR_ITERS}
    ORDER BY rank_x1m DESC, nid
    LIMIT 30
    """


@query("q127_pagerank_trade_graph", oracle=_pagerank_oracle())
def q127_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (operators/graph.pagerank, 5
    rounds) over the customer–supplier trade graph; top-30 nodes by
    final rank. The per-round plan is edge⋈rank (hash join on src) →
    per-dst partial+final sum → damping map: O(E) work per round with
    no driver-side state, lineage truncated per round. The oracle
    unrolls the identical integer rounds in SQL — every rank is a
    scaled long, so the hash comparison is bit-exact."""
    from flink_mingo_tail_spark.operators.graph import pagerank

    ranks = pagerank(_trade_edges(spark, sf_dir), n_iter=_PR_ITERS)
    return (
        ranks.select(
            F.col("node").alias("nid"),
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("side"),
            "rank_x1m",
        )
        .orderBy(F.desc("rank_x1m"), "nid")
        .limit(30)
    )


def _bfs_oracle() -> str:
    """Unroll _BFS_HOPS min-merge rounds as chained CTEs."""
    rounds = []
    for i in range(1, _BFS_HOPS + 1):
        rounds.append(f"""
    d{i} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d.dist + 1 AS dist
        FROM edges e JOIN d{i - 1} d ON d.node = e.src
      ) GROUP BY node
    )""")
    return f"""
    WITH {_SQL_EDGES},
    d0 AS (
      SELECT 2 * c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey % {_SEED_MOD} = 0
    ),
    {','.join(rounds)}
    SELECT node AS nid,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           dist
    FROM d{_BFS_HOPS}
    ORDER BY nid
    """


@query("q128_bfs_reach", oracle=_bfs_oracle())
def q128_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (operators/graph.bfs_hops, 3 rounds) from the
    c_custkey % 100 == 0 customer seed set over the trade graph — the
    blast-radius / contamination-spread query. Monotone min-merge per
    round (idempotent), so the result is order-independent; distances
    are small ints, exact in both engines."""
    from flink_mingo_tail_spark.operators.graph import bfs_hops

    prepare_session(spark)
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _SEED_MOD == 0)
        .select((F.col("c_custkey") * 2).alias("node"))
    )
    dist = bfs_hops(_trade_edges(spark, sf_dir), seeds, max_hops=_BFS_HOPS)
    return (
        dist.select(
            F.col("node").alias("nid"),
            F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("side"),
            "dist",
        )
        .orderBy("nid")
    )


# ---------------------------------------------------------------------------
# q139 — triangle census of the part co-purchase graph
# ---------------------------------------------------------------------------

_SQL_COPURCHASE = """
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


@query(
    "q139_copurchase_triangles",
    oracle=f"""
    WITH {_SQL_COPURCHASE}
    SELECT
      (SELECT count(DISTINCT n) FROM (
         SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)) AS n_nodes,
      (SELECT count(*) FROM edges) AS n_edges,
      (SELECT count(*)
         FROM edges e1
         JOIN edges e2 ON e2.u = e1.v
         JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def q139_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts bought in
    the same order). Edges are kept in canonical ``u < v`` orientation,
    so each triangle is enumerated exactly once as an ordered triple
    u < v < w — the standard compact-forward scheme: one hash self-join
    builds the wedges, a second closes them. Keeping every edge with its
    smaller endpoint first is what bounds the wedge join at scale (the
    per-node work is deg+^2, the forward-degree, not deg^2 — the
    degeneracy-ordering argument; at 100 TB the further refinement is
    ordering by degree rank instead of key, same plan shape). No
    collect, no cross join; three shuffles total, all key-partitioned."""
    prepare_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .agg(F.count_distinct("n").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    e1 = edges
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
    closing = edges.select(F.col("u").alias("u"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["u", "w"]).agg(F.count("*").alias("n_triangles"))
    return nodes.crossJoin(n_edges).crossJoin(tri)


# ---------------------------------------------------------------------------
# q139b — colorful (sampled) triangle census: the skew-safe scale path
# ---------------------------------------------------------------------------

_N_COLORS = 16

# Portable uniform hash-color 0.._N_COLORS-1 from a key: first hex char of
# md5(key-as-string) -> hex value 0..15 (uniform) -> mod colors. Spelled
# identically in Spark and DuckDB so the sampled subgraph — and therefore
# every output number — is bit-identical across engines.
_SQL_COLOR = f"""
    (CASE WHEN substr(md5(l_partkey::VARCHAR), 1, 1) BETWEEN '0' AND '9'
          THEN ascii(substr(md5(l_partkey::VARCHAR), 1, 1)) - 48
          ELSE ascii(substr(md5(l_partkey::VARCHAR), 1, 1)) - 87 END) % {_N_COLORS}
"""


def _hex_color(col):
    # r14 optimization: the when/ascii spelling referenced the
    # substring(md5(...)) subtree FOUR times (between-bounds + two
    # ascii branches) and neither CollapseProject nor codegen CSE
    # deduplicated it — four md5 evaluations per fact row in the plan
    # (plans/r14/q139b_*_before.txt). conv(ch, 16, 10) reads the single
    # hex char once and yields the identical 0..15 value (md5 output is
    # always [0-9a-f]), so the color — and every downstream count — is
    # bit-identical.
    ch = F.substring(F.md5(col.cast("string")), 1, 1)
    return F.conv(ch, 16, 10).cast("int") % _N_COLORS


@query(
    "q139b_triangles_colorful",
    oracle=f"""
    WITH colored AS (
      SELECT l_orderkey AS ok, l_partkey AS pk, {_SQL_COLOR} AS c
      FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM colored a
      JOIN colored b ON a.ok = b.ok AND a.pk < b.pk AND a.c = b.c
    ),
    tri AS (
      SELECT count(*) AS n_mono_triangles
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT {_N_COLORS} AS n_colors,
           e.n_mono_edges,
           e.n_mono_edges * {_N_COLORS} AS n_edges_est,
           tri.n_mono_triangles,
           tri.n_mono_triangles * {_N_COLORS * _N_COLORS} AS n_triangles_est
    FROM (SELECT count(*) AS n_mono_edges FROM edges) e, tri
    """,
)
def q139b_triangles_colorful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colorful triangle counting (Pagh–Tsourakakis): the sampled,
    skew-safe twin of q139's exact census. Each part is hash-colored
    into one of 16 colors; only MONOCHROMATIC edges survive into the
    wedge join, so edge volume drops 16× and wedge work Θ(Σ deg⁺²)
    drops 256× — the estimator ``mono_triangles × c²`` is unbiased (a
    triangle is monochromatic iff both other endpoints match the
    first's color: 1/c²) and concentrates tightly on non-degenerate
    graphs (measured ≤4% error at sf0.001/sf0.01 and 0.6% at sf0.1;
    the pytest gate asserts ≤10% against q139's exact count). c trades
    variance against work and is pegged by the smallest gated fixture —
    E[mono triangles] ≈ t/c² must stay in the hundreds for the gate to
    be meaningful. This is the variant to run when the co-purchase
    graph has super-linear wedge growth or hub skew: the color filter is
    applied INSIDE the per-order pair expansion, before the distinct
    shuffle, so every downstream stage — distinct, wedge build, closing
    join — sees only the 1/c (edges) and 1/c² (wedges) samples. Unlike a
    degree cap there is no residual to report: every node participates,
    hubs included, just with sampled incident edges; c tunes the
    work/variance trade-off and is a literal both engines share.

    Every emitted number (mono counts and scaled estimates) is a
    deterministic function of the md5 coloring, so the DuckDB oracle
    reproduces it bit-for-bit — the accuracy gate lives in
    tests/test_graph.py where the estimate is compared to q139's exact
    count, mirroring the two-sided contract of the sketch family (q134).
    """
    prepare_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # (order, color) packed into ONE long key: l_orderkey * c + color.
    # Grouping on a single long instead of a (long, int) pair measured
    # 5.2 s vs 6.5 s for the 50x fact shuffle (less hashing + narrower
    # shuffle rows) — at ~20M groups the per-group constant is the cost.
    colored = li.select(
        (F.col("l_orderkey") * _N_COLORS + _hex_color(F.col("l_partkey"))).alias("okc"),
        F.col("l_partkey").alias("pk"),
    )
    # Mono-edge build with ONE lineitem scan and ONE fact shuffle: group
    # by (order, color) with a partial-aggregated collect_list, then
    # expand each per-group part list into canonical u<v pairs
    # in-expression (the q126 co-occurrence pattern). The self-join
    # formulation (two scans, two ok-shuffles of the full fact) measured
    # 3.2x at the 10x probe — the fact shuffle, not the wedge work, was
    # the growth term. Grouping by (ok, c) also means cross-color pairs
    # are never materialized at all; parts-per-(order,color) is bounded
    # by parts-per-order (~7 on TPC-H shapes), so the expansion is a
    # small constant per group. collect_list, not collect_set (no
    # per-group hash dedup; duplicate parts within an order yield
    # duplicate pairs the global distinct removes anyway) and pair
    # orientation via least/greatest over i<j positions, not array_sort
    # (saves 1M+ in-memory sorts; x=y self-pairs are dropped inline).
    lists = (
        colored.groupBy("okc")
        .agg(F.collect_list("pk").alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    pairs = lists.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "filter(transform(slice(ps, i + 2, size(ps) - i - 1), "
                "y -> struct(least(x, y) AS u, greatest(x, y) AS v)), p -> p.u <> p.v)))"
            )
        ).alias("e")
    ).select("e.u", "e.v")
    edges = pairs.distinct()
    n_edges = edges.agg(
        F.count("*").alias("n_mono_edges"),
        (F.count("*") * _N_COLORS).alias("n_edges_est"),
    )
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = edges.join(e2, "v").select("u", "v", "w")
    closing = edges.select(F.col("u"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["u", "w"]).agg(
        F.count("*").alias("n_mono_triangles"),
        (F.count("*") * _N_COLORS * _N_COLORS).alias("n_triangles_est"),
    )
    return n_edges.crossJoin(tri).select(
        F.lit(_N_COLORS).alias("n_colors"),
        "n_mono_edges",
        "n_edges_est",
        "n_mono_triangles",
        "n_triangles_est",
    )


# ---------------------------------------------------------------------------
# q210 — TextRank keywords: PageRank over the word-adjacency graph (round 9)
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_TOP = 20


def _textrank_oracle() -> str:
    """Unroll _TR_ITERS integer-PageRank rounds over the word graph —
    the q127 unroll with word-string nodes and bigram-adjacency edges."""
    rounds = []
    for i in range(1, _TR_ITERS + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(i{i}.inflow, 0)) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT l.dst, CAST(sum(r.rank // l.outdeg) AS BIGINT) AS inflow
        FROM links l JOIN r{i - 1} r ON r.node = l.src
        GROUP BY l.dst
      ) i{i} ON i{i}.dst = n.node
    )""")
    return f"""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i] AS a, t[i+1] AS b
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    e0 AS (SELECT DISTINCT a, b FROM bg WHERE a <> b),
    edges AS (
      SELECT a AS src, b AS dst FROM e0
      UNION
      SELECT b AS src, a AS dst FROM e0
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    links AS (SELECT e.src, e.dst, od.outdeg FROM edges e JOIN od USING (src)),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    {','.join(rounds)}
    SELECT node AS word, rank AS rank_x1m
    FROM r{_TR_ITERS}
    ORDER BY rank_x1m DESC, word
    LIMIT {_TR_TOP}
    """


@query("q210_textrank_keywords", oracle=_textrank_oracle())
def q210_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: integer PageRank (3 rounds, the
    q127 operator verbatim) over the corpus word-adjacency graph —
    distinct undirected bigram adjacencies as two directed edges. The
    composition closes the keyword loop that q126 (co-occurrence
    counts) and q127 (graph centrality) open separately: corpus-level
    salient vocabulary for curation dashboards and stop-list induction,
    computed without any per-document state.

    The graph is VOCABULARY-bounded: distinct adjacent word pairs
    saturate like q199's Heaps' curve, so the per-round edge⋈rank hash
    join and per-dst partial+final sum stop growing with corpus rows.
    Word strings serve as node keys directly (exact, engine-neutral);
    at 100 TB the same plan runs on md5-hashed long ids (sql_md5_long)
    to shrink shuffle width — a projection swap, not a plan change.
    Ranks are q127's scaled longs (teleport 0.15, damping 85/100 in
    integer arithmetic), so the oracle's unrolled rounds are bit-equal.
    """
    from flink_mingo_tail_spark.operators.graph import pagerank

    prepare_session(spark)
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(F.split(F.col("text"), " ", -1).alias("t"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array()"
                    " ELSE transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS a, t[i+1] AS b))"
                    " END"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = bg.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        bg.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ranks = pagerank(edges, n_iter=_TR_ITERS)
    return (
        ranks.select(F.col("node").alias("word"), "rank_x1m")
        .orderBy(F.desc("rank_x1m"), "word")
        .limit(_TR_TOP)
    )
