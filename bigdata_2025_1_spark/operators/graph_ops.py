"""Iterative graph analytics over the star schema (charter extension):
PageRank on the nation→nation trade graph.

Why this exists: iterative fixed-point algorithms are the one workload
class where Spark's model (loop in the driver, each step a declarative
join+agg; cache the frontier) differs fundamentally from one-shot SQL —
the operator demonstrates that shape end-to-end with a cross-engine-exact
oracle (a fixed 10-stage unrolled CTE chain, since standard SQL forbids
aggregation inside a recursive CTE).

Determinism across engines is the hard part of distributed PageRank: the
usual double-precision rank vector diverges bit-by-bit because partition
fold order differs. Solution: ALL arithmetic is int64 — ranks live in
units of 1e-12, edge weights normalize to parts-per-million via integer
floor division, contributions use ``rank * w_ppm // 1e6`` (bounded by
1e12·1e6 = 1e18 < 2^63 REGARDLESS of edge counts — overflow-safe at any
scale), and the damping mix is ``(15·r0)//100 + (85·contrib)//100``.
Dangling mass is deliberately dropped (not redistributed): deterministic,
documented, and irrelevant to ranking order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_2025_1_spark.io import load, spread
from bigdata_2025_1_spark.registry import query

PR_ITERS = 10
PR_ONE = 10**12  # rank unit: 1.0 == 1e12
PR_PPM = 10**6  # edge-weight normalization denominator


def pagerank_int_kernel(df):
    """The integer PageRank fixed point on a combined frame of edge rows
    ``(src, dst, w_ppm ≥ 0)`` and node-marker rows ``(key, key, -1)``.
    Module-level (not a closure) so the arithmetic is directly
    property-testable against a scalar reference implementation."""
    import numpy as np
    import pandas as pd

    if df.empty:
        return None
    is_node = df["w_ppm"].to_numpy() == -1
    node_keys = np.sort(df.loc[is_node, "src"].to_numpy(np.int64))
    n = len(node_keys)
    if n == 0:
        return None
    idx = {k: i for i, k in enumerate(node_keys)}
    e = df.loc[~is_node]
    src = np.array([idx[k] for k in e["src"].to_numpy(np.int64)], dtype=np.int64)
    dst = np.array([idx[k] for k in e["dst"].to_numpy(np.int64)], dtype=np.int64)
    w = e["w_ppm"].to_numpy(np.int64)
    # Overflow safety rests on the normalization invariant (per-source
    # weights sum ≤ PPM ⇒ total contribution mass ≤ total rank ≈ PR_ONE,
    # far below 2^63). The operator guarantees it via w·PPM // out_total;
    # fail loudly rather than wrap silently if a caller does not.
    out_sums = np.zeros(n, dtype=np.int64)
    np.add.at(out_sums, src, w)
    if (w < 0).any() or (out_sums > PR_PPM).any():
        raise ValueError(
            "pagerank_int_kernel: edge weights must be ppm-normalized "
            "(w_ppm ≥ 0, per-source sum ≤ 1e6) — int64 bounds depend on it"
        )
    r0 = PR_ONE // n
    rank = np.full(n, r0, dtype=np.int64)
    base = (15 * r0) // 100
    for _ in range(PR_ITERS):
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, dst, (rank[src] * w) // PR_PPM)
        rank = base + (85 * contrib) // 100
    return pd.DataFrame({"nation_key": node_keys, "rank": rank})


def _sql_pr_stage(i: int) -> str:
    return f"""pr{i + 1} AS (
      SELECT n.nation_key,
             (15 * (SELECT r0 FROM init)) // 100
               + (85 * COALESCE(c.contrib, 0)) // 100 AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS nation_key,
               SUM(p.rank * e.w_ppm // {PR_PPM}) AS contrib
        FROM pr{i} p JOIN edges e ON e.src = p.nation_key
        GROUP BY e.dst
      ) c USING (nation_key)
    )"""


_PR_STAGES = ",\n    ".join(_sql_pr_stage(i) for i in range(PR_ITERS))


@query(
    "pagerank_nation_trade",
    oracle=f"""
    WITH raw_edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY src, dst
    ), out_w AS (
      SELECT src, SUM(w) AS total FROM raw_edges GROUP BY src
    ), edges AS (
      SELECT e.src, e.dst, e.w * {PR_PPM} // o.total AS w_ppm
      FROM raw_edges e JOIN out_w o USING (src)
    ), nodes AS (
      SELECT n_nationkey AS nation_key FROM nation
    ), init AS (
      SELECT {PR_ONE} // COUNT(*) AS r0 FROM nodes
    ), pr0 AS (
      SELECT nation_key, (SELECT r0 FROM init) AS rank FROM nodes
    ),
    {_PR_STAGES}
    SELECT n.n_name AS nation, CAST(p.rank AS BIGINT) AS rank_scaled,
           p.rank::DOUBLE / {PR_ONE} AS rank
    FROM pr{PR_ITERS} p JOIN nation n ON n.n_nationkey = p.nation_key
    ORDER BY rank_scaled DESC, nation
    """,
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation→nation trade graph (edge weight = number
    of lineitems shipped from a supplier nation to a customer nation),
    10 damped iterations, all-integer arithmetic (see module docstring).

    Scale shape: the expensive part is building the EDGE LIST — one
    fact-fact shuffle (lineitem ⋈ orders) with customer/supplier
    broadcast, collapsing 100 TB of facts to ≤|nations|² weighted edges.
    The fixed point then runs on that PROVABLY TINY aggregate, so it
    executes as ONE Arrow kernel (mapInPandas over the single coalesced
    edge partition, vectorized int64 numpy) rather than 10 distributed
    join+agg stages — a measured 3× win locally, and the honest physical
    plan at any input scale (the iteration input does not grow with the
    data). When the ITERATION STATE itself is huge — per-URL PageRank,
    components over billions of nodes — use the distributed
    loop-of-joins pattern instead (``dedup_connected_components`` in
    this repo demonstrates it, frontier persisted per step)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    raw_edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    out_w = raw_edges.groupBy("src").agg(F.sum("w").alias("total"))
    # Cache contract (applies to every .persist() inside a registered
    # query): the returned DataFrame is lazy, so there is no in-function
    # point to unpersist without defeating the cache. Both harnesses
    # release between queries (bench.py clearCache per run,
    # tools/selfcheck.py clearCache per query); a long-lived interactive
    # session should likewise spark.catalog.clearCache() after
    # materializing the result.
    edges = (
        raw_edges.join(out_w, "src")
        .select("src", "dst", F.expr(f"w * {PR_PPM} div total").alias("w_ppm"))
        .persist()
    )
    nodes = nation.select(F.col("n_nationkey").alias("nation_key"))
    # Node rows ride along as w_ppm = -1 markers so the kernel sees the
    # full node domain (isolated nations included) in its one partition.
    node_markers = nodes.select(
        F.col("nation_key").alias("src"),
        F.col("nation_key").alias("dst"),
        F.lit(-1).cast("bigint").alias("w_ppm"),
    )
    combined = edges.unionByName(node_markers).coalesce(1)

    def pr_kernel(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        out = pagerank_int_kernel(df)
        if out is not None:
            yield out

    ranks = combined.mapInPandas(pr_kernel, "nation_key bigint, rank bigint")
    return (
        ranks.join(F.broadcast(nation), ranks.nation_key == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("rank").alias("rank_scaled"),
            (F.col("rank").cast("double") / PR_ONE).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), "nation")
    )


LPA_ITERS = 3


def _sql_lpa_stage(i: int) -> str:
    return f"""cand{i + 1} AS (
      SELECT e.src AS nation_key, p.label AS label, SUM(e.w) AS tw
      FROM sym e JOIN lp{i} p ON p.nation_key = e.dst
      GROUP BY e.src, p.label
    ), best{i + 1} AS (
      SELECT nation_key, label FROM (
        SELECT nation_key, label,
               ROW_NUMBER() OVER (PARTITION BY nation_key
                                  ORDER BY tw DESC, label) AS rk
        FROM cand{i + 1}) WHERE rk = 1
    ), lp{i + 1} AS (
      SELECT p.nation_key, COALESCE(b.label, p.label) AS label
      FROM lp{i} p LEFT JOIN best{i + 1} b USING (nation_key)
    )"""


_LPA_STAGES = ",\n    ".join(_sql_lpa_stage(i) for i in range(LPA_ITERS))


@query(
    "label_propagation_communities",
    oracle=f"""
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), und AS MATERIALIZED (
      SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b, SUM(w) AS w
      FROM raw WHERE u <> v
      GROUP BY LEAST(u, v), GREATEST(u, v)
    ), sym AS MATERIALIZED (
      SELECT a AS src, b AS dst, w FROM und
      UNION ALL
      SELECT b AS src, a AS dst, w FROM und
    ), lp0 AS (
      SELECT n_nationkey AS nation_key, n_nationkey AS label FROM nation
    ),
    {_LPA_STAGES}
    SELECT n.n_name AS nation, CAST(p.label AS BIGINT) AS community,
           CAST(COUNT(*) OVER (PARTITION BY p.label) AS BIGINT) AS community_size
    FROM lp{LPA_ITERS} p JOIN nation n ON n.n_nationkey = p.nation_key
    ORDER BY community, nation
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted label propagation (LPA)
    on the undirected nation-trade graph: every node starts as its own
    label; each of 3 fixed iterations relabels every node to the
    label with the greatest incident edge weight (ties → smallest label;
    isolated nodes keep their label). A FIXED iteration count makes
    synchronous LPA deterministic (free-running LPA can oscillate), and
    the argmax is total-ordered by (weight DESC, label ASC) — exact
    integer comparisons only, so both engines agree bit-for-bit.

    Scale shape: like PageRank/triangles above, the fact tables collapse
    to a ≤|nations|² edge list in one shuffle with broadcast dims. Each
    iteration is then join→agg→window on the tiny persisted edge set.
    For billion-node graphs the SAME loop body runs distributed — edges
    stay partitioned by src, each step is one co-keyed shuffle, and the
    frontier persists per step (see ``dedup_connected_components`` for
    the loop-until-converged variant of that shape)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v"))
        .agg(F.count("*").alias("w"))
    )
    und = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"), "w")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    sym = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    labels = nation.select(
        F.col("n_nationkey").alias("nation_key"), F.col("n_nationkey").alias("label")
    )
    for _ in range(LPA_ITERS):
        cand = (
            sym.join(labels, sym.dst == labels.nation_key)
            .groupBy(F.col("src").alias("nk"), "label")
            .agg(F.sum("w").alias("tw"))
        )
        rk = F.row_number().over(
            Window.partitionBy("nk").orderBy(F.desc("tw"), "label")
        )
        best = (
            cand.withColumn("rk", rk)
            .filter(F.col("rk") == 1)
            .select("nk", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, labels.nation_key == best.nk, "left")
            .select(
                "nation_key",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    size = F.count("*").over(Window.partitionBy("label"))
    return (
        labels.join(F.broadcast(nation), labels.nation_key == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("label").alias("community"),
            size.alias("community_size"),
        )
        .orderBy("community", "nation")
    )


@query(
    "triangle_count_trade",
    oracle="""
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), und AS MATERIALIZED (
      SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b, SUM(w) AS w
      FROM raw WHERE u <> v
      GROUP BY LEAST(u, v), GREATEST(u, v)
    ), strong AS MATERIALIZED (
      SELECT a, b FROM und
      WHERE 625 * w > (SELECT SUM(w) FROM und)
    )
    SELECT CAST((SELECT COUNT(DISTINCT n) FROM (
             SELECT a AS n FROM strong UNION SELECT b FROM strong)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM strong) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM strong e1
                 JOIN strong e2 ON e2.a = e1.b AND e2.b > e1.b
                 JOIN strong e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT) AS n_triangles
    """,
)
def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the STRONG nation-trade graph (edges whose
    volume exceeds the graph average — integer test 625·w > Σw, no float
    fraction): the canonical non-iterative distributed graph kernel. The
    classic a<b<c ordered two-path + closing-edge join counts each
    triangle exactly once.

    Scale shape: like PageRank above, 100 TB of facts collapses to a
    ≤|nations|² edge list in ONE fact-fact shuffle with broadcast dims;
    the triangle self-joins then run on that provably tiny set. For
    graphs whose EDGE LIST is itself huge (social graphs), the same
    ordered-join algebra holds but the edge table stays distributed and
    the planner degree-orders vertices first (the "compact-forward"
    optimization) — the query's shape is unchanged, only the join
    strategy shifts from broadcast to shuffle."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v"))
        .agg(F.count("*").alias("w"))
    )
    und = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"), "w"
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    total = und.agg(F.sum("w").alias("tw"))
    strong = (
        und.crossJoin(F.broadcast(total))
        .filter(625 * F.col("w") > F.col("tw"))
        .select("a", "b")
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    e1 = strong.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = strong.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = strong.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tris = (
        e1.join(F.broadcast(e2), (F.col("y2") == F.col("y")) & (F.col("z") > F.col("y")))
        .join(
            F.broadcast(e3),
            (F.col("x3") == F.col("x")) & (F.col("z3") == F.col("z")),
            "left_semi",
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    nodes = strong.select(F.col("a").alias("n")).union(
        strong.select(F.col("b").alias("n"))
    ).distinct()
    # three 1-row aggregates cross-joined — fully lazy, no driver action
    return (
        nodes.agg(F.count("*").alias("n_nodes"))
        .crossJoin(strong.agg(F.count("*").alias("n_edges")))
        .crossJoin(tris)
    )


BFS_HOPS = 3
BFS_SOURCE = 0  # nation_key of the BFS root


def _sql_bfs_stage(i: int) -> str:
    return f"""d{i + 1} AS (
      SELECT n.nation_key,
             LEAST(n.dist, c.best + 1) AS dist
      FROM d{i} n LEFT JOIN (
        SELECT e.dst AS nation_key, MIN(p.dist) AS best
        FROM d{i} p JOIN edges e ON e.src = p.nation_key
        WHERE p.dist < {10**6}
        GROUP BY e.dst
      ) c USING (nation_key)
    )"""


_BFS_STAGES = ",\n    ".join(_sql_bfs_stage(i) for i in range(BFS_HOPS))


@query(
    "bfs_trade_reachability",
    oracle=f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ), edges AS MATERIALIZED (SELECT src, dst FROM raw),
    d0 AS (
      SELECT n_nationkey AS nation_key,
             CASE WHEN n_nationkey = {BFS_SOURCE} THEN 0 ELSE {10**6} END AS dist
      FROM nation
    ),
    {_BFS_STAGES}
    SELECT n.n_name AS nation,
           CASE WHEN d.dist < {10**6} THEN CAST(d.dist AS INT) ELSE NULL END AS hops,
           (d.dist < {10**6}) AS reachable
    FROM d{BFS_HOPS} d JOIN nation n ON n.n_nationkey = d.nation_key
    ORDER BY nation
    """,
)
def bfs_trade_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest hop count from nation 0 over the directed trade
    graph, 3 synchronous relaxation rounds (min-plus algebra:
    dist' = min(dist, 1 + min over in-neighbors)) — the fourth iterative
    graph shape beside min-label components, mode-vote LPA, and
    weighted-sum PageRank; unreached nodes report NULL hops. Fixed
    rounds bound the result to ≤3 hops by construction (exact BFS loops
    until the frontier empties — same body, driver-checked convergence
    as in ``dedup_connected_components``).

    Determinism: distances are integers; min is total; no floats exist
    anywhere in the query.

    Scale shape: the DISTINCT fact-fact shuffle builds a ≤|nations|²
    edge list once (broadcast dims); each round is one join+MIN-agg on
    the persisted edges. At billion-node scale the same loop runs with
    edges partitioned by src and the frontier persisted per round —
    and frontier-only propagation (join from last round's CHANGED
    nodes) is the standard optimization the small fixture doesn't
    need."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    INF = 10**6
    edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    dist = nation.select(
        F.col("n_nationkey").alias("nation_key"),
        F.when(F.col("n_nationkey") == BFS_SOURCE, F.lit(0))
        .otherwise(F.lit(INF))
        .alias("dist"),
    )
    for _ in range(BFS_HOPS):
        relaxed = (
            edges.join(
                dist.filter(F.col("dist") < INF),
                edges.src == F.col("nation_key"),
            )
            .groupBy(F.col("dst").alias("nk"))
            .agg(F.min("dist").alias("best"))
        )
        dist = (
            dist.join(relaxed, dist.nation_key == relaxed.nk, "left")
            .select(
                "nation_key",
                # LEAST skips NULLs in BOTH engines (no-in-edge nodes keep
                # their current dist), verified: DuckDB LEAST(5,NULL)=5
                F.least(F.col("dist"), F.col("best") + 1).alias("dist"),
            )
        )
    return (
        dist.join(F.broadcast(nation), dist.nation_key == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.when(F.col("dist") < INF, F.col("dist").cast("int")).alias("hops"),
            (F.col("dist") < INF).alias("reachable"),
        )
        .orderBy("nation")
    )


@query(
    "trade_graph_degree_stats",
    oracle="""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ), outd AS (
      SELECT src AS nation_key, COUNT(*) AS out_degree FROM raw GROUP BY src
    ), ind AS (
      SELECT dst AS nation_key, COUNT(*) AS in_degree FROM raw GROUP BY dst
    ), recip AS (
      SELECT a.src AS nation_key, COUNT(*) AS reciprocated
      FROM raw a JOIN raw b ON b.src = a.dst AND b.dst = a.src
      GROUP BY a.src
    )
    SELECT n.n_name AS nation,
           CAST(COALESCE(o.out_degree, 0) AS BIGINT) AS out_degree,
           CAST(COALESCE(i.in_degree, 0) AS BIGINT) AS in_degree,
           CAST(COALESCE(r.reciprocated, 0) AS BIGINT) AS reciprocated
    FROM nation n
    LEFT JOIN outd o ON o.nation_key = n.n_nationkey
    LEFT JOIN ind i ON i.nation_key = n.n_nationkey
    LEFT JOIN recip r ON r.nation_key = n.n_nationkey
    ORDER BY nation
    """,
)
def trade_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree profile of the directed trade graph: per nation, out-degree
    (how many nations its customers buy from... supplier side), in-degree,
    and reciprocated-edge count (A→B and B→A both present) — the
    structural summary read before choosing graph algorithms (reciprocity
    decides directed-vs-undirected treatment; degree skew decides salting
    for the iterative kernels above).

    Determinism: distinct edges and integer counts, nation-spine left
    joins so isolated nations report zeros.

    Scale shape: one DISTINCT fact-fact shuffle builds the edge list
    (broadcast dims); degrees are map-side-combinable counts; the
    reciprocity self-join runs on the ≤|nations|² edge set."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    outd = raw.groupBy(F.col("src").alias("nk")).agg(F.count("*").alias("out_degree"))
    ind = raw.groupBy(F.col("dst").alias("nk")).agg(F.count("*").alias("in_degree"))
    b = raw.select(F.col("src").alias("b_src"), F.col("dst").alias("b_dst"))
    recip = (
        raw.join(b, (F.col("b_src") == F.col("dst")) & (F.col("b_dst") == F.col("src")))
        .groupBy(F.col("src").alias("nk"))
        .agg(F.count("*").alias("reciprocated"))
    )
    return (
        nation.select(F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation"))
        .join(outd, "nk", "left")
        .join(ind, "nk", "left")
        .join(recip, "nk", "left")
        .select(
            "nation",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("reciprocated", F.lit(0)).alias("reciprocated"),
        )
        .orderBy("nation")
    )


# --- harmonic centrality (all-sources BFS) -------------------------------

HC_HOPS = 3
# exact integer reciprocals round(1e6/d) for d = 1..HC_HOPS — the only
# arithmetic on distances, so centrality sums are pure int64
_HC_RECIP = {d: round(1e6 / d) for d in range(1, HC_HOPS + 1)}
_SQL_HC_RECIP = (
    "(CASE dist "
    + " ".join(f"WHEN {d} THEN {r}" for d, r in _HC_RECIP.items())
    + " ELSE 0 END)"
)


def _sql_hc_stage(i: int) -> str:
    return f"""h{i + 1} AS (
      SELECT n.src, n.nation_key,
             LEAST(n.dist, c.best + 1) AS dist
      FROM h{i} n LEFT JOIN (
        SELECT p.src, e.dst AS nation_key, MIN(p.dist) AS best
        FROM h{i} p JOIN edges e ON e.src_n = p.nation_key
        WHERE p.dist < {10**6}
        GROUP BY p.src, e.dst
      ) c USING (src, nation_key)
    )"""


_HC_STAGES = ",\n    ".join(_sql_hc_stage(i) for i in range(HC_HOPS))


@query(
    "harmonic_centrality_trade",
    oracle=f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT c.c_nationkey AS src_n, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ), edges AS MATERIALIZED (SELECT src_n, dst FROM raw),
    h0 AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS nation_key,
             CASE WHEN a.n_nationkey = b.n_nationkey THEN 0
                  ELSE {10**6} END AS dist
      FROM nation a CROSS JOIN nation b
    ),
    {_HC_STAGES}
    SELECT n.n_name AS nation,
           CAST(SUM(CASE WHEN d.src <> d.nation_key AND d.dist < {10**6}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reached_from,
           CAST(SUM(CASE WHEN d.src <> d.nation_key THEN {_SQL_HC_RECIP}
                         ELSE 0 END) AS BIGINT)::DOUBLE / 1e6 AS harmonic
    FROM h{HC_HOPS} d JOIN nation n ON n.n_nationkey = d.nation_key
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def harmonic_centrality_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic (in-)centrality over the directed nation trade graph:
    HC(v) = Σ_{u≠v} 1/d(u,v) with d = shortest hop count, summed over
    sources that reach v within 3 hops — the centrality that handles
    disconnected graphs gracefully (unreachable pairs contribute 0, no
    infinite closeness). The fifth iterative-graph shape here: BFS
    (`bfs_trade_reachability`) from ALL sources simultaneously — state
    is the (src, node, dist) matrix, relaxed per round in ONE join+MIN
    instead of |V| sequential BFS runs — the standard trick for
    all-pairs centralities on coarse graphs.

    Determinism: distances are integers; 1/d enters only as exact
    integer literals round(1e6/d) (the Benford-constants pattern), so
    centrality sums are pure int64 with one final divide.

    Scale shape: facts collapse once to the ≤|nations|² edge list
    (broadcast dims); each round relaxes the |V|²-row state with an
    edge equi-join + MIN agg — the exact answer for coarse graphs. At
    web scale swap to the IMPLEMENTED sketch twin
    ``hyperball_harmonic_trade``: same loop, O(|V|·m) register state
    instead of the |V|² matrix."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    INF = 10**6
    edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src_n"), F.col("s_nationkey").alias("dst"))
        .distinct()
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    a = nation.select(F.col("n_nationkey").alias("src"))
    b = nation.select(F.col("n_nationkey").alias("nation_key"))
    dist = a.crossJoin(b).select(
        "src",
        "nation_key",
        F.when(F.col("src") == F.col("nation_key"), F.lit(0))
        .otherwise(F.lit(INF))
        .alias("dist"),
    )
    for _ in range(HC_HOPS):
        relaxed = (
            edges.join(
                dist.filter(F.col("dist") < INF),
                edges.src_n == F.col("nation_key"),
            )
            .groupBy(F.col("src").alias("rsrc"), F.col("dst").alias("nk"))
            .agg(F.min("dist").alias("best"))
        )
        dist = (
            dist.join(
                relaxed,
                (F.col("src") == F.col("rsrc")) & (F.col("nation_key") == F.col("nk")),
                "left",
            )
            .select(
                "src",
                "nation_key",
                F.least(F.col("dist"), F.col("best") + 1).alias("dist"),
            )
        )
    recip = F.when(
        F.col("src") == F.col("nation_key"), F.lit(0).cast("bigint")
    ).otherwise(
        F.element_at(
            F.create_map(*[F.lit(x) for dr in _HC_RECIP.items() for x in dr]),
            F.col("dist"),
        ).cast("bigint")
    )
    agg = (
        dist.select("src", "nation_key", F.coalesce(recip, F.lit(0)).alias("r_i6"),
                    ((F.col("src") != F.col("nation_key")) & (F.col("dist") < INF))
                    .cast("int").alias("reached"))
        .groupBy("nation_key")
        .agg(
            F.sum("reached").cast("bigint").alias("n_reached_from"),
            (F.sum("r_i6").cast("double") / F.lit(1e6)).alias("harmonic"),
        )
    )
    return (
        agg.join(F.broadcast(nation), agg.nation_key == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "n_reached_from", "harmonic")
        .orderBy("nation")
    )


# --- k-core decomposition (3-core of the strong trade graph) --------------

KCORE_K = 3
_KC_ROUNDS = 25  # ≥ |nations|: peeling removes ≥1 node per active round,
# so 25 unrolled oracle rounds provably reach the fixed point


def kcore_peel_kernel(df, k: int):
    """Exact k-core peeling on a combined frame of undirected edge rows
    ``(u, v)`` (both directions present). Returns one row per node that
    ever had an edge: (u, removed_round ≥ 1 or None, core_degree or
    None). Module-level so the peeling is property-testable against a
    brute-force reference (same contract as ``pagerank_int_kernel``)."""
    import pandas as pd

    if df.empty:
        return pd.DataFrame({"u": [], "removed_round": [], "core_degree": []})
    edges = set(zip(df["u"].astype(int), df["v"].astype(int)))
    alive = {u for u, _ in edges} | {v for _, v in edges}
    removed: dict[int, int] = {}
    rnd = 0
    while True:
        rnd += 1
        deg: dict[int, int] = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        gone = {u for u in alive if deg.get(u, 0) < k}
        if not gone:
            break
        for u in gone:
            removed[u] = rnd
        alive -= gone
        edges = {(u, v) for (u, v) in edges if u in alive and v in alive}
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rows = sorted(removed) + sorted(alive)
    return pd.DataFrame(
        {
            "u": rows,
            "removed_round": [removed.get(u) for u in rows],
            "core_degree": [deg.get(u, 0) if u in alive else None for u in rows],
        }
    )


def _sql_kcore_stage(i: int) -> str:
    # every per-round CTE is MATERIALIZED: each is referenced 2-3 times
    # by later rounds, and without the barrier DuckDB inlines (= re-runs)
    # the whole chain per reference — a 3^25 blowup
    return f"""d{i} AS MATERIALIZED (
      SELECT u, COUNT(*) AS d FROM s{i - 1} GROUP BY u
    ), a{i} AS MATERIALIZED (
      SELECT a.u FROM a{i - 1} a JOIN d{i} d USING (u) WHERE d.d >= {KCORE_K}
    ), s{i} AS MATERIALIZED (
      SELECT e.u, e.v FROM s{i - 1} e
      JOIN a{i} x ON x.u = e.u JOIN a{i} y ON y.u = e.v
    ), r{i} AS MATERIALIZED (
      SELECT u, {i} AS rr FROM (SELECT u FROM a{i - 1} EXCEPT SELECT u FROM a{i})
    )"""


_KC_STAGES = ",\n    ".join(_sql_kcore_stage(i) for i in range(1, _KC_ROUNDS + 1))
_KC_REMOVED = "\n      UNION ALL\n      ".join(
    f"SELECT u, rr FROM r{i}" for i in range(1, _KC_ROUNDS + 1)
)


@query(
    "kcore_trade_graph",
    oracle=f"""
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS uu, s.s_nationkey AS vv, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), und AS MATERIALIZED (
      SELECT LEAST(uu, vv) AS a, GREATEST(uu, vv) AS b, SUM(w) AS w
      FROM raw WHERE uu <> vv
      GROUP BY LEAST(uu, vv), GREATEST(uu, vv)
    ), strong AS MATERIALIZED (
      SELECT a, b FROM und WHERE 625 * w > (SELECT SUM(w) FROM und)
    ), s0 AS MATERIALIZED (
      SELECT a AS u, b AS v FROM strong
      UNION ALL SELECT b AS u, a AS v FROM strong
    ), a0 AS (
      SELECT DISTINCT u FROM s0
    ),
    {_KC_STAGES},
    removed AS (
      {_KC_REMOVED}
    ), dfin AS (
      SELECT u, COUNT(*) AS d FROM s{_KC_ROUNDS} GROUP BY u
    )
    SELECT n.n_nationkey AS nation_key,
           CAST(CASE WHEN rem.rr IS NOT NULL THEN rem.rr
                     WHEN a0x.u IS NULL THEN 0 END AS INT) AS removed_round,
           (rem.rr IS NULL AND a0x.u IS NOT NULL) AS in_core,
           CAST(df.d AS BIGINT) AS core_degree
    FROM nation n
    LEFT JOIN (SELECT u FROM a0) a0x ON a0x.u = n.n_nationkey
    LEFT JOIN removed rem ON rem.u = n.n_nationkey
    LEFT JOIN dfin df ON df.u = n.n_nationkey
    ORDER BY nation_key
    """,
)
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-core decomposition (k=3) of the STRONG nation-trade graph
    (same above-average-volume edge set as ``triangle_count_trade``):
    iteratively peel nodes of degree < k until the fixed point; report
    per nation the peel round that removed it (0 = never in the strong
    graph, NULL = survives in the core) and the core member's final
    degree. The k-core is the standard cohesion screen before community
    detection — LPA/PageRank on the raw graph waste iterations on
    pendant vertices the core excludes.

    Determinism: pure integer set arithmetic; peeling is confluent (the
    k-core is unique and round-synchronous peeling is deterministic).
    The oracle unrolls {_KC_ROUNDS} rounds — ≥ |nations|, provably past
    the fixed point — while the kernel stops at the first round with no
    removals; both compute the same unique core.

    Scale shape: 100 TB of facts collapse to the ≤|nations|² strong edge
    list in ONE fact-fact shuffle with broadcast dims (the
    triangle-count shape); the peeling then runs in a single tiny-state
    kernel partition, exactly like ``pagerank_nation_trade``'s int
    kernel. For graphs whose edge list is itself huge, swap the kernel
    for the round-synchronous join form (the ``_sql_kcore_stage`` shape
    run as DataFrame steps — each round one degree agg + one semi-join)."""
    import pandas as pd

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("c_nationkey").alias("uu"), F.col("s_nationkey").alias("vv"))
        .agg(F.count("*").alias("w"))
    )
    und = (
        raw.filter(F.col("uu") != F.col("vv"))
        .select(F.least("uu", "vv").alias("a"), F.greatest("uu", "vv").alias("b"), "w")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    total = und.agg(F.sum("w").alias("tw"))
    strong = (
        und.crossJoin(F.broadcast(total))
        .filter(625 * F.col("w") > F.col("tw"))
        .select("a", "b")
    )
    sym = strong.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        strong.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )

    def peel(batches):
        frames = [pdf for pdf in batches]
        df = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"u": [], "v": []})
        )
        yield kcore_peel_kernel(df, KCORE_K)

    peeled = sym.coalesce(1).mapInPandas(
        peel, schema="u long, removed_round int, core_degree long"
    )
    nation = load(spark, sf_dir, "nation")
    # ONE reference to the kernel output: `u` NULL after the left join
    # already means "never in the strong graph" — no second distinct pass
    return (
        nation.select(F.col("n_nationkey").alias("nation_key"))
        .join(F.broadcast(peeled), F.col("u") == F.col("nation_key"), "left")
        .select(
            "nation_key",
            F.when(F.col("removed_round").isNotNull(), F.col("removed_round"))
            .when(F.col("u").isNull(), F.lit(0))
            .cast("int")
            .alias("removed_round"),
            (F.col("removed_round").isNull() & F.col("u").isNotNull()).alias(
                "in_core"
            ),
            F.col("core_degree").cast("bigint").alias("core_degree"),
        )
        .orderBy("nation_key")
    )


# --- HyperBall harmonic centrality (HLL-register neighbourhood sketch) ----

HB_ROUNDS = 3  # same radius as the exact twin (harmonic_centrality_trade)
HB_M = 16  # HLL buckets (b = 4 bits)
_HB_NUM = 0.673 * 256.0 * float(2**49)  # alpha_16 * m^2 * 2^49 — the raw-
# estimate numerator against the 2^49-scaled INTEGER register denominator


def _sql_hb_est(i: int) -> str:
    return f"""est{i} AS MATERIALIZED (
      SELECT v, CAST(ROUND(CASE WHEN raw <= 40.0 AND zeros > 0
                                THEN 16.0 * ln(16.0 / zeros)
                                ELSE raw END * 1e6) AS BIGINT) AS e
      FROM (
        SELECT v, {_HB_NUM!r} / den::DOUBLE AS raw, zeros FROM (
          SELECT v,
                 SUM(1::BIGINT << (49 - reg))
                   + (16 - COUNT(*)) * {2**49}::BIGINT AS den,
                 16 - COUNT(*) AS zeros
          FROM s{i} GROUP BY v
        )
      )
    )"""


def _sql_hb_stage(i: int) -> str:
    return f"""u{i} AS MATERIALIZED (
      SELECT e.dst AS v, s.bucket, MAX(s.reg) AS reg
      FROM s{i - 1} s JOIN edges e ON e.src_n = s.v
      GROUP BY e.dst, s.bucket
    ), s{i} AS MATERIALIZED (
      SELECT v, bucket, MAX(reg) AS reg
      FROM (SELECT * FROM s{i - 1} UNION ALL SELECT * FROM u{i})
      GROUP BY v, bucket
    ), {_sql_hb_est(i)}"""


_HB_STAGES = ",\n    ".join(_sql_hb_stage(i) for i in range(1, HB_ROUNDS + 1))


@query(
    "hyperball_harmonic_trade",
    oracle=f"""
    WITH raw AS MATERIALIZED (
      SELECT DISTINCT c.c_nationkey AS src_n, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ), edges AS MATERIALIZED (SELECT src_n, dst FROM raw),
    s0 AS MATERIALIZED (
      SELECT n_nationkey AS v,
             CAST(('0x' || substr(md5(CAST(n_nationkey AS VARCHAR)), 1, 1))
                  AS INT) AS bucket,
             CAST(CASE WHEN ('0x' || substr(md5(CAST(n_nationkey AS VARCHAR)), 2, 12))::BIGINT > 0
                       THEN 49 - length(bin(('0x' || substr(md5(CAST(n_nationkey AS VARCHAR)), 2, 12))::BIGINT))
                       ELSE 49 END AS INT) AS reg
      FROM nation
    ), {_sql_hb_est(0)},
    {_HB_STAGES}
    SELECT n.n_name AS nation,
           e1.e::DOUBLE / 1e6 AS ball_r1,
           e2.e::DOUBLE / 1e6 AS ball_r2,
           e3.e::DOUBLE / 1e6 AS ball_r3,
           ((e1.e - e0.e)
             + CAST(ROUND((e2.e - e1.e)::DOUBLE / 2) AS BIGINT)
             + CAST(ROUND((e3.e - e2.e)::DOUBLE / 3) AS BIGINT))::DOUBLE / 1e6
             AS harmonic_est
    FROM nation n
    JOIN est0 e0 ON e0.v = n.n_nationkey
    JOIN est1 e1 ON e1.v = n.n_nationkey
    JOIN est2 e2 ON e2.v = n.n_nationkey
    JOIN est3 e3 ON e3.v = n.n_nationkey
    ORDER BY nation
    """,
)
def hyperball_harmonic_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013) harmonic centrality — the SKETCH
    twin of ``harmonic_centrality_trade`` and the implemented version of
    the swap that query's docstring names for web scale: per-node
    neighbourhood size at radius r is estimated by an HLL register set
    (m=16 md5-derived buckets), balls grow by pushing registers along
    edges with a per-(node, bucket) MAX — so the iterated state is
    O(|V|·m) rows, never the exact twin's O(|V|²) distance matrix — and
    HC(v) ≈ Σ_r (|B_r(v)| − |B_{{r-1}}(v)|)/r on the estimates.

    Determinism (the part HLL sketches usually lack cross-engine): the
    register hash is md5-derived (bucket = first hex nibble, rho = 49 −
    bit_length of the next 48 bits via ``bin()`` — identical in both
    engines); the estimate denominator Σ2^(−reg) is kept as a 2^49-
    scaled INTEGER sum (≤ 16·2^49 = 2^53, exact in int64 — a double sum
    here would be partition-order-dependent in the last bit); the raw
    estimate is ONE division; the small-range correction's ln is
    rounded once to 1e-6ths; the harmonic accumulation is pure int64.

    Scale shape: facts collapse once to the edge list; each round is an
    edge equi-join + two map-side-combinable MAX aggregates over
    |V|·m-row state. At web scale registers pack into a single
    BINARY(m) column updated by an Arrow kernel — the plan shape (join,
    MAX-merge) is unchanged."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    edges = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src_n"), F.col("s_nationkey").alias("dst"))
        .distinct()
        .persist()  # tiny (≤ |nations|²); released by harness clearCache
    )
    h = F.md5(F.col("v").cast("string"))
    x = F.conv(F.substring(h, 2, 12), 16, 10).cast("bigint")
    state = nation.select(F.col("n_nationkey").alias("v")).select(
        "v",
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int").alias("bucket"),
        F.when(x > 0, F.lit(49) - F.length(F.bin(x)))
        .otherwise(F.lit(49))
        .cast("int")
        .alias("reg"),
    ).persist()

    def est(s: DataFrame, r: int) -> DataFrame:
        den = F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - reg AS INT))")
        ) + (F.lit(16) - F.count("*")) * F.lit(2**49).cast("bigint")
        zeros = F.lit(16) - F.count("*")
        g = s.groupBy("v").agg(den.alias("den"), zeros.alias("zeros"))
        raw = F.lit(_HB_NUM) / F.col("den").cast("double")
        e = F.when(
            (raw <= F.lit(40.0)) & (F.col("zeros") > 0),
            F.lit(16.0) * F.log(F.lit(16.0) / F.col("zeros")),
        ).otherwise(raw)
        return g.select("v", F.round(e * F.lit(1e6)).cast("bigint").alias(f"e{r}"))

    ests = [est(state, 0)]
    for r in range(1, HB_ROUNDS + 1):
        contrib = (
            edges.join(state, edges.src_n == state.v)
            .groupBy(F.col("dst").alias("v"), "bucket")
            .agg(F.max("reg").alias("reg"))
        )
        state = (
            state.unionByName(contrib)
            .groupBy("v", "bucket")
            .agg(F.max("reg").alias("reg"))
            .persist()
        )
        ests.append(est(state, r))
    joined = nation.select(F.col("n_nationkey").alias("v"), F.col("n_name").alias("nation"))
    for e in ests:
        joined = joined.join(F.broadcast(e), "v")
    harm_i6 = (
        (F.col("e1") - F.col("e0"))
        + F.round((F.col("e2") - F.col("e1")).cast("double") / 2).cast("bigint")
        + F.round((F.col("e3") - F.col("e2")).cast("double") / 3).cast("bigint")
    )
    return joined.select(
        "nation",
        (F.col("e1").cast("double") / 1e6).alias("ball_r1"),
        (F.col("e2").cast("double") / 1e6).alias("ball_r2"),
        (F.col("e3").cast("double") / 1e6).alias("ball_r3"),
        (harm_i6.cast("double") / 1e6).alias("harmonic_est"),
    ).orderBy("nation")


# --- TextRank keyword extraction (PageRank over the token graph) ----------

TR_ITERS = 5
TR_MIN_TOKEN_LEN = 3
TR_TOP_K = 20

_TR_SQL_TOKS = (
    "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
    f" t -> length(t) >= {TR_MIN_TOKEN_LEN})"
)


def _sql_tr_stage(i: int) -> str:
    return f"""trk{i + 1} AS MATERIALIZED (
      SELECT n.w,
             (15 * (SELECT r0 FROM trinit)) // 100
               + (85 * COALESCE(c.contrib, 0)) // 100 AS rank
      FROM trnodes n LEFT JOIN (
        SELECT e.dst AS w, SUM(p.rank * e.w_ppm // {PR_PPM}) AS contrib
        FROM trk{i} p JOIN tredges e ON e.src = p.w
        GROUP BY e.dst
      ) c USING (w)
    )"""


_TR_STAGES = ",\n    ".join(_sql_tr_stage(i) for i in range(TR_ITERS))


@query(
    "textrank_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT {_TR_SQL_TOKS} AS ts FROM documents
    ), big AS (
      SELECT unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS bg
      FROM tok
    ), adj AS (
      SELECT split_part(bg, ' ', 1) AS a, split_part(bg, ' ', 2) AS b
      FROM big
      WHERE split_part(bg, ' ', 1) <> split_part(bg, ' ', 2)
    ), raw_edges AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT a AS src, b AS dst FROM adj
        UNION ALL
        SELECT b AS src, a AS dst FROM adj
      ) GROUP BY src, dst
    ), out_w AS (
      SELECT src, SUM(w) AS total FROM raw_edges GROUP BY src
    ), tredges AS MATERIALIZED (
      SELECT e.src, e.dst, e.w * {PR_PPM} // o.total AS w_ppm
      FROM raw_edges e JOIN out_w o USING (src)
    ), trnodes AS MATERIALIZED (
      SELECT DISTINCT unnest(ts) AS w FROM tok
    ), trinit AS (
      SELECT {PR_ONE} // COUNT(*) AS r0 FROM trnodes
    ), trk0 AS (
      SELECT w, (SELECT r0 FROM trinit) AS rank FROM trnodes
    ),
    {_TR_STAGES}
    SELECT w AS token, CAST(rank AS BIGINT) AS rank_scaled,
           rank::DOUBLE / {PR_ONE} AS score, CAST(pos AS INT) AS pos
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rank DESC, w) AS pos
          FROM trk{TR_ITERS})
    WHERE pos <= {TR_TOP_K}
    ORDER BY pos
    """,
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the corpus-wide token co-occurrence graph — nodes are token types of
    length >= {TR_MIN_TOKEN_LEN}, undirected edges weight adjacent
    co-occurrence in the filtered token sequence, {TR_ITERS} damped
    iterations of the module's all-integer scheme, top-{TR_TOP_K} tokens.

    This is the VOCABULARY-SIZED-state counterpart to
    ``pagerank_nation_trade``: there the graph collapses to <=|nations|^2
    edges and the fixed point runs as one Arrow kernel; here the state is
    the vocabulary (Heaps-law sublinear but NOT driver-sized at 100 TB —
    tens of millions of types), so the iteration is the DISTRIBUTED
    loop-of-joins with a localCheckpoint'd rank frontier per step (the
    ``density_core_clusters`` lineage-truncation pattern; persist alone
    doubles the logical plan per iteration). The only driver scalar is
    the node COUNT (one job) feeding the integer base rank.

    Determinism: identical int64 arithmetic to PageRank (ppm edge
    normalization by floor division, rank*w_ppm // 1e6 contributions,
    15/85 damping in integer hundredths); the oracle unrolls the same
    {TR_ITERS} stages as CTEs keyed by token string."""
    docs = spread(load(spark, sf_dir, "documents"))
    from bigdata_2025_1_spark.functions import text as T
    from bigdata_2025_1_spark.functions.ranks import rank_after_limit

    toks = docs.select(
        F.filter(
            T.ws_tokens(F.lower(F.col("text"))),
            lambda t: F.length(t) >= TR_MIN_TOKEN_LEN,
        ).alias("ts")
    )
    ts = F.col("ts")
    idx = F.when(F.size(ts) >= 2, F.sequence(F.lit(1), F.size(ts) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(ts, i).alias("a"), F.element_at(ts, i + 1).alias("b")
        ),
    )
    adj = (
        toks.select(F.explode(pair).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    sym = adj.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        adj.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    raw_edges = sym.groupBy("src", "dst").agg(F.count("*").alias("w"))
    out_w = raw_edges.groupBy("src").agg(F.sum("w").alias("total"))
    edges = (
        raw_edges.join(out_w, "src")
        .select("src", "dst", F.expr(f"w * {PR_PPM} div total").alias("w_ppm"))
        .localCheckpoint()
    )
    nodes = (
        toks.select(F.explode("ts").alias("w")).distinct().localCheckpoint()
    )
    n = nodes.count()  # the one driver scalar: node count for the base rank
    if n == 0:
        # empty corpus -> empty ranking, same as the oracle (whose
        # trnodes CTE is empty); raising would fail the empty-input
        # robustness contract (tests/test_empty_tables.py)
        return spark.createDataFrame(
            [], "token string, rank_scaled bigint, score double, pos int"
        )
    r0 = PR_ONE // n
    base = (15 * r0) // 100
    ranks = nodes.select(
        "w", F.lit(r0).cast("bigint").alias("rank")
    ).localCheckpoint()
    for _ in range(TR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.w)
            .groupBy(F.col("dst").alias("w2"))
            .agg(F.sum(F.expr(f"rank * w_ppm div {PR_PPM}")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.w == F.col("w2"), "left")
            .select(
                "w",
                F.expr(f"{base} + (85 * coalesce(contrib, 0)) div 100").alias("rank"),
            )
            .localCheckpoint()
        )
    scored = ranks.select(
        F.col("w").alias("token"),
        F.col("rank").alias("rank_scaled"),
        (F.col("rank").cast("double") / F.lit(float(PR_ONE))).alias("score"),
    )
    return (
        rank_after_limit(
            scored, [F.desc("rank_scaled"), F.col("token")], TR_TOP_K, rank_col="pos"
        )
        .select("token", "rank_scaled", "score", "pos")
        .orderBy("pos")
    )


# --- link prediction + mixing structure (round 7) ---------------------------

LP_TOP = 20
_I12 = 10**12

_SQL_UND = """
    raw AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ), und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw
    ), adj AS (
      SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u
    )
"""


def _und_adj(spark: SparkSession, sf_dir: str):
    """Spark twin of ``_SQL_UND``: the undirected nation trade graph as
    (und pairs a<b, directed adj, integer degrees)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )
    und = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("d"))
    return und, adj, deg


def link_scores_from_und(und: DataFrame, adj: DataFrame, deg: DataFrame) -> DataFrame:
    """Neighborhood link-prediction scores for every NON-adjacent pair
    of an undirected graph: (x, y, common_neighbors,
    resource_allocation, jaccard). Module-level so the arithmetic is
    property-testable against a scalar reference. ``und`` holds each
    edge once as (a<b); ``adj`` both directions as (u,v); ``deg``
    (u, d). RA weights freeze to i12 integers (1e12 div deg) so the
    score is an exact integer sum."""
    wgt = deg.select("u", F.expr(f"{_I12} div d").alias("w12"))
    e2 = adj.select(F.col("u").alias("m2"), F.col("v").alias("y"))
    two = adj.select(F.col("u").alias("x"), F.col("v").alias("m")).join(
        e2, (F.col("m") == F.col("m2")) & (F.col("x") < F.col("y"))
    )
    cand = (
        two.join(F.broadcast(wgt.select(F.col("u").alias("m"), "w12")), "m")
        .groupBy("x", "y")
        .agg(F.count("*").alias("common_neighbors"), F.sum("w12").alias("ra12"))
    )
    nonadj = cand.join(
        und,
        (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
        "left_anti",
    )
    dx = F.broadcast(deg.select(F.col("u").alias("x"), F.col("d").alias("deg_x")))
    dy = F.broadcast(deg.select(F.col("u").alias("y"), F.col("d").alias("deg_y")))
    return (
        nonadj.join(dx, "x")
        .join(dy, "y")
        .select(
            "x",
            "y",
            "common_neighbors",
            F.round(F.col("ra12").cast("double") / _I12, 9).alias(
                "resource_allocation"
            ),
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("common_neighbors")),
                9,
            ).alias("jaccard"),
        )
    )


@query(
    "link_prediction_trade",
    oracle=f"""
    WITH {_SQL_UND}, wgt AS (
      SELECT u, d, {_I12} // d AS w12 FROM deg
    ), two AS (
      SELECT e1.u AS x, e1.v AS m, e2.v AS y
      FROM adj e1 JOIN adj e2 ON e2.u = e1.v AND e1.u < e2.v
    ), cand AS (
      SELECT t.x, t.y, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             SUM(w.w12) AS ra12
      FROM two t JOIN wgt w ON w.u = t.m
      GROUP BY t.x, t.y
    ), nonadj AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = c.x AND e.b = c.y)
    ), scored AS (
      SELECT x, y, common_neighbors, ra12,
             dx.d AS deg_x, dy.d AS deg_y
      FROM nonadj JOIN deg dx ON dx.u = x JOIN deg dy ON dy.u = y
    )
    SELECT nx.n_name AS nation_a, ny.n_name AS nation_b,
           common_neighbors,
           ROUND(CAST(ra12 AS DOUBLE) / {_I12}, 9) AS resource_allocation,
           ROUND(CAST(common_neighbors AS DOUBLE)
                 / (deg_x + deg_y - common_neighbors), 9) AS jaccard
    FROM scored
    JOIN nation nx ON nx.n_nationkey = x
    JOIN nation ny ON ny.n_nationkey = y
    ORDER BY ra12 DESC, common_neighbors DESC, nation_a, nation_b
    LIMIT {LP_TOP}
    """,
)
def link_prediction_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the undirected nation trade graph: for every
    NON-adjacent pair, the three classical neighborhood scores — common
    neighbors, Jaccard, and the resource-allocation index (Zhou et al.
    2009, Σ_m 1/deg(m) over shared neighbors — the exact-arithmetic
    sibling of Adamic-Adar, whose 1/ln(deg) weights would hang
    cross-engine determinism on libm last bits). Top candidates =
    "which trade lanes should exist but don't".

    Determinism: per-node weights freeze to exact i12 integers
    (1e12 div deg), so RA scores are integer sums; Jaccard divides two
    exact ints once; ordering is a (ra12, cn, names) total order.

    Scale shape: the candidate generator is the two-hop equi-join
    adj⋈adj on the middle vertex (with x<y dedup) — the canonical
    distributed shape whose cost is Σ_m deg(m)², bounded by the
    hub-capping the dedup family documents, NOT an all-pairs product;
    existing edges drop via an anti-join; degrees broadcast. On the
    25-nation graph every frame is tiny — the plan is the operator."""
    und, adj, deg = _und_adj(spark, sf_dir)
    nation = load(spark, sf_dir, "nation")
    scored = link_scores_from_und(und, adj, deg)
    nx = F.broadcast(
        nation.select(F.col("n_nationkey").alias("x"), F.col("n_name").alias("nation_a"))
    )
    ny = F.broadcast(
        nation.select(F.col("n_nationkey").alias("y"), F.col("n_name").alias("nation_b"))
    )
    return (
        scored.join(nx, "x")
        .join(ny, "y")
        .select(
            "nation_a",
            "nation_b",
            "common_neighbors",
            "resource_allocation",
            "jaccard",
        )
        .orderBy(
            F.desc("resource_allocation"),
            F.desc("common_neighbors"),
            "nation_a",
            "nation_b",
        )
        .limit(LP_TOP)
    )


@query(
    "degree_assortativity_trade",
    oracle=f"""
    WITH {_SQL_UND}, ends AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM adj e JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(dx AS HUGEINT)) AS sx, SUM(CAST(dy AS HUGEINT)) AS sy,
             SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
             SUM(CAST(dy AS HUGEINT) * dy) AS syy,
             SUM(CAST(dx AS HUGEINT) * dy) AS sxy
      FROM ends
    )
    SELECT n AS n_edge_ends,
           CASE WHEN n > 1 AND n * sxx > sx * sx THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9)
           END AS assortativity
    FROM m
    """,
)
def degree_assortativity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the trade graph (Newman 2002): the
    Pearson correlation of endpoint degrees over all directed edge ends
    — positive means hubs trade with hubs (a resilient core), negative
    means hubs serve the periphery (hub-and-spoke, fragile to hub
    loss). The one-scalar mixing diagnostic that tells you which
    skew-handling strategy a graph workload needs.

    Determinism: degrees are exact integers; the five correlation
    moments accumulate in HUGEINT/decimal(38,0); r is one pinned double
    chain rounded to 9, NULL when degenerate (no edges or constant
    degree) under identical guards. Using both edge directions makes
    the correlation symmetric without a /2 convention.

    Scale shape: two broadcast-degree joins onto the edge list + one
    scalar moment aggregate — no windows, no self-join."""
    _, adj, deg = _und_adj(spark, sf_dir)
    dec = "decimal(38,0)"
    ends = adj.join(
        F.broadcast(deg.select(F.col("u").alias("_u"), F.col("d").alias("dx"))),
        F.col("u") == F.col("_u"),
    ).join(
        F.broadcast(deg.select(F.col("u").alias("_v"), F.col("d").alias("dy"))),
        F.col("v") == F.col("_v"),
    )
    m = ends.agg(
        F.count("*").alias("n"),
        F.sum(F.col("dx").cast(dec)).alias("sx"),
        F.sum(F.col("dy").cast(dec)).alias("sy"),
        F.sum(F.col("dx").cast(dec) * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy").cast(dec) * F.col("dy")).alias("syy"),
        F.sum(F.col("dx").cast(dec) * F.col("dy")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n") > 1) & (vx > 0)
    return m.select(
        F.col("n").alias("n_edge_ends"),
        F.when(
            ok,
            F.round(
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                9,
            ),
        ).alias("assortativity"),
    )


def scc_closure_kernel(df):
    """Strongly-connected components by boolean transitive closure on a
    combined frame of DIRECTED edge rows ``(src, dst, w=1)`` and
    node-marker rows ``(key, key, -1)``: reach = (I ∨ A)^n via repeated
    squaring, SCC id = min node mutually reachable. Exact set algebra —
    no floats anywhere — and O(n³ log n) bitwise work on the collapsed
    ≤|nations|² matrix. Module-level (the pagerank_int_kernel
    convention) so the closure is directly property-testable."""
    import numpy as np
    import pandas as pd

    if df.empty:
        return None
    is_node = df["w"].to_numpy() == -1
    node_keys = np.sort(df.loc[is_node, "src"].to_numpy(np.int64))
    n = len(node_keys)
    if n == 0:
        return None
    idx = {k: i for i, k in enumerate(node_keys)}
    reach = np.eye(n, dtype=bool)
    e = df.loc[~is_node]
    for s, d in zip(e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)):
        reach[idx[s], idx[d]] = True
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2))))) + 1):
        nxt = reach | (reach @ reach)
        if (nxt == reach).all():
            break
        reach = nxt
    mutual = reach & reach.T
    scc_id = [int(node_keys[np.flatnonzero(mutual[i])[0]]) for i in range(n)]
    return pd.DataFrame({"nation_key": node_keys, "scc_id": scc_id})


@query(
    "scc_trade_graph",
    oracle="""
    WITH RECURSIVE raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY src, dst
    ), strong AS (
      SELECT src, dst FROM raw WHERE 625 * w > (SELECT SUM(w) FROM raw)
    ), reach AS (
      SELECT n_nationkey AS a, n_nationkey AS b FROM nation
      UNION
      SELECT r.a, e.dst FROM reach r JOIN strong e ON e.src = r.b
    ), scc AS (
      SELECT r1.a AS u, MIN(r1.b) AS scc_id
      FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
      GROUP BY r1.a
    ), sz AS (
      SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS scc_size
      FROM scc GROUP BY scc_id
    )
    SELECT na.n_name AS nation, CAST(s.scc_id AS BIGINT) AS scc_id,
           z.scc_size
    FROM scc s
    JOIN nation na ON na.n_nationkey = s.u
    JOIN sz z ON z.scc_id = s.scc_id
    ORDER BY scc_id, nation
    """,
)
def scc_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly-connected components of the DIRECTED strong trade graph
    (customer nation → supplier nation, the kcore/triangle
    above-average-volume edge rule): nations in one SCC buy from AND
    sell to each other through some directed cycle — the directed twin
    of ``dedup_connected_components``'s undirected components, and the
    reachability structure ``bfs_trade_reachability`` only probes from
    one source. Nations outside every strong cycle are singletons.

    Determinism: pure integer set algebra — the kernel computes the
    boolean transitive closure by repeated squaring and labels each
    node with the MINIMUM mutually-reachable key; the oracle grows the
    identical closure as a recursive CTE (UNION dedup terminates it) —
    no floats, no iteration-order sensitivity (closure is confluent).

    Scale shape: the expensive part is the edge collapse — one
    fact-fact shuffle with broadcast dims, 100 TB → ≤|nations|² weighted
    edges; the closure then runs as ONE Arrow kernel over that provably
    tiny matrix (the pagerank_int_kernel convention). For SCC over
    billion-node graphs keep the distributed forward/backward label
    propagation shape (``dedup_connected_components`` demonstrates the
    loop) instead of the closure matrix."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    # persisted: the threshold scalar, the strong-edge filter, and the
    # two downstream consumers of the kernel labels would otherwise
    # replay the fact-fact shuffle. Cache contract: see
    # pagerank_nation_trade.
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .persist()
    )
    wtot = raw.agg(F.sum("w").alias("wt"))
    strong = (
        raw.crossJoin(F.broadcast(wtot))
        .filter(625 * F.col("w") > F.col("wt"))
        .select("src", "dst", F.lit(1).cast("bigint").alias("w"))
    )
    markers = nation.select(
        F.col("n_nationkey").alias("src"),
        F.col("n_nationkey").alias("dst"),
        F.lit(-1).cast("bigint").alias("w"),
    )
    combined = strong.unionByName(markers).coalesce(1)

    def kernel(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        out = scc_closure_kernel(df)
        if out is not None:
            yield out

    labeled = combined.mapInPandas(kernel, "nation_key bigint, scc_id bigint")
    sz = labeled.groupBy("scc_id").agg(F.count("*").alias("scc_size"))
    return (
        labeled.join(
            F.broadcast(nation),
            F.col("nation_key") == F.col("n_nationkey"),
        )
        .join(F.broadcast(sz), "scc_id")
        .select(F.col("n_name").alias("nation"), "scc_id", "scc_size")
        .orderBy("scc_id", "nation")
    )


@query(
    "local_clustering_trade",
    oracle="""
    WITH raw AS MATERIALIZED (
      SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ), und AS MATERIALIZED (
      SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b, SUM(w) AS w
      FROM raw WHERE u <> v
      GROUP BY LEAST(u, v), GREATEST(u, v)
    ), strong AS MATERIALIZED (
      SELECT a, b FROM und
      WHERE 625 * w > (SELECT SUM(w) FROM und)
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM strong e1
      JOIN strong e2 ON e2.a = e1.b AND e2.b > e1.b
      JOIN strong e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tcnt AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT x AS n FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY n
    ), deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM strong
        UNION ALL SELECT b FROM strong
      ) GROUP BY n
    )
    SELECT CAST(deg.n AS BIGINT) AS nation_key, deg.d AS degree,
           COALESCE(tcnt.t, 0) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
             ROUND(2.0 * COALESCE(tcnt.t, 0) / (deg.d * (deg.d - 1)), 6)
           END AS clustering_coeff
    FROM deg LEFT JOIN tcnt ON tcnt.n = deg.n
    ORDER BY nation_key
    """,
)
def local_clustering_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per nation over the STRONG trade
    graph (same edge rule as ``triangle_count_trade``: volume above the
    graph average, integer test): lcc(v) = 2*T(v) / (deg(v)*(deg(v)-1))
    — the "are my trade partners also each other's partners" readout
    that separates hub-and-spoke nations (lcc ~ 0) from trading blocs
    (lcc ~ 1). Per-node companion of the global triangle count, and the
    third leg of the degree/assortativity/clustering descriptive suite.

    Determinism: triangles come from the same ordered a<b<c join algebra
    (each counted once, then credited to all three corners); T(v) and
    deg(v) are exact integers; lcc is one guarded double chain rounded
    to 6 (NULL for degree < 2, where it is undefined).

    Scale shape: 100 TB of facts collapses to a <= |nations|^2 edge list
    in ONE fact-fact shuffle with broadcast dims; triangles, corner
    credits, and degrees all run on that bounded set. For social-scale
    edge lists the identical algebra runs distributed with
    degree-ordered joins (the compact-forward note on
    triangle_count_trade)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    raw = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v"))
        .agg(F.count("*").alias("w"))
    )
    und = (
        raw.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"), "w"
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    total = und.agg(F.sum("w").alias("tw"))
    strong = (
        und.crossJoin(F.broadcast(total))
        .filter(625 * F.col("w") > F.col("tw"))
        .select("a", "b")
        .persist()  # tiny (<= |nations|^2); released by harness clearCache
    )
    e1 = strong.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = strong.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = strong.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(
            F.broadcast(e2), (F.col("y2") == F.col("y")) & (F.col("z") > F.col("y"))
        )
        .join(
            F.broadcast(e3),
            (F.col("x3") == F.col("x")) & (F.col("z3") == F.col("z")),
        )
        .select("x", "y", "z")
    )
    tcnt = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("t"))
    )
    deg = (
        strong.select(F.col("a").alias("n"))
        .unionAll(strong.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    return (
        deg.join(tcnt, "n", "left")
        .select(
            F.col("n").cast("bigint").alias("nation_key"),
            F.col("d").alias("degree"),
            F.coalesce("t", F.lit(0).cast("bigint")).alias("n_triangles"),
            F.when(
                F.col("d") >= 2,
                F.round(
                    2.0
                    * F.coalesce("t", F.lit(0).cast("bigint")).cast("double")
                    / (F.col("d") * (F.col("d") - 1)),
                    6,
                ),
            ).alias("clustering_coeff"),
        )
        .orderBy("nation_key")
    )
