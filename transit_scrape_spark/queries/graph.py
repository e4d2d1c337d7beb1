"""Iterative graph algorithm on DataFrames (the driver-loop pattern).

Spark has no recursive SQL; iterative algorithms (connected components,
label propagation, PageRank) run as a driver loop over DataFrame
transformations, with the iteration count bounded by graph diameter.
At scale: localCheckpoint every few iterations to truncate lineage,
partition the edge list by src so the per-iteration join is co-located.

Oracled via DuckDB's WITH RECURSIVE transitive closure — the fixpoint
both computations converge to is the same min-label assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_scrape_spark.queries.registry import query
from transit_scrape_spark.sources.tables import load_table


def _nation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected nation-trade graph: an edge when some order links a
    customer nation to a supplier nation (restricted to low-key lineitems
    so the graph is sparse enough to have several components)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 13 == 0)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("a"),
            F.col("s_nationkey").cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # symmetrize via explode, not a self-referencing union: the union
    # form planned the whole lineitem->orders->customer->supplier chain
    # join once PER DIRECTION (every graph op paid the edge derivation
    # twice, r11). Output rows identical: each distinct (a, b) emits
    # itself and its swap, and the outer distinct collapses the
    # both-directions-present duplicates exactly as the union form did.
    sym = F.explode(
        F.array(
            F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
            F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
        )
    )
    return pairs.select(sym.alias("_e")).select("_e.*").distinct()


_EDGES_SQL = """
    SELECT DISTINCT a, b FROM (
        SELECT CAST(c.c_nationkey AS BIGINT) AS a, CAST(s.s_nationkey AS BIGINT) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_partkey % 13 = 0 AND c.c_nationkey <> s.s_nationkey
        UNION ALL
        SELECT CAST(s.s_nationkey AS BIGINT) AS a, CAST(c.c_nationkey AS BIGINT) AS b
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE l.l_partkey % 13 = 0 AND c.c_nationkey <> s.s_nationkey
    )
"""


@query(
    "graph-components-iterative",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        nodes AS (
            SELECT DISTINCT n_nationkey AS node FROM (
                SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey FROM nation
            )
        ),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
        )
        SELECT node, CAST(min(r) AS BIGINT) AS component
        FROM reach
        GROUP BY node
    """,
    doc="Connected components by min-label propagation PLUS pointer "
    "jumping: each round first takes the min over graph neighbors, "
    "then follows the label chain one hop (my label's label) — the "
    "second step halves path lengths, so a diameter-d chain converges "
    "in O(log d) rounds instead of O(d). (On THIS fixture graph the "
    "driver-loop cost is dominated by deriving the edge table from the "
    "lineitem join chain, not by rounds — the jump matters when "
    "components are long paths.) Isolated nations form their own "
    "components. Oracle is DuckDB's recursive transitive closure — "
    "same fixpoint. At scale: checkpoint lineage every few rounds; "
    "large-star/small-star contraction is the same doubling idea with "
    "edge rewriting.",
)
def graph_components_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    nodes = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("long").alias("node"))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node")).persist()
    for it in range(25):  # safety bound; pointer jumping exits in O(log d)
        neighbor_min = (
            labels.join(edges, labels.node == edges.a)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        )
        # pointer jump: adopt the component of my component's node —
        # path-halving makes label chains collapse exponentially
        lookup = stepped.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        new_labels = (
            stepped.join(lookup, stepped.component == lookup.c_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("c_comp", F.col("component"))
                ).alias("component"),
            )
        )
        if (it + 1) % 5 == 0:
            # truncate lineage: without this the plan doubles every
            # iteration and executors replay the whole chain on any
            # cache eviction (localCheckpoint materializes eagerly).
            # NOTE the persist/unpersist below recomputes between cuts:
            # DataFrame.unpersist cascades into dependent caches. Cheap
            # here (25 nodes, driver-side overhead dominates); at data
            # scale use localCheckpoint EVERY round — see
            # dedup_cluster_keep and SCALING.md.
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()  # superseded generation — don't hold every round
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("node", "component")


def _pagerank_iteration_sql(n_iters: int) -> str:
    """r1..rN CTEs, each one unrolled PageRank step (no dangling-mass
    redistribution; isolated nodes hold the teleport term only)."""
    ctes = []
    for i in range(1, n_iters + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""
        r{i} AS (
            SELECT n.node,
                   0.15 / (SELECT count(*) FROM nodes)
                   + 0.85 * coalesce(sum({prev}.r / deg.d), 0) AS r
            FROM nodes n
            LEFT JOIN edges e ON e.b = n.node
            LEFT JOIN {prev} ON {prev}.node = e.a
            LEFT JOIN deg ON deg.node = e.a
            GROUP BY n.node
        )"""
        )
    return ",".join(ctes)


_PR_ITERS = 5


@query(
    "graph-pagerank",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        nodes AS (
            SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS node FROM nation
        ),
        deg AS (
            SELECT a AS node, CAST(count(*) AS DOUBLE) AS d
            FROM edges GROUP BY a
        ),
        r0 AS (
            SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS r FROM nodes
        ),
        {_pagerank_iteration_sql(_PR_ITERS)}
        SELECT node, round(r{_PR_ITERS}.r, 6) AS pagerank
        FROM r{_PR_ITERS}
    """,
    doc=f"PageRank ({_PR_ITERS} synchronous iterations, damping 0.85) on "
    "the nation-trade graph as a driver loop: each round joins the "
    "edge list to current ranks, divides by out-degree, and re-sums "
    "per target — one co-partitioned join + one groupBy per round. "
    "The oracle UNROLLS the same five iterations as SQL CTEs "
    "(recursive aggregation is exactly what plain SQL cannot express "
    "— the honest statement of why iterative algorithms are driver "
    "loops on Spark). Scale hygiene mirrors graph-components: cache "
    "each generation, unpersist the last, checkpoint lineage every "
    "few rounds; edges pre-partitioned by src so every iteration "
    "reuses the same exchange.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The loop builds ONE lazy 5-round plan: the expensive relations
    # (edge derivation and its out-degree join) are persisted and thus
    # computed once, while the per-round rank relation stays lazy — a
    # fixed small iteration count doesn't need per-round
    # materialization jobs (measured: 5 persist+count rounds cost ~3s
    # of pure job overhead on a 25-node graph). For unbounded/large
    # iteration (convergence loops on big graphs), switch to
    # graph-components-iterative's hygiene: persist each generation,
    # unpersist the last, localCheckpoint every ~5 rounds to truncate
    # the growing lineage.
    # persist: deg AND the out join both consume edges — unpersisted,
    # the chain-join edge derivation ran twice (r11)
    edges = _nation_edges(spark, sf_dir).persist()
    nodes = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("long").alias("node"))
        .distinct()
        .persist()
    )
    # max(1) keeps the op total on an empty graph: zero nodes means the
    # rank relation is empty anyway, the divisor is never observed
    n_nodes = max(nodes.count(), 1)
    deg = edges.groupBy("a").agg(F.count("*").cast("double").alias("d"))
    # (a, b, d): source, target, out-degree — consumed by every round
    out = edges.join(deg, "a").persist()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            out.join(ranks, out.a == ranks.node)
            .select(F.col("b").alias("node"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n_nodes)
                    + 0.85 * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round("r", 6).alias("pagerank"))


@query(
    "graph-bfs-distance",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        walk(node, d) AS (
            SELECT CAST(0 AS BIGINT) AS node, 0 AS d
            UNION
            SELECT e.b, walk.d + 1
            FROM walk JOIN edges e ON walk.node = e.a
            WHERE walk.d < 6
        )
        SELECT node, CAST(min(d) AS BIGINT) AS dist
        FROM walk
        GROUP BY node
    """,
    doc="BFS hop distance from nation 0 over the trade graph (bounded "
    "to 6 hops): frontier expansion as a driver loop — each round "
    "joins the frontier to the edge list, anti-joins already-visited "
    "nodes, unions into the visited set. Per-round cost is "
    "|frontier| x avg-degree (never the whole graph), the loop ends "
    "when the frontier empties — the reachability/shortest-path "
    "primitive under distance-bounded joins and '2nd-degree "
    "connection' features. Oracle: DuckDB recursive CTE to the same "
    "fixpoint. Scale hygiene as graph-components: persist each "
    "frontier/visited generation, unpersist superseded, checkpoint "
    "on long diameters.",
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    visited = (
        edges.sparkSession.range(1)
        .select(F.lit(0).cast("long").alias("node"), F.lit(0).cast("long").alias("dist"))
        .persist()
    )
    frontier = visited.select("node")
    prev_nxt = None
    for depth in range(1, 7):
        nxt = (
            frontier.join(edges, frontier.node == edges.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        old = visited
        visited = visited.unionByName(nxt).persist()
        visited.count()
        old.unpersist()
        # the previous frontier has now been fully consumed (it fed this
        # generation's expansion and the already-counted union) — drop
        # it so the loop holds at most two frontier caches, not one per
        # generation
        if prev_nxt is not None:
            prev_nxt.unpersist()
        frontier = nxt.select("node")
        prev_nxt = nxt
    result = visited
    if prev_nxt is not None:
        prev_nxt.unpersist()
    edges.unpersist()
    return result


@query(
    "graph-triangle-count",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        t AS (SELECT a, b FROM edges WHERE a < b)
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM t e1
        JOIN t e2 ON e1.b = e2.a
        JOIN t e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Distributed triangle counting by edge orientation: each "
    "undirected edge kept once as (a<b), then two equi-joins find "
    "wedges a-b-c and close them against the oriented edge (a,c). "
    "Orientation means every triangle is counted exactly once AND the "
    "join fan-out is bounded by out-degree under the a<b ordering (the "
    "standard trick that keeps the wedge set near-linear on power-law "
    "graphs; degree-based orientation tightens it further). Two "
    "shuffles on edge endpoints — no vertex ever sees more than its "
    "neighbourhood.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir)
    t = edges.filter(F.col("a") < F.col("b")).persist()
    e1 = t.alias("e1")
    e2 = t.alias("e2")
    e3 = t.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tri = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


@query(
    "graph-degree-histogram",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (
            SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
            FROM edges GROUP BY a
        )
        SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
    """,
    doc="Degree distribution of the nation-trade graph: degree per node "
    "(edges are stored in both directions, so out-degree = full degree) "
    "then a histogram over degrees. The first thing to look at before "
    "running any graph algorithm at scale — it is two map-side-combined "
    "groupBys whose shuffles carry |V| then |distinct degrees| rows, "
    "and it tells you whether hub nodes will need the high-degree "
    "pruning the similarity ops apply. Reference-free addition; same "
    "edge derivation as graph-components-iterative (graph.py:22).",
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    return deg.groupBy("degree").agg(F.count("*").cast("long").alias("n_nodes"))


@query(
    "graph-jaccard-neighbors",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (
            SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
            FROM edges GROUP BY a
        ),
        common AS (
            SELECT e1.a AS u, e2.a AS v, CAST(count(*) AS BIGINT) AS n_common
            FROM edges e1 JOIN edges e2
              ON e1.b = e2.b AND e1.a < e2.a
            GROUP BY e1.a, e2.a
        )
        SELECT c.u, c.v, c.n_common,
               round(CAST(c.n_common AS DOUBLE)
                     / (du.degree + dv.degree - c.n_common), 6) AS jaccard
        FROM common c
        JOIN deg du ON du.node = c.u
        JOIN deg dv ON dv.node = c.v
        WHERE CAST(c.n_common AS DOUBLE)
              / (du.degree + dv.degree - c.n_common) >= 0.5
    """,
    doc="Structural node similarity: Jaccard of neighbor sets for every "
    "node pair sharing at least one neighbor, thresholded at 0.5 — the "
    "link-prediction / role-equivalence primitive. Shape is the "
    "wedge-join (edges self-joined on the shared endpoint), which is "
    "exactly the triangle-count join re-aggregated per pair, then two "
    "broadcast-sized degree joins. At 100 TB the wedge join's fan-out "
    "is sum(degree^2) — bounded in practice by the same hub-cap "
    "pruning dedup-containment-score applies (drop nodes above a "
    "degree ceiling before the self-join; hubs are similar to "
    "everything, i.e. uninformative).",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("w1"))
    e2 = edges.select(F.col("a").alias("v"), F.col("b").alias("w2"))
    common = (
        e1.join(e2, (F.col("w1") == F.col("w2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    jac = F.col("n_common").cast("double") / (
        F.col("deg_u") + F.col("deg_v") - F.col("n_common")
    )
    return (
        common.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .filter(jac >= 0.5)
        .select("u", "v", "n_common", F.round(jac, 6).alias("jaccard"))
    )


_KCORE_K, _KCORE_ROUNDS = 3, 3


def _kcore_oracle() -> str:
    """Unrolled k-core peeling: each round recomputes degrees over the
    surviving subgraph and drops nodes under k. Fixed-round unrolling
    keeps it ANSI-SQL (recursive CTEs cannot delete); the Spark driver
    loop runs the same bounded rounds, so the two computations agree
    by construction even if the peel has not fully converged."""
    ctes = [f"edges AS ({_EDGES_SQL})"]
    prev_edges = "edges"
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"d{r} AS (SELECT a AS node, count(*) AS deg "
            f"FROM {prev_edges} GROUP BY a)"
        )
        ctes.append(f"s{r} AS (SELECT node FROM d{r} WHERE deg >= {_KCORE_K})")
        ctes.append(
            f"e{r} AS (SELECT e.a, e.b FROM {prev_edges} e "
            f"JOIN s{r} x ON e.a = x.node JOIN s{r} y ON e.b = y.node)"
        )
        prev_edges = f"e{r}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree
        FROM {prev_edges}
        GROUP BY a
        HAVING count(*) >= {_KCORE_K}"""
    )


@query(
    "graph-k-core",
    oracle=_kcore_oracle(),
    doc=f"k-core decomposition (k={_KCORE_K}, {_KCORE_ROUNDS} peeling "
    "rounds): iteratively drop nodes with degree < k and recompute "
    "degrees over the surviving subgraph — the standard dense-"
    "community / spam-ring extractor, and the canonical example of "
    "an algorithm recursive SQL CANNOT express (peeling deletes "
    "rows; WITH RECURSIVE only appends), hence the driver-loop "
    "DataFrame pattern of graph-components-iterative. Each round is "
    "a degree groupBy + two semi-joins against the survivor set — "
    "at 100 TB survivors shrink monotonically, so rounds get "
    "cheaper; localCheckpoint every few rounds bounds lineage. "
    "Round count is fixed (not converged) so the DuckDB unrolled "
    "oracle computes the identical bounded peel.",
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint per round: each round's edge set heads the next
    # round's lineage TWICE (degree pass + semi-join pass), so without
    # the cut round r replays the 4-table edge derivation 2^r times
    # (measured 12s at sf0.1 vs ~1s with the cut) — the same hygiene
    # graph_components_iterative documents.
    edges = _nation_edges(spark, sf_dir).localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy(F.col("a").alias("node")).agg(
            F.count("*").alias("deg")
        )
        survivors = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(
                F.broadcast(survivors.withColumnRenamed("node", "a")),
                "a",
                "left_semi",
            )
            .join(
                F.broadcast(survivors.withColumnRenamed("node", "b")),
                "b",
                "left_semi",
            )
            .localCheckpoint()
        )
    return (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.count("*").cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= _KCORE_K)
    )


_SPARSE_EDGES_SQL = _EDGES_SQL.replace("% 13", "% 211")


@query(
    "graph-assortativity",
    oracle=f"""
        WITH edges AS ({{_sparse}}),
        deg AS (
            SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
            FROM edges GROUP BY a
        ),
        m AS (
            SELECT count(*) AS n,
                   avg(CAST(da.degree AS DOUBLE)) AS mx,
                   avg(CAST(db.degree AS DOUBLE)) AS my,
                   avg(CAST(da.degree AS DOUBLE) * db.degree) AS mxy,
                   avg(CAST(da.degree AS DOUBLE) * da.degree) AS mx2,
                   avg(CAST(db.degree AS DOUBLE) * db.degree) AS my2
            FROM edges e
            JOIN deg da ON da.node = e.a
            JOIN deg db ON db.node = e.b
        )
        SELECT CAST(n AS BIGINT) AS n_directed_edges,
               round((mxy - mx * my)
                     / nullif(sqrt((mx2 - mx * mx) * (my2 - my * my)), 0), 6)
                   AS assortativity,
               round(mx, 4) AS avg_endpoint_degree
        FROM m
    """.replace("{_sparse}", _SPARSE_EDGES_SQL),
    doc="Degree assortativity: Pearson correlation of endpoint degrees "
    "over all (directed) edges — positive means hubs link to hubs "
    "(social-network shape), negative means hub-and-spoke "
    "(infrastructure shape). The one number that predicts how the "
    "graph fragments under hub removal and how badly a power-law "
    "skew will concentrate join load on a few partitions — worth "
    "knowing before running components/pagerank at 100 TB (cf. "
    "graph-degree-histogram for the marginal distribution). Both "
    "endpoints' degrees attach via broadcast joins of the |V|-row "
    "degree relation; corr() is a single-row aggregate with "
    "map-side-combined moment partials.",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sparser modulus than _nation_edges (211 vs 13): the dense trade
    # graph is COMPLETE at small SF (every degree equal), which makes
    # assortativity 0/0 — and Spark's ANSI-mode corr() raises
    # DIVIDE_BY_ZERO on a zero-variance input while DuckDB returns
    # NULL, so the statistic is assembled from raw moments with an
    # explicit nullif guard instead (cf. agg-moments-battery).
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 211 == 0)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .select(
            F.col("c_nationkey").cast("long").alias("a"),
            F.col("s_nationkey").cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # persist the bounded symmetrized edge list: deg + both join sides
    # reference it, and uncached each re-runs the 4-table fact join
    # (18 fact scans measured). release_caches() reclaims it.
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    x = F.col("deg_a").cast("double")
    y = F.col("deg_b").cast("double")
    m = (
        edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .agg(
            F.count("*").alias("n"),
            F.avg(x).alias("mx"),
            F.avg(y).alias("my"),
            F.avg(x * y).alias("mxy"),
            F.avg(x * x).alias("mx2"),
            F.avg(y * y).alias("my2"),
        )
    )
    mx, my, mxy, mx2, my2 = (F.col(k) for k in ("mx", "my", "mxy", "mx2", "my2"))
    return m.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.round(
            (mxy - mx * my)
            / F.nullif(F.sqrt((mx2 - mx * mx) * (my2 - my * my)), F.lit(0.0)),
            6,
        ).alias("assortativity"),
        F.round(mx, 4).alias("avg_endpoint_degree"),
    )


@query(
    "graph-clustering-coeff",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (SELECT a AS node, count(*) AS degree FROM edges GROUP BY a),
        wedges AS (
            SELECT x.a AS node, x.b AS u, y.b AS v
            FROM edges x JOIN edges y ON x.a = y.a AND x.b < y.b
        ),
        tri AS (
            SELECT w.node, count(*) AS triangles
            FROM wedges w
            WHERE EXISTS (SELECT 1 FROM edges e WHERE e.a = w.u AND e.b = w.v)
            GROUP BY w.node
        )
        SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN round(COALESCE(t.triangles, 0) * 2.0
                               / (d.degree * (d.degree - 1.0)), 6)
                    ELSE 0.0 END AS clustering_coeff
        FROM deg d LEFT JOIN tri t ON d.node = t.node
        ORDER BY d.node
    """,
    doc="Local clustering coefficient per node: closed-wedge count over "
    "(degree choose 2). Wedges are generated by the self-join of the "
    "directed edge list on the CENTER node (so they hash-partition by "
    "center and never leave their partition-group), and closure is a "
    "LEFT SEMI join against the edge list on the (u, v) endpoint pair "
    "- the semi join carries no payload through the shuffle and "
    "dedups for free. Same b<c ordering trick as graph-triangle-count "
    "counts each wedge once. At scale the wedge count is "
    "sum(deg^2)-bounded: high-degree hubs dominate, so the production "
    "posture is to cap or sample hub wedges - noted, not needed at "
    "nation-graph size.",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("degree")
    )
    x = edges.select(F.col("a").alias("node"), F.col("b").alias("u"))
    y = edges.select(F.col("a").alias("node"), F.col("b").alias("v"))
    wedges = x.join(y, "node").filter(F.col("u") < F.col("v"))
    closed = wedges.join(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_semi",
    )
    tri = closed.groupBy("node").agg(F.count("*").alias("triangles"))
    out = (
        deg.join(tri, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.coalesce(F.col("triangles"), F.lit(0)) * 2.0
                    / (F.col("degree") * (F.col("degree") - 1.0)),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
        .orderBy("node")
    )
    out = out.localCheckpoint()
    edges.unpersist()
    return out


@query(
    "graph-adamic-adar",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (
            SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
            FROM edges GROUP BY a
        ),
        wedge AS (
            SELECT e1.a AS u, e2.a AS v, e1.b AS w
            FROM edges e1 JOIN edges e2
              ON e1.b = e2.b AND e1.a < e2.a
        ),
        scored AS (
            SELECT wd.u, wd.v,
                   CAST(count(*) AS BIGINT) AS n_common,
                   sum(1.0 / ln(d.degree)) AS aa
            FROM wedge wd JOIN deg d ON d.node = wd.w
            WHERE d.degree > 1
            GROUP BY wd.u, wd.v
        )
        SELECT s.u, s.v, s.n_common, round(s.aa, 6) AS aa_score,
               (ex.a IS NOT NULL) AS is_edge
        FROM scored s
        LEFT JOIN (SELECT DISTINCT a, b FROM edges) ex
               ON ex.a = s.u AND ex.b = s.v
        WHERE s.aa >= 1.0
        ORDER BY aa_score DESC, s.u, s.v
    """,
    doc="Adamic-Adar link prediction over the nation-trade graph: for "
    "every node pair sharing a neighbor, score = sum over common "
    "neighbors w of 1/ln(deg(w)) — rare shared neighbors are strong "
    "evidence, hubs nearly none. Same wedge-join shape as "
    "graph-jaccard-neighbors (edges self-joined on the shared "
    "endpoint) with the weight attached by a broadcast degree join "
    "BEFORE the pair aggregation, so the shuffle carries (u,v, "
    "partial sums) — map-side combinable. is_edge marks pairs "
    "already linked (candidate new links are is_edge=false). At "
    "100 TB the wedge fan-out is sum(deg(w)^2) — 1/ln(deg) says "
    "hub wedges contribute ~nothing, so the standard degree-cap "
    "prune before the self-join loses no signal. deg>1 guard keeps "
    "1/ln(deg) finite; threshold aa>=1 bounds the output.",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("w"))
    e2 = edges.select(F.col("a").alias("v"), F.col("b").alias("w2"))
    wedge = e1.join(
        e2, (F.col("w") == F.col("w2")) & (F.col("u") < F.col("v"))
    ).select("u", "v", "w")
    dw = deg.select(F.col("node").alias("w"), "degree")
    scored = (
        wedge.join(F.broadcast(dw), "w")
        .filter(F.col("degree") > 1)
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum(1.0 / F.log(F.col("degree"))).alias("aa"),
        )
    )
    ex = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.lit(1).alias("hit")
    ).distinct()
    return (
        scored.join(F.broadcast(ex), ["u", "v"], "left")
        .filter(F.col("aa") >= 1.0)
        .select(
            "u",
            "v",
            "n_common",
            F.round("aa", 6).alias("aa_score"),
            F.col("hit").isNotNull().alias("is_edge"),
        )
        .orderBy(F.col("aa_score").desc(), "u", "v")
    )


@query(
    "graph-two-hop-neighbors",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        twohop AS (
            SELECT DISTINCT e1.a AS node, e2.b AS nbr2
            FROM edges e1 JOIN edges e2 ON e1.b = e2.a
            WHERE e2.b <> e1.a
        ),
        strict2 AS (
            SELECT t.node, t.nbr2
            FROM twohop t
            LEFT JOIN edges d ON d.a = t.node AND d.b = t.nbr2
            WHERE d.a IS NULL
        ),
        deg AS (
            SELECT a AS node, CAST(count(*) AS BIGINT) AS n_direct
            FROM edges GROUP BY a
        )
        SELECT d.node, d.n_direct,
               CAST(coalesce(s.n2, 0) AS BIGINT) AS n_exactly_two_hops
        FROM deg d
        LEFT JOIN (SELECT node, count(*) AS n2 FROM strict2 GROUP BY node) s
               ON s.node = d.node
        ORDER BY d.node
    """,
    doc="Exactly-2-hop reach per node: distinct nodes reachable in two "
    "edges but NOT one (friend-of-friend minus friend — the "
    "expansion metric behind contact-graph reach and "
    "recommendation candidate pools). Plan: one self-join on the "
    "shared endpoint (the wedge join every 2-hop question costs), "
    "DISTINCT to collapse multiplicity, an anti-join against the "
    "direct edges (LEFT JOIN ... IS NULL on both sides so the "
    "oracle and Spark agree on the null-extension), then a count "
    "per node joined onto the degree table so zero-reach nodes "
    "still appear. At scale the wedge fan-out is sum(deg^2) — "
    "degree-cap hubs first (a hub's 2-hop set approaches V and "
    "stops being informative) exactly as graph-jaccard-neighbors "
    "documents.",
)
def graph_two_hop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    e1 = edges.select(F.col("a").alias("node"), F.col("b").alias("mid"))
    e2 = edges.select(F.col("a").alias("mid"), F.col("b").alias("nbr2"))
    twohop = (
        e1.join(e2, "mid")
        .filter(F.col("nbr2") != F.col("node"))
        .select("node", "nbr2")
        .distinct()
    )
    direct = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr2")
    )
    strict2 = twohop.join(direct, ["node", "nbr2"], "left_anti")
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("n_direct")
    )
    n2 = strict2.groupBy("node").agg(F.count("*").alias("n2"))
    return (
        deg.join(n2, "node", "left")
        .select(
            "node",
            "n_direct",
            F.coalesce(F.col("n2"), F.lit(0))
            .cast("long")
            .alias("n_exactly_two_hops"),
        )
        .orderBy("node")
    )


@query(
    "graph-reciprocity",
    oracle="""
        WITH directed AS (
            SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                   CAST(s.s_nationkey AS BIGINT) AS dst
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE l.l_partkey % 13 = 0 AND c.c_nationkey <> s.s_nationkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reciprocal,
               round(CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS reciprocity
        FROM directed d
        LEFT JOIN directed r ON r.src = d.dst AND r.dst = d.src
    """,
    doc="Edge reciprocity of the DIRECTED nation-trade graph (customer "
    "nation buys-from supplier nation): fraction of edges whose "
    "reverse also exists — do trading relationships flow both "
    "ways? Derivation matches _nation_edges (graph.py:22) minus "
    "the symmetrization those undirected ops apply, because "
    "direction IS the question here. Plan: distinct edge set "
    "(one hash agg over the FK-chain join), self-join on the "
    "swapped key pair (equi-join, co-partitionable on the edge "
    "key), conditional count. |E| rows through every shuffle, "
    "facts touched once.",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 13 == 0
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    directed = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .distinct()
    )
    rev = directed.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.lit(1).alias("has_rev"),
    )
    j = directed.join(rev, ["src", "dst"], "left")
    return j.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum(F.when(F.col("has_rev").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reciprocal"),
        F.round(
            F.sum(F.when(F.col("has_rev").isNotNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("reciprocity"),
    )


@query(
    "graph-modularity",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        member AS (
            SELECT CAST(n_nationkey AS BIGINT) AS node,
                   CAST(n_regionkey AS BIGINT) AS comm
            FROM nation
        ),
        labeled AS (
            SELECT ma.comm AS ca, mb.comm AS cb
            FROM edges e
            JOIN member ma ON ma.node = e.a
            JOIN member mb ON mb.node = e.b
        ),
        m AS (SELECT CAST(count(*) AS DOUBLE) AS m2 FROM labeled),
        per_comm AS (
            SELECT ca AS comm,
                   CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                        AS DOUBLE) AS e_in,
                   CAST(count(*) AS DOUBLE) AS deg_sum
            FROM labeled GROUP BY ca
        )
        SELECT CAST(count(*) AS BIGINT) AS n_communities,
               round(sum(e_in / m2 - power(deg_sum / m2, 2)), 6)
                   AS modularity_q
        FROM per_comm, m
    """,
    doc="Newman modularity Q of the region partition over the "
    "nation-trade graph: Q = sum over communities of "
    "[intra-edge fraction - (degree fraction)^2] — how much more "
    "intra-community linkage than a degree-preserving random "
    "rewiring. Both terms come from ONE pass over the "
    "community-labeled directed edge list (two broadcast "
    "membership joins, then a groupBy(comm) that counts "
    "intra-edges and total endpoint degree together), so Q for "
    "ANY candidate partition costs one fact-scan — which is why "
    "Louvain's inner loop is exactly this computation "
    "incrementalized. The quality gate to run after "
    "graph-components-iterative or any clustering claims "
    "structure.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    member = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("node"),
        F.col("n_regionkey").cast("long").alias("comm"),
    )
    ma = member.select(F.col("node").alias("a"), F.col("comm").alias("ca"))
    mb = member.select(F.col("node").alias("b"), F.col("comm").alias("cb"))
    labeled = edges.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
    m2 = labeled.agg(F.count("*").cast("double").alias("m2"))
    per_comm = labeled.groupBy(F.col("ca").alias("comm")).agg(
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
        .cast("double")
        .alias("e_in"),
        F.count("*").cast("double").alias("deg_sum"),
    )
    return per_comm.crossJoin(F.broadcast(m2)).agg(
        F.count("*").cast("long").alias("n_communities"),
        F.round(
            F.sum(
                F.col("e_in") / F.col("m2")
                - F.pow(F.col("deg_sum") / F.col("m2"), 2)
            ),
            6,
        ).alias("modularity_q"),
    )


@query(
    "graph-rich-club",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (
            SELECT a AS node, count(*) AS degree FROM edges GROUP BY a
        ),
        ks AS (SELECT unnest(range(1, 9)) AS k),
        rich AS (
            SELECT k.k, d.node FROM ks k JOIN deg d ON d.degree > k.k
        ),
        club_edges AS (
            SELECT r1.k, CAST(count(*) AS DOUBLE) AS e2
            FROM edges e
            JOIN rich r1 ON r1.node = e.a
            JOIN rich r2 ON r2.node = e.b AND r2.k = r1.k
            GROUP BY r1.k
        ),
        club_size AS (
            SELECT k, CAST(count(*) AS DOUBLE) AS nk FROM rich GROUP BY k
        )
        SELECT s.k AS k,
               CAST(s.nk AS BIGINT) AS n_rich,
               CAST(coalesce(c.e2, 0) / 2 AS BIGINT) AS rich_edges,
               round(coalesce(c.e2, 0) / (s.nk * (s.nk - 1)), 6)
                   AS rich_club_coeff
        FROM club_size s LEFT JOIN club_edges c ON c.k = s.k
        WHERE s.nk >= 2
        ORDER BY s.k
    """,
    doc="Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) for "
    "degree thresholds k=1..8: do high-degree nodes preferentially "
    "connect to each other (phi -> 1 = an elite trading core)? "
    "Membership at every threshold materializes as a (k, node) "
    "relation in one broadcast range-join off the degree table, "
    "then club-internal edges come from two membership joins on "
    "the symmetric edge list (each undirected edge counted twice, "
    "halved at the end). All shuffles carry node-ids or the "
    "8-threshold summary. The hub-structure diagnostic that "
    "motivates the degree-cap pruning graph-jaccard-neighbors and "
    "graph-adamic-adar document.",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("degree")
    )
    ks = spark.range(1, 9).select(F.col("id").alias("k"))
    rich = ks.join(F.broadcast(deg), F.col("degree") > F.col("k")).select(
        "k", "node"
    )
    r1 = rich.select(F.col("k"), F.col("node").alias("a"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("node").alias("b2"))
    club_edges = (
        edges.join(F.broadcast(r1), "a")
        .join(
            F.broadcast(r2),
            (F.col("k") == F.col("k2")) & (F.col("b") == F.col("b2")),
        )
        .groupBy("k")
        .agg(F.count("*").cast("double").alias("e2"))
    )
    club_size = rich.groupBy("k").agg(F.count("*").cast("double").alias("nk"))
    return (
        club_size.join(club_edges, "k", "left")
        .filter(F.col("nk") >= 2)
        .select(
            "k",
            F.col("nk").cast("long").alias("n_rich"),
            (F.coalesce(F.col("e2"), F.lit(0.0)) / 2)
            .cast("long")
            .alias("rich_edges"),
            F.round(
                F.coalesce(F.col("e2"), F.lit(0.0))
                / (F.col("nk") * (F.col("nk") - 1)),
                6,
            ).alias("rich_club_coeff"),
        )
        .orderBy("k")
    )


@query(
    "graph-spectral-radius",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        v0 AS (SELECT node, 1.0 AS x FROM nodes),
        v1 AS (
            SELECT e.b AS node, sum(v0.x) AS x
            FROM edges e JOIN v0 ON v0.node = e.a GROUP BY e.b
        ),
        v2 AS (
            SELECT e.b AS node, sum(v1.x) AS x
            FROM edges e JOIN v1 ON v1.node = e.a GROUP BY e.b
        ),
        v3 AS (
            SELECT e.b AS node, sum(v2.x) AS x
            FROM edges e JOIN v2 ON v2.node = e.a GROUP BY e.b
        ),
        v4 AS (
            SELECT e.b AS node, sum(v3.x) AS x
            FROM edges e JOIN v3 ON v3.node = e.a GROUP BY e.b
        ),
        n3 AS (SELECT sqrt(sum(x * x)) AS nrm FROM v3),
        n4 AS (SELECT sqrt(sum(x * x)) AS nrm FROM v4)
        SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
               round(n4.nrm / n3.nrm, 6) AS spectral_radius_est
        FROM n3, n4
    """,
    doc="Spectral radius (largest adjacency eigenvalue) of the "
    "nation-trade graph by four UNROLLED power-method steps from "
    "the all-ones vector: each step is matvec-as-join-aggregate "
    "(edges join vector on source, sum into target — the "
    "fundamental sparse-matvec shape every graph algorithm here "
    "reduces to), and lambda_max ~ ||A^4 v|| / ||A^3 v||. "
    "Lambda_max bounds connectivity (>= avg degree, <= max "
    "degree) and sets epidemic/cascade thresholds (1/lambda). "
    "Unrolled lazily in ONE Spark plan — no driver loop, no "
    "collect; embed-power-iteration is the driver-loop sibling "
    "for when iteration count must be data-dependent.",
)
def graph_spectral_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    nodes = edges.select(F.col("a").alias("node")).distinct()
    v = nodes.withColumn("x", F.lit(1.0))
    vecs = [v]
    for _ in range(4):
        v = (
            edges.join(v, edges.a == v.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.sum("x").alias("x"))
            .withColumnRenamed("node2", "node")
        )
        vecs.append(v)
    n3 = vecs[3].agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm3"))
    n4 = vecs[4].agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm4"))
    cnt = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    return (
        cnt.crossJoin(F.broadcast(n3))
        .crossJoin(F.broadcast(n4))
        .select(
            "n_nodes",
            F.round(F.col("nrm4") / F.col("nrm3"), 6).alias(
                "spectral_radius_est"
            ),
        )
    )


@query(
    "graph-ktruss-support",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        canon AS (
            SELECT a, b FROM edges WHERE a < b
        ),
        support AS (
            SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS n_triangles
            FROM canon c
            JOIN edges e1 ON e1.a = c.a
            JOIN edges e2 ON e2.a = c.b AND e2.b = e1.b
            GROUP BY c.a, c.b
        )
        SELECT s.a, s.b, s.n_triangles,
               s.n_triangles >= 2 AS in_4truss
        FROM support s
        ORDER BY s.n_triangles DESC, s.a, s.b
        LIMIT 25
    """,
    doc="Edge triangle-support and 4-truss membership: each "
    "(canonical a<b) edge's triangle count comes from the "
    "two-join wedge closure (neighbors of a intersect neighbors "
    "of b, expressed as edges joined on both endpoints — the "
    "graph-triangle-count join re-aggregated PER EDGE), and "
    "support >= k-2 is the k-truss condition, the "
    "community-core definition that is strictly stronger than "
    "k-core (graph-k-core peels on degree; truss peels on "
    "triangle embedding). One peel round shown; the full truss "
    "decomposition iterates exactly this query on the "
    "surviving edge set, cost shrinking per round. Shuffles "
    "carry node-id pairs only.",
)
def graph_ktruss_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    canon = edges.filter(F.col("a") < F.col("b"))
    e1 = edges.select(F.col("a").alias("u1"), F.col("b").alias("w1"))
    e2 = edges.select(F.col("a").alias("u2"), F.col("b").alias("w2"))
    support = (
        canon.join(e1, canon.a == F.col("u1"))
        .join(
            e2,
            (canon.b == F.col("u2")) & (F.col("w1") == F.col("w2")),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        support.select(
            "a",
            "b",
            "n_triangles",
            (F.col("n_triangles") >= 2).alias("in_4truss"),
        )
        .orderBy(F.col("n_triangles").desc(), "a", "b")
        .limit(25)
    )


@query(
    "graph-closeness-centrality",
    oracle=f"""
        WITH RECURSIVE edges AS ({_EDGES_SQL}),
        walk(src, node, d) AS (
            SELECT CAST(s AS BIGINT) AS src, CAST(s AS BIGINT) AS node, 0 AS d
            FROM unnest([0, 1, 2, 3, 4]) AS t(s)
            UNION
            SELECT walk.src, e.b, walk.d + 1
            FROM walk JOIN edges e ON walk.node = e.a
            WHERE walk.d < 6
        ),
        dist AS (
            SELECT src, node, min(d) AS d
            FROM walk GROUP BY src, node
        )
        SELECT src,
               CAST(count(*) - 1 AS BIGINT) AS n_reached,
               CAST(sum(d) AS BIGINT) AS sum_dist,
               round((count(*) - 1.0) / sum(d), 6) AS closeness,
               round(sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 6)
                   AS harmonic
        FROM dist
        GROUP BY src
    """,
    doc="Closeness and harmonic centrality for 5 seed nations via ONE "
    "multi-source BFS: the frontier carries (src, node) pairs so all "
    "sources expand in the same driver loop — k sources cost one "
    "traversal with a k-wide state key, not k traversals (the "
    "landmark/pivot pattern used to approximate centrality at scale, "
    "where exact all-sources BFS is quadratic). Closeness = "
    "(reached-1)/sum(dist); harmonic = sum(1/d) handles disconnected "
    "components gracefully. Same per-generation persist/unpersist "
    "lineage hygiene as graph-bfs-distance; oracle is the same "
    "fixpoint as a multi-seed recursive CTE.",
    tags=("graph",),
)
def graph_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    seeds = [0, 1, 2, 3, 4]
    visited = (
        edges.sparkSession.createDataFrame(
            [(s, s, 0) for s in seeds], "src long, node long, dist long"
        )
    ).persist()
    frontier = visited.select("src", "node")
    prev_nxt = None
    for depth in range(1, 7):
        nxt = (
            frontier.join(edges, frontier.node == edges.a)
            .select("src", F.col("b").alias("node"))
            .distinct()
            .join(visited.select("src", "node"), ["src", "node"], "left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .persist()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        old = visited
        visited = visited.unionByName(nxt).persist()
        visited.count()
        old.unpersist()
        # previous frontier fully consumed (see graph_bfs_distance) —
        # at most two frontier caches live at once
        if prev_nxt is not None:
            prev_nxt.unpersist()
        frontier = nxt.select("src", "node")
        prev_nxt = nxt
    res = visited.groupBy("src").agg(
        (F.count("*") - 1).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.round((F.count("*") - 1.0) / F.sum("dist"), 6).alias("closeness"),
        F.round(
            F.sum(F.when(F.col("dist") > 0, 1.0 / F.col("dist")).otherwise(0.0)),
            6,
        ).alias("harmonic"),
    )
    if prev_nxt is not None:
        prev_nxt.unpersist()
    edges.unpersist()
    return res


@query(
    "graph-hits-scores",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        -- iteration 1: h0 = a0 = 1
        a1 AS (
            SELECT e.b AS node, CAST(count(*) AS DOUBLE) AS s
            FROM edges e GROUP BY e.b
        ),
        h1 AS (
            SELECT e.a AS node, CAST(count(*) AS DOUBLE) AS s
            FROM edges e GROUP BY e.a
        ),
        -- iteration 2: a2(v) = sum h1(u) over in-edges, h2(u) = sum a1(v)
        a2 AS (
            SELECT e.b AS node, sum(h1.s) AS s
            FROM edges e JOIN h1 ON e.a = h1.node GROUP BY e.b
        ),
        h2 AS (
            SELECT e.a AS node, sum(a1.s) AS s
            FROM edges e JOIN a1 ON e.b = a1.node GROUP BY e.a
        ),
        norm AS (
            SELECT (SELECT max(s) FROM a2) AS ma, (SELECT max(s) FROM h2) AS mh
        )
        SELECT n.node,
               round(coalesce(a2.s, 0) / norm.ma, 6) AS authority,
               round(coalesce(h2.s, 0) / norm.mh, 6) AS hub
        FROM nodes n
        LEFT JOIN a2 ON n.node = a2.node
        LEFT JOIN h2 ON n.node = h2.node, norm
    """,
    doc="HITS hub/authority scores on the nation trade graph, two "
    "synchronous power iterations from uniform init, max-normalized "
    "(the deterministic fixpoint-prefix both engines replay "
    "exactly; more iterations = same two aggregate-join shapes "
    "repeated). Each iteration is one equi-join of the edge list "
    "against the score vector + one hash aggregation — the "
    "pagerank plan shape with TWO mutually-recursive vectors "
    "instead of one. On this symmetric graph hub = authority "
    "per node; the op keeps both columns because the CONTRACT "
    "(and the plan) is directed. Complements graph-pagerank "
    "(single eigenvector) and graph-degree-histogram.",
    tags=("graph",),
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    nodes = edges.select(F.col("a").alias("node")).distinct()
    a1 = edges.groupBy(F.col("b").alias("node")).agg(
        F.count("*").cast("double").alias("s")
    )
    h1 = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("double").alias("s")
    )
    a2 = (
        edges.join(h1.withColumnRenamed("node", "a_node"), F.col("a") == F.col("a_node"))
        .groupBy(F.col("b").alias("node"))
        .agg(F.sum("s").alias("s"))
    )
    h2 = (
        edges.join(a1.withColumnRenamed("node", "b_node"), F.col("b") == F.col("b_node"))
        .groupBy(F.col("a").alias("node"))
        .agg(F.sum("s").alias("s"))
    )
    ma = a2.agg(F.max("s").alias("ma"))
    mh = h2.agg(F.max("s").alias("mh"))
    out = (
        nodes.join(a2.withColumnRenamed("s", "sa"), "node", "left")
        .join(h2.withColumnRenamed("s", "sh"), "node", "left")
        .join(F.broadcast(ma))
        .join(F.broadcast(mh))
        .select(
            "node",
            F.round(F.coalesce(F.col("sa"), F.lit(0.0)) / F.col("ma"), 6).alias(
                "authority"
            ),
            F.round(F.coalesce(F.col("sh"), F.lit(0.0)) / F.col("mh"), 6).alias(
                "hub"
            ),
        )
    )
    # NOTE: no edges.unpersist() here — `out` is lazy, so dropping the
    # cache before the caller materializes made the persist a no-op
    # (54 fact scans measured). release_caches() reclaims it.
    return out


@query(
    "graph-label-propagation",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        l1 AS (
            SELECT n.node,
                   least(n.node, min(e.b)) AS lab
            FROM nodes n JOIN edges e ON e.a = n.node
            GROUP BY n.node
        ),
        l2 AS (
            SELECT n.node,
                   least(own.lab, min(nb.lab)) AS lab
            FROM nodes n
            JOIN l1 own ON own.node = n.node
            JOIN edges e ON e.a = n.node
            JOIN l1 nb ON nb.node = e.b
            GROUP BY n.node, own.lab
        )
        SELECT CAST(lab AS BIGINT) AS label,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM l2 GROUP BY lab
    """,
    doc="Synchronous min-label propagation (two rounds) on the nation "
    "trade graph: every node adopts the minimum label in its closed "
    "neighborhood each round — after k rounds a node's label is the "
    "minimum node id within distance k, so rounds converge to "
    "connected components (graph-components-iterative runs the same "
    "update to fixpoint; two unrolled rounds keep this op loop-free "
    "and fully SQL-oracled, and show the per-round plan: one "
    "edge-join + one min-aggregate, shuffles keyed on the edge "
    "endpoint — the exact shape GraphX/Pregel supersteps lower to). "
    "At 100 TB: partition edges by src once; every round reuses that "
    "partitioning.",
    tags=("graph",),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    nodes = edges.select(F.col("a").alias("node")).distinct()
    l1 = (
        nodes.join(edges, nodes.node == edges.a)
        .groupBy("node")
        .agg(F.least(F.first("node"), F.min("b")).alias("lab"))
    )
    own = l1.select(F.col("node").alias("o_node"), F.col("lab").alias("own_lab"))
    nb = l1.select(F.col("node").alias("nb_node"), F.col("lab").alias("nb_lab"))
    l2 = (
        nodes.join(edges, nodes.node == edges.a)
        .join(own, F.col("node") == F.col("o_node"))
        .join(nb, F.col("b") == F.col("nb_node"))
        .groupBy("node", "own_lab")
        .agg(F.least(F.first("own_lab"), F.min("nb_lab")).alias("lab"))
    )
    return l2.groupBy(F.col("lab").cast("long").alias("label")).agg(
        F.count("*").cast("long").alias("n_nodes")
    )


@query(
    "graph-jaccard-link-prediction",
    oracle=f"""
        WITH edges AS ({_EDGES_SQL}),
        deg AS (SELECT a AS node, CAST(count(*) AS DOUBLE) AS deg
                FROM edges GROUP BY a),
        cn AS (
            SELECT e1.a AS u, e2.b AS v, CAST(count(*) AS DOUBLE) AS common
            FROM edges e1 JOIN edges e2 ON e1.b = e2.a
            WHERE e1.a < e2.b
              AND NOT EXISTS (SELECT 1 FROM edges x
                              WHERE x.a = e1.a AND x.b = e2.b)
            GROUP BY e1.a, e2.b
        )
        SELECT CAST(u AS BIGINT) AS node_a,
               CAST(v AS BIGINT) AS node_b,
               CAST(common AS BIGINT) AS common_neighbors,
               round(common / (da.deg + db.deg - common), 6) AS jaccard
        FROM cn JOIN deg da ON da.node = u JOIN deg db ON db.node = v
        ORDER BY jaccard DESC, node_a, node_b
        LIMIT 10
    """,
    doc="Jaccard link prediction on the nation trade graph: for every "
    "NON-adjacent pair, |common neighbors| / |neighbor union| (union "
    "by inclusion-exclusion from degrees — the neighbor sets are "
    "never materialized as sets), top-10 candidate links. The "
    "wedge-join (edges ⋈ edges on the shared endpoint) is the same "
    "bounded-fan-out shape as graph-triangle-count; the anti-join "
    "removes existing edges; degrees broadcast. The classic "
    "common-neighbors family baseline (Jaccard here, Adamic-Adar's "
    "log-degree weighting in graph-adamic-adar) that any learned "
    "link predictor must beat.",
    tags=("graph",),
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _nation_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("double").alias("deg")
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("x"))
    e2 = edges.select(F.col("a").alias("x2"), F.col("b").alias("v"))
    wedges = e1.join(e2, F.col("x") == F.col("x2")).filter(
        F.col("u") < F.col("v")
    )
    non_adj = wedges.join(
        edges.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    cn = non_adj.groupBy("u", "v").agg(
        F.count("*").cast("double").alias("common")
    )
    da = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_b"))
    return (
        cn.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .select(
            F.col("u").cast("long").alias("node_a"),
            F.col("v").cast("long").alias("node_b"),
            F.col("common").cast("long").alias("common_neighbors"),
            F.round(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "node_a", "node_b")
        .limit(10)
    )
