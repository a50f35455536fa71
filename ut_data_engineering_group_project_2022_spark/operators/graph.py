"""Graph analytics as iterative DataFrame programs (SURVEY G1-G9).

The reference delegates these to Neo4j GDS (ref dags/graph_queries.cyp);
here the property graph is plain vertex/edge DataFrames and the
algorithms are join/agg loops above Catalyst:

  * pagerank        — G2/G3/G5 (GDS default damping 0.85);
  * label_propagation — community detection stand-in for Louvain (G6),
                        synchronous updates with min-label tiebreak so the
                        result is deterministic;
  * betweenness     — G7, exact Brandes. Driver-side on the collected
                      graph: intended for dim-scale graphs (the
                      reference's DWH graphs); the 100 TB path is
                      landmark-sampled BFS via `bounded_reachability`;
  * bounded_reachability — J11 variable-length path expansion (`*1..k`)
                      as a bounded iterative frontier join.

The test graph derives from the star schema: an undirected bipartite
customer–supplier graph (edge iff a lineitem links them), node ids
prefixed 'c'/'s'.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import table


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed c->s edges with lineitem-count weight (SURVEY G1 projection).

    The groupBy on (src, dst) IS the graph-node/edge dedup: Cypher MERGE's
    create-only-if-absent collapses to build-time aggregation on the
    natural key (SURVEY D5/S8; ref api_to_neo4j.py:23-83); incremental
    append would anti-join on the same key."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def undirect(edges: DataFrame) -> DataFrame:
    """Union each edge with its reverse (GDS UNDIRECTED orientation)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionAll(rev)


def pagerank(
    edges: DataFrame, iterations: int = 3, damping: float = 0.85
) -> DataFrame:
    """PageRank over a directed edge list; returns (node_id, pagerank).

    Iterative join-aggregate loop: contrib_i+1(v) = sum over in-edges of
    pr_i(u)/outdeg(u); pr_i+1 = (1-d)/N + d*contrib. Scores rounded to 6
    decimals at the end. Each iteration is one shuffle on dst; the rank
    vector is cached between iterations (lineage otherwise grows
    exponentially at cluster scale).
    """
    nodes = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    ).distinct().cache()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e = edges.join(deg, "src").select("src", "dst", "d").cache()
    e.count()  # force: a lazy cache is raced/recomputed by the per-iteration joins

    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    prev = None
    for _ in range(iterations):
        contrib = (
            e.join(pr, e.src == pr.id)
            .select(F.col("dst").alias("id"), (F.col("pr") / F.col("d")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("pr"),
            )
            .cache()
        )
        pr.count()  # materialize this iteration once; bounds the plan depth
        if prev is not None:
            prev.unpersist()
        prev = pr
    # Detach the (node-sized) result from the working caches, then release
    # them — sequential many-query sessions must not accumulate heap.
    out = pr.select(
        F.col("id").alias("node_id"), F.round("pr", 6).alias("pagerank")
    ).localCheckpoint(eager=True)
    pr.unpersist()
    e.unpersist()
    nodes.unpersist()
    return out


def label_propagation(edges: DataFrame, max_iter: int = 5) -> DataFrame:
    """Synchronous label propagation, min-label tiebreak (deterministic).

    Each node adopts the minimum of (its label, the minimum label among
    neighbors) per round — converges to connected-component-ish communities
    on this graph family; stand-in for Louvain (SURVEY G6 delta documented).
    """
    und = undirect(edges).cache()
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    prev = None
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy(F.col("src").alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, labels.id == F.col("nid"), "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .cache()
        )
        labels.count()  # materialize each round; truncates effective lineage
        if prev is not None:
            prev.unpersist()
        prev = labels
    out = labels.select(
        F.col("id").alias("node_id"), F.col("label").alias("community")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    und.unpersist()
    return out


def bounded_reachability(edges: DataFrame, max_hops: int) -> DataFrame:
    """Variable-length path expansion (SURVEY J11, `REFERENCES*1..k`):
    (node, reachable-node) pairs within <= max_hops, via iterative
    frontier self-joins with per-round dedup (BFS-style)."""
    und = undirect(edges).distinct()
    reach = und.select("src", "dst").withColumn("hops", F.lit(1))
    frontier = reach
    for hop in range(2, max_hops + 1):
        nxt = (
            frontier.alias("f")
            .join(und.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("hops", F.lit(hop))
        )
        new = nxt.join(
            reach.select("src", "dst"), ["src", "dst"], "left_anti"
        ).cache()
        new.count()  # force: referenced by both the union and the next frontier
        reach = reach.unionAll(new).cache()
        frontier = new
    out = reach.localCheckpoint(eager=True)
    for df in (reach, frontier):
        df.unpersist()
    return out


def betweenness_exact(edges: DataFrame) -> DataFrame:
    """Exact Brandes betweenness (unweighted, undirected).

    Driver-side over the collected edge list — appropriate for dim-scale
    graphs like the reference's (SURVEY G7 notes sample-based approximation
    as the 100 TB path). Returns (node_id, betweenness) rounded to 6.
    """
    adj: dict[str, list[str]] = {}
    for row in undirect(edges).distinct().collect():
        adj.setdefault(row["src"], []).append(row["dst"])
    for v in adj:
        adj[v].sort()  # deterministic traversal order

    bc = {v: 0.0 for v in adj}
    for s in sorted(adj):
        stack: list[str] = []
        preds: dict[str, list[str]] = {v: [] for v in adj}
        sigma = {v: 0 for v in adj}
        dist = {v: -1 for v in adj}
        sigma[s], dist[s] = 1, 0
        queue = deque([s])
        while queue:
            v = queue.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in adj}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]

    spark = edges.sparkSession
    rows = [(v, round(b / 2.0, 6)) for v, b in sorted(bc.items())]
    return spark.createDataFrame(rows, "node_id string, betweenness double")
