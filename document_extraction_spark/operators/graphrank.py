"""Host-authority ranking: PageRank power iteration over a host link graph,
in EXACT integer arithmetic.

Why integers: a float PageRank sums double contributions whose addition order
differs across engines (and across runs of the same engine), so no two
executions hash-identically. Scaling ranks to integers (S = 10^12) and
flooring every division makes each iteration a sum of exact BIGINTs —
associative, engine-independent, and therefore verifiable row-for-row against
a DuckDB recursive twin. The damping multiply 0.85*r is the exact rational
(17*r) // 20; the per-edge share is one fused floor division
(17*r*w) // (20*d) so no intermediate rounding leaks.

Distributed shape (the standard Pregel-style formulation, expressed purely in
DataFrame ops):

- edges(src, dst, w) is the big table; it shuffles ONCE per iteration on
  ``src`` (join with ranks) then on ``dst`` (sum of contributions) — both
  are map-side-combinable aggregations.
- ranks is one row per node; per-iteration ``localCheckpoint`` truncates the
  lineage so iteration k does not replay k-1 join plans (same discipline as
  dedup.dedup_clusters).
- Dangling mass (nodes with no out-edges) is dropped, not redistributed —
  documented simplification that keeps every operation a local integer floor;
  ranks remain a well-defined authority ordering.

Reference provenance: the reference's single-document pipeline has no graph
op; this is part of the engine's web-scale curation surface (domain-authority
signal for source weighting, PageRank; Page et al. 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 10**12  # integer rank scale S


def host_link_edges(docs: DataFrame) -> DataFrame:
    """Deterministic host->host citation graph from the documents table:
    each doc 'cites' the doc whose id is hexint(md5('pr'||doc_id)) mod
    n_docs; an edge links the two docs' source hosts (self-loops dropped,
    multi-edges collapsed into an integer weight).

    Both sides of the derivation are closed-form over (doc_id, source), so a
    SQL twin reproduces the graph byte-exactly.
    """
    n = docs.select(F.count("*").alias("n_docs"))
    cite = (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id"),
            F.col("source").alias("src"),
            (F.conv(F.substring(F.md5(F.concat(F.lit("pr"), F.col("doc_id").cast("string"))), 1, 13), 16, 10)
             .cast("long") % F.col("n_docs")).alias("cited_id"),
        )
    )
    dst = docs.select(F.col("doc_id").alias("cited_id"), F.col("source").alias("dst"))
    return (
        cite.join(dst, "cited_id")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def pagerank_int(edges: DataFrame, iterations: int = 4,
                 scale: int = SCALE) -> DataFrame:
    """Integer-exact damped PageRank over edges(src, dst, w).

    Returns (host, rank) for every node appearing as src or dst; ranks are
    BIGINTs on the ``scale`` grid, identical on any engine that implements
    64-bit floor division.
    """
    spark = edges.sparkSession
    edges = edges.localCheckpoint(eager=True)

    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar; drives two literal constants below
    base = (3 * scale) // (20 * n_nodes)        # 0.15 * S / N, floored
    init = scale // n_nodes

    deg = edges.groupBy("src").agg(F.sum("w").alias("d"))
    ed = edges.join(deg, "src")  # (src, dst, w, d) — static across iterations

    ranks = nodes.select("host", F.lit(init).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(
                F.col("dst").alias("host"),
                # fused floor: (17*r*w) // (20*d). DIV is 64-bit INTEGRAL
                # division — `/` would promote to double and lose exactness
                # past 2^53 (17*S*w is ~1e15). Operands stay well under
                # 2^63: r <= S + slack, w bounded by in-degree counts.
                F.expr("(17L * rank * w) DIV (20L * d)").cast("long").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "host", "left")
            .select(
                "host",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def doc_graph(docs: DataFrame, k: int = 3) -> DataFrame:
    """Synthetic doc-level undirected graph, closed-form from doc_id alone
    (the host_edges trick at node granularity): k hash edges per document,
    self-loops dropped, symmetrized to distinct (lo, hi) pairs — byte-exact
    reproducible by a SQL twin."""
    n = docs.select(F.count("*").alias("n_docs"))
    legs = None
    for s in range(k):
        e = docs.crossJoin(F.broadcast(n)).select(
            F.col("doc_id").alias("a"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"tg{s}:"), F.col("doc_id").cast("string"))),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_docs")
            ).alias("b"),
        )
        legs = e if legs is None else legs.unionByName(e)
    return (
        legs.where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over undirected distinct (lo, hi) edges —
    INTEGER-exact (a counting problem has no float anywhere), so the full
    result hash-verifies.

    Plan shape: the enumeration join chains (a,b)x(b,c) then closes with
    (a,c) — each triangle with a<b<c found exactly once. At 100 TB the
    standard hardening is degree-ordered orientation (forward adjacency
    bounded by O(sqrt(m)) per node) + a broadcast of the high-degree
    boundary; the id-ordered join keeps the same output and is the right
    shape while wedge skew is modest (hash-derived graphs here are
    near-regular). Each triangle credits its three corners; one final
    groupBy(node)."""
    e = edges.select("lo", "hi")
    e1 = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return corners


def kcore(edges: DataFrame, k: int = 3, rounds: int = 4) -> DataFrame:
    """k-core peeling: ``rounds`` iterations of "drop nodes with degree
    < k, keep only edges between survivors" — the web-graph quality signal
    (dense cores = link farms / tight communities; shallow nodes peel
    away). Returns (node, deg) over the surviving subgraph.

    Fixed-round formulation so the whole computation is oracle-expressible
    as unrolled CTEs (the PageRank/BPE pattern); the true k-core is the
    peeling FIXPOINT — tests/test_triangles.py asserts one extra round
    changes nothing on the bench graph, making the fixed-round output the
    exact k-core there. Integer degrees only — hash-exact.

    Per round: one degree aggregation (map-side combinable) + two
    broadcast-able semi-joins to filter edges. At 100 TB the degree table
    is |nodes| rows; iterate until a convergence count (one scalar job)
    goes to zero instead of a fixed R."""
    e = edges.select("lo", "hi")
    for _ in range(rounds):
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
            .select("lo", "hi")
            .localCheckpoint(eager=False)
        )
    return (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
