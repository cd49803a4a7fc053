"""Graph analytics over edge tables (PageRank, triangle counting).

Cell adjacency, document near-dup pairs, LSH buckets and OD matrices
all produce edge lists; these operators close the loop with the two
canonical graph workloads:

- :func:`pagerank` — the standard damped power iteration with
  dangling-mass redistribution, as ``iters`` rounds of (join ranks to
  edges -> groupBy dst -> map).  Each round is one shuffle over the
  edge list; plans are truncated with eager ``localCheckpoint`` every
  few rounds (the connected-components loop hygiene) so the lineage
  never deepens.  Deterministic given the graph: per-round float sums
  are order-dependent only in the last ulps, which the 4dp gate
  rounding absorbs (the oracle unrolls the SAME iterations as chained
  CTEs).
- :func:`triangle_count` — triangles via the canonical a<b<c
  three-way self-join on deduplicated undirected edges (the classic
  two-shuffle formulation; skew = a hot vertex's degree^2, the
  caller's graph property).

No GraphX / graphframes dependency — plain DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 8, damping: float = 0.85) -> DataFrame:
    """Damped PageRank over a directed edge list; vertices are the
    union of endpoints, ranks start uniform at 1/N and renormalize
    through the dangling term each round.  Output: (vertex, rank)."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    verts = (e.select(F.col("src").alias("vertex"))
             .unionByName(e.select(F.col("dst").alias("vertex")))
             .distinct().localCheckpoint(eager=True))
    n = verts.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        # one materialization per round: the dangling aggregate and the
        # contribution join both read the checkpointed frame (no driver
        # scalar sync, no recomputation of the round's lineage)
        ranks = ranks.localCheckpoint(eager=True)
        contrib = (ranks.join(outdeg,
                              ranks.vertex == outdeg.src, "left")
                   .select("vertex", "rank", "odeg"))
        # dangling vertices spread their rank uniformly (1-row frame,
        # broadcast into the update expression — stays lazy)
        dang_df = (contrib.where(F.col("odeg").isNull())
                   .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                        .alias("dang")))
        inc = (contrib.where(F.col("odeg").isNotNull())
               .join(e, F.col("vertex") == F.col("src"))
               .groupBy("dst")
               .agg(F.sum(F.col("rank") / F.col("odeg")).alias("msum")))
        ranks = (verts.crossJoin(F.broadcast(dang_df))
                 .join(inc, verts.vertex == inc.dst, "left")
                 .select("vertex",
                         ((F.lit(base)
                           + F.lit(damping) * F.col("dang")
                           / F.lit(float(n)))
                          + F.lit(damping)
                          * F.coalesce(F.col("msum"), F.lit(0.0)))
                         .alias("rank")))
    return ranks


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Total triangle count of the UNDIRECTED simple graph induced by
    the edge list (self-loops dropped, directions folded): the
    canonical a<b<c wedge-close join.  Output: one row (n_triangles)."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    e = (edges.select(a, b).where(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(e3, ["x", "z"])
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
