"""Graph algorithms over edge DataFrames (beyond the transitive-closure
connected components in operators/dedup.py).

``pagerank`` is the distributed power iteration: each round joins the
rank vector to the edge list (shuffle on node id), sums incoming
contributions (partial-aggregated), and rebuilds the vector with the
damping term. Rounds are a fixed, caller-chosen count — at corpus scale
you run O(10) rounds, each one bounded shuffle, with the vector
localCheckpoint'ed per round so lineage stays O(1) (the connected-
components lesson).

Determinism contract: ranks are SCALED INTEGERS (``SCALE = 10^12``) and
every step is integer arithmetic — floor division for the out-degree
split and the damping ratio, exact integer sums for the gather. Floating
addition is order-dependent and engines fold in different orders; the
integer formulation makes the result bit-identical on any engine and
any partitioning, so PageRank queries are value-hash oracle-checkable.
The quantization error vs real-valued PageRank is < iters·deg_max/SCALE
— irrelevant at 10^12.

Dangling nodes (no out-edges) simply leak their damped mass — the
standard simplification when ranks are used for *ordering* (canonical-
document selection in a dedup cluster), not as probabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def triangle_counts(
    edges: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list.

    The quadratic trap in triangle counting is wedge generation: joining
    the raw edge list to itself on a shared endpoint fans out as
    deg(v)² around hubs. The standard fix (degree-ordered orientation)
    is used here: orient every undirected edge from the (degree, id)-
    smaller endpoint to the larger, so every node's OUT-degree is at
    most O(√m) regardless of its raw degree, wedges are generated only
    at a triangle's smallest corner, and each triangle is found exactly
    once. All steps are equi-joins / partial-aggregated groupBys:
    degree attach (2 joins on an endpoint), wedge self-join on the
    pivot node, existence join on the closing (v, w) pair, and a final
    groupBy over the 3 exploded corners.

    Input rows are treated as undirected edges (duplicates and
    self-loops dropped). Returns (node, n_triangles) for nodes in at
    least one triangle.
    """
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        # e feeds the degree count twice (both endpoints) plus the
        # degree-attach join — without a checkpoint the caller's edge
        # pipeline (often an LSH/banded pair generator) re-runs 3×;
        # the materialized rows are just 2 longs each
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    # orient toward the (degree, id)-larger endpoint; the self-join
    # below must see a list it can reuse, and the wedge+closure joins
    # must not recompute the degree joins twice -> checkpoint the small
    # oriented list (2 longs/row)
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=True)

    w1 = oriented.select(F.col("src").alias("p"), F.col("dst").alias("x"))
    w2 = oriented.select(F.col("src").alias("p"), F.col("dst").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    )
    # the corner union references tris THREE times and Spark does not
    # share work across union branches — without this cut the wedge
    # self-join + closure join (the heaviest stages) would execute 3×;
    # tris is O(#triangles) rows of 3 longs (bounded: callers contract
    # identical fingerprints before graph analytics)
    tris = (
        wedges.join(closing, ["x", "y"])
        .select("p", "x", "y")
        .localCheckpoint(eager=True)
    )
    corners = (
        tris.select(F.col("p").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) with rank a scaled integer (``SCALE`` = 1.0
    of initial mass per node). ``damping_pct`` is the damping factor in
    percent (85 = the classic 0.85) — kept integral so the damping step
    is exact integer arithmetic.

    Update rule per node v:
        contrib(u) = rank(u) // out_deg(u)
        rank'(v)   = ((100 - d) * SCALE) // 100
                     + (d * Σ_{u→v} contrib(u)) // 100
    """
    # materialize the deduped edge list once: it feeds the node union
    # (two branches), the degree aggregation, and the e_deg join — four
    # references to one lazy subtree would re-run the caller's edge
    # pipeline 4× (union branches and separate consumers share no work)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree rides the edge list once; re-used every round
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)

    base = (100 - damping_pct) * SCALE // 100
    ranks = nodes.withColumn("rank", F.lit(SCALE).cast("long"))
    for i in range(iters):
        gathered = (
            e_deg.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                # BIGINT floor division — never a double in the loop
                # (a double mantissa silently rounds past 2^53 when the
                # gather sum grows with in-degree)
                F.expr("rank div deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("s"))
        )
        # floor(d*s/100) = d*(s div 100) + (d*(s % 100)) div 100 —
        # overflow-safe split: s can approach in_deg·SCALE, so d*s
        # would overflow BIGINT on high-degree graphs
        damp = (
            F.lit(damping_pct) * F.expr("s div 100")
            + F.expr(f"({damping_pct} * (s % 100)) div 100")
        )
        ranks = nodes.join(gathered, "node", "left").select(
            "node",
            F.when(F.col("s").isNull(), F.lit(base))
            .otherwise(F.lit(base) + damp)
            .cast("long")
            .alias("rank"),
        )
        # periodic, not per-round: a blocking materialization every
        # round costs a job each; lineage only needs trimming every few
        # rounds (3-round plans run as ONE job without any checkpoint)
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
