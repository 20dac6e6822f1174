"""Hierarchy flattening (recursive-CTE parity) by pointer doubling.

SQL engines answer ancestor-chain questions with ``WITH RECURSIVE``,
which walks ONE level per iteration — depth-D hierarchies cost D
sequential joins. The distributed-systems form is POINTER JUMPING
(Wyllie 1979; the standard PRAM list-ranking technique): every node
keeps its current known ancestor plus the compressed path to it, and
each round jumps ``anc -> anc(anc)``, doubling the solved distance.
ceil(log2(D)) rounds of equi-joins flatten any depth-D forest — at
100 TB that is ~5 joins for a depth-32 hierarchy instead of 32.

State per node: (node, anc, depth, path) where ``path`` covers
node..anc exclusive of anc; a NULL anc marks a finished chain (the
node's path reaches its root). Each round is one hash equi-join of the
state with itself on ``anc = node`` — shuffle O(n) rows of compact
state, ``localCheckpoint`` per round to keep lineage O(1) (the d06/g01
iterative-operator pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(
    edges: DataFrame,
    *,
    node_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Resolve every node's root, depth, and full root-path.

    ``edges``: one row per node with its parent (NULL parent = root).
    Returns (node, root, depth, path) where ``path`` lists node ids
    root-first separated by '/', and depth is 0 for roots.

    Cycles are not chased past ``max_depth`` doublings: 2^rounds >=
    max_depth guards termination; nodes still unresolved then (i.e. on
    a cycle or deeper than max_depth) are dropped with the contract
    documented here — a forest input resolves completely.
    """
    state = edges.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("depth"),
        F.col(node_col).cast("string").alias("path"),
    ).localCheckpoint(eager=True)

    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        # a node is done when anc is NULL; all done -> stop early
        if state.filter(F.col("anc").isNotNull()).isEmpty():
            break
        a = state.select(
            F.col("node").alias("a_node"),
            F.col("anc").alias("a_anc"),
            F.col("depth").alias("a_depth"),
            F.col("path").alias("a_path"),
        )
        state = (
            state.join(a, state["anc"] == a["a_node"], "left")
            .select(
                "node",
                # anc had no state row (dangling parent) -> treat as root
                F.col("a_anc").alias("new_anc"),
                F.when(F.col("a_node").isNull(), F.col("depth"))
                .otherwise(F.col("depth") + F.col("a_depth"))
                .alias("depth"),
                F.when(F.col("a_node").isNull(), F.col("path"))
                .otherwise(F.concat_ws("/", "a_path", "path"))
                .alias("path"),
            )
            .withColumnRenamed("new_anc", "anc")
            .localCheckpoint(eager=True)
        )

    return state.filter(F.col("anc").isNull()).select(
        "node",
        F.split("path", "/").getItem(0).cast("long").alias("root"),
        F.col("depth").cast("int").alias("depth"),
        "path",
    )
