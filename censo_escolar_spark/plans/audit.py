"""Plan introspection — the scale audit as a library.

``plan_summary`` distills a DataFrame's physical plan into the counts a
scale review actually reads: shuffles, broadcasts, sort-merge joins,
Python boundaries, scans with pushed filters. The plan-quality pytest
gates assert specific invariants; this utility makes the same signals
available programmatically (CI dashboards, pre-submit checks, notebook
`explain` replacements).
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    exchanges: int            # shuffle boundaries (Exchange hashpartitioning/range)
    broadcast_exchanges: int  # broadcast distributions (small-side ships)
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    arrow_python_nodes: int   # ArrowEvalPython / MapInPandas / grouped-map
    rowwise_python_nodes: int  # BatchEvalPython — always a defect here
    unpartitioned_windows: int  # single-task global windows — always a defect
    scans: int
    scans_with_pushed_filters: int

    def dict(self) -> dict:
        return asdict(self)


def _formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_summary(df: DataFrame) -> PlanSummary:
    plan = _formatted(df)
    jplan = df._jdf.queryExecution().sparkPlan()

    def count(pattern: str) -> int:
        return len(re.findall(pattern, plan))

    unpartitioned = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.nodeName() in ("Window", "WindowGroupLimit"):
            if node.partitionSpec().isEmpty():
                unpartitioned += 1
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))

    # Formatted mode prints each node in the tree AND as a numbered
    # details header — count only the "(n) <Node>" headers. Shuffle
    # exchanges carry "Arguments: hashpartitioning/rangepartitioning";
    # broadcast exchanges are their own node name.
    pushed = count(r"PushedFilters: \[(?!\])")  # "[]" = nothing reached the scan
    return PlanSummary(
        exchanges=count(r"Arguments: (?:hash|range)partitioning"),
        broadcast_exchanges=count(r"\(\d+\) BroadcastExchange\b"),
        broadcast_joins=count(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join\b"),
        sort_merge_joins=count(r"\(\d+\) SortMergeJoin\b"),
        nested_loop_joins=count(r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)\b"),
        arrow_python_nodes=count(
            r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b"
        ),
        rowwise_python_nodes=count(r"\(\d+\) BatchEvalPython\b"),
        unpartitioned_windows=unpartitioned,
        scans=count(r"\(\d+\) Scan parquet\b"),
        scans_with_pushed_filters=pushed,
    )
