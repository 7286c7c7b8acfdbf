"""Physical-plan inspection — the engine's "did Catalyst do what I meant"
toolkit.

The reference delegates all optimization to DuckDB and never looks back
(SURVEY §4); on Spark the plan IS the performance contract at 100 TB, so
these helpers make plan properties *testable*: scans must show pushed
filters and pruned schemas, dimension joins must broadcast, codegen must
cover the hot expressions. tests/test_plans.py pins those properties for
the flagship queries so a regression (a lost pushdown, a join that silently
degrades to sort-merge-with-shuffle) fails CI instead of shipping a 10×
slower plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The EXPLAIN text of a DataFrame's physical plan (any explain mode:
    simple / extended / formatted / codegen / cost)."""
    jdf = df._jdf
    sess = df.sparkSession
    jmode = sess._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode)
    return jdf.queryExecution().explainString(jmode)


def plan_facts(df: DataFrame, execute: bool = False) -> dict:
    """Structural facts about the physical plan:

    - ``pushed_filters``: list of PushedFilters strings (one per scan)
    - ``read_schemas``: list of ReadSchema strings (column pruning evidence)
    - ``joins``: physical join node names in plan order
    - ``exchanges``: number of shuffle Exchange nodes
    - ``codegen_spans``: number of WholeStageCodegen spans (requires
      ``execute=True`` — AQE only finalizes codegen at execution; joins are
      also most reliable post-execution, when AQE may have upgraded a
      sort-merge join to broadcast from runtime statistics)
    """
    text = formatted_plan(df)
    # Node counting uses the SIMPLE tree — the formatted output repeats
    # every operator in its details section, which would double-count
    # joins/exchanges (and half-disarm count-based plan assertions).
    tree = formatted_plan(df, "simple")
    if execute:
        # AQE finalizes the physical plan (and its WholeStageCodegen spans)
        # only at execution; run the query, then read the executed plan.
        df.collect()
        tree = df._jdf.queryExecution().executedPlan().toString()
        # post-AQE toString shows the final plan; initial-plan section (if
        # present) would double-count — keep only the final plan part
        tree = tree.split("+- == Initial Plan ==")[0]
        text = tree
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", text),
        "joins": re.findall(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", tree),
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", tree))),
    }


def assert_broadcast_join(df: DataFrame) -> None:
    """Fail unless every join in the plan is broadcast-side (the right shape
    for fact × dimension joins — no shuffle of the fact table)."""
    facts = plan_facts(df)
    bad = [j for j in facts["joins"]
           if j not in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")]
    if bad:
        raise AssertionError(
            f"non-broadcast joins in plan: {bad}\n{formatted_plan(df)}")
