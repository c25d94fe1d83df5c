"""Physical-plan inspection helpers.

The 100 TB contract of every operator in this engine is a plan shape, not
just a result: filters REACH the Parquet scan (PushedFilters), projections
prune the read schema (ReadSchema), dimension joins broadcast, top-k compiles
to TakeOrderedAndProject, and hot expressions stay inside WholeStageCodegen.
These helpers make those properties assertable in tests so a regression in
plan quality fails CI the same way a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() output as a string (modes: simple|extended|formatted|
    codegen|cost)."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public accessor in PySpark
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(jmode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = plan_string(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the (first) scan's ReadSchema — the pruning check."""
    plan = plan_string(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def node_count(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node, counted once per node id (the
    formatted explain prints every node twice: tree + details)."""
    return len(re.findall(rf"^\(\d+\) {node}\b", plan_string(df, "formatted"), re.M))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer = better fusion).
    Formatted mode annotates fused nodes with ``[codegen id : N]``."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", plan_string(df, "formatted"))))
