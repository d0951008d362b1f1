"""Physical-plan introspection helpers.

``.explain("formatted")`` is the feedback loop for 100 TB plans: these
helpers turn the properties we design for — broadcast joins on small dims,
filter/column pushdown into the parquet scan, absence of Exchange in
map-only stages — into assertable strings, so the plan shape is pinned by
tests instead of hoped for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["formatted_plan", "has_broadcast_join", "n_exchanges",
           "n_column_carrying_exchanges", "pushed_filters",
           "read_schema_columns", "has_whole_stage_codegen"]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as .explain
        df._jdf.queryExecution(), "formatted")


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (AQE reuse not double-counted)."""
    plan = formatted_plan(df)
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "Reused" not in line
               and line.lstrip().startswith(("+-", ":-", "*(", "Exchange"))
               and "BroadcastExchange" not in line)


def n_column_carrying_exchanges(df: DataFrame, col: str = "text") -> int:
    """How many shuffle Exchanges move rows that still CONTAIN ``col``.

    The 100 TB cost of a plan is dominated by which Exchanges carry the
    wide payload column (page bytes, document text), not by how many
    Exchanges exist: shuffling keys is cheap, shuffling text is not.
    Parses the formatted-explain detail blocks and counts non-broadcast,
    non-reused Exchange nodes whose Input includes ``col#<id>``.
    """
    import re
    plan = formatted_plan(df)
    n = 0
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        m = re.match(r"\(\d+\) (\S+)", block)
        if not m:
            continue
        name = m.group(1)
        if "Exchange" not in name or "Reused" in name or "Broadcast" in name:
            continue
        if re.search(rf"\b{re.escape(col)}#\d+", block):
            n += 1
    return n


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.split("PushedFilters:", 1)[1].strip()
    return ""


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            cols = []
            for part in schema.strip("struct<>").split(","):
                name = part.split(":", 1)[0].strip()
                if name:
                    cols.append(name)
            return cols
    return []


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # AQE prints isFinalPlan=false without codegen spans in "formatted";
    # the "codegen" explain mode lists generated stages regardless.
    text = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen")
    return "WholeStageCodegen" in text
