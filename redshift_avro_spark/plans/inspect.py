"""Extract scale-relevant facts from a DataFrame's physical plan.

Built on ``queryExecution().explainString(...)`` — the same text
``df.explain("formatted")`` prints, but returned instead of printed so
tests can assert on it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (modes: simple, extended,
    codegen, cost, formatted)."""
    jdf = df._jdf  # py4j handle; stable across PySpark 3.x/4.x
    qe = jdf.queryExecution()
    try:
        return qe.explainString(
            getattr(
                df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode,
                "fromString",
            )(mode)
        )
    except Exception:
        return qe.toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reached a scan (empty lists
    dropped). Non-empty result proves predicate pushdown happened."""
    text = explain_str(df)
    found = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    return [f.strip() for f in found if f.strip()]


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names in each scan's ReadSchema — the column-pruning
    witness (a 2-column projection must not read 16 columns)."""
    text = explain_str(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan. Every one is a
    full network rewrite of the data at scale — count them."""
    text = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", text))


def broadcast_join_count(df: DataFrame) -> int:
    text = explain_str(df, "simple")
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", text))


def has_broadcast_join(df: DataFrame) -> bool:
    return broadcast_join_count(df) > 0


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen subtrees the plan compiled — wider
    spans mean more of the query runs as generated JVM bytecode.
    (Codegen explain mode, because AQE's pre-execution formatted plan
    hides the codegen markers.)"""
    text = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    if m and int(m.group(1)) > 0:
        return int(m.group(1))
    # under AQE the pre-execution plan reports 0; after the DataFrame
    # has been executed the final simple plan marks codegen'd nodes
    # with `*(id)` — count distinct ids there
    simple = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", simple)))


def uses_top_k(df: DataFrame) -> bool:
    """True when an ORDER BY + LIMIT compiled to TakeOrderedAndProject
    (per-partition heaps + driver merge) instead of a global sort."""
    return "TakeOrderedAndProject" in explain_str(df, "simple")
