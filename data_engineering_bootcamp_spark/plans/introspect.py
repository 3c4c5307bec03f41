"""Physical-plan introspection shared by tests and tools.

One definition of "how many Exchanges does this plan have" so the
bucket-join assertions (tests/test_writers.py) and the scale bench
(tools/scale_bench.py) can't drift apart.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# An Exchange NODE line in the plan tree: tree-prefix glyphs, then the
# operator name at the start of the node label. Matches
# "Exchange hashpartitioning(...)", "Exchange rangepartitioning(...)",
# "Exchange SinglePartition", "BroadcastExchange HashedRelation..." —
# and deliberately NOT "ReusedExchange [...]" (a pointer to an already
# counted node, not a new shuffle) nor incidental occurrences of the
# word inside argument lists or comments (ADVICE r10: the raw
# substring count broke exact-count assertions on any Spark/conf
# change that introduced such a line). The prefix class must not
# include newlines (ADVICE r11): \s would let a MULTILINE-anchored
# match bleed across line boundaries, so the anchor would no longer
# mean "node line" — [^\S\r\n] is whitespace-minus-newlines.
_EXCHANGE_NODE = re.compile(
    r"^(?:[^\S\r\n]|[+\-*:()\d])*(?:Exchange|BroadcastExchange)\b",
    re.MULTILINE,
)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange nodes in the executed plan.

    Counted on the string form of the executedPlan (pre-AQE-execution,
    so counts are stable and don't depend on runtime re-planning);
    includes both shuffle and broadcast exchanges — callers asserting
    "shuffle elided" should hold broadcast structure constant between
    the plans they compare. ReusedExchange nodes are excluded: they
    reference an Exchange counted elsewhere in the same tree.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(_EXCHANGE_NODE.findall(plan))


def count_top_level_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes OUTSIDE InMemoryRelation
    subtrees.

    The executedPlan string prints a cached relation's internal build
    plan under every InMemoryRelation reference, so a naive count
    charges the (already materialized, runtime-free) cache-build
    exchanges to every consumer. Iteration-slope assertions over a
    persisted loop-invariant relation (pagerank adjacency, CC edge
    list) need the per-iteration cost only — this skips everything
    indented under an InMemoryRelation line and ignores
    ReusedExchange pointers and BroadcastExchange builds (hold
    broadcast structure constant between compared plans).
    """
    s = df._jdf.queryExecution().executedPlan().toString()
    n, skip_indent = 0, None
    for line in s.splitlines():
        indent = len(re.match(r"^[\s:+\-]*", line).group(0))
        if skip_indent is not None and indent > skip_indent:
            continue
        skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        if re.search(r"\bExchange ", line) and "ReusedExchange" not in line:
            n += 1
    return n


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string, for regex-level assertions."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
