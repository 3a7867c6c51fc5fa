"""Global-window boundedness audit (VERDICT r9 item 3).

A ``Window`` with an EMPTY partition spec executes in ONE partition — the
whole input sorts on a single task. That is fine over a frame already
reduced to bounded size (an aggregate's output, a limit, a literal
spine) and a silent scale-killer over anything fact-sized. Unlike
BroadcastNestedLoopJoin (guarded registry-wide since round 3) there was
no mechanical check: round 9's audit found 86 unpartitioned-window
sites, all bounded on code-read, but a new one over a fact table would
have shipped silently.

:func:`unbounded_global_windows` walks the OPTIMIZED logical plan and
returns a description of every global Window whose subtree is not
provably bounded — where "provably bounded" means every leaf-ward path
from the window hits one of the bounding node classes below before
reaching a leaf:

- ``Aggregate`` — output is one row per group key; every audited global
  window in the registry sits on a grouped/rolled-up frame;
- ``GlobalLimit`` / ``LocalLimit`` — explicitly bounded;
- ``LocalRelation`` / ``OneRowRelation`` — literal in-plan data;
- ``Range`` — a generated constant spine (spark.range literals);
- ``Window`` nodes and joins/unions recurse: a join is bounded only if
  ALL inputs are (a global window over join(agg, fact) still sorts
  fact-many rows).

``LogicalRDD`` (checkpointed lineage) and file relations are UNBOUNDED:
a checkpoint hides whatever produced it, so a global window directly
over one must be audited by hand and allowlisted with a justification.

Known gaps (ADVICE r10):

- ``Range`` is bounded only when its ``numElements`` is below
  :data:`_RANGE_BOUNDED_MAX` — ``spark.range(N)`` can be fact-sized
  (a 1e9-row generated spine would otherwise pass silently); a Range
  whose size cannot be read is treated as unbounded.
- The walk does NOT descend into subquery plan expressions (scalar
  subqueries / IN-subqueries carry their own plans inside expression
  trees); a global window hidden inside one escapes this audit. No
  registry query builds windows inside subquery expressions — revisit
  if one ever does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_BOUNDING = {
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "LocalRelation",
    "OneRowRelation",
}

# A generated Range spine counts as bounded only below this many rows —
# a single-partition sort of a larger spine is exactly the scale-killer
# this audit exists to catch (ADVICE r10: spark.range(1e9) is a fact).
_RANGE_BOUNDED_MAX = 1_000_000

# Leaves (and leaf-like nodes) that carry unbounded, data-sized rows.
_UNBOUNDED_LEAVES = {
    "LogicalRelation",
    "LogicalRDD",
    "ExternalRDD",
    "HiveTableRelation",
    "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
    "StreamingRelation",
    "UnresolvedRelation",
}


def _children(node) -> list:
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def _is_bounded(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in _BOUNDING:
        return True
    if name == "Range":
        try:
            # py4j converts scala.math.BigInt to a Python int; str() also
            # covers builds where it surfaces as a JavaObject
            return int(str(node.numElements())) <= _RANGE_BOUNDED_MAX
        except Exception:
            return False  # unreadable size: conservative
    if name in _UNBOUNDED_LEAVES:
        return False
    kids = _children(node)
    if not kids:
        # unknown leaf: conservative — treat as unbounded so new source
        # node types surface here instead of passing silently
        return False
    return all(_is_bounded(k) for k in kids)


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Return one description per global (unpartitioned) Window node in
    ``df``'s optimized logical plan whose input subtree is not provably
    bounded. Empty list = scale-safe under this audit."""
    plan = df._jdf.queryExecution().optimizedPlan()
    offenders: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        kids = _children(node)
        if name == "Window" and node.partitionSpec().isEmpty():
            child = kids[0] if kids else None
            if child is None or not _is_bounded(child):
                child_name = (
                    child.getClass().getSimpleName() if child else "<none>"
                )
                offenders.append(
                    f"global Window over unbounded child {child_name}"
                )
        for k in kids:
            walk(k)

    walk(plan)
    return offenders
