"""Plan-level scale audits over executed-plan strings.

The round-10 verdict found four queries whose correct answers hid a
scale-killer plan: an UNPARTITIONED window (``over(orderBy(...))`` with no
``partitionBy``) over a per-row frame, which Spark executes by moving the
ENTIRE input to one partition (``WindowExec`` warns exactly this). The
sanctioned shapes are:

- a window over a frame that is already **aggregated** below it (the
  q265/q279 value-domain "support frame" pattern — the sort is
  domain-bounded, not corpus-sized);
- a window over a frame already **limited** below it
  (``orderBy().limit(k)`` → ``TakeOrderedAndProject``, or a rank filter
  that fires ``WindowGroupLimit`` — per-partition pruning happens before
  the single-partition exchange);
- a **partitioned** window (``partitionBy`` present — no global sort).

:func:`count_unbounded_global_windows` counts the windows that match NONE
of these — the regression class this module exists to keep at zero.
``scripts/gen_plans.py`` records it per query as the ``sp-win`` PLANS.md
column; ``tests/test_plans.py`` pins the detector's semantics and the
zero-count for the round-10 offenders.
"""

from __future__ import annotations

import re

# node names that BOUND the frame a window sorts: anything aggregated,
# limited, or per-partition-pruned below the window means the
# single-partition exchange moves a reduced frame, not the raw corpus
_BOUNDING = re.compile(
    r"\b(HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit|LocalLimit|"
    r"WindowGroupLimit|LocalTableScan|EmptyRelation)\b")

_WINDOW = re.compile(r"^(\*\(\d+\) )?(Window|WindowInPandas) \[")

_TREE_ART = re.compile(r"^[\s:+-]*")


def _depth(line: str) -> int:
    """Indentation depth of a plan-tree line = where the node text starts
    (tree art is spaces, ``:``, ``+``, ``-``; node names never are)."""
    return _TREE_ART.match(line).end()


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` bracket groups of a node's argument string."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def _is_partitioned(window_line: str) -> bool:
    """Whether a ``Window [...]`` plan line carries a partitionSpec.

    ``WindowExec`` prints ``Window [exprs], [partSpec], [orderSpec]`` with
    empty specs omitted: 3 groups = partitioned + ordered; 2 groups is
    either partitioned-unordered (second group has no ASC/DESC sort
    markers) or unpartitioned-ordered (it does); 1 group = neither.
    """
    groups = _top_level_groups(window_line)
    if len(groups) >= 3:
        return True
    if len(groups) == 2:
        return not re.search(r"\b(ASC|DESC)\b", groups[1])
    return False


def count_unbounded_global_windows(plan: str) -> int:
    """Count unpartitioned Window operators whose input subtree contains
    no aggregate, limit, or WindowGroupLimit — i.e. windows that would
    single-partition-sort an unbounded per-row frame at corpus scale.

    ``plan`` is ``df._jdf.queryExecution().executedPlan().toString()``;
    with AQE the string appends an ``== Initial Plan ==`` section — only
    the final (executed) section is audited.
    """
    lines = plan.split("== Initial Plan ==")[0].splitlines()
    flagged = 0
    for i, line in enumerate(lines):
        d = _depth(line)
        content = line[d:]
        if not _WINDOW.match(content):
            continue
        if _is_partitioned(content):
            continue
        bounded = False
        for below in lines[i + 1:]:
            bd = _depth(below)
            if bd <= d and below[bd:].strip():
                break  # left this window's subtree
            if _BOUNDING.search(below[bd:]):
                bounded = True
                break
        if not bounded:
            flagged += 1
    return flagged
