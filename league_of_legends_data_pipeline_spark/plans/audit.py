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

Boundedness is judged on the STREAMED lineage only (r11 ADVICE closed the
two launder paths): an aggregate on the broadcast (build) side of a join
does not bound the streamed corpus the window sorts, and neither does an
aggregate on the non-streamed side of a SHUFFLED join — a raw corpus
sort-merge-joined to a tiny aggregated frame is still corpus-sized. The
r12 ADVICE mirrored that rule to the left branch: a shuffled join bounds
its output only when BOTH branches are bounded, because an aggregated
LEFT inner-joined to a raw corpus RIGHT fans back out to corpus size.

:func:`count_unbounded_bnl_cartesian` (r11 verdict #4) guards the sibling
scale-killer class: a ``BroadcastNestedLoopJoin`` whose build side is not
an aggregated/limited (slate-sized or 1-row) frame, or a
``CartesianProduct`` with neither side bounded, multiplies the corpus by
an unbounded factor. ``scripts/gen_plans.py`` records it as the ``bnl``
PLANS.md column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# node names that BOUND the frame a window sorts: anything aggregated,
# limited, or per-partition-pruned below the window means the
# single-partition exchange moves a reduced frame, not the raw corpus
_BOUNDING = re.compile(
    r"\b(HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit|LocalLimit|"
    r"WindowGroupLimit|LocalTableScan|EmptyRelation)\b")

_WINDOW = re.compile(r"^(\*\(\d+\) )?(Window|WindowInPandas) \[")

_JOIN = re.compile(r"^(\*\(\d+\) )?(BroadcastHashJoin|SortMergeJoin|"
                   r"ShuffledHashJoin|BroadcastNestedLoopJoin|"
                   r"CartesianProduct)\b")

_TREE_ART = re.compile(r"^[\s:+-]*")

# a real plan-tree line's content starts with a CamelCase node name, a
# codegen span marker `*(N) `, or a section banner (`== Final Plan ==`,
# `===== Subqueries =====`); anything else is a CONTINUATION of the
# previous node's expression text — plan strings embed literal newlines
# when an expression contains one (e.g. a regex class with \n), and
# treating such a line as a node corrupts the whole tree's depths
_NODE_START = re.compile(r"^(\*\(\d+\) )?[A-Z=+]")

# a Range generator with LITERAL bounds is a provably bounded frame when
# the span is dimension-sized (lag/replicate axes like spark.range(8));
# larger literal ranges stay unbounded. 4096 matches the repo's documented
# driver-side dimension cap (similarity.py centroid bound).
_RANGE = re.compile(r"^(?:\*\(\d+\) )?Range \((-?\d+), (-?\d+),")
_RANGE_BOUNDED_MAX = 4096

_REUSED = re.compile(r"^ReusedExchange \[.*plan_id=(\d+)\]")
_EXCHANGE_ID = re.compile(r"^(?:\*\(\d+\) )?(?:Broadcast)?Exchange "
                          r".*\[plan_id=(\d+)\]")

# Unpartitioned windows whose input is a localCheckpointed DOMAIN-BOUNDED
# panel: localCheckpoint truncates the lineage (the plan shows only
# `Scan ExistingRDD`), so the string audit cannot see the aggregate that
# bounds the frame. Each entry documents the bounded panel and pins the
# EXACT count — a new unbounded window in one of these queries raises the
# count above its allowance and still fails the gate, and a removed one
# drives the audited value negative (also a drift signal). Checkpoints of
# CORPUS-sized frames get no entry: a window over one is a real cliff
# (the original q306 bug) and must stay flagged.
CHECKPOINTED_PANEL_WINDOWS: dict[str, int] = {
    "q254_bootstrap_did_ci": 1,    # 33-row bootstrap replicate frame
    "q260_msprt_always_valid": 2,  # calendar-bounded day panel
    "q265_distribution_drift": 1,  # distinct-cents support frame
    "q273_cramers_v": 2,           # 5x5 segment x region contingency
    "q278_gini_split": 2,          # distinct-activity threshold axis
    "q279_cramer_von_mises": 1,    # distinct-cents support frame
    "q281_qini_uplift": 1,         # 10-row targeting-decile panel
}

# BNL joins whose build side IS bounded but not provably so from the plan
# string, pinned with EXACT counts (same discipline as the window
# allowlist — a new unbounded BNL in one of these queries raises the count
# above its allowance and still fails; a removed one goes negative).
# Exactly two shapes qualify, each verified in source (r12):
#  - "query slate by unique-id filter": Filter (vec_id = k) / (vec_id % m
#    = 0) / (doc_id < 250) on a table whose id column is unique by the
#    TESTDATA contract — a 1-row/few-row frame the string audit sees as a
#    raw scan (q27/q42/q84/q98/q102/q105/q140/q198/q213/q319 query
#    vectors + centroid seeds; q82's 250-doc eval sub-corpus);
#  - "checkpointed slate/panel": localCheckpoint truncates the lineage of
#    an orderBy().limit(k) slate or a domain-bounded panel to `Scan
#    ExistingRDD` (q291 top-100, q294/q311 k-slates, q254 33-row
#    bootstrap frame, q287 20-bin panel, q86/q101/q298 <=4096-centroid
#    panels, q84's IVF centroid checkpoint, q183's literal pred frame).
# A checkpointed or filtered CORPUS build side gets no entry — that is
# the real O(N*M) cliff and must stay flagged.
PINNED_BOUNDED_BNL: dict[str, int] = {
    "q27_knn_cosine": 1,
    "q42_ivf_ann": 2,
    "q82_lsh_recall": 1,
    "q84_ivf_recall": 3,
    "q86_kmeans_clusters": 1,
    "q98_signlsh_recall": 1,
    "q101_semantic_dedup": 2,
    "q102_jl_projection_distortion": 1,
    "q105_pq_recall": 1,
    "q140_retrieval_eval": 1,
    "q183_zone_map_pruning": 1,
    "q198_mutual_knn": 1,
    # q213 left the list in r13: the shared-assignment rewrite checkpoints
    # the centroid assignment and probe ranking, so the per-nprobe IVF
    # subtrees (5 pinned query-vector BNLs) no longer appear in the
    # executed plan — zero unbounded BNLs, the audit default
    "q254_bootstrap_did_ci": 1,
    "q287_isotonic_calibration": 2,
    "q291_rank_stability": 1,
    "q294_mmr_rerank": 1,
    "q298_silhouette_score": 1,
    # q306's r13 posexplode rewrite re-attaches the query vector to the
    # 64-row Rocchio dimension frame via pos.crossJoin(broadcast(q)):
    # the build side is the `vec_id = 0` equality filter on embeddings —
    # a 1-row frame by the TESTDATA unique-id contract (shape 1 above),
    # which the string audit sees as a raw scan. r13 VERDICT/ADVICE: this
    # BNL shipped unpinned, leaving PLANS.md's bnl=1 row ungated.
    "q306_rocchio_prf": 1,
    "q311_kendall_tau_rank_agreement": 1,
    "q319_mcc_report": 1,
}


@dataclass
class _Node:
    content: str
    idx: int
    children: list["_Node"] = field(default_factory=list)


def _depth(line: str) -> int:
    """Indentation depth of a plan-tree line = where the node text starts
    (tree art is spaces, ``:``, ``+``, ``-``; node names never are)."""
    return _TREE_ART.match(line).end()


def _parse_tree(plan: str) -> tuple[list[_Node], dict[str, _Node]]:
    """Parse the executed-plan string into forest roots + plan_id index.

    ``plan`` is ``df._jdf.queryExecution().executedPlan().toString()``;
    with AQE the string appends an ``== Initial Plan ==`` section — only
    the final (executed) section is parsed. Section headers and the
    Subqueries banner parse as ordinary (never-matching) nodes.
    """
    lines = plan.split("== Initial Plan ==")[0].splitlines()
    roots: list[_Node] = []
    stack: list[tuple[int, _Node]] = []  # (depth, node)
    exchanges: dict[str, _Node] = {}
    for i, line in enumerate(lines):
        d = _depth(line)
        content = line[d:]
        if not content.strip():
            continue
        if not _NODE_START.match(content) and stack:
            # continuation of the previous node's expression text
            stack[-1][1].content += " " + content
            continue
        node = _Node(content, i)
        while stack and stack[-1][0] >= d:
            stack.pop()
        if stack:
            stack[-1][1].children.append(node)
        else:
            roots.append(node)
        stack.append((d, node))
        m = _EXCHANGE_ID.match(content)
        if m and not content.startswith("ReusedExchange"):
            exchanges.setdefault(m.group(1), node)
    return roots, exchanges


def _walk(nodes: list[_Node]):
    todo = list(nodes)
    while todo:
        n = todo.pop()
        yield n
        todo.extend(n.children)


def _join_sides(node: _Node) -> tuple[_Node | None, _Node | None]:
    """(streamed, build) children of a join node.

    Join nodes print exactly two child subtrees (left first). The build
    side is the ``BuildLeft``/``BuildRight``-marked one (broadcast and
    shuffled-hash joins); for SortMergeJoin — where both sides shuffle —
    the LEFT branch is treated as streamed (the r11-ADVICE rule: the
    non-left branch must not launder boundedness). CartesianProduct has
    no streamed side; callers handle it explicitly.
    """
    kids = node.children
    if len(kids) < 2:
        return (kids[0] if kids else None), None
    left, right = kids[0], kids[1]
    if "BuildLeft" in node.content:
        return right, left
    return left, right  # BuildRight, SortMergeJoin, and default


def _bounded(node: _Node | None, exchanges: dict[str, _Node],
             seen: frozenset = frozenset()) -> bool:
    """Whether the frame this subtree produces is bounded (aggregated,
    limited, or per-partition pruned) on its STREAMED lineage."""
    if node is None:
        return False
    c = node.content
    if _BOUNDING.search(c):
        return True
    m = _RANGE.match(c)
    if m and abs(int(m.group(2)) - int(m.group(1))) <= _RANGE_BOUNDED_MAX:
        return True
    if c.startswith("BroadcastExchange"):
        # a broadcast frame reaching here outside a join's build slot
        # carries no bound for the streamed rows
        return False
    m = _REUSED.match(c)
    if m:
        pid = m.group(1)
        orig = exchanges.get(pid)
        if orig is None or pid in seen or \
                orig.content.startswith("BroadcastExchange"):
            return False
        return _bounded(orig, exchanges, seen | {pid})
    if _JOIN.match(c):
        if "CartesianProduct" in c:
            # k x m is bounded only if both factors are
            return all(_bounded(k, exchanges, seen) for k in node.children)
        if "SortMergeJoin" in c or "ShuffledHashJoin" in c:
            # r12 ADVICE: BOTH sides of a shuffled join stream corpus rows,
            # so an aggregated LEFT inner-joined to a raw corpus RIGHT is
            # still corpus-sized (each bounded left row fans out to its
            # matching raw rows). Bounded output needs both branches
            # bounded — the r11 "non-streamed side must not launder"
            # rule, mirrored to the left branch.
            return all(_bounded(k, exchanges, seen) for k in node.children)
        streamed, _build = _join_sides(node)
        return _bounded(streamed, exchanges, seen)
    return any(_bounded(k, exchanges, seen) for k in node.children)


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
    """Count unpartitioned Window operators whose streamed input lineage
    contains no aggregate, limit, or WindowGroupLimit — i.e. windows that
    would single-partition-sort an unbounded per-row frame at corpus
    scale."""
    roots, exchanges = _parse_tree(plan)
    flagged = 0
    for node in _walk(roots):
        if not _WINDOW.match(node.content) or _is_partitioned(node.content):
            continue
        if not any(_bounded(k, exchanges) for k in node.children):
            flagged += 1
    return flagged


def _unwrap_broadcast(node: _Node | None, exchanges: dict[str, _Node],
                      seen: frozenset = frozenset()) -> _Node | None:
    """Descend through broadcast plumbing (BroadcastQueryStage /
    BroadcastExchange / ReusedExchange) to the frame actually broadcast.
    The window audit treats a broadcast as opaque (it never bounds the
    STREAMED rows); the BNL build-side audit judges the broadcast frame
    ITSELF, so it must look through the wrapper."""
    while node is not None:
        c = node.content
        m = _REUSED.match(c)
        if m:
            pid = m.group(1)
            if pid in seen or pid not in exchanges:
                return None
            node, seen = exchanges[pid], seen | {pid}
            continue
        if c.startswith(("BroadcastQueryStage", "BroadcastExchange")):
            node = node.children[0] if node.children else None
            continue
        return node
    return None


def count_unbounded_bnl_cartesian(plan: str) -> int:
    """Count BroadcastNestedLoopJoin nodes whose BUILD side is unbounded
    (not an aggregated/limited slate or 1-row frame) and CartesianProduct
    nodes with NEITHER side bounded. A bounded-k build side multiplies the
    corpus by a constant (the sanctioned q42/q288/q311-class 1-row and
    slate broadcasts); an unbounded one is the O(N*M) cliff."""
    roots, exchanges = _parse_tree(plan)
    flagged = 0
    for node in _walk(roots):
        c = node.content
        if not _JOIN.match(c):
            continue
        if "BroadcastNestedLoopJoin" in c:
            _streamed, build = _join_sides(node)
            build = _unwrap_broadcast(build, exchanges)
            if not _bounded(build, exchanges):
                flagged += 1
        elif "CartesianProduct" in c:
            if not any(_bounded(k, exchanges) for k in node.children):
                flagged += 1
    return flagged


def sp_win(query_name: str, plan: str) -> int:
    """PLANS.md `sp-win` value: raw unbounded-global-window count minus
    the documented checkpointed-bounded-panel allowance for this query.
    0 = clean; >0 = a real (or new, undocumented) single-partition
    per-row window; <0 = an allowlisted window disappeared (update
    :data:`CHECKPOINTED_PANEL_WINDOWS`)."""
    return (count_unbounded_global_windows(plan)
            - CHECKPOINTED_PANEL_WINDOWS.get(query_name, 0))


def bnl(query_name: str, plan: str) -> int:
    """PLANS.md `bnl` value: raw unbounded-BNL/cartesian count minus the
    documented bounded-build allowance. Same 0/>0/<0 semantics as
    :func:`sp_win`."""
    return (count_unbounded_bnl_cartesian(plan)
            - PINNED_BOUNDED_BNL.get(query_name, 0))
