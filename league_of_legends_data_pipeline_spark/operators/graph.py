"""Connected components over near-duplicate pair graphs — the final step of
cluster-level dedup in a training-data pipeline: pairs from MinHash/SimHash
LSH become clusters, and one representative document survives per cluster.

The reference deduplicates only by exact id (``set(matchesList)``,
EC2/fetcher.py:136); transitive near-dup clustering is beyond-reference
LLM-pipeline surface (BASELINE.json north star).

Scale notes
-----------
- Strategy is picked by MEASURED edge count: graphs at/below broadcast
  size (``driver_max_edges``, default 1M ≈ 16 MB) run one union-find pass
  on the driver — the near-dup pair graph is tiny relative to the corpus
  by construction, and the distributed iteration's per-round scheduling
  cost dwarfs the actual work at that size. Larger graphs take the
  distributed iteration below.
- Pure DataFrame iteration: min-label propagation with pointer jumping
  (``comp(u) <- comp(comp(u))``, applied twice per round), so convergence
  is O(log(diameter)) rounds rather than O(diameter) — a chain of 1M
  near-dup docs converges in ~10 rounds, not 1M. The second jump is one
  extra self-join inside the same materialized round, far cheaper than the
  extra rounds it eliminates (each round pays fixed scheduling cost).
- Each round is three shuffles (neighbor-min groupBy + two self-joins for
  the jumps) over (node, comp) long pairs — 16 bytes/row regardless of
  document size. The documents themselves never enter the iteration.
- Convergence detection is a single ``sum(comp)`` over the just-
  materialized round: labels are monotone non-increasing (hop takes mins,
  jumps compose labels that are themselves mins), so an unchanged sum is
  exactly "no label changed" — no per-round comparison join.
- ``localCheckpoint`` every round truncates lineage: without it the plan
  doubles per iteration and Catalyst analysis time explodes by round ~15.
- Convergence is detected exactly (count of changed labels == 0), with
  ``max_iterations`` as a safety valve; the alternating large-star /
  small-star formulation (Kiveris et al., "Connected Components in
  MapReduce and Beyond") is the known constant-factor improvement if
  rounds ever dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators._util import (
    default_parallelism as _par,
)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 30,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component id
    (= the smallest node id in the component). Returns (node, component).

    Only nodes appearing in ``pairs`` are returned; isolated nodes are
    their own singleton components by definition (coalesce at the call
    site, see :func:`dedup_clusters`).

    Two execution strategies, picked by MEASURED graph size (the edge
    count is free — the checkpoint below just materialized the edges):

    - ``m <= driver_max_edges``: union-find on the driver. A deduped
      near-dup edge list at 1M edges is ~16 MB — the same size class
      Spark ships driver-side for every broadcast join — and one O(m α(m))
      union-find pass replaces O(log diameter) rounds × 3 shuffles × 2
      checkpoints of fixed scheduling cost (measured ~6 s of pure round
      overhead on a 1.3k-edge graph at sf0.1). The near-dup pair graph is
      orders of magnitude smaller than the corpus by construction — only
      docs with a band collision AND a verified similarity appear — so at
      100 TB this path still covers all but pathological corpora.
    - larger: the distributed pointer-jumping iteration below, whose
      per-round rows are (node, comp) long pairs regardless of corpus
      size. ``driver_max_edges=0`` forces it (used by tests).
    """
    e = pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    # materialize the deduped edge set ONCE at distinct's own (hash)
    # partitioning — an explicit repartition("src") here would be a third
    # full shuffle of the edges before the iteration even starts
    edges0 = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = edges0.count()
    # edges0 holds BOTH orientations of every non-loop edge, so the true
    # undirected edge count is ~m/2 — compare against 2× the documented
    # cap so the cutoff matches its "1M edges" meaning, not half of it
    if m <= 2 * driver_max_edges:
        # each undirected edge appears in both orientations; one
        # orientation suffices — <= (not <) so self-loop-only nodes are
        # kept and emitted as their own singleton components, exactly as
        # the distributed path below would return them
        rows = edges0.filter(F.col("src") <= F.col("dst")).collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in rows:
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # always root at the SMALLER id → the final root of every
                # tree is the component's minimum node id, matching the
                # distributed min-label formulation exactly
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        return pairs.sparkSession.createDataFrame(
            [(node, find(node)) for node in parent],
            "node long, component long")
    # Size the ITERATION's partitioning to the graph, not the cluster
    # default: the pair graph is orders of magnitude smaller than the
    # corpus (only near-dup docs appear), and every round pays
    # 3 exchanges × partitions in scheduling alone. ~100k edges per
    # partition keeps rounds single-digit-task on small graphs while
    # scaling out linearly on billion-edge ones.
    n = max(1, min(_par(pairs), m // 100_000 + 1))
    edges = edges0.repartition(n, "src").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .repartition(n, "node")
        .localCheckpoint(eager=True)
    )

    def pointer_jump(lab: DataFrame) -> DataFrame:
        # comp(u) <- comp(comp(u)). Every comp value is a node id (labels
        # are mins over node ids) and `lab` covers every node, so the inner
        # self-join is total; labels only ever decrease.
        return (
            lab.alias("a")
            .join(lab.select(F.col("node").alias("comp"),
                             F.col("comp").alias("__c2")).alias("b"), "comp")
            .select("node", F.col("__c2").alias("comp"))
        )

    prev_sum = None
    for _ in range(max_iterations):
        # hop: comp(u) <- min(comp(u), min over neighbors v of comp(v))
        # both selects alias every column: the union's children must not
        # share attribute ids with `labels` (Catalyst's union constraint
        # rewrite fails on duplicated ids across children)
        msgs = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.col("comp").alias("comp"))
        )
        own = labels.select(F.col("node").alias("node"), F.col("comp").alias("comp"))
        hop = own.unionByName(msgs).groupBy("node").agg(F.min("comp").alias("comp"))
        labels = (
            pointer_jump(hop)
            .repartition(n, "node")
            .localCheckpoint(eager=True)
        )
        # labels are monotone non-increasing, so the round is a no-op
        # exactly when the label sum is unchanged — one cheap aggregate
        # over the partitions just materialized by the checkpoint.
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("comp").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 30,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Cluster-level dedup decision table: one row per document with its
    near-dup cluster id, the cluster size, and whether this document is the
    cluster representative (the smallest id — the one a pipeline keeps).

    Documents in no pair are singleton clusters (kept).
    """
    comp = connected_components(pairs, src, dst, max_iterations,
                                driver_max_edges)
    out = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    sizes = out.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        out.join(sizes, "component")
        .withColumn("is_representative", F.col("doc_id") == F.col("component"))
        .select("doc_id", "component", "cluster_size", "is_representative")
    )


def best_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 30,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Quality-aware cluster dedup: per near-dup cluster, keep the member
    with the HIGHEST ``score_col`` (ties → smallest id) — what production
    pipelines actually do, since the lowest-id member of a near-dup
    cluster is arbitrary while the highest-quality member is the one
    worth training on. Returns one row per document: (doc_id, component,
    cluster_size, score, keep).

    Same component machinery as :func:`dedup_clusters`; the selection is
    one row_number window over (component) ordered by (score desc, id) —
    rows entering the window are (doc_id, component, score), never text.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src, dst, max_iterations,
                                driver_max_edges)
    lab = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(score_col).alias("score"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    w = Window.partitionBy("component").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (
        lab.withColumn("__rn", F.row_number().over(w))
        .withColumn("cluster_size",
                    F.count(F.lit(1)).over(Window.partitionBy("component")))
        .select("doc_id", "component", "cluster_size", "score",
                (F.col("__rn") == 1).alias("keep"))
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Bounded-iteration PageRank over an edge list — the link-centrality
    signal web-corpus curation uses as a document-quality prior (the
    Common-Crawl-rank feature in quality classifiers). Returns
    (node, rank, deg) for every node with at least one outgoing edge.

    r_0 = 1/N; r_{i+1}(v) = (1-d)/N + d * sum_{u->v} r_i(u)/deg(u).
    Nodes without outgoing edges are excluded from the graph (callers
    with dangling nodes should symmetrize or pre-prune; the co-occurrence
    graphs this engine builds are symmetric, so none dangle). Nodes with
    outgoing but no incoming edges ARE kept: each iteration left-joins
    the contribution sums back onto the full node set, so a source-only
    node holds rank (1-d)/N and keeps feeding its successors — dropping
    it after iteration 1 would silently delete its rank mass from the
    rest of the walk.

    Scale shape: a FIXED iteration count, each iteration one equi-join of
    the (node, rank) table onto the edge list plus one partial-aggregated
    groupBy on the destination — shuffles carry (node, long) pairs, never
    payloads; N rides in as a 1-row broadcast, nothing is collected. Per-
    edge contributions round to 1e-9 integer units before summing, so
    ranks are summation-order-independent (engine-replicable: q133's
    oracle unrolls the same iterations in SQL and matches exactly).
    """
    GIGA = 1_000_000_000
    e = edges.select(F.col(src_col).alias("__src"),
                     F.col(dst_col).alias("__dst"))
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("__n"))
    ranks = (deg.crossJoin(F.broadcast(n))
             .select(F.col("__src").alias("node"),
                     (F.lit(1.0) / F.col("__n")).alias("rank")))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "__src"), "__src")
                   .join(deg, "__src")
                   .select(F.col("__dst").alias("node"),
                           F.round(F.col("rank") / F.col("deg") * GIGA)
                            .cast("long").alias("__m")))
        # left-join the sums onto the FULL node set: a node with outgoing
        # but no incoming edges receives no contributions, but must stay
        # in `ranks` at (1-d)/N or its outgoing mass vanishes next round
        ranks = (deg.select(F.col("__src").alias("node"))
                 .join(contrib.groupBy("node").agg(F.sum("__m").alias("__m")),
                       "node", "left")
                 .crossJoin(F.broadcast(n))
                 .select("node",
                         (F.lit(1.0 - damping) / F.col("__n")
                          + F.lit(damping)
                          * (F.coalesce(F.col("__m"), F.lit(0))
                             / float(GIGA)))
                         .alias("rank")))
    return (ranks.join(deg.select(F.col("__src").alias("node"), "deg"),
                       "node")
            .select("node", "rank", "deg"))


def label_propagation(edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst",
                      iterations: int = 3) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.) —
    the community-detection rung between connected components (pure
    reachability) and PageRank (centrality): every node starts with its
    own id as label; each round it adopts the MOST FREQUENT label among
    its neighbors, ties broken by the smallest label (the deterministic
    variant — the classic random tie-break is not replayable). Unlike
    CC, majority voting lets dense subgraphs keep distinct labels across
    sparse bridges — communities, not components.

    Returns (node, label) after ``iterations`` rounds. Directed input is
    used as-is; symmetrize first for undirected semantics. Nodes that
    receive no messages in a round keep their label (left join +
    coalesce, the pagerank convention). Synchronous updates oscillate
    on bipartite structures (a lone edge pair swaps labels every round
    — the textbook caveat); callers wanting a fixed point there use the
    async/semi-synchronous variant or read the label pair as one
    community.

    Scale shape: FIXED rounds; per round one equi-join of (node, label)
    onto the edges + one (dst, label) count aggregate + one
    deterministic argmax via min(struct(-count, label)) — shuffles carry
    (node, long) pairs, nothing collects to the driver.
    """
    e = edges.select(F.col(src_col).alias("__src"),
                     F.col(dst_col).alias("__dst"))
    nodes = (e.select(F.col("__src").alias("node"))
             .union(e.select("__dst")).distinct())
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        msgs = (e.join(labels.withColumnRenamed("node", "__src"), "__src")
                .groupBy(F.col("__dst").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("__c")))
        best = (msgs.groupBy("node")
                .agg(F.min(F.struct((-F.col("__c")).alias("nc"),
                                    F.col("label").alias("lbl")))
                     .alias("__b"))
                .select("node", F.col("__b.lbl").alias("__new")))
        labels = (labels.join(best, "node", "left")
                  .select("node", F.coalesce("__new", "label")
                          .alias("label")))
    return labels


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Exact triangle count over an undirected graph, degree-ordered
    (the Cohen / Suri-Vassilvitskii MapReduce scheme): 1-row DataFrame
    ``(triangles, wedges_checked)``.

    Input edges are treated as undirected (duplicates / reverses / self
    loops normalized away). Each edge is ORIENTED from its lower
    (degree, id) endpoint to the higher; wedges are enumerated only at
    each triangle's lowest-(degree, id) vertex, so every triangle is
    produced exactly once, and the per-vertex wedge fan-out is bounded
    by the ORIENTED out-degree — O(sqrt(|E|)) for any graph, which is
    what makes this survive power-law hubs at 100 TB: a hub with
    degree d contributes d wedges only toward HIGHER-degree partners,
    not d² wedges. Three shuffles total (degree agg, wedge self-join,
    closing-edge semi-join); nothing collects to the driver.
    """
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
         .distinct())
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    # orientation key: (degree, id) lexicographic, packed as a struct so
    # one comparison orders both components
    with_k = (e.join(deg.select(F.col("node").alias("u"),
                                F.col("deg").alias("du")), "u")
              .join(deg.select(F.col("node").alias("v"),
                               F.col("deg").alias("dv")), "v"))
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = with_k.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ku < kv, ku).otherwise(kv).alias("klo"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(ku < kv, kv).otherwise(ku).alias("khi"),
    )
    w1 = oriented.select("lo", F.col("hi").alias("m"), F.col("khi").alias("km"))
    w2 = oriented.select("lo", F.col("hi").alias("w"), F.col("khi").alias("kw"))
    wedges = (w1.join(w2, "lo")
              .filter(F.col("km") < F.col("kw"))
              .select(F.col("m").alias("lo"), F.col("w").alias("hi")))
    closing = oriented.select("lo", "hi")
    tri = wedges.join(closing, ["lo", "hi"], "left_semi")
    return (tri.agg(F.count(F.lit(1)).alias("triangles"))
            .crossJoin(F.broadcast(
                wedges.agg(F.count(F.lit(1)).alias("wedges_checked")))))


def hits_scores(edges: DataFrame, src_col: str = "src",
                dst_col: str = "dst", iterations: int = 3,
                scale: int = 1_000_000) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list, max-normalized, ``iterations`` synchronous rounds:
    (node, hub_mu, auth_mu) in integer MICRO-UNITS (value * ``scale``,
    rounded). Complements PageRank (global prestige) with the
    dual hub/authority split that matters for link-farm and
    boilerplate-hub detection in web corpora.

    Integer micro-units are the engine-parity trick (the q177 chi-square
    precedent): each round quantizes the normalized scores to 1e-6
    grid BIGINTs, so the next round's aggregations are ORDER-FREE
    integer sums — bit-identical across engines and executions —
    instead of order-dependent double sums that drift in the last ulp.
    Quantization error is 5e-7 per round, far below any ranking use.

    Per round: one join + one aggregate per direction. The round's max
    (a single BIGINT — deterministic, unlike a sampled partitioning)
    is COLLECTED and folded back as a literal divisor rather than
    crossJoined in-plan, and each round's (node, long) score frame is
    localCheckpointed (the connected-components precedent) so the
    max-collect of round i does not re-derive rounds 1..i-1: a data-dependent scalar frame per round makes
    every later round re-derive the max's whole upstream too, tripling
    the re-derived lineage per round (measured 28 s for 3 rounds on
    the 15k-node chain graph vs ~2 s with literal divisors). Shuffles
    carry (node, long) pairs; only one long per half-round reaches the
    driver.
    """
    if iterations < 1:
        raise ValueError(
            f"hits_scores requires iterations >= 1, got {iterations}: "
            "0 rounds would leave authority scores undefined")
    # the edge list and node set are re-read by every round AND by every
    # max-collect: materialize both once (CC precedent), so rounds join
    # against checkpointed (long, long) frames instead of re-running the
    # caller's edge-building joins a dozen times
    e = (edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
         .distinct().localCheckpoint(eager=True))
    nodes = (e.select(F.col("s").alias("node"))
             .unionAll(e.select(F.col("d").alias("node")))
             .distinct().localCheckpoint(eager=True))
    # Scored frames carry only nodes with a nonzero-able raw sum; zero
    # scores are restored ONCE in the final select. A node absent from a
    # half-round's frame would have scored round(0*scale/max) = 0 there,
    # and a 0-scored (or absent) node contributes exactly nothing to the
    # next half-round's sums — so inner joins against the score frames
    # compute the SAME integer sums as the r12 form that left-joined the
    # full node set every half-round (2 node-sized joins/round removed).
    # Checkpointing the RAW sums (not the normalized frames) means the
    # heavy join+aggregate runs once per half-round — the r12 form
    # computed it twice (once under the max-collect, once under the
    # normalized frame's own eager checkpoint). The max stays a
    # collected literal divisor (tiny K-row action on the checkpointed
    # frame), keeping the 0/null degenerate guards driver-visible.
    hub = nodes.withColumn("h", F.lit(scale).cast("long"))
    auth = None
    for _ in range(iterations):
        # authority pass: a(i) = sum of hub(j) over edges j -> i
        a_raw = (e.join(hub.withColumnRenamed("node", "s"), "s")
                 .groupBy(F.col("d").alias("node"))
                 .agg(F.sum("h").alias("__a"))
                 .localCheckpoint(eager=True))
        a_max_row = a_raw.agg(F.max("__a")).first()
        a_max = a_max_row[0] if a_max_row else None
        if not a_max:  # no edges reach any hub-scored source: degenerate
            return nodes.select(
                "node", F.lit(0).cast("long").alias("hub_mu"),
                F.lit(0).cast("long").alias("auth_mu"))
        auth = a_raw.select(
            "node",
            F.round(F.col("__a") * F.lit(float(scale))
                    / F.lit(float(a_max))).cast("long").alias("a"))
        # hub pass: h(j) = sum of auth(i) over edges j -> i
        h_raw = (e.join(auth.withColumnRenamed("node", "d"), "d")
                 .groupBy(F.col("s").alias("node"))
                 .agg(F.sum("a").alias("__h"))
                 .localCheckpoint(eager=True))
        h_max_row = h_raw.agg(F.max("__h")).first()
        h_max = h_max_row[0] if h_max_row else None
        if not h_max:  # unreachable when a_max > 0 (the max-auth node is
            # an edge dst, so its source's hub sum is positive) — kept as
            # a cheap belt-and-braces guard against a null/0 divisor
            return (nodes.join(auth, "node", "left")
                    .select("node", F.lit(0).cast("long").alias("hub_mu"),
                            F.coalesce(F.col("a"), F.lit(0)).cast("long")
                            .alias("auth_mu")))
        hub = h_raw.select(
            "node",
            F.round(F.col("__h") * F.lit(float(scale))
                    / F.lit(float(h_max))).cast("long").alias("h"))
    return (nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select("node",
                    F.coalesce(F.col("h"), F.lit(0)).cast("long")
                    .alias("hub_mu"),
                    F.coalesce(F.col("a"), F.lit(0)).cast("long")
                    .alias("auth_mu")))


def k_core(edges: DataFrame, k: int, rounds: int,
           src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Bounded-round k-core peel: repeatedly drop nodes with degree < k
    and the edges touching them (Matula-Beck peeling, the degeneracy
    decomposition's inner loop) — the standard spam/noise filter before
    community detection or graph-based dedup clustering.

    Input is a DIRECTED adjacency; symmetrize first for undirected
    semantics (the label_propagation convention). Duplicate edges are
    collapsed so degree counts neighbors, not multi-edges. Returns the
    (node, degree) table of the residual graph after exactly ``rounds``
    peels — a fixed-round prefix of the true k-core, which a production
    run extends to the fixpoint by looping until the surviving-node
    count stops changing (one extra count() action per round; the count
    is already materialized by the checkpoint below). Fixed rounds keep
    the result replayable and oracle-checkable.

    Scale shape: per round one (node) count aggregate over the edge
    list + two key-only semi-joins filtering edges to surviving
    endpoints — shuffles carry 8-byte keys, nothing collects.
    ``localCheckpoint`` truncates lineage each round (the CC/HITS
    convention) so the executed plan cannot grow with ``rounds``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select(F.col(src_col).alias("__src"),
                     F.col(dst_col).alias("__dst")).distinct()
    for _ in range(rounds):
        deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
        keep = deg.where(F.col("__deg") >= k).select("__src")
        e = (e.join(keep, "__src", "semi")
             .join(keep.withColumnRenamed("__src", "__dst"),
                   "__dst", "semi")
             .localCheckpoint(eager=False))
    return (e.groupBy(F.col("__src").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree")))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iterations: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Bounded-iteration personalized PageRank: random walk with restart
    to a SEED SET instead of the uniform vector — proximity to the seeds
    rather than global centrality (the recommendation / related-entity
    primitive; topic-sensitive PageRank, Haveliwala 2002).

    r_0 = restart; r_{i+1}(v) = (1-d)*restart(v) + d * sum_{u->v}
    r_i(u)/deg(u), where restart(v) = 1/|S| on seeds present in the
    graph's node set and 0 elsewhere. Same conventions as ``pagerank``:
    node universe = nodes with outgoing edges, fixed iterations, 1e-9
    integer contribution units for order-independence, left-join carry
    so source-only nodes keep their restart mass. Returns
    (node, rank, deg, is_seed).

    Scale shape: identical to pagerank — per iteration one equi-join of
    (node, rank) onto the edge list + one partial-aggregated dst
    groupBy; the seed set joins in as a keys-only broadcast and |S| as
    a 1-row broadcast. Nothing collects to the driver.
    """
    GIGA = 1_000_000_000
    # lineage truncation (the CC/HITS convention): edges, degrees and the
    # restart vector feed every iteration's join tree, so without a
    # checkpoint the executed plan repeats their construction once per
    # reference — measured 148 joins for 2 iterations on the chain graph
    e = edges.select(F.col(src_col).alias("__src"),
                     F.col(dst_col).alias("__dst")) \
        .localCheckpoint(eager=False)
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("deg")) \
        .localCheckpoint(eager=False)
    sd = seeds.select(F.col(seed_col).alias("__src")).distinct()
    nodes = (deg.join(sd, "__src", "left_semi")
             .select(F.col("__src"), F.lit(1).alias("__seed"))
             .unionByName(
                 deg.join(sd, "__src", "left_anti")
                 .select(F.col("__src"), F.lit(0).alias("__seed"))))
    ns = nodes.agg(F.sum("__seed").alias("__s"))
    # degenerate-seed guard (the hits_scores a_max convention, r9
    # advice): if no seed has out-degree, __seed/__s is null for every
    # node and null ranks propagate silently — fail loudly instead.
    # One 1-row aggregate collect, same cost class as HITS' per-round
    # max-collect; nodes is derived from checkpointed deg so the probe
    # does not re-run the caller's edge-building joins.
    seed_overlap = ns.first()[0]
    if not seed_overlap:
        raise ValueError(
            "personalized_pagerank: no seed node intersects the graph's "
            "out-degree node set; restart mass 1/|S| is undefined "
            "(check seed_col values against the edge src domain)")
    restart = (nodes.crossJoin(F.broadcast(ns))
               .select(F.col("__src").alias("node"), "__seed",
                       (F.col("__seed") / F.col("__s")).alias("__restart"))
               .localCheckpoint(eager=False))
    ranks = restart.select("node", F.col("__restart").alias("rank"))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "__src"), "__src")
                   .join(deg, "__src")
                   .select(F.col("__dst").alias("node"),
                           F.round(F.col("rank") / F.col("deg") * GIGA)
                            .cast("long").alias("__m")))
        ranks = (restart
                 .join(contrib.groupBy("node").agg(F.sum("__m").alias("__m")),
                       "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping) * F.col("__restart")
                          + F.lit(damping)
                          * (F.coalesce(F.col("__m"), F.lit(0))
                             / float(GIGA)))
                         .alias("rank"))
                 .localCheckpoint(eager=False))
    return (ranks
            .join(deg.select(F.col("__src").alias("node"), "deg"), "node")
            .join(restart.select("node", F.col("__seed").alias("is_seed")),
                  "node")
            .select("node", "rank", "deg", "is_seed"))


def shortest_paths(edges: DataFrame, seeds: DataFrame, rounds: int,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: str = "w",
                   seed_col: str = "node") -> DataFrame:
    """Bounded-round multi-source WEIGHTED shortest paths: Bellman-Ford
    relaxation over the full tentative-distance table — the weighted
    complement to q226's hop-count BFS (which a recursive UNION ALL CTE
    can express; weighted min-relaxation needs an aggregate per round,
    which recursive CTEs disallow, hence the iterative operator).

    d_0 = 0 on seeds; d_{k+1}(v) = min(d_k(v), min over edges u->v of
    d_k(u) + w(u, v)). After ``rounds`` rounds the result is exact for
    every node whose shortest path uses <= ``rounds`` edges — the same
    fixed-round replayability contract as ``k_core``/``pagerank``; a
    production run loops until the relaxed-row count hits zero.
    Weights must be non-negative for the bounded-round prefix to be
    monotonically exact; integer weights keep the result bit-stable
    under any join/aggregation order.

    Scale shape: each round is ONE equi-join of the distance table onto
    the edge list (keys + one long ride the shuffle) and ONE min
    aggregate — linear in edges per round, nothing collects to the
    driver. ``localCheckpoint`` truncates lineage per round (the
    CC/HITS/PPR convention) so the executed plan cannot grow with
    ``rounds``. Unreached nodes are simply absent (no infinity
    sentinel to carry through aggregates).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select(F.col(src_col).alias("__src"),
                     F.col(dst_col).alias("__dst"),
                     F.col(weight_col).cast("long").alias("__w")) \
        .localCheckpoint(eager=False)
    dist = (seeds.select(F.col(seed_col).alias("node")).distinct()
            .withColumn("dist", F.lit(0).cast("long")))
    for _ in range(rounds):
        relaxed = (e.join(dist.withColumnRenamed("node", "__src"), "__src")
                   .select(F.col("__dst").alias("node"),
                           (F.col("dist") + F.col("__w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False))
    return dist


def local_clustering_coefficient(edges: DataFrame, src_col: str = "src",
                                 dst_col: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient over an undirected graph:
    ``(node, deg, triangles, lcc)`` with lcc = 2*tri / (deg*(deg-1)),
    defined 0.0 for deg < 2. The neighborhood-density readout that
    separates community cores from bridge/hub nodes — the standard
    companion to q187's global triangle census when auditing a
    link graph for farm/boilerplate structure.

    Same degree-ordered wedge scheme as ``triangle_count`` (wedges
    enumerated only at each triangle's lowest-(degree, id) vertex, so
    hub fan-out is bounded by ORIENTED out-degree), but each closed
    wedge is exploded back to its THREE corners before the per-node
    count — a triangle increments all three members' tallies exactly
    once. Shuffles carry (node, long) pairs; nothing collects.
    """
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v"))
         .distinct()
         .localCheckpoint(eager=True))
    deg = (e.select(F.col("u").alias("node"))
           .unionAll(e.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=True))
    with_k = (e.join(deg.select(F.col("node").alias("u"),
                                F.col("deg").alias("du")), "u")
              .join(deg.select(F.col("node").alias("v"),
                               F.col("deg").alias("dv")), "v"))
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    # oriented is consumed by BOTH wedge sides and the closing join —
    # eager-checkpoint it so the compiled plan references one
    # materialized RDD instead of re-deriving the deg joins three times
    oriented = with_k.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(ku < kv, kv).otherwise(ku).alias("khi")) \
        .localCheckpoint(eager=True)
    w1 = oriented.select("lo", F.col("hi").alias("m"),
                         F.col("khi").alias("km"))
    w2 = oriented.select("lo", F.col("hi").alias("w"),
                         F.col("khi").alias("kw"))
    wedges = (w1.join(w2, "lo")
              .filter(F.col("km") < F.col("kw"))
              .select("lo", F.col("m").alias("hi_a"),
                      F.col("w").alias("hi_b")))
    closed = wedges.join(
        oriented.select(F.col("lo").alias("hi_a"),
                        F.col("hi").alias("hi_b")),
        ["hi_a", "hi_b"], "left_semi")
    # one explode, not a 3-way union: a union would re-run the wedge
    # join once per corner branch
    corners = closed.select(
        F.explode(F.array("lo", "hi_a", "hi_b")).alias("node"))
    tri = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return (deg.join(tri, "node", "left")
            .select("node", "deg",
                    F.coalesce(F.col("triangles"), F.lit(0))
                    .cast("bigint").alias("triangles"),
                    F.when(F.col("deg") < 2, F.lit(0.0))
                    .otherwise(
                        F.round(2.0 * F.coalesce(F.col("triangles"),
                                                 F.lit(0))
                                / (F.col("deg") * (F.col("deg") - 1)), 6))
                    .cast("double").alias("lcc")))


def link_prediction_scores(edges: DataFrame, src_col: str = "src",
                           dst_col: str = "dst",
                           scale: int = 1_000_000) -> DataFrame:
    """Common-neighbor and resource-allocation link-prediction scores
    for every NON-edge node pair sharing at least one neighbor:
    ``(node_a, node_b, common_neighbors, ra_micro)`` with node_a <
    node_b and ra_micro = sum over shared neighbors z of
    round(scale / deg(z)) — the Zhou-Lu-Zhang resource-allocation
    index in integer micro-units, so the per-pair sum is an ORDER-FREE
    BIGINT aggregate (bit-identical across engines; the HITS
    quantization convention) instead of an order-dependent 1/deg
    float sum.

    Candidate generation is the neighborhood self-join keyed on the
    SHARED neighbor — pair volume is sum_z deg(z)^2, the same wedge
    budget as triangle counting, bounded by hub degree not corpus
    size; existing edges are removed with one anti-join. At web scale
    the standard lever applies: cap or sample super-hub neighborhoods
    before the wedge join (they contribute near-zero RA weight by
    construction, 1/deg -> 0).
    """
    e = (edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v"))
         .distinct()
         .localCheckpoint(eager=True))
    nbr = (e.select(F.col("u").alias("node"), F.col("v").alias("z"))
           .unionAll(e.select(F.col("v").alias("node"),
                              F.col("u").alias("z")))
           .localCheckpoint(eager=True))
    deg = nbr.groupBy("z").agg(F.count(F.lit(1)).alias("deg_z"))
    nz = nbr.select(F.col("z").alias("__hub"), F.col("node"))
    pairs = (nz.join(nz.select(F.col("__hub"),
                               F.col("node").alias("node_b")), "__hub")
             .filter(F.col("node") < F.col("node_b"))
             .join(deg.withColumnRenamed("z", "__hub"), "__hub")
             .groupBy(F.col("node").alias("node_a"), "node_b")
             .agg(F.count(F.lit(1)).cast("bigint")
                  .alias("common_neighbors"),
                  F.sum(F.round(F.lit(float(scale)) / F.col("deg_z"))
                        .cast("bigint")).cast("bigint")
                  .alias("ra_micro")))
    return pairs.join(
        e.select(F.col("u").alias("node_a"), F.col("v").alias("node_b")),
        ["node_a", "node_b"], "left_anti")
