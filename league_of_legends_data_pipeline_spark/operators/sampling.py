"""Deterministic sampling and dataset splitting for training-data pipelines.

A 100 TB corpus cannot be split with ``rand()``: re-runs must assign every
document to the same split (resumable backfills, reproducible ablations),
and the assignment must not depend on partitioning, row order, or cluster
size. Both operators therefore key off an md5-derived hash of the document
id — pure Column expressions, no shuffle for the split itself, and
engine-portable (same values in DuckDB, so both are oracle-checkable).

The reference has no sampling surface (its closest analogue is the
``PLAYER_LIMIT`` head-cap, EC2/fetcher.py:107 — SURVEY L1); this module is
part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60: the hash is 15 hex chars = 60 bits, so hash/2^60 is uniform in [0,1)
HASH_UNIT_DENOM = 1 << 60


def hash_unit(col: str | Column, seed: int = 42) -> Column:
    """Deterministic uniform [0,1) value per input value: first 60 bits of
    md5(seed:value) scaled down. Independent draws for the same value come
    from different seeds."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string"))), 1, 15), 16, 10)
    return h.cast("long") / F.lit(float(HASH_UNIT_DENOM))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hashed id.

    ``weights`` need not sum to 1 — they are normalized. Assignment is a
    pure projection (no shuffle, no state): stable under re-runs, appends,
    repartitioning, and cluster-size changes, and a document keeps its
    split even when the corpus around it grows — the property that keeps
    eval sets uncontaminated across dataset versions.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = hash_unit(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample_n(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, chosen by hashed-id
    order — a deterministic reservoir. One shuffle (window over the strata);
    the hash order makes the choice independent of file layout, and the
    id tiebreak makes it total.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_unit(id_col, seed).asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_sample(df: DataFrame, id_col: str, fraction: float, seed: int = 42) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose hash-unit falls
    below ``fraction``. Pure filter — pushed to the scan, no shuffle; the
    same ids are kept on every run and on every engine."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_unit(id_col, seed) < fraction)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row iff its
    hash-unit draw falls below its per-row weight (clamped to [0, 1]).

    The quality-weighted corpus downsample: a doc with weight 0.9 is kept
    with probability 0.9, one with 0.1 rarely — but deterministically, so
    re-runs, appends, and engine changes keep the exact same ids (the
    reproducibility property hash_split documents). Pure filter: pushed
    to the scan, no shuffle, no RNG state.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    clamped = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_unit(id_col, seed) < clamped)


def approx_ntile(
    df: DataFrame,
    value_col: str | Column,
    n: int,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scalable ntile: sketch boundaries + broadcast assignment — the
    100 TB path for the exact-ntile window (q55), which needs a global
    single-partition sort.

    Two map-friendly passes instead of one giant sort:

    1. ``percentile_approx`` computes the ``n-1`` internal quantile
       boundaries in ONE distributed aggregation (mergeable Greenwald-
       Khanna sketch: partials per partition, sketch-sized final merge —
       the only single-partition exchange carries a few KB of sketch, not
       rows).
    2. each row's bucket is ``1 + count(boundaries < value)`` over the
       broadcast boundary array — a map-only projection, no shuffle, no
       sort, no window.

    Rank error per boundary is bounded by ``1/accuracy`` of the total
    rows, so expected disagreement vs exact ntile is at most
    ``2 * (n-1) / accuracy`` of rows (0.18% for deciles at the default) —
    q100 asserts >= 99% agreement against the exact window form. Ties on
    ``value_col`` all land in one bucket (exact ntile splits them by row
    order); heavy-tie distributions should tiebreak via a composite value.

    Adds a ``bucket`` column (1..n); boundary plumbing stays internal.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pcts = F.array(*[F.lit(k / n) for k in range(1, n)])
    bounds = df.agg(
        F.percentile_approx(v, pcts, F.lit(accuracy)).alias("__bnds"))
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            "bucket",
            (F.lit(1) + F.aggregate(
                "__bnds", F.lit(0),
                lambda acc, b: acc + F.when(b < v, 1).otherwise(0),
            )).cast("long"))
        .drop("__bnds")
    )


def pack_sequences(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    size_col: str | Column,
    budget: int,
) -> DataFrame:
    """Concat-and-split sequence packing: assign documents (in a stable
    deterministic order) to fixed-token-budget bins, the way training
    pipelines concatenate a corpus and cut it into context windows.

    ``bin_id = floor(start_offset / budget)`` where start_offset is the
    running token total of everything packed before the row — i.e. the
    corpus is laid out end-to-end inside each ``partition_col`` group and
    sliced every ``budget`` tokens. A document straddling a boundary is
    attributed to the bin where it starts (greedy concat semantics, not
    bin packing — identical to GPT-style data loaders).

    Scale shape: ONE shuffle on ``partition_col`` and a single sorted
    window pass per group. Packing is per-group on purpose: a global
    running sum would serialize on one partition, while per-source groups
    keep every executor busy and still produce deterministic bins.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (Window.partitionBy(partition_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    run = F.sum(size).over(w)
    return df.withColumn(
        "bin_id", F.floor((run - size) / F.lit(budget)).cast("long"))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    parts: dict[str, int],
    id_col: str,
    seed: int = 42,
    exact: bool = True,
) -> DataFrame:
    """Rebalance a corpus to a target source mixture (Pile/Dolma-style
    "data recipe"): keep the LARGEST subset whose group proportions hit
    ``parts`` exactly, choosing rows by hashed-id order.

    ``parts`` are integer mixture ratios (e.g. {"web": 5, "books": 3,
    "code": 2} → 50/30/20); groups not listed are dropped. Quota math is
    pure integer/53-bit-exact arithmetic — T = min_g floor(n_g·W/w_g)
    achievable rows, quota_g = floor(w_g·T/W) — so every engine derives
    identical quotas (no float-normalized weights whose rounding could
    differ by one row at a group boundary).

    ``exact=True`` ranks rows per group by (hash, id) and cuts at the
    quota: exactly quota_g rows, at the cost of one per-group window
    (few groups ⇒ skewed shuffle — fine up to ~10^8 rows per group).
    ``exact=False`` is the 100 TB path: a pure map-side filter keeping
    rows with hash < quota_g/n_g — binomially-approximate counts, no
    shuffle at all, same determinism. Both modes keep a group's sample
    stable under appends to OTHER groups (draw order is per-group).
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    if any(p <= 0 for p in parts.values()):
        raise ValueError("mixture parts must be positive integers")
    total_w = int(sum(parts.values()))
    part_of = F.create_map(
        *[F.lit(x) for kv in parts.items() for x in kv])
    member = df.filter(F.col(group_col).isin(*parts.keys()))
    # a listed group with NO rows makes the mixture unachievable (T = 0,
    # empty result) — seed every listed group with n = 0 rather than
    # silently dropping it from the min and rebalancing over the rest
    spark = df.sparkSession
    listed = spark.createDataFrame([(g,) for g in parts], [group_col])
    counts = (member.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("__n"))
              .join(listed, group_col, "right_outer")
              .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
              .withColumn("__w", part_of[F.col(group_col)]))
    achievable = counts.agg(F.min(F.floor(
        F.col("__n") * total_w / F.col("__w"))).cast("long").alias("__T"))
    quotas = (counts.crossJoin(F.broadcast(achievable))
              .select(group_col,
                      "__n",
                      F.floor(F.col("__w") * F.col("__T") / total_w)
                      .cast("long").alias("__quota")))
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            hash_unit(id_col, seed).asc(), F.col(id_col).asc())
        return (member.withColumn("__rn", F.row_number().over(w))
                .join(F.broadcast(quotas.select(group_col, "__quota")),
                      group_col)
                .filter(F.col("__rn") <= F.col("__quota"))
                .drop("__rn", "__quota"))
    return (member.join(F.broadcast(quotas), group_col)
            .filter(hash_unit(id_col, seed)
                    < F.col("__quota") / F.col("__n"))
            .drop("__n", "__quota"))


def hash_long(col: str | Column, seed: int = 42) -> Column:
    """Deterministic 60-bit integer hash per value (the integer form of
    :func:`hash_unit` — use when a modulus or total order is wanted
    without float rounding in the loop)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string"))),
        1, 15), 16, 10).cast("long")


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Training-order shuffle: assign every row a (shard, pos) that reads
    back as a fixed pseudo-random global order — shard = hash % num_shards,
    pos = rank of (hash, id) within the shard.

    Why not ``ORDER BY rand()``: training-data shuffles must be
    reproducible (resume mid-epoch, re-run the job, same order), and a
    global sort range-partitions the whole corpus through one exchange.
    This is ONE hash-partitioned shuffle with a per-shard (not global)
    sort; readers stream shards in index order. Because the draw is an
    id hash, any prefix of shards is a uniform 1/k sample, and a row
    keeps its (shard, pos-order relative to survivors) under appends —
    new rows interleave, old relative order within a shard never flips.
    Returns the input columns + (shard, pos).
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    h = hash_long(id_col, seed)
    w = Window.partitionBy("shard").orderBy(
        F.col("__h").asc(), F.col(id_col).asc())
    return (df.withColumn("__h", h)
            .withColumn("shard", (F.col("__h") % num_shards).cast("int"))
            .withColumn("pos", F.row_number().over(w))
            .drop("__h"))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Group-aware train/val/test split: near-duplicate CLUSTERS move as
    one unit, so an eval split can never contain a near-copy of a
    training document (the leakage a per-document hash split cannot
    prevent — near-dups hash independently and straddle the boundary).

    ``pairs`` is any (id_a, id_b) near-dup edge set (simhash/minhash/
    embedding); documents in no pair are their own singleton cluster.
    Clusters come from the pointer-jumping connected components
    (operators/graph.py — O(log diameter) rounds); the split is then a
    pure hash projection of the CLUSTER id, keeping every hash_split
    stability property (re-runs, appends, engine changes) at cluster
    granularity. Returns the input ids + (component, cluster_size,
    is_representative, split).
    """
    from league_of_legends_data_pipeline_spark.operators.graph import (
        dedup_clusters,
    )

    assigned = dedup_clusters(df, pairs, id_col)
    return hash_split(assigned, "component", weights, seed)


def mixture_sample_tokens(
    df: DataFrame,
    group_col: str,
    parts: dict[str, int],
    id_col: str,
    token_col: str,
    seed: int = 42,
) -> DataFrame:
    """Token-budgeted mixture sampling: like :func:`mixture_sample`, but
    the recipe targets TOKEN mass per group, which is what training
    recipes actually specify (a 5/3/2 doc-count mixture is not a 5/3/2
    token mixture when sources have different document lengths).

    Same integer quota math on token sums (T = min_g floor(tok_g·W/w_g),
    budget_g = floor(w_g·T/W)); rows are admitted in hashed-id order
    while the group's RUNNING token total stays within budget — one
    window (per-group ordered cumulative sum), deterministic across
    engines and re-runs. The kept token mass per group lands within one
    document of the budget (the greedy prefix rule; exact token packing
    is bin-packing and not order-stable). Listed groups absent from the
    data make the mixture unachievable (empty result), as in
    mixture_sample.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    if any(p <= 0 for p in parts.values()):
        raise ValueError("mixture parts must be positive integers")
    total_w = int(sum(parts.values()))
    part_of = F.create_map(
        *[F.lit(x) for kv in parts.items() for x in kv])
    member = df.filter(F.col(group_col).isin(*parts.keys()))
    spark = df.sparkSession
    listed = spark.createDataFrame([(g,) for g in parts], [group_col])
    sums = (member.groupBy(group_col)
            .agg(F.sum(token_col).alias("__tok"))
            .join(listed, group_col, "right_outer")
            .withColumn("__tok", F.coalesce(F.col("__tok"), F.lit(0)))
            .withColumn("__w", part_of[F.col(group_col)]))
    achievable = sums.agg(F.min(F.floor(
        F.col("__tok") * total_w / F.col("__w"))).cast("long").alias("__T"))
    budgets = (sums.crossJoin(F.broadcast(achievable))
               .select(group_col,
                       F.floor(F.col("__w") * F.col("__T") / total_w)
                       .cast("long").alias("__budget")))
    w = (Window.partitionBy(group_col)
         .orderBy(hash_unit(id_col, seed).asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (member.withColumn("__cum", F.sum(token_col).over(w))
            .join(F.broadcast(budgets), group_col)
            .filter(F.col("__cum") <= F.col("__budget"))
            .drop("__cum", "__budget"))


# Poisson(1) CDF as 60-bit integer thresholds: t_k = floor(CDF(k) * 2^60),
# k = 0..9 (truncation mass past 9 is ~1e-7). Baked literals per the
# no-runtime-transcendentals convention: the bootstrap weight for a draw u
# in [0, 2^60) is |{k : t_k <= u}| — pure integer comparisons, so the
# replicate weights are bit-identical in any engine with md5.
POISSON1_CDF_T60 = (
    424136118829305344, 848272237658610688, 1060340297073263360,
    1131029650211480960, 1148701988496035328, 1152236456152946176,
    1152825534095764608, 1152909688087595776, 1152920207336574720,
    1152921376142016768,
)


def poisson_bootstrap_means(df: DataFrame, id_col: str, value_col: str,
                            n_replicates: int = 40,
                            seed: int = 7) -> DataFrame:
    """Poisson bootstrap (Chamandy et al.) replicate means of an integer
    metric column — THE distributed bootstrap: classical resampling
    needs global coordination to draw n-of-n with replacement, but for
    large n the multinomial factorizes into independent Poisson(1)
    counts per (row, replicate), so every row computes its own weights
    from a hash and the estimator is one aggregate. Used to put
    confidence intervals on corpus metrics (mean doc length, dedup
    rate) without assuming normality.

    Weights are deterministic (md5 60-bit draw per (id, replicate)
    against baked Poisson CDF thresholds — no rand(), reproducible
    across re-runs/partitionings). Returns one row per replicate:
    (replicate, n_eff, est) with est = sum(w*x)/sum(w) rounded 6 dp.

    Scale shape: the explode is a bounded n_replicates-times row
    multiplier feeding a partial-aggregated groupBy with n_replicates
    output rows; nothing is global except the final tiny aggregate. At
    petabyte scale you fold the replicate loop into one pass exactly
    like this — this IS the production shape.
    """
    reps = (df.select(F.col(id_col).alias("__id"),
                      F.col(value_col).cast("long").alias("__x"))
            .withColumn("__b", F.explode(
                F.sequence(F.lit(1), F.lit(n_replicates)))))
    u = hash_long(F.concat_ws("|", F.col("__id"), F.col("__b")), seed=seed)
    w = None
    for t in POISSON1_CDF_T60:
        term = (u >= F.lit(t)).cast("int")
        w = term if w is None else w + term
    return (reps.withColumn("__w", w)
            .groupBy(F.col("__b").alias("replicate"))
            .agg(F.sum("__w").alias("n_eff"),
                 F.round(F.sum(F.col("__w") * F.col("__x"))
                         / F.sum("__w"), 6).alias("est")))


def poisson_bootstrap_ci(df: DataFrame, id_col: str, value_col: str,
                         n_replicates: int = 40, seed: int = 7,
                         alpha: float = 0.05) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean of
    ``value_col``: order-statistic bounds over the Poisson replicate
    means (k_lo = floor(alpha/2 * B) + 1, k_hi = ceil((1-alpha/2) * B),
    computed in exact integer arithmetic driver-side). Output is a
    single row (n_replicates, point_est, ci_lo, ci_hi); the point
    estimate is the plain corpus mean. The order-statistic selection
    runs over the B-row replicate table — a window over B rows, not
    the corpus."""
    b = n_replicates
    k_lo = math.floor(alpha / 2 * b) + 1
    k_hi = math.ceil((1 - alpha / 2) * b)
    means = poisson_bootstrap_means(df, id_col, value_col, b, seed)
    w = Window.orderBy(F.col("est").asc(), F.col("replicate").asc())
    ranked = means.withColumn("__rn", F.row_number().over(w))
    lo = ranked.filter(F.col("__rn") == k_lo) \
               .select(F.col("est").alias("ci_lo"))
    hi = ranked.filter(F.col("__rn") == k_hi) \
               .select(F.col("est").alias("ci_hi"))
    point = df.agg(F.round(F.avg(F.col(value_col).cast("long")), 6)
                   .alias("point_est"))
    return (point.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
            .select(F.lit(b).cast("int").alias("n_replicates"),
                    "point_est", "ci_lo", "ci_hi"))


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Distributed EXACT global rank (1-based, dense over a total order)
    without the single-partition WindowExec a bare
    ``row_number() OVER (ORDER BY ...)`` plans.

    Range-partition on the order columns, per-partition local
    ``row_number``, then add each partition's cumulative row offset —
    the DataFrame form of ``zipWithIndex``. Only the per-partition
    COUNTS reach the driver (``num_partitions`` longs); rows never
    collapse to one task, so this is the 100 TB path for exact ranking.

    ``order_cols`` must be a total order (include a unique id as the
    final tiebreak); equal keys land in one range partition, so ranks
    are deterministic regardless of the sampled partition boundaries.
    """
    ranked, _ = _global_rank_with_total(df, order_cols, rank_col,
                                        num_partitions)
    return ranked


def _global_rank_with_total(df: DataFrame, order_cols: list[str],
                            rank_col: str,
                            num_partitions: int | None
                            ) -> tuple[DataFrame, int]:
    """Bucketing must be a DETERMINISTIC FUNCTION OF THE ROW, not of a
    sampled partitioner: ``repartitionByRange`` samples its boundaries
    per-execution (seeded by RDD id), and the offsets branch and the
    ranked branch of this plan each materialize their own exchange
    (column pruning defeats ReuseExchange) — observed as exact_ntile
    emitting n+1 buckets with run-to-run size drift. So buckets come
    from ``percentile_approx`` boundaries (a deterministic aggregate —
    same data, same sketch, same boundaries, on EVERY re-execution)
    via a monotone boundaries-below-value count; rows then shuffle
    ONCE (hash on bucket — the old path paid range + hash), local
    ``row_number`` per bucket, plus broadcast cumulative offsets from
    a P-row aggregate. Approximation affects only bucket BALANCE,
    never rank correctness. Nulls in the first order column land in
    bucket 0, matching ASC NULLS FIRST.

    The boundary column must be numeric; otherwise fall back to the
    single-partition window (correct, but the driver-sized-sort path —
    callers ranking by a string key should rank by a numeric digest).

    Because the bucketing is a pure function of the DATA, collecting
    the boundaries and per-bucket counts to the driver is safe (they
    are re-derivable facts, unlike the old partition-id counts) — and
    it keeps the consumer's plan a single linear pipeline: literal
    boundaries + literal offsets + one hash exchange on the bucket,
    instead of in-plan branches that re-derive the whole upstream
    lineage once per branch (observed tripling q173's join count).
    The two driver actions carry P-1 doubles and <=P longs.
    """
    from pyspark.sql.types import NumericType

    P = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    first = order_cols[0]
    if not isinstance(df.schema[first].dataType, NumericType):
        # correct but a SCALE CLIFF: every row rides one partition's
        # sort. Warn loudly so future callers ranking by a string key
        # notice and rank by a numeric digest (xxhash64) instead.
        import warnings
        warnings.warn(
            f"global_rank: order column {first!r} is non-numeric; "
            "falling back to a SINGLE-PARTITION window sort (driver-"
            "sized). Rank by a numeric digest for distributed ranking.",
            RuntimeWarning, stacklevel=3)
        total = df.count()
        w = Window.orderBy(*order_cols)
        return (df.withColumn(rank_col,
                              F.row_number().over(w).cast("long")),
                total)
    if P <= 1:
        # one bucket: no boundaries to sketch — percentile_approx with
        # an empty percentage list is an error, and the generic path
        # below degenerates to this exact plan anyway
        bounds = []
    else:
        qs = [i / P for i in range(1, P)]
        bounds = df.agg(F.percentile_approx(first, qs, 10_000)
                        .alias("__b")).first()["__b"]
        bounds = sorted(set(bounds or []))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b <= F.col(first)))
    else:
        pid = F.lit(0)
    parts = df.withColumn("__pid", pid)
    counts = {r["__pid"]: r["__c"] for r in
              parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
              .collect()}
    offsets, acc = {}, 0
    for p in range(len(bounds) + 1):
        offsets[p] = acc
        acc += counts.get(p, 0)
    off = F.element_at(
        F.array(*[F.lit(offsets[p]) for p in range(len(bounds) + 1)]),
        F.col("__pid") + 1)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (parts.withColumn(
        rank_col, (off + F.row_number().over(w)).cast("long"))
        .drop("__pid"))
    return ranked, acc


def exact_ntile(df: DataFrame, order_cols: list[str], n: int,
                bucket_col: str = "bucket",
                num_partitions: int | None = None) -> DataFrame:
    """Distributed exact NTILE(n) over a total order, computed from
    ``global_rank`` (deterministic range buckets + offsets) instead of
    a single-partition window. Exact complement to ``approx_ntile``
    (sketch boundaries, map-only assignment).

    Bucket arithmetic is SQL NTILE's EXACTLY: with N = q*n + rem, the
    FIRST ``rem`` buckets hold q+1 rows and the rest q. The tempting
    closed form ``floor((r-1)*n/N) + 1`` is NOT it — that spreads the
    remainder evenly through the buckets (N=150, n=4 gives sizes
    38/37/38/37 vs NTILE's 38/38/37/37; it happens to coincide when
    rem <= 1 or rem divides the prefix evenly, which is exactly why
    small hand-picked test sizes can miss the difference).
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    ranked, total = _global_rank_with_total(df, order_cols, "__r",
                                            num_partitions)
    q, rem = divmod(total, n)
    r = F.col("__r")
    if q == 0:
        bucket = r  # fewer rows than buckets: row r -> bucket r
    elif rem == 0:
        bucket = F.floor((r - 1) / q) + 1
    else:
        pivot = (q + 1) * rem  # rows 1..pivot fill the q+1-sized buckets
        bucket = (F.when(r <= pivot, F.floor((r - 1) / (q + 1)) + 1)
                  .otherwise(rem + F.floor((r - pivot - 1) / q) + 1))
    return (ranked.withColumn(bucket_col, bucket.cast("long"))
            .drop("__r"))


def negative_samples(df: DataFrame, id_col: str, k: int = 3,
                     seed: int = 42,
                     anchor_filter: Column | None = None) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-random OTHER rows drawn uniformly
    from the corpus — reproducibly (same corpus -> same negatives, no
    rand(), no partitioning dependence), the property resumable
    training-data builds need.

    Mechanics: ``global_rank`` densifies the id space to 1..N (range
    partition + offsets — no single-partition window); negative j of an
    anchor maps ``h = md5-hash(id:j:seed) mod (N-1)`` into 1..N-1 and
    bumps values >= the anchor's own rank by one — exactly uniform over
    the N-1 other rows, self-pairing impossible by construction. One
    equi-join on rank fetches each negative's id.

    Returns (anchor, neg_idx, negative). ``anchor_filter`` restricts
    which rows get negatives (the universe stays the full corpus).

    Scale shape: rank once (counts-only driver traffic), explode k per
    anchor, one shuffle join on rank — linear in N*k.
    """
    if k < 1:
        raise ValueError("negative_samples: k must be >= 1")
    ranked, total = _global_rank_with_total(
        df.select(id_col), [id_col], "__rank", None)
    if total < 2:
        raise ValueError("negative_samples: need >= 2 rows")
    anchors = ranked if anchor_filter is None else ranked.filter(anchor_filter)
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("anchor").cast("string"),
        F.col("neg_idx").cast("string"), F.lit(str(seed)))), 1, 15),
        16, 10).cast("long")
    exploded = (anchors
                .select(F.col(id_col).alias("anchor"), "__rank",
                        F.explode(F.sequence(F.lit(1), F.lit(k)))
                        .alias("neg_idx"))
                .withColumn("__n", F.lit(1) + F.pmod(h.cast("long"),
                                                     F.lit(total - 1)))
                .withColumn("__n", F.when(F.col("__n") >= F.col("__rank"),
                                          F.col("__n") + 1)
                            .otherwise(F.col("__n"))))
    negs = ranked.select(F.col(id_col).alias("negative"),
                         F.col("__rank").alias("__n"))
    return (exploded.join(negs, "__n")
            .select("anchor", "neg_idx", "negative"))


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    buckets: int = 256,
    laplace: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    hashed n-gram variant): score every NON-target doc by how
    target-like its token distribution is, so a raw crawl can be
    filtered toward a high-quality target domain without training a
    classifier.

    Token occurrences (not distinct tokens — DSIR models the unigram
    DISTRIBUTION) hash into ``buckets`` feature buckets; the target
    rows estimate p(bucket), the raw rows q(bucket), both
    Laplace-smoothed; a raw doc's score is its summed log importance
    ratio  Σ_tokens ln(p_b / q_b)  — high = target-like. Returns
    (id, n_tokens, score) for raw docs only.

    Shape: one explode + one (bucket, side) aggregate whose result is
    ``buckets`` rows — broadcast back onto the token stream — and one
    per-doc sum. Linear end to end; the model IS the tiny bucket
    table, so the same broadcast join scores any future corpus without
    touching the target again.
    """
    from league_of_legends_data_pipeline_spark.operators.text import tokens

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("__tgt"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("tok"))), 1, 15),
            16, 10).cast("long") % buckets
    ).alias("bucket")
    bt = toks.select("doc_id", "__tgt", bucket)
    dist = bt.groupBy("bucket").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("__q"))
    tot = dist.agg(F.sum("__p").alias("__tp"), F.sum("__q").alias("__tq"))
    ratio = (dist.crossJoin(F.broadcast(tot))
             .select("bucket", F.log(
                 ((F.col("__p") + laplace)
                  / (F.col("__tp") + laplace * buckets))
                 / ((F.col("__q") + laplace)
                    / (F.col("__tq") + laplace * buckets))).alias("__lr")))
    return (bt.filter(~F.col("__tgt"))
            .join(F.broadcast(ratio), "bucket")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("__lr"), 6).alias("score")))


def padding_efficiency(df: DataFrame, token_count_col: str | Column,
                       bucket_widths: list[int]) -> DataFrame:
    """Length-bucketed batching plan: assign every sequence to the
    smallest bucket width that holds it (longer sequences truncate to
    the largest bucket) and report, per bucket, the padding waste a
    fixed-shape training batch would pay — the infra-planning query
    behind choosing bucket boundaries before packing (q92's
    ``pack_sequences`` is the execution step; this is the sizing step).

    Returns (bucket_width, n_seqs, real_tokens, padded_tokens,
    waste_ratio): real = sum of min(len, width), padded = n * width,
    waste = 1 - real/padded. Pure CASE-ladder projection + one groupBy
    over len(bucket_widths) groups — map-side combinable, linear.
    """
    widths = sorted(set(bucket_widths))
    if not widths or widths[0] <= 0:
        raise ValueError("bucket_widths must be positive")
    tc = (F.col(token_count_col) if isinstance(token_count_col, str)
          else token_count_col)
    bucket = F.lit(widths[-1])
    for w in reversed(widths[:-1]):
        bucket = F.when(tc <= w, w).otherwise(bucket)
    kept = F.least(tc, F.lit(widths[-1]))
    return (df.select(bucket.cast("long").alias("bucket_width"),
                      kept.alias("__kept"))
            .groupBy("bucket_width")
            .agg(F.count(F.lit(1)).alias("n_seqs"),
                 F.sum("__kept").cast("long").alias("real_tokens"))
            .withColumn("padded_tokens",
                        (F.col("n_seqs") * F.col("bucket_width"))
                        .cast("long"))
            .withColumn("waste_ratio",
                        F.round(F.lit(1.0) - F.col("real_tokens")
                                / F.col("padded_tokens"), 6)))
