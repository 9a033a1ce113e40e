"""Streaming-mergeable sketches: HyperLogLog cardinality and Count-Min
frequency — the fixed-memory summaries a 100 TB profiling pass is built
from (per-partition distinct counts, vocabulary heavy hitters, join-key
cardinality estimates feeding broadcast decisions).

Why not ``approx_count_distinct``: Spark's HLL++ and any other engine's
HLL use different hash functions and bias tables, so their estimates are
not comparable — unusable when the estimate must be reproducible across
engines (regression-pinned profiles, A/B'd pipelines) or checked by an
oracle. These sketches use the repo's portable md5-based 60-bit hash
(operators/dedup.py::portable_hash64), so the register/bucket tables —
and therefore the estimates — are BIT-IDENTICAL in any engine with md5:
the DuckDB oracles replay them exactly.

Engine-exactness details (the conventions hard-won in rounds 2–5):

- Register sums are INTEGER: the HLL denominator sum(2^-M_j) is summed
  as ``2^(RHO_MAX - M_j)`` longs (max 64 * 2^54 < 2^61), because a
  float sum of mixed-magnitude powers of two rounds differently under
  different summation orders. The single float division happens once,
  on identical integers, in both engines.
- ``rho`` (leading-zero rank) comes from binary-digit count —
  ``length(conv(w, 10, 2))`` / ``length(bin(w))`` — which is exact
  integer math; ``floor(log2())`` can flip a ulp at powers of two.
- The only transcendental is linear counting's ``ln(m/V)`` on small
  cardinalities, rounded to 4 dp (1-ulp engine differences flip a 4 dp
  rounding only within ~1e-17 of a boundary).

No reference parity: the reference has no profiling surface; this module
is beyond-reference LLM-pipeline surface (BASELINE.json north star).

Scale shape: both sketches are partial-aggregated groupBys whose OUTPUT
size is fixed by the sketch geometry (m registers / d*w buckets), not
the data — the classic sketch contract. Shuffles carry (group, register,
small-int) rows; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators.dedup import (
    portable_hash64,
)

# p=6: m=64 registers. Small enough that a per-group sketch row set is
# negligible, accurate to ~1.04/sqrt(64) = 13% — the profiling tier.
# RHO_MAX = (60 - p) + 1: the hash contributes 54 bits after the
# register index, so rho ranges 1..55.
HLL_P = 6
HLL_M = 1 << HLL_P
HLL_RHO_MAX = 60 - HLL_P + 1
# alpha_64 = 0.7213/(1 + 1.079/64) to 4 dp, baked as ONE shared decimal
# literal (both engines multiply the same double; deriving it at runtime
# would reintroduce the division)
HLL_ALPHA_64 = 0.7090


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str,
                  seed: int = 42) -> DataFrame:
    """HLL register table: (group_cols..., j, mj) — register index and
    max leading-zero rank. Fixed ≤64 rows per group; mergeable by
    further ``max`` (union register tables, groupBy, max — the sketch
    union used for incremental/streaming profiles)."""
    h = portable_hash64(
        F.concat(F.lit(f"hll{seed}:"), F.col(value_col).cast("string")))
    # high 54 bits via shift — h/64 in float would round above 2^53
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.conv(w, 10, 2)))
    return (df.filter(F.col(value_col).isNotNull())
            .select(*group_cols, (h % HLL_M).alias("j"), rho.alias("rho"))
            .groupBy(*group_cols, "j").agg(F.max("rho").alias("mj")))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from a register table:
    (group_cols..., estimate, n_empty). Standard HLL: harmonic-mean raw
    estimate, linear counting below 2.5·m when registers are empty."""
    two_pow_max = 1 << HLL_RHO_MAX
    agg = registers.groupBy(*group_cols).agg(
        (F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - mj)"))
         + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(two_pow_max)
         ).alias("__sint"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("n_empty"))
    raw = (F.lit(HLL_ALPHA_64 * HLL_M * HLL_M) * F.lit(float(two_pow_max))
           / F.col("__sint"))
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("n_empty"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (F.col("n_empty") > 0), lc) \
        .otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("estimate"),
                      "n_empty")


def cms_table(df: DataFrame, token_col: str, depth: int = 4,
              width: int = 1024, seed: int = 42) -> DataFrame:
    """Count-Min sketch table over a token column: (row, bucket, cnt),
    ≤ depth·width rows regardless of corpus size. Each token occurrence
    increments one bucket per hash row; ``cnt`` sums are exact longs, so
    tables from different corpus slices merge by groupBy-sum."""
    rows = F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 (portable_hash64(F.concat(F.lit(f"cms{seed}:{i}:"),
                                           F.col(token_col)))
                  % width).alias("bucket"))
        for i in range(depth)]))
    return (df.filter(F.col(token_col).isNotNull())
            .select(rows.alias("__rb"))
            .groupBy(F.col("__rb.row").alias("row"),
                     F.col("__rb.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(table: DataFrame, queries: DataFrame, token_col: str,
               depth: int = 4, width: int = 1024,
               seed: int = 42) -> DataFrame:
    """Point estimates for query tokens against a CMS table:
    (token, estimate). estimate = min over hash rows of the bucket count
    (never under the true count — the CMS guarantee the q148 harness
    asserts). The table is broadcast: it is ≤ depth·width rows by
    construction, so the probe side never shuffles."""
    probes = queries.select(
        F.col(token_col).alias("token"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     (portable_hash64(F.concat(F.lit(f"cms{seed}:{i}:"),
                                               F.col(token_col)))
                      % width).alias("bucket"))
            for i in range(depth)])).alias("__rb")) \
        .select("token", F.col("__rb.row").alias("row"),
                F.col("__rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(table), ["row", "bucket"], "left") \
        .select("token", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy("token").agg(F.min("cnt").alias("estimate"))


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton/Z-order key interleaving the low ``bits`` of two integer
    columns — the multi-dimensional data-layout lever: range-partition +
    sort by this key and BOTH dimensions become clustered, so min/max
    file statistics prune scans on either predicate (the Delta/Iceberg
    OPTIMIZE ZORDER BY layout, as a pure Column expression).

    Pure bit arithmetic (shift/and/or), identical in any engine with
    64-bit integers; bit b of x lands at position 2b, of y at 2b+1.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xc.cast("long"), b).bitwiseAND(F.lit(1)),
                        2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yc.cast("long"), b).bitwiseAND(F.lit(1)),
                        2 * b + 1))
    return z


def zorder_repartition(df: DataFrame, x: str, y: str, num_partitions: int,
                       bits: int = 16) -> DataFrame:
    """Lay ``df`` out in Z-order over (x, y): range-partition by the
    interleaved key, sort within partitions. Files written from the
    result carry tight min/max stats on BOTH columns — the layout a
    100 TB table needs for two-dimensional partition pruning (e.g.
    (user_id, event_time) point-lookups AND time-range scans against
    the same copy of the data)."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits))
    return (keyed.repartitionByRange(num_partitions, "__z")
            .sortWithinPartitions("__z").drop("__z"))


def kmv_bottom_k(df: DataFrame, hash_col: Column | str,
                 k: int = 256) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch: one row holding the
    ``k`` smallest DISTINCT 60-bit hashes of the column, sorted
    ascending. The classic mergeable distinct-value summary (Bar-Yossef
    et al.): union two sketches by merging arrays and re-taking the
    bottom k; estimate |A| as (k-1) * 2^60 / kth_min.

    Scale shape: ``dropDuplicates`` partial-aggregates map-side, the
    bottom-k is a ``TakeOrdered`` (per-partition heap of k, then a
    k-sized merge on one reducer) — no full sort, no unbounded
    collect_list; the output is a single k-sized array row regardless
    of corpus size."""
    col = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    top = df.select(col.alias("h")).dropDuplicates(["h"]) \
            .orderBy("h").limit(k)
    return top.agg(F.array_sort(F.collect_list("h")).alias("kmv"))


def kmv_overlap_estimate(left: DataFrame, right: DataFrame,
                         hash_col: str, k: int = 256) -> DataFrame:
    """Cross-corpus overlap ESTIMATE from two KMV sketches — the
    planning query that decides whether the expensive cross-corpus
    near-dup pass (minhash_lsh_pairs_bipartite) is worth running, at
    the cost of two TakeOrdered scans instead of any join.

    Estimator: with S = bottom-k of A∪B (= bottom-k of the merged
    sketches), est_jaccard = |S ∩ kmv(A) ∩ kmv(B)| / |S| — exact set
    arithmetic on three k-sized arrays, so the result is bit-identical
    in any engine with the same hashes (membership of an x ∈ S in A
    implies x ∈ kmv(A): the kth order statistic of the union is <= the
    kth of A). Output also carries each side's sketch cardinality
    estimate. All math on longs; the two divisions are rounded to 6 dp
    at the end."""
    ka = kmv_bottom_k(left, hash_col, k).select(F.col("kmv").alias("ka"))
    kb = kmv_bottom_k(right, hash_col, k).select(F.col("kmv").alias("kb"))
    both = ka.crossJoin(F.broadcast(kb))     # two 1-row frames
    union_k = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    shared = F.array_intersect(union_k,
                               F.array_intersect("ka", "kb"))
    kth = F.element_at(F.col("s"), F.size("s"))

    def card_est(arr):
        # (n-1) * 2^60 / max(arr): standard KMV cardinality estimator,
        # exact when the corpus has < k distinct values (arr holds all)
        n = F.size(arr)
        return F.round(
            F.when(n < k, n.cast("double"))
            .otherwise((n.cast("double") - 1) * F.lit(float(2 ** 60))
                       / F.element_at(arr, n).cast("double")), 4)

    return (both.select(
        F.lit(k).cast("int").alias("k"),
        union_k.alias("s"), F.col("ka"), F.col("kb"),
        shared.alias("shared"))
        .select(
            "k",
            F.size("s").cast("long").alias("union_sketch_size"),
            F.size("shared").cast("long").alias("shared_in_sketch"),
            F.round(F.size("shared").cast("double") / F.size("s"), 6)
            .alias("est_jaccard"),
            card_est(F.col("ka")).alias("est_card_a"),
            card_est(F.col("kb")).alias("est_card_b"),
            kth.alias("kth_min")))


def frequent_tokens(df: DataFrame, id_col: str, text_col: str,
                    threshold: int, num_buckets: int = 32) -> DataFrame:
    """Distributed exact heavy hitters: every token with global count
    >= ``threshold``, found without ever shuffling the full token
    stream into one global aggregate of the whole vocabulary.

    Two-phase frequent-items (the exact, provably-lossless cousin of
    SpaceSaving/Misra-Gries, per the classic distributed heavy-hitters
    pigeonhole): documents are assigned to ``num_buckets`` groups by id;
    phase 1 counts tokens per (bucket, token) — a partial aggregate whose
    map-side combine already collapses each partition's stream — and any
    token whose count in SOME bucket reaches ceil(threshold/num_buckets)
    becomes a candidate. Pigeonhole guarantee: if every bucket-local
    count were below that, the global count would be at most
    num_buckets * (ceil(T/B) - 1) <= T - 1 — so NO true heavy hitter is
    ever pruned (false positives are re-checked, false negatives are
    impossible). Phase 2 recounts ONLY candidate tokens exactly via a
    broadcast semi-join on the token stream.

    Output: one row per heavy hitter (token, cnt) plus the phase-1
    candidate-set size as a constant column (the pruning observability
    the round-7 ADVICE convention asks for: callers see how much the
    pigeonhole phase actually cut).

    100 TB shape: phase 1's shuffle key is (bucket, token) — vocabulary
    x buckets rows AFTER map-side combine, not the token stream; the
    candidate set (bounded by num_buckets * corpus_tokens / threshold
    by a counting argument) broadcasts; phase 2 shuffles only candidate
    tokens. No global all-token aggregate ever materializes on one key.
    """
    toks = df.select(
        (F.col(id_col) % num_buckets).alias("b"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    local_threshold = -(-threshold // num_buckets)  # ceil(T / B)
    candidates = (toks.groupBy("b", "tok").agg(F.count(F.lit(1)).alias("c"))
                  .filter(F.col("c") >= local_threshold)
                  .select("tok").distinct())
    exact = (toks.join(F.broadcast(candidates), "tok", "left_semi")
             .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") >= threshold))
    n_cand = candidates.agg(F.count(F.lit(1)).alias("n_candidates"))
    return exact.crossJoin(F.broadcast(n_cand))


def ddsketch_table(df: DataFrame, cents_col: Column | str,
                   group_cols: list[str] | None = None,
                   sub_buckets: int = 16) -> DataFrame:
    """DDSketch-style log-linear histogram over a positive INTEGER value
    column (prices in cents, byte sizes, token counts): bucket key =
    (octave, sub) where octave is the exact bit length of the value and
    sub splits each octave into ``sub_buckets`` linear cells — relative
    error bounded by 1/sub_buckets per octave (~6% at 16). Completes the
    profiling-sketch suite (HLL cardinality, CMS frequency, KMV overlap,
    and now quantiles), and like the others it is MERGEABLE: sketches of
    shards/partitions/days combine by summing counts on the bucket key,
    which is exactly a partial-aggregated ``groupBy`` — the property
    ``percentile_approx`` state does not give you across engines.

    Engine-exactness: the octave is binary-digit count (``length(bin)``,
    never ``floor(log2)``); the sub-cell division's divisor is the
    octave base 2^(b-1) — a power of two, so the float division is
    EXACT and the bucket assignment bit-identical in any engine.

    Scale shape: one groupBy whose output is bounded by the bucket
    geometry (≤ 64 * sub_buckets rows per group), not the data.
    """
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    keys = (group_cols or []) + ["octave", "sub"]
    keyed = (df.select(*(group_cols or []), c.cast("long").alias("__c"))
             .withColumn("octave", F.expr("cast(length(bin(__c)) as int)"))
             .withColumn("__base",
                         F.expr("shiftleft(cast(1 as bigint), octave - 1)"))
             .withColumn("sub", F.expr(
                 f"cast(floor((__c - __base) * {sub_buckets} / __base)"
                 " as int)")))
    return keyed.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def ddsketch_quantiles(sketch: DataFrame, qs: list[tuple[int, int]],
                       sub_buckets: int = 16) -> DataFrame:
    """Quantile estimates from a (merged) :func:`ddsketch_table`: for
    each quantile num/den, the representative value (integer midpoint of
    the bucket's [lo, hi) cell) of the first bucket, in (octave, sub)
    order, whose cumulative count reaches rank ceil(q*N). Quantile ranks
    are integer arithmetic — ``(num*N + den - 1) div den`` — never
    ``ceil(q * N)`` on a float product, which engines' decimal-vs-double
    literal folding can land on either side of an exact integer.

    The cumulative window runs over the bucket table (≤ 64*sub_buckets
    rows), not the data. Returns (q_num, q_den, est).
    """
    w = (Window.orderBy("octave", "sub")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (sketch.groupBy("octave", "sub")
           .agg(F.sum("cnt").alias("cnt"))
           .withColumn("cum", F.sum("cnt").over(w)))
    total = cum.agg(F.sum("cnt").alias("n"))

    base = F.expr("shiftleft(cast(1 as bigint), octave - 1)")
    lo = base + F.floor(F.col("sub") * base / sub_buckets)
    hi = base + F.floor((F.col("sub") + 1) * base / sub_buckets)
    rep = F.floor((lo + hi) / F.lit(2.0)).cast("long")

    out = None
    for num, den in qs:
        rank = F.expr(f"({num} * n + {den} - 1) div {den}")
        est = (cum.crossJoin(F.broadcast(total))
               .filter(F.col("cum") >= rank)
               .orderBy("octave", "sub").limit(1)
               .select(F.lit(num).cast("int").alias("q_num"),
                       F.lit(den).cast("int").alias("q_den"),
                       rep.alias("est")))
        out = est if out is None else out.unionByName(est)
    return out


def kmv_by_group(df: DataFrame, group_col: str, hash_col: str | Column,
                 k: int = 256) -> DataFrame:
    """One KMV (bottom-k) sketch PER GROUP — (group, kmv: array<long>)
    with each group's ``k`` smallest distinct hashes sorted ascending.
    The grouped form of :func:`kmv_bottom_k`: a per-source corpus
    summary small enough (k longs/group) to pairwise-compare every
    source against every other without touching the corpus again.

    Shape: distinct on (group, hash) partial-aggregates map-side, one
    row_number window partitioned BY GROUP (parallel across groups),
    and a k-bounded collect_list per group — output is #groups rows
    regardless of corpus size.
    """
    from pyspark.sql import Window

    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    w = Window.partitionBy("grp").orderBy("__h")
    return (df.select(F.col(group_col).alias("grp"), h.alias("__h"))
            .dropDuplicates(["grp", "__h"])
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy("grp")
            .agg(F.array_sort(F.collect_list("__h")).alias("kmv")))


def kmv_overlap_matrix(df: DataFrame, group_col: str,
                       hash_col: str | Column, k: int = 256) -> DataFrame:
    """Pairwise overlap-estimate matrix across ALL groups from their KMV
    sketches: (grp_a, grp_b, union_sketch_size, shared_in_sketch,
    est_jaccard) for every unordered group pair — the O(groups²·k)
    planning table that says WHICH source pairs deserve the expensive
    cross-corpus dedup pass, computed from one corpus scan.

    Estimator per pair (same as :func:`kmv_overlap_estimate`): with
    S = bottom-k of the merged sketches, est_jaccard = |S ∩ A ∩ B|/|S|
    — exact set arithmetic on k-sized long arrays, bit-identical in
    any engine sharing the hashes. The pair join is #groups × #groups
    over sketch rows only (the corpus is long gone).
    """
    sk = kmv_by_group(df, group_col, hash_col, k)
    a = sk.select(F.col("grp").alias("grp_a"), F.col("kmv").alias("ka"))
    b = sk.select(F.col("grp").alias("grp_b"), F.col("kmv").alias("kb"))
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
    union_k = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, k)
    shared = F.size(F.array_intersect(
        union_k, F.array_intersect("ka", "kb")))
    return pairs.select(
        "grp_a", "grp_b",
        F.size(union_k).cast("long").alias("union_sketch_size"),
        shared.cast("long").alias("shared_in_sketch"),
        F.round(shared / F.size(union_k), 6).alias("est_jaccard"))


def cms_inner_product(table_a: DataFrame, table_b: DataFrame) -> DataFrame:
    """Inner-product estimate from two Count-Min tables (AMS/CM: for
    each hash row, sum the bucketwise count products; take the min over
    rows) — the size-of-a-join estimator: with both tables built over
    the two sides' join keys, the estimate upper-bounds
    |A JOIN B| = Σ_k cnt_A(k)·cnt_B(k), never undercounting (same
    one-sided guarantee as CMS point estimates). With
    ``table_b = table_a`` this is the second frequency moment F2 — the
    SELF-join size, the planner statistic that decides whether a key
    is safe to join on at all.

    Both tables are ≤ depth·width rows by construction, so the whole
    estimate is a broadcast join over sketch rows: the corpora are
    long gone.
    """
    a = table_a.select("row", "bucket", F.col("cnt").alias("__ca"))
    b = table_b.select("row", "bucket", F.col("cnt").alias("__cb"))
    # LEFT join from table_a, not inner: a hash row whose non-zero cells
    # share no bucket with table_b still contributes its (zero) product
    # sum to the min — an inner join would silently drop it, loosening
    # the estimate, and would return an EMPTY frame for fully disjoint
    # key sets. The final coalesce keeps the 1-row contract (estimate 0)
    # even when table_a itself is empty.
    return (a.join(F.broadcast(b), ["row", "bucket"], "left")
            .groupBy("row")
            .agg(F.sum(F.col("__ca") * F.coalesce(F.col("__cb"), F.lit(0)))
                 .alias("__p"))
            .agg(F.coalesce(F.min("__p"), F.lit(0)).cast("long")
                 .alias("inner_product_estimate")))
