"""Temporal join operators Spark lacks as built-ins: as-of join and range
join, both implemented as compositions of DataFrame ops that scale.

The reference's data model implies both (SURVEY §2.5: "time-series analysis
of timeline_data naturally invites an as-of join — puuid frame at time t vs
rank") but never implements them; these are the Spark-first realizations.

Scale notes
-----------
- ``asof_join`` is the union-sort algorithm: tag both sides, one shuffle on
  the key, one window pass carrying the most recent right row forward. No
  cross product, no per-key collect; state per partition is one struct.
  At 100 TB this is a single sort-shuffle — the same cost as a sort-merge
  join, with skew handled by AQE.
- ``range_join`` avoids Spark's O(n*m) broadcast-nested-loop fallback for
  inequality joins by bucketing time into fixed-width buckets and expanding
  the probe side to the covering bucket range (a small constant factor),
  turning the theta join into an equi-join + residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    how: str = "left",
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the join key(s).

    Parameters
    ----------
    on: equality key column name(s) shared by both sides.
    right_cols: right columns to carry over (default: all non-key,
        non-ts columns). Carried inside one struct so a right row whose
        payload is NULL still matches.
    how: 'left' keeps unmatched left rows (right cols NULL); 'inner' drops.
    tolerance: optional Column (e.g. ``F.expr("INTERVAL 7 DAYS")``);
        matches older than ``left_ts - tolerance`` are nulled out.
    right_tiebreak: column ordering ties when several right rows share one
        timestamp — the greatest value wins (deterministic results).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    payload = F.struct(F.col(right_ts).alias("__matched_ts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("__tie"),
        payload.alias("__payload"),
    ).withColumn("__side", F.lit(0))

    l = left.select("*", F.col(left_ts).alias("__ts")) \
            .withColumn("__tie", F.lit(None).cast(r.schema["__tie"].dataType)) \
            .withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType)) \
            .withColumn("__side", F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at equal ts, so a right row
    # AT the left timestamp is visible (inclusive <=); among right ties the
    # greatest __tie sorts last and wins the `last()`.
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)
    out = u.withColumn("__match", matched).filter(F.col("__side") == 1)

    if tolerance is not None:
        out = out.withColumn(
            "__match",
            F.when(F.col("__match.__matched_ts") >= F.col("__ts").cast("timestamp") - tolerance,
                   F.col("__match")),
        )
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    for c in right_cols:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    out = out.withColumn("matched_ts", F.col("__match.__matched_ts"))
    return out.drop("__ts", "__tie", "__payload", "__side", "__match")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Equi-key join with a time-range predicate
    ``left_ts - lookback <= right_ts <= left_ts``, executed as a bucketed
    equi-join instead of a nested-loop theta join.

    Returns the joined rows (inner); aggregate downstream as needed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = bucket_seconds or max(lookback_seconds, 1)

    r = right.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(right_ts)) / w))
    # cover [left_ts - lookback, left_ts]; -1 guards sub-second truncation
    lo = F.floor((F.unix_timestamp(F.col(left_ts)) - F.lit(lookback_seconds)) / w) - 1
    hi = F.floor(F.unix_timestamp(F.col(left_ts)) / w)
    l = left.withColumn("__bucket", F.explode(F.sequence(lo, hi)))

    joined = l.join(r, keys + ["__bucket"]).drop("__bucket")
    return joined.filter(
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.make_interval(secs=F.lit(lookback_seconds)))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str | list[str],
    on_right: str | list[str] | None = None,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: semantically identical to
    ``left.join(right, keys, how)`` but a hot key's rows execute as
    ``num_salts`` parallel tasks instead of one straggler.

    The probe (left) side gets a deterministic per-row salt (hash of the
    whole row — stable across retries, unlike ``rand()``); the build
    (right) side is replicated once per salt value; the join key becomes
    (key, salt). Replication costs ``num_salts``x the build side's shuffle
    bytes — use when the build side is too big to broadcast but far
    smaller than the probe side, and AQE skew-join splitting isn't enough
    (one key so hot a single split still spills).

    Only ``inner`` and ``left`` joins are valid: for right/full joins an
    unmatched build row would surface once per salt.
    """
    lkeys = [on_left] if isinstance(on_left, str) else list(on_left)
    rkeys = lkeys if on_right is None else (
        [on_right] if isinstance(on_right, str) else list(on_right))
    if len(lkeys) != len(rkeys):
        raise ValueError("on_left and on_right must have the same arity")
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports only how='inner'|'left'")

    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(num_salts)))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    cond = [l["__salt"] == r["__salt"]] + [
        l[lc] == r[rc] for lc, rc in zip(lkeys, rkeys)]
    return l.join(r, cond, how).drop(l["__salt"]).drop(r["__salt"])


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Skew diagnostics for a join/agg key: the ``top_n`` hottest keys
    with their row share and skew ratio (key rows / mean rows-per-key).

    This is the measurement half of the salted_join story: at 100 TB you
    salt (or AQE-skew-split) the keys this report surfaces. Cost is one
    partial-aggregated groupBy on the key plus a global top-N
    (TakeOrderedAndProject — no full sort, no window over the corpus);
    the single-row totals frame is broadcast back onto the 10-row top
    list. Returns (rank, key, n, share_pct, skew_ratio), rank ordered by
    (n desc, key asc) for a total order.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")) \
        .agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(F.count(F.lit(1)).alias("__n_keys"),
                       F.sum("n").alias("__n_rows"))
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_n)
    w = W.orderBy(F.col("n").desc(), F.col("key").asc())
    return (top.crossJoin(F.broadcast(stats))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "key", "n",
                    F.round(F.col("n") * 100.0 / F.col("__n_rows"), 6)
                    .alias("share_pct"),
                    F.round(F.col("n") * F.col("__n_keys")
                            / F.col("__n_rows"), 6).alias("skew_ratio")))


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fingerprint_col: str,
) -> DataFrame:
    """Version-over-version dataset diff: per id, ``added`` / ``removed``
    / ``changed`` / ``unchanged`` by comparing a content fingerprint
    (digest, rolling hash, aHash — anything cheap and deterministic).

    The audit step between corpus versions: what did the refresh touch,
    and is the delta the size the pipeline expected? One full-outer
    equi-join on the id carrying only (id, fingerprint) — documents
    never move; at 100 TB both sides should be bucketed on the id so
    the join is exchange-free (sinks.write_bucketed). Returns
    (id, status).
    """
    o = old.select(F.col(id_col).alias("__id"),
                   F.col(fingerprint_col).alias("__fo"))
    n = new.select(F.col(id_col).alias("__id"),
                   F.col(fingerprint_col).alias("__fn"))
    return (
        o.join(n, "__id", "full_outer")
        .select(
            F.col("__id").alias(id_col),
            F.when(F.col("__fo").isNull(), F.lit("added"))
            .when(F.col("__fn").isNull(), F.lit("removed"))
            .when(F.col("__fo") == F.col("__fn"), F.lit("unchanged"))
            .otherwise(F.lit("changed")).alias("status"))
    )


def psi_drift(
    ref: DataFrame,
    new: DataFrame,
    features: list,
    smoothing: float = 1.0,
) -> DataFrame:
    """Population-Stability-Index drift report between a reference corpus
    version and a new one: per (feature, bin) the smoothed frequencies
    and PSI contribution, plus the feature-level PSI — the monitoring
    gate a continuously-refreshed training corpus runs before promoting
    a new version.

    ``features`` is a list of (name, bin_expr) pairs where bin_expr maps
    a row to an integer bin (both DataFrames must be able to evaluate
    it). PSI per feature = sum over bins of (p - q) * ln(p / q) with
    Laplace smoothing over the union bin-universe B (bins observed in
    either side): p = (n_ref + s) / (N_ref + s*B).

    Scale shape: each corpus pass is one map-only projection exploding F
    (feature, bin) pairs per row into a partial-aggregated count — the
    shuffle carries (feature, bin, count), never rows. Everything after
    operates on the features x bins count table (tiny at any scale); the
    windows run there, not on the corpus. The PSI sum adds 6dp integer
    micro-units, so the reported drift is summation-order-independent.
    """
    def side_counts(df: DataFrame, out: str) -> DataFrame:
        pairs = F.explode(F.array(*[
            F.struct(F.lit(name).alias("feature"),
                     bin_expr.cast("long").alias("bin"))
            for name, bin_expr in features
        ])).alias("__p")
        return (df.select(pairs)
                .select("__p.feature", "__p.bin")
                .groupBy("feature", "bin")
                .agg(F.count(F.lit(1)).alias(out)))

    r = side_counts(ref, "n_ref")
    n = side_counts(new, "n_new")
    joined = (r.join(n, ["feature", "bin"], "full_outer")
              .select("feature", "bin",
                      F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                      F.coalesce("n_new", F.lit(0)).alias("n_new")))
    wf = W.partitionBy("feature")
    s = float(smoothing)
    p = (F.col("n_ref") + s) / (F.col("__tot_ref") + s * F.col("__b"))
    q = (F.col("n_new") + s) / (F.col("__tot_new") + s * F.col("__b"))
    with_tot = (joined
                .withColumn("__b", F.count(F.lit(1)).over(wf))
                .withColumn("__tot_ref", F.sum("n_ref").over(wf))
                .withColumn("__tot_new", F.sum("n_new").over(wf))
                .withColumn("__contrib", (p - q) * F.log(p / q)))
    micro = F.round(F.col("__contrib") * 1_000_000).cast("long")
    return (with_tot
            .withColumn("contrib", F.round(F.col("__contrib"), 6))
            .withColumn("psi",
                        F.round(F.sum(micro).over(wf) / 1_000_000.0, 6))
            .select("feature", "bin", "n_ref", "n_new", "contrib", "psi"))


def decayed_group_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    t_ref: str,
    lam_per_day: float,
) -> DataFrame:
    """Exponential time-decay aggregation: per key, sum of
    value * exp(-lam * age_days) at reference time ``t_ref`` — the
    recency-weighted activity score used to weight users/sources when
    sampling fresh training data (and the batch dual of a streaming
    decayed counter).

    Map-only projection + one partial-aggregated groupBy — shuffles carry
    (key, micro-sum, count), never events. Per-event contributions round
    to 6dp integer micro-units before summing, so the score is
    summation-order-independent (and engine-exp-difference-tolerant: a
    1-ulp exp() divergence only matters if a contribution sits within
    1e-17 of a micro-unit boundary). Pass ``lam_per_day`` as a decimal
    literal you also write into any SQL dual — don't derive it from
    ln(2)/half_life at runtime, engines' ln() may differ by a ulp.

    Age is a timestamp DIFFERENCE (micros), so a session-timezone shift
    applies to both terms and cancels.
    """
    age_days = (F.unix_micros(F.lit(t_ref).cast("timestamp"))
                - F.unix_micros(F.col(ts_col))) / 86_400_000_000.0
    micro = F.round(F.col(value_col) * F.exp(-F.lit(lam_per_day) * age_days)
                    * 1_000_000).cast("long")
    return (df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(micro) / 1_000_000.0, 6).alias("decayed_sum")))


def cohort_retention(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Weekly cohort-retention matrix — the standard growth-analytics
    rollup: users are cohorted by the Monday of their first-seen week;
    for every (cohort, week offset) cell, the count of cohort members
    active that week and the retention ratio.

    Returns (cohort_week, week_offset, cohort_size, n_active,
    retention) with cohort_week as an ISO date string (engines render
    native dates differently; strings hash identically).

    Scale shape: one min-aggregate per user (first touch), one distinct
    over (user, week) — both partial-aggregating shuffles keyed by
    user — then a user-keyed equi-join of activity onto cohorts and a
    cells rollup. No windows, no self-joins; cells are
    cohorts x offsets, metadata-sized.
    """
    week = F.date_trunc("week", F.col(ts_col))
    first = (df.groupBy(F.col(user_col).alias("__u"))
             .agg(F.min(week).alias("__cw")))
    active = (df.select(F.col(user_col).alias("__u"),
                        week.alias("__aw")).distinct())
    cohort_sizes = first.groupBy("__cw").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    cells = (active.join(first, "__u")
             .groupBy("__cw", "__aw")
             .agg(F.count(F.lit(1)).alias("n_active"))
             .withColumn("week_offset",
                         (F.datediff(F.col("__aw"), F.col("__cw")) / 7)
                         .cast("long")))
    return (cells.join(cohort_sizes, "__cw")
            .select(F.date_format("__cw", "yyyy-MM-dd")
                    .alias("cohort_week"),
                    "week_offset", "cohort_size", "n_active",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


def ks_two_sample(df: DataFrame, value_col: str, group_col: str,
                  group_a: str, group_b: str,
                  critical_coeff: float = 1.358) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test — the
    distribution-shape complement to :func:`psi_drift` (PSI bins and
    weights; KS finds the single worst CDF gap, catching shifts PSI's
    coarse bins smear out): 1-row DataFrame with both sample sizes, the
    exact D statistic (sup |F_a - F_b|), the alpha-level critical value
    ``c * sqrt((n_a+n_b)/(n_a*n_b))`` (c = 1.358 for alpha = .05), and
    the drift verdict.

    Shape: one (value, group) count aggregate collapses the corpus to
    its DISTINCT VALUES, and the cumulative window runs over that
    distinct-value frame only — bounded by the value domain, not the
    row count (a billion rows over a 10k-point domain cost one
    aggregate plus a 10k-row window). D is evaluated at every distinct
    value, which is exactly the full KS supremum (the empirical CDF
    only steps there).
    """
    flagged = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).alias("__v"),
        (F.col(group_col) == group_a).cast("int").alias("__a"))
    per_value = flagged.groupBy("__v").agg(
        F.sum("__a").alias("__ca"),
        F.sum(F.lit(1) - F.col("__a")).alias("__cb"))
    cum = W.orderBy("__v").rowsBetween(W.unboundedPreceding, 0)
    tot = per_value.agg(F.sum("__ca").alias("__na"),
                        F.sum("__cb").alias("__nb"))
    stepped = (per_value
               .withColumn("__fa", F.sum("__ca").over(cum))
               .withColumn("__fb", F.sum("__cb").over(cum))
               .crossJoin(F.broadcast(tot)))
    return (stepped.agg(
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.round(F.max(F.abs(F.col("__fa") / F.col("__na")
                            - F.col("__fb") / F.col("__nb"))), 6)
        .alias("ks_d"))
        .withColumn("ks_crit",
                    F.round(critical_coeff
                            * F.sqrt((F.col("n_a") + F.col("n_b"))
                                     / (F.col("n_a") * F.col("n_b"))), 6))
        .withColumn("drift", F.col("ks_d") > F.col("ks_crit")))


def inter_arrival_stats(df: DataFrame, key_col: str, ts_col: str,
                        tiebreak_col: str,
                        min_gaps: int = 10) -> DataFrame:
    """Per-key inter-arrival burstiness — the bot/scraper signature
    scan (humans are bursty: B > 0; timers and rate-limited crawlers
    are regular: B < 0): gaps between consecutive events per key,
    summarized as mean, sample stddev, and the burstiness coefficient
    B = (sigma - mu)/(sigma + mu) (Goh & Barabasi 2008).

    Gap seconds are INTEGERS (epoch-second lag differences), so the
    moment sums are exact BIGINTs (order-free, engine-identical) and
    the one float division per key happens at the very end. One lag
    window partitioned by key + one grouped aggregate; keys below
    ``min_gaps`` gaps are dropped (their sigma is noise).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    sec = F.unix_timestamp(F.col(ts_col))
    gaps = (df.withColumn("__gap", sec - F.lag(sec).over(w))
            .filter(F.col("__gap").isNotNull()))
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("__gap").cast("long").alias("__s1"),
        F.sum(F.col("__gap") * F.col("__gap")).cast("long").alias("__s2"))
    n, s1, s2 = F.col("n_gaps"), F.col("__s1"), F.col("__s2")
    mu = s1 / n
    # s1 enters the cross term as DOUBLE (one rounding) — the identical
    # float path the SQL oracle takes, and no s1*s1 BIGINT overflow for
    # long-lived keys
    var = (s2 - s1.cast("double") * s1 / n) / (n - 1)
    sd = F.sqrt(var)
    return (agg.filter(n >= min_gaps)
            .select(key_col, "n_gaps",
                    F.round(mu, 6).alias("mean_gap_s"),
                    F.round(sd, 6).alias("sd_gap_s"),
                    F.round((sd - mu) / (sd + mu), 6).alias("burstiness")))
