"""Robust time-series analysis over grouped daily panels: Theil–Sen trend
estimation and EWMA control charts. Both operate on the DAY-DIMENSION panel
that a grouped aggregate produces from the raw event stream — at 100 TB the
event scan is the only row-sized stage; everything downstream of the first
``groupBy(group, day)`` touches at most ``|groups| x |days|`` rows, so the
pairwise/self-referential work these estimators need is bounded by the
calendar, never by the corpus.

Theil–Sen (median of pairwise slopes) is the standard robust alternative to
OLS when the daily series carries outlier days (ingest spikes, outage
zeroes): breakdown point ~29 % vs OLS's 0 %. The pairwise stage is an
equi-join on the group key over the aggregated panel — D(D-1)/2 pairs per
group of a dimension-sized frame, NOT a corpus self-join.

EWMA (exponentially weighted moving average, Roberts 1959) is the classic
small-shift control chart: z_t = lam*x_t + (1-lam)*z_{t-1}, z_0 = series
mean, with time-varying limits mu +- L*sigma*sqrt(lam/(2-lam)*(1-(1-lam)^2t)).
The recursion is a sequential fold per group — expressed as ONE
``F.aggregate`` over the sorted per-group day array (codegen'd, no UDF, no
window-over-single-partition). Array length = |days| per group: bounded by
the calendar, safe to hold in one row at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def theil_sen_trend(daily: DataFrame, group_col: str, t_col: str,
                    value_col: str) -> DataFrame:
    """Per-group Theil–Sen slope/intercept (+ OLS slope for contrast).

    ``daily`` must already be aggregated to one row per (group, t) — the
    caller owns the corpus-sized reduction AND should ``localCheckpoint``
    the panel if that reduction is expensive: this operator fans the panel
    into three lineage branches (pair join, slope join, OLS), each of
    which re-runs an unmaterialized lineage. Slope = exact median over all
    D(D-1)/2 pairwise slopes; intercept = exact median of
    ``value - slope * t`` (the standard Theil–Sen intercept). Exact medians
    are fine here precisely because the input is dimension-sized.

    Returns one row per group: ``n_days, n_pairs, theil_slope, intercept,
    ols_slope`` (floats rounded 6 dp).
    """
    a = daily.select(F.col(group_col).alias("g"),
                     F.col(t_col).alias("ta"), F.col(value_col).alias("va"))
    b = daily.select(F.col(group_col).alias("g"),
                     F.col(t_col).alias("tb"), F.col(value_col).alias("vb"))
    # equi-join on the group key of an already-aggregated panel: pair count
    # is D^2 per group over |groups| x |days| rows — calendar-bounded, so
    # both the pair-join build side and the per-group slope row broadcast
    # unconditionally (size estimates above an un-materialized aggregate
    # otherwise inherit the corpus cardinality and flip to SMJ at high SF)
    pairs = (a.join(F.broadcast(b), "g").where(F.col("ta") < F.col("tb"))
             .select("g", ((F.col("vb") - F.col("va")) /
                           (F.col("tb") - F.col("ta"))).alias("slope")))
    slopes = pairs.groupBy("g").agg(
        F.median("slope").alias("theil_slope"),
        F.count(F.lit(1)).alias("n_pairs"))
    base = daily.select(F.col(group_col).alias("g"),
                        F.col(t_col).alias("t"), F.col(value_col).alias("v"))
    with_slope = base.join(F.broadcast(slopes), "g")
    return (with_slope.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.first("n_pairs").alias("n_pairs"),
                 F.round(F.first("theil_slope"), 6).alias("theil_slope"),
                 F.round(F.median(F.col("v") - F.col("theil_slope")
                                  * F.col("t")), 6).alias("intercept"),
                 F.round(F.regr_slope(F.col("v").cast("double"),
                                      F.col("t").cast("double")), 6)
                 .alias("ols_slope"))
            .withColumnRenamed("g", group_col))


def ewma_chart(daily: DataFrame, group_col: str, day_col: str,
               value_col: str, lam: float = 0.2,
               width: float = 3.0) -> DataFrame:
    """Per-group EWMA control chart over a daily panel.

    One row out per input row: ``group, day, value, ewma, ucl, lcl,
    breach``. The recursion folds left-to-right over the group's
    day-sorted array via ``F.aggregate`` — sequential by construction, so
    the float result is bit-identical under any partitioning (an oracle
    running the same recursion reproduces it exactly; both sides round
    once, at the edge). Limits use the population sigma of the group's
    daily series and the standard variance-inflation term
    ``1-(1-lam)^(2t)`` so early points get tighter bands.
    """
    # the panel is dimension-sized by contract, but its LINEAGE is the
    # caller's corpus aggregate and it fans out twice below (stats + fold
    # input) — materialize once so the corpus scan never re-runs
    daily = daily.localCheckpoint(eager=True)
    stats = daily.groupBy(F.col(group_col).alias("g")).agg(
        F.avg(value_col).alias("mu"),
        F.stddev_pop(value_col).alias("sigma"))
    packed = (daily.groupBy(F.col(group_col).alias("g"))
              .agg(F.sort_array(F.collect_list(F.struct(
                  F.col(day_col).alias("day"),
                  F.col(value_col).cast("double").alias("x")))).alias("s"))
              .join(stats, "g"))
    # fold: acc = struct(z, out[]); z starts at the series mean
    zero = F.struct(
        F.col("mu").alias("z"),
        F.expr("CAST(array() AS array<struct<day:string,x:double,"
               "z:double>>)").alias("out"))
    lam_c, om = F.lit(float(lam)), F.lit(1.0 - float(lam))
    folded = packed.select(
        "g", "mu", "sigma",
        F.aggregate(
            "s", zero,
            lambda acc, e: F.struct(
                (lam_c * e["x"] + om * acc["z"]).alias("z"),
                F.concat(acc["out"], F.array(F.struct(
                    e["day"].alias("day"), e["x"].alias("x"),
                    (lam_c * e["x"] + om * acc["z"]).alias("z"))))
                .alias("out"))).alias("acc"))
    rows = folded.select("g", "mu", "sigma",
                         F.explode(F.col("acc.out")).alias("r"))
    w = W.partitionBy("g").orderBy(F.col("r.day"))
    t = F.row_number().over(w)
    spread = (F.lit(float(width)) * F.col("sigma")
              * F.sqrt(lam_c / (F.lit(2.0) - lam_c)
                       * (F.lit(1.0) - F.pow(om, 2 * t))))
    ucl, lcl = F.col("mu") + spread, F.col("mu") - spread
    return (rows.select(
        F.col("g").alias(group_col), F.col("r.day").alias(day_col),
        F.col("r.x").alias(value_col),
        F.round(F.col("r.z"), 6).alias("ewma"),
        F.round(ucl, 6).alias("ucl"), F.round(lcl, 6).alias("lcl"),
        ((F.col("r.z") > ucl) | (F.col("r.z") < lcl)).cast("int")
        .alias("breach")))


def holt_linear(daily: DataFrame, group_col: str, day_col: str,
                value_col: str, alpha: float = 0.3,
                beta: float = 0.1) -> DataFrame:
    """Per-group Holt double exponential smoothing (level + trend) over a
    daily panel — the trend-aware extension of :func:`ewma_chart`, same
    fold machinery: the inherently sequential (l, b) recursion runs as
    ONE codegen'd ``F.aggregate`` over the group's day-sorted array.
    Seeded l_1 = x_1, b_1 = 0 so a single forward pass suffices (and an
    oracle can replay the recursion exactly).

    One row out per input row: ``group, day, value, level, trend`` (raw
    doubles — callers round at the edge).
    """
    daily = daily.localCheckpoint(eager=True)
    packed = daily.groupBy(F.col(group_col).alias("g")).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col(day_col).alias("day"),
            F.col(value_col).cast("double").alias("x")))).alias("s"))
    zero = F.struct(
        F.lit(0.0).alias("l"), F.lit(0.0).alias("b"),
        F.lit(0).alias("seeded"),
        F.expr("CAST(array() AS array<struct<day:string,x:double,"
               "l:double,b:double>>)").alias("out"))
    a_c, b_c = F.lit(float(alpha)), F.lit(float(beta))

    def step(acc, e):
        l_new = F.when(acc["seeded"] == 0, e["x"]).otherwise(
            a_c * e["x"] + (F.lit(1.0) - a_c) * (acc["l"] + acc["b"]))
        b_new = F.when(acc["seeded"] == 0, F.lit(0.0)).otherwise(
            b_c * (l_new - acc["l"]) + (F.lit(1.0) - b_c) * acc["b"])
        return F.struct(
            l_new.alias("l"), b_new.alias("b"), F.lit(1).alias("seeded"),
            F.concat(acc["out"], F.array(F.struct(
                e["day"].alias("day"), e["x"].alias("x"),
                l_new.alias("l"), b_new.alias("b")))).alias("out"))

    rows = packed.select(
        "g", F.explode(F.aggregate("s", zero, step)["out"]).alias("r"))
    return rows.select(
        F.col("g").alias(group_col), F.col("r.day").alias(day_col),
        F.col("r.x").alias(value_col),
        F.col("r.l").alias("level"), F.col("r.b").alias("trend"))


def holt_winters_additive(daily: DataFrame, group_col: str, day_col: str,
                          value_col: str, alpha: float = 0.3,
                          beta: float = 0.1, gamma: float = 0.2,
                          period: int = 7) -> DataFrame:
    """Per-group Holt-Winters ADDITIVE seasonal smoothing (level + trend
    + ``period`` seasonal states) over a daily panel — the seasonal
    completion of :func:`holt_linear`, same fold machinery: the
    inherently sequential recursion runs as ONE codegen'd
    ``F.aggregate`` over the group's day-sorted array (calendar-bounded
    state: 2 doubles + a ``period``-length seasonal ring, no UDF, no
    single-partition row window).

    Seeding (replayable by a SQL oracle): the first ``period`` values
    seed l = their left-associated mean, b = 0, s_i = x_i - l; output
    starts at row ``period + 1``. One row out per post-seed input row:
    ``group, day, value, level, trend, season, fitted`` where fitted is
    the one-step-ahead forecast made BEFORE seeing the row (l + b +
    s_{t-period} of the pre-update state) — raw doubles, callers round.
    Groups with fewer than ``period + 1`` rows emit nothing.
    """
    daily = daily.localCheckpoint(eager=True)
    packed = daily.groupBy(F.col(group_col).alias("g")).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col(day_col).alias("day"),
            F.col(value_col).cast("double").alias("x")))).alias("s"))
    p = int(period)
    zero = F.struct(
        F.lit(0).alias("t"),
        F.expr("CAST(array() AS array<double>)").alias("warm"),
        F.lit(0.0).alias("sum"),
        F.lit(0.0).alias("l"), F.lit(0.0).alias("b"),
        F.expr("CAST(array() AS array<double>)").alias("seas"),
        F.expr("CAST(array() AS array<struct<day:string,x:double,"
               "l:double,b:double,season:double,fitted:double>>)")
        .alias("out"))
    a_c = F.lit(float(alpha))
    b_c = F.lit(float(beta))
    g_c = F.lit(float(gamma))

    def step(acc, e):
        t = acc["t"] + 1
        # warm-up: accumulate the first `period` values (running sum is
        # left-associated, matching the oracle's explicit (..+x)/p chain)
        sum_new = acc["sum"] + e["x"]
        l_seed = sum_new / F.lit(float(p))
        seed_seas = F.transform(
            F.concat(acc["warm"], F.array(e["x"])),
            lambda w: w - l_seed)
        # steady state: s_old is the ring head (seasonal from t-period)
        s_old = F.element_at(acc["seas"], 1)
        l_new = (a_c * (e["x"] - s_old)
                 + (F.lit(1.0) - a_c) * (acc["l"] + acc["b"]))
        b_new = (b_c * (l_new - acc["l"])
                 + (F.lit(1.0) - b_c) * acc["b"])
        s_new = g_c * (e["x"] - l_new) + (F.lit(1.0) - g_c) * s_old
        fitted = acc["l"] + acc["b"] + s_old
        return F.struct(
            t.alias("t"),
            F.when(t < p, F.concat(acc["warm"], F.array(e["x"])))
            .otherwise(F.expr("CAST(array() AS array<double>)"))
            .alias("warm"),
            F.when(t <= p, sum_new).otherwise(acc["sum"]).alias("sum"),
            F.when(t < p, F.lit(0.0)).when(t == p, l_seed)
            .otherwise(l_new).alias("l"),
            F.when(t <= p, F.lit(0.0)).otherwise(b_new).alias("b"),
            F.when(t < p, F.expr("CAST(array() AS array<double>)"))
            .when(t == p, seed_seas)
            .otherwise(F.concat(F.slice(acc["seas"], 2, p - 1),
                                F.array(s_new))).alias("seas"),
            F.when(t <= p, acc["out"])
            .otherwise(F.concat(acc["out"], F.array(F.struct(
                e["day"].alias("day"), e["x"].alias("x"),
                l_new.alias("l"), b_new.alias("b"),
                s_new.alias("season"), fitted.alias("fitted")))))
            .alias("out"))

    rows = packed.select(
        "g", F.explode(F.aggregate("s", zero, step)["out"]).alias("r"))
    return rows.select(
        F.col("g").alias(group_col), F.col("r.day").alias(day_col),
        F.col("r.x").alias(value_col),
        F.col("r.l").alias("level"), F.col("r.b").alias("trend"),
        F.col("r.season").alias("season"),
        F.col("r.fitted").alias("fitted"))
