"""Micro-probes for the fixed per-query costs of the bench methodology
(guide §1: decide whether the suite is compute-bound or overhead-bound at
sf0.1 before touching any operator).

Times, steady-state (median of K):
  1. noop write of spark.range(1)                -> action floor
  2. load_tables() of 1 / 10 tables              -> per-query table setup
  3. scan+count-style agg of lineitem            -> 1-exchange floor
  4. agg + final orderBy                         -> range-exchange delta
  5. agg + coalesce(1).sortWithinPartitions      -> alternative sort cost
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.session import get_spark, load_tables

K = 7


def t(fn, k=K):
    xs = []
    for _ in range(k):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return f"med={statistics.median(xs)*1000:7.1f}ms  min={min(xs)*1000:7.1f}ms  first={xs[0]*1000:7.1f}ms"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("overhead_probe")
    spark.range(1).collect()

    print("1. range(1) noop        ", t(lambda: noop(spark.range(1))))
    print("2a. load_tables 1 table ", t(lambda: load_tables(spark, sf_dir, ["region"])))
    print("2b. load_tables 10 tbls ", t(lambda: load_tables(spark, sf_dir)))
    print("2c. read.parquet only   ", t(lambda: spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))))

    def agg():
        li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
        noop(li.groupBy("l_returnflag", "l_linestatus").agg(F.sum("l_quantity").alias("s")))

    def agg_orderby():
        li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
        noop(li.groupBy("l_returnflag", "l_linestatus").agg(F.sum("l_quantity").alias("s"))
             .orderBy("l_returnflag", "l_linestatus"))

    def agg_coalesce_sort():
        li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
        noop(li.groupBy("l_returnflag", "l_linestatus").agg(F.sum("l_quantity").alias("s"))
             .coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus"))

    print("3. groupBy agg noop     ", t(agg))
    print("4. agg + orderBy        ", t(agg_orderby))
    print("5. agg + coalesce sort  ", t(agg_coalesce_sort))

    # medium result: window dedup (q10-like), 15k output rows
    def win_orderby():
        o = load_tables(spark, sf_dir, ["orders"])["orders"]
        from pyspark.sql import Window as W
        w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        noop(o.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
             .select("o_custkey", "o_orderkey", "o_orderdate").orderBy("o_custkey"))

    def win_coalesce_sort():
        o = load_tables(spark, sf_dir, ["orders"])["orders"]
        from pyspark.sql import Window as W
        w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        noop(o.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
             .select("o_custkey", "o_orderkey", "o_orderdate")
             .coalesce(1).sortWithinPartitions("o_custkey"))

    print("6. window + orderBy     ", t(win_orderby))
    print("7. window + coalesce/swp", t(win_coalesce_sort))


if __name__ == "__main__":
    main()
