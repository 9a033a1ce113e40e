"""One-off incremental wrapper around scale_probe's machinery: times each
query at sf0.1 and the existing /tmp x50 replica, PRINTING per query so a
slow query cannot erase the fast ones' results (the batch run's 60-min
timeout did exactly that)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from league_of_legends_data_pipeline_spark.plans.queries import QUERIES
from league_of_legends_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
BIG = os.environ.get("PROBE50_BIG", "/tmp/spark_graft_scale_x50")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("probe50")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    def run(name, sf_dir):
        t0 = time.time()
        QUERIES[name].spark(spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 1)

    out = open("/tmp/probe50_results.txt", "a")

    def emit(msg):
        print(msg, flush=True)
        out.write(msg + "\n")
        out.flush()

    for name in names:
        b1 = run(name, BASE)
        b2 = run(name, BASE)
        base = min(b1, b2)
        emit(f"{name}: sf0.1 {base}s (runs {b1}/{b2})")
        g1 = run(name, BIG)
        emit(f"{name}: x50 run1 {g1}s factor "
             f"{round(g1 / max(base, 1e-9), 1)}")
        g2 = run(name, BIG)
        big = min(g1, g2)
        emit(f"{name}: x50 {big}s (runs {g1}/{g2}) "
             f"FACTOR {round(big / max(base, 1e-9), 1)}")


if __name__ == "__main__":
    main()
