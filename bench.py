"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes through a noop sink (full plan runs, nothing collected
to the driver — measures engine time, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES
    from league_of_legends_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session startup; the mapInPandas no-op pre-spawns the
    # Python/Arrow worker pool (one per core — measured ~6s of first-UDF
    # startup otherwise billed to whichever pandas query runs first)
    spark.range(1).collect()
    (spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
     .mapInPandas(lambda it: it, "id long")
     .write.format("noop").mode("overwrite").save())

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "declared_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
