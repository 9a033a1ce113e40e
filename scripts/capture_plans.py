"""Capture .explain("formatted") for named queries into plans/r14/.

Usage:
    python scripts/capture_plans.py before q167_bigram_lm_scores q173_...
    python scripts/capture_plans.py after  q167_bigram_lm_scores

Writes plans/r14/<query>_<tag>.txt. Runs at sf0.1 (the bench SF) so the
AQE-facing stats match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES
    from league_of_legends_data_pipeline_spark.session import get_spark

    spark = get_spark("capture_plans")
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
