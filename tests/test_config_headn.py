"""S9 config-source resolution ladder + L2 head-N truncation."""

import json
import os

import pytest
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.plans.etl import head_n
from league_of_legends_data_pipeline_spark.sources.config import (
    MissingParameter, get_parameter,
)


def test_config_resolution_ladder(spark, tmp_path, monkeypatch):
    pfile = str(tmp_path / "params.json")
    with open(pfile, "w") as f:
        json.dump({"API_KEY": "from-file", "EXPIRATION": "123"}, f)

    # file layer (lowest precedence)
    assert get_parameter(spark, "API_KEY", param_file=pfile) == "from-file"
    # env layer overrides file
    monkeypatch.setenv("LEAGUE_OF_LEGENDS_DATA_PIPELINE_API_KEY", "from-env")
    assert get_parameter(spark, "API_KEY", param_file=pfile) == "from-env"
    # spark.conf layer overrides both
    spark.conf.set("spark.league_of_legends_data_pipeline.api.key", "from-conf")
    try:
        assert get_parameter(spark, "API_KEY", param_file=pfile) == "from-conf"
    finally:
        spark.conf.unset("spark.league_of_legends_data_pipeline.api.key")
    # default, then hard failure
    assert get_parameter(spark, "NOPE", default="d") == "d"
    with pytest.raises(MissingParameter):
        get_parameter(spark, "NOPE")


def test_head_n_truncation(spark):
    rows = [(run, line, f"log line {line}")
            for run in ("run_a", "run_b") for line in range(1, 51)]
    df = spark.createDataFrame(rows, "run string, line_no int, msg string")
    out = head_n(df, "run", ["line_no"], n=10)
    got = out.groupBy("run").agg(
        F.count("*").alias("n"), F.max("line_no").alias("mx")).collect()
    assert sorted((r["run"], r["n"], r["mx"]) for r in got) == [
        ("run_a", 10, 10), ("run_b", 10, 10)]
    # the fallback cap (reference retries at 500) is just a smaller n
    assert head_n(df, "run", ["line_no"], n=5).count() == 10


def test_head_n_uses_window_group_limit(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("line_no"))
    plan = head_n(df, "g", ["line_no"], n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
