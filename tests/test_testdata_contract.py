"""Dtype contract for the driver-generated testdata.

The driver regenerates ``/root/testdata`` every round and its parquet
encoding has drifted twice already (round-1 TIMESTAMP(NANOS) read as
bigint under ``nanosAsLong``; round-3 ``timestamp[us]`` inferred as
TIMESTAMP_NTZ). Each drift surfaced as a handful of red oracle queries
and, in round 2, a crashed bench. This test turns the NEXT drift into one
obvious failure with an expected-vs-actual diff per column: it loads every
table through the engine's real load boundary (``session.load_tables``,
which owns the normalization) and asserts the post-normalization Spark
dtypes every downstream plan assumes.
"""

from __future__ import annotations

import os

import pytest

EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        # timestamp (instant), never timestamp_ntz: NTZ breaks
        # withWatermark and unix_micros downstream
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", SF_DIRS, ids=[os.path.basename(p) for p in SF_DIRS])
def test_testdata_dtypes(spark, sf):
    from league_of_legends_data_pipeline_spark.session import load_tables

    if not os.path.isdir(sf):
        pytest.skip(f"{sf} not generated this round")
    tables = load_tables(spark, sf)
    problems: list[str] = []
    for name, expected in EXPECTED_DTYPES.items():
        actual = dict(tables[name].dtypes)
        for col, want in expected.items():
            got = actual.pop(col, "<missing>")
            if got != want:
                problems.append(f"{name}.{col}: expected {want}, got {got}")
        for col, got in actual.items():
            problems.append(f"{name}.{col}: unexpected extra column ({got})")
    assert not problems, (
        "testdata dtype drift detected (driver regenerated the parquet with "
        "a new encoding?) — fix session.load_tables normalization:\n  "
        + "\n  ".join(problems)
    )


def test_testdata_row_sanity(spark):
    """Coarse row-count floor per table at sf0.001 — catches an empty or
    truncated regeneration that dtypes alone would miss."""
    from league_of_legends_data_pipeline_spark.session import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001")
    floors = {"region": 5, "nation": 25, "customer": 100, "orders": 1000,
              "lineitem": 5000, "events": 1000, "documents": 100,
              "embeddings": 100}
    for name, floor in floors.items():
        n = tables[name].count()
        assert n >= floor, f"{name}: {n} rows < expected floor {floor}"
