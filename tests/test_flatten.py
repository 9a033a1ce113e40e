"""Unit tests for the schema-driven flatten family (SURVEY P1-P4).

The oracle is a pure-Python re-statement of the reference's semantics
(Utils/json.py:3-33): same `_` path joining, list-index segments, and
substring blacklist — computed on plain dicts, compared against the Spark
column-expression flatten.
"""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def df_from_json(spark, *objs):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(o) for o in objs]))

from league_of_legends_data_pipeline_spark.functions.flatten import (
    DEFAULT_BLACKLIST, flatten, pivot_perks, splat_structs, strip_prefixes,
)


def py_flatten(nested, blacklist=DEFAULT_BLACKLIST, sep="_"):
    """Dict-level oracle with the reference's flatten semantics."""
    out = {}

    def walk(node, name):
        if any(b in name for b in blacklist):
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{name}{sep}{k}" if name else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{name}{sep}{i}" if name else str(i))
        else:
            if name not in out:  # first-wins
                out[name] = node
    walk(nested, "")
    return out


NESTED = {
    "a": 1,
    "b": {"c": 2, "d": {"e": 3}},
    "SWARM_field": 99,               # top-level blacklist hit
    "f": {"playerAugment2": 4, "g": 5},  # nested blacklist hit
    "challenges": {"kda": 2.5},
}


def test_flatten_matches_python_oracle(spark):
    df = df_from_json(spark, NESTED)
    got = flatten(df).collect()[0].asDict()
    want = py_flatten(NESTED)
    assert got == want
    assert "SWARM_field" not in got and "f_playerAugment2" not in got
    assert got["b_d_e"] == 3 and got["challenges_kda"] == 2.5


def test_flatten_array_positional(spark):
    data = {"xs": [{"v": 1}, {"v": 2}, {"v": 3}]}
    df = df_from_json(spark, data)
    got = flatten(df, max_array=3).collect()[0].asDict()
    assert got == py_flatten(data)
    assert got["xs_0_v"] == 1 and got["xs_2_v"] == 3


def test_flatten_is_pure_projection(spark):
    """No shuffle, no UDF: the optimized plan is a single Project."""
    df = df_from_json(spark, NESTED)
    plan = flatten(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan


def test_name_collision_first_wins(spark):
    # a.b_c and a_b.c both flatten to a_b_c; first field in schema order wins
    df = spark.createDataFrame(
        [Row(**{"a": Row(b_c=1), "a_b": Row(c=2)})])
    got = flatten(df).collect()[0].asDict()
    assert got == {"a_b_c": 1}


def test_splat_structs(spark):
    df = spark.createDataFrame([Row(id=1, s=Row(x=10, y=20), t=Row(y=99, z=30))])
    got = splat_structs(df, "s", "t").collect()[0].asDict()
    assert got == {"id": 1, "x": 10, "y": 20, "z": 30}  # t.y clash dropped


def test_strip_prefixes(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], ["kills", "challenges_kills", "challenges_kda", "missions_score"])
    out = strip_prefixes(df)
    # challenges_kills collides with existing kills → keeps original name
    assert out.columns == ["kills", "challenges_kills", "kda", "score"]


def test_pivot_perks(spark):
    perks = {
        "statPerks": {"defense": 5001, "flex": 5008, "offense": 5005},
        "styles": [
            {"style": 8000, "selections": [
                {"perk": 8005 + i, "var1": i, "var2": 2 * i, "var3": 3 * i}
                for i in range(4)]},
            {"style": 8300, "selections": [
                {"perk": 8345, "var1": 9, "var2": 8, "var3": 7},
                {"perk": 8347, "var1": 6, "var2": 5, "var3": 4}]},
        ],
    }
    df = df_from_json(spark, {"perks": perks})
    got = df.select(*pivot_perks(F.col("perks"))).collect()[0].asDict()
    assert got["statPerks_defense"] == 5001
    assert got["Primary_style"] == 8000
    assert got["Primary_slot_1_perk"] == 8005
    assert got["Primary_slot_4_var3"] == 9
    assert got["Secondary_slot_2_perk"] == 8347
    assert len(got) == 3 + 1 + 16 + 1 + 8


def test_schema_drift_report_and_quarantine(spark):
    """SURVEY §7 hard part 1: drift between inferred bronze and declared
    silver is reported at leaf-path granularity; conform() casts drifted
    types, null-pads missing fields, and quarantines unknown columns as
    JSON instead of mutating the table schema."""
    import json

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from league_of_legends_data_pipeline_spark.functions.drift import (
        conform, schema_drift,
    )

    declared = StructType([
        StructField("id", LongType()),
        StructField("score", DoubleType()),
        StructField("name", StringType()),
    ])
    observed = spark.createDataFrame(
        [(1, 5, "a", "x1", 9.9)],
        ["id", "score", "surprise", "another_new", "renamed_name"],
    ).drop("renamed_name").withColumnRenamed("another_new", "extra2")

    report = schema_drift(observed.schema, declared)
    assert "surprise" in report["added"] and "extra2" in report["added"]
    assert report["missing"] == ["name"]
    assert report["changed"] == ["score: bigint -> double"] or \
        report["changed"] == ["score: double -> bigint"]

    out = conform(observed, declared)
    assert [f.name for f in out.schema.fields] == \
        ["id", "score", "name", "_quarantine"]
    row = out.collect()[0]
    assert row["score"] == 5.0 and row["name"] is None
    assert json.loads(row["_quarantine"]) == {"surprise": "a", "extra2": "x1"}
