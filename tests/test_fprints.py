"""Rewrite-aware rotation fingerprints (round-11 verdict item #1).

The driver-window rotation must treat a query whose source changed since
its last green driver row like a never-verified query.  These tests pin
the chunk-extraction semantics and the rotation's changed-bucket ordering.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from scripts.fprints import current_fingerprints, extract_chunks, fingerprint_chunks

_SYNTH = '''\
import x

@_register(
    "q01_alpha",
    """SELECT 1 AS one""",
    doc="first",
)
def q01_alpha(spark, sf_dir):
    return spark.range(1)


def _helper():
    return 7


@_register(
    "q02_beta",
    None,
)
def q02_beta(spark, sf_dir):
    return spark.range(2)
'''


def test_extract_chunks_names_and_boundaries():
    chunks = extract_chunks(_SYNTH)
    assert set(chunks) == {"q01_alpha", "q02_beta"}
    # q01's chunk runs to the next @_register — it absorbs the helper
    # (over-approximation documented in scripts/fprints.py).
    assert "SELECT 1 AS one" in chunks["q01_alpha"]
    assert "_helper" in chunks["q01_alpha"]
    assert "_helper" not in chunks["q02_beta"]
    assert chunks["q02_beta"].startswith("@_register(")


def test_fingerprint_changes_only_for_edited_chunk():
    base = fingerprint_chunks(_SYNTH)
    edited = fingerprint_chunks(_SYNTH.replace("spark.range(2)", "spark.range(3)"))
    assert edited["q01_alpha"] == base["q01_alpha"]
    assert edited["q02_beta"] != base["q02_beta"]
    # Editing the ORACLE SQL (inside the decorator) also changes the print.
    sql_edit = fingerprint_chunks(_SYNTH.replace("1 AS one", "2 AS one"))
    assert sql_edit["q01_alpha"] != base["q01_alpha"]


_SYNTH_OPS = '''\
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators._util import xhash

_SEED = 42


def _pairs(arr):
    return xhash(arr, _SEED)


def scores(df):
    return _pairs(df)


def unrelated(df):
    return df
'''

_SYNTH_UTIL = '''\
def xhash(arr, seed):
    return arr
'''

_SYNTH_Q = '''\
@_register(
    "q01_alpha",
    None,
)
def q01_alpha(spark, sf_dir):
    from league_of_legends_data_pipeline_spark.operators.text import scores
    return scores(spark.range(1))


@_register(
    "q02_beta",
    None,
)
def q02_beta(spark, sf_dir):
    from league_of_legends_data_pipeline_spark.operators.text import unrelated
    return unrelated(spark.range(2))
'''


def _reader(mods):
    return lambda mod: mods.get(mod)


def test_operator_dep_edit_flips_only_importers():
    """r13 verdict item #1: an edit to an operator function (or a helper
    it reaches transitively, in its own module or one it imports) must
    flip the fingerprint of exactly the queries whose builders import a
    function that reaches it — not every importer of the module."""
    base_mods = {
        "league_of_legends_data_pipeline_spark.operators.text": _SYNTH_OPS,
        "league_of_legends_data_pipeline_spark.operators._util": _SYNTH_UTIL,
    }
    base = fingerprint_chunks(_SYNTH_Q, _reader(base_mods))
    # edit the transitive same-module helper _pairs: q01 (scores -> _pairs)
    # flips, q02 (unrelated) does not
    edit1 = dict(base_mods)
    edit1["league_of_legends_data_pipeline_spark.operators.text"] = \
        _SYNTH_OPS.replace("xhash(arr, _SEED)", "xhash(arr, _SEED + 1)")
    fp1 = fingerprint_chunks(_SYNTH_Q, _reader(edit1))
    assert fp1["q01_alpha"] != base["q01_alpha"]
    assert fp1["q02_beta"] == base["q02_beta"]
    # edit the CROSS-module dep (_util.xhash): q01 flips, q02 does not
    edit2 = dict(base_mods)
    edit2["league_of_legends_data_pipeline_spark.operators._util"] = \
        _SYNTH_UTIL.replace("return arr", "return arr  # changed")
    fp2 = fingerprint_chunks(_SYNTH_Q, _reader(edit2))
    assert fp2["q01_alpha"] != base["q01_alpha"]
    assert fp2["q02_beta"] == base["q02_beta"]
    # a module-level constant the helper references is part of the closure
    edit3 = dict(base_mods)
    edit3["league_of_legends_data_pipeline_spark.operators.text"] = \
        _SYNTH_OPS.replace("_SEED = 42", "_SEED = 43")
    fp3 = fingerprint_chunks(_SYNTH_Q, _reader(edit3))
    assert fp3["q01_alpha"] != base["q01_alpha"]
    assert fp3["q02_beta"] == base["q02_beta"]
    # an unresolvable dependency must not hash equal to a readable one
    fp4 = fingerprint_chunks(
        _SYNTH_Q,
        _reader({k: v for k, v in base_mods.items() if "_util" not in k}))
    assert fp4["q01_alpha"] != base["q01_alpha"]


def test_current_fingerprints_cover_registry():
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    cur = current_fingerprints(_REPO)
    missing = [n for n in QUERIES if n not in cur]
    assert missing == [], f"queries without a registration chunk: {missing}"


def test_recorded_fprints_are_subset_of_registry():
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    path = os.path.join(_REPO, "QUERY_FPRINTS.json")
    with open(path) as f:
        recorded = json.load(f)
    unknown = [n for n in recorded if n not in QUERIES]
    assert unknown == [], f"QUERY_FPRINTS.json names not in registry: {unknown}"


def test_changed_queries_front_the_export_order():
    """Every changed-since-green query must sort before every not-changed
    query that has a green row (the never-verified bucket may precede)."""
    entry = importlib.import_module("__spark_entry__")
    changed = entry._changed_since_green()
    order = entry._export_order()
    if not changed:
        return
    pos = {n: i for i, n in enumerate(order)}
    with open(os.path.join(_REPO, "QUERY_FPRINTS.json")) as f:
        has_green = set(json.load(f))
    worst_changed = max(pos[n] for n in changed)
    best_unchanged_green = min(
        pos[n] for n in has_green - changed if n in pos
    )
    assert worst_changed < best_unchanged_green
