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
