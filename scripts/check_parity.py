"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, compares row count, column names, and an
order-insensitive value hash. Usage:

    python scripts/check_parity.py [sf_dir] [query ...]

Both sides are materialized through PANDAS (Spark ``.toPandas()``, DuckDB
``.df()``) and canonicalized driver-style — sort columns by name, then
``sort_values`` over all columns — because that is what the real harness
does. Round 2 proved the old ``fetchall()`` path has blind spots the driver
does not: a DuckDB HUGEINT output lands as float64 in pandas (q92 hash
drift), and an array-typed output column is unhashable in pandas'
``sort_values`` (q74 TypeError). Going through pandas makes those failures
reproduce locally first.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        # driver-style float normalization: fixed precision repr
        return f"{v:.9g}"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    return str(v)


def canon_lines(pdf):
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    every column (this is where unhashable cells — lists — blow up for the
    real harness too), then one normalized string per row."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return sorted("|".join(norm_value(v) for v in row)
                  for row in pdf.itertuples(index=False, name=None))


def table_hash(lines):
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


_INT_KINDS = "iu"
_FLOAT_KINDS = "f"


def dtype_drift(sp_pdf, dk_pdf):
    """Column-level int-vs-float kind mismatches: invisible to a value
    compare at .9g precision but visible to the driver's repr-based hash
    (q92: DuckDB HUGEINT -> float64 vs Spark int64)."""
    out = []
    for c in sorted(set(sp_pdf.columns) & set(dk_pdf.columns)):
        a, b = sp_pdf[c].dtype.kind, dk_pdf[c].dtype.kind
        if {a, b} == {"i", "f"} or {a, b} == {"u", "f"}:
            out.append(f"{c}: spark {sp_pdf[c].dtype} vs duck {dk_pdf[c].dtype}")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    import __spark_entry__ as entry

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # mirror the REAL driver: a plain session with none of the engine's
        # session-factory confs — queries must self-provision what they need
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "32g")
                 .appName("parity-check-vanilla").getOrCreate())
    else:
        from league_of_legends_data_pipeline_spark.session import get_spark
        spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    report = []  # (name, status, rows, secs) for --md
    write_md = os.environ.get("SPARK_GRAFT_PARITY_MD")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sp_pdf = df.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report.append((name, "FAIL(spark)", 0, 0.0))
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sp_pdf)} rows, {el:.1f}s) — no oracle")
            report.append((name, "rows-only", len(sp_pdf), el))
            continue
        try:
            dk_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            report.append((name, "FAIL(duckdb)", len(sp_pdf), el))
            continue
        problems = []
        if len(sp_pdf) != len(dk_pdf):
            problems.append(f"rowcount {len(sp_pdf)} vs {len(dk_pdf)}")
        if sorted(sp_pdf.columns) != sorted(dk_pdf.columns):
            problems.append(
                f"cols {sorted(sp_pdf.columns)} vs {sorted(dk_pdf.columns)}")
        if not problems:
            drift = dtype_drift(sp_pdf, dk_pdf)
            if drift:
                problems.append("int/float dtype drift (driver repr-hash "
                                "would mismatch): " + "; ".join(drift))
        if not problems:
            try:
                s1, s2 = canon_lines(sp_pdf), canon_lines(dk_pdf)
            except Exception as e:
                # the driver's canonicalization would crash the same way
                # (e.g. unhashable list cells in sort_values)
                problems.append(f"canonicalization error (driver would "
                                f"crash too): {type(e).__name__}: {e}")
                s1 = s2 = None
            if s1 is not None and table_hash(s1) != table_hash(s2):
                problems.append("value-hash mismatch")
                for a, b in zip(s1, s2):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            failures.append(name)
            report.append((name, "FAIL", len(sp_pdf), el))
        else:
            print(f"PASS {name} ({len(sp_pdf)} rows, {el:.1f}s)")
            report.append((name, "PASS", len(sp_pdf), el))

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if write_md and not only:
        n_pass = sum(1 for r in report if r[1] == "PASS")
        mode = "vanilla SparkSession (driver mirror)" \
            if os.environ.get("SPARK_GRAFT_VANILLA") else "engine session"
        with open(write_md, "w") as f:
            f.write(
                "# PARITY (local full-coverage run)\n\n"
                f"All declared queries vs their DuckDB oracles at `{sf_dir}`"
                f" on a {mode} — the driver's correctness gate checks a"
                " 50-query prefix per round; this is the same comparison"
                " (row count, column names, order-insensitive value hash)"
                " run over the FULL set. Regenerate:"
                " `SPARK_GRAFT_VANILLA=1 SPARK_GRAFT_PARITY_MD=PARITY_LOCAL.md"
                " python scripts/check_parity.py`.\n\n"
                f"**{n_pass}/{len(report)} PASS, {len(failures)} failures**\n\n"
                "| query | status | rows | sec |\n|---|---|---|---|\n")
            for name, status, rows, el in sorted(report):
                f.write(f"| {name} | {status} | {rows} | {el:.1f} |\n")
        print(f"wrote {write_md}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
