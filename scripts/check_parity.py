"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same parquet tables, compares row count, column names, and an
order-insensitive value hash. Usage:

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float normalization: fixed precision repr
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sp_cols = df.columns
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sp_rows)} rows, {el:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dk_cols = [d[0] for d in res.description]
            dk_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sp_rows) != len(dk_rows):
            problems.append(f"rowcount {len(sp_rows)} vs {len(dk_rows)}")
        if sorted(sp_cols) != sorted(dk_cols):
            problems.append(f"cols {sorted(sp_cols)} vs {sorted(dk_cols)}")
        if not problems:
            h1, h2 = table_hash(sp_rows, sp_cols), table_hash(dk_rows, dk_cols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show a small diff
                order1 = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
                order2 = sorted(range(len(dk_cols)), key=lambda i: dk_cols[i])
                s1 = sorted("|".join(norm_value(r[i]) for i in order1) for r in sp_rows)
                s2 = sorted("|".join(norm_value(r[i]) for i in order2) for r in dk_rows)
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
        else:
            print(f"PASS {name} ({len(sp_rows)} rows, {el:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
