#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT shipped engine code).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result) and replays
<verifyOutDir>/oracle_sql.json in DuckDB with views over the same parquet
tables, then compares: columns sorted by name, rows as produced (queries all
end in ORDER BY), exact value equality (with a tiny float report).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            )
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT "
                + ", ".join(f'"{c}"' for c in spark_cols)
                + f" FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            duck = con.sql(sql)
            duck_cols_orig = duck.columns
            duck_cols = sorted(duck_cols_orig)
            con.execute(f"CREATE OR REPLACE TEMP VIEW _oracle AS {sql}")
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) + " FROM _oracle"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            if a != b:
                # report first mismatch with float detail
                detail = []
                for c, (x, y) in zip(spark_cols, zip(a, b)):
                    if x != y:
                        if isinstance(x, float) and isinstance(y, float):
                            d = abs(x - y)
                            detail.append(f"{c}: {x!r} vs {y!r} (diff {d:.3g})")
                        else:
                            detail.append(f"{c}: {x!r} vs {y!r}")
                bad = (i, "; ".join(detail))
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: {bad[1]} [{len(spark_rows)} rows]")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
