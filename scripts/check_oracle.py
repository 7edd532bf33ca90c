#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB 1.0.0
with views named after the tables. Compares: schema (column names sorted),
row count, and cell-exact values (columns sorted by name, rows in file
order). Reports per-query PASS/FAIL with a diff sample.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return v
    return v


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(cells_equal(a[k], b[k]) for k in a)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = list(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            orc_rel = con.sql(sql)
            orc_cols = list(orc_rel.columns)
            orc_rows = orc_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue

        if sorted(spark_cols) != sorted(orc_cols):
            print(f"FAIL {name}: columns differ spark={sorted(spark_cols)} "
                  f"oracle={sorted(orc_cols)}")
            n_fail += 1
            continue
        # warn (not fail) on dtype differences, in case the driver's
        # schema check is stricter than value equality
        s_types = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        o_types = dict(zip(orc_rel.columns, [str(t) for t in orc_rel.types]))
        for c in spark_cols:
            if s_types[c] != o_types[c]:
                print(f"  WARN {name}.{c}: spark type {s_types[c]} "
                      f"vs oracle {o_types[c]}")
        # The driver's checker canonicalizes with pandas sort_values over
        # every column, which raises on list/dict cells — so any non-scalar
        # output column is a driver-side FAIL even if values match here.
        nonscalar = [c for i, c in enumerate(spark_cols)
                     if any(isinstance(r[i], (list, dict))
                            for r in spark_rows)]
        nonscalar += [c for i, c in enumerate(orc_cols)
                      if any(isinstance(r[i], (list, dict))
                             for r in orc_rows)
                      and c not in nonscalar]
        if nonscalar:
            print(f"FAIL {name}: non-scalar output columns {nonscalar} "
                  f"(driver's pandas sort_values would crash)")
            n_fail += 1
            continue
        if len(spark_rows) != len(orc_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} "
                  f"oracle={len(orc_rows)}")
            n_fail += 1
            continue
        # sort columns by name (the driver's canonicalization)
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [orc_cols.index(c) for c in sorted(orc_cols)]
        bad = None
        for r, (srow, orow) in enumerate(zip(spark_rows, orc_rows)):
            for ci, (si, oi) in enumerate(zip(s_idx, o_idx)):
                if not cells_equal(canon(srow[si]), canon(orow[oi])):
                    bad = (r, sorted(spark_cols)[ci], srow[si], orow[oi])
                    break
            if bad:
                break
        if bad:
            r, c, sv, ov = bad
            print(f"FAIL {name}: first diff row {r} col {c}: "
                  f"spark={sv!r} oracle={ov!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} oracle queries total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
