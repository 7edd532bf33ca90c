#!/usr/bin/env python3
"""Degenerate-corpus ORACLE parity for q_stats_randomization.

The Spark side drops its global-aggregate row when the pooled corpus is
one-sided or empty (StatsTests.scala: n_splits > 0 AND n1 > 0 AND
n - n1 > 0); the oracle's obs/diffs CTEs must go empty on the SAME
corpora so both engines agree at 0 rows (r12 verdict item 1a). The
Spark half of this claim is the OperatorsSpec test
"q_stats_randomization degenerate corpora"; this script is the DuckDB
half. The two corpora here are built with the same definitions as that
test.

Usage: python3 scripts/check_degenerate.py [verifyOutDir]
(verifyOutDir must hold oracle_sql.json from a graft.Verify run;
defaults to /tmp/verify_sf0.01)
"""
import json
import sys

import duckdb


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf0.01"
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)["q_stats_randomization"]

    corpora = {
        # clicks only: n - n1 = 0, obs_diff would divide by zero
        "one_sided": """
            SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-01-01' + i * INTERVAL 1 SECOND AS ts,
                   CAST(i AS BIGINT) AS user_id,
                   'click' AS event_type,
                   CAST(i AS DOUBLE) / 7 AS value,
                   '' AS props
            FROM range(50) t(i)""",
        # every value NULL: the pooled corpus filters to nothing
        "all_null": """
            SELECT CAST(i AS BIGINT) AS event_id,
                   TIMESTAMP '2024-01-01' + i * INTERVAL 1 SECOND AS ts,
                   CAST(i AS BIGINT) AS user_id,
                   CASE WHEN i % 2 = 0 THEN 'click' ELSE 'view' END
                     AS event_type,
                   CAST(NULL AS DOUBLE) AS value,
                   '' AS props
            FROM range(50) t(i)""",
    }

    failed = 0
    for name, corpus in corpora.items():
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS {corpus}")
        rows = con.sql(sql).fetchall()
        if rows:
            print(f"FAIL {name}: oracle yielded {len(rows)} rows "
                  f"(expected 0): {rows[:3]}")
            failed += 1
        else:
            print(f"PASS {name}: oracle yields 0 rows (matches Spark)")
        con.close()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
