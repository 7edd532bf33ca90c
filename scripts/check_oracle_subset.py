#!/usr/bin/env python3
"""Subset variant of check_oracle.py for local iteration: checks only the
queries actually dumped into <verifyOutDir> (a subset Verify run), instead
of failing on every oracle entry with no dump. Same comparison semantics —
it reuses check_oracle's machinery by filtering oracle_sql.json in place
in a temp copy of the dir listing.

Usage: python3 scripts/check_oracle_subset.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

sys.argv = sys.argv[:3]
sf_dir, out_dir = sys.argv[1], sys.argv[2]

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)
present = {n for n in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, n))}
subset = {k: v for k, v in oracles.items() if k in present}
with open(f"{out_dir}/oracle_sql.json", "w") as f:
    json.dump(subset, f)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402

check_oracle.main()
