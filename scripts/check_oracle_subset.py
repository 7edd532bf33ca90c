#!/usr/bin/env python3
"""Subset variant of check_oracle.py for local iteration: checks only the
queries actually dumped into <verifyOutDir> (a subset Verify run), instead
of failing on every oracle entry with no dump. Same comparison semantics —
it reuses check_oracle's machinery by swapping a FILTERED oracle_sql.json
in for the duration of the check and restoring the original afterwards
(r13 ADVICE: the previous version overwrote the file permanently, so a
later full check_oracle on the same dir silently validated only the
subset).

Usage: python3 scripts/check_oracle_subset.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

sys.argv = sys.argv[:3]
sf_dir, out_dir = sys.argv[1], sys.argv[2]

oracle_path = f"{out_dir}/oracle_sql.json"
with open(oracle_path) as f:
    original_text = f.read()
oracles = json.loads(original_text)
present = {n for n in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, n))}
subset = {k: v for k, v in oracles.items() if k in present}

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402

with open(oracle_path, "w") as f:
    json.dump(subset, f)
try:
    check_oracle.main()
finally:
    with open(oracle_path, "w") as f:
        f.write(original_text)
