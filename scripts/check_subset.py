#!/usr/bin/env python3
"""Subset-run wrapper for check_oracle.py: trims oracle_sql.json to the
queries actually dumped into outDir (a prefix-filtered graft.Verify run),
then delegates. Usage: check_subset.py <sfDir> <outDir>"""
import json
import pathlib
import subprocess
import sys

sf_dir, out_dir = sys.argv[1], sys.argv[2]
out = pathlib.Path(out_dir)
oracle = out / "oracle_sql.json"
sql = json.loads(oracle.read_text())
present = {q: s for q, s in sql.items() if (out / q).is_dir()}
oracle.write_text(json.dumps(present, indent=1))
sys.exit(subprocess.call(
    [sys.executable, str(pathlib.Path(__file__).parent / "check_oracle.py"),
     sf_dir, out_dir]))
