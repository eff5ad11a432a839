#!/usr/bin/env python3
"""Split concatenated PlanAudit output (===== qNNN ===== sections) into
plans/r17/<query>_<side>.txt files. Usage:
  split_plans.py <side: before|after> <outdir> <file...>
"""
import sys, os, re

side, outdir = sys.argv[1], sys.argv[2]
os.makedirs(outdir, exist_ok=True)
for path in sys.argv[3:]:
    cur, buf = None, []
    def flush():
        if cur:
            with open(os.path.join(outdir, f"{cur}_{side}.txt"), "w") as f:
                f.write("".join(buf))
    for line in open(path):
        m = re.match(r"^===== (q\w+) =====", line)
        if m:
            flush()
            cur, buf = m.group(1), []
        elif cur:
            buf.append(line)
    flush()
print("done", side)
