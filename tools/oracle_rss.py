#!/usr/bin/env python3
"""Measure each DuckDB oracle's peak RSS in an isolated process.

The round driver's correctness harness runs EVERY oracle through one
process, so a single memory-hungry oracle (r9's BPE chains peaked at
29 GB) can OOM dozens of unrelated rows. This probe runs each oracle
from a Verify dump in its own subprocess with the harness's limits
(8 threads / 24 GB) and reports wall + peak RSS, worst first — the
sizing sheet for keeping the whole suite inside the envelope.

Usage: python3 tools/oracle_rss.py <verify_out_dir> <sf_dir> [name ...]
       (no names = all oracles in <verify_out_dir>/oracle_sql.json)
"""
import json
import subprocess
import sys
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

CHILD = r'''
import json, resource, sys, time
import duckdb
from pathlib import Path
out_dir, sf_dir, name = sys.argv[1:4]
con = duckdb.connect()
con.execute("SET threads=8")
con.execute("SET memory_limit='24GB'")
for t in {tables!r}:
    p = Path(sf_dir) / (t + ".parquet")
    if p.exists():
        con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{p}}')")
sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())[name]
t0 = time.time()
n = len(con.execute(sql).fetchdf())
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"GRAFT_RSS_RESULT {{n}} {{time.time() - t0:.1f}} {{rss:.2f}}")
'''.format(tables=TABLES)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    names = sys.argv[3:] or sorted(oracle)
    rows = []
    for name in names:
        r = subprocess.run([sys.executable, "-c", CHILD, out_dir, sf_dir, name],
                           capture_output=True, text=True)
        # the child's stdout may carry duckdb progress/warning noise —
        # only the GRAFT_RSS_RESULT-prefixed line is the result
        result = [l for l in (r.stdout or "").splitlines()
                  if l.startswith("GRAFT_RSS_RESULT ")]
        if r.returncode != 0 or not result:
            tail = (r.stderr or "").strip().splitlines()
            rows.append((float("inf"), name, f"FAILED: {tail[-1] if tail else '?'}"))
            continue
        _, n, wall, rss = result[-1].split()
        rows.append((float(rss), name, f"rows={n} wall={wall}s peakRSS={rss}GB"))
    for _, name, msg in sorted(rows, reverse=True):
        print(f"{name}: {msg}")


if __name__ == "__main__":
    main()
