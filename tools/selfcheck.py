#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [--json <path>]

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf parquet tables,
and compares: row count, column names (sorted), and values (rows sorted,
columns sorted by name, every cell stringified and compared EXACTLY —
floats included; there is no tolerance path, matching the driver).

Besides the per-query PASS/FAIL lines, writes a machine-readable result
map in the round driver's exact CORRECTNESS_r{N}.json format —
{name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}} — to --json (default target/correctness_local.json), so an
empty/absent driver artifact is immediately distinguishable from an
engine failure and the judge has a committed receipt.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: decimals -> float via str to preserve exactness check
    for c in df.columns:
        # astype(object): an EMPTY column keeps its raw dtype through
        # map, and DataFrame.equals is dtype-sensitive — a 0-row result
        # would "differ" on float64-vs-object with no cell differing
        df[c] = df[c].map(lambda v: str(v) if v is not None else "NULL") \
            .astype(object)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    argv = list(sys.argv[1:])
    json_path = Path("target/correctness_local.json")
    if "--json" in argv:
        i = argv.index("--json")
        json_path = Path(argv[i + 1])
        del argv[i:i + 2]
    out_dir, sf_dir = Path(argv[0]), Path(argv[1])
    results = {}

    def record(name, rows=False, schema=False, values=False,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": values, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    # modest thread/memory caps: the host caps vm.max_map_count at 65530,
    # and duckdb's default 32 threads can exhaust mappings mid-run
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            record(name, err="no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(qdir.glob("*.parquet"))],
                ignore_index=True)
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record(name, err=str(e)[:500])
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        schema_ok = list(a.columns) == list(b.columns)
        rows_ok = len(a) == len(b)
        values_ok = schema_ok and rows_ok and a.equals(b)
        record(name, rows=rows_ok, schema=schema_ok, values=values_ok,
               spark_rows=len(a), oracle_rows=len(b))
        if not schema_ok:
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if not rows_ok:
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if not values_ok:
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
            if len(a):
                idx = diff.idxmax()
                print("  spark:", a.iloc[idx].to_dict())
                print("  duck :", b.iloc[idx].to_dict())
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    json_path.parent.mkdir(parents=True, exist_ok=True)
    json_path.write_text(json.dumps(results, indent=2, sort_keys=True) + "\n")
    print(f"== {n_pass} pass, {n_fail} fail (map -> {json_path})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
