#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against views over the sf tables, and
compares: column names (sorted), dtypes, row counts, and values
(exact; floats reported with max-abs-diff when not exact).

Usage: python3 tools/check_oracles.py [sf_dir] [verify_out_dir]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir: Path, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM read_parquet('{outdir / name}/*.parquet')").df()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    oracle_sql = json.loads((outdir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    results = {}
    query_dirs = sorted(d.name for d in outdir.iterdir() if d.is_dir())
    for name in query_dirs:
        try:
            spark_df = load_spark(outdir, name)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            n_fail += 1
            continue
        if name not in oracle_sql:
            results[name] = f"rows-only ({len(spark_df)} rows)" + (" EMPTY!" if len(spark_df) == 0 else "")
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        problems = []
        if list(s.columns) != list(o.columns):
            problems.append(f"cols spark={list(s.columns)} oracle={list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"rowcount spark={len(s)} oracle={len(o)}")
        else:
            for c in s.columns:
                sc, oc = s[c], o[c]
                if str(sc.dtype) != str(oc.dtype):
                    problems.append(f"dtype[{c}] spark={sc.dtype} oracle={oc.dtype}")
                try:
                    eq = (sc.fillna("__N__") == oc.fillna("__N__")) if sc.dtype == object \
                        else ((sc == oc) | (sc.isna() & oc.isna()))
                    if not eq.all():
                        bad = (~eq).sum()
                        msg = f"values[{c}] {bad}/{len(s)} differ"
                        if sc.dtype.kind == "f":
                            msg += f" maxdiff={ (sc - oc).abs().max() }"
                        i = (~eq).idxmax()
                        msg += f" first@{i}: spark={sc[i]!r} oracle={oc[i]!r}"
                        problems.append(msg)
                except Exception as e:
                    problems.append(f"cmp[{c}] error {e}")
        if problems:
            results[name] = "FAIL " + "; ".join(problems[:4])
            n_fail += 1
        else:
            results[name] = f"PASS ({len(s)} rows)"
            n_pass += 1

    for name in sorted(results):
        print(f"{name:28s} {results[name]}")
    missing = set(oracle_sql) - set(query_dirs)
    if missing:
        print(f"MISSING OUTPUTS (query failed in Verify): {sorted(missing)}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{sum(1 for v in results.values() if v.startswith('rows-only'))} rows-only")
    sys.exit(1 if n_fail or missing else 0)


if __name__ == "__main__":
    main()
