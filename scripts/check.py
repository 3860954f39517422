#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only; the
Scala library has no python dependency).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Loads every testdata table as a DuckDB view, runs each SQL from
oracle_sql.json, and compares against the parquet Verify wrote:
column names (sorted), row counts, and values (rows sorted, doubles
rounded) — approximating the driver's row/schema/hash match.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v

    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(by=list(out.columns), key=lambda c: c.astype(str)).reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(sqls):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            spark = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ora = canon(con.execute(sqls[name]).df())
            if list(spark.columns) != list(ora.columns):
                print(f"FAIL {name}: columns spark={list(spark.columns)} oracle={list(ora.columns)}")
                n_fail += 1
            elif len(spark) != len(ora):
                print(f"FAIL {name}: rows spark={len(spark)} oracle={len(ora)}")
                n_fail += 1
            elif not spark.equals(ora):
                neq = (spark != ora) & ~(spark.isna() & ora.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(spark)} rows differ; first diffs:")
                print(pd.concat([spark[bad].head(3).add_suffix("_spark"),
                                 ora[bad].head(3).add_suffix("_oracle")], axis=1).to_string())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(spark)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
