#!/usr/bin/env python3
"""Replicate the driver's DuckDB oracle compare against a Verify dump.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING spark output: {name}")
            bad.append(name)
            continue
        try:
            spark = canon(pd.concat([pd.read_parquet(f) for f in files]))
            ora = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ERR {name}: {e}")
            bad.append(name)
            continue
        if list(spark.columns) != list(ora.columns):
            print(f"SCHEMA {name}: spark={list(spark.columns)} oracle={list(ora.columns)}")
            bad.append(name)
        elif len(spark) != len(ora):
            print(f"ROWS {name}: spark={len(spark)} oracle={len(ora)}")
            bad.append(name)
        else:
            # align dtypes (int32 vs int64 etc.) then value-compare
            try:
                ora2 = ora.astype(spark.dtypes.to_dict())
            except Exception:
                ora2 = ora
            eq = spark.equals(ora2)
            if not eq:
                diff = (spark != ora2) & ~(spark.isna() & ora2.isna())
                ndiff = int(diff.any(axis=1).sum())
                print(f"VALUES {name}: {ndiff} differing rows of {len(spark)}")
                idx = diff.any(axis=1)
                print(spark[idx].head(3))
                print(ora2[idx].head(3))
                bad.append(name)
            else:
                print(f"ok {name} ({len(spark)} rows)")
    print("ALL OK" if not bad else f"FAILED: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
