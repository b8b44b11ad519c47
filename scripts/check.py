#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [jsonOut]

With jsonOut, also writes a driver-format correctness artifact: one
record per query dir under <verifyOutDir> — rows/schema/hash match
flags + row counts for oracle-checked queries, err="no_oracle" with
the spark row count for rows-only queries (q41b/q41c).

Reads each <outDir>/<name> parquet (Spark result) and runs
<outDir>/oracle_sql.json[name] in DuckDB with views over <sfDir>'s
parquet tables; canonicalizes both sides (sort columns by name, round
floats to 6 dp, timestamps to str, NULL sentinel, sort rows) and diffs.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif isinstance(s.dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif s.dtype == object:
            df[c] = s.map(lambda v: round(v, 6) if isinstance(v, float) else
                          (float(v) if hasattr(v, "as_tuple") else v))  # Decimal
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]  # optional sys.argv[3]: json artifact
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    records = {}
    def rec(name, **kw):
        base = {"rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None, "err": None}
        base.update(kw)
        records[name] = base
    # rows-only queries: present as output dirs but absent from the oracle
    for d in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(os.path.join(p, "*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else None
            rec(d, spark_rows=n, err="no_oracle")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1
            rec(name, err="no spark output");  continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}");  n_bad += 1
            rec(name, err=f"{type(e).__name__}: {e}");  continue
        # surface dtype drift (a stricter driver may compare schemas)
        for c in set(spark_df.columns) & set(duck_df.columns):
            a, d = str(spark_df[c].dtype), str(duck_df[c].dtype)
            norm = lambda t: {"float32": "float64", "int32": "int64", "int8": "int64",
                              "uint32": "int64"}.get(t, t)
            if norm(a) != norm(d):
                print(f"WARN {name}.{c}: spark dtype {a} vs duck {d}")
        rec(name, spark_rows=len(spark_df), oracle_rows=len(duck_df),
            schema_match=list(spark_df.columns) == list(duck_df.columns),
            rows_match=len(spark_df) == len(duck_df), hash_match=False)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_bad += 1;  continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_bad += 1;  continue
        # value compare with NULL==NULL (sentinel both sides)
        a = spark_df.astype(object).mask(spark_df.isna(), "\\N")
        b = duck_df.astype(object).mask(duck_df.isna(), "\\N")
        eq = a.eq(b)
        if not eq.all().all():
            bad_cols = [c for c in eq.columns if not eq[c].all()]
            ridx = eq[bad_cols[0]].idxmin()
            print(f"FAIL {name}: mismatch cols={bad_cols} first row {ridx}:")
            print("  spark:", spark_df.loc[ridx].to_dict())
            print("  duck :", duck_df.loc[ridx].to_dict())
            n_bad += 1;  continue
        print(f"ok   {name} ({len(spark_df)} rows)")
        records[name]["hash_match"] = True
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {sys.argv[3]} ({len(records)} records)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
