#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/verify_local.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/oracle_sql.json,
runs each oracle in DuckDB with views over sfDir's parquet tables, and compares:
columns sorted by name, rows sorted by all columns, exact value equality.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(spark_df)})" if len(spark_df) else "ROWS_ONLY_EMPTY!"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(o.columns)}"
            continue
        if len(s) != len(o):
            results[name] = f"ROWCOUNT {len(s)} vs {len(o)}"
            continue
        # dtype-strict: the driver hashes the typed values, so a DuckDB
        # HUGEINT/DOUBLE result that is value-equal to Spark's BIGINT still
        # fails there. No coercion here — a dtype mismatch IS a failure.
        bad_dtypes = [f"{c}: spark={s[c].dtype} duck={o[c].dtype}"
                      for c in s.columns if s[c].dtype != o[c].dtype]
        if bad_dtypes:
            results[name] = "DTYPE_MISMATCH " + "; ".join(bad_dtypes[:4])
            continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        diff_cols = []
        for c in s.columns:
            a, b = s[c], o[c]
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                if neq.any():
                    i = neq.idxmax()
                    diff_cols.append(f"{c}[{int(neq.sum())} diffs, e.g. row {i}: {a[i]!r} vs {b[i]!r}]")
        results[name] = "OK" if not diff_cols else "VALUE_MISMATCH " + "; ".join(diff_cols[:3])
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY("))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")

if __name__ == "__main__":
    main()
