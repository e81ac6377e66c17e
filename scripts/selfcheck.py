#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
shipped library is pure Scala/Spark). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

For every query dir under outDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the testbed tables, sort
columns by name and rows by all columns, and compare exactly.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check, rows={len(got)})")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        # The driver hashes value REPRESENTATIONS, so a dtype divergence
        # (e.g. DuckDB widening integer sum() to HUGEINT, which pandas
        # materializes as float64 vs Spark's int64) fails its gate even
        # though 25 == 25.0 passes a loose value compare. Catch it here.
        dtype_bad = None
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            # kind mismatch = driver fail, except object-vs-unicode string
            # representations, which hash identically
            if gk != ek and not (gk in "OU" and ek in "OU"):
                dtype_bad = (c, got[c].dtype, exp[c].dtype)
                break
        if dtype_bad:
            print(f"FAIL {name}: dtype col={dtype_bad[0]} "
                  f"spark={dtype_bad[1]} oracle={dtype_bad[2]} "
                  f"(driver hashes representations; cast the oracle)")
            failures += 1
            continue
        bad = None
        ga, ea = got.values, exp.values
        for i in range(len(got)):
            for j in range(got.shape[1]):
                if not cells_equal(ga[i][j], ea[i][j]):
                    bad = (i, got.columns[j], ga[i][j], ea[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff row={bad[0]} col={bad[1]} "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
