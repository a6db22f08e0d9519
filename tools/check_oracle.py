#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each SparkEntry result parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same fixture
tables, sorts columns by name and rows by all columns, and compares values
exactly. Dev-only tool (driver-side python deps); not part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None) != (b is None):
        return False
    if a is None:
        return True
    try:
        if isinstance(a, float) != isinstance(b, float):
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())

    n_pass = n_fail = 0
    # A query that failed inside Verify writes no result dir — that must be
    # a FAIL here, not a silent skip, or the gate reads green on a broken query.
    result_dirs = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for missing in sorted(set(oracle) - result_dirs):
        err = Path(f"{out_dir}/{missing}.err")
        detail = err.read_text()[:200] if err.exists() else \
            "NO RESULT DIR (query failed in Verify?)"
        print(f"  ✗ {missing}: {detail}")
        n_fail += 1
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(spark_df)}")
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(odf)
        ok = True
        if list(s.columns) != list(o.columns):
            print(f"  ✗ {name}: column mismatch spark={list(s.columns)} oracle={list(o.columns)}")
            ok = False
        elif len(s) != len(o):
            print(f"  ✗ {name}: row count spark={len(s)} oracle={len(o)}")
            ok = False
        else:
            st, ot = [str(t) for t in s.dtypes], [str(t) for t in o.dtypes]
            if st != ot:
                print(f"  ! {name}: dtype diff spark={st} oracle={ot}")
            for c in s.columns:
                sv, ov = s[c].tolist(), o[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(sv, ov))
                       if not values_equal(x, y)]
                if bad:
                    i, x, y = bad[0]
                    print(f"  ✗ {name}: col {c}: {len(bad)}/{len(sv)} differ; first row {i}: spark={x!r} oracle={y!r}")
                    ok = False
        if ok:
            print(f"  ✓ {name} rows={len(s)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
