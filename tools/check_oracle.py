#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Run `graft.Verify <sfDir> <verifyOutDir>` first. For each query named in
<verifyOutDir>/oracle_sql.json this script registers every test table as a
DuckDB view, runs the oracle SQL, loads the Spark parquet dump, sorts columns
by name and rows by all columns on both sides, and compares cell-exact —
approximating the driver's hash compare. Queries present as parquet dumps but
absent from oracle_sql.json are reported as rows-only checks.

Dev tool only (driver-side python: duckdb+pandas+pyarrow). Not part of the
shipped library.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(lambda v: str(v)))
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # bit-strict like the driver's hash compare: -0.0 != +0.0
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> bool:
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}")
        return False
    if len(s) != len(d):
        print(f"FAIL {name}: row count spark={len(s)} duck={len(d)}")
        return False
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cells_equal(a, b):
                extra = ""
                if isinstance(a, float) and isinstance(b, float):
                    extra = f" (absdiff={abs(a - b):.3e})"
                print(f"FAIL {name}: col={col} row={i}: spark={a!r} duck={b!r}{extra}")
                return False
    print(f"PASS {name}: {len(s)} rows x {len(s.columns)} cols")
    return True


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracle = json.load(fh)

    dumps = {p.rstrip("/").split("/")[-1]: p
             for p in glob.glob(f"{out_dir}/*/")}
    failures = 0
    for name in sorted(dumps):
        files = glob.glob(f"{dumps[name]}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet dump")
            failures += 1
            continue
        spark_df = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows (no oracle SQL)")
            if len(spark_df) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as exc:  # noqa: BLE001 - report any oracle failure
            print(f"FAIL {name}: oracle SQL error: {exc}")
            failures += 1
            continue
        if not compare(name, spark_df, duck_df):
            failures += 1
    missing = set(oracle) - set(dumps)
    for name in sorted(missing):
        print(f"FAIL {name}: oracle SQL present but no spark dump")
        failures += 1
    print(f"== {len(dumps)} queries, {failures} failures ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
