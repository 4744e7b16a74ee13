#!/usr/bin/env python3
"""Registry lint for oracle output types (VERDICT r11 directive #3).

Usage: python3 tools/lint_oracles.py <sfDir> <verifyOutDir>

Runs every `SparkEntry.oracleSql` entry (as dumped to
<verifyOutDir>/oracle_sql.json by graft.Verify) through DuckDB with a
`LIMIT 0` wrapper and FAILs if any output column is HUGEINT/decimal128 —
i.e. an uncast integer `sum()`/`*` aggregate that would hash-mismatch
Spark's int64 in the driver's gate. This turns the engine-wide
`CAST(... AS BIGINT)` convention into a fast standing gate (schema-only:
no data is scanned beyond what DuckDB needs to bind the query).

Exit 0 = every oracle binds and emits no decimal column.

Dev tool only (driver-side python: duckdb). Not part of the shipped
library.
"""
import json
import sys

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracle = json.load(fh)
    failures = 0
    for name in sorted(oracle):
        try:
            schema = con.sql(
                f"SELECT * FROM ({oracle[name]}) __lint LIMIT 0").arrow().schema
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL does not bind: {exc}")
            failures += 1
            continue
        bad = [f.name for f in schema if pa.types.is_decimal(f.type)]
        if bad:
            print(f"FAIL {name}: decimal output column(s) {bad} — "
                  f"wrap the aggregate in CAST(... AS BIGINT/DOUBLE)")
            failures += 1
        else:
            print(f"OK   {name}")
    print(f"== {len(oracle)} oracles, {failures} failures ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
