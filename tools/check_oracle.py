#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Run `graft.Verify <sfDir> <verifyOutDir>` first. For each query named in
<verifyOutDir>/oracle_sql.json this script registers every test table as a
DuckDB view, runs the oracle SQL, loads the Spark parquet dump, and compares
the two result sets at DRIVER PARITY:

1. **Arrow schema gate** (before any cell compare): columns are sorted by
   name on both sides and their arrow types compared by *kind*
   (int / float / decimal / bool / string / timestamp / date / list<kind>).
   A DuckDB HUGEINT/decimal128 against a Spark int64 — the exact bug that
   made d11/t26 hash-red in round 11 while the old cell compare passed —
   now FAILs here. Any decimal column in the oracle output is itself a
   FAIL: the engine convention is `CAST(sum(...) AS BIGINT)` for integer
   sums (see tools/lint_oracles.py for the fast standalone lint).
2. **Cell compare over arrow values** (not pandas floats), so a NULL and a
   NaN are DIFFERENT values — matching the driver's hash, which sees
   validity bits. Float equality stays bit-strict (-0.0 != +0.0, NaN==NaN).

Queries present as parquet dumps but absent from oracle_sql.json are
reported as rows-only checks.

Dev tool only (driver-side python: duckdb+pyarrow). Not part of the
shipped library.
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{kind(t.value_type)}>"
    return str(t)


def schema_kinds(tbl: pa.Table) -> dict:
    return {f.name: kind(f.type) for f in tbl.schema}


def rows_sorted(tbl: pa.Table) -> list:
    """Sorted column names, rows as python values (None = NULL, nan = NaN),
    rows sorted by the string form of every cell — mirroring the driver's
    sort-then-hash."""
    cols = sorted(tbl.column_names)
    pylists = [tbl.column(c).to_pylist() for c in cols]
    rows = list(zip(*pylists)) if cols else []
    rows.sort(key=lambda r: tuple(stable_str(v) for v in r))
    return rows


def stable_str(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(stable_str(x) for x in v) + "]"
    return str(v)


def cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None  # NULL != NaN, NULL != anything
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # bit-strict like the driver's hash compare: -0.0 != +0.0
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, spark_tbl: pa.Table, duck_tbl: pa.Table) -> bool:
    sk, dk = schema_kinds(spark_tbl), schema_kinds(duck_tbl)
    if sorted(sk) != sorted(dk):
        print(f"FAIL {name}: column mismatch spark={sorted(sk)} duck={sorted(dk)}")
        return False
    decimal_cols = [c for c, k in dk.items() if "decimal" in k]
    if decimal_cols:
        print(f"FAIL {name}: oracle emits decimal column(s) {decimal_cols} "
              f"— add CAST(... AS BIGINT/DOUBLE) in the oracle SQL")
        return False
    kind_diff = {c: (sk[c], dk[c]) for c in sk if sk[c] != dk[c]}
    if kind_diff:
        print(f"FAIL {name}: arrow type-kind mismatch (spark, duck): {kind_diff}")
        return False
    s, d = rows_sorted(spark_tbl), rows_sorted(duck_tbl)
    if len(s) != len(d):
        print(f"FAIL {name}: row count spark={len(s)} duck={len(d)}")
        return False
    cols = sorted(spark_tbl.column_names)
    for i, (srow, drow) in enumerate(zip(s, d)):
        for j, (a, b) in enumerate(zip(srow, drow)):
            if not cells_equal(a, b):
                extra = ""
                if isinstance(a, float) and isinstance(b, float):
                    extra = f" (absdiff={abs(a - b):.3e})"
                print(f"FAIL {name}: col={cols[j]} row={i}: "
                      f"spark={a!r} duck={b!r}{extra}")
                return False
    print(f"PASS {name}: {len(s)} rows x {len(cols)} cols")
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
        spark_tbl = con.sql(
            f"SELECT * FROM read_parquet({files!r})").arrow()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {spark_tbl.num_rows} rows (no oracle SQL)")
            if spark_tbl.num_rows == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as exc:  # noqa: BLE001 - report any oracle failure
            print(f"FAIL {name}: oracle SQL error: {exc}")
            failures += 1
            continue
        if not compare(name, spark_tbl, duck_tbl):
            failures += 1
    missing = set(oracle) - set(dumps)
    for name in sorted(missing):
        print(f"FAIL {name}: oracle SQL present but no spark dump")
        failures += 1
    print(f"== {len(dumps)} queries, {failures} failures ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
