#!/usr/bin/env python3
"""Local differential check mirroring the driver's CORRECTNESS gate.

Usage:
  python3 tools/check.py [sfDir] [verifyOut] [only_query ...]

Expects graft.Verify to have dumped `<verifyOut>/<name>/` parquet dirs and
`<verifyOut>/oracle_sql.json`. Runs each oracle SQL in DuckDB over the
sfDir parquet tables and compares rows / schema (sorted column names) /
values (rows sorted by all columns, column order = sorted names).

Driver-side tooling only — not part of the Scala library.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB logical types whose pandas fetch renders identically to the
# Spark parquet read of the same value; HUGEINT/DECIMAL fetch as floats
# and must be CAST in the oracle SQL itself.
PORTABLE = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
            "DATE", "TIMESTAMP", "TIMESTAMP_NS", "BLOB"}


def is_portable(t):
    return t[:-2] in PORTABLE if t.endswith("[]") else t in PORTABLE


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values for comparison
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        return v
    out = df.apply(lambda c: c.map(canon))
    return out.sort_values(by=list(out.columns), kind="mergesort",
                           na_position="first").reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # DESCRIBE-level logical types: the DBAPI .description
            # collapses every numeric to 'NUMBER' (w13's HUGEINT shipped
            # a round red unseen) — take the real types and gate oracle
            # output portability before hashing anything.
            spark_types = {c: t for c, t, *_ in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
            ora_types = {c: t for c, t, *_ in con.execute(
                f"DESCRIBE ({oracles[name]})").fetchall()}
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        rows = len(spark_df) == len(ora_df)
        schema = sorted(spark_df.columns) == sorted(ora_df.columns)
        bad_port = {c: t for c, t in ora_types.items()
                    if not is_portable(t)}
        if bad_port:
            print(f"  NON-PORTABLE oracle output types {name}: {bad_port}")
            schema = False
        if schema and spark_types != ora_types:
            print(f"  TYPE mismatch {name}: spark={spark_types} oracle={ora_types}")
            schema = False
        vals = False
        if rows and schema:
            a, b = norm(spark_df), norm(ora_df)
            vals = a.equals(b)
            if not vals:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(f"  diff sample for {name}:")
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  oracle:", b[bad].head(3).to_dict("records"))
        ok = rows and schema and vals
        n_pass += ok
        n_fail += (not ok)
        print(f"{'PASS' if ok else 'FAIL'} {name}: rows={len(spark_df)}/"
              f"{len(ora_df)} schema={schema} vals={vals}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
