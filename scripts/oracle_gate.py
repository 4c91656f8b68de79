#!/usr/bin/env python3
"""Static oracle output-schema portability gate.

Usage: python3 scripts/oracle_gate.py <outDir-or-oracle_sql.json> <sfDir>

DESCRIBEs every oracle in oracle_sql.json over the sfDir tables and
fails on any output column whose DuckDB logical type is outside the
portable set. The r12 lesson: `w13_rolling_corr` shipped a whole round
red because a SUM(CASE...) passed HUGEINT through to the output — the
driver's fetch path renders HUGEINT/DECIMAL as floats ('12.0') while
Spark emits int64 ('12'), so the value hash diverges with zero numeric
difference, and the DBAPI `.description` type check is blind to it
(every numeric collapses to 'NUMBER'). This gate catches that class
statically, before any Spark run.

Portable = types whose DuckDB->pandas fetch renders identically to the
Spark parquet read of the same logical value:
  BIGINT INTEGER DOUBLE VARCHAR BOOLEAN DATE TIMESTAMP TIMESTAMP_NS BLOB
SCALARS ONLY — LIST (T[]) is explicitly REJECTED (the r14
driver-sortability clause): the driver's checker canonicalizes row
order with pandas sort_values over every output column, and a LIST
cell fetches as an unhashable numpy ndarray, crashing the comparison
before it compares anything (f08 shipped r13's only red row this way).
Everything else (HUGEINT, DECIMAL(p,s), UBIGINT, FLOAT, SMALLINT,
LIST, STRUCT, MAP, ...) must be CAST/scalarized in the oracle SQL
itself — comma-joined VARCHAR via array_to_string for lists.

Dev-only tooling (not part of the engine library).
"""
import sys, json, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

PORTABLE = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
            "DATE", "TIMESTAMP", "TIMESTAMP_NS", "BLOB"}


def is_portable(t: str) -> bool:
    return t in PORTABLE


def main(oracle_path, sf_dir):
    if os.path.isdir(oracle_path):
        oracle_path = os.path.join(oracle_path, "oracle_sql.json")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        offenders = [(c, t) for c, t, *_ in desc if not is_portable(t)]
        if offenders:
            print(f"FAIL {name}: non-portable oracle output types {offenders}")
            bad += 1
    print(f"\n{len(oracle) - bad}/{len(oracle)} oracles portable")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
