#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each <outDir>/<name> parquet dir with an entry in oracle_sql.json:
run the SQL in DuckDB over <sfDir> tables, compare row count, column
names/types, and a row-order-insensitive hash of values.

Dev-only tooling (not part of the engine library).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB logical types whose pandas/driver fetch renders identically to
# the Spark parquet read of the same value. HUGEINT/DECIMAL are NOT in
# the set: they fetch as floats ('12.0' vs Spark's '12') and the DBAPI
# .description check can't see them (all numerics collapse to 'NUMBER')
# — the w13 r12 lesson. Oracles must CAST their outputs into this set.
PORTABLE = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
            "DATE", "TIMESTAMP", "TIMESTAMP_NS", "BLOB"}

def is_portable(t):
    return t[:-2] in PORTABLE if t.endswith("[]") else t in PORTABLE

def describe_types(con, sql):
    return {c: t for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall()}

def norm(v):
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    acc = 0
    for row in rows:
        h = hash(tuple(norm(row[i]) for i in order))
        acc = (acc + h) & ((1 << 64) - 1)
    return acc

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: no spark output")
            continue
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        g_cols = [d[0] for d in got.description]
        g_rows = got.fetchall()
        try:
            exp = con.execute(oracle[name])
        except Exception as e:
            failures.append((name, f"oracle sql error: {e}"))
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        e_cols = [d[0] for d in exp.description]
        e_rows = exp.fetchall()
        errs = []
        # DESCRIBE-level logical types: the DBAPI .description collapses
        # all numerics to 'NUMBER', which is how w13's HUGEINT shipped
        # red for a round — compare the real types, and gate portability.
        g_types = describe_types(con, f"SELECT * FROM '{res_dir}/*.parquet'")
        e_types = describe_types(con, f"({oracle[name]})")
        bad_port = {c: t for c, t in e_types.items() if not is_portable(t)}
        if bad_port:
            errs.append(f"non-portable oracle output types {bad_port}")
        if sorted(g_cols) != sorted(e_cols):
            errs.append(f"cols {sorted(g_cols)} != {sorted(e_cols)}")
        else:
            mism = {c: (g_types[c], e_types[c]) for c in g_cols if g_types[c] != e_types[c]}
            if mism:
                errs.append(f"types {mism}")
        if len(g_rows) != len(e_rows):
            errs.append(f"rows {len(g_rows)} != {len(e_rows)}")
        if not errs and table_hash(g_cols, g_rows) != table_hash(e_cols, e_rows):
            errs.append("value hash mismatch")
            # show a sample diff
            gs = sorted(tuple(norm(v) for v in r) for r in
                        (tuple(row[i] for i in sorted(range(len(g_cols)), key=lambda i: g_cols[i])) for row in g_rows))
            es = sorted(tuple(norm(v) for v in r) for r in
                        (tuple(row[i] for i in sorted(range(len(e_cols)), key=lambda i: e_cols[i])) for row in e_rows))
            for a, b in zip(gs, es):
                if a != b:
                    errs.append(f"  first diff:\n   spark={a}\n   duck ={b}")
                    break
        if errs:
            failures.append((name, "; ".join(errs)))
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"OK   {name} ({len(g_rows)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
