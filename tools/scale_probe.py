#!/usr/bin/env python3
"""Builder-side 10x scale probe (round-16 verdict ask #1).

Derives an sf1-equivalent dataset at /tmp/sf1 as the UNION of 10
key-shifted copies of the driver's read-only sf0.1 testdata (which is
never touched), then runs a fixed probe query set through graft.Bench
at BOTH scales and reports per-query sf0.1 -> sf1 wall-time ratios.

Key shifting preserves referential integrity per replica (orders of
replica i reference customers of replica i, etc.); dims (nation,
region) are shared. Offsets keep every synthetic-id headroom contract:
doc_id stays < 1e6, vec_id < 2e6, event_id < 1e9 (Tables.scala
asserts the first two per session).

Document TEXT is decorrelated across replicas by prefixing a replica
digit to every token (replica 0 keeps the original text): identical /
near-duplicate structure WITHIN a replica is preserved exactly (same
transformation per text), while cross-replica shingle sets share
nothing — so dedup pair-generation scales with the real 10x corpus
instead of exploding quadratically on 10 verbatim copies. Token and
shingle COUNTS per document are unchanged (one prepended character per
word), so per-document work is identical. Embedding vectors are NOT
decorrelated (the probed ANN query is top-k serving, where duplicate
neighbors change results but not scan/probe cost); a pair-joining
embedding query would need the same treatment before probing.

Driver-side tooling only (python + duckdb) - not part of the Scala
library. Usage:

  python3 tools/scale_probe.py derive          # build /tmp/sf1
  python3 tools/scale_probe.py bench           # run both benches
  python3 tools/scale_probe.py report          # print ratio table
"""
import json
import os
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
# Env-overridable so the same machinery derives the 100x decade
# (GRAFT_PROBE_REPLICAS=100 GRAFT_PROBE_DST=/tmp/sf10 ...), the r16
# verdict's task-5 spot-probe; offsets scale linearly with i, so the
# headroom assertion below covers any replica count.
DST = os.environ.get("GRAFT_PROBE_DST", "/tmp/sf1")
REPLICAS = int(os.environ.get("GRAFT_PROBE_REPLICAS", "10"))

# per-replica key offsets (> max key at sf0.1, round numbers)
OFF = {
    "custkey": 20_000,
    "suppkey": 1_000,
    "partkey": 20_000,
    "orderkey": 200_000,
    "event_id": 100_000,
    "user_id": 2_000,
    "doc_id": 10_000,
    "vec_id": 2_000,
}

# the probe set: r15's bench heavies + one representative per
# scale-shape class (banded LSH, passage dedup, fixpoint closure,
# IVFADC, bucketed join, cube, bucketedPrefix consumer, BM25, KMV
# sketches, TTL'd TWS, stream-stream joins, front-door curation)
QUERIES = [
    # batch
    "a01_brand_revenue", "a07_dau_approx", "a18_event_cube",
    "j15_bucketed_join", "w17_global_rank", "t23_bm25",
    "q01x_profile_kmv", "c09_gate_ablation", "c11_stage_funnel",
    "d02_minhash_lsh", "d07_dedup_clusters", "d09_lsh_tuning",
    "d13_passage_dedup", "d33_harmonic_centrality",
    # r17 additions: the corpus-scale candidate path and the sketched
    # centrality that replace d03/d33's latent-quadratic/disk-bound
    # stages past ~1e5 docs (see SCALE_PROBE.md r17 addendum)
    "d35_simhash_rotblock", "d37_harmonic_kmvball",
    "n11_multiprobe_ivfadc",
    # r18 additions (r17 verdict tasks 1+3): d22 proves the migrated
    # rot-block edge artifact carries a second graph consumer through
    # sf10 where d03's edges were disk-dead (d07 was already probed);
    # d11/d12 + st38 are the incremental-dedup family, n17/n23 + st27
    # the tuned ANN serving family, st44 the flush-time-state family —
    # the most load-bearing 100 TB claims after the curation chain
    "d22_triangle_count", "d11_incremental_dedup",
    "d12_incremental_neardup", "n17_tuned_ivf", "n23_two_stage_rerank",
    # streaming
    "st05_outer_wide_join", "st10_full_outer_join", "st14_stream_index",
    "st18_stream_curation", "st28_stream_repetition",
    "st32_stream_attribution", "st89_stream_fingerprint",
    "st113_semi_join", "st116_tws_ttl_cache",
    "st38_stream_incremental_neardup", "st27_tuned_ann_serve",
    "st44_stream_multitouch",
]

OUT_SMALL = os.environ.get("GRAFT_PROBE_OUT_SMALL", "/tmp/scale_probe_sf01.json")
OUT_BIG = os.environ.get("GRAFT_PROBE_OUT_BIG", "/tmp/scale_probe_sf1.json")

# Optional subset (comma-separated names): the sf10 decade only
# re-probes the worst sf1 ratios, not all 24.
_sel = os.environ.get("GRAFT_PROBE_QUERIES", "")
if _sel:
    _want = set(_sel.split(","))
    QUERIES = [q for q in QUERIES if q in _want]

# The per-replica decade for the ratio denominator in report(): sf1
# is 10 replicas of sf0.1, sf10 is 100 — report() divides big/small
# directly, so the caller interprets the ratio against REPLICAS.


def assert_headroom(con):
    """The per-replica offsets MUST exceed every key they shift in the
    source generation, or replicas alias (e.g. orders of replica i
    referencing customers of replica i+1) and the probe's referential
    integrity silently corrupts. Assert against the actual parquet,
    mirroring Tables.assertIdHeadroom — a comment is not a check.
    """
    checks = [
        ("customer", "c_custkey", "custkey"),
        ("supplier", "s_suppkey", "suppkey"),
        ("part", "p_partkey", "partkey"),
        ("orders", "o_orderkey", "orderkey"),
        ("orders", "o_custkey", "custkey"),
        ("lineitem", "l_orderkey", "orderkey"),
        ("lineitem", "l_partkey", "partkey"),
        ("lineitem", "l_suppkey", "suppkey"),
        ("events", "event_id", "event_id"),
        ("events", "user_id", "user_id"),
        ("documents", "doc_id", "doc_id"),
        ("embeddings", "vec_id", "vec_id"),
    ]
    for tbl, col, off in checks:
        mx = con.execute(
            f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        assert mx < OFF[off], (
            f"{tbl}.{col} max {mx} >= per-replica offset {OFF[off]}"
            f" ({off}): replicas would alias")


def derive():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    assert_headroom(con)
    con.execute(f"CREATE VIEW r AS SELECT i FROM range({REPLICAS}) t(i)")

    def copy(sql, name):
        con.execute(
            f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"  {name}: {n} rows")

    # shared dims: one copy
    for t in ("nation", "region"):
        copy(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

    copy(f"""SELECT c_custkey + i*{OFF['custkey']} AS c_custkey, c_name,
                    c_nationkey, c_acctbal, c_mktsegment
             FROM '{SRC}/customer.parquet', r""", "customer")
    copy(f"""SELECT s_suppkey + i*{OFF['suppkey']} AS s_suppkey, s_name,
                    s_nationkey, s_acctbal
             FROM '{SRC}/supplier.parquet', r""", "supplier")
    copy(f"""SELECT p_partkey + i*{OFF['partkey']} AS p_partkey, p_name,
                    p_brand, p_type, p_size, p_retailprice
             FROM '{SRC}/part.parquet', r""", "part")
    copy(f"""SELECT o_orderkey + i*{OFF['orderkey']} AS o_orderkey,
                    o_custkey + i*{OFF['custkey']} AS o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate,
                    o_orderpriority
             FROM '{SRC}/orders.parquet', r""", "orders")
    copy(f"""SELECT l_orderkey + i*{OFF['orderkey']} AS l_orderkey,
                    l_partkey + i*{OFF['partkey']} AS l_partkey,
                    l_suppkey + i*{OFF['suppkey']} AS l_suppkey,
                    l_linenumber, l_quantity, l_extendedprice, l_discount,
                    l_tax, l_returnflag, l_linestatus, l_shipdate
             FROM '{SRC}/lineitem.parquet', r""", "lineitem")
    copy(f"""SELECT event_id + i*{OFF['event_id']} AS event_id, ts,
                    user_id + i*{OFF['user_id']} AS user_id,
                    event_type, value, props
             FROM '{SRC}/events.parquet', r""", "events")
    copy(f"""SELECT doc_id + i*{OFF['doc_id']} AS doc_id,
                    CASE WHEN i = 0 THEN text
                         ELSE replace(text, ' ', ' ' || CAST(i AS VARCHAR))
                    END AS text,
                    lang, source,
                    CAST(length(CASE WHEN i = 0 THEN text
                         ELSE replace(text, ' ', ' ' || CAST(i AS VARCHAR))
                    END) AS BIGINT) AS n_chars
             FROM '{SRC}/documents.parquet', r""", "documents")
    copy(f"""SELECT vec_id + i*{OFF['vec_id']} AS vec_id, embedding, label
             FROM '{SRC}/embeddings.parquet', r""", "embeddings")
    print("derived", DST)


def bench(sf_dir, out_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_OUT"] = out_path
    env["SPARK_GRAFT_ISOLATE"] = "0"  # ratios use in-suite mins
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(QUERIES)]
    print("benching", sf_dir, "->", out_path)
    subprocess.run(cmd, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def report():
    small = json.load(open(OUT_SMALL))["queries"]
    big = json.load(open(OUT_BIG))["queries"]
    print(f"{'query':32s} {'sf0.1':>8s} {'sf1':>9s} {'ratio':>7s}")
    for q in QUERIES:
        if q in small and q in big:
            r = big[q] / small[q]
            print(f"{q:32s} {small[q]:8.2f} {big[q]:9.2f} {r:6.1f}x")
        else:
            print(f"{q:32s} MISSING small={q in small} big={q in big}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("derive", "all"):
        derive()
    if mode in ("bench", "all"):
        bench(SRC, OUT_SMALL)
        bench(DST, OUT_BIG)
    if mode in ("report", "all"):
        report()
