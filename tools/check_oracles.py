#!/usr/bin/env python3
"""Dev-only differential checker mirroring the driver's DuckDB oracle.

NOT part of the engine (the engine is pure Scala/Spark). This script
pre-validates that each SparkEntry.oracleSql runs under DuckDB and
produces the same rows as the Spark result parquet that graft.Verify
wrote, so oracle-SQL dialect bugs are caught before the driver runs.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json, os, sys, math
import duckdb

def canon(rows, colnames):
    # sort columns by name (driver semantics), then canonicalize values
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            elif isinstance(v, list):
                v = json.dumps(v, default=str)
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # testdata tables are single files; ScaleSmoke-replicated tables
        # are directories of part files (the scale_gate path) -> glob
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if not os.path.exists(p):
            continue  # subset corpora (SPARK_GRAFT_SMOKE_TABLES) omit tables
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql)
            ocols = [d[0] for d in oracle.description]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        if sorted(ocols) != sorted(gcols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(gcols)}")
            n_bad += 1
            continue
        co, cg = canon(orows, ocols), canon(grows, gcols)
        if len(co) != len(cg):
            print(f"FAIL {name}: rows oracle={len(co)} spark={len(cg)}")
            n_bad += 1
            continue
        if co != cg:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(co, cg)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0]}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(co)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    if n_ok + n_bad == 0:
        # an empty oracle set (e.g. SPARK_GRAFT_ONLY restricted to
        # oracle-exempt queries, or a truncated oracle_sql.json) must
        # not read as a green gate
        print("FAIL: zero oracles checked — vacuous pass refused",
              file=sys.stderr)
        return 1
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
