#!/usr/bin/env python3
"""Negative control for the oracle harness itself.

check_oracles.py is the correctness gate; a bug that makes it pass
vacuously is worse than a failing query (the class bit in rounds 7 and
8: a skipped query shrank the dump and the remainder read green). This
meta-test fabricates result dumps and asserts the checker is RED on
every wrong shape and GREEN on the right one — so "all OK" keeps
meaning something.

Run standalone (python3 tools/selftest_check_oracles.py) — it is also a
preflight of tools/scale_gate.sh. Exit 0 iff every scenario behaves.
"""
import json, os, shutil, subprocess, sys, tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))


def write_result(out_dir, name, select_sql):
    d = os.path.join(out_dir, name)
    os.makedirs(d)
    duckdb.connect().execute(
        f"COPY ({select_sql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")


def run_checker(sf_dir, out_dir):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracles.py"),
         sf_dir, out_dir],
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def scenario(name, oracles, results, want_rc, want_frag):
    sf = tempfile.mkdtemp(prefix="sot_sf_")   # tables unused: oracle SQL
    out = tempfile.mkdtemp(prefix="sot_out_")  # below is table-free
    try:
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump(oracles, f)
        for qname, sql in results.items():
            write_result(out, qname, sql)
        rc, txt = run_checker(sf, out)
        ok = (rc != 0) == (want_rc != 0) and want_frag in txt
        status = "ok" if ok else "SELFTEST FAILED"
        print(f"{status}: {name} (rc={rc}, want_rc={want_rc})")
        if not ok:
            print(txt)
        return ok
    finally:
        shutil.rmtree(sf, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def main():
    ok = True
    # green-on-right: identical values through the same canonicalization
    ok &= scenario(
        "matching result passes",
        {"q_ok": "SELECT 1 AS x, 'a' AS y, 1.5 AS z"},
        {"q_ok": "SELECT 1 AS x, 'a' AS y, 1.5 AS z"},
        want_rc=0, want_frag="OK   q_ok")
    # red-on-wrong, one scenario per checker branch:
    ok &= scenario(
        "wrong value fails",
        {"q_v": "SELECT 1 AS x"},
        {"q_v": "SELECT 2 AS x"},
        want_rc=1, want_frag="FAIL q_v")
    ok &= scenario(
        "wrong row count fails",
        {"q_r": "SELECT 1 AS x"},
        {"q_r": "SELECT 1 AS x UNION ALL SELECT 1"},
        want_rc=1, want_frag="FAIL q_r: rows")
    ok &= scenario(
        "wrong column name fails",
        {"q_c": "SELECT 1 AS x"},
        {"q_c": "SELECT 1 AS renamed"},
        want_rc=1, want_frag="FAIL q_c: columns")
    ok &= scenario(
        "missing result dump fails (the r7/r8 skip class)",
        {"q_m": "SELECT 1 AS x"},
        {},
        want_rc=1, want_frag="FAIL q_m")
    ok &= scenario(
        "row ORDER mismatch fails (ordering is part of the contract)",
        {"q_o": "SELECT * FROM (VALUES (1),(2)) t(x) ORDER BY x"},
        {"q_o": "SELECT * FROM (VALUES (1),(2)) t(x) ORDER BY x DESC"},
        want_rc=1, want_frag="FAIL q_o")
    ok &= scenario(
        "zero oracles refuses to pass vacuously",
        {}, {},
        want_rc=1, want_frag="vacuous")
    if not ok:
        print("== ORACLE HARNESS SELFTEST FAILED", file=sys.stderr)
        return 1
    print("== oracle harness selftest: all scenarios behaved")
    return 0


if __name__ == "__main__":
    sys.exit(main())
