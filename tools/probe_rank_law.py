#!/usr/bin/env python3
"""DuckDB half of the cross-engine discrete-percentile rank law.

q_quality_calibrated / q_perplexity_filter compare keep-flags exactly
because both engines pick the SAME actual row value as the cutoff:
  Spark  percentile_approx(x, p, 2147483647)  (exact mode)
  DuckDB quantile_disc(x, p)
both resolve to the value at sorted rank ceil(p * n) (1-based).

PercentileRankLawSpec pins the Spark side in ScalaTest; this probe pins
the DuckDB side, so a DuckDB upgrade that changes the quantile_disc
convention fails loudly here instead of surfacing as a mysterious
hash mismatch in the differential gate.

Usage: python3 tools/probe_rank_law.py   (exit 1 on any mismatch)
"""
import math
import sys

import duckdb


def main() -> int:
    con = duckdb.connect()
    bad = []
    # n=1..9 covers every rank-boundary case (ceil crossing each
    # integer); values are deliberately non-uniform so an interpolating
    # implementation cannot accidentally match.
    for n in range(1, 10):
        vals = [round((i * 7 % n) + i / 8.0, 3) for i in range(n)]
        for p in (0.2, 0.5, 0.9):
            expect = sorted(vals)[math.ceil(p * n) - 1]
            got = con.execute(
                "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
                [p, vals],
            ).fetchone()[0]
            if got != expect:
                bad.append((n, p, expect, got))
    if bad:
        for n, p, expect, got in bad:
            print(f"RANK LAW MISMATCH n={n} p={p}: "
                  f"rank-law value {expect}, quantile_disc {got}")
        return 1
    print("rank law OK: quantile_disc == value at rank ceil(p*n) "
          "for n=1..9, p in {0.2, 0.5, 0.9}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
