#!/usr/bin/env python3
"""Regression self-test for tools/compare.py's driver-faithful read path.

Round 9 shipped 14 driver-red DECIMAL gates while the local mirror said
389/389: the old mirror read BOTH sides through DuckDB, so the driver's
pyarrow-Decimal('…0') vs DuckDB-pandas-float64 trailing-zero divergence was
invisible. tools/fixtures/decimal_repr_pre_fix/ holds the PRE-FIX
q_fuzz_2001 Spark parquet (DECIMAL(38,2) a0 column, value-identical to its
oracle) — the mirror must FAIL it. If this test ever passes that fixture,
the mirror has regressed into the round-9 blind spot.

Usage: python3 tools/test_compare_mirror.py [sf_dir]
"""
import os, subprocess, sys

here = os.path.dirname(os.path.abspath(__file__))
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
fixture = os.path.join(here, "fixtures", "decimal_repr_pre_fix")

p = subprocess.run(
    [sys.executable, os.path.join(here, "compare.py"), fixture, sf],
    capture_output=True, text=True)
out = p.stdout + p.stderr
ok_exit = p.returncode == 1
ok_fail = "FAIL  q_fuzz_2001" in out
if ok_exit and ok_fail:
    print("PASS  mirror correctly FAILS the pre-fix DECIMAL fixture")
    sys.exit(0)
print("SELF-TEST FAILED: the mirror no longer reproduces the driver's "
      "decimal-representation sensitivity")
print(out)
sys.exit(1)
