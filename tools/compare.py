#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT engine code —
the engine is pure Scala/Spark; this replicates the driver's DuckDB compare
so oracle mismatches surface before the round gate runs).

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        spark_df = spark_rel.fetchdf()
        if name not in oracle:
            n_rowsonly += 1
            print(f"rows  {name}: {len(spark_df)} rows (no oracle)")
            continue
        try:
            oracle_rel = con.sql(oracle[name])
            oracle_df = oracle_rel.fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1
            continue
        # dtype drift is a HARD FAIL, compared on DuckDB-native result types
        # (not pandas dtypes): the driver's hash is dtype-sensitive even where
        # value equality holds (q_kaplan_meier r8: HUGEINT n_risk vs BIGINT),
        # and pandas' HUGEINT->float64 coercion could silently pass wrong
        # values above 2^53.
        s_types = {c: str(t) for c, t in zip(spark_rel.columns,
                                             spark_rel.types)}
        o_types = {c: str(t) for c, t in zip(oracle_rel.columns,
                                             oracle_rel.types)}
        dtype_fail = False
        for c in s.columns:
            if s_types[c] != o_types[c]:
                print(f"FAIL  {name}: col={c} dtype spark={s_types[c]} "
                      f"oracle={o_types[c]}")
                dtype_fail = True
        if dtype_fail:
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL  {name}: rows {len(s)} vs {len(o)}")
            n_fail += 1
            continue
        mismatch = None
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b and not (a is None and b is None):
                    import math
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                    # pandas NaN-vs-None for nullable cols
                    try:
                        if a != a and (b is None or b != b):
                            continue
                        if b != b and (a is None or a != a):
                            continue
                    except Exception:
                        pass
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL  {name}: col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
