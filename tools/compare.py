#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT engine code —
the engine is pure Scala/Spark; this replicates the driver's DuckDB compare
so oracle mismatches surface before the round gate runs).

Faithful-read-path rule (round-9 verdict ask #3): the driver reads the SPARK
side via pyarrow (DECIMAL columns surface as Python Decimal objects, dates as
datetime.date) and the ORACLE side via duckdb fetchdf (DECIMAL coerces to
float64), then hashes canonicalized cell strings. Round 9's 14 red rows were
value-identical DECIMAL outputs whose Decimal('399647.50') vs float64
'399647.5' renderings diverged — invisible to the previous mirror, which read
BOTH sides through DuckDB. This mirror therefore:

  - reads the Spark parquet with pyarrow.parquet.read_table().to_pandas()
    (the driver's path), the oracle with duckdb fetchdf;
  - compares CANONICALIZED CELL STRINGS, where canonicalization preserves
    representation class (str(Decimal) keeps trailing zeros, repr(float)
    doesn't) — so representation drift fails here exactly as it fails there;
  - keeps the DuckDB-native result-type check (rel.types) as a secondary
    hard gate: it catches declared-type drift (HUGEINT vs BIGINT,
    q_kaplan_meier r8) with a crisp message even where values would
    string-collide.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [name_filter...]
"""
import sys, json, glob, os, math, datetime, decimal
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def canon(v):
    """Driver-faithful cell canonicalization: representation-preserving."""
    if v is None:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<null>"  # NaN≈NULL for pandas nullable coercion
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)  # trailing zeros PRESERVED — the r9 divergence class
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, datetime.date):
        # date widened to midnight so date32-as-object (pyarrow) and
        # datetime64 (fetchdf) canonicalize identically
        return str(datetime.datetime(v.year, v.month, v.day))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, str):
        return v
    try:
        if v != v:  # pandas NaT / NA
            return "<null>"
    except Exception:
        pass
    return repr(v)


def canon_df(df):
    return [[canon(v) for v in df[c].tolist()] for c in df.columns]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    name_filter = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    if name_filter is not None:
        names = [n for n in names if n in name_filter]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        # the driver's read path: pyarrow → pandas (Decimal stays Decimal)
        spark_df = pd.concat(
            [pq.read_table(f).to_pandas() for f in files],
            ignore_index=True)
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
        # secondary hard gate: DuckDB-native declared result types on both
        # sides (HUGEINT-vs-BIGINT class, q_kaplan_meier r8) — kept from the
        # previous mirror because its failure message names the drifted type.
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
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
        # primary gate: canonicalized cell strings on the driver's own read
        # paths — representation drift (Decimal trailing zeros) fails HERE.
        sc, oc = canon_df(s), canon_df(o)
        mismatch = None
        for ci, c in enumerate(s.columns):
            for i, (a, b) in enumerate(zip(sc[ci], oc[ci])):
                if a != b:
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
