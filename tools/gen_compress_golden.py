#!/usr/bin/env python3
"""Dev-only golden generator for q_compress_ratio (NOT engine code — the
engine computes deflate sizes with java.util.zip.Deflater; this pins them
with CPython's zlib, which produces byte-identical streams at the same
level because both ARE zlib).

Emits per-source aggregates keyed by the corpus text-length discriminator:
(tl, source, n_docs, raw_bytes, comp_bytes). The comp_bytes SUM pins every
individual document's compressed length — any drift moves the sum.

Usage: python3 tools/gen_compress_golden.py /root/testdata/sf0.001 \
         /root/testdata/sf0.01 /root/testdata/sf0.1
"""
import sys
import zlib

import duckdb


def gen(sf_dir):
    rows = duckdb.query(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'").fetchall()
    disc = sum(len(t) for (_, t) in rows)
    agg = {}
    for src, t in rows:
        raw = t.encode("utf-8")
        comp = zlib.compress(raw, 6)
        n, r, c = agg.get(src, (0, 0, 0))
        agg[src] = (n + 1, r + len(raw), c + len(comp))
    return [(disc, src, n, r, c)
            for src, (n, r, c) in sorted(agg.items())]


def main():
    out = []
    for sf_dir in sys.argv[1:]:
        out.extend(gen(sf_dir))
    print("  val rows: String = \"\"\"")
    for i, (disc, src, n, r, c) in enumerate(out):
        sep = "," if i < len(out) - 1 else ""
        print(f"        ({disc}, '{src}', {n}, {r}, {c}){sep}")
    print("\"\"\"")


if __name__ == "__main__":
    main()
