#!/usr/bin/env python3
"""Dev-only golden generator for q_bpe_merges (NOT engine code — the engine
is pure Scala/Spark; this is an INDEPENDENT pure-Python BPE trainer whose
output pins the Spark operator, the SimhashGolden pattern).

Semantics replicated (graft.operators.Bpe.learnMerges): whitespace words of
trim(text), character symbols (no end-of-word marker), adjacent-pair counts
weighted by word frequency (overlapping occurrences all count), winner =
(count DESC, left ASC, right ASC), greedy left-to-right non-overlapping
rewrite, 20 merges.

Usage: python3 tools/gen_bpe_golden.py /root/testdata/sf0.001 \
         /root/testdata/sf0.01 /root/testdata/sf0.1
Emits the VALUES rows for graft.queries.BpeGolden (disc = SUM(len(text))).
"""
import re
import sys

import duckdb


def learn(sf_dir, num_merges=20):
    rows = duckdb.query(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    disc = sum(len(t) for (t,) in rows)
    counts = {}
    for (t,) in rows:
        for w in re.split(r"\s+", t.strip()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    words = {tuple(w): c for w, c in counts.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((disc, rank, a, b, cnt, a + b))
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    # encode top-k: the final word table IS the encoded corpus
    sub = {}
    for syms, c in words.items():
        for s in syms:
            sub[s] = sub.get(s, 0) + c
    top = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    encode = [(disc, r + 1, s, c) for r, (s, c) in enumerate(top)]
    return merges, encode


def main():
    all_rows, all_enc = [], []
    for sf_dir in sys.argv[1:]:
        m, e = learn(sf_dir)
        all_rows.extend(m)
        all_enc.extend(e)
    print("  val rows: String = \"\"\"")
    for i, (disc, rank, a, b, cnt, m) in enumerate(all_rows):
        sep = "," if i < len(all_rows) - 1 else ""
        print(f"        ({disc}, {rank}, '{a}', '{b}', {cnt}, '{m}'){sep}")
    print("\"\"\"")
    print("  val encodeRows: String = \"\"\"")
    for i, (disc, rank, s, c) in enumerate(all_enc):
        sep = "," if i < len(all_enc) - 1 else ""
        print(f"        ({disc}, {rank}, '{s}', {c}){sep}")
    print("\"\"\"")


if __name__ == "__main__":
    main()
