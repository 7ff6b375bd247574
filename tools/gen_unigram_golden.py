#!/usr/bin/env python3
"""Dev-only golden generator for q_unigram_vocab / q_unigram_encode (NOT
engine code — the engine is pure Scala/Spark; this is an INDEPENDENT
pure-Python unigram-LM trainer whose output pins the Spark operator, the
gen_bpe_golden.py pattern).

Semantics replicated (graft.operators.Unigram, deterministic integer
variant — no float anywhere):
  - words: whitespace tokens of trim(text), weighted by frequency;
  - seed: substrings of length 1..6 scored by weighted overlapping
    occurrence counts; vocab = all single chars + top-300 multi-char by
    (score DESC, piece ASC);
  - 3 EM rounds: cost(p) = ilog2(sum scores) - ilog2(score(p)) with
    ilog2 = bit_length - 1; Viterbi per word with candidate splits
    scanned j ASCENDING and STRICT tuple comparison on
    (cost, piece count) — earlier j wins full ties; new score =
    weighted best-path counts; singles floored at 1, multi keeps
    top-300 with score >= 1;
  - vocab report: top-60 by (score DESC, piece ASC);
  - encode: segment with the FULL final table, count weighted subword
    usage, top-50 by (cnt DESC, piece ASC).

Usage: python3 tools/gen_unigram_golden.py /root/testdata/sf0.001 \
         /root/testdata/sf0.01 /root/testdata/sf0.1
Emits the VALUES rows for graft.queries.UnigramGolden
(disc = SUM(len(text))).
"""
import re
import sys

import duckdb

MAX_LEN = 6
SEED = 300
ROUNDS = 3
VOCAB = 60
ENC_K = 50


def ilog2(x):
    return x.bit_length() - 1


def viterbi(word, costs):
    m = len(word)
    INF = float("inf")
    cost = [INF] * (m + 1)
    np_ = [INF] * (m + 1)
    back = [-1] * (m + 1)
    cost[0], np_[0] = 0, 0
    for i in range(1, m + 1):
        for j in range(max(0, i - MAX_LEN), i):
            if cost[j] == INF:
                continue
            c = costs.get(word[j:i])
            if c is None:
                continue
            cc, nn = cost[j] + c, np_[j] + 1
            # strict (cost, pieces) <; j ascending keeps earliest j on ties
            if cc < cost[i] or (cc == cost[i] and nn < np_[i]):
                cost[i], np_[i], back[i] = cc, nn, j
    if cost[m] == INF:
        return list(word)  # per-char fallback (unreachable in practice)
    out = []
    cur = m
    while cur > 0:
        j = back[cur]
        out.append(word[j:cur])
        cur = j
    return out[::-1]


def train(sf_dir):
    rows = duckdb.query(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    disc = sum(len(t) for (t,) in rows)
    words = {}
    for (t,) in rows:
        for w in re.split(r"\s+", t.strip()):
            if w:
                words[w] = words.get(w, 0) + 1
    # seed
    seed = {}
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(1, min(MAX_LEN, len(w) - i) + 1):
                p = w[i:i + l]
                seed[p] = seed.get(p, 0) + n
    singles = {p for p in seed if len(p) == 1}
    multi = sorted(((p, s) for p, s in seed.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:SEED]
    vocab = {p: s for p in singles for s in [seed[p]]}
    vocab.update(dict(multi))
    for _ in range(ROUNDS):
        total = sum(vocab.values())
        costs = {p: ilog2(total) - ilog2(s) for p, s in vocab.items()}
        counts = {}
        for w, n in words.items():
            for p in viterbi(w, costs):
                counts[p] = counts.get(p, 0) + n
        multi = sorted(((p, s) for p, s in counts.items()
                        if len(p) > 1 and s >= 1),
                       key=lambda kv: (-kv[1], kv[0]))[:SEED]
        vocab = {c: max(counts.get(c, 1), 1) for c in singles}
        vocab.update(dict(multi))
    report = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB]
    vocab_rows = [(disc, r + 1, p, s) for r, (p, s) in enumerate(report)]
    # encode with the FULL final table
    total = sum(vocab.values())
    costs = {p: ilog2(total) - ilog2(s) for p, s in vocab.items()}
    enc = {}
    for w, n in words.items():
        for p in viterbi(w, costs):
            enc[p] = enc.get(p, 0) + n
    top = sorted(enc.items(), key=lambda kv: (-kv[1], kv[0]))[:ENC_K]
    enc_rows = [(disc, r + 1, p, c) for r, (p, c) in enumerate(top)]
    return vocab_rows, enc_rows


def esc(s):
    return s.replace("'", "''")


def main():
    all_v, all_e = [], []
    for sf_dir in sys.argv[1:]:
        v, e = train(sf_dir)
        all_v.extend(v)
        all_e.extend(e)
    print("  val rows: String = \"\"\"")
    for i, (disc, rank, p, s) in enumerate(all_v):
        sep = "," if i < len(all_v) - 1 else ""
        print(f"        ({disc}, {rank}, '{esc(p)}', {s}){sep}")
    print("\"\"\"")
    print("  val encodeRows: String = \"\"\"")
    for i, (disc, rank, p, c) in enumerate(all_e):
        sep = "," if i < len(all_e) - 1 else ""
        print(f"        ({disc}, {rank}, '{esc(p)}', {c}){sep}")
    print("\"\"\"")


if __name__ == "__main__":
    main()
