#!/usr/bin/env python3
"""Dev-only golden generator for q_wordpiece_* (NOT engine code — the
engine is pure Scala/Spark; this is an INDEPENDENT pure-Python WordPiece
trainer + max-munch tokenizer whose output pins the Spark operator, the
BpeGolden pattern).

Semantics replicated (graft.operators.WordPiece / graft.functions
.WordPieceTokenize): whitespace words of trim(text); initial symbols
[c0, ##c1, ##c2, ...]; per round the merged pair maximizes
count(l,r)/(count(l)*count(r)) under EXACT integer cross-multiplied
comparison with (l ASC, r ASC) tie-break; merged = l + r without its
'##'; greedy left-to-right non-overlapping rewrite; 20 merges.
Tokenize: vocab = alphabet ∪ merged pieces; per word greedy
longest-match-first with '##' lookup after position 0; any unmatchable
position → whole word ['[UNK]'].

Usage: python3 tools/gen_wordpiece_golden.py /root/testdata/sf0.001 \
         /root/testdata/sf0.01 /root/testdata/sf0.1
Emits VALUES rows for graft.queries.WordpieceGolden (disc = SUM(len(text))).
"""
import re
import sys

import duckdb


def init_syms(w):
    return tuple([w[0]] + ["##" + c for c in w[1:]])


def learn(sf_dir, num_merges=20, k=50):
    rows = duckdb.query(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    disc = sum(len(t) for (t,) in rows)
    counts = {}
    for (t,) in rows:
        for w in re.split(r"\s+", t.strip()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    word_freq = dict(counts)
    words = {}
    for w, c in counts.items():
        key = init_syms(w)
        words[key] = words.get(key, 0) + c
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = {}
        syms_cnt = {}
        for syms, c in words.items():
            for s in syms:
                syms_cnt[s] = syms_cnt.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = None
        for (l, r), cnt in pairs.items():
            if best is None:
                best = (l, r, cnt)
            else:
                bl, br, bc = best
                lhs = cnt * syms_cnt[bl] * syms_cnt[br]
                rhs = bc * syms_cnt[l] * syms_cnt[r]
                if lhs > rhs or (lhs == rhs and (l, r) < (bl, br)):
                    best = (l, r, cnt)
        l, r, cnt = best
        m = l + (r[2:] if r.startswith("##") else r)
        merges.append((disc, rank, l, r, cnt, m))
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(m)
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
    top = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    encode = [(disc, r + 1, s, c) for r, (s, c) in enumerate(top)]
    # tokenize top-k: max-munch against alphabet ∪ merged pieces
    vocab = set()
    for w in word_freq:
        for s in init_syms(w):
            vocab.add(s)
    for (_, _, _, _, _, m) in merges:
        vocab.add(m)
    max_piece = max(len(p) for p in vocab)

    def max_munch(w):
        out, i = [], 0
        while i < len(w):
            prefix = "" if i == 0 else "##"
            end = min(len(w), i + max(0, max_piece - len(prefix)))
            hit = None
            while hit is None and end > i:
                cand = prefix + w[i:end]
                if cand in vocab:
                    hit = cand
                else:
                    end -= 1
            if hit is None:
                return ["[UNK]"]
            out.append(hit)
            i = end
        return out

    tok = {}
    for w, c in word_freq.items():
        for p in max_munch(w):
            tok[p] = tok.get(p, 0) + c
    ttop = sorted(tok.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    tokenize = [(disc, r + 1, s, c) for r, (s, c) in enumerate(ttop)]
    return merges, encode, tokenize


def main():
    all_m, all_e, all_t = [], [], []
    for sf_dir in sys.argv[1:]:
        m, e, t = learn(sf_dir)
        all_m.extend(m)
        all_e.extend(e)
        all_t.extend(t)
    print("  val rows: String = \"\"\"")
    for i, (disc, rank, a, b, cnt, m) in enumerate(all_m):
        sep = "," if i < len(all_m) - 1 else ""
        print(f"        ({disc}, {rank}, '{a}', '{b}', {cnt}, '{m}'){sep}")
    print("\"\"\"")
    print("  val encodeRows: String = \"\"\"")
    for i, (disc, rank, s, c) in enumerate(all_e):
        sep = "," if i < len(all_e) - 1 else ""
        print(f"        ({disc}, {rank}, '{s}', {c}){sep}")
    print("\"\"\"")
    print("  val tokenizeRows: String = \"\"\"")
    for i, (disc, rank, s, c) in enumerate(all_t):
        sep = "," if i < len(all_t) - 1 else ""
        print(f"        ({disc}, {rank}, '{s}', {c}){sep}")
    print("\"\"\"")


if __name__ == "__main__":
    main()
