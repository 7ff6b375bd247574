#!/usr/bin/env python3
"""Independent golden generator for q_simhash_pairs.

Recomputes the 64-bit FNV-1a SimHash (the engine's documented, public
algorithm — see src/main/scala/graft/functions/SimHash.scala) in pure
Python over the sf0.01 documents table, plants the same exact-duplicate
copies the query plants (every 20th doc at doc_id + 100000), and finds
ALL pairs with Hamming distance <= 3 by brute force (no blocking).

Because this is a different language, a different runtime, and a
different candidate algorithm (all-pairs vs 16-bit-block pigeonhole),
agreement pins both the SimHash implementation and the completeness of
the block-bucketed candidate generation.

Tokenization mirrors TextFeatures.wsTokens(lower(text)): Java regex \\s
is ASCII-only, so we split on [ \t\n\x0b\f\r]+ exactly.

Usage: python3 tools/gen_simhash_golden.py /root/testdata/sf0.01
Prints the VALUES rows to paste into the oracle SQL in TextQueries.
"""
import re
import sys

import pyarrow.parquet as pq

MASK = (1 << 64) - 1


def fnv1a64(b: bytes) -> int:
    h = 0xcbf29ce484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001b3) & MASK
    return h


def simhash64(tokens) -> int:
    counts = [0] * 64
    for t in tokens:
        h = fnv1a64(t.encode("utf-8"))
        for bit in range(64):
            if (h >> bit) & 1:
                counts[bit] += 1
            else:
                counts[bit] -= 1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out


def tokens(text: str):
    # Java \s+ split after trim; filter empties
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", text.strip()) if t]


def main(sf_dirs) -> None:
    # Each golden row is tagged with the corpus discriminator SUM(len(text))
    # (distinct across the driver's scale factors), so ONE static twin SQL
    # serves every SF: the twin computes the same sum over `documents` at
    # run time and keeps only the matching rows.
    all_rows = []
    for sf_dir in sf_dirs:
        tab = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
        docs = list(zip(tab.column("doc_id").to_pylist(),
                        tab.column("text").to_pylist()))
        tag = sum(len(t) for _, t in docs)
        sigs = [(doc_id, simhash64(tokens(text.lower())))
                for doc_id, text in docs]
        # the query plants an exact copy of every 20th doc at an offset id
        sigs += [(doc_id + 100000, sh) for doc_id, sh in sigs
                 if doc_id % 20 == 0]
        sigs.sort()
        pairs = []
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                d = bin(sigs[i][1] ^ sigs[j][1]).count("1")
                if d <= 3:
                    pairs.append((sigs[i][0], sigs[j][0], d))
        pairs.sort()
        hist = {}
        for _, _, d in pairs:
            hist[d] = hist.get(d, 0) + 1
        print(f"-- {sf_dir}: tag={tag}, {len(pairs)} pairs, "
              f"hamming histogram {sorted(hist.items())}", file=sys.stderr)
        all_rows += [(a, b, d, tag) for a, b, d in pairs]
    print(",\n".join(f"({a}, {b}, {d}, {t})" for a, b, d, t in all_rows))


if __name__ == "__main__":
    main(sys.argv[1:])
