#!/usr/bin/env python3
"""Generate the fuzzy-strategy golden for the q_entity_resolution oracle.

The cascade's fuzzy_matching strategy is difflib's SequenceMatcher ratio
(enhanced_mapping.py:569-610), which has no DuckDB twin. For the harness's
fuzzy class (c_custkey % 6 == 5) this script computes, with the REAL difflib
over the SAME normalization the engine uses, the argmax candidate and its
confidence (ratio * 0.6, tie-break lowest cand_ord), and prints an inline SQL
VALUES block to paste into the DuckDB twin. repr() floats round-trip exactly,
and the engine's RatcliffObershelp expression is bit-identical to difflib
(SimilaritySpec), so the hash compare is exact.

Regenerate after changing the harness: python3 tools/gen_fuzzy_golden.py
"""
import difflib
import sys
import re

RULES = [
    (r"\bFC\b", ""), (r"\bCF\b", ""), (r"\bAC\b", ""), (r"\bSC\b", ""),
    (r"\bASC\b", ""), (r"\bClub\b", ""), (r"\bOlympique\b", ""),
    (r"\bSporting\b", ""), (r"\bUnited\b", "Utd"), (r"\bHotspur\b", ""),
    ("&", "and"),
]

ACCENT_FROM = "éèêëáàâãäíìîïóòôõöúùûüçñÉÈÊËÁÀÂÃÄÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑ"
ACCENT_TO = "eeeeaaaaaiiiiooooouuuucneeeeaaaaaiiiiooooouuuucn"


def norm(s: str) -> str:
    for pat, repl in RULES:
        s = re.sub(pat, repl, s, flags=re.IGNORECASE)
    s = s.translate(str.maketrans(ACCENT_FROM, ACCENT_TO))
    return re.sub(r"\s+", " ", s).strip().lower()


def candidates():
    out = []
    for k in range(0, 120):  # custkey starts at 0 in the testdata
        base = f"Customer {k:09d}"
        m = k % 6
        cand = {
            0: base,
            1: f"mx{k}",
            2: f"lx{k}",
            3: base + " FC",
            4: f"{k:09d} Customer",
            5: base + "x",
        }[m]
        out.append((cand, k))
    return out


def fuzzy_join_pairs(limit: int, tau: float):
    """Golden for q_fuzzy_join: all (c_custkey, cand_ord) with
    difflib ratio(norm(api), norm(cand)) > tau, custkey/ord < limit."""
    cands = [(c, o) for c, o in candidates() if o < limit]
    rows = []
    for k in range(0, limit):
        api = f"Customer {k:09d}"
        na = norm(api)
        for cand, ord_ in cands:
            if difflib.SequenceMatcher(None, na, norm(cand)).ratio() > tau:
                rows.append((k, ord_))
    print(f"-- {len(rows)} pairs, custkey < {limit}, ratio > {tau}")
    print("      VALUES")
    print(",\n".join(f"        ({a}, {b})" for a, b in rows))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "pairs":
        fuzzy_join_pairs(limit=30, tau=0.8)
        return
    cands = candidates()
    rows = []
    for k in range(0, 120):
        if k % 6 != 5:
            continue
        api = f"Customer {k:09d}"
        na = norm(api)
        scored = []
        for cand, ord_ in cands:
            sim = difflib.SequenceMatcher(None, na, norm(cand)).ratio()
            if sim > 0.4:
                scored.append((sim, ord_, cand))
        scored.sort(key=lambda t: (-t[0], t[1]))
        sim, _, cand = scored[0]
        rows.append((api, cand, sim * 0.6))
    print("      VALUES")
    body = ",\n".join(
        f"        ('{api}', '{cand}', CAST({conf!r} AS DOUBLE))"
        for api, cand, conf in rows)
    print(body)


if __name__ == "__main__":
    main()
