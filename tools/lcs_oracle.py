#!/usr/bin/env python3
"""Independent ROUGE-L front end for q264's pinned-literal oracle.

Like q179's zlib literals: an O(n*m) LCS DP is not SQL-replayable cell
by cell, so the DuckDB oracle pins per-pair LCS lengths computed HERE,
by an implementation that shares no code with the engine's
graft.functions.LcsLen. Pair construction mirrors q264 exactly:
candidates are documents with doc_id % 11 == 0, the reference is the
lang's exemplar (min doc_id), tokens are the first 32 [a-z]+ runs.

Usage: python3 tools/lcs_oracle.py /root/testdata/sf0.01
Prints the SQL VALUES rows `(doc_id, lcs)` to paste into the oracle.
"""
import re
import sys

import duckdb

CAP = 32


def toks(text):
    return re.findall(r"[a-z]+", text)[:CAP]


def lcs(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[len(b)]


def main(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    exemplar = {}
    for doc_id, lang, text in sorted(rows):
        exemplar.setdefault(lang, toks(text))
    out = []
    for doc_id, lang, text in sorted(rows):
        if doc_id % 11 == 0:
            out.append((doc_id, lcs(toks(text), exemplar[lang])))
    print(",".join(f"({d},{v})" for d, v in out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
