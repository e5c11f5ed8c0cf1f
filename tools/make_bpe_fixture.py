#!/usr/bin/env python3
"""Golden fixture for q98_bpe_merges: an INDEPENDENT reimplementation of
classic word-frequency BPE training (Sennrich et al. 2016), run over the
sf0.01 documents corpus. The Scala engine (graft.operators.Bpe) must learn
the identical merge table — same tokenizer ([a-z0-9]+ on lowercased text),
same end-of-word marker, same (count desc, pair asc) tie-break, same
stop-below-2 rule — so a hash match on this fixture checks the distributed
formulation against a from-scratch single-process one.

Usage: python3 tools/make_bpe_fixture.py [sf_dir] [n_merges] [out.parquet]
"""
import re
import sys
from collections import Counter

import duckdb
import pandas as pd

EOW = "</w>"
TOKEN = re.compile(r"[a-z0-9]+")


def train(texts, n_merges):
    freqs = Counter()
    for t in texts:
        if t:
            freqs.update(TOKEN.findall(t.lower()))
    words = {tuple(w) + (EOW,): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # argmax by count desc, then ASCENDING on the space-joined pair
        # string (the Scala side sorts the "a b" pair key lexicographically)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        new_words = {}
        for syms, f in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    return merges


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = (sys.argv[3] if len(sys.argv) > 3
           else "src/test/resources/golden/bpe_merges_sf001.parquet")
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')").fetchall()]
    merges = train(texts, n_merges)
    df = pd.DataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        columns=["rank", "left", "right", "merged"])
    df["rank"] = df["rank"].astype("int64")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} merges -> {out}")
    for r in df.itertuples(index=False):
        print(r)


if __name__ == "__main__":
    main()
