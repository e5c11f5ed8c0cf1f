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


def encode_word(w, merges):
    syms = list(w) + [EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode(rows, merges):
    """Per-doc encoding: (doc_id, n_bpe_tokens, md5 of space-joined tokens).
    Sequential merge replay in training order — exact for trained tables
    (a merge's inputs only exist via earlier merges)."""
    import hashlib

    memo = {}
    out = []
    for doc_id, t in rows:
        toks = []
        for w in TOKEN.findall((t or "").lower()):
            if w not in memo:
                memo[w] = encode_word(w, merges)
            toks.extend(memo[w])
        s = " ".join(toks)
        out.append((doc_id, len(toks), hashlib.md5(s.encode()).hexdigest()))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = (sys.argv[3] if len(sys.argv) > 3
           else "src/test/resources/golden/bpe_merges_sf001.parquet")
    encode_out = sys.argv[4] if len(sys.argv) > 4 else None
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id").fetchall()
    texts = [r[1] for r in rows]
    merges = train(texts, n_merges)
    df = pd.DataFrame(
        [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)],
        columns=["rank", "left", "right", "merged"])
    df["rank"] = df["rank"].astype("int64")
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} merges -> {out}")
    for r in df.itertuples(index=False):
        print(r)
    if encode_out:
        enc = pd.DataFrame(encode(rows, merges),
                           columns=["doc_id", "n_bpe_tokens", "tokens_md5"])
        enc["doc_id"] = enc["doc_id"].astype("int64")
        enc["n_bpe_tokens"] = enc["n_bpe_tokens"].astype("int64")
        enc.to_parquet(encode_out, index=False)
        print(f"wrote {len(enc)} encodings -> {encode_out}")


if __name__ == "__main__":
    main()
