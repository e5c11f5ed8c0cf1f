#!/usr/bin/env python3
"""Regeneration-robustness audit input: a perturbed copy of one testdata SF.

Copies every table verbatim except `documents`, which gains planted
borderline near-dup pairs right at the dedup thresholds the engine uses
(J = 0.5 exactly, J just above, J just below — from disjoint synthetic
vocabulary so the existing corpus is untouched), plus a deterministic row
shuffle. Running `graft.Verify` + `tools/check.py` against the output
proves the oracles are STRUCTURAL (Spark == DuckDB on any corpus), not
calibrated to one generator draw — the failure class the round-5
exact-recall guard on q23 eliminates.

Fixture-scoped queries (q19/q39/q98/q131/q143 compare against goldens
generated from the ORIGINAL corpus by the reference implementation) are
expected to mismatch here; every other query must stay green.

Usage: python3 tools/perturb_testdata.py [src_sf_dir] [out_dir]
"""
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_perturbed")

OUT.mkdir(parents=True, exist_ok=True)
for f in SRC.glob("*.parquet"):
    if f.name not in ("documents.parquet", "embeddings.parquet"):
        shutil.copyfile(f, OUT / f.name)

con = duckdb.connect()
max_id, = con.execute(
    f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()

rows = []


def add(doc_id, words):
    text = " ".join(words)
    rows.append((doc_id, text, "en", "srcx", len(text)))


# 30 pairs at J = 0.5 exactly: 8 shared words -> 6 shared 3-gram shingles,
# 3 distinct tail words each -> 9 shingles per doc, J = 6/(9+9-6) = 0.5.
# 16x2 MinHash banding misses each with ~1% probability; across 30 pairs a
# miss is a ~26% event per reseed — exactly what the structural guard must
# absorb.
nid = max_id + 1
for g in range(30):
    shared = [f"zb{g}w{i}" for i in range(8)]
    add(nid, shared + [f"za{g}x{i}" for i in range(3)])
    add(nid + 1, shared + [f"zc{g}y{i}" for i in range(3)])
    nid += 2
# 10 pairs just ABOVE threshold (7 of 9+9 -> J = 7/11 ~ 0.636)
for g in range(10):
    shared = [f"zd{g}w{i}" for i in range(9)]
    add(nid, shared + [f"ze{g}x{i}" for i in range(2)])
    add(nid + 1, shared + [f"zf{g}y{i}" for i in range(2)])
    nid += 2
# 10 pairs just BELOW threshold (5 of 9+9 -> J = 5/13 ~ 0.385)
for g in range(10):
    shared = [f"zg{g}w{i}" for i in range(7)]
    add(nid, shared + [f"zh{g}x{i}" for i in range(4)])
    add(nid + 1, shared + [f"zi{g}y{i}" for i in range(4)])
    nid += 2

con.execute("CREATE TABLE planted (doc_id BIGINT, text VARCHAR, "
            "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO planted VALUES (?, ?, ?, ?, ?)", rows)
# deterministic shuffle: a regeneration never preserves row order either
con.execute(f"""
    COPY (SELECT * FROM (
            SELECT * FROM '{SRC}/documents.parquet'
            UNION ALL SELECT * FROM planted)
          ORDER BY hash(doc_id * 2654435761))
    TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")
n, = con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()
print(f"perturbed corpus at {OUT}: {n} docs ({len(rows)} planted)")

# embeddings: append seeded random unit vectors (fresh ids, same dim) and
# near-duplicates of existing vectors right at the q22 cosine-0.4 regime —
# the similarity family's oracles are exact/exhaustive, so Spark == DuckDB
# must hold on any vector set; this perturbs the draw they run against.
import random

dim, = con.execute(
    f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
).fetchone()
max_vid, = con.execute(
    f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'").fetchone()
rng = random.Random(42)
vrows = []
for j in range(40):
    v = [rng.gauss(0, 1) for _ in range(dim)]
    nrm = sum(x * x for x in v) ** 0.5 or 1.0
    vrows.append((max_vid + 1 + j, [x / nrm for x in v], j % 8))
con.execute("CREATE TABLE pv (vec_id BIGINT, embedding FLOAT[], "
            "label INTEGER)")
con.executemany("INSERT INTO pv VALUES (?, ?, ?)", vrows)
con.execute(f"""
    COPY (SELECT * FROM (
            SELECT * FROM '{SRC}/embeddings.parquet'
            UNION ALL SELECT * FROM pv)
          ORDER BY hash(vec_id * 2654435761))
    TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")
nv, = con.execute(
    f"SELECT count(*) FROM '{OUT}/embeddings.parquet'").fetchone()
print(f"perturbed embeddings at {OUT}: {nv} vectors ({len(vrows)} planted)")
