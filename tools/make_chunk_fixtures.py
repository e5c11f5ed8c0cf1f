#!/usr/bin/env python3
"""Golden-fixture generator for chunker parity (SURVEY §7.5 risk 2).

Runs the REFERENCE chunker (`/root/reference/.../chunker.py`, imported by
file path — its code never enters this repo) over (a) each scale factor's
documents table, (b) a synthetic corpus that exercises the packing /
overlap / force-split paths the short real corpus never reaches, and
(c/d) the flagship and full-spine pipelines' cleaned+filtered text (clean
rules = q13's oracle SQL, extraction = q128's oracle SQL, evaluated by
DuckDB so those semantics are the already-verified ones).

Per-SF outputs (committed; the q19/q39/q131 oracles resolve the tag from
Verify's sfDir via graft.Fixtures, so the correctness gate is valid at
ANY of the generated scales, not only sf0.01):
  src/test/resources/golden/chunks_{sf0001,sf001,sf01}.parquet
  src/test/resources/golden/flagship_chunks_{...}.parquet
  src/test/resources/golden/spine_chunks_{...}.parquet
  src/test/resources/golden/chunks_synthetic.parquet   (SF-independent)

Dev-tooling only (driver-side python) — the Scala library has no python
dependency.
"""
import hashlib
import importlib.util
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

REF = "/root/reference/src/DataPipeline/preprocessing/chunker.py"
OUT = "/root/repo/src/test/resources/golden"

spec = importlib.util.spec_from_file_location("refchunker", REF)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
chunker = mod.DocumentChunker()  # size=512, overlap=50, min=100

SFS = [("/root/testdata/sf0.001", "sf0001"),
       ("/root/testdata/sf0.01", "sf001"),
       ("/root/testdata/sf0.1", "sf01")]
# Override: `make_chunk_fixtures.py <dir> <tag>` generates for ONE corpus
# (e.g. the tools/perturb_testdata.py output, tag graft_perturbed) —
# graft.Fixtures derives the tag from the sfDir basename with dots removed.
if len(sys.argv) >= 3:
    SFS = [(sys.argv[1], sys.argv[2])]

CLEAN_SQL = r"""
SELECT doc_id, source,
trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  text, 'https?://[^ \t\n\r\f\x0B]+', ' ', 'g'),
  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'),
  '\[[0-9, ]+\]', ' ', 'g'),
  '\([A-Za-z]+ et al[.,][^)]*\)', ' ', 'g'),
  '[^a-zA-Z0-9 .,;:!?()''-]', ' ', 'g'),
  '  *', ' ', 'g')) AS clean_text
FROM read_parquet('{sf}/documents.parquet')
"""


def chunk_rows(doc_id, text):
    for c in chunker.chunk_document(text, str(doc_id)):
        yield {
            "doc_id": doc_id,
            "chunk_id": c.chunk_id,
            "position": c.position,
            "token_count": c.token_count,
            "start_char": c.start_char,
            "end_char": c.end_char,
            "chunk_md5": hashlib.md5(c.text.encode("utf-8")).hexdigest(),
        }


def write(rows, path, schema):
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path)
    print(f"wrote {len(rows):5d} rows -> {path}")


CHUNK_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("chunk_id", pa.string()),
    ("position", pa.int32()),
    ("token_count", pa.int32()),
    ("start_char", pa.int32()),
    ("end_char", pa.int32()),
    ("chunk_md5", pa.string()),
])

# (a) raw corpus -> q19 oracle fixture, per SF
for sf, tag in SFS:
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    rows = [r for d, t in docs for r in chunk_rows(d, t)]
    write(rows, f"{OUT}/chunks_{tag}.parquet", CHUNK_SCHEMA)

# (b) synthetic corpus: long docs that hit packing, overlap carry,
# force-split (incl. monster words) and boundary conditions. The TEXT is
# stored too so ChunkingSpec can re-chunk it in Scala and compare.
def mk(i, text):
    return {"case_id": i, "text": text}

synth = [
    mk(0, "Short but over the minimum. " * 5),                      # 1 chunk
    mk(1, ("This is a sentence with some words in it. " * 300)),    # packing+overlap
    mk(2, "x" * 9000),                                              # force-split, one giant unsplittable word
    mk(3, ("word " * 2500).strip()),                                # force-split by words
    mk(4, ("A" * 2047) + ". " + ("B" * 2047) + ". " + ("C" * 300) + "."),  # boundary at 512 tokens
    mk(5, "Tiny."),                                                 # below min -> no chunks
    mk(6, ("Mixed! Ends? Yes. " * 200) + ("y" * 5000) + " tail sentence after the monster. " * 20),
    mk(7, ("Exact boundary test. " * 97)),                          # ~2037 chars
    mk(8, "  Leading   whitespace, and\t\ttabs.  " + ("Padding sentence here. " * 10)),
    mk(9, ("Unicode ε spaces and thin. " * 30)),          # unicode whitespace in split
    # NBSP/py-whitespace parity: leading U+00A0 on the first segment (Python
    # str.strip removes it, Java String.strip does not) and a \x1c file
    # separator as the sentence gap (Python re \s matches it, Java's
    # Unicode \s does not) — pins TextFns.pyStrip + the widened split class
    mk(10, " Leading nbsp one. Alpha ends.\x1cBeta after separator. "
           + "Normal sentence follows here.  Narrow gap tail. " * 6),
]
synth_rows = []
for s in synth:
    for c in chunker.chunk_document(s["text"], f"case{s['case_id']}"):
        synth_rows.append({
            "case_id": s["case_id"],
            "text": s["text"],
            "chunk_id": c.chunk_id,
            "position": c.position,
            "chunk_text": c.text,
            "token_count": c.token_count,
            "start_char": c.start_char,
            "end_char": c.end_char,
        })
SYNTH_SCHEMA = pa.schema([
    ("case_id", pa.int64()),
    ("text", pa.string()),
    ("chunk_id", pa.string()),
    ("position", pa.int32()),
    ("chunk_text", pa.string()),
    ("token_count", pa.int32()),
    ("start_char", pa.int32()),
    ("end_char", pa.int32()),
])
write(synth_rows, f"{OUT}/chunks_synthetic.parquet", SYNTH_SCHEMA)

# Also record which synthetic cases produced zero chunks (parity includes
# the empty outcomes).
print("zero-chunk cases:",
      [s["case_id"] for s in synth
       if not chunker.chunk_document(s["text"], "z")])

# (c) flagship path: q13-clean -> len >= 200 -> chunk(clean) -> per-chunk
# (doc_id, source, token_count) for the q39 aggregate oracle, per SF.
FLAG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("source", pa.string()),
    ("token_count", pa.int32()),
])
for sf, tag in SFS:
    flag_rows = []
    for doc_id, source, clean in duckdb.sql(CLEAN_SQL.format(sf=sf)).fetchall():
        if clean is not None and len(clean) >= 200:
            for c in chunker.chunk_document(clean, str(doc_id)):
                flag_rows.append({
                    "doc_id": doc_id,
                    "source": source,
                    "token_count": c.token_count,
                })
    write(flag_rows, f"{OUT}/flagship_chunks_{tag}.parquet", FLAG_SCHEMA)

# (d) FULL spine (q131): q128's extraction synthesis+gates (verified SQL)
# -> q13's clean rules -> len >= 200 -> reference chunker over that text.
# Extraction depends only on doc_id mod and length gates, so it restates
# in SQL exactly as q128's green oracle does.
SPINE_SQL = r"""
WITH f AS (SELECT doc_id, source, text, length(text) AS n,
    substr(text, 1, 120) AS abst,
    CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40) END AS tldr
  FROM read_parquet('{sf}/documents.parquet')),
g AS (SELECT *,
    (doc_id % 4 = 0 OR doc_id % 4 = 1) AND n > 200 AS html_ok,
    doc_id % 4 = 2 AND n > 200 AND n <= 15000 AS tei_ok,
    doc_id % 4 = 3 AND n > 200 AND n < 15000 AS pdf_ok,
    length(abst) > 50 AS abs_ok
  FROM f),
ext AS (SELECT doc_id, source,
    CASE WHEN html_ok OR tei_ok OR pdf_ok THEN text
         WHEN abs_ok THEN (CASE WHEN tldr IS NOT NULL
              THEN abst || ' Summary: ' || tldr ELSE abst END)
         WHEN tldr IS NOT NULL THEN tldr END AS introduction,
    CASE WHEN html_ok THEN 'arxiv_html' WHEN tei_ok THEN 'grobid'
         WHEN pdf_ok THEN 'pymupdf_regex'
         WHEN abs_ok OR tldr IS NOT NULL THEN 'abstract_tldr'
         END AS extraction_method
  FROM g)
SELECT doc_id, source, extraction_method,
trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  introduction, 'https?://[^ \t\n\r\f\x0B]+', ' ', 'g'),
  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', ' ', 'g'),
  '\[[0-9, ]+\]', ' ', 'g'),
  '\([A-Za-z]+ et al[.,][^)]*\)', ' ', 'g'),
  '[^a-zA-Z0-9 .,;:!?()''-]', ' ', 'g'),
  '  *', ' ', 'g')) AS clean_text
FROM ext WHERE introduction IS NOT NULL
"""

SPINE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("source", pa.string()),
    ("extraction_method", pa.string()),
    ("token_count", pa.int32()),
])
for sf, tag in SFS:
    spine_rows = []
    for doc_id, source, method, clean in duckdb.sql(
            SPINE_SQL.format(sf=sf)).fetchall():
        if clean is not None and len(clean) >= 200:
            for c in chunker.chunk_document(clean, str(doc_id)):
                spine_rows.append({
                    "doc_id": doc_id,
                    "source": source,
                    "extraction_method": method,
                    "token_count": c.token_count,
                })
    write(spine_rows, f"{OUT}/spine_chunks_{tag}.parquet", SPINE_SCHEMA)
