#!/usr/bin/env python3
"""Derive a 10x scale-up of sf0.1 into /tmp/sf1 for scaling spot-checks.

Each replica r of `documents` appends a replica letter to every word:
within-replica near-dup structure (the planted dup rate) is preserved
verbatim, while cross-replica shingle overlap drops to ~0 -- the result
behaves like 10 independent sf0.1-sized corpora, i.e. a true 10x corpus
with the same dup rate, not an artificial 10-way duplicate explosion.

Each replica of `embeddings` applies a per-replica random coordinate
sign-flip (an orthogonal transform): within-replica inner products are
preserved EXACTLY, cross-replica cosine ~0.

The remaining tables are symlinked from sf0.1 (queries that join them
keep working; only documents/embeddings drive the flagship pipelines).
"""
import os, sys
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # 100 -> ~sf10
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT d.doc_id + r.rep * 1000000 AS doc_id,
         CASE WHEN r.rep = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+)',
                     '\\1' || chr(97 + r.rep::int % 26)
                          || CASE WHEN r.rep >= 26
                                  THEN chr(65 + r.rep::int // 26)
                                  ELSE '' END, 'g') END AS text,
         d.lang, d.source,
         length(CASE WHEN r.rep = 0 THEN d.text
                ELSE regexp_replace(d.text, '(\\S+)',
                       '\\1' || chr(97 + r.rep::int % 26)
                            || CASE WHEN r.rep >= 26
                                    THEN chr(65 + r.rep::int // 26)
                                    ELSE '' END, 'g') END)::int AS n_chars
  FROM '{SRC}/documents.parquet' d
  CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r
) TO '{DST}/documents.parquet' (FORMAT parquet)
""")

emb = con.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
mat = np.stack(emb.embedding.values).astype(np.float32)
rng = np.random.RandomState(12345)
frames = []
for r in range(REPS):
    signs = np.ones(mat.shape[1], np.float32) if r == 0 else \
        (rng.randint(0, 2, mat.shape[1]) * 2 - 1).astype(np.float32)
    m = mat * signs
    frames.append(pd.DataFrame({
        "vec_id": emb.vec_id.values + r * 1000000,
        "embedding": list(m),
        "label": emb.label.values,
    }))
big = pd.concat(frames, ignore_index=True)
src_schema = pq.read_schema(f"{SRC}/embeddings.parquet")
tbl = pa.Table.from_pandas(big, preserve_index=False).cast(src_schema)
pq.write_table(tbl, f"{DST}/embeddings.parquet")

for f in os.listdir(SRC):
    if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)

n1 = con.sql(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
n2 = con.sql(f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
print(f"wrote {DST}: documents={n1} embeddings={n2}")
