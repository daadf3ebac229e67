#!/usr/bin/env python3
"""Generate the sf10 documents ramp table from the sf1 one, for the
streaming-SimHash decade extension (SCALING.md round 11) — the
documents counterpart of gen_sf10_embeddings.py.

Usage: python3 tools/gen_sf10_documents.py [srcDir] [outDir]
       (defaults: /tmp/sf1_graft -> /tmp/sf10_graft)

10 deterministic replicas with disjoint key and VOCABULARY spaces:
outer replica r > 0 suffixes every token with `_sR` (a second suffix
round on top of gen_sf1.py's `_rN`), so replicas share no shingles and
the duplicate structure is exactly 10 disjoint copies of sf1's —
the clean-ramp property (cross-replica SimHash collisions are
hash-random, never structural). Replica 0 is untouched sf1 data.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_graft"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_graft"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW docs AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * 1000000000 AS doc_id,
         CASE WHEN r.r = 0 THEN d.text
              ELSE replace(d.text, ' ', '_s' || r.r || ' ') || '_s' || r.r
         END AS text,
         d.* EXCLUDE (doc_id, text)
  FROM docs d CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT COUNT(*) FROM '{out}/documents.parquet'").fetchone()[0]
print("documents", n)
print("done ->", out)
