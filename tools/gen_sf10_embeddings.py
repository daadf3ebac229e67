#!/usr/bin/env python3
"""Generate the sf10 embeddings ramp table from the sf1 one, for the
streaming-semantic decade extension (SCALING.md round 11).

Usage: python3 tools/gen_sf10_embeddings.py [srcDir] [outDir]
       (defaults: /tmp/sf1_graft -> /tmp/sf10_graft)

10 deterministic replicas of the sf1 embeddings with disjoint key
spaces. gen_sf1.py's cyclic-rotation trick cannot be applied twice:
rotations compose additively, so an outer rotation r2 of an inner
rotation r1 collides with any other pair summing to the same total
(mod 64), making whole sub-corpora IDENTICAL across replicas and
exploding the cross-replica duplicate count the clean ramp forbids.
Instead each outer replica applies a per-replica SIGN FLIP (negate
dimension i when hash(r, i) is odd) — a diagonal orthogonal
transform, so within-replica dot products, norms, and quantization
behavior are EXACTLY preserved, while any two distinct outer replicas
differ by a random-sign diagonal (cross-replica cosines quasi-random,
never identical). Replica 0 is the untouched sf1 data, so sf1 results
embed in sf10.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_graft"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_graft"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW embs AS SELECT * FROM '{src}/embeddings.parquet'")
con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 1000000000 AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE [CASE WHEN hash(r.r || '_' || i) % 2 = 1
                         THEN -e.embedding[i] ELSE e.embedding[i] END
                    for i in range(1, 65)]
         END AS embedding,
         e.* EXCLUDE (vec_id, embedding)
  FROM embs e CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT COUNT(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
print("embeddings", n)
print("done ->", out)
