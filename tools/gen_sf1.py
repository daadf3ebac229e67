#!/usr/bin/env python3
"""Generate an sf1-equivalent ramp dataset from the driver's sf0.1
parquet, for the SCALING.md decade-extension measurements.

Usage: python3 tools/gen_sf1.py [srcDir] [outDir]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1_graft)

Method (documented in SCALING.md): 10 deterministic replicas of the
sf0.1 tables with disjoint key spaces, transformed so that each replica
is an ISOMORPHIC copy of the sf0.1 corpus while cross-replica rows are
unrelated:

- documents: every token gets a per-replica suffix (tok -> tok_rN).
  Shingle/vocabulary structure, duplicate rate and pair counts are
  exactly 10x the sf0.1 values (replicas share no shingles), so the
  dedup family's data term scales cleanly by 10 with no artificial
  cross-replica duplicate explosion (naive replication would square
  the pair count instead).
- embeddings: per-replica cyclic rotation of the 64 dimensions
  (an orthogonal transform: within-replica dot products, norms and
  quantization behavior are EXACTLY preserved; cross-replica cosines
  are quasi-random). vec_id offset by 10^7 per replica; label kept.
- lineitem: straight replication with l_orderkey offset (p05 reads
  value columns only).
- events: replicas shifted +600 days apart (and user/event ids
  offset), so intervals from different replicas never overlap —
  per-interval concurrency counts and interval-join outputs are
  EXACTLY 10 disjoint copies of the sf0.1 answers, which is the
  property a clean ramp needs (naive replication would multiply
  interval density 10x and square the pair-join output instead).

Replica 0 is the untouched sf0.1 data, so sf0.1 results embed in sf1.
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_graft"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW docs AS SELECT * FROM '{src}/documents.parquet'")
con.execute(f"CREATE VIEW embs AS SELECT * FROM '{src}/embeddings.parquet'")
con.execute(f"CREATE VIEW li AS SELECT * FROM '{src}/lineitem.parquet'")
con.execute(f"CREATE VIEW ev AS SELECT * FROM '{src}/events.parquet'")

print("documents ...", flush=True)
con.execute(f"""
COPY (
  SELECT d.doc_id + r.r * 10000000 AS doc_id,
         CASE WHEN r.r = 0 THEN d.text
              ELSE replace(d.text, ' ', '_r' || r.r || ' ') || '_r' || r.r
         END AS text,
         d.* EXCLUDE (doc_id, text)
  FROM docs d CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

print("embeddings ...", flush=True)
con.execute(f"""
COPY (
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE [e.embedding[((i - 1 + r.r) % 64) + 1]
                    for i in range(1, 65)]
         END AS embedding,
         e.* EXCLUDE (vec_id, embedding)
  FROM embs e CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

print("lineitem ...", flush=True)
con.execute(f"""
COPY (
  SELECT l.l_orderkey + r.r * 1000000000 AS l_orderkey,
         l.* EXCLUDE (l_orderkey)
  FROM li l CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")

print("orders ...", flush=True)
# straight 10x replication with key offsets. NOTE for the x173 ramp:
# the gate folds keys through % 9973 into a fixed node space, so
# replicated orders DENSIFY the graph (~10x degree on the same nodes)
# rather than producing 10 disjoint copies — that is the adversarial
# test of the hub-degree cap (wedge volume bounded by V*cap^2), not an
# isomorphic data ramp; read the measurement accordingly.
con.execute(f"CREATE VIEW ords AS SELECT * FROM '{src}/orders.parquet'")
con.execute(f"""
COPY (
  SELECT o.o_orderkey + r.r * 1000000000 AS o_orderkey,
         o.o_custkey + r.r * 100000000 AS o_custkey,
         o.* EXCLUDE (o_orderkey, o_custkey)
  FROM ords o CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")

print("events ...", flush=True)
# the event_id offset must be a MULTIPLE OF 240: ramp queries derive
# interval lengths from event_id % 240, so a non-multiple offset would
# change replica interval durations and break the 10-disjoint-copies
# invariant (10,000,080 = 240 * 41,667)
con.execute(f"""
COPY (
  SELECT e.event_id + r.r * 10000080 AS event_id,
         e.ts + INTERVAL (r.r * 600) DAY AS ts,
         e.user_id + r.r * 1000000 AS user_id,
         e.* EXCLUDE (event_id, ts, user_id)
  FROM ev e CROSS JOIN (SELECT unnest(range(0, 10)) AS r) r
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for t in ["documents", "embeddings", "lineitem", "orders", "events"]:
    n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done ->", out)
