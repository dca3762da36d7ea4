#!/usr/bin/env python3
"""Build a larger bench input from /root/testdata/sf0.1 (VERDICT r3 item 5:
per-query bench numbers at sf0.1 mostly measure the fixed ~0.1 s per-job
tail, not work). Deterministic x K scale-up, written with DuckDB (driver-side
tooling only — never a library dependency):

  - fact tables (orders, lineitem, events, documents): K copies with
    SHIFTED primary keys; lineitem's l_orderkey shifts in lockstep with
    o_orderkey so joins stay consistent. documents' text gets a per-replica
    suffix token so replicas are near-dups (what a real crawl produces),
    not byte-identical dup groups that would grow pair output
    quadratically in K.
  - dimension tables (region, nation, customer, supplier, part) are
    copied as-is: fanout per dim row grows x K, like a bigger day of the
    same business.
  - embeddings are copied as-is, DELIBERATELY: q_cosine_neardups and
    q_ann_* run declared-exact all-pairs/probe-all oracle configs whose
    cost is quadratic by design; their scale paths are benched separately
    (bucketed cosine, selective-probe IVF in SimilaritySpec).

Usage: python3 tools/make_scaled_input.py [K] [outdir]
"""
import duckdb, os, sys

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
src = "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

copy_asis = ["region", "nation", "customer", "supplier", "part", "embeddings"]
for t in copy_asis:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print("copied", t)

maxo = con.execute(f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'").fetchone()[0]
maxe = con.execute(f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
maxd = con.execute(f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]

reps = f"(SELECT unnest(range({K})) AS rep)"
con.execute(f"""COPY (
  SELECT o_orderkey + rep * {maxo} AS o_orderkey,
         o.* EXCLUDE (o_orderkey)
  FROM '{src}/orders.parquet' o CROSS JOIN {reps}
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
print("scaled orders")

con.execute(f"""COPY (
  SELECT l_orderkey + rep * {maxo} AS l_orderkey,
         l.* EXCLUDE (l_orderkey)
  FROM '{src}/lineitem.parquet' l CROSS JOIN {reps}
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
print("scaled lineitem")

con.execute(f"""COPY (
  SELECT event_id + rep * {maxe} AS event_id,
         e.* EXCLUDE (event_id)
  FROM '{src}/events.parquet' e CROSS JOIN {reps}
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print("scaled events")

con.execute(f"""COPY (
  SELECT doc_id + rep * {maxd} AS doc_id,
         CASE WHEN text IS NULL THEN NULL
              WHEN rep = 0 THEN text
              ELSE text || ' rep' || rep END AS text,
         d.* EXCLUDE (doc_id, text)
  FROM '{src}/documents.parquet' d CROSS JOIN {reps}
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
print("scaled documents")

for t in ["orders", "lineitem", "events", "documents"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
