#!/usr/bin/env python3
"""Standing 10x offset-key fixture recipe (BASELINE.md scale curves).

Concatenates sf0.1 ten times with key offsets so every replica carries
FRESH keys (and, for documents, fresh token text), preserving the
1x calendar and dimension tables:

  - customer: c_custkey + i*MAXC, MAXC = max+1 so 0-based keys never
    collide at replica boundaries  (drives 10x POINT DENSITY in the
    q347/q357/q378/q379 synthetic grid — same 100k^2 area)
  - orders:   o_orderkey + i*MAXO, o_custkey + i*MAXC
  - lineitem: l_orderkey + i*MAXO
  - events:   event_id + i*MAXE, user_id + i*MAXU (same calendar)
  - documents: doc_id + i*MAXD, per-token replica suffix on text for
    i > 0 (so dedup/text ops see new vocabulary, not 10 copies)
  - embeddings: vec_id + i*MAXV
  - region/nation/part/supplier: copied 1x (dimensions)

Usage: python3 tools/make_sf1x10.py [outdir]   (default /tmp/sf1x10)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()


def mx(table, col):
    return con.sql(f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def build(table, select_i):
    parts = " UNION ALL ".join(
        f"SELECT {select_i(i)} FROM '{SRC}/{table}.parquet'" for i in range(REPS))
    con.sql(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

MAXC, MAXO = mx("customer", "c_custkey"), mx("orders", "o_orderkey")
MAXE, MAXU = mx("events", "event_id"), mx("events", "user_id")
MAXD, MAXV = mx("documents", "doc_id"), mx("embeddings", "vec_id")

build("customer", lambda i: f"c_custkey + {i * MAXC} AS c_custkey, "
      "c_name, c_nationkey, c_acctbal, c_mktsegment")
build("orders", lambda i: f"o_orderkey + {i * MAXO} AS o_orderkey, "
      f"o_custkey + {i * MAXC} AS o_custkey, o_orderstatus, o_totalprice, "
      "o_orderdate, o_orderpriority")
build("lineitem", lambda i: f"l_orderkey + {i * MAXO} AS l_orderkey, "
      "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
      "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
build("events", lambda i: f"event_id + {i * MAXE} AS event_id, ts, "
      f"user_id + {i * MAXU} AS user_id, event_type, value, props")
build("documents", lambda i: f"doc_id + {i * MAXD} AS doc_id, "
      + ("text, " if i == 0 else
         f"regexp_replace(text, '(\\S+)', '\\1z{i}', 'g') AS text, ")
      + "lang, source, n_chars")
build("embeddings", lambda i: f"vec_id + {i * MAXV} AS vec_id, "
      "embedding, label")
for t in ("region", "nation", "part", "supplier"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied 1x")
print("done:", OUT)
