#!/usr/bin/env python3
"""100x offset-key spot-stress fixture (VERDICT r15 #3).

The 10x stress caught one BIGINT wrap per round through r14; this
probes the NEXT decade for the integer-grid discipline's headroom —
only the dense fact tables are replicated (lineitem, orders, events,
customer: everything the DECIMAL cross-mult query class reads), with
the same max+1 key-offset recipe as make_sf1x10.py so every replica
carries fresh keys. Dimensions and the text/embedding tables are
copied 1x: the spot-stress targets ARITHMETIC overflow, not text ops.

Usage: python3 tools/make_sf100x.py [outdir] [reps]
       (default /tmp/sf100x, 100)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100x"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100

con = duckdb.connect()


def mx(table, col):
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def build(table, select_i):
    parts = " UNION ALL ".join(
        f"SELECT {select_i(i)} FROM '{SRC}/{table}.parquet'"
        for i in range(REPS))
    con.sql(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)


os.makedirs(OUT, exist_ok=True)

MAXC, MAXO = mx("customer", "c_custkey"), mx("orders", "o_orderkey")
MAXE, MAXU = mx("events", "event_id"), mx("events", "user_id")

build("customer", lambda i: f"c_custkey + {i * MAXC} AS c_custkey, "
      "c_name, c_nationkey, c_acctbal, c_mktsegment")
build("orders", lambda i: f"o_orderkey + {i * MAXO} AS o_orderkey, "
      f"o_custkey + {i * MAXC} AS o_custkey, o_orderstatus, o_totalprice, "
      "o_orderdate, o_orderpriority")
build("lineitem", lambda i: f"l_orderkey + {i * MAXO} AS l_orderkey, "
      "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
      "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
# user_id rides the CUSTOMER offset (ADVICE r16): the Round11g RI
# audit joins events.user_id to c_custkey, so replicated events must
# reference replicated customers — an i*MAXU offset would orphan them
build("events", lambda i: f"event_id + {i * MAXE} AS event_id, ts, "
      f"user_id + {i * MAXC} AS user_id, event_type, value, props")
for t in ("region", "nation", "part", "supplier", "documents",
          "embeddings"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied 1x", flush=True)
print("done:", OUT)
