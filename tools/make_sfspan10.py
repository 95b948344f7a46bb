#!/usr/bin/env python3
"""Stretched-calendar execution stress (round 17, VERDICT r16 #3).

Same rows as sf0.1, ~10x the DISTINCT-DAY domain: every base day d
maps to day-offset d*10, and each row lands on one of the 10 sub-days
via a deterministic key hash — so the daily census grows ~10x (and
day^2 pair frames ~100x) while row counts and value distributions stay
fixed. This isolates the "calendar-bounded" argument the day^2-class
queries (q251/q373/q228/q397) lean on: a decade-scale deployment has
10x the days of this fixture at the SAME row grain.

EXECUTION stress only (like make_sf1x10.py): no oracle parity claim —
l_shipdate jitter is independent of o_orderdate jitter, so derived
durations can shift or go negative; queries must EXECUTE clean and the
wall-time curve vs the day count is the measurement.

Usage: python3 tools/make_sfspan10.py [outdir=/tmp/sfspan10]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfspan10"

con = duckdb.connect()
os.makedirs(OUT, exist_ok=True)


def build(table, select):
    con.sql(f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet') TO "
            f"'{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)


def stretch_day(col, base, keyexpr):
    return (f"TIMESTAMP '{base}' + "
            f"CAST(datediff('day', TIMESTAMP '{base}', {col}) * 10 + "
            f"CAST(abs(hash({keyexpr})) % 10 AS BIGINT) AS BIGINT) "
            f"* INTERVAL 1 DAY AS {col}")


build("lineitem",
      "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
      "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
      + stretch_day("l_shipdate", "1995-01-01",
                    "l_orderkey * 7 + l_linenumber"))
build("orders",
      "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
      + stretch_day("o_orderdate", "1995-01-01", "o_orderkey") +
      ", o_orderpriority")
build("events",
      "event_id, make_timestamp(epoch_us(TIMESTAMP '2024-01-01') + "
      "(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) * 10) AS ts, "
      "user_id, event_type, value, props")
for t in ("region", "nation", "part", "supplier", "customer",
          "documents", "embeddings"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied", flush=True)

for t, c in (("lineitem", "l_shipdate"), ("orders", "o_orderdate")):
    days = con.sql(f"SELECT count(DISTINCT CAST({c} AS DATE)) "
                   f"FROM '{OUT}/{t}.parquet'").fetchone()[0]
    base = con.sql(f"SELECT count(DISTINCT CAST({c} AS DATE)) "
                   f"FROM '{SRC}/{t}.parquet'").fetchone()[0]
    print(f"{t}.{c}: {base} -> {days} distinct days", flush=True)
