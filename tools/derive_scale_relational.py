#!/usr/bin/env python3
"""Extend the derived 10x scale corpus (target/scale/sf1.0x) with the
RELATIONAL tables, so the round-19 scale probe (VERDICT r18 #3) can run
q1-q33 + events_* at 1x and 10x. /root/testdata is read-only; derived
data lives under target/ (gitignored).

Replication shape (matches the round-18 convention that built the
sf1.0x lineitem — l_orderkey += replica * 150_000, l_partkey/l_suppkey
UNCHANGED):
  - facts replicate 10x with key offsets that preserve join integrity:
      orders:   o_orderkey += r*150_000 (joins the existing lineitem
                replicas), o_custkey += r*15_000 (joins the customer
                replicas)
      customer: c_custkey += r*15_000
      events:   event_id += r*100_000, user_id += r*1_500 (new users
                per replica — per-user event density preserved, so
                sessionize/funnel/retention see 10x keys, not 10x-deep
                sessions), ts unchanged (window queries keep their
                time spine)
  - dimensions (nation, region, part, supplier) copy UNCHANGED: the
    lineitem replicas carry original part/supp keys, and a fixed dim
    side is exactly the broadcast-join shape the probe wants to watch
    under 10x fact growth.
"""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/scale/sf1.0x"
R = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def copy(sql, table):
    out = f"{DST}/{table}.parquet"
    if os.path.exists(out):
        print(f"skip {table} (exists)")
        return
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table}: {n} rows")

reps = f"(SELECT unnest(generate_series(0, {R - 1})) AS r) reps"

copy(f"""SELECT o_orderkey + r * 150000 AS o_orderkey,
                o_custkey + r * 15000 AS o_custkey,
                o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM read_parquet('{SRC}/orders.parquet'), {reps}""", "orders")
copy(f"""SELECT c_custkey + r * 15000 AS c_custkey,
                c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM read_parquet('{SRC}/customer.parquet'), {reps}""", "customer")
copy(f"""SELECT event_id + r * 100000 AS event_id,
                ts, user_id + r * 1500 AS user_id, event_type, value, props
         FROM read_parquet('{SRC}/events.parquet'), {reps}""", "events")
for dim in ["nation", "region", "part", "supplier"]:
    copy(f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')", dim)
