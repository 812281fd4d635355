#!/usr/bin/env python3
"""Deterministic sf1 stress fixture: replicate the driver's sf0.1
fixture x10 with shifted keys (dev-only -- the correctness sweep over
it is still the real oracle gate, since DuckDB replays the same SQL
over the same parquet regardless of how the fixture was made).

Replication rules (distribution-preserving, not dup-minting):
 - region/nation: dimensions don't scale; single copy.
 - customer/supplier/part/orders/lineitem/events: x10 with per-table
   key strides (next power of 10 above max), foreign keys remapped to
   the same replica so join locality/selectivity is preserved;
   timestamps unchanged (a 10x corpus is 10x DENSER per day, which is
   how real volume grows).
 - documents: replica 0 verbatim (id<10 probes etc. survive); replicas
   1..9 get a deterministic md5-keyed PERMUTATION of each doc's
   tokens -- token/length/lang/source distributions are preserved but
   shingle identity is destroyed, so the fixture does NOT mint 10
   near-duplicates of every document (which would make every dedup
   operator's candidate space degenerate-quadratic rather than
   realistically sparse).
 - embeddings: replica 0 verbatim; replicas 1..9 multiply by a
   deterministic per-replica +-1 sign pattern -- norms, per-dim
   distributions, and within-replica geometry are exactly preserved
   while cross-replica cosines decorrelate.

Usage: python3 dev/gen_sf1.py [src] [dst]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/dev/sf1"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def stride(table, key):
    m = con.execute(f"SELECT max({key}) FROM {src(table)}").fetchone()[0]
    s = 10
    while s <= m:
        s *= 10
    return s


def copy(sql, t):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


CUST = stride("customer", "c_custkey")
SUPP = stride("supplier", "s_suppkey")
PART = stride("part", "p_partkey")
ORDK = stride("orders", "o_orderkey")
EVID = stride("events", "event_id")
USER = stride("events", "user_id")
DOC = stride("documents", "doc_id")
VEC = stride("embeddings", "vec_id")
# documents and embeddings share an id space (q163/q166 join them);
# one stride keeps per-replica alignment.
DOCVEC = max(DOC, VEC)
print(f"strides: cust={CUST} supp={SUPP} part={PART} ord={ORDK} "
      f"ev={EVID} user={USER} docvec={DOCVEC}")

R = "range(10) rep(r)"

copy(f"SELECT * FROM {src('region')}", "region")
copy(f"SELECT * FROM {src('nation')}", "nation")
copy(f"""SELECT c_custkey + r * {CUST} AS c_custkey, c_name, c_nationkey,
  c_acctbal, c_mktsegment FROM {src('customer')}, {R}
  ORDER BY c_custkey""", "customer")
copy(f"""SELECT s_suppkey + r * {SUPP} AS s_suppkey, s_name, s_nationkey,
  s_acctbal FROM {src('supplier')}, {R} ORDER BY s_suppkey""", "supplier")
copy(f"""SELECT p_partkey + r * {PART} AS p_partkey, p_name, p_brand, p_type,
  p_size, p_retailprice FROM {src('part')}, {R} ORDER BY p_partkey""", "part")
copy(f"""SELECT o_orderkey + r * {ORDK} AS o_orderkey,
  o_custkey + r * {CUST} AS o_custkey, o_orderstatus, o_totalprice,
  o_orderdate, o_orderpriority FROM {src('orders')}, {R}
  ORDER BY o_orderkey""", "orders")
copy(f"""SELECT l_orderkey + r * {ORDK} AS l_orderkey,
  l_partkey + r * {PART} AS l_partkey, l_suppkey + r * {SUPP} AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}, {R}
  ORDER BY l_orderkey, l_linenumber""", "lineitem")
copy(f"""SELECT event_id + r * {EVID} AS event_id, ts,
  user_id + r * {USER} AS user_id, event_type, value, props
  FROM {src('events')}, {R} ORDER BY event_id""", "events")
copy(f"""SELECT doc_id + r * {DOCVEC} AS doc_id,
  CASE WHEN r = 0 THEN text ELSE array_to_string(list_transform(
    list_sort(list_transform(string_split(text, ' '),
      (x, i) -> struct_pack(
        k := md5(CAST(r AS VARCHAR) || '_' || md5(text)
                 || '_' || CAST(i AS VARCHAR) || '_' || x),
        t := x))),
    s -> s.t), ' ') END AS text,
  lang, source,
  CASE WHEN r = 0 THEN n_chars ELSE NULL END AS n_chars_keep,
  r FROM {src('documents')}, {R}""", "_documents_tmp")
# n_chars stays consistent with the (possibly permuted) text
copy(f"""SELECT doc_id, text, lang, source,
  coalesce(n_chars_keep, CAST(length(text) AS BIGINT)) AS n_chars
  FROM read_parquet('{DST}/_documents_tmp.parquet') ORDER BY doc_id""",
     "documents")
os.remove(f"{DST}/_documents_tmp.parquet")
copy(f"""WITH flips AS (
  SELECT rr.r AS r, d.d AS d,
    CASE WHEN rr.r > 0 AND substring(md5('e' || CAST(rr.r AS VARCHAR) || '_'
      || CAST(d.d AS VARCHAR)), 1, 1) >= '8' THEN -1.0 ELSE 1.0 END AS s
  FROM range(10) rr(r), range(64) d(d)),
fv AS (SELECT r, list(s ORDER BY d) AS f FROM flips GROUP BY r)
SELECT vec_id + rep.r * {DOCVEC} AS vec_id,
  CAST(list_transform(embedding, (x, i) -> CAST(x * f[i] AS FLOAT))
    AS FLOAT[]) AS embedding,
  label
FROM {src('embeddings')}, {R} JOIN fv ON fv.r = rep.r
ORDER BY vec_id""", "embeddings")
print("sf1 fixture written to", DST)
