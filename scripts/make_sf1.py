#!/usr/bin/env python3
"""Build a 10x scale-up ("sf1") of the driver's sf0.1 testdata for the
scale-growth bench (BENCH_sf1.json).

Each fact table is replicated K times with id columns shifted by a
per-key-domain stride (max(id)+1), so primary keys stay unique and foreign
keys (o_custkey -> c_custkey, l_orderkey -> o_orderkey, ...) stay
consistent across replicas. Dimension tables (region, nation) are copied
once, TPC-H style. Schemas are preserved byte-for-byte via pyarrow
(including the events table's TIMESTAMP(NANOS) column).

Query-side filters in the bench (vec_id < 50, c_custkey < 100, doc_id
literals) select only replica 0, so scale-up grows the TARGET side of
every operator 10x while the query side stays fixed — exactly the shape a
100 TB deployment has.

Usage: python3 scripts/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1] [K=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# column -> key domain (columns in the same domain share one stride)
DOMAINS = {
    "doc_id": "doc", "vec_id": "vec", "event_id": "event", "user_id": "user",
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
}
FACTS = ["documents", "embeddings", "events", "customer", "supplier",
         "part", "orders", "lineitem"]
DIMS = ["region", "nation"]


def main():
    os.makedirs(DST, exist_ok=True)
    tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in FACTS}
    # per-domain stride = max over every column in the domain, + 1
    stride = {}
    for t, tbl in tables.items():
        for col in tbl.column_names:
            dom = DOMAINS.get(col)
            if dom is not None:
                mx = pc.max(tbl[col]).as_py()
                stride[dom] = max(stride.get(dom, 0), mx + 1)

    for t in DIMS:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{DST}/{t}.parquet")

    for t, tbl in tables.items():
        parts = []
        for k in range(K):
            if k == 0:
                parts.append(tbl)
                continue
            cols = []
            for col in tbl.column_names:
                arr = tbl[col]
                dom = DOMAINS.get(col)
                if dom is not None:
                    shifted = pc.add(arr, k * stride[dom])
                    arr = shifted.cast(tbl.schema.field(col).type)
                cols.append(arr)
            parts.append(pa.table(cols, schema=tbl.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
