#!/usr/bin/env python3
"""Generate a local sf1 (~10x sf0.1, ~6M-row lineitem) for scale-up
validation, mirroring the driver-side generator's role (TESTDATA.md).

DEV TOOLING ONLY — not part of the graft library (which is pure
Scala/Spark).  This script exists because /root/testdata stops at
sf0.1 and the round-4 verdict asks for one gate+bench pass at sf1;
the driver owns the real generator, so we scale the largest driver
table instead of inventing new distributions.

Construction: 10 key-shifted copies of sf0.1, preserving each
table's EXACT arrow schema — whatever physical encoding the driver
shipped for events.ts (timestamp[ns] through round 7, timestamp[us]
since the round-8 regeneration) carries through verbatim, so the
local sf1 always exercises the same reader path as the driver's own
testdata (Tables.eventTs dispatches on the observed type; a Spark
re-write here would silently re-encode the logical type).

  - region/nation: unchanged (true dimensions).
  - customer/supplier/part: keys += copy * (max+1).
  - orders/lineitem: PKs and FKs shifted consistently, so join
    cardinalities scale linearly and referential integrity holds.
  - events: event_id/user_id shifted; ts/value/props unchanged
    (the $.k key domain stays 0..99 -> 10x rows per stateful key,
    which is the interesting stress).
  - documents: doc_id += copy*5000; for copy>0 a copy tag is
    spliced into the text every 5 words, so cross-copy texts are
    DISSIMILAR and near-dup pair counts scale ~linearly (10 exact
    copies of every doc would square them); n_chars recomputed.
  - embeddings: vec_id shifted; per-copy deterministic perturbation
    (+((copy*31+d)%7-3)*0.003 on dim d) breaks exact ties so ANN
    top-k stays well-defined.

Usage: python3 tools/gen_sf1.py [outdir]   (default local-testdata/sf1)
"""
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "local-testdata/sf1"
COPIES = 10

OFF = {"cust": 15000, "supp": 1000, "part": 20000, "ord": 150000,
       "event": 100000, "user": 1500, "doc": 5000, "vec": 2000}


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, tables, schema):
    out = pa.concat_tables(tables).cast(schema)
    pq.write_table(out, f"{OUT}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def shift(tbl, col, off):
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(i).name,
                          pc.add(tbl.column(col), off))


def main():
    import os
    os.makedirs(OUT, exist_ok=True)

    for name in ("region", "nation"):
        t = read(name)
        pq.write_table(t, f"{OUT}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (unchanged dimension)")

    for name, cols in (("customer", [("c_custkey", "cust")]),
                       ("supplier", [("s_suppkey", "supp")]),
                       ("part", [("p_partkey", "part")]),
                       ("orders", [("o_orderkey", "ord"),
                                   ("o_custkey", "cust")]),
                       ("lineitem", [("l_orderkey", "ord"),
                                     ("l_partkey", "part"),
                                     ("l_suppkey", "supp")]),
                       ("events", [("event_id", "event"),
                                   ("user_id", "user")])):
        t = read(name)
        parts = []
        for c in range(COPIES):
            tc = t
            for col, key in cols:
                tc = shift(tc, col, c * OFF[key])
            parts.append(tc)
        write(name, parts, t.schema)

    # documents: copy-tag splice keeps cross-copy similarity low
    t = read("documents")
    texts = t.column("text").to_pylist()
    parts = []
    word5 = re.compile(r"((?:\S+\s+){5})")
    for c in range(COPIES):
        if c == 0:
            new_texts = texts
        else:
            tag = f"c{c} "
            new_texts = [word5.sub(lambda m: m.group(1) + tag, s)
                         for s in texts]
        tc = shift(t, "doc_id", c * OFF["doc"])
        ti = tc.schema.get_field_index("text")
        tc = tc.set_column(ti, "text", pa.array(new_texts, pa.string()))
        ni = tc.schema.get_field_index("n_chars")
        tc = tc.set_column(ni, "n_chars",
                           pa.array([len(s) for s in new_texts], pa.int64()))
        parts.append(tc)
    write("documents", parts, t.schema)

    # embeddings: deterministic per-copy perturbation breaks ties
    t = read("embeddings")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dims = emb.shape[1]
    parts = []
    for c in range(COPIES):
        noise = (((c * 31 + np.arange(dims)) % 7) - 3).astype(np.float32) * 0.003
        pert = emb if c == 0 else emb + noise[None, :]
        tc = shift(t, "vec_id", c * OFF["vec"])
        ei = tc.schema.get_field_index("embedding")
        tc = tc.set_column(ei, "embedding",
                           pa.array([row for row in pert.tolist()],
                                    pa.list_(pa.float32())))
        parts.append(tc)
    write("embeddings", parts, t.schema)


if __name__ == "__main__":
    main()
