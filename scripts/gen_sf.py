#!/usr/bin/env python3
"""Local 10x scale-up of the driver's sf0.1 testdata, for the SCALE.md
timing curve (driver tooling, like check_oracle.py — not library code).

Replicates each fact table k=0..9 times with key offsets so per-key
densities stay constant (a real scale-up, not hot-key inflation):
ids/foreign keys shift by k*max; documents get a deterministic per-replica
circular word rotation — NOTE this PRESERVES word shingles except at the
seam, so the 10 replicas of each doc form a PLANTED near-dup cluster
(pairwise Jaccard ~0.9). That keeps the dedup workloads' true-pair volume
linear in n (constant cluster size 10, ~45 pairs per cluster) while being
a realistic crawl-corpus shape; it does NOT keep the sf0.1 pair count.
Embeddings get a per-replica circular roll (norms preserved, ~zero cosine
between replicas of a random vector, so embedding pair structure scales
linearly too). Dimension tables (region, nation) stay fixed, as TPC-H
scaling does. Arrow types (incl. ns timestamps in events) are preserved by
round-tripping through pyarrow.

Usage: gen_sf.py [src_dir] [dest_dir] [replicas]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# foreign keys offset by the MAX OF THE TABLE THEY REFERENCE
REF_TABLE = {"o_custkey": "customer", "l_orderkey": "orders",
             "l_partkey": "part", "l_suppkey": "supplier",
             "o_orderkey": "orders", "c_custkey": "customer",
             "s_suppkey": "supplier", "p_partkey": "part",
             "event_id": "events", "user_id": "events",
             "doc_id": "documents", "vec_id": "embeddings"}
KEY_OF = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
          "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
          "embeddings": "vec_id"}
# user_id offsets by max user_id, not max event_id
SELF_COL = {"user_id": "user_id"}


def rotate_text(text, k):
    if text is None or k == 0:
        return text
    words = text.split(" ")
    if len(words) < 2:
        return f"r{k} {text}"
    shift = (k * 17) % len(words)
    return " ".join(words[shift:] + words[:shift])


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    maxes = {}
    for t, key in KEY_OF.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet", columns=[key])
        maxes[t] = pc.max(tab[key]).as_py() + 1
    max_user = pc.max(pq.read_table(f"{SRC}/events.parquet",
                                    columns=["user_id"])["user_id"]).as_py() + 1

    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(t, "copied")

    for t, cols in OFFSET_COLS.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        replicas = []
        for k in range(R):
            rep = tab
            for c in cols:
                base = max_user if c == "user_id" else maxes[REF_TABLE[c]]
                arr = pc.add(rep[c], pa.scalar(k * base, type=rep.schema.field(c).type))
                rep = rep.set_column(rep.schema.get_field_index(c), c, arr)
            if t == "documents" and k > 0:
                texts = pa.array([rotate_text(v, k) for v in rep["text"].to_pylist()],
                                 type=rep.schema.field("text").type)
                rep = rep.set_column(rep.schema.get_field_index("text"), "text", texts)
            if t == "embeddings" and k > 0:
                vecs = rep["embedding"].to_pylist()
                rolled = [v[k:] + v[:k] if v else v for v in vecs]
                rep = rep.set_column(rep.schema.get_field_index("embedding"), "embedding",
                                     pa.array(rolled, type=rep.schema.field("embedding").type))
            replicas.append(rep)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(t, len(tab), "->", len(out))


if __name__ == "__main__":
    main()
