#!/usr/bin/env python3
"""sf1 validation-tier generator: a faithful 10x scale-up of sf0.1.

Usage: python3 scripts/make_sf1.py [srcDir] [dstDir]
       (defaults /root/testdata/sf0.1 -> /tmp/graft_sf1)

The r15 verdict's task #3: every gate runs at sf<=0.1; one full
167-query DuckDB compare + one bench at 10x the rows catches
scale-sensitive constants (bloom sizing, scaledCells/scaledBits
transitions, planted-id strides) that per-family widening misses.

Construction: 10 replicas of every fact table with key-space-strided
ids so FKs stay valid (replica r's customers are referenced by replica
r's orders/events, etc.). Replica 0 is sf0.1 verbatim, so doc_id/key
nesting across SFs still holds. Dimension tables (region, nation) stay
fixed, as in TPC-H.

Cross-replica corpus decorrelation — the one deliberate mutation:
  * documents: replica r > 0 applies a Caesar cipher (letters rotated
    by r). A character bijection maps every shingle 1:1, so EVERY
    intra-replica pairwise similarity -- and the whole LSH collision
    structure -- is exactly replica 0's, while cross-replica texts
    share only letter-free shingles. Without decorrelation, every text
    would appear 10x and LSH buckets would grow quadratically -- a
    fixture artifact, not a property of 10x more web data.
  * embeddings: replica r cyclically rotates the vector by r
    dimensions -- norms and intra-replica cosines are preserved
    exactly; cross-replica pairs decorrelate.

Deterministic (pure arithmetic; no RNG).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = 10

# key column -> stride (the key space's size at sf0.1; ids are dense
# 0..N-1 there, so striding keeps replicas disjoint and FKs aligned)
STRIDES = {
    "c_custkey": 15000, "o_custkey": 15000, "user_id": 15000,
    "o_orderkey": 150000, "l_orderkey": 150000,
    "p_partkey": 20000, "l_partkey": 20000,
    "s_suppkey": 1000, "l_suppkey": 1000,
    "event_id": 100000,
    "doc_id": 5000,
    "vec_id": 2000,
}

COPY_ONCE = {"region", "nation"}
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def offset_keys(t: pa.Table, r: int) -> pa.Table:
    for name, stride in STRIDES.items():
        if name in t.column_names:
            i = t.column_names.index(name)
            t = t.set_column(i, name,
                             pc.add(t.column(name), r * stride))
    return t


def mutate_documents(t: pa.Table, r: int) -> pa.Table:
    """Per-replica Caesar cipher on letters. A character-level
    substitution maps every k-gram 1:1, so WITHIN a replica every
    pairwise shingle-Jaccard (and the whole LSH collision structure) is
    EXACTLY replica 0's — candidate pairs scale linearly by
    construction. (The first attempt prefixed every word, which RAISED
    background same-replica similarity — every inter-word region shared
    the prefix mass — and blew LSH buckets up quadratically: x03 went
    1.5 s -> 400+ s. A bijection on the alphabet cannot do that.)
    Cross-replica texts share only letter-free shingles (digits,
    punctuation) — negligible collision mass."""
    if r == 0:
        return t
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    tr = str.maketrans(lo + up, lo[r:] + lo[:r] + up[r:] + up[:r])
    texts = t.column("text").to_pylist()
    out = [None if x is None else x.translate(tr) for x in texts]
    t = t.set_column(t.column_names.index("text"), "text",
                     pa.array(out, pa.string()))
    # n_chars is length-preserved by construction; keep the column as-is
    return t


def mutate_embeddings(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    vecs = t.column("embedding").to_pylist()
    out = [None if v is None or len(v) == 0
           else v[r % len(v):] + v[:r % len(v)] for v in vecs]
    return t.set_column(t.column_names.index("embedding"), "embedding",
                        pa.array(out, pa.list_(pa.float32())))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in TABLES:
        src = f"{SRC}/{name}.parquet"
        base = pq.read_table(src)
        if name in COPY_ONCE:
            pq.write_table(base, f"{DST}/{name}.parquet")
            print(f"{name}: copied once ({base.num_rows} rows)")
            continue
        parts = []
        for r in range(REPLICAS):
            t = offset_keys(base, r)
            if name == "documents":
                t = mutate_documents(t, r)
            elif name == "embeddings":
                t = mutate_embeddings(t, r)
            parts.append(t)
        out = pa.concat_tables(parts)
        # ~50 row groups per table: a single-row-group file is
        # UNSPLITTABLE for Spark (one scan task no matter what
        # maxPartitionBytes says) -- the sf1 tier's first finding
        rg = max(1000, out.num_rows // 50)
        pq.write_table(out, f"{DST}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows "
              f"(row_group_size={rg})")


if __name__ == "__main__":
    main()
