#!/usr/bin/env python3
"""sf10 SPOT tier: documents + embeddings + events + lineitem at 100x.

Usage: python3 scripts/make_sf10.py [srcDir] [dstDir]
       (defaults /root/testdata/sf0.1 -> /tmp/graft_sf10)

The r17 verdict's task #4: one more decade of Spark-side evidence for
the superlinear suspects (x04's banded-collision growth, the
x02/x05/x34 banded-join families, the x23/x46/x92/x94 CC family) and
the h01 bucket audit. The DuckDB oracle does not go to this tier (the
CC-family oracles already need ~270 s at sf1); h01 + wall-clock are
the instruments, so only the two tables those families read are
scaled. The other eight tables are symlinked from sf0.1 so the dir is
a complete sfDir for any query that merely opens them.

Construction follows make_sf1.py (strided keys, replica 0 verbatim,
per-replica text/vector decorrelation) with the two transforms
upgraded because 100 replicas exceed both of sf1's families:

  * documents: a Caesar shift has only 26 distinct maps; replicas 26
    and 0 would carry IDENTICAL text and the LSH candidate mass would
    grow quadratically as a fixture artifact. sf10 uses AFFINE ciphers
    x -> a*x + b (mod 26) with a coprime to 26: 12*26 = 312 distinct
    letter bijections, (a,b) = (UNITS[r//26], r%26), identity at r=0.
    A bijection on the alphabet maps every shingle 1:1, so every
    intra-replica pairwise similarity (and the whole collision
    structure) is exactly replica 0's; two distinct affine maps agree
    on no letter... except fixed points -- two affine maps f,g agree
    where (a1-a2)x = b2-b1 (mod 26), up to 2 letters -- so shared
    shingle mass across replicas is that of a 1-2 letter alphabet
    overlap: negligible, same class as sf1's digits/punctuation.
  * embeddings: dim = 64 < 100 replicas, so rotation alone repeats at
    r and r+64. sf10 composes rotation k = r % 64 with a sign flip of
    odd coordinates when j = r // 64 == 1. Both are orthogonal maps
    applied uniformly within a replica, so intra-replica cosines and
    norms are EXACT copies of replica 0's; cross-replica pairs at the
    same rotation differ by the odd-flip (cos ~ sum +/- x_i^2 ~ 0).

Deterministic (pure arithmetic; no RNG). Written with a ParquetWriter
per replica: 100 row groups per table, so the files stay splittable
(one-row-group parquet was the sf1 tier's first finding).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# abspath: symlink targets are resolved relative to the LINK's dir, so a
# relative srcDir would create links that dangle from inside DST
SRC = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                      else "/root/testdata/sf0.1")
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10"
REPLICAS = 100

# events joins the scaled set in r19 (verdict task 3): the reference-
# surface families (j05 range join, w03 sessions, a05/s02 book HOFs,
# f-family windows) previously had only two decades of evidence. The
# construction mirrors make_sf1.py exactly — key strides only, no
# payload mutation — so the three tiers form one consistent growth
# family: replicas carry disjoint user/event key spaces (per-key group
# sizes stay constant; per-time-bucket density grows 100x, which is
# the honest stress for the time-keyed aggregations).
STRIDES = {"doc_id": 5000, "vec_id": 2000,
           "event_id": 100000, "user_id": 15000,
           # lineitem joined the scaled set in r20 (r19 advice, medium):
           # a05/s02 read ONLY lineitem, and with it LINKED their sf10
           # input was 10x SMALLER than the sf1 point — the fitted
           # exponent was meaningless and the gate could not detect a
           # superlinear regression in that family. Strides mirror
           # make_sf1.py so the three tiers form one growth family.
           "l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000}
SCALED = ("documents", "embeddings", "events", "lineitem")
# NB: orders/part/supplier stay LINKED — lineitem FKs for replicas
# r > 0 dangle against them. No sf10-gated query joins lineitem to a
# dim (a05/s02 group lineitem by l_orderkey standalone); anyone adding
# such a query to run_sf10.sh's list must move its dims into SCALED.
LINKED = "region nation customer supplier part orders".split()
UNITS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]  # (Z/26)* in order


def offset_keys(t: pa.Table, r: int) -> pa.Table:
    for name, stride in STRIDES.items():
        if name in t.column_names:
            i = t.column_names.index(name)
            t = t.set_column(i, name,
                             pc.add(t.column(name), r * stride))
    return t


def affine_table(r: int):
    a, b = UNITS[r // 26], r % 26
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    perm = [(a * x + b) % 26 for x in range(26)]
    return str.maketrans(lo + up,
                         "".join(lo[p] for p in perm)
                         + "".join(up[p] for p in perm))


def mutate_documents(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    tr = affine_table(r)
    texts = t.column("text").to_pylist()
    out = [None if x is None else x.translate(tr) for x in texts]
    # n_chars is length-preserved by construction; keep the column as-is
    return t.set_column(t.column_names.index("text"), "text",
                        pa.array(out, pa.string()))


def mutate_embeddings(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    vecs = t.column("embedding").to_pylist()
    out = []
    for v in vecs:
        if v is None or len(v) == 0:
            out.append(v)
            continue
        k = r % len(v)
        w = v[k:] + v[:k]
        if (r // len(v)) % 2 == 1:
            w = [(-x if i % 2 == 1 else x) for i, x in enumerate(w)]
        out.append(w)
    return t.set_column(t.column_names.index("embedding"), "embedding",
                        pa.array(out, pa.list_(pa.float32())))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name in LINKED:
        dst = f"{DST}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    for name in SCALED:
        # a pre-r19 tier dir symlinked events; never write THROUGH a
        # stale symlink into the (read-only) source tree
        if os.path.islink(f"{DST}/{name}.parquet"):
            os.remove(f"{DST}/{name}.parquet")
        base = pq.read_table(f"{SRC}/{name}.parquet")
        writer = None
        total = 0
        for r in range(REPLICAS):
            t = offset_keys(base, r)
            if name == "documents":
                t = mutate_documents(t, r)
            elif name == "embeddings":
                t = mutate_embeddings(t, r)
            # events: key strides only (mirrors make_sf1.py)
            if writer is None:
                writer = pq.ParquetWriter(f"{DST}/{name}.parquet",
                                          t.schema)
            writer.write_table(t, row_group_size=t.num_rows)
            total += t.num_rows
        writer.close()
        print(f"{name}: {base.num_rows} -> {total} rows "
              f"({REPLICAS} row groups)")


if __name__ == "__main__":
    main()
