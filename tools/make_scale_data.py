#!/usr/bin/env python
"""Scale a driver testdata directory by integer replication — measurement
tooling for scaling-exponent sweeps (PLANS.md), NOT oracle input: the
driver's graded scales stay /root/testdata/sf{0.001,0.01,0.1} untouched.

Usage: python tools/make_scale_data.py SRC_DIR DST_DIR REPS

Replica r > 0 shifts every table's own key and its foreign keys by the
same per-table offset, so referential structure (customer->orders->
lineitem->part/supplier) replicates exactly; nation/region stay fixed
(TPC-H keeps them constant across SF). Content columns are perturbed so
the scaled corpus doesn't contain artifacts a real 10x corpus wouldn't:

- documents: each replica shuffles every text's tokens with an RNG
  seeded by (replica, md5(text)) — identical base texts shuffle
  identically, so intra-replica duplicate/near-dup clusters replicate
  (pair counts scale ~linearly) while cross-replica trigram overlap
  collapses (same vocabulary, different order). Shuffling preserves the
  unigram distribution exactly.
- embeddings: replica vectors get small deterministic Gaussian noise
  (sigma 0.02, seeded by replica) — keeps the label/cluster geometry
  without creating exact-tie duplicates that would distort top-k ranks.
- everything else replicates verbatim under the shifted keys.

Everything runs at the pyarrow level so parquet logical types survive
byte-exact — the driver's events.ts is TIMESTAMP(NANOS), which a
pandas/duckdb round-trip would silently rewrite to micros and break the
session's nanosAsLong contract.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# (table, {column: offset_unit}) — offset_unit * replica is added
KEY_SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}


def _shift(tbl: pa.Table, shifts: dict, r: int) -> pa.Table:
    for col, unit in shifts.items():
        i = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(
            r * unit, type=tbl.schema.field(col).type))
        tbl = tbl.set_column(i, tbl.schema.field(col), shifted)
    return tbl


def _shuffle_texts(tbl: pa.Table, r: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        seed = int.from_bytes(
            hashlib.md5(f"{r}|{t}".encode()).digest()[:4], "big")
        words = t.split(" ")
        np.random.RandomState(seed).shuffle(words)
        out.append(" ".join(words))
    i = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(i, tbl.schema.field("text"), pa.array(out))
    if "n_chars" in tbl.schema.names:
        j = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            j, tbl.schema.field("n_chars"),
            pa.array([None if t is None else len(t) for t in out],
                     type=tbl.schema.field("n_chars").type))
    return tbl


def _perturb_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    vecs = tbl.column("embedding").to_pylist()
    rng = np.random.RandomState(1000 + r)
    out = []
    for v in vecs:
        if v is None:
            out.append(None)
        else:
            a = np.asarray(v, dtype=np.float32)
            out.append((a + rng.normal(0, 0.02, a.shape)
                        .astype(np.float32)).tolist())
    i = tbl.schema.get_field_index("embedding")
    return tbl.set_column(i, tbl.schema.field("embedding"),
                          pa.array(out, type=tbl.schema.field(
                              "embedding").type))


def main() -> None:
    src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name, shifts in KEY_SHIFTS.items():
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        base = pq.read_table(path)
        if not shifts:  # fixed dimension tables
            pq.write_table(base, os.path.join(dst, f"{name}.parquet"))
            print(f"{name}: copied ({base.num_rows} rows)")
            continue
        parts = []
        for r in range(reps):
            t = _shift(base, shifts, r)
            if r > 0 and name == "documents":
                t = _shuffle_texts(t, r)
            if r > 0 and name == "embeddings":
                t = _perturb_embeddings(t, r)
            parts.append(t)
        out = pa.concat_tables(parts)
        # bounded row groups: pyarrow's default (~1M rows) would put a
        # whole 200k-row replica table into ONE row group => ONE Spark
        # partition — a single-thread scan that serializes every
        # downstream stage (caught by a thread dump in the r10 sf10
        # sweep). >= 32 groups per table keeps local[32] saturated.
        rg = max(8192, min(1_000_000, out.num_rows // 32))
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=rg)
        print(f"{name}: {base.num_rows} -> {out.num_rows} rows "
              f"(row_group={rg})")


if __name__ == "__main__":
    main()
