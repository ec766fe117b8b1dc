"""Deterministic sf-dir synthesizer.

The driver-managed /root/testdata/sf0.1 directory has been observed
empty (and is read-only), which forced two rounds of bench timings onto
sf0.01 via silent substitution (BENCH_r02/r03 notes). This builds an
sf0.1-SHAPED directory under /tmp instead, so per-query timings run at
the requested scale — no external data, fully deterministic:

- the fact tables that scale 10x per sf step in the driver's own data
  (customer, supplier, part, orders, lineitem, events — verified
  sf0.001 -> sf0.01 row ratios) are replicated `factor` times with
  KEY-CONSISTENT offsets: every replica shifts each primary/foreign key
  by `i * max_key_space`, so orders->customer, lineitem->orders/part/
  supplier joins keep exactly the reference fan-out per key;
- the fixed-size tables (documents, embeddings: 500 rows at every sf;
  nation, region) are copied verbatim.

Timestamps are left untouched: replicas are additional users/customers
active in the SAME time window, which preserves per-hour/per-user group
cardinalities' growth the way real traffic growth does.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {key column -> offset stride per replica} (strides are the
# source tables' key-space sizes at sf0.01; scaled by src row count so
# the same code synthesizes from any populated sf dir)
_SCALED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "_users"},
}
_FIXED = ("documents", "embeddings", "nation", "region")


def synth_sf_dir(src_dir: str, out_dir: str, factor: int = 10) -> str:
    """Write a `factor`x-scaled copy of `src_dir` into `out_dir`
    (idempotent: a stamp file keyed on src+factor skips the rebuild)."""
    stamp = os.path.join(out_dir, ".stamp")
    want = f"{os.path.abspath(src_dir)}:{factor}"
    if os.path.exists(stamp) and open(stamp).read() == want:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    # stride per key space = max(key)+1 measured from the PRIMARY
    # table of that space, NOT its row count: sparse key spaces (e.g.
    # standard TPC-H orderkeys, max ~ 4x rows) would otherwise make
    # replica i's shifted keys collide with replica i-1's range and
    # silently corrupt every join fan-out in the synthesized tables.
    _primary_key = {"customer": "c_custkey", "supplier": "s_suppkey",
                    "part": "p_partkey", "orders": "o_orderkey",
                    "events": "event_id"}
    sizes = {}
    for t, col in _primary_key.items():
        tbl = pq.read_table(os.path.join(src_dir, f"{t}.parquet"),
                            columns=[col])
        sizes[t] = int(pc.max(tbl[col]).as_py()) + 1
    ev = pq.read_table(os.path.join(src_dir, "events.parquet"),
                       columns=["user_id"])
    sizes["_users"] = int(pc.max(ev["user_id"]).as_py()) + 1

    for t in _FIXED:
        pq.write_table(pq.read_table(os.path.join(src_dir, f"{t}.parquet")),
                       os.path.join(out_dir, f"{t}.parquet"))
    for t, keys in _SCALED.items():
        src = pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        reps = []
        for i in range(factor):
            rep = src
            for col, space in keys.items():
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(rep[col], pa.scalar(
                    i * sizes[space], type=rep.schema.field(col).type))
                rep = rep.set_column(idx, rep.schema.field(col), shifted)
            reps.append(rep)
        pq.write_table(pa.concat_tables(reps),
                       os.path.join(out_dir, f"{t}.parquet"))
    with open(stamp, "w") as f:
        f.write(want)
    return out_dir


if __name__ == "__main__":
    import sys
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cld2_ray_bench/sf0.1-synth"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    synth_sf_dir(src, out, factor)
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            print(f, pq.read_metadata(os.path.join(out, f)).num_rows)
