"""Deterministic scale-up tiler: synthesize /tmp/sf{N} from /root/testdata/sf0.1.

The driver ships sf0.001/0.01/0.1 only; the r4 verdict's "Next round" #3
asks for a robustness + timing sweep at 10× the bench scale.  This tool
tiles sf0.1 K times (default 10 → "sf1") with key offsets, entirely
deterministic (tile index arithmetic, no RNG), preserving the properties
the queries rely on:

* fact keys (custkey/orderkey/partkey/suppkey, doc_id, vec_id, event_id,
  user_id) shift by ``tile * stride`` with one shared stride, so every
  intra-tile join relationship is preserved and tiles never collide;
* dimension tables (region, nation) are NOT tiled — their keys are
  referenced by nationkey columns that are left untouched, exactly the
  shape a bigger TPC-H SF has (fixed nations, more customers);
* document texts get a per-tile suffix token (" t<i>") and embeddings a
  per-tile first-component nudge (tile * 1e-3): without these, every doc
  and vector would acquire 10 exact clones and the dedup/ANN sweeps would
  measure a pathological all-duplicates corpus instead of scale;
* timestamps are unchanged (time range stays fixed while volume grows —
  the realistic direction: more events per hour, not a longer history).

Run: python tools/make_sf.py [K] [out_dir]   (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# columns shifted by tile*stride, per table (intra-tile joins preserved)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def _stride(tables: dict[str, pa.Table]) -> int:
    mx = 0
    for name, cols in KEY_COLS.items():
        for c in cols:
            mx = max(mx, pc.max(tables[name][c]).as_py() or 0)
    # round up to a clean power of ten so tile membership is eyeballable
    s = 10
    while s <= mx:
        s *= 10
    return s


def make(k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tables = {
        name: pq.read_table(f"{SRC}/{name}.parquet")
        for name in [*KEY_COLS, *DIMS]
    }
    stride = _stride(tables)
    print(f"stride={stride}, tiles={k}")
    for name in DIMS:
        pq.write_table(tables[name], f"{out_dir}/{name}.parquet")
    for name, cols in KEY_COLS.items():
        src = tables[name]
        tiles = []
        for i in range(k):
            t = src
            for c in cols:
                t = t.set_column(
                    t.schema.get_field_index(c),
                    c,
                    pc.add(t[c], pa.scalar(i * stride, type=t[c].type)),
                )
            if name == "documents" and i > 0:
                idx = t.schema.get_field_index("text")
                text = pc.binary_join_element_wise(
                    t["text"].combine_chunks(), pa.scalar(f"t{i}"), " "
                )
                t = t.set_column(idx, "text", text)
                nidx = t.schema.get_field_index("n_chars")
                t = t.set_column(
                    nidx, "n_chars", pc.utf8_length(t["text"]).cast(pa.int64())
                )
            if name == "embeddings" and i > 0:
                import numpy as np

                emb = t["embedding"].combine_chunks()
                flat = emb.flatten().to_numpy(zero_copy_only=False).copy()
                width = len(flat) // len(t)
                flat[::width] += np.float32(i * 1e-3)
                nudged = pa.FixedSizeListArray
                arr = pa.ListArray.from_arrays(emb.offsets, pa.array(flat, type=pa.float32()))
                t = t.set_column(t.schema.get_field_index("embedding"), "embedding", arr)
            tiles.append(t)
        out = pa.concat_tables(tiles)
        pq.write_table(out, f"{out_dir}/{name}.parquet")
        print(f"{name}: {len(src)} -> {len(out)} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    make(k, out)
