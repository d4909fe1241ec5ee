"""Deterministic scale-up of a testdata sf directory (default: sf0.1 x10 ~= sf1).

The driver's generator is not available, so the next decade is derived from
the largest existing fixture by key-shifted replication — same schemas (a
byte-exact pyarrow copy of each column type), same per-copy distributions,
10x the rows. The correctness checker compares Spark vs DuckDB on the SAME
generated files, so the gate is engine-vs-oracle equivalence at sf1 scale,
not equivalence with a hypothetical driver-generated sf1.

Replication rules (copy c = 0..k-1; copy 0 is the original bytes):

- region/nation: fixed dimensions, not replicated (TPC-H's own rule).
- customer/supplier/part/orders/lineitem/events: primary AND foreign keys
  shift by c * stride(domain), stride = next power of 10 above the domain's
  max id — referential integrity holds within each copy, and id % 10^j
  patterns (used by batch/delta filters in the catalog) are preserved.
- documents: every token in copy c>0 gets a '~c{c}' suffix (n_chars
  recomputed). Token sets are DISJOINT across copies, so per-copy dedup /
  n-gram / graph selectivity equals the source sf's — without the tag,
  every doc would be a 10-way cross-copy duplicate family and the near-dup
  operators would measure a selectivity cliff instead of scale (the same
  copy-tagging rule tools/scaling_probe.py uses).
- embeddings: copy c's vectors are cyclically rotated by c dimensions
  (norms and per-copy geometry preserved; cross-copy cosine decorrelated,
  so ANN/semantic-dedup candidate sets scale instead of collapsing into
  identical twins). vec_id shifts like other keys.

Usage: python tools/gen_sf_scale.py [src_sf_dir] [dst_dir] [k]
       defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_DOMAINS = {
    # column -> key domain (same domain = same stride everywhere)
    "c_custkey": "cust",
    "o_custkey": "cust",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "p_partkey": "part",
    "l_partkey": "part",
    "o_orderkey": "order",
    "l_orderkey": "order",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}

REPLICATED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
FIXED = ["region", "nation"]


def _stride(max_id: int) -> int:
    s = 10
    while s <= max_id:
        s *= 10
    return s


def _shift_column(arr: pa.ChunkedArray, delta: int) -> pa.ChunkedArray:
    return pc.cast(pc.add(arr, pa.scalar(delta, type=arr.type)), arr.type)


def _tag_documents(t: pa.Table, c: int) -> pa.Table:
    texts = t["text"].to_pylist()
    tagged = [" ".join(f"{w}~c{c}" for w in s.split()) for s in texts]
    n_chars = pa.array([len(s) for s in tagged], type=t.schema.field("n_chars").type)
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(tagged, type=pa.string()))
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _rotate_embeddings(t: pa.Table, c: int) -> pa.Table:
    col = t["embedding"].combine_chunks()
    mat = np.asarray(col.to_pylist(), dtype=np.float32)
    rolled = np.roll(mat, c, axis=1)
    rotated = pa.array(list(rolled), type=t.schema.field("embedding").type)
    return t.set_column(t.schema.get_field_index("embedding"), "embedding", rotated)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    # strides from observed max ids (consistent across referencing tables)
    maxes: dict[str, int] = {}
    for name in REPLICATED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        for col, dom in KEY_DOMAINS.items():
            if col in t.column_names:
                m = pc.max(t[col]).as_py()
                maxes[dom] = max(maxes.get(dom, 0), int(m))
    strides = {dom: _stride(m) for dom, m in maxes.items()}
    # vec_id must stay CONTIGUOUS 0..n-1 after scaling: the IVF/PQ index
    # builds seed their k-means by strided ids (init_ids = i * (n // k)),
    # which assumes a dense id domain — power-of-10 gaps would make most
    # seeds nonexistent and the index build degenerate. Exact-row-count
    # stride keeps the domain dense; nothing references vec_id externally.
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    strides["vec"] = emb.num_rows
    print("strides:", strides)

    for name in FIXED:
        srcp = os.path.join(src, f"{name}.parquet")
        pq.write_table(pq.read_table(srcp), os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied (fixed dimension)")

    for name in REPLICATED:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        # Stream copies straight into the writer (one row group batch per
        # copy) instead of concat-ing k tables in memory: at k=300 the
        # concat of lineitem would hold ~18 GB of Arrow buffers for no
        # semantic gain — the written rows are identical either way.
        total = 0
        with pq.ParquetWriter(os.path.join(dst, f"{name}.parquet"), t.schema) as w:
            for c in range(k):
                tc = t
                if c > 0:
                    for col in t.column_names:
                        dom = KEY_DOMAINS.get(col)
                        if dom:
                            idx = tc.schema.get_field_index(col)
                            tc = tc.set_column(idx, col, _shift_column(tc[col], c * strides[dom]))
                    if name == "documents":
                        tc = _tag_documents(tc, c)
                    if name == "embeddings":
                        tc = _rotate_embeddings(tc, c)
                assert tc.schema.equals(t.schema), (name, tc.schema, t.schema)
                w.write_table(tc)
                total += tc.num_rows
        print(f"{name}: {t.num_rows} -> {total} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
