#!/usr/bin/env python3
"""Generate sf1.0-shaped testdata (10x sf0.1) under /root/repo/testdata/sf1.0.

The driver owns /root/testdata (read-only); the sf1.0 decade exists only
for the SCALING.md curve (timing, not the correctness gate), so it is
DERIVED from sf0.1: ten key-shifted replicas that preserve join
selectivities, group cardinalities per key, and value distributions
(each replica references its own replica of every dimension).

Two tables are decorrelated per copy, because verbatim duplication
would change the WORKLOAD, not just its size:
  - documents: every token in copies 1-9 gets a _k suffix (same token
    count, ~same length). Verbatim copies would hand every doc 9 exact
    near-duplicates, exploding the true pair set of the dedup queries
    ~45x — a data-character change masquerading as superlinear scaling.
  - embeddings: copies 1-9 get a cyclic dimension rotation (7k mod 64).
    Rotation preserves norms and within-copy cosine structure exactly,
    but decorrelates copies from the FIXED LSH planes/centroids —
    verbatim copies would put 10 coincident vectors in every bucket,
    inflating per-bucket candidate pairs ~100x at 10x data.
Key columns shift by (max+1 of the sf0.1 column) per copy; nation and
region stay fixed (dimension tables are sf-invariant, like TPC-H).
Schemas are preserved bit-for-bit (pyarrow cast back to the source
schema), including events' timestamp[ns], which graft.core.Tables
special-cases at read time.
"""
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/testdata/sf1.0"
COPIES = 10

os.makedirs(DST, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def write(t, table, schema):
    table = table.cast(schema)
    pq.write_table(table, f"{DST}/{t}.parquet", compression="snappy")
    print(f"{t}: {table.num_rows} rows")


def stride(table, col):
    return pc.max(table[col]).as_py() + 1


def shifted_copies(table, shift_cols, transform=None):
    """COPIES replicas with each col in shift_cols offset by k*stride."""
    strides = {c: stride(table, c) for c in shift_cols}
    out = []
    for k in range(COPIES):
        t = table
        for c in strides:
            t = t.set_column(t.schema.get_field_index(c), c,
                             pc.add(t[c], k * strides[c]))
        if transform is not None:
            t = transform(t, k)
        out.append(t)
    return pa.concat_tables(out)


def main():
    # Fixed dimensions: copy verbatim.
    for t in ["region", "nation"]:
        src = read(t)
        write(t, src, src.schema)

    for t, cols in [
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("part", ["p_partkey"]),
    ]:
        src = read(t)
        write(t, shifted_copies(src, cols), src.schema)

    cust_stride = stride(read("customer"), "c_custkey")

    # events: event_id shifts by its own stride, but user_id is a FOREIGN
    # KEY into customer (s9/r6 join events.user_id = c_custkey), so it
    # must shift by the REFERENCED table's stride — shifting it by its
    # own max+1 (the old code) cross-wired copy k's events into other
    # copies' (or no) customers whenever max(user_id) != max(c_custkey),
    # changing join selectivity in the sf1.0 curve (ADVICE r6).
    events = read("events")

    def fix_events(t, k):
        i = t.schema.get_field_index("user_id")
        return t.set_column(i, "user_id", pc.add(t["user_id"], k * cust_stride))
    write("events", shifted_copies(events, ["event_id"], fix_events),
          events.schema)

    # orders/lineitem: foreign keys must shift by the REFERENCED table's
    # stride so copy k points at copy k of its dimensions.
    orders = read("orders")
    ok_stride = stride(orders, "o_orderkey")

    def fix_orders(t, k):
        i = t.schema.get_field_index("o_custkey")
        return t.set_column(i, "o_custkey", pc.add(t["o_custkey"], k * cust_stride))
    write("orders", shifted_copies(orders, ["o_orderkey"], fix_orders),
          orders.schema)

    li = read("lineitem")
    part_stride = stride(read("part"), "p_partkey")
    supp_stride = stride(read("supplier"), "s_suppkey")

    def fix_li(t, k):
        for c, s in [("l_orderkey", ok_stride), ("l_partkey", part_stride),
                     ("l_suppkey", supp_stride)]:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.add(t[c], k * s))
        return t
    write("lineitem", shifted_copies(li, [], fix_li), li.schema)

    # documents: suffix every token of copies 1-9, keep n_chars honest.
    docs = read("documents")

    def fix_docs(t, k):
        if k == 0:
            return t
        suf = f"_{k}"
        texts = [" ".join(w + suf for w in (s or "").split(" "))
                 for s in t["text"].to_pylist()]
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in texts], pa.int64()))
        return t
    write("documents", shifted_copies(docs, ["doc_id"], fix_docs), docs.schema)

    # embeddings: cyclic dimension rotation per copy.
    emb = read("embeddings")

    def fix_emb(t, k):
        if k == 0:
            return t
        r = (7 * k) % 64
        vecs = [v[r:] + v[:r] for v in t["embedding"].to_pylist()]
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(vecs, pa.list_(pa.float32())))
        return t
    write("embeddings", shifted_copies(emb, ["vec_id"], fix_emb), emb.schema)


if __name__ == "__main__":
    main()
