"""Generate an sf1 benchmark dataset (~6M-row lineitem) by replicating
the driver's read-only sf0.1 tables 10x with consistent key shifts —
the scale-audit input for BENCH_SF1.md (never used for correctness:
the oracle gate stays on the driver's sf0.01).

Design: copy i (0..9) shifts every key column by ``i * (max_key+1)``
consistently across fact and dimension tables, so join fan-outs,
group-size distributions, and FK selectivity all scale by exactly 10x.
Continuous measures get a copy-dependent relative jitter (1 + i*1e-8)
and timestamps a +i microsecond shift so near-unique VALUE DOMAINS
also grow ~10x (a pure replicate would keep distinct-value counts
constant and understate the cost of the value-domain passes, e.g. the
stepped-cumsum rank operators). Documents get a per-copy suffix token
and embeddings a first-component offset so the dedup/ANN families
don't see 10 exact duplicates of everything (which would be a
pathological, not a scaled, workload). region/nation stay fixed
(TPC-H-style fixed dims). Deterministic — no RNG at all.

Run: python tools/gen_sf1.py [out_dir] [src_dir] [copies]
(defaults: benchdata/sf1, /root/testdata/sf0.1, 10). The sf10 decade
input chains it: ``python tools/gen_sf1.py benchdata/sf10
benchdata/sf1 10`` — strides are recomputed from the source tables,
so copy-of-copies keeps keys collision-free.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
ROW_GROUP = 131072


def _shift(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(off, type=col.type))


def _jitter(col: pa.ChunkedArray, i: int) -> pa.ChunkedArray:
    return pc.multiply(col, pa.scalar(1.0 + i * 1e-8, type=col.type))


def _ts_shift(col: pa.ChunkedArray, i: int) -> pa.ChunkedArray:
    as_i = col.cast(pa.int64())
    return pc.add(as_i, pa.scalar(i, type=pa.int64())).cast(col.type)


def main(out_dir: str, src: str = SRC, copies: int = COPIES) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tabs = {
        t: pq.read_table(f"{src}/{t}.parquet")
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }
    # key strides: max+1 per key domain, shared across referencing tables
    stride = {
        "cust": pc.max(tabs["customer"]["c_custkey"]).as_py() + 1,
        "supp": pc.max(tabs["supplier"]["s_suppkey"]).as_py() + 1,
        "part": pc.max(tabs["part"]["p_partkey"]).as_py() + 1,
        "order": pc.max(tabs["orders"]["o_orderkey"]).as_py() + 1,
        "event": pc.max(tabs["events"]["event_id"]).as_py() + 1,
        "user": pc.max(tabs["events"]["user_id"]).as_py() + 1,
        "doc": pc.max(tabs["documents"]["doc_id"]).as_py() + 1,
        "vec": pc.max(tabs["embeddings"]["vec_id"]).as_py() + 1,
    }

    def copy_table(name: str, i: int) -> pa.Table:
        t = tabs[name]
        cols = {c: t[c] for c in t.column_names}
        if name == "customer":
            cols["c_custkey"] = _shift(cols["c_custkey"], i * stride["cust"])
            cols["c_acctbal"] = _jitter(cols["c_acctbal"], i)
        elif name == "supplier":
            cols["s_suppkey"] = _shift(cols["s_suppkey"], i * stride["supp"])
            cols["s_acctbal"] = _jitter(cols["s_acctbal"], i)
        elif name == "part":
            cols["p_partkey"] = _shift(cols["p_partkey"], i * stride["part"])
            cols["p_retailprice"] = _jitter(cols["p_retailprice"], i)
        elif name == "orders":
            cols["o_orderkey"] = _shift(cols["o_orderkey"], i * stride["order"])
            cols["o_custkey"] = _shift(cols["o_custkey"], i * stride["cust"])
            cols["o_totalprice"] = _jitter(cols["o_totalprice"], i)
            cols["o_orderdate"] = _ts_shift(cols["o_orderdate"], i)
        elif name == "lineitem":
            cols["l_orderkey"] = _shift(cols["l_orderkey"], i * stride["order"])
            cols["l_partkey"] = _shift(cols["l_partkey"], i * stride["part"])
            cols["l_suppkey"] = _shift(cols["l_suppkey"], i * stride["supp"])
            cols["l_extendedprice"] = _jitter(cols["l_extendedprice"], i)
            cols["l_shipdate"] = _ts_shift(cols["l_shipdate"], i)
        elif name == "events":
            cols["event_id"] = _shift(cols["event_id"], i * stride["event"])
            cols["user_id"] = _shift(cols["user_id"], i * stride["user"])
            cols["ts"] = _ts_shift(cols["ts"], i)
            cols["value"] = _jitter(cols["value"], i)
        elif name == "documents":
            cols["doc_id"] = _shift(cols["doc_id"], i * stride["doc"])
            if i > 0:
                suf = f" cp{i}"
                cols["text"] = pc.binary_join_element_wise(
                    cols["text"].cast(pa.string()),
                    pa.chunked_array(
                        [pa.array([suf] * len(t), type=pa.string())]
                    ),
                    "",
                )
                cols["n_chars"] = pc.add(
                    cols["n_chars"], pa.scalar(len(suf), type=pa.int64())
                )
        elif name == "embeddings":
            cols["vec_id"] = _shift(cols["vec_id"], i * stride["vec"])
            if i > 0:
                emb = cols["embedding"].combine_chunks()
                flat = emb.flatten().to_numpy(zero_copy_only=False).copy()
                dims = len(flat) // len(t)
                flat[::dims] += np.float32(i * 1e-4)
                cols["embedding"] = pa.chunked_array(
                    [
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(flat, type=pa.float32()), dims
                        ).cast(pa.list_(pa.float32()))
                    ]
                )
        return pa.table(cols)

    for name in tabs:
        if name in ("region", "nation"):
            out = tabs[name]
        else:
            out = pa.concat_tables(
                [copy_table(name, i) for i in range(copies)]
            )
        pq.write_table(
            out, f"{out_dir}/{name}.parquet", row_group_size=ROW_GROUP
        )
        print(name, out.num_rows)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1",
        sys.argv[2] if len(sys.argv) > 2 else SRC,
        int(sys.argv[3]) if len(sys.argv) > 3 else COPIES,
    )
