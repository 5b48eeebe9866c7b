"""Deterministic sf1 scale-up: 10 disjoint shards of sf0.1 (bench-only).

/root/testdata ships sf ≤ 0.1; the sf1 scale-confirmation bench (VERDICT r4
item 4) needs a 10× input with the SAME distributional shape so per-query
times can be compared as ~10× or flagged superlinear.  Each table becomes 10
key-offset copies of sf0.1 — i.e. ten independent shards of the same
workload, the natural scale dimension (more users / docs / vectors, not
longer histories):

  * events      — user_id += i·1e6, event_id += i·1e7 (10× users, each with
                  an sf0.1-shaped series; kernel cohorts scale 10×)
  * documents   — doc_id += i·1e6; every word suffixed `_i` for i>0, so copy
                  vocabularies are DISJOINT: cross-shard jaccard/minhash/
                  simhash matches are impossible and near-dup pair counts
                  scale exactly 10× (identical texts across copies would
                  scale pairs ~100× and measure the generator, not the
                  engine); per-shingle doc frequency — and so the
                  max_doc_freq hot-shingle cap — behaves exactly as at sf0.1
  * embeddings  — vec_id += i·1e6; vector dims rolled by (7·i) mod 64 for
                  i>0 (norm- and geometry-preserving within a copy;
                  cross-copy similarities decorrelate, so embedding
                  near-dup pairs scale ~10×)
  * orders/customer — o_orderkey += i·1e7, *_custkey += i·1e6
  * lineitem    — l_orderkey += i·1e7 (pricing_summary is a scan-agg; part/
                  supplier FKs unused by the headline queries)
  * region/nation/part/supplier — dimension tables, copied as-is

Pure deterministic SQL over the read-only source parquet; output goes to
the given directory (default /tmp/testdata_sf1).  Usage:

    python tools/make_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    import duckdb

    con = duckdb.connect()

    def gen(name: str, per_copy_sql):
        parts = " UNION ALL ".join(per_copy_sql(i) for i in range(copies))
        con.sql(
            f"COPY ({parts}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    def src(name):
        return f"read_parquet('{SRC}/{name}.parquet')"

    gen(
        "events",
        lambda i: f"""
        SELECT event_id + {i * 10_000_000} AS event_id, ts,
               user_id + {i * 1_000_000} AS user_id, event_type, value, props
        FROM {src('events')}""",
    )
    # n_chars computed in an OUTER select over the transformed text: inside
    # one SELECT, DuckDB binds length(text) to the BASE column, not the
    # lateral alias, which would store a stale pre-transform count
    gen(
        "documents",
        lambda i: (
            "SELECT doc_id, text, lang, source, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM ("
            f"SELECT doc_id + {i * 1_000_000} AS doc_id, "
            + (
                "text, "
                if i == 0
                else f"array_to_string(list_transform(string_split(text, ' '), w -> w || '_{i}'), ' ') AS text, "
            )
            + f"lang, source FROM {src('documents')})"
        ),
    )
    gen(
        "embeddings",
        lambda i: (
            f"SELECT vec_id + {i * 1_000_000} AS vec_id, "
            + (
                "embedding, "
                if i == 0
                else f"list_concat(embedding[{(7 * i) % 64 + 1}:], embedding[:{(7 * i) % 64}]) AS embedding, "
            )
            + f"label FROM {src('embeddings')}"
        ),
    )
    gen(
        "orders",
        lambda i: f"""
        SELECT o_orderkey + {i * 10_000_000} AS o_orderkey,
               o_custkey + {i * 1_000_000} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""",
    )
    gen(
        "customer",
        lambda i: f"""
        SELECT c_custkey + {i * 1_000_000} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}""",
    )
    gen(
        "lineitem",
        lambda i: f"""
        SELECT l_orderkey + {i * 10_000_000} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""",
    )
    for dim in ("region", "nation", "part", "supplier"):
        con.sql(
            f"COPY (SELECT * FROM {src(dim)}) TO '{out}/{dim}.parquet' (FORMAT PARQUET)"
        )
        print(f"{dim}: copied")
    print(f"sf1 ({copies} shards of sf0.1) written to {out}")


if __name__ == "__main__":
    main()
