#!/usr/bin/env python3
"""Generate a scaled-up testdata dir from an existing one (local tooling,
like make_arrow_fixtures.py — NOT a runtime dependency of the engine).

Each of the N copies offsets every join key by copy_i * (max_key + 1), so
cross-table joins stay consistent and the scaled tables have the same join
selectivity as the source. Text and embeddings are perturbed per copy
(letter-rotation / tiny epsilon) so duplicate-detection and ANN workloads
keep the SOURCE's duplicate structure instead of every row gaining N-1
artificial twins (which would change the complexity class of LSH bucketing,
not just the data size).

Usage: python3 tools/make_scaled_sf.py SRC_DIR DST_DIR FACTOR
   eg: python3 tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1.0 10
"""
import sys
import duckdb


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def mx(table, col):
        return con.execute(
            f"SELECT max({col})+1 FROM '{src}/{table}.parquet'").fetchone()[0]

    ok = mx("orders", "o_orderkey")
    ck = mx("customer", "c_custkey")
    sk = mx("supplier", "s_suppkey")
    pk = mx("part", "p_partkey")
    ek = mx("events", "event_id")
    uk = mx("events", "user_id")
    dk = mx("documents", "doc_id")
    vk = mx("embeddings", "vec_id")

    def scale(table, select):
        copies = " UNION ALL ".join(
            f"SELECT {select.format(i=i)} FROM '{src}/{table}.parquet'"
            for i in range(factor))
        con.execute(
            f"COPY ({copies}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    scale("customer",
          f"c_custkey + {{i}}*{ck} AS c_custkey, c_name, c_nationkey, "
          "c_acctbal, c_mktsegment")
    scale("supplier",
          f"s_suppkey + {{i}}*{sk} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    scale("part",
          f"p_partkey + {{i}}*{pk} AS p_partkey, p_name, p_brand, p_type, "
          "p_size, p_retailprice")
    scale("orders",
          f"o_orderkey + {{i}}*{ok} AS o_orderkey, "
          f"o_custkey + {{i}}*{ck} AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    scale("lineitem",
          f"l_orderkey + {{i}}*{ok} AS l_orderkey, "
          f"l_partkey + {{i}}*{pk} AS l_partkey, "
          f"l_suppkey + {{i}}*{sk} AS l_suppkey, "
          "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
          "l_returnflag, l_linestatus, l_shipdate")
    scale("events",
          f"event_id + {{i}}*{ek} AS event_id, ts, "
          f"user_id + {{i}}*{uk} AS user_id, event_type, value, props")
    # rotate the alphabet per copy: copy i's documents are UNRELATED to
    # copy j's (shingles diverge wholesale), so dup structure = source x N
    abc = "abcdefghijklmnopqrstuvwxyz"

    def rot(i):
        r = abc[i % 26:] + abc[:i % 26]
        return f"translate(text, '{abc}', '{r}')"
    scale("documents",
          f"doc_id + {{i}}*{dk} AS doc_id, " +
          "CASE WHEN {i} = 0 THEN text ELSE " +
          "translate(text, 'abcdefghijklmnopqrstuvwxyz', "
          "substr('abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyz', "
          "1 + ({i} % 26), 26)) END AS text, "
          "lang, source, n_chars")
    # nudge each copy's vectors by a copy-specific epsilon: geometry stays
    # realistic, but no vector gains N-1 exact twins
    scale("embeddings",
          f"vec_id + {{i}}*{vk} AS vec_id, "
          "list_transform(embedding, x -> CAST(x + {i} * 1e-4 AS FLOAT)) "
          "AS embedding, label")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
