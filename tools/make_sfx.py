#!/usr/bin/env python3
"""Synthesize an sfN-scale fixture from sf0.1 by K-fold replication with
key shifting (referential integrity preserved), for scaling-sanity bench
runs only — the driver never reads this. Dev-only tool.

Usage: python3 tools/make_sfx.py <srcDir> <dstDir> <K>

Key scheme: replica r shifts every entity key by r * 10^9 (well above
any fixture key), so joins fan out exactly K-fold with no cross-replica
collisions. Dimensions (region/nation) are shared, as at real scale.
Documents get a per-replica token appended so replicas are near-dups,
not byte-dups (dedup costs grow the honest way); embeddings keep their
vectors (ANN cost is row-linear).
"""
import os
import sys

import duckdb

SHIFT = 10 ** 9


def main(src, dst, k):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy(t):
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                    f"TO '{dst}/{t}.parquet' (FORMAT parquet)")

    def repl(t, sql):
        parts = " UNION ALL ".join(
            sql.format(r=r, shift=r * SHIFT,
                       src=f"read_parquet('{src}/{t}.parquet')")
            for r in range(k))
        con.execute(f"COPY ({parts}) TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")

    copy("region")
    copy("nation")
    repl("customer", "SELECT c_custkey + {shift} AS c_custkey, c_name, "
         "c_nationkey, c_acctbal, c_mktsegment FROM {src}")
    repl("supplier", "SELECT s_suppkey + {shift} AS s_suppkey, s_name, "
         "s_nationkey, s_acctbal FROM {src}")
    repl("part", "SELECT p_partkey + {shift} AS p_partkey, p_name, p_brand, "
         "p_type, p_size, p_retailprice FROM {src}")
    repl("orders", "SELECT o_orderkey + {shift} AS o_orderkey, "
         "o_custkey + {shift} AS o_custkey, o_orderstatus, o_totalprice, "
         "o_orderdate, o_orderpriority FROM {src}")
    repl("lineitem", "SELECT l_orderkey + {shift} AS l_orderkey, "
         "l_partkey + {shift} AS l_partkey, l_suppkey + {shift} AS l_suppkey, "
         "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
         "l_returnflag, l_linestatus, l_shipdate FROM {src}")
    repl("events", "SELECT event_id + {shift} AS event_id, ts, "
         "user_id + {shift} AS user_id, event_type, value, props FROM {src}")
    # replica texts must NOT be near-dups of the originals (a 100%
    # near-dup rate would blow candidate-pair counts quadratically in a
    # way real 10x corpora don't): weave a replica-unique token into
    # every 3rd word so every 4-gram shingle differs across replicas,
    # keeping length/word statistics realistic. r=0 keeps originals.
    repl("documents", "SELECT doc_id + {shift} AS doc_id, "
         "CASE WHEN {r} = 0 THEN text ELSE array_to_string("
         "list_transform(string_split(text, ' '), "
         "(w, i) -> CASE WHEN i % 3 = 0 THEN w || ' zq{r}x' ELSE w END), ' ') "
         "END AS text, lang, source, "
         "CAST(len(CASE WHEN {r} = 0 THEN text ELSE array_to_string("
         "list_transform(string_split(text, ' '), "
         "(w, i) -> CASE WHEN i % 3 = 0 THEN w || ' zq{r}x' ELSE w END), ' ') "
         "END) AS BIGINT) AS n_chars FROM {src}")
    repl("embeddings", "SELECT vec_id + {shift} AS vec_id, embedding, label "
         "FROM {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
