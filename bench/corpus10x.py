"""Build a structure-preserving 10x replica of a full sf directory
(VERDICT r4 ask #3: suite-wide scaling must be measured at 10x data, not
just the dedup tail).

Replication rules (deterministic, no RNG, same philosophy as
bench/dedup_scale.py's documents blow-up):

* fact/entity tables replicate with per-replica KEY SHIFTS that preserve
  every intra-replica join: (customer.c_custkey, orders.o_custkey) and
  (orders.o_orderkey, lineitem.l_orderkey) shift together, so replica k is
  an exact topological copy of the original — 10x rows => 10x join work,
  never a 10x10 cross-replica blow-up;
* documents replicate with the replica-token-prefix bijection (keeps the
  near-dup structure per replica, zero shared shingles across replicas);
  n_chars is recomputed from the transformed text;
* embeddings replicate with shifted vec_id (vectors unchanged): the
  eval-set predicate vec_id % 17 == 0 keeps selecting ~1/17 of every
  replica (10_000_000 % 17 != 0), so decontamination work scales 10x on
  both sides;
* dimension tables (region/nation/supplier/part) copy as-is — at any real
  scale dimensions grow sublinearly, and the suite joins them broadcast.

All replicated tables are written with ROW_GROUP_SIZE 2048 so scans are
splittable (PLANS.md "partition starvation" rule). Cached on tmpfs by
(source, factor).

Usage: python bench/corpus10x.py [--factor 10] [--src /root/testdata/sf0.1]
Prints the built directory path.
"""

from __future__ import annotations

import argparse
import os

SHIFT = 10_000_000
COPY_AS_IS = ["region", "nation", "supplier", "part"]


def data_root() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def build(src: str, factor: int) -> str:
    import shutil

    import duckdb

    out = os.path.join(data_root(), f"dex_suite10x_f{factor}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rep = f"CROSS JOIN (SELECT unnest(range({factor})) AS k) r"
    rg = "(FORMAT PARQUET, ROW_GROUP_SIZE 2048)"

    def copy(sql: str, table: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' {rg}")

    copy(
        f"""SELECT c_custkey + r.k * {SHIFT} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{src}/customer.parquet') {rep}""",
        "customer",
    )
    copy(
        f"""SELECT o_orderkey + r.k * {SHIFT} AS o_orderkey,
                   o_custkey + r.k * {SHIFT} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src}/orders.parquet') {rep}""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + r.k * {SHIFT} AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet') {rep}""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + r.k * {SHIFT} AS event_id, ts,
                   user_id + r.k * {SHIFT} AS user_id, event_type, value, props
            FROM read_parquet('{src}/events.parquet') {rep}""",
        "events",
    )
    copy(
        f"""SELECT d.doc_id + r.k * 1000000 AS doc_id,
                   CASE WHEN r.k = 0 THEN d.text
                        ELSE array_to_string(
                            list_transform(string_split(d.text, ' '),
                                           t -> 'r' || r.k || t), ' ')
                   END AS text,
                   d.lang, d.source,
                   length(CASE WHEN r.k = 0 THEN d.text
                          ELSE array_to_string(
                              list_transform(string_split(d.text, ' '),
                                             t -> 'r' || r.k || t), ' ')
                          END)::BIGINT AS n_chars
            FROM read_parquet('{src}/documents.parquet') d {rep}""",
        "documents",
    )
    copy(
        f"""SELECT vec_id + r.k * {SHIFT} AS vec_id, embedding, label
            FROM read_parquet('{src}/embeddings.parquet') {rep}""",
        "embeddings",
    )
    for t in COPY_AS_IS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    with open(done, "w") as f:
        f.write(f"{src} x{factor}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    print(build(args.src, args.factor))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
