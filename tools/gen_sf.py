"""Scale-factor amplifier: build sfN testdata from sf0.1 by
deterministic K× replication with per-replica key offsets.

The container has no network (DuckDB's tpch extension can't download)
and /root/testdata is read-only, so larger scale factors are derived
from the largest driver-provided one: every table's key columns shift
by ``replica * (max_key + 1)`` so FK integrity, join fan-outs and
per-key distributions are preserved exactly; dims and facts scale
together, and fixed-size dimensions (region, nation) stay fixed — the
TPC-H scaling rule. No randomness anywhere: replica r of any row is a
pure function of the source row.

Runs in DuckDB, not Spark: the events table stores TIMESTAMP_NS, which
Spark's reader rejects outright — DuckDB reads it and writes µs
timestamps (the values are µs-granular per TESTDATA, so this is
lossless), which BOTH engines then read natively
(queries/_det.py:events_table handles either encoding).

documents/embeddings replicate with offset ids and UNCHANGED payloads:
a corpus where every text has K exact copies is a legitimate (web-crawl
-like) dedup workload — the dedup/LSH benches get denser candidate
sets at sfN, which is the stress direction we want.

Usage: python tools/gen_sf.py [factor=10] [out=/root/repo/.localdata/sf1]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: key-space it belongs to}; every column sharing a
# key space shifts by the same offset so joins keep matching
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONCE = ("region", "nation")  # fixed-size dims don't scale (TPC-H rule)


def amplify(factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    space_size: dict[str, int] = {}
    for t, cols in KEYED.items():
        for col, space in cols.items():
            mx = con.execute(
                f"SELECT MAX({col}) FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            space_size[space] = max(space_size.get(space, 0), int(mx) + 1)

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, cols in KEYED.items():
        repl = ", ".join(
            f"{col} + __r * {space_size[space]} AS {col}"
            for col, space in cols.items()
        )
        con.execute(
            f"""COPY (
  SELECT * EXCLUDE (__r) REPLACE ({repl})
  FROM (SELECT s.*, r.range AS __r
        FROM '{SRC}/{t}.parquet' s, range({factor}) r)
) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"""
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows (x{factor})")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    amplify(factor, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
