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

documents/embeddings replicate with offset ids and, by default,
UNCHANGED payloads: a corpus where every text has K exact copies is a
legitimate (web-crawl-like) dedup workload — the dedup/LSH benches get
denser candidate sets at sfN, which is one stress direction.

``--perturb`` switches to the SPARSE-duplicate regime: replica 0 keeps
the original payloads, replicas 1..K-1 get deterministic token-level
edits (~5% of tokens mutated, keyed on (doc_id, replica, position) —
no RNG) and embeddings get per-dimension ±0.5% scaling. Exact-text
contraction then does NOT collapse the corpus, so the near-dup pair
ops (minhash/simhash/tfidf) are stressed where contraction can't help.

Usage: python tools/gen_sf.py [factor=10] [out=/root/repo/.localdata/sf1] [--perturb]
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


# token-level mutation for --perturb replicas: ~RATE% of tokens get a
# '~' suffix edit, chosen by a deterministic hash of (doc, replica,
# position, token) — near-dup (not exact-dup) copies
_PERTURB_TOKEN_RATE = 5


def _perturbed_text_sql(space: str) -> str:
    key = f"CAST(doc_id AS VARCHAR) || '-' || CAST(__r AS VARCHAR) || '-' || CAST(i AS VARCHAR) || '-' || x"
    return f"""CASE WHEN __r = 0 THEN text ELSE
      array_to_string(
        list_transform(string_split(text, ' '),
          (x, i) -> CASE WHEN hash({key}) % 100 < {_PERTURB_TOKEN_RATE}
                    THEN x || '~' ELSE x END),
        ' ')
    END AS text"""


def _perturbed_embedding_sql() -> str:
    key = "CAST(vec_id AS VARCHAR) || '-' || CAST(__r AS VARCHAR) || '-' || CAST(i AS VARCHAR)"
    return f"""CASE WHEN __r = 0 THEN embedding ELSE
      list_transform(embedding,
        (x, i) -> CAST(x * (1.0 + (CAST(hash({key}) % 11 AS DOUBLE) - 5.0) / 1000.0) AS FLOAT))
    END AS embedding"""


def amplify(factor: int, out_dir: str, perturb: bool = False) -> None:
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
        if perturb and t == "documents":
            repl += ", " + _perturbed_text_sql("doc")
        elif perturb and t == "embeddings":
            repl += ", " + _perturbed_embedding_sql()
        inner = f"""SELECT * EXCLUDE (__r) REPLACE ({repl})
  FROM (SELECT s.*, r.range AS __r
        FROM '{SRC}/{t}.parquet' s, range({factor}) r)"""
        if perturb and t == "documents":
            # n_chars tracks the mutated text (it's the last column, so
            # exclude-and-append preserves schema order)
            inner = f"SELECT * EXCLUDE (n_chars), length(text) AS n_chars FROM ({inner})"
        con.execute(
            f"COPY ({inner}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows (x{factor})")


def longdocs(factor: int, out_dir: str) -> None:
    """LONG-DOCUMENT regime for the ExactSubstr k=50 bar (the paper's
    anchor needs documents much longer than the ~54-token fixture
    docs): each output doc concatenates 9 globally-UNIQUE ~54-token
    segments (source texts, replica-suffixed past one pass — no
    accidental repeats), ~500 tokens/doc, and every 3rd doc gets one
    of 20 EXACT 60-token boilerplate paragraphs injected mid-doc —
    the known repeated-substring mass a k=50 run must recover.
    Deterministic throughout; emits documents.parquet only (the
    substring ops read nothing else)."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""CREATE TABLE src AS
        SELECT text, row_number() OVER (ORDER BY doc_id) - 1 AS rid
        FROM '{SRC}/documents.parquet'"""
    )
    n_src = con.execute("SELECT COUNT(*) FROM src").fetchone()[0]
    n_out = (n_src // 9) * factor
    con.execute(
        f"""CREATE TABLE segtext AS
        SELECT t.i, u.j,
               CASE WHEN (t.i * 9 + u.j) // {n_src} = 0 THEN s.text
                    ELSE array_to_string(
                      list_transform(string_split(s.text, ' '),
                        x -> x || '~' || CAST((t.i * 9 + u.j) // {n_src} AS VARCHAR)),
                      ' ') END AS text
        FROM range({n_out}) t(i), range(9) u(j)
        JOIN src s ON s.rid = (t.i * 9 + u.j) % {n_src}"""
    )
    con.execute(
        f"""CREATE TABLE boiler AS
        SELECT t.i, 9 AS ord,
               array_to_string(list_transform(range(60),
                 w -> 'bp' || CAST((t.i // 3) % 20 AS VARCHAR)
                      || 'w' || CAST(w AS VARCHAR)), ' ') AS text
        FROM range({n_out}) t(i) WHERE t.i % 3 = 0"""
    )
    con.execute(
        f"""COPY (
        SELECT i AS doc_id,
               string_agg(text, ' ' ORDER BY ord) AS text,
               'longdoc' AS source, 'en' AS lang,
               length(string_agg(text, ' ' ORDER BY ord)) AS n_chars
        FROM (
          SELECT i, j * 2 AS ord, text FROM segtext
          UNION ALL SELECT i, ord, text FROM boiler
        ) GROUP BY i
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    n = con.execute(
        f"SELECT COUNT(*), SUM(len(string_split(text, ' '))) FROM '{out_dir}/documents.parquet'"
    ).fetchone()
    print(f"  documents: {n[0]} long docs, {n[1]} tokens")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    perturb = "--perturb" in sys.argv[1:]
    long_mode = "--longdocs" in sys.argv[1:]
    factor = int(args[0]) if args else 10
    if long_mode:
        out = args[1] if len(args) > 1 else "/root/repo/.localdata/sflong"
        longdocs(factor, out)
        print(f"wrote {out} (long-document regime)")
        return
    out = args[1] if len(args) > 1 else (
        "/root/repo/.localdata/sf1p" if perturb else "/root/repo/.localdata/sf1"
    )
    amplify(factor, out, perturb=perturb)
    print(f"wrote {out}" + (" (perturbed payloads)" if perturb else ""))


if __name__ == "__main__":
    main()
