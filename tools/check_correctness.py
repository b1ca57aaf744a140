"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the
given scale factor, then compares row count, column names/order-insensitive
values. Stricter than the driver (exact value equality after sorting),
so passing here should imply passing the driver's hash check.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # unify numeric dtypes for comparison
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(oracle_df)}")
        return problems
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"columns spark={sorted(spark_df.columns)} duck={sorted(oracle_df.columns)}")
        return problems
    s, d = normalize(spark_df), normalize(oracle_df)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if sc.dtype.kind != dc.dtype.kind:
            # driver hashes reprs — int vs float (e.g. DuckDB HUGEINT sums)
            # or object vs numeric would mismatch even with equal values
            problems.append(f"col {c}: dtype kind spark={sc.dtype} duck={dc.dtype}")
            continue
        if sc.dtype.kind == "f" or dc.dtype.kind == "f":
            eq = (sc.isna() & dc.isna()) | (sc == dc)
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())} value mismatches, first at row {bad}: "
                    f"spark={sc[bad]!r} duck={dc[bad]!r}"
                )
        else:
            if not sc.equals(dc):
                neq = sc.astype(str) != dc.astype(str)
                if neq.any():
                    bad = neq.idxmax()
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first at row {bad}: "
                        f"spark={sc[bad]!r} duck={dc[bad]!r} "
                        f"(dtypes {sc.dtype}/{dc.dtype})"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("correctness-check")
    con = duck_con(sf_dir)
    failed = []
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        sdf = spec.spark(spark, sf_dir).toPandas()
        t1 = time.time()
        if spec.oracle is None:
            print(f"  {name}: rows={len(sdf)} (no oracle) [{t1 - t0:.1f}s]")
            continue
        ddf = con.execute(spec.oracle).df()
        problems = compare(name, sdf, ddf)
        status = "OK" if not problems else "FAIL"
        print(f"  {name}: {status} rows={len(sdf)} [{t1 - t0:.1f}s]")
        for p in problems:
            print(f"      {p}")
        if problems:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
