#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same sf dir, compare
row count, schema width, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmcoastline_spark.session import get_spark  # noqa: E402
from osmcoastline_spark.sources.tables import TPCH_TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rows: spark={len(sdf)} duckdb={len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"cols: spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        return problems
    # The driver hashes the *serialized* frames, so a dtype mismatch (e.g.
    # DuckDB HUGEINT -> float64 vs Spark int64) fails its gate even when every
    # value compares equal.  Mirror that strictness here so this replica can
    # never stay green while the driver is red (round-3 q_location_join lesson).
    for c in sorted(sdf.columns):
        sa, da = sdf[c].dtype, ddf[c].dtype
        if sa != da:
            problems.append(f"col {c}: dtype spark={sa} duckdb={da}")
    if problems:
        return problems
    a, b = canon(sdf), canon(ddf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype.kind == "f":
                import numpy as np

                bad = ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                if bad.any():
                    i = int(bad.argmax())
                    problems.append(f"col {c}: first diff row {i}: {av[i]!r} vs {bv[i]!r}")
            else:
                neq = av != bv
                if neq.any():
                    i = int(neq.argmax())
                    problems.append(f"col {c}: first diff row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()
    ok = fail = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            fail += 1
            continue
        if sql is None:
            vac = "  WARN vacuous (0 rows)" if len(sdf) == 0 else ""
            print(f"SKIP {name}: rows-only ({len(sdf)} rows){vac}")
            skipped += 1
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            vac = "  WARN vacuous (0 rows)" if len(sdf) == 0 else ""
            print(f"OK   {name} ({len(sdf)} rows){vac}")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
