"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row-count + schema-width + order-insensitive value
equality.  Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not isinstance(v, (str, type(None))) else v
            )
        try:
            if str(df[c].dtype).startswith(("float", "Float")):
                df[c] = df[c].round(6)
        except Exception:
            pass
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from crawlkit.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        s, d = norm(sdf), norm(ddf)
        if len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s)} duckdb={len(d)}")
            continue
        if list(s.columns) != list(d.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}")
            continue
        try:
            pd.testing.assert_frame_equal(
                s, d, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            print(f"OK    {name}: {len(s)} rows")
        except AssertionError as ex:
            failures.append(name)
            msg = str(ex).splitlines()
            print(f"FAIL  {name}: values differ: {' | '.join(msg[:4])}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
