"""Dev harness replicating the driver's Spark-vs-DuckDB correctness gate.

Runs every queries() entry at a given sf dir; where oracle_sql() has an
entry, compares row count + column names + order-insensitive values
(rounded) against DuckDB on the same parquet files.
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from localmod_spark.session import get_spark  # noqa: E402
from localmod_spark.sources.tables import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        kind = str(df[c].dtype)
        if kind == "object":
            df[c] = df[c].astype(str)
        elif "bool" in kind:
            df[c] = df[c].astype(bool)
        else:  # all numerics → float64 so int64-vs-HUGEINT dtypes compare by value
            df[c] = df[c].astype(float).round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only=None) -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = normalize(got), normalize(want)
        ok = True
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            ok = False
        elif len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(w)}")
            ok = False
        else:
            diff_cols = []
            for c in g.columns:
                if "float" in str(g[c].dtype):
                    same = [
                        (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-6
                        for a, b in zip(g[c], w[c])
                    ]
                    if not all(same):
                        diff_cols.append(c)
                elif not g[c].equals(w[c]):
                    diff_cols.append(c)
            if diff_cols:
                print(f"[FAIL] {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    neq = g[c] != w[c]
                    print("   spark:", g.loc[neq, c].head(3).tolist(),
                          " duck:", w.loc[neq, c].head(3).tolist())
                ok = False
        if ok:
            print(f"[OK]   {name}: {len(g)} rows")
        else:
            failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            # optional 2nd arg: comma-separated query names to spot-check
            only=set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
        )
    )
