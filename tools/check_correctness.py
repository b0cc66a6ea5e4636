"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and compares to the
``oracle_sql()`` DuckDB result: row count, column names, and an
order-insensitive value comparison (rows sorted by all columns, column
order normalized by name). Prints one line per query.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(df):
    import pandas as pd

    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if str(dt).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif np.issubdtype(dt, np.floating):
            df[c] = df[c].astype("float64").round(6)
        elif np.issubdtype(dt, np.integer):
            df[c] = df[c].astype("int64")
        elif dt == bool or str(dt) == "boolean":
            df[c] = df[c].astype(bool)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


def main(only: list[str] | None = None):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from cobweb_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            results[name] = "spark_error"
            continue
        t1 = time.time()
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(sdf)} rows ({t1 - t0:.1f}s) "
                "[rows-only, no oracle]"
            )
            results[name] = "rows_only"
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            results[name] = "duckdb_error"
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            print(
                f"FAIL  {name}: column mismatch {list(a.columns)} vs "
                f"{list(b.columns)}"
            )
            results[name] = "cols"
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: row count {len(a)} vs {len(b)}")
            results[name] = "rows"
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            badcols = [c for c in a.columns if neq[c].any()]
            print(
                f"FAIL  {name}: {bad.sum()} differing rows of {len(a)}; "
                f"cols: {badcols}"
            )
            with pd.option_context(
                "display.width", 250, "display.max_columns", 50
            ):
                print(a.loc[bad, badcols].head(3))
                print(b.loc[bad, badcols].head(3))
            results[name] = "values"
            continue
        print(f"OK    {name}: {len(a)} rows ({t1 - t0:.1f}s)")
        results[name] = "ok"

    n_ok = sum(1 for v in results.values() if v == "ok")
    n_rows = sum(1 for v in results.values() if v == "rows_only")
    n_bad = len(results) - n_ok - n_rows
    print(f"\n{n_ok} ok, {n_rows} rows-only, {n_bad} failing")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
