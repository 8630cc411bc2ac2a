"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + column names + order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def row_key(row, cols):
    return tuple(norm(row[c]) for c in cols)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from inverted_index_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spd)} rows")
            continue
        try:
            dpd = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols, dcols = sorted(spd.columns), sorted(dpd.columns)
        ok = True
        if scols != dcols:
            print(f"[FAIL] {name}: columns {scols} vs {dcols}")
            ok = False
        elif len(spd) != len(dpd):
            print(f"[FAIL] {name}: rows {len(spd)} vs {len(dpd)}")
            ok = False
        else:
            srows = sorted(
                [row_key(r, scols) for _, r in spd.iterrows()]
            )
            drows = sorted(
                [row_key(r, dcols) for _, r in dpd.iterrows()]
            )
            if srows != drows:
                diff = [
                    (a, b) for a, b in zip(srows, drows) if a != b
                ][:3]
                print(f"[FAIL] {name}: values differ, first diffs: {diff}")
                ok = False
        if ok:
            print(f"[ OK ] {name}: {len(spd)} rows")
        else:
            failures.append(name)
    print("\nFAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
