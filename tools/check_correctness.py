"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at a given SF, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from sneldb_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "timestamp"):  # datetime
        return int(v.timestamp())
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    # Spill guard: an accidentally quadratic oracle must fail loudly, not
    # fill the repo filesystem (at sf1 a hot-key AxB as-of join spilled
    # >70 GB into ./.tmp before the window-form rewrite; see the as-of
    # oracle comment in __spark_entry__.py)
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.execute("SET max_temp_directory_size='20GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
            dcols = list(dpdf.columns)
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        # The driver's value hash is pandas-dtype-sensitive (a Spark BIGINT
        # column hashing as int64 will never match a DuckDB HUGEINT column
        # arriving as float64). Compare dtype kinds per column name.
        skinds = {c: spdf[c].dtype.kind for c in scols}
        dkinds = {c: dpdf[c].dtype.kind for c in dcols}
        kind_bad = [
            c for c in sorted(set(scols) & set(dcols))
            if skinds[c] != dkinds[c]
            and {skinds[c], dkinds[c]} not in ({"i", "u"}, {"O", "b"})
        ]
        if kind_bad:
            failures.append(name)
            print(
                f"FAIL  {name}: dtype-kind mismatch on "
                + ", ".join(f"{c} (spark={skinds[c]} duck={dkinds[c]})" for c in kind_bad)
            )
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, cd)) if a != b)
            print(f"FAIL  {name}: values differ, first at sorted-row {bad}:")
            print(f"      spark: {cs[bad]}")
            print(f"      duck : {cd[bad]}")
            continue
        print(f"OK    {name}: {len(srows)} rows")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
