#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def canon_cell(v):
    # Driver-faithful: floats are NEVER collapsed to ints.  The driver hashes
    # Spark's BIGINT and DuckDB's HUGEINT/DOUBLE differently; collapsing here
    # masked exactly that failure class in rounds 1 and 2 (funnel_stages,
    # sequence_packing).  A float and an int with the same value must
    # canonicalize differently, as they do at the driver.
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns whose cells would crash the driver's pandas sort_values
    canonicalizer (lists / ndarrays are unhashable)."""
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            for v in col.head(50):
                if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                    bad.append(c)
                    break
    return bad


def hugeint_cols(rel) -> list[str]:
    """DuckDB result columns typed HUGEINT — the driver normalizes these
    differently from Spark's BIGINT, so oracles must CAST them."""
    return [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from rss_feed_etl_spark.session import get_spark

    spark = get_spark(app_name="check-parity", cpus=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        bad = unhashable_cols(spdf)
        if bad:
            print(f"FAIL {name}: array/list columns break the driver canonicalizer: {bad}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            huge = hugeint_cols(rel)
            odf = rel.fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if huge:
            print(f"FAIL {name}: oracle returns HUGEINT columns {huge} — add CAST(... AS BIGINT)")
            failures.append(name)
            continue
        s_cols, o_cols = sorted(spdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns differ\n  spark: {s_cols}\n  duck:  {o_cols}")
            failures.append(name)
            continue
        if len(spdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(spdf)} duck={len(odf)}")
            failures.append(name)
            continue
        s_rows, o_rows = canon_frame(spdf), canon_frame(odf)
        if s_rows != o_rows:
            ndiff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
            print(f"FAIL {name}: values differ in {ndiff}/{len(s_rows)} rows")
            for a, b in zip(s_rows, o_rows):
                if a != b:
                    print(f"  spark: {a}\n  duck:  {b}")
                    break
            failures.append(name)
            continue
        print(f"OK   {name}: {len(spdf)} rows")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
