"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF dir, then compares row count, column names, and an
order-insensitive value multiset.  Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            # Unify int WIDTHS only (int32 vs int64); deliberately do NOT
            # widen to float — the driver's value hash distinguishes int64
            # from float64, so a DuckDB HUGEINT (sum over integers, surfaced
            # as float64/object by fetchdf) must be caught here, not masked.
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype(str)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str)
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and Path(args[0]).is_dir() else "/root/testdata/sf0.01"
    names = [a for a in args if not Path(a).is_dir()]

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    selected = names or list(qmap)
    failures = []
    for name in selected:
        fn = qmap[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        took = time.time() - t0
        if name not in omap:
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: rows-only query returned 0 rows")
            continue
        try:
            odf = con.execute(omap[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            continue
        a, b = _normalize(sdf), _normalize(odf)
        if not a.equals(b):
            failures.append(name)
            diff = (a != b) & ~(a.isna() & b.isna())
            nbad = int(diff.any(axis=1).sum())
            print(f"FAIL  {name}: {nbad}/{len(a)} rows differ")
            if nbad == 0:
                # equals() failed but no cell differs -> dtype-only mismatch
                for c in a.columns:
                    if a[c].dtype != b[c].dtype:
                        print(f"  dtype {c}: spark={a[c].dtype} oracle={b[c].dtype}")
            bad = diff.any(axis=1)
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  oracle:", b[bad].head(3).to_dict("records"))
        else:
            print(f"ok    {name}: {len(sdf)} rows match ({took:.1f}s)")
    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
