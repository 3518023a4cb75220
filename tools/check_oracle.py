"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF dir, then compares row count, column names, and an
order-insensitive value multiset.  Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...] [--skip=query ...]

``--skip=`` remains available for ad-hoc splits, but no query needs it any
more: q_fuzzy_part_match's twin grouped distinct names in round 10 (16.5 s
at sf1, was ~45 min naive), so full-catalog sweeps at every SF are one
invocation.  For sf1+ set ORACLE_SHUFFLE_PARTITIONS=32 (see below).
"""

from __future__ import annotations

import os
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


def _round_sig(
    s: pd.Series, digits: int = 12, frame_max: float = 0.0
) -> pd.Series:
    """Round floats to ``digits`` SIGNIFICANT digits — a relative
    tolerance — with the old ABSOLUTE ``round(9)`` kept as a floor for
    near-zero values.  Why both: a 4e11 aggregate's last ulp is ~6e-5, so
    Spark's and DuckDB's different summation orders legitimately disagree
    in the 2nd decimal while agreeing to 13 significant digits (relative
    rule needed, broke at sf10); but a value that is ~0 BY CANCELLATION
    (covariance of near-independent columns, residual sums) comes out as
    3e-13 on one engine and -1e-13 or exact 0.0 on the other — all noise
    around zero that a pure relative rule keeps 12 digits of.  Values
    under 5e-10 therefore snap to 0.0 (exactly what round(9) did), and the
    relative rule governs everything larger.

    MAGNITUDE-CONDITIONED SNAP (VERDICT r11 #4, closing the r10 ADVICE
    masked band): cancellation noise only exists where something LARGE was
    subtracted away — a column whose max finite |v| is itself tiny (a
    query answering in small probabilities) has nothing to cancel, and an
    unconditional snap would mask a genuine engine discrepancy living
    entirely below 5e-10 there.  The snap therefore arms only when the
    column's max finite |v| — or the FRAME's float max, passed by
    ``_normalize`` as ``frame_max`` (ADVICE r12 #2: a column that is
    ENTIRELY cancellation residue, every group's value mathematically ~0
    because its large terms cancelled inside the sum, has a tiny
    column-max, but its float SIBLINGS betray the O(1)+ magnitudes that
    were subtracted away; gating on the same column alone would keep that
    column's sub-5e-10 cross-engine noise and the 12-sig-digit relative
    rule would raise a spurious FAIL) — exceeds 1e-3.  An all-tiny FRAME
    (a query answering entirely in small probabilities, nothing anywhere
    to cancel) keeps exact values, where the relative rule still
    distinguishes 1e-12 from 2e-12.  Direct calls default to column-only
    gating (``frame_max=0.0``).  Pinned by
    tests/test_oracle_subset.py::test_round_sig_snap_is_magnitude_conditioned."""
    import numpy as np

    a = s.astype("float64").to_numpy()
    with np.errstate(all="ignore"):
        finite = np.isfinite(a)
        col_max = float(np.max(np.abs(a[finite]))) if finite.any() else 0.0
        if max(col_max, frame_max) > 1e-3:
            a = np.where(finite & (np.abs(a) < 5e-10), 0.0, a)
        mag = np.floor(np.log10(np.abs(a)))
        scale = np.power(10.0, (digits - 1) - mag)
        ok = np.isfinite(a) & (a != 0.0)
        out = np.where(ok, np.round(a * np.where(ok, scale, 1.0)) / np.where(ok, scale, 1.0), a)
    return pd.Series(out, index=s.index)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # frame-level float max: the snap gate for pure-residual columns whose
    # own max is tiny but whose siblings are O(1)+ (ADVICE r12 #2)
    import numpy as np

    frame_max = 0.0
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            a = df[c].astype("float64").to_numpy()
            finite = np.isfinite(a)
            if finite.any():
                frame_max = max(frame_max, float(np.max(np.abs(a[finite]))))
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = _round_sig(s, frame_max=frame_max)
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


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the driver's table views registered.

    The oracle side gets a MEMORY LIMIT (``ORACLE_DUCKDB_MEM``, default
    24GB) and an explicit spill directory: DuckDB's default budget is 80%
    of RAM, sized for owning the machine — but this gate runs it IN the
    same process/host as a 48 GB Spark driver JVM, and at sf100 one
    unbounded oracle (a pagerank-style iterated join) ballooned to 77 GB
    anon-RSS and drew the kernel OOM killer through the whole sweep
    (round 12).  Capped, DuckDB spills to disk instead of dying."""
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEM', '24GB')}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


#: Spark simple types whose CAST-to-string rendering is byte-identical in
#: DuckDB — the columns a deterministic md5 row-sample may key on.  Floats
#: (engine-specific shortest-roundtrip formatting), timestamps (fractional-
#: second rendering) and nested types are excluded; NULL handling matches
#: because concat_ws SKIPS nulls on both engines.
_SAMPLE_KEY_TYPES = ("int", "bigint", "smallint", "tinyint", "string", "date",
                     "boolean", "decimal")


def _sampled_frames(spark_df, con, sql: str, ocount: int, target: int):
    """Deterministic cross-engine row sample: keep rows whose
    md5(concat_ws(US, non-float cols)) starts with k hex zeros, k sized so
    ~``target`` rows survive.  Both engines hash the IDENTICAL canonical
    string, so the same rows survive on both sides — the full float-aware
    normalize/compare then runs on the sample.  Returns (spark_pd,
    duck_pd, label) or None when no stable key column exists."""
    import math

    from pyspark.sql import functions as F

    keys = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.simpleString().split("(")[0] in _SAMPLE_KEY_TYPES
    ]
    if not keys:
        return None
    k = max(1, math.ceil(math.log(max(ocount, 1) / target, 16)))
    prefix = "0" * k
    s_key = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys])
    )
    spd = spark_df.where(s_key.startswith(prefix)).toPandas()
    d_cols = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in keys)
    opd = con.execute(
        f"SELECT * FROM ({sql}) __t "
        f"WHERE md5(concat_ws(chr(31), {d_cols})) LIKE '{prefix}%'"
    ).fetchdf()
    return spd, opd, f"sampled 1/16^{k} by md5({len(keys)} cols)"


def compare_query(
    spark, con, qmap, omap, name: str, sf_dir: str,
    sample_over: int | None = None, notes: list | None = None,
) -> str | None:
    """Run one catalog query on Spark and its oracle twin on DuckDB; return
    None on match (or a passing rows-only check), else a failure message.
    This is the exact gate logic main() prints — also used by the pytest
    oracle-subset regression net (tests/test_oracle_subset.py).

    ``sample_over`` (VERDICT r10 #5 — the sf100 compare-gate widener): when
    the oracle says the result exceeds that many rows, compare the exact
    row COUNT plus a deterministic md5-keyed row SAMPLE value-exactly,
    instead of collecting tens of millions of rows through the driver
    (q_window_topn at sf100 is 45M rows — the computation was never the
    limit, the toPandas collection was).  The sample is engine-independent
    (both sides hash the same canonical string), so a value divergence is
    caught at the sample rate; rows with no stable (non-float) column fall
    back to the full compare."""
    try:
        q_spark = qmap[name](spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        return f"spark error: {exc}"
    sdf = None
    if name in omap and sample_over is not None:
        try:
            ocount = con.execute(
                f"SELECT COUNT(*) FROM ({omap[name]}) __t"
            ).fetchone()[0]
        except Exception as exc:  # noqa: BLE001
            return f"duckdb error: {exc}"
        if ocount > sample_over:
            scount = q_spark.count()
            if scount != ocount:
                return f"rows spark={scount} oracle={ocount}"
            try:
                sampled = _sampled_frames(
                    q_spark, con, omap[name], ocount, target=100_000
                )
            except Exception as exc:  # noqa: BLE001
                return f"sampling error: {exc}"
            if sampled is not None:
                sdf, odf_s, label = sampled
                if notes is not None:
                    notes.append(f"{label}: {len(sdf)} of {ocount} rows")
                if sorted(sdf.columns) != sorted(odf_s.columns):
                    return (
                        f"cols spark={sorted(sdf.columns)} "
                        f"oracle={sorted(odf_s.columns)}"
                    )
                if len(sdf) != len(odf_s):
                    return (
                        f"sampled rows spark={len(sdf)} oracle={len(odf_s)} "
                        f"({label})"
                    )
                a, b = _normalize(sdf), _normalize(odf_s)
                if not a.equals(b):
                    diff = (a != b) & ~(a.isna() & b.isna())
                    nbad = int(diff.any(axis=1).sum())
                    msg = f"{nbad}/{len(a)} sampled rows differ ({label})"
                    if nbad:
                        bad = diff.any(axis=1)
                        msg += f"; spark={a[bad].head(2).to_dict('records')}"
                        msg += f" oracle={b[bad].head(2).to_dict('records')}"
                    return msg
                return None
            if notes is not None:
                notes.append("no stable sample key; full compare")
    try:
        sdf = q_spark.toPandas()
    except Exception as exc:  # noqa: BLE001
        return f"spark error: {exc}"
    if name not in omap:
        if len(sdf) == 0:
            return "rows-only query returned 0 rows"
        return None
    try:
        odf = con.execute(omap[name]).fetchdf()
    except Exception as exc:  # noqa: BLE001
        return f"duckdb error: {exc}"
    if len(sdf) != len(odf):
        return f"rows spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    a, b = _normalize(sdf), _normalize(odf)
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        nbad = int(diff.any(axis=1).sum())
        msg = f"{nbad}/{len(a)} rows differ"
        if nbad == 0:
            dt = [
                f"dtype {c}: spark={a[c].dtype} oracle={b[c].dtype}"
                for c in a.columns
                if a[c].dtype != b[c].dtype
            ]
            msg += " (" + "; ".join(dt) + ")"
        else:
            bad = diff.any(axis=1)
            msg += f"; spark={a[bad].head(2).to_dict('records')}"
            msg += f" oracle={b[bad].head(2).to_dict('records')}"
        return msg
    return None


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and Path(args[0]).is_dir() else "/root/testdata/sf0.01"
    skips = {a.split("=", 1)[1] for a in args if a.startswith("--skip=")}
    sample_over = None
    for a in args:
        if a.startswith("--sample-over="):
            sample_over = int(a.split("=", 1)[1])
    names = [
        a
        for a in args
        if not Path(a).is_dir() and not a.startswith(("--skip=", "--sample-over="))
    ]

    # 8 shuffle partitions suit the default sf0.01 gate; scale sweeps
    # (sf1 via tools/gen_testdata.py) want the full local[32] width
    spark = get_spark(
        shuffle_partitions=int(os.environ.get("ORACLE_SHUFFLE_PARTITIONS", "8"))
    )
    con = duckdb_connection(sf_dir)
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    selected = [n for n in (names or list(qmap)) if n not in skips]
    if skips:
        print(f"skipping {sorted(skips)} (run separately)")
    failures = []
    for name in selected:
        t0 = time.time()
        notes: list = []
        err = compare_query(
            spark, con, qmap, omap, name, sf_dir,
            sample_over=sample_over, notes=notes,
        )
        took = time.time() - t0
        if err is None:
            kind = "rows-only" if name not in omap else "rows match"
            if notes:
                kind += f" [{'; '.join(notes)}]"
            print(f"ok    {name}: {kind} ({took:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {err}")
    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
