"""Plan audit: explain every catalog query (or the bench headline set) and
flag 100 TB red flags:

- a parquet scan with NO pushed filters under a filtering query
- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- row-at-a-time Python evaluation (BatchEvalPython) — pandas/Arrow is fine
- single-partition global windows / sorts (Window with no partitionBy)

Global windows are ENFORCED, not just reported: a partition-less WindowExec
is only acceptable over a provably bounded input (a days/months rollup, a
post-``limit`` top-k, the rank primitive's per-partition offsets table).
Every such case must be whitelisted below WITH the boundedness reason; an
entity- or fact-cardinality global window fails the audit (exit 1) — that is
the single-task sort that kills a query at 100 TB.  The other flags stay
informational (cross joins and 1-row broadcast folds are deliberate; the
audit keeps them visible rather than silently accepted).

Usage:  python tools/explain_audit.py [--all] [query ...]
Also run by pytest (tests/test_catalog.py) over the full catalog.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402

#: query -> WHY its partition-less window input is bounded.  Adding an entry
#: requires a reason string naming the bounded table; reviewers grep this.
GLOBAL_WINDOW_WHITELIST: dict[str, str] = {
    "q_autocorrelation": "lag windows over the daily-total rollup — |calendar days| rows",
    "q_bm25_scores": "row_number runs after orderBy().limit(20) — 20 rows",
    "q_decile_lift": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
    "q_changepoint": "windows over the daily-total rollup — |calendar days| rows",
    "q_ewma": "frame fold over the daily-total rollup — |calendar days| rows",
    "q_gini_coefficient": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
    "q_hybrid_rrf": "rank fusion over two orderBy().limit(k) lists — <= 2k rows",
    "q_ks_test": "prefix-sum offsets — <= num_partitions rows (ranks primitive over price levels)",
    "q_lorenz_curve": "running share over the 10-row decile table + rank-offsets prefix sum",
    "q_mann_whitney": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
    "q_month_over_month": "lag over the monthly rollup — |months| rows",
    "q_new_customers_running": "running sum over first-seen months — |months| rows",
    "q_peak_concurrency": "prefix-sum offsets — <= num_partitions rows (ranks primitive over the minute rollup)",
    "q_percentile_scalable": "prefix-sum offsets — <= num_partitions rows (ranks primitive over price levels)",
    "q_revenue_pareto": "rank/cumsum after orderBy().limit(100) — 100 rows",
    "q_roc_auc": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
    "q_rfm_segments": "rank-offsets prefix sums — <= num_partitions rows (ranks primitive x3)",
    "q_rolling_corr": "RANGE frame over the daily rollup — |calendar days| rows",
    "q_seasonal_decompose": "centred MA frame over the daily rollup — |calendar days| rows",
    "q_survival_km": "at-risk/survival windows over lifetime-month buckets — tens of rows",
    "q_term_pmi": "row_number runs after orderBy().limit(20) — 20 rows",
    "q_zipf_fit": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
    "q_window_dist_functions": "rank-offsets prefix sum — <= num_partitions rows (ranks primitive)",
}


def audit_plan(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("broadcast-NL-join")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python")
    if "Window" in plan:
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition(" in line:
                # partitionBy-less window: windowspecdefinition(ORDER-only...)
                spec = line.split("windowspecdefinition(")[1]
                head = spec.split(",")[0].strip()
                if head.endswith("ASC NULLS FIRST") or head.endswith("DESC NULLS LAST"):
                    flags.append("global-window")
                    break
    return flags


def audit_queries(
    spark, sf_dir: str, names: list[str]
) -> tuple[list[str], list[str]]:
    """Returns (failures, report_lines).  A failure is an errored build or an
    unwhitelisted global window."""
    qmap = catalog.query_map()
    failures: list[str] = []
    lines: list[str] = []
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover
            lines.append(f"ERR   {name}: {exc}")
            failures.append(name)
            continue
        flags = audit_plan(plan)
        if "global-window" in flags:
            reason = GLOBAL_WINDOW_WHITELIST.get(name)
            if reason is None:
                lines.append(
                    f"FAIL  {name}: partition-less WindowExec over input not "
                    f"declared bounded — whitelist it with a boundedness "
                    f"reason in tools/explain_audit.py or repartition the "
                    f"window (see operators/ranks.py)"
                )
                failures.append(name)
                continue
            flags = [f for f in flags if f != "global-window"]
            flags.append(f"bounded-global-window[{reason}]")
        if flags:
            lines.append(f"note  {name}: {', '.join(flags)}")
        else:
            lines.append(f"ok    {name}")
    # stale whitelist entries rot into false confidence: flag them too
    for name in GLOBAL_WINDOW_WHITELIST:
        if name in names and name not in qmap:  # pragma: no cover
            lines.append(f"FAIL  whitelist names unknown query {name}")
            failures.append(name)
    return failures, lines


def main() -> int:
    import bench

    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain-audit", shuffle_partitions=8)
    qmap = catalog.query_map()
    if "--all" in args:
        names = sorted(qmap)
    else:
        names = [a for a in args if a in qmap] or bench.HEADLINE

    failures, lines = audit_queries(spark, sf_dir, names)
    print("\n".join(lines))
    if failures:
        print(f"\nAUDIT FAILED: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
