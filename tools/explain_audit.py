"""Plan audit: explain every catalog query (or the bench headline set) and
flag 100 TB red flags:

- a parquet scan with NO pushed filters under a filtering query
- CartesianProduct / BroadcastNestedLoopJoin on non-tiny inputs
- row-at-a-time Python evaluation (BatchEvalPython) — pandas/Arrow is fine
- single-partition global windows / sorts (Window with no partitionBy)

Three plan classes are ENFORCED, not just reported:

1. **Global windows** — a partition-less WindowExec is only acceptable over
   a provably bounded input (a days/months rollup, a post-``limit`` top-k,
   the rank primitive's per-partition offsets table).  Every such case must
   be whitelisted WITH the boundedness reason; an entity- or
   fact-cardinality global window fails the audit (exit 1) — that is the
   single-task sort that kills a query at 100 TB.
2. **Broadcast nested-loop joins** — boundedness is PROVEN structurally
   (round 9): a bottom-up bounded-rows property over node TYPES.  Bounded
   roots are limits, grouping-key-less aggregates (1-row corpus scalars),
   and driver-materialized literal scans; row-preserving operators
   (project/filter/sort/exchange/window) propagate the property; joins and
   unions are bounded only when EVERY input is; ReusedExchange only if the
   exchange it references is itself proven bounded.  A marker string deep
   inside an otherwise scan-sized subtree (the round-8 substring scan's
   blind spot) no longer counts.  Anything unproven fails unless named in
   BNLJ_WHITELIST with the reason its build side is bounded.
3. **Row-at-a-time Python** (BatchEvalPython) — fails unconditionally; the
   engine's Python surface is Arrow-batched (pandas UDFs, Arrow-optimized
   UDTFs), and a silent fallback to pickled rows is a 10-100x throughput
   loss on the hot path.  PYTHON_ROW_WHITELIST names any deliberate
   exception with its reason (currently none).

Usage:  python tools/explain_audit.py [--all] [query ...]
Also run by pytest (tests/test_catalog.py) over the full catalog, including
staleness checks: a whitelist entry whose query no longer trips the flag is
itself a failure (dead entries rot into false confidence).
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


#: query -> WHY its BroadcastNestedLoopJoin build side is bounded despite
#: not matching the automatic proofs (keys=[] aggregate / limit / literal
#: scan).  Same contract as GLOBAL_WINDOW_WHITELIST: entries need a reason
#: naming the bound, and a stale entry (query no longer builds a BNLJ the
#: prover can't clear) fails the pytest staleness check.
BNLJ_WHITELIST: dict[str, str] = {
    "q_cosine_topk": "build = embeddings under the literal pushed predicate vec_id < 10 — <=10 query vectors broadcast; the corpus probe side stays partitioned",
    "q_cosine_topk_arrow": "build = embeddings under the literal pushed predicate vec_id < 10 — <=10 query vectors broadcast; the corpus probe side stays partitioned",
    "q_cross_join": "deliberate cartesian demo over dimension tables — region (5 rows) x nation (25 rows), both fixed-cardinality dims",
    "q_embedding_neardup_pairs": "exact all-pairs ORACLE TWIN bounded to the literal slice vec_id < 4000 (docstring); the full-corpus path is the banded-LSH twin q_lsh_neardup_pairs",
    "q_hybrid_rrf": "build = the single query vector (literal equality vec_id = 0) — exactly <=1 row broadcast",
    "q_nearest_neighbor_dedup": "exact top-1 ground truth bounded to the literal slice vec_id < 200; the full-corpus path is LSH/IVF",
    "q_pareto_frontier": "dominance join over the literal slice p_partkey < 500; the 100 TB path is the rank-bucket pre-filter (docstring)",
}

#: query -> WHY a row-at-a-time Python node (BatchEvalPython) is acceptable.
#: Deliberately empty: every Python boundary in the engine is Arrow-batched.
PYTHON_ROW_WHITELIST: dict[str, str] = {}

#: node classes for the STRUCTURAL bounded-rows proof (round 9 — replaces
#: the substring-marker scan, which a scan-sized build could fool by merely
#: CONTAINING a bounded node somewhere in its subtree, e.g. a full table
#: joined to a 1-row aggregate):
#: limits bound their output regardless of input
_LIMIT_NODES = {"LocalLimit", "GlobalLimit", "TakeOrderedAndProject", "CollectLimit"}
#: driver-materialized literal leaves (createDataFrame data already lives in
#: driver memory, so broadcasting cannot OOM beyond what the driver held)
_BOUNDED_LEAF_PREFIXES = ("LocalTableScan", "Scan ExistingRDD", "EmptyRelation")
#: 1:1-or-fewer operators: output rows <= input rows, so boundedness
#: propagates up from the child
_ROW_PRESERVING_PREFIXES = (
    "Project",
    "Filter",
    "Sort",
    "Exchange",
    "BroadcastExchange",
    "Coalesce",
    "WholeStageCodegen",
    "InputAdapter",
    "ColumnarToRow",
    "Window",
    "Expand",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
)


def _children_bounded(n) -> bool:
    size = n.children().size()
    if size == 0:
        return False
    return all(_node_bounded(n.children().apply(i)) for i in range(size))


def _node_bounded(n) -> bool:
    """Bottom-up bounded-rows property over physical node TYPES: a subtree
    is bounded only when the bounding node sits at its root or provably
    propagates there — never because a marker string appears somewhere
    inside (the round-8 substring scan falsely cleared a scan-sized build
    that merely contained 'keys=[]' deep in a joined branch)."""
    name = n.nodeName()
    if name in _LIMIT_NODES or "Limit" in name:
        return True
    if any(name.startswith(p) for p in _BOUNDED_LEAF_PREFIXES):
        return True
    if "Aggregate" in name:
        # a grouping-key-less aggregate emits 1 row (partial: 1/partition);
        # a keyed aggregate emits <= its input's rows
        try:
            if n.groupingExpressions().isEmpty():
                return True
        except Exception:  # pragma: no cover - non-aggregate lookalike
            pass
        return _children_bounded(n)
    if name == "ReusedExchange":
        # bounded ONLY if the exchange it references is itself proven
        # bounded — pointing at an un-audited broadcast is not a proof
        try:
            return _node_bounded(n.child())
        except Exception:  # pragma: no cover - accessor drift across versions
            return False
    if "Join" in name or name == "CartesianProduct":
        # |out| <= |left| x |right|: bounded x bounded stays bounded;
        # anything x unbounded is not (conservative for semi/anti)
        return _children_bounded(n)
    if name == "Union":
        return _children_bounded(n)
    if any(name.startswith(p) for p in _ROW_PRESERVING_PREFIXES):
        return _children_bounded(n)
    # unknown nodes — file scans, Range, Generate (data-dependent fan-out) —
    # are unbounded by default
    return False


def _physical_root(df):
    """The initial physical plan node (unwrapping AdaptiveSparkPlanExec,
    whose children are hidden until execution)."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName().startswith("AdaptiveSparkPlan"):
        plan = plan.initialPlan()
    return plan


def _iter_nodes(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        for i in range(n.children().size()):
            stack.append(n.children().apply(i))


def unbounded_bnlj_sides(df) -> list[str]:
    """Build-side subtree head lines for every BroadcastNestedLoopJoin whose
    broadcast input the structural prover (:func:`_node_bounded`) cannot
    show is bounded."""
    bad: list[str] = []
    for n in _iter_nodes(_physical_root(df)):
        if n.nodeName() != "BroadcastNestedLoopJoin":
            continue
        build_right = "Right" in n.buildSide().toString()
        build = n.children().apply(1 if build_right else 0)
        if not _node_bounded(build):
            bad.append(build.toString().splitlines()[0].strip())
    return bad


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
        if "broadcast-NL-join" in flags:
            unbounded = unbounded_bnlj_sides(df)
            flags = [f for f in flags if f != "broadcast-NL-join"]
            if not unbounded:
                flags.append("bounded-bnlj[proven: 1-row agg / limit / literal build side]")
            elif name in BNLJ_WHITELIST:
                flags.append(f"bounded-bnlj[whitelisted: {BNLJ_WHITELIST[name]}]")
            else:
                lines.append(
                    f"FAIL  {name}: BroadcastNestedLoopJoin build side not "
                    f"provably bounded ({'; '.join(unbounded)}) — a scan-"
                    f"sized broadcast OOMs at 100x; bound it or whitelist "
                    f"with a reason in BNLJ_WHITELIST"
                )
                failures.append(name)
                continue
        if "row-at-a-time-python" in flags:
            if name in PYTHON_ROW_WHITELIST:
                flags = [f for f in flags if f != "row-at-a-time-python"]
                flags.append(f"python-row[whitelisted: {PYTHON_ROW_WHITELIST[name]}]")
            else:
                lines.append(
                    f"FAIL  {name}: BatchEvalPython (row-at-a-time pickled "
                    f"Python) in the plan — use a pandas UDF / Arrow UDTF, "
                    f"or whitelist with a reason in PYTHON_ROW_WHITELIST"
                )
                failures.append(name)
                continue
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
