"""Eager-build audit: constructing a catalog query must not launch Spark
jobs — plan construction is declarative, execution happens at the caller's
action.  The round-5 verdict caught ``q_hybrid_rrf`` running a full corpus
``.count()`` at build time; this audit makes that CLASS of regression
impossible to land silently, the same way ``explain_audit.py`` enforces the
no-unbounded-global-window rule.

Every query is built under its own job group and the group's job list must
be empty, UNLESS the query is whitelisted below WITH the reason its
build-time work is bounded/inherent.  Three legitimate categories exist:

- **pipeline-breaker checkpoints** (``operators/ranks.py``): the pinned
  ``localCheckpoint(eager=False)`` calls ``queryExecution.toRdd`` and under
  AQE that materialises the checkpoint's *upstream* stages at build.  That
  is the cost of guaranteeing ONE range-boundary sampling for both rank
  branches (module docstring) — the work is the query's own first stages,
  run once and reused, not extra work.
- **model fits**: k-means / PCA / IVF-quantizer training is a bounded
  driver-side fit (k×dim centroids, d×d covariance, 4096-row sample) — the
  same build/execute boundary sklearn draws at ``fit()``.
- **feature-store flows**: the q_fs_* queries demonstrate the writer →
  registry → reader round trip, so their build phase IS a bounded sequence
  of snapshot writes at the demo scale.

Stale whitelist entries fail too: an entry whose query no longer launches
build jobs is rot (the fix landed; drop the entry).

Usage:  python tools/eager_audit.py [sf_dir]
Also run by pytest (tests/test_catalog.py) over the full catalog.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import TABLES, load_table  # noqa: E402

_RANKS = (
    "pipeline-breaker checkpoint (operators/ranks.py): AQE materialises the "
    "pinned range partitioning's upstream stages at toRdd — one boundary "
    "sampling shared by both rank branches, reused at execution"
)
_FIT = "bounded model fit at build: "
_FS = (
    "feature-store write->read round trip: build publishes the demo-scale "
    "snapshots the read half consumes"
)

#: query -> WHY its build-time jobs are bounded/inherent.  Adding an entry
#: requires a reason string naming the mechanism; reviewers grep this.
EAGER_BUILD_WHITELIST: dict[str, str] = {
    # ranks/prefix-sum primitive consumers (operators/ranks.py)
    "q_decile_lift": _RANKS,
    "q_gini_coefficient": _RANKS,
    "q_ks_test": _RANKS,
    "q_lorenz_curve": _RANKS,
    "q_mann_whitney": _RANKS,
    "q_peak_concurrency": _RANKS,
    "q_percentile_scalable": _RANKS,
    "q_roc_auc": _RANKS,
    "q_rfm_segments": _RANKS,
    "q_window_dist_functions": _RANKS,
    "q_zipf_fit": _RANKS,
    # same lazy-checkpoint pinning, on the mixture counts frame
    "q_source_mixture": (
        "pinned counts-frame checkpoint (one corpus scan shared by every "
        "mixture derivation) — same toRdd materialisation as the ranks "
        "primitive"
    ),
    # model fits — bounded driver state, the sklearn fit() boundary
    "q_kmeans_assign": _FIT + "k-means centroids (k x dim floats)",
    "q_kmeans_clusters": _FIT + "k-means centroids (k x dim floats)",
    "q_semantic_dedup": _FIT + "k-means centroids for cluster bucketing",
    "q_embedding_pca": _FIT + "single-scan covariance + d x d eigh",
    "q_ivf_topk": _FIT + "IVF quantizer on a bounded 4096-row sample",
    # feature-store flows — the build half IS the writer demo
    "q_fs_change_feed": _FS,
    "q_fs_incremental_agg": _FS,
    "q_fs_ivm_join_view": _FS,
    "q_fs_materialized_view": _FS,
    "q_fs_merge_schema_evolution": _FS,
    "q_fs_pit_lookup": _FS,
    "q_fs_score_batch": _FS,
    "q_fs_score_batch_trained": _FS,
    "q_fs_training_set": _FS,
    # edge-table pin: <= |nations|² rows feeding four consumers — without
    # it each consumer replays the fact-table join (same toRdd
    # materialisation as the ranks primitive)
    "q_triangle_count": (
        "pinned edge table (<= |nations|² rows, four consumers) — AQE "
        "materialises the fact pass at plan-build; unpinned, the fact "
        "join would replay once per consumer"
    ),
    # graph-sized driver math (r13): ONE distributed fact pass collapses to
    # a ≤ |nations|² transition matrix; the 10 power iterations are a
    # 25-vector numpy recurrence — same fit boundary as k-means/PCA
    "q_nation_pagerank": _FIT + "nations² transition matrix + power iteration",
    # shingle-table pin (r13): shingle_pairs_jaccard lazily checkpoints the
    # distinct shingle table its frequency/guard/sizes/self-join consumers
    # share — AQE materialises those upstream stages at toRdd, the same
    # one-materialisation-reused-at-execution shape as the ranks primitive
    "q_ngram_jaccard_neardup": (
        "pinned shingle table (shingle_pairs_jaccard) — one scan+distinct "
        "shared by 4+ consumers; AQE materialises it at plan-build"
    ),
    "q_minhash_lsh_neardup": (
        "pinned distinct-shingle table (distinct_shingles, r14) shared by "
        "the MinHash arm AND the exact-verify arm — same materialisation "
        "as q_ngram_jaccard_neardup, now built once for both"
    ),
    # iterative algorithm: per-superstep scalar convergence check
    "q_dedup_components": (
        "connected-components supersteps — one scalar aggregate per "
        "superstep (operators/components.py, documented driver boundary)"
    ),
    # distinct-name pin (r14, same shape as the shingle pin): the
    # (p_type, p_name) aggregate feeds d0, the PassJoin's five base
    # consumers and two count re-attach joins — one |distinct names|-sized
    # materialisation (38k rows at sf10) shared by all, AQE materialises
    # it at toRdd; measured 1.83 -> 1.57 s at sf0.1
    "q_fuzzy_part_match": (
        "pinned distinct-name table — one scan+aggregate shared by 8 "
        "consumers; |distinct names|-bounded, AQE materialises at "
        "plan-build"
    ),
}


def audit_queries(
    spark, sf_dir: str, names: list[str]
) -> tuple[list[str], list[str]]:
    """Returns (failures, report_lines).  A failure is an errored build, an
    unwhitelisted eager build, or a stale whitelist entry."""
    qmap = catalog.query_map()
    sc = spark.sparkContext
    # warm: the FIRST load of each table runs a one-off footer-inference job
    # (cached afterwards, sources/tables.py) — scan setup, not query work
    for t in TABLES:
        load_table(spark, sf_dir, t)
    errors: dict[str, str] = {}
    for name in names:
        sc.setJobGroup(f"eager_audit_{name}", name)
        try:
            qmap[name](spark, sf_dir)
        except Exception as exc:  # pragma: no cover
            errors[name] = str(exc)
        finally:
            sc.setJobGroup(None, None)
    # broadcast-exchange futures register on a separate thread (inheriting
    # the submitting thread's job group); poll until the per-group job
    # counts have been quiescent for a short window (a fixed sleep misses
    # late registrants on a loaded machine) with a generous deadline
    tracker = sc.statusTracker()

    def _group_counts() -> dict[str, int]:
        return {
            n: len(tracker.getJobIdsForGroup(f"eager_audit_{n}")) for n in names
        }

    deadline = time.monotonic() + 30.0
    prev = _group_counts()
    stable_since = time.monotonic()
    while time.monotonic() < deadline:
        time.sleep(0.25)
        cur = _group_counts()
        if cur != prev:
            prev = cur
            stable_since = time.monotonic()
        elif time.monotonic() - stable_since >= 2.0:
            break
    failures: list[str] = []
    lines: list[str] = []
    for name in names:
        if name in errors:  # pragma: no cover
            lines.append(f"ERR   {name}: {errors[name]}")
            failures.append(name)
            continue
        jobs = tracker.getJobIdsForGroup(f"eager_audit_{name}")
        reason = EAGER_BUILD_WHITELIST.get(name)
        if jobs and reason is None:
            lines.append(
                f"FAIL  {name}: launched {len(jobs)} Spark job(s) at plan-"
                f"build time — fold the scalar into the plan as a 1-row "
                f"broadcast (q_term_pmi pattern) or whitelist it with a "
                f"boundedness reason in tools/eager_audit.py"
            )
            failures.append(name)
        elif jobs:
            lines.append(f"note  {name}: eager-build-ok[{reason}]")
        elif reason is not None:
            lines.append(
                f"FAIL  {name}: whitelisted but launched no build jobs — "
                f"stale entry, drop it"
            )
            failures.append(name)
        else:
            lines.append(f"ok    {name}")
    return failures, lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="eager-audit", shuffle_partitions=8)
    names = sorted(catalog.query_map())
    failures, lines = audit_queries(spark, sf_dir, names)
    print("\n".join(lines))
    if failures:
        print(f"\nAUDIT FAILED: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
