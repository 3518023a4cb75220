"""Bench-regression guard: fresh headline medians vs the pinned baseline.

Round 6 regressed the sf0.1 headline 30% first-run / 20% median with 15 of
17 plans unchanged — host-load drift that nothing would have distinguished
from a real regression.  This guard makes per-query performance a tested
invariant, the same enforcement pattern as tools/eager_audit.py: a pinned
baseline file (BENCH_PINNED.json), a named-exception dict for deliberate
trades, and a pytest entry point that fails on unexplained slowdowns.

Threshold calibration (measured, not guessed): three same-code bench
invocations in round 7 put identical per-query medians anywhere in a
1.0-2.0x band (q_large_volume_orders 0.410 vs 0.820 s, totals 7.65 / 9.94 /
8.02 s) — this is a shared host.  So the pin is the BEST observed median
(capability, not average) and a query only fails when its fresh median
exceeds ``max(RATIO x pinned, pinned + ABS_SLACK)``:

- RATIO = 2.0 sits above the whole observed same-code noise band relative
  to the best run, yet any real extra shuffle, lost broadcast, or UDF
  fallback on these 0.2-1 s queries costs well over 2x;
- ABS_SLACK = 0.5 s keeps sub-0.3 s queries (scan-floor bound) from
  tripping on scheduler jitter alone.

The aggregate check is tighter (TOTAL_RATIO = 1.6x the pinned total
median): independent noise partially cancels across 17 queries — the worst
observed same-code total was 1.42x the pin — while a systemic regression
(conf change, session default, codegen loss) moves every query at once.

Re-pin deliberately: run ``python tools/bench_guard.py --repin`` on a quiet
host after an intentional perf trade, and say why in the commit.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PINNED_FILE = REPO / "BENCH_PINNED.json"
RATIO = 2.0
ABS_SLACK = 0.5
TOTAL_RATIO = 1.6

#: deliberate per-query regressions: name -> reason (mirrors
#: eager_audit.EAGER_BUILD_WHITELIST — an entry here must explain the
#: at-scale trade that justifies the local slowdown)
ALLOWED_REGRESSIONS: dict[str, str] = {}


def check_result(result: dict, pinned: dict | None = None) -> tuple[list[str], list[str]]:
    """Compare a bench result dict (bench.run_headline shape) against the
    pinned baseline.  Returns (failures, report_lines)."""
    if pinned is None:
        pinned = json.loads(PINNED_FILE.read_text())
    failures: list[str] = []
    lines: list[str] = []
    if float(result.get("sf", -1)) != float(pinned["sf"]):
        lines.append(
            f"skip: bench ran at sf={result.get('sf')} but pin is "
            f"sf={pinned['sf']} — no comparison"
        )
        return failures, lines
    fresh = result["queries_median"]
    for name, base in sorted(pinned["queries_median"].items()):
        got = fresh.get(name)
        if got is None:
            failures.append(name)
            lines.append(f"FAIL  {name}: pinned but absent from the bench run")
            continue
        limit = max(RATIO * base, base + ABS_SLACK)
        if got > limit and name not in ALLOWED_REGRESSIONS:
            failures.append(name)
            lines.append(
                f"FAIL  {name}: median {got:.3f}s > limit {limit:.3f}s "
                f"(pinned {base:.3f}s) — a real plan regression costs >2x; "
                f"fix it, or record the deliberate trade in "
                f"ALLOWED_REGRESSIONS / re-pin with --repin"
            )
        elif name in ALLOWED_REGRESSIONS:
            lines.append(
                f"note  {name}: {got:.3f}s vs pin {base:.3f}s "
                f"(allowed[{ALLOWED_REGRESSIONS[name]}])"
            )
        else:
            lines.append(f"ok    {name}: {got:.3f}s (pin {base:.3f}s)")
    total = result["value_median"]
    tlimit = TOTAL_RATIO * pinned["total_median"]
    if total > tlimit:
        failures.append("__total__")
        lines.append(
            f"FAIL  total median {total:.3f}s > {tlimit:.3f}s "
            f"(= {TOTAL_RATIO}x pinned {pinned['total_median']:.3f}s) — "
            f"systemic slowdown: check session confs / codegen before "
            f"blaming the host"
        )
    else:
        lines.append(
            f"ok    total median {total:.3f}s (pin {pinned['total_median']:.3f}s)"
        )
    return failures, lines


def main() -> int:
    import os

    from bench import run_headline
    from databricks_feature_store_flight_school_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-guard")
    result = run_headline(spark, sf_dir)
    if "--repin" in sys.argv:
        pinned = json.loads(PINNED_FILE.read_text())
        pinned["queries_median"] = result["queries_median"]
        pinned["total_median"] = result["value_median"]
        pinned["sf"] = result["sf"]
        PINNED_FILE.write_text(json.dumps(pinned, indent=2) + "\n")
        print(f"re-pinned {PINNED_FILE} at total median {result['value_median']}s")
        return 0
    failures, lines = check_result(result)
    print("\n".join(lines))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
