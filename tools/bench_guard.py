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
8.02 s) — this is a shared host.  Round 8 additionally observed 2-of-3 reps
spiking on the SAME query (the median itself contaminated: q_cosine_topk
1.22 s in one run, q_text_stats 1.07 s in the next, each >2x its pin while
every other query passed), so the guard now compares best-of-reps MINIMUMS:
host noise only adds time to a rep, the minimum is the least-contaminated
measurement of the plan, and any real regression — an extra shuffle, a lost
broadcast, a UDF fallback — raises the minimum too.  A query fails when its
fresh min exceeds ``max(RATIO x pinned, pinned + ABS_SLACK)``:

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
host after an intentional perf trade, and say why in the commit.  The pin
is a RATCHET in the other direction: any per-query or total value a fresh
passing run beats by >10% is tightened automatically (``maybe_ratchet``),
so a one-time slow-host re-pin cannot permanently widen the envelope — the
next fast run narrows it back.
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
#: host-speed normalization cap: the fresh/pinned calibration ratio scales
#: every limit, but never below 1.0 (a faster host must still meet the pin)
#: and never above this cap (an implausibly slow probe should fail loudly,
#: not stretch the envelope without bound)
MAX_HOST_FACTOR = 2.5
#: ratchet threshold: a fresh passing value below this fraction of its pin
#: tightens the pin (one-way — the envelope can only shrink automatically;
#: loosening stays a deliberate --repin)
RATCHET_FACTOR = 0.9

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
    # Host-speed normalization (round 8): the round-8 host ran IDENTICAL
    # code 1.5-1.7x slower than the round-7 pin host (every query uniformly,
    # CPU probe confirming; warm per-query medians still reached the pins).
    # A fixed CPU-bound calibration job (bench.host_calibration) rides in
    # every bench result; its fresh/pinned ratio scales the limits so the
    # guard keeps its discrimination: a slow HOST slows the probe and every
    # query together (factor rises, envelope follows), while a regressed
    # PLAN slows one query against an unmoved probe (still fails).
    host_factor = 1.0
    if pinned.get("calib_sec") and result.get("calib_sec"):
        raw = result["calib_sec"] / pinned["calib_sec"]
        host_factor = min(max(raw, 1.0), MAX_HOST_FACTOR)
        lines.append(
            f"host  calibration {result['calib_sec']:.3f}s vs pinned "
            f"{pinned['calib_sec']:.3f}s -> factor {host_factor:.2f}"
            + (f" (raw {raw:.2f} capped)" if raw > MAX_HOST_FACTOR else "")
        )
    # Compare best-of-reps MINIMUMS when both sides carry them (round 8):
    # shared-host noise only ADDS time to a rep — two of three reps spiking
    # poisons a median (observed: the same code tripped q_cosine_topk in one
    # run and q_text_stats in the next, each >2x its pin, while every other
    # query passed) — but the best rep is the least-contaminated measurement
    # of the plan itself, and any real regression raises the minimum too.
    stat = "min" if ("queries_min" in result and "queries_min" in pinned) else "median"
    fresh = result[f"queries_{stat}"]
    for name, base in sorted(pinned[f"queries_{stat}"].items()):
        got = fresh.get(name)
        if got is None:
            failures.append(name)
            lines.append(f"FAIL  {name}: pinned but absent from the bench run")
            continue
        limit = max(RATIO * base, base + ABS_SLACK) * host_factor
        if got > limit and name not in ALLOWED_REGRESSIONS:
            failures.append(name)
            lines.append(
                f"FAIL  {name}: {stat} {got:.3f}s > limit {limit:.3f}s "
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
    # keep BOTH sides of the total check on the SAME statistic: min is
    # systematically below median, so comparing a fresh min against a pinned
    # median would quietly loosen the systemic-slowdown guard — if either
    # side lacks the min total, fall back to median-vs-median
    stat_t = (
        stat if (f"total_{stat}" in pinned and f"value_{stat}" in result) else "median"
    )
    total = result[f"value_{stat_t}"]
    pinned_total = pinned[f"total_{stat_t}"]
    tlimit = TOTAL_RATIO * pinned_total * host_factor
    if total > tlimit:
        failures.append("__total__")
        lines.append(
            f"FAIL  total {stat_t} {total:.3f}s > {tlimit:.3f}s "
            f"(= {TOTAL_RATIO}x pinned {pinned_total:.3f}s) — "
            f"systemic slowdown: check session confs / codegen before "
            f"blaming the host"
        )
    else:
        lines.append(
            f"ok    total {stat_t} {total:.3f}s (pin {pinned_total:.3f}s)"
        )
    return failures, lines


def maybe_ratchet(result: dict, pinned: dict) -> list[str]:
    """One-way tightening (round 9; host-normalized + persistence round 10):
    a pinned per-query or total min/median tightens when a fresh PASSING
    run beats it by >10% in PIN-HOST units, and only after the improvement
    PERSISTS across two runs.  The round-8 re-pin baked in a slow host and
    the host factor clamps at >=1.0, so without the ratchet the envelope
    could only ever loosen — a ~20% real regression fit inside the pin.

    Two round-9 flaws fixed here (ADVICE r9):

    - **Host normalization.**  Raw tightening let a fast host write its raw
      values under the (slow) pinned calibration, and repeated ratcheting
      converged the pin to the all-time luckiest host×rep.  Candidates are
      now converted to pin-host units (``got * pinned_calib /
      result_calib``, factor clamped to [1/MAX_HOST_FACTOR,
      MAX_HOST_FACTOR]) and the STORED value keeps those units, so
      ``calib_sec`` never mixes provenance — it only changes on a
      deliberate ``--repin``.  Runs missing a calibration on either side
      don't ratchet at all.
    - **Noise floor.**  Same-code per-query values span a 1.0-2.0x band on
      this shared host, so a single lucky rep must not become the pin: a
      candidate is parked in ``pending_ratchet`` and only lands when a
      SECOND passing run independently beats the 10% bar — at the LARGER
      (more conservative) of the two sightings.  A run that doesn't
      confirm a pending candidate clears it.

    Returns a list describing tightened and newly-pending entries (empty =
    pin file untouched); the caller persists on any non-empty return.

    Queries the guard RE-MEASURED this run (``result["retried"]``) never
    ratchet: their mins are best-of-8-reps — extra chances to park
    artificially low pins — and the totals folding them in are likewise
    excluded (ADVICE r13 #2)."""
    changed: list[str] = []
    if float(result.get("sf", -1)) != float(pinned.get("sf", -2)):
        return changed
    retried = set(result.get("retried", ()))
    if not (pinned.get("calib_sec") and result.get("calib_sec")):
        return changed  # can't normalize -> don't ratchet on raw values
    factor = pinned["calib_sec"] / result["calib_sec"]
    if not (1.0 / MAX_HOST_FACTOR <= factor <= MAX_HOST_FACTOR):
        # a host faster/slower than the calibration can normalize is
        # UN-normalizable, not clampable: clamping a 3x-faster host to 2.5x
        # would confirm pins ~0.83x of what the pin host can reach, then
        # fail spuriously back on the pin host (noise band 1.0-2.0x vs the
        # 2.0x gate).  Same refusal as the missing-calibration case.
        return changed
    pending: dict[str, float] = pinned.setdefault("pending_ratchet", {})

    def consider(key: str, base: float, raw: float | None) -> float | None:
        """Returns the new pin value if ``key`` tightens this run."""
        if raw is None:
            return None
        norm = raw * factor
        if norm >= RATCHET_FACTOR * base:
            if pending.pop(key, None) is not None:
                changed.append(f"pending-clear {key} (not reproduced)")
            return None
        prev = pending.pop(key, None)
        if prev is None:
            pending[key] = norm
            changed.append(f"pending {key} {base:.3f} -> {norm:.3f} (needs 2nd run)")
            return None
        new = max(norm, prev)  # conservative of the two sightings
        changed.append(f"{key} {base:.3f} -> {new:.3f} (confirmed twice)")
        return new

    for stat in ("median", "min"):
        qkey = f"queries_{stat}"
        if qkey in result and qkey in pinned:
            for name, base in pinned[qkey].items():
                if name in retried:
                    continue
                new = consider(f"{name}[{stat}]", base, result[qkey].get(name))
                if new is not None:
                    pinned[qkey][name] = new
        tkey, vkey = f"total_{stat}", f"value_{stat}"
        if tkey in pinned and vkey in result and not retried:
            new = consider(f"total[{stat}]", pinned[tkey], result[vkey])
            if new is not None:
                pinned[tkey] = new
    if not pending:
        pinned.pop("pending_ratchet", None)
    return changed


def build_artifact(result: dict, pinned: dict, failures: list[str],
                   lines: list[str]) -> dict:
    """One self-adjudicating bench artifact (VERDICT r11 #3): the committed
    BENCH JSON alone must answer "regression or host?" — three rounds
    running, the raw medians needed a companion quiet-host run to
    interpret.  The artifact is the raw ``run_headline`` result (driver-
    compatible keys preserved) plus a ``guard`` block carrying the
    calibration pair, the host factor the envelope used, every per-query
    min normalized to PIN-HOST units as a ratio vs its pin, the normalized
    totals, and the guard's pass/fail verdict with the full report."""
    calib, pcalib = result.get("calib_sec"), pinned.get("calib_sec")
    # pin-host units: multiply fresh values by pinned_calib/fresh_calib
    # (same conversion maybe_ratchet uses), unclamped here — the artifact
    # REPORTS, the envelope already applied its own clamped factor
    norm = (pcalib / calib) if (calib and pcalib) else None
    # ADVICE r12 #4: an sf mismatch makes check_result short-circuit with
    # failures=[] — NO comparison ran, so pass=true would assert an
    # adjudication that never happened.  Record the skip explicitly:
    # pass=None + status, and the normalized-ratio block stays absent.
    compared = float(result.get("sf", -1)) == float(pinned.get("sf", -2))
    guard: dict = {
        "pass": (not failures) if compared else None,
        "status": (
            ("pass" if not failures else "fail")
            if compared
            else f"skipped: sf mismatch (run sf={result.get('sf')}, "
                 f"pin sf={pinned.get('sf')}) — no comparison ran"
        ),
        "failures": failures,
        "calib_sec": calib,
        "pinned_calib_sec": pcalib,
        "normalization_factor_pin_host_units": round(norm, 4) if norm else None,
        "report": lines,
        "pinned_at": pinned.get("pinned_at"),
    }
    if norm and compared:
        stat = "min" if ("queries_min" in result and "queries_min" in pinned) else "median"
        ratios = {}
        for name, base in sorted(pinned.get(f"queries_{stat}", {}).items()):
            got = result.get(f"queries_{stat}", {}).get(name)
            if got is not None and base:
                ratios[name] = round(got * norm / base, 3)
        guard["stat"] = stat
        guard["normalized_ratio_vs_pin"] = ratios
        for s in ("min", "median"):
            if f"value_{s}" in result and f"total_{s}" in pinned and pinned[f"total_{s}"]:
                guard[f"normalized_total_{s}_vs_pin"] = round(
                    result[f"value_{s}"] * norm / pinned[f"total_{s}"], 3
                )
    return {**result, "guard": guard}


def retryable_failures(failures: list[str], result: dict) -> list[str]:
    """The subset of guard failures the retry pass can actually re-measure:
    real headline queries present in this run.  ``__total__`` (systemic
    slowdown with every per-query min passing) and pinned-but-absent names
    are not re-runnable — passing them to run_headline would select zero
    queries and crash before the report printed (ADVICE r13 #1)."""
    return [n for n in failures if n in result.get("queries_min", {})]


def main() -> int:
    import os

    from bench import run_headline
    from databricks_feature_store_flight_school_spark.session import get_spark

    emit = None
    for a in sys.argv[1:]:
        if a.startswith("--emit="):
            emit = Path(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-guard")
    # warmup=True: the first queries of a fresh JVM pay codegen/JIT warm-up
    # that a 3-rep median cannot flush (the first query measured 2.3x its
    # steady state from warm-up alone); the pin describes steady-state
    # capability, so the guard measures steady state.  The CLI keeps cold
    # 3-rep runs for cross-round continuity.
    result = run_headline(spark, sf_dir, reps=5, warmup=True)
    if "--repin" in sys.argv:
        pinned = json.loads(PINNED_FILE.read_text())
        pinned["queries_median"] = result["queries_median"]
        pinned["queries_min"] = result["queries_min"]
        pinned["total_median"] = result["value_median"]
        pinned["total_min"] = result["value_min"]
        pinned["sf"] = result["sf"]
        pinned["calib_sec"] = result["calib_sec"]
        pinned.pop("pending_ratchet", None)  # fresh provenance, fresh slate
        PINNED_FILE.write_text(json.dumps(pinned, indent=2) + "\n")
        print(f"re-pinned {PINNED_FILE} at total median {result['value_median']}s")
        return 0
    failures, lines = check_result(result)
    if failures:
        # Retry-on-failure (r13): a sustained host-contention spike that
        # lands on ONE query's reps contaminates even its min, while the
        # calibration probe (measured after the loop) can miss the spike
        # entirely — observed three times in one session, each time a
        # DIFFERENT untouched query (q_cosine_topk 17x, q_tumbling_window
        # 10x, q_horizontal_countif 7x; all back at pin minutes later).
        # Re-measure JUST the failing queries once and keep the better min:
        # a real plan regression (extra shuffle, lost broadcast, UDF
        # fallback) reproduces on the retry; a spike does not.  The
        # comparison itself is unchanged — this retries the MEASUREMENT,
        # against the same pins, same limits, same calibration.
        # Only real, runnable query names can be re-measured: `__total__`
        # (systemic-slowdown failure) and pinned-but-absent names would
        # leave run_headline with an empty selection and crash before the
        # report printed (ADVICE r13 #1).
        retry_names = retryable_failures(failures, result)
        n_initial = len(failures)
        if retry_names:
            retry = run_headline(
                spark, sf_dir, reps=3, names=retry_names, calibrate=False
            )
            for stat in ("queries_min", "queries_median"):
                for name, got in retry[stat].items():
                    if got < result[stat].get(name, float("inf")):
                        result[stat][name] = got
            result["value_min"] = round(sum(result["queries_min"].values()), 3)
            result["value_median"] = round(
                sum(result["queries_median"].values()), 3
            )
            # provenance: these names' mins are best-of-8-reps, not the
            # 5-rep run the rest of the artifact describes (ADVICE r13 #2)
            result["retried"] = retry_names
            failures, lines = check_result(result)
            lines.insert(
                0,
                f"retry: re-measured {len(retry_names)} of {n_initial} "
                f"initial failure entries (ADVICE r13: __total__ / absent "
                f"names are not re-runnable)",
            )
    print("\n".join(lines))
    if emit is not None:
        artifact = build_artifact(result, json.loads(PINNED_FILE.read_text()),
                                  failures, lines)
        emit.write_text(json.dumps(artifact, indent=2) + "\n")
        print(f"emitted self-adjudicating artifact -> {emit}")
    if not failures:
        pinned = json.loads(PINNED_FILE.read_text())
        tightened = maybe_ratchet(result, pinned)
        if tightened:
            PINNED_FILE.write_text(json.dumps(pinned, indent=2) + "\n")
            print("ratchet: tightened " + "; ".join(tightened))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
