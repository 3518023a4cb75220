"""PLANS.md freshness gate (VERDICT r12 #3).

PLANS.md is the committed human-readable twin of the plan audits: the
numbered EXPLAIN FORMATTED tree plus a counts line (shuffles / broadcasts /
scans / pushed filters / python operators) per headline query.  The plan
AUDITS run in pytest, but nothing asserted that the committed FILE matches
the current plans — a round that touches a headline query could silently
ship a stale PLANS.md.  This test regenerates the counts line per query
with the SAME code gen_plans.py uses, against the SAME sf dir the header
records, and fails on drift with the regeneration command.

Counts-line-only on purpose: the full tree is noisy across AQE/statistics
ids, but a plan-shape change (new shuffle, lost pushdown, a join flipping
broadcast mode, a Python operator appearing) moves at least one count.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import bench  # noqa: E402
import gen_plans  # noqa: E402
from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402


def test_plans_md_counts_match_current_plans(spark):
    plans_md = (REPO / "PLANS.md").read_text()
    m = re.search(r"`tools/gen_plans\.py` at `([^`]+)`", plans_md)
    assert m, "PLANS.md header no longer records its generation sf dir"
    sf_dir = m.group(1)
    if not Path(sf_dir).exists():  # pragma: no cover - env-specific
        pytest.skip(f"PLANS.md generated at {sf_dir}, absent here")
    committed = dict(
        re.findall(r"^## (\S+)\n\n\*\*(.+?)\*\*", plans_md, re.MULTILINE)
    )
    qmap = catalog.query_map()
    names = [n for n in bench.HEADLINE if n in qmap]
    assert sorted(committed) == sorted(names), (
        "PLANS.md query set drifted from bench.HEADLINE — regenerate with "
        "`python tools/gen_plans.py > PLANS.md`"
    )
    drift = []
    for name in names:
        df = qmap[name](spark, sf_dir)
        got = gen_plans.summarize(gen_plans.explain_formatted(df))
        if got != committed[name]:
            drift.append(f"{name}:\n  committed: {committed[name]}\n  current:   {got}")
    assert not drift, (
        "PLANS.md is stale for "
        + ", ".join(d.split(":", 1)[0] for d in drift)
        + " — regenerate with `python tools/gen_plans.py > PLANS.md`\n\n"
        + "\n".join(drift)
    )
