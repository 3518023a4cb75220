"""Oracle-replica regression net for driver-unsampled queries.

The driver's correctness gate checks the same fixed ~50 catalog queries each
round; everything else is only protected by the manual
``tools/check_oracle.py`` run.  This module runs the SAME compare (Spark vs
DuckDB value hash) inside pytest over a deterministic subset of the
unsampled queries — small enough to stay in the default run (~2 min at
sf0.001), broad enough that a regression in the long tail cannot hide
between judge rounds.

Subset = every 4th unsampled query (sorted) + every query touched in the
current round.  Full-catalog coverage remains ``python tools/check_oracle.py``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
import check_oracle  # noqa: E402

#: queries added/rewritten in the current round — always checked
CURRENT_ROUND = [
    "q_activity_bitmap",
    "q_argmax_aggregates",
    "q_autocorrelation",
    "q_bigram_lm_score",
    "q_bootstrap_ci",
    "q_dsir_selection",
    "q_grouped_percentile_scalable",
    "q_weighted_sample_per_source",
    "q_exists_subquery",
    "q_fs_change_feed",
    "q_fs_incremental_agg",
    "q_fs_ivm_join_view",
    "q_fs_materialized_view",
    "q_lateral_topk",
    "q_dau_mau",
    "q_decile_lift",
    "q_dow_seasonality",
    "q_embedding_covariance",
    "q_gini_coefficient",
    "q_growth_accounting",
    "q_key_skew_profile",
    "q_ks_test",
    "q_linear_interpolation",
    "q_lorenz_curve",
    "q_mann_whitney",
    "q_market_basket",
    "q_media_resize",
    "q_nation_pagerank",
    "q_null_profile",
    "q_peak_concurrency",
    "q_pricing_summary",
    "q_percentile_scalable",
    "q_referential_integrity",
    "q_revenue_pareto",
    "q_rfm_segments",
    "q_roc_auc",
    "q_seasonal_decompose",
    "q_source_mixture",
    "q_text_readability",
    "q_term_pmi",
    "q_triangle_count",
    "q_weighted_median",
    "q_window_dist_functions",
    "q_zipf_fit",
]


def _subset() -> list[str]:
    qmap = entrymod.queries()
    sampled: set[str] = set()
    corr = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if corr:
        sampled = set(json.loads(corr[-1].read_text()))
    unsampled = sorted(set(qmap) - sampled)
    picked = set(unsampled[::4]) | (set(CURRENT_ROUND) & set(qmap))
    return sorted(picked)


@pytest.fixture(scope="module")
def duck_con(sf_dir):
    con = check_oracle.duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.oracle_subset
@pytest.mark.parametrize("name", _subset())
def test_oracle_subset(spark, sf_dir, duck_con, name):
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    err = check_oracle.compare_query(spark, duck_con, qmap, omap, name, sf_dir)
    assert err is None, f"{name}: {err}"
