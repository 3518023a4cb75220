"""on_blowup='lsh' degrade-path evidence (VERDICT r10 #3).

Two measurements over the documents table:

1. RECALL at a scale where the exact shingle self-join is still feasible
   (default sf0.1): run shingle_pairs_jaccard twice with q_ngram_jaccard's
   parameters (k=3, threshold=0.8) — the exact path, and the LSH path
   FORCED via max_candidate_pairs=1 + on_blowup='lsh' — and report
   |lsh ∩ exact| / |exact|.  Precision is 1.0 by construction (the LSH
   path exact-verifies every candidate over the same df-filtered shingle
   set), so recall is the only quality number.

2. THE BLOWUP SCALE ITSELF (pass /tmp/sfgen/sf10): the exact path raises
   the max_candidate_pairs guard on this corpus by design (7.4e9 candidate
   pairs, SCALING.md); the same call with on_blowup='lsh' must COMPLETE
   and return the LSH-verified pair set.  Reported: pair count + wall.

Usage: python tools/lsh_degrade_demo.py [RECALL_SF_DIR] [BLOWUP_SF_DIR]
       (defaults /root/testdata/sf0.1 and none; prints one JSON line)
       sf10 needs SPARK_DRIVER_MEMORY=48g like every sweep.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.operators.dedup import (  # noqa: E402
    shingle_pairs_jaccard,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import load_table  # noqa: E402


def main() -> None:
    recall_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    blowup_dir = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="lsh-degrade-demo", shuffle_partitions=32)
    out: dict = {"recall_sf_dir": recall_dir}

    docs = load_table(spark, recall_dir, "documents").select("doc_id", "text")
    t0 = time.perf_counter()
    exact = {
        (r["id_a"], r["id_b"])
        for r in shingle_pairs_jaccard(
            docs, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    out["exact_pairs"] = len(exact)
    out["exact_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    lsh = {
        (r["id_a"], r["id_b"])
        for r in shingle_pairs_jaccard(
            docs, "doc_id", "text", k=3, threshold=0.8,
            max_candidate_pairs=1, on_blowup="lsh",
        ).collect()
    }
    out["lsh_pairs"] = len(lsh)
    out["lsh_sec"] = round(time.perf_counter() - t0, 1)
    out["false_positives"] = len(lsh - exact)  # 0 by construction
    out["recall"] = round(len(lsh & exact) / len(exact), 4) if exact else None

    if blowup_dir:
        big = load_table(spark, blowup_dir, "documents").select("doc_id", "text")
        try:
            shingle_pairs_jaccard(big, "doc_id", "text", k=3, threshold=0.8).count()
            out["blowup_exact"] = "unexpectedly completed"
        except Exception:  # noqa: BLE001 — the by-design guard raise
            out["blowup_exact"] = "raised max_candidate_pairs guard (by design)"
        t0 = time.perf_counter()
        n = shingle_pairs_jaccard(
            big, "doc_id", "text", k=3, threshold=0.8, on_blowup="lsh"
        ).count()
        out["blowup_sf_dir"] = blowup_dir
        out["blowup_lsh_pairs"] = n
        out["blowup_lsh_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
