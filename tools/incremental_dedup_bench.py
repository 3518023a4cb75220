"""Incremental-dedup ingestion benchmark — the round-8 sf10 measurement as
a repeatable tool (round 9), so contract/cap/plan changes to the operator
re-verify the production-shape numbers instead of trusting a one-off.

Shape (mirrors the recorded r8 run at sf10: 450k-doc corpus, 59k-doc
increment):

- corpus  = documents with doc_id % 10 != 0 (90%)
- index   = build_dedup_index(corpus), WRITTEN to parquet (timed: this is
  the one corpus read, ever)
- increment = the remaining 10% (fresh)
            + corpus docs with doc_id % 97 == 1 re-ingested verbatim
              (exact replays, new ids)
            + corpus docs with doc_id % 97 == 2 with two words appended
              (perturbed near-dup replays, new ids)
- incremental_dedup(increment, index read back from parquet, threshold 0.7)
  (timed), then the quality split: every exact replay must be rejected;
  perturbed-replay recall reports the 64-hash estimate trade.

Usage:  python tools/incremental_dedup_bench.py [SF_DIR] [OUT_DIR]
        (defaults /root/testdata/sf0.1 and a temp dir; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.operators.dedup import (  # noqa: E402
    build_dedup_index,
    incremental_dedup,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ddxbench_")
    spark = get_spark(app_name="incremental-dedup-bench")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    fresh = docs.where(F.col("doc_id") % 10 == 0)
    exact_replays = corpus.where(F.col("doc_id") % 97 == 1).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    perturbed = corpus.where(F.col("doc_id") % 97 == 2).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq wv")).alias("text"),
    )
    increment = fresh.unionAll(exact_replays).unionAll(perturbed)

    index_path = str(Path(out_dir) / "dedup_index.parquet")
    t0 = time.perf_counter()
    build_dedup_index(corpus, "doc_id", "text").write.mode("overwrite").parquet(index_path)
    build_sec = time.perf_counter() - t0

    index = spark.read.parquet(index_path)
    t0 = time.perf_counter()
    accepted, acc_index = incremental_dedup(
        increment, index, "doc_id", "text", threshold=0.7
    )
    acc_ids = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    dedup_sec = time.perf_counter() - t0

    n_exact = exact_replays.count()
    n_pert = perturbed.count()
    exact_escaped = sum(1 for i in acc_ids if 10_000_000 <= i < 20_000_000)
    pert_escaped = sum(1 for i in acc_ids if i >= 20_000_000)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_docs": corpus.count(),
                "increment_docs": increment.count(),
                "index_build_write_sec": round(build_sec, 1),
                "incremental_dedup_sec": round(dedup_sec, 1),
                "accepted": len(acc_ids),
                "exact_replays": n_exact,
                "exact_replays_escaped": exact_escaped,
                "perturbed_replays": n_pert,
                "perturbed_caught": n_pert - pert_escaped,
                "neardup_recall": round((n_pert - pert_escaped) / n_pert, 4)
                if n_pert
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
