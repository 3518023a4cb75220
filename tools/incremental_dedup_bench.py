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

``--soak`` runs the round-10 CONTINUOUS-ingestion measurement instead
(VERDICT r9 #1b): the documents table splits into an initial corpus (20%)
plus 4 equal increments (20% each), the index lives in persisted bucketed
tables with a maintained hot-bucket table + (band,bucket) counts table +
persisted stats (bootstrap_dedup_store — the round-11 increment-sized
append path: no happy-path append job scans the index or band-key
tables), and every step runs the full production loop —
incremental_dedup against the persisted tables, correctness asserts
(exact replays of the PREVIOUS increment's admissions all rejected;
perturbed near-dups of them ≥99% rejected — the coverage a stale band
table loses), then append_dedup_increment.  The index grows 2× .. 5×
across steps while increments stay the same size, so a ~flat per-step
dedup wall IS the O(|increment|) evidence; the run ends with a timed
compact_dedup_index and its file-count delta.
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


def soak(spark, sf_dir: str, steps: int = 4, num_buckets: int = 16) -> dict:
    from databricks_feature_store_flight_school_spark.operators.dedup import (
        index_band_keys,
    )
    from databricks_feature_store_flight_school_spark.operators.dedup_store import (
        append_dedup_increment,
        bootstrap_dedup_store,
        compact_dedup_index,
    )
    from databricks_feature_store_flight_school_spark.operators.publish import (
        drop_published,
    )
    from databricks_feature_store_flight_school_spark.operators.skew import (
        bucketed_table,
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_slices = steps + 1
    slices = [docs.where(F.col("doc_id") % n_slices == j) for j in range(n_slices)]
    tables = ("soak_index", "soak_bands", "soak_hot", "soak_counts")
    for t in tables:
        drop_published(spark, t)

    t0 = time.perf_counter()
    index0 = build_dedup_index(slices[0], "doc_id", "text")
    write_bucketed(index0, "soak_index", "content_hash", num_buckets=num_buckets)
    bands0 = index_band_keys(bucketed_table(spark, "soak_index"), "doc_id", bands=16)
    write_bucketed(bands0, "soak_bands", ["band", "bucket"], num_buckets=num_buckets)
    bootstrap_dedup_store(
        spark, "soak_index", "soak_bands",
        hot_table="soak_hot", counts_table="soak_counts",
    )
    bootstrap_sec = time.perf_counter() - t0

    step_rows = []
    for j in range(1, steps + 1):
        prev = slices[j - 1]
        exact_replays = prev.where(F.col("doc_id") % 97 == 1).select(
            (F.col("doc_id") + 10_000_000 * j).alias("doc_id"), "text"
        )
        perturbed = prev.where(F.col("doc_id") % 97 == 2).select(
            (F.col("doc_id") + 20_000_000 * j).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq wv")).alias("text"),
        )
        increment = slices[j].unionAll(exact_replays).unionAll(perturbed)

        t0 = time.perf_counter()
        accepted, acc_index = incremental_dedup(
            increment,
            bucketed_table(spark, "soak_index"),
            "doc_id",
            "text",
            threshold=0.7,
            # table-NAME form: the stamped store skips the read-side verify
            # via the metadata probe (r11 #2) — zero extra jobs per step
            index_bands="soak_bands",
            index_hot_buckets=spark.table("soak_hot"),
        )
        acc_ids = {r["doc_id"] for r in accepted.select("doc_id").collect()}
        # materialize the accepted-index rows INSIDE the dedup wall: this
        # is the increment's dedup computation (its plan re-joins the
        # corpus index), not maintenance — leaving it lazy would hide a
        # full dedup re-run inside append_sec and mask what the
        # increment-sized append path actually costs
        acc_index = acc_index.localCheckpoint(eager=True)
        dedup_sec = time.perf_counter() - t0

        lo, hi = 10_000_000 * j, 20_000_000 * j
        exact_escaped = sum(1 for i in acc_ids if lo <= i < hi)
        n_pert = perturbed.count()
        pert_escaped = sum(1 for i in acc_ids if i >= hi)
        assert exact_escaped == 0, f"step {j}: {exact_escaped} exact replays escaped"
        recall = (n_pert - pert_escaped) / n_pert if n_pert else None
        assert recall is None or recall >= 0.99, f"step {j}: recall {recall}"

        t0 = time.perf_counter()
        append_dedup_increment(
            spark, "soak_index", "soak_bands", acc_index,
            hot_table="soak_hot", counts_table="soak_counts",
        )
        append_sec = time.perf_counter() - t0
        step_rows.append(
            {
                "step": j,
                "index_docs_before": spark.table("soak_index").count()
                - len(acc_ids),
                "increment_docs": increment.count(),
                "accepted": len(acc_ids),
                "neardup_recall": round(recall, 4) if recall is not None else None,
                "dedup_sec": round(dedup_sec, 1),
                "append_sec": round(append_sec, 1),
            }
        )

    t0 = time.perf_counter()
    stats = compact_dedup_index(
        spark, "soak_index", "soak_bands",
        hot_table="soak_hot", counts_table="soak_counts",
    )
    compact_sec = time.perf_counter() - t0
    out = {
        "sf_dir": sf_dir,
        "mode": "soak",
        "bootstrap_sec": round(bootstrap_sec, 1),
        "steps": step_rows,
        "compact_sec": round(compact_sec, 1),
        "files_before_compact": stats["files_before"],
        "files_after_compact": stats["files_after"],
    }
    for t in tables:
        drop_published(spark, t)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--soak"]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if "--soak" in sys.argv:
        spark = get_spark(app_name="incremental-dedup-soak")
        print(json.dumps(soak(spark, sf_dir)))
        return
    out_dir = args[1] if len(args) > 1 else tempfile.mkdtemp(prefix="ddxbench_")
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
