"""Scalable-analytics surface demo: the round-5 primitives end-to-end on a
synthetic frame — global ranks without a single-task window, NTILE
segmentation, a running (Lorenz-style) share via the prefix sum, and PCA
fit/project.  Run: ``python examples/scalable_analytics_demo.py``."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.operators.ranks import (  # noqa: E402
    global_ntile,
    global_prefix_sum,
    global_row_number,
)
from databricks_feature_store_flight_school_spark.operators.pca import (  # noqa: E402
    pca_fit,
    pca_project,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="scalable-analytics-demo", shuffle_partitions=4)

    # deterministic synthetic "revenue" per entity
    ent = spark.range(1000).select(
        F.col("id").alias("entity"),
        ((F.col("id") * 2654435761) % 997 / 10.0).alias("revenue"),
    )

    ranked = global_row_number(ent, [F.col("revenue").desc(), "entity"], "rank")
    top = ranked.where(F.col("rank") <= 3).orderBy("rank").collect()
    assert [r["rank"] for r in top] == [1, 2, 3]

    deciles = global_ntile(ent, [F.col("revenue").desc(), "entity"], 10, "decile")
    sizes = {r["decile"]: r["n"] for r in
             deciles.groupBy("decile").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == 1000 and len(sizes) == 10

    running = global_prefix_sum(ent, [F.col("revenue"), "entity"], "revenue", "cum")
    total = ent.agg(F.sum("revenue")).collect()[0][0]
    last = running.orderBy(F.col("cum").desc()).limit(1).collect()[0]["cum"]
    assert abs(last - total) < 1e-6

    vecs = ent.select(
        "entity",
        F.array(
            F.col("revenue"),
            F.col("revenue") * 0.5 + F.col("entity") % 7,
            (F.col("entity") % 13).cast("double"),
        ).alias("v"),
    )
    comps, mean = pca_fit(vecs, "v", k=2)
    projected = pca_project(vecs, "v", comps, mean)
    assert projected.select("pc1", "pc2").count() == 1000

    print("ranks / ntile / prefix-sum / pca all consistent")
    print("OK")


if __name__ == "__main__":
    main()
