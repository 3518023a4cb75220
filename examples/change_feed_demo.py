"""Change-data-feed walkthrough: versioned writes, table_changes diffs,
checkpointed consumption, and an incrementally-maintained aggregate feature
(operators/ivm.py) — the steady-state refresh path that never rescans the
fact table.

Run:  python examples/change_feed_demo.py  [warehouse_dir]
"""

from __future__ import annotations

import sys
import tempfile

REPO = __file__.rsplit("/examples/", 1)[0]
sys.path.insert(0, REPO)

from pyspark.sql import Row, functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.featurestore import (  # noqa: E402
    FeatureStoreClient,
)
from databricks_feature_store_flight_school_spark.operators import (  # noqa: E402
    agg_deltas,
    apply_deltas,
    compute_agg,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cdf_demo_")
    spark = get_spark(app_name="cdf-demo", shuffle_partitions=4)
    fs = FeatureStoreClient(spark, warehouse)

    # 1. a versioned base table: one row per order
    fs.create_feature_table(
        "orders_base", keys="order_id",
        df=spark.createDataFrame(
            [Row(order_id=i, cust=i % 3, amount=10.0 * i) for i in range(1, 7)]
        ),
    )

    # 2. maintain a per-customer aggregate from the change feed: bootstrap
    #    consumes the snapshot as inserts (offset 0)
    measures = {"total": "amount"}
    changes, _v, commit = fs.consume_changes("orders_base", "agg")
    agg = apply_deltas(
        compute_agg(fs.read_table("orders_base").limit(0), "cust", measures),
        agg_deltas(changes, "cust", measures), "cust", list(measures),
    ).localCheckpoint()
    commit()
    print("bootstrapped aggregate:")
    agg.orderBy("cust").show()

    # 3. merge: re-price order 2 and MOVE order 3 to another customer,
    #    insert order 7 — then delete order 1
    fs.write_table(
        "orders_base",
        spark.createDataFrame(
            [Row(order_id=2, cust=2, amount=25.0),
             Row(order_id=3, cust=0, amount=30.0),
             Row(order_id=7, cust=1, amount=70.0)]
        ),
        mode="merge",
    )
    fs.delete_from_table("orders_base", spark.createDataFrame([Row(order_id=1)]))

    # 4. the raw diff across the whole history
    print("table_changes(v1 -> current):")
    fs.table_changes("orders_base", 1).orderBy("order_id").show()

    # 5. fold ONLY the new change windows into the aggregate
    changes, _v, commit = fs.consume_changes("orders_base", "agg")
    agg = apply_deltas(
        agg, agg_deltas(changes, "cust", measures), "cust", list(measures)
    ).localCheckpoint()
    commit()
    print("incrementally refreshed aggregate:")
    agg.orderBy("cust").show()

    # 6. the invariant the property test pins: incremental == recompute
    want = {
        r["cust"]: (r["total"], r["_n_rows"])
        for r in compute_agg(fs.read_table("orders_base"), "cust", measures).collect()
    }
    got = {r["cust"]: (r["total"], r["_n_rows"]) for r in agg.collect()}
    assert got == want, (got, want)

    # 7. caught-up consumers see None (nothing to re-deliver)
    assert fs.consume_changes("orders_base", "agg") is None

    print("OK")


if __name__ == "__main__":
    main()
