"""End-to-end feature-store walkthrough — the reference notebook's flow
(Feature_Store_Telco_Churn_Flight_School.py) as a plain script against the
engine: create feature tables, merge with schema evolution, build a
training set via declarative lookups, train/log a model, batch-score with a
models:/ URI, and clean up.

Run:  python examples/feature_store_demo.py  [warehouse_dir]
"""

from __future__ import annotations

import sys
import tempfile

REPO = __file__.rsplit("/examples/", 1)[0]
sys.path.insert(0, REPO)

from pyspark.sql import Row, functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.featurestore import (  # noqa: E402
    FeatureLookup,
    FeatureStoreClient,
)
from databricks_feature_store_flight_school_spark.featurestore.scoring import (  # noqa: E402
    TrainedLogisticModel,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="fs_demo_")
    spark = get_spark(app_name="fs-demo", shuffle_partitions=4)
    fs = FeatureStoreClient(spark, warehouse)

    # 1. feature tables (FS:207-218) with a CHECK expectation
    demo = spark.createDataFrame(
        [Row(customer_id=i, tenure=i * 3 % 40, monthly=20.0 + i) for i in range(1, 9)]
    )
    fs.create_feature_table(
        "demo_features", keys="customer_id", df=demo,
        expectations={"tenure_non_negative": "tenure >= 0"},
    )

    # 2. merge with schema evolution (FS:411-435): new column via merge
    update = spark.createDataFrame(
        [Row(customer_id=i, tenure=i * 3 % 40, monthly=20.0 + i, num_services=i % 4)
         for i in range(5, 11)]
    )
    fs.write_table("demo_features", update, mode="merge")
    print("feature table after evolving merge:")
    fs.read_table("demo_features").orderBy("customer_id").show()

    # 3. training set via declarative lookups (FS:286-321)
    labels = spark.createDataFrame(
        [Row(customer_id=i, churn=(i % 3 == 0)) for i in range(1, 11)]
    )
    ts = fs.create_training_set(
        labels, [FeatureLookup("demo_features", "customer_id")], label="churn",
        exclude_columns="customer_id",
    )

    # 4. train (driver-side, FS:326-342) + log -> models:/ URI (FS:342-349)
    pdf = ts.load_df().orderBy("tenure").toPandas().fillna(0.0)
    feature_cols = [c for c in pdf.columns if c != "churn"]
    model = TrainedLogisticModel.fit(pdf[feature_cols], pdf["churn"])
    uri = fs.log_model(None, model, ts, registered_model_name="demo_churn")
    print("logged:", uri)

    # 5. batch scoring re-folds the same lookups (FS:363)
    scored = fs.score_batch(uri, labels.select("customer_id"))
    scored.orderBy("customer_id").show()

    fs.drop_warehouse()
    print("OK")


if __name__ == "__main__":
    main()
