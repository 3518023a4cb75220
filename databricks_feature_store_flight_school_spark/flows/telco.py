"""The reference's end-to-end flow, re-expressed engine-side: CSV ingest with
typed cleanup -> feature tables -> merge-upsert (incl. schema evolution) ->
declarative training set -> model -> batch scoring.

Reference parity map (cited file:line in each function):

- ingest + cleanup   includes/setup.py:206-221 (S1, P6/P7, F2-F6)
- feature split      Feature_Store_Telco_Churn_Flight_School.py:113-135 (P1/P2)
- synthetic label    FS:156-157 (F1 hash bucketing)
- registration       FS:207-218 (D4)
- merge writes       FS:230-231, FS:435 (S8, schema evolution)
- v2 features        FS:411-424 (U1/A2, F5)
- training set       FS:286-289, FS:317-323 (J3)
- scoring            FS:363-365 (J4)

100 TB posture: the CSV schema is DECLARED (`TELCO_SCHEMA`), killing
inferSchema's extra pass over the data (SURVEY.md §7 step 5); every cleanup
and feature expression is a JVM Column expression; the optional-services
count offers the pandas-UDF form only for API parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..featurestore.client import FeatureStoreClient
from ..featurestore.lookups import FeatureLookup
from ..featurestore.scoring import LinearThresholdModel
from ..functions.horizontal import count_if_equals

#: Raw CSV schema as downloaded (everything string except the numerics the
#: IBM dataset ships typed) — declared so ingest is a single pass (no infer).
TELCO_SCHEMA = StructType(
    [
        StructField("customerID", StringType()),
        StructField("gender", StringType()),
        StructField("SeniorCitizen", IntegerType()),
        StructField("Partner", StringType()),
        StructField("Dependents", StringType()),
        StructField("tenure", IntegerType()),
        StructField("PhoneService", StringType()),
        StructField("MultipleLines", StringType()),
        StructField("InternetService", StringType()),
        StructField("OnlineSecurity", StringType()),
        StructField("OnlineBackup", StringType()),
        StructField("DeviceProtection", StringType()),
        StructField("TechSupport", StringType()),
        StructField("StreamingTV", StringType()),
        StructField("StreamingMovies", StringType()),
        StructField("Contract", StringType()),
        StructField("PaperlessBilling", StringType()),
        StructField("PaymentMethod", StringType()),
        StructField("MonthlyCharges", DoubleType()),
        StructField("TotalCharges", StringType()),  # blanks -> cleaned to null
        StructField("Churn", StringType()),
    ]
)

DEMOGRAPHIC_COLS = ["customerID", "gender", "SeniorCitizen", "Partner", "Dependents"]
OPTIONAL_SERVICE_COLS = [
    "OnlineSecurity",
    "OnlineBackup",
    "DeviceProtection",
    "TechSupport",
    "StreamingTV",
    "StreamingMovies",
]
_YES_NO_COLS = ["Partner", "Dependents", "PhoneService", "PaperlessBilling", "Churn"]


def ingest_telco_csv(spark: SparkSession, path: str, infer_schema: bool = False) -> DataFrame:
    """CSV scan (S1, setup.py:206).  Defaults to the declared schema — at
    scale inferSchema means one extra full pass; ``infer_schema=True`` keeps
    the reference's exact behaviour for parity."""
    reader = spark.read.option("header", True)
    if infer_schema:
        return reader.option("inferSchema", True).csv(path)
    return reader.schema(TELCO_SCHEMA).csv(path)


def clean_telco(df: DataFrame) -> DataFrame:
    """Typed cleanup (setup.py:209-221): int flag -> boolean, Yes/No ->
    boolean, Contract term -> months (unmatched -> null), blank TotalCharges
    -> null then cast double."""
    out = df.withColumn("SeniorCitizen", F.col("SeniorCitizen") == 1)
    for c in _YES_NO_COLS:
        out = out.withColumn(c, F.col(c) == "Yes")
    out = out.withColumn(
        "Contract",
        F.when(F.col("Contract") == "Month-to-month", 1)
        .when(F.col("Contract") == "One year", 12)
        .when(F.col("Contract") == "Two year", 24),  # no otherwise -> null
    )
    return out.withColumn(
        "TotalCharges",
        F.when(F.length(F.trim(F.col("TotalCharges"))) == 0, None)
        .otherwise(F.col("TotalCharges"))
        .cast("double"),
    )


def compute_demographic_features(data: DataFrame) -> DataFrame:
    """Static projection (FS:113-115)."""
    return data.select(DEMOGRAPHIC_COLS)


def compute_service_features(data: DataFrame) -> DataFrame:
    """Dynamic complement-of-set projection (FS:127-133) + null repair."""
    service_cols = ["customerID"] + [
        c for c in data.columns if c not in ["Churn"] + DEMOGRAPHIC_COLS
    ]
    return data.select(service_cols).fillna({"TotalCharges": 0.0})


def add_v2_service_features(service_df: DataFrame) -> DataFrame:
    """The schema-evolving v2 columns (FS:411-424): optional-services count
    (pure-Column rewrite of the reference's pandas UDF — SURVEY.md §2.4 A2)
    and the divide-guarded price-increase average."""
    return service_df.withColumn(
        "NumOptionalServices", count_if_equals(OPTIONAL_SERVICE_COLS, "Yes")
    ).withColumn(
        "AvgPriceIncrease",
        F.when(
            F.col("tenure") > 0,
            F.col("MonthlyCharges") - (F.col("TotalCharges") / F.col("tenure")),
        ).otherwise(0.0),
    )


def make_inference_data(data: DataFrame) -> DataFrame:
    """Label + request-time feature (FS:156-157): LastCallEscalated is a
    deterministic hash bucket correlated with the label (F1 semantics —
    Spark Murmur3, % keeps the dividend sign)."""
    bucket = F.hash(F.col("customerID")) % 100
    return data.select(
        "customerID",
        "Churn",
        F.when(F.col("Churn"), bucket < 35).otherwise(bucket < 15).alias(
            "LastCallEscalated"
        ),
    )


def generate_all_lookups(client: FeatureStoreClient, table_name: str, key: str):
    """One FeatureLookup per non-key column, discovered from the table schema
    (FS:286-289)."""
    cols = [c for c in client.read_table(table_name).columns if c != key]
    return [
        FeatureLookup(table_name=table_name, feature_names=[c], lookup_key=key)
        for c in cols
    ]


def run_telco_flow(
    spark: SparkSession, csv_path: str, warehouse: str, model_dir: str
) -> dict:
    """Full reference flow (FS end-to-end).  Returns every intermediate
    artifact so tests can assert the notebook's eyeballed invariants."""
    client = FeatureStoreClient(spark, warehouse)
    data = clean_telco(ingest_telco_csv(spark, csv_path))

    demographics = compute_demographic_features(data)
    services = compute_service_features(data)
    client.create_feature_table(
        "demographic_features",
        keys="customerID",
        schema=demographics.schema,
        description="Telco customer demographics",
    )
    client.create_feature_table(
        "service_features",
        keys="customerID",
        schema=services.schema,
        description="Telco customer services",
    )
    client.write_table("demographic_features", demographics, mode="merge")
    client.write_table("service_features", services, mode="merge")

    inference = make_inference_data(data)

    # v2: two new columns arrive purely via merge (FS:435 schema evolution)
    client.write_table("service_features", add_v2_service_features(services), mode="merge")

    lookups = generate_all_lookups(
        client, "demographic_features", "customerID"
    ) + generate_all_lookups(client, "service_features", "customerID")
    training_set = client.create_training_set(
        inference, lookups, label="Churn", exclude_columns="customerID"
    )
    training_df = training_set.load_df()

    # deterministic stand-in for the GradientBoosting fit (FS:333-337)
    model = LinearThresholdModel(
        weights={"NumOptionalServices": -1.0, "Contract": -0.2, "AvgPriceIncrease": 0.5},
        bias=2.0,
        threshold=0.0,
    )
    client.log_model(model_dir, model, training_set)
    scored = client.score_batch(
        model_dir, inference.select("customerID", "LastCallEscalated"), result_type="boolean"
    )
    with_labels = scored.join(inference.select("customerID", "Churn"), on="customerID")

    return {
        "client": client,
        "data": data,
        "demographics": demographics,
        "services": services,
        "inference": inference,
        "training_df": training_df,
        "scored": scored,
        "with_labels": with_labels,
    }
