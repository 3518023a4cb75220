"""End-to-end replay of the reference flow (SURVEY.md §5.3) on a synthetic
telco fixture (FIXTURES.md §A), asserting the invariants the notebook only
eyeballs via display()."""

from __future__ import annotations

import csv
import random

import pytest
from pyspark.sql import functions as F

from databricks_feature_store_flight_school_spark.flows import telco

_CONTRACTS = ["Month-to-month", "One year", "Two year", "Prepaid-unknown"]
_SERVICES = ["Yes", "No", "No internet service"]
_PAYMENT = ["Electronic check", "Mailed check", "Bank transfer", "Credit card"]


def _write_fixture(path, n=200, seed=42):
    rng = random.Random(seed)
    cols = [f.name for f in telco.TELCO_SCHEMA.fields]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(cols)
        for i in range(n):
            tenure = rng.choice([0, 0, 1, 5, 12, 24, 48, 71])
            monthly = round(rng.uniform(18.0, 120.0), 2)
            # blank TotalCharges for some tenure=0 rows (setup.py:219-221)
            total = "" if tenure == 0 and rng.random() < 0.7 else str(
                round(monthly * max(tenure, 1) * rng.uniform(0.9, 1.1), 2)
            )
            w.writerow(
                [
                    f"{i:04d}-CUST",
                    rng.choice(["Male", "Female"]),
                    rng.choice([0, 0, 0, 1]),
                    rng.choice(["Yes", "No"]),
                    rng.choice(["Yes", "No"]),
                    tenure,
                    rng.choice(["Yes", "No"]),
                    rng.choice(["Yes", "No", "No phone service"]),
                    rng.choice(["DSL", "Fiber optic", "No"]),
                    *[rng.choice(_SERVICES) for _ in range(6)],
                    rng.choice(_CONTRACTS),
                    rng.choice(["Yes", "No"]),
                    rng.choice(_PAYMENT),
                    monthly,
                    total,
                    rng.choice(["Yes", "No", "No", "No"]),
                ]
            )
    return path


@pytest.fixture(scope="module")
def flow(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("telco")
    csv_path = _write_fixture(str(base / "telco.csv"))
    return telco.run_telco_flow(
        spark, csv_path, warehouse=str(base / "wh"), model_dir=str(base / "model")
    )


def test_ingest_types_and_nulls(flow):
    data = flow["data"]
    dt = dict(data.dtypes)
    assert dt["SeniorCitizen"] == "boolean" and dt["Churn"] == "boolean"
    assert dt["Contract"] == "int" and dt["TotalCharges"] == "double"
    # unmatched contract label -> null (when-chain without otherwise)
    assert data.where(F.col("Contract").isNull()).count() > 0
    # blank TotalCharges -> null before repair
    assert data.where(F.col("TotalCharges").isNull()).count() > 0


def test_feature_split_preserves_rows_and_columns(flow):
    n = flow["data"].count()
    assert flow["demographics"].count() == n
    assert flow["services"].count() == n
    assert flow["demographics"].columns == telco.DEMOGRAPHIC_COLS
    svc_cols = set(flow["services"].columns)
    assert "Churn" not in svc_cols and "gender" not in svc_cols
    assert "customerID" in svc_cols
    # null repair applied in the service branch
    assert flow["services"].where(F.col("TotalCharges").isNull()).count() == 0


def test_merge_schema_evolution_added_v2_columns(flow):
    client = flow["client"]
    evolved = client.read_table("service_features")
    assert {"NumOptionalServices", "AvgPriceIncrease"} <= set(evolved.columns)
    assert evolved.count() == flow["data"].count()
    stats = evolved.agg(
        F.min("NumOptionalServices").alias("lo"), F.max("NumOptionalServices").alias("hi")
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] <= 6
    # divide-guard: tenure=0 rows got exactly 0.0
    assert (
        evolved.where((F.col("tenure") == 0) & (F.col("AvgPriceIncrease") != 0.0)).count()
        == 0
    )


def test_training_set_shape(flow):
    tdf = flow["training_df"]
    assert "Churn" in tdf.columns  # label kept
    assert "customerID" not in tdf.columns  # excluded (FS:321)
    assert {"gender", "NumOptionalServices", "AvgPriceIncrease"} <= set(tdf.columns)
    assert tdf.count() == flow["data"].count()


def test_scoring_joins_back_and_is_deterministic(flow):
    scored = flow["scored"]
    assert dict(scored.dtypes)["prediction"] == "boolean"
    assert scored.count() == flow["data"].count()
    joined = flow["with_labels"]
    assert joined.count() == flow["data"].count()
    # deterministic: collecting twice yields the identical prediction multiset
    first = sorted(r["prediction"] for r in scored.select("prediction").collect())
    second = sorted(r["prediction"] for r in scored.select("prediction").collect())
    assert first == second


def test_lastcall_hash_bucket_deterministic(flow):
    inf = flow["inference"]
    a = {r["customerID"]: r["LastCallEscalated"] for r in inf.collect()}
    b = {r["customerID"]: r["LastCallEscalated"] for r in inf.collect()}
    assert a == b
    assert set(map(type, a.values())) <= {bool}


def test_infer_schema_ingest_matches_declared(spark, tmp_path_factory):
    """The reference's inferSchema read (kept for parity) must produce the
    same cleaned frame as the declared-schema single-pass read."""
    base = tmp_path_factory.mktemp("telco_infer")
    csv_path = _write_fixture(str(base / "telco.csv"), n=60, seed=7)
    declared = telco.clean_telco(telco.ingest_telco_csv(spark, csv_path))
    inferred = telco.clean_telco(
        telco.ingest_telco_csv(spark, csv_path, infer_schema=True)
    )
    assert declared.columns == inferred.columns
    a = sorted(map(tuple, declared.collect()))
    b = sorted(map(tuple, inferred.collect()))
    assert a == b
