"""Batch scoring: the reference's ``fs.score_batch`` (J4/U2, FS:363/FS:388).

The reference packages an sklearn pipeline plus the lookup graph with MLflow
(``fs.log_model(..., training_set=...)``) so scoring can rebuild the J3 join
without the caller restating it.  Neither mlflow nor sklearn exists in this
environment, so the engine defines the same contract with a minimal model
format:

- :class:`Predictor` — anything with ``predict(pandas.DataFrame) -> Series``;
- :func:`log_model` — persist (predictor pickle, lookup specs, label,
  excludes, feature column order) to a directory;
- :func:`score_batch` — load that directory, re-fold the left lookup joins
  onto the input frame, apply the predictor as an Arrow-batched pandas UDF,
  append ``prediction`` (result_type honoured, FS:363's 'string').

:class:`LinearThresholdModel` is the deterministic stand-in for the trained
GradientBoostingClassifier — a fixed-weight linear score, so tests and the
DuckDB oracle can replicate predictions exactly.
"""

from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .lookups import FeatureLookup, TrainingSet


@runtime_checkable
class Predictor(Protocol):
    def predict(self, features: pd.DataFrame) -> pd.Series:  # pragma: no cover
        ...


@dataclass
class LinearThresholdModel:
    """prediction = (Σ w_i * x_i + bias) > threshold — deterministic, and
    exactly reproducible in ANSI SQL for the oracle gate."""

    weights: dict[str, float]
    bias: float = 0.0
    threshold: float = 0.0

    def predict(self, features: pd.DataFrame) -> pd.Series:
        score = pd.Series(self.bias, index=features.index, dtype="float64")
        for col, w in self.weights.items():
            score = score + features[col].astype("float64") * w
        return score > self.threshold


def log_model(path: str, predictor: Predictor, training_set: TrainingSet) -> None:
    """Persist predictor + lookup graph (the engine's fs.log_model,
    FS:342-349).  The lookup metadata is what lets score_batch rebuild J3."""
    os.makedirs(path, exist_ok=True)
    spec = {
        "feature_lookups": [
            {
                "table_name": lk.table_name,
                "lookup_key": lk.lookup_key,
                "feature_names": lk.feature_names,
                "timestamp_lookup_key": lk.timestamp_lookup_key,
                "lookup_tolerance_seconds": lk.lookup_tolerance_seconds,
            }
            for lk in training_set.feature_lookups
        ],
        "exclude_columns": training_set.exclude_columns,
        "label": training_set.label,
        "feature_columns": training_set.feature_columns(),
    }
    with open(os.path.join(path, "lookup_graph.json"), "w") as fh:
        json.dump(spec, fh, indent=2)
    with open(os.path.join(path, "predictor.pkl"), "wb") as fh:
        pickle.dump(predictor, fh)


def score_batch(
    client,
    model_path: str,
    df: DataFrame,
    result_type: str = "boolean",
    broadcast: bool = True,
) -> DataFrame:
    """Re-execute the model's lookup join on ``df`` and append ``prediction``.

    Mirrors FS:363: the caller supplies only entity keys (+ request-time
    features); every trained-on feature is retrieved by the stored lookup
    graph.  The predictor crosses the JVM->Python boundary once per Arrow
    batch (U2), never per row.
    """
    with open(os.path.join(model_path, "lookup_graph.json")) as fh:
        spec = json.load(fh)
    with open(os.path.join(model_path, "predictor.pkl"), "rb") as fh:
        predictor = pickle.load(fh)

    lookups = [
        FeatureLookup(
            table_name=d["table_name"],
            lookup_key=d["lookup_key"],
            feature_names=d["feature_names"],
            # PIT specs MUST survive the log/score roundtrip: dropping them
            # silently degrades scoring to a plain left join against full
            # feature history (row fan-out + train/serve skew).
            timestamp_lookup_key=d.get("timestamp_lookup_key"),
            lookup_tolerance_seconds=d.get("lookup_tolerance_seconds"),
        )
        for d in spec["feature_lookups"]
    ]
    ts = TrainingSet(
        df=df,
        feature_lookups=lookups,
        label=None,
        exclude_columns=[],
        _client=client,
        broadcast=broadcast,
    )
    joined = ts.load_df()
    feature_cols = spec["feature_columns"]

    @pandas_udf(result_type)
    def _predict(*cols: pd.Series) -> pd.Series:
        feats = pd.DataFrame({name: s for name, s in zip(feature_cols, cols)})
        out = predictor.predict(feats)
        if result_type == "string":
            return out.astype("string")
        if result_type in ("double", "float"):
            return out.astype("float64")
        if result_type in ("int", "long", "bigint", "integer"):
            return out.astype("int64")
        return out

    return joined.withColumn("prediction", _predict(*[F.col(c) for c in feature_cols]))
