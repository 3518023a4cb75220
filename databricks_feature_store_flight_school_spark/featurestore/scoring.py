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
import re
from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .lookups import FeatureFunction, FeatureLookup, TrainingSet


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


@dataclass
class TrainedLogisticModel:
    """Numpy logistic regression — the engine's stand-in for the reference's
    *trained* GradientBoostingClassifier (FS:326-342), closing the gap where
    :class:`LinearThresholdModel` only ever carried fixed weights.

    Deterministic by construction: features are z-scored with the training
    moments, weights start at zero, and full-batch gradient descent runs a
    fixed ``n_iter`` in float64 — same sorted training frame in, same weights
    out, so train->log->score parity is testable bit-for-bit.

    Scale note: *fitting* is driver-side on a bounded pandas frame (the
    caller samples/limits the training set — model fitting is not the
    engine's distributed path; the reference trains driver-side too,
    FS:326).  *Scoring* is distributed: the fitted weights ship inside the
    pickled artifact and apply per Arrow batch (U2).
    """

    feature_names: list[str]
    weights: np.ndarray
    bias: float
    mean: np.ndarray
    std: np.ndarray
    threshold: float = 0.5

    @classmethod
    def fit(
        cls,
        features: pd.DataFrame,
        labels: pd.Series,
        lr: float = 0.5,
        n_iter: int = 200,
        threshold: float = 0.5,
    ) -> "TrainedLogisticModel":
        names = list(features.columns)
        X = features.to_numpy(dtype="float64")
        y = labels.to_numpy(dtype="float64")
        mean = X.mean(axis=0)
        std = X.std(axis=0)
        std = np.where(std == 0.0, 1.0, std)
        Z = (X - mean) / std
        w = np.zeros(Z.shape[1])
        b = 0.0
        n = len(y)
        for _ in range(n_iter):
            p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
            grad = p - y
            w -= lr * (Z.T @ grad) / n
            b -= lr * grad.mean()
        return cls(
            feature_names=names, weights=w, bias=b, mean=mean, std=std,
            threshold=threshold,
        )

    def predict_proba(self, features: pd.DataFrame) -> pd.Series:
        X = features[self.feature_names].to_numpy(dtype="float64")
        Z = (X - self.mean) / self.std
        p = 1.0 / (1.0 + np.exp(-(Z @ self.weights + self.bias)))
        return pd.Series(p, index=features.index)

    def predict(self, features: pd.DataFrame) -> pd.Series:
        return self.predict_proba(features) > self.threshold


@dataclass
class MlflowPredictor:
    """Adapter: an MLflow pyfunc model behind the engine's Predictor
    protocol — closes the interop gap with the reference's
    ``mlflow.pyfunc.spark_udf`` scoring (FS:342-363): a model logged by real
    MLflow scores through the same ``score_batch`` path as the engine's own
    predictors.

    Only the MLflow model URI is pickled into the engine artifact; the
    pyfunc model itself lazy-loads on first predict (once per Python worker,
    exactly like ``mlflow.pyfunc.spark_udf``'s executor-side load).  mlflow
    is not installed in this harness — the adapter raises cleanly without
    it, and its roundtrip test (tests/test_featurestore.py) arms itself when
    the library appears (the same env-gating pattern as the protobuf/TWS and
    PIL tests)."""

    model_uri: str

    def __getstate__(self):
        return {"model_uri": self.model_uri}

    def __setstate__(self, state):
        self.model_uri = state["model_uri"]

    def _load(self):
        if getattr(self, "_model", None) is None:
            try:
                import mlflow.pyfunc  # type: ignore
            except ImportError as exc:
                raise RuntimeError(
                    "mlflow is not installed; MlflowPredictor needs it to "
                    "load the pyfunc model (use the engine's own Predictor "
                    "implementations otherwise)"
                ) from exc
            self._model = mlflow.pyfunc.load_model(self.model_uri)
        return self._model

    def predict(self, features: pd.DataFrame) -> pd.Series:
        out = self._load().predict(features)
        if isinstance(out, pd.Series):
            return out
        if isinstance(out, pd.DataFrame):  # single-column pyfunc frames
            return out.iloc[:, 0]
        return pd.Series(np.asarray(out).reshape(-1), index=features.index)


_MODELS_DIR = "_models"
_MODEL_URI_RE = re.compile(r"^models:/([^/]+)/(\d+|latest)$")


def register_model_version(warehouse: str, name: str) -> tuple[str, int]:
    """Allocate the next version directory for ``models:/<name>`` under the
    warehouse — the engine's model registry (the reference's
    ``registered_model_name=`` on fs.log_model, FS:342-349).  Returns
    (version_dir, version); versions are 1-based like MLflow's."""
    root = os.path.join(warehouse, _MODELS_DIR, name)
    os.makedirs(root, exist_ok=True)
    versions = [int(d[1:]) for d in os.listdir(root) if re.fullmatch(r"v\d+", d)]
    version = max(versions, default=0) + 1
    vdir = os.path.join(root, f"v{version}")
    os.makedirs(vdir)
    return vdir, version


def resolve_model_uri(warehouse: str, uri_or_path: str) -> str:
    """``models:/name/3`` (or ``models:/name/latest``) -> artifact directory;
    anything else is treated as a filesystem path (back-compat).  Mirrors the
    reference's versioned-URI scoring entry point
    ``fs.score_batch('models:/feature_store_telco_churn/1', ...)`` (FS:363)."""
    m = _MODEL_URI_RE.match(uri_or_path)
    if not m:
        return uri_or_path
    name, version = m.groups()
    root = os.path.join(warehouse, _MODELS_DIR, name)
    if version == "latest":
        versions = sorted(
            (int(d[1:]) for d in os.listdir(root) if re.fullmatch(r"v\d+", d))
            if os.path.isdir(root) else []
        )
        if not versions:
            raise FileNotFoundError(f"no versions registered for models:/{name}")
        version = versions[-1]
    vdir = os.path.join(root, f"v{version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"model not found: models:/{name}/{version}")
    return vdir


def log_model(path: str, predictor: Predictor, training_set: TrainingSet) -> None:
    """Persist predictor + lookup graph (the engine's fs.log_model,
    FS:342-349).  The lookup metadata is what lets score_batch rebuild J3."""
    os.makedirs(path, exist_ok=True)
    spec = {
        "feature_lookups": [
            {"output_name": lk.output_name, "expr": lk.expr}
            if isinstance(lk, FeatureFunction)
            else {
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
        FeatureFunction(output_name=d["output_name"], expr=d["expr"])
        if "output_name" in d
        else FeatureLookup(
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
