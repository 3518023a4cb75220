from .client import FeatureStoreClient
from .decorators import feature_table
from .lookups import FeatureFunction, FeatureLookup, TrainingSet
from .online import AmazonRdsMySqlSpec, EmbeddedDerbySpec, OnlineStoreSpec
from .registry import FeatureTableMeta

__all__ = [
    "AmazonRdsMySqlSpec",
    "EmbeddedDerbySpec",
    "FeatureStoreClient",
    "FeatureFunction",
    "FeatureLookup",
    "FeatureTableMeta",
    "OnlineStoreSpec",
    "TrainingSet",
    "feature_table",
]
