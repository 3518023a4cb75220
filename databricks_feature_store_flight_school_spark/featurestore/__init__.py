from .client import FeatureStoreClient
from .decorators import feature_table
from .lookups import FeatureFunction, FeatureLookup, TrainingSet
from .registry import FeatureTableMeta

__all__ = [
    "FeatureStoreClient",
    "FeatureFunction",
    "FeatureLookup",
    "FeatureTableMeta",
    "TrainingSet",
    "feature_table",
]
