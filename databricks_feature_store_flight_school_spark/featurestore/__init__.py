from .client import FeatureStoreClient
from .decorators import feature_table
from .lookups import FeatureLookup, TrainingSet
from .registry import FeatureTableMeta

__all__ = [
    "FeatureStoreClient",
    "FeatureLookup",
    "FeatureTableMeta",
    "TrainingSet",
    "feature_table",
]
