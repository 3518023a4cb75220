"""The ``@feature_table`` decorator (FS:94-111 contract).

In the reference, decorating a ``DataFrame -> DataFrame`` function gives it a
``compute_and_write(input, feature_table_name, mode)`` method that runs the
function and writes its output into the named feature table.  Calling the
function directly still just returns the DataFrame (FS:117/135/426 use this
for display + tests), which is what makes feature pipelines unit-testable
without any write.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame


class FeatureComputation:
    """Wrapper produced by :func:`feature_table`."""

    def __init__(self, fn: Callable[..., DataFrame], client=None):
        self._fn = fn
        self._client = client
        functools.update_wrapper(self, fn)

    def __call__(self, *args, **kwargs) -> DataFrame:
        return self._fn(*args, **kwargs)

    def bind(self, client) -> "FeatureComputation":
        """Attach a FeatureStoreClient so compute_and_write knows the catalog."""
        self._client = client
        return self

    def compute_and_write(
        self, input_df: DataFrame, feature_table_name: str, mode: str = "merge"
    ):
        """Run the wrapped computation on ``input_df`` and merge/overwrite the
        result into ``feature_table_name`` (FS:230-231, FS:435)."""
        if self._client is None:
            raise RuntimeError(
                "feature_table function is not bound to a FeatureStoreClient; "
                "call .bind(client) or use client.feature_table(...)"
            )
        out = self._fn(input_df)
        return self._client.write_table(feature_table_name, out, mode=mode)


def feature_table(fn: Callable[..., DataFrame]) -> FeatureComputation:
    """Decorator: ``@feature_table`` over a DataFrame transformation."""
    return FeatureComputation(fn)
