"""PySpark-native analytics engine with the capabilities of the
billkellett/databricks-feature-store-flight-school reference (see SURVEY.md).

Built from scratch on the public PySpark DataFrame/SQL API. The package is
organised by concern:

- ``session``       SparkSession factory / session preparation (AQE, Arrow, UTC)
- ``sources``       table loaders, CSV ingest, binary-file source
- ``featurestore``  feature-table registry, merge-upsert writer, lookup joins,
                    training sets, batch scoring (the reference's core surface)
- ``operators``     as-of joins, batch time windows, top-k, dedup, similarity
- ``functions``     column-expression helpers (text stats, vector math,
                    horizontal count-if)
- ``multimodal``    binary-column plumbing (decode/featurize stubs)
- ``streaming``     Structured Streaming variants of the batch window ops
- ``plans``         the query catalog exposed through ``__spark_entry__.py``
"""

__version__ = "0.1.0"
