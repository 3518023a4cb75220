"""LLM training-corpus preparation walkthrough: language/quality/repetition
filters -> exact + near dedup -> benchmark decontamination -> RAG chunking,
all as one lazy composed plan over the documents table.

Run:  python examples/corpus_pipeline_demo.py  [sf_dir]
"""

from __future__ import annotations

import sys

REPO = __file__.rsplit("/examples/", 1)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.pipeline import CorpusPipeline  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-demo", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents")
    print("raw docs:", docs.count())

    # a tiny "benchmark" to decontaminate against: the first 3 documents
    benchmark = docs.where(F.col("doc_id") < 3).select("text")

    pipe = (
        CorpusPipeline(docs)
        .filter_language("en", "de")
        .filter_quality(0.3)
        .filter_repetition(0.9)
        .dedup_exact(prefix=120)
        .dedup_near(jaccard=0.8)
        .decontaminate(benchmark, k=4)
    )
    kept = pipe.df.count()
    print("kept after filters/dedup/decontamination:", kept)

    chunks = pipe.chunk(size=64, stride=48)
    print("RAG chunks:", chunks.count())
    chunks.orderBy("doc_id", "chunk_index").show(5, truncate=60)

    pipe.stats().show()
    print("OK")


if __name__ == "__main__":
    main()
