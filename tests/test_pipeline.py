"""CorpusPipeline facade: stage composition, monotone filtering, and parity
with the hand-built operator chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_feature_store_flight_school_spark.pipeline import CorpusPipeline
from databricks_feature_store_flight_school_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_pipeline_stages_monotone_and_lazy(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    p0 = CorpusPipeline(docs)
    p1 = p0.filter_language("en", "es")
    p2 = p1.filter_quality(0.3)
    p3 = p2.filter_repetition(0.9)
    p4 = p3.dedup_exact(prefix=120)
    p5 = p4.dedup_near(jaccard=0.8)
    counts = [p.df.count() for p in (p0, p1, p2, p3, p4, p5)]
    assert counts[0] > 0
    for before, after in zip(counts, counts[1:]):
        assert after <= before
    assert counts[5] < counts[0]  # something was actually filtered

    # stages are pure plan transforms: each step returns a NEW pipeline and
    # never mutates the input (frozen dataclass, lazy DataFrame)
    assert p0.df.count() == counts[0]


def test_pipeline_dedup_near_drops_larger_id(spark, sf_dir):
    """From each near-dup pair the LARGER id must be dropped and the smaller
    kept — parity with the raw shingle-join operator."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D

    docs = _docs(spark, sf_dir)
    pairs = D.shingle_pairs_jaccard(docs, "doc_id", "text", k=3, threshold=0.8)
    losers = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    keepers = {r["id_a"] for r in pairs.select("id_a").distinct().collect()} - losers
    assert losers, "fixture needs at least one near-dup pair"

    surviving = {
        r["doc_id"]
        for r in CorpusPipeline(docs).dedup_near(jaccard=0.8).df.select("doc_id").collect()
    }
    assert losers.isdisjoint(surviving)
    assert keepers <= surviving


def test_pipeline_decontaminate_removes_overlaps(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    clean = CorpusPipeline(train).decontaminate(bench, k=4).df
    # contaminated docs (known from q_benchmark_contamination semantics) gone
    from databricks_feature_store_flight_school_spark.plans.catalog import query_map

    contaminated = {
        r["doc_id"]
        for r in query_map()["q_benchmark_contamination"](spark, sf_dir).collect()
    }
    surviving = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert contaminated.isdisjoint(surviving)
    assert surviving == {r["doc_id"] for r in train.collect()} - contaminated


def test_pipeline_chunk_covers_every_token(spark, sf_dir):
    """Chunking invariant: with stride <= size, every token position of every
    surviving doc appears in at least one chunk, and chunk token counts are
    bounded by size."""
    docs = _docs(spark, sf_dir).limit(50)
    chunks = CorpusPipeline(docs).chunk(size=64, stride=48)
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_index") * 48 + F.col("n_tokens")).alias("covered"),
            F.max("n_tokens").alias("max_chunk"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(
            docs.select(
                "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens")
            ),
            "doc_id",
        )
    )
    for r in agg.collect():
        assert r["max_chunk"] <= 64
        assert r["covered"] == r["n_tokens"]  # last chunk reaches the end


def test_pipeline_round5_stages(spark, sf_dir):
    """Round-5 stages: readability band is row-local and monotone;
    sample_mixture hits per-source targets within the threshold tolerance
    and drops unweighted sources; filter_lm_score keeps high-probability
    documents and its survivor set is a subset of the input."""
    docs = load_table(spark, sf_dir, "documents")
    p = CorpusPipeline(docs)

    n0 = docs.count()
    banded = p.filter_readability(-50, 130)
    assert banded.df.count() <= n0

    weights = {"src0": 2.0, "src1": 1.0}
    mixed = p.sample_mixture(weights)
    got = {r["source"]: r["n"] for r in
           mixed.df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(weights)  # unweighted sources dropped
    avail = {r["source"]: r["n"] for r in
             docs.where(F.col("source").isin(*weights)).groupBy("source")
             .agg(F.count("*").alias("n")).collect()}
    # proportions approximately 2:1 (md5-threshold selection is binomial
    # around the exact target; tolerate sampling noise at fixture size)
    assert got["src0"] <= avail["src0"] and got["src1"] <= avail["src1"]
    assert got["src0"] > got["src1"]

    scored = p.filter_lm_score(min_avg_logprob=-20.0)
    ids = {r["doc_id"] for r in scored.df.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids and len(ids) > 0

    # determinism: same pipeline twice -> same survivors
    ids2 = {r["doc_id"] for r in p.sample_mixture(weights).df.select("doc_id").collect()}
    ids1 = {r["doc_id"] for r in mixed.df.select("doc_id").collect()}
    assert ids1 == ids2
