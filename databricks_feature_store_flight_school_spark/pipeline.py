"""CorpusPipeline: the LLM-training-data preparation flow as one composable,
lazy facade over the engine's operators.

Each stage returns a NEW pipeline wrapping a transformed (still unexecuted)
DataFrame, so the whole chain stays one Catalyst plan until an action runs —
filters merge into the scan, and nothing materialises between stages unless
you ask for it:

    clean = (
        CorpusPipeline(docs, id_col="doc_id", text_col="text")
        .filter_language("en", "es")
        .filter_quality(0.3)
        .filter_repetition(0.5)
        .dedup_exact(prefix=120)
        .dedup_near(jaccard=0.8)
        .decontaminate(benchmark_docs, k=4)
    )
    chunks = clean.chunk(size=64, stride=48)   # DataFrame of training chunks
    stats  = clean.stats()                     # per-language corpus summary

Stage order is the order that minimises work at 100 TB: row-local filters
(language / quality / repetition — pure scan-stage expressions) run before
anything that shuffles; exact dedup (one key shuffle) runs before near-dup
(shingle join); decontamination's benchmark n-gram set is broadcast.
Reference analog: the feature-engineering flow FS:99-246 composes the same
way over telco columns; this is the documents-table counterpart.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, functions as F

from .functions import text as T
from .operators import dedup as D


@dataclass(frozen=True)
class CorpusPipeline:
    df: DataFrame
    id_col: str = "doc_id"
    text_col: str = "text"

    # -- row-local filters (scan-stage expressions, no shuffle) -------------

    def filter_language(self, *langs: str, lang_col: str = "lang") -> "CorpusPipeline":
        """Keep documents whose language column is in ``langs``."""
        return replace(self, df=self.df.where(F.col(lang_col).isin(*langs)))

    def filter_quality(self, min_quality: float) -> "CorpusPipeline":
        """Keep documents scoring at least ``min_quality`` on the engine's
        length/punctuation/stopword quality heuristic (functions.text)."""
        return replace(
            self, df=self.df.where(T.quality_score(self.text_col) >= min_quality)
        )

    def filter_repetition(self, max_repetition: float) -> "CorpusPipeline":
        """Drop documents whose repeated-3-gram fraction exceeds the cap
        (C4-style repetition signal; 0 = all distinct, 1 = one gram looped)."""
        toks = T.tokens(F.col(self.text_col))
        grams = T.word_shingles(F.col(self.text_col), 3)
        total = F.greatest(F.size(toks) - 2, F.lit(1))
        rep = 1.0 - F.size(grams) / total.cast("double")
        return replace(self, df=self.df.where((F.size(toks) < 3) | (rep <= max_repetition)))

    # -- dedup (shuffling stages) ------------------------------------------

    def dedup_exact(self, prefix: int = 120) -> "CorpusPipeline":
        """Exact dedup on the trimmed ``prefix``-char key; the smallest id in
        each duplicate group survives (one key shuffle)."""
        keyed = self.df.withColumn(
            "__dk", F.substring(F.trim(F.col(self.text_col)), 1, prefix)
        )
        survivors = D.exact_dedup(keyed, ["__dk"], self.id_col).select(self.id_col)
        return replace(
            self, df=self.df.join(survivors, on=self.id_col, how="left_semi")
        )

    def dedup_near(self, jaccard: float = 0.8, k: int = 3) -> "CorpusPipeline":
        """Near-dedup by word-k-gram Jaccard: from every near-dup pair the
        larger id is dropped (shingle-join candidates only — never all-pairs)."""
        pairs = D.shingle_pairs_jaccard(
            self.df, self.id_col, self.text_col, k=k, threshold=jaccard
        )
        losers = pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        return replace(
            self, df=self.df.join(losers, on=self.id_col, how="left_anti")
        )

    def decontaminate(self, benchmark: DataFrame, k: int = 4) -> "CorpusPipeline":
        """Drop documents sharing any word-k-gram with the benchmark corpus
        (held-out eval set).  The benchmark's distinct n-gram set is
        BROADCAST — decontamination is never a corpus self-join."""
        bench_grams = (
            benchmark.select(F.explode(T.word_shingles(self.text_col, k)).alias("g"))
            .distinct()
        )
        contaminated = (
            self.df.select(
                self.id_col, F.explode(T.word_shingles(self.text_col, k)).alias("g")
            )
            .join(F.broadcast(bench_grams), "g")
            .select(self.id_col)
            .distinct()
        )
        return replace(
            self, df=self.df.join(contaminated, on=self.id_col, how="left_anti")
        )

    # -- outputs ------------------------------------------------------------

    def chunk(self, size: int = 64, stride: int = 48) -> DataFrame:
        """Surviving documents as overlapping token-window chunks
        (doc id, chunk_index, n_tokens, chunk_text) — a narrow fan-out map."""
        toks = T.tokens(F.col(self.text_col))
        exploded = self.df.select(
            self.id_col,
            toks.alias("__w"),
            F.posexplode(
                F.sequence(
                    F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
                )
            ).alias("chunk_index", "__start"),
        ).where(F.size("__w") > 0)
        chunk = F.slice(F.col("__w"), F.col("__start") + 1, size)
        return exploded.select(
            self.id_col,
            "chunk_index",
            F.least(F.lit(size), F.size("__w") - F.col("__start")).alias("n_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )

    def stats(self, lang_col: str = "lang") -> DataFrame:
        """Per-language survivor statistics (docs, chars, mean quality)."""
        return (
            self.df.groupBy(lang_col)
            .agg(
                F.count(F.lit(1)).alias("kept_docs"),
                F.sum(F.length(self.text_col)).alias("total_chars"),
                F.round(F.avg(T.quality_score(self.text_col)), 6).alias("avg_quality"),
            )
            .orderBy(lang_col)
        )
