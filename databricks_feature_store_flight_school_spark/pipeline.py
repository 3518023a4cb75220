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


    # -- round-5 stages ------------------------------------------------------

    def filter_readability(
        self, min_score: float = -100.0, max_score: float = 150.0
    ) -> "CorpusPipeline":
        """Keep documents inside a Flesch reading-ease band (both tails of
        readability correlate with boilerplate/gibberish).  Row-local scan
        expression like the other filters."""
        s = T.flesch_score(self.text_col)
        return replace(
            self, df=self.df.where((s >= min_score) & (s <= max_score))
        )

    def sample_mixture(
        self, weights: dict[str, float], source_col: str = "source"
    ) -> "CorpusPipeline":
        """Rebalance the corpus toward target source proportions — the
        largest subset achievable at exactly ``weights`` proportions without
        upsampling (sources absent from ``weights`` are dropped), selected
        deterministically by md5 THRESHOLD per document (the q_source_mixture
        plan as a pipeline stage: a narrow map over a |sources|-row broadcast
        plan; no per-source window or sort)."""
        spark = self.df.sparkSession
        wdf = spark.createDataFrame(
            [(k, float(v)) for k, v in weights.items()], f"{source_col} string, __w double"
        )
        cnt = (
            self.df.groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .join(wdf, source_col)
            .localCheckpoint(eager=False)  # one corpus scan for all 3 uses
        )
        tot = cnt.agg(F.sum("__w").alias("__tw"))
        with_tw = cnt.crossJoin(F.broadcast(tot))
        feasible = with_tw.agg(
            F.floor(F.min(F.col("__n") * F.col("__tw") / F.col("__w"))).alias("__f")
        )
        rated = (
            with_tw.crossJoin(F.broadcast(feasible))
            .withColumn(
                "__rate",
                F.floor((F.col("__w") / F.col("__tw")) * F.col("__f")).cast("bigint")
                / F.col("__n"),
            )
            .select(source_col, "__rate")
        )
        thresh = F.lower(
            F.lpad(
                F.hex(F.floor(F.col("__rate") * F.lit(281474976710656.0)).cast("bigint")),
                12,
                "0",
            )
        )
        kept = (
            self.df.join(F.broadcast(rated), source_col)
            .where(
                (F.col("__rate") >= 1.0)
                | (
                    F.substring(F.md5(F.col(self.id_col).cast("string")), 1, 12)
                    < thresh
                )
            )
            .drop("__rate")
        )
        return replace(self, df=kept)

    def filter_lm_score(self, min_avg_logprob: float) -> "CorpusPipeline":
        """Drop documents scoring below ``min_avg_logprob`` under a bigram
        LM trained on THIS corpus (add-1 smoothing) — the CCNet-style
        perplexity-proxy filter as a pipeline stage.  Heavier than the
        row-local filters (n-gram count joins), so order it after them."""
        docs = self.df.select(self.id_col, T.tokens(self.text_col).alias("__w"))
        bi = docs.select(
            self.id_col,
            F.explode(
                F.expr(
                    "transform(slice(__w, 1, size(__w) - 1),"
                    " (x, i) -> struct(x AS w1, element_at(__w, i + 2) AS w2))"
                )
            ).alias("__b"),
        ).select(self.id_col, "__b.w1", "__b.w2")
        uni = (
            docs.select(F.explode("__w").alias("w1"))
            .groupBy("w1")
            .agg(F.count(F.lit(1)).alias("__cu"))
        )
        vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
        cbi = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__cb"))
        scores = (
            bi.join(cbi, ["w1", "w2"])
            .join(uni, "w1")
            .crossJoin(F.broadcast(vocab))
            .groupBy(self.id_col)
            .agg(
                F.avg(
                    F.log((F.col("__cb") + 1.0) / (F.col("__cu") + F.col("__v")))
                ).alias("__lp")
            )
        )
        keep = scores.where(F.col("__lp") >= min_avg_logprob).select(self.id_col)
        return replace(
            self, df=self.df.join(keep, on=self.id_col, how="left_semi")
        )
