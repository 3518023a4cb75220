"""Document-table queries: text analysis, exact + near dedup
(SURVEY.md §2.12 LLM-pipeline extensions over ``documents``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as T
from ..operators import dedup as D
from ..sources import load_table
from .catalog import register


@register(
    "q_text_stats",
    """
    SELECT doc_id,
           length(text) AS char_count,
           len(string_split(trim(text), ' ')) AS token_count,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count,
           round(list_sum(list_transform(string_split(trim(text), ' '), w -> length(w)))
                 * 1.0 / len(string_split(trim(text), ' ')), 6) AS avg_word_len
    FROM documents
    """,
    "text",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document length/token/punctuation statistics — all JVM Column
    expressions inside the scan stage (no shuffle, no Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("char_count"),
        T.token_count("text").alias("token_count"),
        T.punct_count("text").alias("punct_count"),
        F.round(T.avg_word_len("text"), 6).alias("avg_word_len"),
    )


@register(
    "q_bpe_token_count",
    r"""
    SELECT len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
           count(*) AS doc_count,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
    "text", "tokens",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-ish) token counting, aggregated into a histogram."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(T.bpe_token_count("text").alias("bpe_tokens"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("bpe_tokens")
    )


@register(
    "q_lang_quality",
    """
    SELECT lang,
           source,
           count(*) AS doc_count,
           round(avg(length(text)), 6) AS avg_chars,
           round(avg(
             0.5 * least(length(text) / 500.0, 1.0)
             + 0.25 * (1.0 - least(((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                                    * 1.0 / greatest(length(text), 1)) * 10, 1.0))
             + 0.25 * (1.0 - least((len(list_filter(string_split(trim(text), ' '), w -> length(w) <= 1))
                                    * 1.0 / greatest(len(string_split(trim(text), ' ')), 1)) * 5, 1.0))
           ), 6) AS avg_quality
    FROM documents
    GROUP BY lang, source
    """,
    "text", "quality",
)
def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/punct/short-token components) aggregated per
    (lang, source) — the corpus-curation filter in aggregate form."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
            F.round(F.avg(T.quality_score("text")), 6).alias("avg_quality"),
        )
    )


def _lang_score_sql(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(lower(trim(text)), ' '), w -> w IN ({in_list})))"
    )


_S = {lang: _lang_score_sql(words) for lang, words in T.LANG_MARKERS.items()}

@register(
    "q_lang_id",
    f"""
    SELECT predicted_lang, lang, count(*) AS doc_count
    FROM (
      SELECT lang,
             CASE
               WHEN {_S['en']} > 0 AND {_S['en']} >= {_S['es']} AND {_S['en']} >= {_S['de']} AND {_S['en']} >= {_S['fr']} THEN 'en'
               WHEN {_S['es']} > 0 AND {_S['es']} >= {_S['de']} AND {_S['es']} >= {_S['fr']} THEN 'es'
               WHEN {_S['de']} > 0 AND {_S['de']} >= {_S['fr']} THEN 'de'
               WHEN {_S['fr']} > 0 THEN 'fr'
               ELSE 'unknown'
             END AS predicted_lang
      FROM documents
    )
    GROUP BY 1, 2
    """,
    "text", "langid",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker language-ID confusion counts vs the labelled lang column.
    The oracle spells out the identical first-max CASE chain."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id("text").alias("predicted_lang"))
        .groupBy("predicted_lang", "lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


@register(
    "q_exact_dedup",
    """
    SELECT substr(trim(text), 1, 120) AS prefix_key,
           min(doc_id) AS keep_doc_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    "text", "dedup",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a derived key (120-char prefix) with deterministic
    keep-first — the hash-groupBy dedup shape (dropDuplicates is the same
    plan minus the deterministic winner)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.withColumn("prefix_key", F.substring(F.trim(F.col("text")), 1, 120))
    return D.exact_dedup(keyed, ["prefix_key"], "doc_id").select(
        "prefix_key",
        F.col("doc_id").alias("keep_doc_id"),
        "dup_count",
    )


@register(
    "q_content_hash_dedup",
    """
    SELECT doc_id, sha256(text) AS content_hash
    FROM (
      SELECT doc_id, text,
             row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    """,
    "text", "dedup", "hash",
)
def q_content_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2-256 content-hash dedup, keep min doc_id per digest.  The digest
    column doubles as a byte-exact parity check of Spark sha2 vs DuckDB
    sha256 across every document."""
    docs = load_table(spark, sf_dir, "documents")
    return D.content_hash_dedup(docs, "text", "doc_id").select("doc_id", "content_hash")


@register(
    "q_ngram_jaccard_neardup",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    sh0 AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
            FROM w, LATERAL (SELECT unnest(range(1, greatest(len(words) - 1, 1))) AS i)),
    sh AS (SELECT doc_id, shingle FROM sh0
           QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b, intersection,
           round(intersection * 1.0 / (sa.n + sb.n - intersection), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE intersection * 1.0 / (sa.n + sb.n - intersection) >= 0.8
    """,
    "text", "dedup", "neardup",
)
def q_ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard >= 0.8, via the shingle
    self-join (only shingle-sharing pairs materialise — never all-pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.shingle_pairs_jaccard(docs, "doc_id", "text", k=3, threshold=0.8)
    return pairs.select(
        "id_a", "id_b", "intersection", F.round("jaccard", 6).alias("jaccard")
    )


@register(
    "q_minhash_lsh_neardup",
    None,  # xxhash64-seeded MinHash has no DuckDB twin -> rows-only
    "text", "dedup", "neardup", "rows-only",
    pinned_by=("test_minhash_lsh_finds_identical_pair", "test_minhash_lsh_neardup_recall"),
)
def q_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidates, verified by exact Jaccard >= 0.5.
    The LSH stage is the 100 TB path: candidates come from band-bucket joins,
    not an all-pairs comparison.  Declared rows-only (Spark-specific hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE pinned distinct-shingle table feeds both arms (r14): the MinHash
    # signatures and the exact-verify Jaccard previously each re-derived
    # the corpus explode+distinct — signatures are bit-identical over the
    # distinct set (min is idempotent under duplicates)
    sh = D.distinct_shingles(docs, "doc_id", "text", k=3)
    cands = D.minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingles=sh
    )
    exact = D.shingle_pairs_jaccard(
        docs, "doc_id", "text", k=3, threshold=0.5, shingles=sh
    )
    return (
        cands.join(exact, ["id_a", "id_b"])
        .select("id_a", "id_b", F.round("est_similarity", 6).alias("est_similarity"),
                F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@register(
    "q_incremental_dedup_exact",
    """
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         inc AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text
           FROM corpus WHERE doc_id % 7 = 1
           UNION ALL
           SELECT doc_id + 3000000 AS doc_id, text
           FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
         ),
         selfd AS (
           SELECT doc_id, text,
                  row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           FROM inc)
    SELECT s.doc_id
    FROM selfd s
    WHERE s.rn = 1
      AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = s.text)
    ORDER BY s.doc_id
    """,
    "text", "dedup", "incremental",
)
def q_incremental_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup, exact layers only (near-dup disabled):
    an increment of fresh docs + replayed corpus docs + a double-ingested
    fresh subset is deduped against the corpus INDEX (content hashes — the
    corpus text is never re-read).  Replays are rejected by the cross
    anti-join, the double-ingest by the within-batch keep-min-id window;
    the oracle states the same thing over raw text equality (sha2-256
    equality == text equality absent collisions)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    inc = (
        docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
        .unionAll(
            corpus.where(F.col("doc_id") % 7 == 1)
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
        .unionAll(
            docs.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 5 == 0))
            .select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
        )
    )
    index = D.build_dedup_index(corpus, "doc_id", "text")
    accepted, _ = D.incremental_dedup(inc, index, "doc_id", "text", threshold=None)
    return accepted.select("doc_id").orderBy("doc_id")


@register(
    "q_incremental_dedup",
    None,  # near-dup layer decides on xxhash64 MinHash estimates -> rows-only
    "text", "dedup", "incremental", "neardup", "rows-only",
    pinned_by=(
        "test_incremental_dedup_layers_and_idempotence",
        "test_incremental_dedup_matches_exact_twin_when_near_disabled",
    ),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL incremental ingestion dedup: the q_incremental_dedup_exact
    increment plus PERTURBED corpus replays (two words appended — exact
    hashes differ, shingle overlap stays high), deduped against the corpus
    index with the near-dup layer on (threshold 0.7).  The perturbed
    replays are caught by the banded-LSH candidates + signature-estimate
    verify without ever reading the corpus text; fresh docs pass."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    inc = (
        docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
        .unionAll(
            corpus.where(F.col("doc_id") % 7 == 1)
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
        .unionAll(
            corpus.where(F.col("doc_id") % 7 == 2)
            .select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zq wv")).alias("text"),
            )
        )
    )
    index = D.build_dedup_index(corpus, "doc_id", "text")
    accepted, _ = D.incremental_dedup(inc, index, "doc_id", "text", threshold=0.7)
    return accepted.select("doc_id").orderBy("doc_id")


@register(
    "q_simhash_neardup",
    None,  # xxhash64-based SimHash -> rows-only
    "text", "dedup", "neardup", "rows-only",
    pinned_by=("test_simhash_similar_docs_close",),
)
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) signatures for every document plus the fingerprint
    (1-perm MinHash) — the per-doc signature table near-dup pipelines join
    against; pairs at small Hamming distance are near-dups."""
    docs = load_table(spark, sf_dir, "documents")
    sims = D.simhash_df(docs, "doc_id", "text")
    fp = docs.select("doc_id", T.rolling_fingerprint("text").alias("fingerprint"))
    return sims.join(fp, "doc_id").orderBy("doc_id")


@register(
    "q_doc_fingerprint",
    """
    SELECT doc_id,
           CASE WHEN len(words) >= 3 THEN
               list_min(list_transform(
                   generate_series(1, len(words) - 2),
                   i -> substr(md5(concat_ws(' ', words[i], words[i+1], words[i+2])), 1, 16)))
           END AS fingerprint,
           greatest(len(words) - 2, 0) AS shingle_count
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents)
    """,
    "text", "fingerprint",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (rolling-hash family): 1-permutation MinHash
    over word 3-gram shingles, md5-prefix variant so the oracle can replay
    the exact hash.  Pure Column expressions — runs inside the scan stage;
    the split is bound once in a prior projection (lambdas re-evaluate free
    expressions per element, so inlining it costs 5x)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", T.tokens("text").alias("words"))
    return words.select(
        "doc_id",
        T.md5_fingerprint_words(F.col("words")).alias("fingerprint"),
        F.greatest(F.size("words") - 2, F.lit(0)).alias("shingle_count"),
    )


@register(
    "q_corpus_clean_pipeline",
    """
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             length(text) AS char_count,
             0.5 * least(length(text) / 500.0, 1.0)
             + 0.25 * (1.0 - least(((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                                    * 1.0 / greatest(length(text), 1)) * 10, 1.0))
             + 0.25 * (1.0 - least((len(list_filter(string_split(trim(text), ' '), w -> length(w) <= 1))
                                    * 1.0 / greatest(len(string_split(trim(text), ' ')), 1)) * 5, 1.0))
               AS quality
      FROM documents
      WHERE lang IN ('en', 'es')),
    survivors AS (
      SELECT min(doc_id) AS doc_id
      FROM scored
      WHERE quality >= 0.3
      GROUP BY substr(trim(text), 1, 120))
    SELECT s.lang,
           count(*) AS kept_docs,
           round(avg(s.quality), 6) AS avg_quality,
           sum(s.char_count)::BIGINT AS total_chars
    FROM survivors d JOIN scored s ON s.doc_id = d.doc_id
    GROUP BY s.lang
    ORDER BY s.lang
    """,
    "text", "pipeline", "dedup", "quality",
)
def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-corpus cleaning pipeline: language filter -> quality
    floor -> exact dedup (120-char-prefix key, keep min doc_id) -> per-lang
    corpus stats.  Every stage is the engine's own operator; the oracle
    re-derives the identical pipeline relationally.  One shuffle for the
    dedup, one for the final small agg; filters run inside the scan."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("lang").isin("en", "es"))
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        F.length("text").alias("char_count"),
        T.quality_score("text").alias("quality"),
    ).where(F.col("quality") >= 0.3)
    keyed = scored.withColumn(
        "prefix_key", F.substring(F.trim(F.col("text")), 1, 120)
    )
    survivors = D.exact_dedup(keyed, ["prefix_key"], "doc_id").select("doc_id")
    deduped = scored.join(survivors, on="doc_id", how="left_semi")
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.sum("char_count").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q_sentence_split_udtf",
    """
    SELECT doc_id,
           CAST(i - 1 AS INT) AS sentence_idx,
           trim(parts[i]) AS sentence,
           CAST(len(string_split(trim(parts[i]), ' ')) AS INT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
         LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i)
    WHERE length(trim(parts[i])) > 0
    """,
    "text", "udtf",
)
def q_sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) fan-out: per-document sentence rows via
    DataFrame.lateralJoin — the U-surface family the pandas UDFs don't
    cover.  The oracle replays the split relationally."""
    from ..functions.udtfs import SentenceSplit

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.lateralJoin(SentenceSplit(F.col("text").outer())).select(
        "doc_id", "sentence_idx", "sentence", "n_tokens"
    )


@register(
    "q_dedup_components",
    """
    WITH RECURSIVE
    w0 AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    sh1 AS (SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
            FROM w0, LATERAL (SELECT unnest(range(1, greatest(len(words) - 1, 1))) AS i)),
    sh AS (SELECT doc_id, shingle FROM sh1
           QUALIFY count(*) OVER (PARTITION BY shingle) <= 1000),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    jacc AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             FROM sh a JOIN sh b USING (shingle)
             WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    jedges AS (SELECT id_a, id_b FROM jacc
               JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
               WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
    pedges AS (SELECT min(doc_id) OVER (PARTITION BY substr(trim(text), 1, 120)) AS id_a,
                      doc_id AS id_b
               FROM documents
               QUALIFY id_a <> id_b),
    sym AS (SELECT id_a AS a, id_b AS b FROM jedges
            UNION SELECT id_b, id_a FROM jedges
            UNION SELECT id_a, id_b FROM pedges
            UNION SELECT id_b, id_a FROM pedges),
    walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.a, w.label FROM walk w JOIN sym s ON s.b = w.node
    )
    SELECT node AS doc_id, min(label) AS component,
           (node = min(label)) AS is_canonical
    FROM walk GROUP BY node
    """,
    "text", "dedup", "components",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERING: near-dup pairs (word-3-gram Jaccard >= 0.8) plus
    exact 120-char-prefix duplicates form an edge list; connected components
    (iterative min-label propagation, operators/components.py) assign one
    canonical doc per duplicate cluster; singletons are their own component.
    The oracle replays the same graph with a recursive CTE — the declarative
    twin of the iterative DataFrame loop."""
    from ..operators.components import connected_components
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    jedges = D.shingle_pairs_jaccard(docs, "doc_id", "text", k=3, threshold=0.8).select(
        "id_a", "id_b"
    )
    wprefix = Window.partitionBy(F.substring(F.trim(F.col("text")), 1, 120))
    pedges = (
        docs.select(
            F.min("doc_id").over(wprefix).alias("id_a"), F.col("doc_id").alias("id_b")
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    comp = connected_components(jedges.union(pedges), src="id_a", dst="id_b")
    return (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            (F.col("doc_id") == F.coalesce("component", "doc_id")).alias("is_canonical"),
        )
    )


@register(
    "q_tfidf_top_terms",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, term, tf, df,
           round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS tfidf,
           rank
    FROM (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, n.n,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC
               ) AS rank
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    WHERE rank <= 3
    """,
    "text", "tfidf",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic corpus-weighting step of
    an LLM-data pipeline (keyword extraction / doc signatures).

    Plan shape: one explode + (doc, term) count, a term-keyed doc-frequency
    aggregate REUSED from the tf result (no second corpus scan), the corpus
    size as a 1-row broadcast cross join, and a per-doc top-k window.  Ranking
    is by the integer pair (tf DESC, df ASC, term) — the same ordering
    tfidf induces for a fixed corpus, but immune to cross-engine float
    last-ulp differences; the float tfidf score is still computed and
    emitted by both engines, rounded at 6."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
            "rank",
        )
    )


@register(
    "q_vocab_stats",
    """
    SELECT term,
           count(*) AS tf_total,
           count(DISTINCT doc_id) AS doc_freq
    FROM (
        SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS term
        FROM documents
    )
    WHERE term <> ''
    GROUP BY term
    ORDER BY tf_total DESC, term
    LIMIT 50
    """,
    "text", "vocab",
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: total term frequency + document frequency for the
    top-50 terms (the vocabulary-building pass of tokenizer training).  One
    explode, one term-keyed aggregate with map-side partial counts; the
    distinct doc count rides the same shuffle via count(DISTINCT).  Ties in
    tf_total break on the term itself, so the LIMIT is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    ).where(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf_total"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("tf_total").desc(), "term")
        .limit(50)
    )


@register(
    "q_stratified_sample",
    """
    SELECT source,
           count(*) AS sampled_docs,
           round(avg(n_chars), 6) AS avg_chars,
           min(doc_id) AS first_doc
    FROM documents
    WHERE doc_id % 10 = 3
    GROUP BY source
    ORDER BY source
    """,
    "text", "sampling",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% systematic sample (doc_id mod bucket) with per-source
    stratum statistics — the reproducible-sampling primitive for corpus
    inspection and eval-set carving.  Unlike TABLESAMPLE/rand(), the mod
    predicate is a pushable deterministic filter: it reaches the parquet scan
    and the sample is identical on every engine and every run."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") % 10 == 3)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


@register(
    "q_heavy_hitters",
    """
    WITH toks AS (
        SELECT unnest(string_split(trim(lower(text)), ' ')) AS term
        FROM documents
    ),
    counts AS (
        SELECT term, count(*) AS occurrences
        FROM toks WHERE term <> '' GROUP BY term
    ),
    total AS (SELECT sum(occurrences) AS n FROM counts)
    SELECT term, occurrences,
           round(occurrences * 100.0 / n, 6) AS pct_of_corpus
    FROM counts CROSS JOIN total
    WHERE occurrences * 50 > n
    ORDER BY occurrences DESC, term
    """,
    "text", "heavy-hitters",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters: tokens exceeding 1/50th of all token occurrences
    (the stopword-discovery / vocabulary-pruning pass).  One explode + one
    term-keyed count with map-side combine; the corpus total is a 1-row
    broadcast.  This is the exactness baseline that
    tests/test_operators.py pins Spark's single-pass approximate
    ``stat.freqItems`` sketch against (every exact hitter must appear in the
    sketch's candidate set — the classic no-false-negative guarantee)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    ).where(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("occurrences"))
    total = counts.agg(F.sum("occurrences").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("occurrences") * 50 > F.col("n"))
        .select(
            "term",
            "occurrences",
            F.round(F.col("occurrences") * 100.0 / F.col("n"), 6).alias(
                "pct_of_corpus"
            ),
        )
        .orderBy(F.col("occurrences").desc(), "term")
    )


@register(
    "q_doc_chunking",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents)
    SELECT doc_id,
           i AS chunk_index,
           least(64, len(words) - i * 48) AS n_tokens,
           md5(array_to_string(list_slice(words, i * 48 + 1, i * 48 + 64), ' ')) AS chunk_md5
    FROM w, LATERAL (SELECT unnest(range(0, (len(words) - 1) // 48 + 1)) AS i)
    WHERE len(words) > 0
    """,
    "text", "chunking",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: 64-token windows with stride 48 (16-token
    overlap), one output row per chunk with an md5 over the joined tokens.
    Pure Column expressions — split once, ``sequence`` of chunk starts,
    posexplode, ``slice``; the fan-out is a narrow map (no shuffle), which is
    what lets a 100 TB corpus chunk at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    with_starts = docs.select(
        "doc_id",
        toks.alias("words"),
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(48))
        ).alias("chunk_index", "start"),
    ).where(F.size(F.col("words")) > 0)
    chunk = F.slice(F.col("words"), F.col("start") + 1, 64)
    return with_starts.select(
        "doc_id",
        "chunk_index",
        F.least(F.lit(64), F.size("words") - F.col("start")).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register(
    "q_repetition_score",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    sh AS (SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS g
           FROM w, LATERAL (SELECT unnest(range(1, greatest(len(words) - 1, 1))) AS i)
           WHERE len(words) >= 3)
    SELECT doc_id,
           count(*) AS total_3grams,
           count(DISTINCT g) AS distinct_3grams,
           round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS repetition
    FROM sh
    GROUP BY doc_id
    """,
    "text", "quality",
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repetition quality signal: the fraction of a document's word
    3-grams that are repeats of an earlier 3-gram in the SAME document
    (1 - distinct/total).  All per-row array expressions — the only shuffle
    is none at all: totals and distincts come from ``size`` /
    ``array_distinct`` on the let-bound shingle array, never a groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    # let-bind the token array (same trick as word_shingles) so the lambda
    # does not re-split the document per element
    all_grams = F.flatten(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.size(t) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                    F.element_at(t, i + 3),
                ),
            ),
        )
    )
    base = docs.where(F.size(toks) >= 3).select("doc_id", all_grams.alias("grams"))
    total = F.size("grams")
    distinct = F.size(F.array_distinct("grams"))
    return base.select(
        "doc_id",
        total.cast("long").alias("total_3grams"),
        distinct.cast("long").alias("distinct_3grams"),
        F.round(1.0 - distinct * F.lit(1.0) / total, 6).alias("repetition"),
    )


@register(
    "q_benchmark_contamination",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
                  || words[i+3] AS g
           FROM w, LATERAL (SELECT unnest(range(1, greatest(len(words) - 2, 1))) AS i)
           WHERE len(words) >= 4),
    bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 50 = 0)
    SELECT sh.doc_id, count(*) AS contaminated_4grams
    FROM sh JOIN bench USING (g)
    WHERE sh.doc_id % 50 <> 0
    GROUP BY sh.doc_id
    """,
    "text", "contamination", "dedup",
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (the decontamination pass every serious
    training corpus runs): count each training document's distinct word
    4-grams that also appear in the held-out set (here: every 50th doc).
    The benchmark n-gram set is dimension-sized and BROADCAST; the corpus
    side explodes shingles in a narrow map, so the only shuffle is the final
    per-doc count — contamination checking at 100 TB is a broadcast join,
    not a corpus self-join."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.where(T.token_count("text") >= 4).select(
        "doc_id", F.explode(T.word_shingles("text", 4)).alias("g")
    )
    bench = sh.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    return (
        sh.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_4grams"))
    )


_GW = ", ".join(f"'{w}'" for w in T.GOPHER_STOPWORDS)
_GB = T.GOPHER_BOUNDS

@register(
    "q_gopher_quality_rules",
    f"""
    SELECT source,
           count(*) AS total_docs,
           sum(CASE WHEN wc < {_GB['min_words']} OR wc > {_GB['max_words']}
                    THEN 1 ELSE 0 END)::BIGINT AS fail_word_count,
           sum(CASE WHEN mwl < {_GB['min_mean_wl']} OR mwl > {_GB['max_mean_wl']}
                    THEN 1 ELSE 0 END)::BIGINT AS fail_mean_word_len,
           sum(CASE WHEN stop_frac < {_GB['min_stop_frac']}
                    THEN 1 ELSE 0 END)::BIGINT AS fail_stopwords,
           sum(CASE WHEN maxw > {_GB['max_word_len']}
                    THEN 1 ELSE 0 END)::BIGINT AS fail_max_word,
           sum(CASE WHEN wc BETWEEN {_GB['min_words']} AND {_GB['max_words']}
                     AND mwl BETWEEN {_GB['min_mean_wl']} AND {_GB['max_mean_wl']}
                     AND stop_frac >= {_GB['min_stop_frac']}
                     AND maxw <= {_GB['max_word_len']}
                    THEN 1 ELSE 0 END)::BIGINT AS pass_all
    FROM (
      SELECT source,
             wc,
             (length(t) - wc + 1)::DOUBLE / wc AS mwl,
             len(list_filter(words, w -> lower(w) IN ({_GW})))::DOUBLE / wc AS stop_frac,
             list_aggregate(list_transform(words, w -> length(w)), 'max') AS maxw
      FROM (SELECT source, trim(text) AS t,
                   string_split(trim(text), ' ') AS words,
                   len(string_split(trim(text), ' ')) AS wc
            FROM documents)
    )
    GROUP BY source
    ORDER BY source
    """,
    "text", "quality", "gopher",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-filter rules (word-count bounds, mean-word-length
    band, stopword-presence floor, max-word-length cap) as pure Column
    arithmetic, aggregated to per-source failure counts.  At 100 TB every
    signal evaluates inside the parquet scan stage — the only shuffle is the
    tiny per-source rollup.  Thresholds live in functions/text.py
    GOPHER_BOUNDS so the engine and the oracle can never drift."""
    docs = load_table(spark, sf_dir, "documents")
    b = T.GOPHER_BOUNDS
    sig = docs.select(
        "source",
        T.token_count("text").alias("wc"),
        T.mean_word_len("text").alias("mwl"),
        T.stopword_fraction("text").alias("stop_frac"),
        T.max_word_len("text").alias("maxw"),
    )
    wc_fail = (F.col("wc") < b["min_words"]) | (F.col("wc") > b["max_words"])
    mwl_fail = (F.col("mwl") < b["min_mean_wl"]) | (F.col("mwl") > b["max_mean_wl"])
    stop_fail = F.col("stop_frac") < b["min_stop_frac"]
    maxw_fail = F.col("maxw") > b["max_word_len"]
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            as_cnt(wc_fail).alias("fail_word_count"),
            as_cnt(mwl_fail).alias("fail_mean_word_len"),
            as_cnt(stop_fail).alias("fail_stopwords"),
            as_cnt(maxw_fail).alias("fail_max_word"),
            as_cnt(~wc_fail & ~mwl_fail & ~stop_fail & ~maxw_fail).alias("pass_all"),
        )
        .orderBy("source")
    )


_PII_SSN, _PII_EMAIL, _PII_PHONE = (p for p, _ in T.PII_PATTERNS)

@register(
    "q_pii_redaction",
    f"""
    SELECT c_mktsegment,
           count(*) AS customers,
           sum(len(regexp_extract_all(raw, '{_PII_SSN}')))::BIGINT AS ssns_found,
           sum(len(regexp_extract_all(raw, '{_PII_EMAIL}')))::BIGINT AS emails_found,
           sum(len(regexp_extract_all(raw, '{_PII_PHONE}')))::BIGINT AS phones_found,
           sum(length(raw) - length(
                 regexp_replace(regexp_replace(regexp_replace(raw,
                   '{_PII_SSN}', '[SSN]', 'g'),
                   '{_PII_EMAIL}', '[EMAIL]', 'g'),
                   '{_PII_PHONE}', '[PHONE]', 'g')))::BIGINT AS chars_removed
    FROM (
      SELECT c_mktsegment,
             'user' || CAST(c_custkey AS VARCHAR) || '@mail.example.com call 555-'
               || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')
               || CASE WHEN c_custkey % 2 = 0 THEN ' ssn '
                  || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-'
                  || lpad(CAST((c_custkey * 3) % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
               || CASE WHEN c_custkey % 3 = 0 THEN ' alt 555-9999' ELSE '' END AS raw
      FROM customer
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    "text", "pii", "redaction",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit — the redaction pass every training corpus runs
    before the tokenizer.  The synthetic contact strings are constructed
    identically on both sides (the testdata corpus contains no real PII, so
    the query builds a deterministic one from customer keys) and carry all
    THREE PII classes — an SSN segment on even keys exercises the full
    replacement chain, not just email+phone — then functions/text.py
    redact_pii chain-replaces SSN/email/phone classes.  Pure regexp Column
    expressions — scan-stage work, one tiny rollup."""
    c = load_table(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("user"),
        F.col("c_custkey").cast("string"),
        F.lit("@mail.example.com call 555-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad(((F.col("c_custkey") * 3) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(" alt 555-9999")).otherwise(F.lit("")),
    )
    base = c.select("c_mktsegment", raw.alias("raw"))
    return (
        base.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(T.pii_hits("raw", _PII_SSN)).alias("ssns_found"),
            F.sum(T.pii_hits("raw", _PII_EMAIL)).alias("emails_found"),
            F.sum(T.pii_hits("raw", _PII_PHONE)).alias("phones_found"),
            F.sum(F.length("raw") - F.length(T.redact_pii("raw"))).alias("chars_removed"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_duplicate_passages",
    """
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    toks AS (SELECT doc_id, unnest(words) AS word,
                    generate_subscripts(words, 1) AS pos
             FROM w),
    sh AS (
        SELECT doc_id, pos,
               word || ' ' || lead(word, 1) OVER dw || ' '
                    || lead(word, 2) OVER dw || ' ' || lead(word, 3) OVER dw
                   AS shingle
        FROM toks WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)
    ),
    matches AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pos_a, b.pos AS pos_b
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE a.shingle IS NOT NULL
    ),
    islands AS (
        SELECT doc_a, doc_b, pos_a, pos_b,
               pos_a - row_number() OVER (
                   PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
               ) AS island
        FROM matches
    ),
    spans AS (
        SELECT doc_a, doc_b,
               CAST(count(*) + 3 AS BIGINT) AS span_tokens
        FROM islands
        GROUP BY doc_a, doc_b, pos_a - pos_b, island
    )
    SELECT span_tokens,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(count(DISTINCT (doc_a, doc_b)) AS BIGINT) AS n_doc_pairs
    FROM spans
    GROUP BY span_tokens
    ORDER BY span_tokens
    """,
    "text", "dedup", "llm-pipeline",
)
def q_duplicate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-PASSAGE detection: maximal runs of >= 4 consecutive
    shared tokens between document pairs — the substring-level dedup from
    'Deduplicating Training Data Makes Language Models Better' (Lee et al.
    2022), re-expressed relationally instead of via a suffix array:

    1. 4-token shingles per position (lead window over one doc_id shuffle —
       null-PROPAGATING concat, so tail positions drop out on both engines);
    2. equi-join on the shingle string pairs up every shared 4-gram;
    3. matches on the same (doc_a, doc_b) DIAGONAL (pos_a - pos_b constant)
       with consecutive positions are one passage: gaps-and-islands over the
       diagonal merges them into maximal spans (span_tokens = run + 3).

    100 TB posture: the only fan-out is the shingle equi-join; a production
    corpus adds the document-frequency guard the n-gram Jaccard join already
    ships (operators/dedup.py — drop shingles whose posting list exceeds a
    cap) to bound the worst bucket; everything else is windows over narrow
    (doc, pos) rows.  The fixture's closed vocabulary makes cross-doc
    4-gram collisions common enough to exercise every stage (~1.6k matches
    at sf0.01).

    OUTPUT is the span-length PROFILE (span_tokens, n_spans, n_doc_pairs) —
    bounded at any corpus — not the span table: the round-10 full sf10
    sweep collected >1 GiB of span rows into the compare gate
    (maxResultSize), the same output-cardinality lesson that reshaped
    q_fuzzy_part_match in round 9 ("every duplicated passage" is a dataset,
    not an answer).  Pair-level consumers stream
    operators/dedup.duplicate_passage_spans into a sink instead of
    collecting; the profile pins the same computation (every span's length
    lands in exactly one bucket on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    spans = D.duplicate_passage_spans(d, "doc_id", "text", k=4)
    return (
        spans.groupBy("span_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc_a", "doc_b").alias("n_doc_pairs"),
        )
        .orderBy("span_tokens")
    )


@register(
    "q_term_pmi",
    """
    WITH dt AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS term
        FROM documents
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM dt),
    df AS (
        SELECT term, count(*) AS df FROM dt GROUP BY term
        HAVING count(*) >= greatest(100, ceil(0.002 * (SELECT n_docs FROM n)))
    ),
    pairs AS (
        SELECT a.term AS term_a, b.term AS term_b,
               fa.df AS df_a, fb.df AS df_b, count(*) AS n_both
        FROM dt a
        JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        JOIN df fa ON fa.term = a.term
        JOIN df fb ON fb.term = b.term
        GROUP BY a.term, b.term, fa.df, fb.df
    ),
    scored AS (
        SELECT term_a, term_b, n_both,
               ln((n_both * 1.0 / n_docs)
                  / ((df_a * 1.0 / n_docs) * (df_b * 1.0 / n_docs))) AS pmi_raw
        FROM pairs CROSS JOIN n
    )
    SELECT term_a, term_b, n_both, round(pmi_raw, 6) AS pmi, rank
    FROM (SELECT *, row_number() OVER (ORDER BY pmi_raw DESC, term_a, term_b) AS rank
          FROM scored)
    WHERE rank <= 20
    """,
    "text", "cooccurrence", "llm-pipeline",
)
def q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between frequent terms at document
    granularity — the co-occurrence statistic behind phrase mining and
    word-association features: PMI = ln(P(a,b) / (P(a)·P(b))) with
    probabilities estimated as document frequencies.  The distinct
    (doc, term) explode happens ONCE; the vocab filter bounds the pair join
    the same way blocking bounds record linkage.  The threshold is
    RELATIVE — ``df >= max(100, 0.002·n_docs)`` — so the broadcast vocab is
    heavy-hitter bounded at ANY corpus size: Σ df ≤ Σ distinct-terms-per-
    doc, hence |{terms: df ≥ f·N}| ≤ avg_distinct_per_doc / f, a constant
    independent of N (an absolute ``df >= 100`` would admit Heaps-law vocab
    growth and turn the broadcast into an OOM at 100 TB).  No result change
    at the shipped SFs (0.002·N ≤ 100 through sf1).  Corpus size and dfs
    broadcast back as 1-row/heavy-hitter joins; top-20 by PMI.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(T.tokens("text"))).alias("term")
    ).distinct()
    # corpus size folded INTO the plan (1-row broadcast), not an eager
    # driver .count() — no extra job at query-build time
    n_docs_df = dt.agg(F.countDistinct("doc_id").alias("__n_docs"))
    df_tbl = (
        dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs_df))
        .where(
            F.col("df")
            >= F.greatest(F.lit(100), F.ceil(F.col("__n_docs") * F.lit(0.002)))
        )
        .drop("__n_docs")
    )
    a = dt.select("doc_id", F.col("term").alias("term_a"))
    b = dt.select("doc_id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .join(F.broadcast(df_tbl.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))), "term_a")
        .join(F.broadcast(df_tbl.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))), "term_b")
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    nd = F.col("__n_docs").cast("double")
    pmi = F.log(
        (F.col("n_both") / nd) / ((F.col("df_a") / nd) * (F.col("df_b") / nd))
    )
    w = Window.orderBy(F.col("pmi_raw").desc(), "term_a", "term_b")
    return (
        pairs.crossJoin(F.broadcast(n_docs_df))
        .withColumn("pmi_raw", pmi)
        .drop("__n_docs")
        .orderBy(F.col("pmi_raw").desc(), "term_a", "term_b")
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select("term_a", "term_b", "n_both", F.round("pmi_raw", 6).alias("pmi"), "rank")
    )


@register(
    "q_bigram_lm_score",
    """
    WITH docs AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
               unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
        FROM docs
    ),
    uni AS (
        SELECT w1, count(*) AS c_uni
        FROM (SELECT unnest(w) AS w1 FROM docs) GROUP BY w1
    ),
    vocab AS (SELECT count(*) AS v FROM uni),
    cbi AS (SELECT w1, w2, count(*) AS c_bi FROM bi GROUP BY 1, 2),
    scored AS (
        SELECT bi.doc_id,
               ln((c_bi + 1.0) / (c_uni + v)) AS lp
        FROM bi
        JOIN cbi USING (w1, w2)
        JOIN uni USING (w1)
        CROSS JOIN vocab
    )
    SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "text", "lm", "ngram",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring: every document scored
    by its average add-1-smoothed log P(w2|w1) under counts estimated from
    the corpus itself — the perplexity-proxy quality filter (low-probability
    documents are gibberish/boilerplate candidates; cf. CCNet's LM filter,
    here with the engine as its own LM).

    Shapes: bigram explode is one narrow pass (index transform over the
    token array, no self-join); bigram/unigram count tables join back on
    their n-gram keys (plain shuffle joins — vocabulary-sized, never
    broadcast blindly); vocab size folds in as a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", T.tokens("text").alias("w"))
    bi = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    uni = (
        docs.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    cbi = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    scored = (
        bi.join(cbi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c_bi") + 1.0) / (F.col("c_uni") + F.col("v"))).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_source_mixture",
    """
    WITH cnt AS (
        SELECT source, count(*) AS n_available,
               CAST(substr(source, 4) AS INT) % 4 + 1 AS w
        FROM documents GROUP BY source
    ),
    tw AS (SELECT sum(w) AS tot_w FROM cnt),
    f AS (
        SELECT floor(min(n_available * 1.0 * tot_w / w)) AS feasible
        FROM cnt, tw
    ),
    plan AS (
        SELECT source, n_available,
               CAST(floor((w * 1.0 / tot_w) * feasible) AS BIGINT) AS target_n
        FROM cnt, tw, f
    ),
    rated AS (
        SELECT source, n_available, target_n,
               target_n * 1.0 / n_available AS rate
        FROM plan
    ),
    sel AS (
        SELECT d.source, d.n_chars
        FROM documents d JOIN rated p ON p.source = d.source
        WHERE p.rate >= 1.0
           OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12) <
              lower(lpad(hex(CAST(floor(p.rate * 281474976710656.0) AS BIGINT)), 12, '0'))
    )
    SELECT r.source, r.n_available, r.target_n,
           count(s.n_chars) AS n_selected,
           CAST(coalesce(sum(s.n_chars), 0) AS BIGINT) AS chars_selected
    FROM rated r LEFT JOIN sel s ON s.source = r.source
    GROUP BY r.source, r.n_available, r.target_n
    ORDER BY r.source
    """,
    "text", "sampling", "mixture",
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing at target proportions — the training-mixture planner:
    given per-source weights (here derived 1..4 from the source id), find
    the LARGEST corpus achievable at exactly those proportions without
    upsampling (feasible = min over sources of n_s / p_s), floor each
    source's target, and select deterministically by md5 THRESHOLD —
    accept doc iff the first 12 hex chars of md5(doc_id) fall under the
    per-source rate threshold.

    The threshold form is the 100 TB path: selection is a narrow map over
    the fact scan joined to a 20-row broadcast plan (no per-source window,
    no sort — a per-source top-N-by-hash would funnel each source through
    one task).  The mixture plan itself (counts, weights, feasible total)
    is a |sources|-row computation folded in-plan.  Deterministic on both
    engines: md5 of the same key string, same double threshold."""
    d = load_table(spark, sf_dir, "documents")
    # the |sources|-row counts frame feeds THREE downstream derivations
    # (tot_w, feasible, rates); a lazy checkpoint pins one materialisation
    # so the corpus is scanned once, not once per reference
    cnt = (
        d.groupBy("source").agg(F.count(F.lit(1)).alias("n_available"))
        .withColumn("w", F.substring("source", 4, 10).cast("int") % 4 + 1)
        .localCheckpoint(eager=False)
    )
    tw = cnt.agg(F.sum("w").alias("tot_w"))
    with_tw = cnt.crossJoin(F.broadcast(tw))
    f = with_tw.agg(
        F.floor(
            F.min(F.col("n_available") * F.col("tot_w") / F.col("w"))
        ).alias("feasible")
    )
    rated = (
        with_tw.crossJoin(F.broadcast(f))
        .withColumn(
            "target_n",
            F.floor((F.col("w") / F.col("tot_w")) * F.col("feasible")).cast("bigint"),
        )
        .withColumn("rate", F.col("target_n") / F.col("n_available"))
        .select("source", "n_available", "target_n", "rate")
    )
    thresh = F.lower(
        F.lpad(
            F.hex(F.floor(F.col("rate") * F.lit(281474976710656.0)).cast("bigint")),
            12,
            "0",
        )
    )
    sel = (
        d.join(F.broadcast(rated), "source")
        .where(
            (F.col("rate") >= 1.0)
            | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12) < thresh)
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_chars").cast("bigint").alias("chars_selected"),
        )
    )
    return (
        rated.join(sel, "source", "left")
        .select(
            "source",
            "n_available",
            "target_n",
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            F.coalesce("chars_selected", F.lit(0)).alias("chars_selected"),
        )
        .orderBy("source")
    )


@register(
    "q_text_readability",
    r"""
    WITH t AS (
        SELECT doc_id,
               len(string_split(trim(text), ' ')) AS words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
        FROM documents
    )
    SELECT doc_id, words, sentences, syllables,
           round(206.835 - 1.015 * words * 1.0 / sentences
                         - 84.6 * syllables * 1.0 / greatest(words, 1), 6)
               AS flesch_score
    FROM t
    ORDER BY doc_id
    """,
    "text", "quality", "readability",
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring with a vowel-group syllable proxy — the
    readability axis of corpus quality filtering (too-hard and too-trivial
    documents both correlate with boilerplate).  Pure Column regexp
    arithmetic inside the scan stage; the identical RE2-safe patterns run
    on both engines."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(T.tokens("text")).alias("words"),
        T.sentence_count("text").alias("sentences"),
        T.syllable_count("text").alias("syllables"),
        F.round(T.flesch_score("text"), 6).alias("flesch_score"),
    ).orderBy("doc_id")


@register(
    "q_zipf_fit",
    """
    WITH tf AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
        GROUP BY w
    ),
    ranked AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, w) AS rnk
        FROM tf
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(freq), ln(rnk)), 6) AS zipf_slope,
           round(regr_r2(ln(freq), ln(rnk)), 6) AS r_squared
    FROM ranked
    """,
    "text", "stats", "zipf",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: log-log OLS slope of term frequency against frequency
    rank (natural corpora slope toward -1; strong deviation flags synthetic
    or templated text — a corpus forensics check).  The vocabulary rank is
    VOCAB-cardinality (millions of terms at corpus scale), so it comes from
    operators/ranks.global_row_number, and the fit itself is one
    regr_slope/regr_r2 reduction — never a collected frequency table."""
    from ..operators.ranks import global_row_number

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(T.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_row_number(
        tf, [F.col("freq").desc(), F.col("w")], rank_col="rnk"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 6).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rnk")), 6).alias("r_squared"),
    )


_DSIR_BUCKETS = 64


@register(
    "q_dsir_selection",
    f"""
    WITH tok2 AS (
        SELECT doc_id, source, lang,
               ('0x' || substr(md5(term), 1, 4))::INT % {_DSIR_BUCKETS} AS b
        FROM (
            SELECT doc_id, source, lang,
                   unnest(string_split(trim(lower(text)), ' ')) AS term
            FROM documents
        )
        WHERE term <> ''
    ),
    tgt AS (SELECT b, count(*) AS c FROM tok2 WHERE source = 'src0' GROUP BY b),
    rawc AS (SELECT b, count(*) AS c FROM tok2 WHERE source <> 'src0' GROUP BY b),
    tt AS (SELECT sum(c) AS tot FROM tgt),
    rt AS (SELECT sum(c) AS tot FROM rawc),
    lr AS (
        SELECT g.b,
               ln((coalesce(t.c, 0) + 1) / (tt.tot + {_DSIR_BUCKETS}.0))
             - ln((coalesce(r.c, 0) + 1) / (rt.tot + {_DSIR_BUCKETS}.0)) AS lr
        FROM generate_series(0, {_DSIR_BUCKETS - 1}) AS g(b)
        LEFT JOIN tgt t ON t.b = g.b
        LEFT JOIN rawc r ON r.b = g.b, tt, rt
    ),
    w AS (
        SELECT k.doc_id, any_value(k.source) AS source, any_value(k.lang) AS lang,
               sum(lr.lr) AS logw
        FROM tok2 k JOIN lr ON lr.b = k.b
        WHERE k.source <> 'src0'
        GROUP BY k.doc_id
    ),
    sc AS (
        SELECT doc_id, source, lang, logw,
               logw + (-ln(-ln(
                   (('0x' || substr(md5('g:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0))) AS score
        FROM w
    )
    SELECT doc_id, source, lang,
           round(logw, 6) AS logw, round(score, 6) AS sel_score
    FROM sc ORDER BY score DESC, doc_id LIMIT 50
    """,
    "text", "data-selection", "dsir", "sampling",
)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): pick raw-pool documents whose hashed
    n-gram distribution matches a target corpus.  Target = src0 docs, raw
    pool = everything else; features are hashed UNIGRAM buckets
    (md5(term) mod 64); each candidate's log importance weight is the sum of
    per-bucket log-ratios log p_tgt(b)/p_raw(b) (add-1 smoothing), and the
    selection is Gumbel-top-k — the exact DSIR sampling-without-replacement
    trick, made DETERMINISTIC by drawing each doc's Gumbel from
    md5('g:'||doc_id) (catalog convention, cf. q_bootstrap_ci).

    Scale shape: one token explode feeding map-side-combined bucket counts
    (the shuffle carries B=64 cells per partition per side); the bucket
    log-ratio table is B rows, BROADCAST into the token stream; per-doc
    weights are one doc-keyed aggregate; Gumbel-top-k lowers to
    TakeOrderedAndProject (no global sort).  Nothing scales with corpus
    size except the two narrow passes over the tokens."""
    B = _DSIR_BUCKETS
    docs = load_table(spark, sf_dir, "documents")
    tok2 = (
        docs.select(
            "doc_id", "source", "lang",
            F.explode(T.tokens(F.lower(F.col("text")))).alias("term"),
        )
        .where(F.col("term") != "")
        .withColumn(
            "b",
            (F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("int") % B),
        )
        .drop("term")
    )
    tgt = tok2.where(F.col("source") == "src0").groupBy("b").agg(
        F.count(F.lit(1)).alias("tc")
    )
    rawc = tok2.where(F.col("source") != "src0").groupBy("b").agg(
        F.count(F.lit(1)).alias("rc")
    )
    tt = tgt.agg(F.sum("tc").alias("t_tot"))
    rt = rawc.agg(F.sum("rc").alias("r_tot"))
    lr = (
        spark.range(B).select(F.col("id").cast("int").alias("b"))
        .join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(rawc), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1) / (F.col("t_tot") + B))
                - F.log((F.coalesce(F.col("rc"), F.lit(0)) + 1) / (F.col("r_tot") + B))
            ).alias("lr"),
        )
    )
    w = (
        tok2.where(F.col("source") != "src0")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.first("lang").alias("lang"),
            F.sum("lr").alias("logw"),
        )
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    sc = w.withColumn("score", F.col("logw") + (-F.log(-F.log(u))))
    return (
        sc.orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
        .select(
            "doc_id", "source", "lang",
            F.round("logw", 6).alias("logw"),
            F.round("score", 6).alias("sel_score"),
        )
    )


@register(
    "q_weighted_sample_per_source",
    """
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln(n_chars) + (-ln(-ln(
                   (('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0))) AS g
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars, g,
               row_number() OVER (PARTITION BY source
                                  ORDER BY g DESC, doc_id) AS rn
        FROM keyed
    )
    SELECT source, doc_id, n_chars, round(g, 6) AS gumbel_key
    FROM ranked WHERE rn <= 3
    """,
    "text", "sampling", "weighted",
)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, 3 docs per source, inclusion
    probability proportional to document length — the Efraimidis-Spirakis
    exponential-keys scheme in its Gumbel form: key = ln(weight) + Gumbel,
    per-group top-k by key.  The Gumbel draw is DETERMINISTIC from
    md5('ws:'||doc_id) (catalog convention, cf. q_dsir_selection), so both
    engines select the identical sample.

    This is the per-source quota subsample of a training-mixture pipeline
    (take k docs per source, longer docs proportionally likelier) done in
    ONE pass: no per-source sort of the corpus — the rank window partitions
    by source, and at 100 TB the k survivors per group could equally ride
    ``top_k_per_group``'s partial-aggregate path.  Contrast
    q_stratified_sample (uniform Bernoulli per stratum, no quota) and
    q_dsir_selection (global quota, distribution-matching weights)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "source", "n_chars",
        (F.log(F.col("n_chars")) + (-F.log(-F.log(u)))).alias("g"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("g").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("source", "doc_id", "n_chars", F.round("g", 6).alias("gumbel_key"))
    )
