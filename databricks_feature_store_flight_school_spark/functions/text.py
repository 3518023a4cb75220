"""Text-analysis column expressions for the ``documents`` table
(SURVEY.md §2.12 LLM-pipeline extensions: language-ID, quality scoring,
token counting, fingerprinting).

Everything here is a pure Column expression (JVM-side, whole-stage codegen) —
no Python UDFs in the text hot path.  At 100 TB these run inside the parquet
scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Marker stopwords per language, ordered dict: tie-break = first language
# listed (the SQL oracle replicates the same >= chain).  Deliberately tiny —
# a real deployment swaps in bigger lexicons; the *mechanism* (marker-hit
# scoring, deterministic argmax) is what the engine provides.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "los", "una", "que"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "les", "des", "est", "une"),
}

#: BPE-ish tokenisation: word pieces OR single non-space punctuation.
#: Same regex runs under Java (Spark) and DuckDB's RE2-style engine.
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenisation of trimmed text.  Splits on the LITERAL single
    space: the documents fixture is single-space separated (pinned by
    tests/test_operators.py::test_documents_fixture_single_space_invariant),
    and the literal split keeps Spark/DuckDB twins bit-aligned.  Text from
    outside the fixture contract (tabs/newlines/runs of spaces) would yield
    empty-string "words" that inflate counts — normalize with
    ``regexp_replace(col, r'\\s+', ' ')`` first for such corpora."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Regex token count (word pieces + punctuation), the BPE-ish proxy."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def punct_count(col: Column | str) -> Column:
    """Number of .,!?;: characters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def avg_word_len(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda acc, x: acc + x
    )
    return total / F.size(t)


def stopword_count(col: Column | str, words: tuple[str, ...]) -> Column:
    t = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    in_list = lambda w: w.isin(*words)  # noqa: E731
    return F.size(F.filter(t, in_list))


def quality_score(col: Column | str, n_chars: Column | str = None) -> Column:
    """Heuristic doc quality in [0,1]: rewards mid-length docs, penalises
    punctuation soup and one-char tokens — the shape of production quality
    filters (length/punct/stopword ratios), deterministic and SQL-twin-able."""
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c).cast("double")
    tok = token_count(c).cast("double")
    len_component = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(length, F.lit(1.0))
    short_tok_ratio = (
        F.size(F.filter(tokens(c), lambda w: F.length(w) <= 1)).cast("double")
        / F.greatest(tok, F.lit(1.0))
    )
    return (
        F.lit(0.5) * len_component
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(short_tok_ratio * 5, F.lit(1.0)))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    return {lang: stopword_count(col, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column | str, default: str = "unknown") -> Column:
    """Deterministic argmax over marker scores: the when-chain picks the
    FIRST language (LANG_MARKERS order) whose score >= every later score —
    i.e. the lowest-index maximum; all-zero scores -> ``default``.  The SQL
    oracle spells out the identical CASE chain."""
    scores = lang_scores(col)
    langs = list(scores)
    expr = None
    for i, li in enumerate(langs):
        cond = scores[li] > 0
        for lj in langs[i + 1:]:
            cond = cond & (scores[li] >= scores[lj])
        expr = F.when(cond, F.lit(li)) if expr is None else expr.when(cond, F.lit(li))
    return expr.otherwise(F.lit(default))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams as an array<string> (dedup unit).

    The token array is let-bound by wrapping it in a 1-element array and
    ``transform``-ing over it: lambda variables are evaluated once per row,
    whereas a free ``tokens(col)`` expression inside the shingle lambda is
    re-evaluated (re-split!) for every element access — measured 5x slower
    at sf0.1."""

    def _shingles(t: Column) -> Column:
        # guard against < k tokens (sequence(0, negative) would descend)
        grams = F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - k),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_distinct(grams)

    return F.element_at(F.transform(F.array(tokens(col)), _shingles), 1)


def rolling_fingerprint(col: Column | str, k: int = 3) -> Column:
    """Document fingerprint: min of 64-bit hashes over word k-gram shingles
    (a 1-permutation MinHash / winnowing-lite).  Equal fingerprints flag
    near-identical content at shingle granularity."""
    grams = word_shingles(col, k)
    hashes = F.transform(grams, lambda s: F.xxhash64(s))
    return F.array_min(hashes)


def md5_fingerprint_words(words: Column, k: int = 3, hex_len: int = 16) -> Column:
    """Portable fingerprint over a PRE-TOKENIZED array<string> column: min
    over word k-gram shingles of the first ``hex_len`` md5 hex chars
    (lexicographic min on hex strings == numeric min on the hash prefix).
    md5 is identical across engines, so this is DuckDB-oracle-checkable;
    null when the document has fewer than k tokens.

    Takes the words array, not raw text, deliberately: higher-order-function
    lambdas re-evaluate free expressions per element, so ``element_at(split(
    text), i)`` re-splits the document for every shingle word (measured 5x
    slower at sf0.1).  Callers bind the split once in a prior projection —
    CollapseProject keeps expensive multiply-referenced aliases materialized.
    Skips word_shingles' array_distinct too (a min over duplicates is the
    same min)."""
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())
    hashes = F.transform(grams, lambda s: F.substring(F.md5(s), 1, hex_len))
    return F.array_min(hashes)


def md5_fingerprint(col: Column | str, k: int = 3, hex_len: int = 16) -> Column:
    """Convenience form of md5_fingerprint_words over raw text.  Fine for
    ad-hoc use; hot paths should tokenize in a prior projection and call
    md5_fingerprint_words (see its docstring for why)."""
    return md5_fingerprint_words(tokens(col), k=k, hex_len=hex_len)


# --- Gopher-style rule signals (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1) ---------
# Every signal is a pure Column expression so the rule pass runs inside the
# parquet scan stage; the SQL twins compute the identical arithmetic.

#: stopword list for the "contains common words" rule (deliberately small —
#: the rule mechanism, not the lexicon, is the engine deliverable)
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "with", "to")

#: rule thresholds: (min_words, max_words, min_mean_wl, max_mean_wl,
#: min_stopword_fraction, max_word_len)
GOPHER_BOUNDS = {
    "min_words": 10,
    "max_words": 120,
    "min_mean_wl": 2.5,
    "max_mean_wl": 6.5,
    "min_stop_frac": 0.05,
    "max_word_len": 8,
}


def mean_word_len(col: Column | str) -> Column:
    """Exact mean word length for single-space-separated text, computed
    arithmetically — total chars minus the (n-1) separators, over the word
    count — so the Spark and DuckDB twins agree bit-for-bit with no
    higher-order-function evaluation in the scan."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    wc = F.size(F.split(c, " "))
    return (F.length(c) - wc + 1).cast("double") / wc


def max_word_len(col: Column | str) -> Column:
    return F.array_max(F.transform(tokens(col), F.length))


def stopword_fraction(
    col: Column | str, words: tuple[str, ...] = GOPHER_STOPWORDS
) -> Column:
    return stopword_count(col, words).cast("double") / token_count(col)


# --- PII redaction ----------------------------------------------------------
# Ordering is defensive, not load-bearing, for the CURRENT patterns: the
# phone class \b\d{3}-\d{4}\b cannot match any substring of a well-formed
# SSN (the 2-digit middle group blocks it; verified empirically).  SSN is
# still listed first so a future broader phone pattern (e.g. optional area
# code) cannot silently claim SSN tails.  Patterns are RE2-safe (no
# backrefs/lookaround) so the Java (Spark) and RE2 (DuckDB oracle) engines
# agree.

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{4}\b", "[PHONE]"),
)


def pii_hits(col: Column | str, pattern: str) -> Column:
    """Occurrence count of one PII pattern (pre-redaction audit metric)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def redact_pii(col: Column | str) -> Column:
    """Chain-replace every PII_PATTERNS class with its placeholder tag.
    regexp_replace is global in both Spark and (with the 'g' flag the oracle
    passes) DuckDB, so multiplicity survives the twin check."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, tag)
    return c


def sentence_count(col: Column | str) -> Column:
    """Terminal-punctuation-run count, floored at 1 (readability denominators)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), 0)), F.lit(1))


def syllable_count(col: Column | str) -> Column:
    """Vowel-group syllable proxy (the standard cheap estimator)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[aeiouy]+"), 0))


def flesch_score(col: Column | str) -> Column:
    """Flesch reading ease: 206.835 - 1.015 w/s - 84.6 syl/w (pure Column
    regexp arithmetic; mirrored by the q_text_readability oracle)."""
    words = F.size(tokens(col))
    return (
        F.lit(206.835)
        - 1.015 * words / sentence_count(col)
        - 84.6 * syllable_count(col) / F.greatest(words, F.lit(1))
    )
