"""Scalable edit-distance self-join (fuzzy entity matching).

The naive record-linkage shape — block on an attribute, compare all pairs in
a block with ``levenshtein`` — is quadratic in block size: a 6-value
blocking key over a 200k-row table is ~3.3e9 string comparisons, and worse,
Catalyst runs a broadcast self-join's probe side inside the (single-task,
single-row-group) scan.  The sf1 replica sweep caught exactly that plan
sitting on one core for ~20 minutes.

:func:`edit_distance_join` implements the PassJoin segment-signature scheme
(Li, Deng, Feng — "PassJoin: A Partition-based Method for Similarity Joins",
VLDB 2012; the pigeonhole idea is public folklore): split every string into
``k+1`` contiguous segments — an edit script with at most ``k`` operations
cannot touch all of them, so two strings within distance ``k`` must share at
least one segment EXACTLY, at a position shifted by at most ``k`` and with
source length within ``k``.  Candidates therefore come from an equi-join on
``(block, source_len, segment_index, segment_text)`` — a normal shuffled
hash join with tiny groups — and only candidates pay a ``levenshtein``
verify.  Exact (no false negatives): the segment filter is a necessary
condition, and every candidate is verified.

Emission cost is bounded: (k+1) index rows and (k+1)·(2k+1)² probe rows per
string (k=2 -> 3 and 75); at 100 TB both sides shuffle on high-cardinality
segment text, so no single reducer sees a quadratic block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .skew import salted_join


def _seg_bounds(length_col, i, nseg: int):
    """(start, len) Column pair of segment ``i`` (int or Column) when a
    string of ``length_col`` chars is split into ``nseg`` even segments
    (earlier segments take the remainder) — 1-based start for
    ``substring``."""
    i_col = F.lit(i) if isinstance(i, int) else i
    base = (length_col / nseg).cast("int")
    rem = length_col - base * nseg
    # start of segment i = i*base + min(i, rem); len = base + (1 if i < rem)
    start = i_col * base + F.least(i_col, rem)
    seg_len = base + F.when(i_col < rem, 1).otherwise(0)
    return start + 1, seg_len


def edit_distance_join(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_cols: str | list[str] | None = None,
    k: int = 2,
    salt: int = 32,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(name_a, name_b) <= k``
    (within the same ``block_cols`` values, if given).

    Returns columns ``key_a, key_b, name_a, name_b, edit_dist``.  Strings
    shorter than ``k+1`` chars cannot be segmented into k+1 non-empty parts;
    they fall back to a block+length-band join (bounded: at most 2k+1
    lengths of tiny strings per block).

    ``salt`` spreads the candidate join's hot segment keys over that many
    shuffle partitions (see the salted-join note below); the probe side is
    replicated ``salt``× in shuffle volume, so the default (32, tuned for
    the sf10 part-name distribution, where 8 adjective prefixes dominate
    the first segment) is worth dialing DOWN for small or high-entropy
    inputs — ``salt=1`` is a plain unsalted equi-join."""
    blocks = (
        [block_cols] if isinstance(block_cols, str) else list(block_cols or [])
    )
    nseg = k + 1
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        F.length(name_col).alias("__len"),
        *blocks,
    )
    long_side = base.where(F.col("__len") >= nseg)

    # index: one row per (string, segment) — ONE scan, the nseg segment
    # structs generated in-flight by a single explode (a unionByName of
    # nseg projections would re-scan the source per branch)
    idx_structs = []
    for i in range(nseg):
        start, seg_len = _seg_bounds(F.col("__len"), i, nseg)
        idx_structs.append(
            F.struct(
                F.lit(i).alias("__seg"),
                F.substring(F.col("__name"), start, seg_len).alias("__txt"),
            )
        )
    idx = long_side.select(
        *blocks,
        F.col("__len").alias("__ls"),
        F.col("__id").alias("__id_a"),
        F.explode(F.array(*idx_structs)).alias("__e"),
    ).select(
        *blocks, "__ls", "__id_a",
        F.col("__e.__seg").alias("__seg"), F.col("__e.__txt").alias("__txt"),
    )

    # probe: for each assumed source length ls = len+e and shift d, the
    # substring that an ls-length match's segment i would align to — one
    # scan + a (k+1)(2k+1)² integer explode, with the window substring
    # computed from COLUMN arithmetic on the exploded combo id.  (A
    # struct-array explode of all 75 precomputed substrings blows the
    # whole-stage-codegen method past the JVM's 64KB limit and silently
    # drops the stage to interpreted mode — observed via the
    # CodeGenerator ERROR in the sf0.01 sweep.)  A distinct runs BEFORE
    # the join: different (e, d) combos often produce the same probe
    # substring, which would multiply the join fan-out.
    n_combo = nseg * (2 * k + 1) * (2 * k + 1)
    combo = F.col("__combo")
    seg_i = F.floor(combo / ((2 * k + 1) * (2 * k + 1))).cast("int")
    e_off = (F.floor(combo / (2 * k + 1)) % (2 * k + 1)).cast("int") - k
    d_off = (combo % (2 * k + 1)).cast("int") - k
    ls = F.col("__len") + e_off
    start, seg_len = _seg_bounds(ls, seg_i, nseg)
    probe = (
        long_side.select(
            *blocks,
            F.col("__id").alias("__id_b"),
            "__name", "__len",
            F.explode(F.sequence(F.lit(0), F.lit(n_combo - 1))).alias("__combo"),
        )
        .select(
            *blocks, "__id_b",
            ls.alias("__ls"),
            seg_i.alias("__seg"),
            F.substring(F.col("__name"), start + d_off, seg_len).alias("__txt"),
        )
        .where(F.col("__ls") >= nseg)
        .distinct()
    )

    # candidates carry IDS ONLY through the dedup shuffle (16-byte rows);
    # names re-attach afterwards by key — at candidate cardinality the
    # string payload is the dominant shuffle cost, and the re-attach joins
    # are linear (AQE broadcasts the name table while it is small).
    # The join itself is SALTED (skew.salted_join: index side salted,
    # probe side replicated): segment text is low-entropy on real name
    # distributions (at sf10, 8 adjective prefixes dominate the first
    # segment), so a handful of (block, len, seg, txt) keys produce most
    # of the candidate OUTPUT — skew that AQE's skew split cannot touch,
    # because it splits by INPUT partition size and these inputs are tiny
    # (measured: 3/32 tasks busy for the whole candidate stage at sf10
    # unsalted; evenly spread salted).
    cand = (
        salted_join(idx, probe, on=blocks + ["__ls", "__seg", "__txt"], salt=salt)
        .where(F.col("__id_a") < F.col("__id_b"))
        .select(
            F.col("__id_a").alias("key_a"),
            F.col("__id_b").alias("key_b"),
        )
        .distinct()
    )

    # tiny strings: plain block + length-band candidates (against ALL rows,
    # so short-long pairs are covered too; a blockless call gets a constant
    # block — tiny strings are <= k chars, a bounded population)
    short_side = base.where(F.col("__len") < nseg)
    tiny_blocks = blocks or ["__blk"]
    if not blocks:
        short_side = short_side.withColumn("__blk", F.lit(0))
        base = base.withColumn("__blk", F.lit(0))
    s_a = short_side.select(
        *tiny_blocks,
        F.col("__id").alias("key_a"),
        F.col("__len").alias("__la"),
    )
    s_b = base.select(
        *tiny_blocks,
        F.col("__id").alias("key_b"),
        F.col("__len").alias("__lb"),
    )
    tiny = (
        s_a.join(s_b, on=tiny_blocks)
        .where(
            (F.col("key_a") != F.col("key_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= k)
        )
        .select(
            F.least("key_a", "key_b").alias("key_a"),
            F.greatest("key_a", "key_b").alias("key_b"),
        )
        .distinct()
    )
    cand = cand.unionByName(tiny)

    # re-attach names by key and verify — the only stage that carries
    # strings, and it carries them once per CANDIDATE PAIR, post-dedup
    names_a = base.select(
        F.col("__id").alias("key_a"), F.col("__name").alias("name_a")
    )
    names_b = base.select(
        F.col("__id").alias("key_b"), F.col("__name").alias("name_b")
    )
    return (
        cand.join(names_a, "key_a")
        .join(names_b, "key_b")
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= k)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )
