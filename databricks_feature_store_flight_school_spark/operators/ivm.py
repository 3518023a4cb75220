"""Incremental view maintenance for additive aggregates over a change feed.

The 100 TB feature-computation story: a per-entity aggregate feature table
(order counts, total spend, event sums) must NOT be recomputed by rescanning
the fact table every refresh.  SUM/COUNT (and anything built from them —
AVG, rates) are *self-maintainable*: a change-feed row carries everything
needed to adjust the aggregate, so a refresh costs O(|changes|) instead of
O(|facts|).

The algebra (classic IVM, cf. Gupta & Mumick, "Maintenance of Materialized
Views: Problems, Techniques, and Applications", IEEE Data Eng. Bulletin
1995): for each change-feed row,

- the OLD image (update/delete) contributes ``-old_measure`` / count -1 to
  its OLD group,
- the NEW image (update/insert) contributes ``+new_measure`` / count +1 to
  its NEW group.

An update that moves a row between groups therefore adjusts BOTH groups; a
group whose maintained count reaches zero is dropped (it no longer exists
in the recomputed-from-scratch view).  Applying the deltas is one full-outer
join on the group key — |groups-touched| rows, never the fact table.

Input contract: ``changes`` is a change-feed frame in the engine's
``table_changes`` schema — primary keys, ``_change_type`` in
insert/update/delete, and ``old_<c>`` / ``new_<c>`` images for every value
column (featurestore/client.py).  Works unchanged on the frames
``consume_changes`` delivers, including the offset-0 bootstrap (all
inserts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: maintained count column — kept in the aggregate so deletes can retire
#: groups exactly; name chosen to avoid colliding with user measures
COUNT_COL = "_n_rows"


def _cols(group_cols: str | list[str]) -> list[str]:
    return [group_cols] if isinstance(group_cols, str) else list(group_cols)


def join_groups_null_safe(
    left: DataFrame, right: DataFrame, gcols: list[str], how: str
) -> DataFrame:
    """Group-key join with NULL-safe equality (``<=>``).

    A from-scratch ``groupBy`` keeps a NULL-valued group like any other, but
    a plain ``on=gcols`` equi-join silently drops it (inner/semi), fails to
    retire it (anti), or emits it twice unmerged (full_outer) — so every
    state⨝delta recombination in this module must pair keys with
    ``eqNullSafe`` instead.  Right's key columns are renamed ``__r_<g>``
    before the join (the two sides often share lineage — e.g. old/new images
    of one change feed — where bare attribute references are ambiguous);
    semi/anti output is ``left`` verbatim, other joins coalesce the two key
    columns back into a single ``<g>`` (exact under ``<=>``: a pair either
    matched — equal or both NULL — or one side is absent).  Plan shape is
    unchanged: ``<=>`` is still a hash-joinable equality, so this stays a
    co-partitioned shuffle join, not a cross product.
    """
    renamed = right
    for g in gcols:
        renamed = renamed.withColumnRenamed(g, f"__r_{g}")
    cond = None
    for g in gcols:
        piece = F.col(g).eqNullSafe(F.col(f"__r_{g}"))
        cond = piece if cond is None else cond & piece
    out = left.join(renamed, on=cond, how=how)
    if how in ("left_semi", "semi", "left_anti", "anti"):
        return out
    keys = [F.coalesce(F.col(g), F.col(f"__r_{g}")).alias(g) for g in gcols]
    rest = [
        F.col(c)
        for c in out.columns
        if c not in gcols and c not in {f"__r_{g}" for g in gcols}
    ]
    return out.select(*keys, *rest)


def agg_deltas(
    changes: DataFrame, group_cols: str | list[str], measures: dict[str, str]
) -> DataFrame:
    """Per-group additive adjustments from a change-feed frame.

    ``measures`` maps output sum-column name -> base value column (the
    change feed carries it as ``old_<col>`` / ``new_<col>``).  ``group_cols``
    (one or several base value columns) is likewise read from the images.
    Returns one row per touched group: the group columns, ``<out>_delta``
    per measure, ``_n_rows_delta``.

    Null measure values contribute 0 (SQL SUM ignores nulls) but still
    count toward the row count, matching a from-scratch
    ``groupBy().agg(sum, count)``.

    Single-pass (r14, guide §2.3): the old/new image sides explode from ONE
    scan of ``changes`` instead of a union of two selects — ``changes`` is
    usually a full-outer snapshot diff, and the union form executed that
    join twice per delta computation (AQE exchange reuse shares the scan
    shuffles, not the join itself).  Same rows, same group sums.
    """
    gcols = _cols(group_cols)
    old_img = F.struct(
        *[F.col(f"old_{g}").alias(g) for g in gcols],
        *[
            (-F.coalesce(F.col(f"old_{src}"), F.lit(0))).alias(out)
            for out, src in measures.items()
        ],
        F.lit(-1).alias(COUNT_COL),
    )
    new_img = F.struct(
        *[F.col(f"new_{g}").alias(g) for g in gcols],
        *[
            (F.coalesce(F.col(f"new_{src}"), F.lit(0))).alias(out)
            for out, src in measures.items()
        ],
        F.lit(1).alias(COUNT_COL),
    )
    ct = F.col("_change_type")
    imgs = (
        F.when(ct == "update", F.array(old_img, new_img))
        .when(ct == "delete", F.array(old_img))
        .when(ct == "insert", F.array(new_img))
        # unknown change types contributed to neither side in the union
        # form; explode drops the NULL this leaves
    )
    return (
        changes.select(F.explode(imgs).alias("__img"))
        .select("__img.*")
        .groupBy(*gcols)
        .agg(
            *[F.sum(out).alias(f"{out}_delta") for out in measures],
            F.sum(COUNT_COL).alias(f"{COUNT_COL}_delta"),
        )
    )


def apply_deltas(
    agg: DataFrame, deltas: DataFrame, group_cols: str | list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Merge an :func:`agg_deltas` frame into the maintained aggregate.

    One full-outer join on ``group_col`` (co-partitioned shuffle sized by
    |existing groups| + |touched groups|): untouched groups pass through,
    touched groups add their deltas, brand-new groups materialise from the
    delta alone, and groups whose maintained count hits zero are dropped —
    the exact result a from-scratch recompute would produce.
    """
    gcols = _cols(group_cols)
    joined = join_groups_null_safe(agg, deltas, gcols, "full_outer")
    out_cols = [
        (
            F.coalesce(F.col(c), F.lit(0))
            + F.coalesce(F.col(f"{c}_delta"), F.lit(0))
        ).alias(c)
        for c in measure_cols
    ]
    new_count = (
        F.coalesce(F.col(COUNT_COL), F.lit(0))
        + F.coalesce(F.col(f"{COUNT_COL}_delta"), F.lit(0))
    )
    return (
        joined.select(*gcols, *out_cols, new_count.alias(COUNT_COL))
        .where(F.col(COUNT_COL) > 0)
    )


def compute_agg(
    facts: DataFrame, group_cols: str | list[str], measures: dict[str, str]
) -> DataFrame:
    """From-scratch twin of the maintained aggregate (bootstrap + the
    oracle the property test compares against): groupBy + SUM per measure +
    COUNT, same null-as-zero convention as :func:`agg_deltas`."""
    return facts.groupBy(*_cols(group_cols)).agg(
        *[
            F.sum(F.coalesce(F.col(src), F.lit(0))).alias(out)
            for out, src in measures.items()
        ],
        F.count(F.lit(1)).alias(COUNT_COL),
    )


def compute_minmax(
    facts: DataFrame, group_col: str | list[str], measures: dict[str, str],
    agg: str = "min",
) -> DataFrame:
    """From-scratch per-group MIN/MAX twin (bootstrap + property oracle)."""
    f = F.min if agg == "min" else F.max
    return facts.groupBy(*_cols(group_col)).agg(
        *[f(src).alias(out) for out, src in measures.items()]
    )


def apply_minmax(
    maintained: DataFrame,
    changes: DataFrame,
    base_current: DataFrame,
    group_col: str | list[str],
    measures: dict[str, str],
    agg: str = "min",
) -> DataFrame:
    """Maintain per-group MIN/MAX from a change feed.

    MIN/MAX are NOT self-maintainable under deletes (Gupta & Mumick's
    distinction): removing a row only matters if it carried the group's
    current extremum, and then the new extremum is unknowable from the
    change alone.  The classic strategy, implemented here:

    - NEW images (insert/update) fold in for free:
      ``ext' = least/greatest(ext, new_value)``.
    - OLD images (delete/update) mark their OLD group *affected* only when
      the departing value TIES the maintained extremum; affected groups are
      recomputed against ``base_current`` — but only those groups (a
      left-semi join prunes the scan; with partitioning/clustering on the
      group key this reads |affected| partitions, not the table).

    A group that loses its last row routes through the recompute branch
    (its last value was its extremum) and drops out naturally, and a
    brand-new group materialises from its new image alone — so the result
    matches a from-scratch recompute exactly (property-pinned).

    NULL handling (SQL MIN/MAX ignore NULLs): a departing NULL value never
    dislodges a non-null extremum, but a group whose maintained extremum is
    itself NULL (every remaining value is NULL) must route ANY departure
    through the recompute branch — the tie test ``old <= ext`` is NULL
    there, and without the explicit ``ext IS NULL`` arm the group would
    survive as a phantom after its last row is deleted (property-pinned
    with nullable values).
    """
    gcols = _cols(group_col)
    extf = F.min if agg == "min" else F.max
    new_ext = (
        changes.where(F.col("_change_type").isin("insert", "update"))
        .select(
            *[F.col(f"new_{g}").alias(g) for g in gcols],
            *[F.col(f"new_{src}").alias(out) for out, src in measures.items()],
        )
        .groupBy(*gcols)
        .agg(*[extf(out).alias(out) for out in measures])
    )
    old_img = changes.where(
        F.col("_change_type").isin("delete", "update")
    ).select(
        *[F.col(f"old_{g}").alias(g) for g in gcols],
        *[F.col(f"old_{src}").alias(f"__old_{out}") for out, src in measures.items()],
    )
    return _apply_minmax_core(
        maintained, new_ext, old_img, base_current, gcols, measures, agg
    )


def apply_minmax_signed(
    maintained: DataFrame,
    signed: DataFrame,
    base_current: DataFrame,
    group_col: str | list[str],
    measures: dict[str, str],
    agg: str = "min",
) -> DataFrame:
    """MIN/MAX maintenance from a SIGNED relation (the :func:`apply_minmax`
    analog for :func:`join_deltas` output, so extrema over equi-JOIN views
    maintain incrementally too): ``+1`` rows fold in with least/greatest,
    ``-1`` rows whose value ties the maintained extremum — or whose group's
    extremum is NULL — mark the group affected and route it through the
    bounded recompute against ``base_current`` (the CURRENT join).  Same
    exactness and NULL contract as :func:`apply_minmax`; property-pinned
    against a from-scratch recompute of the joined view.

    The signed multiset is NETTED per (group, measure values) first — a
    correctness requirement, not an optimisation: :func:`join_deltas`'
    double-counting-free expansion emits cancelling phantom pairs (a
    fact+dim double update yields ``+(old_fact, new_dim)`` AND
    ``-(old_fact, new_dim)`` — a row the view never contained).  SUM/COUNT
    cancel them in the group sums, but an un-netted phantom ARRIVAL on a
    brand-new group would fold a never-existed value into the extremum
    while its phantom departure finds no maintained row to trigger the
    recompute.  After netting, net>0 values fold in, net<0 values run the
    tie test, net=0 values left the multiset support unchanged and are
    correctly ignored."""
    gcols = _cols(group_col)
    extf = F.min if agg == "min" else F.max
    srcs = sorted({src for src in measures.values()})
    net = signed.groupBy(*gcols, *srcs).agg(F.sum(SIGN_COL).alias("__net"))
    new_ext = (
        net.where(F.col("__net") > 0)
        .select(
            *gcols,
            *[F.col(src).alias(out) for out, src in measures.items()],
        )
        .groupBy(*gcols)
        .agg(*[extf(out).alias(out) for out in measures])
    )
    old_img = net.where(F.col("__net") < 0).select(
        *gcols,
        *[F.col(src).alias(f"__old_{out}") for out, src in measures.items()],
    )
    return _apply_minmax_core(
        maintained, new_ext, old_img, base_current, gcols, measures, agg
    )


def _apply_minmax_core(
    maintained: DataFrame,
    new_ext: DataFrame,
    old_img: DataFrame,
    base_current: DataFrame,
    gcols: list[str],
    measures: dict[str, str],
    agg: str,
) -> DataFrame:
    """Shared tail of the MIN/MAX maintenance rule: affected-group
    detection (tie-or-NULL against the maintained extrema), left-semi
    pruned recompute, and the fold of fresh extrema into untouched
    groups."""
    cmp = F.least if agg == "min" else F.greatest
    hit = None
    for out in measures:
        piece = (
            F.col(f"__old_{out}") <= F.col(out)
            if agg == "min"
            else F.col(f"__old_{out}") >= F.col(out)
        ) | F.col(out).isNull()
        hit = piece if hit is None else hit | piece
    affected = (
        join_groups_null_safe(old_img, maintained, gcols, "inner")
        .where(hit)
        .select(*gcols)
        .distinct()
    )

    recomputed = compute_minmax(
        join_groups_null_safe(base_current, affected, gcols, "left_semi"),
        gcols,
        {out: src for out, src in measures.items()},
        agg,
    )
    untouched = join_groups_null_safe(maintained, affected, gcols, "left_anti")
    fresh = join_groups_null_safe(new_ext, affected, gcols, "left_anti")
    merged = join_groups_null_safe(
        untouched,
        fresh.select(
            *gcols, *[F.col(out).alias(f"__new_{out}") for out in measures]
        ),
        gcols,
        "full_outer",
    ).select(
        *gcols,
        *[cmp(F.col(out), F.col(f"__new_{out}")).alias(out) for out in measures],
    )
    return merged.unionByName(recomputed)


#: signed-relation sign column (±1) used by the join-view delta algebra
SIGN_COL = "_sign"


def signed_changes(changes: DataFrame, key_cols: str | list[str]) -> DataFrame:
    """Change feed -> signed multiset delta: one row per image with
    ``_sign`` -1 (old image of update/delete) or +1 (new image of
    update/insert).  Key columns pass through verbatim (a key never changes
    in place — key churn arrives as delete + insert); every other base
    column is read from its ``old_``/``new_`` image.

    This is the bridge from the engine's CDF schema to the multiset form
    the join rule needs: summing ``_sign`` over any grouping of a signed
    relation gives exactly the count delta of that grouping.

    Single-pass (r14, guide §2.3): both images explode from ONE scan of
    ``changes`` — the union form executed the underlying snapshot diff
    join once per side."""
    keys = _cols(key_cols)
    val_cols = sorted(
        {c[len("old_"):] for c in changes.columns if c.startswith("old_")}
    )
    old_img = F.struct(
        *keys,
        *[F.col(f"old_{c}").alias(c) for c in val_cols],
        F.lit(-1).alias(SIGN_COL),
    )
    new_img = F.struct(
        *keys,
        *[F.col(f"new_{c}").alias(c) for c in val_cols],
        F.lit(1).alias(SIGN_COL),
    )
    ct = F.col("_change_type")
    imgs = (
        F.when(ct == "update", F.array(old_img, new_img))
        .when(ct == "delete", F.array(old_img))
        .when(ct == "insert", F.array(new_img))
    )
    return changes.select(F.explode(imgs).alias("__img")).select("__img.*")


def join_deltas(
    d_left: DataFrame | None,
    right_new: DataFrame,
    left_old: DataFrame,
    d_right: DataFrame | None,
    on: str | list[str],
) -> DataFrame:
    """Signed delta of the equi-join view ``left ⨝ right`` from the two
    sides' signed deltas — Gupta & Mumick's join rule in its double-
    counting-free form:

        Δ(R ⨝ S)  =  ΔR ⨝ S_new  ∪  R_old ⨝ ΔS

    (expanding S_new = S_old + ΔS absorbs the ΔR ⨝ ΔS cross term into the
    first join, so a window where BOTH sides change is handled exactly).
    Pass ``None`` for an unchanged side's delta.  Each term is one equi-join
    shuffling |Δ| against the co-keyed base — never base ⨝ base; non-key
    column names must be disjoint across the two inputs (feature-table
    convention).  The result is a signed relation: feed it to
    :func:`signed_agg_deltas` and then :func:`apply_deltas` to maintain an
    aggregate over the join at O(|changes|) refresh cost."""
    keys = _cols(on)
    parts = []
    if d_left is not None:
        parts.append(d_left.join(right_new, on=keys, how="inner"))
    if d_right is not None:
        parts.append(
            left_old.join(d_right, on=keys, how="inner")
        )
    if not parts:
        raise ValueError("at least one of d_left/d_right must be provided")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=False)
    return out


def signed_agg_deltas(
    signed: DataFrame, group_cols: str | list[str], measures: dict[str, str]
) -> DataFrame:
    """Per-group aggregate adjustments from a signed relation (the
    :func:`agg_deltas` analog for :func:`join_deltas` output): each row
    contributes ``_sign * measure`` (nulls as 0) and ``_sign`` to the row
    count.  Output feeds :func:`apply_deltas` unchanged."""
    gcols = _cols(group_cols)
    return signed.groupBy(*gcols).agg(
        *[
            F.sum(
                F.col(SIGN_COL) * F.coalesce(F.col(src), F.lit(0))
            ).alias(f"{out}_delta")
            for out, src in measures.items()
        ],
        F.sum(SIGN_COL).alias(f"{COUNT_COL}_delta"),
    )


def signed_stats_deltas(
    signed: DataFrame, group_cols: str | list[str], src_cols: list[str]
) -> DataFrame:
    """Moment adjustments (sum, sum of squares, non-null count per measure,
    plus row count) from a signed relation — :func:`stats_deltas` for
    :func:`join_deltas` output, so AVG/VAR/STDDEV views over JOINS maintain
    at the same O(|changes|) cost.  Output feeds :func:`apply_deltas` with
    ``measure_cols=_moment_cols(src_cols)``."""
    gcols = _cols(group_cols)
    aggs = []
    for c in src_cols:
        v = F.col(c).cast("double")
        sign = F.col(SIGN_COL)
        aggs += [
            F.sum(sign * F.coalesce(v, F.lit(0.0))).alias(f"__s_{c}_delta"),
            F.sum(sign * F.coalesce(v * v, F.lit(0.0))).alias(f"__q_{c}_delta"),
            F.sum(F.when(v.isNotNull(), sign).otherwise(F.lit(0))).alias(
                f"__c_{c}_delta"
            ),
        ]
    return signed.groupBy(*gcols).agg(
        *aggs, F.sum(SIGN_COL).alias(f"{COUNT_COL}_delta")
    )


def _moment_cols(src_cols: list[str]) -> list[str]:
    """State columns maintained per source measure column: sum, sum of
    squares, and non-null count (the moments AVG/VAR/STDDEV derive from)."""
    out: list[str] = []
    for c in src_cols:
        out += [f"__s_{c}", f"__q_{c}", f"__c_{c}"]
    return out


def _minmax_cols(aggs: dict[str, tuple[str, str]]) -> dict[str, tuple[str, str]]:
    """Extremum state columns for the MIN/MAX aggregates in an ``aggs``
    spec: ``__mn_<src>`` / ``__mx_<src>`` -> (fn, src).  Shared naming
    between :func:`compute_stats` bootstrap, :func:`apply_minmax`
    maintenance, and :func:`derive_stats` read-out."""
    out: dict[str, tuple[str, str]] = {}
    for _o, (fn, src) in aggs.items():
        if fn in ("min", "max"):
            out[("__mn_" if fn == "min" else "__mx_") + src] = (fn, src)
    return out


def compute_stats(
    facts: DataFrame, group_cols: str | list[str], src_cols: list[str],
    minmax_cols: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """From-scratch moment state for :func:`derive_stats` aggregates
    (bootstrap + the property-test oracle): per group and per measure column
    ``__s_<c>`` = SUM (nulls as 0), ``__q_<c>`` = SUM of squares,
    ``__c_<c>`` = COUNT of non-null values, plus the global ``_n_rows``.

    Moments are maintained in double: one extra additive column per measure
    buys AVG/VAR_SAMP/STDDEV_SAMP maintenance at the same O(|changes|)
    refresh cost as plain SUM/COUNT — the classic self-maintainable
    extension of Gupta & Mumick's algebra to second moments.

    ``minmax_cols`` (state column -> (``min``|``max``, source column))
    optionally rides MIN/MAX extrema in the SAME single-scan groupBy — the
    bootstrap twin of :func:`apply_minmax`'s maintained columns, kept in
    the source column's own type (extrema, unlike moments, are not cast)."""
    aggs = []
    for c in src_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.sum(F.coalesce(v, F.lit(0.0))).alias(f"__s_{c}"),
            F.sum(F.coalesce(v * v, F.lit(0.0))).alias(f"__q_{c}"),
            F.count(v).alias(f"__c_{c}"),
        ]
    for out, (fn, src) in (minmax_cols or {}).items():
        aggs.append((F.min(src) if fn == "min" else F.max(src)).alias(out))
    return facts.groupBy(*_cols(group_cols)).agg(
        *aggs, F.count(F.lit(1)).alias(COUNT_COL)
    )


def stats_deltas(
    changes: DataFrame, group_cols: str | list[str], src_cols: list[str]
) -> DataFrame:
    """Per-group moment adjustments from a change-feed frame — the
    :func:`agg_deltas` analog over (sum, sum-of-squares, non-null count)
    per measure column.  Feed the result straight into :func:`apply_deltas`
    with ``measure_cols=_moment_cols(src_cols)``.

    Single-pass (r14, guide §2.3): old/new moment images explode from ONE
    scan of ``changes`` instead of a two-select union re-executing the
    snapshot-diff join per side."""
    gcols = _cols(group_cols)

    def _img(img: str, sign: int) -> Column:
        cols = []
        for c in src_cols:
            v = F.col(f"{img}_{c}").cast("double")
            cols += [
                (F.lit(sign) * F.coalesce(v, F.lit(0.0))).alias(f"__s_{c}"),
                (F.lit(sign) * F.coalesce(v * v, F.lit(0.0))).alias(f"__q_{c}"),
                F.when(v.isNotNull(), F.lit(sign)).otherwise(F.lit(0)).alias(f"__c_{c}"),
            ]
        return F.struct(
            *[F.col(f"{img}_{g}").alias(g) for g in gcols],
            *cols,
            F.lit(sign).alias(COUNT_COL),
        )

    ct = F.col("_change_type")
    imgs = (
        F.when(ct == "update", F.array(_img("old", -1), _img("new", 1)))
        .when(ct == "delete", F.array(_img("old", -1)))
        .when(ct == "insert", F.array(_img("new", 1)))
    )
    mcols = _moment_cols(src_cols)
    return (
        changes.select(F.explode(imgs).alias("__img"))
        .select("__img.*")
        .groupBy(*gcols)
        .agg(
            *[F.sum(c).alias(f"{c}_delta") for c in mcols],
            F.sum(COUNT_COL).alias(f"{COUNT_COL}_delta"),
        )
    )


def derive_stats(
    state: DataFrame,
    group_cols: str | list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """User-facing aggregates from a maintained moment state.

    ``aggs`` maps output column -> ``(fn, src_col)`` with fn one of
    ``sum | count | avg | var_samp | var_pop | stddev_samp | stddev_pop |
    min | max`` (``("count", "*")`` is row count).  SQL null semantics:
    SUM/AVG over an all-null group are NULL; VAR_SAMP/STDDEV_SAMP need >= 2
    non-null values, the _pop forms >= 1; MIN/MAX surface the maintained
    ``__mn_``/``__mx_`` extremum columns verbatim (NULL iff every value in
    the group is NULL).  Variance derives from the moment identity
    (q - s^2/n) / (n - ddof), clamped at 0 against floating cancellation."""
    cols = []
    for out, (fn, src) in aggs.items():
        if fn == "count":
            col = F.col(COUNT_COL) if src == "*" else F.col(f"__c_{src}")
            cols.append(col.alias(out))
            continue
        if fn in ("min", "max"):
            prefix = "__mn_" if fn == "min" else "__mx_"
            cols.append(F.col(f"{prefix}{src}").alias(out))
            continue
        s, q, n = (F.col(f"__{p}_{src}") for p in ("s", "q", "c"))
        if fn == "sum":
            expr = F.when(n > 0, s)
        elif fn == "avg":
            expr = F.when(n > 0, s / n)
        elif fn in ("var_samp", "var_pop", "stddev_samp", "stddev_pop"):
            ddof = 1 if fn.endswith("_samp") else 0
            var = F.greatest((q - s * s / n) / (n - ddof), F.lit(0.0))
            expr = F.when(n > ddof, var)
            if fn.startswith("stddev"):
                expr = F.sqrt(expr)
        else:
            raise ValueError(f"unknown aggregate fn {fn!r} for {out!r}")
        cols.append(expr.alias(out))
    return state.select(*_cols(group_cols), *cols)


def apply_distinct(
    aux: DataFrame, changes: DataFrame, group_col: str, value_col: str
) -> tuple[DataFrame, DataFrame]:
    """Maintain per-group COUNT(DISTINCT value) from a change feed.

    COUNT DISTINCT is not self-maintainable from the view alone (a
    departing value might or might not still be carried by other rows), but
    becomes so with an *auxiliary view* — the other Gupta & Mumick trick,
    complementing :func:`apply_minmax`'s bounded recompute: maintain
    support counts per (group, value) pair, which IS additive
    (:func:`agg_deltas` over the composite key), and the distinct count is
    just the number of surviving pairs per group.

    Returns ``(aux', derived)``: the updated auxiliary frame (persist this
    between refreshes) and the derived ``(group, n_distinct)`` view.  Aux
    size is |group, value| pairs — the same cardinality a from-scratch
    ``count(DISTINCT)`` must shuffle anyway; refresh cost stays
    O(|changes|).

    NULL values are ignored, matching SQL ``COUNT(DISTINCT v)``: an image
    whose value is NULL contributes nothing on that side (so NULL→5 only
    adds support for (g,5), and 5→NULL only retires (g,5))."""
    old_side = (
        changes.where(
            F.col("_change_type").isin("update", "delete")
            & F.col(f"old_{value_col}").isNotNull()
        )
        .select(
            F.col(f"old_{group_col}").alias(group_col),
            F.col(f"old_{value_col}").alias(value_col),
            F.lit(-1).alias(COUNT_COL),
        )
    )
    new_side = (
        changes.where(
            F.col("_change_type").isin("update", "insert")
            & F.col(f"new_{value_col}").isNotNull()
        )
        .select(
            F.col(f"new_{group_col}").alias(group_col),
            F.col(f"new_{value_col}").alias(value_col),
            F.lit(1).alias(COUNT_COL),
        )
    )
    deltas = (
        old_side.unionByName(new_side)
        .groupBy(group_col, value_col)
        .agg(F.sum(COUNT_COL).alias(f"{COUNT_COL}_delta"))
    )
    aux2 = apply_deltas(aux, deltas, [group_col, value_col], [])
    derived = aux2.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return aux2, derived
