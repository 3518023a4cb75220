"""Unit tests for engine operators: as-of join edge cases, time windows,
dedup primitives, similarity search, text functions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from databricks_feature_store_flight_school_spark.functions import text as T
from databricks_feature_store_flight_school_spark.functions.vectors import cosine, to_double
from databricks_feature_store_flight_school_spark.operators import (
    asof_join,
    content_hash_dedup,
    cosine_topk,
    exact_dedup,
    hamming64,
    minhash_lsh_candidates,
    minhash_signatures_df,
    session_window_agg,
    shingle_pairs_jaccard,
    simhash_df,
    tumbling_window_agg,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second)


# -- as-of join -------------------------------------------------------------

def test_asof_backward_inclusive_and_missing(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), ev="l1"),
            Row(k="a", ts=_ts(20), ev="l2"),
            Row(k="b", ts=_ts(5), ev="l3"),   # no right row at/before -> null
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), px=1.0),   # equal ts -> matches (inclusive)
            Row(k="a", ts=_ts(15), px=2.0),
            Row(k="b", ts=_ts(6), px=9.0),    # after left -> no match
        ]
    )
    out = {
        r["ev"]: r
        for r in asof_join(left, right, on="k", left_ts="ts", right_payload=["px"]).collect()
    }
    assert out["l1"]["px"] == 1.0          # ts == right ts: inclusive
    assert out["l2"]["px"] == 2.0          # most recent at-or-before
    assert out["l3"]["px"] is None
    assert out["l3"]["ts_right"] is None


def test_asof_null_payload_does_not_leak_older_value(spark):
    """A matched right row with a NULL payload field must yield null, not an
    older right row's value (struct-atomic forward fill)."""
    left = spark.createDataFrame([Row(k="a", ts=_ts(30), ev="l")])
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(1), px=7.0), Row(k="a", ts=_ts(25), px=None)]
    )
    row = asof_join(left, right, on="k", left_ts="ts", right_payload=["px"]).collect()[0]
    assert row["px"] is None               # from the _ts(25) row, not 7.0
    assert row["ts_right"] == _ts(25)


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(10), v=1.0)])
    right = spark.createDataFrame([Row(k="a", ts=_ts(5), v=2.0)])
    row = asof_join(left, right, on="k", left_ts="ts", right_payload=["v"]).collect()[0]
    assert row["v"] == 1.0 and row["v_right"] == 2.0


# -- windows ----------------------------------------------------------------

def test_tumbling_window_boundaries(spark):
    df = spark.createDataFrame(
        [Row(ts=_ts(0), v=1.0), Row(ts=_ts(9, 59), v=2.0), Row(ts=_ts(10), v=4.0)]
    )
    out = tumbling_window_agg(df, "ts", "10 minutes", [], [F.sum("v").alias("s")])
    got = {r["window_start"].minute: r["s"] for r in out.collect()}
    assert got == {0: 3.0, 10: 4.0}        # boundary event starts the next window


def test_session_window_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(u=1, ts=_ts(0)),
            Row(u=1, ts=_ts(9)),            # within 10min gap -> same session
            Row(u=1, ts=_ts(19, 1)),        # 10m01s after -> NEW session
            Row(u=2, ts=_ts(0)),
        ]
    )
    out = session_window_agg(df, "ts", "10 minutes", ["u"], [F.count(F.lit(1)).alias("n")])
    rows = sorted(
        [(r["u"], r["window_start"].minute, r["n"]) for r in out.collect()]
    )
    assert rows == [(1, 0, 2), (1, 19, 1), (2, 0, 1)]


# -- dedup ------------------------------------------------------------------

def test_exact_and_content_hash_dedup(spark):
    df = spark.createDataFrame(
        [Row(id=3, text="aaa"), Row(id=1, text="aaa"), Row(id=2, text="bbb")]
    )
    kept = exact_dedup(df, ["text"], "id").collect()
    assert {(r["text"], r["id"], r["dup_count"]) for r in kept} == {("aaa", 1, 2), ("bbb", 2, 1)}

    ch = content_hash_dedup(df, "text", "id").collect()
    assert {r["id"] for r in ch} == {1, 2}
    assert all(len(r["content_hash"]) == 64 for r in ch)


def test_shingle_jaccard_identical_and_disjoint(spark):
    a = "w1 w2 w3 w4 w5"
    df = spark.createDataFrame(
        [Row(id=1, text=a), Row(id=2, text=a), Row(id=3, text="x1 x2 x3 x4")]
    )
    pairs = shingle_pairs_jaccard(df, "id", "text", k=3, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"], p["jaccard"]) == (1, 2, 1.0)


def test_minhash_lsh_finds_identical_pair(spark):
    a = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [Row(id=1, text=a), Row(id=2, text=a), Row(id=3, text=" ".join(f"z{i}" for i in range(30)))]
    )
    cands = minhash_lsh_candidates(df, "id", "text").collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_similarity"] for r in cands}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs

    sigs = {r["id"]: r["sig"] for r in minhash_signatures_df(df, "id", "text").collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    assert len(sigs[1]) == 64


def test_simhash_similar_docs_close(spark):
    base = " ".join(f"word{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            Row(id=1, text=base),
            Row(id=2, text=base + " extra"),
            Row(id=3, text=" ".join(f"other{i}" for i in range(40))),
        ]
    )
    s = {r["id"]: r["simhash"] for r in simhash_df(df, "id", "text").collect()}
    d = spark.createDataFrame([Row(a=s[1], b=s[2], c=s[3])]).select(
        hamming64(F.col("a"), F.col("b")).alias("near"),
        hamming64(F.col("a"), F.col("c")).alias("far"),
    ).collect()[0]
    assert d["near"] < d["far"]
    assert d["near"] <= 8


# -- similarity -------------------------------------------------------------

def test_cosine_expression(spark):
    df = spark.createDataFrame([Row(a=[1.0, 0.0], b=[1.0, 0.0], c=[0.0, 2.0])])
    row = df.select(
        cosine(to_double(F.col("a")), to_double(F.col("b"))).alias("same"),
        cosine(to_double(F.col("a")), to_double(F.col("c"))).alias("orth"),
    ).collect()[0]
    assert row["same"] == pytest.approx(1.0)
    assert row["orth"] == pytest.approx(0.0)


def test_cosine_topk_ranks(spark):
    rows = [
        Row(id=0, v=[1.0, 0.0]),
        Row(id=1, v=[0.9, 0.1]),
        Row(id=2, v=[0.0, 1.0]),
        Row(id=3, v=[1.0, 0.05]),
    ]
    df = spark.createDataFrame(rows)
    out = cosine_topk(df, df.where(F.col("id") == 0), "id", "v", k=2).collect()
    ranked = sorted([(r["rank"], r["neighbor_id"]) for r in out])
    assert ranked == [(1, 3), (2, 1)]      # closest direction first, self excluded


# -- text functions ---------------------------------------------------------

def test_text_functions(spark):
    df = spark.createDataFrame([Row(t="The cat and the dog, quickly!")])
    row = df.select(
        T.token_count("t").alias("n"),
        T.punct_count("t").alias("p"),
        T.bpe_token_count("t").alias("bpe"),
        T.lang_id("t").alias("lang"),
        T.word_shingles("t", 3).alias("sh"),
        T.rolling_fingerprint("t").alias("fp"),
    ).collect()[0]
    assert row["n"] == 6
    assert row["p"] == 2                   # comma + exclamation
    assert row["bpe"] == 8                 # 6 words + ',' + '!'
    assert row["lang"] == "en"
    assert len(row["sh"]) == 4 and row["sh"][0] == "The cat and"
    assert isinstance(row["fp"], int)


def test_lang_id_tie_and_default(spark):
    df = spark.createDataFrame(
        [Row(t="la la el que"), Row(t="zzz qqq"), Row(t="der und nicht das")]
    )
    out = [r[0] for r in df.select(T.lang_id("t")).collect()]
    assert out == ["es", "unknown", "de"]


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([Row(t="one two")])
    assert df.select(T.word_shingles("t", 3).alias("s")).collect()[0]["s"] == []


def test_ivf_topk_recall(spark, sf_dir):
    """IVF (nprobe=2 of 16 cells) must recover most of the exact top-5."""
    from databricks_feature_store_flight_school_spark.operators.similarity import ivf_topk
    from databricks_feature_store_flight_school_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    }

    def recall(nprobe: int) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, "vec_id", "embedding", k=5, nprobe=nprobe
            ).collect()
        }
        assert all(q != n for q, n in approx)
        return len(exact & approx) / len(exact)

    # recall grows with probes; probing every cell IS the exact search
    r4, r16 = recall(4), recall(16)
    assert r4 >= 0.5, f"IVF recall@nprobe=4 too low: {r4:.2f}"
    assert r16 == 1.0, f"full probe must equal exact search: {r16:.2f}"


def test_lsh_topk_recall(spark, sf_dir):
    """Multi-table hyperplane LSH (q_lsh_topk's pin): recall must rise with
    the table count exactly as the union-of-tables theory says, the
    12x6-plane catalog config must clear a 0.4 floor on this worst-case
    (near-orthogonal random) corpus, and every returned similarity must be
    the EXACT cosine — LSH approximates the candidate set, never the
    score."""
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        lsh_topk,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact_rows = cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_sims = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact_rows
    }

    def run(n_tables: int):
        rows = lsh_topk(
            emb, queries, "vec_id", "embedding", k=5, n_planes=6, dim=64,
            n_tables=n_tables,
        ).collect()
        assert all(r["query_id"] != r["neighbor_id"] for r in rows)
        pairs = {(r["query_id"], r["neighbor_id"]) for r in rows}
        sims = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in rows}
        return len(exact & pairs) / len(exact), sims

    r1, _ = run(1)
    r12, sims12 = run(12)
    assert r12 >= max(r1, 0.4), f"12-table recall {r12:.2f} (1-table {r1:.2f})"
    for pair, sim in sims12.items():
        if pair in exact_sims:
            assert abs(sim - exact_sims[pair]) < 1e-9, pair


def test_signature_udf_matches_column_hyperplane_bucket(spark, sf_dir):
    """r13 optimization pin: the Arrow-matmul signature UDF (now used by
    lsh_topk AND lsh_neardup_pairs) must produce bit-identical bucket ids to
    the interpreted Column form it replaced (functions.vectors.
    hyperplane_bucket) — same planes, same sign convention (dot >= 0 sets
    the bit), same bit order."""
    from databricks_feature_store_flight_school_spark.functions.vectors import (
        hyperplane_bucket,
        to_double,
    )
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        _signature_udf,
        random_planes,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    plane_sets = [random_planes(64, 6, 42 + t) for t in range(3)]
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
    )
    got = emb.select(
        "vec_id", _signature_udf(plane_sets)(F.col("v")).alias("sig")
    ).collect()
    want = emb.select(
        "vec_id",
        F.array(*[hyperplane_bucket(F.col("v"), p) for p in plane_sets]).alias(
            "sig"
        ),
    ).collect()
    assert {r["vec_id"]: r["sig"] for r in got} == {
        r["vec_id"]: r["sig"] for r in want
    }


def test_minhash_lsh_neardup_recall(spark, sf_dir):
    """q_minhash_lsh_neardup's pin: on the documents corpus the banded
    MinHash candidate set must recover >= 0.9 of the exact word-3-gram
    Jaccard >= 0.5 pairs (band collision prob for J=0.5 at 16 bands x 4
    rows: 1-(1-0.5^4)^16 ~ 0.64 per band-row draw — the near-dup pairs in
    this corpus sit far above the 0.5 floor, where recall approaches 1)."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D
    from databricks_feature_store_flight_school_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.shingle_pairs_jaccard(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.9, f"MinHash LSH recall too low: {recall:.2f}"


def test_incremental_dedup_layers_and_idempotence(spark):
    """q_incremental_dedup's pin: every layer decides correctly on a
    constructed increment — exact replay rejected, double-ingest keeps the
    min id, a two-word-appended near-dup of a >=20-word corpus doc is
    rejected by the signature estimate, a fresh doc passes — and appending
    the accepted index rows makes a re-run of the SAME increment accept
    nothing (idempotent ingestion)."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D

    corpus_doc = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(8))  # 24 words
    other_doc = " ".join(f"delta{i} eps{i}" for i in range(10))
    corpus = spark.createDataFrame(
        [(1, corpus_doc), (2, other_doc)], "doc_id long, text string"
    )
    index = D.build_dedup_index(corpus, "doc_id", "text")

    fresh = " ".join(f"zeta{i} eta{i} theta{i}" for i in range(8))
    inc = spark.createDataFrame(
        [
            (10, corpus_doc),            # exact replay of corpus -> rejected
            (11, corpus_doc + " zq wv"),  # near-dup of corpus -> rejected
            (12, fresh),                  # novel -> accepted
            (13, fresh),                  # exact dup WITHIN batch -> rejected (12 kept)
        ],
        "doc_id long, text string",
    )
    accepted, acc_index = D.incremental_dedup(inc, index, "doc_id", "text", threshold=0.7)
    assert {r["doc_id"] for r in accepted.collect()} == {12}
    idx_rows = acc_index.collect()
    assert [r["doc_id"] for r in idx_rows] == [12]
    assert idx_rows[0]["content_hash"] is not None and idx_rows[0]["sig"] is not None

    # idempotence: after appending the accepted rows to the index, the same
    # increment yields zero accepted
    grown = index.unionByName(acc_index)
    again, _ = D.incremental_dedup(inc, grown, "doc_id", "text", threshold=0.7)
    assert again.count() == 0


def test_incremental_dedup_matches_exact_twin_when_near_disabled(spark, sf_dir):
    """q_incremental_dedup's pin #2: with threshold=None the operator must
    equal the from-scratch exact semantics (self keep-min-id + anti-join on
    text) on the real documents corpus — the same statement
    q_incremental_dedup_exact makes against DuckDB, asserted here in-process
    so the near-dup layer's plumbing can't silently leak into the exact path."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D
    from databricks_feature_store_flight_school_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    inc = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text").unionAll(
        corpus.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    index = D.build_dedup_index(corpus, "doc_id", "text")
    accepted, _ = D.incremental_dedup(inc, index, "doc_id", "text", threshold=None)

    from pyspark.sql import Window

    w = Window.partitionBy("text").orderBy("doc_id")
    want = (
        inc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(corpus.select("text"), "text", "left_anti")
    )
    assert {r["doc_id"] for r in accepted.collect()} == {
        r["doc_id"] for r in want.collect()
    }
    assert accepted.count() > 0


def test_incremental_dedup_enforces_index_param_contract(spark):
    """The num_hashes/k contract is enforced, not documented (round-9
    hardening): an index missing the parameter columns raises ValueError at
    plan time; an index built with different parameters raises from the
    executors before any result can be produced — a silent mismatch would
    deflate every Jaccard estimate and wave near-dups through."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [(10, " ".join(f"v{i}" for i in range(30)))], "doc_id long, text string"
    )

    bare = D.build_dedup_index(corpus, "doc_id", "text").drop("minhash_num_hashes")
    with pytest.raises(ValueError, match="lacks required column"):
        D.incremental_dedup(inc, bare, "doc_id", "text")

    idx32 = D.build_dedup_index(corpus, "doc_id", "text", num_hashes=32)
    acc, _ = D.incremental_dedup(inc, idx32, "doc_id", "text", num_hashes=64)
    with pytest.raises(Exception, match="parameter mismatch"):
        acc.collect()

    # matching params on the same index pass
    ok, _ = D.incremental_dedup(inc, idx32, "doc_id", "text", num_hashes=32)
    assert {r["doc_id"] for r in ok.collect()} == {10}

    # a band-key table built at different bands raises too
    idx = D.build_dedup_index(corpus, "doc_id", "text")
    acc2, _ = D.incremental_dedup(
        inc, idx, "doc_id", "text", bands=8,
        index_bands=D.index_band_keys(idx, "doc_id", bands=16),
    )
    with pytest.raises(Exception, match="lsh_bands"):
        acc2.collect()


def test_incremental_dedup_caps_hot_band_buckets(spark):
    """A near-identical family in the CORPUS puts all its members in the
    same LSH (band, bucket); the candidate join there is quadratic.  The
    guard fail-fasts with the offending bucket named instead of letting one
    task carry family² work (mirrors similarity.verify_pairs_in_buckets'
    max_bucket_size)."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D

    base = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(8))
    family = spark.createDataFrame(
        [(i, base + f" tail{i}") for i in range(5)], "doc_id long, text string"
    )
    idx = D.build_dedup_index(family, "doc_id", "text")
    inc = spark.createDataFrame(
        [(100, " ".join(f"z{i} y{i} x{i}" for i in range(8)))],
        "doc_id long, text string",
    )
    acc, _ = D.incremental_dedup(
        inc, idx, "doc_id", "text", threshold=0.7, max_band_bucket=2
    )
    with pytest.raises(Exception, match="max_band_bucket"):
        acc.collect()
    # the default cap admits the same family; the fresh doc passes
    ok, _ = D.incremental_dedup(inc, idx, "doc_id", "text", threshold=0.7)
    assert {r["doc_id"] for r in ok.collect()} == {100}


def test_build_dedup_index_plan_keeps_string_out_of_the_sig_aggregate(spark, sf_dir):
    """Pin the MEASURED plan choice (round 9): the index build is two
    columnar scans joined by id — NOT a single scan carrying content_hash
    into the signature groupBy, because a min(string) in the aggregation
    buffer knocked HashAggregate off its fixed-width fast path (48 s ->
    134-156 s on the sf10 corpus; see build_dedup_index's docstring).
    Asserted: exactly two scans, and no aggregate in the plan buffers the
    hash string."""
    from databricks_feature_store_flight_school_spark.operators import dedup as D
    from databricks_feature_store_flight_school_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = D.build_dedup_index(docs, "doc_id", "text")
    plan = idx._jdf.queryExecution().executedPlan().toString()
    n_scans = sum(1 for ln in plan.splitlines() if "Scan parquet" in ln or "FileScan" in ln)
    assert n_scans == 2, plan
    for ln in plan.splitlines():
        if "HashAggregate" in ln:
            assert "sha2" not in ln and "content_hash" not in ln, ln
    row = idx.where(F.col("sig").isNotNull()).first()
    assert row is not None and len(row["sig"]) == 64 and row["content_hash"]
    assert (row["minhash_num_hashes"], row["shingle_k"]) == (64, 3)


def test_percentile_approx_error_bound(spark, sf_dir):
    """q_percentile_approx's pin: Spark guarantees percentile_approx's RANK
    error <= n/accuracy.  At accuracy=10000 (the catalog setting) verify the
    returned value's true rank sits within p +- 1/accuracy (+ a one-row
    tie slack) of the target per group — the sketch answer is checked
    against the exact sorted data, not against another sketch."""
    from databricks_feature_store_flight_school_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: (r["median_price_approx"], r["p90_price_approx"])
        for r in li.groupBy("l_returnflag").agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
                "median_price_approx"
            ),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias(
                "p90_price_approx"
            ),
        ).collect()
    }
    rows = li.select("l_returnflag", "l_extendedprice").collect()
    by_flag: dict[str, list[float]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for flag, (med, p90) in approx.items():
        vals = sorted(by_flag[flag])
        n = len(vals)
        for target, got in ((0.5, med), (0.9, p90)):
            # true rank range of the returned value (ties span a range)
            lo = sum(1 for v in vals if v < got)
            hi = sum(1 for v in vals if v <= got)
            want = target * n
            slack = n / 10000 + 1  # guaranteed rank error + tie rounding
            assert lo - slack <= want <= hi + slack, (
                flag, target, got, lo, hi, n
            )


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """q_approx_count_distinct's pin: HLL++ at the default rsd=0.05 must
    land within 3 standard errors (15%) of the exact distinct count for
    every group/column — the sketch is checked against exact
    countDistinct."""
    from databricks_feature_store_flight_school_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_parts"])
        for r in li.groupBy("l_returnflag").agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
        ).collect()
    }
    exact = {
        r["l_returnflag"]: (r["n_orders"], r["n_parts"])
        for r in li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
        ).collect()
    }
    assert set(approx) == set(exact)
    for flag in exact:
        for got, want in zip(approx[flag], exact[flag]):
            assert abs(got - want) / want <= 0.15, (flag, got, want)


def test_verify_pairs_zero_norm_and_bucket_guard(spark):
    """The shared in-bucket verifier's two safety contracts: a zero-norm
    vector has undefined cosine and must never pair (even at threshold <=
    0.0 — it used to surface as sim 0.0), and a bucket larger than
    max_bucket_size fails fast with the bucket key instead of OOMing one
    task."""
    import pytest

    from databricks_feature_store_flight_school_spark.operators.similarity import (
        verify_pairs_in_buckets,
    )

    rows = [
        (1, [1.0, 0.0], 1.0, 0),
        (2, [0.0, 0.0], 0.0, 0),  # zero-norm
        (3, [-1.0, 0.0], 1.0, 0),
    ]
    tagged = spark.createDataFrame(
        rows, "x_id int, x_vec array<double>, x_norm double, bucket int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in verify_pairs_in_buckets(tagged, ["bucket"], -2.0).collect()
    }
    # only the two unit vectors pair (cos = -1 >= -2); id 2 never appears
    assert got == {(1, 3): -1.0}

    with pytest.raises(Exception, match="max_bucket_size"):
        verify_pairs_in_buckets(
            tagged, ["bucket"], 0.9, max_bucket_size=2
        ).collect()


def test_lsh_neardup_pairs_recall(spark, sf_dir):
    """Banded-LSH pairs must be a SUBSET of the exact threshold pairs (exact
    cosine verify -> zero false positives) with recall >= 0.9, and every
    emitted similarity must equal the exact one bit-for-bit."""
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        lsh_neardup_pairs,
    )
    from databricks_feature_store_flight_school_spark.plans.queries_vectors import (
        q_embedding_neardup_pairs,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in q_embedding_neardup_pairs(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    approx = {
        (r["id_a"], r["id_b"]): round(r["cosine_sim"], 6)
        for r in lsh_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.35, dim=64
        ).collect()
    }
    assert set(approx) <= set(exact), "LSH emitted a false-positive pair"
    assert all(approx[p] == exact[p] for p in approx)
    recall = len(approx) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"LSH pairs recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_verify_pairs_in_buckets_string_ids_and_dedup(spark):
    """The shared in-bucket verifier must (a) propagate a NON-bigint id type
    into its output schema (it is derived from tagged.x_id at runtime),
    (b) emit each pair once even when the pair co-occurs in several buckets
    (cross-bucket max-dedup), and (c) keep sub-threshold pairs inside the
    worker — only matches ever leave."""
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        verify_pairs_in_buckets,
    )

    rows = [
        # docA/docB identical direction -> sim 1.0; docC orthogonal.
        # The (A, B) pair appears in BOTH bucket 0 and bucket 1.
        Row(x_id="docA", x_vec=[1.0, 0.0], x_norm=1.0, bucket=0),
        Row(x_id="docB", x_vec=[2.0, 0.0], x_norm=2.0, bucket=0),
        Row(x_id="docA", x_vec=[1.0, 0.0], x_norm=1.0, bucket=1),
        Row(x_id="docB", x_vec=[2.0, 0.0], x_norm=2.0, bucket=1),
        Row(x_id="docC", x_vec=[0.0, 1.0], x_norm=1.0, bucket=1),
    ]
    tagged = spark.createDataFrame(rows)
    out = verify_pairs_in_buckets(tagged, ["bucket"], threshold=0.5)
    assert dict(out.dtypes)["id_a"] == "string"
    got = out.collect()
    assert [(r["id_a"], r["id_b"], r["cosine_sim"]) for r in got] == [
        ("docA", "docB", 1.0)
    ]


def test_md5_fingerprint_matches_manual(spark):
    import hashlib

    text = "alpha beta gamma delta"
    shingles = ["alpha beta gamma", "beta gamma delta"]
    expected = min(hashlib.md5(s.encode()).hexdigest()[:16] for s in shingles)
    df = spark.createDataFrame([Row(t=text)])
    assert df.select(T.md5_fingerprint("t").alias("fp")).collect()[0]["fp"] == expected
    # short doc -> null fingerprint
    short = spark.createDataFrame([Row(t="one two")])
    assert short.select(T.md5_fingerprint("t").alias("fp")).collect()[0]["fp"] is None


def test_arrow_cosine_topk_matches_exact(spark, sf_dir):
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        arrow_cosine_topk,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_sim"], 9))
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    }
    arrow = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_sim"], 9))
        for r in arrow_cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    }
    assert exact == arrow


def test_sentence_split_udtf(spark):
    from databricks_feature_store_flight_school_spark.functions.udtfs import (
        SentenceSplit,
        register_udtfs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text="Hello world. How are you.  . Fine"), Row(doc_id=2, text=None)]
    )
    out = df.lateralJoin(SentenceSplit(F.col("text").outer())).collect()
    got = [(r["doc_id"], r["sentence_idx"], r["sentence"], r["n_tokens"]) for r in out]
    # empty segment (idx 2) dropped but indices preserve original positions;
    # null text produces no rows
    assert got == [(1, 0, "Hello world", 2), (1, 1, "How are you", 3), (1, 3, "Fine", 1)]

    register_udtfs(spark)
    df.createOrReplaceTempView("udtf_docs")
    n = spark.sql(
        "SELECT count(*) AS n FROM udtf_docs, LATERAL sentence_split(text)"
    ).collect()[0]["n"]
    assert n == 3


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(10), ev="fresh"), Row(k="a", ts=_ts(40), ev="stale")]
    )
    right = spark.createDataFrame([Row(k="a", ts=_ts(8), px=1.0)])
    out = {
        r["ev"]: r
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_payload=["px"],
            tolerance_seconds=600,  # 10 minutes
        ).collect()
    }
    assert out["fresh"]["px"] == 1.0        # 2 min old: inside tolerance
    assert out["stale"]["px"] is None       # 32 min old: nulled
    assert out["stale"]["ts_right"] is None


def test_connected_components_shapes(spark):
    from databricks_feature_store_flight_school_spark.operators.components import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter > 1), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [
            Row(src=2, dst=1), Row(src=2, dst=3), Row(src=3, dst=4),
            Row(src=10, dst=11), Row(src=11, dst=12), Row(src=10, dst=12),
            Row(src=21, dst=20),
        ]
    )
    got = sorted(
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    ]


def test_connected_components_warns_on_max_iter(spark):
    """A chain longer than max_iter can't converge: the truncated labels must
    come with a RuntimeWarning, not pass silently as converged output."""
    import warnings as _w

    from databricks_feature_store_flight_school_spark.operators.components import (
        connected_components,
    )

    # chain 0-1-2-...-8: min-label takes ~diameter rounds to reach the far end
    chain = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(8)])
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        connected_components(chain, max_iter=2, checkpoint_every=100).collect()
    assert any(
        issubclass(w.category, RuntimeWarning) and "did not converge" in str(w.message)
        for w in caught
    )

    # and a converged run emits no warning
    with _w.catch_warnings(record=True) as caught2:
        _w.simplefilter("always")
        connected_components(chain, max_iter=20).collect()
    assert not [w for w in caught2 if issubclass(w.category, RuntimeWarning)]


def test_connected_components_one_action_per_superstep(spark, monkeypatch):
    """Driver chattiness pin (VERDICT r9 #4): the loop issues exactly ONE
    driver action per superstep — the convergence sum rides the same
    action that populates the round's cache / materializes the lazy
    checkpoint; there is no initial-sum action and no eager periodic
    checkpoint action.  (Spark JOB ids are not the metric: AQE submits one
    job per shuffle stage within an action, which is pipeline progress,
    not a driver round-trip.)  A chain 0-..-8 converges in 8 label-moving
    rounds + 1 no-change round = 9 supersteps = 9 collects (the old shape
    issued 13: +1 initial sum, +3 eager periodic checkpoints)."""
    from databricks_feature_store_flight_school_spark.operators.components import (
        connected_components,
    )

    chain = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(8)])
    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract base in
    # Spark 4; instances resolve collect on the classic subclass)
    cls = type(chain)
    calls = {"n": 0}
    orig = cls.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting_collect)
    result = connected_components(chain, checkpoint_every=3)
    inner = calls["n"]
    got = sorted((r["node"], r["component"]) for r in orig(result))
    assert got == [(i, 0) for i in range(9)]
    assert inner == 9, f"expected 9 driver actions (1/superstep), got {inner}"


def test_freq_items_sketch_covers_exact_heavy_hitters(spark, sf_dir):
    """Spark's single-pass approximate frequent-items sketch
    (DataFrame.stat.freqItems, Karp-Papadimitriou-Shenker) must contain every
    EXACT heavy hitter from q_heavy_hitters — the sketch's no-false-negative
    guarantee: support 1/50 can only over-report, never miss."""
    from databricks_feature_store_flight_school_spark.functions import text as T
    from databricks_feature_store_flight_school_spark.plans.catalog import query_map
    from databricks_feature_store_flight_school_spark.sources import load_table

    exact = {
        r["term"] for r in query_map()["q_heavy_hitters"](spark, sf_dir).collect()
    }
    assert exact, "test needs a non-empty exact heavy-hitter set"

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("term")
    ).where(F.col("term") != "")
    sketch = set(toks.stat.freqItems(["term"], support=1.0 / 50).collect()[0][0])
    assert exact <= sketch, f"sketch missed exact hitters: {exact - sketch}"


def test_sketch_rollup_matches_exact_within_error(spark, sf_dir):
    """The two-level sketch rollup (q_sketch_rollup) must land within the
    sketches' published error of the exact per-region answers: HLL distinct
    within 3%, KLL median between the exact 40th and 60th percentiles."""
    from databricks_feature_store_flight_school_spark.plans.catalog import query_map
    from databricks_feature_store_flight_school_spark.sources import load_table

    got = {
        r["n_regionkey"]: (r["est_customers"], r["est_median_bal"])
        for r in query_map()["q_sketch_rollup"](spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(n, n.n_nationkey == c.c_nationkey)
    exact = {
        r["n_regionkey"]: (r["exact_customers"], r["p40"], r["p60"])
        for r in joined.groupBy("n_regionkey")
        .agg(
            F.countDistinct("c_custkey").alias("exact_customers"),
            F.expr("percentile(c_acctbal, 0.4)").alias("p40"),
            F.expr("percentile(c_acctbal, 0.6)").alias("p60"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for rk, (est_n, est_med) in got.items():
        exact_n, p40, p60 = exact[rk]
        assert abs(est_n - exact_n) <= max(1, 0.03 * exact_n), (rk, est_n, exact_n)
        assert p40 <= est_med <= p60, (rk, est_med, p40, p60)


def test_ivf_persisted_index_prunes_partitions_and_matches_inmemory(
    spark, sf_dir, tmp_path
):
    """ivf_build_index / ivf_probe_index: the persisted index returns the
    same neighbours as the in-memory ivf_topk (same centroids, same probes),
    and the probe scan's plan proves PARTITION pruning — only the probed
    cell directories are read."""
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_index,
        ivf_topk,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, "vec_id", "embedding", n_centroids=16, seed=42)

    got = ivf_probe_index(spark, idx, queries, "vec_id", "embedding", k=5, nprobe=2)
    want = ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_centroids=16,
                    nprobe=2, seed=42)
    as_set = lambda df: {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)

    # pruning is DYNAMIC (round 10): no driver-side bucket collect at plan
    # build — the filtered broadcast probe side feeds a
    # dynamicpruningexpression on the partition column
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:260]
    assert "bucket" in pf and "dynamicpruning" in pf, pf


def test_documents_fixture_single_space_invariant(spark, sf_dir):
    """Pin the fixture contract functions/text.py tokens() relies on: the
    documents corpus is single-space separated — no tabs, newlines, or runs
    of spaces — so literal-space split produces no empty-string 'words' and
    wc/stop_frac/mean-word-length match the Gopher rules' intent.  If the
    testdata generator ever changes this, the failure points here instead of
    silently drifting the quality signals (round-3 advice)."""
    from databricks_feature_store_flight_school_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.where(
        F.col("text").rlike(r"\t|\n|\r| {2,}")
        | (F.col("text") != F.trim(F.col("text")))
    ).count()
    assert bad == 0
    # corollary: no empty tokens from the literal-space split
    empties = docs.select(
        F.size(F.filter(T.tokens("text"), lambda w: F.length(w) == 0)).alias("n")
    ).agg(F.sum("n").alias("s")).collect()[0]["s"]
    assert empties == 0


def test_kmeans_fit_matches_numpy(spark, sf_dir):
    """Distributed Lloyd's must match a single-node numpy reference run from
    the same deterministic init (lowest-id seeds, argmax ties to the lower
    cluster): same assignments, same centroids to float tolerance."""
    import numpy as np

    from databricks_feature_store_flight_school_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    k, iters = 4, 3

    cent = X[:k].copy()
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for j in range(k):
            m = X[assign == j]
            if len(m):
                mu = m.mean(axis=0)
                cent[j] = mu / max(np.linalg.norm(mu), 1e-12)

    got = np.array(kmeans_fit(emb, "vec_id", "embedding", k=k, n_iters=iters))
    assert np.allclose(got, cent, atol=1e-6), "centroids diverge from numpy reference"

    got_assign = {
        r["id"]: r["cluster"]
        for r in assign_clusters(emb, "vec_id", "embedding", got.tolist()).collect()
    }
    want_assign = np.argmax(X @ cent.T, axis=1)
    assert all(
        got_assign[r["vec_id"]] == want_assign[i] for i, r in enumerate(rows)
    ), "assignments diverge from numpy reference"


def test_semantic_dedup_recall(spark, sf_dir):
    """SemDeDup pairs must be a SUBSET of the exact threshold pairs (exact
    cosine verify -> zero false positives) with recall >= 0.9 under
    multi-assignment, and every emitted similarity must match exact."""
    from databricks_feature_store_flight_school_spark.operators.clustering import (
        semantic_dedup_pairs,
    )
    from databricks_feature_store_flight_school_spark.plans.queries_vectors import (
        q_embedding_neardup_pairs,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in q_embedding_neardup_pairs(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    approx = {
        (r["id_a"], r["id_b"]): round(r["cosine_sim"], 6)
        for r in semantic_dedup_pairs(emb, "vec_id", "embedding", threshold=0.35).collect()
    }
    assert set(approx) <= set(exact), "semantic dedup emitted a false-positive pair"
    assert all(approx[p] == exact[p] for p in approx)
    recall = len(approx) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"semantic dedup recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_duplicate_passage_spans_crafted(spark):
    """A known 6-token passage shared by two docs must come back as ONE
    maximal span of 6 tokens at the right 1-based offsets; a doc pair with
    no 4-gram overlap must not appear."""
    from databricks_feature_store_flight_school_spark.operators.dedup import (
        duplicate_passage_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three"),            # shared at pos 3..8
        (2, f"{shared} nine ten"),                 # shared at pos 1..6
        (3, "completely different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = duplicate_passage_spans(df, "doc_id", "text", k=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"], r["span_tokens"]) == (3, 1, 6)

    # skew guard: every 4-gram of the shared passage appears at 2 positions;
    # a cap of 1 removes them all -> no spans survive
    guarded = duplicate_passage_spans(
        df, "doc_id", "text", k=4, max_shingle_df=1
    ).collect()
    assert guarded == []


def test_scd2_intervals_tile_history(spark, sf_dir):
    """SCD2 invariants: per customer (ordered by valid_from, run order) each
    interval's valid_to equals the next valid_from, exactly one open-ended
    current interval exists, and n_orders conserves the order count."""
    from databricks_feature_store_flight_school_spark.plans.queries_relational5 import (
        q_scd2_intervals,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    rows = q_scd2_intervals(spark, sf_dir).collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    o = load_table(spark, sf_dir, "orders").where("o_custkey < 100")
    n_orders = {
        r["o_custkey"]: r["n"]
        for r in o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for cust, ivs in by_cust.items():
        assert sum(r["n_orders"] for r in ivs) == n_orders[cust]
        opens = [r for r in ivs if r["is_current"]]
        assert len(opens) == 1 and ivs[-1]["is_current"]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert not prev["is_current"]


def test_sequence_packing_conserves_and_orders(spark, sf_dir):
    """Packing invariants: per source the bins' doc ranges are contiguous
    and non-overlapping in doc_id order, token totals are conserved, and
    bin ids are dense from 0."""
    from databricks_feature_store_flight_school_spark.functions.text import token_count
    from databricks_feature_store_flight_school_spark.plans.queries_relational5 import (
        q_sequence_packing,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    rows = q_sequence_packing(spark, sf_dir).collect()
    assert rows
    d = load_table(spark, sf_dir, "documents")
    want = {
        r["source"]: r["t"]
        for r in d.groupBy("source").agg(F.sum(token_count("text")).alias("t")).collect()
    }
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
        assert sum(b["total_tokens"] for b in bins) == want[src]
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_doc"] < nxt["first_doc"]


def test_weighted_median_matches_numpy(spark, sf_dir):
    """The weighted-median window construction must agree with a direct
    numpy computation of the 50%-weight crossing point per group."""
    import numpy as np

    from databricks_feature_store_flight_school_spark.plans.queries_relational5 import (
        q_weighted_median,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    got = {
        r["l_returnflag"]: r["weighted_median_qty"]
        for r in q_weighted_median(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey", "l_linenumber"
    ).collect()
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, rows in by_flag.items():
        rows.sort(key=lambda r: (r["l_quantity"], r["l_orderkey"], r["l_linenumber"]))
        w = np.array([r["l_extendedprice"] for r in rows])
        cum = np.cumsum(w)
        idx = int(np.searchsorted(cum, cum[-1] / 2))
        assert got[flag] == rows[idx]["l_quantity"], flag


def test_duplicate_passages_injected_random(spark):
    """Randomized spot check: inject a known shared passage into two random
    word-soup docs at random offsets; the maximal span must be recovered at
    exactly those offsets with at least the passage length (longer only if
    the random soup happens to extend the match)."""
    import random

    from databricks_feature_store_flight_school_spark.operators.dedup import (
        duplicate_passage_spans,
    )

    vocab = [f"w{i}" for i in range(50)]
    rng = random.Random(7)
    for trial in range(3):
        passage = [f"p{trial}x{i}" for i in range(6)]  # tokens outside vocab
        pre_a = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        post_a = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        pre_b = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        post_b = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        rows = [
            (1, " ".join(pre_a + passage + post_a)),
            (2, " ".join(pre_b + passage + post_b)),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        spans = duplicate_passage_spans(df, "doc_id", "text", k=4).collect()
        hits = [
            s for s in spans
            if s["start_a"] == len(pre_a) + 1 and s["start_b"] == len(pre_b) + 1
        ]
        assert hits, f"trial {trial}: injected passage not found in {spans}"
        assert hits[0]["span_tokens"] >= 6, hits


def test_global_row_number_matches_window(spark):
    """Two-pass range-partitioned rank == the single-task global window's
    row_number, on a deliberately shuffled input with duplicate order keys."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from databricks_feature_store_flight_school_spark.operators.ranks import (
        global_ntile,
        global_percent_rank,
        global_row_number,
    )

    rows = [((i * 37) % 101, i) for i in range(300)]  # dup values via %101
    df = spark.createDataFrame(rows, "v int, id int").repartition(7)
    got = {
        (r["v"], r["id"]): r["i"]
        for r in global_row_number(df, ["v", "id"], num_partitions=5).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r["v"], r["id"]): r["i"]
        for r in df.withColumn("i", F.row_number().over(w)).collect()
    }
    assert got == want

    nt = {
        (r["v"], r["id"]): r["bucket"]
        for r in global_ntile(df, ["v", "id"], 7, num_partitions=5).collect()
    }
    want_nt = {
        (r["v"], r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(7).over(w)).collect()
    }
    assert nt == want_nt

    pr = {
        (r["v"], r["id"]): round(r["pct_rank"], 9)
        for r in global_percent_rank(df, ["v", "id"], num_partitions=5).collect()
    }
    want_pr = {
        (r["v"], r["id"]): round(r["p"], 9)
        for r in df.withColumn("p", F.percent_rank().over(w)).collect()
    }
    assert pr == want_pr


def test_global_row_number_single_row_and_empty(spark):
    from databricks_feature_store_flight_school_spark.operators.ranks import (
        global_ntile,
        global_row_number,
    )

    one = spark.createDataFrame([(5, 1)], "v int, id int")
    assert global_row_number(one, ["v", "id"]).collect()[0]["i"] == 1
    assert global_ntile(one, ["v", "id"], 4).collect()[0]["bucket"] == 1
    empty = one.where("v > 100")
    assert global_row_number(empty, ["v", "id"]).count() == 0


def test_kmeans_fit_rejects_fewer_rows_than_k(spark):
    from databricks_feature_store_flight_school_spark.operators.clustering import (
        kmeans_fit,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id int, v array<double>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least k=5"):
        kmeans_fit(df, "id", "v", k=5, n_iters=1)


def test_pca_matches_numpy_reference(spark):
    """Distributed PCA fit/project pinned against a full-numpy reference on
    the same rows: same covariance, same top-k components (up to the shared
    sign normalisation), same projections within float tolerance."""
    import numpy as np

    from databricks_feature_store_flight_school_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(80, 3) @ np.array(
        [[3.0, 0.5, 0.1, 0.0], [0.0, 2.0, 0.3, 0.1], [0.0, 0.0, 0.5, 0.2]]
    )  # 80 x 4 with a clear spectrum
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")

    comps, mean = pca_fit(df, "v", k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, "v", comps, mean).collect()
    }

    mu = base.mean(axis=0)
    cov = np.cov(base, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    ref = evecs[:, ::-1][:, :2].T.copy()
    for row in ref:
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1.0
    proj = (base - mu) @ ref.T
    for i in range(80):
        assert abs(got[i][0] - proj[i, 0]) < 1e-6, i
        assert abs(got[i][1] - proj[i, 1]) < 1e-6, i

    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of range"):
        pca_fit(df, "v", k=9)


def test_pca_covariance_drops_null_vectors(spark):
    """ADVICE r13 #3: the pre-Arrow exploded-HOF covariance silently dropped
    NULL vectors (transform over NULL -> NULL, explode drops it); the Arrow
    pass must preserve that semantics instead of np.stack raising an opaque
    worker error on a batch containing None."""
    import numpy as np

    from databricks_feature_store_flight_school_spark.operators.pca import (
        covariance_and_mean,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(20, 3)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")

    cov, mean = covariance_and_mean(df, "v")
    ref_cov = np.cov(base, rowvar=False, ddof=1)
    assert np.allclose(cov, ref_cov, atol=1e-9)
    assert np.allclose(mean, base.mean(axis=0), atol=1e-9)


def test_global_prefix_sum_matches_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from databricks_feature_store_flight_school_spark.operators.ranks import (
        global_prefix_sum,
    )

    rows = [((i * 37) % 101, i, float(i % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "v int, id int, x double").repartition(7)
    got = {
        (r["v"], r["id"]): r["running_sum"]
        for r in global_prefix_sum(df, ["v", "id"], "x", num_partitions=5).collect()
    }
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["v"], r["id"]): r["s"]
        for r in df.withColumn("s", F.sum("x").over(w)).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_global_row_number_is_permutation_under_recompute(spark):
    """Regression net for the checkpoint in ranks.py: without a pinned
    materialisation the offsets and rank branches can sample DIFFERENT range
    boundaries (RDD-id-seeded), which shows up as duplicate/out-of-range
    ranks.  Assert the ranks are exactly the permutation 1..n across
    repeated fresh builds."""
    from pyspark.sql import functions as F

    from databricks_feature_store_flight_school_spark.operators.ranks import (
        global_row_number,
    )

    df = spark.range(6000).select(
        (F.col("id") * 2654435761 % 9973).alias("v"), F.col("id").alias("k")
    )
    for trial in range(3):
        r = global_row_number(df, ["v", "k"], rank_col="i", num_partitions=8)
        stats = r.agg(
            F.countDistinct("i").alias("d"), F.max("i").alias("m"), F.count("*").alias("n")
        ).collect()[0]
        assert (stats["d"], stats["m"], stats["n"]) == (6000, 6000, 6000), (
            trial,
            dict(stats.asDict()),
        )


def test_edit_distance_join_matches_naive(spark, sf_dir):
    """PassJoin segment-signature join ≡ naive block-quadratic join on the
    part table (exactness: the segment filter is a necessary condition and
    every candidate is verified)."""
    from pyspark.sql import functions as F

    from databricks_feature_store_flight_school_spark.operators.fuzzy import (
        edit_distance_join,
    )
    from databricks_feature_store_flight_school_spark.sources import load_table

    p = load_table(spark, sf_dir, "part")
    naive = (
        p.alias("a").join(p.alias("b"), "p_type")
        .where(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .withColumn("edit_dist", F.levenshtein("a.p_name", "b.p_name"))
        .where(F.col("edit_dist") <= 2)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            "edit_dist",
        )
    )
    fast = edit_distance_join(p, "p_name", "p_partkey", "p_type", k=2)
    nset = {tuple(r) for r in naive.collect()}
    fset = {tuple(r) for r in fast.select("key_a", "key_b", "edit_dist").collect()}
    assert nset == fset and len(nset) > 0


def test_edit_distance_join_tiny_strings_blockless(spark):
    """Strings shorter than k+1 chars can't be segmented — the length-band
    fallback must still find their pairs, blockless included, and short-long
    pairs across the boundary must not be lost."""
    import random

    from pyspark.sql import functions as F

    from databricks_feature_store_flight_school_spark.operators.fuzzy import (
        edit_distance_join,
    )

    random.seed(11)
    rows = [
        (i, "".join(random.choice("ab") for _ in range(random.randint(1, 6))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    naive = (
        df.alias("a").crossJoin(df.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("edit_dist", F.levenshtein("a.s", "b.s"))
        .where(F.col("edit_dist") <= 2)
        .select(F.col("a.id").alias("key_a"), F.col("b.id").alias("key_b"), "edit_dist")
    )
    fast = edit_distance_join(df, "s", "id", None, k=2)
    nset = {tuple(r) for r in naive.collect()}
    fset = {tuple(r) for r in fast.select("key_a", "key_b", "edit_dist").collect()}
    assert nset == fset and len(nset) > 0


def test_group_quantile_cont_matches_builtin_percentile(spark):
    """operators/ranks.group_quantile_cont (round 10, the bounded-memory
    replacement for the builtin's value->count map) must return the
    builtin's EXACT answers on every distribution shape: single-row and
    two-row groups, all-equal values, duplicate levels straddling the
    interpolation index, negatives, mixed nulls, an ALL-null group (builtin
    keeps it with NULL output), and p in {0, interior, irrational, 1}.  One
    combined frame — (dataset, group) is the compound key — so the whole
    battery is two jobs."""
    from databricks_feature_store_flight_school_spark.operators.ranks import (
        group_quantile_cont,
    )

    data = [
        ("single", "a", 7.5),
        ("two", "a", 1.0), ("two", "a", 2.0),
        ("equal", "a", 3.0), ("equal", "a", 3.0), ("equal", "a", 3.0),
        ("ties", "a", 1.0), ("ties", "a", 1.0), ("ties", "a", 2.0),
        ("ties", "a", 2.0), ("ties", "a", 9.0),
        ("neg", "a", -5.0), ("neg", "a", -1.0), ("neg", "a", 4.0), ("neg", "a", 0.0),
        ("nulls", "a", None), ("nulls", "a", 10.0), ("nulls", "a", None),
        ("nulls", "a", 20.0), ("nulls", "a", 30.0),
        ("allnull", "a", None), ("allnull", "a", None),
        ("twogroups", "a", 1.0), ("twogroups", "b", 2.0), ("twogroups", "b", 8.0),
        ("spread", "a", 1e12), ("spread", "a", 2.5), ("spread", "a", -1e12),
        ("spread", "a", 0.125), ("spread", "a", 3.0), ("spread", "a", 17.0),
        ("spread", "a", 42.0),
    ]
    df = spark.createDataFrame(data, "ds string, g string, v double")
    ps = {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p77": 0.77, "p100": 1.0}
    got = {
        (r["ds"], r["g"]): [r[a] for a in ps]
        for r in group_quantile_cont(df, ["ds", "g"], "v", ps).collect()
    }
    want = {
        (r["ds"], r["g"]): (list(r["ref"]) if r["ref"] is not None else [None] * 5)
        for r in df.groupBy("ds", "g")
        .agg(F.expr("percentile(v, array(0.0, 0.25, 0.5, 0.77, 1.0))").alias("ref"))
        .collect()
    }
    assert set(got) == set(want)
    for key in want:
        for a, b in zip(got[key], want[key]):
            if b is None:
                assert a is None, (key, got[key], want[key])
            else:
                assert a == pytest.approx(b, rel=1e-12), (key, got[key], want[key])


def test_shingle_pairs_candidate_total_guard(spark):
    """max_candidate_pairs fail-fasts on the AGGREGATE quadratic bound the
    per-shingle df cap cannot see (the sf10 lesson: 29,791 shingles all
    under the df cap, 7.4e9 candidates in total).  Below the cap the guard
    must be result-neutral; above it, the in-plan raise fires with the
    banded-MinHash redirect."""
    docs = [(i, f"w{i} x{i} y{i} z{i}") for i in range(6)]
    docs += [(100, "a b c d"), (101, "a b c d")]  # one real dup pair
    df = spark.createDataFrame(docs, "id long, text string")
    base = {
        (r["id_a"], r["id_b"])
        for r in shingle_pairs_jaccard(df, "id", "text", k=3, threshold=0.8).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"])
        for r in shingle_pairs_jaccard(
            df, "id", "text", k=3, threshold=0.8, max_candidate_pairs=10
        ).collect()
    }
    assert base == guarded == {(100, 101)}
    # the dup pair shares 2 shingles -> sum df*(df-1)/2 = 2 candidates > 1
    with pytest.raises(Exception, match="max_candidate_pairs"):
        shingle_pairs_jaccard(
            df, "id", "text", k=3, threshold=0.8, max_candidate_pairs=1
        ).collect()


def test_shingle_pairs_on_blowup_lsh(spark):
    """on_blowup='lsh' (VERDICT r10 #3): when the candidate-pair guard
    trips, the call degrades in-API to banded-MinHash candidates + exact
    shingle-Jaccard verification instead of raising.  Precision is exact
    (same schema, same jaccard/intersection values as the exact path for
    every returned pair); recall is the LSH collision probability — 1.0
    on this corpus (and measured 1.0 vs exact ground truth at sf0.01,
    BASELINE.md round 11).  Untripped, 'lsh' is result-identical to the
    exact path; an unknown mode raises at call time."""
    docs = [(i, f"w{i} x{i} y{i} z{i}") for i in range(6)]
    docs += [(100, "a b c d e f g h"), (101, "a b c d e f g h")]
    docs += [(200, "p q r s t u v w x y"), (201, "p q r s t u v w x y zz")]
    df = spark.createDataFrame(docs, "id long, text string")

    def rows(**kw):
        return {
            (r["id_a"], r["id_b"], r["intersection"], round(r["jaccard"], 9))
            for r in shingle_pairs_jaccard(
                df, "id", "text", k=3, threshold=0.7, **kw
            ).collect()
        }

    exact = rows()
    assert exact == rows(max_candidate_pairs=1, on_blowup="lsh")  # tripped
    assert exact == rows(max_candidate_pairs=10**9, on_blowup="lsh")  # not
    assert {(a, b) for a, b, *_ in exact} == {(100, 101), (200, 201)}
    with pytest.raises(ValueError, match="on_blowup"):
        shingle_pairs_jaccard(df, "id", "text", on_blowup="retry")


def test_arrow_argmax_near_tie_matches_column_tie_break(spark):
    """VERDICT r13 #5 (seeded near-tie parity): the Arrow argmax/argsort
    assignment paths replicate the Column forms' tie-breaks — but numpy's
    dot association differs from Spark's aggregate order, so the invariant
    deserves an explicit construction, not just 222 green oracles.  All
    vector/centroid components here are powers of two, making every
    partial dot-product sum EXACT in both engines: multi-way exact ties
    exercise the first-max / lower-index rules, and near-ties separated by
    2^-50 (below any plausible tolerance, representable exactly) must
    resolve to the strictly-larger side in both paths."""
    from databricks_feature_store_flight_school_spark.operators.similarity import (
        _argmax_bucket_udf,
        _centroid_dots,
        _top_buckets_udf,
    )

    eps = 2.0 ** -51
    centroids = [
        [0.5, 0.5, 0.0, 0.0],
        [0.5, 0.0, 0.5, 0.0],
        [0.0, 0.5, 0.5, 0.0],
    ]
    # dots(v) = ((v0+v1)/2, (v0+v2)/2, (v1+v2)/2) — every sum below is
    # exact in binary64, so both engines compute IDENTICAL dot values and
    # only the tie-break rule is under test
    rows = [
        # 3-way EXACT tie: dots (1, 1, 1) -> first max = bucket 0
        (0, [1.0, 1.0, 1.0, 0.0]),
        # exact tie between 1 and 2 only: dots (1, 2.5, 2.5)
        (1, [1.0, 1.0, 4.0, 0.0]),
        # near-tie: dots (1, 1, 1+eps) — bucket 2 wins strictly by 2^-51
        (2, [1.0 - eps, 1.0 + eps, 1.0 + eps, 0.0]),
        # near-tie the other way: dots (1+eps, 1, 1) — bucket 0 wins
        (3, [1.0 + eps, 1.0 + eps, 1.0 - eps, 0.0]),
        # no tie, sanity: dots (2.125, 2, 0.125)
        (4, [4.0, 0.25, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vid int, v array<double>")

    # Column twin of _argmax_bucket_udf (the pre-r13 corpus form, still the
    # query-side probe form): 1-based array_position of the first maximum
    dots = _centroid_dots(F.col("v"), centroids)
    col_bucket = F.array_position(dots, F.array_max(dots)).cast("int")
    got = (
        df.select(
            "vid",
            col_bucket.alias("col_b"),
            _argmax_bucket_udf(centroids, base=1)(F.col("v")).alias("arrow_b"),
            _top_buckets_udf(centroids, 2, base=0)(F.col("v")).alias("arrow_top"),
        )
        .collect()
    )
    by_id = {r["vid"]: r for r in got}
    for vid, r in by_id.items():
        assert r["col_b"] == r["arrow_b"], (vid, r)
    # expected winners, from the exact arithmetic above
    assert by_id[0]["arrow_b"] == 1  # first of the 3-way tie (1-based)
    assert by_id[1]["arrow_b"] == 2  # first of the {1,2} tie
    assert by_id[2]["arrow_b"] == 3  # eps-winner, not the tie-break
    assert by_id[3]["arrow_b"] == 1
    assert by_id[4]["arrow_b"] == 1

    # _top_buckets_udf tie-break: descending dot, ties toward LOWER index —
    # the row_number(ORDER BY cdot DESC, bucket ASC) rule it replaced
    assert by_id[0]["arrow_top"] == [0, 1]
    assert by_id[1]["arrow_top"] == [1, 2]
    assert by_id[2]["arrow_top"][0] == 2
    assert by_id[3]["arrow_top"][0] == 0

    # the clusterer's Arrow assignment shares the same first-max rule
    from databricks_feature_store_flight_school_spark.operators.clustering import (
        assign_clusters,
    )

    assign = {
        r["id"]: r["cluster"]
        for r in assign_clusters(df, "vid", "v", centroids).collect()
    }
    assert assign[0] == 0 and assign[1] == 1 and assign[2] == 2
    assert assign[3] == 0 and assign[4] == 0
