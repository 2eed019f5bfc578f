"""Hashed-n-gram linear quality classifier (ops/classify.py): feature
map shape, training separability, a pure-Python full-batch-GD mirror
over Spark-extracted features, and the zero-shuffle scoring plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.ops import classify as cl


GOLD = [
    "the committee published a detailed annual report on regional trade",
    "researchers measured the effect of irrigation on crop yield",
    "the library catalog lists every edition with its printing year",
    "engineers documented the bridge inspection findings thoroughly",
    "the court summarized the precedent in a careful written opinion",
    "astronomers charted the orbital period of the outer moons",
]
JUNK = [
    "click here buy now cheap cheap discount $$$ win win",
    "xz9 qq7 zzz kkk lorem qqqq zx zx zx spam spam",
    "FREE FREE FREE subscribe like smash subscribe bell icon",
    "asdf asdf jkl jkl qwerty zxcvb uiop uiop",
    "limited offer act now now now buy buy buy",
    "@@@@ #### $$$$ %%%% ^^^^ &&&& **** ((((",
]


@pytest.fixture()
def labeled(spark):
    rows = [(1.0, t) for t in GOLD] + [(0.0, t) for t in JUNK]
    return spark.createDataFrame(rows, "label double, text string")


def test_hashed_features_shape(spark):
    nf = 1 << 12
    df = spark.createDataFrame(
        [(1, "Alpha beta  GAMMA"), (2, "one"), (3, ""), (4, None)],
        "i int, t string",
    )
    got = {
        r.i: r.f
        for r in df.select(
            "i",
            cl.hashed_ngram_features(F.col("t"), n_features=nf).alias("f"),
        ).collect()
    }
    # 3 unigrams + 2 bigrams + bias
    assert len(got[1]) == 6 and got[1][-1] == nf
    assert all(0 <= f <= nf for f in got[1])
    # casefolding: "Alpha" and "alpha" hash identically
    alt = df.filter("i = 1").select(
        cl.hashed_ngram_features(F.lit("ALPHA BETA gamma"), n_features=nf)
    ).collect()[0][0]
    assert alt == got[1]
    assert len(got[2]) == 2  # one unigram + bias (no bigrams)
    assert got[3] == [nf]  # empty text: bias only
    assert got[4] is None  # NULL text stays NULL


def test_training_separates_synthetic_quality(spark, labeled):
    nf = 1 << 12
    w = cl.train_quality_classifier(
        labeled, n_features=nf, iters=30, lr=1.0, l2=1e-6
    )
    scored = cl.classifier_score(labeled, w, n_features=nf)
    rows = scored.collect()
    gold = [r.quality_prob for r in rows if r.label == 1.0]
    junk = [r.quality_prob for r in rows if r.label == 0.0]
    assert min(gold) > 0.8, gold
    assert max(junk) < 0.2, junk
    # the weights table is a reusable artifact: persisting and reloading
    # scores identically (the production write-once/score-many contract)
    reloaded = spark.createDataFrame(w.collect(), w.schema)
    again = {
        r.text: r.quality_prob
        for r in cl.classifier_score(labeled, reloaded, n_features=nf).collect()
    }
    assert all(abs(again[r.text] - r.quality_prob) < 1e-12 for r in rows)


def test_training_matches_python_gd_mirror(spark, labeled):
    """Exact math pin: extract the hashed feature bags once from Spark,
    run the same full-batch GD in pure Python, and compare probabilities
    after k iterations. The mirror is dense; the engine's sparse table
    is equivalent because absent features are exactly 0 (0 decays to
    0)."""
    nf, iters, lr, l2 = 1 << 10, 6, 0.7, 1e-4
    feats = [
        (r.label, list(r.f))
        for r in labeled.select(
            "label",
            cl.hashed_ngram_features(F.col("text"), n_features=nf).alias("f"),
        ).collect()
    ]
    n_docs = len(feats)
    w = [0.0] * (nf + 1)
    for _ in range(iters):
        grad = [0.0] * (nf + 1)
        for y, fs in feats:
            p = 1.0 / (1.0 + math.exp(-sum(w[f] for f in fs)))
            for f in fs:
                grad[f] += (p - y) / n_docs
        w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, grad)]
    expect = {
        tuple(fs): 1.0 / (1.0 + math.exp(-sum(w[f] for f in fs)))
        for _, fs in feats
    }

    got_w = cl.train_quality_classifier(
        labeled, n_features=nf, iters=iters, lr=lr, l2=l2
    )
    scored = cl.classifier_score(labeled, got_w, n_features=nf)
    got_feats = {
        tuple(r.f): r.quality_prob
        for r in scored.select(
            cl.hashed_ngram_features(F.col("text"), n_features=nf).alias("f"),
            "quality_prob",
        ).collect()
    }
    for k, v in expect.items():
        assert abs(got_feats[k] - v) < 1e-6, (v, got_feats[k])


def test_training_rejects_empty_and_skips_nulls(spark):
    df = spark.createDataFrame(
        [(None, "text"), (1.0, None)], "label double, text string"
    )
    with pytest.raises(ValueError, match="no labeled rows"):
        cl.train_quality_classifier(df, n_features=64, iters=1)


def test_scoring_is_row_local_no_python(spark, labeled):
    """Scoring = scan -> single-row broadcast join -> projection: the
    corpus side must see NO shuffle exchange and NO Python eval."""
    import contextlib
    import io

    nf = 1 << 10
    w = spark.createDataFrame(
        [(0, 0.1), (int(nf), -0.2)], "feature int, weight double"
    )
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        cl.classifier_score(labeled, w, n_features=nf).explain("formatted")
    p = plan.getvalue()
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Exchange hashpartitioning" not in p, p
    assert "BroadcastExchange" in p


def test_null_text_scores_null(spark):
    tiny = spark.createDataFrame(
        [(1.0, "good solid prose here"), (0.0, "zz qq spam")],
        "label double, text string",
    )
    w = cl.train_quality_classifier(tiny, n_features=256, iters=3)
    df = spark.createDataFrame([(1, None)], "i int, text string")
    out = cl.classifier_score(df, w, n_features=256).collect()
    assert out[0].quality_prob is None


def test_arrow_scoring_matches_expression_path(spark, labeled):
    """arrow=True runs the weighted sum in a numpy segment-sum over the
    same JVM-hashed feature ids — probabilities must match the
    expression fold to float precision, including NULL text and
    empty-text (bias-only) rows."""
    nf = 1 << 10
    w = cl.train_quality_classifier(labeled, n_features=nf, iters=5)
    probe = labeled.unionByName(
        spark.createDataFrame(
            [(None, None), (None, ""), (None, "single")],
            "label double, text string",
        )
    )
    a = {r.text: r.quality_prob
         for r in cl.classifier_score(probe, w, n_features=nf).collect()}
    b = {r.text: r.quality_prob
         for r in cl.classifier_score(
             probe, w, n_features=nf, arrow=True
         ).collect()}
    assert set(a) == set(b)
    for k in a:
        if a[k] is None:
            assert b[k] is None, k
        else:
            assert abs(a[k] - b[k]) < 1e-12, (k, a[k], b[k])


def test_classifier_slot_query_matches_oracle_and_no_collisions(spark):
    """The round-5 registry slot (queries.classifier_score): the REAL
    scoring plan with pinned literal weights must value-match the
    DuckDB oracle, and the oracle's string-join equivalence rests on a
    checkable property — no corpus token other than the weighted ones
    may hash to a weighted feature id. Asserted here at sf0.001 (the
    whitespace vocabulary is identical at every shipped SF)."""
    import duckdb

    from faang_pydantics_validation_spark import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weighted = dict(Q.CLASSIFIER_SLOT_TOKENS)
    ids = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim("text")), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("tok")
        )
        .distinct()
        .select(
            "tok",
            F.pmod(F.xxhash64("tok"), F.lit(Q.CLASSIFIER_SLOT_NF))
            .cast("int")
            .alias("fid"),
        )
        .collect()
    )
    weighted_ids = {r.fid for r in ids if r.tok in weighted}
    colliders = [
        (r.tok, r.fid)
        for r in ids
        if r.tok not in weighted and r.fid in weighted_ids
    ]
    assert not colliders, colliders

    got = {
        r.doc_id: r.quality_prob
        for r in Q.q_classifier_score(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(Q.ORACLE_SQL["classifier_score"]).fetchall()
    }
    assert got == want and len(got) > 0
