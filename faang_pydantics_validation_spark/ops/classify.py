"""Linear quality classifier over hashed bag-of-n-grams — the published
CommonCrawl quality-scoring recipe (GPT-3, Brown et al. 2020 appendix A;
CCNet, Wenzek et al. 2020; LLaMA, Touvron et al. 2023 — all score web
documents with a linear classifier against a "gold" reference corpus and
keep/sample by the score), with the fastText feature map (Joulin et al.
2016: hashed unigrams + bigrams, a linear model, nothing deeper).

Reference parity note: the reference engine (/root/reference, a
pydantic rule validator) has no learned scorer — this module is part of
the training-data-pipeline surface the brief adds on top of SURVEY §2.

Everything is Spark-native and shaped for 10^12 rows:

* the FEATURE MAP is a row-local expression — lowercase, split on
  ``\\s+``, hash each unigram and adjacent-pair bigram into
  ``pmod(xxhash64(.), n_features)``. No vocabulary, no fit step, no
  Python: the hashing trick means the map is stateless and identical on
  every executor.
* SCORING is row-local after a single-row broadcast join: the weight
  TABLE (``n_features + 1`` rows, the last one the bias) collapses to
  one ``array<double>`` shipped like a broadcast hash join's build side
  (2^18 features ≈ 2 MB), and the logit is one ``aggregate`` fold over
  the document's feature ids — the corpus never shuffles, scoring fuses
  with the scan.
* TRAINING is full-batch gradient descent with the weights a DataFrame
  end-to-end (same no-driver contract as ``train_ivf_centroids`` /
  ``train_pq_codebooks``). Per iteration: probabilities are computed
  row-locally from the broadcast weights, then the gradient is ONE
  explode → partial+final sum keyed by feature id — the exchange
  carries at most ``n_features`` rows per mapper regardless of corpus
  size, and the Zipf head of frequent tokens collapses map-side. The
  bias trains as an ordinary always-on feature (id ``n_features``), so
  there is no driver-side scalar anywhere. Deterministic up to
  floating-point reassociation in the partial sums.

Full-batch GD (not SGD) is the right distributed trade: fastText's SGD
is a single-machine access pattern; at cluster scale each pass is a
scan, and logistic regression on hashed features converges in tens of
passes. For quality screening the operating point is a RANKING
threshold, not a calibrated probability, so early stopping is benign.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default feature-space size — fastText's standard bucket count trade:
#: big enough that collisions don't bend a linear model, small enough
#: that the weight array broadcasts in ~2 MB.
N_FEATURES = 1 << 18


def hashed_ngram_features(
    text: Column, n_features: int = N_FEATURES, bigrams: bool = True
) -> Column:
    """``array<int>`` of hashed token ids for a text column — the
    fastText feature map as a pure row-local expression.

    * tokens: lowercase, split on ``\\s+``, empties dropped (so leading
      whitespace does not mint a phantom token);
    * unigrams: ``pmod(xxhash64(tok), n_features)``;
    * bigrams: adjacent pairs joined with ``\\x01`` (a byte no tokenizer
      emits) and hashed into the same space, fastText-style;
    * the BIAS feature id ``n_features`` is appended to every row, so a
      weight array of length ``n_features + 1`` scores documents with no
      special case — and the bias trains like any other feature.

    Bag semantics: duplicate ids stay (term frequency weights the fold).
    NULL text yields NULL (callers decide the default).
    """
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )
    uni = F.transform(
        toks, lambda t: F.pmod(F.xxhash64(t), F.lit(n_features)).cast("int")
    )
    feats = uni
    if bigrams:
        n = F.size(toks)
        bi = F.transform(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            lambda t, i: F.pmod(
                F.xxhash64(
                    F.concat_ws("\x01", t, F.element_at(toks, i + 2))
                ),
                F.lit(n_features),
            ).cast("int"),
        )
        feats = F.concat(uni, bi)
    return F.when(
        text.isNotNull(),
        F.concat(feats, F.array(F.lit(int(n_features)).cast("int"))),
    )


def _weight_row(weights: DataFrame, n_features: int) -> DataFrame:
    """Collapse the sparse (feature, weight) table into ONE broadcast
    row holding a dense ``array<double>`` indexed by feature id
    (features absent from the table are 0.0) — the same single-row
    broadcast transport as ``_pq_codebook_row``. ``n_features + 1``
    doubles ≈ 2 MB at 2^18.

    Densification is a range LEFT-join then a positional extract from
    the (feature-sorted) collect_list — O(n log n) in the feature
    space and independent of the corpus. The tempting alternatives are
    quadratic: a per-slot ``element_at`` over a Spark map is a LINEAR
    scan of ArrayBasedMapData per lookup (measured: it froze the bench
    at 2^18 features), and folding positional writes copies the array
    per entry."""
    full = (
        weights.sparkSession.range(0, n_features + 1)
        .select(F.col("id").cast("int").alias("feature"))
        .join(weights, "feature", "left")
        .select("feature", F.coalesce("weight", F.lit(0.0)).alias("weight"))
    )
    row = full.agg(
        F.array_sort(
            F.collect_list(F.struct("feature", "weight"))
        ).alias("__e")
    ).select(F.transform(F.col("__e"), lambda s: s["weight"]).alias("__w"))
    return F.broadcast(row)


def collect_dense_weights(weights: DataFrame, n_features: int):
    """Dense ``np.ndarray`` of length ``n_features + 1`` from the
    sparse weight table — the Arrow scorer's transport. The table is a
    bounded artifact (≤ n_features + 1 rows, ~2 MB dense), so the
    collect is cut-sized, never corpus-sized; hoist it via
    ``classifier_score(dense_weights=...)`` when scoring many frames
    from one artifact (resumable curate's shard groups)."""
    import numpy as np

    dense = np.zeros(n_features + 1, dtype=np.float64)
    for r in weights.collect():
        dense[int(r["feature"])] = float(r["weight"])
    return dense


def prepare_weight_row(weights: DataFrame, n_features: int) -> DataFrame:
    """Densify the sparse weight table ONCE and pin the result
    (``localCheckpoint``) so repeated :func:`classifier_score` calls —
    resumable curate scores every shard group against the same artifact
    — reuse the materialized single row instead of re-running the
    range-join densification (and the artifact's parquet scan behind a
    lazy read) per call. Returns the broadcast-hinted one-row frame
    ``classifier_score(weight_row=...)`` accepts."""
    # localCheckpoint materializes through the hint unchanged; re-hint
    # the pinned frame so the downstream crossJoin stays a broadcast
    return F.broadcast(
        _weight_row(weights, n_features).localCheckpoint(eager=True)
    )


def _logit(feats: Column) -> Column:
    """Row-local logit: Σ w[f] over the document's feature bag, folded
    against the broadcast weight array ``__w``."""
    return F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, f: acc + F.element_at(F.col("__w"), f + 1),
    )


def _sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def classifier_n_features(weights: DataFrame) -> int:
    """Recover the feature-space size from a persisted weight table: the
    bias always trains (it is appended to every document), so the
    maximum feature id IS ``n_features``. Lets consumers score with just
    the artifact — no side-channel config to keep in sync."""
    row = weights.agg(F.max("feature").alias("m")).collect()[0]
    if row["m"] is None:
        raise ValueError("empty classifier weight table")
    return int(row["m"])


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    n_features: int = N_FEATURES,
    bigrams: bool = True,
    out_col: str = "quality_prob",
    arrow: bool = False,
    weight_row: DataFrame | None = None,
    dense_weights=None,
) -> DataFrame:
    """Append ``out_col`` — the classifier probability in [0, 1] — to
    every row. NULL text scores NULL. Two executions, identical
    results:

    * ``arrow=False`` (default): scan → single-row broadcast join → one
      projection. Zero shuffle, zero Python — but the logit fold is a
      higher-order function (CodegenFallback, interpreted; ~150 µs/doc
      measured on code files).
    * ``arrow=True``: feature hashing STAYS a JVM expression (bit-equal
      ids), only the weighted sum runs in an Arrow-batched
      ``mapInPandas`` — one ``np.add.reduceat`` segment sum per batch
      over the dense weight vector, shipped once per executor as a
      2 MB Python broadcast. Still zero shuffle; the sanctioned escape
      hatch for exactly this shape (a hot row-local loop the expression
      engine only interprets). Measured 2.4× faster on 200k code files
      (same-session alternating A/B, best 34.6 s → 14.5 s).

    Which default where: ``arrow=True`` for a standalone scoring pass
    AND for curate's end-to-end chain — the round-5 alternating A/B at
    1M rows measured the full curate pipeline (annotate chain + dedup
    window + write) at best 260.3 s expression-fused vs 171.4 s with
    the Arrow scorer spliced mid-chain (**1.52× end to end**), so the
    "keep the chain fused" argument LOSES at corpus scale and curate
    now defaults to Arrow (``--classifier-fused`` restores the
    expression form). The expression path remains the right choice
    when the caller needs a pure-JVM plan (no Python workers at all) or
    scores tiny frames where the Arrow batch setup dominates.

    ``weight_row``: optional pre-densified single-row weight frame (as
    built by :func:`prepare_weight_row`) for the expression path.
    Callers that score MANY frames from one artifact (e.g. resumable
    curate's per-shard groups) densify once and pass it here; otherwise
    every call re-runs the range-join densification — and, behind a
    lazy read, the parquet scan of the artifact itself.
    ``dense_weights``: the Arrow-path analog — a prebuilt
    ``np.ndarray`` of length ``n_features + 1`` (see
    :func:`collect_dense_weights`); when absent the weight table is
    collected per call.
    """
    feats = hashed_ngram_features(
        F.col(text_col), n_features=n_features, bigrams=bigrams
    )
    if not arrow:
        row = (
            weight_row
            if weight_row is not None
            else _weight_row(weights, n_features)
        )
        return (
            df.crossJoin(row)
            .withColumn(out_col, _sigmoid(_logit(feats)))
            .drop("__w")
        )

    import numpy as np

    dense = (
        dense_weights
        if dense_weights is not None
        else collect_dense_weights(weights, n_features)
    )
    bw = df.sparkSession.sparkContext.broadcast(dense)

    from pyspark.sql.types import DoubleType, StructField, StructType

    staged = df.withColumn("__f", feats)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )

    def _score(batches):
        import pandas as pd

        w = bw.value
        for pdf in batches:
            col = pdf["__f"]
            lens = np.array(
                [0 if x is None else len(x) for x in col], dtype=np.int64
            )
            flat = (
                np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in col if x is not None]
                )
                if lens.sum()
                else np.empty(0, dtype=np.int64)
            )
            sums = np.zeros(len(col), dtype=np.float64)
            nz = lens > 0
            if flat.size:
                offs = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=offs[1:])
                sums[nz] = np.add.reduceat(w[flat], offs)
            prob = 1.0 / (1.0 + np.exp(-sums))
            res = pdf.drop(columns=["__f"])
            res[out_col] = pd.Series(prob, index=pdf.index).where(
                pd.Series([x is not None for x in col], index=pdf.index)
            )
            yield res

    return staged.mapInPandas(_score, schema=out_schema)


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    bigrams: bool = True,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> DataFrame:
    """Train the logistic model on a labeled corpus (``label_col`` = 1.0
    for gold/reference documents, 0.0 for junk) and return the sparse
    ``(feature int, weight double)`` table — only features with nonzero
    weight appear; the bias rides as feature id ``n_features``.

    Per iteration (one job graph, lineage truncated by an executor-side
    ``localCheckpoint`` of the n_features-row weight table):

    1. ``p`` per document — row-local from the broadcast weight array;
    2. gradient — ``posexplode`` the feature bag with the row's
       ``(p - y)`` residual, ONE partial+final ``sum`` keyed by feature
       id (bounded cardinality: the exchange is feature-space-sized, not
       corpus-sized), divided by the corpus count;
    3. update — LEFT join old weights with gradients:
       ``w ← w − lr · (g + l2 · w)``. Features absent from this pass
       keep their (decayed) weight.

    NULL-text and NULL-label rows are excluded from training. The
    returned table feeds :func:`classifier_score` directly and persists
    like any other index artifact (parquet write; reload for scoring).
    """
    from pyspark import StorageLevel

    labeled = df.filter(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("double").alias("__y"),
        hashed_ngram_features(
            F.col(text_col), n_features=n_features, bigrams=bigrams
        ).alias("__f"),
    )
    # every iteration scans the labeled features: persist ONCE (feature
    # bags are int arrays — far smaller than the source text) instead of
    # re-running the scan + tokenize + hash chain `iters` times
    labeled = labeled.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = labeled.count()
    if n_docs == 0:
        raise ValueError("no labeled rows to train on")
    spark = df.sparkSession
    weights = spark.createDataFrame(
        [(int(n_features), 0.0)], "feature int, weight double"
    )
    for _ in range(iters):
        staged = labeled.crossJoin(_weight_row(weights, n_features))
        resid = staged.select(
            "__f", (_sigmoid(_logit(F.col("__f"))) - F.col("__y")).alias("__e")
        )
        grads = (
            resid.select(F.explode("__f").alias("feature"), "__e")
            .groupBy("feature")
            .agg((F.sum("__e") / F.lit(float(n_docs))).alias("__g"))
        )
        weights = (
            weights.join(grads, "feature", "full")
            .select(
                "feature",
                (
                    F.coalesce(F.col("weight"), F.lit(0.0))
                    - F.lit(lr)
                    * (
                        F.coalesce(F.col("__g"), F.lit(0.0))
                        + F.lit(l2) * F.coalesce(F.col("weight"), F.lit(0.0))
                    )
                ).alias("weight"),
            )
            .localCheckpoint(eager=True)
        )
    labeled.unpersist()
    return weights
