"""Deduplication operators for a web-scale document table.

Four tiers, cheapest first — exactly the ladder a 100 TB training-data
pipeline runs:

1. exact        — sha256(content) groupBy; one shuffle on the hash.
2. n-gram Jaccard — exact set similarity on shingles for CANDIDATE pairs
                  (never all pairs).
3. MinHash+LSH  — signature → bands → band-bucket join; candidate pairs
                  are only those sharing a band bucket, so the quadratic
                  blowup is confined to near-duplicate clusters.
4. SimHash      — 64-bit fingerprints, banded for candidate generation,
                  verified by Hamming distance (F.bit_count).

Plus one SUB-document tier: corpus-level line dedup (CCNet/RefinedWeb
"remove lines repeated across documents"), which rewrites payloads
instead of dropping rows — boilerplate that document-level dedup can
never see.

Everything is native Column expressions (xxhash64 / transform / aggregate
folds) — no Python UDFs anywhere, so each stage is whole-stage-codegen'd
and the only shuffles are the band-bucket groupBys/joins on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ exact --


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(content_hash, n_copies, keep_id, dup_ids) for every group with >1
    copies. One shuffle on the 256-bit hash — perfectly uniform keys, no
    skew by construction."""
    h = F.sha2(F.col(text_col), 256)
    return (
        df.select(h.alias("content_hash"), F.col(id_col).alias("__id"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("__id").alias("keep_id"),
            F.sort_array(F.collect_list("__id")).alias("all_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical survivor per distinct content: min(id) per sha256 group.
    Returns (content_hash, doc_id). Deterministic — no dropDuplicates
    (whose survivor depends on partition order)."""
    h = F.sha2(F.col(text_col), 256)
    return (
        df.select(h.alias("content_hash"), F.col(id_col).alias("doc_id"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )


# --------------------------------------------------------------- shingles --


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens (empty text ⇒ empty array)."""
    trimmed = F.trim(F.lower(text))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles. Documents shorter than k tokens get one
    shingle = the whole text (so they still hash somewhere)."""
    tokens = tokenize(text)
    n = F.size(tokens)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
    )
    return F.array_distinct(windows)


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays.

    The union COUNT is |A| + |B| − |A∩B| (inclusion-exclusion over
    distinct arrays): two O(1) length lookups instead of
    ``array_union``'s per-pair hash-set build and array
    materialization — only the intersect walks the arrays. Identical
    counts, identical NULL/empty semantics (NULL input ⇒ NULL sizes ⇒
    the ``when`` falls through to 0.0, as before)."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(shingles_a) + F.size(shingles_b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    text_a: str,
    text_b: str,
    k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Append an exact ``jaccard`` column to a candidate-pair frame and
    filter by threshold. Narrow — the pair frame was already joined."""
    out = pairs.withColumn(
        "jaccard", jaccard(word_shingles(F.col(text_a), k), word_shingles(F.col(text_b), k))
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


# ---------------------------------------------------------------- minhash --


def _hash64(col: Column, seed: Column | None, hash_fn: str) -> Column:
    """Seeded 64-bit string hash, pluggable for oracle reproducibility.

    * ``'xxhash64'`` — Spark-native, codegen'd, the 100 TB default.
    * ``'md5'`` — top 60 bits of md5 (seed appended as ``:<seed>``):
      slower, but exactly reproducible in DuckDB as
      ``CAST(('0x'||substring(md5(s||':seed'),1,15)) AS BIGINT)`` —
      parity pinned by tests/test_ops.py::test_md5_hash64_duckdb_parity.
      Used by the oracle contract queries only.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col) if seed is None else F.xxhash64(col, seed)
    if hash_fn == "md5":
        inp = (
            col
            if seed is None
            else F.concat(col, F.lit(":"), seed.cast("string"))
        )
        return F.conv(
            F.substring(F.md5(inp.cast("binary")), 1, 15), 16, 10
        ).cast("bigint")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def signature_from_shingles(
    sh: Column, num_perm: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """array<bigint> of ``num_perm`` minhash values: min over shingles of
    hash64(shingle, seed_i). Row-local — no shuffle, no UDF.

    IMPORTANT: pass a materialized COLUMN of shingles (a cheap attribute
    reference), never the shingle-building expression itself — Spark
    re-evaluates higher-order-function lambda subtrees per element, so an
    inline expression would rebuild the shingle array num_perm times per
    row (measured: ~100x slowdown)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: _hash64(s, seed, hash_fn))
        ),
    )


def with_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, shingles) — tokens and shingles built in SEPARATE
    projections so each stays a single-evaluation column (CollapseProject
    keeps the boundary: multiply-referenced non-cheap aliases are not
    inlined). Empty shingle sets map to [''] so they still hash."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("__tokens")
    )
    n = F.size(F.col("__tokens"))
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(F.col("__tokens"), i, k)),
    )
    raw = toks.select("doc_id", F.array_distinct(windows).alias("__sh_raw"))
    return raw.select(
        "doc_id",
        F.when(F.size("__sh_raw") > 0, F.col("__sh_raw"))
        .otherwise(F.array(F.lit("")))
        .alias("shingles"),
    )


def lsh_bands(
    sig: Column, bands: int, rows_per_band: int, hash_fn: str = "xxhash64"
) -> Column:
    """array<struct<band:int, bucket:bigint>> — bucket = hash of the band's
    signature slice. bands * rows_per_band must equal len(sig). Static
    Python loop: band count is a plan-time constant, so each band slice is
    its own codegen'd expression."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _hash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    ),
                    None,
                    hash_fn,
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 8,
    k: int = 3,
    max_bucket_size: int | None = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing ≥1 LSH band
    bucket.

    Plan shape: narrow signature pass → explode bands (fan-out = bands) →
    self-join on (band, bucket) → distinct pairs. The join key includes the
    band index so buckets from different bands never collide.

    ``max_bucket_size`` drops buckets holding more than that many docs
    BEFORE pairing: an over-full bucket is boilerplate/template collision,
    not near-duplication, and pairing it is quadratic — this cap is what
    keeps the operator viable on a 10^12-doc corpus where some band
    buckets would otherwise hold millions of rows. None disables.
    """
    rows_per_band = num_perm // bands
    assert bands * rows_per_band == num_perm, "bands must divide num_perm"
    shingled = with_shingles(df, id_col, text_col, k)
    signed = shingled.select(
        "doc_id",
        signature_from_shingles(
            F.col("shingles"), num_perm, hash_fn
        ).alias("__sig"),
    )
    banded = signed.select(
        "doc_id",
        F.explode(
            lsh_bands(F.col("__sig"), bands, rows_per_band, hash_fn)
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__bsize")
        )
        banded = banded.join(
            sizes.filter(F.col("__bsize") <= max_bucket_size), ["band", "bucket"]
        ).drop("__bsize")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=(F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.7,
    max_bucket_size: int | None = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash-LSH pipeline: candidates → exact Jaccard verify →
    (id_a, id_b, jaccard) pairs above threshold.

    The verify join re-fetches only candidate docs' texts (semi-join-sized,
    not table-sized) — at 100 TB the candidate set is orders of magnitude
    smaller than the corpus.
    """
    cands = minhash_candidates(
        df, id_col, text_col, num_perm, bands, k, max_bucket_size, hash_fn
    )
    shingled = with_shingles(df, id_col, text_col, k)
    sh_a = shingled.select(
        F.col("doc_id").alias("__ida"), F.col("shingles").alias("__sh_a")
    )
    sh_b = shingled.select(
        F.col("doc_id").alias("__idb"), F.col("shingles").alias("__sh_b")
    )
    enriched = (
        cands.join(sh_a, on=F.col("id_a") == F.col("__ida"))
        .join(sh_b, on=F.col("id_b") == F.col("__idb"))
    )
    verified = enriched.withColumn(
        "jaccard", jaccard(F.col("__sh_a"), F.col("__sh_b"))
    ).filter(F.col("jaccard") >= threshold)
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------- simhash --


def with_simhash(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash as bigint. Per-token hash64,
    signed bit votes folded row-locally (aggregate over the token array;
    no shuffle), sign vector packed into one bigint. With
    ``hash_fn='md5'`` the per-token hash is 60-bit (top 4 bits always
    vote -1 and never set) — slightly fewer effective bits, identical
    semantics, DuckDB-reproducible.

    Tokens → votes → packed are three separate projections: the vote
    array is referenced 64 times by the packing expression, so it must be
    a materialized attribute, not an inline fold (same re-evaluation trap
    as :func:`signature_from_shingles`)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("__tokens")
    )
    # one xxhash64 per token, materialized BEFORE the bit fold — the fold
    # references its hash 64 times (once per bit), and lambda variables are
    # bound values while expressions would be re-evaluated per reference
    hashes = toks.select(
        "doc_id",
        F.transform(
            F.col("__tokens"), lambda t: _hash64(t, None, hash_fn)
        ).alias("__hashes"),
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), 64)
    votes = hashes.select(
        "doc_id",
        F.aggregate(
            F.col("__hashes"),
            zeros,
            lambda acc, h: F.zip_with(
                acc,
                F.array(
                    *[
                        F.when(
                            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1).cast("long"),
                        ).otherwise(F.lit(-1).cast("long"))
                        for b in range(64)
                    ]
                ),
                lambda a, v: a + v,
            ),
        ).alias("__votes"),
    )
    # pack: bit b set iff votes[b] > 0; bit 63 enters as the signed-64
    # negative offset so the sum stays inside bigint
    terms = [
        F.when(
            F.element_at(F.col("__votes"), b + 1) > 0,
            F.lit(-(2**63) if b == 63 else (1 << b)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    packed = terms[0]
    for t in terms[1:]:
        packed = packed + t
    return votes.select("doc_id", packed.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``bands`` chunks (pigeonhole: any pair within Hamming distance
    bands-1 shares ≥1 exact chunk), join on (band, chunk), verify
    bit_count(xor) ≤ max_hamming. Returns (id_a, id_b, hamming).

    ``max_bucket_size`` caps (band, chunk) bucket population before the
    self-join, exactly like :func:`minhash_candidates`: on a
    template-heavy corpus a 16-bit chunk shared by boilerplate puts ~all
    documents in one bucket and the join goes quadratic per bucket — at
    10^12 docs an average bucket already holds ~10^7 rows. Over-full
    buckets are boilerplate collision, not near-duplication; dropping
    them bounds the pair fan-out to max_bucket_size² per bucket. None
    disables (exhaustive semantics for small corpora)."""
    chunk_bits = 64 // bands
    sh = with_simhash(df, id_col, text_col, hash_fn)
    mask = (1 << chunk_bits) - 1
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "chunk").agg(
            F.count(F.lit(1)).alias("__bsize")
        )
        banded = banded.join(
            sizes.filter(F.col("__bsize") <= max_bucket_size), ["band", "chunk"]
        ).drop("__bsize")
    left, right = banded.alias("l"), banded.alias("r")
    pairs = (
        left.join(
            right,
            on=(F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ------------------------------------------------------------- components --


#: Edge-count ceiling for the driver-local union-find fast path of
#: :func:`duplicate_components`. A near-dup pair graph is edges over the
#: DUPLICATED corpus slice only (pairs << corpus), so at bench scale it
#: is thousands-to-millions of edges — and the distributed loop's cost
#: there is not compute but JOB CHURN: each round is 2 joins + a
#: checkpoint + a convergence probe, ~8-10 AQE stage-jobs of pure
#: driver-serial scheduling latency (measured: ~150 sub-second jobs,
#: ~30 s core-count-independent, in the composed curate chain). Below
#: this ceiling ONE Arrow collect + an in-memory union-find replaces the
#: whole loop; above it (a 100 TB corpus with billions of duplicate
#: edges) the O(log diameter) distributed loop runs unchanged. Same
#: driver-local-when-it-fits tier the BPE trainer uses
#: (ops/bpe.py driver_vocab_max).
DRIVER_EDGES_MAX = 2_000_000


def _components_local(edges_pdf) -> list[tuple]:
    """Union-find over a collected edge list; returns the same
    (doc_id, component_id = min reachable id) pairs as the distributed
    loop, exactly (min-label propagation converges to the per-component
    minimum, which is what the DSU computes here)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_pdf["src"], edges_pdf["dst"]):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    roots = {x: find(x) for x in parent}
    for x, r in roots.items():
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    return [(x, comp_min[r]) for x, r in roots.items()]


def duplicate_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_edges_max: int | None = None,
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs:
    ``(doc_id, component_id)`` for every id appearing in ``pairs``, where
    ``component_id`` is the MINIMUM id reachable through the pair graph.
    The canonical last stage of the dedup ladder — minhash/simhash emit
    PAIRS, but transitive clusters (A≈B, B≈C ⇒ {A,B,C}) need one
    representative per component, not per pair.

    Algorithm: min-label propagation + pointer jumping (path doubling).
    Each round does
      1. propagate:  comp(v) ← min(comp(v), min over neighbors comp(u))
      2. jump:       comp(v) ← comp(comp(v))
    so the distance a minimum travels roughly doubles per round —
    convergence in O(log diameter) rounds, not O(diameter) (the classic
    MapReduce-CC recipe, e.g. Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14).

    Scale shape: every round is two shuffles keyed on ids of the PAIR
    GRAPH only (near-dup pairs ≪ corpus; the full table never enters).
    ``localCheckpoint`` truncates lineage each round so the plan stays
    constant-size across iterations — on a multi-executor cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
    fault-tolerant truncation; executor-local blocks are fine on one node.

    Ids keep their column type; "minimum" is the type's natural ordering.
    Docs in no pair are absent (they are their own singleton component).

    ``driver_edges_max`` (default :data:`DRIVER_EDGES_MAX`): edge-count
    ceiling for the driver-local union-find fast path — below it, one
    bounded Arrow collect + an in-memory DSU replaces the round loop
    with an identical result; 0 forces the distributed loop.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # empty pair graph (a clean corpus — the common near-dup outcome):
    # the loop below would still pay a full round of join jobs over
    # empty frames; one cheap scan of the already-checkpointed edges
    # skips it. Every per-round job is driver-serial FIXED cost in a
    # composed pipeline, so rounds and jobs-per-round are both minimized.
    if driver_edges_max is None:
        driver_edges_max = DRIVER_EDGES_MAX
    n_edges = edges.count()
    if n_edges == 0:
        max_iter = 0
    elif n_edges <= driver_edges_max:
        # driver-local fast path: the pair graph fits one bounded Arrow
        # collect, so the whole O(log d)-round join loop (and its ~10
        # scheduling-latency jobs per round) collapses to a single job
        # plus an in-memory DSU. Result is bit-identical to the loop —
        # pinned by tests/test_ops.py (local == distributed on a random
        # multi-component graph).
        spark = pairs.sparkSession
        out = _components_local(edges.toPandas())
        schema = T.StructType(
            [
                T.StructField("doc_id", edges.schema["src"].dataType),
                T.StructField("component_id", edges.schema["src"].dataType),
            ]
        )
        return spark.createDataFrame(out, schema)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = labels.join(nbr, labels["id"] == nbr["nid"], "left").select(
            "id",
            F.col("comp").alias("__old"),
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
        ptr = prop.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        # convergence flag rides INSIDE the checkpointed round: the old
        # per-round `new JOIN labels` change-probe was one extra join
        # job per round; a flag column costs nothing and the probe
        # becomes a cheap scan of blocks already in memory
        new = (
            prop.join(ptr, prop["comp"] == ptr["pid"], "left")
            .select(
                "id",
                F.coalesce("pcomp", "comp").alias("comp"),
                (F.coalesce("pcomp", "comp") != F.col("__old")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter("__chg").limit(1).count()
        labels = new.drop("__chg")
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
    )


def drop_duplicate_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Keep exactly one representative per near-duplicate component: a row
    survives iff its id IS its component's minimum (or it is in no pair).
    The survivor rule is deterministic — never dropDuplicates, whose
    survivor depends on partition order. One left-anti join against the
    loser set; no forced broadcast — at web scale losers can be a large
    fraction of the corpus, so AQE picks broadcast vs shuffle by size."""
    comps = duplicate_components(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    losers = comps.filter(F.col("doc_id") != F.col("component_id")).select(
        F.col("doc_id").alias("__loser_id")
    )
    return df.join(losers, df[id_col] == F.col("__loser_id"), "left_anti")


# ------------------------------------------------- corpus-level line dedup --


def dedup_lines_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_docs: int = 2,
    min_line_chars: int = 10,
    out_col: str = "text_line_deduped",
) -> DataFrame:
    """Remove lines whose whitespace-normalized form appears in at least
    ``min_docs`` DISTINCT documents — the line/paragraph-level exact
    dedup of CCNet (Wenzek et al. 2020, "paragraph-level" = line-level
    in their corpus) and RefinedWeb (Penedo et al. 2023), which strips
    cross-document boilerplate (license headers, nav bars, cookie
    banners) that document-level dedup can never see.

    Matching is on collapsed-then-trimmed whitespace (``\\s+`` → one
    space, THEN trim — so tab/space indentation and CRLF/LF variants of
    the same boilerplate line all merge); a "document" for the
    ``min_docs`` threshold is a distinct ``(id, text)`` pair, so
    duplicate ids with different payloads count separately and are
    rewritten independently; lines
    shorter than ``min_line_chars`` after normalization are never
    candidates (otherwise ``}`` and ``*/`` would vanish from every
    file). A line repeated many times inside ONE document is kept —
    that is :func:`~faang_pydantics_validation_spark.ops.text.
    repetition_metrics`'s job, not corpus dedup's. All occurrences of a
    repeated line are removed, including the first.

    Appends ``out_col`` (kept lines re-joined; NULL text stays NULL;
    a fully-boilerplate doc becomes the empty string) and
    ``n_lines_deduped``. Every other column passes through.

    Plan shape, sized for 10^12 files:

    * the exploded side carries ``(id, pos, xxhash64(norm))`` — 8-byte
      line keys, never the payload;
    * repeated-line discovery is ONE count-distinct agg on the line
      hash (partial aggregation collapses the Zipf head of boilerplate
      map-side, so the exchange carries per-task distinct lines);
    * the repeated-hash set joins back LEFT SEMI (benchmark: boilerplate
      vocabularies are tiny next to the corpus — AQE broadcasts it);
    * per-doc removed positions reduce to one array per affected doc,
      and the final LEFT join back to ``df`` on ``id_col`` is the one
      unavoidable id-keyed reshard — the same shape as CCNet's
      reshard-by-bucket in ``lm_perplexity_buckets``. The rebuild
      itself (indexed ``filter`` + ``concat_ws``) is row-local.

    The input is scanned TWICE (once to discover repeats, once as the
    join-back left side) — inherent to any corpus-global rewrite; on a
    cluster both are column-pruned object-store reads, and a caller
    that already has the table cached pays nothing extra.

    64-bit line-hash collisions merge distinct normalized lines at
    ~m^2/2^64 for m distinct lines corpus-wide — the standard trade;
    the pytest mirror pins semantics against exact string grouping.
    """
    lines_arr = F.split(F.col(text_col), r"\n")
    # collapse FIRST, trim SECOND: F.trim strips only ASCII spaces, so
    # trim-then-collapse left a residual leading space from tab
    # indentation and a trailing space from CRLF '\r' — tab-indented or
    # CRLF copies of a boilerplate line never merged with their
    # space/LF variants. Collapsing \s+ first turns every edge run
    # (tabs, \r, unicode-space-free Java \s) into a plain space trim
    # CAN strip.
    norm = F.trim(F.regexp_replace(F.col("__ldc_line"), r"\s+", " "))
    # Documents are keyed by (id, xxhash64(text)), not id alone: ids
    # are not guaranteed unique upstream (curate's repo:path@commit can
    # recur across re-ingests with DIFFERENT payloads), and an id-only
    # join-back would apply positions discovered in one row's text to
    # every row sharing the id — deleting non-boilerplate lines. Exact
    # duplicate rows (same id AND text) share positions by construction,
    # so the composite key is always safe.
    doc_key = F.xxhash64(F.col(text_col)).alias("__ldc_th")
    cand = (
        df.select(
            F.col(id_col).alias("__ldc_id"),
            doc_key,
            F.posexplode(lines_arr).alias("__ldc_pos", "__ldc_line"),
        )
        .withColumn("__ldc_norm", norm)
        .filter(F.length("__ldc_norm") >= min_line_chars)
        .select(
            "__ldc_id",
            "__ldc_th",
            "__ldc_pos",
            F.xxhash64("__ldc_norm").alias("__ldc_h"),
        )
    )
    repeated = (
        cand.groupBy("__ldc_h")
        .agg(
            F.count_distinct(
                F.struct("__ldc_id", "__ldc_th")
            ).alias("__ldc_docs")
        )
        .filter(F.col("__ldc_docs") >= min_docs)
        .select("__ldc_h")
    )
    removed = (
        cand.join(repeated, "__ldc_h", "left_semi")
        .groupBy("__ldc_id", "__ldc_th")
        .agg(F.sort_array(F.collect_list("__ldc_pos")).alias("__ldc_removed"))
    )
    rebuilt = F.when(
        F.col("__ldc_removed").isNull(), F.col(text_col)
    ).otherwise(
        F.concat_ws(
            "\n",
            F.filter(
                lines_arr,
                lambda line, i: ~F.array_contains(F.col("__ldc_removed"), i),
            ),
        )
    )
    return (
        df.join(
            removed,
            (df[id_col] == removed["__ldc_id"])
            & (F.xxhash64(df[text_col]) == removed["__ldc_th"]),
            "left",
        )
        .withColumns(
            {
                out_col: F.when(F.col(text_col).isNotNull(), rebuilt),
                "n_lines_deduped": F.coalesce(
                    F.size("__ldc_removed"), F.lit(0)
                ),
            }
        )
        .drop("__ldc_id", "__ldc_th", "__ldc_removed")
    )
