"""Byte-pair-encoding tokenizer training and encoding — the real
learned-vocabulary tier above this engine's BPE-ish regex token counts
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the public reference algorithm).

Reference parity note: the reference engine (/root/reference) has no
tokenizer — this module is part of the training-pipeline surface the
brief adds on top of SURVEY §2 (token counting / packing feed off it).

Distributed shape, the part that matters at 10^12 files:

* ONE corpus scan: pretokenize (the module's shared ``TOKEN_REGEX``)
  and aggregate to the WORD-FREQUENCY table — after this the corpus is
  never touched again; every merge iteration runs over the vocab-sized
  word table (Zipf: millions of rows where the corpus has trillions).
* Per merge iteration: adjacent-pair counts are one explode +
  partial+final sum (exchange bounded by the pair vocabulary), the
  winning pair is ONE collected row (cut-sized, the same contract as
  centroid cuts), and the merge applies row-locally as an expression
  fold over each word's symbol array. The word table localCheckpoints
  every few iterations so the plan stays constant-size.
* Tie-breaks are pinned (count DESC, then pair lexicographic) so the
  merge sequence is deterministic across engines — the pure-Python
  mirror in tests reproduces it exactly.
* ENCODING broadcasts the merge ranks (a bounded artifact: n_merges
  rows) and applies standard rank-greedy BPE per pretoken inside ONE
  Arrow-batched ``mapInPandas`` with an LRU word cache — the sanctioned
  escape hatch: applying 10^4-10^5 data-dependent merges is a loop no
  expression engine expresses, and the Zipf head makes the cache hit
  rate ~1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.ops.text import TOKEN_REGEX

#: end-of-word sentinel (the published algorithm's </w>): merges never
#: cross word boundaries, and a trailing-position symbol is distinct
#: from the same bytes mid-word ("low" alone and "low" as a
#: prefix of "lowest" learn different merges).
EOW = "</w>"


def _pretokens(text: Column) -> Column:
    """Pretoken array (TOKEN_REGEX matches, lowercased) — the same word
    notion as token_count_bpeish, so learned-BPE token counts are
    comparable to the regex estimate they replace."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), F.lit(0))


def word_frequencies(
    df: DataFrame, text_col: str = "text", train_fraction: float | None = None
) -> DataFrame:
    """(word, n) over the corpus — the single corpus-touching pass of
    BPE training. ``train_fraction`` is a deterministic zero-shuffle
    hash sample **by word TYPE**: it hashes the word VALUE, so each
    distinct word is either kept with its full corpus count or dropped
    entirely — it is NOT a subsample of pretoken occurrences (that
    would need a positional hash and would shrink every count
    uniformly). Type sampling bounds the WORD-TABLE size (the thing the
    merge loop iterates over), which is the scale knob that matters
    here; note it can drop high-frequency types, so the learned merge
    sequence differs from a true corpus subsample's — use 1.0/None when
    the merge sequence must match a full-corpus run."""
    w = df.select(F.explode(_pretokens(F.col(text_col))).alias("word"))
    if train_fraction is not None and train_fraction < 1.0:
        w = w.filter(
            F.pmod(F.xxhash64("word"), F.lit(1_000_000))
            < int(train_fraction * 1_000_000)
        )
    return w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _merge_pairs(
    symbols: Column, pairs: "list[tuple[str, str]]"
) -> Column:
    """Row-local merge of every adjacent occurrence of ANY pair in
    ``pairs`` — ONE expression fold carrying (output-so-far, skip):
    when the previous element merged with this one, this one is
    consumed. Left-to-right, non-overlapping — exactly the reference
    algorithm's replacement order.

    The batch form is the distributed loop's hot kernel: higher-order
    folds are CodegenFallback (interpreted), so applying a batch of k
    merges as k stacked folds costs k interpreted passes over every
    symbol array per job. One pass with a literal left→right map costs
    1. Correctness requires the batch be pairwise symbol-disjoint AND
    concatenation-free (no member's symbol equals another member's
    merged output) — exactly what :func:`select_disjoint_batch`
    guarantees — so a single pass sees the same adjacencies every
    per-merge sequential pass would: a merge's output symbol can never
    be another batch member's input, and disjoint adjacencies commute.
    The map's lefts are unique by disjointness, so left→right lookup
    is well-defined."""
    pair_map = F.create_map(
        *[F.lit(x) for pair in pairs for x in pair]
    )
    stepped = F.aggregate(
        F.transform(symbols, lambda s, i: F.struct(s.alias("s"), i.alias("i"))),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        lambda acc, e: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        ).otherwise(
            F.when(
                # this symbol opens one of the batch's pairs and the
                # lookahead matches that pair's right side.
                # try_element_at twice: the map lookup is NULL for a
                # non-left symbol, and the array lookahead runs past
                # the end on the last symbol — plain element_at makes
                # both an ANSI error instead of NULL
                F.try_element_at(pair_map, e["s"])
                == F.try_element_at(symbols, e["i"] + 2),
                F.struct(
                    F.array_append(
                        acc["out"],
                        F.concat(
                            e["s"], F.try_element_at(symbols, e["i"] + 2)
                        ),
                    ).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            ).otherwise(
                F.struct(
                    F.array_append(acc["out"], e["s"]).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        ),
    )
    return stepped["out"]


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Single-merge form of :func:`_merge_pairs` (a one-entry batch)."""
    return _merge_pairs(symbols, [(left, right)])


def _local_bpe(
    freq: dict[str, int], n_merges: int, min_frequency: int
) -> list[tuple[str, str]]:
    """The classic in-memory learner over a collected word-frequency
    table (Sennrich's reference implementation shape: pair stats plus a
    pair→word index, updated INCREMENTALLY after each merge so only
    words containing the merged pair are touched). Identical merge
    sequence to the distributed loop — same pinned tie-break (count
    DESC, pair ASC).

    Per-merge argmax is a LAZY-DELETION HEAP (the HF-tokenizers
    practice), not a scan of the live pair set: a linear scan is
    O(|pairs|) per merge — at a 1M-document corpus the word table
    carries ~10⁷ live pairs, so 32k merges would be ~10¹¹ Python
    comparisons (days); the heap makes it pop-until-fresh. Invariant:
    every live pair has at least one heap entry with count ≥ its true
    count (exact entries are pushed at build and on every increase;
    decreases leave stale higher entries). A popped entry whose count
    is stale is re-pushed with the pair's exact current count, so the
    first FRESH pop is the true (count DESC, pair ASC) argmax — heap
    keys are (-count, pair), and heapq pops the smallest, which is
    exactly that tie-break."""
    import heapq
    from collections import Counter, defaultdict

    vocab: dict[str, list[str]] = {
        w: (list(w[:-1]) + [w[-1] + EOW]) for w in freq
    }
    stats: Counter = Counter()
    index: dict[tuple[str, str], dict[str, int]] = defaultdict(dict)
    for w, syms in vocab.items():
        n = freq[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] += n
            index[p][w] = index[p].get(w, 0) + 1
    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in stats.items()
    ]
    heapq.heapify(heap)

    def _pop_max() -> tuple[tuple[str, str], int] | None:
        while heap:
            negc, p = heapq.heappop(heap)
            cur = stats.get(p)
            if cur is None:
                continue  # pair died since this entry was pushed
            if -negc == cur:
                return p, cur
            # stale (count decreased since push): correct it and keep
            # popping — the corrected entry re-enters heap order
            heapq.heappush(heap, (-cur, p))
        return None

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _pop_max()
        if best is None:
            break
        (left, right), c = best
        if c < min_frequency:
            break
        merges.append((left, right))
        for w in list(index[(left, right)]):
            old = vocab[w]
            new, i = [], 0
            while i < len(old):
                if (
                    i + 1 < len(old)
                    and old[i] == left
                    and old[i + 1] == right
                ):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(old[i])
                    i += 1
            vocab[w] = new
            n = freq[w]
            for syms, sign in ((old, -1), (new, 1)):
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] += sign * n
                    if stats[p] <= 0:
                        del stats[p]
                    elif sign > 0:
                        # keep the heap invariant: every increase gets
                        # an exact entry (decreases stay lazy)
                        heapq.heappush(heap, (-stats[p], p))
                    d = index[p]
                    d[w] = d.get(w, 0) + sign
                    if d[w] <= 0:
                        del d[w]
    return merges


def select_disjoint_batch(
    ranked: list[tuple[int, str, str]], batch: int
) -> list[tuple[str, str]]:
    """Greedy selection of up to ``batch`` pairwise SYMBOL-DISJOINT
    pairs from a ranked candidate list ``[(count, left, right), ...]``
    (already in the pinned order: count DESC, pair ASC). Two merges
    interact iff they share a symbol — (a,b) then (b,c) changes (b,c)'s
    count; disjoint merges touch disjoint adjacencies, so their counts
    and row-local applications commute. An earlier member's merged
    OUTPUT (left+right concatenated) is also excluded: a later
    candidate whose symbol textually equals it (e.g. ("a","b") then
    ("ab","c")) would see adjacencies the earlier merge just created,
    making the result order-dependent — and it is exactly the corner
    where a one-pass batch application (``_merge_pairs``) would
    diverge from per-merge sequential passes. Excluding it keeps both
    properties: order-independence and single-pass ≡ sequential.
    Shared by the distributed loop and the pure-Python test mirror so
    the selection rule cannot drift."""
    chosen: list[tuple[str, str]] = []
    used: set[str] = set()
    for _c, left, right in ranked:
        if left in used or right in used:
            continue
        chosen.append((left, right))
        used.add(left)
        used.add(right)
        used.add(left + right)
        if len(chosen) >= batch:
            break
    return chosen


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_frequency: int = 2,
    train_fraction: float | None = None,
    checkpoint_every: int = 8,
    driver_vocab_max: int = 2_000_000,
    merge_batch: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus and return the
    merge table ``(rank int, left string, right string)`` — the
    write-once tokenizer artifact :func:`encode_bpe` applies.

    Words start as character symbols with the final character carrying
    the EOW sentinel. Each iteration counts adjacent pairs weighted by
    word frequency (explode → ONE partial+final sum over the pair
    vocabulary), collects the single argmax row (count DESC, pair ASC —
    pinned tie-break), stops early when the best count falls under
    ``min_frequency``, and rewrites the word table row-locally. The
    corpus is scanned exactly once (``word_frequencies``); everything
    after runs on the vocab-sized table.

    When the distinct-word count fits the driver
    (``driver_vocab_max``, default 2M ≈ a few hundred MB of Python
    dict), the merge LOOP runs locally instead — the
    SentencePiece/HuggingFace practice: the corpus-sized work (the
    frequency agg) stays distributed, the vocab-sized loop runs where
    32k sequential merges cost milliseconds each, not a Spark job each.
    Same algorithm, same pinned tie-breaks, IDENTICAL merge sequence
    (pytest-pinned against the distributed loop); ``driver_vocab_max=0``
    forces the distributed path for vocabularies past driver memory.

    ``merge_batch`` (distributed path only): accept up to this many
    pairwise symbol-disjoint merges per iteration — standard batched-
    BPE practice (disjoint merges have commuting counts and row-local
    applications, so one pair-count job serves the whole batch and the
    Spark-job count drops ~batch×; without it the beyond-driver-vocab
    path is one job per merge, ~4 s each on this host — unusable at
    32k merges). Caveat, stated not hidden: strict sequential BPE
    re-ranks after EVERY merge, and a pair CREATED by an earlier batch
    member (one containing its merged symbol) can in principle outrank
    a later batch member — batching takes the pre-batch ranking for the
    whole batch, so the learned sequence can differ from
    ``merge_batch=1`` in that corner. ``merge_batch=1`` restores exact
    sequential semantics (pinned against the driver-local loop in
    pytest); the batched path is pinned against its own pure-Python
    batched mirror.
    """
    word_df = word_frequencies(df, text_col, train_fraction)
    if driver_vocab_max and word_df.count() <= driver_vocab_max:
        freq = {r["word"]: int(r["n"]) for r in word_df.collect()}
        merges = [
            (rank, left, right)
            for rank, (left, right) in enumerate(
                _local_bpe(freq, n_merges, min_frequency)
            )
        ]
        return df.sparkSession.createDataFrame(
            merges or [], "rank int, left string, right string"
        )
    words = word_df.select(
        "n",
        F.concat(
            F.split(
                F.substring(F.col("word"), 1, F.length("word") - 1), ""
            ),
            F.array(F.concat(F.substring(F.col("word"), -1, 1), F.lit(EOW))),
        ).alias("sym"),
    )
    # single-char words: substring(w,1,0) yields '', split('') -> ['']
    # — strip empty symbols so the array is exactly the char sequence
    words = words.withColumn(
        "sym", F.filter(F.col("sym"), lambda s: s != F.lit(""))
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str]] = []
    batch = max(int(merge_batch), 1)
    iters_since_ckpt = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # candidate pool: enough headroom that greedy disjoint selection
        # can usually fill the batch (TakeOrdered — cut-sized collect,
        # never the pair table)
        pool = 1 if want == 1 else max(64, 8 * want)
        pairs = (
            words.select(
                "n",
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.transform(
                            F.slice(
                                F.col("sym"), 1, F.size("sym") - 1
                            ),
                            lambda s, i: F.struct(
                                s.alias("l"),
                                F.element_at(
                                    F.col("sym"), i + 2
                                ).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast(
                        "array<struct<l:string,r:string>>"
                    ))
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(pool)
            .collect()
        )
        ranked = [
            (int(r["c"]), r["p"]["l"], r["p"]["r"])
            for r in pairs
            if r["c"] >= min_frequency
        ]
        if not ranked:
            break
        chosen = select_disjoint_batch(ranked, want)
        # apply the whole batch row-locally as ONE lazy projection and
        # ONE fold pass (_merge_pairs): folds are CodegenFallback
        # (interpreted), so k stacked per-merge folds cost k passes
        # over every symbol array in both the next pair-count job and
        # the checkpoint materialization — measured as the batched
        # loop's dominant cost (BENCH r5 extras: batching the JOBS 8×
        # barely moved the wall). select_disjoint_batch guarantees the
        # batch is symbol-disjoint and concatenation-free, so the
        # single pass is exactly equivalent to applying the merges
        # sequentially (see both docstrings).
        for left, right in chosen:
            merges.append((len(merges), left, right))
        words = words.select(
            "n", _merge_pairs(F.col("sym"), chosen).alias("sym")
        )
        iters_since_ckpt += 1
        if iters_since_ckpt >= max(checkpoint_every // batch, 1):
            words = words.localCheckpoint(eager=True)
            iters_since_ckpt = 0
    spark = df.sparkSession
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string"
    )


def encode_bpe(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` — array<string> of BPE tokens (EOW sentinel
    stripped from the rendered pieces) — by applying the learned merges
    rank-greedily per pretoken. One Arrow-batched ``mapInPandas``; the
    merge-rank map is a bounded Python broadcast; an LRU word cache
    exploits the Zipf head (the same word never re-derives its pieces
    within an executor). NULL text yields NULL."""
    if out_col in df.columns:
        raise ValueError(
            f"encode_bpe: output column {out_col!r} already exists on"
            " the input — pass a different out_col"
        )
    ranks = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    # uniquified staging column: a hardcoded name would clobber (or be
    # clobbered by) an input that already carries it
    pt_col = "__pt"
    while pt_col in df.columns or pt_col == out_col:
        pt_col += "_"
    staged = df.withColumn(pt_col, _pretokens(F.col(text_col)))
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()), True)]
    )

    def _apply(batches):
        import functools

        rk = bc.value

        @functools.lru_cache(maxsize=65536)
        def word_pieces(word: str) -> tuple:
            if not word:
                return ()
            syms = list(word[:-1]) + [word[-1] + EOW]
            while len(syms) >= 2:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            # strip the sentinel as a SUFFIX only: the sentinel can
            # appear only at the end of a symbol by construction (it is
            # appended to the final character and merges concatenate
            # left-to-right), and suffix-stripping keeps that true even
            # if a future pretokenizer could emit '</w>' mid-token
            return tuple(
                s[: -len(EOW)] if s.endswith(EOW) else s for s in syms
            )

        for pdf in batches:
            toks = [
                None
                if pts is None
                else [p for w in pts for p in word_pieces(w)]
                for pts in pdf[pt_col]
            ]
            res = pdf.drop(columns=[pt_col])
            res[out_col] = toks
            yield res

    return staged.mapInPandas(_apply, schema=out_schema)
