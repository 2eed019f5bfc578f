"""Distributed BPE (ops/bpe.py) vs the pure-Python reference algorithm
(Sennrich et al. 2016): identical merge sequences (pinned tie-breaks),
identical encodings, lossless piece concatenation."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.ops import bpe
from faang_pydantics_validation_spark.ops.text import TOKEN_REGEX

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest",
    "def lowest(value): return value + newest_offset",
    "the lowest widest newest low lower",
]


def _py_pretokens(text: str) -> list[str]:
    return re.findall(TOKEN_REGEX, text.lower())


def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, n_merges, min_frequency):
    freq = Counter(w for t in texts for w in _py_pretokens(t))
    vocab = {
        w: (list(w[:-1]) + [w[-1] + bpe.EOW]) for w in freq
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        if not pairs:
            break
        (left, right), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if c < min_frequency:
            break
        merges.append((left, right))
        vocab = {w: _py_merge(s, left, right) for w, s in vocab.items()}
    return merges


def _py_encode(text, merges):
    rk = {p: i for i, p in enumerate(merges)}
    out = []
    for w in _py_pretokens(text):
        syms = list(w[:-1]) + [w[-1] + bpe.EOW]
        while len(syms) >= 2:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = rk.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        out.extend(s.replace(bpe.EOW, "") for s in syms)
    return out


@pytest.fixture()
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_bpe_matches_reference_mirror(spark, corpus_df):
    got = sorted(
        (r.rank, r.left, r.right)
        for r in bpe.train_bpe(
            corpus_df, n_merges=12, min_frequency=2
        ).collect()
    )
    expect = [
        (i, l, r)
        for i, (l, r) in enumerate(_py_train(CORPUS, 12, 2))
    ]
    assert got == expect
    # learned merges reflect the corpus: 'low' and the EOW-carrying
    # suffix of 'newest' appear among the early merged strings
    merged = {l + r for _, l, r in got}
    assert any("lo" in m for m in merged)


def test_train_bpe_min_frequency_stops_early(spark, corpus_df):
    all_merges = bpe.train_bpe(corpus_df, n_merges=50, min_frequency=6)
    # only pairs occurring >= 6 times corpus-wide may merge
    assert 0 < all_merges.count() < 50


def test_encode_bpe_matches_python_apply_and_is_lossless(spark, corpus_df):
    merges = bpe.train_bpe(corpus_df, n_merges=12, min_frequency=2)
    probe = corpus_df.unionByName(
        spark.createDataFrame(
            [(100, None), (101, "unseen zzz! qqq")],
            "doc_id long, text string",
        )
    )
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe.encode_bpe(probe, merges).collect()
    }
    mm = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    for i, t in enumerate(CORPUS):
        assert got[i] == _py_encode(t, mm), i
        # lossless: concatenating pieces reproduces the pretoken stream
        assert "".join(got[i]) == "".join(_py_pretokens(t)), i
    assert got[100] is None
    assert got[101] == _py_encode("unseen zzz! qqq", mm)


def test_word_frequencies_and_train_fraction(spark, corpus_df):
    wf = {r.word: r.n for r in bpe.word_frequencies(corpus_df).collect()}
    expect = Counter(w for t in CORPUS for w in _py_pretokens(t))
    assert wf == dict(expect)
    half = bpe.word_frequencies(corpus_df, train_fraction=0.5)
    again = bpe.word_frequencies(corpus_df, train_fraction=0.5)
    assert sorted(map(tuple, half.collect())) == sorted(
        map(tuple, again.collect())
    )
    assert half.count() <= len(expect)


def test_train_bpe_distributed_equals_local(spark, corpus_df):
    """The driver-local merge loop (vocab fits) and the distributed
    word-table loop are the same algorithm with the same pinned
    tie-breaks — identical merge tables, switchable via
    driver_vocab_max. merge_batch=1 = exact sequential semantics."""
    local = sorted(
        map(tuple, bpe.train_bpe(corpus_df, n_merges=10,
                                 min_frequency=2).collect())
    )
    dist = sorted(
        map(tuple, bpe.train_bpe(corpus_df, n_merges=10, min_frequency=2,
                                 driver_vocab_max=0, merge_batch=1).collect())
    )
    assert local == dist and len(local) == 10


def _py_train_batched(texts, n_merges, min_frequency, batch):
    """Pure-Python mirror of the BATCHED distributed loop: per round,
    rank all pairs with the pinned order, greedily take up to ``batch``
    pairwise symbol-disjoint pairs (the op's own select_disjoint_batch,
    so the selection rule is shared), apply them in order."""
    freq = Counter(w for t in texts for w in _py_pretokens(t))
    vocab = {w: (list(w[:-1]) + [w[-1] + bpe.EOW]) for w in freq}
    merges = []
    while len(merges) < n_merges:
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        ranked = sorted(
            ((c, l, r) for (l, r), c in pairs.items() if c >= min_frequency),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        if not ranked:
            break
        chosen = bpe.select_disjoint_batch(
            ranked, min(batch, n_merges - len(merges))
        )
        for left, right in chosen:
            merges.append((left, right))
            vocab = {w: _py_merge(s, left, right) for w, s in vocab.items()}
    return merges


def test_train_bpe_distributed_batched_matches_mirror(spark, corpus_df):
    """The default distributed path batches pairwise-disjoint merges
    (one pair-count job per BATCH, not per merge — the 32k-merge scale
    fix); its merge sequence is pinned against the pure-Python batched
    mirror round for round."""
    dist = sorted(
        map(tuple, bpe.train_bpe(corpus_df, n_merges=10, min_frequency=2,
                                 driver_vocab_max=0, merge_batch=4).collect())
    )
    expect = [
        (i, l, r)
        for i, (l, r) in enumerate(_py_train_batched(CORPUS, 10, 2, 4))
    ]
    assert dist == expect and len(dist) == 10


def test_select_disjoint_batch_rules():
    """Greedy disjoint selection: pinned order respected, overlapping
    pairs skipped (shared symbol on either side), batch size honored."""
    ranked = [
        (9, "a", "b"),
        (8, "b", "c"),   # shares b with (a,b) — skipped
        (7, "c", "d"),   # shares nothing with (a,b) — taken
        (6, "x", "a"),   # shares a — skipped
        (5, "e", "f"),
    ]
    assert bpe.select_disjoint_batch(ranked, 3) == [
        ("a", "b"), ("c", "d"), ("e", "f")
    ]
    assert bpe.select_disjoint_batch(ranked, 1) == [("a", "b")]


def test_select_disjoint_batch_excludes_concatenations():
    """A later candidate whose symbol equals an earlier member's merged
    OUTPUT is excluded: ("ab","x") after ("a","b") would see the pairs
    the first merge just created, so accepting it would make the batch
    order-dependent and break single-pass ≡ sequential application."""
    ranked = [
        (9, "a", "b"),
        (8, "ab", "x"),  # left == "a"+"b" — excluded
        (7, "y", "ab"),  # right == "a"+"b" — excluded
        (6, "c", "d"),
    ]
    assert bpe.select_disjoint_batch(ranked, 4) == [
        ("a", "b"), ("c", "d")
    ]


def test_encode_bpe_guards_staging_and_out_columns(spark, corpus_df):
    """An input already carrying the staging column name must not be
    clobbered, and an out_col collision fails loudly instead of
    silently overwriting."""
    merges = bpe.train_bpe(corpus_df, n_merges=6, min_frequency=2)
    poisoned = corpus_df.withColumn("__pt", F.lit("keep-me"))
    out = bpe.encode_bpe(poisoned, merges, "text").collect()
    assert all(r["__pt"] == "keep-me" for r in out)
    mm = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    by_id = {r.doc_id: r.bpe_tokens for r in out}
    for i, t in enumerate(CORPUS):
        assert by_id[i] == _py_encode(t, mm), i
    with pytest.raises(ValueError, match="already exists"):
        bpe.encode_bpe(
            corpus_df.withColumn("bpe_tokens", F.lit(1)), merges, "text"
        )


def test_encode_bpe_feeds_pack_sequences(spark, corpus_df):
    """The tokenizer closes the pipeline loop: encode_bpe's token
    arrays go straight into pack_sequences' pretokenized hook
    (tokens_col), and the packed streams carry exactly the BPE pieces
    plus EOS separators."""
    from faang_pydantics_validation_spark.ops import pack as pkm

    merges = bpe.train_bpe(corpus_df, n_merges=12, min_frequency=2)
    enc = bpe.encode_bpe(corpus_df, merges)
    packed = pkm.pack_sequences(
        enc, "doc_id", "text", seq_len=16, n_groups=2,
        tokens_col="bpe_tokens",
    )
    rows = packed.collect()
    assert rows, "packing produced sequences"
    # total packed tokens = total bpe tokens + one EOS per non-empty doc
    mm = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    n_bpe = sum(len(_py_encode(t, mm)) for t in CORPUS)
    n_docs = sum(1 for t in CORPUS if _py_pretokens(t))
    assert sum(r.n_tokens for r in rows) == n_bpe + n_docs
    # every non-EOS token is a learned piece (subset of the BPE output)
    pieces = {p for t in CORPUS for p in _py_encode(t, mm)}
    for r in rows:
        assert all(tok in pieces or tok == "<|eos|>" for tok in r.tokens)
