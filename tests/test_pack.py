"""Sequence packing (ops/pack): GPT-style concat-and-chunk into fixed
seq_len windows, hash-salted into independent streams."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.ops import pack as pk


def _py_pack(stream_docs, seq_len, eos):
    """Pure-Python mirror for ONE group's stream: docs in id order as
    (doc_id, [tokens]); returns list of (seq_idx, tokens, doc_ids)."""
    flat, spans = [], []
    for doc_id, toks in stream_docs:
        toks = list(toks) + ([eos] if eos is not None else [])
        if (eos is not None and len(toks) <= 1) or not toks:
            continue
        spans.append((doc_id, len(flat), len(flat) + len(toks)))
        flat.extend(toks)
    out = []
    for s in range((len(flat) + seq_len - 1) // seq_len):
        lo, hi = s * seq_len, min((s + 1) * seq_len, len(flat))
        ids = [d for d, a, b in spans if a < hi and b > lo]
        out.append((s, flat[lo:hi], ids))
    return out


DOCS = [
    (1, "a b c"),            # 3 tokens
    (2, "d e f g h i j"),    # 7 tokens — straddles boundaries
    (3, ""),                 # skipped
    (4, None),               # skipped
    (5, "k l"),
    (6, "m n o p q r s t u v w x"),  # long doc split across sequences
]


def test_pack_single_group_exact(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        pk.pack_sequences(df, seq_len=5, n_groups=1, eos="<e>")
        .orderBy("seq_idx")
        .collect()
    )
    toks = {
        i: [t for t in (txt or "").lower().split() if t]
        for i, txt in DOCS
    }
    expect = _py_pack([(i, toks[i]) for i, _ in DOCS], 5, "<e>")
    assert len(got) == len(expect)
    for row, (seq_idx, tokens, ids) in zip(got, expect):
        assert row.seq_idx == seq_idx
        assert row.tokens == tokens
        assert row.doc_ids == ids
        assert row.n_tokens == len(tokens) and row.n_docs == len(ids)
    # every sequence except the tail is exactly full
    assert all(r.n_tokens == 5 for r in got[:-1])
    # total token conservation: 3+7+2+12 real + 4 EOS = 28
    assert sum(r.n_tokens for r in got) == 28


def test_pack_multi_group_matches_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    n_groups = 3
    groups = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)).alias("g")
        ).collect()
    }
    got = pk.pack_sequences(df, seq_len=4, n_groups=n_groups, eos=None).collect()
    by_group: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.group, r.seq_idx)):
        by_group.setdefault(r.group, []).append(r)
    toks = {i: [t for t in (txt or "").lower().split() if t] for i, txt in DOCS}
    for g in set(groups.values()):
        stream = [(i, toks[i]) for i, _ in DOCS if groups[i] == g and toks[i]]
        expect = _py_pack(stream, 4, None)
        rows = by_group.get(g, [])
        assert len(rows) == len(expect), g
        for row, (seq_idx, tokens, ids) in zip(rows, expect):
            assert (row.seq_idx, row.tokens, row.doc_ids) == (
                seq_idx,
                tokens,
                ids,
            ), g


def test_pack_deterministic_and_tail_drop(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(
        (r.group, r.seq_idx, tuple(r.tokens))
        for r in pk.pack_sequences(df, seq_len=5, n_groups=2).collect()
    )
    b = sorted(
        (r.group, r.seq_idx, tuple(r.tokens))
        for r in pk.pack_sequences(df, seq_len=5, n_groups=2).collect()
    )
    assert a == b
    full = pk.pack_sequences(df, seq_len=5, n_groups=2, drop_partial_tail=True)
    stats = pk.packing_stats(full, 5).collect()[0]
    assert stats.packing_efficiency == 1.0
    assert stats.n_full == stats.n_sequences


def test_pack_plan_two_exchanges_no_join_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        pk.pack_sequences(df, seq_len=5, n_groups=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Python" not in plan
    # ONE exchange: the per-group running-sum window hashes by group,
    # and the sequence-reassembly aggregation's (group, seq_idx) keys
    # are satisfied by that same distribution, so Catalyst reuses it
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_pretokenized_int_ids(spark):
    """tokens_col packs an existing array<int> column (BPE-id shaped)
    with an int EOS — the real-tokenizer hook."""
    rows = [(1, [10, 11, 12]), (2, [20, 21, 22, 23, 24]), (3, []), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    got = (
        pk.pack_sequences(
            df, "doc_id", tokens_col="ids", seq_len=4, n_groups=1, eos=0
        )
        .orderBy("seq_idx")
        .collect()
    )
    # stream: 10 11 12 0 | 20 21 22 23 | 24 0
    assert [list(r.tokens) for r in got] == [
        [10, 11, 12, 0],
        [20, 21, 22, 23],
        [24, 0],
    ]
    assert got[0].doc_ids == [1] and got[1].doc_ids == [2]
    assert got[2].doc_ids == [2]
