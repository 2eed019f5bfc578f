"""Sequence packing — the training-data last mile: turn a curated
document table into fixed-length token sequences the way GPT-style
pretraining does ("concat and chunk"): documents are concatenated in a
deterministic order (optionally EOS-separated) and the token stream is
cut into exact ``seq_len`` windows, so documents SPLIT across sequence
boundaries and every sequence except the stream tail is exactly full.

Scale design: one global stream would serialize on a single cumsum, so
the corpus is hash-salted into ``n_groups`` independent streams (a
group is a shard of the corpus, deterministic in the doc id — the same
salting used by ops/sample). Within a group, token offsets come from
ONE running-sum window (partitioned by group — W workers each scan
their group, no global order), each document row-locally emits the
(sequence, slice) pieces it overlaps — pure ``transform``/``slice``
expressions, no Python — and ONE groupBy(group, seq) reassembles
pieces into sequences. Two exchanges total, both keyed by the salted
group: skew-free by construction. At 100 TB, n_groups scales with the
cluster (each group streams independently) and no operator ever holds
more than one sequence's tokens per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased — the same public tokenization the
    rest of ops/text uses (swap in a real BPE upstream by providing a
    pre-tokenized array column)."""
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    seq_len: int = 512,
    n_groups: int = 8,
    eos: str | None = "<|eos|>",
    drop_partial_tail: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Pack documents into fixed-``seq_len`` token sequences:

    ``(group, seq_idx, n_tokens, n_docs, doc_ids, tokens)``

    * ``group``   — which of the ``n_groups`` independent streams the
      sequence belongs to (docs are assigned by hash of ``id_col``);
    * ``seq_idx`` — position of the sequence within its group's stream;
    * ``tokens``  — exactly ``seq_len`` tokens (the stream tail may be
      shorter; ``drop_partial_tail=True`` drops it, the fixed-shape
      contract a training loader wants);
    * ``doc_ids`` — every document contributing tokens, in stream order.

    ``eos`` (default ``<|eos|>``) is appended to each document before
    concatenation so document boundaries survive packing; pass ``None``
    to concatenate bare. Documents with zero tokens are skipped (they
    would contribute only a dangling EOS).

    Determinism: group assignment is ``xxhash64(id) mod n_groups`` and
    stream order within a group is ``id_col`` ascending, so the output
    is a pure function of the input table — re-runs and resumes produce
    byte-identical sequences.

    ``tokens_col`` packs an EXISTING array column instead of whitespace
    tokens — the hook for real tokenizations (BPE ids as array<int>,
    subword strings, …); ``text_col`` is ignored, ``eos`` must then be
    an element of the same type (or None). All offsets/slicing are
    element-type agnostic.
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    L = F.lit(seq_len).cast("bigint")
    if tokens_col is not None:
        toks = F.coalesce(
            F.col(tokens_col), F.array().cast(df.schema[tokens_col].dataType)
        )
    else:
        toks = _tokens(F.col(text_col))
    if eos is not None:
        toks = F.concat(toks, F.array(F.lit(eos)))
    staged = (
        df.select(
            F.col(id_col).alias("__id"),
            toks.alias("__toks"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).alias("group"),
        )
        # zero-token docs (empty/NULL text) contribute nothing — with
        # EOS appended their array holds only the dangling EOS (size 1)
        .filter(F.size("__toks") > (1 if eos is not None else 0))
    )
    w = (
        Window.partitionBy("group")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = staged.select(
        "group",
        "__id",
        "__toks",
        (F.sum(F.size("__toks").cast("bigint")).over(w)).alias("__end"),
    ).withColumn("__start", F.col("__end") - F.size("__toks").cast("bigint"))

    # each doc emits one piece per sequence window it overlaps:
    # global positions [max(s*L, start), min((s+1)*L, end)) map to the
    # doc-local slice [lo, lo+len) — all row-local expressions
    first_seq = F.floor(F.col("__start") / L)
    last_seq = F.floor((F.col("__end") - 1) / L)
    pieces = offsets.select(
        "group",
        "__id",
        F.explode(
            F.transform(
                F.sequence(first_seq, last_seq),
                lambda s: F.struct(
                    s.alias("seq_idx"),
                    F.greatest(s * L, F.col("__start")).alias("piece_start"),
                    F.slice(
                        F.col("__toks"),
                        (F.greatest(s * L - F.col("__start"), F.lit(0)) + 1).cast(
                            "int"
                        ),
                        (
                            F.least((s + 1) * L, F.col("__end"))
                            - F.greatest(s * L, F.col("__start"))
                        ).cast("int"),
                    ).alias("piece"),
                ),
            )
        ).alias("p"),
    )
    assembled = (
        pieces.groupBy("group", F.col("p.seq_idx").alias("seq_idx"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("p.piece_start", F.col("__id").alias("id"), "p.piece")
                )
            ).alias("__parts")
        )
        .select(
            "group",
            "seq_idx",
            F.flatten(F.col("__parts.piece")).alias("tokens"),
            F.col("__parts.id").alias("doc_ids"),
        )
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_docs", F.size("doc_ids"))
        .select("group", "seq_idx", "n_tokens", "n_docs", "doc_ids", "tokens")
    )
    if drop_partial_tail:
        assembled = assembled.filter(F.col("n_tokens") == seq_len)
    return assembled


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row utilization summary of a :func:`pack_sequences` output:
    sequences, full sequences, total tokens, packing efficiency
    (tokens / (sequences x seq_len)) and docs-per-sequence mean. One
    partial+final aggregation — no second pass over the corpus."""
    n_seq = F.count(F.lit(1))
    # every sum/ratio coalesced to 0: over an EMPTY packed table (zero
    # kept docs upstream) sum() is NULL and the ratio divides by zero,
    # which would surface as None and crash numeric consumers (e.g. the
    # curate CLI's summary.json ints)
    return packed.agg(
        n_seq.alias("n_sequences"),
        F.coalesce(
            F.sum((F.col("n_tokens") == seq_len).cast("bigint")), F.lit(0)
        ).alias("n_full"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.round(
            F.when(n_seq == 0, F.lit(0.0)).otherwise(
                F.sum("n_tokens") / (n_seq * F.lit(seq_len)).cast("double")
            ),
            6,
        ).alias("packing_efficiency"),
        F.round(F.coalesce(F.avg("n_docs"), F.lit(0.0)), 6).alias(
            "mean_docs_per_seq"
        ),
    )
