"""Text analysis over a document table — all native Column expressions.

Every op here compiles to whole-stage-codegen'd JVM expressions (regex,
length, split); NO Python UDFs. At 100 TB these run as a single narrow
pass fused with whatever scan feeds them, and column pruning keeps the
scan to the ``text`` column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marker tokens per language for the n-gram/stopword language heuristic.
#: Deliberately tiny and deterministic so the same table is computable in
#: plain SQL by the correctness oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "zh": ("的", "是", "了"),
}

#: BPE-ish token regex: runs of word chars, or a single non-space symbol —
#: a public approximation of byte-pair pre-tokenization splits.
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def _count_chars(text: Column, chars: str) -> Column:
    """Occurrences of any char of ``chars`` — via ``translate`` deletion,
    a regex-free per-char lookup that measures ~13x faster than the
    equivalent ``length(regexp_replace(t, '[^chars]', ''))`` (1.7s vs
    23s per 1M x 300-char rows) and deletes exactly the same ASCII set,
    so the DuckDB oracle twins keep their regexp form unchanged."""
    return F.length(text) - F.length(F.translate(text, chars, ""))


def occurrence_count(text: Column, marker: str) -> Column:
    """Count of non-overlapping occurrences of ``marker`` — via length
    delta under replace, so it stays a codegen'd expression (no UDF) and
    is reproducible verbatim in ANSI SQL."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit score. Markers are matched as substrings
    bounded by spaces (`` the ``) so partial-word hits don't count; the
    text is padded so edge tokens match too."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, f" {m} ") for m in markers),
            F.lit(0),
        )
        for lang, markers in LANG_MARKERS.items()
    }


def detect_language(text: Column) -> Column:
    """argmax over lang_scores with deterministic tie-break (first language
    in LANG_MARKERS order wins); all-zero ⇒ 'und'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(scores)):  # earlier langs override later ties
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred


def token_count_whitespace(text: Column) -> Column:
    """Whitespace tokenization count (empty string ⇒ 0)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpeish(text: Column) -> Column:
    """Count of TOKEN_REGEX matches — the BPE-ish pre-token count."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns appended in one narrow pass:

    n_chars, n_tokens (whitespace), n_bpeish_tokens, punct_ratio,
    digit_ratio, upper_ratio, mean_token_len, stopword_hits (en markers),
    quality_ok (simple thresholded verdict).
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    nonpunct = _count_chars(text, ".,;:!?")
    digits = _count_chars(text, "0123456789")
    uppers = _count_chars(text, "ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    n_tokens = token_count_whitespace(text)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    stop_hits = sum(
        (occurrence_count(padded, f" {m} ") for m in LANG_MARKERS["en"]),
        F.lit(0),
    )
    out = df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tokens,
            "n_bpeish_tokens": token_count_bpeish(text),
            "punct_ratio": (nonpunct / safe_chars),
            "digit_ratio": (digits / safe_chars),
            "upper_ratio": (uppers / safe_chars),
            "mean_token_len": (
                n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))
            ),
            "stopword_hits": stop_hits,
        }
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("digit_ratio") <= 0.5),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_symbol_ratio: float = 0.3,
    max_digit_ratio: float = 0.3,
    min_stopword_hits: int = 1,
    max_dup_line_ratio: float = 0.5,
) -> DataFrame:
    """Composite keep/drop verdict in the style of published web-corpus
    quality heuristics (Gopher/C4-family thresholds): appends

    * ``drop_reasons`` — array<string> of every rule the doc violates
      (empty ⇒ keep), so corpus curation is AUDITABLE per document and
      per-rule drop rates fall out of one ``explode``/groupBy;
    * ``quality_keep`` — boolean, true iff no rule fired.

    Rules: token count in [min_tokens, max_tokens]; mean token length in
    [min, max]; punctuation-symbol ratio; digit ratio; at least
    ``min_stopword_hits`` stopword marker hits; duplicate-line ratio
    (1 - distinct/total lines) below cap — the cheap repetition signal.

    All pure column predicates over ONE staged projection (tokens/lines
    arrays materialize once — multiply-referenced aliases are not
    re-inlined), so the whole verdict fuses with the scan: zero shuffle,
    zero Python. NULL text coalesces to '' (dropped by min_tokens) so
    verdicts are never NULL.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.withColumns(
        {
            "__qf_text": text,
            "__qf_ntok": token_count_whitespace(text),
            "__qf_lines": F.split(text, r"\n"),
        }
    )
    t = F.col("__qf_text")
    n_chars = F.length(t)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    n_tokens = F.col("__qf_ntok")
    mean_tok = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))
    symbol_ratio = _count_chars(t, ".,;:!?#|*=+-") / safe_chars
    digit_ratio = _count_chars(t, "0123456789") / safe_chars
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    stop_hits = sum(
        (occurrence_count(padded, f" {m} ") for m in LANG_MARKERS["en"]),
        F.lit(0),
    )
    lines = F.col("__qf_lines")
    dup_line_ratio = F.lit(1.0) - (
        F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
    )
    rules: list[tuple[str, Column]] = [
        ("too_few_tokens", n_tokens < min_tokens),
        ("too_many_tokens", n_tokens > max_tokens),
        (
            "mean_token_len",
            (mean_tok < min_mean_token_len) | (mean_tok > max_mean_token_len),
        ),
        ("symbol_ratio", symbol_ratio > max_symbol_ratio),
        ("digit_ratio", digit_ratio > max_digit_ratio),
        ("no_stopwords", stop_hits < min_stopword_hits),
        ("dup_lines", dup_line_ratio > max_dup_line_ratio),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(rid)) for rid, cond in rules]),
        lambda x: x.isNotNull(),
    )
    return (
        staged.withColumn("drop_reasons", reasons)
        .withColumn("quality_keep", F.size("drop_reasons") == 0)
        .drop("__qf_text", "__qf_ntok", "__qf_lines")
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus token / n-gram frequency table: (ngram, n_occurrences,
    n_docs) — the vocabulary view a tokenizer-training or
    contamination-check pass starts from.

    ``n=1`` counts whitespace tokens; ``n>1`` counts word n-grams built
    row-locally before the explode. ``top_k`` keeps the most frequent
    entries via ONE TakeOrdered (no global sort materialization).

    Scale shape: one explode (fan-out = tokens/row) feeding ONE
    partial+final hash aggregation on the ngram — Spark's map-side
    combine collapses each task's token stream to its local vocabulary
    before the exchange, so the shuffle carries (distinct-ngram ×
    tasks) rows, not the corpus token count. Zipf makes that reduction
    enormous: the head of the vocabulary dominates occurrences but is a
    handful of distinct keys per task. ``n_docs`` (document frequency)
    rides the same aggregation as count(distinct-free) — we explode
    DISTINCT ngrams per doc separately from occurrence counts to keep
    both exact in one pass each.
    """
    staged = df.select(_word_ngrams(F.col(text_col), n).alias("__grams"))
    occ = (
        staged.select(F.explode("__grams").alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    docs = (
        staged.select(F.explode(F.array_distinct(F.col("__grams"))).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    out = occ.join(docs, "ngram")
    if top_k is not None:
        out = out.orderBy(
            F.desc("n_occurrences"), "ngram"
        ).limit(top_k)
    return out


def _ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined strings) from an ALREADY-tokenized
    array column; empty array when fewer than n tokens. The short-text
    branch must be an explicit ``when``: ``sequence(1, x)`` runs
    DESCENDING for x < 1 (yielding index 0, which ``slice`` rejects at
    runtime), so clamping the upper bound alone is not a guard."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _word_ngrams(text: Column, n: int) -> Column:
    """Lowercased word n-grams as strings (empty array when the text has
    fewer than n tokens)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    return _ngrams_from_tokens(toks, n)


def contamination_matches(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
    n: int = 8,
    min_containment: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination scan: which corpus documents contain
    which probe (eval-set) texts, measured as word-``n``-gram
    containment — the published decontamination heuristic (an eval
    example is "in" a training doc when a high fraction of its n-grams
    appear there verbatim).

    Returns (doc id, probe id, n_shared, probe_total, containment) for
    pairs with containment ≥ ``min_containment``; containment =
    shared distinct n-grams / probe's distinct n-grams, so a probe
    pasted verbatim scores 1.0 regardless of how much other text
    surrounds it.

    Scale shape: the probe side (an eval benchmark — thousands of rows,
    not billions) explodes to (probe_id, ngram) and BROADCASTS; the
    corpus side explodes its distinct n-grams per doc and joins
    broadcast-hash — the 100 TB corpus never shuffles, and the
    post-join pair table (docs × matching probes) is tiny before the
    one groupBy. Probes with fewer than ``n`` tokens yield no n-grams
    and can never match — callers screen tiny probes themselves.
    """
    from pyspark.sql.functions import broadcast

    p = probes.select(
        F.col(probe_id_col).alias("__pid"),
        F.explode(
            F.array_distinct(_word_ngrams(F.col(probe_text_col), n))
        ).alias("__gram"),
    )
    totals = p.groupBy("__pid").agg(F.count(F.lit(1)).alias("probe_total"))
    c = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_word_ngrams(F.col(text_col), n))
        ).alias("__gram"),
    )
    shared = (
        c.join(broadcast(p), "__gram")
        .groupBy(id_col, "__pid")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(broadcast(totals), "__pid")
        .withColumn(
            "containment",
            F.col("n_shared") / F.col("probe_total").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select(
            id_col,
            F.col("__pid").alias(probe_id_col),
            "n_shared",
            "probe_total",
            "containment",
        )
    )


def vocab_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus vocabulary summary in a single partial+final agg
    over the exploded token stream: total_tokens, vocab_size (exact
    distinct), approx_vocab_size (HLL — the mergeable 100 TB path where
    exact distinct would shuffle the whole vocabulary), singleton-free
    head mass is left to :func:`token_frequencies`."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    exploded = df.select(F.explode(toks).alias("token"))
    return exploded.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.count_distinct("token").alias("vocab_size"),
        F.approx_count_distinct("token").alias("approx_vocab_size"),
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 over casefolded,
    whitespace-collapsed text — the cheap exact-near-dup key (differs from
    raw sha only by normalization)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.sha2(normalized, 256)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(… input cols …, pred_lang) in one narrow pass."""
    return df.withColumn("pred_lang", detect_language(F.col(text_col)))


#: PII-ish scrubbing patterns. Deliberately PORTABLE: no backreferences,
#: no lookaround, ASCII classes only — the identical literal pattern runs
#: in Spark (java.util.regex) and DuckDB (RE2) with identical matches, so
#: redaction is cross-engine auditable. Order matters: url_cred runs
#: before email so ``user:pass@host`` isn't half-eaten as an email.
REDACTION_PATTERNS: dict[str, str] = {
    "url_cred": r"://[^/\s:@]+:[^/\s:@]+@",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()-]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = "[REDACTED-{kind}]",
) -> DataFrame:
    """Scrub PII-like spans before a corpus ships to training: appends

    * ``text_redacted`` — ``text_col`` with every match of every pattern
      replaced by ``token`` (``{kind}`` substituted, e.g.
      ``[REDACTED-email]``);
    * ``redaction_counts`` — map<kind, int> of matches each pattern
      ACTUALLY replaced (counted on the running text, after earlier
      patterns ran — so a ``user:pass@host`` credential counts as
      url_cred, not also as an email), making corpus-level PII incidence
      one explode/groupBy away and "0 redactions" an assertable fact.

    Staged ``regexp_replace`` + ``regexp_extract_all`` — pure codegen'd
    expressions, row-local, zero shuffle, scan-fused; each pattern's
    stage materializes the running text once (multiply-referenced
    aliases are not re-inlined). Patterns apply in dict order. NULL text
    stays NULL in ``text_redacted`` with all-zero counts.
    """
    pats = REDACTION_PATTERNS if patterns is None else patterns
    out = df.withColumn("__red", F.col(text_col))
    for kind, pat in pats.items():
        out = out.withColumn(
            f"__cnt_{kind}",
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col("__red"), F.lit("")), F.lit(pat), F.lit(0)
                )
            ),
        ).withColumn(
            "__red",
            F.regexp_replace(F.col("__red"), pat, token.replace("{kind}", kind)),
        )
    counts = F.map_from_arrays(
        F.array(*[F.lit(k) for k in pats]),
        F.array(*[F.col(f"__cnt_{k}") for k in pats]),
    )
    return (
        out.withColumn("redaction_counts", counts)
        .withColumnRenamed("__red", "text_redacted")
        .drop(*[f"__cnt_{k}" for k in pats])
    )


def _hash_len_sorted(arr: Column) -> Column:
    """``array<struct<v:bigint, len:bigint>>`` of (xxhash64, length)
    pairs, value-sorted. The fold-side representation for every
    repetition granularity: duplicate detection only needs EQUALITY, so
    elements travel as 64-bit hashes instead of the strings themselves —
    the sort compares 8-byte ints, not arbitrary-length text, and the
    n-gram path (see :func:`_ngram_hash_structs`) never materializes the
    joined gram strings at all. Collision risk is per-document
    (~m²/2⁶⁴ for m elements — negligible at any real document size) and
    an undetected collision only perturbs one doc's metric by one run."""
    return F.array_sort(
        F.transform(
            arr,
            lambda x: F.struct(
                F.xxhash64(x).alias("v"),
                F.length(x).cast("bigint").alias("len"),
            ),
        )
    )


def _gram_hash(toks: Column, i: Column, n: int) -> Column:
    """xxhash64 over the n tokens starting at 0-based position ``i`` —
    order-sensitive seed chaining, so hash equality ≡ token-sequence
    equality (≡ joined-string equality: tokens are whitespace-split and
    can never contain the joiner) modulo 64-bit collisions."""
    return F.xxhash64(*[F.get(toks, i + k) for k in range(n)])


def _gram_len(toks: Column, i: Column, n: int) -> Column:
    """Space-joined character length of the n-gram at position ``i``:
    sum of token lengths plus the n-1 joining spaces (the same
    convention the former ``concat_ws`` materialization measured)."""
    tot: Column = F.lit(n - 1).cast("bigint")
    for k in range(n):
        tot = tot + F.length(F.get(toks, i + k)).cast("bigint")
    return tot


def _ngram_hash_structs(toks: Column, n: int, *, with_len: bool) -> Column:
    """Value-sorted word-n-gram array without building the gram strings:
    each element is ``struct(v=xxhash64(tok_i..tok_{i+n-1}), ...)`` with
    either the gram's joined char length (``with_len`` — the top-n mass
    path) or its token start index (the dup-coverage path) as payload.
    The short-text branch must be an explicit ``when``: ``sequence``
    runs DESCENDING when the bound goes negative."""
    if with_len:
        elem = lambda i: F.struct(  # noqa: E731
            _gram_hash(toks, i, n).alias("v"),
            _gram_len(toks, i, n).alias("len"),
        )
        empty_t = "array<struct<v:bigint,len:bigint>>"
    else:
        elem = lambda i: F.struct(  # noqa: E731
            _gram_hash(toks, i, n).alias("v"),
            i.cast("int").alias("s"),
        )
        empty_t = "array<struct<v:bigint,s:int>>"
    return F.when(
        F.size(toks) >= n,
        F.array_sort(
            F.transform(F.sequence(F.lit(0), F.size(toks) - n), elem)
        ),
    ).otherwise(F.array().cast(empty_t))


def _run_stats(sorted_arr: Column) -> Column:
    """ONE linear fold over a value-SORTED ``array<struct<v:bigint,
    len:bigint>>`` (hash, char-length pairs) yielding
    ``struct(extra_cnt, dup_chars, best_chars)``:

    * ``extra_cnt``  — occurrences beyond the first of each distinct
      value (so ``extra_cnt / size`` is the classic
      ``1 - distinct/total`` duplicate fraction);
    * ``dup_chars``  — characters in ALL occurrences of values that
      appear more than once (the first occurrence is added retroactively
      when its duplicate arrives — Gopher's "characters contained in
      duplicate lines/n-grams" counting);
    * ``best_chars`` — ``count * length`` of the most frequent value
      that occurs AT LEAST TWICE (the "top n-gram" character mass; a
      single occurrence is not repetition — Gopher's published counting
      doesn't gate this because web-length documents make the
      distinction vanish, but at short lengths an ungated version fires
      on any 26-char 4-gram in a 160-char doc).

    Equal values are adjacent after ``array_sort``, so one
    ``aggregate`` pass with a (prev, run, ...) accumulator computes all
    three — codegen'd, row-local, zero shuffle. NULL-safe: the initial
    ``prev`` is NULL, which never equals a real hash (``eqNullSafe``;
    ``xxhash64`` of a non-null element is never NULL).
    """
    init = F.struct(
        F.lit(None).cast("bigint").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("extra_cnt"),
        F.lit(0).cast("bigint").alias("dup_chars"),
        F.lit(0).cast("bigint").alias("best_chars"),
    )

    def merge(acc: Column, x: Column) -> Column:
        is_dup = x["v"].eqNullSafe(acc["prev"])
        run = F.when(is_dup, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        xlen = x["len"]
        add = F.when(
            is_dup,
            # second occurrence pays for the first retroactively
            F.when(acc["run"] == 1, xlen * 2).otherwise(xlen),
        ).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            x["v"].alias("prev"),
            run.alias("run"),
            (
                acc["extra_cnt"] + F.when(is_dup, 1).otherwise(0).cast("bigint")
            ).alias("extra_cnt"),
            (acc["dup_chars"] + add).alias("dup_chars"),
            F.greatest(
                acc["best_chars"],
                F.when(run >= 2, run * xlen).otherwise(F.lit(0).cast("bigint")),
            ).alias("best_chars"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        merge,
        lambda acc: F.struct(
            acc["extra_cnt"].alias("extra_cnt"),
            acc["dup_chars"].alias("dup_chars"),
            acc["best_chars"].alias("best_chars"),
        ),
    )


def _dup_gram_starts(srt: Column, vs: Column) -> Column:
    """Ascending token start-indices of n-gram OCCURRENCES whose value
    appears at least twice in the document.

    ``srt`` is the value-sorted ``array<struct<v,s>>`` of (gram-hash,
    start) pairs and ``vs`` its hashes-only projection (both staged
    columns, so each is materialized once per row). Equal values are
    adjacent after the sort, so an occurrence is duplicated iff its
    value equals its left or right neighbour — computed with two shifted
    ``zip_with`` passes (array-level, O(m)), never a quadratic
    membership probe."""
    m = F.size(vs)
    pad = F.array(F.lit(None).cast("bigint"))
    body = F.greatest(m - 1, F.lit(0))
    prev = F.concat(pad, F.slice(vs, 1, body))
    nxt = F.concat(F.slice(vs, 2, body), pad)
    eq_prev = F.zip_with(vs, prev, lambda a, b: a.eqNullSafe(b))
    eq_next = F.zip_with(vs, nxt, lambda a, b: a.eqNullSafe(b))
    flags = F.zip_with(eq_prev, eq_next, lambda a, b: a | b)
    return F.array_sort(
        F.filter(
            F.zip_with(srt, flags, lambda st, fl: F.when(fl, st["s"])),
            lambda s: s.isNotNull(),
        )
    )


def _covered_chars(toks: Column, dup_starts: Column, n: int) -> Column:
    """Character mass of the UNION of token intervals ``[s, s+n-1]`` for
    each duplicated-n-gram start ``s`` — duplicated-character coverage
    WITHOUT overlap double-counting (a duplicated passage of W words no
    longer counts ~n× its length). Counts covered token characters plus
    one joining space between adjacent covered tokens, the same
    space-joined convention as the n-gram mass itself, so the fraction
    is bounded by ~1 and Gopher's published thresholds apply at their
    calibrated operating point.

    ONE O(m) fold over token positions: starts are sorted and distinct,
    positions advance by 1, so at most one start is consumed per step —
    a two-pointer interval-union walk as a codegen-safe ``aggregate``
    expression. Row-local, zero shuffle, zero Python."""
    init = F.struct(
        F.lit(0).alias("j"),
        F.lit(-1).alias("end"),
        F.lit(False).alias("pc"),
        F.lit(0).cast("bigint").alias("chars"),
    )

    def merge(acc: Column, p: Column) -> Column:
        started = F.get(dup_starts, acc["j"]) == p
        j2 = F.when(started, acc["j"] + 1).otherwise(acc["j"])
        end2 = F.when(started, p + F.lit(n - 1)).otherwise(acc["end"])
        covered = p <= end2
        add = F.when(
            covered,
            F.length(F.get(toks, p)).cast("bigint")
            + F.when(acc["pc"], F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            j2.alias("j"),
            end2.alias("end"),
            covered.alias("pc"),
            (acc["chars"] + add).alias("chars"),
        )

    return F.when(F.size(dup_starts) == 0, F.lit(0).cast("bigint")).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), F.size(toks) - 1),
            init,
            merge,
            lambda acc: acc["chars"],
        )
    )


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document repetition signals in the style of Gopher's
    repetitious-text filters (Rae et al. 2021, table A1 — public):

    * ``rep_dup_line_frac`` / ``rep_dup_para_frac`` — fraction of
      lines / paragraphs that duplicate an earlier one
      (``1 - distinct/total``); BLANK lines/paragraphs are excluded
      before counting (canonical Gopher splits lines on ``\\n+``, so
      empties never appear — otherwise ordinary code with a handful of
      blank lines measures dup-line fractions near the 0.30 drop
      threshold);
    * ``rep_dup_line_char_frac`` / ``rep_dup_para_char_frac`` —
      fraction of document characters inside duplicated lines /
      paragraphs (all occurrences; lines never overlap, so plain
      summing is already coverage);
    * ``rep_top_{n}gram_char_frac`` (n in ``top_ngram_ns``) — character
      mass (count × joined length) of the single most frequent word
      n-gram over document length — Gopher counts this one WITH
      overlap, and so do we;
    * ``rep_dup_{n}gram_char_frac`` (n in ``dup_ngram_ns``) — character
      COVERAGE of all duplicated word n-grams: the union of their token
      spans, no overlap double-counting (see :func:`_covered_chars`),
      so the value is bounded by ~1 and comparable to Gopher A1's
      published thresholds.

    Character fractions use ``length(text)`` as the denominator.

    Everything is row-local: one ``array_sort`` + :func:`_run_stats`
    fold per line/para/top-n granularity, and per dup-n one sort of
    (gram-hash, start) pairs + shifted ``zip_with`` duplicate flags + an
    O(m) interval-union fold — codegen-safe JVM expressions, zero
    shuffle, zero Python, so the op fuses with the scan and scales
    linearly: at 100 TB it is embarrassingly parallel with no state
    beyond one row. NULL text yields all-zero metrics.

    Elements travel as xxhash64 values, never materialized gram
    strings (:func:`_ngram_hash_structs`): duplicate detection needs
    only equality, so per dup/top-n the former per-position
    ``slice`` + ``concat_ws`` allocation and string-comparison sort
    collapse to n ``get`` + one hash call and an 8-byte-int sort —
    measured 3.4× faster on the 200k-row synthetic code table with
    metric values bit-identical (same checksum) to the string path.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    staged = df.withColumns(
        {
            "__rep_text": text,
            "__rep_toks": F.filter(
                F.split(F.trim(F.lower(text)), r"\s+"),
                lambda t: F.length(t) > 0,
            ),
            "__rep_lines": F.filter(
                F.split(text, r"\n"),
                lambda line: F.length(F.trim(line)) > 0,
            ),
            "__rep_paras": F.filter(
                F.split(text, r"\n{2,}"),
                lambda p: F.length(F.trim(p)) > 0,
            ),
        }
    )
    # staged (hash, start)-sorted n-gram arrays + duplicated-start
    # indices per dup-n; staged as real columns so multiply-referenced
    # arrays materialize once per row (CollapseProject keeps non-cheap
    # expressions with >1 consumer out of line)
    tmp_cols: list[str] = ["__rep_text", "__rep_toks", "__rep_lines", "__rep_paras"]
    for n in dup_ngram_ns:
        srt_c, vs_c, ds_c = f"__rep_srt{n}", f"__rep_vs{n}", f"__rep_ds{n}"
        staged = staged.withColumn(
            srt_c, _ngram_hash_structs(F.col("__rep_toks"), n, with_len=False)
        )
        staged = staged.withColumn(
            vs_c, F.transform(F.col(srt_c), lambda x: x["v"])
        )
        staged = staged.withColumn(
            ds_c, _dup_gram_starts(F.col(srt_c), F.col(vs_c))
        )
        tmp_cols += [srt_c, vs_c, ds_c]
    n_chars = F.greatest(F.length(F.col("__rep_text")), F.lit(1)).cast("double")

    def frac(num: Column, den: Column) -> Column:
        return F.round(num.cast("double") / den, 9)

    cols: dict[str, Column] = {}
    for name, arr in (("line", F.col("__rep_lines")), ("para", F.col("__rep_paras"))):
        st = _run_stats(_hash_len_sorted(arr))
        n = F.greatest(F.size(arr), F.lit(1)).cast("double")
        cols[f"rep_dup_{name}_frac"] = frac(st["extra_cnt"], n)
        cols[f"rep_dup_{name}_char_frac"] = frac(st["dup_chars"], n_chars)
    for n in top_ngram_ns:
        st = _run_stats(
            _ngram_hash_structs(F.col("__rep_toks"), n, with_len=True)
        )
        cols[f"rep_top_{n}gram_char_frac"] = frac(st["best_chars"], n_chars)
    for n in dup_ngram_ns:
        cols[f"rep_dup_{n}gram_char_frac"] = frac(
            _covered_chars(F.col("__rep_toks"), F.col(f"__rep_ds{n}"), n),
            n_chars,
        )
    return staged.withColumns(cols).drop(*tmp_cols)


#: Gopher table-A1 repetition thresholds (public): metric column →
#: maximum allowed value; a document exceeding ANY threshold is dropped.
REPETITION_THRESHOLDS: dict[str, float] = {
    "rep_dup_line_frac": 0.30,
    "rep_dup_para_frac": 0.30,
    "rep_dup_line_char_frac": 0.20,
    "rep_dup_para_char_frac": 0.20,
    "rep_top_2gram_char_frac": 0.20,
    "rep_top_3gram_char_frac": 0.18,
    "rep_top_4gram_char_frac": 0.16,
    "rep_dup_5gram_char_frac": 0.15,
    "rep_dup_6gram_char_frac": 0.14,
    "rep_dup_7gram_char_frac": 0.13,
    "rep_dup_8gram_char_frac": 0.12,
    "rep_dup_9gram_char_frac": 0.11,
    "rep_dup_10gram_char_frac": 0.10,
}


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Keep/drop verdict over :func:`repetition_metrics`, mirroring
    :func:`quality_filter`'s auditable contract: appends every metric
    column plus

    * ``rep_drop_reasons`` — array<string> of each metric whose value
      exceeds its threshold (empty ⇒ keep);
    * ``rep_keep`` — boolean, true iff no threshold fired.

    Defaults are :data:`REPETITION_THRESHOLDS` (Gopher A1). Same
    scale story as the metrics: scan-fused, shuffle-free, Python-free.
    """
    th = REPETITION_THRESHOLDS if thresholds is None else thresholds
    out = repetition_metrics(df, text_col)
    reasons = F.filter(
        F.array(
            *[F.when(F.col(m) > F.lit(v), F.lit(m)) for m, v in th.items()]
        ),
        lambda x: x.isNotNull(),
    )
    return out.withColumn("rep_drop_reasons", reasons).withColumn(
        "rep_keep", F.size("rep_drop_reasons") == 0
    )


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_k: int | None = 50_000,
    min_count: int = 1,
) -> DataFrame:
    """Unigram language-model table ``(token, n_occurrences, logprob)``
    learned from a corpus: ``logprob = ln(count / total)`` over
    whitespace tokens (lowercased). ``top_k``/``min_count`` bound the
    vocabulary so the result is broadcast-sized by construction —
    CCNet-style LM filtering keeps the model tiny and ships it to the
    data, never the reverse.

    One explode → ONE partial+final agg on the token (map-side combine
    collapses each task's token stream to its local vocabulary before
    the exchange — see :func:`token_frequencies`; document frequencies
    are deliberately NOT computed here, skipping that function's second
    explode and its ngram join) plus a single-row total joined back by
    cross-join — no second scan of the corpus.
    """
    freqs = (
        df.select(F.explode(_word_ngrams(F.col(text_col), 1)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    if top_k is not None:
        freqs = freqs.orderBy(F.desc("n_occurrences"), "ngram").limit(top_k)
    # total over ALL tokens (not just kept vocab) would need a second
    # corpus pass; normalizing over the kept vocabulary is the standard
    # truncated-unigram approximation and keeps probabilities summing
    # to 1 over the table itself.
    total = freqs.agg(F.sum("n_occurrences").alias("__total"))
    return (
        freqs.crossJoin(F.broadcast(total))
        .withColumn(
            "logprob",
            F.log(F.col("n_occurrences").cast("double") / F.col("__total")),
        )
        .select("ngram", "n_occurrences", "logprob")
        .withColumnRenamed("ngram", "token")
    )


def unigram_logprob_score(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Per-document mean unigram log-probability — the public
    approximation of CCNet's KenLM perplexity quality signal (docs with
    very low mean logprob are gibberish/boilerplate; very high means
    repetitive common-token spam). Returns a SCORE table, one row per
    input document:

    ``(id_col, n_tokens, oov_frac, lm_logprob)``

    where ``lm_logprob`` is the mean over tokens of the vocab logprob
    (``oov_logprob`` for out-of-vocabulary tokens) and ``oov_frac`` the
    OOV token fraction. Empty/NULL docs score ``n_tokens=0`` with NULL
    ``lm_logprob``.

    Scale shape: ``explode_outer`` tokens (empty/NULL docs keep one
    NULL-token row, so no ids-restore join is needed) → BROADCAST hash
    join against the (bounded, see :func:`unigram_vocab`) vocabulary →
    groupBy(id). The join adds no exchange; the groupBy's map-side
    partial aggregation collapses each doc's token stream to one
    partial row BEFORE the exchange (a doc's tokens are partition-local
    after explode), so the shuffle carries one small row per document —
    never the token stream. ONE Exchange, zero sort-merge joins
    (plan-asserted). Returning a score table instead of appending a
    column avoids re-shuffling the payload; callers join on ``id_col``
    if they need the text alongside.
    """
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token"),
    )
    joined = toks.join(F.broadcast(vocab.select("token", "logprob")), "token", "left")
    real = F.col("token").isNotNull()
    n_tokens = F.sum(real.cast("bigint"))
    oov_cnt = F.sum((real & F.col("logprob").isNull()).cast("bigint"))
    lp_sum = F.sum(
        F.when(real, F.coalesce(F.col("logprob"), F.lit(oov_logprob)))
    )
    return joined.groupBy(id_col).agg(
        n_tokens.alias("n_tokens"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                oov_cnt.cast("double") / n_tokens
            ),
            9,
        ).alias("oov_frac"),
        F.round(
            F.when(n_tokens == 0, F.lit(None).cast("double")).otherwise(
                lp_sum / n_tokens
            ),
            9,
        ).alias("lm_logprob"),
    )


def lm_perplexity_buckets(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 3,
    oov_logprob: float = -20.0,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's corpus partitioning by LM score: bucket documents into
    ``n_buckets`` quantile bands of :func:`unigram_logprob_score`'s
    ``lm_logprob`` (bucket 0 = highest mean logprob = "head" /
    most-fluent; last bucket = "tail"). Appends ``lm_logprob``,
    ``oov_frac`` and ``lm_bucket`` to the input rows; zero-token docs
    get NULL ``lm_bucket``.

    Scale shape: scoring is the broadcast-join pass documented on
    :func:`unigram_logprob_score`; the bucket CUTS come from ONE
    ``approx_percentile`` (a mergeable sketch — no global sort) over
    the doc-count-sized score table, collected as n_buckets-1 driver
    literals; the final score→payload join is an id-keyed shuffle of
    (id, 3 doubles) against the corpus — the one unavoidable wide step,
    exactly CCNet's reshard-by-bucket. Callers that only need the
    score table should use :func:`unigram_logprob_score` directly and
    skip the join.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    scores = unigram_logprob_score(
        df, vocab, text_col, id_col, oov_logprob=oov_logprob
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scores.filter(F.col("n_tokens") > 0).agg(
        F.percentile_approx("lm_logprob", qs, accuracy).alias("c")
    ).collect()[0]["c"] or []
    # bucket 0 = above the TOP cut (most fluent); descending thresholds.
    # NULL n_tokens (a row whose id_col is NULL — SQL join semantics
    # never match NULL keys, so its score columns come back NULL) and
    # zero-token docs both get a NULL bucket rather than silently
    # vanishing or defaulting to the tail band.
    bucket = F.when(
        F.col("n_tokens").isNull() | (F.col("n_tokens") == 0),
        F.lit(None).cast("int"),
    )
    for i, cut in enumerate(sorted(cuts, reverse=True)):
        bucket = bucket.when(F.col("lm_logprob") >= cut, F.lit(i))
    bucket = bucket.otherwise(F.lit(len(cuts)))
    # LEFT join: scores cover every non-NULL id via explode_outer, and
    # NULL-id rows must survive with NULL scores — an inner join would
    # silently drop them from the output corpus.
    return df.join(
        scores.select(id_col, "n_tokens", "oov_frac", "lm_logprob"),
        id_col,
        "left",
    ).withColumn("lm_bucket", bucket).drop("n_tokens")


def _short_probe_norm(col: Column) -> Column:
    """Shared normal form for BOTH sides of the short-probe substring
    screen: collapse ``\\s+`` to one space, trim, casefold. Lowercased
    because the n-gram containment path lowercases everything
    (:func:`_word_ngrams`) — a case-sensitive substring screen would
    silently miss short probes whose only difference is casing, which
    the long-probe path WOULD catch."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def short_probe_hits(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
    n: int = 8,
) -> tuple[int, DataFrame | None]:
    """``(n_short, hits)``: the count of probes shorter than the
    ``n``-gram width and the distinct corpus ids containing any of them
    as a whitespace-normalized, case-folded substring (``None`` when
    every probe is n-gram-checkable). Empty / whitespace-only probes
    are excluded — an empty substring matches everything.

    Probe tables are benchmark-sized by contract (they broadcast for
    the containment scan), so the gating count is one trivially cheap
    job — and it keeps the per-row normalize+contains pass out of the
    plan entirely in the common all-long case. The short-probe set
    broadcasts; the contains check is a row-local nested loop, so the
    corpus never shuffles. One shared implementation: the library
    (:func:`decontaminate`) and the ``curate`` CLI previously carried
    diverging copies of this logic."""
    from pyspark.sql.functions import broadcast

    shorts = (
        probes.select(
            _short_probe_norm(F.col(probe_text_col)).alias("__pnorm")
        )
        .filter(
            (F.size(F.split(F.col("__pnorm"), " ")) < n)
            & (F.length(F.col("__pnorm")) > 0)
        )
        .distinct()
    )
    n_short = shorts.count()
    if n_short == 0:
        return 0, None
    hits = (
        corpus.select(
            F.col(id_col),
            _short_probe_norm(F.col(text_col)).alias("__dnorm"),
        )
        .join(
            broadcast(shorts),
            F.col("__dnorm").contains(F.col("__pnorm")),
        )
        .select(id_col)
        .distinct()
    )
    return n_short, hits


def decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
    n: int = 8,
    min_containment: float = 0.8,
    short_probe_mode: str = "substring",
) -> DataFrame:
    """The action half of :func:`contamination_matches`: DROP every
    corpus document containing any probe (eval example) at containment
    ≥ ``min_containment`` (default 0.8 — the published decontamination
    operating point; the scan's 0.5 default is for AUDITING, where you
    want to see near-misses).

    Probes SHORTER than the ``n``-gram width yield zero n-grams and are
    invisible to the containment scan — the one failure a
    decontamination stage must not hide (QA benchmarks are full of
    sub-8-token answers). ``short_probe_mode="substring"`` (default)
    screens them by case-folded, whitespace-normalized exact-substring
    containment (case-folded to match the n-gram path's lowercasing),
    the published fallback for short eval strings; ``"skip"`` restores
    n-gram-only semantics (callers then own the screening). Empty /
    whitespace-only probes are ignored in either mode (an empty
    substring would match everything).

    One LEFT ANTI join of the corpus against the distinct contaminated
    doc-id set — the id set is benchmark-match-sized (small), so Spark
    broadcasts it and the corpus still never shuffles end-to-end:
    probe-side broadcast for the scan, the short-probe set broadcast
    for a row-local nested-loop contains check (only when short probes
    EXIST — a tiny count of the probe table gates the branch, so the
    common all-long case pays nothing), id-set broadcast for the drop.
    Returns the corpus rows unchanged minus contaminated docs.
    """
    from pyspark.sql.functions import broadcast

    hits = contamination_matches(
        corpus,
        probes,
        id_col=id_col,
        text_col=text_col,
        probe_id_col=probe_id_col,
        probe_text_col=probe_text_col,
        n=n,
        min_containment=min_containment,
    ).select(id_col).distinct()
    if short_probe_mode == "substring":
        _n_short, short_hits = short_probe_hits(
            corpus,
            probes,
            id_col=id_col,
            text_col=text_col,
            probe_text_col=probe_text_col,
            n=n,
        )
        if short_hits is not None:
            hits = hits.union(short_hits).distinct()
    elif short_probe_mode != "skip":
        raise ValueError(
            f"short_probe_mode must be 'substring' or 'skip',"
            f" got {short_probe_mode!r}"
        )
    return corpus.join(broadcast(hits), id_col, "left_anti")


#: line-level boilerplate markers (C4's javascript/cookie screens) —
#: matched case-insensitively as substrings of the line.
LINE_DROP_MARKERS: tuple[str, ...] = (
    "javascript",
    "cookie",
    "terms of use",
    "privacy policy",
)


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    drop_markers: tuple[str, ...] = LINE_DROP_MARKERS,
    out_col: str = "text_clean",
) -> DataFrame:
    """C4-style LINE-level cleaning of web text (Raffel et al. 2020 —
    public): keep only lines that

    * have at least ``min_words_per_line`` whitespace words,
    * end in terminal punctuation (``. ! ? "``) when
      ``require_terminal_punct`` (C4's "retain lines that end in a
      terminal punctuation mark"),
    * contain none of ``drop_markers`` (case-insensitive substring —
      the javascript/cookie-notice screens).

    Appends ``out_col`` (kept lines re-joined with newlines; NULL text
    stays NULL) and ``n_lines_removed``. This targets WEB text —
    running it on source code would delete the code; the code path has
    its own screens in ops/code.

    One ``split`` → ``filter`` (pure lambda predicates) →
    ``concat_ws`` — row-local, zero shuffle, zero Python, scan-fused.
    Document-level C4 screens ("lorem ipsum", the ``{`` brace test)
    belong in :func:`quality_filter`-style verdicts, not line removal.
    """

    def keep(line: Column) -> Column:
        t = F.trim(line)
        words = F.size(
            F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
        )
        cond = words >= min_words_per_line
        if require_terminal_punct:
            cond = cond & t.rlike(r'[.!?"]$')
        low = F.lower(t)
        for m in drop_markers:
            cond = cond & ~low.contains(m.lower())
        return cond

    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, keep)
    return df.withColumns(
        {
            out_col: F.when(
                F.col(text_col).isNotNull(), F.concat_ws("\n", kept)
            ),
            "n_lines_removed": F.coalesce(
                F.size(lines) - F.size(kept), F.lit(0)
            ),
        }
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_tokens: int = 512,
    stride: int | None = None,
    chunk_idx_col: str = "chunk_idx",
    chunk_col: str = "chunk_text",
    chunk_tokens_col: str = "chunk_n_tokens",
) -> DataFrame:
    """Split long documents into token windows — the preprocessing
    embedding pipelines run before encoding (a 100k-token file cannot
    feed a 512-token encoder): one output row per window, every input
    column passed through, plus ``chunk_idx`` / ``chunk_text`` /
    ``chunk_n_tokens``.

    * Tokens are the ``\\s+`` split (the same word notion as the rest
      of this module); chunk text re-joins its window with single
      spaces — the standard lossy-whitespace chunk form (encoders
      retokenize anyway). The op never replaces the original column, so
      nothing upstream loses the exact payload.
    * ``stride`` (default ``max_tokens`` — disjoint windows) < max_tokens
      gives overlapping windows; a final window that adds NO new tokens
      over its predecessor (its end is clamped to the doc end that the
      previous window already reached) is not emitted, so every chunk
      contributes fresh content and chunk counts are deterministic.
    * Entirely ROW-LOCAL: window starts are a ``sequence`` +
      ``filter``, chunks a ``transform`` + ``posexplode_outer`` — zero
      shuffle, zero Python, fuses with the scan. NULL text emits one
      row with NULL chunk columns (lineage keeps every input row
      visible); empty/whitespace text emits none of the chunk rows but
      keeps the row the same way.
    """
    if stride is None:
        stride = max_tokens
    if not (1 <= stride <= max_tokens):
        raise ValueError(
            f"stride must be in [1, max_tokens]; got {stride} vs"
            f" max_tokens {max_tokens}"
        )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    starts = F.when(
        n > 0,
        F.filter(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
            # a window adds new tokens iff it is the first or its
            # UNCLAMPED end exceeds the previous window's clamped end
            lambda s: (s == F.lit(0)) | (s - stride + max_tokens < n),
        ),
    )
    chunk = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s + 1, max_tokens)).alias("t"),
            F.least(n - s, F.lit(max_tokens)).alias("k"),
        ),
    )
    passthrough = [F.col(c) for c in df.columns]
    return df.select(
        *passthrough,
        F.posexplode_outer(chunk).alias(chunk_idx_col, "__chk"),
    ).select(
        *passthrough,
        F.col(chunk_idx_col),
        F.col("__chk")["t"].alias(chunk_col),
        F.col("__chk")["k"].alias(chunk_tokens_col),
    )
