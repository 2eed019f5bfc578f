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
    nonpunct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
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
    symbol_ratio = F.length(F.regexp_replace(t, r"[^.,;:!?#|*=+-]", "")) / safe_chars
    digit_ratio = F.length(F.regexp_replace(t, r"[^0-9]", "")) / safe_chars
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
