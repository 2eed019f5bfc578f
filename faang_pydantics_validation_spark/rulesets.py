"""Built-in rulesets.

``code_files_ruleset`` is the BASELINE.json north-rule target: constraints
over an Iceberg/parquet table (repo, path, commit, lang, content).
``documents_ruleset`` profiles the driver's synthetic documents table
(TESTDATA.md) so the same engine is exercised against real parquet via the
DuckDB oracle.
"""

from __future__ import annotations

from faang_pydantics_validation_spark.fixtures import LANG_EXT
from faang_pydantics_validation_spark.rules import Rule, RuleSet


def code_files_ruleset() -> RuleSet:
    """Constraints over (repo, path, commit, lang, content).

    Mirrors the reference's rule kinds (SURVEY.md §2.2) re-targeted at the
    source-code table: required fields (R1 analog), commit-hex regex (R5),
    path charset regex (R5), lang referential membership (R3/J1 — resolved
    as a broadcast anti join by dims.py), path-extension↔lang consistency
    (R8 analog), and key uniqueness (G3, salted two-stage agg).
    """
    ext_map_sql = ", ".join(f"'{k}', '{v}'" for k, v in LANG_EXT.items())
    return RuleSet(
        name="code_files",
        known_fields=("repo", "path", "commit", "lang", "content"),
        # the record id IS concat(repo, path, commit) — the unique keys —
        # so per-checkpoint-slice uniqueness equals global uniqueness
        unique_keys_determine_record_id=True,
        rules=(
            Rule("cf_repo_required", "repo", "required", tier="mandatory"),
            Rule("cf_path_required", "path", "required", tier="mandatory"),
            Rule("cf_commit_required", "commit", "required", tier="mandatory"),
            Rule("cf_content_required", "content", "required", tier="mandatory"),
            Rule(
                "cf_commit_format",
                "commit",
                "regex",
                params={"pattern": "^[0-9a-f]{40}$"},
                message="Invalid commit hash: '{value}' is not 40-char lowercase hex",
            ),
            Rule(
                "cf_path_format",
                "path",
                "regex",
                params={"pattern": r"^[A-Za-z0-9_./-]+$"},
                message="Invalid path: '{value}' contains illegal characters",
            ),
            Rule(
                "cf_repo_format",
                "repo",
                "regex",
                params={"pattern": r"^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$"},
                message="Invalid repo slug: '{value}'",
            ),
            # R8 analog: the file extension must agree with lang when the
            # lang is one we know; unknown langs pass here (they are the
            # referential rule's problem) — same unknown-key-passes
            # semantics as the reference's text↔term map check
            # (standard_ruleset.py:58-60).
            Rule(
                "cf_ext_lang_consistency",
                "path",
                "expr",
                params={
                    "expression": (
                        f"map({ext_map_sql})[lang] IS NULL OR path IS NULL "
                        f"OR regexp_extract(path, '\\\\.([A-Za-z0-9]+)$', 1) "
                        f"= map({ext_map_sql})[lang]"
                    )
                },
                message="File extension does not match lang",
                layer=2,
            ),
            # table-scoped: dispatched to dims.py / checks/uniqueness.py
            Rule(
                "cf_lang_known",
                "lang",
                "ref",
                params={"dim": "lang_dim", "dim_key": "lang"},
                message="Language '{value}' not found in lang dimension",
            ),
            Rule(
                "cf_key_unique",
                "repo",
                "unique",
                params={"keys": ["repo", "path", "commit"]},
                message="Duplicate (repo, path, commit) key",
            ),
        ),
    )


DOCUMENT_LANGS = ("en", "zh", "es", "de", "fr")


def documents_ruleset() -> RuleSet:
    """Profile rules for the driver's documents table (TESTDATA.md):
    doc_id, text, lang, source, n_chars. Includes rules that actually fire
    on clean data (short-text warning) so the fused pass produces non-empty
    output for the oracle to compare."""
    return RuleSet(
        name="documents",
        known_fields=("doc_id", "text", "lang", "source", "n_chars"),
        rules=(
            Rule("doc_text_required", "text", "required", tier="mandatory"),
            Rule("doc_lang_required", "lang", "required", tier="mandatory"),
            Rule(
                "doc_lang_enum",
                "lang",
                "enum",
                params={"values": list(DOCUMENT_LANGS)},
            ),
            Rule(
                "doc_source_format",
                "source",
                "regex",
                params={"pattern": "^src[0-9]+$"},
            ),
            Rule(
                "doc_nchars_consistency",
                "n_chars",
                "expr",
                params={
                    "expression": "n_chars IS NULL OR text IS NULL OR n_chars = length(text)"
                },
                message="n_chars does not equal length(text)",
            ),
            Rule(
                "doc_short_text",
                "n_chars",
                "range",
                params={"min": 200},
                severity="warning",
                message="Short document: {value} chars (< {min})",
                layer=2,
            ),
        ),
    )
