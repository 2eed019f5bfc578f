"""Referential-integrity checks as dimension joins.

The reference resolves every referential rule with a per-record HTTP GET
and a driver-local dict cache (OLS: organism_validator_classes.py:50-66;
BioSamples: :247-276). Here every dimension is a pre-materialized DataFrame
registered once, and membership checks are anti joins:

* broadcast hash join when the dimension is small (the common case —
  ontology term sets, language lists), so the fact table never shuffles;
* plain shuffle-hash/sort-merge join when the dimension is large, with AQE
  skew-join splitting handling hot keys at runtime.

A miss (left anti join hit) IS the violation row — the exact analog of the
reference's "Term {term} not found in OLS" error path
(organism_validator_classes.py:31).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.rules import Rule

VIOLATION_COLUMNS = ("record_id", "rule_id", "field", "message", "severity")


class DimensionRegistry:
    """Named dimension tables + a join-strategy hint per dimension."""

    def __init__(self) -> None:
        self._dims: dict[str, tuple[DataFrame, str]] = {}

    def register(self, name: str, df: DataFrame, strategy: str = "broadcast") -> None:
        """strategy: 'broadcast' (explicit F.broadcast — right for small
        dims regardless of autoBroadcastJoinThreshold), 'shuffle' (force
        shuffle-hash via hint — right for huge dims), or 'auto' (let
        Catalyst/AQE decide from stats)."""
        if strategy not in ("broadcast", "shuffle", "auto"):
            raise ValueError(f"unknown join strategy: {strategy}")
        self._dims[name] = (df, strategy)

    def get(self, name: str) -> tuple[DataFrame, str]:
        if name not in self._dims:
            raise KeyError(
                f"dimension {name!r} not registered; have {sorted(self._dims)}"
            )
        return self._dims[name]

    def __contains__(self, name: str) -> bool:
        return name in self._dims


def _prepare_dim(dim: DataFrame, strategy: str) -> DataFrame:
    if strategy == "broadcast":
        return F.broadcast(dim)
    if strategy == "shuffle":
        return dim.hint("shuffle_hash")
    return dim


def membership_violations(
    df: DataFrame,
    rule: Rule,
    dims: DimensionRegistry,
    record_id: Column | str,
) -> DataFrame:
    """kind='ref' rule → violation rows for facts whose ``rule.field`` value
    does not exist in the dimension (J1 semantics).

    Null fact keys are skipped (presence is a `required` rule's job),
    matching the reference's sentinel-skip behavior.
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    dim_name = rule.params["dim"]
    dim_key = rule.params.get("dim_key", rule.field)
    sentinels = tuple(rule.params.get("sentinels", ()))

    dim, strategy = dims.get(dim_name)
    keys = dim.select(F.col(dim_key).alias("__dim_key"))
    if strategy != "broadcast":
        # dedup only when the dim will shuffle: a broadcast HashedRelation
        # is indifferent to duplicate keys under LEFT ANTI, and the
        # distinct would add a whole extra exchange+aggregate stage
        keys = keys.distinct()
    keys = _prepare_dim(keys, strategy)

    facts = df.filter(F.col(rule.field).isNotNull())
    if sentinels:
        facts = facts.filter(~F.col(rule.field).isin(*sentinels))

    misses = facts.join(
        keys, on=facts[rule.field] == keys["__dim_key"], how="left_anti"
    )

    template = rule.message or (
        "Term '{value}' not found in " + dim_name
    )
    msg = _render_value_message(template, F.col(rule.field))
    # record_id is built AFTER the anti join: it exists only for the
    # (rare) miss rows, so the scan stays pruned to the join column plus
    # whatever the id expression needs, and the concat never runs for the
    # happy-path rows
    return misses.select(
        rid.alias("record_id"),
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(rule.field).alias("field"),
        msg.alias("message"),
        F.lit(rule.severity).alias("severity"),
    )


def label_match_violations(
    df: DataFrame,
    rule: Rule,
    dims: DimensionRegistry,
    record_id: Column | str,
) -> DataFrame:
    """J2: provided text must case-insensitively match a known label for the
    term; a miss is a WARNING (organism_validator_classes.py:34-47).

    params: dim (term→labels table), term_field, text_field; optionally
    ``ontology_field`` for the reference's same-ontology preference
    (organism_validator_classes.py:35-40): labels from dim entries whose
    ontology_name matches the record's declared ontology are preferred,
    falling back to ALL of the term's labels only when none match. With
    ``ontology_field`` set the dim must carry (term, ontology_name,
    labels) rows — the OLS multi-doc response shape.
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    dim, strategy = dims.get(rule.params["dim"])
    term_field = rule.params["term_field"]
    text_field = rule.params["text_field"]
    ontology_field = rule.params.get("ontology_field")

    dim_term = F.col(rule.params.get("dim_key", "term")).alias("__dim_term")
    if ontology_field is not None:
        # one entries-array row per term (array_sort for a deterministic
        # expected-label message), pre-aggregated before the broadcast
        labeled = _prepare_dim(
            dim.groupBy(dim_term).agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(
                                rule.params.get("ontology_key", "ontology_name")
                            ).alias("ontology_name"),
                            F.col(rule.params.get("labels_key", "labels")).alias(
                                "labels"
                            ),
                        )
                    )
                ).alias("__entries")
            ),
            strategy,
        )
    else:
        labeled = _prepare_dim(
            dim.select(
                dim_term,
                F.col(rule.params.get("labels_key", "labels")).alias("__labels"),
            ),
            strategy,
        )
    facts = (
        df.withColumn("__rid", rid)
        .filter(F.col(term_field).isNotNull() & F.col(text_field).isNotNull())
        .join(labeled, on=F.col(term_field) == F.col("__dim_term"), how="inner")
    )
    if ontology_field is not None:
        # staged projections (__pref referenced twice, __labels thrice) —
        # higher-order lambdas re-evaluate inline subtrees per reference
        facts = facts.withColumn(
            "__pref",
            F.filter(
                F.col("__entries"),
                lambda e: F.lower(e["ontology_name"])
                == F.lower(F.col(ontology_field)),
            ),
        ).withColumn(
            "__labels",
            F.when(
                F.size("__pref") > 0,
                F.flatten(F.transform(F.col("__pref"), lambda e: e["labels"])),
            ).otherwise(
                F.flatten(F.transform(F.col("__entries"), lambda e: e["labels"]))
            ),
        )
    mismatched = facts.filter(
        ~F.array_contains(F.col("__labels"), F.lower(F.col(text_field)))
    )
    # reference message shape: organism_validator_classes.py:42-46
    msg = F.concat(
        F.lit("Provided value '"),
        F.col(text_field),
        F.lit("' doesn't precisely match '"),
        F.coalesce(F.element_at(F.col("__labels"), 1), F.lit("unknown")),
        F.lit("' for term '"),
        F.col(term_field),
        F.lit("'"),
    )
    return mismatched.select(
        F.col("__rid").alias("record_id"),
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(text_field).alias("field"),
        msg.alias("message"),
        F.lit("warning").alias("severity"),
    )


def closure_membership_violations(
    df: DataFrame,
    rule: Rule,
    dims: DimensionRegistry,
    record_id: Column | str,
) -> DataFrame:
    """J3: breed↔species — the fact's (species, breed) pair must satisfy
    breed ∈ descendants(species_breed_root). Two broadcast joins against
    precomputed closures — the graph is NEVER traversed at query time
    (the reference instead re-queries an external validator per record,
    organism_validator_classes.py:114-140).

    params: link_dim (species_term → breed_root), closure_dim
    (root → descendant), species_field, breed_field, sentinels.

    Emits, matching the reference exactly:
    * "no defined breed links" error when the species has no link row
      (organism_validator_classes.py:117-119);
    * breed-mismatch error when the breed is outside the closure —
      DUPLICATED twice per record, replicating the reference's copy-pasted
      block (organism_validation.py:97-118).
    """
    rid = F.col(record_id) if isinstance(record_id, str) else record_id
    link_dim, link_strategy = dims.get(rule.params.get("link_dim", "species_breed"))
    closure_dim, closure_strategy = dims.get(rule.params.get("closure_dim", "breed_closure"))
    species = rule.params.get("species_field", "organism.term")
    breed = rule.params.get("breed_field", "breed.term")
    species_text = rule.params.get("species_text_field")
    breed_text = rule.params.get("breed_text_field")
    sentinels = tuple(
        rule.params.get("sentinels", ("not applicable", "restricted access"))
    )
    duplicate_emission = bool(rule.params.get("duplicate_emission", False))

    facts = df.withColumn("__rid", rid).filter(
        F.col(species).isNotNull() & F.col(breed).isNotNull()
    )

    links = _prepare_dim(
        link_dim.select(
            F.col("species_term").alias("__species"),
            F.col("breed_root").alias("__root"),
        ),
        link_strategy,
    )
    joined = facts.join(links, on=F.col(species) == F.col("__species"), how="left")

    no_link = joined.filter(F.col("__root").isNull())
    no_link_msg = F.concat(
        F.lit("Organism '"), F.col(species), F.lit("' has no defined breed links.")
    )
    no_link_viols = no_link.select(
        F.col("__rid").alias("record_id"),
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(breed).alias("field"),
        no_link_msg.alias("message"),
        F.lit(rule.severity).alias("severity"),
    )

    # sentinel breeds skip the closure check (organism_validator_classes.py:121-122)
    candidates = joined.filter(F.col("__root").isNotNull())
    if sentinels:
        candidates = candidates.filter(~F.col(breed).isin(*sentinels))

    closure = _prepare_dim(
        closure_dim.select(
            F.col("root").alias("__croot"), F.col("descendant").alias("__desc")
        ),
        closure_strategy,
    )
    misses = candidates.join(
        closure,
        on=(F.col("__root") == F.col("__croot")) & (F.col(breed) == F.col("__desc")),
        how="left_anti",
    )
    # reference message (organism_validation.py:103-106) uses the display
    # texts when available
    breed_disp = F.col(breed_text) if breed_text else F.col(breed)
    species_disp = F.col(species_text) if species_text else F.col(species)
    miss_msg = F.concat(
        F.lit("Breed '"),
        breed_disp,
        F.lit("' doesn't match the animal specie: '"),
        species_disp,
        F.lit("'"),
    )
    miss_viols = misses.select(
        F.col("__rid").alias("record_id"),
        F.lit(rule.rule_id).alias("rule_id"),
        F.lit(breed).alias("field"),
        miss_msg.alias("message"),
        F.lit(rule.severity).alias("severity"),
    )
    if duplicate_emission:
        miss_viols = miss_viols.unionAll(miss_viols)

    return no_link_viols.unionAll(miss_viols)


def _render_value_message(template: str, value_col: Column) -> Column:
    if "{value}" not in template:
        return F.lit(template)
    parts = template.split("{value}")
    pieces: list[Column] = []
    for i, part in enumerate(parts):
        if i:
            pieces.append(F.coalesce(value_col.cast("string"), F.lit("None")))
        if part:
            pieces.append(F.lit(part))
    return F.concat(*pieces) if len(pieces) > 1 else pieces[0]
