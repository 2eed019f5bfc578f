"""Deterministic synthetic fixtures (FIXTURES.md schemas).

The primary fact table ``code_files`` — the BASELINE.json input shape
(repo, path, commit, lang, content) — is generated entirely from
``spark.range(n)`` with Column expressions: no driver-side data, no RNG
state, so the SAME rows materialize at any parallelism and any scale
(unit 1k → bench 10M+). Violations are injected at fixed modular-arithmetic
sites so tests can assert exact recovered counts.

Skew is real: ~30% of rows land in one hot repo ('bigcorp/monorepo') to
exercise the salted two-stage uniqueness aggregation and AQE skew joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS: tuple[str, ...] = (
    "python",
    "java",
    "go",
    "rust",
    "javascript",
    "c",
    "cpp",
    "ruby",
)
LANG_EXT: dict[str, str] = {
    "python": "py",
    "java": "java",
    "go": "go",
    "rust": "rs",
    "javascript": "js",
    "c": "c",
    "cpp": "cc",
    "ruby": "rb",
}
LANG_CATEGORY: dict[str, str] = {
    "python": "interpreted",
    "java": "managed",
    "go": "compiled",
    "rust": "compiled",
    "javascript": "interpreted",
    "c": "compiled",
    "cpp": "compiled",
    "ruby": "interpreted",
}

# violation-injection sites (id mod M == R) — independent primes so each
# rule's expected count is floor arithmetic on n
DUP_MOD, DUP_REM = 50, 49  # duplicate (repo,path,commit) key of id-1
BAD_COMMIT_MOD, BAD_COMMIT_REM = 101, 7  # short commit hex
UNKNOWN_LANG_MOD, UNKNOWN_LANG_REM = 97, 13  # lang not in lang_dim
NULL_CONTENT_MOD, NULL_CONTENT_REM = 103, 5  # required-null
EXT_MISMATCH_MOD, EXT_MISMATCH_REM = 89, 11  # path ext contradicts lang
HOT_REPO_FRACTION_MOD = 10  # ids with id%10 < 3 → hot repo (~30%)


def expected_violation_count(n: int, mod: int, rem: int) -> int:
    """Exact count of ids in [0, n) with id % mod == rem."""
    return (n - rem - 1) // mod + 1 if n > rem else 0


def expected_rule_counts(n: int) -> dict[str, int]:
    """Exact per-rule violation counts for code_files(n), accounting for
    interactions between injection sites (e.g. a duplicate row whose
    original carries an ext-mismatch no longer shares its key, so neither
    row is a duplicate). Pure-Python mirror of the Column logic — test
    oracle only, never used at bench scale."""
    counts = {
        "cf_commit_format": 0,
        "cf_lang_known": 0,
        "cf_content_required": 0,
        "cf_ext_lang_consistency": 0,
    }
    key_multiplicity: dict[tuple, int] = {}
    for i in range(n):
        dup = i % DUP_MOD == DUP_REM and i > 0
        kid = i - 1 if dup else i
        bad_commit = i % BAD_COMMIT_MOD == BAD_COMMIT_REM
        unknown_lang = i % UNKNOWN_LANG_MOD == UNKNOWN_LANG_REM
        null_content = i % NULL_CONTENT_MOD == NULL_CONTENT_REM
        ext_mismatch = i % EXT_MISMATCH_MOD == EXT_MISMATCH_REM
        if bad_commit:
            counts["cf_commit_format"] += 1
        if unknown_lang:
            counts["cf_lang_known"] += 1
        if null_content:
            counts["cf_content_required"] += 1
        # consistency passes when lang is unknown (map lookup null)
        if ext_mismatch and not unknown_lang:
            counts["cf_ext_lang_consistency"] += 1
        # (repo, path, commit) identity ⇔ (kid, effective ext, effective commit)
        key = (kid, ext_mismatch, bad_commit)
        key_multiplicity[key] = key_multiplicity.get(key, 0) + 1
    counts["cf_key_unique"] = sum(
        c for c in key_multiplicity.values() if c > 1
    )
    return counts


def _h(col: F.Column, salt: str) -> F.Column:
    """Deterministic non-negative 64-bit stream per (id, salt)."""
    return F.abs(F.xxhash64(col.cast("string"), F.lit(salt)))


def _sql_str(v) -> str:
    if v is None:
        return "CAST(NULL AS STRING)"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_str(x) for x in v) + ")"
    return "'" + str(v).replace("'", "''") + "'"


def values_df(spark: SparkSession, rows: list[tuple], columns: str) -> DataFrame:
    """Literal table via SQL VALUES → a pure-JVM LocalRelation.

    ``spark.createDataFrame(python_rows)`` routes through a Python RDD
    (``applySchemaToPythonRDD``): every job that touches the frame spins up
    pyspark.daemon workers and serializes rows through Python — measured as
    seconds of overhead PER JOB when such a dim sits under a broadcast
    join. VALUES keeps dimension tables entirely JVM-side.
    """
    body = ", ".join("(" + ", ".join(_sql_str(v) for v in row) + ")" for row in rows)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({columns})")


def code_files(
    spark: SparkSession,
    n: int,
    with_violations: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """The (repo, path, commit, lang, content) fact table at any scale."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    fid = F.col("id")

    dup = (fid % DUP_MOD == DUP_REM) & (fid > 0)
    kid = F.when(dup & F.lit(with_violations), fid - 1).otherwise(fid)

    hot = F.pmod(kid, HOT_REPO_FRACTION_MOD) < 3
    repo = F.when(hot, F.lit("bigcorp/monorepo")).otherwise(
        F.concat(
            F.lit("org"),
            F.pmod(_h(kid, "org"), F.lit(50)).cast("string"),
            F.lit("/repo"),
            F.pmod(_h(kid, "repo"), F.lit(997)).cast("string"),
        )
    )

    lang_arr = F.array(*[F.lit(lang) for lang in LANGS])
    lang_clean = F.element_at(lang_arr, (F.pmod(_h(kid, "lang"), F.lit(len(LANGS))) + 1).cast("int"))
    lang = (
        F.when(
            (fid % UNKNOWN_LANG_MOD == UNKNOWN_LANG_REM) & F.lit(with_violations),
            F.lit("lang_x"),
        ).otherwise(lang_clean)
        if with_violations
        else lang_clean
    )

    ext_map = F.create_map(
        *[F.lit(x) for kv in LANG_EXT.items() for x in kv]
    )
    ext_clean = F.coalesce(ext_map[lang_clean], F.lit("txt"))
    ext = (
        F.when(
            (fid % EXT_MISMATCH_MOD == EXT_MISMATCH_REM) & F.lit(with_violations),
            F.lit("dat"),
        ).otherwise(ext_clean)
        if with_violations
        else ext_clean
    )

    path = F.concat(
        F.lit("src/m"),
        F.pmod(_h(kid, "dir"), F.lit(20)).cast("string"),
        F.lit("/f_"),
        kid.cast("string"),
        F.lit("."),
        ext,
    )

    commit_full = F.substring(F.sha2(F.concat(F.lit("c"), kid.cast("string")), 256), 1, 40)
    commit = (
        F.when(
            (fid % BAD_COMMIT_MOD == BAD_COMMIT_REM) & F.lit(with_violations),
            F.substring(commit_full, 1, 12),
        ).otherwise(commit_full)
        if with_violations
        else commit_full
    )

    # pseudo-source text: 5..64 hash-derived tokens, log-ish length spread
    n_tokens = (F.pmod(_h(kid, "len"), F.lit(60)) + 5).cast("int")
    content_clean = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tokens),
            lambda i: F.substring(
                F.sha2(F.concat(kid.cast("string"), F.lit("_t"), i.cast("string")), 256),
                1,
                (F.pmod(i, F.lit(8)) + 2).cast("int"),
            ),
        ),
    )
    content = (
        F.when(
            (fid % NULL_CONTENT_MOD == NULL_CONTENT_REM) & F.lit(with_violations),
            F.lit(None).cast("string"),
        ).otherwise(content_clean)
        if with_violations
        else content_clean
    )

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def lang_dim(spark: SparkSession) -> DataFrame:
    """Valid-language dimension — the analog of the reference's OLS
    valid-terms set (organism_validator_classes.py:50-66), pre-materialized
    so executors never touch a network."""
    rows = [
        (lang, LANG_EXT[lang], LANG_CATEGORY[lang]) for lang in LANGS
    ]
    return values_df(spark, rows, "lang, ext, category")


def term_labels_dim(spark: SparkSession) -> DataFrame:
    """term → known labels (OLS label-match analog,
    organism_validator_classes.py:34-47)."""
    rows = [
        ("NCBITaxon:9913", ["bos taurus", "cattle"]),
        ("NCBITaxon:9031", ["gallus gallus", "chicken"]),
        ("NCBITaxon:9823", ["sus scrofa", "pig"]),
        ("NCBITaxon:9940", ["ovis aries", "sheep"]),
        ("PATO:0000384", ["male"]),
        ("PATO:0000383", ["female"]),
        ("OBI:0100026", ["organism"]),
        ("LBO:0000487", ["holstein"]),
        ("LBO:0000144", ["charolais"]),
        ("PATO:0000461", ["normal"]),
    ]
    return values_df(spark, rows, "term, labels")


def species_breed_dim(spark: SparkSession) -> DataFrame:
    """species term → LBO breed-class root (SPECIES_BREED_LINKS,
    reference constants.py:218-226)."""
    rows = [
        ("NCBITaxon:89462", "LBO:0001042"),
        ("NCBITaxon:9913", "LBO:0000001"),
        ("NCBITaxon:9031", "LBO:0000002"),
        ("NCBITaxon:9925", "LBO:0000954"),
        ("NCBITaxon:9796", "LBO:0000713"),
        ("NCBITaxon:9823", "LBO:0000003"),
        ("NCBITaxon:9940", "LBO:0000004"),
    ]
    return values_df(spark, rows, "species_term, breed_root")


def breed_closure_dim(spark: SparkSession) -> DataFrame:
    """Transitive closure of a small deterministic LBO subclass tree
    (include_self=True, matching the reference's graph_restriction
    organism_validator_classes.py:124-133). Precomputed offline — graph
    traversal never happens at query time."""
    tree = {
        "LBO:0000001": ["LBO:0000487", "LBO:0000144", "LBO:0000156"],  # cattle
        "LBO:0000002": ["LBO:0000984", "LBO:0000995"],  # chicken
        "LBO:0000003": ["LBO:0000322", "LBO:0000358"],  # pig
        "LBO:0000004": ["LBO:0000619", "LBO:0000654"],  # sheep
        "LBO:0000156": ["LBO:0001000"],  # cattle sub-breed level 2
    }
    closure: list[tuple[str, str]] = []

    def descend(root: str, node: str) -> None:
        closure.append((root, node))
        for child in tree.get(node, []):
            descend(root, child)

    roots = {"LBO:0000001", "LBO:0000002", "LBO:0000003", "LBO:0000004",
             "LBO:0000713", "LBO:0000954", "LBO:0001042"}
    for r in roots:
        descend(r, r)
    return values_df(spark, closure, "root, descendant")


def allowed_relationships_dim(spark: SparkSession) -> DataFrame:
    """ALLOWED_RELATIONSHIPS (reference constants.py:139-153) as a table:
    (child_kind, allowed_parent_kind) pairs."""
    allowed = {
        "organism": ["organism"],
        "organoid": ["specimen_from_organism"],
        "specimen_from_organism": ["organism"],
        "teleostei_embryo": ["organism"],
        "teleostei_post-hatching": ["organism"],
        "pool_of_specimens": [
            "specimen_from_organism",
            "teleostei_embryo",
            "teleostei_post-hatching",
            "cell_specimen",
            "single_cell_specimen",
        ],
        "cell_specimen": ["specimen_from_organism"],
        "single_cell_specimen": ["specimen_from_organism"],
        "cell_culture": ["specimen_from_organism", "cell_specimen"],
        "cell_line": [
            "organism",
            "specimen_from_organism",
            "pool_of_specimens",
            "cell_specimen",
            "cell_culture",
            "cell_line",
        ],
    }
    rows = [(c, p) for c, ps in allowed.items() for p in ps]
    return values_df(spark, rows, "child_kind, parent_kind")


def known_parents_dim(spark: SparkSession) -> DataFrame:
    """External known-parent records — the BioSamples cache analog
    (organism_validator_classes.py:247-276)."""
    rows = [
        ("SAMEA0000001", "Bos taurus", "organism"),
        ("SAMEA0000002", "Bos taurus", "organism"),
        ("SAMEA0000003", "Gallus gallus", "organism"),
        ("SAMEA0000004", "Sus scrofa", "specimen from organism"),
    ]
    return values_df(spark, rows, "id, species, material")


def edges_fixture(spark: SparkSession) -> DataFrame:
    """Relationship fixture (FIXTURES.md §3) with every G1-G3/J4-J5 case:
    dangling parent, species mismatch, 2-cycle, >2 parents,
    'restricted access' skip, and an external SAM* parent."""
    rows = [
        ("ORG1", ["ORG2"], "Bos taurus"),          # clean parent link
        ("ORG2", [], "Bos taurus"),                  # root
        ("ORG3", ["ORG_MISSING"], "Bos taurus"),    # dangling (J4)
        ("ORG4", ["ORG2"], "Gallus gallus"),        # species mismatch (G1)
        ("ORG5", ["ORG6"], "Sus scrofa"),           # 2-cycle half (G2)
        ("ORG6", ["ORG5"], "Sus scrofa"),           # 2-cycle half (G2)
        ("ORG7", ["ORG1", "ORG2", "ORG4"], "Bos taurus"),  # >2 parents (R12)
        ("ORG8", ["restricted access"], "Ovis aries"),     # skip sentinel
        ("ORG9", ["SAMEA0000001"], "Bos taurus"),   # external parent (J4 ok)
    ]
    return values_df(spark, rows, "child_id, parent_ids, species")


def embeddings_table(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    partitions: int | None = None,
    n_clusters: int = 0,
    noise: float = 0.3,
) -> DataFrame:
    """Deterministic synthetic (vec_id, embedding array<double>) corpus at
    any scale — pure JVM-side expressions (one or two xxhash64 per
    component), identical on every run/partitioning.

    ``n_clusters=0`` → components uniform in [-1, 1): the ADVERSARIAL
    case for bucketed ANN (no structure, every neighbor near a cell
    boundary). ``n_clusters=k`` → vector = cluster_center(id % k) +
    noise·jitter: the realistic shape of trained embedding spaces
    (documents cluster by topic), where IVF recall is meaningful. Used
    by the bench's IVF-vs-exact crossover."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    if n_clusters > 0:
        c = F.col("id") % n_clusters
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.xxhash64(F.lit(0x517), c, j).cast("double") / F.lit(float(2**63))
                + F.lit(noise)
                * (F.xxhash64(F.col("id"), j).cast("double") / F.lit(float(2**63)))
            ),
        )
    else:
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.xxhash64(F.col("id"), j).cast("double") / F.lit(float(2**63))
            ),
        )
    return df.select(F.col("id").alias("vec_id"), vec.alias("embedding"))
