"""spark-submit entry point.

Cluster usage (north rule: packaged for --py-files, run at N and 4N
executors):

    python -m faang_pydantics_validation_spark.cli package --out engine.zip
    spark-submit --py-files engine.zip \\
        --master <cluster> --num-executors N \\
        -m faang_pydantics_validation_spark.cli run \\
        --input s3://bucket/code_files --ruleset code_files \\
        --output /out/run1 --checkpoint /out/run1_ckpt

Local sandbox equivalent (what bench.py automates):

    python -m faang_pydantics_validation_spark.cli run \\
        --synthetic 1000000 --cores 8 --output /tmp/out

``run`` validates the table, writes ``verdicts/`` and ``violations/``
parquet plus a summary JSON; with ``--checkpoint`` the run is resumable —
completed partitions (atomic manifest, per-partition lineage) are skipped
on re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile


def make_pyfiles_zip(out_path: str) -> str:
    """Zip the package for spark-submit --py-files (pure-python, no
    build system needed)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def _parse_mixture(spec: str) -> dict[str, float]:
    """argparse ``type=`` validator for ``--mixture LANG=W,...`` — turns
    malformed specs into a clear usage error instead of a bare
    ValueError from a float cast deep inside the job."""
    if not spec:
        return {}
    weights: dict[str, float] = {}
    for part in spec.split(","):
        lang, sep, w = part.partition("=")
        lang = lang.strip()
        if not sep or not lang:
            raise argparse.ArgumentTypeError(
                f"malformed mixture entry {part!r}: expected LANG=WEIGHT"
                " (e.g. python=0.5,go=0.3)"
            )
        try:
            weight = float(w)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"malformed mixture weight {w!r} for language {lang!r}:"
                " expected a number"
            ) from None
        if weight <= 0:
            raise argparse.ArgumentTypeError(
                f"mixture weight for {lang!r} must be > 0, got {w!r}"
            )
        if lang in weights:
            raise argparse.ArgumentTypeError(
                f"language {lang!r} appears twice in --mixture"
            )
        weights[lang] = weight
    return weights


def _min_docs(v: str) -> int:
    """argparse ``type=`` validator for ``--line-dedup MIN_DOCS``."""
    try:
        iv = int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"MIN_DOCS must be an integer, got {v!r}"
        ) from None
    if iv < 2:
        raise argparse.ArgumentTypeError(
            f"MIN_DOCS must be >= 2 (a line in 1 document is not"
            f" cross-document boilerplate), got {v!r}"
        )
    return iv


def _build_session(args):
    from faang_pydantics_validation_spark.session import get_spark

    return get_spark(
        app_name="fpvs-cli",
        cores=args.cores,
        shuffle_partitions=getattr(args, "shuffle_partitions", None),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _tune_scan_splits(spark, path) -> None:
    """Size ``spark.sql.files.maxPartitionBytes`` from the ACTUAL input
    so the scan stage is at least ~3 tasks per core.

    The row-local annotate chain (quality + secrets + repetition folds +
    classifier — the most expensive per-row compute in curate) executes
    inside the SCAN stage, before the first shuffle. Spark bin-packs
    small files up to maxPartitionBytes (default 128 MB) per split, so a
    sub-GB input collapses to fewer splits than the session has cores
    and the heaviest stage runs under-parallel (measured: a 262 MB /
    64-file table planned ~5 splits — 3 of 8 cores idle through the
    whole fused core, core-phase scaling efficiency 0.68). At 100 TB
    this is a NO-OP: the clamp keeps production split sizing (128 MB)
    whenever splits >> cores.
    """
    try:
        jvm = spark._jvm
        hconf = spark.sparkContext._jsc.sc().hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        total = int(
            p.getFileSystem(hconf).getContentSummary(p).getLength()
        )
    except Exception:
        return  # unreadable/remote-unsupported path: keep defaults
    cores = spark.sparkContext.defaultParallelism
    if not total or not cores:
        return
    target = max(4 << 20, min(128 << 20, total // (3 * cores)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    # the per-file open cost counts toward the bin when packing many
    # small files; scale it with the split target so packing tracks
    # real bytes instead of the 4 MB default dwarfing a 4 MB target
    spark.conf.set(
        "spark.sql.files.openCostInBytes", str(max(1, target // 32))
    )
    # POST-shuffle width matters just as much: AQE's parallelism-first
    # coalescing targets totalBytes/defaultParallelism, i.e. ONE task
    # per core — and the fused annotate chain (75% of all executor time,
    # measured) sits in a post-shuffle stage, where 9 tasks on 8 cores
    # is 2 waves with half the machine idle in the second (8-core
    # utilization 0.70 vs 0.836 at 2 cores in the event log). Respect
    # an input-sized advisory instead, so heavy stages run ~3 waves of
    # small tasks at every width; the clamp keeps the advisory at the
    # production 64-128 MB scale for big inputs, where splits >> cores
    # already and this is again a no-op.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        str(min(64 << 20, target)),
    )


def _load_input(spark, args):
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark import fixtures

    if args.synthetic:
        return fixtures.code_files(spark, args.synthetic)
    reader = spark.read
    if args.format == "parquet":
        _tune_scan_splits(spark, args.input)
        return reader.parquet(args.input)
    if args.format == "iceberg":
        return spark.table(args.input)
    raise SystemExit(f"unknown input format {args.format}")


def _ruleset_and_id(name: str, spark):
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark import fixtures
    from faang_pydantics_validation_spark.dims import DimensionRegistry
    from faang_pydantics_validation_spark.organism import (
        organism_record_id,
        organism_ruleset,
    )
    from faang_pydantics_validation_spark.rulesets import (
        code_files_ruleset,
        documents_ruleset,
    )

    dims = DimensionRegistry()
    if name == "code_files":
        dims.register("lang_dim", fixtures.lang_dim(spark), strategy="broadcast")
        rid = F.concat_ws("@", F.concat_ws(":", "repo", "path"), "commit")
        return code_files_ruleset(), rid, dims, "content"
    if name == "documents":
        return documents_ruleset(), F.col("doc_id").cast("string"), dims, "text"
    if name == "organism":
        return organism_ruleset(), organism_record_id(), dims, None
    raise SystemExit(f"unknown ruleset {name}")


def cmd_run(args) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.runner import run_validation

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    df = _load_input(spark, args)
    ruleset, rid, dims, sha_col = _ruleset_and_id(args.ruleset, spark)

    t0 = time.monotonic()
    if args.checkpoint:
        from faang_pydantics_validation_spark.checkpoint import (
            CheckpointManifest,
            partition_key,
            run_partitioned,
        )

        # Checkpointed runs slice the table by partition, so table-scoped
        # 'unique' rules are evaluated per slice. That is correct ONLY
        # when the unique-rule keys functionally determine the record_id
        # the partition key hashes (code_files: rid IS (repo,path,commit),
        # the unique keys — equal keys ⇒ equal rid ⇒ same slice, so no
        # cross-slice duplicate can be missed). The ruleset DECLARES that
        # invariant (RuleSet.unique_keys_determine_record_id); refuse
        # combinations that don't.
        if (
            any(r.kind == "unique" for r in ruleset.table_scoped)
            and not ruleset.unique_keys_determine_record_id
        ):
            raise SystemExit(
                f"--checkpoint with ruleset '{args.ruleset}' is unsafe: it "
                "has a 'unique' rule whose keys are not declared to determine "
                "the partition key (RuleSet.unique_keys_determine_record_id); "
                "per-slice evaluation would miss cross-partition duplicates"
            )

        n_parts = args.n_checkpoint_partitions
        manifest = CheckpointManifest(args.checkpoint)
        key = partition_key(rid, n_parts)

        def process_group(part_df, group):
            """One validation DAG per group. Writes land under
            __ckpt_part=<pid>/ via dynamic partition overwrite (a retried
            group replaces only its own partitions); per-partition lineage
            counts come from a partition-pruned, column-pruned read-back
            of the just-written verdicts — one small job per group, not
            one full-DAG job per partition."""
            out = run_validation(
                part_df.drop("__ckpt_part"), ruleset, rid, dims=dims,
                sha_col=sha_col,
            )
            # record_id carries the same string rid hashed by `key`, so
            # the re-derived partition column matches the input slicing
            repart = partition_key(F.col("record_id"), n_parts)
            for frame, sub in (
                (out.verdicts.withColumn("__ckpt_part", repart), "verdicts"),
                (out.violations.withColumn("__ckpt_part", repart), "violations"),
            ):
                (
                    frame.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__ckpt_part")
                    .parquet(f"{args.output}/{sub}")
                )
            from pyspark.errors import AnalysisException

            try:
                stats = (
                    spark.read.parquet(f"{args.output}/verdicts")
                    .filter(F.col("__ckpt_part").isin(group))
                    .groupBy("__ckpt_part")
                    .agg(F.count(F.lit(1)).alias("n"), F.sum("n_errors").alias("e"))
                    .collect()
                )
            except AnalysisException:
                # an all-empty group writes no files at all; reading the
                # (still nonexistent) output dir raises — record zeros so
                # the empty hash slots still get manifest entries
                return {}
            return {
                int(r["__ckpt_part"]): (int(r["n"]), int(r["e"] or 0))
                for r in stats
            }

        lineage = run_partitioned(
            df, key, n_parts, manifest, process_group
        )
        summary = {
            "partitions_processed": len(lineage),
            "partitions_total": args.n_checkpoint_partitions,
            "rows": sum(l.rows_scanned for l in manifest.lineage()),
            "violations": sum(l.violations for l in manifest.lineage()),
        }
    else:
        out = run_validation(df, ruleset, rid, dims=dims, sha_col=sha_col)
        out.verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
        out.violations.write.mode("overwrite").parquet(f"{args.output}/violations")
        row = out.summary().collect()[0]
        summary = {
            "rows": row.total,
            "valid": row.valid,
            "invalid": row.invalid,
            "warnings": row.warnings,
        }
    summary["wall_sec"] = round(time.monotonic() - t0, 2)
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/summary.json", "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


#: curate pipeline stages in execution order; a dropped row is
#: attributed to the EARLIEST stage among its drop reasons (the
#: row-local stages accumulate reasons in one fused pass, so a file can
#: carry both a quality and a secrets reason — it died at quality).
CURATE_STAGES: tuple[tuple[int, str], ...] = (
    (1, "quality"),
    (2, "secrets"),
    (3, "repetition"),
    (4, "classifier"),
    (5, "license"),
    (6, "exact_dedup"),
    (7, "near_dup"),
    (8, "semantic_dedup"),
    (9, "decontaminate"),
    (10, "mixture"),
)


def _reason_stage(reason):
    """Column expr: drop-reason string → stage ordinal (CURATE_STAGES).
    Quality rule ids match the EXPORTED closed set, not a catch-all: a
    reason this map doesn't recognize (a renamed stage, a new rule that
    forgot to register) books to ordinal 0, which the lineage builder
    surfaces as an explicit ``unknown_reason`` stage instead of silently
    attributing the drop to quality."""
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops.code import (
        CODE_QUALITY_RULE_IDS,
    )

    return (
        F.when(reason.isin(*CODE_QUALITY_RULE_IDS), 1)
        .when(reason == "secrets", 2)
        .when(reason.startswith("rep_"), 3)
        .when(reason == "low_classifier_score", 4)
        .when(reason == "restrictive_license", 5)
        .when(reason == "exact_dup", 6)
        .when(reason == "near_dup", 7)
        .when(reason == "semantic_dup", 8)
        .when(reason == "contaminated", 9)
        .when(reason == "mixture", 10)
        .otherwise(0)
    )


def _curate_core(spark, df, args, carry: tuple[str, ...] = (), clf=None):
    """The fused single-pass core of curate — row-local annotate chain
    (quality, secrets, license, optional repetition + learned
    classifier) plus the content-sha-keyed exact-dedup window — factored
    out so the checkpointed path can run it per content-sha SHARD:
    equal shas hash to the same shard, so per-shard dedup IS global
    dedup and a resumed run is bit-identical to an unsharded one.
    ``carry`` names extra input columns (e.g. the checkpoint partition
    id) to pass through the staged projection; ``clf`` is an optional
    pre-loaded ``(weights_df, n_features, weight_row, dense_weights)``
    tuple — the checkpointed path builds it so the classifier artifact
    is read and densified ONCE per run (the materialized row / numpy
    array is reused by every shard group) instead of re-densified
    inside each group's job. Scoring defaults to the Arrow kernel
    (1.52× end-to-end in the round-5 alternating A/B at 1M rows);
    ``--classifier-fused`` restores the expression fold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops import code as cd
    from faang_pydantics_validation_spark.ops import text as tx

    rid = F.concat_ws("@", F.concat_ws(":", "repo", "path"), "commit")
    ann = cd.code_quality_filter(df)
    ann = cd.scan_secrets(ann)
    ann = cd.detect_license(ann)
    if args.repetition:
        ann = tx.repetition_filter(ann, "content")
    if args.quality_classifier:
        # learned quality score (ops/classify): the weight table is a
        # persisted artifact from `fpvs train-classifier`; scoring is a
        # single-row broadcast join + row-local fold, so it fuses into
        # the same annotate pass as the rule-based screens. The feature
        # space is recovered from the artifact's own bias row.
        from faang_pydantics_validation_spark.ops.classify import (
            classifier_n_features,
            classifier_score,
        )

        if clf is None:
            wdf = spark.read.parquet(args.quality_classifier)
            clf = (wdf, classifier_n_features(wdf), None, None)
        ann = classifier_score(
            ann,
            clf[0],
            text_col="content",
            n_features=clf[1],
            out_col="quality_prob",
            arrow=getattr(args, "classifier_arrow", True),
            weight_row=clf[2],
            dense_weights=clf[3],
        )
    base_reasons = F.when(
        F.col("has_secrets"),
        F.array_append(F.col("code_drop_reasons"), F.lit("secrets")),
    ).otherwise(F.col("code_drop_reasons"))
    if args.repetition:
        base_reasons = F.concat(base_reasons, F.col("rep_drop_reasons"))
    if args.quality_classifier:
        # NULL prob (NULL content) adds no reason here — the NULL
        # content already died at the quality stage, which owns it
        base_reasons = F.when(
            F.col("quality_prob") < F.lit(args.quality_prob_min),
            F.array_append(base_reasons, F.lit("low_classifier_score")),
        ).otherwise(base_reasons)
    if args.require_permissive_license:
        # unknown license (NULL) passes — unknown ≠ non-permissive;
        # an identified restrictive license drops
        base_reasons = F.when(
            F.col("license_permissive") == False,  # noqa: E712 (three-valued)
            F.array_append(base_reasons, F.lit("restrictive_license")),
        ).otherwise(base_reasons)
    staged = ann.select(
        "repo", "path", "commit", "lang", "content", "license_id",
        *(["lines_deduped"] if args.line_dedup else []),
        *(["quality_prob"] if args.quality_classifier else []),
        *carry,
        rid.alias("record_id"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        base_reasons.alias("__base_reasons"),
    )
    # exact dedup among the rows that survived the row-local stages:
    # cumulative keep-count per sha (ordered by record_id) is 1 for the
    # first surviving copy, >1 for later ones — dropped rows never
    # shield a later duplicate. NULL-sha rows (required-null content)
    # are already dropped row-locally and excluded from ranking.
    base_keep = (F.size("__base_reasons") == 0).cast("int")
    w = (
        Window.partitionBy("content_sha")
        .orderBy("record_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curated = staged.withColumn(
        "drop_reasons",
        F.when(
            (base_keep == 1) & (F.sum(base_keep).over(w) > 1),
            F.array(F.lit("exact_dup")),
        ).otherwise(F.col("__base_reasons")),
    ).drop("__base_reasons")
    return curated.withColumn("kept", F.size("drop_reasons") == 0)


def _load_probes(spark, path: str):
    """Read + schema-validate a decontamination probe table (columns
    ``probe_id, text``) — shared by the single-pass and checkpointed
    curate paths so the contract error is identical in both."""
    probes = spark.read.parquet(path)
    if not {"probe_id", "text"} <= set(probes.columns):
        raise SystemExit(
            "--decontaminate table must have columns (probe_id, text);"
            f" got {probes.columns}"
        )
    return probes


def _mark_contaminated(curated, probes, min_containment, announce_short=True):
    """Mark kept rows containing any eval probe with reason
    ``contaminated`` — n-gram containment with the probe table
    broadcast, plus the shared short-probe substring fallback
    (ops/text.short_probe_hits) for probes under the 8-token n-gram
    width. Row-local against BROADCAST side tables, so it is shard-safe:
    the resumable curate path applies it per content-sha shard and the
    result is bit-identical to the unsharded run (a row's verdict
    depends only on its own text and the probes). ``announce_short``
    suppresses the per-call short-probe note in sharded mode, where the
    caller prints it once up front."""
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops.text import (
        contamination_matches,
        short_probe_hits,
    )

    survivors = curated.filter("kept").select("record_id", "content")
    n_short, short_hit_ids = short_probe_hits(
        survivors,
        probes,
        id_col="record_id",
        text_col="content",
        probe_text_col="text",
        n=8,
    )
    if n_short and announce_short:
        print(
            f"note: {n_short} probe(s) shorter than the 8-token"
            " n-gram width screened by exact-substring containment"
            " instead",
            file=sys.stderr,
        )
    hits = contamination_matches(
        survivors,
        probes,
        id_col="record_id",
        text_col="content",
        min_containment=min_containment,
    ).select("record_id")
    if short_hit_ids is not None:
        hits = hits.union(short_hit_ids)
    hits = (
        hits.distinct()
        # benchmark-sized; materialize once instead of re-running the
        # n-gram containment scan on every downstream reference
        .localCheckpoint(eager=True)
    )
    return (
        curated.join(
            F.broadcast(hits.withColumn("__ct", F.lit(True))),
            "record_id",
            "left",
        )
        .withColumn(
            "drop_reasons",
            F.when(
                F.col("__ct").isNotNull() & F.col("kept"),
                F.array(F.lit("contaminated")),
            ).otherwise(F.col("drop_reasons")),
        )
        .withColumn("kept", F.size("drop_reasons") == 0)
        .drop("__ct")
    )


def _curate_counters(spark, args):
    """Shared summary bookkeeping for BOTH curate paths (single-pass
    and checkpointed), from a column-pruned read-back of the WRITTEN
    parquet — never a second pass over the input. Returns
    ``(out_df, summary)`` where summary carries rows_in/kept/dropped,
    per-reason counts, earliest-stage lineage (active stages derive
    from the same args in both modes — the checkpointed path refuses
    the corpus-global flags up front, so only its shard-safe stages,
    incl. decontaminate, can be active there), and
    the kept-corpus classifier score profile when the learned screen is
    on. One definition so the two paths cannot drift."""
    from pyspark.sql import functions as F

    out_df = spark.read.parquet(f"{args.output}/curated")
    rows_in = out_df.count()
    kept = out_df.filter(F.col("status") == "kept").count()
    reason_counts = {
        r.reason: r.n
        for r in out_df.filter(F.col("status") == "dropped")
        .select(F.explode("drop_reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # per-stage lineage from ONE agg over the dropped partition: each
    # dropped row's earliest-stage reason, counted by stage
    stage_drops = {
        int(r.stage): int(r.n)
        for r in out_df.filter(F.col("status") == "dropped")
        .select(
            F.array_min(F.transform("drop_reasons", _reason_stage)).alias(
                "stage"
            )
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    active = {1, 2, 6}
    if args.repetition:
        active.add(3)
    if args.quality_classifier:
        active.add(4)
    if args.require_permissive_license:
        active.add(5)
    if args.neardup:
        active.add(7)
    if args.semdedup:
        active.add(8)
    if args.decontaminate:
        active.add(9)
    if args.mixture:
        active.add(10)
    lineage, running = [], rows_in
    unknown = stage_drops.pop(0, 0)
    if unknown:
        # reasons no stage claims (see _reason_stage): keep the audit
        # reconciling AND make the anomaly impossible to miss
        lineage.append(
            {
                "stage": "unknown_reason",
                "rows_in": running,
                "dropped": unknown,
                "rows_out": running - unknown,
            }
        )
        running -= unknown
    for sid, stage_name in CURATE_STAGES:
        if sid not in active:
            continue
        d = stage_drops.get(sid, 0)
        lineage.append(
            {
                "stage": stage_name,
                "rows_in": running,
                "dropped": d,
                "rows_out": running - d,
            }
        )
        running -= d
    summary = {
        "rows_in": rows_in,
        "kept": kept,
        "dropped": rows_in - kept,
        "drop_reason_counts": reason_counts,
        "stage_lineage": lineage,
    }
    if args.quality_classifier:
        # kept-corpus score profile from the written parquet (no second
        # input pass) — the number a recurring ingest trends run over
        # run: a drifting p10 means the upstream corpus got worse before
        # any rule-based screen notices
        qp = (
            out_df.filter(F.col("status") == "kept")
            .agg(
                F.percentile_approx(
                    "quality_prob", [0.1, 0.5, 0.9]
                ).alias("q"),
                F.avg("quality_prob").alias("m"),
            )
            .collect()[0]
        )
        summary["classifier"] = {
            "prob_min": args.quality_prob_min,
            "kept_prob_p10_p50_p90": [
                round(float(x), 4) for x in (qp.q or [])
            ],
            "kept_prob_mean": (
                round(float(qp.m), 4) if qp.m is not None else None
            ),
        }
    return out_df, summary


def _cmd_curate_checkpointed(spark, df, args, t0, owns_session) -> int:
    """Resumable curation: the fused single-pass core, sharded by
    ``pmod(xxhash64(sha2(content)), K)`` through the SAME manifest
    machinery as ``run --checkpoint``. The shard key is the content
    sha, so every copy of a given payload lands in one shard and
    per-shard exact dedup IS global exact dedup — a resumed run is
    result-identical to an unsharded one (survivor choice orders by
    record_id within the sha, entirely shard-local). Completed shards
    are skipped on re-run; a crash loses at most one in-flight group.

    Decontamination IS allowed here: it is row-local against BROADCAST
    probe tables (ops/text.contamination_matches + short_probe_hits),
    so a row's verdict never depends on any other row — per-shard
    marking equals global marking. The probe table and the short-probe
    gate are hoisted once per run (probes localCheckpoint; the note
    prints once), then each shard group applies the same mark.

    Corpus-GLOBAL stages (line dedup, MinHash/semantic dedup, mixture,
    packing, baselines) cannot be sharded by content and are refused up
    front — run them unsharded, or downstream of the resumable core's
    output.
    """
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.checkpoint import (
        CheckpointManifest,
        partition_key,
        run_partitioned,
    )

    blocked = {
        "--line-dedup": args.line_dedup,
        "--neardup": args.neardup,
        "--semdedup": args.semdedup,
        "--mixture": bool(args.mixture),
        "--pack": args.pack,
        "--save-baseline": args.save_baseline,
        "--baseline": args.baseline,
    }
    bad = [k for k, v in blocked.items() if v]
    if bad:
        raise SystemExit(
            "--checkpoint resumes the fused single-pass core only; these"
            " corpus-global stages cannot be sharded by content:"
            f" {', '.join(bad)}"
        )
    n_parts = args.n_checkpoint_partitions
    manifest = CheckpointManifest(args.checkpoint)
    key = partition_key(F.sha2(F.col("content"), 256), n_parts)
    clf = None
    if args.quality_classifier:
        # load, probe AND densify the weight artifact ONCE per run —
        # per-group reloads would re-run the densification (and the
        # artifact's parquet scan behind a lazy read) for every shard
        # group. Arrow mode (the default) hoists the dense numpy array;
        # fused mode hoists the localCheckpointed single-row frame.
        from faang_pydantics_validation_spark.ops.classify import (
            classifier_n_features,
            collect_dense_weights,
            prepare_weight_row,
        )

        wdf = spark.read.parquet(args.quality_classifier)
        nf = classifier_n_features(wdf)
        if getattr(args, "classifier_arrow", True):
            clf = (wdf, nf, None, collect_dense_weights(wdf, nf))
        else:
            clf = (wdf, nf, prepare_weight_row(wdf, nf), None)
    probes = None
    if args.decontaminate:
        # hoist the probe artifact ONCE per run: schema validation, a
        # localCheckpoint so shard groups reuse the materialized
        # (benchmark-sized) table instead of re-scanning its parquet,
        # and the short-probe note (probe-side only — counted against
        # an empty corpus so the shared helper's gating logic is the
        # single source of truth for what counts as "short")
        from faang_pydantics_validation_spark.ops.text import (
            short_probe_hits,
        )

        probes = _load_probes(spark, args.decontaminate).localCheckpoint(
            eager=True
        )
        n_short, _ = short_probe_hits(
            df.select(
                F.lit("").alias("record_id"), F.col("content")
            ).limit(0),
            probes,
            id_col="record_id",
            text_col="content",
            probe_text_col="text",
            n=8,
        )
        if n_short:
            print(
                f"note: {n_short} probe(s) shorter than the 8-token"
                " n-gram width screened by exact-substring containment"
                " instead",
                file=sys.stderr,
            )

    def process_group(part_df, group):
        cur = _curate_core(
            spark, part_df, args, carry=("__ckpt_part",), clf=clf
        )
        if probes is not None:
            # row-local vs broadcast probes — shard-safe (see docstring)
            cur = _mark_contaminated(
                cur,
                probes,
                args.decontaminate_containment,
                announce_short=False,
            )
        cur = cur.withColumn(
            "status", F.when(F.col("kept"), "kept").otherwise("dropped")
        )
        (
            cur.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__ckpt_part", "status")
            .parquet(f"{args.output}/curated")
        )
        from pyspark.errors import AnalysisException

        try:
            stats = (
                spark.read.parquet(f"{args.output}/curated")
                .filter(F.col("__ckpt_part").isin(group))
                .groupBy("__ckpt_part")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_if(F.col("status") == "dropped").alias("d"),
                )
                .collect()
            )
        except AnalysisException:
            return {}  # all-empty group wrote nothing; record zeros
        return {
            int(r["__ckpt_part"]): (int(r["n"]), int(r["d"]))
            for r in stats
        }

    lineage = run_partitioned(df, key, n_parts, manifest, process_group)

    _out_df, summary = _curate_counters(spark, args)
    summary["partitions_processed"] = len(lineage)
    summary["partitions_total"] = n_parts
    summary["wall_sec"] = round(time.monotonic() - t0, 2)
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/summary.json", "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def cmd_curate(args) -> int:
    """Training-corpus curation over the code table: quality filter →
    secret screen → license tag → exact dedup (→ optional MinHash
    near-dup components), one audited output.

    Plan shape: the quality/secret/license stages are row-local column
    programs fused with the scan; exact dedup adds ONE exchange hashed
    by the content sha256 (computed pre-exchange — the shuffle carries
    64B digests + the audit columns, not re-derived payloads). The
    whole annotated frame is written ONCE, partitioned by the final
    keep verdict, so the kept corpus and the drop audit are partition
    directories of the same write — no second pass over the input.
    Near-dup (--neardup) adds the banded MinHash self-join + component
    resolution from ops/dedup, applied to the exact-dedup survivors.
    --repetition adds the Gopher-style repetitious-text screen
    (ops/text.repetition_filter) — still row-local, still fused into
    the same single pass as the other quality stages.
    --quality-classifier WEIGHTS scores every doc with the trained
    linear model (fpvs train-classifier; ops/classify) in the SAME
    fused row-local pass — one single-row broadcast join — and drops
    kept docs under --quality-prob-min; the probability joins the
    written audit as quality_prob.
    --semdedup EMB_PARQUET drops semantic duplicates among kept rows
    using a SIDE table of (record_id, embedding) vectors — SemDeDup via
    ops/similarity, losers audited as semantic_dup (the embedding table
    is its own artifact at scale; curate never embeds).
    --decontaminate PROBES drops survivors containing any eval probe
    (n-gram containment ≥ --decontaminate-containment): probes are
    broadcast for the scan and the contaminated-id set is broadcast for
    the mark, so the corpus never shuffles for this stage.
    --line-dedup MIN_DOCS runs corpus-level line dedup FIRST
    (ops/dedup.dedup_lines_corpus): lines repeated across >= MIN_DOCS
    documents are stripped from every document before any verdict stage
    — payloads are rewritten, rows never drop, and the per-row
    `lines_deduped` count joins the written audit.
    --save-baseline / --baseline persist and score the kept-corpus
    numeric profile (ops/checks.baseline) — cross-run drift monitoring
    for a recurring ingest; scores land in summary.json.
    --checkpoint DIR makes the fused single-pass core RESUMABLE
    (sharded by content sha through the same manifest machinery as
    `run --checkpoint`; per-shard exact dedup equals global dedup, so
    results are identical to an unsharded run). --decontaminate is
    allowed here — it is row-local against broadcast probes, hence
    shard-safe; the remaining corpus-global stages are refused.

    summary.json always carries ``stage_lineage``: rows in/out per
    pipeline stage, attributed by each dropped row's EARLIEST-stage
    reason — derived from the audit columns of the single written
    output, never a second pass over the input.
    """
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops import code as cd
    from faang_pydantics_validation_spark.ops import text as tx

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    # snapshot the AQE coalescing confs _tune_scan_splits (inside
    # _load_input) retunes for the fused core, so the multi-pass stages
    # below can restore them at the core barrier
    _aqe_restore = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    df = _load_input(spark, args)

    t0 = time.monotonic()
    # entry snapshot of executor-block-holding RDD ids: the epilogue
    # frees exactly the blocks THIS run checkpoints (never a caller's
    # own persisted frames in a shared session)
    rdds0 = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    if args.checkpoint:
        # resumable sharded core — validates stage compatibility itself
        return _cmd_curate_checkpointed(spark, df, args, t0, owns_session)
    # per-phase wall attribution for summary.phase_walls: Spark is lazy,
    # so a phase's wall is the time its BLOCK holds the driver — blocks
    # that contain an action (near-dup's eager component checkpoint,
    # semdedup's training/pairs/keep materialization, decontaminate's
    # probe-hit checkpoint, mixture's count, the final write) carry the
    # cost of everything newly computed by that action, including
    # upstream stages materializing for the first time. Approximate by
    # construction, but it is the breakdown that localizes a
    # non-scaling stage in the composed chain.
    phase_walls: dict[str, float] = {}
    _last_tick = time.monotonic()

    def _tick(name: str) -> None:
        nonlocal _last_tick
        now = time.monotonic()
        phase_walls[name] = round(now - _last_tick, 2)
        _last_tick = now

    rid = F.concat_ws("@", F.concat_ws(":", "repo", "path"), "commit")
    if args.line_dedup:
        # corpus-level boilerplate line removal BEFORE any verdict stage
        # (CCNet order: rewrite the payload first, then quality-score /
        # dedup the cleaned text — shared license headers collapse to
        # identical bodies that exact dedup can then see). Rows never
        # drop here, so stage lineage is untouched; the per-row
        # `lines_deduped` count lands in the written audit and the
        # aggregate in summary.line_dedup.
        from faang_pydantics_validation_spark.ops.dedup import (
            dedup_lines_corpus,
        )

        df = (
            dedup_lines_corpus(
                df.withColumn("__ldc_rid", rid),
                id_col="__ldc_rid",
                text_col="content",
                min_docs=args.line_dedup,
                out_col="__ldc_out",
            )
            .withColumn("content", F.col("__ldc_out"))
            .withColumnRenamed("n_lines_deduped", "lines_deduped")
            .drop("__ldc_out", "__ldc_rid")
        )
    curated = _curate_core(spark, df, args)

    # When any multi-pass stage is active (near-dup, decontamination,
    # mixture), the DAG branches: each branch would re-derive the whole
    # row-local annotate chain (quality + secrets + license + the
    # repetition folds — by far the most expensive per-row compute) plus
    # the dedup window from the raw scan. Materialize the post-dedup
    # annotated frame ONCE instead: one disk-spillable materialization
    # vs 3-4 full recomputes of regex/fold-heavy kernels.
    #
    # localCheckpoint, not persist: persist caches the DATA but keeps
    # the full logical plan, so every downstream action (near-dup's
    # component checkpoints, semdedup's aggs, decontaminate's probe
    # checkpoint, mixture's count, the final write) re-runs Catalyst
    # analysis + optimization over the giant fused expression tree —
    # a driver-SERIAL cost paid per action that caps the composed
    # chain's core-count scaling. Checkpointing truncates the plan to
    # a leaf, so downstream planning is O(small). The storage cost is
    # the same executor-local MEMORY_AND_DISK blocks a persist would
    # hold; the blocks are freed in the epilogue below. On a real
    # cluster prefer setCheckpointDir + .checkpoint() if executor loss
    # must be survivable mid-run.
    multi_pass = bool(
        args.neardup or args.semdedup or args.decontaminate or args.mixture
    )
    persisted = None
    if multi_pass:
        curated = persisted = curated.localCheckpoint(eager=True)
        # the fine advisory partition size set by _tune_scan_splits is
        # sized for the BYTE-heavy fused core it just materialized. The
        # multi-pass stages that follow are the opposite shape — byte-
        # small but compute-dense (SemDeDup's per-cell gram matrices,
        # the minhash band join, probe containment): coalescing THEM by
        # bytes serializes real compute (measured: semdedup phase 46 s →
        # 86 s under a run-wide 11 MB advisory). Restore parallelism-
        # first coalescing for everything after the core barrier.
        for k, v in _aqe_restore.items():
            spark.conf.set(k, v)
    _tick("core")

    if args.neardup:
        from faang_pydantics_validation_spark.ops.dedup import (
            duplicate_components,
            minhash_candidates,
        )

        survivors = curated.filter("kept").select("record_id", "content")
        pairs = minhash_candidates(
            survivors.withColumnRenamed("record_id", "doc_id"),
            "doc_id",
            "content",
        )
        comps = duplicate_components(pairs).withColumnRenamed(
            "doc_id", "record_id"
        )
        losers = comps.filter(F.col("record_id") != F.col("component_id"))
        curated = (
            curated.join(
                losers.select("record_id", F.lit(True).alias("__nd")),
                "record_id",
                "left",
            )
            .withColumn(
                "drop_reasons",
                F.when(
                    F.col("__nd").isNotNull() & F.col("kept"),
                    F.array(F.lit("near_dup")),
                ).otherwise(F.col("drop_reasons")),
            )
            .withColumn("kept", F.size("drop_reasons") == 0)
            .drop("__nd")
        )
        if args.semdedup or args.decontaminate or args.mixture:
            # later multi-pass stages run 2+ actions each over this
            # frame; truncate once so they scan blocks instead of
            # re-probing the core-vs-losers join per action
            curated = curated.localCheckpoint(eager=True)
        _tick("near_dup")

    if args.semdedup:
        # semantic dedup among the survivors (SemDeDup,
        # ops/similarity.semdedup): embeddings come from a SIDE table
        # keyed by record_id — the curate input carries text, not
        # vectors, and at 100 TB the embedding table is its own
        # artifact produced by an encoder pass. Only kept rows join
        # vectors; losers get reason 'semantic_dup' (audit model
        # unchanged). The loser set can be a large corpus fraction, so
        # no broadcast hint — AQE picks the join side by size (same
        # rationale as drop_duplicate_components).
        from faang_pydantics_validation_spark.ops.similarity import (
            semdedup,
        )

        emb = spark.read.parquet(args.semdedup)
        if not {"record_id", "embedding"} <= set(emb.columns):
            raise SystemExit(
                "--semdedup table must have columns (record_id,"
                f" embedding); got {emb.columns}"
            )
        # the curate key (repo:path@commit) is NOT guaranteed unique
        # upstream (same finding as dedup_lines' composite key), so the
        # kept side deduplicates to DISTINCT ids before the coverage
        # join — otherwise kept-side id collisions would inflate the
        # joined-row count and the error below would blame the embedding
        # artifact for duplication that lives in the curate input. A
        # separate kept-side count keeps the attribution honest: ids
        # shared by several kept payloads get ONE semantic verdict for
        # all of them (the embedding artifact is keyed by id and cannot
        # distinguish the payloads), surfaced as a warning, not an abort.
        kept_tot = curated.filter("kept").agg(
            F.count(F.lit(1)).alias("t"),
            F.count_distinct("record_id").alias("d"),
        ).collect()[0]
        n_kept = int(kept_tot.d)
        if kept_tot.t != kept_tot.d:
            print(
                f"warning: --semdedup: {kept_tot.t - kept_tot.d} kept"
                " row(s) share a record_id with another kept row; the"
                " embedding artifact is keyed by record_id, so all"
                " payloads sharing an id receive one semantic-dedup"
                " verdict",
                file=sys.stderr,
            )
        kept_ids = curated.filter("kept").select("record_id").distinct()
        # materialize the covered-vector table ONCE: everything the
        # SemDeDup stage runs afterwards — coverage aggs, centroid
        # seeding, each Lloyd assignment pass, the pair stage, the
        # keep agg — would otherwise re-derive this join from the
        # persisted 1M-row annotate frame (scan + shuffle join) on
        # every action. The table is covered-rows × dim (the index
        # artifact's own size, the same volume the assignment kernel
        # ships anyway), stored executor-local like any persist —
        # measured 5-6 redundant derivations in the composed 10-stage
        # chain before this checkpoint.
        vecs = emb.join(kept_ids, "record_id").localCheckpoint(eager=True)
        # join-coverage + uniqueness validation (two small aggs): a key
        # FORMAT mismatch (e.g. 'repo/path@commit' vs the
        # 'repo:path@commit' curate builds) would otherwise make the
        # stage a silent no-op, and duplicate record_id rows in the
        # side table would multiply audit rows through the loser join
        cov = vecs.agg(
            F.count(F.lit(1)).alias("m"),
            F.count_distinct("record_id").alias("d"),
        ).collect()[0]
        if n_kept and not cov.m:
            raise SystemExit(
                "--semdedup matched ZERO kept rows: the embedding"
                " table's record_id does not join curate's"
                " repo:path@commit keys — fix the artifact's key format"
            )
        if cov.m != cov.d:
            # kept side is distinct by construction above, so joined-row
            # multiplicity can only come from the embedding table
            raise SystemExit(
                f"--semdedup table has duplicate record_id rows"
                f" ({cov.m} joined rows across {cov.d} distinct ids);"
                " deduplicate the embedding artifact first"
            )
        if cov.d < n_kept:
            print(
                f"warning: --semdedup covers {cov.d} of {n_kept} kept"
                " rows; uncovered rows pass through unexamined",
                file=sys.stderr,
            )
        # dedup wants bounded clusters (pair work is quadratic per
        # cell): size the grid at covered/150 per the op's contract,
        # overridable via --semdedup-cells — sqrt(N) is the SEARCH
        # default and blows up pair fan-out at dedup scale
        sd_cells = args.semdedup_cells or max(16, int(cov.d) // 150)
        sd_losers = (
            semdedup(
                vecs,
                n_cells=sd_cells,
                threshold=args.semdedup_threshold,
                id_col="record_id",
                vec_col="embedding",
            )
            .filter(~F.col("semdedup_keep"))
            .select("record_id")
            .distinct()
            .select("record_id", F.lit(True).alias("__sd"))
        )
        curated = (
            curated.join(sd_losers, "record_id", "left")
            .withColumn(
                "drop_reasons",
                F.when(
                    F.col("__sd").isNotNull() & F.col("kept"),
                    F.array(F.lit("semantic_dup")),
                ).otherwise(F.col("drop_reasons")),
            )
            .withColumn("kept", F.size("drop_reasons") == 0)
            .drop("__sd")
        )
        if args.decontaminate or args.mixture:
            # same rationale as the near-dup boundary: decontaminate's
            # probe checkpoint, mixture's count and the final write each
            # re-probe the sd-loser join otherwise
            curated = curated.localCheckpoint(eager=True)
        _tick("semantic_dedup")

    if args.decontaminate:
        # eval-set decontamination among the survivors: n-gram
        # containment scan with the probe table broadcast, then a
        # broadcast mark of the (benchmark-sized) contaminated-id set.
        # Dropped rows get reason 'contaminated' instead of vanishing,
        # so the audit/lineage model still reconciles. Shared helper
        # (_mark_contaminated) so this path and the resumable sharded
        # path cannot diverge on which docs are contaminated.
        curated = _mark_contaminated(
            curated,
            _load_probes(spark, args.decontaminate),
            args.decontaminate_containment,
        )
        _tick("decontaminate")

    mixture_rates: dict[str, float] = {}
    if args.mixture:
        # language-mixture DOWNSAMPLING among the surviving rows:
        # resample toward the target lang proportions (ops/sample
        # semantics, max_epochs pinned to 1 — upsampling would
        # duplicate rows, which the kept/dropped audit model cannot
        # express). Languages not named in the mixture are dropped.
        # One tiny count agg over survivors; the keep decision itself
        # is a row-local literal-map lookup + salted hash filter.
        from faang_pydantics_validation_spark.ops.sample import (
            mixture_plan,
            uniform_score,
        )

        weights = args.mixture  # pre-validated dict (see _parse_mixture)
        counts = {
            r["__s"]: r["__n"]
            for r in curated.filter("kept")
            .groupBy(F.col("lang").alias("__s"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        }
        present = {k: v for k, v in weights.items() if counts.get(k)}
        mixture_rates = mixture_plan(counts, present) if present else {}
        if mixture_rates:
            rate_map = F.create_map(
                *[
                    x
                    for s, r in mixture_rates.items()
                    for x in (F.lit(s), F.lit(r))
                ]
            )
            mix_keep = (
                rate_map[F.col("lang")].isNotNull()
                & (
                    uniform_score(F.col("record_id"), "mixture")
                    < rate_map[F.col("lang")]
                )
            )
        else:
            # no named language has surviving rows (e.g. case mismatch
            # 'Python' vs 'python', or everything was filtered upstream):
            # a zero-arg create_map builds map<void,void> and the lookup
            # fails ANALYSIS, killing the whole job. Semantics say every
            # row is outside the mixture → drop all, and say why.
            print(
                "warning: --mixture names no language present in the kept"
                f" rows (asked: {sorted(weights)}; present:"
                f" {sorted(counts)}); all kept rows drop with reason"
                " 'mixture'",
                file=sys.stderr,
            )
            mix_keep = F.lit(False)
        curated = (
            curated.withColumn(
                "drop_reasons",
                F.when(
                    F.col("kept") & ~mix_keep, F.array(F.lit("mixture"))
                ).otherwise(F.col("drop_reasons")),
            )
            .withColumn("kept", F.size("drop_reasons") == 0)
        )
        _tick("mixture")

    # the partition column must be a STRING: parquet partition values
    # round-trip as directory names, so a boolean would read back as the
    # string "true"/"false" and break downstream filters
    curated = curated.withColumn(
        "status", F.when(F.col("kept"), "kept").otherwise("dropped")
    )
    (
        curated.write.mode("overwrite")
        .partitionBy("status")
        .parquet(f"{args.output}/curated")
    )
    if persisted is not None:
        # free every executor-local block this run checkpointed (the
        # core frame plus the semdedup side tables and the component
        # loop's per-round truncations): checkpointed RDDs never reach
        # the Dataset cache manager, so df.unpersist() can't see them —
        # diff the context's persistent-RDD set against the entry
        # snapshot instead. Counters below read the WRITTEN parquet.
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid_ in [k for k in jmap.keySet().toArray() if k not in rdds0]:
            jmap.get(rid_).unpersist(False)
    _tick("write")

    # counters from a column-pruned read-back of what was written —
    # never a second pass over the input
    out_df, summary = _curate_counters(spark, args)
    _tick("counters")

    if args.line_dedup:
        # aggregate view of the payload-rewriting pre-stage, from the
        # same written parquet the counters use (never a second input
        # pass); rows_in/out are unchanged by design, so this lives
        # beside stage_lineage rather than inside it
        ld = out_df.agg(
            F.sum("lines_deduped").alias("lines"),
            F.count_if(F.col("lines_deduped") > 0).alias("docs"),
        ).collect()[0]
        summary["line_dedup"] = {
            "min_docs": args.line_dedup,
            "lines_removed": int(ld.lines or 0),
            "docs_rewritten": int(ld.docs or 0),
        }

    if args.save_baseline or args.baseline:
        # kept-corpus numeric profile (length/token/line distributions)
        # — the cross-run drift surface for a recurring ingest. Reads
        # only the kept partition of what was already written.
        from faang_pydantics_validation_spark.checks.baseline import (
            drift_against_baseline,
            read_baseline,
            snapshot_profile,
            write_baseline,
        )

        c = F.coalesce(F.col("content"), F.lit(""))
        kept_feats = out_df.filter(F.col("status") == "kept").select(
            F.length(c).cast("double").alias("content_len"),
            F.size(F.split(F.trim(c), r"\s+")).cast("double").alias(
                "n_tokens"
            ),
            F.size(F.split(c, "\n")).cast("double").alias("n_lines"),
        )
        profile_cols = ["content_len", "n_tokens", "n_lines"]
        if args.save_baseline:
            write_baseline(
                snapshot_profile(kept_feats, profile_cols),
                args.save_baseline,
            )
            summary["baseline_written"] = args.save_baseline
        if args.baseline:
            drift = drift_against_baseline(
                kept_feats, read_baseline(spark, args.baseline)
            )
            summary["baseline_drift"] = {
                r.column: {
                    "ks": round(float(r.ks_statistic), 6),
                    "chi2": round(float(r.chi2_statistic), 4),
                    "n_current": int(r.n_current),
                    "n_baseline": int(r.n_baseline),
                    "mean_current": round(float(r.mean_current), 4),
                    "mean_baseline": round(float(r.mean_baseline), 4),
                }
                for r in drift.collect()
            }

    if args.mixture:
        summary["mixture_rates"] = {
            k: round(v, 6) for k, v in mixture_rates.items()
        }

    if args.pack:
        # pipeline terminus: pack the kept corpus into fixed-length
        # token sequences. Reads back ONLY (record_id, content) from
        # the kept partition (partition-pruned, column-pruned) — the
        # audit columns never enter the pack shuffle.
        from faang_pydantics_validation_spark.ops import pack as pkm

        kept_docs = (
            spark.read.parquet(f"{args.output}/curated")
            .filter(F.col("status") == "kept")
            .select("record_id", "content")
        )
        packed = pkm.pack_sequences(
            kept_docs, "record_id", "content",
            seq_len=args.pack, n_groups=args.pack_groups,
        )
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")
        st = pkm.packing_stats(
            spark.read.parquet(f"{args.output}/packed"), args.pack
        ).collect()[0]
        summary["packed"] = {
            "seq_len": args.pack,
            "n_sequences": int(st.n_sequences),
            "total_tokens": int(st.total_tokens),
            "packing_efficiency": float(st.packing_efficiency),
        }
        _tick("pack")
    summary["phase_walls"] = phase_walls
    # final wall covers every stage incl. baseline scoring and packing
    summary["wall_sec"] = round(time.monotonic() - t0, 2)
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/summary.json", "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def cmd_train_classifier(args) -> int:
    """Train the hashed-n-gram linear quality classifier (ops/classify —
    the GPT-3/CCNet CommonCrawl quality-scoring recipe with the
    fastText feature map) from a GOLD corpus and a JUNK corpus, persist
    the sparse weight table, and print a one-line JSON summary with the
    training-set separation (mean probability per class). The artifact
    feeds ``curate --quality-classifier`` directly; its bias row
    encodes the feature-space size, so no side-channel config exists.
    """
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops.classify import (
        classifier_score,
        train_quality_classifier,
    )

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    def _side(path: str, label: float) -> "DataFrame":
        df = spark.read.parquet(path)
        if args.text_col not in df.columns:
            raise SystemExit(
                f"{path} has no column {args.text_col!r}"
                f" (columns: {df.columns}); pass --text-col"
            )
        return df.select(
            F.lit(label).alias("label"),
            F.col(args.text_col).alias("text"),
        )

    labeled = _side(args.gold, 1.0).unionByName(_side(args.junk, 0.0))
    w = train_quality_classifier(
        labeled,
        n_features=args.features,
        iters=args.iters,
        lr=args.lr,
        l2=args.l2,
    )
    w.write.mode("overwrite").parquet(args.output)
    wdf = spark.read.parquet(args.output)
    sep = {
        ("gold" if r.label == 1.0 else "junk"): {
            "n": int(r.n),
            "mean_prob": round(float(r.p), 4),
        }
        for r in classifier_score(labeled, wdf, n_features=args.features)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"), F.avg("quality_prob").alias("p")
        )
        .collect()
    }
    summary = {
        "output": args.output,
        "features": args.features,
        "iters": args.iters,
        "lr": args.lr,
        "l2": args.l2,
        "separation": sep,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def cmd_semdedup(args) -> int:
    """Semantic dedup over an embedding table (ops/similarity.semdedup,
    SemDeDup): writes the input annotated with (semdedup_cell,
    semdedup_component, semdedup_keep) partitioned by the keep verdict —
    the same audit-not-delete contract as curate — plus a one-line JSON
    summary. Centroids train in-job (fully distributed) unless
    --centroids points at a trained (cell, centroid) parquet."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark.ops import similarity as sim

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.input)
    cents = spark.read.parquet(args.centroids) if args.centroids else None
    t0 = time.monotonic()
    out = sim.semdedup(
        df,
        cents,
        n_cells=args.cells,
        refine_iters=args.refine_iters,
        threshold=args.threshold,
        keep=args.keep,
        id_col=args.id_col,
        vec_col=args.vec_col,
    ).withColumn(
        "status", F.when(F.col("semdedup_keep"), "kept").otherwise("dropped")
    )
    out.write.mode("overwrite").partitionBy("status").parquet(
        f"{args.output}/deduped"
    )
    back = spark.read.parquet(f"{args.output}/deduped")
    n = back.count()
    kept = back.filter("status = 'kept'").count()
    summary = {
        "rows": n,
        "kept": kept,
        "dropped": n - kept,
        "threshold": args.threshold,
        "keep_policy": args.keep,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def cmd_index(args) -> int:
    """Build the ANN index artifacts for an embedding table — the
    write-once, query-many side of ops/similarity:

      OUT/centroids/   (cell int, centroid array<double>) — distributed
                       Lloyd training, nothing driver-sized
      OUT/codebooks/   (subspace, code, centroid)          [--pq-m > 0]
      OUT/corpus/      (id, cell[, pq_code, pq_rnorm][, vector])
      OUT/index.json   manifest: source path, columns, sizes, walls

    With PQ on, the corpus artifact deliberately does NOT carry raw
    vectors — the m-byte scan is the point; exact re-rank at search
    time reads the ORIGINAL table recorded in the manifest. Without
    PQ the raw vector rides along for candidate scoring.
    """
    from pyspark.sql import SparkSession

    from faang_pydantics_validation_spark.ops import similarity as sim

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    emb = spark.read.parquet(args.input)

    t0 = time.monotonic()
    cents = sim.train_ivf_centroids(
        emb,
        n_cells=args.cells or None,
        id_col=args.id_col,
        vec_col=args.vec_col,
        refine_iters=args.refine_iters,
    )
    cents.write.mode("overwrite").parquet(f"{args.output}/centroids")
    cents = spark.read.parquet(f"{args.output}/centroids")
    assigned = sim.ivf_assign(emb, cents, args.id_col, args.vec_col)
    if args.pq_m:
        cb = sim.train_pq_codebooks(
            emb,
            m=args.pq_m,
            n_codes=args.pq_codes,
            id_col=args.id_col,
            vec_col=args.vec_col,
            refine_iters=args.refine_iters,
            train_fraction=args.train_fraction,
        )
        cb.write.mode("overwrite").parquet(f"{args.output}/codebooks")
        cb = spark.read.parquet(f"{args.output}/codebooks")
        corpus = sim.pq_encode(
            assigned, cb, m=args.pq_m, n_codes=args.pq_codes,
            vec_col=args.vec_col,
        ).select(args.id_col, "cell", "pq_code", "pq_rnorm")
    else:
        corpus = assigned.select(args.id_col, "cell", args.vec_col)
    corpus.write.mode("overwrite").parquet(f"{args.output}/corpus")

    out_df = spark.read.parquet(f"{args.output}/corpus")
    manifest = {
        "input": os.path.abspath(args.input),
        "id_col": args.id_col,
        "vec_col": args.vec_col,
        "rows": out_df.count(),
        "n_cells": cents.count(),
        "pq_m": args.pq_m,
        "pq_codes": args.pq_codes if args.pq_m else 0,
        "refine_iters": args.refine_iters,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    with open(f"{args.output}/index.json", "w") as f:
        json.dump(manifest, f)
    print(json.dumps(manifest))
    if owns_session:
        spark.stop()
    return 0


def cmd_search(args) -> int:
    """Query an ANN index built by ``fpvs index``: IVF-probe the
    centroids, score candidates (ADC over PQ codes when the index has
    them, raw cosine otherwise), optionally re-rank the shortlist
    exactly against the manifest's source table, write one parquet of
    (query_id, neighbor_id, score, rank) and print a one-line JSON
    summary.

    By default a corpus candidate whose id EQUALS the query id is
    dropped (self-exclusion — correct when the query batch is drawn
    from the indexed corpus itself, the dedup/audit use). External
    query batches whose ids are unrelated to the corpus id space must
    pass ``--include-self``, or any accidental id collision silently
    hides that corpus vector from the ranking."""
    from pyspark.sql import SparkSession

    from faang_pydantics_validation_spark.ops import similarity as sim

    owns_session = SparkSession.getActiveSession() is None
    spark = _build_session(args)
    spark.sparkContext.setLogLevel("WARN")
    with open(f"{args.index}/index.json") as f:
        manifest = json.load(f)
    corpus = spark.read.parquet(f"{args.index}/corpus")
    cents = spark.read.parquet(f"{args.index}/centroids")
    queries = spark.read.parquet(args.queries)

    t0 = time.monotonic()
    if manifest["pq_m"]:
        cb = spark.read.parquet(f"{args.index}/codebooks")
        rerank_df = (
            spark.read.parquet(manifest["input"])
            if args.exact_rerank
            else None
        )
        out = sim.cosine_topk_ivfpq(
            corpus,
            queries,
            cents,
            cb,
            m=manifest["pq_m"],
            n_codes=manifest["pq_codes"],
            k=args.k,
            nprobe=args.nprobe,
            id_col=manifest["id_col"],
            query_id_col=manifest["id_col"],
            query_vec_col=manifest["vec_col"],
            rerank=rerank_df,
            rerank_vec_col=manifest["vec_col"],
            shortlist=args.shortlist,
            exclude_self=not args.include_self,
        )
    else:
        out = sim.cosine_topk_ivf(
            corpus,
            queries,
            cents,
            k=args.k,
            nprobe=args.nprobe,
            id_col=manifest["id_col"],
            vec_col=manifest["vec_col"],
            query_id_col=manifest["id_col"],
            cell_col="cell",
            exclude_self=not args.include_self,
        )
    out.write.mode("overwrite").parquet(f"{args.output}/results")
    n = spark.read.parquet(f"{args.output}/results").count()
    summary = {
        "n_results": n,
        "k": args.k,
        "nprobe": args.nprobe,
        "pq": bool(manifest["pq_m"]),
        "exact_rerank": bool(args.exact_rerank and manifest["pq_m"]),
        "exclude_self": not args.include_self,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fpvs")
    sub = p.add_subparsers(dest="cmd", required=True)

    pz = sub.add_parser("package", help="build the --py-files zip")
    pz.add_argument("--out", default="engine.zip")

    pr = sub.add_parser("run", help="validate a table")
    pr.add_argument("--input", help="input table path")
    pr.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    pr.add_argument("--synthetic", type=int, default=0, help="generate N synthetic rows")
    pr.add_argument("--ruleset", default="code_files",
                    choices=["code_files", "documents", "organism"])
    pr.add_argument("--output", required=True)
    pr.add_argument("--checkpoint", help="manifest dir for resumable runs")
    pr.add_argument("--n-checkpoint-partitions", type=int, default=64)
    pr.add_argument("--cores", type=int, default=None)
    pr.add_argument(
        "--shuffle-partitions", type=int, default=None,
        help="spark.sql.shuffle.partitions — size by DATA (rows/partition"
        " must fit executor memory), not by core count",
    )

    pc = sub.add_parser(
        "curate", help="quality/secret/license/dedup corpus curation"
    )
    pc.add_argument("--input", help="input table path")
    pc.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    pc.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic rows")
    pc.add_argument("--output", required=True)
    pc.add_argument(
        "--repetition",
        action="store_true",
        help="also drop repetitious docs (Gopher dup-line/para/n-gram screens)",
    )
    pc.add_argument(
        "--mixture",
        default="",
        type=_parse_mixture,
        metavar="LANG=W,...",
        help="resample kept rows toward lang proportions (downsample only;"
        " langs not named are dropped), e.g. python=0.5,go=0.3,rust=0.2",
    )
    pc.add_argument(
        "--pack",
        type=int,
        default=0,
        metavar="SEQ_LEN",
        help="also pack the kept corpus into SEQ_LEN-token sequences",
    )
    pc.add_argument("--pack-groups", type=int, default=32)
    pc.add_argument("--neardup", action="store_true",
                    help="also drop MinHash near-dup components")
    pc.add_argument(
        "--semdedup",
        metavar="EMB_PARQUET",
        help="semantic dedup among kept rows using this side table of"
        " (record_id, embedding) vectors (SemDeDup; losers get reason"
        " semantic_dup)",
    )
    pc.add_argument(
        "--semdedup-threshold",
        type=float,
        default=0.95,
        metavar="COS",
        help="cosine threshold for --semdedup duplicate groups"
        " (default 0.95)",
    )
    pc.add_argument(
        "--semdedup-cells",
        type=int,
        default=None,
        metavar="K",
        help="k-means cells for --semdedup (default covered_rows/150 —"
        " bounded clusters; per-cell pair work is quadratic)",
    )
    pc.add_argument(
        "--line-dedup",
        type=_min_docs,
        default=None,
        metavar="MIN_DOCS",
        help="before any filter stage, remove lines repeated across"
        " >= MIN_DOCS documents (corpus-level boilerplate removal;"
        " rewrites content, never drops rows)",
    )
    pc.add_argument("--require-permissive-license", action="store_true",
                    help="drop files with an identified non-permissive license")
    pc.add_argument(
        "--checkpoint",
        help="manifest dir for a RESUMABLE curation run (fused"
        " single-pass core + the shard-safe --decontaminate, sharded"
        " by content sha — per-shard exact dedup equals global dedup;"
        " corpus-global stages are refused)",
    )
    pc.add_argument("--n-checkpoint-partitions", type=int, default=64)
    pc.add_argument(
        "--quality-classifier",
        metavar="WEIGHTS_PARQUET",
        help="score every doc with a trained linear quality classifier"
        " (fpvs train-classifier) and drop kept docs scoring below"
        " --quality-prob-min; the score joins the audit as quality_prob",
    )
    pc.add_argument(
        "--quality-prob-min",
        type=float,
        default=0.5,
        metavar="P",
        help="classifier probability below which a doc drops"
        " (default 0.5)",
    )
    pc.add_argument(
        "--classifier-arrow",
        dest="classifier_arrow",
        action="store_true",
        default=True,
        help="score with the Arrow segment-sum kernel (the DEFAULT:"
        " the round-5 end-to-end alternating A/B at 1M rows measured"
        " the whole curate chain 1.52x faster with the Arrow scorer"
        " than expression-fused — the kernel win beats the lost"
        " whole-stage fusion)",
    )
    pc.add_argument(
        "--classifier-fused",
        dest="classifier_arrow",
        action="store_false",
        help="score with the JVM expression fold fused into the"
        " annotate chain instead (same results; pure-JVM plan, no"
        " Python workers — slower end to end at corpus scale)",
    )
    pc.add_argument(
        "--decontaminate",
        metavar="PROBES_PARQUET",
        help="drop kept docs containing any probe from this parquet of"
        " eval examples (columns: probe_id, text)",
    )
    pc.add_argument(
        "--decontaminate-containment",
        type=float,
        default=0.8,
        metavar="FRAC",
        help="n-gram containment threshold for --decontaminate"
        " (default 0.8, the published decontamination operating point)",
    )
    pc.add_argument(
        "--save-baseline",
        metavar="PATH",
        help="write this run's kept-corpus numeric profile snapshot",
    )
    pc.add_argument(
        "--baseline",
        metavar="PATH",
        help="score the kept corpus against a prior --save-baseline"
        " snapshot; per-column KS/chi-square lands in summary.json",
    )
    pc.add_argument("--cores", type=int, default=None)
    pc.add_argument(
        "--shuffle-partitions", type=int, default=None,
        help="spark.sql.shuffle.partitions — size by DATA, not cores",
    )

    pt = sub.add_parser(
        "train-classifier",
        help="train the linear quality classifier from gold/junk corpora",
    )
    pt.add_argument("--gold", required=True,
                    help="parquet of reference-quality documents")
    pt.add_argument("--junk", required=True,
                    help="parquet of low-quality documents")
    pt.add_argument("--output", required=True,
                    help="weight-table parquet (feeds --quality-classifier)")
    pt.add_argument("--text-col", default="content")
    pt.add_argument("--features", type=int, default=1 << 18,
                    help="hashed feature-space size (default 2^18)")
    pt.add_argument("--iters", type=int, default=20)
    pt.add_argument("--lr", type=float, default=0.5)
    pt.add_argument("--l2", type=float, default=1e-6)
    pt.add_argument("--cores", type=int, default=None)
    pt.add_argument("--shuffle-partitions", type=int, default=None)

    pd = sub.add_parser(
        "semdedup",
        help="semantic dedup over an embedding table (SemDeDup)",
    )
    pd.add_argument("--input", required=True, help="embedding parquet")
    pd.add_argument("--output", required=True)
    pd.add_argument("--centroids", default=None,
                    help="trained (cell, centroid) parquet; omit to train")
    pd.add_argument("--cells", type=int, default=None,
                    help="cells to train (default sqrt(N); prefer N/150"
                         " so the per-cell pair check stays bounded)")
    pd.add_argument("--refine-iters", type=int, default=2)
    pd.add_argument("--threshold", type=float, default=0.95)
    pd.add_argument("--keep", choices=("far", "near", "min_id"),
                    default="far",
                    help="which group member survives (paper: far)")
    pd.add_argument("--id-col", default="vec_id")
    pd.add_argument("--vec-col", default="embedding")
    pd.add_argument("--cores", type=int, default=None)
    pd.add_argument("--shuffle-partitions", type=int, default=None)

    pi = sub.add_parser(
        "index",
        help="build ANN index artifacts (IVF cells [+ PQ codes]) for an"
        " embedding table",
    )
    pi.add_argument("--input", required=True, help="embedding parquet")
    pi.add_argument("--output", required=True)
    pi.add_argument("--id-col", default="vec_id")
    pi.add_argument("--vec-col", default="embedding")
    pi.add_argument("--cells", type=int, default=0,
                    help="IVF cell count (0 = sqrt(N) default)")
    pi.add_argument("--refine-iters", type=int, default=1)
    pi.add_argument("--pq-m", type=int, default=0,
                    help="PQ subspaces (0 = no PQ: corpus artifact keeps"
                         " raw vectors)")
    pi.add_argument("--pq-codes", type=int, default=256)
    pi.add_argument("--train-fraction", type=float, default=None,
                    help="bound PQ training to a hash sample of the corpus")
    pi.add_argument("--cores", type=int, default=None)
    pi.add_argument("--shuffle-partitions", type=int, default=None)

    ps = sub.add_parser(
        "search", help="top-k query batch against an fpvs index"
    )
    ps.add_argument("--index", required=True, help="fpvs index directory")
    ps.add_argument("--queries", required=True, help="query parquet")
    ps.add_argument("--output", required=True)
    ps.add_argument("--k", type=int, default=10)
    ps.add_argument("--nprobe", type=int, default=8)
    ps.add_argument("--shortlist", type=int, default=None,
                    help="ADC shortlist size before re-rank (default 4k)")
    ps.add_argument("--exact-rerank", action="store_true",
                    help="re-rank the ADC shortlist exactly against the"
                         " manifest's source table (PQ indexes only)")
    ps.add_argument("--include-self", action="store_true",
                    help="keep corpus candidates whose id equals the"
                         " query id (REQUIRED for external query"
                         " batches whose ids are unrelated to the"
                         " corpus id space; the default drop-same-id"
                         " is for querying the corpus against itself)")
    ps.add_argument("--cores", type=int, default=None)
    ps.add_argument("--shuffle-partitions", type=int, default=None)

    args = p.parse_args(argv)
    if args.cmd == "package":
        print(make_pyfiles_zip(args.out))
        return 0
    if args.cmd == "train-classifier":
        return cmd_train_classifier(args)
    if args.cmd == "semdedup":
        return cmd_semdedup(args)
    if args.cmd == "index":
        return cmd_index(args)
    if args.cmd == "search":
        return cmd_search(args)
    if args.cmd in ("run", "curate") and not (args.input or args.synthetic):
        p.error(f"{args.cmd} needs --input or --synthetic")
    if args.cmd == "curate":
        return cmd_curate(args)
    return cmd_run(args)


if __name__ == "__main__":
    sys.exit(main())
