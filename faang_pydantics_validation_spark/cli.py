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


def _build_session(args):
    from faang_pydantics_validation_spark.session import get_spark

    return get_spark(
        app_name="fpvs-cli",
        cores=args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _load_input(spark, args):
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark import fixtures

    if args.synthetic:
        return fixtures.code_files(spark, args.synthetic)
    reader = spark.read
    if args.format == "parquet":
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

    args = p.parse_args(argv)
    if args.cmd == "package":
        print(make_pyfiles_zip(args.out))
        return 0
    if args.cmd == "run" and not (args.input or args.synthetic):
        p.error("run needs --input or --synthetic")
    return cmd_run(args)


if __name__ == "__main__":
    sys.exit(main())
