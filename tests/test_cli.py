"""spark-submit packaging + CLI run (synthetic input, resumable path)."""

from __future__ import annotations

import json
import os
import zipfile

from faang_pydantics_validation_spark.cli import main, make_pyfiles_zip


def test_package_zip(tmp_path):
    out = make_pyfiles_zip(str(tmp_path / "engine.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "faang_pydantics_validation_spark/engine.py" in names
    assert "faang_pydantics_validation_spark/checks/uniqueness.py" in names
    assert not any("__pycache__" in n for n in names)


def test_cli_run_synthetic(tmp_path, spark):
    out_dir = str(tmp_path / "out")
    rc = main(
        [
            "run",
            "--synthetic", "2000",
            "--ruleset", "code_files",
            "--output", out_dir,
            "--cores", "4",
        ]
    )
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["rows"] == 2000
    assert summary["invalid"] > 0
    assert os.path.exists(f"{out_dir}/verdicts")
    assert os.path.exists(f"{out_dir}/violations")


def test_cli_checkpoint_sparse_input_empty_groups(tmp_path, spark):
    """1 row into 64 hash slots: the single synthetic row lands in slot
    50 (deterministic), so the first six groups write NOTHING — the
    read-back guard must record zeros instead of crashing on the
    not-yet-existing output dir, and every slot still gets a manifest
    entry."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = main(
        [
            "run",
            "--synthetic", "1",
            "--ruleset", "code_files",
            "--output", out_dir,
            "--checkpoint", ckpt,
            "--n-checkpoint-partitions", "64",
            "--cores", "4",
        ]
    )
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["rows"] == 1
    assert summary["partitions_processed"] == 64
    assert len(os.listdir(f"{ckpt}/manifest")) == 64


def test_cli_checkpointed_run_and_resume(tmp_path, spark):
    """End-to-end resumable run: grouped jobs, dynamic-partition output
    layout, per-partition lineage; a second run resumes to a no-op with
    identical totals."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    argv = [
        "run",
        "--synthetic", "2000",
        "--ruleset", "code_files",
        "--output", out_dir,
        "--checkpoint", ckpt,
        "--n-checkpoint-partitions", "8",
        "--cores", "4",
    ]
    assert main(argv) == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["rows"] == 2000
    assert summary["partitions_processed"] == 8
    # dynamic-partition layout: one dir per checkpoint partition
    parts = [d for d in os.listdir(f"{out_dir}/verdicts") if d.startswith("__ckpt_part=")]
    assert len(parts) == 8
    # lineage recorded per partition, totals equal the input
    manifests = os.listdir(f"{ckpt}/manifest")
    assert len(manifests) == 8
    # resume: everything completed → zero partitions processed, data intact
    assert main(argv) == 0
    summary2 = json.load(open(f"{out_dir}/summary.json"))
    assert summary2["partitions_processed"] == 0
    assert summary2["rows"] == 2000
    n = spark.read.parquet(f"{out_dir}/verdicts").count()
    assert n == 2000
