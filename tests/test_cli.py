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
