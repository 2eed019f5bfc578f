"""Smoke-test the composed-pipeline bench block end to end at toy scale.

Runs in a SUBPROCESS: pipeline_e2e_block owns (creates and stops) its
own Spark sessions per core level, which must not touch the shared
session fixture the rest of the suite uses."""

from __future__ import annotations

import json
import subprocess
import sys


def test_pipeline_e2e_block_structure():
    import os

    code = """
import json, sys
sys.path.insert(0, "/root/repo")
import bench
out = bench.pipeline_e2e_block(20_000, small=2, big=4, shuffle=8)
print("PIPELINE_JSON:" + json.dumps(out))
"""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_PIPELINE_RUNS"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1500,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("PIPELINE_JSON:")
    ][-1]
    out = json.loads(line.split(":", 1)[1])
    assert "error" not in out, out
    assert out["rows"] == 20_000
    assert out["wall_n_sec"] > 0 and out["wall_4n_sec"] > 0
    assert out["efficiency"] > 0
    # lineage reconciles front to back and ends at the kept count
    lineage = out["stage_lineage"]
    assert lineage[0]["rows_in"] == 20_000
    for prev, nxt in zip(lineage, lineage[1:]):
        assert prev["rows_out"] == nxt["rows_in"]
    assert lineage[-1]["rows_out"] == out["kept"]
    # every configured stage is present in order — the FULL ten-stage
    # chain (line_dedup rewrites payloads and never drops, so it shows
    # up in the summary block, not the drop lineage; license needs
    # --require-permissive-license)
    assert [s["stage"] for s in lineage] == [
        "quality", "secrets", "repetition", "classifier", "exact_dedup",
        "near_dup", "semantic_dedup", "decontaminate", "mixture",
    ]
    assert out["n_stages"] == 10
    assert out["line_dedup"] is not None
    assert out["classifier"] is not None
    assert out["overhead_n_sec"] > 0 and out["overhead_4n_sec"] > 0
    # the self-drawn probes guarantee decontamination work happened
    # (hits depend on those docs surviving earlier stages — the stage
    # itself must at least appear with a non-negative count)
    stages = {s["stage"]: s for s in lineage}
    assert stages["decontaminate"]["dropped"] >= 0
    assert out["packed"] is not None and out["packed"]["seq_len"] == 2048
