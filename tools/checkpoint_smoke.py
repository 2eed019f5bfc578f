"""10M-row checkpointed kill/resume smoke (north rule: resumable runs
with per-partition lineage; VERDICT r2 item 7).

Flow:
1. materialize the 10M-row synthetic code table (untimed, ≤8 cores);
2. launch ``fpvs run --checkpoint`` as a SUBPROCESS and SIGKILL it once
   the manifest shows partial progress (a real mid-run crash, not a
   cooperative shutdown);
3. re-run the identical command to completion;
4. verify: phase-1 manifest entries survive untouched (mtime-stable —
   completed partitions are never reprocessed), the union covers all
   partitions exactly once, and total lineage rows == input rows;
5. print ONE JSON line (walls, kill progress, resume input-pass count =
   ceil(remaining / group_size) as documented in checkpoint.py).

Usage: python tools/checkpoint_smoke.py  [env: SMOKE_ROWS, SMOKE_CORES]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("SMOKE_ROWS", "10000000"))
CORES = int(os.environ.get("SMOKE_CORES", "8"))
N_PARTS = 64
GROUP_SIZE = 8  # checkpoint.run_partitioned default

OUT = f"/tmp/spark_graft_ckpt_smoke/out_{N_ROWS}"
CKPT = f"/tmp/spark_graft_ckpt_smoke/ckpt_{N_ROWS}"
MANIFEST = os.path.join(CKPT, "manifest")


def materialize() -> str:
    from bench import materialize_code_files
    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(
        app_name="ckpt-smoke-prep", cores=min(CORES, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = materialize_code_files(spark, N_ROWS)
    spark.stop()
    return path


def run_cli(path: str):
    return subprocess.Popen(
        [
            sys.executable, "-m", "faang_pydantics_validation_spark.cli",
            "run", "--input", path, "--ruleset", "code_files",
            "--output", OUT, "--checkpoint", CKPT,
            "--n-checkpoint-partitions", str(N_PARTS),
            "--cores", str(CORES),
        ],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )


def completed() -> set[int]:
    if not os.path.isdir(MANIFEST):
        return set()
    return {
        int(n[len("part-"):-len(".json")])
        for n in os.listdir(MANIFEST)
        if n.startswith("part-") and n.endswith(".json")
    }


def main() -> None:
    import shutil

    shutil.rmtree("/tmp/spark_graft_ckpt_smoke", ignore_errors=True)
    path = materialize()

    # phase 1: run and kill mid-flight (after ≥1 group, before the last)
    t0 = time.monotonic()
    proc = run_cli(path)
    killed_at = None
    while proc.poll() is None:
        done = completed()
        if GROUP_SIZE <= len(done) <= N_PARTS - GROUP_SIZE:
            os.killpg(proc.pid, signal.SIGKILL)
            killed_at = len(done)
            break
        time.sleep(1)
    proc.wait()
    wall_phase1 = time.monotonic() - t0
    assert killed_at is not None, (
        f"run finished ({len(completed())} parts) before the kill window — "
        "raise SMOKE_ROWS"
    )
    phase1 = completed()
    mtimes1 = {
        p: os.path.getmtime(os.path.join(MANIFEST, f"part-{p}.json"))
        for p in phase1
    }

    # phase 2: resume to completion
    t0 = time.monotonic()
    proc = run_cli(path)
    rc = proc.wait()
    wall_resume = time.monotonic() - t0
    assert rc == 0, f"resume exited {rc}"

    done = completed()
    assert done == set(range(N_PARTS)), sorted(done)
    # completed partitions were skipped, not reprocessed: their manifest
    # entries are byte-identical files with untouched mtimes
    for p, m in mtimes1.items():
        assert os.path.getmtime(os.path.join(MANIFEST, f"part-{p}.json")) == m, p

    rows = viols = 0
    for p in sorted(done):
        with open(os.path.join(MANIFEST, f"part-{p}.json")) as f:
            d = json.load(f)
        rows += d["rows_scanned"]
        viols += d["violations"]
    assert rows == N_ROWS, rows

    remaining = N_PARTS - len(phase1)
    print(json.dumps({
        "rows": N_ROWS,
        "cores": CORES,
        "n_partitions": N_PARTS,
        "group_size": GROUP_SIZE,
        "killed_after_partitions": killed_at,
        "wall_killed_run_sec": round(wall_phase1, 1),
        "wall_resume_sec": round(wall_resume, 1),
        "resume_partitions": remaining,
        "resume_input_passes": -(-remaining // GROUP_SIZE),
        "lineage_rows_total": rows,
        "lineage_violations_total": viols,
        "completed_entries_untouched": len(phase1),
    }))


if __name__ == "__main__":
    main()
