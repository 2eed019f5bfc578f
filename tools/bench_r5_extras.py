"""Round-5 scale-evidence legs, run one at a time (NEVER concurrently
with another Spark session — host contention pollutes walls):

  python tools/bench_r5_extras.py semdedup1m   # SemDeDup at 1M rows
  python tools/bench_r5_extras.py bpe_local    # 32k-merge driver-local
  python tools/bench_r5_extras.py bpe_dist     # batched distributed loop
  python tools/bench_r5_extras.py clf_ab       # curate classifier A/B

Each leg prints ONE JSON line and appends it to
BENCH/bench_r5_extras.jsonl.

* semdedup1m — the VERDICT r4 gap: the 20k-row bench leg argued (not
  measured) the quadratic-in-cell cost model at the scale the flag
  targets. This leg runs ops/similarity.semdedup over the 1M-row
  clustered embedding fixture with cells = N/150 (the op's sizing
  contract) and reports wall + kept fraction.
* bpe_local — the 32k-merge driver-local wall on the 1M-row code
  table's word table (the path that serves vocabularies ≤ 2M words).
* bpe_dist — the batched distributed merge loop (merge_batch=8
  default): ≥1k merges with job count ≈ merges/8, vs round 4's
  1-job-per-merge ~4 s/merge. Runs on the 1M table's word table with
  driver_vocab_max=0 to force the distributed path.
* clf_ab — VERDICT r4 What's wrong #4: same-session-pattern alternating
  curate runs at 1M rows, expression-fused classifier vs the split
  Arrow scorer (--classifier-arrow), to decide the curate default
  END-TO-END rather than from the standalone kernel numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from faang_pydantics_validation_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    "bench_r5_extras.jsonl",
)


def emit(rec: dict) -> None:
    line = json.dumps(rec)
    with open(OUT, "a") as f:
        f.write(line + "\n")
    print(line)


def leg_semdedup1m() -> None:
    from faang_pydantics_validation_spark import fixtures
    from faang_pydantics_validation_spark.ops import similarity as sim

    n = int(os.environ.get("R5_SEMDEDUP_ROWS", "1000000"))
    dim = 64
    spark = get_spark(app_name="semdedup-1m", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/spark_graft_bench/embeddings_{n}_{dim}_256"
    if not os.path.exists(path + "/_SUCCESS"):
        fixtures.embeddings_table(
            spark, n, dim=dim, partitions=64, n_clusters=256
        ).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    n_cells = max(64, n // 150)
    t0 = time.monotonic()
    row = (
        sim.semdedup(
            emb, n_cells=n_cells, refine_iters=1, threshold=0.95,
            keep="far",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("semdedup_keep").cast("int")).alias("kept"),
        )
        .collect()[0]
    )
    wall = time.monotonic() - t0
    emit(
        {
            "leg": "semdedup_1m",
            "rows": int(row["n"]),
            "dim": dim,
            "n_cells": n_cells,
            "threshold": 0.95,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(row["n"] / wall, 1),
            "kept_frac": round(row["kept"] / max(row["n"], 1), 4),
        }
    )
    spark.stop()


def _word_table(spark, rows: int):
    from faang_pydantics_validation_spark.ops import bpe as bpem

    path = bench.materialize_code_files(spark, rows)
    df = spark.read.parquet(path)
    return df


def leg_bpe_local() -> None:
    from faang_pydantics_validation_spark.ops import bpe as bpem

    rows = int(os.environ.get("R5_BPE_ROWS", "1000000"))
    merges = int(os.environ.get("R5_BPE_MERGES", "32000"))
    # the 1M-row code table's vocabulary exceeds train_bpe's default 2M
    # driver cap (the leg exists to measure the DRIVER-LOCAL loop at a
    # real merge count, so raise the cap rather than silently fall back
    # to the distributed path)
    vocab_max = int(os.environ.get("R5_BPE_VOCAB_MAX", "50000000"))
    # the 1M-row synthetic code table carries ~10^7 word TYPES (random
    # identifiers), and the full-vocab driver-local loop's one-time
    # costs (collect + dict/index init) alone exceed an hour — measured
    # and abandoned at 74 min. Real tokenizer trainers subsample at
    # this point (SentencePiece's input_sentence_size); the leg does
    # the same through train_fraction's deterministic word-TYPE hash
    # sample (semantics documented on word_frequencies), recording the
    # wall for the path a user actually runs on a corpus this wide.
    fraction = os.environ.get("R5_BPE_FRACTION", "0.05")
    frac = float(fraction) if fraction else None
    spark = get_spark(app_name="bpe-local-32k", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    df = _word_table(spark, rows)
    t_all = time.monotonic()
    wf = bpem.word_frequencies(df, "content", frac)
    vocab = wf.count()
    t_scan = time.monotonic() - t_all
    t0 = time.monotonic()
    table = bpem.train_bpe(
        df, "content", n_merges=merges, min_frequency=2,
        driver_vocab_max=vocab_max, train_fraction=frac,
    )
    got = table.count()
    wall = time.monotonic() - t0
    emit(
        {
            "leg": "bpe_local_32k",
            "rows": rows,
            "word_types_sampled": vocab,
            "train_fraction": frac,
            "driver_vocab_max": vocab_max,
            "word_freq_scan_sec": round(t_scan, 2),
            "n_merges_requested": merges,
            "n_merges_learned": int(got),
            "train_wall_sec": round(wall, 2),
            "merges_per_sec": round(got / wall, 1),
        }
    )
    spark.stop()


def leg_bpe_dist() -> None:
    from faang_pydantics_validation_spark.ops import bpe as bpem

    rows = int(os.environ.get("R5_BPE_DIST_ROWS", "1000000"))
    merges = int(os.environ.get("R5_BPE_DIST_MERGES", "1000"))
    batch = int(os.environ.get("R5_BPE_DIST_BATCH", "8"))
    spark = get_spark(app_name="bpe-dist-batched", cores=32,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    df = _word_table(spark, rows)
    t0 = time.monotonic()
    table = bpem.train_bpe(
        df, "content", n_merges=merges, min_frequency=2,
        driver_vocab_max=0, merge_batch=batch,
    )
    got = table.count()
    wall = time.monotonic() - t0
    rec = {
        "leg": "bpe_distributed_batched",
        "rows": rows,
        "merge_batch": batch,
        "n_merges_requested": merges,
        "n_merges_learned": int(got),
        "train_wall_sec": round(wall, 2),
        "merges_per_sec": round(got / wall, 2),
        "sec_per_merge": round(wall / max(got, 1), 3),
    }
    note = os.environ.get("R5_LEG_NOTE")
    if note:
        rec["note"] = note
    emit(rec)
    spark.stop()


def leg_clf_ab() -> None:
    """Alternating end-to-end curate runs: expr-fused classifier vs the
    split Arrow scorer. Same input, same artifact, fresh session per
    run (curate owns its sessions); order alternates so host phases
    cannot correlate with a variant."""
    import contextlib
    import io

    from faang_pydantics_validation_spark import cli as fcli

    rows = int(os.environ.get("R5_CLF_AB_ROWS", "1000000"))
    cores = int(os.environ.get("R5_CLF_AB_CORES", "8"))
    rounds = int(os.environ.get("R5_CLF_AB_ROUNDS", "2"))
    prep = get_spark(app_name="clf-ab-prep", cores=8, shuffle_partitions=64)
    prep.sparkContext.setLogLevel("ERROR")
    in_path = bench.materialize_code_files(prep, rows)
    clf_path = bench._pipeline_classifier(prep, in_path)
    prep.stop()

    def run(arrow: bool) -> float:
        out_dir = f"/tmp/spark_graft_bench/clf_ab_{'arrow' if arrow else 'expr'}"
        argv = [
            "curate", "--input", in_path, "--output", out_dir,
            "--repetition", "--quality-classifier", clf_path,
            "--cores", str(cores), "--shuffle-partitions", "64",
        ] + (["--classifier-arrow"] if arrow else ["--classifier-fused"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = fcli.main(argv)
        assert rc == 0, rc
        with open(f"{out_dir}/summary.json") as f:
            return float(json.load(f)["wall_sec"])

    walls = {"expr": [], "arrow": []}
    for rnd in range(rounds):
        order = ("expr", "arrow") if rnd % 2 == 0 else ("arrow", "expr")
        for variant in order:
            walls[variant].append(run(variant == "arrow"))
    emit(
        {
            "leg": "curate_classifier_ab",
            "rows": rows,
            "cores": cores,
            "walls_expr_sec": [round(w, 2) for w in walls["expr"]],
            "walls_arrow_sec": [round(w, 2) for w in walls["arrow"]],
            "best_expr_sec": round(min(walls["expr"]), 2),
            "best_arrow_sec": round(min(walls["arrow"]), 2),
            "arrow_speedup": round(
                min(walls["expr"]) / min(walls["arrow"]), 3
            ),
        }
    )


LEGS = {
    "semdedup1m": leg_semdedup1m,
    "bpe_local": leg_bpe_local,
    "bpe_dist": leg_bpe_dist,
    "clf_ab": leg_clf_ab,
}

if __name__ == "__main__":
    LEGS[sys.argv[1]]()
