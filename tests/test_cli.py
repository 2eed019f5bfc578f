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


def test_cli_curate_synthetic(tmp_path, spark):
    """Counters reconcile, the kept corpus has no exact-dup contents and
    no secret/quality violators, and the audit partition carries the
    per-row reasons."""
    from pyspark.sql import functions as F

    out_dir = str(tmp_path / "cur")
    rc = main(
        ["curate", "--synthetic", "3000", "--output", out_dir, "--cores", "4"]
    )
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["rows_in"] == 3000
    assert summary["kept"] + summary["dropped"] == 3000
    assert summary["kept"] > 0 and summary["dropped"] > 0
    # the synthetic table injects exact duplicate (kid) contents at
    # id%50==49 — some survive quality and must be deduped
    assert summary["drop_reason_counts"].get("exact_dup", 0) > 0
    cur = spark.read.parquet(f"{out_dir}/curated")
    kept = cur.filter("kept")
    assert kept.count() == summary["kept"]
    # kept corpus: content sha unique, zero drop reasons
    dup = (
        kept.groupBy("content_sha").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    assert kept.filter(F.size("drop_reasons") > 0).count() == 0
    # every dropped row carries at least one reason
    assert cur.filter(~F.col("kept") & (F.size("drop_reasons") == 0)).count() == 0


def test_cli_curate_neardup_and_license_flags(tmp_path, spark):
    """--neardup resolves MinHash components among survivors; the
    restrictive-license flag drops identified non-permissive files
    while unknown-license files pass."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    # long shared body so each one-token variant keeps Jaccard ~0.99 and
    # the banded MinHash collision probability is ~1 (short docs would
    # make the 8-file family's capture probabilistic)
    base_text = "".join(
        f"def shared_fn_{j}(alpha_{j}, beta_{j}):\n"
        f"    gamma_{j} = alpha_{j} + beta_{j} * {j}\n"
        f"    return gamma_{j} - {j}\n"
        for j in range(12)
    )
    rows = []
    for i in range(8):
        # near-dup family: same long body, one token differs per file
        rows.append(
            (f"org/a", f"src/f_{i}.py", f"{'c'*39}{i}", "python",
             base_text + f"# variant {i}\n")
        )
    rows.append(("org/b", "src/gpl.py", "d" * 40, "python",
                 "# under the terms of the GNU General Public License\n"
                 + base_text.replace("shared_function", "totally_other_name")))
    rows.append(("org/b", "src/clean.py", "e" * 40, "python",
                 "def unrelated(x):\n    return x - 99\n"))
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.mode("overwrite").parquet(src)

    out_dir = str(tmp_path / "cur2")
    rc = main(
        ["curate", "--input", src, "--output", out_dir,
         "--neardup", "--require-permissive-license", "--cores", "4"]
    )
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    counts = summary["drop_reason_counts"]
    assert counts.get("near_dup", 0) == 7, counts  # 8-file family → 1 survivor
    assert counts.get("restrictive_license", 0) == 1, counts
    cur = spark.read.parquet(f"{out_dir}/curated")
    kept_paths = {r.path for r in cur.filter("kept").collect()}
    assert "src/f_0.py" in kept_paths          # min record_id survives
    assert "src/clean.py" in kept_paths        # unknown license passes
    assert "src/gpl.py" not in kept_paths


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


def test_cli_curate_frees_checkpoint_blocks_in_shared_session(
    tmp_path, spark
):
    """A multi-pass curate run checkpoints the fused core plus the
    component-loop truncations; in a SHARED session those executor-local
    blocks must be freed on exit (the epilogue diffs the persistent-RDD
    set against an entry snapshot), while a caller's own persisted frame
    survives untouched."""
    caller_df = spark.range(100).persist()
    caller_df.count()  # materialize the caller's block
    before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert before  # the caller's own persisted RDD is visible

    out_dir = str(tmp_path / "cur_blocks")
    rc = main(
        ["curate", "--synthetic", "2000", "--output", out_dir,
         "--neardup", "--mixture", "python=0.5,go=0.5", "--cores", "4"]
    )
    assert rc == 0
    after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert after == before  # run blocks freed, caller's block intact
    assert caller_df.count() == 100
    caller_df.unpersist()


def test_cli_curate_repetition_flag(tmp_path, spark):
    """--repetition drops repetitious docs (Gopher screens) with the
    metric name as the audit reason; without the flag the same doc is
    kept — the screen is opt-in."""
    src = str(tmp_path / "src_rep")
    clean_text = "".join(
        f"def fn_{j}(alpha_{j}, beta_{j}):\n"
        f"    gamma_{j} = alpha_{j} + beta_{j} * {j}\n"
        f"    return gamma_{j} - {j}\n"
        for j in range(12)
    )
    rows = [
        ("org/a", "src/clean.py", "a" * 40, "python", clean_text),
        ("org/a", "src/spam.py", "b" * 40, "python",
         "state = state + delta_step\n" * 80),
    ]
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.mode("overwrite").parquet(src)

    out_rep = str(tmp_path / "cur_rep")
    rc = main(["curate", "--input", src, "--output", out_rep,
               "--repetition", "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_rep}/summary.json"))
    assert summary["drop_reason_counts"].get("rep_dup_line_frac", 0) == 1, summary
    cur = spark.read.parquet(f"{out_rep}/curated")
    kept_paths = {r.path for r in cur.filter("kept").collect()}
    assert "src/clean.py" in kept_paths
    assert "src/spam.py" not in kept_paths

    out_plain = str(tmp_path / "cur_plain")
    rc = main(["curate", "--input", src, "--output", out_plain, "--cores", "4"])
    assert rc == 0
    cur2 = spark.read.parquet(f"{out_plain}/curated")
    kept2 = {r.path for r in cur2.filter("kept").collect()}
    assert "src/spam.py" in kept2


def test_cli_curate_pack_terminus(tmp_path, spark):
    """--pack N writes a packed-sequences parquet of the KEPT corpus;
    token totals reconcile with the kept docs (one EOS per doc)."""
    from pyspark.sql import functions as F

    out_dir = str(tmp_path / "cur_pack")
    # 2 stream groups: a tiny corpus would otherwise pay 32 partial
    # tail sequences and efficiency reads as tail overhead, not packing
    rc = main(["curate", "--synthetic", "2000", "--output", out_dir,
               "--pack", "128", "--pack-groups", "2", "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    p = summary["packed"]
    assert p["seq_len"] == 128 and p["n_sequences"] > 0
    assert 0.9 < p["packing_efficiency"] <= 1.0
    packed = spark.read.parquet(f"{out_dir}/packed")
    assert packed.count() == p["n_sequences"]
    kept = (
        spark.read.parquet(f"{out_dir}/curated")
        .filter("status = 'kept'")
        .select("content")
    )
    toks = kept.select(
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col("content"), F.lit("")))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("n")
    ).agg(F.sum("n"), F.sum((F.col("n") > 0).cast("long"))).collect()[0]
    assert p["total_tokens"] == toks[0] + toks[1]  # tokens + per-doc EOS


def test_cli_curate_mixture_flag(tmp_path, spark):
    """--mixture resamples the kept corpus toward target lang
    proportions; unnamed langs drop with the 'mixture' audit reason."""
    from pyspark.sql import functions as F

    out_dir = str(tmp_path / "cur_mix")
    rc = main(["curate", "--synthetic", "4000", "--output", out_dir,
               "--mixture", "python=0.7,go=0.3", "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["drop_reason_counts"].get("mixture", 0) > 0
    rates = summary["mixture_rates"]
    assert set(rates) == {"python", "go"} and all(0 < r <= 1 for r in rates.values())
    kept = (
        spark.read.parquet(f"{out_dir}/curated")
        .filter("status = 'kept'")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_lang = {r.lang: r.n for r in kept}
    assert set(by_lang) == {"python", "go"}  # other langs all dropped
    total = sum(by_lang.values())
    assert abs(by_lang["python"] / total - 0.7) < 0.08
    # deterministic: second run keeps the identical row set
    out2 = str(tmp_path / "cur_mix2")
    rc = main(["curate", "--synthetic", "4000", "--output", out2,
               "--mixture", "python=0.7,go=0.3", "--cores", "4"])
    assert rc == 0
    a = {r.record_id for r in spark.read.parquet(f"{out_dir}/curated").filter("kept").collect()}
    b = {r.record_id for r in spark.read.parquet(f"{out2}/curated").filter("kept").collect()}
    assert a == b


def test_cli_curate_mixture_malformed_is_usage_error(tmp_path):
    """Malformed LANG=W lists die at argparse with a clear message, not
    a bare ValueError from a float cast mid-job."""
    import pytest

    for bad in ("python=0.5,,go=0.3", "python", "python=abc",
                "=0.5", "python=-1", "python=0.5,python=0.5"):
        with pytest.raises(SystemExit) as exc:
            main(["curate", "--synthetic", "10",
                  "--output", str(tmp_path / "x"), "--mixture", bad])
        assert exc.value.code == 2  # argparse usage error


def test_cli_curate_mixture_no_matching_lang(tmp_path, spark):
    """--mixture naming only absent languages (e.g. case mismatch
    'Python' vs 'python') must complete — dropping every kept row with
    reason 'mixture' — instead of dying on a zero-arg create_map
    (map<void,void> lookup AnalysisException). With --pack the packed
    summary must also survive the resulting EMPTY kept corpus (NULL
    sums previously crashed int()/float() before summary.json)."""
    out_dir = str(tmp_path / "cur_mix_none")
    rc = main(["curate", "--synthetic", "1000", "--output", out_dir,
               "--mixture", "Python=1.0", "--pack", "128",
               "--pack-groups", "2", "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["kept"] == 0
    assert summary["mixture_rates"] == {}
    assert summary["drop_reason_counts"].get("mixture", 0) > 0
    p = summary["packed"]
    assert p["n_sequences"] == 0 and p["total_tokens"] == 0
    assert p["packing_efficiency"] == 0.0


def test_cli_curate_decontaminate_flag(tmp_path, spark):
    """--decontaminate drops kept docs containing an eval probe at high
    n-gram containment, with the 'contaminated' audit reason; clean docs
    and the probe-free control are untouched."""
    probe_text = (
        "what is the capital city of the ancient kingdom described "
        "in the second passage above respond with exactly one word"
    )
    body = "".join(
        f"def helper_{j}(value_{j}):\n    return value_{j} * {j} + 1\n"
        for j in range(10)
    )
    rows = [
        ("org/a", "src/contaminated.py", "a" * 40, "python",
         body + f"# eval: {probe_text}\n"),
        ("org/a", "src/clean.py", "b" * 40, "python",
         body + "# just an ordinary trailing comment here\n"),
    ]
    src = str(tmp_path / "src_dc")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.mode("overwrite").parquet(src)
    probes = str(tmp_path / "probes")
    spark.createDataFrame(
        [("p1", probe_text)], "probe_id string, text string"
    ).write.mode("overwrite").parquet(probes)

    out_dir = str(tmp_path / "cur_dc")
    rc = main(["curate", "--input", src, "--output", out_dir,
               "--decontaminate", probes, "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["drop_reason_counts"].get("contaminated", 0) == 1, summary
    cur = spark.read.parquet(f"{out_dir}/curated")
    kept_paths = {r.path for r in cur.filter("kept").collect()}
    assert "src/clean.py" in kept_paths
    assert "src/contaminated.py" not in kept_paths
    # lineage shows the decontaminate stage explicitly
    stages = {s["stage"]: s for s in summary["stage_lineage"]}
    assert stages["decontaminate"]["dropped"] == 1


def test_cli_curate_decontaminate_short_probe_substring(tmp_path, spark):
    """A probe below the 8-token n-gram width must still decontaminate —
    screened by whitespace-normalized exact-substring containment — and
    reconcile through the same 'contaminated' audit reason."""
    short_probe = "secret eval answer token"
    body = "".join(
        f"def helper_{j}(value_{j}):\n    return value_{j} * {j} + 1\n"
        for j in range(10)
    )
    rows = [
        ("org/a", "src/contaminated.py", "a" * 40, "python",
         body + f"# {short_probe}\n"),
        ("org/a", "src/clean.py", "b" * 40, "python",
         body + "# an ordinary trailing comment\n"),
    ]
    src = str(tmp_path / "src_sp")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.mode("overwrite").parquet(src)
    probes = str(tmp_path / "probes_sp")
    spark.createDataFrame(
        [("p1", short_probe)], "probe_id string, text string"
    ).write.mode("overwrite").parquet(probes)

    out_dir = str(tmp_path / "cur_sp")
    rc = main(["curate", "--input", src, "--output", out_dir,
               "--decontaminate", probes, "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["drop_reason_counts"].get("contaminated", 0) == 1, summary
    cur = spark.read.parquet(f"{out_dir}/curated")
    kept_paths = {r.path for r in cur.filter("kept").collect()}
    assert kept_paths == {"src/clean.py"}


def test_cli_curate_decontaminate_bad_probe_schema(tmp_path, spark):
    src = str(tmp_path / "src_bad")
    spark.createDataFrame(
        [("r", "p", "c" * 40, "python", "def f(x):\n    return x\n")],
        "repo string, path string, commit string, lang string, content string",
    ).write.mode("overwrite").parquet(src)
    probes = str(tmp_path / "badprobes")
    spark.createDataFrame(
        [("oops",)], "wrong_column string"
    ).write.mode("overwrite").parquet(probes)
    import pytest

    with pytest.raises(SystemExit, match="probe_id"):
        main(["curate", "--input", src, "--output", str(tmp_path / "o"),
              "--decontaminate", probes, "--cores", "4"])


def test_cli_curate_stage_lineage_reconciles(tmp_path, spark):
    """stage_lineage chains: each stage's rows_out is the next stage's
    rows_in, the first rows_in is the input count, the last rows_out is
    the kept count, and per-stage drops sum to the total."""
    out_dir = str(tmp_path / "cur_lin")
    rc = main(["curate", "--synthetic", "3000", "--output", out_dir,
               "--repetition", "--neardup", "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    lineage = summary["stage_lineage"]
    assert [s["stage"] for s in lineage] == [
        "quality", "secrets", "repetition", "exact_dedup", "near_dup"
    ]
    assert lineage[0]["rows_in"] == summary["rows_in"]
    for prev, nxt in zip(lineage, lineage[1:]):
        assert prev["rows_out"] == nxt["rows_in"]
        assert prev["rows_in"] - prev["dropped"] == prev["rows_out"]
    assert lineage[-1]["rows_out"] == summary["kept"]
    assert sum(s["dropped"] for s in lineage) == summary["dropped"]
    # the synthetic table's exact dups must show up at their stage
    assert {s["stage"]: s for s in lineage}["exact_dedup"]["dropped"] > 0


def test_cli_curate_baseline_snapshot_and_zero_drift(tmp_path, spark):
    """--save-baseline writes the kept-corpus profile; a second run over
    the IDENTICAL input scored with --baseline reports zero drift (ks=0,
    chi2=0, same row counts) for every profiled column."""
    base = str(tmp_path / "baseline_snapshot")
    out1 = str(tmp_path / "cur_b1")
    rc = main(["curate", "--synthetic", "2000", "--output", out1,
               "--save-baseline", base, "--cores", "4"])
    assert rc == 0
    s1 = json.load(open(f"{out1}/summary.json"))
    assert s1["baseline_written"] == base

    out2 = str(tmp_path / "cur_b2")
    rc = main(["curate", "--synthetic", "2000", "--output", out2,
               "--baseline", base, "--cores", "4"])
    assert rc == 0
    s2 = json.load(open(f"{out2}/summary.json"))
    drift = s2["baseline_drift"]
    assert set(drift) == {"content_len", "n_tokens", "n_lines"}
    for col, d in drift.items():
        assert d["ks"] == 0.0, (col, d)
        assert d["chi2"] == 0.0, (col, d)
        assert d["n_current"] == d["n_baseline"] == s2["kept"]
        assert abs(d["mean_current"] - d["mean_baseline"]) < 1e-9


def test_cli_curate_baseline_detects_shift(tmp_path, spark):
    """A genuinely different corpus (every doc doubled in length) scores
    nonzero KS against the snapshot — the upstream-change alarm."""
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark import fixtures

    src1 = str(tmp_path / "src1")
    fixtures.code_files(spark, 1500).write.mode("overwrite").parquet(src1)
    src2 = str(tmp_path / "src2")
    (
        fixtures.code_files(spark, 1500)
        .withColumn("content", F.concat("content", F.lit("\n"), "content"))
        .write.mode("overwrite")
        .parquet(src2)
    )
    base = str(tmp_path / "snap")
    assert main(["curate", "--input", src1, "--output",
                 str(tmp_path / "o1"), "--save-baseline", base,
                 "--cores", "4"]) == 0
    out2 = str(tmp_path / "o2")
    assert main(["curate", "--input", src2, "--output", out2,
                 "--baseline", base, "--cores", "4"]) == 0
    drift = json.load(open(f"{out2}/summary.json"))["baseline_drift"]
    assert drift["content_len"]["ks"] > 0.3, drift


def test_cli_curate_line_dedup_flag(tmp_path, spark):
    """--line-dedup N strips cross-document boilerplate lines BEFORE the
    filter stages: the shared header disappears from every kept file,
    summary.line_dedup reports the aggregate, and row lineage is
    untouched (the stage rewrites payloads, never drops rows)."""
    header = "# Copyright 2021 MegaCorp Incorporated. All rights reserved."

    def body(j):
        return "".join(
            f"def fn_{j}_{k}(alpha_{k}, beta_{k}):\n"
            f"    return alpha_{k} + beta_{k} * {k} + {j * 100}\n"
            for k in range(10)
        )

    rows = [
        ("org/a", f"src/f{j}.py", chr(97 + j) * 40, "python",
         header + "\n" + body(j))
        for j in range(3)
    ]
    src = str(tmp_path / "src_ld")
    spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string",
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "cur_ld")
    assert main(["curate", "--input", src, "--output", out,
                 "--line-dedup", "2", "--cores", "4"]) == 0
    summary = json.load(open(f"{out}/summary.json"))
    assert summary["line_dedup"] == {
        "min_docs": 2, "lines_removed": 3, "docs_rewritten": 3
    }, summary
    assert summary["kept"] == 3 and summary["dropped"] == 0, summary
    cur = spark.read.parquet(f"{out}/curated")
    for r in cur.collect():
        assert header not in r.content
        assert r.lines_deduped == 1
        assert f"def fn_" in r.content  # bodies untouched

    # without the flag the header is retained
    out2 = str(tmp_path / "cur_plain_ld")
    assert main(["curate", "--input", src, "--output", out2,
                 "--cores", "4"]) == 0
    cur2 = spark.read.parquet(f"{out2}/curated")
    assert all(header in r.content for r in cur2.collect())
    assert "line_dedup" not in json.load(open(f"{out2}/summary.json"))


def test_cli_curate_line_dedup_min_docs_is_validated(tmp_path, capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit) as exc:
        main(["curate", "--input", "x", "--output", "y",
              "--line-dedup", "1"])
    assert exc.value.code == 2  # argparse usage error
    assert "MIN_DOCS must be >= 2" in capsys.readouterr().err


def test_cli_index_and_search_pq_roundtrip(tmp_path, spark):
    """index --pq-m builds centroids + codebooks + a code-only corpus
    artifact; search --exact-rerank with a corpus-covering shortlist and
    full probes reproduces exact cosine top-k bit-for-bit."""
    from faang_pydantics_validation_spark import fixtures
    from faang_pydantics_validation_spark.ops import similarity as sim

    src = str(tmp_path / "emb")
    fixtures.embeddings_table(spark, 400, dim=16, partitions=4,
                              n_clusters=8).write.parquet(src)
    emb = spark.read.parquet(src)
    qsrc = str(tmp_path / "queries")
    emb.filter("vec_id % 100 = 0").write.parquet(qsrc)

    idx = str(tmp_path / "idx")
    assert main(["index", "--input", src, "--output", idx,
                 "--cells", "8", "--pq-m", "4", "--pq-codes", "16",
                 "--cores", "4"]) == 0
    manifest = json.load(open(f"{idx}/index.json"))
    assert manifest["rows"] == 400 and manifest["n_cells"] == 8
    assert manifest["pq_m"] == 4 and manifest["pq_codes"] == 16
    corpus_cols = set(spark.read.parquet(f"{idx}/corpus").columns)
    assert corpus_cols == {"vec_id", "cell", "pq_code", "pq_rnorm"}

    out = str(tmp_path / "res")
    assert main(["search", "--index", idx, "--queries", qsrc,
                 "--output", out, "--k", "5", "--nprobe", "8",
                 "--shortlist", "400", "--exact-rerank",
                 "--cores", "4"]) == 0
    got = sorted(
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in spark.read.parquet(f"{out}/results").collect()
    )
    exact = sorted(
        (r.query_id, r.neighbor_id, r.score, r.rank)
        for r in sim.cosine_topk(
            emb, emb.filter("vec_id % 100 = 0"), k=5
        ).collect()
    )
    assert got == exact


def test_cli_index_search_without_pq_keeps_vectors(tmp_path, spark):
    from faang_pydantics_validation_spark import fixtures

    src = str(tmp_path / "emb2")
    fixtures.embeddings_table(spark, 300, dim=16, partitions=4,
                              n_clusters=8).write.parquet(src)
    idx = str(tmp_path / "idx2")
    assert main(["index", "--input", src, "--output", idx,
                 "--cells", "8", "--cores", "4"]) == 0
    assert "embedding" in spark.read.parquet(f"{idx}/corpus").columns
    qsrc = str(tmp_path / "q2")
    spark.read.parquet(src).filter("vec_id % 75 = 0").write.parquet(qsrc)
    out = str(tmp_path / "res2")
    assert main(["search", "--index", idx, "--queries", qsrc,
                 "--output", out, "--k", "3", "--nprobe", "8",
                 "--cores", "4"]) == 0
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == 4 * 3  # 4 queries x k
    assert res.filter("rank < 1 or rank > 3").count() == 0
    # self-exclusion is for corpus-vs-itself queries; an external batch
    # passes --include-self so an id collision can't hide a candidate.
    # Querying the corpus against itself WITH the flag, every query's
    # rank-1 hit must be itself at cosine ~1.
    out3 = str(tmp_path / "res3")
    assert main(["search", "--index", idx, "--queries", qsrc,
                 "--output", out3, "--k", "3", "--nprobe", "8",
                 "--include-self", "--cores", "4"]) == 0
    top = spark.read.parquet(f"{out3}/results").filter("rank = 1").collect()
    assert len(top) == 4
    assert all(r.query_id == r.neighbor_id and r.score > 0.999999
               for r in top)


def test_cli_train_classifier_and_curate_quality_stage(tmp_path, spark):
    """fpvs train-classifier writes a weight artifact whose bias row
    encodes the feature space; curate --quality-classifier scores every
    doc with it in the fused annotate pass, drops low scorers with
    reason low_classifier_score, books them to the 'classifier' lineage
    stage, and lands quality_prob in the written audit."""
    def code_doc(j):
        return "".join(
            f"def helper_{j}_{k}(value):\n"
            f"    return value * {k} + compute_offset(value, {k})\n"
            for k in range(8)
        )

    def junk_doc(j):
        # short lines so the RULE screens pass (no high_mean_line_len):
        # only the learned classifier should be dropping these
        return "\n".join(
            f"zzz{j} qq{k} buy now spam cheap win" for k in range(20)
        )

    gold = str(tmp_path / "gold")
    junk = str(tmp_path / "junk")
    spark.createDataFrame(
        [(code_doc(j),) for j in range(8)], "content string"
    ).write.parquet(gold)
    spark.createDataFrame(
        [(junk_doc(j),) for j in range(8)], "content string"
    ).write.parquet(junk)
    weights = str(tmp_path / "weights")
    rc = main(["train-classifier", "--gold", gold, "--junk", junk,
               "--output", weights, "--features", str(1 << 12),
               "--iters", "25", "--lr", "1.0", "--cores", "4"])
    assert rc == 0
    w = spark.read.parquet(weights)
    assert set(w.columns) == {"feature", "weight"}

    # curate input: half gold-like code, half junk prose — the rule
    # screens keep both (junk_doc has no secrets/licence problems and
    # passes length rules), so any classifier drop is attributable
    rows = [("org/a", f"src/good_{j}.py", "a" * 40, "python", code_doc(j))
            for j in range(3)]
    rows += [("org/b", f"src/junk_{j}.py", "b" * 40, "python", junk_doc(j))
             for j in range(3)]
    src = str(tmp_path / "clf_src")
    spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string,"
        " content string",
    ).write.parquet(src)
    out_dir = str(tmp_path / "clf_out")
    rc = main(["curate", "--input", src, "--output", out_dir,
               "--quality-classifier", weights, "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    cur = spark.read.parquet(f"{out_dir}/curated")
    assert "quality_prob" in cur.columns
    clf_dropped = cur.filter(
        "array_contains(drop_reasons, 'low_classifier_score')"
    ).collect()
    assert clf_dropped, summary
    assert all("junk_" in r.path for r in clf_dropped)
    assert not [r for r in cur.filter("status = 'kept'").collect()
                if "junk_" in r.path and r.quality_prob is not None
                and r.quality_prob < 0.5]
    stages = {s["stage"]: s for s in summary["stage_lineage"]}
    assert "classifier" in stages
    assert stages["classifier"]["dropped"] == len(clf_dropped)
    # kept-corpus score profile rides summary.json for cross-run trending
    prof = summary["classifier"]
    assert prof["prob_min"] == 0.5
    assert len(prof["kept_prob_p10_p50_p90"]) == 3
    assert all(x >= 0.5 for x in prof["kept_prob_p10_p50_p90"])
    assert prof["kept_prob_mean"] >= 0.5


def test_cli_semdedup(tmp_path, spark):
    """fpvs semdedup writes the keep-partitioned annotated table and a
    reconciling summary; exactly one member of each tight duplicate
    cluster survives and singletons all keep."""
    from pyspark.sql import functions as F

    from faang_pydantics_validation_spark import fixtures

    src = str(tmp_path / "emb_sd")
    fixtures.embeddings_table(spark, 300, dim=16, partitions=4,
                              n_clusters=10, noise=0.01).write.parquet(src)
    out = str(tmp_path / "sd_out")
    rc = main(["semdedup", "--input", src, "--output", out,
               "--cells", "10", "--threshold", "0.999",
               "--cores", "4"])
    assert rc == 0
    back = spark.read.parquet(f"{out}/deduped")
    n = back.count()
    kept = back.filter("status = 'kept'").count()
    assert n == 300
    # noise 0.01 around 10 centers → every cluster is a near-exact dup
    # family; keep-one leaves ~10 survivors (cell boundaries may split
    # a family at most a few times)
    assert kept < 30, kept
    comp_sizes = (
        back.filter("semdedup_component is not null")
        .groupBy("semdedup_component")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("semdedup_keep").cast("int")).alias("k"))
        .collect()
    )
    assert comp_sizes and all(r.k == 1 for r in comp_sizes)


def test_cli_curate_semdedup_side_table(tmp_path, spark):
    """--semdedup joins a side (record_id, embedding) table over the
    kept rows, drops all but one member of each semantic-duplicate
    group with reason semantic_dup, and books them to the
    semantic_dedup lineage stage."""
    body = "".join(
        f"def fn_{{j}}(a_{{j}}, b_{{j}}):\n    return a_{{j}} + b_{{j}} * {{j}}\n"
        .format(j=j) for j in range(10)
    )
    rows = [("org/a", f"src/m_{i}.py", chr(97 + i) * 40, "python",
             body + f"# module {i}\n") for i in range(4)]
    src = str(tmp_path / "sd_src")
    spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string,"
        " content string",
    ).write.parquet(src)
    # record_id = repo:path@commit; docs 0 and 1 share a direction
    # (semantic dups), 2 and 3 are orthogonal singletons
    def rid(i):
        return f"org/a:src/m_{i}.py@{chr(97 + i) * 40}"
    emb = [
        (rid(0), [1.0, 0.001, 0.0]),
        (rid(1), [1.0, 0.002, 0.0]),
        (rid(2), [0.0, 1.0, 0.0]),
        (rid(3), [0.0, 0.0, 1.0]),
    ]
    epath = str(tmp_path / "sd_emb")
    spark.createDataFrame(
        emb, "record_id string, embedding array<float>"
    ).write.parquet(epath)
    out_dir = str(tmp_path / "sd_cur")
    rc = main(["curate", "--input", src, "--output", out_dir,
               "--semdedup", epath, "--semdedup-threshold", "0.999",
               "--cores", "4"])
    assert rc == 0
    summary = json.load(open(f"{out_dir}/summary.json"))
    assert summary["drop_reason_counts"].get("semantic_dup", 0) == 1, summary
    stages = {s["stage"]: s for s in summary["stage_lineage"]}
    assert stages["semantic_dedup"]["dropped"] == 1
    cur = spark.read.parquet(f"{out_dir}/curated")
    dropped = cur.filter(
        "array_contains(drop_reasons, 'semantic_dup')"
    ).collect()
    assert len(dropped) == 1 and dropped[0].path in ("src/m_0.py",
                                                     "src/m_1.py")
    kept_paths = {r.path for r in cur.filter("kept").collect()}
    assert {"src/m_2.py", "src/m_3.py"} <= kept_paths
    assert len(kept_paths & {"src/m_0.py", "src/m_1.py"}) == 1


def test_cli_curate_checkpointed_resume_matches_unsharded(tmp_path, spark):
    """curate --checkpoint shards the fused core by content sha: the
    result must be IDENTICAL to an unsharded run (every copy of a sha
    shares a shard, so per-shard exact dedup is global dedup), a rerun
    resumes to a no-op, and corpus-global stages are refused."""
    import pytest as _pytest

    ref_dir = str(tmp_path / "ref")
    assert main(["curate", "--synthetic", "3000", "--output", ref_dir,
                 "--cores", "4"]) == 0
    ref = json.load(open(f"{ref_dir}/summary.json"))

    out_dir = str(tmp_path / "ck_out")
    ckpt = str(tmp_path / "ck_manifest")
    argv = ["curate", "--synthetic", "3000", "--output", out_dir,
            "--checkpoint", ckpt, "--n-checkpoint-partitions", "8",
            "--cores", "4"]
    assert main(argv) == 0
    s1 = json.load(open(f"{out_dir}/summary.json"))
    assert s1["partitions_processed"] == 8
    assert (s1["rows_in"], s1["kept"], s1["dropped"]) == (
        ref["rows_in"], ref["kept"], ref["dropped"])
    assert s1["drop_reason_counts"] == ref["drop_reason_counts"]
    assert s1["stage_lineage"] == ref["stage_lineage"]
    # the written kept corpora are row-identical
    from pyspark.sql import functions as F

    a = spark.read.parquet(f"{ref_dir}/curated").filter("kept")
    b = spark.read.parquet(f"{out_dir}/curated").filter("kept")
    assert a.count() == b.count()
    assert a.select("record_id").exceptAll(b.select("record_id")).count() == 0

    # resume: all shards complete -> no-op, data intact
    assert main(argv) == 0
    s2 = json.load(open(f"{out_dir}/summary.json"))
    assert s2["partitions_processed"] == 0
    assert s2["kept"] == ref["kept"]
    assert len(os.listdir(f"{ckpt}/manifest")) == 8

    # corpus-global stages are refused up front
    with _pytest.raises(SystemExit) as exc:
        main(argv + ["--neardup"])
    assert "--neardup" in str(exc.value)


def test_cli_curate_checkpointed_decontaminate_matches_unsharded(
    tmp_path, spark
):
    """--decontaminate is row-local against BROADCAST probes, hence
    shard-safe: the resumable path accepts it (r4's refusal list was
    over-broad) and produces results identical to the unsharded run —
    same lineage, same contaminated set, same kept ids."""
    probe_text = (
        "what is the capital city of the ancient kingdom described "
        "in the second passage above respond with exactly one word"
    )
    body = "".join(
        f"def helper_{j}(value_{j}):\n    return value_{j} * {j} + 1\n"
        for j in range(10)
    )
    rows = [
        (
            "org/a",
            f"src/f_{i}.py",
            "c" * 40,
            "python",
            body
            + (
                f"# eval: {probe_text}\n"
                if i % 7 == 0
                else f"# ordinary trailing comment {i}\n"
            ),
        )
        for i in range(60)
    ]
    src = str(tmp_path / "src_ckdc")
    spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string,"
        " content string",
    ).write.mode("overwrite").parquet(src)
    probes = str(tmp_path / "probes_ckdc")
    spark.createDataFrame(
        [("p1", probe_text)], "probe_id string, text string"
    ).write.mode("overwrite").parquet(probes)

    ref_dir = str(tmp_path / "ref_ckdc")
    assert main(["curate", "--input", src, "--output", ref_dir,
                 "--decontaminate", probes, "--cores", "4"]) == 0
    ref = json.load(open(f"{ref_dir}/summary.json"))
    assert ref["drop_reason_counts"].get("contaminated", 0) > 0

    out_dir = str(tmp_path / "ck_ckdc")
    ckpt = str(tmp_path / "ckm_ckdc")
    assert main(["curate", "--input", src, "--output", out_dir,
                 "--decontaminate", probes, "--checkpoint", ckpt,
                 "--n-checkpoint-partitions", "8", "--cores", "4"]) == 0
    got = json.load(open(f"{out_dir}/summary.json"))
    assert (got["rows_in"], got["kept"], got["dropped"]) == (
        ref["rows_in"], ref["kept"], ref["dropped"])
    assert got["drop_reason_counts"] == ref["drop_reason_counts"]
    assert got["stage_lineage"] == ref["stage_lineage"]
    a = spark.read.parquet(f"{ref_dir}/curated").filter("kept")
    b = spark.read.parquet(f"{out_dir}/curated").filter("kept")
    assert a.select("record_id").exceptAll(b.select("record_id")).count() == 0
    assert b.select("record_id").exceptAll(a.select("record_id")).count() == 0


def test_tune_scan_splits_widens_small_input(tmp_path, spark):
    """A small many-file parquet input must plan at least ~3 scan tasks
    per core: the row-local annotate chain runs inside the scan stage,
    so bin-packing a sub-GB input into fewer splits than cores leaves
    cores idle through curate's heaviest stage (measured 0.68 core-phase
    scaling before the fix). The clamp keeps the 128 MB production
    split size for large inputs — at cluster scale this is a no-op."""
    from faang_pydantics_validation_spark import fixtures
    from faang_pydantics_validation_spark.cli import _tune_scan_splits

    src = str(tmp_path / "many_files")
    fixtures.code_files(spark, 20000, partitions=16).write.mode(
        "overwrite"
    ).parquet(src)
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        _tune_scan_splits(spark, src)
        target = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        assert 4 << 20 <= target <= 128 << 20
        cores = spark.sparkContext.defaultParallelism
        n_parts = spark.read.parquet(src).rdd.getNumPartitions()
        # 16 files, tiny bytes: the 4 MB floor packs several files per
        # split but must still beat one-split-per-core under-parallelism
        assert n_parts >= min(16, cores)
        # a missing path leaves the session untouched
        spark.conf.set("spark.sql.files.maxPartitionBytes", "7340032")
        _tune_scan_splits(spark, str(tmp_path / "nope"))
        assert (
            spark.conf.get("spark.sql.files.maxPartitionBytes") == "7340032"
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
