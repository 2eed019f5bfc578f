"""Arrow/numpy kernel parity for the SemDeDup-scale assignment and
pair-scoring paths (ops/similarity.py).

The expression argmax/dot is a higher-order ArrayAggregate/ZipWith —
CodegenFallback, INTERPRETED — which turns SemDeDup's N/150-cell sizing
into O(N²·dim/150) interpreted folds (hours at 10⁶ rows; thread-dump
verified). The Arrow kernel runs the same math as chunked float64
dgemms. These tests pin that the two paths agree EXACTLY on the
fixtures (assignment cells + scores, pair sets + scores, full semdedup
output, trained centroids) including the degenerate-vector corners the
expression path defines (NULL/empty/wrong-dim → smallest cell, score
0.0; cross-dim pairs never emit)."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from faang_pydantics_validation_spark import fixtures
from faang_pydantics_validation_spark.ops import similarity as sim


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def emb(spark):
    base = fixtures.embeddings_table(
        spark, 300, dim=16, partitions=4, n_clusters=10
    )
    degenerate = spark.createDataFrame(
        [(100001, None), (100002, []), (100003, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    return base.unionByName(degenerate).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def cents(spark, emb):
    return sim.train_ivf_centroids(
        emb, n_cells=10, refine_iters=1
    ).localCheckpoint(eager=True)


def test_resolve_assign_kernel_rules():
    r = sim._resolve_assign_kernel
    assert r("expr", None) == "expr"
    assert r("arrow", None) == "arrow"
    assert r("auto", [(0, [1.0])]) == "expr"  # 1 cell < threshold
    assert (
        r("auto", None, n_cells=sim.ARROW_ASSIGN_MIN_CELLS) == "arrow"
    )
    assert (
        r("auto", None, n_cells=sim.ARROW_ASSIGN_MIN_CELLS - 1) == "expr"
    )
    assert r("auto", None) == "expr"  # nothing to size by
    with pytest.raises(ValueError, match="kernel"):
        r("numpy", None)


def test_ivf_assign_arrow_matches_expr(emb, cents):
    """Cells AND scores identical, including the degenerate rows
    (NULL / empty / wrong-dim vectors land in the smallest cell with
    score 0.0 on both paths — cosine_pre's non-positive-denominator
    contract)."""
    e = {
        r["vec_id"]: (r["cell"], r["sc"])
        for r in sim.ivf_assign(
            emb, cents, cell_col="cell", score_col="sc", kernel="expr"
        ).collect()
    }
    a = {
        r["vec_id"]: (r["cell"], r["sc"])
        for r in sim.ivf_assign(
            emb, cents, cell_col="cell", score_col="sc", kernel="arrow"
        ).collect()
    }
    assert set(e) == set(a)
    for vid in e:
        assert e[vid][0] == a[vid][0], f"cell of {vid}"
        if e[vid][1] is None:
            assert a[vid][1] is None, f"score of {vid}"
        else:
            assert e[vid][1] == pytest.approx(a[vid][1], abs=1e-12), (
                f"score of {vid}"
            )
    # expression-path degenerate contract, reproduced by the kernel:
    # NULL and empty vectors score 0.0; the wrong-dim positive-norm
    # vector scores NULL (zip_with NULL-pads the dot, denom stays > 0)
    assert a[100001][1] == 0.0
    assert a[100002][1] == 0.0
    assert a[100003][1] is None


def test_semdedup_pairs_arrow_matches_expr(emb, cents):
    assigned = sim.ivf_assign(emb, cents, cell_col="cell", kernel="expr")
    for round_dp in (None, 6):
        e = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in sim.semdedup_pairs(
                assigned, threshold=0.9, round_dp=round_dp, kernel="expr"
            ).collect()
        }
        a = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in sim.semdedup_pairs(
                assigned, threshold=0.9, round_dp=round_dp, kernel="arrow"
            ).collect()
        }
        assert set(e) == set(a), f"pair set, round_dp={round_dp}"
        assert e, "fixture must produce pairs"
        for k in e:
            assert e[k] == pytest.approx(a[k], abs=1e-12)
    # degenerate rows never pair on either path
    flat = {i for k in e for i in k}
    assert flat.isdisjoint({100001, 100002, 100003})


def test_semdedup_full_output_parity(emb):
    """End-to-end semdedup (self-trained centroids) — cells, components
    and keep flags identical across kernels."""
    e = {
        r["vec_id"]: (
            r["semdedup_cell"],
            r["semdedup_component"],
            r["semdedup_keep"],
        )
        for r in sim.semdedup(
            emb, n_cells=10, refine_iters=1, threshold=0.9, kernel="expr"
        ).collect()
    }
    a = {
        r["vec_id"]: (
            r["semdedup_cell"],
            r["semdedup_component"],
            r["semdedup_keep"],
        )
        for r in sim.semdedup(
            emb, n_cells=10, refine_iters=1, threshold=0.9, kernel="arrow"
        ).collect()
    }
    assert e == a
    assert any(not v[2] for v in a.values()), "fixture must drop some rows"


def test_train_ivf_centroids_kernel_parity(emb):
    e = sorted(
        sim.train_ivf_centroids(
            emb, n_cells=10, refine_iters=2, kernel="expr"
        ).collect(),
        key=lambda r: r["cell"],
    )
    a = sorted(
        sim.train_ivf_centroids(
            emb, n_cells=10, refine_iters=2, kernel="arrow"
        ).collect(),
        key=lambda r: r["cell"],
    )
    assert [r["cell"] for r in e] == [r["cell"] for r in a]
    for re_, ra in zip(e, a):
        assert re_["centroid"] == pytest.approx(ra["centroid"], abs=1e-12)


def test_kernel_plan_shapes(emb, cents):
    """expr keeps the plan Python-free; arrow is exactly the sanctioned
    escape hatches (one MapInPandas for assignment, one grouped-map for
    pairs)."""
    p_expr = _plan(
        sim.ivf_assign(emb, cents, cell_col="cell", kernel="expr")
    )
    assert "Pandas" not in p_expr and "Python" not in p_expr
    p_arrow = _plan(
        sim.ivf_assign(emb, cents, cell_col="cell", kernel="arrow")
    )
    assert "MapInPandas" in p_arrow
    assigned = sim.ivf_assign(emb, cents, cell_col="cell", kernel="expr")
    p_pairs = _plan(
        sim.semdedup_pairs(assigned, threshold=0.9, kernel="arrow")
    )
    assert "FlatMapGroupsInPandas" in p_pairs
